package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.llm.Profile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming profile accumulation: the merged per-drop states must be
  * bit-identical to a one-pass profile of everything that has arrived,
  * and batch replay must be idempotent. */
class ProfileStreamSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.map { case (id, t) => (id, t, "en", "src", Option(t).map(_.length.toLong).getOrElse(0L)) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("streamed states merge to the one-pass profile; replay idempotent") {
    val root = Files.createTempDirectory("prof-stream")
    val dropDir = s"$root/drops"
    val statePath = s"$root/state"
    val checkpoint = s"$root/ckpt"
    new java.io.File(dropDir).mkdirs()
    val fs = new org.apache.hadoop.fs.Path(dropDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def land(df: DataFrame, name: String): Unit = {
      val tmp = s"$root/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .foreach(f => fs.rename(f.getPath,
          new org.apache.hadoop.fs.Path(s"$dropDir/$name.parquet")))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }

    val d0 = docs((1L, "a b a"), (2L, "c d"), (3L, null))
    val d1 = docs((4L, "e f g h"), (5L, "a b"))
    land(d0, "drop0")
    val stream = spark.readStream.schema(CorpusStream.documentsSchema).parquet(dropDir)
    CorpusStream.profileSink(stream, statePath, checkpoint)
      .start().awaitTermination(120000)
    land(d1, "drop1")
    CorpusStream.profileSink(stream, statePath, checkpoint)
      .start().awaitTermination(120000)

    val whole = Profile.profile(d0.unionByName(d1))
    assert(canon(CorpusStream.profileSoFar(spark, statePath)) == canon(whole))

    // crash replay of batch 0 rewrites its directory, not duplicates it
    CorpusStream.profileBatch(d0, 0L, statePath)
    assert(canon(CorpusStream.profileSoFar(spark, statePath)) == canon(whole))
  }
}
