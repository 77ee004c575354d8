package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          shuffleBytes.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val docs = ProfileC1.syntheticDocs(spark, 500000L).localCheckpoint()
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val b0 = shuffleBytes.get(); val r = f
      println(f"[probe] $name%-24s ${(System.nanoTime()-s)/1e9}%7.2f s  shuffleMB=${(shuffleBytes.get()-b0)/1e6}%.1f"); r
    }
    // signature pipeline alone (kernels): hash + sig, no pairing
    t("signatures_only") {
      docs.select(col("doc_id"),
        graft.functions.HashFunctions.shingleHashes(col("text"), 5).as("hs"))
        .select(col("doc_id"),
          graft.functions.HashFunctions.minhashSignature(col("hs"), 64).as("sig"))
        .select(sum(element_at(col("sig"), 1))).head()
    }
    val pairs = t("minhashPairs_build+count") {
      val p = Dedup.minhashPairs(docs, "doc_id", "text", minJaccard = 0.5).localCheckpoint()
      println(s"[probe] pairs=${p.count()}")
      p
    }
    t("clusters") {
      println("[probe] clustered=" +
        Dedup.clusters(docs.select(col("doc_id")), pairs).count())
    }
    spark.stop()
  }
}
