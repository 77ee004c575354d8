package graft.llm

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WebDataset tar shards: from-spec ustar write + read round trip. */
class WebDatasetSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (0L, "plain ascii"),
    (1L, ""), // empty member
    (2L, "unicode: 日本語 🚀 ümlaut"),
    (3L, "x" * 2000), // spans multiple 512-byte blocks
    (17L, "same shard as 1 at nShards=8"),
    (42L, "last")).toDF("doc_id", "text")

  test("round trip reproduces every (id, text) exactly; samples are paired") {
    val dir = Files.createTempDirectory("graft_wds_spec").toFile.getAbsolutePath
    val shards = WebDataset.write(corpus, "doc_id", "text", dir, nShards = 4)
    assert(shards.nonEmpty && shards.forall(_.matches("shard-\\d{5}\\.tar")))
    val back = WebDataset.read(spark, dir)
    val texts = back.filter(col("name").endsWith(".txt"))
      .select(regexp_extract(col("name"), "(\\d+)\\.txt$", 1).cast("long"),
        col("content").cast("string"))
      .as[(Long, String)].collect().toMap
    val src = corpus.as[(Long, String)].collect().toMap
    assert(texts == src)
    // every sample has its .json sibling in the same shard
    val byKey = back.select("shard_file", "name").as[(String, String)].collect()
      .groupBy(_._2.takeWhile(_ != '.'))
    assert(byKey.values.forall(g =>
      g.map(_._1).distinct.length == 1 && g.map(_._2).exists(_.endsWith(".json"))))
  }

  test("readSamples groups members into loader-shaped (key -> parts) rows") {
    val dir = Files.createTempDirectory("graft_wds_samples").toFile.getAbsolutePath
    WebDataset.write(corpus, "doc_id", "text", dir, nShards = 4)
    val samples = WebDataset.readSamples(spark, dir).collect()
    val src = corpus.as[(Long, String)].collect().toMap
    assert(samples.length == src.size)
    samples.foreach { r =>
      val key = r.getString(1)
      val parts = r.getMap[String, Array[Byte]](2)
      assert(parts.keySet == Set("txt", "json"), s"$key: ${parts.keySet}")
      assert(new String(parts("txt"), "UTF-8") == src(key.toLong))
      assert(new String(parts("json"), "UTF-8").contains(s""""doc_id":${key.toLong}"""))
    }
  }

  test("shard assignment is pmod(id) and member order is sorted (deterministic bytes)") {
    val dirA = Files.createTempDirectory("graft_wds_a").toFile.getAbsolutePath
    val dirB = Files.createTempDirectory("graft_wds_b").toFile.getAbsolutePath
    WebDataset.write(corpus, "doc_id", "text", dirA, nShards = 4)
    WebDataset.write(corpus.repartition(5).orderBy(desc("text")),
      "doc_id", "text", dirB, nShards = 4)
    val a = new java.io.File(dirA).listFiles.filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName)
    val b = new java.io.File(dirB).listFiles.filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName)
    assert(a.map(_.getName).toSeq == b.map(_.getName).toSeq)
    for ((fa, fb) <- a.zip(b)) {
      assert(java.util.Arrays.equals(
        Files.readAllBytes(fa.toPath), Files.readAllBytes(fb.toPath)),
        s"shard bytes differ under input reordering: ${fa.getName}")
    }
    // ids 1 and 17 share shard-00001 at nShards=4? 17 % 4 = 1 — yes
    val names = WebDataset.read(spark, dirA)
      .filter(col("shard_file") === "shard-00001.tar")
      .select("name").as[String].collect().toSeq
    assert(names == Seq("000000001.json", "000000001.txt",
      "000000017.json", "000000017.txt"))
  }

  test("binary members ride adjacent to the text pair and round-trip bit-exactly") {
    val img = Array.tabulate(700)(i => (i * 7 % 251).toByte) // spans 2 blocks
    val wav = Array.tabulate(13)(i => (255 - i).toByte)
    val rows = Seq(
      (0L, "has both", Option(img), Option(wav)),
      (1L, "image only", Option(img.reverse), None),
      (2L, "text only", None, None))
      .toDF("doc_id", "text", "image", "audio")
      .withColumn("img_ext", lit("png"))
      .withColumn("aud_ext", lit("wav"))
    val dir = Files.createTempDirectory("graft_wds_bin").toFile.getAbsolutePath
    WebDataset.write(rows, "doc_id", "text", dir, nShards = 1,
      binaryMembers = Seq("image" -> "img_ext", "audio" -> "aud_ext"))
    val back = WebDataset.read(spark, dir)
    // adjacency + per-sample name-sorted order; NULL payloads omit members
    val names = back.select("name").as[String].collect().toSeq
    assert(names == Seq(
      "000000000.json", "000000000.png", "000000000.txt", "000000000.wav",
      "000000001.json", "000000001.png", "000000001.txt",
      "000000002.json", "000000002.txt"))
    val byName = back.select("name", "content")
      .as[(String, Array[Byte])].collect().toMap
    assert(java.util.Arrays.equals(byName("000000000.png"), img))
    assert(java.util.Arrays.equals(byName("000000000.wav"), wav))
    assert(java.util.Arrays.equals(byName("000000001.png"), img.reverse))
    // loader view: the parts map carries the binary modalities
    val parts = WebDataset.readSamples(spark, dir)
      .filter(col("key") === "000000000")
      .select("parts").as[Map[String, Array[Byte]]].head()
    assert(parts.keySet == Set("json", "txt", "png", "wav"))
    assert(java.util.Arrays.equals(parts("png"), img))
  }

  test("a binary member with a colliding or invalid extension fails loudly") {
    val rows = Seq((0L, "t", Array[Byte](1, 2)))
      .toDF("doc_id", "text", "blob")
    def attempt(ext: String): Throwable = intercept[Exception] {
      val dir = Files.createTempDirectory("graft_wds_ext").toFile.getAbsolutePath
      WebDataset.write(rows.withColumn("e", lit(ext)), "doc_id", "text", dir,
        nShards = 1, binaryMembers = Seq("blob" -> "e"))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(attempt("txt")).exists(_.contains("collides")))
    assert(messages(attempt("PNG")).exists(_.contains("invalid extension")))
    assert(messages(attempt("")).exists(_.contains("invalid extension")))
  }

  test("a corrupted header checksum is rejected loudly") {
    val dir = Files.createTempDirectory("graft_wds_bad").toFile.getAbsolutePath
    WebDataset.write(corpus, "doc_id", "text", dir, nShards = 1)
    val f = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".tar")).head
    // drop the local-FS .crc sidecar so it is OUR ustar checksum that trips
    new java.io.File(dir, s".${f.getName}.crc").delete()
    val bytes = Files.readAllBytes(f.toPath)
    bytes(0) = (bytes(0) + 1).toByte // flip a name byte; checksum now wrong
    Files.write(f.toPath, bytes)
    val e = intercept[Exception] {
      WebDataset.read(spark, dir).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("checksum")), s"unexpected: $e")
  }
}
