package graft.functions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate the kernels") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_poly_hash('abc') AS h,
        |  size(graft_shingle_hashes('hello world', 5)) AS ns,
        |  size(graft_token_hashes('a b c')) AS nt,
        |  size(graft_minhash(graft_shingle_hashes('hello world', 5), 16)) AS nsig,
        |  graft_simhash('alpha beta', 24) AS sh,
        |  graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  graft_sig_agreement(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS agree,
        |  size(graft_winnow('abcdefghijklmnop', 8, 4)) AS nw
        |""".stripMargin).head()
    assert(r.getAs[Long]("h") == 304891L)
    assert(r.getAs[Int]("ns") == 7)
    assert(r.getAs[Int]("nt") == 3)
    assert(r.getAs[Int]("nsig") == 16)
    assert(r.getAs[Long]("sh") >= 0L)
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Double]("j") == 0.5)
    assert(r.getAs[Int]("agree") == 2)
    assert(r.getAs[Int]("nw") >= 1)
  }

  test("graft_html_text / graft_url_* kernels evaluate from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      s"""SELECT
         |  graft_html_text('<p>a</p><script>x</script><p>b</p>') AS t,
         |  graft_url_host('HTTP://User@Ex.COM:80/p?q#f') AS h,
         |  graft_url_canon('HTTP://User@Ex.COM:80/p?q#f') AS c,
         |  graft_registrable_domain('www.example.co.uk',
         |    '${GraftUrlOps.DefaultSuffixes}') AS d,
         |  graft_url_host('no scheme here') AS nh
         |""".stripMargin).head()
    assert(r.getAs[String]("t") == "a\nb")
    assert(r.getAs[String]("h") == "ex.com")
    assert(r.getAs[String]("c") == "http://ex.com/p?q")
    assert(r.getAs[String]("d") == "example.co.uk")
    assert(r.isNullAt(r.fieldIndex("nh")))
  }

  test("graft_media_meta decodes real media headers from SQL") {
    GraftExtensions.register(spark)
    val dir = new java.io.File("data/media").getAbsolutePath
    spark.read.format("binaryFile").load(s"$dir/media_004.png")
      .createOrReplaceTempView("png_payloads")
    val r = spark.sql(
      """SELECT m.decoder, m.width, m.height, m.n_channels, m.sample_rate
        |FROM (SELECT graft_media_meta(content) AS m FROM png_payloads)""".stripMargin).head()
    assert(r.getAs[String]("decoder") == "png")
    assert(r.getAs[Int]("width") == 16 && r.getAs[Int]("height") == 12)
    assert(r.getAs[Int]("n_channels") == 3)
    assert(r.isNullAt(r.fieldIndex("sample_rate")))
    // WAV branch: rate/frames populated, dims null
    spark.read.format("binaryFile").load(s"$dir/media_008.wav")
      .createOrReplaceTempView("wav_payloads")
    val w = spark.sql(
      """SELECT m.decoder, m.width, m.sample_rate, m.n_frames
        |FROM (SELECT graft_media_meta(content) AS m FROM wav_payloads)""".stripMargin).head()
    assert(w.getAs[String]("decoder") == "wav")
    assert(w.isNullAt(w.fieldIndex("width")))
    assert(w.getAs[Int]("sample_rate") == 8000 && w.getAs[Long]("n_frames") == 800L)
  }

  test("graft_five_num aggregates through SQL") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0)).toDF("k", "v")
      .createOrReplaceTempView("fivenum_in")
    val r = spark.sql(
      "SELECT s.min, s.q1, s.median, s.q3, s.max FROM " +
        "(SELECT graft_five_num(v) AS s FROM fivenum_in GROUP BY k)").head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 1.75 &&
      r.getDouble(2) == 2.5 && r.getDouble(3) == 3.25 && r.getDouble(4) == 4.0)
  }

  test("extensions class injects the same functions into a new session") {
    val s2 = spark.newSession()
    // newSession shares the function registry base; use the runtime path on
    // it to simulate the injection (constructor injection requires builder
    // config, exercised here through the same builder triples)
    GraftExtensions.functions.foreach { case (name, _, builder) =>
      s2.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    assert(s2.sql("SELECT graft_poly_hash('abc')").head().getLong(0) == 304891L)
  }
}
