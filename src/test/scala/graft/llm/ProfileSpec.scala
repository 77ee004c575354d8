package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profiles numeric and string columns in one pass") {
    val df = Seq(
      (1L, Some("aa"), Some(10L)),
      (2L, Some("bb"), None),
      (3L, None, Some(30L)),
      (4L, Some("aa"), Some(10L))
    ).toDF("id", "s", "v")
    val out = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap

    val id = out("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0)          // n_rows, n_nulls
    assert(id.getLong(3) == 4 && id.getBoolean(4))            // distinct exact
    assert(id.getDouble(5) == 1.0 && id.getDouble(6) == 4.0)  // min/max_num
    assert(id.isNullAt(7) && id.isNullAt(8) && id.isNullAt(9))

    val s = out("s")
    assert(s.getLong(1) == 4 && s.getLong(2) == 1)
    assert(s.getLong(3) == 2 && s.getBoolean(4))
    assert(s.isNullAt(5) && s.isNullAt(6))
    assert(s.getString(7) == "aa" && s.getString(8) == "bb")
    assert(s.getLong(9) == 6)                                  // 3 × len 2

    val v = out("v")
    assert(v.getLong(2) == 1 && v.getLong(3) == 2)
    assert(v.getDouble(5) == 10.0 && v.getDouble(6) == 30.0)
  }

  test("estimate path engages above sketch capacity and stays deterministic") {
    val df = (0 until 5000).map(i => s"tok_$i").toDF("t")
    val r1 = Profile.profile(df, kmvK = 64).collect().head
    val r2 = Profile.profile(df.repartition(7), kmvK = 64).collect().head
    assert(!r1.getBoolean(4))
    assert(r1.getLong(3) == r2.getLong(3), "estimate must be partition-invariant")
    // order-statistics estimator: loose band, exactness is the gate's job
    assert(r1.getLong(3) > 2500 && r1.getLong(3) < 10000)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("merged per-drop states equal the one-pass profile — exact path") {
    val df = Seq(
      (1L, Some("aa"), Some(10L)),
      (2L, Some("bb"), None),
      (3L, None, Some(30L)),
      (4L, Some("aa"), Some(10L)),
      (5L, Some("cc"), Some(-2L))
    ).toDF("id", "s", "v")
    val drops = Seq(
      df.filter($"id" <= 2), df.filter($"id" === 3), df.filter($"id" >= 4))
    val merged = Profile.merge(drops.map(Profile.state(_)))
    assert(canon(merged) == canon(Profile.profile(df)))
  }

  test("merged states equal the one-pass profile — estimate path, any split") {
    val df = (0 until 5000).map(i => (i.toLong, s"tok_${i % 997}")).toDF("id", "t")
    val whole = canon(Profile.profile(df, kmvK = 64))
    for (nDrops <- Seq(2, 5)) {
      val states = (0 until nDrops).map(d =>
        Profile.state(df.filter(pmod($"id", lit(nDrops)) === d), kmvK = 64))
      assert(canon(Profile.merge(states, kmvK = 64)) == whole,
        s"merge of $nDrops drops must be bit-identical to the one-pass profile")
    }
  }

  test("merge absorbs an empty drop and is order-insensitive") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "t")
    val empty = Profile.state(df.filter($"id" < 0))
    val s1 = Profile.state(df.filter($"id" === 1))
    val s2 = Profile.state(df.filter($"id" === 2))
    val whole = canon(Profile.profile(df))
    assert(canon(Profile.merge(Seq(empty, s1, s2))) == whole)
    assert(canon(Profile.merge(Seq(s2, s1, empty))) == whole)
  }

  test("state round-trips through parquet (the persisted-drop shape)") {
    val df = (0 until 300).map(i => (i.toLong, s"w${i % 41}")).toDF("id", "t")
    val dir = java.nio.file.Files.createTempDirectory("profstate").toString
    Profile.state(df.filter($"id" < 150)).write.parquet(s"$dir/d0")
    Profile.state(df.filter($"id" >= 150)).write.parquet(s"$dir/d1")
    val merged = Profile.merge(Seq(
      spark.read.parquet(s"$dir/d0"), spark.read.parquet(s"$dir/d1")))
    assert(canon(merged) == canon(Profile.profile(df)))
  }

  test("column subset and guards") {
    val df = Seq((1L, "x", Seq(1.0))).toDF("id", "s", "arr")
    assert(Profile.profile(df, columns = Seq("id", "s")).count() == 2)
    intercept[IllegalArgumentException] {
      Profile.profile(df, columns = Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      Profile.profile(df) // array column unsupported
    }
  }
}
