package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[ArgMaxRow]] must be value-identical to `max(struct(ordering...))`
  * with the payload read from the struct — on ties, nulls in ordering
  * fields, NaN doubles, and across partial/final merges (the input is
  * spread over several partitions so the merge path always runs). */
class ArgMaxRowSpec extends SparkSpec {
  import spark.implicits._

  /** (group, a int-or-null, b double (may be NaN), payload string) */
  private def frame(rows: Seq[(Int, java.lang.Integer, Double, String)]): DataFrame =
    rows.toDF("g", "a", "b", "p").repartition(5)

  private def both(df: DataFrame): (Set[(Int, Int, String)], Set[(Int, Int, String)]) = {
    val viaStruct = df.groupBy("g")
      .agg(max(struct(col("a"), col("b"), col("p"))).as("m"))
      .select(col("g"), col("m.a"), col("m.p"))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) Int.MinValue else r.getInt(1), r.getString(2))).toSet
    val viaArgMax = df.groupBy("g")
      .agg(ArgMaxRow(
        Seq(col("a"), col("b"), col("p")),
        Seq("a" -> 0, "p" -> 2)).as("m"))
      .select(col("g"), col("m.a"), col("m.p"))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) Int.MinValue else r.getInt(1), r.getString(2))).toSet
    (viaStruct, viaArgMax)
  }

  test("plain rows: argmax matches max(struct) per group") {
    val (s, a) = both(frame(Seq(
      (1, 3, 1.0, "x"), (1, 7, 0.5, "y"), (1, 7, 0.4, "z"),
      (2, -1, 2.0, "q"), (2, -1, 2.5, "r"))))
    assert(a == s)
  }

  test("null ordering fields sort smallest, exactly like struct max") {
    val (s, a) = both(frame(Seq(
      (1, null, 9.0, "null-a"), (1, 0, 0.0, "zero-a"),
      (2, null, 1.0, "only-null-1"), (2, null, 2.0, "only-null-2"))))
    assert(a == s)
  }

  test("NaN compares greatest, exactly like struct max") {
    val (s, a) = both(frame(Seq(
      (1, 5, Double.NaN, "nan"), (1, 5, Double.MaxValue, "maxval"),
      (2, 1, Double.NaN, "nan-lo"), (2, 2, 0.0, "hi-a"))))
    assert(a == s)
  }

  test("full-tuple ties collapse to the same single value") {
    val (s, a) = both(frame(Seq.fill(8)((1, 4: java.lang.Integer, 2.0, "same"))))
    assert(a == s && a.size == 1)
  }

  test("descending keys via negation reproduce a windowed top-1") {
    // argmax over (-a, b) == row_number ordered by (a asc, b desc) == 1
    val df = frame(Seq(
      (1, 1, 5.0, "a1-b5"), (1, 1, 9.0, "a1-b9"), (1, 2, 99.0, "a2"),
      (2, 7, 1.0, "only")))
    val got = df.groupBy("g")
      .agg(ArgMaxRow(Seq(-col("a"), col("b"), col("p")), Seq("p" -> 2)).as("m"))
      .select(col("g"), col("m.p")).as[(Int, String)].collect().toSet
    assert(got == Set((1, "a1-b9"), (2, "only")))
  }

  test("ungrouped aggregation over an empty frame yields null") {
    val df = frame(Seq((1, 1, 1.0, "x"))).filter(col("g") === 999)
    val out = df.agg(ArgMaxRow(Seq(col("a")), Seq("a" -> 0)).as("m")).collect()
    assert(out.length == 1 && out(0).isNullAt(0))
  }
}
