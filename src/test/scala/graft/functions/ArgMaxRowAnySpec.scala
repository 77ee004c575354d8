package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** [[ArgMaxRowAny]] must be value-identical to `max(struct(ordering...))`
  * with the payload read from the struct — including var-length (string)
  * ordering fields, which the scalar-slot [[ArgMaxRow]] cannot hash — and
  * must plan as ObjectHashAggregate, never SortAggregate. The input is
  * spread over several partitions so partial buffers serialize across the
  * exchange (exercising serialize/deserialize/merge). */
class ArgMaxRowAnySpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(Int, java.lang.Integer, Double, String)]): DataFrame =
    rows.toDF("g", "a", "b", "p").repartition(5)

  private def both(df: DataFrame): (Set[(Int, Int, String)], Set[(Int, Int, String)]) = {
    val viaStruct = df.groupBy("g")
      .agg(max(struct(col("a"), col("b"), col("p"))).as("m"))
      .select(col("g"), col("m.a"), col("m.p"))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) Int.MinValue else r.getInt(1), r.getString(2))).toSet
    val viaArgMax = df.groupBy("g")
      .agg(ArgMaxRowAny(
        Seq(col("a"), col("b"), col("p")),
        Seq("a" -> 0, "p" -> 2)).as("m"))
      .select(col("g"), col("m.a"), col("m.p"))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) Int.MinValue else r.getInt(1), r.getString(2))).toSet
    (viaStruct, viaArgMax)
  }

  test("plain rows incl. string ordering: matches max(struct) per group") {
    val (s, a) = both(frame(Seq(
      (1, 3, 1.0, "x"), (1, 7, 0.5, "y"), (1, 7, 0.5, "z"),
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

  test("string tiebreak: greatest UTF-8 payload wins, like struct max") {
    val (s, a) = both(frame(Seq(
      (1, 4, 2.0, "aaa"), (1, 4, 2.0, "zzz"), (1, 4, 2.0, "mmm"))))
    assert(a == s && a == Set((1, 4, "zzz")))
  }

  test("ungrouped aggregation over an empty frame yields null") {
    val df = frame(Seq((1, 1, 1.0, "x"))).filter(col("g") === 999)
    val out = df.agg(ArgMaxRowAny(Seq(col("p")), Seq("p" -> 0)).as("m")).collect()
    assert(out.length == 1 && out(0).isNullAt(0))
  }

  test("plans as ObjectHashAggregate (both sides), never SortAggregate") {
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case ad: AdaptiveSparkPlanExec => flatten(ad.inputPlan)
      case other => other.children.flatMap(flatten)
    })
    val df = frame(Seq((1, 1, 1.0, "x"), (2, 2, 2.0, "y")))
      .groupBy("g")
      .agg(ArgMaxRowAny(Seq(col("a"), col("p")), Seq("p" -> 1)).as("m"))
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(nodes.count(_.isInstanceOf[ObjectHashAggregateExec]) == 2)
    assert(!nodes.exists(_.isInstanceOf[SortAggregateExec]))
  }
}
