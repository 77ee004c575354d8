package graft.llm

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the r22 driver-side model arithmetic (nbTrain / nbPriors /
  * lmUnigrams build their dimension-sized tables on the driver) against
  * the SQL spelling it replaced: `StrictMath.log` must be exactly
  * Spark's `log` expression (both the interpreted eval and the codegen
  * template call java.lang.StrictMath.log — verified against the 4.1.2
  * bytecode), and `GraftVecOps.roundAsSpark` exactly its
  * `round(x)·cast(long)` chain. A single differing micro would flip the
  * driver's exact-hash oracle for the trained-model queries. */
class NbTrainDriverMathSpec extends SparkSpec {
  import spark.implicits._

  test("driver StrictMath.log + roundAsSpark == round(log(a/b)*1e6)::long, across magnitudes") {
    val rng = new Random(7)
    val cases = (1 to 4000).map { _ =>
      // numerators/denominators across the ranges the three model
      // builders produce: cnt+1 in [1, 1e6], denominators in [1, 5e6]
      (rng.nextInt(1000000).toLong, 1L + rng.nextInt(5000000))
    } ++ Seq((0L, 1L), (0L, 65L), (1L, 65L), (63L, 64L), (999999L, 1000063L))
    val got = cases.toDF("cnt", "denom")
      .select(col("cnt"), col("denom"),
        round(log((col("cnt") + lit(1L)).cast("double") / col("denom").cast("double")) * 1e6)
          .cast("long").as("sql_micros"))
      .collect()
    got.foreach { r =>
      val want = graft.functions.GraftVecOps.roundAsSpark(
        StrictMath.log((r.getLong(0) + 1L).toDouble / r.getLong(1).toDouble) * 1e6)
      assert(r.getLong(2) == want,
        s"cnt=${r.getLong(0)} denom=${r.getLong(1)}: sql=${r.getLong(2)} driver=$want")
    }
  }

  test("driver build == distributed SQL spelling for the reciprocal (lmUnigrams fallback) form") {
    val rng = new Random(42)
    val cases = (1 to 2000).map(_ => 1L + rng.nextInt(10000000))
    val got = cases.toDF("denom")
      .select(col("denom"),
        round(log(lit(1.0) / col("denom").cast("double")) * 1e6)
          .cast("long").as("sql_micros"))
      .collect()
    got.foreach { r =>
      val want = graft.functions.GraftVecOps.roundAsSpark(
        StrictMath.log(1.0 / r.getLong(0).toDouble) * 1e6)
      assert(r.getLong(1) == want, s"denom=${r.getLong(0)}")
    }
  }
}
