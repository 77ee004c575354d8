package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The ±1-micro tolerance POLICY behind the model-table oracle echoes
  * (`LlmQueries.lnToleranceEcho`, closing ADVICE r16 #3): the `q_nb_train`
  * / `q_lm_train` / `q_collocations` oracles verify each `round(ln·1e6)`
  * entry within one micro of DuckDB's independent recomputation and echo
  * the Spark rows on success, so a legal 1-ulp libm disagreement at a
  * `.5` boundary can no longer flake the exact-hash gate while any real
  * defect still fails it. This spec pins the two facts the policy rests
  * on; [[LnBoundaryMarginSpec]] separately MEASURES that no shipped model
  * entry is anywhere near a boundary (the belt to this suspender). */
class LnBoundarySpec extends SparkSpec {

  test("two 1-ulp-apart log implementations quantize at most one micro apart " +
    "(the tolerance the model oracles carry)") {
    // Math.log and StrictMath.log are distinct implementations, each
    // within 1 ulp of the true value — the same relationship either JVM
    // log has to DuckDB's libm. Over a dense grid of the small-integer
    // ratios these models actually produce, their quantizations must
    // never differ by more than the oracle's ±1 micro.
    var maxDiff = 0L
    var closest = Double.MaxValue
    var p = 1L
    while (p <= 512) {
      var q = p + 1
      while (q <= 4096) {
        val a = math.round(StrictMath.log(p.toDouble / q) * 1e6)
        val b = math.round(Math.log(p.toDouble / q) * 1e6)
        val d = math.abs(a - b)
        if (d > maxDiff) maxDiff = d
        val micros = StrictMath.log(p.toDouble / q) * 1e6
        val frac = micros - math.floor(micros)
        val m = math.abs(frac - 0.5)
        if (m < closest) closest = m
        q += 1
      }
      p += 1
    }
    info(f"grid max cross-impl quantization diff=$maxDiff, closest boundary " +
      f"approach=$closest%.2e micros")
    assert(maxDiff <= 1L, s"two in-spec log implementations quantized $maxDiff " +
      "micros apart — the ±1 tolerance policy is insufficient")
  }

  test("the quantization rounds half away from zero on both engines' rule") {
    // Spark round() (BigDecimal HALF_UP on magnitude) and DuckDB round()
    // both take -2.5 -> -3: pin the Spark side so a regression in either
    // direction surfaces as a named failure, not an oracle mystery.
    import spark.implicits._
    val out = Seq(-2.5, -1.5, 2.5, 1.5).toDF("x")
      .select(round(col("x")).as("r")).as[Double].collect().toSeq
    assert(out == Seq(-3.0, -2.0, 3.0, 2.0))
  }
}
