package graft.llm

import graft.SparkSpec

/** The NB/LM model tables quantize `ln(x)` to integer micros
  * (`round(ln(x)·1e6)`), and the DuckDB oracle recomputes the same
  * expression with a DIFFERENT libm: neither engine's `ln` is correctly
  * rounded, so agreement is only guaranteed when no trained entry lands
  * within the engines' ulp disagreement (~1e-9 relative) of a `.5`
  * micros boundary. This spec turns that assumption into a measurement:
  * for EVERY entry of every trained model table on the driver-gate
  * corpora it recomputes the pre-rounding double from the integer count
  * columns and asserts the distance to the nearest `.5` boundary
  * exceeds 1e-3 micros — six orders of magnitude above any plausible
  * libm divergence, and it checks `Math.log` and `StrictMath.log`
  * (fdlibm) round to the same long, a cheap proxy for "any conforming
  * libm agrees here". A future corpus/model change that parks an entry
  * near a boundary fails HERE with the offending entry named, instead
  * of flaking the driver's exact-hash gate. */
class LnBoundaryMarginSpec extends SparkSpec {

  // Scale calibration: |ln| here is ~3.3, so a 1-ulp double error is
  // ~7e-16 absolute, i.e. ~7e-10 MICROS after the 1e6 scaling; a few
  // ulps of libm disagreement stays under ~1e-8 micros. The measured
  // minimum margin on the gate corpora is ~2.3e-4 micros (sf0.001
  // bi(table,a)), so 1e-5 is ~1000x above any plausible divergence
  // while ~20x below the closest real entry.
  private val MinMargin = 1e-5 // micros distance from the .5 boundary

  /** Distance of ln(num/den)*1e6 from its nearest .5 rounding boundary,
    * plus the Math/StrictMath rounding agreement. */
  private def check(what: String, num: Double, den: Double): Double = {
    val v = Math.log(num / den) * 1e6
    val vs = StrictMath.log(num / den) * 1e6
    assert(Math.round(v) == Math.round(vs),
      s"$what: Math.log and StrictMath.log round differently ($v vs $vs)")
    val frac = v - Math.floor(v)
    val margin = Math.abs(frac - 0.5)
    assert(margin > MinMargin,
      s"$what: ln quantization margin $margin <= $MinMargin (value $v) — " +
        "this entry could hash-diverge between JVM and DuckDB libm")
    margin
  }

  private def corpora: Seq[String] =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())

  test("every trained NB model entry is far from its rounding boundary") {
    for (dir <- corpora) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val model = Classify.nbTrain(docs, "doc_id", "text", "lang").collect()
      // reconstruct t_l and V from the emitted dense grid itself
      val byLabel = model.groupBy(_.getString(0))
      val vSize = model.map(_.getString(1)).distinct.length
      var worst = Double.MaxValue
      byLabel.foreach { case (label, rows) =>
        val tL = rows.map(_.getLong(2)).sum
        rows.foreach { r =>
          worst = math.min(worst, check(s"$dir nb($label,${r.getString(1)})",
            (r.getLong(2) + 1).toDouble, (tL + vSize).toDouble))
        }
      }
      val priors = Classify.nbPriors(docs, "lang").collect()
      val nTotal = priors.map(_.getLong(1)).sum
      priors.foreach { r =>
        worst = math.min(worst,
          check(s"$dir prior(${r.getString(0)})", r.getLong(1).toDouble, nTotal.toDouble))
      }
      info(s"$dir NB worst margin: $worst micros")
    }
  }

  test("every trained LM model entry is far from its rounding boundary") {
    for (dir <- corpora) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val uni = LangModel.lmUnigrams(docs, "doc_id", "text").collect()
      val v = uni.length
      var worst = Double.MaxValue
      uni.foreach { r =>
        worst = math.min(worst,
          check(s"$dir uni(${r.getString(0)})", 1.0, (r.getLong(1) + v).toDouble))
      }
      val c1 = uni.map(r => r.getString(0) -> r.getLong(1)).toMap
      LangModel.lmBigrams(docs, "doc_id", "text").collect().foreach { r =>
        worst = math.min(worst,
          check(s"$dir bi(${r.getString(0)},${r.getString(1)})",
            (r.getLong(2) + 1).toDouble, (c1(r.getString(0)) + v).toDouble))
      }
      info(s"$dir LM worst margin: $worst micros")
    }
  }
}
