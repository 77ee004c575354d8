package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trainable naive-Bayes classifier: model math, vocab cap, argmax
  * tiebreak, and the train/score split. */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // 3 "en" docs dominated by 'alpha', 2 "de" docs dominated by 'beta'
  private val docs = Seq(
    (1L, "alpha alpha beta", "en"),
    (2L, "alpha gamma", "en"),
    (3L, "alpha alpha alpha", "en"),
    (4L, "beta beta gamma", "de"),
    (5L, "beta beta beta alpha", "de")).toDF("doc_id", "text", "lang")

  test("nbTrain: dense grid with hand-computed smoothed micro-log likelihoods") {
    val m = Classify.nbTrain(docs, "doc_id", "text", "lang")
      .as[(String, String, Long, Long)].collect()
      .map { case (l, t, c, ll) => (l, t) -> (c, ll) }.toMap
    // vocab = {alpha: 7, beta: 6, gamma: 2}; V=3
    // en totals: alpha 6, beta 1, gamma 1 -> T_en = 8
    // de totals: alpha 1, beta 5, gamma 1 -> T_de = 7
    assert(m.size == 6) // dense: 2 labels x 3 vocab tokens
    assert(m(("en", "alpha"))._1 == 6L && m(("de", "beta"))._1 == 5L)
    def micros(c: Long, t: Long): Long =
      math.round(math.log((c + 1).toDouble / (t + 3).toDouble) * 1e6)
    assert(m(("en", "alpha"))._2 == micros(6, 8))
    assert(m(("en", "beta"))._2 == micros(1, 8))
    assert(m(("de", "gamma"))._2 == micros(1, 7))
  }

  test("nbTrain: vocab cap keeps top-V by count with token-asc ties") {
    val m = Classify.nbTrain(docs, "doc_id", "text", "lang", vocabSize = 2)
    // counts: alpha 7, beta 6, gamma 2 -> cap at 2 keeps alpha, beta
    assert(m.select("token").distinct().as[String].collect().toSet == Set("alpha", "beta"))
    // tie at the cap boundary: all counts equal -> lexicographic keeps 'aa', 'bb'
    val tied = Seq((1L, "bb aa cc", "x"), (2L, "cc aa bb", "x")).toDF("doc_id", "text", "lang")
    val tm = Classify.nbTrain(tied, "doc_id", "text", "lang", vocabSize = 2)
    assert(tm.select("token").distinct().as[String].collect().toSet == Set("aa", "bb"))
  }

  test("nbClassify: per-doc integer scores and (score desc, label asc) argmax") {
    val out = Classify.nbClassify(docs, "doc_id", "text", "lang", passThrough = Seq("lang"))
      .as[(Long, String, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 5)
    // hand-compute doc 3 ("alpha alpha alpha"):
    //   en: prior ln(3/5) + 3*ln(7/11); de: prior ln(2/5) + 3*ln(2/10)
    def mic(x: Double): Long = math.round(x * 1e6)
    val en3 = mic(math.log(3.0 / 5)) + 3 * mic(math.log(7.0 / 11))
    val de3 = mic(math.log(2.0 / 5)) + 3 * mic(math.log(2.0 / 10))
    assert(en3 > de3 && out(3L)._3 == "en" && out(3L)._4 == en3)
    // doc 4 ("beta beta gamma") leans de
    assert(out(4L)._3 == "de")
    // the true label rides through untouched
    assert(out(1L)._2 == "en" && out(5L)._2 == "de")
  }

  test("nbClassify: exact score tie breaks to the smallest label") {
    // symmetric corpus: scores for both labels are mirror-identical on a
    // symmetric test doc, so the argmax must take the label-asc branch
    val sym = Seq(
      (1L, "aa", "l1"), (2L, "bb", "l2"), (3L, "aa bb", "l1"), (4L, "aa bb", "l2"))
      .toDF("doc_id", "text", "lang")
    val out = Classify.nbClassify(sym, "doc_id", "text", "lang")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(3L)._2 == "l1" && out(4L)._2 == "l1")
  }

  test("nbScoreWith: scoring a fresh corpus against a persisted model; OOV tokens skipped") {
    val model = Classify.nbTrain(docs, "doc_id", "text", "lang")
    val priors = Classify.nbPriors(docs, "lang")
    val fresh = Seq((10L, "alpha alpha unseen"), (11L, "zzz qqq")).toDF("doc_id", "text")
    val out = Classify.nbScoreWith(fresh, "doc_id", "text", model, priors)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(10L)._2 == "en") // 'unseen' is OOV -> contributes nothing
    // all-OOV doc scores = priors alone -> majority label wins
    assert(out(11L)._3 == math.round(math.log(3.0 / 5) * 1e6) && out(11L)._2 == "en")
  }

  test("nbTrain: null labels are excluded from the model and the priors") {
    val withNull = docs.union(Seq((6L, "alpha", null: String)).toDF("doc_id", "text", "lang"))
    assert(Classify.nbTrain(withNull, "doc_id", "text", "lang")
      .select("label").distinct().as[String].collect().toSet == Set("en", "de"))
    assert(Classify.nbPriors(withNull, "lang")
      .filter(col("label") === "en").select("n_docs").as[Long].head() == 3L)
  }
}
