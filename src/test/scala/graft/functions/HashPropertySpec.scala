package graft.functions

import graft.SparkSpec
import graft.llm.TextHash
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style tests: the compiled kernels must equal the HOF reference
  * semantics on arbitrary input, not just the benchmark corpus — including
  * multi-byte code points (both sides iterate by code point) and
  * repeated/short/whitespace-heavy strings. Uses raw ScalaCheck generators
  * with a fixed seed (scalatestplus bridge is not on the classpath). */
class HashPropertySpec extends SparkSpec {
  import spark.implicits._

  // mixed alphabet: ASCII letters, digits, space, punctuation, BMP unicode
  private val charGen: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.const(' '),
    1 -> Gen.oneOf('.', ',', '!', '-'),
    1 -> Gen.oneOf('é', 'ü', 'ß', 'λ', '中', '文'))

  private val textGen: Gen[String] =
    Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))

  /** 300 deterministic samples (fixed seed), non-blank (both formulations
    * assume non-empty trimmed input). */
  private lazy val samples: Seq[String] =
    Gen.listOfN(300, textGen)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(sys.error("generator failed"))
      .filter(_.trim.nonEmpty)

  private def assertAllOk(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = df.filter(not(col("ok"))).count()
    assert(bad == 0, s"$bad generated strings diverge between kernel and HOF")
  }

  test("polyHash kernel == HOF polyHash on arbitrary strings") {
    assertAllOk(samples.toDF("s").select(
      (HashFunctions.polyHash(col("s")) === TextHash.polyHash(col("s"))).as("ok")))
  }

  test("shingleHashes kernel == HOF hash set on arbitrary strings") {
    assertAllOk(samples.toDF("s").select(
      (array_sort(HashFunctions.shingleHashes(col("s"), 3)) ===
        array_sort(array_distinct(TextHash.hashAll(TextHash.charShingles(col("s"), 3)))))
        .as("ok")))
  }

  test("tokenHashes kernel == HOF token hashes on arbitrary strings") {
    assertAllOk(samples.toDF("s").select(
      (HashFunctions.tokenHashes(col("s")) ===
        TextHash.hashAll(TextHash.wordTokens(col("s")))).as("ok")))
  }

  test("posNgramHashes kernel == positional HOF n-gram hashes on arbitrary strings") {
    assertAllOk(samples.toDF("s").select(
      (HashFunctions.posNgramHashes(col("s"), 3) ===
        TextHash.posNgramHashes(TextHash.wordTokens(col("s")), 3)).as("ok")))
  }

  test("simhash kernel == HOF simhash on arbitrary strings") {
    assertAllOk(samples.toDF("s").select(
      (HashFunctions.simhash(col("s"), 24) ===
        TextHash.simhash(TextHash.hashAll(TextHash.wordTokens(col("s"))), 24)).as("ok")))
  }

  test("winnowHashes kernel == HOF winnow on arbitrary strings") {
    assertAllOk(samples.toDF("s").select(
      (HashFunctions.winnowHashes(col("s"), 3, 2) ===
        TextHash.winnowHashes(col("s"), 3, 2)).as("ok")))
  }

  test("winnowing guarantee: strings sharing a >=k+w-1 substring share a fingerprint") {
    // pairs (a, b) built around a common random core of length >= k+w-1
    val k = 5
    val w = 4
    val coreGen = Gen.chooseNum(k + w - 1, 30)
      .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    val pairGen = for {
      core <- coreGen
      pre <- Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)
      post <- Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)
    } yield (pre + core, core + post)
    val pairs = Gen.listOfN(200, pairGen)
      .apply(Gen.Parameters.default, Seed(7L))
      .getOrElse(sys.error("generator failed"))
    val overlap = pairs.toDF("a", "b").select(
      size(array_intersect(
        HashFunctions.winnowHashes(col("a"), k, w),
        HashFunctions.winnowHashes(col("b"), k, w))).as("shared"))
    assert(overlap.filter(col("shared") < 1).count() == 0,
      "a pair with a long shared substring produced disjoint fingerprint sets")
  }
}
