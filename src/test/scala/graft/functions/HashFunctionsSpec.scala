package graft.functions

import graft.SparkSpec
import graft.llm.TextHash
import org.apache.spark.sql.functions._

/** Pins the compiled StaticInvoke kernels to the HOF reference semantics
  * (which are what the DuckDB oracle mirrors) over the REAL test corpus —
  * any divergence here would silently break the correctness gate. */
class HashFunctionsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def assertAllEqual(cmp: org.apache.spark.sql.DataFrame): Unit = {
    val bad = cmp.filter(not(col("ok"))).count()
    assert(bad == 0, s"$bad documents diverge between kernel and HOF")
  }

  test("polyHash kernel == HOF polyHash on every document") {
    assertAllEqual(docs.select(
      (HashFunctions.polyHash(col("text")) === TextHash.polyHash(col("text"))).as("ok")))
  }

  test("shingleHashes kernel == distinct HOF shingle hashes (as sets) on every document") {
    assertAllEqual(docs.select(
      (array_sort(HashFunctions.shingleHashes(col("text"), 5)) ===
        array_sort(array_distinct(TextHash.hashAll(TextHash.charShingles(col("text"), 5)))))
        .as("ok")))
  }

  test("tokenHashes kernel == HOF token hashes (ordered, with multiplicity)") {
    assertAllEqual(docs.select(
      (HashFunctions.tokenHashes(col("text")) ===
        TextHash.hashAll(TextHash.wordTokens(col("text")))).as("ok")))
  }

  test("posNgramHashes kernel == positional HOF word-5-gram hashes (ordered)") {
    assertAllEqual(docs.select(
      (HashFunctions.posNgramHashes(col("text"), 5) ===
        TextHash.posNgramHashes(TextHash.wordTokens(col("text")), 5)).as("ok")))
  }

  test("ngramHashes kernel == distinct HOF word-3-gram hashes (as sets)") {
    assertAllEqual(docs.select(
      (array_sort(HashFunctions.ngramHashes(col("text"), 3)) ===
        array_sort(array_distinct(TextHash.hashAll(
          TextHash.wordNgrams(TextHash.wordTokens(col("text")), 3))))).as("ok")))
  }

  test("minhashSignature kernel == HOF signature over kernel hashes") {
    assertAllEqual(docs.select(
      (HashFunctions.minhashSignature(HashFunctions.shingleHashes(col("text"), 5), 64) ===
        TextHash.minhashSignature(HashFunctions.shingleHashes(col("text"), 5), 64)).as("ok")))
  }

  test("textStats kernel == expression formulation on every document") {
    import graft.llm.TextAnalysis.Stopwords
    val t = col("text")
    val tokens = TextHash.wordTokens(t)
    val nTokens = size(tokens)
    val expected = docs.select(
      col("doc_id"),
      length(t).as("n_chars"),
      nTokens.as("n_tokens"),
      size(array_distinct(tokens)).as("n_distinct_tokens"),
      size(graft.llm.TextAnalysis.bpeishTokens(t)).as("n_bpeish_tokens"),
      aggregate(tokens, lit(0L), (acc, x) => acc + length(x)).as("token_chars"),
      (size(array_distinct(tokens)).cast("double") / nTokens).as("distinct_ratio"),
      (size(filter(tokens, w => w.isin(Stopwords: _*))).cast("double") / nTokens)
        .as("stopword_ratio"),
      ((length(t) - length(regexp_replace(t, "[a-z]", ""))).cast("double") / length(t))
        .as("alpha_ratio"))
    val got = graft.llm.TextAnalysis.stats(docs, "doc_id", "text")
    assert(got.exceptAll(expected).count() == 0 && expected.exceptAll(got).count() == 0)
  }

  test("sigAgreement kernel == zip_with equality count between signature pairs") {
    // compare each doc's signature against a shifted variant (different
    // perm family) so agreement is neither 0 nor perms everywhere
    val sigA = HashFunctions.minhashSignature(HashFunctions.shingleHashes(col("text"), 5), 64)
    val sigB = HashFunctions.minhashSignature(HashFunctions.shingleHashes(col("text"), 4), 64)
    assertAllEqual(docs.select(
      (HashFunctions.sigAgreement(sigA, sigB) ===
        size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))).as("ok")))
  }

  test("sigAgreement of a signature with itself is perms") {
    val sig = HashFunctions.minhashSignature(HashFunctions.shingleHashes(col("text"), 5), 64)
    assertAllEqual(docs.select((HashFunctions.sigAgreement(sig, sig) === 64).as("ok")))
  }

  test("winnowHashes kernel == HOF winnow formulation on every document") {
    assertAllEqual(docs.select(
      (HashFunctions.winnowHashes(col("text"), 8, 4) ===
        TextHash.winnowHashes(col("text"), 8, 4)).as("ok")))
  }

  test("winnowHashes is empty below k+w-1 chars and a subset of gram hashes above") {
    assertAllEqual(docs.select(
      (when(length(col("text")) < 11, size(HashFunctions.winnowHashes(col("text"), 8, 4)) === 0)
        .otherwise(size(array_except(
          HashFunctions.winnowHashes(col("text"), 8, 4),
          TextHash.gramHashes(col("text"), 8))) === 0)).as("ok")))
  }

  test("topRunCount kernel == explode/groupBy max multiplicity on every document") {
    val viaGroupBy = docs
      .select(col("doc_id"), explode(HashFunctions.tokenHashes(col("text"))).as("h"))
      .groupBy("doc_id", "h").count()
      .groupBy("doc_id").agg(max("count").cast("int").as("want"))
    val viaKernel = docs.select(col("doc_id"),
      HashFunctions.topRunCount(HashFunctions.tokenHashes(col("text"))).as("got"))
    val joined = viaKernel.join(viaGroupBy, Seq("doc_id"))
    assert(joined.filter(col("got") =!= col("want")).count() == 0)
    assert(joined.count() == docs.count())
  }

  test("simhash kernel == HOF simhash on every document") {
    assertAllEqual(docs.select(
      (HashFunctions.simhash(col("text"), 24) ===
        TextHash.simhash(TextHash.hashAll(TextHash.wordTokens(col("text"))), 24)).as("ok")))
  }
}
