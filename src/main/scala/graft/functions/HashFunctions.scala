package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Column builders over the compiled hash kernels in [[GraftHashOps]].
  *
  * Each builder wraps a `StaticInvoke` Catalyst expression — the same
  * mechanism Spark's own object-serialization expressions use — so the
  * call compiles into generated code as a single static method invocation
  * (no UDF wrapping/boxing, no interpreted lambda trees). Deterministic,
  * null-propagating, non-nullable outputs.
  *
  * These are drop-in replacements for the HOF formulations in
  * [[graft.llm.TextHash]]; value equality between the two is pinned by
  * `HashFunctionsSpec` over the real test corpus.
  */
object HashFunctions {

  private val longArray = ArrayType(LongType, containsNull = false)

  private def invoke(name: String, dataType: DataType, args: Seq[Expression]): Column =
    ColumnBridge.column(StaticInvoke(
      GraftHashOps.getClass,
      dataType,
      name,
      args,
      propagateNull = true,
      returnNullable = false))

  private def e(c: Column): Expression = ColumnBridge.expression(c)

  /** Compiled [[graft.llm.TextHash.polyHash]]. */
  def polyHash(s: Column): Column =
    invoke("polyHash", LongType, Seq(e(s)))

  /** Compiled `array_distinct(hashAll(charShingles(s, k)))`. */
  def shingleHashes(s: Column, k: Int): Column =
    invoke("shingleHashes", longArray, Seq(e(s), Literal(k)))

  /** Compiled `hashAll(wordTokens(s))`. */
  def tokenHashes(s: Column): Column =
    invoke("tokenHashes", longArray, Seq(e(s)))

  /** Compiled `array_distinct(hashAll(wordNgrams(wordTokens(s), n)))`. */
  def ngramHashes(s: Column, n: Int): Column =
    invoke("ngramHashes", longArray, Seq(e(s), Literal(n)))

  /** Compiled `TextHash.posNgramHashes(wordTokens(s), n)` (positional,
    * duplicates kept). */
  def posNgramHashes(s: Column, n: Int): Column =
    invoke("posNgramHashes", longArray, Seq(e(s), Literal(n)))

  /** Compiled feature-hashing vectorizer (see
    * [[GraftHashOps.hashedFeatures]]): dim-bucket token-count vector. */
  def hashedFeatures(s: Column, dim: Int): Column =
    invoke("hashedFeatures", ArrayType(DoubleType, containsNull = false),
      Seq(e(s), Literal(dim)))

  /** Compiled [[graft.llm.TextHash.minhashSignature]]. */
  def minhashSignature(hashes: Column, perms: Int): Column =
    invoke("minhashSig", longArray, Seq(e(hashes), Literal(perms)))

  /** Compiled `simhash(hashAll(wordTokens(s)), bits)`. */
  def simhash(s: Column, bits: Int): Column =
    invoke("simhash", LongType, Seq(e(s), Literal(bits)))

  /** Compiled winnowing fingerprints (distinct sliding-window minima of
    * positional k-gram hashes, ascending). */
  def winnowHashes(s: Column, k: Int, w: Int): Column =
    invoke("winnowHashes", longArray, Seq(e(s), Literal(k), Literal(w)))

  /** Compiled largest multiplicity in a long array. */
  def topRunCount(a: Column): Column =
    invoke("topRunCount", IntegerType, Seq(e(a)))

  private def invokeVec(name: String, dataType: DataType, args: Seq[Expression]): Column =
    ColumnBridge.column(StaticInvoke(
      GraftVecOps.getClass,
      dataType,
      name,
      args,
      propagateNull = true,
      returnNullable = false))

  /** Compiled [[graft.llm.Similarity.dot]] (same fold order → same bits). */
  def dot(a: Column, b: Column): Column =
    invokeVec("dot", DoubleType, Seq(e(a), e(b)))

  /** Compiled squared euclidean distance (same fold order → same bits). */
  def sqDist(a: Column, b: Column): Column =
    invokeVec("sqDist", DoubleType, Seq(e(a), e(b)))

  /** Compiled [[graft.llm.Similarity.hyperplaneBucket]]. */
  def hyperplaneBucket(v: Column, nPlanes: Int): Column =
    invokeVec("hyperplaneBucket", LongType, Seq(e(v), Literal(nPlanes)))

  /** Compiled exact Jaccard over duplicate-free long-array sets. */
  def jaccardLong(a: Column, b: Column): Column =
    invokeVec("jaccardLong", DoubleType, Seq(e(a), e(b)))

  /** Compiled count of agreeing positions of two equal-length signatures
    * (MinHash Jaccard estimator numerator). */
  def sigAgreement(a: Column, b: Column): Column =
    invokeVec("sigAgreement", IntegerType, Seq(e(a), e(b)))

  private val doubleArray = ArrayType(DoubleType, containsNull = false)

  /** Compiled nearest-centroid argmin over a flattened literal matrix:
    * `[best_index, best_sqdist]` (see [[GraftVecOps.nearestSqDist]]). */
  def nearestSqDist(v: Column, centsFlat: Column, dim: Int): Column =
    invokeVec("nearestSqDist", doubleArray, Seq(e(v), e(centsFlat), Literal(dim)))

  /** Compiled highest-cosine centroid over a flattened literal matrix:
    * `[best_index, best_cosine]` (see [[GraftVecOps.bestCosine]]). */
  def bestCosine(v: Column, norm: Column, centsFlat: Column, norms: Column, dim: Int): Column =
    invokeVec("bestCosine", doubleArray,
      Seq(e(v), e(norm), e(centsFlat), e(norms), Literal(dim)))

  /** Compiled all-components PCA projection over literal mean/loading
    * matrices: array of k `proj_micros` longs (see
    * [[GraftVecOps.pcaProject]]). */
  def pcaProjectAll(v: Column, mu: Column, load: Column, dim: Int): Column =
    invokeVec("pcaProject", ArrayType(LongType, containsNull = false),
      Seq(e(v), e(mu), e(load), Literal(dim)))

  /** Compiled coarse-quantizer residual `v − cents[cell]` (see
    * [[GraftVecOps.residual]]). */
  def residual(v: Column, centsFlat: Column, cell: Column, dim: Int): Column =
    invokeVec("residual", doubleArray, Seq(e(v), e(centsFlat), e(cell), Literal(dim)))

  /** Output type of [[GraftVecOps.pcaMoments]]. */
  val PcaMomentsType: ArrayType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("x", LongType, nullable = false))), containsNull = false)

  /** Compiled PCA moment contributions of a micros-quantized vector
    * (errors on a length != dim). */
  def pcaMoments(q: Column, dim: Int): Column =
    invokeVec("pcaMoments", PcaMomentsType, Seq(e(q), Literal(dim)))

  /** Output type of [[GraftVecOps.semDup]]. */
  val SemDupType: ArrayType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("dup_of", LongType, nullable = false))), containsNull = false)

  /** Compiled cell-local SemDeDup scan (see [[GraftVecOps.semDup]]):
    * (sorted member ids, aligned vectors, tau) →
    * `array<struct<vec_id, dup_of>>` of removed members. */
  def semDupPairs(ids: Column, vecs: Column, tau: Double): Column =
    invokeVec("semDup", SemDupType, Seq(e(ids), e(vecs), Literal(tau)))

  /** Output schema of [[GraftHashOps.textStats]]; field names become the
    * column names when expanded with `inline`. */
  val TextStatsType: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct_tokens", IntegerType, nullable = false),
    StructField("n_bpeish_tokens", IntegerType, nullable = false),
    StructField("token_chars", LongType, nullable = false),
    StructField("distinct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("alpha_ratio", DoubleType, nullable = false)))

  /** Compiled one-pass text statistics (see
    * [[graft.llm.TextAnalysis.stats]]). */
  def textStats(s: Column, stopwords: Seq[String]): Column =
    invoke("textStats", TextStatsType,
      Seq(e(s), Literal.create(stopwords.mkString(","), StringType)))
}
