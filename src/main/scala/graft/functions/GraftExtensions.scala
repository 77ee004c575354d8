package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

/** SQL surface for the compiled kernels: `graft_*` functions usable from
  * `spark.sql(...)` / `expr(...)`.
  *
  * Two registration paths:
  *  - cluster deployment: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (constructor injection, the canonical `SparkSessionExtensions` hook);
  *  - existing session: `GraftExtensions.register(spark)` (runtime
  *    FunctionRegistry registration — e.g. notebooks, tests).
  *
  * Each builder validates its fixed-arity arguments and delegates to the
  * same `StaticInvoke` expressions as [[HashFunctions]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // plan rewrite: N exact quartile buffers -> one FiveNumberSummary
    // (on a live session: spark.experimental.extraOptimizations instead)
    ext.injectOptimizerRule(_ => graft.plans.CollapsePercentiles)
    // physical rewrite: adjacent partial+final aggregate (exchange already
    // elided by a scan-reported or repartition clustering) -> one
    // complete-mode pass. Injected on both physical paths: query-stage
    // prep covers AQE plans, the columnar hook covers non-AQE plans
    // (idempotent, so double application is a no-op).
    ext.injectQueryStagePrepRule(_ => graft.plans.CompleteClusteredAggregate)
    ext.injectColumnar(_ => new org.apache.spark.sql.execution.ColumnarRule {
      override def preColumnarTransitions = graft.plans.CompleteClusteredAggregate
    })
  }
}

object GraftExtensions {

  private val longArray = ArrayType(LongType, containsNull = false)

  private def invoke(obj: Class[_], name: String, dt: DataType, args: Seq[Expression]): Expression =
    StaticInvoke(obj, dt, name, args, propagateNull = true, returnNullable = false)

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  private def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n, s"$name expects $n arguments, got ${args.length}")

  /** (name, info, builder) triples for every exposed function. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_poly_hash",
      info("graft_poly_hash", "portable polynomial hash (base 31 mod 1e9+7) of a string"),
      (args: Seq[Expression]) => {
        arity("graft_poly_hash", 1, args)
        invoke(GraftHashOps.getClass, "polyHash", LongType, args)
      }),
    ("graft_shingle_hashes",
      info("graft_shingle_hashes", "distinct char-k-gram hashes of a string: (text, k)"),
      (args: Seq[Expression]) => {
        arity("graft_shingle_hashes", 2, args)
        invoke(GraftHashOps.getClass, "shingleHashes", longArray, args)
      }),
    ("graft_token_hashes",
      info("graft_token_hashes", "whitespace-token hashes of a string, with multiplicity"),
      (args: Seq[Expression]) => {
        arity("graft_token_hashes", 1, args)
        invoke(GraftHashOps.getClass, "tokenHashes", longArray, args)
      }),
    ("graft_minhash",
      info("graft_minhash", "minhash signature of a hash array: (hashes, perms)"),
      (args: Seq[Expression]) => {
        arity("graft_minhash", 2, args)
        invoke(GraftHashOps.getClass, "minhashSig", longArray, args)
      }),
    ("graft_simhash",
      info("graft_simhash", "simhash fingerprint of a string: (text, bits)"),
      (args: Seq[Expression]) => {
        arity("graft_simhash", 2, args)
        invoke(GraftHashOps.getClass, "simhash", LongType, args)
      }),
    ("graft_dot",
      info("graft_dot", "sequential-fold dot product of two double arrays"),
      (args: Seq[Expression]) => {
        arity("graft_dot", 2, args)
        invoke(GraftVecOps.getClass, "dot", DoubleType, args)
      }),
    ("graft_sqdist",
      info("graft_sqdist", "sequential-fold squared euclidean distance of two double arrays"),
      (args: Seq[Expression]) => {
        arity("graft_sqdist", 2, args)
        invoke(GraftVecOps.getClass, "sqDist", DoubleType, args)
      }),
    ("graft_jaccard",
      info("graft_jaccard", "exact Jaccard of two duplicate-free long-array sets"),
      (args: Seq[Expression]) => {
        arity("graft_jaccard", 2, args)
        invoke(GraftVecOps.getClass, "jaccardLong", DoubleType, args)
      }),
    ("graft_hyperplane_bucket",
      info("graft_hyperplane_bucket", "sign-bit LSH bucket of a double array: (vec, planes)"),
      (args: Seq[Expression]) => {
        arity("graft_hyperplane_bucket", 2, args)
        invoke(GraftVecOps.getClass, "hyperplaneBucket", LongType, args)
      }),
    ("graft_sig_agreement",
      info("graft_sig_agreement", "agreeing positions of two equal-length signatures (minhash Jaccard estimator numerator)"),
      (args: Seq[Expression]) => {
        arity("graft_sig_agreement", 2, args)
        invoke(GraftVecOps.getClass, "sigAgreement", IntegerType, args)
      }),
    ("graft_pos_ngram_hashes",
      info("graft_pos_ngram_hashes",
        "positional word-n-gram hashes of a string, duplicates kept: (text, n)"),
      (args: Seq[Expression]) => {
        arity("graft_pos_ngram_hashes", 2, args)
        invoke(GraftHashOps.getClass, "posNgramHashes", longArray, args)
      }),
    ("graft_winnow",
      info("graft_winnow", "winnowing fingerprints of a string: (text, k, w)"),
      (args: Seq[Expression]) => {
        arity("graft_winnow", 3, args)
        invoke(GraftHashOps.getClass, "winnowHashes", longArray, args)
      }),
    ("graft_top_run",
      info("graft_top_run", "largest multiplicity in a long array (top-token count)"),
      (args: Seq[Expression]) => {
        arity("graft_top_run", 1, args)
        invoke(GraftHashOps.getClass, "topRunCount", IntegerType, args)
      }),
    ("graft_html_text",
      info("graft_html_text",
        "GRAFT-HTML-TEXT v1 visible-text extraction from an HTML string"),
      (args: Seq[Expression]) => {
        arity("graft_html_text", 1, args)
        invoke(GraftHtmlOps.getClass, "htmlText", StringType, args)
      }),
    ("graft_nfc",
      info("graft_nfc", "Unicode NFC normalization (UAX #15) of a string"),
      (args: Seq[Expression]) => {
        arity("graft_nfc", 1, args)
        invoke(GraftUnicodeOps.getClass, "nfc", StringType, args)
      }),
    ("graft_nfkc",
      info("graft_nfkc", "Unicode NFKC normalization (compatibility folding) of a string"),
      (args: Seq[Expression]) => {
        arity("graft_nfkc", 1, args)
        invoke(GraftUnicodeOps.getClass, "nfkc", StringType, args)
      }),
    ("graft_url_host",
      info("graft_url_host", "GRAFT-URL v1 host of a URL (lowercased; NULL when absent)"),
      (args: Seq[Expression]) => {
        arity("graft_url_host", 1, args)
        StaticInvoke(GraftUrlOps.getClass, StringType, "urlHost", args,
          propagateNull = true, returnNullable = true)
      }),
    ("graft_url_canon",
      info("graft_url_canon",
        "GRAFT-URL-CANON v1 canonical form (dedup key) of a URL; NULL unless scheme+host parse"),
      (args: Seq[Expression]) => {
        arity("graft_url_canon", 1, args)
        StaticInvoke(GraftUrlOps.getClass, StringType, "urlCanonical", args,
          propagateNull = true, returnNullable = true)
      }),
    ("graft_registrable_domain",
      info("graft_registrable_domain",
        "GRAFT-PSL v1 registrable domain: (host, suffix-set-csv) -> domain (NULL when none)"),
      (args: Seq[Expression]) => {
        arity("graft_registrable_domain", 2, args)
        StaticInvoke(GraftUrlOps.getClass, StringType, "registrableDomain", args,
          propagateNull = true, returnNullable = true)
      }),
    ("graft_media_meta",
      info("graft_media_meta",
        "sniff-and-parse media header metadata of a binary payload: " +
          "struct(decoder, width, height, n_channels, sample_rate, n_frames, checksum)"),
      (args: Seq[Expression]) => {
        arity("graft_media_meta", 1, args)
        invoke(GraftMediaOps.getClass, "mediaMeta", MediaMetaType, args)
      }),
    ("graft_five_num",
      info("graft_five_num",
        "aggregate: exact five-number summary (min, q1, median, q3, max) in one buffer"),
      (args: Seq[Expression]) => {
        arity("graft_five_num", 1, args)
        FiveNumberSummary(args.head).toAggregateExpression()
      }),
    ("graft_topk_freq",
      info("graft_topk_freq",
        "aggregate: SpaceSaving heavy hitters — (item, k, capacity) -> array<struct<item, est, err>>"),
      (args: Seq[Expression]) => {
        arity("graft_topk_freq", 3, args)
        def intLit(e: Expression, name: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_topk_freq: $name must be an integer literal, got $other")
        }
        TopKFreq(args.head, intLit(args(1), "k"), intLit(args(2), "capacity"))
          .toAggregateExpression()
      }),
    ("graft_count_min",
      info("graft_count_min",
        "aggregate: Count-Min sketch — (item, depth, width) -> array<long> row-major grid"),
      (args: Seq[Expression]) => {
        arity("graft_count_min", 3, args)
        def intLit(e: Expression, name: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_count_min: $name must be an integer literal, got $other")
        }
        CountMin(args.head, intLit(args(1), "depth"), intLit(args(2), "width"))
          .toAggregateExpression()
      }))

  /** Output schema of [[GraftMediaOps.mediaMeta]]. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("decoder", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Register on an already-built session. Idempotent. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
