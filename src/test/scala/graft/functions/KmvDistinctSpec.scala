package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV distinct-count sketch: exactness below capacity, estimator error
  * bounds, and the property that makes it oracle-able — the result is a
  * pure function of the value SET, identical under any partitioning. */
class KmvDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(values: Seq[String], k: Int, parts: Int): (Long, Boolean) = {
    val r = values.toDF("v").repartition(parts)
      .agg(KmvDistinct(col("v"), k).as("d"))
      .select("d.n_distinct", "d.is_exact").head
    (r.getLong(0), r.getBoolean(1))
  }

  test("exact below capacity, regardless of partitioning and duplication") {
    val vs = (0 until 50).map(i => s"tok$i") ++ (0 until 50).map(i => s"tok$i")
    for (p <- Seq(1, 3, 17)) {
      assert(sketch(vs, 64, p) == ((50L, true)), s"parts=$p")
    }
    assert(sketch(Seq.empty[String], 64, 1) == ((0L, true)))
  }

  test("estimate path is deterministic across partitionings and within error") {
    val rnd = new scala.util.Random(7)
    val vs = (0 until 5000).map(_ => s"w${rnd.nextInt(100000)}")
    val trueDistinct = vs.distinct.size
    val k = 256
    val results = Seq(1, 4, 32).map(p => sketch(vs, k, p))
    assert(results.distinct.size == 1, s"partitioning changed the sketch: $results")
    val (est, exact) = results.head
    assert(!exact)
    // KMV standard error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    val tol = (trueDistinct * 4.0 / math.sqrt(k - 2)).toLong
    assert(math.abs(est - trueDistinct) <= tol,
      s"est=$est true=$trueDistinct tol=$tol")
  }

  test("kmv_hashes folds arbitrary longs into range: no overflow corruption") {
    val M = graft.llm.TextHash.Prime
    // raw ids far outside [0, M), including negatives and extremes —
    // before the fold, scatter's multiply overflowed these into negative
    // "hashes" that displaced real minima
    val raw = Seq(Long.MinValue, -1L, Long.MaxValue, 0L, M, M + 7L,
      123456789012345L, -987654321098765L)
    val hashes = raw.toDF("h")
      .agg(KmvHashes(col("h"), 8).as("ks"))
      .select(explode(col("ks")).as("h")).as[Long].collect()
    assert(hashes.forall(h => h >= 0 && h < M),
      s"out-of-range sketch hashes: ${hashes.mkString(",")}")
    // the fold is deterministic: raw ids and their pre-folded values
    // produce the IDENTICAL sketch (the SQL-mirrorable contract)
    val folded = raw.map(h => ((h % M) + M) % M)
    val viaFolded = folded.toDF("h")
      .agg(KmvHashes(col("h"), 8).as("ks"))
      .select(explode(col("ks")).as("h")).as[Long].collect()
    assert(hashes.sorted.sameElements(viaFolded.sorted))
    // and the fold is the identity for in-range polyHash values: the
    // string path and the precomputed-long path still agree bit-for-bit
    val words = Seq("alpha", "beta", "gamma", "alpha")
    val viaString = words.toDF("v").agg(KmvHashes(col("v"), 8).as("ks"))
      .select(explode(col("ks")).as("h")).as[Long].collect()
    val viaLong = words
      .map(w => GraftHashOps.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(w)))
      .toDF("h")
      .agg(KmvHashes(col("h"), 8).as("ks"))
      .select(explode(col("ks")).as("h")).as[Long].collect()
    assert(viaString.sorted.sameElements(viaLong.sorted))
  }

  test("nulls are ignored; grouped sketches stay independent") {
    val df = Seq(("a", Some("x")), ("a", None), ("a", Some("y")),
      ("b", Some("x"))).toDF("g", "v")
    val out = df.groupBy("g").agg(KmvDistinct(col("v"), 8).as("d"))
      .select(col("g"), col("d.n_distinct")).as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }
}
