package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: deterministic codebooks, exact ADC scoring,
  * partitioning invariance. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def vecs(n: Int, parts: Int = 3) =
    spark.range(n).repartition(parts).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        i => (pmod(abs(xxhash64(col("id"), i)), lit(1000L)) / 250.0 - 2.0)
          .cast("float")).as("embedding"))

  test("codebook and codes are deterministic under repartitioning") {
    val m1 = Pq.pqTrain(vecs(200, 1), "vec_id", "embedding", dim, m = 2, k = 4, iters = 3)
    val m2 = Pq.pqTrain(vecs(200, 13), "vec_id", "embedding", dim, m = 2, k = 4, iters = 3)
    assert(m1.cents.flatten.flatten.toSeq == m2.cents.flatten.flatten.toSeq)
    val c1 = Pq.pqEncode(vecs(200), "vec_id", "embedding", m1)
      .as[(Long, Int, Int)].collect().toSet
    val c2 = Pq.pqEncode(vecs(200, 7), "vec_id", "embedding", m2)
      .as[(Long, Int, Int)].collect().toSet
    assert(c1 == c2)
    assert(c1.forall { case (_, s, c) => s >= 0 && s < 2 && c >= 0 && c < 4 })
    assert(c1.size == 200 * 2) // m codes per vector
  }

  test("ADC top-k scores are the integer table sums, ranked (dist, id)") {
    val df = vecs(100, 5)
    val model = Pq.pqTrain(df, "vec_id", "embedding", dim, m = 2, k = 4)
    val query = df.filter(col("vec_id") === 0L)
      .select(Similarity.asDouble(col("embedding"))).head.getSeq[Double](0).toArray
    val top = Pq.pqTopKWith(df, "vec_id", "embedding", model, query, k = 10)
      .as[(Long, Long)].collect()
    assert(top.length == 10)
    // ranked ascending with id tiebreak
    assert(top.sortBy(t => (t._2, t._1)).toSeq == top.toSeq)
    // recompute one score by hand from codes + driver table
    val codes = Pq.pqEncode(df, "vec_id", "embedding", model)
      .as[(Long, Int, Int)].collect().groupBy(_._1)
      .map { case (id, rows) => id -> rows.sortBy(_._2).map(_._3) }
    val sd = model.subDim
    def tableEntry(s: Int, c: Int): Long = {
      var acc = 0.0
      var j = 0
      while (j < sd) {
        val d = query(s * sd + j) - model.cents(s)(c)(j)
        acc += d * d
        j += 1
      }
      math.round(acc * 1e6)
    }
    top.foreach { case (id, dist) =>
      val manual = codes(id).zipWithIndex.map { case (c, s) => tableEntry(s, c) }.sum
      assert(dist == manual, s"vec $id: ADC $dist != manual $manual")
    }
  }

  test("IVF-PQ: deterministic under repartitioning, probes restrict the scan") {
    val df = vecs(200, 4)
    val (c1, p1) = Pq.ivfPqTrain(df, "vec_id", "embedding", dim, cells = 4, m = 2, k = 4)
    val (c2, p2) = Pq.ivfPqTrain(vecs(200, 11), "vec_id", "embedding", dim, cells = 4, m = 2, k = 4)
    assert(c1.cents.flatten.flatten.toSeq == c2.cents.flatten.flatten.toSeq)
    assert(p1.cents.flatten.flatten.toSeq == p2.cents.flatten.flatten.toSeq)
    val query = df.filter(col("vec_id") === 3L)
      .select(Similarity.asDouble(col("embedding"))).head.getSeq[Double](0).toArray
    val r1 = Pq.ivfPqSearch(df, "vec_id", "embedding", c1, p1, query, nProbes = 2, topK = 10)
      .as[(Long, Int, Long)].collect().toSeq
    val r2 = Pq.ivfPqSearch(vecs(200, 9), "vec_id", "embedding", c2, p2, query, nProbes = 2, topK = 10)
      .as[(Long, Int, Long)].collect().toSeq
    assert(r1 == r2)
    assert(r1.size == 10)
    // results come only from the probed cells
    assert(r1.map(_._2).toSet.size <= 2)
    // ranked (dist asc, id asc)
    assert(r1.sortBy(t => (t._3, t._1)) == r1)
    // probing ALL cells with enough k degenerates to full-corpus ADC
    // over residuals: every vector scored exactly once
    val all = Pq.ivfPqSearch(df, "vec_id", "embedding", c1, p1, query,
      nProbes = 4, topK = 1000).as[(Long, Int, Long)].collect()
    assert(all.map(_._1).distinct.length == 200)
  }

  test("persisted IVF-PQ index: search is bit-identical and prunes partitions") {
    val df = vecs(200, 4)
    val (c, p) = Pq.ivfPqTrain(df, "vec_id", "embedding", dim, cells = 4, m = 2, k = 4)
    val query = df.filter(col("vec_id") === 3L)
      .select(Similarity.asDouble(col("embedding"))).head.getSeq[Double](0).toArray
    val direct = Pq.ivfPqSearch(df, "vec_id", "embedding", c, p, query,
      nProbes = 2, topK = 10).as[(Long, Int, Long)].collect().toSeq

    // drop-by-drop build: two appends land the same rows a one-shot
    // encode would (encode is a per-row projection)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    Pq.ivfPqEncode(df.filter(col("vec_id") < 120), "vec_id", "embedding", c, p)
      .write.partitionBy("cell").mode("append").parquet(dir)
    Pq.ivfPqEncode(df.filter(col("vec_id") >= 120), "vec_id", "embedding", c, p)
      .write.partitionBy("cell").mode("append").parquet(dir)
    val index = spark.read.parquet(dir)
    val over = Pq.ivfPqSearchOverIndex(index, c, p, query, nProbes = 2, topK = 10)
    assert(over.as[(Long, Int, Long)].collect().toSeq == direct)

    // the un-probed cells' files are never read: every scanned partition
    // filter pins cell to one probed value
    val plan = over.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cell".take(30)) ||
      plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    val scans = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(scans.nonEmpty && scans.forall(_.contains("cell")),
      s"expected cell partition filters, got: $scans")
  }

  test("batch search over the index agrees with per-query search") {
    val df = vecs(200, 4)
    val (c, p) = Pq.ivfPqTrain(df, "vec_id", "embedding", dim, cells = 4, m = 2, k = 4)
    val index = Pq.ivfPqEncode(df, "vec_id", "embedding", c, p).localCheckpoint()
    val queries = df.filter(col("vec_id") < 3)
    val batch = Pq.ivfPqSearchBatchOverIndex(index, c, p, queries,
      "vec_id", "embedding", nProbes = 2, topK = 10)
      .as[(Long, Long, Int, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._5).map(t => (t._2, t._3, t._4)).toSeq).toMap
    assert(batch.keySet == Set(0L, 1L, 2L))
    for (qid <- 0L until 3L) {
      val q = df.filter(col("vec_id") === qid)
        .select(Similarity.asDouble(col("embedding"))).head.getSeq[Double](0).toArray
      val single = Pq.ivfPqSearchOverIndex(index, c, p, q, nProbes = 2, topK = 10)
        .as[(Long, Int, Long)].collect().toSeq
      assert(batch(qid) == single, s"query $qid diverged from the single-query path")
    }
  }

  test("float re-rank: exact order over the ADC candidate set, never worse recall") {
    val df = vecs(300, 4).localCheckpoint()
    val (c, p) = Pq.ivfPqTrain(df, "vec_id", "embedding", dim, cells = 4, m = 2, k = 4)
    val index = Pq.ivfPqEncode(df, "vec_id", "embedding", c, p).localCheckpoint()
    val queries = df.filter(col("vec_id") < 3)
    val rer = Pq.ivfPqSearchRerankBatch(index, c, p, df, "vec_id", "embedding",
      queries, nProbes = 4, candidates = 40, topK = 10).localCheckpoint()
    // (1) the result IS the exact L2 order over the candidate set:
    // re-ranking the ADC top-40 by true distance reproduces it row-for-row
    val cand = Pq.ivfPqSearchBatchOverIndex(index, c, p, queries,
      "vec_id", "embedding", nProbes = 4, topK = 40)
      .select(col("query_id"), col("vec_id"))
    val exact = cand
      .join(df.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("cv")),
        Seq("vec_id"))
      .join(df.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"),
          Similarity.asDouble(col("embedding")).as("qv")), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(graft.functions.HashFunctions.sqDist(col("qv"), col("cv")) * 1e6)
          .cast("long").as("d"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._3, t._2)).take(10).map(t => (t._2, t._3)).toSeq)
      .toMap
    val got = rer.orderBy("query_id", "rank")
      .as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    assert(got == exact)
    // (2) the query itself (distance 0) heads its own top-k — the ADC
    // path can misrank it behind quantization noise, re-rank cannot
    got.foreach { case (qid, rows) =>
      assert(rows.head == ((qid, 0L)), s"query $qid does not head its re-ranked list")
    }
    // (3) determinism under repartitioning
    val rer2 = Pq.ivfPqSearchRerankBatch(index.repartition(11), c, p,
      df.repartition(7), "vec_id", "embedding", queries, 4, 40, 10)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(rer2 == rer.as[(Long, Long, Long, Int)].collect().toSet)
    // (4) candidates < topK is loud
    intercept[IllegalArgumentException] {
      Pq.ivfPqSearchRerankBatch(index, c, p, df, "vec_id", "embedding",
        queries, 2, 5, 10)
    }
  }

  test("guards: bad subspace split and wrong-dim query are loud") {
    val df = vecs(20)
    intercept[IllegalArgumentException] {
      Pq.pqTrain(df, "vec_id", "embedding", dim, m = 3, k = 2)
    }
    val model = Pq.pqTrain(df, "vec_id", "embedding", dim, m = 2, k = 2)
    intercept[IllegalArgumentException] {
      Pq.pqTopKWith(df, "vec_id", "embedding", model, new Array[Double](dim + 1), 5)
    }
  }

  test("adaptive probing: budget-sized probe sets, fixed-probe endpoints agree") {
    val df = vecs(240, 4).localCheckpoint()
    val (c, p) = Pq.ivfPqTrain(df, "vec_id", "embedding", dim, cells = 4, m = 2, k = 4)
    val index = Pq.ivfPqEncode(df, "vec_id", "embedding", c, p).localCheckpoint()
    val queries = df.filter(col("vec_id") < 3)
    def rows(got: org.apache.spark.sql.DataFrame) =
      got.as[(Long, Long, Int, Long, Int)].collect().sortBy(t => (t._1, t._5)).toSeq
    // budget >= corpus with maxProbes = cells probes everything: identical
    // to the fixed-probe search at nProbes = cells
    val all = rows(Pq.ivfPqSearchAdaptiveBatch(index, c, p, queries,
      "vec_id", "embedding", candidateBudget = 10000, maxProbes = 4, topK = 10))
    assert(all == rows(Pq.ivfPqSearchBatchOverIndex(index, c, p, queries,
      "vec_id", "embedding", nProbes = 4, topK = 10)))
    // budget 1: exactly the nearest cell per query (the exclusive
    // cumulative rule probes a cell iff prior cells hold < budget)
    val one = rows(Pq.ivfPqSearchAdaptiveBatch(index, c, p, queries,
      "vec_id", "embedding", candidateBudget = 1, maxProbes = 4, topK = 10))
    assert(one == rows(Pq.ivfPqSearchBatchOverIndex(index, c, p, queries,
      "vec_id", "embedding", nProbes = 1, topK = 10)))
    // a mid budget returns at least the budget's worth of coverage when
    // available: every query's candidate pool spans >= 2 cells here
    // because no single cell holds 200 of the 240 vectors
    val sizes = index.groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(sizes.values.max < 200)
    // topK = corpus size so the result set IS the candidate pool: distinct
    // result cells == probed cells
    val mid = Pq.ivfPqSearchAdaptiveBatch(index, c, p, queries,
      "vec_id", "embedding", candidateBudget = 200, maxProbes = 4, topK = 240)
    val cellsPerQ = mid.select("query_id", "cell").distinct()
      .groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(cellsPerQ.values.forall(_ >= 2), s"got $cellsPerQ")
    // the exclusive rule only stops once probed occupancy >= budget, so
    // every query's candidate pool covers the full budget
    val poolPerQ = mid.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(poolPerQ.values.forall(_ >= 200), s"got $poolPerQ")
    // deterministic under repartitioning
    val rep = rows(Pq.ivfPqSearchAdaptiveBatch(index.repartition(7), c, p,
      queries, "vec_id", "embedding", candidateBudget = 200, maxProbes = 4,
      topK = 240))
    assert(rep == rows(mid))
    // guards
    intercept[IllegalArgumentException] {
      Pq.ivfPqSearchAdaptiveBatch(index, c, p, queries, "vec_id", "embedding",
        candidateBudget = 0, maxProbes = 2, topK = 5)
    }
    intercept[IllegalArgumentException] {
      Pq.ivfPqSearchAdaptiveBatch(index, c, p, queries, "vec_id", "embedding",
        candidateBudget = 10, maxProbes = 9, topK = 5)
    }
  }

  test("adaptive probing: precomputed cell occupancy reuses bit-identically") {
    val df = vecs(120, 4).localCheckpoint()
    val (c, p) = Pq.ivfPqTrain(df, "vec_id", "embedding", dim, cells = 4, m = 2, k = 4)
    val index = Pq.ivfPqEncode(df, "vec_id", "embedding", c, p).localCheckpoint()
    val queries = df.filter(col("vec_id") < 3)
    def rows(got: org.apache.spark.sql.DataFrame) =
      got.as[(Long, Long, Int, Long, Int)].collect().sortBy(t => (t._1, t._5)).toSeq
    val sizes = Pq.cellOccupancy(index)
    assert(sizes.values.sum == 120L)
    val fresh = rows(Pq.ivfPqSearchAdaptiveBatch(index, c, p, queries,
      "vec_id", "embedding", candidateBudget = 40, maxProbes = 4, topK = 10))
    val reused = rows(Pq.ivfPqSearchAdaptiveBatch(index, c, p, queries,
      "vec_id", "embedding", candidateBudget = 40, maxProbes = 4, topK = 10,
      cellSizes = Some(sizes)))
    assert(reused == fresh)
  }

  test("batch query collect is LIMIT-bounded: an oversized set fails loudly") {
    val df = vecs(40, 4).localCheckpoint()
    val (c, p) = Pq.ivfPqTrain(df, "vec_id", "embedding", dim, cells = 2, m = 2, k = 2)
    val index = Pq.ivfPqEncode(df, "vec_id", "embedding", c, p).localCheckpoint()
    // a corpus-sized "query set": one row past the serving contract
    val over = spark.range(Pq.MaxBatchQueries + 1).select(
      col("id").as("vec_id"),
      array(Seq.fill(dim)(lit(0.5)): _*).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Pq.ivfPqSearchAdaptiveBatch(index, c, p, over, "vec_id", "embedding",
        candidateBudget = 10, maxProbes = 2, topK = 5)
    }
    assert(e.getMessage.contains("driver batch contract"))
  }
}
