package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.{Pq, Similarity}

/** Compact ANN-recall regression gate, surfaced into the per-round BENCH
  * artifact (the round-18 verdict ask: the C1 recall floor lived only in
  * the `ProfileC1` harness, so a quantizer/probe-rule/re-rank regression
  * failed the round only if someone read SCALE.md — this makes it
  * mechanical: `recall_floor_ok` rides the bench JSON the driver parses
  * every round).
  *
  * Same synthetic distribution and serving paths as C1's `ann_recall`
  * stage ([[ProfileC1.syntheticEmbeddings]]: near-dup groups of 17 over
  * an isotropic tail — the worst case for quantized search), scaled down
  * to a bench-budget corpus. Two measurements:
  *
  *  - `recall_r10_ad` / `recall_r100_ad`: the PRODUCTION adaptive shape
  *    ([[Pq.ivfPqSearchRerankAdaptive]], budget = 75% of the corpus,
  *    candidate cut 5001) against exact L2 ground truth;
  *  - `recall_r10_p16` / `recall_r100_p16`: the ADC-only fixed-probe path
  *    (no float re-rank) — the quantizer-ordering signal.
  *
  * Floors are regression pins = measured band minus slack, NOT
  * aspirations (measured at the default 20k-vector bench scale:
  * ad 993/979, p16 662/340 — the deterministic xxhash corpus makes the
  * measurement exactly reproducible; the C1 harness pins the full-scale
  * band, 1M adaptive 934/700+). A floor breach sets `recall_floor_ok:0`
  * in BENCH_r{N}.json, failing the round by name. */
object RecallGate {

  val FloorR10Adaptive = 950L
  val FloorR100Adaptive = 900L
  val FloorR10Adc16 = 550L
  val FloorR100Adc16 = 250L

  /** Floors for the 1M-VECTOR scale curve (`ProfileC1` recall-only mode,
    * re-measured per round — BASELINE.md): the same measurement at the
    * scale where probe COVERAGE, not ADC ordering, is the binding
    * constraint. Regression pins = measured band minus slack (r20
    * measured: see BASELINE.md), not aspirations. */
  val ScaleFloorR10Adaptive = 900L
  val ScaleFloorR100Adaptive = 650L
  val ScaleFloorR10Adc16 = 550L
  val ScaleFloorR100Adc16 = 180L

  /** The 1M scale pin: measure at `nVecs` and gate on the SCALE floors. */
  def measureScale(spark: SparkSession, nVecs: Long): (Seq[(String, Long)], Boolean) = {
    val (metrics, _) = measure(spark, nVecs)
    val m = metrics.toMap
    val ok = m("recall_r10_ad") >= ScaleFloorR10Adaptive &&
      m("recall_r100_ad") >= ScaleFloorR100Adaptive &&
      m("recall_r10_p16") >= ScaleFloorR10Adc16 &&
      m("recall_r100_p16") >= ScaleFloorR100Adc16
    (metrics, ok)
  }

  /** Returns the permille metrics plus the floor verdict. */
  def measure(spark: SparkSession, nVecs: Long): (Seq[(String, Long)], Boolean) = {
    val embs = ProfileC1.syntheticEmbeddings(spark, nVecs).localCheckpoint()
    val (coarse, pq) = Pq.ivfPqTrain(embs, "vec_id", "embedding",
      dim = 64, cells = 64, m = 8, k = 64)
    val index = Pq.ivfPqEncode(embs, "vec_id", "embedding", coarse, pq)
      .localCheckpoint()
    val nQ = 16
    val qIds: Seq[Long] = (0 until nQ).map(i => i.toLong * (nVecs / nQ) + 3)
    val dot = graft.functions.HashFunctions.dot _
    val corpusV = embs.select(col("vec_id").as("neighbor_id"),
      Similarity.asDouble(col("embedding")).as("vn"))
    val queriesV = embs.filter(col("vec_id").isin(qIds: _*))
      .select(col("vec_id").as("query_id"),
        Similarity.asDouble(col("embedding")).as("vq"))
    // exact ground truth in the served metric (L2), queries broadcast,
    // mergeable top-k — the corpus never shuffles
    val truth = corpusV
      .join(broadcast(queriesV), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("vq"), col("vq")) + dot(col("vn"), col("vn")) -
          lit(2.0) * dot(col("vq"), col("vn"))).as("dist_sq"))
      .groupBy("query_id")
      .agg(graft.functions.TopKByScore(-col("dist_sq"), col("neighbor_id"), 100)
        .as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__r", "__t")))
      .select(col("query_id"), col("__t.id").as("neighbor_id"),
        (col("__r") + 1).cast("int").as("rank"))
      .localCheckpoint()
    val queries = embs.filter(col("vec_id").isin(qIds: _*))
    def recallPermille(got: DataFrame, k: Int): Long = {
      val hits = truth.filter(col("rank") <= k)
        .join(got.filter(col("arank") <= k), Seq("query_id", "neighbor_id"))
        .count()
      hits * 1000L / (nQ.toLong * k)
    }
    def ranked(df: DataFrame, distCol: String): DataFrame = df
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("arank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col(distCol).asc, col("vec_id").asc)))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("arank"))
      .localCheckpoint()
    val sizes = Pq.cellOccupancy(index)
    // candidate cut scales with the budget (the C1 sizing rule: ~5% of
    // the probed budget, floor 5001) so the same measurement serves both
    // the 20k bench gate (5001, unchanged) and the 1M scale pin, where a
    // fixed 5001 would bind before probe coverage does
    val adCand = math.max(5001L, nVecs * 3 / 4 / 20).min(100001L).toInt
    val ad = ranked(Pq.ivfPqSearchRerankAdaptive(index, coarse, pq, embs,
      "vec_id", "embedding", queries, candidateBudget = nVecs * 3 / 4,
      maxProbes = 64, candidates = adCand, topK = 101,
      cellSizes = Some(sizes)), "dist_sq_micros")
    val adc = ranked(Pq.ivfPqSearchBatchOverIndex(index, coarse, pq, queries,
      "vec_id", "embedding", nProbes = 16, topK = 101), "dist_micros")
    val metrics = Seq(
      "recall_r10_ad" -> recallPermille(ad, 10),
      "recall_r100_ad" -> recallPermille(ad, 100),
      "recall_r10_p16" -> recallPermille(adc, 10),
      "recall_r100_p16" -> recallPermille(adc, 100))
    val m = metrics.toMap
    val ok = m("recall_r10_ad") >= FloorR10Adaptive &&
      m("recall_r100_ad") >= FloorR100Adaptive &&
      m("recall_r10_p16") >= FloorR10Adc16 &&
      m("recall_r100_p16") >= FloorR100Adc16
    (metrics, ok)
  }
}
