package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-means clustering over an `array<float>` embedding column — Lloyd's
  * algorithm, the topic/deduplication clustering step of an embedding
  * pipeline (and the real centroid trainer behind [[Similarity.ivfTopK]],
  * which documents its deterministic seed pick as a k-means drop-in).
  *
  * Scale shape per iteration:
  *  - assignment: centroids are k rows — broadcast over the unshuffled
  *    corpus scan, argmin by squared euclidean distance (sequential-fold
  *    arithmetic, same discipline as [[Similarity]]);
  *  - update: vectors `posexplode` to (cluster, dim, component) and hash-
  *    aggregate — map-side partial agg collapses each partition to at most
  *    k*dim rows before anything ships, so the shuffle is O(k*dim), not
  *    O(corpus).
  *
  * Determinism (the property that lets the driver's DuckDB gate check an
  * *iterative* algorithm): seeds are the first k vectors by id — the same
  * deterministic choice [[Similarity.ivfTopK]] makes — and each updated
  * centroid component is `sum(round(x*1e6)) / (n*1e6)`: the numerator is
  * an integer sum (order-independent where double summation is not), so
  * every iteration — and therefore every assignment — is bit-identical on
  * both engines at any parallelism. Ties in the argmin break by cluster id.
  *
  * The driver-side iteration loop with `localCheckpoint` per round is the
  * standard Spark shape for iterative ML (same as [[Dedup.clusters]]);
  * fixed `iters` keeps the oracle expressible as an unrolled CTE chain —
  * production callers loop until centroid movement < eps instead.
  */
object Clustering {

  private def sqDist(v: Column, c: Column): Column =
    aggregate(zip_with(v, c, (a, b) => (a - b) * (a - b)), lit(0.0), (acc, p) => acc + p)

  /** One Lloyd assignment: nearest centroid per vector.
    * `centroids`: (cluster, c: array<double>). Returns (vec_id, v, cluster,
    * dist). Argmin as an AGGREGATION, not a window (the ivfTopK pattern):
    * `min(struct(dist, cluster))` partial-combines map-side, so the k
    * scored rows per vector collapse to one before the shuffle — a
    * row_number window would ship corpus × k rows. The struct's
    * lexicographic order IS the (dist asc, cluster asc) tiebreak. */
  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("cluster"), sqDist(col("v"), col("c")).as("dist"))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cluster"))).as("best"), first(col("v")).as("v"))
      .select(col("vec_id"), col("v"),
        col("best.cluster").as("cluster"), col("best.dist").as("dist"))

  /** Micros-mean centroid update: (cluster, c) with
    * c(d) = sum(round(v(d)*1e6)) / (n*1e6) per dimension. */
  private def update(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim")
      .agg(
        sum(round(col("x") * 1e6).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .select(col("cluster"), col("dim"),
        (col("s").cast("double") / (col("n") * 1000000L)).as("cx"))
      .groupBy("cluster")
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("cx")))),
        e => e.getField("cx")).as("c"))

  /** Lloyd's k-means: `iters` rounds from the first-k-by-id seeds.
    * Returns (vec_id, cluster, dist_micros) of the final assignment.
    *
    * @param vectors (idCol, vecCol: array<float>) input
    * @param k       cluster count; seeds = the k smallest ids
    * @param iters   fixed iteration count (production: until movement < eps)
    */
  def kmeans(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2): DataFrame = {
    require(k > 0 && iters > 0, "need k > 0 and iters > 0")
    val vecs = vectors
      .select(col(idCol).as("vec_id"), Similarity.asDouble(col(vecCol)).as("v"))
    // seed centroids: the k smallest ids (deterministic, engine-portable,
    // and robust to sparse/offset id spaces where `vec_id < k` would
    // silently yield fewer than k seeds; k-means++ would sharpen quality
    // but needs sequential randomized passes). orderBy+limit compiles to
    // TakeOrderedAndProject — a per-partition top-k, no global sort.
    var centroids = vecs
      .orderBy(col("vec_id"))
      .limit(k)
      .select(col("vec_id").as("cluster"), col("v").as("c"))
      .localCheckpoint()
    var i = 0
    while (i < iters - 1) {
      centroids = update(assign(vecs, centroids)).localCheckpoint()
      i += 1
    }
    assign(vecs, centroids)
      .select(col("vec_id"), col("cluster"),
        round(col("dist") * 1e6).cast("long").as("dist_micros"))
  }
}
