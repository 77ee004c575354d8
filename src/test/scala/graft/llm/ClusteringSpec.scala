package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lloyd's k-means semantics: seeds, assignment, micros-mean update. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated groups in 2-d: ids 0,1 near the origin, 2,3 far
  private val vecs = Seq(
    (0L, Array(0.0f, 0.0f)),
    (1L, Array(0.2f, 0.0f)),
    (2L, Array(10.0f, 10.0f)),
    (3L, Array(10.2f, 10.0f))).toDF("vec_id", "embedding")

  test("separated groups converge to their own seed clusters") {
    val out = Clustering.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    // seeds are vec_id 0 and 1, both in the near group; after the first
    // update the centroid of cluster 1 moves toward whatever it captured —
    // the far pair must end up together, the near pair together
    assert(out(2L) == out(3L))
    assert(out(0L) == out(1L) || out.values.toSet.size == 2)
  }

  test("one-iteration assignment is nearest seed with (dist, cluster) tiebreak") {
    val out = Clustering.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 1)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2, r._3)).toList.sortBy(_._1)
    // iters=1: no update step, assignment against the raw seeds 0 and 1
    assert(out.map(_._2) == List(0L, 1L, 1L, 1L))
    // vec 0 == seed 0 exactly: distance 0
    assert(out.head._3 == 0L)
    // vec 2 to seed 1 (0.2, 0): (10-0.2)^2 + 10^2 = 196.04 in micros
    assert(out(2)._3 == 196040000L)
  }

  test("sparse/offset id spaces still seed k centroids") {
    // ids start at 100: filter(vec_id < k) would yield ZERO seeds; the
    // k-smallest-ids seeding must still produce two clusters
    val offset = vecs.withColumn("vec_id", col("vec_id") + 100L)
    val out = Clustering.kmeans(offset, "vec_id", "embedding", k = 2, iters = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(out.keySet == Set(100L, 101L, 102L, 103L))
    assert(out.values.toSet == Set(100L, 101L)) // clusters named by seed ids
    assert(out(102L) == out(103L))
  }

  test("farthest-first seeding spreads seeds across the groups") {
    val seeds = Clustering.farthestFirstSeeds(vecs, "vec_id", "embedding", k = 2)
      .select("cluster", "dmin_micros").as[(Long, Long)].collect().toMap
    // seed 1 = smallest id (0); seed 2 = farthest from it: vec 3 at
    // (10.2f, 10) — float 10.2f is 10.199999809…, so the squared
    // distance is 204.039996…, not 204.04
    assert(seeds == Map(0L -> 0L, 3L -> 204039996L))
    // k = 3: vec 1's distance to seed 0 is 0.2f² = 0.04000000119…, a hair
    // ABOVE vec 2's distance to seed 3 (0.19999980…² = 0.03999992…) — the
    // argmax ranks raw doubles, so vec 1 is the third seed (both round to
    // 40000 micros)
    val three = Clustering.farthestFirstSeeds(vecs, "vec_id", "embedding", k = 3)
      .select("cluster", "dmin_micros").as[(Long, Long)].collect().toMap
    assert(three == Map(0L -> 0L, 3L -> 204039996L, 1L -> 40000L))
  }

  test("farthest-first seeding yields all rows when k exceeds the input") {
    val seeds = Clustering.farthestFirstSeeds(vecs, "vec_id", "embedding", k = 10)
    assert(seeds.count() == 4)
  }

  test("farthest-first seeding accepts STRING ids (lexicographic tiebreak)") {
    // the r9 formulation negated the id in the tiebreak — a string doc_id
    // corpus failed analysis; the ordering form must handle it
    val named = Seq(
      ("a", Array(0.0f, 0.0f)),
      ("b", Array(0.2f, 0.0f)),
      ("c", Array(10.0f, 10.0f)),
      ("d", Array(10.2f, 10.0f))).toDF("vec_id", "embedding")
    val seeds = Clustering.farthestFirstSeeds(named, "vec_id", "embedding", k = 2)
      .select("cluster", "dmin_micros").as[(String, Long)].collect().toMap
    // seed 1 = smallest id "a"; seed 2 = farthest from it = "d" (same
    // geometry as the numeric-id case: 10.2f² drift → 204039996 micros)
    assert(seeds == Map("a" -> 0L, "d" -> 204039996L))
  }

  test("farthest-first seeding keeps NULL-id rows in play (null-safe exclusion)") {
    // a NULL id must neither fail nor silently vanish from the state: the
    // far-group vector with a NULL id is still the farthest point and wins
    // round 2 (the left_anti formulation kept NULLs; so must the filter)
    val withNull = Seq(
      (java.lang.Long.valueOf(0L), Array(0.0f, 0.0f)),
      (java.lang.Long.valueOf(1L), Array(0.2f, 0.0f)),
      (null.asInstanceOf[java.lang.Long], Array(10.0f, 10.0f)))
      .toDF("vec_id", "embedding")
    val seeds = Clustering.farthestFirstSeeds(withNull, "vec_id", "embedding", k = 3)
      .select("cluster").collect().map(r => Option(r.get(0))).toSet
    assert(seeds == Set(Some(0L), Some(1L), None))
  }

  test("converged k-means separates the groups and stops on zero movement") {
    val out = Clustering.kmeansConverged(vecs, "vec_id", "embedding", k = 2, maxIters = 20)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    // farthest-first seeds start one centroid in each group, so Lloyd's
    // converges to the exact 2-cluster structure
    assert(out(0L) == out(1L) && out(2L) == out(3L) && out(0L) != out(2L))
    // deterministic across runs
    val again = Clustering.kmeansConverged(vecs, "vec_id", "embedding", k = 2, maxIters = 20)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(again == out)
  }

  test("converged k-means keeps a centroid whose cluster empties") {
    // three identical points, first-k seeds: both seeds coincide, every
    // vector ties to the lower cluster id, cluster 1 empties — the old
    // centroid must be kept (k preserved) and the loop must converge
    val dup = Seq(
      (0L, Array(1.0f, 1.0f)), (1L, Array(1.0f, 1.0f)), (2L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.kmeansConverged(dup, "vec_id", "embedding", k = 2,
      maxIters = 5, farthestFirst = false)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 3 && out.forall(_._2 == 0L) && out.forall(_._3 == 0L))
  }

  test("cluster count never exceeds k and every vector is assigned") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Clustering.kmeans(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(out.count() == emb.count())
    assert(out.select("cluster").distinct().count() <= 8)
    // deterministic across runs (micros-mean centroids, no RNG)
    val a = out.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Clustering.kmeans(emb, "vec_id", "embedding", k = 8, iters = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("a NULL vector keeps its row with a NULL cluster, never silently drops") {
    val withNull = Seq(
      (0L, Some(Array(0.0f, 0.0f))),
      (1L, Some(Array(0.2f, 0.0f))),
      (2L, Some(Array(10.0f, 10.0f))),
      (9L, Option.empty[Array[Float]])).toDF("vec_id", "embedding")
    val out = Clustering.kmeans(withNull, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // cardinality preserved: the null-vector row surfaces as cluster NULL
    assert(out.keySet == Set(0L, 1L, 2L, 9L))
    assert(out(9L).isEmpty)
    assert(Seq(0L, 1L, 2L).forall(out(_).nonEmpty))
  }
}
