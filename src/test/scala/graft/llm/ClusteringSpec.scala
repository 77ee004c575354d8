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
}
