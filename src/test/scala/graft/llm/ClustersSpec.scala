package graft.llm

import graft.SparkSpec

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  test("clusters assigns min reachable id per component, singletons self-cluster") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("doc_id")
    // components: {1,2,3} (chained), {4,5}, {9}
    val pairs = Seq((2L, 3L), (1L, 2L), (4L, 5L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(docs, pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 9L -> 9L))
  }

  test("clusters converges on a long chain (diameter > 2)") {
    val n = 12L
    val docs = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(docs, pairs).as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L))
  }
}
