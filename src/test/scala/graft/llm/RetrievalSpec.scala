package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 / TF-IDF ranked-retrieval semantics. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark query"),
    (2L, "spark query engine"),
    (3L, "flood forecast engine pipeline"),
    (4L, "query")).toDF("doc_id", "text")

  test("invertedIndex: tf counts occurrences, dl is the doc token length") {
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(idx.contains(("spark", 1L, 3L, 4L))) // 3 of doc 1's 4 tokens
    assert(idx.contains(("query", 4L, 1L, 1L)))
    assert(idx.count(_._1 == "engine") == 2)
  }

  test("bm25: only docs matching a query term appear; matches hand-computed score") {
    val hits = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 10, logIdf = false)
      .as[(Long, Long, Long, Int)].collect()
    assert(hits.map(_._1).toSet == Set(1L, 2L))
    // hand-compute doc 2's score: N=4 docs, df(spark)=2, tf=1, dl=3,
    // avgdl=(4+3+4+1)/4=3.0; idf=(4-2+0.5)/(2+0.5)=1.0;
    // tfPart=1*2.2/(1+1.2*(0.25+0.75*3/3.0))=2.2/2.2=1.0
    val doc2 = hits.find(_._1 == 2L).get
    assert(doc2._3 == 1000000L, s"expected 1.0 in micros, got ${doc2._3}")
    // doc 1 has higher tf (3) => saturating but strictly higher score => rank 1
    assert(hits.find(_._4 == 1).get._1 == 1L)
  }

  test("bm25: log and rational idf produce the same ranking on the corpus") {
    val docs001 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = Seq("table", "stream", "hash", "vector")
    def ranking(logIdf: Boolean): Seq[Long] =
      Retrieval.bm25TopK(docs001, "doc_id", "text", terms, k = 20, logIdf = logIdf)
        .orderBy(col("rank")).select("doc_id").as[Long].collect().toSeq
    assert(ranking(logIdf = true) == ranking(logIdf = false))
  }

  test("tfidf: weight_micros = tf/dl * N/df in micros; rarer terms weigh more") {
    val w = Retrieval.tfidf(docs, "doc_id", "text", logIdf = false)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    // doc 3 "flood": tf=1, dl=4, df=1, N=4 => 0.25 * 4 = 1.0
    assert(w((3L, "flood")) == 1000000L)
    // doc 2 "engine": tf=1, dl=3, df=2, N=4 => (1/3)*2 = 0.666667
    assert(w((2L, "engine")) == 666667L)
    assert(Retrieval.tfidf(docs, "doc_id", "text").count() == w.size)
  }

  test("bm25OverIndex on a drop-by-drop index equals bm25TopK on the full corpus") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = Seq("the", "flood", "model", "data")
    val direct = Retrieval.bm25TopK(corpus, "doc_id", "text", terms, k = 20, logIdf = false)
      .as[(Long, Long, Long, Int)].collect().toSeq
    val drops = Seq(
      corpus.filter(col("doc_id") % 3 === 0),
      corpus.filter(col("doc_id") % 3 === 1),
      corpus.filter(col("doc_id") % 3 === 2))
    val incremental = Retrieval.bm25OverIndex(
      drops.map(Retrieval.invertedIndex(_, "doc_id", "text")).reduce(_ unionByName _),
      drops.map(Retrieval.corpusStats(_, "doc_id", "text")).reduce(_ unionByName _),
      terms, k = 20, logIdf = false)
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(incremental == direct)
    assert(direct.nonEmpty)
  }

  test("phraseSearch: consecutive positions only, overlaps counted, pruned joins") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x value table part y"),          // one hit at pos 1
      (2L, "value table x table part"),      // terms present, never consecutive
      (3L, "value table part value table part"), // two hits
      (4L, "a a a"),                         // overlap corpus for the 2-gram below
      (5L, "nothing here")).toDF("doc_id", "text")
    val idx = Retrieval.positionalIndex(docs, "doc_id", "text")
    val got = Retrieval.phraseSearch(idx, Seq("value", "table", "part"))
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, 1), (3L, 2L, 0)))
    // overlapping matches both count ("a a a" has "a a" at 0 AND 1)
    val overlap = Retrieval.phraseSearch(idx, Seq("a", "a"))
      .as[(Long, Long, Int)].collect()
    assert(overlap.toSeq == Seq((4L, 2L, 0)))
    // single-term phrase = that term's postings, grouped
    val single = Retrieval.phraseSearch(idx, Seq("table"))
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(single.map(t => (t._1, t._2)).toSeq == Seq((1L, 1L), (2L, 2L), (3L, 2L)))
  }

  test("proximitySearch: unordered window pairs, exact counts and min distance") {
    import spark.implicits._
    val docs = Seq(
      (1L, "value x table"),           // dist 2 (unordered: value before table)
      (2L, "table y y y value"),       // dist 4: outside window 3
      (3L, "table value z table"),     // pairs: (0,1)=1, (3,1)=2 -> 2 pairs
      (4L, "neither here")).toDF("doc_id", "text")
    val idx = Retrieval.positionalIndex(docs, "doc_id", "text")
    val got = Retrieval.proximitySearch(idx, "table", "value", window = 3)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, 2), (3L, 2L, 1)))
  }
}
