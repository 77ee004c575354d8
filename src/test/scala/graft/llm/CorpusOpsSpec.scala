package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sampling, PII flagging, and decontamination semantics. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunking covers every token with the configured overlap and reconstructs the doc") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chunks = TextAnalysis.chunk(docs, "doc_id", "text", chunkTokens = 64, overlap = 16)
      .as[(Long, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(chunks.keySet == texts.keySet)
    chunks.foreach { case (id, cs) =>
      val tokens = texts(id).trim.split("\\s+").toSeq
      // every chunk is the contiguous 64-token slice at its stride-48
      // offset; the first starts the doc and the last reaches its end
      cs.foreach { case (_, ci, nTok, text) =>
        val expected = tokens.slice(ci * 48, ci * 48 + 64)
        assert(text == expected.mkString(" "))
        assert(nTok == expected.length)
      }
      assert(cs.head._2 == 0)
      val (_, lastCi, lastN, _) = cs.last
      assert(lastCi * 48 + lastN == tokens.length, s"doc $id not covered to the end")
    }
  }

  test("operators tolerate an empty corpus") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.minhashPairs(empty, "doc_id", "text").count() == 0)
    assert(Dedup.exact(empty, "doc_id", "text").count() == 0)
    assert(TextAnalysis.winnow(empty, "doc_id", "text").count() == 0)
    assert(TextAnalysis.repetition(empty, "doc_id", "text").count() == 0)
    assert(TextAnalysis.pairVocabulary(empty, "doc_id", "text").count() == 0)
    assert(Curation.curate(empty, "doc_id", "text").count() == 0)
    assert(Contamination.overlap(empty, empty, "doc_id", "text").count() == 0)
  }

  test("split is deterministic, covers every row, and respects cut points") {
    val docs = (0L until 1000L).toDF("doc_id")
    val s1 = Sampling.split(docs, "doc_id").collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val s2 = Sampling.split(docs.repartition(7), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s1 == s2) // partitioning-independent
    assert(s1.size == 1000)
    val byBucket = Sampling.split(docs, "doc_id")
      .select("bucket", "split").distinct().as[(Long, String)].collect()
    assert(byBucket.forall { case (b, s) =>
      (b < 80 && s == "train") || (b >= 80 && b < 90 && s == "val") || (b >= 90 && s == "test")
    })
  }

  test("hashSample keeps exactly the rows below the pct cut") {
    val docs = (0L until 1000L).toDF("doc_id")
    val kept = Sampling.hashSample(docs, "doc_id", 10).as[Long].collect().toSet
    val expected = (0L until 1000L).filter(id => ((id * 1000003L + 17L) % TextHash.Prime) % 100 < 10)
    assert(kept == expected.toSet)
  }

  test("stratifiedSample keeps min(quota, stratum size) rows per stratum, deterministically") {
    val docs = (0L until 100L).map(id => (id, s"src${id % 3}")).toDF("doc_id", "source")
    val s1 = Mixture.stratifiedSample(docs, "doc_id", "source", 5)
      .as[(Long, String)].collect().toSet
    val s2 = Mixture.stratifiedSample(docs.repartition(13), "doc_id", "source", 5)
      .as[(Long, String)].collect().toSet
    assert(s1 == s2)
    assert(s1.groupBy(_._2).forall(_._2.size == 5))
    val tiny = Seq((1L, "only")).toDF("doc_id", "source")
    assert(Mixture.stratifiedSample(tiny, "doc_id", "source", 5).count() == 1)
  }

  test("removeOverlap cuts benchmark-covered spans, salvages the rest, null-safe") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),                 // the benchmark doc itself
      (2L, "intro alpha beta gamma outro words here"),// partial: leaked 3-gram inside
      (3L, "totally different content entirely"),     // disjoint: untouched
      (4L, "alpha beta"),                             // too short for a 3-gram
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 1L)
    val out = Contamination.removeOverlap(docs, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // benchmark doc: every token covered -> empty rebuild
    assert(out(1L).getLong(2) == 0L && out(1L).getString(3) == "")
    // partial: the leaked gram at pos 2 covers tokens 2..4
    assert(out(2L).getString(3) == "intro outro words here")
    assert(out(2L).getLong(1) == 7L && out(2L).getLong(2) == 4L)
    // disjoint: byte-identical text survives
    assert(out(3L).getString(3) == "totally different content entirely")
    // sub-gram-length doc: nothing can match, kept whole
    assert(out(4L).getString(3) == "alpha beta")
    // NULL text: surfaces with NULL n_tokens, never vanishes
    assert(out(5L).isNullAt(1) && out(5L).getLong(2) == 0L && out(5L).getString(3) == "")
  }

  test("rebalance approximates target shares, caps over-demanded strata, drops untargeted") {
    // 1000 docs: src0 has 100, src1 has 300, src2 has 600
    val docs = (0L until 1000L).map { i =>
      val s = if (i < 100) "src0" else if (i < 400) "src1" else "src2"
      (i, s)
    }.toDF("doc_id", "source")
    // targets: src0 30% (over-demanded: only 10% exists -> kept whole),
    // src1 30%, src2 40%; src3 untargeted
    val out = Mixture.rebalance(docs, "doc_id", "source",
      Map("src0" -> 300000L, "src1" -> 300000L, "src2" -> 400000L))
    val kept = out.select("doc_id", "source").as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("src0") == 100)                   // rate capped at 1e6
    // src1: rate = 300000*1000/300 = 1e6 -> whole; src2: 400000*1000/600 ≈ 666666
    assert(bySrc("src1") == 300)
    assert(bySrc("src2") > 340 && bySrc("src2") < 460) // ~2/3 of 600, hash noise
    // deterministic under partitioning
    val out13 = Mixture.rebalance(docs.repartition(13), "doc_id", "source",
      Map("src0" -> 300000L, "src1" -> 300000L, "src2" -> 400000L))
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    assert(out13 == kept.toSet)
  }

  test("domainCap keeps at most perDomain docs per registrable domain and drops domainless") {
    val docs = Seq(
      (1L, "https://a.example.com/1"), (2L, "https://b.example.com/2"),
      (3L, "http://example.com/3"), (4L, "https://www.example.com/4"),
      (5L, "https://other.co.uk/x"), (6L, "http://sub.other.co.uk/y"),
      (7L, "no url at all"),                     // no host -> dropped
      (8L, "https://co.uk/suffix-only"),         // suffix-only host -> dropped
      (9L, "http://10.0.0.1/ip")).toDF("doc_id", "url")
    val out = Mixture.domainCap(docs, "doc_id", "url", perDomain = 3)
      .select("doc_id", "domain").as[(Long, String)].collect().toSet
    val byDomain = out.groupBy(_._2)
    assert(byDomain("example.com").size == 3)    // 4 candidates, capped at 3
    assert(byDomain("other.co.uk").size == 2)
    assert(byDomain("10.0.0.1").size == 1)
    assert(!out.exists(t => t._1 == 7L || t._1 == 8L))
    // partitioning-invariant: same winners at a different parallelism
    val out13 = Mixture.domainCap(docs.repartition(13), "doc_id", "url", 3)
      .select("doc_id", "domain").as[(Long, String)].collect().toSet
    assert(out == out13)
  }

  test("budgetSample admits docs per source until the token budget, deterministically") {
    val docs = (0L until 60L).map(id => (id, s"src${id % 2}", 100L))
      .toDF("doc_id", "source", "n_tokens")
    val out = Mixture.budgetSample(docs, "doc_id", "source", "n_tokens", budget = 450L)
    val rows = out.as[(Long, String, Long, Int, Long)].collect()
    // 100-token docs against a 450 budget: cum_before < 450 admits the
    // first FIVE per source (the fifth starts at 400 — budgets overshoot
    // by at most one doc, the greedy cut)
    assert(rows.groupBy(_._2).forall(_._2.length == 5))
    // take_order is 1..5 and cum_before is its prefix sum
    rows.groupBy(_._2).values.foreach { g =>
      assert(g.map(_._4).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      g.foreach { case (_, _, _, ord, cum) => assert(cum == (ord - 1) * 100L) }
    }
    // partitioning-invariant, and a tiny source keeps everything
    val again = Mixture.budgetSample(docs.repartition(7), "doc_id", "source",
      "n_tokens", budget = 450L).as[(Long, String, Long, Int, Long)].collect()
    assert(again.toSet == rows.toSet)
    val tiny = Seq((1L, "only", 999999L)).toDF("doc_id", "source", "n_tokens")
    assert(Mixture.budgetSample(tiny, "doc_id", "source", "n_tokens", 10L).count() == 1)
  }

  test("mixture report shares sum to 1") {
    val docs = (0L until 60L).map(id => (id, s"src${id % 3}", s"l${id % 2}", 10L + id))
      .toDF("doc_id", "source", "lang", "n_chars")
    val rep = Mixture.report(docs, Seq("source", "lang"), "n_chars")
    val (ds, cs) = rep.agg(sum("doc_share"), sum("char_share"))
      .as[(Double, Double)].head()
    assert(math.abs(ds - 1.0) < 1e-9 && math.abs(cs - 1.0) < 1e-9)
    assert(rep.count() == 6)
  }

  test("piiFlags counts emails, phones, ips") {
    val docs = Seq(
      (1L, "contact me at a.b@example.com or c@d.org thanks"),
      (2L, "call 555-123-4567 now"),
      (3L, "server at 10.0.0.1 and 192.168.1.255"),
      (4L, "plain text with no identifiers")).toDF("doc_id", "text")
    val got = TextAnalysis.piiFlags(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 2L, 0L, 0L, true)))
    assert(got(1) == ((2L, 0L, 1L, 0L, true)))
    assert(got(2) == ((3L, 0L, 0L, 2L, true)))
    assert(got(3) == ((4L, 0L, 0L, 0L, false)))
  }

  test("redactPii replaces spans with typed placeholders, email digits never phone/IP-match") {
    val docs = Seq(
      (1L, "mail a.b@example.com or c@d.org ok"),
      (2L, "call 555-123-4567 or 555.987.6543"),
      (3L, "peers 10.0.0.1 and 192.168.1.255"),
      (4L, "id 123.456.7890@numeric.example.com stays one email"), // email eats it first
      (5L, "plain"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(1) == "mail <EMAIL> or <EMAIL> ok" && got(1L).getBoolean(2))
    assert(got(2L).getString(1) == "call <PHONE> or <PHONE>" && got(2L).getBoolean(2))
    assert(got(3L).getString(1) == "peers <IP> and <IP>" && got(3L).getBoolean(2))
    assert(got(4L).getString(1) == "id <EMAIL> stays one email" && got(4L).getBoolean(2))
    assert(got(5L).getString(1) == "plain" && !got(5L).getBoolean(2))
    assert(got(6L).isNullAt(1) && !got(6L).getBoolean(2))
  }

  test("overlap: benchmark doc fully contaminated, disjoint doc clean, short doc zero") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"), // the benchmark doc
      (2L, "alpha beta gamma delta zeta"),    // shares 2 of 3 grams
      (3L, "one two three four five six"),    // disjoint
      (4L, "too short")).toDF("doc_id", "text")
    val got = Contamination.overlap(docs, docs.filter(col("doc_id") === 1), "doc_id", "text")
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 3L, 3L, 1.0, true)))
    assert(got(1)._3 == 2L && got(1)._5) // 2/3 >= 0.2
    assert(got(2) == ((3L, 4L, 0L, 0.0, false)))
    assert(got(3) == ((4L, 0L, 0L, 0.0, false)))
  }

  test("semantic: exact copy and scaled copy flag, orthogonal and zero stay clean") {
    val bench = Seq((100L, Seq(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // exact copy: cosine 1
      (2L, Seq(5.0f, 0.0f, 0.0f, 0.0f)),   // scaled copy: cosine 1
      (3L, Seq(1.0f, 0.2f, 0.0f, 0.0f)),   // near copy, same half-space
      (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f)),  // antipode: cosine -1
      (5L, Seq(0.0f, 0.0f, 0.0f, 0.0f))    // zero norm: excluded, clean
    ).toDF("vec_id", "embedding")
    val got = Contamination.semantic(corpus, bench, "vec_id", "embedding",
      nPlanes = 2, minCosine = 0.9)
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(got.length == 5)
    assert(got(0) == ((1L, 1L, 1.0, true)))
    assert(got(1) == ((2L, 1L, 1.0, true)))
    assert(got(2)._4 && got(2)._2 == 1L && got(2)._3 > 0.9 && got(2)._3 < 1.0)
    assert(got(3) == ((4L, 0L, 0.0, false)))
    assert(got(4) == ((5L, 0L, 0.0, false)))
  }

  test("semantic: multiprobe recovers a neighbor split across buckets") {
    // vectors on either side of hyperplane 0 land in buckets differing in
    // bit 0; multiprobe=1 flips that bit on the bench side
    val bench = Seq((100L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val base = Contamination.semantic(corpus, bench, "vec_id", "embedding",
      nPlanes = 4, minCosine = 0.5, multiprobe = 0)
      .as[(Long, Long, Double, Boolean)].head()
    val probed = Contamination.semantic(corpus, bench, "vec_id", "embedding",
      nPlanes = 4, minCosine = 0.5, multiprobe = 2)
      .as[(Long, Long, Double, Boolean)].head()
    // identical vectors share a bucket, so both find it; probed must not
    // double-count across probes
    assert(base._2 == 1L && probed._2 == 1L)
  }

  test("corpusOverlap: exact Jaccard below capacity; disjoint/identical poles") {
    val a = Seq("p q r s", "p q r t").toDF("text")   // grams: pqr qrs, pqr qrt
    val b = Seq("p q r u v").toDF("text")            // grams: pqr qru ruv
    val row = Contamination.corpusOverlap(a, b, "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    // union {pqr,qrs,qrt,qru,ruv} = 5; intersection {pqr} = 1
    assert(row == ((200000L, 3L, 3L, 5L, true)))
    val same = Contamination.corpusOverlap(a, a, "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(same == ((1000000L, 3L, 3L, 3L, true)))
    val disj = Contamination.corpusOverlap(a, Seq("x y z w").toDF("text"), "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(disj._1 == 0L && disj._5)
    // too-short and NULL texts contribute no grams
    val short = Contamination.corpusOverlap(
      Seq(Some("p q"), None).toDF("text"), b, "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(short == ((0L, 0L, 3L, 3L, true)))
  }

  test("corpusOverlap estimate path is partition-invariant and in a sane band") {
    val mk = (off: Int) => (0 until 3000)
      .map(i => s"g${i + off} g${i + off + 1} g${i + off + 2} g${i + off + 3}")
      .toDF("text")
    val a = mk(0)          // grams over ids 0..3002ish
    val b = mk(1500)       // half-overlapping id range
    val r1 = Contamination.corpusOverlap(a, b, "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    val r2 = Contamination.corpusOverlap(a.repartition(13), b.repartition(7), "text")
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(r1 == r2, "KMV overlap must be partition-invariant")
    assert(!r1._5, "6k-gram sides must overflow the 256 sketch")
    // true Jaccard ~ 1/3 (half of each side shared): loose band only —
    // exactness of the integer estimator is the oracle's job
    assert(r1._1 > 150000L && r1._1 < 550000L, s"jaccard ppm ${r1._1}")
  }
}
