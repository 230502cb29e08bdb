package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: DataFrame = Seq(
    (1L, "cherry cherry plum"),
    (2L, "cherry fig fig fig fig fig"),
    (3L, "plum plum"),
    (4L, "apple cherry"),
    (5L, "apple apple apple apple"),
    (6L, "fig plum date")
  ).toDF("doc_id", "text")

  /** Independent reference scorer: plain-Scala BM25 with the rational idf
    * and ascending-token contribution fold — the same arithmetic contract
    * the operator documents, derived separately from first principles.
    */
  private def expectedTopK(
      docs: Seq[(Long, String)], terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): Seq[(Long, Long, Double)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq
    }.toMap
    val n = docs.size.toLong
    val totalTokens = toks.values.map(_.size.toLong).sum
    val avgdl = totalTokens.toDouble / n.toDouble
    val df = terms.map(t => t -> toks.values.count(_.contains(t)).toLong).toMap
    val scored = toks.toSeq.flatMap { case (id, ts) =>
      val contribs = terms.sorted.flatMap { term =>
        val tf = ts.count(_ == term).toLong
        if (tf == 0L || df(term) == 0L) None
        else {
          val idf = ((n - df(term)).toDouble + 0.5) / (df(term).toDouble + 0.5)
          val tfTerm = (tf.toDouble * (k1 + 1.0)) /
            (tf.toDouble + k1 * ((1.0 - b) + b * (ts.size.toDouble / avgdl)))
          Some(idf * tfTerm)
        }
      }
      if (contribs.isEmpty) None
      else Some((id, contribs.size.toLong, contribs.foldLeft(0.0)(_ + _)))
    }
    scored.sortBy { case (id, _, s) => (-s, id) }.take(k)
  }

  test("bm25TopK matches an independent reference scorer bit-exactly") {
    val terms = Seq("cherry", "fig")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", terms, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = expectedTopK(
      Seq((1L, "cherry cherry plum"), (2L, "cherry fig fig fig fig fig"),
        (3L, "plum plum"), (4L, "apple cherry"), (5L, "apple apple apple apple"),
        (6L, "fig plum date")), terms, k = 4)
    assert(got.map(_._2).toSeq == want.map(_._1))
    assert(got.map(_._3).toSeq == want.map(_._2), "matched_terms")
    assert(got.map(_._4).toSeq == want.map(_._3),
      "scores must be bit-identical to the pinned-order reference fold")
    assert(got.map(_._1).toSeq == (1L to got.length).toSeq, "dense ranks")
    // doc 3 and 5 match nothing; doc 6 matches fig only
    assert(!got.map(_._2).contains(3L) && !got.map(_._2).contains(5L))
  }

  test("single-term ranking: higher tf wins, longer doc penalized") {
    val docs = Seq(
      (1L, "cherry cherry plum"),         // tf=2, dl=3
      (2L, "cherry a b c d e f g"),       // tf=1, dl=8
      (3L, "plum plum")                   // no match
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("cherry"), k = 3)
      .collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(got.forall(_.getLong(2) == 1L))
  }

  test("rrfFuse: both-list docs outrank single-list docs; 1/(60+rank) weighting") {
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val sem = Seq((20L, 1L), (40L, 2L), (10L, 3L)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(lex, sem), "doc_id", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // 20: 1/62 + 1/61 ≈ .0325 beats 10: 1/61 + 1/63 ≈ .0323; both beat
    // single-list 40 (1/62) and 30 (1/63)
    assert(out.map(_._2).toSeq == Seq(20L, 10L, 40L, 30L))
    assert(out.map(_._3).toSeq == Seq(2L, 2L, 1L, 1L), "sources counts")
    val expected20 = 1.0 / (60.0 + 2.0) + 1.0 / (60.0 + 1.0)
    assert(out.head._4 == 0.0 + 1.0 / (60.0 + 2.0) + 1.0 / (60.0 + 1.0) &&
      out.head._4 == expected20, "pinned-order fold, bit-exact")
  }

  test("refreshInvertedIndex/refreshCorpusStats: refresh == rebuild exactly") {
    val base = corpus.where($"doc_id" % 2 =!= 0)
    val delta = corpus.where($"doc_id" % 2 === 0)
    val refreshed = Retrieval.refreshInvertedIndex(
      Retrieval.invertedIndex(base, "doc_id", "text"), delta, "doc_id", "text")
    val rebuilt = Retrieval.invertedIndex(corpus, "doc_id", "text")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(refreshed.collect().map(key).toSet == rebuilt.collect().map(key).toSet)
    assert(refreshed.count() == rebuilt.count(), "no duplicate postings")

    val refStats = Retrieval.refreshCorpusStats(
      Retrieval.corpusStats(base, "doc_id", "text"), delta, "doc_id", "text")
      .collect().head
    val fullStats = Retrieval.corpusStats(corpus, "doc_id", "text").collect().head
    assert((refStats.getLong(0), refStats.getLong(1)) ==
      (fullStats.getLong(0), fullStats.getLong(1)))
  }

  test("deleteFromIndex: deletion == rebuild over the surviving corpus; unknown ids are no-ops") {
    val postings = Retrieval.invertedIndex(corpus, "doc_id", "text")
    val stats = Retrieval.corpusStats(corpus, "doc_id", "text")
    val victims = corpus.where($"doc_id" % 2 === 0).select("doc_id")
    val (p2, s2) = Retrieval.deleteFromIndex(postings, stats, victims)
    val surviving = corpus.where($"doc_id" % 2 =!= 0)
    val rebuiltP = Retrieval.invertedIndex(surviving, "doc_id", "text")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(p2.collect().map(key).toSet == rebuiltP.collect().map(key).toSet)
    assert(p2.count() == rebuiltP.count())
    val got = s2.collect().head
    val want = Retrieval.corpusStats(surviving, "doc_id", "text").collect().head
    assert((got.getLong(0), got.getLong(1)) == (want.getLong(0), want.getLong(1)),
      "stats decrement recovered from the index must equal a re-count")
    // ids not in the index change nothing (idempotent replay)
    import spark.implicits._
    val (p3, s3) = Retrieval.deleteFromIndex(p2, s2, Seq(99999L, -5L).toDF("doc_id"))
    assert(p3.count() == p2.count())
    val again = s3.collect().head
    assert((again.getLong(0), again.getLong(1)) == (got.getLong(0), got.getLong(1)))
    // deleting every remaining doc empties the state cleanly
    val (p4, s4) = Retrieval.deleteFromIndex(p2, s2, surviving.select("doc_id"))
    assert(p4.count() == 0L)
    val empty = s4.collect().head
    assert((empty.getLong(0), empty.getLong(1)) == (0L, 0L))
  }

  test("positionalIndex/phraseSearch: positions 1-based; overlaps and repeats counted; no cross-doc bleed") {
    val docs = Seq(
      (1L, "a a a b"),          // "a a" overlaps at 1 and 2; "a b" at 3
      (2L, "x a"),              // ends with the phrase head — no "a b" here
      (3L, "b a b a b"),        // "a b" at 2 and 4
      (4L, "A  B")              // case/whitespace normalization
    ).toDF("doc_id", "text")
    val idx = Retrieval.positionalIndex(docs, "doc_id", "text")
    assert(idx.where($"doc_id" === 1L && $"token" === "b").head.getLong(2) == 4L,
      "positions are 1-based occurrence slots")
    def matches(phrase: String*) =
      Retrieval.phraseSearch(idx, phrase).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matches("a", "a") == Set((1L, 1L), (1L, 2L)),
      "overlapping occurrences each match (start positions are join keys)")
    assert(matches("a", "b") == Set((1L, 3L), (3L, 2L), (3L, 4L), (4L, 1L)))
    assert(matches("a", "b", "a") == Set((3L, 2L)), "three-term chain")
    assert(matches("b", "x").isEmpty, "adjacency never crosses documents")
    assert(matches("a") == Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 2L), (3L, 2L), (3L, 4L), (4L, 1L)),
      "single-term phrase degenerates to the token's occurrence list")
  }

  test("bm25Probe over a refreshed index == bm25TopK over the full corpus") {
    val base = corpus.where($"doc_id" % 2 =!= 0)
    val delta = corpus.where($"doc_id" % 2 === 0)
    val postings = Retrieval.refreshInvertedIndex(
      Retrieval.invertedIndex(base, "doc_id", "text"), delta, "doc_id", "text")
    val stats = Retrieval.refreshCorpusStats(
      Retrieval.corpusStats(base, "doc_id", "text"), delta, "doc_id", "text")
    val probe = Retrieval.bm25Probe(postings, stats, Seq("cherry", "fig"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val direct = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("cherry", "fig"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(probe.toSeq == direct.toSeq)
  }
}
