package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the span-index fold invariant: [[Dedup.refreshSpanIndex]] over any
  * split of the corpus equals [[Dedup.spanIndexState]] built from scratch
  * over the whole corpus — index row set AND true counts. The fixture is
  * tuned so the cap transition fires: some grams stay under the cap, some
  * were already over it in the first generation, and some are pushed over
  * it BY the fold (the case the true-count sidecar exists for).
  */
class SpanIndexSpec extends SparkSpec {
  import spark.implicits._

  // 30 docs over a small cyclic alphabet (heavy grams: each of the 11
  // distinct 3-grams occurs ~49 times, OVER the cap of 30 — but UNDER it
  // in a small first generation, so the fold pushes them over) plus 10
  // unique-token docs (light grams: every 3-gram occurs once, under cap)
  private def doc(i: Long) =
    if (i <= 30L) (i, (0 until 20).map(j => s"w${(i * 3 + j) % 11}").mkString(" "))
    else (i, (0 until 20).map(j => s"u${i}x$j").mkString(" "))
  private lazy val all = (1L to 40L).map(doc).toDF("doc_id", "text")
  private val Cap = 30

  private def collectIdx(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "pos", "h").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  private def collectCnt(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("fold == rebuild at every split point, including a cap transition") {
    val rebuilt = Dedup.spanIndexState(all, "doc_id", "text",
      minSpanTokens = 3, maxBucketSize = Cap)
    val rebuiltIdx = collectIdx(rebuilt.index)
    val rebuiltCnt = collectCnt(rebuilt.counts)
    // sanity: the fixture exercises both sides of the cap
    val over = rebuilt.counts.where(col("n") > Cap).count()
    val under = rebuilt.counts.where(col("n") <= Cap).count()
    assert(over > 0 && under > 0,
      s"fixture must produce buckets on both sides of the cap ($over over, $under under)")
    for (split <- Seq(5L, 15L, 25L)) {
      val st0 = Dedup.spanIndexState(all.where(col("doc_id") <= split),
        "doc_id", "text", minSpanTokens = 3, maxBucketSize = Cap)
      val st1 = Dedup.refreshSpanIndex(st0,
        all.where(col("doc_id") > split), "doc_id", "text")
      assert(collectIdx(st1.index) == rebuiltIdx, s"index diverged at split $split")
      assert(collectCnt(st1.counts) == rebuiltCnt, s"counts diverged at split $split")
      // a gram pushed over the cap BY the fold must have dropped its
      // already-indexed generation-0 rows
      val pushedOver = st0.counts.as("a")
        .join(st1.counts.as("b"), col("a.h") === col("b.h"))
        .where(col("a.n") <= Cap && col("b.n") > Cap)
        .select(col("a.h")).collect().map(_.getLong(0)).toSet
      if (pushedOver.nonEmpty) {
        val survivors = st1.index
          .where(col("h").isin(pushedOver.toSeq: _*)).count()
        assert(survivors == 0L,
          s"grams pushed over the cap kept $survivors indexed rows at split $split")
      }
      st0.index.unpersist(); st0.counts.unpersist()
    }
    rebuilt.index.unpersist(); rebuilt.counts.unpersist()
  }

  test("fold == rebuild on seeded random corpora (fuzz)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val alphabet = 5 + rnd.nextInt(8)
      val docs = (1L to 25L).map { i =>
        val len = 8 + rnd.nextInt(15)
        (i, (0 until len).map(_ => s"t${rnd.nextInt(alphabet)}").mkString(" "))
      }.toDF("doc_id", "text")
      val cap = 3 + rnd.nextInt(20)
      val split = 5L + rnd.nextInt(15)
      val rebuilt = Dedup.spanIndexState(docs, "doc_id", "text",
        minSpanTokens = 3, maxBucketSize = cap)
      val st0 = Dedup.spanIndexState(docs.where(col("doc_id") <= split),
        "doc_id", "text", minSpanTokens = 3, maxBucketSize = cap)
      val st1 = Dedup.refreshSpanIndex(st0,
        docs.where(col("doc_id") > split), "doc_id", "text")
      assert(collectIdx(st1.index) == collectIdx(rebuilt.index),
        s"index diverged (seed=$seed cap=$cap split=$split)")
      assert(collectCnt(st1.counts) == collectCnt(rebuilt.counts),
        s"counts diverged (seed=$seed cap=$cap split=$split)")
      Seq(rebuilt.index, rebuilt.counts, st0.index, st0.counts)
        .foreach(_.unpersist())
    }
  }

  test("selfRepetitionSpans: hand-computed repeats, self-overlap, cap, and clean docs") {
    val docs = Seq(
      // one exact 4-token repeat separated by a spacer: span (1, 6, 4)
      (1L, "x1 x2 x3 x4 y x1 x2 x3 x4"),
      // periodic text "a b" x4: the self-OVERLAP case — diag 2 islands
      // merge to tokens[1..6] == tokens[3..8] (span 6), plus diag 4
      // tokens[1..4] == tokens[5..8] (span 4)
      (2L, (0 until 8).map(i => if (i % 2 == 0) "a" else "b").mkString(" ")),
      // no repetition
      (3L, (0 until 10).map(i => s"z$i").mkString(" ")),
      // one token repeated 30x: every (doc, gram) bucket is 27 > cap 20
      // -> capped out entirely
      (4L, Seq.fill(30)("q").mkString(" "))
    ).toDF("doc_id", "text")
    val spans = Dedup.selfRepetitionSpans(docs, "doc_id", "text",
        minSpanTokens = 4, maxOccurrences = 20)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(spans == Set((1L, 1L, 6L, 4L), (2L, 1L, 3L, 6L), (2L, 1L, 5L, 4L)),
      s"got $spans")
    val rep = Dedup.selfRepetitionReport(docs, "doc_id", "text",
        minSpanTokens = 4, maxOccurrences = 20)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: spans cover positions 1-4 and 6-9 of 9 tokens -> 8 covered
    assert(rep(1L).getLong(2) == 1L && rep(1L).getLong(3) == 8L)
    // doc 2: both spans' sides union to the whole 8-token doc
    assert(rep(2L).getLong(2) == 2L && rep(2L).getLong(3) == 8L &&
      rep(2L).getDouble(4) == 1.0)
    // docs 3 (clean) and 4 (capped out) report zero repetition
    assert(rep(3L).getLong(2) == 0L && rep(3L).getLong(3) == 0L)
    assert(rep(4L).getLong(2) == 0L && rep(4L).getLong(3) == 0L)
  }

  test("spanCoverageAgainstIndex equals brute-force position counting (fuzz, 3 corpora)") {
    // same diagonal brute force as DedupSpec's sharedSpans fuzz, but
    // delta→corpus and reduced to the per-doc covered-position SET — the
    // coverage statistic q253's admission gate thresholds on
    val rnd = new scala.util.Random(1717)
    val alphabet = Array("t0", "t1", "t2", "t3", "t4")
    val l = 4
    for (round <- 1 to 3) {
      def gen(ids: Range) = ids.map { id =>
        id.toLong -> Array.fill(12 + rnd.nextInt(20))(
          alphabet(rnd.nextInt(alphabet.length)))
      }
      val corpus = gen(1 to 8)
      val delta = gen(101 to 106)
      val expected = delta.map { case (idD, tD) =>
        val covered = scala.collection.mutable.Set.empty[Long]
        for {
          (_, tC) <- corpus
          d <- -(tC.length - 1) to (tD.length - 1) // diag = posD - posC, 0-based
        } {
          var run = 0; var i = math.max(0, d); var lastStart = -1
          while (i <= tD.length) {
            val j = i - d
            val m = i < tD.length && j >= 0 && j < tC.length && tD(i) == tC(j)
            if (m) { if (run == 0) lastStart = i; run += 1 }
            else {
              if (run >= l)
                (lastStart + 1 to lastStart + run).foreach(p => covered += p.toLong)
              run = 0
            }
            i += 1
          }
        }
        idD -> ((tD.length.toLong, covered.size.toLong))
      }.toMap
      def toDf(docs: Seq[(Long, Array[String])]) =
        docs.toDF("doc_id", "toks")
          .select(col("doc_id"), concat_ws(" ", col("toks")).as("text"))
      val idx = Dedup.spanGramIndex(toDf(corpus), "doc_id", "text",
        minSpanTokens = l, maxBucketSize = 100000)
      val got = Dedup.spanCoverageAgainstIndex(idx, toDf(delta), "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == expected, s"round $round: got $got expected $expected")
      assert(expected.values.exists(_._2 > 0), s"round $round: vacuous fixture")
      idx.unpersist()
    }
  }

  test("selfRepetitionSpans equals brute-force diagonal enumeration (fuzz, 3 corpora)") {
    val rnd = new scala.util.Random(2929)
    val alphabet = Array("u0", "u1", "u2", "u3")
    val l = 4
    for (round <- 1 to 3) {
      val docs = (1L to 8L).map { id =>
        id -> Array.fill(14 + rnd.nextInt(18))(
          alphabet(rnd.nextInt(alphabet.length)))
      }
      val expected = (for {
        (id, t) <- docs
        d <- 1 until t.length // diag = posB - posA > 0
      } yield {
        val spans = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long)]
        var run = 0; var j = d; var lastStart = -1
        // compare t(j) with t(j - d): a run of length r >= l is the
        // maximal repeat (pos_a = start-d+1, pos_b = start+1, 1-based)
        while (j <= t.length) {
          val m = j < t.length && t(j) == t(j - d)
          if (m) { if (run == 0) lastStart = j; run += 1 }
          else {
            if (run >= l)
              spans += ((id, lastStart - d + 1L, lastStart + 1L, run.toLong))
            run = 0
          }
          j += 1
        }
        spans.toList
      }).flatten.toSet
      val got = Dedup.selfRepetitionSpans(
          docs.toDF("doc_id", "toks")
            .select(col("doc_id"), concat_ws(" ", col("toks")).as("text")),
          "doc_id", "text", minSpanTokens = l, maxOccurrences = 100000)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == expected,
        s"round $round: missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      assert(expected.nonEmpty, s"round $round: vacuous fixture")
    }
  }

  test("refreshSpanIndex rejects a state missing the span metadata") {
    val bogus = Dedup.SpanIndexState(
      Seq((1L, 1L, 42L)).toDF("doc_id", "pos", "h"),
      Seq((42L, 1L)).toDF("h", "n"))
    val e = intercept[IllegalArgumentException] {
      Dedup.refreshSpanIndex(bogus, all, "doc_id", "text")
    }
    assert(e.getMessage.contains("spanIndexState"))
  }

  test("spanCoverageAgainstIndex: full duplicates cover 1.0, unrelated docs 0.0, verdict cross-multiply matches") {
    val corpus = (1L to 10L)
      .map(i => (i, (0 until 16).map(j => s"c${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    val delta = Seq(
      (101L, corpus.where(col("doc_id") === 3L).head.getString(1)), // verbatim copy
      (102L, (0 until 16).map(j => s"unrelated$j").mkString(" ")))
      .toDF("doc_id", "text")
    val idx = Dedup.spanGramIndex(corpus, "doc_id", "text",
      minSpanTokens = 8, maxBucketSize = 50)
    val out = graft.streaming.DocStream
      .spanAdmissionVerdicts(delta, idx, maxCoveredPct = 50)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(101L).getLong(2) == out(101L).getLong(1), "full copy: covered == n")
    assert(out(101L).getDouble(3) == 1.0 && !out(101L).getBoolean(4))
    assert(out(102L).getLong(2) == 0L && out(102L).getBoolean(4))
    idx.unpersist()
  }
}
