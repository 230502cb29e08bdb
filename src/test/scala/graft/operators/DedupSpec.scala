package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "THE  quick brown fox jumps over the lazy dog "), // exact dup of 1 after normalize
    (4L, "completely different content about spark engines"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("exactGroups collapses normalization-equal docs") {
    val groups = Dedup.exactGroups(docs, col("doc_id"), col("text")).collect()
    val dupGroup = groups.find(_.getLong(2) == 2L)
    assert(dupGroup.isDefined, "docs 1 and 3 should share a content hash")
    assert(dupGroup.get.getLong(1) == 1L, "canonical id is the minimum")
    assert(groups.length == 4)
  }

  test("exactDedup keeps one row per content, minimum id") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text").select("doc_id")
      .as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 2L, 4L, 5L)))
  }

  test("minhash LSH finds the near-duplicate pair and nothing spurious") {
    val pairs = Dedup
      .minhashNearDuplicates(docs, "doc_id", "text",
        numHashes = 16, numBands = 8, shingleN = 1, minJaccard = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 3L)),
      s"expected near-dup pair among $pairs")
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(4L) },
      "doc 4 shares almost nothing and must not pair")
  }

  test("minhash LSH with STRING ids takes the single-pass capped path and matches Long-id results") {
    val sdocs = docs.select(
      concat(lit("doc-"), col("doc_id")).as("doc_id"), col("text"))
    val spairs = Dedup
      .minhashNearDuplicates(sdocs, "doc_id", "text",
        numHashes = 16, numBands = 8, shingleN = 1, minJaccard = 0.5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    val lpairs = Dedup
      .minhashNearDuplicates(docs, "doc_id", "text",
        numHashes = 16, numBands = 8, shingleN = 1, minJaccard = 0.5)
      .collect()
      .map(r => (s"doc-${r.getLong(0)}", s"doc-${r.getLong(1)}"))
      .toSet
    assert(spairs == lpairs, s"string-id pairs $spairs must mirror long-id pairs $lpairs")
  }

  test("ngramJaccard computes exact unigram jaccard") {
    // docs 1 and 2: 8 distinct tokens each, 7 shared, union 9 → 7/9.
    val exact = Dedup
      .ngramJaccard(
        docs, "doc_id", "text",
        Seq((1L, 2L)).toDF("id_a", "id_b"), shingleN = 1)
      .select("jaccard").as[Double].head()
    assert(math.abs(exact - 7.0 / 9.0) < 1e-9)
  }

  test("simhash: identical content → distance 0; near-dup → small; distinct → large") {
    val fp = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    assert(ham(1L, 3L) == 0, "normalization-equal docs have equal fingerprints")
    assert(ham(1L, 2L) < ham(1L, 4L), "near-dup closer than unrelated doc")
  }

  test("native minhash signature is bit-identical to the HOF formulation") {
    val d = graft.core.Tables(spark, Sf0001).documents
    import graft.functions.TextFunctions.shingles
    val both = d.select(
      graft.functions.MinHashSignatureExpr
        .minhashFast(shingles(col("text"), 1), 16).as("fast"),
      Dedup.minhashSignatureOfShingles(shingles(col("text"), 1), 16).as("hof"))
    assert(both.where(col("fast") =!= col("hof")).count() == 0)
  }

  test("native winnow kernel is bit-identical to the HOF formulation") {
    val d = graft.core.Tables(spark, Sf0001).documents
    import graft.functions.TextFunctions.shingles
    val both = d.select(
      graft.functions.WinnowExpr.winnowFast(shingles(col("text"), 3), 4).as("fast"),
      Dedup.winnowedFingerprints(col("text"), 3, 4).as("hof"))
    assert(both.where(col("fast") =!= col("hof")).count() == 0)
  }

  test("native simhash expression is bit-identical to the HOF formulation") {
    val d = graft.core.Tables(spark, Sf0001).documents
    val both = d.select(
      Dedup.simhash64(col("text")).as("fast"),
      Dedup.simhash64Hof(col("text")).as("hof"))
    assert(both.where(col("fast") =!= col("hof")).count() == 0)
  }

  test("simhash near-duplicate blocking finds the exact dup pair") {
    val out = Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxHamming = 3)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)))
    // the block cap is groupBy-shaped, not a window (mega-block skew safety)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), s"cap must not plan a window:\n$plan")
  }

  test("simhashIncrementalDuplicates pairs delta docs with corpus near-dups; cap drops boilerplate") {
    val corpus = docs.where($"doc_id" =!= 3L)
    val delta = docs.where($"doc_id" === 3L) // normalize-equal to corpus doc 1
    val inc = Dedup
      .simhashIncrementalDuplicates(corpus, delta, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(inc.nonEmpty && inc.forall(_._1 == 3L), s"only delta ids on the left: ${inc.toSeq}")
    assert(inc.exists(p => p._2 == 1L && p._3 == 0),
      s"normalize-equal pair must surface at hamming 0: ${inc.toSeq}")

    // 300 identical corpus docs overflow every quarter-block at cap 200:
    // the identical delta doc must find nothing through the capped index
    val body = "shared boilerplate header"
    val boilCorpus = (1L to 300L).map(i => (i, body)).toDF("doc_id", "text")
    val boilDelta = Seq((1000L, body)).toDF("doc_id", "text")
    assert(Dedup.simhashIncrementalDuplicates(
      boilCorpus, boilDelta, "doc_id", "text", maxHamming = 3).count() == 0L)
  }

  test("duplicateClusters closes pairs under transitivity (chain + triangle + isolated pair)") {
    // chain 1-2-3-4 (diameter 3, exercises multi-round propagation),
    // triangle 10-11-12 with redundant edges, isolated pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("duplicateClusters converges logarithmically on a long chain") {
    // a 60-node chain would need 60 rounds of plain propagation; pointer
    // jumping must finish well inside maxIters=25
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(chain).collect()
    assert(out.length == 60 && out.forall(_.getLong(1) == 1L))
  }

  test("duplicateClusters on empty pairs returns empty") {
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.duplicateClusters(none).isEmpty)
  }

  test("LSH banding math: S-curve is monotone and tuning picks the closest threshold") {
    // threshold of the default 4x4 banding
    assert(math.abs(Dedup.lshThreshold(4, 4) - math.pow(0.25, 0.25)) < 1e-12)
    // candidate probability increases with similarity
    val ps = (1 to 9).map(i => Dedup.lshCandidateProbability(i / 10.0, 4, 4))
    assert(ps.zip(ps.tail).forall { case (a, b) => a < b })
    // above-threshold pairs are likely candidates; far-below ones are not
    assert(Dedup.lshCandidateProbability(0.9, 4, 4) > 0.9)
    assert(Dedup.lshCandidateProbability(0.2, 4, 4) < 0.01)
    // tuning picks the divisor split nearest the target
    val (b, r) = Dedup.tuneBands(16, 0.7)
    assert(b * r == 16)
    assert((b, r) == ((4, 4)), s"threshold(4,4)=0.707 is nearest 0.7, got ($b,$r)")
  }

  test("embedding LSH default is AutoPlanes: a default call site tunes, never hardcodes") {
    val dim = 6
    val vecs = (0L until 300L).map { i =>
      (i, Array.tabulate(dim)(d => math.sin(i * 0.37 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val tuned = Dedup.tunePlanes(300L, maxBucketSize = 20)
    val auto = Dedup.embeddingNearDuplicates(
        vecs, "vec_id", "embedding", minCosine = 0.9, maxBucketSize = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val explicit = Dedup.embeddingNearDuplicates(
        vecs, "vec_id", "embedding", minCosine = 0.9,
        nPlanes = tuned, maxBucketSize = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == explicit,
      "the default plane count must be the TUNED count for this corpus")
    val bad = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDuplicates(
        vecs, "vec_id", "embedding", minCosine = 0.9, nPlanes = 0)
    }
    assert(bad.getMessage.contains("AutoPlanes"))
  }

  test("tunePlanes grows the plane count with the corpus (never a vacuous cap-out)") {
    // the round-13 bug shape: 4 fixed planes were fine at 500 vectors and
    // empty at 20,000 — tuned, both fixture scales get populated buckets
    assert(Dedup.tunePlanes(500, 200) == 3, "sf0.01 fixture: 2+1 planes")
    assert(Dedup.tunePlanes(2000, 200) == 5, "sf0.1 fixture")
    assert(Dedup.tunePlanes(20000, 200) == 8,
      "sf1 fixture: matches the probed-populated 8-plane graph")
    // monotone in corpus size, floor at minPlanes+1, integer-exact at the
    // power-of-two boundary (no float log2 rounding on either engine)
    assert(Dedup.tunePlanes(0, 200) == 3 && Dedup.tunePlanes(1, 200) == 3)
    assert(Dedup.tunePlanes(200L << 5, 200) == 6, "exact boundary: cap*2^5 = n")
    assert(Dedup.tunePlanes((200L << 5) + 1, 200) == 7, "one past the boundary")
  }

  test("editDistanceOneDuplicates: exact ed<=1 pairs, verified candidates only") {
    val df = Seq(
      (1L, "abc"),  // sub of 2 (abd), del of 3 (ab), dup of 5
      (2L, "abd"),
      (3L, "ab"),   // insertion neighbor of abc AND abd
      (4L, "xyz"),  // no neighbors
      (5L, "abc"),  // exact duplicate of 1
      (6L, "ba")    // ed("ab","ba") = 2 but neighborhoods intersect -> must be filtered
    ).toDF("id", "s")
    val out = Dedup.editDistanceOneDuplicates(df, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, 2L, 1L), (1L, 3L, 1L), (1L, 5L, 0L),
      (2L, 3L, 1L), (2L, 5L, 1L), (3L, 5L, 1L)),
      s"expected the exact ed<=1 pair set, got $out")
    // the "ba" case is the FastSS false-candidate the verification kills:
    // {ab,a,b} and {ba,b,a} intersect but the true distance is 2
    assert(!out.exists(p => p._1 == 3L && p._2 == 6L),
      "shared deletion variants at distance 2 must not survive verification")
  }

  test("editDistanceOneDuplicates: non-integral id type rejected at plan time") {
    val df = Seq(("k1", "abc"), ("k2", "abd")).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      Dedup.editDistanceOneDuplicates(df, "id", "s")
    }
    assert(e.getMessage.contains("integral"),
      s"expected the integral-id contract message, got: ${e.getMessage}")
  }

  test("editDistanceOneDuplicates: null id raises loudly, not silent pair loss") {
    val df = Seq((Some(1L), "abc"), (None: Option[Long], "abd"))
      .toDF("id", "s")
    val e = intercept[Exception] {
      Dedup.editDistanceOneDuplicates(df, "id", "s").collect()
    }
    assert(e.getMessage.contains("null id") ||
      Option(e.getCause).exists(_.getMessage.contains("null id")),
      s"expected the null-id raise, got: ${e.getMessage}")
  }

  test("sharedSpans: maximal cross-doc spans, same-diagonal runs split, sub-threshold and same-doc excluded") {
    val df = Seq(
      (1L, "a b c d e f g h i j mid1 p q r s t u v w x y"),
      (2L, "pre2 a b c d e f g h i j mid2 p q r s t u v w x y"),
      // 7 shared tokens — below the L=8 threshold, no anchor exists
      (3L, "s1 s2 s3 s4 s5 s6 s7 tail3"),
      (4L, "s1 s2 s3 s4 s5 s6 s7 tail4"),
      // an 8-token run repeated WITHIN one doc — same-doc pairs are excluded
      (5L, "r1 r2 r3 r4 r5 r6 r7 r8 gap r1 r2 r3 r4 r5 r6 r7 r8")
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpans(df, "doc_id", "text", minSpanTokens = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // docs 1/2 share two 10-token spans on the SAME diagonal (−1) with a
    // one-token gap — the island split must emit them separately, maximal
    assert(out == Set((1L, 1L, 2L, 2L, 10L), (1L, 12L, 2L, 13L, 10L)),
      s"expected the two maximal 10-token spans, got $out")
  }

  test("sharedSpanCoverage: overlapping spans from different partners merge exactly") {
    val a = (1 to 14).map(i => s"a$i").mkString(" ") // 14 tokens
    val df = Seq(
      (1L, a),
      // shares A's tokens 1..10 -> A interval [1,11)
      (2L, (1 to 10).map(i => s"a$i").mkString(" ") + " bx"),
      // shares A's tokens 5..14 -> A interval [5,15); B∩C is 6 tokens < 8
      (3L, "c0 " + (5 to 14).map(i => s"a$i").mkString(" ")),
      (4L, "nothing shared here at all beyond seven")
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpanCoverage(df, "doc_id", "text", minSpanTokens = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // A: [1,11) ∪ [5,15) = [1,15) -> 14 of 14 covered (the union merges,
    // never double-counts the 6-token overlap)
    assert(out(1L) == ((14L, 14L, 1.0)), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((11L, 10L, 10.0 / 11.0)), s"doc 2: ${out(2L)}")
    assert(out(3L) == ((11L, 10L, 10.0 / 11.0)), s"doc 3: ${out(3L)}")
    assert(out(4L) == ((7L, 0L, 0.0)), s"uncovered doc keeps its row: ${out(4L)}")
  }

  test("sharedSpans equals brute-force maximal common-substring enumeration (fuzz, 3 corpora)") {
    // small alphabet forces rich shared-span structure: repeats, overlaps,
    // multiple diagonals per pair; the cap is set high so nothing drops
    val rnd = new scala.util.Random(4242)
    val alphabet = Array("t0", "t1", "t2", "t3", "t4")
    for (round <- 1 to 3) {
      val corpus = (1L to 10L).map { id =>
        val len = 15 + rnd.nextInt(26)
        id -> Array.fill(len)(alphabet(rnd.nextInt(alphabet.length)))
      }
      val l = 4
      // brute force: per ordered pair and diagonal, maximal equal runs >= l
      val expected = (for {
        Seq((ida, ta), (idb, tb)) <- corpus.combinations(2)
        d <- -(tb.length - 1) to (ta.length - 1) // diag = posA - posB (0-based)
      } yield {
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
        var run = 0
        var i = math.max(0, d) // 0-based pos in a
        var lastStart = -1
        while (i <= ta.length) {
          val j = i - d
          val matches = i < ta.length && j >= 0 && j < tb.length && ta(i) == tb(j)
          if (matches) { if (run == 0) lastStart = i; run += 1 }
          else {
            if (run >= l)
              spans += ((ida, lastStart + 1L, idb, lastStart - d + 1L, run.toLong))
            run = 0
          }
          i += 1
        }
        spans.toList
      }).flatten.toSet
      val got = Dedup.sharedSpans(
          corpus.toDF("doc_id", "toks")
            .select(col("doc_id"), concat_ws(" ", col("toks")).as("text")),
          "doc_id", "text", minSpanTokens = l, maxBucketSize = 100000)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got == expected,
        s"round $round: missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)} " +
          s"(expected ${expected.size}, got ${got.size})")
      assert(expected.nonEmpty, s"round $round: vacuous fixture — regenerate")
    }
  }

  test("removeSharedSpans: id_b side stripped, canonical copy intact, full coverage leaves empty text") {
    val df = Seq(
      (1L, "a b c d e f g h i j mid1 p q r s t u v w x y"),
      (2L, "pre2 a b c d e f g h i j mid2 p q r s t u v w x y"),
      (6L, "z1 z2 z3 z4 z5 z6 z7 z8"),
      (7L, "z1 z2 z3 z4 z5 z6 z7 z8") // exact copy: fully covered
    ).toDF("doc_id", "text")
    val out = Dedup.removeSharedSpans(df, "doc_id", "text", minSpanTokens = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((21L, 0L, "a b c d e f g h i j mid1 p q r s t u v w x y")),
      s"canonical doc 1 untouched: ${out(1L)}")
    assert(out(2L) == ((22L, 20L, "pre2 mid2")),
      s"doc 2 keeps only its unique tokens: ${out(2L)}")
    assert(out(6L) == ((8L, 0L, "z1 z2 z3 z4 z5 z6 z7 z8")),
      s"canonical copy 6 intact: ${out(6L)}")
    assert(out(7L) == ((8L, 8L, "")),
      s"fully-duplicated doc keeps its row with empty text: ${out(7L)}")
  }

  test("sharedSpansIncremental: delta probes corpus only — no delta-delta or corpus-corpus pairs") {
    val corpus = Seq(
      (1L, (1 to 12).map(i => s"a$i").mkString(" ")),
      (2L, "unrelated corpus tokens here only seven total now")
    ).toDF("doc_id", "text")
    // both deltas share a1..a9 with corpus doc 1 AND (10 tokens) with each
    // other — the delta-delta span must NOT appear
    val delta = Seq(
      (10L, "x " + (1 to 9).map(i => s"a$i").mkString(" ")),
      (20L, "x " + (1 to 9).map(i => s"a$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.sharedSpansIncremental(corpus, delta, "doc_id", "text",
        minSpanTokens = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out == Set((10L, 2L, 1L, 1L, 9L), (20L, 2L, 1L, 1L, 9L)),
      s"expected only the delta→corpus spans, got $out")
  }

  test("sharedSpans: over-cap boilerplate grams are dropped before pair emission") {
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val df = Seq(
      (1L, s"u1 $boiler"), (2L, s"u2 $boiler"), (3L, s"u3 $boiler")
    ).toDF("doc_id", "text")
    val capped = Dedup.sharedSpans(df, "doc_id", "text",
      minSpanTokens = 8, maxBucketSize = 2).count()
    assert(capped == 0L, "a gram in 3 docs exceeds cap 2 and must be dropped")
    val full = Dedup.sharedSpans(df, "doc_id", "text", minSpanTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    assert(full == Set((1L, 2L, 8L), (1L, 3L, 8L), (2L, 3L, 8L)),
      s"all three pairs share the 8-token run under the default cap: $full")
  }

  test("exactIncrement drops delta docs whose content exists in the corpus") {
    val corpus = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "THE  quick brown fox"), // normalizes to corpus content -> dropped
      (11L, "something new entirely")
    ).toDF("doc_id", "text")
    val kept = Dedup.exactIncrement(corpus, delta, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L))
  }

  test("minhashIncrementalDuplicates pairs delta docs with corpus near-dups only") {
    val corpus = docs.where($"doc_id" =!= 2L)
    val delta = docs.where($"doc_id" === 2L) // near-dup of corpus doc 1
    val pairs = Dedup
      .minhashIncrementalDuplicates(corpus, delta, "doc_id", "text",
        numHashes = 16, numBands = 8, shingleN = 1, minJaccard = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty && pairs.forall(_._1 == 2L),
      s"only delta ids on the left: ${pairs.toSeq}")
    assert(pairs.map(_._2).toSet.subsetOf(Set(1L, 3L)),
      s"doc 2 should pair with its near-dups 1/3, got ${pairs.toSeq}")
  }

  test("dedupSavings reports per-size cluster counts and dropped tokens") {
    // cluster {1,2,3} (canonical 1): drops docs 2 and 3, each 9 tokens
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup
      .dedupSavings(docs, "doc_id", "text", Dedup.duplicateClusters(pairs))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 3L, "one cluster of size 3")
    assert(r.getLong(1) == 1L, "n_clusters")
    assert(r.getLong(2) == 2L, "two non-canonical docs dropped")
    assert(r.getLong(3) == 18L, s"9 + 9 tokens dropped, got ${r.getLong(3)}")
  }

  test("dedupCorpus keeps canonical member per component plus singletons") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupCorpus(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L)) // 2,3 fold into 1; 4,5 untouched
  }

  test("winnowing: exact duplicate scores containment 1.0; insertion survives; disjoint doesn't pair") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val inserted = ((1 to 15).map(i => s"tok$i") ++ Seq("INSERTED") ++
      (16 to 30).map(i => s"tok$i")).mkString(" ")
    val d = Seq(
      (1L, base),
      (2L, base), // exact duplicate
      (3L, inserted), // one-token insertion: winnowing is position-robust
      (4L, (1 to 30).map(i => s"other$i").mkString(" ")) // disjoint
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowingNearDuplicates(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs.get((1L, 2L)).contains(1.0), s"exact dup must score 1.0: $pairs")
    assert(pairs.get((1L, 3L)).exists(_ >= 0.5),
      s"a mid-document insertion must keep most fingerprints shared: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      s"disjoint doc must not pair: $pairs")
  }

  test("winnowing guarantee: a shared run of w+k-1 tokens yields a common fingerprint") {
    // k=3, w=4: any shared 6-token run must contribute >= 1 shared fingerprint
    val shared = (1 to 6).map(i => s"common$i").mkString(" ")
    val d = Seq(
      (1L, s"${(1 to 12).map(i => s"left$i").mkString(" ")} $shared"),
      (2L, s"$shared ${(1 to 12).map(i => s"right$i").mkString(" ")}")
    ).toDF("doc_id", "text")
    val pairs = Dedup
      .winnowingNearDuplicates(d, "doc_id", "text", minOverlap = 0.0)
      .collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) >= 1L),
      s"shared 6-token run must produce a shared fingerprint: ${pairs.toSeq}")
  }

  test("winnowingIncrementalDuplicates pairs delta docs with corpus near-dups only") {
    val corpus = docs.where(col("doc_id") =!= 2L)
    val delta = docs.where(col("doc_id") === 2L)
    val pairs = Dedup
      .winnowingIncrementalDuplicates(corpus, delta, "doc_id", "text", minOverlap = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty && pairs.forall(_._1 == 2L), s"only delta ids on the left: ${pairs.toSeq}")
    assert(pairs.map(_._2).toSet.subsetOf(Set(1L, 3L)),
      s"doc 2 shares fingerprint runs only with its near-dups 1/3: ${pairs.toSeq}")
    assert(pairs.forall(_._3 >= 1L))
  }

  test("winnowingIncrementalDuplicates: corpus-boilerplate buckets are capped, delta finds nothing") {
    val body = (1 to 20).map(i => s"w$i").mkString(" ")
    val corpus = (1L to 200L).map(i => (i, body)).toDF("doc_id", "text")
    val delta = Seq((1000L, body)).toDF("doc_id", "text")
    val out = Dedup.winnowingIncrementalDuplicates(
      corpus, delta, "doc_id", "text", minOverlap = 0.0, maxBucketSize = 50)
    assert(out.count() == 0L,
      "a fingerprint shared by 200 corpus docs must be dropped by the cap, not probed")
  }

  test("winnowing: short docs fingerprint too, and the bucket cap holds under all-identical skew") {
    // 4 tokens => 2 trigram hashes < w=4: the single-min branch still yields a fingerprint
    val short = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val sp = Dedup.winnowingNearDuplicates(short, "doc_id", "text").collect()
    assert(sp.length == 1 && sp.head.getDouble(3) == 1.0,
      s"short exact dups must pair via the single-min fingerprint: ${sp.toSeq}")

    // 200 identical docs with cap 50: every fingerprint bucket overflows -> no pairs
    val body = (1 to 20).map(i => s"w$i").mkString(" ")
    val skewed = (1L to 200L).map(i => (i, body)).toDF("doc_id", "text")
    val capped = Dedup
      .winnowingNearDuplicates(skewed, "doc_id", "text", maxBucketSize = 50)
    assert(capped.count() == 0L, "overflowing buckets must be dropped, not enumerated")
    // and the plan caps ids-first: no window over the fingerprint key
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), s"cap must be groupBy-shaped, not a window:\n$plan")
  }

  test("minhash LSH: 10k-docs-one-bucket skew completes, mega-bucket capped, real pairs kept") {
    // 10k identical docs collapse every band into one 10k-id bucket. The
    // count-first cap drops it from an ids-only aggregate before any
    // collect_list buffer forms (the 100 TB skew-OOM shape); two
    // normalization-equal docs ride along and must still pair.
    val boiler = (1L to 10000L).map(i => (i, "shared boilerplate legal header text"))
    val pairDocs = Seq(
      (20001L, "the quick brown fox jumps over the lazy dog"),
      (20002L, "THE  quick brown fox jumps over the lazy dog")) // normalize-equal
    val d = (boiler ++ pairDocs).toDF("doc_id", "text")
    val pairs = Dedup
      .minhashNearDuplicates(d, "doc_id", "text",
        numHashes = 16, numBands = 8, shingleN = 1, minJaccard = 0.5, maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((20001L, 20002L)),
      s"exactly the riding near-dup pair survives the cap: $pairs")

    // incremental twin: the capped corpus bucket must not be probed, the
    // real corpus near-dup must be found
    val corpus = d
    val delta = Seq(
      (30001L, "shared boilerplate legal header text"), // hits only the capped bucket
      (30002L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val inc = Dedup
      .minhashIncrementalDuplicates(corpus, delta, "doc_id", "text",
        numHashes = 16, numBands = 8, shingleN = 1, minJaccard = 0.5, maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc.forall(_._1 == 30002L),
      s"the boilerplate delta doc must find nothing through the capped bucket: $inc")
    assert(inc.contains((30002L, 20001L)) && inc.contains((30002L, 20002L)),
      s"the real delta near-dup must pair with both corpus twins: $inc")
  }

  test("mergeClusters re-roots merged clusters, adds new docs, leaves untouched clusters alone") {
    val labels = Seq((1L, 1L), (2L, 1L), (4L, 4L), (5L, 4L), (9L, 9L), (10L, 9L))
      .toDF("doc_id", "cluster_id")
    // (3,5): new doc 3 joins {4,5} and becomes its minimum;
    // (2,4): merges {1,2} with {4,5}; (11,12): a brand-new cluster
    val newPairs = Seq((3L, 5L), (2L, 4L), (11L, 12L)).toDF("id_a", "id_b")
    val out = Dedup.mergeClusters(labels, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      9L -> 9L, 10L -> 9L, 11L -> 11L, 12L -> 11L))
  }

  test("mergeClusters equals a full recompute over the union pair set") {
    // arbitrary overlapping structure: chains in P1, long-range merges in P2
    // (including endpoints P1 never saw — new docs and old singletons)
    val p1 = (0L until 100L by 7L).map(i => (i, i + 1L)) ++
      (0L until 100L by 11L).map(i => (i, i + 2L))
    val p2 = (0L until 100L by 13L).map(i => (i, i + 50L)) ++
      Seq((200L, 201L), (201L, 202L), (3L, 203L))
    val P1 = p1.toDF("id_a", "id_b")
    val P2 = p2.toDF("id_a", "id_b")
    val incremental = Dedup.mergeClusters(Dedup.duplicateClusters(P1), P2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val full = Dedup.duplicateClusters(P1.unionByName(P2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(incremental == full,
      s"merge/full divergence: only-incremental=${incremental -- full}, only-full=${full -- incremental}")
  }

  test("canonicalByQuality elects the highest-quality member per cluster, ties by lowest id") {
    // doc 3's longer, punctuation-light text outscores 1 and 2; docs 5/6 tie
    // on identical text so the lowest id wins
    val docs = Seq(
      (1L, "short. text."),
      (2L, "short, text,"),
      (3L, Seq.tabulate(100)(i => s"word$i").mkString(" ")), // >500 chars, no stopwords, no punct -> score 1.0
      (5L, "identical twin body"),
      (6L, "identical twin body"),
      (9L, "unclustered loner")).toDF("doc_id", "text")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val out = Dedup.canonicalByQuality(docs, "doc_id", "text", labels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 5L -> 5L))
  }

  test("canonicalByQuality is invariant to input partitioning") {
    val docs = (0 until 200)
      .map(i => (i.toLong, Seq.fill(1 + i % 9)(s"w${i % 13}").mkString(" ")))
    val labels = (0 until 200).map(i => (i.toLong, (i % 40).toLong))
    def run(parts: Int) = Dedup.canonicalByQuality(
      docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text",
      labels.toDF("doc_id", "cluster_id").repartition(parts))
      .collect().map(_.toSeq).toSet
    assert(run(1) == run(7))
  }

  test("corpus minhash sketch: mergeable, partition-invariant, and the estimator finds shared vocabularies") {
    val corpora = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "s1"),
      (2L, "pack my box with five dozen liquor jugs", "s1"),
      (3L, "the quick brown fox jumps over the lazy dog", "s2"), // s2 = copy of s1's vocab
      (4L, "pack my box with five dozen liquor jugs", "s2"),
      (5L, "voltas herkimer quixotic zygote numinous ossify", "s3") // disjoint vocab
    ).toDF("doc_id", "text", "source")

    def sketchOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
      Dedup.corpusMinhashSketch(df, "source", "text", numHashes = 16, shingleN = 1)
        .collect().map(r => r.getAs[String]("corpus") -> r.getSeq[Long](1)).toMap

    val sk = sketchOf(corpora)
    assert(sk.values.forall(_.length == 16))
    // identical member documents => identical corpus sketches
    assert(sk("s1") == sk("s2"))
    // partition-invariant (min commutes with union)
    assert(sketchOf(corpora.repartition(7)) == sk)
    // MERGE property: the sketch of s1 (union) s3 as ONE corpus is the
    // element-wise min of the two corpus sketches
    val merged = sketchOf(
      corpora.where($"source" =!= "s2").withColumn("source", lit("all")))("all")
    assert(merged == sk("s1").zip(sk("s3")).map { case (a, b) => math.min(a, b) })

    val sim = Dedup.corpusSketchSimilarity(corpora, "source", "text",
      numHashes = 16, shingleN = 1)
      .collect()
      .map(r => (r.getAs[String]("corpus_a"), r.getAs[String]("corpus_b")) ->
        (r.getAs[Long]("matching_components"), r.getAs[Double]("jaccard_est"))).toMap
    // identical vocabularies: all 16 components agree, estimate 1.0
    assert(sim(("s1", "s2")) == ((16L, 1.0)))
    // disjoint vocabularies never collide on a component: s3 pairs with nobody
    assert(!sim.keySet.exists { case (a, b) => a == "s3" || b == "s3" })
  }

  test("fuzzyNearDuplicates: edit gate, first-token blocking, block cap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark streaming guide for beginners"),
      (2L, "spark streaming guide for beginers"),    // 1 deletion from doc 1
      (3L, "spark batch processing overview text"),  // same block, far away
      (4L, "flink streaming guide for beginners"),   // different first token: never compared
      // same block, mutually > 6 edits apart; oversized at cap 2
      (5L, "zzz aaaaaaaaaaaa bbbbbbbbbbbb"),
      (6L, "zzz cccccccccccc dddddddddddd"),
      (7L, "zzz eeeeeeeeeeee ffffffffffff")
    ).toDF("doc_id", "text")
    val out = Dedup.fuzzyNearDuplicates(docs, "doc_id", "text",
      keyTokens = 8, maxDist = 6, maxBlockSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet == Set((1L, 2L)), s"only the typo pair survives the gate: $out")
    assert(out((1L, 2L)) == 1L, "distance is the exact edit count")
    // boundary: a pair AT the threshold passes, one past it fails
    val d3 = Seq((1L, "a b"), (2L, "a xyz")).toDF("doc_id", "text")
    assert(Dedup.fuzzyNearDuplicates(d3, "doc_id", "text", maxDist = 3).count() == 1)
    assert(Dedup.fuzzyNearDuplicates(d3, "doc_id", "text", maxDist = 2).count() == 0)
    // cap: the zzz block (3 docs) is dropped WHOLE at maxBlockSize = 2
    val capped = Dedup.fuzzyNearDuplicates(docs, "doc_id", "text",
      keyTokens = 8, maxDist = 100, maxBlockSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists { case (a, b) => a >= 5L || b >= 5L },
      s"stopword-grade blocks carry no signal and are dropped whole: $capped")
  }
}
