package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta", "s1"),
    (2L, "alpha beta epsilon zeta", "s1"),
    (3L, "one two three four five six", "s1"),
    (4L, "spam spam spam spam spam spam", "s2"),
    (5L, "unique words only here now", "s2"),
    (6L, "alpha beta gamma again", "s2")
  ).toDF("doc_id", "text", "source")

  test("contamination: rate is the fraction of eval bigrams seen in train") {
    // eval = doc 6 ("alpha beta", "beta gamma", "gamma again");
    // train = docs 1-5 contain "alpha beta" and "beta gamma", not "gamma again"
    val out = Curation
      .contamination(docs.where($"doc_id" =!= 6L), docs.where($"doc_id" === 6L),
        "doc_id", "text", shingleN = 2)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_ngrams") == 3L)
    assert(r.getAs[Long]("n_contaminated") == 2L)
    assert(math.abs(r.getAs[Double]("contamination_rate") - 2.0 / 3.0) < 1e-12)
  }

  test("repetitionMetrics flags the repetitive doc and passes diverse ones") {
    val out = Curation.repetitionMetrics(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 4: one token repeated 6 times -> ratio 1/6, top bigram 5/5
    assert(math.abs(out(4L).getAs[Double]("distinct_token_ratio") - 1.0 / 6.0) < 1e-12)
    assert(out(4L).getAs[Double]("top_bigram_frac") == 1.0)
    assert(out(4L).getAs[String]("repetition_label") == "repetitive")
    // doc 3: all distinct
    assert(out(3L).getAs[Double]("distinct_token_ratio") == 1.0)
    assert(out(3L).getAs[String]("repetition_label") == "ok")
  }

  test("stratifiedSample keeps k per stratum, deterministically") {
    val a = Curation.stratifiedSample(docs, "source", "doc_id", k = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Curation.stratifiedSample(docs, "source", "doc_id", k = 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, "hash-rank sampling must be reproducible")
    val perSource = Curation.stratifiedSample(docs, "source", "doc_id", k = 2)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource == Map("s1" -> 2L, "s2" -> 2L))
  }

  test("stratifiedSample survives a 90%-single-stratum skew with a partial top-k plan") {
    // 90% of the corpus in one stratum: the sampler must still return exactly
    // k per stratum, and the physical plan must carry a Partial
    // WindowGroupLimit — rows beyond rank k are cut on the map side BEFORE
    // the stratum shuffle, so the dominant stratum never materializes (or
    // fully sorts) on a single task. That plan shape is the 100 TB contract.
    val skewed = spark.range(0, 20000)
      .selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 10 = 0 THEN concat('minor_', (id DIV 10) % 30) ELSE 'dominant' END AS source")
    val sampled = Curation.stratifiedSample(skewed, "source", "doc_id", k = 5)
    val plan = sampled.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
    assert(plan.contains("Partial"),
      s"expected a map-side Partial WindowGroupLimit before the shuffle in:\n$plan")
    val perStratum = sampled.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum.size == 31, "30 minor strata + the dominant one")
    assert(perStratum.values.forall(_ == 5L), "exactly k rows per stratum, skew or not")
    // deterministic under skew too
    val a = sampled.select("doc_id").as[Long].collect().sorted.toSeq
    val b = Curation.stratifiedSample(skewed, "source", "doc_id", k = 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("ngramFrequency counts instances, not per-doc presence") {
    val out = Curation.ngramFrequency(docs, "text", n = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // doc 4 repeats "spam spam" five times; "alpha beta" opens docs 1, 2, 6
    assert(out("spam spam") == 5L)
    assert(out("alpha beta") == 3L)
    assert(out("beta gamma") == 2L)
    assert(out("gamma delta") == 1L)
    // every doc with t tokens contributes t-1 bigrams: 3+3+5+5+4+3
    assert(out.values.sum == 23L)
  }

  test("chunkDedupStats: cross-doc chunks flagged, within-doc repetition is not") {
    val out = Curation.chunkDedupStats(docs, "doc_id", "text", chunkSize = 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup_chunks"),
          r.getAs[Double]("dup_chunk_frac")))
      .toMap
    // docs 1 and 6 share the chunk "alpha beta gamma" -> 1 of 2 chunks dup
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(6L) == ((2L, 1L, 0.5)))
    // doc 4 is "spam spam spam" twice WITHIN itself: one distinct doc -> no dup
    assert(out(4L) == ((2L, 0L, 0.0)))
    assert(out(2L)._2 == 0L && out(3L)._2 == 0L && out(5L)._2 == 0L)
  }

  test("removeBoilerplateChunks drops cross-doc chunks, keeps within-doc repeats, rebuilds in order") {
    val out = Curation
      .removeBoilerplateChunks(docs, "doc_id", "text", chunkSize = 3, maxDocs = 1)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_chunks_kept"),
          r.getAs[Long]("n_chunks_dropped")))
      .toMap
    // "alpha beta gamma" opens docs 1 and 6 -> boilerplate at maxDocs = 1
    assert(out(1L) == (("delta", 1L, 1L)))
    assert(out(6L) == (("again", 1L, 1L)))
    // within-doc repetition is NOT boilerplate: doc 4's chunk repeats in one doc
    assert(out(4L) == (("spam spam spam spam spam spam", 2L, 0L)))
    // untouched docs survive verbatim (normalized whitespace)
    assert(out(2L) == (("alpha beta epsilon zeta", 2L, 0L)))
    assert(out(3L) == (("one two three four five six", 2L, 0L)))
    assert(out(5L) == (("unique words only here now", 2L, 0L)))
  }

  test("removeBoilerplateChunks: fully-boilerplate doc keeps its row with empty text") {
    val three = Seq(
      (1L, "ALPHA  beta GAMMA tail one"), // normalization folds into the same chunk
      (2L, "alpha beta gamma tail two"),
      (3L, "alpha beta gamma")
    ).toDF("doc_id", "text")
    val out = Curation
      .removeBoilerplateChunks(three, "doc_id", "text", chunkSize = 3, maxDocs = 2)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_chunks_kept"),
          r.getAs[Long]("n_chunks_dropped")))
      .toMap
    assert(out(1L) == (("tail one", 1L, 1L)))
    assert(out(2L) == (("tail two", 1L, 1L)))
    assert(out(3L) == (("", 0L, 1L)))
  }

  test("keywordExtract ranks by tf/df with token tie-break and caps at k") {
    val out = Curation.keywordExtract(docs, "doc_id", "text", k = 2)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getAs[Long]("keyword_rank"))
          .map(r => (r.getAs[String]("token"), r.getAs[Double]("score"))).toSeq
      }
    // doc 1: delta df=1 (score 1.0) beats gamma df=2 (0.5) beats alpha/beta df=3
    assert(out(1L) == Seq(("delta", 1.0), ("gamma", 0.5)))
    // doc 4 has a single distinct token -> fewer than k rows, tf=6/df=1
    assert(out(4L) == Seq(("spam", 6.0)))
    // doc 3: all tokens df=1, tf=1 -> ties broken alphabetically
    assert(out(3L) == Seq(("five", 1.0), ("four", 1.0)))
  }

  test("packSequences bins by running token offset within the stratum") {
    val out = Curation
      .packSequences(docs, "source", "doc_id", "text", tokenBudget = 8)
      .collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[Long]("bin_id")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens")))
      .toMap
    // s1: docs 1 (4 tok, offset 0 -> bin 0), 2 (4 tok, offset 4 -> bin 0),
    //     3 (6 tok, offset 8 -> bin 1)
    assert(out(("s1", 0L)) == ((2L, 8L)))
    assert(out(("s1", 1L)) == ((1L, 6L)))
    // s2: docs 4 (6 tok, offset 0 -> bin 0), 5 (5 tok, offset 6 -> bin 0),
    //     6 (4 tok, offset 11 -> bin 1)
    assert(out(("s2", 0L)) == ((2L, 11L)))
    assert(out(("s2", 1L)) == ((1L, 4L)))
  }

  test("redactPii masks emails, phones, and IPs and counts them") {
    val pii = Seq(
      (1L, "mail me at a.b+c@test.org or call 555-123-4567 from 192.168.0.1"),
      (2L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = Curation.redactPii(pii, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") == 1L)
    assert(out(1L).getAs[Long]("n_phones") == 1L)
    assert(out(1L).getAs[Long]("n_ips") == 1L)
    assert(out(1L).getAs[String]("redacted_text") ==
      "mail me at [EMAIL] or call [PHONE] from [IP]")
    assert(out(2L).getAs[String]("redacted_text") == "nothing sensitive here")
  }

  test("meanTokenDf scores common-vocabulary docs higher") {
    val out = Curation.meanTokenDf(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 5 is all-unique vocabulary: every token df = 1
    assert(out(5L).getAs[Double]("mean_token_df") == 1.0)
    // doc 1 "alpha beta gamma delta": dfs 3,3,2,1 -> mean 9/4
    assert(out(1L).getAs[Double]("mean_token_df") == 2.25)
  }

  test("curateCorpus survivors are gated, unique, and near-dup free") {
    val corpus = Seq(
      (1L, "a good long document about spark engines and data " * 3, "s1"),
      (2L, "A good long document about spark engines and data " * 3, "s1"), // exact dup of 1
      (3L, "a good long document about spark engines and files " * 3, "s1"), // near-dup of 1
      (4L, "spam spam spam spam spam spam spam spam spam spam spam spam", "s2"), // repetitive
      (5L, "an entirely different readable passage of reasonable length about query planning", "s2")
    ).toDF("doc_id", "text", "source")
    val out = Curation.curateCorpus(corpus, "doc_id", "text",
      numHashes = 16, numBands = 8, shingleN = 1, minJaccard = 0.5)
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(4L), "repetitive doc fails the quality gate")
    assert(kept.contains(1L), "canonical (minimum-id) survivor kept")
    assert(!kept.contains(2L), "exact duplicate collapses")
    assert(!kept.contains(3L), "near duplicate collapses into the cluster")
    assert(kept.contains(5L), "clean unique doc survives")
  }

  test("docFrequency counts documents, not occurrences") {
    val df = Curation.docFrequency(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df("alpha") == 3L) // docs 1, 2, 6
    assert(df("spam") == 1L)  // repeated within doc 4 but one document
    assert(df("beta") == 3L)
  }

  test("hashSplit partitions every row into exactly one stable split") {
    val corpus = (1L to 500L).map(i => (i, s"doc $i")).toDF("id", "text")
    val split = Curation.hashSplit(corpus, "id", trainPct = 90, valPct = 5)
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 500, "every row gets a split")
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // growing the corpus never reassigns an existing document's split
    val grown = Curation.hashSplit((1L to 1000L).map(i => (i, s"doc $i")).toDF("id", "text"), "id")
    val before = split.select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = grown.where($"id" <= 500).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(before == after, "split assignment is corpus-size independent")
    intercept[IllegalArgumentException] { Curation.hashSplit(corpus, "id", 96, 5) }
  }

  test("weightedSourceSample keeps by per-source hash share; unlisted sources drop") {
    val corpus = (1L to 300L).map(i => (i, s"doc $i", s"s${i % 3}")).toDF("id", "text", "source")
    val out = Curation.weightedSourceSample(
      corpus, "source", "id", Map("s0" -> 1000, "s1" -> 0))
    val by = out.groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by.getOrElse("s0", 0L) == 100L, "weight 1000/1000 keeps every document")
    assert(!by.contains("s1"), "weight 0 keeps nothing")
    assert(!by.contains("s2"), "an unlisted source keeps nothing")
    // half weight keeps roughly half, deterministically
    val half = Curation.weightedSourceSample(corpus, "source", "id", Map("s0" -> 500))
    val n1 = half.count(); val n2 = half.count()
    assert(n1 == n2 && n1 > 20 && n1 < 80, s"~half of 100 expected, got $n1")
    intercept[IllegalArgumentException] {
      Curation.weightedSourceSample(corpus, "source", "id", Map("s0" -> 1001))
    }
    intercept[IllegalArgumentException] {
      Curation.weightedSourceSample(corpus, "source", "id", Map("s0" -> 0), denom = 0)
    }
  }

  test("corpusDiff classifies added/removed/changed/unchanged by content hash") {
    val v1 = Seq(
      (1L, "stays the same"),
      (2L, "will change"),
      (3L, "will be removed"),
      (4L, "Whitespace   Normalized")
    ).toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "stays the same"),
      (2L, "has changed"),
      (4L, "whitespace normalized"), // normalization-equal -> unchanged
      (5L, "brand new")
    ).toDF("doc_id", "text")
    val out = Curation.corpusDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("corpusDiff classifies NULL-text rows by id presence, not hash nullness") {
    // regression: presence was once derived from hash IS NULL, so any
    // NULL-text row always classified as 'added'
    val v1 = Seq(
      (1L, Option.empty[String]),        // removed (null text)
      (2L, Option.empty[String]),        // unchanged (null -> null)
      (3L, Option.empty[String]),        // changed (null -> text)
      (4L, Some("was text"))             // changed (text -> null)
    ).toDF("doc_id", "text")
    val v2 = Seq(
      (2L, Option.empty[String]),
      (3L, Some("now text")),
      (4L, Option.empty[String]),
      (5L, Option.empty[String])         // added (null text)
    ).toDF("doc_id", "text")
    val out = Curation.corpusDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "changed", 5L -> "added"))
  }

  test("sampling keep-hash and split-hash are independent (domain separation)") {
    // regression: with a shared hash, keep-threshold w < 90 implied
    // h%100 < 90 for every kept row — i.e. 100% 'train', val/test empty
    val corpus = (1L to 2000L).map(i => (i, s"doc $i", "s0")).toDF("id", "text", "source")
    val sampled = Curation.weightedSourceSample(corpus, "source", "id", Map("s0" -> 50))
    val splits = Curation.hashSplit(sampled, "id")
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.contains("val") || splits.contains("test"),
      s"a tight keep threshold must not force every survivor into 'train', got $splits")
  }

  test("chunkDedupStats boundaries: short, exact, boundary+1, and empty docs") {
    val edge = Seq(
      (1L, "a b c"),                     // 3 tokens < chunkSize 4 -> 1 partial chunk
      (2L, "d e f g"),                   // exactly chunkSize -> 1 chunk
      (3L, "h i j k l"),                 // chunkSize+1 -> 2 chunks (1-token tail)
      (4L, ""),                          // empty text -> 1 empty chunk
      (5L, "")                           // second empty doc -> "" chunk IS cross-doc dup
    ).toDF("doc_id", "text")
    val out = Curation.chunkDedupStats(edge, "doc_id", "text", chunkSize = 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup_chunks"))).toMap
    assert(out(1L) == ((1L, 0L)))
    assert(out(2L) == ((1L, 0L)))
    assert(out(3L) == ((2L, 0L)), "a 1-token tail must form its own chunk")
    // two empty docs share the normalized empty chunk — documented behavior:
    // dedup semantics treat identical empties as duplicates, like exactDedup
    assert(out(4L) == ((1L, 1L)) && out(5L) == ((1L, 1L)))
  }

  test("keywordExtract tie-breaking is deterministic across partition counts") {
    // every token in every doc has tf=1; cross-doc tokens share df -> dense
    // score ties that ONLY the token tie-break resolves
    val tied = Seq(
      (1L, "tie1 tie2 tie3 tie4 tie5 tie6"),
      (2L, "tie1 tie2 tie3 tie4 tie5 tie6"),
      (3L, "tie4 tie5 tie6 tie7 tie8 tie9")
    ).toDF("doc_id", "text")
    def run(parts: Int) =
      Curation.keywordExtract(tied.repartition(parts), "doc_id", "text", k = 3)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("keyword_rank"),
          r.getAs[String]("token"))).toSet
    val one = run(1)
    assert(run(5) == one && run(13) == one,
      "rank assignment must not depend on physical partitioning")
    // ties at equal score resolve alphabetically
    assert(one.contains((1L, 1L, "tie1")) && one.contains((1L, 2L, "tie2")))
  }

  test("ngramFrequency emits nothing for docs shorter than n") {
    val short = Seq(
      (1L, "one two"),                   // 2 tokens, n=3 -> no grams
      (2L, "a b c"),                     // exactly n -> 1 gram
      (3L, "")                           // empty -> no grams
    ).toDF("doc_id", "text")
    val out = Curation.ngramFrequency(short, "text", n = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a b c" -> 1L),
      s"sub-n and empty docs must contribute zero grams, got $out")
  }

  test("weightedSourceSample under 95% single-source skew: exact hash counts, map-only plan") {
    val skew = (1L to 4000L).map { i =>
      (i, s"doc $i", if (i <= 3800) "big" else "small")
    }.toDF("id", "text", "source")
    val out = Curation.weightedSourceSample(
      skew, "source", "id", Map("big" -> 250, "small" -> 1000))
    // expected counts recomputed from the SAME hash definition row by row —
    // the sample must be exactly the hash-rule subset, skew or not
    val expected = skew
      .where(org.apache.spark.sql.functions.pmod(
        graft.functions.Sha60.sha60(concat(lit("mix:"), col("id").cast("string"))),
        lit(1000L)) < when(col("source") === "big", 250).otherwise(1000))
      .count()
    assert(out.count() == expected)
    assert(out.where(col("source") === "small").count() == 200,
      "weight 1000/1000 must keep every row of the minority source")
    // map-only after the broadcast weight join: no shuffle Exchange anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning") && !plan.contains("Exchange rangepartitioning"),
      s"weightedSourceSample must stay map-only under skew:\n$plan")
  }

  test("targetAffinity: target-vocab docs outscore disjoint-vocab docs; base rate bounds hold") {
    val corpus = Seq(
      (1L, "alpha beta gamma", "target"),
      (2L, "alpha beta delta", "target"),
      (3L, "alpha beta gamma", "other"),   // shares the target vocabulary
      (4L, "zeta eta theta", "other"),     // fully disjoint vocabulary
      (5L, "zeta eta alpha", "other")      // mixed
    ).toDF("doc_id", "text", "source")
    val out = Curation.targetAffinity(corpus, "doc_id", "text", col("source") === "target")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("affinity")).toMap
    assert(out.size == 5)
    assert(out.values.forall(a => a >= 0.0 && a <= 1.0))
    // doc 3 speaks pure target vocabulary, doc 4 pure non-target: strict order
    assert(out(3L) > out(5L) && out(5L) > out(4L),
      s"affinity must order target-like > mixed > disjoint, got $out")
    // every token of doc 4 occurs only in non-target docs -> affinity 0
    assert(out(4L) == 0.0)
  }

  test("corpusReport: exact counts per source, dup and quality rates") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today", "a"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today", "a"), // exact dup of 1
      (3L, "completely different content with several informative words here", "a"),
      (4L, "", "b"),
      (5L, "the of and to in is are of and the", "b") // pure stopwords -> qs < 0.5
    ).toDF("doc_id", "text", "source")
    val out = Curation.corpusReport(corpus, "doc_id", "text", "source")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_docs") == 3 && a.getAs[Long]("n_distinct_contents") == 2)
    assert(math.abs(a.getAs[Double]("dup_rate") - (1.0 - 2.0 / 3.0)) < 1e-12)
    assert(a.getAs[Long]("total_tokens") == 14 + 14 + 8)
    val b = out("b")
    assert(b.getAs[Long]("n_empty") == 1 && b.getAs[Long]("n_docs") == 2)
    // the empty doc PASSES the length/stopword/punct formula (0.4+0.2=0.6 —
    // no stopword or punct penalty applies); the all-stopword doc fails
    assert(b.getAs[Long]("n_quality_pass") == 1)
  }

  test("hashSplit is per-row stable across partitionings and covers every row once") {
    val ids = (1L to 3000L).map(i => (i, s"doc $i")).toDF("id", "text")
    def splits(parts: Int) =
      Curation.hashSplit(ids.repartition(parts), "id")
        .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val one = splits(1)
    assert(splits(7) == one, "split assignment must be a pure function of id")
    assert(one.size == 3000)
    val byLabel = one.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    // 90/5/5 within generous hash-noise bounds
    assert(byLabel("train") > 2550 && byLabel("val") > 75 && byLabel("test") > 75)
  }

  test("ngramNovelty: seen text scores 0, novel text 1, short docs 0, mixed in between") {
    val ref = Seq((100L, "the cat sat on the mat")).toDF("doc_id", "text")
    val scored = Seq(
      (1L, "the cat sat on the mat"), // every bigram in ref
      (2L, "quantum flux harmonics resonate"), // fully novel
      (3L, "word"), // no bigrams
      (4L, "the cat sat banana wizard") // 2 of 4 distinct bigrams seen
    ).toDF("doc_id", "text")
    val out = Curation.ngramNovelty(scored, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L)._3 == 0.0, s"all bigrams seen => novelty 0: $out")
    assert(out(2L)._3 == 1.0, s"no bigrams seen => novelty 1: $out")
    assert(out(3L) == ((0L, 0L, 0.0)), s"no bigrams => defined 0.0 novelty: $out")
    assert(out(4L) == ((4L, 2L, 0.5)), s"2 of 4 bigrams seen: $out")
  }

  test("tokenBudgetSample: budget gates on tokens BEFORE the doc, per source independently") {
    // token counts: 3 each; hash-rank order is deterministic but opaque, so
    // assert the invariants, not a specific order
    val d = (1L to 10L).map(i => (i, "x y z", if (i <= 5) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val out = Curation.tokenBudgetSample(d, "doc_id", "text", "source", budget = 7L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySource = out.groupBy(_._2)
    assert(bySource.keySet == Set("a", "b"))
    for ((_, rows) <- bySource) {
      // 3-token docs against budget 7: docs starting at 0, 3, 6 are kept
      assert(rows.map(_._4).sorted.sameElements(Array(3L, 6L, 9L)),
        s"cumulative totals must be 3,6,9: ${rows.toSeq}")
      assert(rows.forall(r => r._4 - r._3 < 7L), "every kept doc starts inside the budget")
    }
  }

  test("truncationImpact: kept tokens and cut docs per cap are exact") {
    val d = Seq(
      (1L, (1 to 10).map(_ => "w").mkString(" "), "s"), // 10 tokens
      (2L, (1 to 100).map(_ => "w").mkString(" "), "s") // 100 tokens
    ).toDF("doc_id", "text", "source")
    val r = Curation.truncationImpact(d, "text", "source", caps = Seq(64)).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 2L && row.getLong(2) == 110L)
    assert(row.getAs[Long]("kept_64") == 10L + 64L, s"min(10,64)+min(100,64): $row")
    assert(row.getAs[Long]("cut_docs_64") == 1L)
  }

  test("crossSourceDuplication counts distinct shared normalized contents per source pair") {
    val d = Seq(
      (1L, "same text", "a"), (2L, "same text", "b"), (3L, "same  TEXT ", "c"),
      (4L, "other", "a"), (5L, "other", "b"),
      (6L, "solo", "c")
    ).toDF("doc_id", "text", "source")
    val out = Curation.crossSourceDuplication(d, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 1L),
      s"normalization-equal contents shared across sources: $out")
  }

  test("temperatureMixture: sqrt-proportional quotas, keeps bounded by quota") {
    // 100 vs 400 docs: credits 10000 vs 20000 -> quotas 30*1/3=10, 30*2/3=20
    val d = ((1L to 100L).map(i => (i, "a")) ++ (101L to 500L).map(i => (i, "b")))
      .toDF("doc_id", "source")
    val out = Curation.temperatureMixture(d, "doc_id", "source", totalQuota = 30L)
      .collect()
    val bySrc = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySrc == Map("a" -> 10, "b" -> 20),
      s"sub-linear reweighting: 4x docs -> only 2x quota, got $bySrc")
    assert(out.forall(r => r.getLong(2) <= r.getLong(3)), "rank never exceeds quota")
  }

  test("lengthPercentiles: dyadic interpolation on known counts is exact") {
    val d = Seq(
      (1L, "a", "s"), // 1 token
      (2L, "a b", "s"),
      (3L, "a b c", "s"),
      (4L, "a b c d", "s")
    ).toDF("doc_id", "text", "source")
    val r = Curation.lengthPercentiles(d, "text", "source").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 4L && row.getLong(2) == 1L && row.getLong(7) == 4L)
    // ranks (n-1)*q over [1,2,3,4]: 0.75 -> 1.75, 1.5 -> 2.5, 2.25 -> 3.25, 2.625 -> 3.625
    assert(row.getDouble(3) == 1.75 && row.getDouble(4) == 2.5 &&
      row.getDouble(5) == 3.25 && row.getDouble(6) == 3.625,
      s"exact dyadic interpolation expected: $row")
  }

  test("bigramSurprisal: exact count algebra matches a brute-force reference") {
    val corpus = Map(
      1L -> "a b a b c",
      2L -> "a b x",
      3L -> "z", // < 2 tokens: zero grams, null mean and verdict
      4L -> "c a b a")
    val docs = corpus.toSeq.toDF("doc_id", "text")
    // brute force: add-one smoothed p(w2|w1), surprisal bits =
    // floor(log2((c_pre + V) div (c_big + 1)))
    val grams = corpus.toSeq.flatMap { case (id, t) =>
      val w = t.split(" ").toSeq; w.zip(w.drop(1)).map(g => (id, g))
    }
    val cBig = grams.groupBy(_._2).map { case (g, xs) => g -> xs.size.toLong }
    val cPre = grams.groupBy(_._2._1).map { case (w, xs) => w -> xs.size.toLong }
    val vocab = grams.map(_._2._2).distinct.size.toLong
    def bits(num: Long, den: Long): Long =
      63L - java.lang.Long.numberOfLeadingZeros(den / num)
    val expected = grams.groupBy(_._1).map { case (id, xs) =>
      id -> ((xs.size.toLong,
        xs.map { case (_, g) => bits(cBig(g) + 1, cPre(g._1) + vocab) }.sum))
    }
    val tBits = expected.values.map(_._2).sum
    val tGrams = expected.values.map(_._1).sum
    val out = Curation.bigramSurprisal(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    expected.foreach { case (id, (n, b)) =>
      val r = out(id)
      assert(r.getLong(1) == n && r.getLong(2) == b,
        s"doc $id: expected ($n grams, $b bits), got $r")
      assert(r.getDouble(3) == b.toDouble / n.toDouble)
      val v = if (b * tGrams > tBits * n) "high_surprisal" else "typical"
      assert(r.getString(4) == v, s"doc $id verdict: expected $v, got $r")
    }
    val short = out(3L)
    assert(short.getLong(1) == 0L && short.getLong(2) == 0L &&
      short.isNullAt(3) && short.isNullAt(4),
      s"a sub-2-token doc keeps its row with null stats: $short")
  }

  test("lengthPercentiles: null texts count in n_docs; all-null sources keep their row") {
    val d = Seq(
      (1L, Some("a"), "s"),        // 1 token
      (2L, Some("a b c"), "s"),    // 3 tokens
      (3L, None: Option[String], "s"),   // null text — counts in n_docs,
                                         // skipped by the percentiles
      (4L, None: Option[String], "t")    // all-null source — row survives
    ).toDF("doc_id", "text", "source")
    val r = Curation.lengthPercentiles(d, "text", "source")
      .orderBy("source").collect()
    assert(r.length == 2, s"both sources must appear: ${r.toSeq}")
    val s = r(0)
    assert(s.getString(0) == "s" && s.getLong(1) == 3L,
      s"n_docs counts ALL docs incl. null texts: $s")
    // percentiles over the two non-null counts [1, 3]: p50 = 2.0
    assert(s.getLong(2) == 1L && s.getDouble(4) == 2.0 && s.getLong(7) == 3L)
    val t = r(1)
    assert(t.getString(0) == "t" && t.getLong(1) == 1L && t.isNullAt(2) &&
      t.isNullAt(4) && t.isNullAt(7),
      s"an all-null source keeps its row with null stats: $t")
  }

  test("tokenBudgetSample: first doc always kept; two-level prefix sum equals the naive window") {
    val big = Seq((1L, (1 to 50).map(i => s"t$i").mkString(" "), "s")).toDF("doc_id", "text", "source")
    val kept = Curation.tokenBudgetSample(big, "doc_id", "text", "source", budget = 10L).collect()
    assert(kept.length == 1 && kept.head.getLong(3) == 50L,
      "a first doc larger than the budget is still kept (starts at 0)")

    // equivalence with the naive single-window cumsum on a 500-doc frame
    val d = (1L to 500L).map(i => (i, (1 to (i % 7 + 1).toInt).map(j => s"w$j").mkString(" "),
      s"s${i % 3}")).toDF("doc_id", "text", "source")
    val twoLevel = Curation.tokenBudgetSample(d, "doc_id", "text", "source", budget = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    import org.apache.spark.sql.expressions.Window
    val naiveW = Window
      .partitionBy(col("source"))
      .orderBy(graft.functions.Sha60.sha60(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = d.select(
        col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        col("source"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(naiveW))
      .where(col("cum_tokens") - col("n_tokens") < 100L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(twoLevel == naive, "bucketed prefix sum must equal the global window cumsum")
  }

  test("clusterAwareSplit: near-dup pairs never straddle the split; singletons keep the plain assignment") {
    import graft.operators.Dedup
    // 3-doc near-dup cluster + 30 distinct singletons
    val docs = (
      Seq((1L, "alpha beta gamma delta epsilon"),
          (2L, "alpha beta gamma delta epsilon"),
          (3L, "alpha beta gamma delta zeta")) ++
      (10L until 40L).map(i => (i, s"unique document number $i with its own content ${i * 7}"))
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      numHashes = 16, numBands = 4, shingleN = 1, minJaccard = 0.5)
    val labels = Dedup.duplicateClusters(pairs)
    val split = Curation.clusterAwareSplit(docs, "doc_id", labels)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split.size == 33)
    // the cluster moves together
    val clusterSides = pairs.select("id_a", "id_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct.map(split)
    assert(clusterSides.distinct.length == 1,
      s"near-dup cluster must land on ONE side, got ${clusterSides.toSeq}")
    // singletons = plain hashSplit
    val plain = Curation.hashSplit(docs, "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (10L until 40L).foreach(i => assert(split(i) == plain(i),
      s"unclustered doc $i must keep its hashSplit assignment"))
  }

  test("slidingWindows: overlap, short-doc, and exact-boundary window arithmetic") {
    val docs = Seq(
      (1L, (1 to 7).map(i => s"t$i").mkString(" ")), // 7 toks, w=4 s=2 → 3 windows
      (2L, "a b"),                                   // ≤ window → 1 window
      (3L, (1 to 4).map(i => s"x$i").mkString(" ")), // exactly window → 1 window
      (4L, (1 to 6).map(i => s"y$i").mkString(" "))  // 6 toks → 2 windows, no tail dup
    ).toDF("doc_id", "text")
    val out = Curation.slidingWindows(docs, "doc_id", "text", window = 4, stride = 2)
      .orderBy(col("doc_id"), col("window_idx"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).length == 3)
    assert(byDoc(1L).map(_._4).toSeq ==
      Seq("t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7"), "stride-2 overlap + short tail")
    assert(byDoc(1L).map(_._3).toSeq == Seq(4L, 4L, 3L))
    assert(byDoc(2L).map(_._4).toSeq == Seq("a b"))
    assert(byDoc(3L).length == 1, "len == window must not spill a second window")
    assert(byDoc(4L).map(_._4).toSeq == Seq("y1 y2 y3 y4", "y3 y4 y5 y6"))
    // every token of every doc appears in at least one window
    assert(out.forall(_._3 > 0L))
  }

  test("slidingWindows plans no shuffle (map-only chunker)") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = Curation.slidingWindows(docs, "doc_id", "text", window = 3, stride = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must stay map-only:\n$plan")
  }

  test("decontaminate drops overlapping training docs, keeps short and clean ones") {
    val evalSet = Seq((100L, "secret eval question here")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "secret eval question here verbatim"), // 4/5 bigrams from eval → dropped at 0.5
      (2L, "completely unrelated training text"), // 0 overlap → kept
      (3L, "eval"), // too short for a bigram → kept (nothing to leak)
      (4L, "secret eval material mixed with lots of fresh training words")) // low overlap → kept
      .toDF("doc_id", "text")
    val kept = Curation.decontaminate(train, evalSet, "doc_id", "text",
      shingleN = 2, maxOverlap = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L))
  }

  test("decontaminate equals the per-doc overlap-rate filter (fuzz, 6 corpora)") {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val rng = new scala.util.Random(77)
    (0 until 6).foreach { _ =>
      val mk = () => Seq.fill(2 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size))).mkString(" ")
      val evalDocs = (0 until 4).map(i => (100L + i, mk()))
      val trainDocs = (0 until 30).map(i => (i.toLong, mk()))
      def bigrams(t: String): Set[String] =
        t.trim.toLowerCase.split("\\s+").toSeq.sliding(2).filter(_.length == 2)
          .map(_.mkString(" ")).toSet
      val evVocab = evalDocs.flatMap(d => bigrams(d._2)).toSet
      val expected = trainDocs.filter { case (_, t) =>
        val b = bigrams(t)
        b.isEmpty || b.count(evVocab).toDouble / b.size < 0.5
      }.map(_._1).toSet
      val got = Curation.decontaminate(
        trainDocs.toDF("doc_id", "text"), evalDocs.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 2, maxOverlap = 0.5)
        .select("doc_id").as[Long].collect().toSet
      assert(got == expected)
    }
  }

  test("soft dedup weights: 1/cluster_size for members, 1.0 for singletons") {
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "text")
    // cluster {1,2,3} rooted at 1; doc 4, 5 unclustered
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "cluster_id")
    val out = Curation.softDedupWeights(corpus, "doc_id", labels)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out == Map(
      1L -> ((3L, 1.0 / 3.0)), 2L -> ((3L, 1.0 / 3.0)), 3L -> ((3L, 1.0 / 3.0)),
      4L -> ((1L, 1.0)), 5L -> ((1L, 1.0))))
    // the expected corpus mass is one document-equivalent per cluster
    val mass = out.values.map(_._2).sum
    assert(math.abs(mass - 3.0) < 1e-12)
  }

  test("epoch replication emits n_epochs rows per doc by quality tier, map-only") {
    val df = Curation.epochReplication(docs.toDF("doc_id", "text", "source"), "doc_id", "text")
    val perDoc = df.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val epochs = df.where(col("doc_id") === 1L).select("epoch_idx")
      .as[Long].collect().sorted.toSeq
    // every doc appears once per scheduled epoch, epochs numbered 1..n
    assert(perDoc.values.forall(n => n >= 1 && n <= 3))
    assert(epochs == (1L to perDoc(1L)).toSeq)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scheduling must stay map-only:\n$plan")
  }

  test("corpus manifest: partition-invariant digest, content-sensitive, null distinct from empty") {
    val d = Seq(
      (1L, "alpha beta", "s1"), (2L, "gamma", "s1"),
      (3L, null: String, "s2"), (4L, "", "s2"))
      .toDF("doc_id", "text", "source")
    def digest(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      Curation.corpusManifest(df, "doc_id", "text", "source")
        .select("source", "content_digest")
        .as[(String, Long)].collect().toMap
    val base = digest(d)
    // XOR commutes: the digest cannot depend on partitioning or row order
    assert(digest(d.repartition(7)) == base)
    assert(digest(d.orderBy(col("doc_id").desc)) == base)
    // one character of drift moves the source's digest and no other's
    val drifted = digest(d.withColumn("text",
      when(col("doc_id") === 2L, lit("gamma!")).otherwise(col("text"))))
    assert(drifted("s1") != base("s1") && drifted("s2") == base("s2"))
    // null text and empty text are distinct corpus states
    val nulled = digest(d.withColumn("text",
      when(col("doc_id") === 4L, lit(null: String)).otherwise(col("text"))))
    assert(nulled("s2") != base("s2"))
    // counts: null text contributes zero tokens but one doc
    val m = Curation.corpusManifest(d, "doc_id", "text", "source")
      .select("source", "n_docs", "n_tokens")
      .as[(String, Long, Long)].collect()
      .map { case (s, a, b) => s -> ((a, b)) }.toMap
    assert(m("s1") == ((2L, 3L)) && m("s2")._1 == 2L)
  }

  test("curriculum order: reproducible, seed- and epoch-independent permutations, map-only") {
    val d = docs.toDF("doc_id", "text", "source")
    def order(seed: Long) = Curation.curriculumOrder(d, "doc_id", "text", seed)
    def perm(seed: Long, epoch: Long): Seq[Long] = order(seed)
      .where(col("epoch_idx") === epoch)
      .orderBy(col("order_key"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    // same seed → bit-identical schedule regardless of execution shape
    // (keys are pure functions of (seed, epoch, id), so repartitioning
    // the input cannot move anything)
    assert(order(42L).collect().toSet ==
      Curation.curriculumOrder(d.repartition(7), "doc_id", "text", 42L)
        .collect().toSet)
    // schedule rows == the epoch-replication schedule (ordering adds no
    // rows and drops none)
    assert(order(42L).count() ==
      Curation.epochReplication(d, "doc_id", "text").count())
    // a different seed re-keys the permutation; different epochs of one
    // seed don't replay the same order (both hold unless the corpus is
    // degenerate — the fixture has >= 4 multi-epoch docs)
    val e1 = perm(42L, 1L)
    assert(e1 != perm(7L, 1L), "seed must change the order")
    val multi = perm(42L, 2L)
    assert(e1.filter(multi.contains) != multi,
      "epoch 2 must not replay epoch 1's relative order")
    // order keys are unique per epoch (ties impossible: id is in the preimage)
    val keys = order(42L).select("epoch_idx", "order_key").collect()
    assert(keys.distinct.length == keys.length)
    val plan = order(42L).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"ordering must stay map-only:\n$plan")
  }

  test("distribution drift: zero for identical snapshots, exact TVD for a shape shift, total for a vanished source") {
    val d = docs
    // identical snapshots: every source scores exactly 0, nothing drifts
    val same = Curation.distributionDrift(d, d, "source", "text").collect()
    assert(same.length == 2)
    assert(same.forall(r => r.getAs[Double]("tvd") == 0.0 && !r.getAs[Boolean]("drifted")))

    // doc 3 (6 tokens, s1) truncated to 1 token: s1 histograms go
    // {bitlen 3: 3 docs} -> {3: 2, 1: 1}; TVD = (|2*3-3*3| + |1*3-0|) / (2*3*3) = 1/3
    val shifted = d.withColumn("text",
      when($"doc_id" === 3L, lit("one")).otherwise($"text"))
    val byScore = Curation.distributionDrift(d, shifted, "source", "text")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(byScore("s1").getAs[Double]("tvd") == 6.0 / 18.0)
    assert(byScore("s1").getAs[Boolean]("drifted"))
    assert(byScore("s2").getAs[Double]("tvd") == 0.0 && !byScore("s2").getAs[Boolean]("drifted"))
    // the verdict honors the threshold: 333 permille < 500 permille
    val lax = Curation.distributionDrift(d, shifted, "source", "text", thresholdPermille = 500)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Boolean]("drifted")).toMap
    assert(!lax("s1"))

    // a source absent from the newer snapshot is total drift, not a 0/0
    val gone = Curation.distributionDrift(d, d.where($"source" === "s1"), "source", "text")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(gone("s2").getAs[Long]("n_new") == 0L)
    assert(gone("s2").getAs[Double]("tvd") == 1.0 && gone("s2").getAs[Boolean]("drifted"))
    assert(gone("s1").getAs[Double]("tvd") == 0.0)
  }
}
