package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge: greedy left-to-right, non-overlapping, boundary-safe") {
    val df = Seq(
      Seq("a", "a", "a"),           // overlap: only the FIRST pair merges
      Seq("b", "a", "a", "b"),      // interior pair
      Seq("a", "b"),                // no (a,a) at all
      Seq("a"),                     // single symbol: untouched
      Seq("aa", "a")                // an existing "aa" symbol is NOT re-split
    ).toDF("syms")
    val out = df.select(Tokenizer.applyMerge(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out.toList == List(
      List("aa", "a"),
      List("b", "aa", "b"),
      List("a", "b"),
      List("a"),
      List("aa", "a")))
  }

  test("bpeMerges: hand-computed merge table on a planted corpus") {
    // banana ×3 + bandana ×1: step 1 = (a,n) count 8; step 2 ties at 4
    // between (an,a) and (b,an) and must break to (an,a) by lhs order;
    // step 3 = (b,an) count 4 — a pair that only exists because of step 1,
    // and whose count certifies BOTH previous applies.
    val docs = Seq("banana banana", "banana bandana").toDF("text")
    val merges = Tokenizer.bpeMerges(docs, "text", numMerges = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toList == List(
      (1L, "a", "n", 8L),
      (2L, "an", "a", 4L),
      (3L, "b", "an", 4L)))
  }

  test("bpeMerges: lineage checkpointing every N steps leaves the model unchanged") {
    // checkpointEvery=2 forces two plan truncations inside an 8-step run;
    // the merge table (the model) must be identical to the default path
    val docs = Seq("banana banana", "banana bandana", "cabana band").toDF("text")
    val expected = Tokenizer.bpeMerges(docs, "text", numMerges = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val snapped = Tokenizer.bpeMerges(docs, "text", numMerges = 8, checkpointEvery = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(snapped.toList == expected.toList)
  }

  test("bpeMerges: stops early when no pair remains") {
    val docs = Seq("ab ab").toDF("text")
    val merges = Tokenizer.bpeMerges(docs, "text", numMerges = 5).collect()
    // (a,b) is the only pair; after merging it every word is one symbol
    assert(merges.length == 1)
    assert(merges(0).getString(1) == "a" && merges(0).getString(2) == "b")
  }

  test("bpeEncode: replays the trained merges per word, order-preserving") {
    val docs = Seq((1L, "banana bandana")).toDF("doc_id", "text")
    val merges = Seq(("a", "n"), ("an", "a"), ("b", "an"))
    val enc = Tokenizer.bpeEncode(docs, "doc_id", "text", merges).collect()
    assert(enc.length == 1)
    assert(enc(0).getSeq[String](1).toList ==
      List("ban", "ana", "ban", "d", "ana"))
    assert(enc(0).getLong(2) == 5L)
    // segmentation is lossless: concatenation restores the word stream
    assert(enc(0).getSeq[String](1).mkString == "bananabandana")
  }

  test("bpeCompressionReport: integer accounting consistent with bpeEncode") {
    val docs = Seq(
      ("s1", "banana banana"),
      ("s2", "banana bandana")).toDF("source", "text")
    val merges = Seq(("a", "n"), ("an", "a"), ("b", "an"))
    val rep = Tokenizer.bpeCompressionReport(docs, "text", "source", merges)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // s1: 2×banana = 2 words, 12 chars, 2×(ban,ana) = 4 tokens
    // s2: banana+bandana = 2 words, 13 chars, 2 + 3 (ban,d,ana) = 5 tokens
    assert(rep.toList == List(("s1", 2L, 12L, 4L), ("s2", 2L, 13L, 5L)))
    // corpus-wide totals must equal summing bpeEncode's per-doc counts
    val encTotal = Tokenizer.bpeEncode(
        docs.withColumn("id", monotonically_increasing_id()), "id", "text", merges)
      .agg(sum("bpe_token_count")).collect()(0).getLong(0)
    assert(encTotal == rep.map(_._4).sum)
  }

  test("bpeMerges on the corpus: a later merge consumes a merged symbol") {
    // probed in DuckDB at sf0.001: step 8 is ('p','ar'), whose rhs exists
    // only because step 7 merged ('a','r')
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val merges = Tokenizer.bpeMerges(docs, "text", numMerges = 8)
      .collect().map(r => (r.getString(1), r.getString(2)))
    val firstMerged = merges(0)._1 + merges(0)._2
    // monotone counts are NOT guaranteed, but symbol closure is: every lhs/
    // rhs is either a single char or the concatenation of earlier merges
    val grown = merges.drop(1).exists { case (l, r) =>
      l.length > 1 || r.length > 1 }
    assert(grown, s"no later merge consumed a merged symbol: ${merges.toList}")
    assert(firstMerged.length == 2)
  }
}
