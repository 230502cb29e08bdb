package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BM25 keyword retrieval over an inverted index — the lexical half of a
  * training-data / RAG retrieval stack (the embedding half is
  * [[Similarity]]). Extends the reference's analytics surface with the
  * retrieval primitives a corpus pipeline needs: build postings once,
  * probe them per query, fold a delta day in without a rebuild.
  *
  * Components:
  *   - [[invertedIndex]] — postings `(token, doc_id, tf, dl)`: ONE
  *     tokenize pass, one aggregation. The artifact a 100 TB deployment
  *     materializes (partitioned/bucketed by token so a probe's
  *     `token IN (…)` prunes to the query's row groups).
  *   - [[corpusStats]] — `(n_docs, total_tokens)`: one map-side-combined
  *     aggregation to a single row.
  *   - [[bm25Probe]] — score a query against a prebuilt index: all work
  *     after the postings filter is QUERY-sized (matched postings →
  *     per-term df → per-doc fold → TakeOrdered top-k); the corpus never
  *     re-shuffles.
  *   - [[bm25TopK]] — convenience: build + probe in one call (two corpus
  *     scans, both collapsing map-side; the probe filter is applied BEFORE
  *     the tf aggregation so the groupBy only sees matching tokens).
  *   - [[refreshInvertedIndex]] / [[refreshCorpusStats]] — the daily fold:
  *     postings are disjoint-additive across new doc ids and the stats row
  *     is element-wise additive, so refresh ≡ rebuild EXACTLY (the same
  *     algebra the MinHash/embedding index refresh loops certify); the
  *     delta is tokenized once and the base index is never re-scanned.
  *
  * Cross-engine determinism (the certification contract): BM25's usual
  * `ln((N−df+0.5)/(df+0.5))` idf is NOT bit-stable across engines (libm
  * `ln` differs in ULPs between the JVM and DuckDB — the precedent
  * [[Curation.targetAffinity]] documents), so the score uses the RATIONAL
  * idf `(N−df+0.5)/(df+0.5)` — the same monotone-in-df ordering, computed
  * with only IEEE-correctly-rounded +,−,×,÷. Per-doc summation order is
  * pinned by folding contributions in ascending-token order (sort_array →
  * sequential `aggregate` fold), mirroring the oracle's
  * `list_reduce(list(contrib ORDER BY token))`.
  */
object Retrieval {

  /** Postings list `(token, doc_id, tf, dl)` — term frequency per
    * (token, document) plus the document length `dl` (token count) carried
    * on every posting so the probe never rejoins the corpus for lengths.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("token"))
      .groupBy("token", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .select(col("token"), col("doc_id"), col("tf"), col("dl"))

  /** Corpus-level BM25 normalization state: ONE row `(n_docs,
    * total_tokens)`. Both fields are plain sums, so shard stats merge by
    * addition — the property [[refreshCorpusStats]] exploits.
    */
  def corpusStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("total_tokens"))

  /** Fold a day of NEW documents into an existing postings index. Delta
    * doc ids must be disjoint from the base's (new documents, the bronze
    * append contract) — then `(token, doc_id)` keys cannot collide and the
    * union IS the rebuilt index, row for row. The base index is touched
    * only by the union (no re-scan, no re-shuffle of old postings).
    */
  def refreshInvertedIndex(
      base: DataFrame,
      deltaDocs: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    base.unionByName(invertedIndex(deltaDocs, idCol, textCol))

  /** Fold a delta's stats row into the base's: element-wise addition via a
    * union + re-aggregate (two 1-row inputs — the cross-engine-exact twin
    * of merging counters).
    */
  def refreshCorpusStats(base: DataFrame, deltaDocs: DataFrame,
      idCol: String, textCol: String): DataFrame =
    base.unionByName(corpusStats(deltaDocs, idCol, textCol))
      .agg(sum("n_docs").as("n_docs"), sum("total_tokens").as("total_tokens"))

  /** Delete documents from a standing lexical index WITHOUT re-scanning
    * the corpus — the tombstone half of index maintenance
    * ([[refreshInvertedIndex]] is the additive half). Returns the
    * `(postings, stats)` pair after deletion.
    *
    * Everything is derived from the index itself: the postings of a
    * deleted doc are removed by an anti-join on `doc_id`, and the stats
    * decrement (docs gone, tokens gone) comes from those same postings —
    * `dl` rides on every posting row, so a deleted doc's token count is
    * recoverable without touching raw text. Ids absent from the index are
    * no-ops (already-deleted or never-indexed), which makes the fold
    * idempotent under replay.
    *
    * Deletion ≡ rebuild EXACTLY: postings keys `(token, doc_id)` are
    * per-doc, so dropping a doc's rows leaves precisely the index of the
    * surviving corpus, and both stats fields are plain sums over
    * surviving docs. Scale shape: work is index-sized on the doc_id
    * dimension only — the anti/semi joins broadcast the (small) deletion
    * set against the postings; on a token-partitioned layout the
    * surviving postings never move.
    */
  def deleteFromIndex(
      postings: DataFrame,
      stats: DataFrame,
      deletedIds: DataFrame): (DataFrame, DataFrame) = {
    val del = deletedIds.select(col(deletedIds.columns.head).as("doc_id"))
    // using-column joins surface doc_id first; restore the postings contract
    val newPostings = postings.join(del, Seq("doc_id"), "left_anti")
      .select(col("token"), col("doc_id"), col("tf"), col("dl"))
    // per-deleted-doc dl from its own postings (every row carries it),
    // then one 1-row decrement aggregate; empty deletion set → (0, 0)
    val removed = postings.join(del, Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(max("dl").as("dl"))
      .agg(count(lit(1)).as("_gone_docs"),
        coalesce(sum("dl"), lit(0L)).as("_gone_tokens"))
    val newStats = graft.core.ScalarJoin.withScalars(stats, removed)
      .select(
        (col("n_docs") - col("_gone_docs")).as("n_docs"),
        (col("total_tokens") - col("_gone_tokens")).as("total_tokens"))
    (newPostings, newStats)
  }

  /** BM25 top-`k` against a prebuilt `(token, doc_id, tf, dl)` postings
    * index and 1-row stats frame. Returns `(bm25_rank, doc_id,
    * matched_terms, score)`.
    *
    * Scale shape: the `token IN (terms)` filter is the FIRST touch of the
    * postings (pushed to the scan on a token-partitioned layout); df
    * counts, the per-doc fold, and the ranking all run over
    * query-matched postings only. The stats row attaches via the
    * constant-key scalar broadcast join ([[graft.core.ScalarJoin]] —
    * BroadcastHashJoin, not a nested loop). Top-k is `orderBy.limit` →
    * TakeOrdered, never a global sort.
    */
  def bm25Probe(
      postings: DataFrame,
      stats: DataFrame,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 query needs at least one term")
    val matched = postings.where(col("token").isin(terms.map(lit): _*))
    val dfCounts = matched.groupBy("token").agg(count(lit(1)).as("df_count"))
    val scored = graft.core.ScalarJoin.withScalars(
        matched.join(dfCounts, Seq("token")), stats)
      .withColumn("avgdl",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        ((col("n_docs") - col("df_count")).cast("double") + lit(0.5)) /
          (col("df_count").cast("double") + lit(0.5)))
      .withColumn("tf_term",
        (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
          (col("tf").cast("double") + lit(k1) *
            ((lit(1.0) - lit(b)) + lit(b) * (col("dl").cast("double") / col("avgdl")))))
      .withColumn("contrib", col("idf") * col("tf_term"))
    scored
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("matched_terms"),
        sort_array(collect_list(struct(col("token"), col("contrib")))).as("cs"))
      .withColumn("score",
        aggregate(col("cs"), lit(0.0), (acc, s) => acc + s.getField("contrib")))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))).cast("long").as("bm25_rank"),
        col("doc_id"), col("matched_terms"), col("score"))
  }

  /** Positional postings `(token, doc_id, pos)` — one row per token
    * OCCURRENCE (the [[invertedIndex]] collapses to per-doc term
    * frequencies; phrase and proximity queries need the positions back).
    * Positions are 1-based. Index size is the corpus token count — the
    * standard ~linear positional-index overhead a lexical engine accepts
    * to answer phrase queries at all.
    */
  def positionalIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("p0", "token")))
      .select(col("token"), col("doc_id"), (col("p0") + 1).cast("long").as("pos"))

  /** Exact phrase search over a positional index: one row per OCCURRENCE,
    * `(doc_id, match_pos)` = the phrase's first-token position.
    *
    * The phrase's term at offset `i` must sit at `start + i`, so each
    * term's postings are normalized to their implied start position
    * (`pos − i`) and the terms chain through plain EQUI-joins on
    * `(doc_id, start_pos)` — no window functions, no per-doc array
    * reassembly, and overlapping occurrences fall out naturally (each
    * start position is its own join key). Scale shape: every term filter
    * prunes the index first (scan-prunable on a token-partitioned
    * layout), so join inputs are term-frequency-sized, never
    * corpus-sized; a production planner would additionally chain
    * rarest-term-first to shrink the intermediate — the joins commute, so
    * that is a pure execution-order choice.
    */
  def phraseSearch(index: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase search needs at least one term")
    val anchored = phrase.zipWithIndex.map { case (term, i) =>
      index.where(col("token") === term)
        .select(col("doc_id"), (col("pos") - lit(i.toLong)).as("start_pos"))
    }
    anchored.reduce(_.join(_, Seq("doc_id", "start_pos")))
      .select(col("doc_id"), col("start_pos").as("match_pos"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard hybrid-
    * search combiner: each input ranking contributes `1/(rrfK + rank)` per
    * document and the contributions sum; rank-based fusion needs no score
    * normalization across heterogeneous retrievers (BM25 scores and
    * cosines are not commensurable — their RANKS are).
    *
    * Inputs are `(id, rank)` frames, one per retriever, in a FIXED order:
    * the per-doc sum folds contributions by retriever index
    * (sort_array over (src, contrib) structs → sequential `aggregate`),
    * so the float addition order is pinned for the cross-engine contract
    * even though fused lists are tiny. Returns `(rrf_rank, idCol,
    * sources, rrf_score)` — `sources` counts how many retrievers
    * surfaced the doc; ties break by ascending id.
    *
    * Scale shape: the inputs are already top-N lists (N rows each, not
    * corpus-sized), so fusion is an N·retrievers-row union + one tiny
    * aggregation — the expensive work happened inside the retrievers,
    * which keep their own certified scale shapes.
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String,
      k: Int,
      rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol), lit(i).as("_src"), col("rank").cast("double").as("_rank"))
    }
    tagged.reduce(_ unionByName _)
      .select(col(idCol), col("_src"),
        (lit(1.0) / (lit(rrfK.toDouble) + col("_rank"))).as("_c"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("sources"),
        sort_array(collect_list(struct(col("_src"), col("_c")))).as("_cs"))
      .withColumn("rrf_score",
        aggregate(col("_cs"), lit(0.0), (acc, s) => acc + s.getField("_c")))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(k)
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf_score").desc, col(idCol))).cast("long").as("rrf_rank"),
        col(idCol), col("sources"), col("rrf_score"))
  }

  /** Build-and-probe convenience: two corpus scans (stats + postings),
    * both collapsing map-side; the term filter lands BEFORE the tf
    * aggregation so the shuffle carries matching tokens only.
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val postings = toks
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("token"))
      .where(col("token").isin(terms.map(lit): _*))
      .groupBy("token", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
    val stats = toks
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("total_tokens"))
    bm25Probe(postings, stats, terms, k, k1, b)
  }
}
