package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer training over a document corpus — the classic
  * byte-pair-encoding merge induction (Sennrich et al.) re-expressed as
  * distributed aggregation.
  *
  * The canonical distributed-BPE decomposition: the corpus is scanned
  * exactly ONCE to build the (word, frequency) vocabulary; every merge
  * step after that is one `groupBy` over the VOCAB-sized frame (pair
  * counting weighted by word frequency), so a 100 TB corpus costs one
  * corpus aggregation plus `numMerges` vocabulary-sized aggregations.
  * Driver state is the merge table itself — `numMerges` (lhs, rhs) rows,
  * the tokenizer model a BPE trainer exists to produce (the bounded
  * driver-state precedent of the IVF centroids and PQ codebooks).
  *
  * Pre-tokenization is the `[a-z0-9]+` word class on lowercased text (the
  * standard alphabet-restricted pre-tokenizer regex), so the symbol
  * alphabet is closed and both engines agree on character splitting
  * without Unicode segmentation concerns. No end-of-word marker is
  * appended (merges never cross word boundaries regardless, because the
  * fold runs per word).
  */
object Tokenizer {

  /** Greedy left-to-right application of ONE merge `(lhs, rhs) → lhs·rhs`
    * to a symbol array, as a single `aggregate` fold carrying
    * (emitted-prefix, pending-symbol): each incoming symbol either
    * completes a merge with the pending one, or flushes it. Matches the
    * reference BPE `merge_word` semantics — overlapping occurrences merge
    * left-to-right non-overlapping ("a a a" → "aa a").
    */
  private[graft] def applyMerge(syms: Column, lhs: String, rhs: String): Column = {
    val zero = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("pend"))
    aggregate(
      syms,
      zero,
      (acc, s) => {
        val out = acc.getField("out")
        val pend = acc.getField("pend")
        when(pend.isNull, struct(out.as("out"), s.as("pend")))
          .when(pend === lit(lhs) && s === lit(rhs),
            struct(concat(out, array(lit(lhs + rhs))).as("out"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(concat(out, array(pend)).as("out"), s.as("pend")))
      },
      acc =>
        when(acc.getField("pend").isNull, acc.getField("out"))
          .otherwise(concat(acc.getField("out"), array(acc.getField("pend")))))
  }

  /** The (word, freq, syms) vocabulary frame: corpus scanned once,
    * map-side-combined into distinct words, each split to its character
    * symbols.
    */
  private def vocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        regexp_extract_all(col("word"), lit("[a-z0-9]"), lit(0)).as("syms"))

  /** Train `numMerges` BPE merges; returns the merge table
    * `(step, lhs, rhs, pair_count)` in training order. `pair_count` is the
    * corpus-wide frequency of the chosen pair AT ITS STEP — i.e. after all
    * previous merges were applied — so each row certifies the previous
    * apply step corpus-wide, not just the argmax. Ties break by
    * (lhs, rhs) ascending; binary (codepoint) string order in both
    * engines.
    *
    * The vocabulary frame is persisted once; step `k` re-applies the
    * folds since the last checkpoint on top of it (map-only column work
    * over the vocab). Every `checkpointEvery` steps the symbol frame is
    * materialized via an eager `localCheckpoint` that TRUNCATES the plan,
    * so Catalyst analysis cost stays bounded at thousands of merges
    * instead of growing quadratically in `numMerges` — the same
    * lineage-checkpoint contract the index-refresh loops execute (a
    * cluster deployment would use a reliable `checkpoint()`/parquet
    * round-trip so the truncated lineage survives executor loss).
    */
  def bpeMerges(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      checkpointEvery: Int = 50): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val words = vocab(df, textCol)
    words.persist()
    try {
      var cur: DataFrame = words
      var lastCheckpoint: Option[DataFrame] = None
      val merges = Seq.newBuilder[(Long, String, String, Long)]
      var step = 1
      var exhausted = false
      while (step <= numMerges && !exhausted) {
        val top = cur
          .where(size(col("syms")) >= 2)
          .select(col("freq"), explode(transform(
            sequence(lit(1), size(col("syms")) - 1),
            i => struct(
              element_at(col("syms"), i).as("lhs"),
              element_at(col("syms"), i + 1).as("rhs")))).as("p"))
          .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
          .agg(sum("freq").as("pair_count"))
          .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
          .limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((step.toLong, l, r, c))
          cur = cur.select(col("freq"), applyMerge(col("syms"), l, r).as("syms"))
          if (step % checkpointEvery == 0) {
            val snapped = cur.localCheckpoint(true)
            lastCheckpoint.foreach(_.unpersist(blocking = false))
            lastCheckpoint = Some(snapped)
            cur = snapped
          }
          step += 1
        }
      }
      lastCheckpoint.foreach(_.unpersist(blocking = false))
      merges.result().toDF("step", "lhs", "rhs", "pair_count")
    } finally words.unpersist(blocking = false)
  }

  /** Apply a trained merge table to the corpus: each document's words are
    * segmented by replaying the merges in training order (the standard BPE
    * encode). Returns (idCol, bpe_tokens array, bpe_token_count) — a
    * map-only pass over the corpus; the merge table rides in the plan as
    * literals.
    */
  def bpeEncode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    // per-word segmentation: one fold per merge, composed as nested column
    // expressions — map-only, no shuffle until the per-doc reassembly
    def segment(word: Column): Column =
      merges.foldLeft(regexp_extract_all(word, lit("[a-z0-9]"), lit(0))) {
        case (c, (l, r)) => applyMerge(c, l, r)
      }
    df.select(col(idCol),
        flatten(transform(
          regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)),
          w => segment(w))).as("bpe_tokens"))
      .select(col(idCol), col("bpe_tokens"),
        size(col("bpe_tokens")).cast("long").as("bpe_token_count"))
  }

  /** Per-source compression report under a trained merge table:
    * `(source, word_count, char_count, bpe_token_count)` — the
    * tokens-per-document accounting that drives budget/packing planning
    * once a tokenizer exists. `char_count / bpe_token_count` is the
    * compression the merges bought; all-integer output, hash-exact across
    * engines.
    *
    * Scale shape: segmentation (the `numMerges` nested folds) runs over
    * the DISTINCT-word frame only; the corpus-sized word stream joins that
    * vocab dimension and aggregates with map-side combine — the folds
    * never run per occurrence. The join strategy is deliberately LEFT TO
    * AQE: the distinct-word vocabulary is unbounded (10⁸–10⁹ words at
    * 100 TB), so a forced broadcast would bypass Spark's size-based
    * fallback and OOM the driver; AQE broadcasts when the measured vocab
    * fits and falls back to a sort-merge join on `word` when it does not.
    */
  def bpeCompressionReport(
      df: DataFrame,
      textCol: String,
      sourceCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val segmented = merges.foldLeft(
      regexp_extract_all(col("word"), lit("[a-z0-9]"), lit(0))) {
      case (c, (l, r)) => applyMerge(c, l, r)
    }
    val vocabSeg = df
      .select(explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))).as("word"))
      .distinct()
      .select(col("word"),
        length(col("word")).cast("long").as("chars"),
        size(segmented).cast("long").as("seglen"))
    df.select(col(sourceCol).as("source"), explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0))).as("word"))
      .join(vocabSeg, Seq("word"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("word_count"),
        sum("chars").as("char_count"),
        sum("seglen").as("bpe_token_count"))
      .orderBy("source")
  }
}
