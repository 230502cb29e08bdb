package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, fingerprinting.
  *
  * Everything here is a pure Catalyst expression over built-in functions
  * (no UDFs), so the whole surface stays codegen-friendly and distributes
  * trivially: each document is scored independently — a 100 TB corpus is an
  * embarrassingly parallel map with full column pruning (only `text` is read).
  */
object TextFunctions {

  /** Lower-cased, trimmed, whitespace-collapsed text. */
  def normalizeText(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normalizeText(c), " ")

  /** Token count: number of non-whitespace runs (robust to leading/trailing
    * and repeated whitespace — `size(split(...))` miscounts those).
    */
  def tokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\S+"), lit(0)))

  /** BPE-ish sub-word token count: alphabetic runs, digit runs, and single
    * non-space symbols each count as one token (a cheap, deterministic proxy
    * for a real tokenizer's token count).
    */
  def regexTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Number of matches of any of `words` as whole words (case-insensitive on
    * normalized text).
    */
  def wordHits(c: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(c), lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /** Count of punctuation characters. */
  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[.,;:!?'\"()\\[\\]{}-]"), lit(0)))

  /** English stopword list used by the quality heuristics. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "is", "are", "of", "and", "or", "to", "in")

  /** Heuristic document-quality score in [0,1]:
    * 0.4·length-score + 0.4·(1 − stopword-excess) + 0.2·(1 − punct-ratio).
    * All-double arithmetic in a fixed operation order (deterministic).
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val lenScore = least(nChars / lit(500.0), lit(1.0))
    val stopRatio = when(nTokens > 0.0, wordHits(text, EnglishStopwords).cast("double") / nTokens)
      .otherwise(lit(0.0))
    val punctRatio = when(nChars > 0.0, punctCount(text).cast("double") / nChars)
      .otherwise(lit(0.0))
    lit(0.4) * lenScore + lit(0.4) * (lit(1.0) - stopRatio) + lit(0.2) * (lit(1.0) - punctRatio)
  }

  /** Per-language marker-word profiles for the n-gram/stopword language-ID
    * heuristic. Latin-script languages are identified by characteristic
    * function words; zh by CJK character presence (scored in [[langId]]).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "is", "of", "and", "that", "with", "for", "this"),
    "es" -> Seq("el", "los", "las", "una", "está", "por", "con", "para"),
    "fr" -> Seq("le", "les", "des", "est", "dans", "pour", "avec", "une"))

  /** Language-ID: argmax of per-language marker scores; CJK characters send
    * the document to zh; ties resolve in profile order (de,en,es,fr), and a
    * document with zero marker hits is "und" (undetermined).
    *
    * Shape matters: the argmax is `array_max` over (score, tiebreak, lang)
    * structs — struct ordering is lexicographic, so the max is the highest
    * score with ties going to the lowest profile index, and a score-0
    * sentinel yields "und". Each language regex is evaluated exactly ONCE
    * per row; the previous `greatest` + per-language `=== best` chain
    * re-evaluated every regex ~6× because Catalyst does not CSE shared
    * regex subtrees (q33 was the third-slowest bench query).
    */
  def langId(text: Column): Column = {
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val entries = LangProfiles.zipWithIndex.map { case ((lang, words), i) =>
      struct(wordHits(text, words).as("score"), lit(-i).as("tie"), lit(lang).as("lang"))
    }
    // sentinel: score 0 with a tiebreak ABOVE every real entry, so it wins
    // only when no language scored a single hit
    val sentinel = struct(lit(0).as("score"), lit(1).as("tie"), lit("und").as("lang"))
    val best = array_max(array(sentinel +: entries: _*))
    when(cjk > 0, "zh").otherwise(best.getField("lang"))
  }

  /** Evaluate `c` exactly ONCE per row and build `body` over the bound
    * value. Catalyst does not common-subexpression-eliminate repeated
    * subtrees inside higher-order-function lambdas (the same pitfall
    * [[langId]] documents for its regex scores), so an expression like
    * `element_at(split(...), i + j)` inside `transform` re-runs the whole
    * split per element per position — O(tokens·doc_len) per row. Binding
    * the value as the single element of a literal array makes every inner
    * reference a lambda-variable read (O(1)).
    */
  private[graft] def bindOnce(c: Column)(body: Column => Column): Column =
    element_at(transform(array(c), body), 1)

  /** Triangular (i < j) pair emission over a bucket array, sorted ONCE:
    * the shared LSH-bucket pair enumerator (MinHash, winnowing, shared
    * spans). [[bindOnce]]-bound because Catalyst does not CSE subtrees
    * inside HOF lambdas — an unbound `array_sort` would re-sort the
    * bucket once per anchor (O(b² log b) per bucket instead of one sort +
    * O(b²) struct emission). `mk(a, b)` builds each emitted pair struct;
    * `a` precedes `b` in the array's sort order.
    */
  private[graft] def triangularPairs(arr: Column)(
      mk: (Column, Column) => Column): Column =
    bindOnce(array_sort(arr)) { sorted =>
      flatten(
        transform(
          sorted,
          (a, i) =>
            transform(
              slice(sorted, i + lit(2), size(sorted) - i - lit(1)),
              b => mk(a, b))))
    }

  /** Word n-gram shingles of the normalized text (for MinHash / Jaccard).
    * Empty array when the document has fewer than n tokens. The token array
    * is [[bindOnce]]-bound: the tokenizing split runs once per row, not once
    * per shingle position (measured 14.3 s → sub-second for corpus-wide
    * trigram counting at sf0.1).
    */
  def shingles(text: Column, n: Int): Column =
    if (n == 1) tokens(text) // unigram shingles ARE the tokens — skip the rebuild
    else bindOnce(tokens(text)) { toks =>
      when(size(toks) < n, array().cast("array<string>")).otherwise(
        transform(
          sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
    }

  /** Polynomial rolling-hash fingerprint over the token stream, mod 2^31−1.
    * Order-dependent (unlike the bronze row hash): transposed tokens produce
    * different fingerprints. Token values are first mapped through
    * [[Sha60]] (sha256-prefix, DuckDB-replicable) and reduced mod p so
    * products never overflow Long (ANSI-safe).
    */
  def rollingFingerprint(text: Column): Column = {
    val p = lit(2147483647L)
    val toks = tokens(text)
    aggregate(
      toks,
      lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(Sha60.sha60(t), p), p))
  }
}
