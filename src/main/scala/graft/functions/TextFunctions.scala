package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines
  * (BASELINE.json north star; SURVEY §7.2.6). Everything here is a
  * composition of codegen'd built-ins — no UDFs, no driver round-trips —
  * so each function stays inside whole-stage codegen and scales linearly
  * with a parquet scan at 100 TB.
  */
object TextFunctions {

  /** Distinct whitespace-separated words. */
  def words(text: Column): Column = array_distinct(split(text, " "))

  /** Word count (whitespace tokenization). */
  def wordCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish token count: word pieces OR single non-word-non-space chars —
    * the standard pre-tokenizer split, counted without materializing tokens. */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit("\\w+|[^\\w\\s]"))

  /** Character n-gram distinct count (shingle cardinality — the building
    * block of n-gram Jaccard similarity). Compiled one-pass expression;
    * the original HOF spelling (`size(array_distinct(transform(sequence(1,
    * len-n+1), i => substring(text, i, n))))`) materialized two per-row
    * string arrays — TextExprsSpec pins value equality against it. */
  def charNgramCardinality(text: Column, n: Int = 3): Column =
    graft.expr.NgramCardinality.ngram_cardinality(text, n)

  /** Word n-gram shingles (n consecutive words joined by space); texts
    * shorter than n words fall back to the whole text as one shingle. */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val w = split(text, " ")
    when(size(w) < n, array(text)).otherwise(
      array_distinct(transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n))))))
  }

  /** Like [[wordShingles]] but STRICT: a document shorter than `n` words
    * contributes zero shingles instead of its whole text. MinHash wants the
    * whole-text fallback (every doc needs ≥1 shingle for a signature);
    * decontamination wants the opposite — a 3-word doc cannot contain a
    * 5-gram of the benchmark, and treating its text as one pseudo-shingle
    * would let unrelated short strings collide. */
  def wordShinglesStrict(text: Column, n: Int): Column = {
    val w = split(text, " ")
    when(size(w) < n, array().cast("array<string>")).otherwise(
      array_distinct(transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n))))))
  }

  /** Jaccard similarity of two pre-deduplicated arrays, via
    * |A∩B| = |A|+|B|-|A∪B| (array_union dedups in Spark and DuckDB alike;
    * int/int division yields double in both → exact parity). */
  def jaccard(a: Column, b: Column): Column = {
    val unionSize = size(array_union(a, b))
    val interSize = size(a) + size(b) - unionSize
    interSize.cast("double") / unionSize.cast("double")
  }

  /** Jaccard of two pre-SORTED pre-deduplicated arrays via the custom
    * merge-intersection expression ([[graft.expr.SortedIntersectSize]]) —
    * same exact value as [[jaccard]], but with zero per-pair allocation.
    * Sort each side ONCE (per document, before the pair join), not per pair:
    * that is the entire point. */
  def sortedJaccard(a: Column, b: Column): Column = {
    val inter = graft.expr.SortedIntersectSize.sorted_intersect_size(a, b)
    inter.cast("double") / (size(a) + size(b) - inter).cast("double")
  }

  /** Stopword-hit ratio of the word sequence, in basis points with floor
    * division (integer arithmetic → exact cross-engine parity). Low stopword
    * ratio on natural-language text is a classic quality signal. */
  def stopwordRatioBp(text: Column,
                      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")): Column = {
    val w = split(text, " ")
    val hits = size(filter(w, x => x.isInCollection(stopwords)))
    floor(hits * lit(10000) / size(w)).cast("long")
  }

  /** Word-repetition ratio in basis points (duplicated words / words,
    * floor-divided — integer arithmetic, exact cross-engine parity). High
    * repetition is the classic low-quality / boilerplate signal. */
  def repetitionBp(text: Column): Column = {
    val w = split(text, " ")
    floor((size(w) - size(array_distinct(w))) * lit(10000) / size(w)).cast("long")
  }

  /** Shannon character entropy in nats — low entropy flags repetitive or
    * degenerate text, high entropy flags binary noise. Order-stable for the
    * oracle: the p·ln(p) terms sum in ascending code point order — the
    * same sequence the original HOF spelling (a sorted-distinct fold with
    * a per-distinct-character re-scan, O(distinct·len) and two interpreted
    * lambdas per term; 9.4 s for q_repetition at sf0.1) produced, so the
    * result is bit-identical and the DuckDB oracles are unchanged.
    * Compiled one-pass [[graft.expr.CharEntropy]]; TextExprsSpec pins
    * equality against the HOF spelling on the real corpus. */
  def charEntropy(text: Column): Column =
    graft.expr.CharEntropy.char_entropy(text)

  /** Deterministic document fingerprint: md5 of the normalized text
    * (lowercase, alphanumerics only) — an exact-dedup key that survives
    * whitespace/punctuation jitter. */
  /** Redact URLs then emails (training-data PII scrubbing). URL pass runs
    * first so an address embedded in a URL redacts as part of the URL.
    * Patterns stay inside the Java∩RE2 common dialect (no lookarounds, no
    * backrefs) so a second engine's regexp_replace agrees byte-for-byte. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "https?://[^\\s]+", "<URL>"),
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")

  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", "").cast("binary"))

  /** Marker lists for [[langGuess]] — illustrative, swap per corpus. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "de"),
    "fr" -> Seq("le", "la", "et"),
    "de" -> Seq("der", "die", "und"))

  /** Language guess via marker-token counts (n-gram heuristic): highest
    * marker-hit count wins; ties resolve by fixed priority en>es>fr>de —
    * a deterministic rule both engines express as a when/CASE cascade. */
  def langGuess(text: Column): Column = {
    val w = split(text, " ")
    val score = langMarkers.toMap.view.mapValues(m =>
      size(filter(w, x => x.isInCollection(m)))).toMap
    val Seq(en, es, fr, de) = Seq("en", "es", "fr", "de").map(score)
    when(en >= es && en >= fr && en >= de, "en")
      .when(es >= fr && es >= de, "es")
      .when(fr >= de, "fr")
      .otherwise("de")
  }
}
