package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-pipeline pack, built from codegen'd
  * built-in expressions only (no UDFs): tokenization, shingling, salted
  * min-hash signatures, stopword scoring, quality metrics.
  *
  * Everything here is a narrow per-row expression — at 100 TB these run
  * inside whole-stage codegen over the scan with zero shuffles; only the
  * downstream groupBy/join decides the exchange plan.
  */
object Text {

  /** Whitespace tokenizer (the fixture corpus is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish token-count estimator: words plus an overhead term per long
    * word (a word of n chars ≈ ceil(n/4) subword tokens, floor 1).
    */
  def tokenCountEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + greatest(lit(1L), ceil(length(w) / 4.0).cast("long")))

  /** All `k`-word shingles of `toks`, space-joined. Empty when the doc has
    * fewer than `k` words (mind Spark's `sequence(1,0)` = [1,0] descending
    * quirk — guarded here).
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))

  /** One salted MinHash signature value: min over shingles of
    * md5(salt:shingle). md5 is an exact cross-engine hash (same UTF-8
    * bytes → same hex), which is what lets the oracle replay signatures.
    */
  def minhashSig(shingleCol: Column, salt: Int): Column =
    array_min(transform(shingleCol, s => md5(concat(lit(s"$salt:"), s).cast("binary"))))

  /** Document fingerprint: the single-permutation MinHash (min md5 over
    * 3-word shingles) — winnowing-lite, stable under small edits.
    */
  def fingerprint(text: Column): Column =
    minhashSig(shingles(tokens(text), 3), 0)

  /** Stopword hit count (total, not distinct) for a language's list. */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, w => w.isInCollection(stopwords)))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately overlapping (de/la) — ties resolve by the
    * fixed language order of [[langId]].
    */
  val stopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "de", "y", "que"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不"))

  /** Heuristic language ID: argmax of stopword hits with a fixed
    * tie-break order (en > de > es > fr > zh). Expressed as a CASE chain
    * so the DuckDB oracle can replay it verbatim.
    */
  def langId(toks: Column): Column = {
    val hits = stopwordSets.map { case (lang, sw) => lang -> stopwordHits(toks, sw) }
    hits.tail.foldLeft((hits.head._2, lit(hits.head._1))) {
      case ((bestScore, bestLang), (lang, score)) =>
        (greatest(bestScore, score),
          when(score > bestScore, lang).otherwise(bestLang))
    }._2
  }

  /** Quality metrics: word count, exact mean word length, stopword ratio. */
  def nWords(toks: Column): Column = size(toks).cast("bigint")

  def sumWordLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, w) => acc + length(w))
}
