package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * All pure Catalyst column expressions (codegen'd, no UDFs — SURVEY.md
  * "Functions, not UDFs") so they run inside whole-stage codegen at 100 TB.
  * Every function here is deterministic and reproducible in ANSI SQL for the
  * DuckDB oracle.
  */
object TextFunctions {

  /** Lowercased, punctuation-stripped, whitespace-collapsed text. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9 ]", " "))

  /** Whitespace tokens of the normalized text (empty tokens dropped). */
  def tokens(c: Column): Column =
    filter(split(normalizeText(c), "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles: ["a","b","c"] with n=2 -> ["a b","b c"].
    * A document shorter than n words yields its whole text as one shingle.
    *
    * NOT a hot-path builder: `ts` sits inside the `transform` lambda, and a
    * higher-order function re-evaluates its lambda body per element — the
    * tokenize pipeline runs once per shingle, not once per document. Every
    * per-document pipeline uses the one-pass [[HashedShingles]] /
    * [[ChunkText]] expressions instead; this stays for readable inspection
    * of small samples.
    */
  def shingles(c: Column, n: Int): Column = {
    val ts = tokens(c)
    when(size(ts) <= n, array(concat_ws(" ", ts)))
      .otherwise(transform(
        sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
  }

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Per-token 64-bit hashes, empty array for zero-token documents — the
    * shared explode input of the unigram pipelines (LM scoring, quality
    * classifier, BM25). Both the guard and the hashes run as codegen JVM
    * passes ([[TokenizeWords]] / [[HashedShingles]] share one tokenizer);
    * guarding with the interpreted [[tokenCount]] instead costs a full
    * regex pass per row (measured 34 s → 8 s on the repetition operator).
    */
  def tokenHashes(c: Column): Column =
    when(size(TokenizeWords(c)) >= 1, HashedShingles(c, 1))
      .otherwise(array().cast("array<long>"))

  /** BPE-ish subword proxy count: letter runs, single digits, and single
    * punctuation marks each count as one token (a cheap, deterministic
    * stand-in for a real byte-pair-encoding tokenizer).
    */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Marker-stopword language ID (n-gram heuristic): score each candidate
    * language by occurrences of its high-frequency function words; highest
    * score wins, ties/zero -> "und". Deterministic and SQL-reproducible.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que"),
    "fr" -> Seq("le", "la", "et", "les"),
    "de" -> Seq("der", "die", "und", "ist"))

  def langScore(c: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), normalizeText(c), lit(" "))
    markers.map { m =>
      (length(padded) - length(regexp_replace(padded, s" $m ", " "))) /
        lit(m.length + 1)
    }.reduce(_ + _)
  }

  def langId(c: Column): Column = {
    val scored = LangMarkers.map { case (lang, ms) => (lang, langScore(c, ms)) }
    val best = scored.map(_._2).reduce(greatest(_, _))
    scored.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s > 0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Heuristic quality components (Gopher/C4-style cheap filters). */
  def punctRatio(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[^\\p{Alnum}\\s]", ""))).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  def stopwordRatio(c: Column): Column = {
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    val ts = tokens(c)
    size(filter(ts, t => t.isin(stop.map(lit(_)): _*))).cast("double") /
      greatest(size(ts), lit(1)).cast("double")
  }

  def meanWordLength(c: Column): Column = {
    val ts = tokens(c)
    aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(ts), lit(1)).cast("double")
  }

  /** Raw component sum of the composite quality score, in [0, 4] in exact
    * 0.5 steps — binary-exact doubles, so ORDERING on it (e.g.
    * [[graft.ops.Dedup.keepBest]]) is bit-identical across engines, which
    * the rounded [[qualityScore]] is not (round-half-up vs half-even flips
    * ties differently per engine at the .125 boundaries).
    */
  def qualityScoreRaw(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val lengthOk = when(nTok.between(5, 5000), lit(1.0)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(c) < 0.2, lit(1.0)).otherwise(lit(0.0))
    val wordLenOk = when(meanWordLength(c).between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0))
    val stopOk = when(stopwordRatio(c) > 0.0, lit(1.0)).otherwise(lit(0.5))
    lengthOk + punctOk + wordLenOk + stopOk
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, mild
    * punctuation, typical word length, some stopwords (fixed weights —
    * a document scoring near 0 is boilerplate/garbage, near 1 is prose).
    */
  def qualityScore(c: Column): Column =
    round(qualityScoreRaw(c) / 4.0, 2)

  /** Content-defined fingerprint: md5 of normalized text, first 16 hex chars
    * as the dedup key (SQL-reproducible; for the rolling-hash/winnowing
    * variant see [[RollingHashFingerprint]]).
    */
  def contentFingerprint(c: Column): Column =
    substring(md5(normalizeText(c)), 1, 16)

  /** Within-document token repetition ratio (Gopher-style repetition
    * filter): 1 - distinct/total tokens, 0 for empty docs. High values
    * flag boilerplate/spam for pipeline filtering. SQL-reproducible.
    */
  def repetitionRatio(c: Column): Column = {
    val ts = tokens(c)
    (size(ts) - size(array_distinct(ts))).cast("double") /
      greatest(size(ts), lit(1)).cast("double")
  }

  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRegex = "\\+?\\d[\\d -]{7,}\\d"

  /** PII redaction: emails then phone-number-shaped digit runs replaced by
    * fixed tags. Both patterns use the regex subset Java and RE2 share, so
    * the oracle reproduces the replacement byte-for-byte; a production
    * deployment extends the pattern list the same way.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailRegex, "<EMAIL>"),
      PhoneRegex, "<PHONE>")
}
