package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis building blocks for LLM data pipelines, composed from
  * codegen'd built-in functions (no UDFs) so they stay inside whole-stage
  * codegen and scale to 100 TB scans.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: runs of letters, single digits, or punctuation —
    * a cheap proxy for subword tokenizer counts (pattern is valid in both
    * Java regex and RE2 so oracles can reproduce it). */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
  def tokenCountBpe(text: Column): Column = regexp_count(text, lit(BpePattern))

  /** Distinct word n-gram shingles (the unit for Jaccard/MinHash dedup).
    * Empty array when the text has fewer than n tokens. Backed by a one-pass
    * custom expression (see [[WordShinglesExpr]]); semantics identical to
    * `array_distinct(transform(sequence(...), concat_ws(' ', ...)))`. */
  def wordShingles(text: Column, n: Int): Column =
    WordShingles.wordShingles(text, n)

  /** Distinct character n-grams. */
  def charShingles(text: Column, n: Int): Column = {
    val idx = sequence(lit(1), greatest(length(text) - (n - 1), lit(0)))
    array_distinct(transform(idx, i => text.substr(i, lit(n))))
  }

  /** Jaccard similarity of two pre-computed shingle arrays (exact). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** MinHash signature: k minimums of per-seed xxhash64 over the shingle set.
    * Pure built-ins → codegen'd, order-independent, deterministic. */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(i => array_min(transform(shingles, s => xxhash64(lit(i), s)))): _*)

  /** LSH band hashes: split the k-wide signature into `bands` bands and hash
    * each; docs sharing any (band index, hash) are candidate duplicates. */
  def lshBands(signature: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((lit(b) +: (0 until rows).map(r =>
          element_at(signature, b * rows + r + 1))): _*).as("bucket"))
    }: _*)
  }

  /** Sorted-distinct-token fingerprint (document-level content hash robust to
    * token order and repetition). */
  def tokenFingerprint(text: Column): Column =
    xxhash64(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Rolling polynomial fingerprint over the same canonical token string:
    * acc = (acc*31 + codepoint) mod 1e9+7, folded left to right. Unlike
    * xxhash64 this is ENGINE-PORTABLE (the DuckDB oracle replays it with
    * list_reduce), so the fingerprint path gets a hash-match check; the
    * char class [^\n] reads identically in Java regex and RE2. */
  def rollingFingerprint(text: Column): Column = {
    val canon = concat_ws(" ", array_sort(array_distinct(tokens(text))))
    aggregate(
      transform(regexp_extract_all(canon, lit("[^\n]"), lit(0)),
        c => ascii(c).cast(LongType)),
      lit(0L),
      (acc, x) => (acc * lit(31L) + x) % lit(1000000007L))
  }

  // ------------------------------------------------------------ PII scrub

  /** (label, pattern) redaction rules, applied in order (more-specific
    * first: an SSN must not be half-eaten by the phone rule). Patterns are
    * valid and IDENTICAL in Java regex and RE2, so the DuckDB oracle
    * replays the scrub byte-for-byte. */
  val PiiRules: Seq[(String, String)] = Seq(
    "EMAIL" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "SSN" -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
    "PHONE" -> "\\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\\b",
    "IP" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b")

  /** Redact PII-shaped spans (emails, SSNs, phone numbers, IPv4 addresses)
    * to `<LABEL>` tokens — the scrub pass a training corpus runs before
    * anything else sees the text. Pure codegen'd regexp_replace chain. */
  def redactPii(text: Column): Column =
    PiiRules.foldLeft(text) { case (acc, (label, pattern)) =>
      regexp_replace(acc, pattern, s"<$label>")
    }

  /** Count of PII-shaped spans per rule (diagnostics / corpus reporting). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    PiiRules.map { case (label, pattern) =>
      s"n_${label.toLowerCase}" -> regexp_count(text, lit(pattern))
    }

  // ------------------------------------------------------------ language ID

  /** Marker (stop)words per language for the n-gram/stopword heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es" -> Seq("el", "los", "las", "es", "y", "un", "una", "de", "que", "por"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(array_intersect(tokens(lower(text)), array(markers.map(lit): _*)))

  /** Heuristic language ID: CJK characters → "zh"; else the marker-list with
    * the highest DISTINCT-token hit count (ties resolved in LangMarkers
    * order); no hits → "und". Deterministic and SQL-reproducible for the
    * oracle. Backed by a one-pass expression ([[LangIdExpr]]) — the
    * composable form recomputed the token split once per language. */
  def langId(text: Column): Column = LangId.langId(text)

  /** The original composable formulation (kept for reference/tests). */
  def langIdComposed(text: Column): Column = {
    val scores = LangMarkers.map { case (l, ms) => l -> langScore(text, ms) }
    val best = greatest(scores.map(_._2): _*)
    val pick = scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    when(regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]")) > 0, lit("zh")).otherwise(pick)
  }

  // ---------------------------------------------------------- quality score

  val EnStopwords: Seq[String] = LangMarkers.head._2

  /** Heuristic quality features + a composite score in [0,1]-ish — the
    * length/punctuation/stopword-ratio style filters used by LLM data
    * pipelines. All arithmetic is exact-int-derived doubles so the DuckDB
    * oracle reproduces it bit-for-bit. */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val nChars = length(text).cast(DoubleType)
    val nToks = tokenCount(text).cast(DoubleType)
    val stopHits = size(array_intersect(tokens(lower(text)),
      array(EnStopwords.map(lit): _*))).cast(DoubleType)
    val punct = (length(text) -
      length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))).cast(DoubleType)
    val avgTokLen = (nChars - (nToks - 1)) / nToks
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nToks,
      "avg_token_len" -> avgTokLen,
      "stopword_hits" -> stopHits,
      "punct_count" -> punct)
  }

  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lenOk = when(f("n_tokens") >= 10 && f("n_tokens") <= 1000, 1.0).otherwise(0.0)
    val tokOk = when(f("avg_token_len") >= 2.0 && f("avg_token_len") <= 12.0, 1.0).otherwise(0.0)
    val punctOk = when(f("punct_count") / f("n_chars") <= 0.2, 1.0).otherwise(0.0)
    (lenOk + tokOk + punctOk) / 3.0
  }
}
