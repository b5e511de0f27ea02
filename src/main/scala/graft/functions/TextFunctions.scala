package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline, built purely
  * from codegen'd built-in functions (no UDFs — SURVEY.md §4: keep the
  * hot path inside WholeStageCodegen). Every helper has a DuckDB-SQL
  * twin (`sql*`) generated from the same constants so the oracle can
  * replay it exactly.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text. */
  def tokens(t: Column): Column = split(trim(t), "\\s+")
  def sqlTokens(t: String): String = s"string_split_regex(trim($t), '\\s+')"

  def tokenCount(t: Column): Column = size(tokens(t))
  def sqlTokenCount(t: String): String =
    s"CAST(len(${sqlTokens(t)}) AS INT)"

  def uniqueTokenCount(t: Column): Column = size(array_distinct(tokens(t)))
  def sqlUniqueTokenCount(t: String): String =
    s"CAST(len(list_distinct(${sqlTokens(t)})) AS INT)"

  /** BPE-ish subword segmentation: letter runs, digit runs, single
    * punctuation — the classic pre-tokenizer regex. */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeTokenCount(t: Column): Column =
    size(regexp_extract_all(t, lit(BpePattern), lit(0)))
  def sqlBpeTokenCount(t: String): String =
    s"CAST(len(regexp_extract_all($t, '$BpePattern', 0)) AS INT)"

  /** First 64 bits of md5(c) (big-endian hex) as a signed long — a
    * portable 64-bit hash: DuckDB reproduces the identical bit pattern
    * (unsigned view) via [[sqlMd5Hash64U]], so operators built on it
    * (SimHash d04) stay oracle-checkable where xxhash64 wouldn't be.
    * Two 32-bit `conv` parses concatenated by shift/or — each half fits
    * a long exactly, and overflow into the sign bit on the high half is
    * precisely the wanted two's-complement pattern. All built-ins, so
    * the hash stays inside WholeStageCodegen. */
  def md5Hash64(c: Column): Column = {
    val hex = md5(c)
    shiftleft(conv(substring(hex, 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(hex, 9, 8), 16, 10).cast("long"))
  }

  /** DuckDB twin of [[md5Hash64]] as UBIGINT — the same 64 bits viewed
    * unsigned, so shifts/masks/bit_count agree with Spark's signed
    * long (which uses logical shifts on its side). */
  def sqlMd5Hash64U(s: String): String =
    s"(('0x' || substr(md5($s), 1, 16))::UBIGINT)"

  /** Document fingerprint: md5 of case/whitespace-normalized text —
    * same hex in every engine. */
  def fingerprint(t: Column): Column =
    md5(regexp_replace(lower(trim(t)), "\\s+", " "))
  def sqlFingerprint(t: String): String =
    s"md5(regexp_replace(lower(trim($t)), '\\s+', ' ', 'g'))"

  // ---- language ID: stopword-hit voting ----------------------------
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "et", "les", "des", "est"),
    "es" -> Seq("el", "los", "que", "por", "con"))

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, x => array_contains(array(words.map(lit): _*), x)))

  /** Predicted language: most stopword hits, ties → earlier language,
    * zero hits everywhere → 'und'. */
  def langId(t: Column): Column = {
    val tk = tokens(t)
    val hits = LangStopwords.map { case (_, ws) => hitCount(tk, ws) }
    val g = greatest(hits: _*)
    val chain = LangStopwords.zip(hits).tail.foldLeft(
      when(g === 0, "und").when(hits.head === g, LangStopwords.head._1)) {
      case (acc, ((lang, _), h)) => acc.when(h === g, lang)
    }
    chain
  }

  def sqlLangId(t: String): String = {
    def hits(ws: Seq[String]) = {
      val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(${sqlTokens(t)}, x -> list_contains($lst, x)))"
    }
    val hs = LangStopwords.map { case (_, ws) => hits(ws) }
    val g = hs.mkString("greatest(", ", ", ")")
    val whens = LangStopwords.zip(hs)
      .map { case ((lang, _), h) => s"WHEN $h = $g THEN '$lang'" }
      .mkString(" ")
    s"CASE WHEN $g = 0 THEN 'und' $whens END"
  }

  // ---- repetition (Gopher-style duplicate n-gram fraction) ---------
  /** Adjacent token 2-grams ("a b"), one per token position. zip_with
    * is a codegen barrier (interpreted Project) but the plan stays
    * narrow/per-row — embarrassingly parallel, nothing shuffles. */
  def bigrams(t: Column): Column = {
    val tk = tokens(t)
    zip_with(
      slice(tk, lit(1), size(tk) - 1),
      slice(tk, lit(2), size(tk) - 1),
      (a, b) => concat(a, lit(" "), b))
  }
  def sqlBigrams(t: String): String = {
    val l = sqlTokens(t)
    s"list_transform(range(1, len($l)), i -> $l[i] || ' ' || $l[i + 1])"
  }

  def bigramCount(t: Column): Column = size(bigrams(t))
  def sqlBigramCount(t: String): String =
    s"CAST(len(${sqlBigrams(t)}) AS INT)"

  def uniqueBigramCount(t: Column): Column = size(array_distinct(bigrams(t)))
  def sqlUniqueBigramCount(t: String): String =
    s"CAST(len(list_distinct(${sqlBigrams(t)})) AS INT)"

  /** Fraction of 2-gram occurrences that repeat an earlier one —
    * single division so both engines produce the identical float64.
    * Caller guarantees ≥2 tokens. */
  def repRatio(t: Column): Column =
    (bigramCount(t) - uniqueBigramCount(t)) / bigramCount(t).cast("double")
  def sqlRepRatio(t: String): String =
    s"(${sqlBigramCount(t)} - ${sqlUniqueBigramCount(t)}) / " +
      s"CAST(${sqlBigramCount(t)} AS DOUBLE)"

  // ---- PII redaction -----------------------------------------------
  /** Patterns restricted to syntax Java regex and RE2 (DuckDB) parse
    * identically — no lookaround, no backrefs, no shorthand classes —
    * so the redacted text is oracle-hash-checkable. */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
  val DigitRunPattern = "[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+"

  /** Replace emails and ≥7-digit runs (phone/ID-shaped) with typed
    * placeholder tokens — the standard scrub pass before training.
    * Order matters: emails first, so an address's digits can't be
    * half-eaten by the digit-run rule. */
  def redactPii(t: Column): Column =
    regexp_replace(
      regexp_replace(t, EmailPattern, "<email>"),
      DigitRunPattern, "<digits>")
  def sqlRedactPii(t: String): String =
    s"regexp_replace(regexp_replace($t, '$EmailPattern', '<email>', 'g'), " +
      s"'$DigitRunPattern', '<digits>', 'g')"

  def emailCount(t: Column): Column =
    size(regexp_extract_all(t, lit(EmailPattern), lit(0)))
  def sqlEmailCount(t: String): String =
    s"CAST(len(regexp_extract_all($t, '$EmailPattern', 0)) AS INT)"

  def digitRunCount(t: Column): Column =
    size(regexp_extract_all(t, lit(DigitRunPattern), lit(0)))
  def sqlDigitRunCount(t: String): String =
    s"CAST(len(regexp_extract_all($t, '$DigitRunPattern', 0)) AS INT)"

  // ---- quality scoring ---------------------------------------------
  /** alpha_ratio: share of [a-zA-Z] chars. Caller guarantees length>0
    * (blank filter upstream). */
  def alphaRatio(t: Column): Column =
    length(regexp_replace(t, "[^a-zA-Z]", "")) / length(t).cast("double")
  def sqlAlphaRatio(t: String): String =
    s"length(regexp_replace($t, '[^a-zA-Z]', '', 'g')) / CAST(length($t) AS DOUBLE)"

  def uniqRatio(t: Column): Column =
    uniqueTokenCount(t) / tokenCount(t).cast("double")
  def sqlUniqRatio(t: String): String =
    s"${sqlUniqueTokenCount(t)} / CAST(${sqlTokenCount(t)} AS DOUBLE)"

  def lenScore(nChars: Column): Column = least(nChars, lit(400)) / lit(400.0)
  def sqlLenScore(nChars: String): String = s"least($nChars, 400) / 400.0"

  /** Composite quality in [0,1]: fixed-order double arithmetic so both
    * engines produce the identical float64. */
  def quality(t: Column, nChars: Column): Column =
    lenScore(nChars) * 0.3 + uniqRatio(t) * 0.3 + alphaRatio(t) * 0.4
  def sqlQuality(t: String, nChars: String): String =
    s"${sqlLenScore(nChars)} * 0.3 + ${sqlUniqRatio(t)} * 0.3 + ${sqlAlphaRatio(t)} * 0.4"
}
