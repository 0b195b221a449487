package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for training-data pipelines. All pure
  * Catalyst expressions (codegen'd, no UDFs): they run inside whole-stage
  * codegen and scale linearly with no shuffles.
  */
object Text {

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Portable token count — identical arithmetic is expressible in any SQL
    * dialect (length/replace), used by oracle-checked queries:
    * count of space-separated fields of the trimmed text.
    */
  def tokenCountPortable(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L))
      .otherwise((length(trim(c)) - length(replace(trim(c), lit(" "), lit(""))) + 1).cast("long"))

  /** BPE-ish subword count estimate: words plus extra tokens for every
    * 4 chars of long words (rough GPT-style heuristic).
    */
  def tokenEstimate(c: Column): Column =
    aggregate(
      tokens(c),
      lit(0L),
      (acc, t) => acc + greatest(lit(1L), ceil(length(t) / lit(4.0)).cast("long")))

  /** BPE-style pre-tokenization regex: letter runs, digit runs, single
    * punctuation marks. Whitespace is an EXPLICIT class rather than `\s`
    * because Java counts U+000B (vertical tab) as `\s` and RE2 does not —
    * with the explicit class the pattern evaluates identically in Spark and
    * DuckDB, keeping q41 oracle-checkable on any corpus.
    */
  val BpeSplitPattern = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r\\f\\x0B]"

  /** Subword-ish tokens of lowercased text (regexp_extract_all, codegen'd). */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit(BpeSplitPattern), lit(0))

  /** Count of BPE-style subword tokens. */
  def bpeTokenCount(c: Column): Column = size(bpeTokens(c)).cast("long")

  /** Word k-shingles (k consecutive tokens joined by one space). Short texts
    * (< k tokens) yield a single whole-text shingle.
    */
  def shingles(c: Column, k: Int = 3): Column = shinglesOf(tokens(c), k)

  /** Shared shingle windowing over a pre-split token array. */
  private def shinglesOf(ts: Column, k: Int): Column =
    when(size(ts) < k, array(concat_ws(" ", ts)))
      .otherwise(transform(
        sequence(lit(1), size(ts) - (k - 1)),
        i => concat_ws(" ", slice(ts, i, lit(k)))))

  /** Word k-shingles over plain single-space-split tokens. Unlike
    * [[shingles]] (regex `\s+` tokens), this splits on the literal space
    * character only, which evaluates identically in DuckDB
    * (`string_split(text, ' ')` + list slicing) — used by the
    * oracle-checked exact-Jaccard query (q35).
    */
  def shinglesSpaceSplit(c: Column, k: Int = 3): Column =
    shinglesOf(split(c, " ", -1), k)

  /** MinHash signature: `numPerm` independent min-hashes over the distinct
    * shingle set. Permutation i is `xxhash64(shingle, i)` — independent
    * 64-bit hash families keyed by the literal seed position.
    */
  def minHashSignature(shingleCol: Column, numPerm: Int = 32): Column =
    array((0 until numPerm).map { i =>
      array_min(transform(array_distinct(shingleCol), s => xxhash64(s, lit(i))))
    }: _*)

  /** LSH band keys for a minhash signature: `numBands` hashes of `rowsPerBand`
    * consecutive signature entries. Two docs sharing any band key are
    * near-dup candidates.
    */
  def lshBands(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(parts: _*).as("bhash"))
    }: _*)

  /** 64-bit SimHash over the token multiset: bit j of the result is the sign
    * of sum over tokens of (bit j of xxhash64(token) ? +1 : -1).
    */
  def simHash(tokenCol: Column): Column = {
    val bitVotes = aggregate(
      tokenCol,
      array_repeat(lit(0L), 64),
      (acc, t) =>
        zip_with(
          acc,
          transform(
            sequence(lit(0), lit(63)),
            j => when(call_function("shiftright", xxhash64(t), j).bitwiseAND(lit(1L)) === 1L, lit(1L))
              .otherwise(lit(-1L))),
          (a, b) => a + b))
    aggregate(
      zip_with(
        bitVotes,
        sequence(lit(0), lit(63)),
        (v, j) => when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Jaccard similarity of two shingle-set columns (arrays, deduped). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    size(array_intersect(da, db)).cast("double") / size(array_union(da, db)).cast("double")
  }

  /** Masking patterns shared with the DuckDB oracle — RE2-safe (no
    * backrefs/lookaround), explicit whitespace class (see
    * [[BpeSplitPattern]] for why `\s` is a cross-engine trap). Applied to
    * LOWERCASED text so the case-sensitive classes suffice.
    */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val UrlPattern = "https?://[^ \\t\\n\\r]+"
  private val WsRun = "[ \\t\\n\\r]+"

  /** Normalization pass for training corpora: lowercase, mask emails and
    * URLs, collapse whitespace runs, trim. Pure `regexp_replace` chain —
    * codegen'd, shuffle-free, linear.
    */
  def cleanText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(c), EmailPattern, "<email>"),
        UrlPattern, "<url>"),
      WsRun, " "))

  /** Count of pattern matches (codegen'd; for masking audits). */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(lower(c), lit(pattern), lit(0))).cast("long")

  /** PII scrubbing patterns, RE2-safe like [[EmailPattern]] (shared with
    * the DuckDB oracle). The shapes are deliberately disjoint ON THE SAME
    * TEXT — an SSN-shaped id (3-2-4 digit groups) can never match inside a
    * phone-shaped run (3-3-4) or an IPv4 and vice versa — so the per-type
    * audit counts are order-independent even though the redaction chain
    * itself applies them in a fixed order.
    */
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val SsnPattern = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Training-corpus PII redaction: emails, IPv4s, SSN-shaped and
    * phone-shaped identifiers replaced by type tokens. One
    * `regexp_replace` chain over lowercased text — codegen'd, linear,
    * shuffle-free, exactly [[cleanText]]'s execution shape. Replacement
    * tokens contain no digits or `@`, so no later pattern can match inside
    * an earlier rewrite. Audit counts belong with [[matchCount]] over the
    * SAME pattern constants, so a scrub and its report cannot disagree.
    */
  def piiScrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(lower(c), EmailPattern, "<email>"),
          Ipv4Pattern, "<ip>"),
        SsnPattern, "<ssn>"),
      PhonePattern, "<phone>")

  /** Content fingerprint: stable 128-bit hex digest of normalized text. */
  def fingerprint(c: Column): Column = md5(lower(trim(c)))

  /** Fast 64-bit rolling-style fingerprint (xxhash64 of normalized text). */
  def fingerprint64(c: Column): Column = xxhash64(lower(trim(c)))

  /** Heuristic language ID: scores per-language stopword hit counts and takes
    * the argmax (ties → first). `profiles` maps language code → marker words.
    */
  def langId(
      c: Column,
      profiles: Seq[(String, Seq[String])] = DefaultLangProfiles): Column = {
    val padded = concat(lit(" "), lower(trim(c)), lit(" "))
    def score(words: Seq[String]): Column =
      words.map { w =>
        val token = s" $w "
        ((length(padded) - length(replace(padded, lit(token), lit("")))) / token.length).cast("long")
      }.reduce(_ + _)
    val scored = profiles.map { case (lang, words) => (lang, score(words)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc === best && sc > 0, lit(lang)).otherwise(acc)
    }
  }

  val DefaultLangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "zh" -> Seq("de", "shi", "le"))

  /** Quality score in [0,1]: blends non-space density, mean token length
    * band, and a length band. Deterministic double arithmetic.
    */
  def qualityScore(c: Column): Column = {
    val len = length(c).cast("double")
    val nonSpace = length(replace(c, lit(" "), lit(""))).cast("double")
    val nTok = tokenCountPortable(c).cast("double")
    val density = when(len > 0, nonSpace / len).otherwise(lit(0.0))
    val avgTokLen = when(nTok > 0, nonSpace / nTok).otherwise(lit(0.0))
    val tokBand = when(avgTokLen >= 3 && avgTokLen <= 10, lit(1.0)).otherwise(lit(0.5))
    val lenBand = when(len >= 50 && len <= 10000, lit(1.0)).otherwise(lit(0.5))
    (density * 0.4) + (tokBand * 0.3) + (lenBand * 0.3)
  }
}
