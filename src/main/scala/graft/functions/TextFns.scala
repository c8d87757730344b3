package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar layer (SURVEY.md §2.9 F7-F9 + the training-data
  * pipeline text operators).
  *
  * Everything is built from codegen'd `functions._` higher-order
  * functions over a `split` token array — no UDFs, so the hot path stays
  * inside whole-stage codegen and scales by partitioning alone. Lexicons
  * are inlined as map literals (`typedLit`): at realistic lexicon sizes
  * (AFINN-111 is 2477 entries) the literal lives in the plan and ships
  * once per task, the columnar data never moves.
  */
object TextFns {

  /** Whitespace tokens (F1). */
  def tokens(text: Column): Column = split(text, " ")

  /** F9 AFINN-style valence sum: Σ lexicon(word) over tokens.
    * Mirrors lyric.ipynb cell 10 (`afinn.score(lyric)`), generalized to
    * any word->valence lexicon.
    */
  def sentimentSum(text: Column, lexicon: Map[String, Int]): Column = {
    val m = typedLit(lexicon)
    aggregate(tokens(text), lit(0),
      (acc, w) => acc + coalesce(element_at(m, w), lit(0)))
  }

  /** F8 TextBlob-style polarity: mean valence of *matched* words,
    * normalized to [-1, 1] by the max |valence| (5 for AFINN scales).
    * Docs with no matched word score 0.0 (TextBlob's neutral default).
    */
  def sentimentPolarity(text: Column, lexicon: Map[String, Int]): Column = {
    val m = typedLit(lexicon)
    val matched = filter(tokens(text), w => element_at(m, w).isNotNull)
    val s = aggregate(matched, lit(0), (acc, w) => acc + element_at(m, w))
    // no round(): inputs are per-row ints, so the double ops are
    // bit-identical across engines as long as the oracle mirrors the
    // exact op order (sum / count / 5.0)
    when(size(matched) === 0, lit(0.0))
      .otherwise(s.cast("double") / size(matched) / lit(5.0))
  }

  /** Language-ID heuristic: per-language function-word hit counts,
    * argmax with deterministic precedence (score desc, language asc),
    * 'und' when nothing matches. N-gram-free on purpose: on
    * whitespace-tokenizable text, function words are the strongest
    * cheap signal and the whole thing stays in codegen.
    */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es", "un"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  def langScore(text: Column, lang: String): Column = {
    val stops = typedLit(stopwordProfiles(lang))
    size(filter(tokens(text), w => array_contains(stops, w)))
  }

  def langGuess(text: Column): Column = {
    val langs = stopwordProfiles.keys.toSeq.sorted // alphabetical precedence
    val scores = langs.map(l => l -> langScore(text, l))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first-match-wins in alphabetical order => deterministic tie-break
    scores.foldRight(lit("und")) { case ((l, s), alt) =>
      when(best > 0 && s === best, lit(l)).otherwise(alt)
    }
  }

  /** Quality score in [0,1]: length saturation + lexical diversity +
    * function-word ratio (the classic cheap pretraining-quality
    * heuristics), integer-count arithmetic so it is cross-engine exact.
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val n = size(t).cast("double")
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val distinctRatio = size(array_distinct(t)).cast("double") / n
    val en = typedLit(stopwordProfiles("en"))
    val stopRatio = size(filter(t, w => array_contains(en, w))).cast("double") / n
    lenScore * 0.25 + distinctRatio * 0.5 + stopRatio * 0.25
  }

  /** Token counting: whitespace tokens + a BPE-ish subword estimate
    * (ceil(len/4) per word — the ~4-chars-per-token rule).
    */
  def whitespaceTokenCount(text: Column): Column = size(tokens(text))

  def subwordEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + floor((length(w) + lit(3)) / lit(4)))

  /** BPE-style pre-tokenizer count: letter runs, digit runs, and each
    * remaining symbol are separate tokens (the GPT-2 pre-tokenizer
    * shape, simplified to a regex both Java and RE2 dialects agree on).
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** PII scrubbing (training-data hygiene): replace email addresses
    * and long digit runs (phone/account numbers) with stable tags.
    * Conservative patterns on purpose — a scrubber must never corrupt
    * non-PII text, and anything fancier belongs in a dedicated NER
    * pass. Pure regexp_replace, so the scrub stays inside codegen.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongDigitPattern = "\\(?[0-9][0-9 ()\\-]{6,}[0-9]"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      LongDigitPattern, "<NUMBER>")

  /** Count of PII hits a scrub would make (for corpus audit reports). */
  def piiHits(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))) +
      size(regexp_extract_all(text, lit(LongDigitPattern), lit(0)))

  /** Document fingerprint: minimum MD5 over word 5-gram shingles
    * (winnowing-lite / MinHash with k=1). MD5 is bit-identical across
    * engines, so the fingerprint is oracle-checkable; short docs fall
    * back to MD5 of the whole text.
    */
  def fingerprint(text: Column, shingle: Int = 5): Column = {
    val t = tokens(text)
    val n = size(t)
    val shingles = transform(
      sequence(lit(1), n - lit(shingle - 1)),
      i => md5(concat_ws(" ", slice(t, i, lit(shingle)))))
    when(n < shingle, md5(text)).otherwise(array_min(shingles))
  }
}
