package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic in-query "transliteration" of the synthetic corpus by
  * its `lang` label — the q115 mutation technique applied to language
  * distributions. The raw fixture text is English-shaped for every
  * label, which made the lang-ID family (q25/q173/q175) single-class:
  * every document detected as 'en' and the confusion matrix had no
  * off-diagonal mass to report. This helper derives, identically on
  * both engines, a corpus whose token distributions genuinely differ
  * by label:
  *
  *   - es: the→el, a→la          (marker words the detector profiles)
  *   - de: the→der, a→das
  *   - fr: the→le, a→une         (real words, but NO detector profile —
  *                                fr shows where OOV languages dump)
  *   - zh: every token reversed  (a wholly foreign token distribution;
  *                                mostly OOV for the BPE vocabulary)
  *   - en: unchanged
  *
  * Token-level CASE mapping over the whitespace-normalized text — exact
  * word boundaries, no overlapping-replace ambiguity, and the same
  * left-to-right fold in Spark (`transform`) and DuckDB
  * (`list_transform`). */
object Localize {

  /** Localized token array from the label + normalized text. */
  def tokens(lang: Column, normText: Column): Column =
    transform(split(normText, " "), t =>
      when(lang === "es",
        when(t === "the", "el").when(t === "a", "la").otherwise(t))
        .when(lang === "de",
          when(t === "the", "der").when(t === "a", "das").otherwise(t))
        .when(lang === "fr",
          when(t === "the", "le").when(t === "a", "une").otherwise(t))
        .when(lang === "zh", reverse(t))
        .otherwise(t))

  /** Localized text (tokens re-joined with single spaces). */
  def text(lang: Column, normText: Column): Column =
    array_join(tokens(lang, normText), " ")

  /** DuckDB list expression equivalent to [[tokens]]; `normExpr` is the
    * engine-shared normalization over the `documents.text` column and
    * `lang` must be in scope. */
  def tokensSql(normExpr: String): String =
    s"""list_transform(string_split($normExpr, ' '), t ->
       |    CASE WHEN lang = 'es' THEN
       |           CASE WHEN t = 'the' THEN 'el' WHEN t = 'a' THEN 'la' ELSE t END
       |         WHEN lang = 'de' THEN
       |           CASE WHEN t = 'the' THEN 'der' WHEN t = 'a' THEN 'das' ELSE t END
       |         WHEN lang = 'fr' THEN
       |           CASE WHEN t = 'the' THEN 'le' WHEN t = 'a' THEN 'une' ELSE t END
       |         WHEN lang = 'zh' THEN reverse(t)
       |         ELSE t END)""".stripMargin

  /** DuckDB text expression equivalent to [[text]]. */
  def textSql(normExpr: String): String =
    s"array_to_string(${tokensSql(normExpr)}, ' ')"
}
