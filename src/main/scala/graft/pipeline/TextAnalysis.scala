package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language identification, document fingerprinting.
  * All pure Catalyst expressions (codegen-friendly, oracle-reproducible).
  */
object TextAnalysis {

  /** Per-doc token statistics: token count (whitespace-free `[a-z0-9]+`
    * tokenizer — the engine's analyzer contract), distinct terms, mean token
    * length. */
  def tokenStats(df: DataFrame, textCol: String): DataFrame = {
    val toks = col("__toks")
    df.withColumn("__toks", TextOps.tokens(col(textCol)))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_terms", size(array_distinct(toks)))
      .withColumn("mean_token_len",
        when(size(toks) > 0,
          aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") / size(toks))
          .otherwise(lit(0.0)))
      .drop("__toks")
  }

  /** Heuristic quality score in [0,1] from cheap surface features — the
    * shape of C4/Gopher-style quality filters:
    *  - length factor: saturating token count (docs under ~50 tokens are
    *    penalized linearly),
    *  - lexical diversity: distinct/total token ratio,
    *  - alpha ratio: fraction of alphanumeric chars in the raw text.
    * Composable as a WHERE filter at scale (pure expressions ⇒ pushdown). */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val toks = col("__toks")
    val nTok = size(toks).cast("double")
    val lengthFactor = least(nTok / 50.0, lit(1.0))
    val diversity = when(size(toks) > 0, size(array_distinct(toks)) / nTok).otherwise(0.0)
    val alphaRatio = when(length(col(textCol)) > 0,
      length(regexp_replace(col(textCol), "[^a-zA-Z0-9]", "")).cast("double") / length(col(textCol)))
      .otherwise(0.0)
    df.withColumn("__toks", TextOps.tokens(col(textCol)))
      .withColumn("quality",
        round((lengthFactor + diversity + alphaRatio) / 3.0, 6))
      .drop("__toks")
  }

  /** Per-language marker stopword sets for the n-gram/stopword-hit language
    * heuristic. Tiny on purpose: real pipelines ship fastText — the operator
    * shape (per-language token-set hit scoring + argmax) is the same. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "los", "las", "es", "una", "y"))

  /** Heuristic language-ID: non-ASCII-dominant text → "zh"; otherwise argmax
    * of marker-stopword hit counts (deterministic tiebreak: marker list
    * order), "und" when nothing hits.
    *
    * The token array is materialized ONCE in an intermediate projection and
    * every marker count reads that column — Catalyst's CollapseProject keeps
    * a non-cheap multiply-referenced expression in its own project, so the
    * regexp tokenization runs once per row, not once per language (the r2
    * q22 regression was five tokenizations per row). */
  def languageId(df: DataFrame, textCol: String): DataFrame = {
    val asciiLetters = length(regexp_replace(col(textCol), "[^a-zA-Z0-9 ]", ""))
    val nonAsciiDominant = length(col(textCol)) > 0 &&
      asciiLetters.cast("double") / length(col(textCol)) < lit(0.5)
    val withToks = df.withColumn("__toks", TextOps.tokens(col(textCol)))
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(col("__toks"), t => t.isin(markers: _*)))
    }
    val best = scores.tail.foldLeft[(Column, Column)]((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }
    withToks.withColumn("predicted_lang",
      when(nonAsciiDominant, lit("zh"))
        .when(best._2 > 0, best._1)
        .otherwise(lit("und")))
      .drop("__toks")
  }

  /** Canonical bag-of-words fingerprint (see [[TextOps.bagFingerprint]]). */
  def fingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fingerprint", TextOps.bagFingerprint(col(textCol)))
}
