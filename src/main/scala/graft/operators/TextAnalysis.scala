package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Text-analysis queries over the `documents` table — the per-document
  * statistics a training-data pipeline computes before filtering: token
  * counts, vocabulary richness, stopword share, a composite quality score,
  * language ID, and a content fingerprint.
  *
  * Everything is a single narrow projection over one scan (no shuffle at
  * all except the final presentation sort) — at 100 TB this is the ideal
  * embarrassingly-parallel shape; the ORDER BY exists only for oracle
  * determinism and would be dropped in production.
  */
object TextAnalysis {

  /** t1: per-document statistics + quality score + fingerprint. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val t = col("text")
    d.select(
        col("doc_id"),
        tokenCount(t).as("n_tokens"),
        distinctTokenCount(t).as("n_distinct_tokens"),
        typeTokenRatio(t).as("type_token_ratio"),
        avgTokenLen(t).as("avg_token_len"),
        stopwordRatio(t).as("stopword_ratio"),
        qualityScore(t).as("quality_score"),
        fingerprint(t).as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** t2: language-ID heuristic — marker-word hits per language + argmax
    * prediction with fixed tie order ("und" when nothing matches).
    */
  def langIdPerDoc(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val t = col("text")
    val scoreCols = LangMarkers.map { case (lang, m) =>
      langScore(t, m).as(s"hits_$lang")
    }
    d.select(col("doc_id") +: col("lang").as("lang_declared") +:
        langId(t).as("lang_pred") +: scoreCols: _*)
      .orderBy(col("doc_id"))
  }

  /** t3: corpus-level quality aggregation per (lang, source) — the shape of
    * a "which crawl sources are worth keeping" report.
    */
  def qualityBySource(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val t = col("text")
    d.select(col("lang"), col("source"), qualityScore(t).as("q"), tokenCount(t).as("n"))
      .groupBy(col("lang"), col("source"))
      .agg(
        round(avg(col("q")) + 1e-9, 4).as("avg_quality"),
        round(avg(col("n")), 2).as("avg_tokens"),
        count(lit(1)).cast("long").as("n_docs"))
      .orderBy(col("lang"), col("source"))
  }
}
