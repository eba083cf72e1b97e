package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Q
import graft.operators.{Corpus, Curation, Dedup, Events, Extras, Linkage, Mining, Multimodal, Quality, Relational, Similarity, Sketches, Temporal, Text}
import graft.sds.E2eQueries
import graft.streaming.StreamingQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Every implemented capability, one Q per operator (SURVEY.md §2). */
  def allQueries: Seq[Q] =
    Relational.defs ++ Temporal.defs ++ Text.defs ++ Dedup.defs ++
      Similarity.defs ++ Events.defs ++ Multimodal.defs ++ Extras.defs ++
      E2eQueries.defs ++ Corpus.defs ++ Curation.defs ++
      StreamingQueries.defs ++ Mining.defs ++ Quality.defs ++
      Sketches.defs ++ Linkage.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.head.spark(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.spark).toMap

  /** DuckDB-runnable oracle SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
