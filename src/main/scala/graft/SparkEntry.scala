package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Lifecycle, Reference, Relational, Scale, Tpch}
import graft.ext.{Dedup, FuzzyJoin, IncrementalCdc, IncrementalFuzzy, IncrementalIvf, IncrementalIvfPq, IncrementalLsh, IncrementalPq, IncrementalSimhash, Multimodal, Similarity, SuffixDedup, TextAnalysis}
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one implemented operator from SURVEY.md §2;
  * `oracleSql` carries the equivalent DuckDB SQL over the same parquet
  * tables (omitted only for ops whose semantics DuckDB cannot express —
  * those get the driver's weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query (B4 user summary) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Reference.b4UserSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Reference.defs ++ Relational.defs ++ Lifecycle.defs ++ Streams.defs ++
      Scale.defs ++ Analytics.defs ++ Tpch.defs ++
      TextAnalysis.defs ++ Dedup.defs ++ FuzzyJoin.defs ++
      IncrementalCdc.defs ++ IncrementalFuzzy.defs ++ IncrementalIvf.defs ++ IncrementalIvfPq.defs ++ IncrementalLsh.defs ++ IncrementalPq.defs ++ IncrementalSimhash.defs ++
      Similarity.defs ++ Multimodal.defs ++ SuffixDedup.defs

  def oracleSql: Map[String, String] =
    Reference.oracles ++ Relational.oracles ++ Lifecycle.oracles ++ Streams.oracles ++
      Scale.oracles ++ Analytics.oracles ++ Tpch.oracles ++
      TextAnalysis.oracles ++ Dedup.oracles ++ FuzzyJoin.oracles ++
      IncrementalCdc.oracles ++ IncrementalFuzzy.oracles ++ IncrementalIvf.oracles ++ IncrementalIvfPq.oracles ++ IncrementalLsh.oracles ++
      IncrementalPq.oracles ++ IncrementalSimhash.oracles ++ Similarity.oracles ++ Multimodal.oracles ++
      SuffixDedup.oracles
}
