package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in graft.ops.* / graft.streaming.* as QueryDef values
  * (Spark implementation and DuckDB oracle side by side); this object only
  * assembles the maps the driver consumes.
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] = {
    val defs =
      ops.Relational.defs ++ ops.Joins.defs ++ ops.Aggregates.defs ++
        ops.Windows.defs ++ ops.Scalars.defs ++
        ops.TextPipeline.defs ++ ops.Similarity.defs ++ ops.Multimodal.defs ++
        ops.TimeWindows.defs ++ ops.Corpus.defs ++ ops.Skew.defs ++ ops.Analytics.defs ++
        ops.Lexicon.defs ++ ops.Timeseries.defs ++ ops.Cdc.defs ++
        ops.Statistics.defs ++ ops.Graph.defs ++ ops.Inference.defs ++
        ops.Diagnostics.defs ++ ops.Curation.defs ++ ops.SeriesTests.defs ++
        ops.Pricing.defs ++ ops.Ranking.defs ++ ops.Audit.defs ++ ops.Causal.defs ++
        ops.Meta.defs ++ ops.Mixture.defs
    // a duplicate name would silently drop an implementation in the
    // Map build below — fail loudly instead
    val dups = defs.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Joins.starJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Total by construction — QueryDef.oracle
    * is a required field, so queries.keySet == oracleSql.keySet. */
  def oracleSql: Map[String, String] =
    allDefs.map(q => q.name -> q.oracle).toMap
}
