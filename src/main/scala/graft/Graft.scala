package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing facade: the one-call migration path for a user of the
  * reference engine. Registers the corpus as temp views (explicit,
  * documented catalog setup — unlike ad-hoc views inside operators) and
  * exposes plain Spark SQL over them, with graft's extensions
  * (cosine_sim, …) available when the session was built with
  * GraftExtensions.
  *
  * {{{
  * Graft.registerTables(spark, "/data/sf0.1")
  * val top = Graft.sql(spark,
  *   "SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1")
  * }}}
  */
object Graft {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every corpus table under its canonical name. `events` is
    * registered with its nanos→micros normalized `ts`. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case n => Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
