package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints a query's FINAL adaptive plan — after collect(), so AQE's
  * runtime decisions (stage reuse, broadcast demotion, skew splits) are
  * visible. PlanProbe shows the static plan; exchange reuse and
  * join-strategy switches only materialize here.
  *
  * Usage: sbt "runMain graft.tools.FinalPlan <name> [sfDir]"
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_join_bhj")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.Tables.NanosAsLongKey, "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect() // finalize this exact QueryExecution's adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    println(s"SCANS=${plan.linesIterator.count(_.contains("Scan parquet"))}")
    println(s"REUSED=${plan.linesIterator.count(l =>
      l.contains("ReusedExchange") || l.contains("(reused)"))}")
    println(plan)
    spark.stop()
  }
}
