package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: run one query against a session that deliberately does NOT
  * pre-set the nanosAsLong conf (exercising Tables.events' fallback),
  * print its executed plan join/scan lines, or `.explain("formatted")`
  * with -f. Usage: runMain graft.tools.PlanProbe <queryName> [sfDir] [-f]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_join_bhj")
    val sfDir = args.drop(1).filterNot(_ == "-f").headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"ROWS=${df.count()}")
    if (args.contains("-f")) df.explain("formatted")
    else println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Scan") || l.contains("Exchange"))
      .mkString("\n"))
    spark.stop()
  }
}
