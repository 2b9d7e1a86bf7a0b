package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** r19 optimization evidence: writes plans/r19/<query>_<tag>.txt with
  * the .explain("formatted") output (and the AQE-final plan appended)
  * for each named query, under the bench session config.
  * Usage: runMain graft.tools.R19Plan <tag> <q1,q2,...> [sfDir]
  */
object R19Plan {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names = args.lift(1).map(_.split(',').toSeq)
      .getOrElse(Seq("q_knn_ivfpq"))
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.Tables.NanosAsLongKey, "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r19"))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.collect() // finalize this QueryExecution's adaptive plan
      val finalPlan = df.queryExecution.executedPlan.toString
      // Q.snapshot truncates lineage onto LogicalRDD leaves; resolve each
      // leaf through the snapshot-origin registry (recursively) so the
      // evidence shows the WHOLE query, not just the post-snapshot tail.
      def originDump(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                     depth: Int): String = {
        if (depth > 6) return ""
        val leaves = plan.collect {
          case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
        }
        leaves.flatMap { id =>
          graft.Q.snapshotOrigin(id).map { origin =>
            s"\n--- snapshot origin (rdd $id) optimized plan ---\n" +
              origin.toString + originDump(origin, depth + 1)
          }
        }.mkString
      }
      val origins = originDump(df.queryExecution.optimizedPlan, 0)
      val body =
        s"== ${name} ($tag, $sfDir) ==\n\n--- explain formatted ---\n" +
          formatted + "\n--- AQE-final executed plan ---\n" + finalPlan +
          origins + "\n"
      Files.write(Paths.get(s"plans/r19/${name}_$tag.txt"),
        body.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      println(s"WROTE plans/r19/${name}_$tag.txt")
    }
    spark.stop()
  }
}
