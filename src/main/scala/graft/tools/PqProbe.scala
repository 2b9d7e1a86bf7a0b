package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (temporary): measured recall@5 of the IVFPQ path vs the
  * brute-force exact top-5, per scale factor — the number the
  * recall-band floor is calibrated against. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(graft.Tables.NanosAsLongKey, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val truth = graft.ops.Similarity.bruteTop5(spark, d)
        .select("probe_id", "cand_id")
      val approx = graft.ops.Similarity.ivfpqKnn(spark, d)
        .select("probe_id", "cand_id")
      val hits = truth.join(approx, Seq("probe_id", "cand_id")).count()
      val n = truth.count()
      println(f"RECALL $sf: $hits/$n = ${hits.toDouble / n}%.3f")
    }
    spark.stop()
  }
}
