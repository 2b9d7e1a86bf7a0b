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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"STAGE $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); a
    }
    for (sf <- Seq("sf0.1", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val truth = t("brute") { graft.ops.Similarity.bruteTop5(spark, d)
        .select("probe_id", "cand_id").count() }
      val e = graft.Tables.load(spark, d, "embeddings")
        .withColumn("de",
          org.apache.spark.sql.functions.expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .select("vec_id", "de")
      val pq = t("pq-build") { graft.ops.Similarity.pqReconstructed(e, codes = 64).count() }
      val approx = t("ivfpq-full") { graft.ops.Similarity.ivfpqKnn(spark, d).count() }
      val full = t("audit-full") { graft.ops.Similarity.recallAudit(spark, d,
        graft.ops.Similarity.ivfpqKnn(spark, d), 0.5).count() }
      println(s"rows: $truth $pq $approx $full")
    }
    spark.stop()
  }
}
