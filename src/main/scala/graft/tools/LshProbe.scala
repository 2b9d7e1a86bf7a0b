package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (temporary, r18): where do the MinHash/SimHash pair
  * builders spend — shingle md5, signature agg, band self-join? */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(graft.Tables.NanosAsLongKey, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(200000).selectExpr("id % 10 AS k", "id * 1.0 AS v")
      .groupBy("k").sum("v").count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"PHASE $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); a
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val docs = graft.Tables.load(spark, d, "documents")
      val words = docs.withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 3)
      t("words-noop") { words.select("doc_id", "lang", "words")
        .write.format("noop").mode("overwrite").save() }
      val sh = words.select(col("doc_id"), col("lang"),
        explode(expr(graft.ops.TextPipeline.ShingleArrayExpr)).as("shingle"))
      t("shingles-noop") { sh.write.format("noop").mode("overwrite").save() }
      val hx = sh.withColumn("h0", md5(col("shingle").cast("binary")))
      t("md5-noop") { hx.write.format("noop").mode("overwrite").save() }
      val mhAggs = (0 until 8).map { i =>
        min(substring(col("h0"), i * 4 + 1, 4)).as(s"mh$i") }
      val mh = hx.groupBy("doc_id", "lang").agg(mhAggs.head, mhAggs.tail: _*)
      t("sigs-noop") { mh.write.format("noop").mode("overwrite").save() }
      t("lshpairs") { graft.ops.TextPipeline.lshCandidatePairs(spark, d).count() }
      t("simhashpairs") { graft.ops.TextPipeline.simhashCandidatePairs(spark, d).count() }
      t("q_lsh_tuning") { graft.SparkEntry.queries("q_lsh_tuning")(spark, d).count() }
      t("q_dedup_keepers") { graft.SparkEntry.queries("q_dedup_keepers")(spark, d).count() }
    }
    spark.stop()
  }
}
