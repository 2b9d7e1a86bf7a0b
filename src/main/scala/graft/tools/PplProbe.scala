package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (temporary, r18 optimization): phase timings inside
  * q_ppl_bucket — in-row trigram fold vs LM agg vs scoring join. */
object PplProbe {
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
        .filter(length(col("text")) >= 3)
      t("docs-count") { docs.count() }
      val tris = docs.select(col("doc_id"), col("lang"),
        expr("array_sort(transform(sequence(1, length(text) - 2)," +
          " i -> substring(text, i, 3)))").as("tris"))
      t("tris-sort-noop") {
        tris.write.format("noop").mode("overwrite").save()
      }
      val trisRaw = docs.select(col("doc_id"), col("lang"),
        expr("transform(sequence(1, length(text) - 2)," +
          " i -> substring(text, i, 3))").as("tris"))
      t("tris-raw-noop") {
        trisRaw.write.format("noop").mode("overwrite").save()
      }
      val g = tris
        .withColumn("nt", size(col("tris")))
        .withColumn("starts", expr(
          "filter(sequence(0, nt - 1), i -> i = 0 OR tris[i] <> get(tris, i - 1))"))
        .select(col("doc_id"), col("lang"), explode(expr(
          """transform(starts, (st, j) ->
            |  struct(get(tris, st) AS tri,
            |         CAST(coalesce(get(starts, j + 1), nt) - st AS BIGINT) AS tf))"""
            .stripMargin)).as("p"))
        .select(col("doc_id"), col("lang"), col("p.tri").as("tri"), col("p.tf").as("tf"))
      t("g-noop") { g.write.format("noop").mode("overwrite").save() }
      val gs = t("g-snapshot") { graft.Q.snapshot(g) }
      val lm = gs.groupBy("lang", "tri").agg(sum("tf").as("c"))
      val tot = lm.groupBy("lang").agg(sum("c").as("t"))
      val term = lm.join(broadcast(tot), "lang")
        .select(col("lang"), col("tri"),
          floor(log(col("c").cast("double") / col("t")) * 1e9 + 0.5)
            .cast("long").as("t9"))
      t("term-noop") { term.write.format("noop").mode("overwrite").save() }
      t("sizedBroadcast") { graft.Q.sizedBroadcast(term, 4000000L).count() }
      t("fullquery") {
        graft.SparkEntry.queries("q_ppl_bucket")(spark, d).count()
      }
    }
    spark.stop()
  }
}
