package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does session_window(gap=30min) merge two events exactly
  * 1800 s apart? (half-open [start, last+gap) ⇒ expect split). */
object GapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (gap <- Seq(1799L, 1800L, 1801L)) {
      val df = Seq((1L, 600000L), (1L, 600000L + gap)).toDF("user_id", "es")
        .withColumn("ts", timestamp_seconds(col("es")))
      val n = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .count().count()
      println(s"GAP=$gap SESSIONS=$n")
    }
    spark.stop()
  }
}
