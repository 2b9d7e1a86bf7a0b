package graft

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet (SURVEY §2.1): CSV and
  * JSON-lines roundtrips with explicit schemas (inference is never
  * relied on), and a JSON read of the offset ledger's format. */
class SourcesSpec extends SparkSpec {

  test("csv roundtrip with explicit schema preserves lineitem") {
    val dir = tempDir("graft_csv")
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema("l_orderkey LONG, l_linenumber INT, l_quantity DOUBLE, l_returnflag STRING")
      .option("header", "true").csv(dir)
    assert(back.count() === li.count())
    assert(back.except(li).isEmpty && li.except(back).isEmpty)
  }

  test("json-lines roundtrip with explicit schema preserves events payload columns") {
    val dir = tempDir("graft_json")
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("props"),
        Q.epochSec(col("ts")).as("es"))
    ev.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema("event_id LONG, user_id LONG, event_type STRING, props STRING, es LONG")
      .json(dir)
    assert(back.except(ev).isEmpty && ev.except(back).isEmpty)
    // nested JSON string survives the roundtrip and still parses
    val k = back.select(get_json_object(col("props"), "$.k").cast("long").as("k"))
    assert(k.filter(col("k").isNull).isEmpty)
  }
}
