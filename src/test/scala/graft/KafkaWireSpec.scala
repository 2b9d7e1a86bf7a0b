package graft

import graft.streaming.KafkaSource
import org.apache.spark.sql.functions._

/** The literal Kafka wire protocol — the ONE `s_source_kafka` surface
  * this box cannot exercise (SURVEY §0.3: no `spark-sql-kafka-0-10`
  * jar, no broker, zero egress). This spec makes the gap SELF-CLOSING:
  * it `assume()`-cancels cleanly unless BOTH the connector jar and a
  * broker address are present, and the day the environment appears it
  * runs the ledger resume/clamp contract against the real source with
  * zero code changes. Everything it asserts is already property-tested
  * broker-free in LedgerSpec and engine-tested via `graft-docs` in
  * SourcesSpec — this adds only the wire.
  *
  * To enable: put the spark-sql-kafka-0-10 jar (+ kafka-clients) on
  * the test classpath and set GRAFT_KAFKA_BOOTSTRAP=host:port.
  */
class KafkaWireSpec extends SparkSpec {

  /** Broker address, if the operator provided one. */
  private val bootstrap: Option[String] = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")

  /** Connector present? Resolved by class, not jar-path convention, so
    * any way of supplying it (jars dir, --packages, test classpath)
    * counts. */
  private val connectorPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: Throwable => false }

  private def gate(): Unit = {
    assume(connectorPresent,
      "spark-sql-kafka-0-10 connector not on the classpath — to activate, set " +
        "SPARK_KAFKA_JARS=<dir with spark-sql-kafka-0-10 + kafka-clients jars> " +
        "(build.sbt adds it to the classpath) and GRAFT_KAFKA_BOOTSTRAP=host:port, " +
        "then re-run; recipe documented in BASELINE.md (design-only per SURVEY §0.3)")
    assume(bootstrap.isDefined,
      "GRAFT_KAFKA_BOOTSTRAP not set — no broker to test against; set " +
        "GRAFT_KAFKA_BOOTSTRAP=host:port (and SPARK_KAFKA_JARS if the connector " +
        "jar is not already on the classpath) to run the wire test")
  }

  test("kafka wire: batch write then offset-positioned streaming read honors the ledger resume JSON") {
    gate()
    import spark.implicits._
    val broker = bootstrap.get
    // unique topic per run — auto-created by the broker (or pre-create
    // if auto.create.topics.enable=false)
    val topic = s"graft_wire_${System.nanoTime()}"
    // 10 records into partition 0 via the batch Kafka sink
    (0L until 10L).toDF("event_id")
      .select(lit(null).cast("string").as("key"),
        to_json(struct(col("event_id"), lit("click").as("event_type"))).as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", broker)
      .option("topic", topic)
      .save()
    // the ledger says "resume at offset 4 of partition 0"; broker range
    // is [0, 10) — clamp must be a no-op and the report empty
    val (resume, report) = KafkaSource.clampToRange(
      stored = Map(0 -> 4L), earliest = Map(0 -> 0L), latest = Map(0 -> 10L))
    assert(report.isEmpty, s"in-range resume must not be adjusted: $report")
    val startJson = KafkaSource.startingOffsetsJson(topic, resume)
    // round-trip through the parser the ledger resume path uses
    assert(KafkaSource.parseStartingOffsetsJson(startJson) === Map(topic -> Map(0 -> 4L)))
    val out = tempDir("kafka_wire_out")
    val q = KafkaSource.parseEv(
        KafkaSource.reader(spark, broker, topic, startJson))
      .writeStream.format("memory").queryName("kafka_wire")
      .option("checkpointLocation", tempDir("kafka_wire_ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000L)
    val got = spark.table("kafka_wire").select("event_id").as[Long].collect().sorted
    // offsets 4..9 only: the stream started AT the ledger position,
    // not at earliest — the exact property the reference pattern's
    // fromOffsets resume guarantees
    assert(got === (4L until 10L).toArray, s"resume-positioned read returned ${got.toSeq}")
    assert(out.nonEmpty) // silence unused warning; dir reserved for debug dumps
  }

  test("kafka wire: out-of-range stored offset clamps loudly and the stream still starts") {
    gate()
    import spark.implicits._
    val broker = bootstrap.get
    val topic = s"graft_wire_oor_${System.nanoTime()}"
    (0L until 5L).toDF("event_id")
      .select(lit(null).cast("string").as("key"),
        to_json(struct(col("event_id"), lit("view").as("event_type"))).as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", broker)
      .option("topic", topic)
      .save()
    // stored offset beyond latest — the topic-recreated/truncated case;
    // clamp resets to latest and REPORTS it
    val (resume, report) = KafkaSource.clampToRange(
      stored = Map(0 -> 99L), earliest = Map(0 -> 0L), latest = Map(0 -> 5L))
    assert(resume === Map(0 -> 5L))
    assert(report.exists(_.contains("stored 99 > latest 5")), report.mkString("; "))
    val q = KafkaSource.parseEv(
        KafkaSource.reader(spark, broker, topic,
          KafkaSource.startingOffsetsJson(topic, resume)))
      .writeStream.format("memory").queryName("kafka_wire_oor")
      .option("checkpointLocation", tempDir("kafka_wire_oor_ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000L)
    // positioned at latest → nothing to read, and no failure: the
    // clamped resume is safe even when it implies "all caught up"
    assert(spark.table("kafka_wire_oor").isEmpty)
  }
}
