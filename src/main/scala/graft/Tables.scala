package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-pinned loaders for the driver-generated test tables.
  *
  * Schemas are declared explicitly (never inferred) — ground truth is
  * FIXTURES.md, extracted with pyarrow from /root/testdata/sf0.001.
  *
  * At 100 TB these tables would be date/key-partitioned parquet
  * directories; the loaders deliberately keep the read path a plain
  * `spark.read.schema(...).parquet(path)` so Spark's vectorized reader,
  * predicate pushdown, column pruning and (on partitioned layouts)
  * partition pruning all apply unchanged.
  */
object Tables {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** events.ts is parquet TIMESTAMP(NANOS); Spark's TimestampType is
    * microseconds, so the raw column is read as nanos-since-epoch
    * (LongType, via spark.sql.legacy.parquet.nanosAsLong) and truncated
    * to a proper TimestampType in [[events]].
    */
  val eventsRaw: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos since epoch, see events()
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> eventsRaw,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Plain pinned-schema parquet read; vectorized scan + pushdown apply. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.schema(schemas(name)).parquet(s"$dir/$name.parquet")

  /** Required session setting for reading a TIMESTAMP(NANOS) events file
    * (which Spark's µs TimestampType cannot represent): read nanos as a
    * raw LongType. Set at session construction in Verify/Bench/Smoke and
    * the test harness; harmless when the file is already µs.
    */
  val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** events.ts pinned as a plain µs TimestampType — the encoding the
    * round-10 driver regeneration writes (earlier rounds wrote
    * TIMESTAMP(NANOS); see [[events]]). */
  private val eventsMicros: StructType = StructType(
    eventsRaw.fields.map(f =>
      if (f.name == "ts") StructField("ts", TimestampType) else f))

  /** (dir, file mtime, file size) → "the events file stores ts as a
    * nanos int64" (vs plain µs). Sniffed from the parquet footer — a
    * driver-side metadata read, no data scan — and cached. The mtime +
    * size in the key invalidate the verdict if events.parquet is
    * regenerated IN PLACE with the other encoding while a session is
    * alive (a long-lived test JVM across a testdata refresh): a stale
    * dir-only verdict would silently apply the wrong unit conversion —
    * exactly the 1970-collapse failure the sniff exists to prevent. */
  private val eventsTsIsNanos =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), java.lang.Boolean]()

  private def eventsCacheKey(dir: String): (String, Long, Long) = {
    // events.parquet may be a single file or a directory of part files;
    // fold every part's (mtime, size) so any in-place rewrite changes
    // the key. Missing files key as (0, 0) and fail in the read below.
    val root = new java.io.File(s"$dir/events.parquet")
    val files: Seq[java.io.File] =
      if (root.isDirectory)
        Option(root.listFiles()).map(_.toSeq.sortBy(_.getName)).getOrElse(Seq.empty)
      else Seq(root)
    val (m, s) = files.foldLeft((0L, 0L)) { case ((am, as), f) =>
      (am ^ java.lang.Long.rotateLeft(f.lastModified(), 17), as + f.length()) }
    (dir, m, s)
  }

  /** events with ts as TimestampType, whichever encoding the file has.
    *
    * The driver's generator has written BOTH encodings across rounds:
    * TIMESTAMP(NANOS) through round 9 (unreadable as Spark TimestampType
    * — read as a raw long via [[NanosAsLongKey]] and integer-divided to
    * µs; a double round-trip would lose bits above 2^53) and plain
    * TIMESTAMP(MICROS) from the round-10 regeneration (read directly).
    * Applying the nanos path to a µs file would silently divide real
    * microseconds by 1000 and collapse Jan 2024 into a 43-minute sliver
    * of 1970 — so the unit is sniffed from the footer, never assumed.
    * With the session pinned to UTC the naive µs values match what
    * DuckDB's reader sees, same as orders/lineitem timestamps.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.getOption(NanosAsLongKey).forall(_ != "true"))
      spark.conf.set(NanosAsLongKey, "true")
    val isNanos = eventsTsIsNanos.computeIfAbsent(eventsCacheKey(dir), _ =>
      // with nanosAsLong set, a NANOS column infers as LongType; a µs
      // column infers as a timestamp type (TZ or NTZ) — never LongType
      spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == LongType)
    if (isNanos)
      load(spark, dir, "events")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      spark.read.schema(eventsMicros).parquet(s"$dir/events.parquet")
  }
}
