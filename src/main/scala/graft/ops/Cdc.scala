package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC MERGE / upsert (SURVEY §2 round-10 addition): fold a keyed
  * change feed into a base snapshot with latest-wins upsert and
  * tombstone-delete semantics — the batch generalization of a
  * store-then-commit ingestion loop, and the compaction step every
  * incremental table maintenance pipeline runs.
  *
  * Spark-first shape: NOT a full-outer join of base and delta (two
  * shuffles + a coalesce per column). Both sides union under a source
  * tag and ONE window over the merge key picks each key's winner —
  * a single exchange on the key carries the whole merge, the same
  * plan shape as q_dedup_latest, and at 100 TB the union input streams
  * through one hash partitioning with no join build side at all.
  * Delete handling is a filter on the winner, not an anti-join.
  */
object Cdc {

  /** Merge cutoff: rows strictly before this date form the base
    * snapshot; rows on/after are the change feed (same fixed split
    * date as q_drift_tvd — the events table spans January 2024). */
  private val CutoffDate = "2024-01-15"

  /** Latest-wins MERGE of a tagged change feed into a base snapshot.
    *
    * Inputs share the schema (user_id, event_type, event_id, es,
    * value); `delta` additionally carries `op` ('U' upsert / 'D'
    * delete). Output = the post-merge state: per (user_id, event_type)
    * key, the newest delta row if any (delta beats base even on
    * timestamp ties, via the src tag in the ordering), else the base
    * row — dropped entirely when the winning delta row is a delete.
    */
  def mergeUpsert(base: DataFrame, delta: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("src").desc, col("es").desc, col("event_id").desc)
    base.withColumn("src", lit(0)).withColumn("op", lit("U"))
      .unionByName(delta.withColumn("src", lit(1)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("op") === "U")
      .select("user_id", "event_type", "event_id", "es", "value")
  }

  def defs: Seq[QueryDef] = Seq(

    // The oracle mirrors the union-tag formulation exactly: base =
    // compacted pre-cutoff state (one key, one row), delta = post-
    // cutoff rows with value < 1.0 acting as tombstones, winner by
    // (src DESC, es DESC, event_id DESC). Deterministic: event_id
    // breaks every tie.
    Q("q_merge_upsert",
      s"""WITH e AS (SELECT user_id, event_type, event_id,
         |                  ${Q.sqlEpochSec("ts")} AS es, value
         |           FROM events),
         |b AS (SELECT user_id, event_type, event_id, es, value FROM (
         |        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
         |                                     ORDER BY es DESC, event_id DESC) AS rk
         |        FROM e WHERE es < ${Q.sqlEpochSec(s"TIMESTAMP '$CutoffDate'")})
         |      WHERE rk = 1),
         |d AS (SELECT user_id, event_type, event_id, es, value,
         |             CASE WHEN value < 1.0 THEN 'D' ELSE 'U' END AS op
         |      FROM e WHERE es >= ${Q.sqlEpochSec(s"TIMESTAMP '$CutoffDate'")}),
         |u AS (SELECT user_id, event_type, event_id, es, value, 0 AS src, 'U' AS op FROM b
         |      UNION ALL
         |      SELECT user_id, event_type, event_id, es, value, 1, op FROM d),
         |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
         |                                   ORDER BY src DESC, es DESC, event_id DESC) AS rk
         |      FROM u)
         |SELECT user_id, event_type, event_id, es, value
         |FROM r WHERE rk = 1 AND op = 'U'
         |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          Q.epochSec(col("ts")).as("es"), col("value"))
      val cutoff = Q.epochSec(to_timestamp(lit(CutoffDate)))
      val wb = Window.partitionBy("user_id", "event_type")
        .orderBy(col("es").desc, col("event_id").desc)
      val base = e.filter(col("es") < cutoff)
        .withColumn("rk", row_number().over(wb))
        .filter(col("rk") === 1).drop("rk")
      val delta = e.filter(col("es") >= cutoff)
        .withColumn("op", when(col("value") < 1.0, "D").otherwise("U"))
      mergeUpsert(base, delta).orderBy("user_id", "event_type")
    },

    // SCD type-2 history build (round 10): turn the event stream into a
    // versioned dimension — one row per VALUE CHANGE per key, with
    // [valid_from, valid_to) intervals, a version counter, and a
    // current-row flag. The warehouse twin of q_merge_upsert: merge
    // maintains the latest state, SCD2 maintains the full history.
    // Change detection is lag() null-safe compare (IS DISTINCT FROM, so
    // null values version correctly); all three windows share ONE
    // (user_id, event_type) exchange — the change filter is applied
    // between stacked windows on the same partitioning, no re-shuffle.
    Q("q_scd2",
      s"""WITH e AS (SELECT user_id, event_type, event_id,
         |                  ${Q.sqlEpochSec("ts")} AS es, value FROM events),
         |c AS (SELECT *, lag(value) OVER (PARTITION BY user_id, event_type
         |                                 ORDER BY es, event_id) AS pv,
         |             row_number() OVER (PARTITION BY user_id, event_type
         |                                ORDER BY es, event_id) AS rn
         |      FROM e),
         |ch AS (SELECT user_id, event_type, event_id, es, value
         |       FROM c WHERE rn = 1 OR value IS DISTINCT FROM pv),
         |v AS (SELECT user_id, event_type, event_id, value, es AS valid_from,
         |             lead(es) OVER (PARTITION BY user_id, event_type
         |                            ORDER BY es, event_id) AS valid_to,
         |             row_number() OVER (PARTITION BY user_id, event_type
         |                                ORDER BY es, event_id) AS version
         |      FROM ch)
         |SELECT user_id, event_type, event_id, value, valid_from, valid_to,
         |       CAST(version AS BIGINT) AS version,
         |       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
         |FROM v
         |ORDER BY user_id, event_type, version""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("es", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("event_id"),
          Q.epochSec(col("ts")).as("es"), col("value"))
        .withColumn("pv", lag("value", 1).over(w))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 || !(col("value") <=> col("pv")))
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("value"), col("es").as("valid_from"))
        .withColumn("valid_to", lead("valid_from", 1).over(
          Window.partitionBy("user_id", "event_type").orderBy("valid_from", "event_id")))
        .withColumn("version", row_number().over(
          Window.partitionBy("user_id", "event_type").orderBy("valid_from", "event_id"))
          .cast("long"))
        .withColumn("is_current",
          when(col("valid_to").isNull, 1L).otherwise(0L))
        .select("user_id", "event_type", "event_id", "value",
          "valid_from", "valid_to", "version", "is_current")
        .orderBy("user_id", "event_type", "version")
    },

    // Incremental view maintenance (round 10): the aggregate-state
    // counterpart of the row-level MERGE above. A materialized per-
    // priority rollup is maintained as PARTIAL STATES (count, sum,
    // min, max) — refreshing with a new delta batch merges states
    // (sum-of-sums, min-of-mins) instead of rescanning history. Spark
    // computes base-state and delta-state separately and merges them
    // through a union + second-level agg (exactly a combiner merge);
    // the ORACLE recomputes the rollup DIRECTLY from the full table —
    // the hash-match proves merge(state(base), state(delta)) ==
    // recompute(full), the invariant every IVM pipeline rests on.
    // At 100 TB the base state is |keys| rows kept from the previous
    // refresh — only the delta is ever scanned. Sums are r2-rounded
    // (merge order vs direct order differ in ulps); avg derives from
    // the merged sums, r4.
    Q("q_ivm_refresh",
      s"""SELECT o_orderpriority, count(*) AS n,
         |       ${Q.sqlR2("sum(o_totalprice)")} AS total,
         |       min(o_totalprice) AS vmin,
         |       max(o_totalprice) AS vmax,
         |       ${Q.sqlR4("sum(o_totalprice) / count(*)")} AS vavg
         |FROM orders
         |GROUP BY 1
         |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val orders = Tables.load(s, d, "orders")
        .select("o_orderpriority", "o_orderdate", "o_totalprice")
      def state(df: DataFrame): DataFrame = df
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"),
          min("o_totalprice").as("vmin"), max("o_totalprice").as("vmax"))
      val base = state(orders.filter(col("o_orderdate") < lit("2001-06-01").cast("date")))
      val delta = state(orders.filter(col("o_orderdate") >= lit("2001-06-01").cast("date")))
      base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(sum("n").as("n"), sum("s").as("s"),
          min("vmin").as("vmin"), max("vmax").as("vmax"))
        .select(col("o_orderpriority"), col("n"),
          Q.r2(col("s")).as("total"), col("vmin"), col("vmax"),
          Q.r4(col("s") / col("n")).as("vavg"))
        .orderBy("o_orderpriority")
    },

    // Snapshot diff (round 16): the table-to-table reconciliation a
    // lakehouse runs after every backfill/replication — classify each
    // primary key as unchanged / changed / deleted / inserted between
    // two snapshots and report the counts plus the changed-row rate.
    // The "new" snapshot derives from orders by DETERMINISTIC mutation
    // (the q_merge_upsert convention for synthesizing CDC inputs):
    // keys ≡ 0 (mod 97) are deleted, surviving keys ≡ 0 (mod 89) get
    // o_totalprice + 1.00, and keys ≡ 0 (mod 83) re-enter re-keyed
    // +10⁹ as inserts. Comparison is ONE keyed FULL OUTER join on the
    // PK with the value tuple compared as exact cents + status — pure
    // int64/string equality, no hash, no float. Scale: both sides
    // shuffle once on the PK; the readout is a single row.
    Q("q_snapshot_diff",
      s"""WITH oldv AS (SELECT o_orderkey AS k,
         |                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price,
         |                     o_orderstatus AS st
         |              FROM orders),
         |newv AS (SELECT k,
         |                CASE WHEN k % 89 = 0 THEN price + 100 ELSE price END AS price,
         |                st
         |         FROM oldv WHERE k % 97 <> 0
         |         UNION ALL
         |         SELECT k + 1000000000, price, st FROM oldv WHERE k % 83 = 0),
         |j AS (SELECT o.k AS ko, n.k AS kn,
         |             CASE WHEN o.k IS NULL THEN 'inserted'
         |                  WHEN n.k IS NULL THEN 'deleted'
         |                  WHEN o.price = n.price AND o.st = n.st THEN 'unchanged'
         |                  ELSE 'changed' END AS kind
         |      FROM oldv o FULL OUTER JOIN newv n ON o.k = n.k)
         |SELECT CAST(sum(CASE WHEN kind = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
         |       CAST(sum(CASE WHEN kind = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
         |       CAST(sum(CASE WHEN kind = 'deleted' THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
         |       CAST(sum(CASE WHEN kind = 'inserted' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
         |       ${Q.sqlR6("CAST(sum(CASE WHEN kind = 'changed' THEN 1 ELSE 0 END) AS DOUBLE) / sum(CASE WHEN kind IN ('unchanged','changed') THEN 1 ELSE 0 END)")} AS change_rate
         |FROM j""".stripMargin) { (s, d) =>
      val oldv = Tables.load(s, d, "orders")
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("price"),
          col("o_orderstatus").as("st"))
        .transform(Q.snapshot) // feeds both snapshot sides once
      val newv = oldv.filter(col("k") % 97 =!= 0)
        .select(col("k"),
          when(col("k") % 89 === 0, col("price") + 100).otherwise(col("price")).as("price"),
          col("st"))
        .unionAll(oldv.filter(col("k") % 83 === 0)
          .select((col("k") + 1000000000L).as("k"), col("price"), col("st")))
      val j = oldv.select(col("k").as("ko"), col("price").as("po"), col("st").as("so"))
        .join(newv.select(col("k").as("kn"), col("price").as("pn"), col("st").as("sn")),
          col("ko") === col("kn"), "full_outer")
        .select(when(col("ko").isNull, "inserted")
          .when(col("kn").isNull, "deleted")
          .when(col("po") === col("pn") && col("so") === col("sn"), "unchanged")
          .otherwise("changed").as("kind"))
      j.agg(
        sum(when(col("kind") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"),
        sum(when(col("kind") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("kind") === "deleted", 1L).otherwise(0L)).as("n_deleted"),
        sum(when(col("kind") === "inserted", 1L).otherwise(0L)).as("n_inserted"),
        Q.r6(sum(when(col("kind") === "changed", 1L).otherwise(0L)).cast("double") /
          sum(when(col("kind").isin("unchanged", "changed"), 1L).otherwise(0L)))
          .as("change_rate"))
    }
  )
}
