package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Joins (SURVEY §2.3, batch side).
  *
  * Scale notes (the point of each variant):
  *  - broadcast() hints are pinned ONLY on fixed-cardinality dims
  *    (region: 5 rows, nation: 25 rows — constant at every scale
  *    factor). Tables that grow with the scale factor (part, customer)
  *    are left unhinted: AQE's runtime size check picks broadcast when
  *    the build side fits and falls back to shuffle when it doesn't,
  *    which is the only safe policy at 100 TB;
  *  - large-large joins shuffle on their equi-keys (sort-merge) and are
  *    spillable; AQE may switch to shuffled-hash at runtime — both fine;
  *  - the theta/band join keeps an equi-key (user_id) in the condition so
  *    Spark plans SMJ-with-residual, NOT a nested-loop cross product;
  *  - the as-of join is the union-tag + running-last trick: one shuffle by
  *    user_id, no per-row subquery, linear in input size.
  */
object Joins {

  def defs: Seq[QueryDef] = Seq(

    // Broadcast hash join: fact ⋈ dim. part grows with the scale factor,
    // so the broadcast decision is left to AQE (runtime size check)
    // instead of a pinned hint that would OOM at 100 TB.
    Q("q_join_bhj",
      """SELECT p_brand,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       floor((sum(l_extendedprice * (1 - l_discount)))*100+0.5)/100 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .join(Tables.load(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_items"),
          Q.r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy("p_brand")
    },

    // Large-large sort-merge join (hinted so the plan is stable even when
    // AQE would broadcast at toy scale).
    Q("q_join_smj",
      """SELECT o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       floor((sum(l_quantity))*100+0.5)/100 AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .join(Tables.load(s, d, "orders").hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), Q.r2(sum(col("l_quantity"))).as("sum_qty"))
        .orderBy("o_orderpriority")
    },

    // Star join (TPC-H Q5 shape): region → nation → customer → orders →
    // lineitem, dims broadcast, fact tables shuffle once on their keys.
    Q("q_join_multiway",
      """SELECT n_name,
        |       floor((sum(l_extendedprice * (1 - l_discount)))*100+0.5)/100 AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM region
        |JOIN nation   ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders   ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin) { (s, d) =>
      starJoin(s, d)
    },

    // Left outer with a genuinely null-producing right side (customers
    // without any 'P'-status order).
    Q("q_join_left",
      """SELECT c_custkey,
        |       CAST(count(o.o_orderkey) AS BIGINT) AS n_pending,
        |       count(o.o_orderkey) = 0 AS has_none
        |FROM customer c
        |LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
        |  ON o.o_custkey = c.c_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer")
      val p = Tables.load(s, d, "orders").filter(col("o_orderstatus") === "P")
      c.join(p, col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_pending"),
          (count(col("o_orderkey")) === 0).as("has_none"))
        .orderBy("c_custkey")
    },

    // Full outer: per-user purchase counts vs error counts; both sides can
    // be missing.
    Q("q_join_full",
      """SELECT coalesce(p.user_id, e.user_id) AS user_id,
        |       CAST(coalesce(p.n, 0) AS BIGINT) AS n_purchases,
        |       CAST(coalesce(e.n, 0) AS BIGINT) AS n_errors
        |FROM      (SELECT user_id, count(*) AS n FROM events WHERE event_type = 'purchase' GROUP BY user_id) p
        |FULL JOIN (SELECT user_id, count(*) AS n FROM events WHERE event_type = 'error'    GROUP BY user_id) e
        |  ON p.user_id = e.user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase").groupBy("user_id").agg(count(lit(1)).as("n"))
      val e = ev.filter(col("event_type") === "error").groupBy("user_id").agg(count(lit(1)).as("n"))
      p.as("p").join(e.as("e"), col("p.user_id") === col("e.user_id"), "full")
        .select(
          coalesce(col("p.user_id"), col("e.user_id")).as("user_id"),
          coalesce(col("p.n"), lit(0L)).as("n_purchases"),
          coalesce(col("e.n"), lit(0L)).as("n_errors"))
        .orderBy("user_id")
    },

    // Semi join = EXISTS: customers having at least one big order.
    Q("q_join_semi",
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders").filter(col("o_totalprice") > 100000.0)
      c.join(o, col("o_custkey") === col("c_custkey"), "left_semi")
        .select("c_custkey").orderBy("c_custkey")
    },

    // Anti join = NOT EXISTS: customers with no 'P'-status order.
    Q("q_join_anti",
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders").filter(col("o_orderstatus") === "P")
      c.join(o, col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    },

    // Band (theta) join: event pairs for the same user within 60 s.
    // user_id alone is NOT a sufficient equi-key at scale: its domain is
    // fixed (15 values), so an SMJ keyed on it buffers N/15 rows per key
    // and applies the ±60 s residual to that group's cartesian — O((N/15)²)
    // work that grows quadratically with data. The scalable blocking is a
    // TIME BUCKET: join on (user_id, es div 60). |a.es-b.es| ≤ 60 implies
    // the bucket indices differ by at most 1 (bucket width == band width),
    // so exploding ONE side to {bkt-1, bkt, bkt+1} makes every qualifying
    // pair match on exactly one bucket copy — no post-join dedup, and the
    // per-key group size is bounded by the per-minute event rate, not by
    // corpus size. The oracle keeps the declarative all-pairs form (DuckDB
    // at sf0.01 is small); semantics are identical.
    Q("q_join_theta",
      """WITH e AS (SELECT user_id, event_id,
        |                  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es
        |           FROM events)
        |SELECT a.user_id AS user_id, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id
        | AND a.event_id < b.event_id
        | AND abs(a.es - b.es) <= 60
        |GROUP BY a.user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), Q.epochSec(col("ts")).as("es"))
        .withColumn("bkt", expr("es div 60"))
      // left side replicated to its own and both adjacent buckets; each
      // qualifying pair matches exactly one copy (bucket deltas are a
      // partition of the ±60 s band), so the count needs no distinct.
      val a = e.select(col("user_id"), col("event_id"), col("es"),
          explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("jbkt"))
        .as("a")
      val b = e.withColumnRenamed("bkt", "jbkt").as("b")
      a.join(b,
          col("a.user_id") === col("b.user_id") &&
          col("a.jbkt") === col("b.jbkt") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("a.es") - col("b.es")) <= 60)
        .groupBy(col("a.user_id").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },

    // Range join against an interval dimension: each lineitem lands in the
    // quantity band [band_id·2, band_id·2+2). The dim derives from nation —
    // fixed 25 rows at every scale factor — so the right plan is a pinned
    // broadcast with the range residual evaluated stream-side
    // (BroadcastNestedLoopJoin over a constant-size build: linear in the
    // fact table, zero shuffle before the final 25-group aggregate). A
    // growing interval dim would instead bucket both sides on
    // floor(value/width) like q_join_theta does with time.
    Q("q_join_range",
      """SELECT n_nationkey AS band_id,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       floor((sum(l_extendedprice * (1 - l_discount)))*100+0.5)/100 AS revenue
        |FROM lineitem JOIN nation
        |  ON l_quantity >= n_nationkey * 2.0 AND l_quantity < n_nationkey * 2.0 + 2.0
        |GROUP BY band_id
        |ORDER BY band_id""".stripMargin) { (s, d) =>
      val bands = Tables.load(s, d, "nation")
        .select(col("n_nationkey").as("band_id"),
          (col("n_nationkey") * 2.0).as("lo"),
          (col("n_nationkey") * 2.0 + 2.0).as("hi"))
      Tables.load(s, d, "lineitem")
        .join(broadcast(bands), col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy("band_id")
        .agg(
          count(lit(1)).as("n_items"),
          Q.r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy("band_id")
    },

    // The same range join through the library's custom planner path:
    // interval_match(v, lo, hi) is a plain codegen'd predicate, and
    // graft.plans.RangeJoinStrategy (injected via SparkSessionExtensions)
    // plans the join as BroadcastRangeJoinExec — build intervals sorted
    // once, probes binary-search instead of the nested-loop's scan-all.
    // O(log n) vs O(n) per row only matters when the interval dim is
    // large (IP→geo, price tiers), but the plan shape is asserted here
    // at 25 rows so the operator is regression-pinned. Same oracle
    // semantics as q_join_range; results must match it exactly
    // (TwinAndPropertySpec).
    Q("q_join_range_native",
      """SELECT n_nationkey AS band_id,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       floor((sum(l_extendedprice * (1 - l_discount)))*100+0.5)/100 AS revenue
        |FROM lineitem JOIN nation
        |  ON l_quantity >= n_nationkey * 2.0 AND l_quantity < n_nationkey * 2.0 + 2.0
        |GROUP BY band_id
        |ORDER BY band_id""".stripMargin) { (s, d) =>
      val bands = Tables.load(s, d, "nation")
        .select(col("n_nationkey").as("band_id"),
          (col("n_nationkey") * 2.0).as("lo"),
          (col("n_nationkey") * 2.0 + 2.0).as("hi"))
      Tables.load(s, d, "lineitem")
        .join(bands, call_function("interval_match", col("l_quantity"), col("lo"), col("hi")))
        .groupBy("band_id")
        .agg(
          count(lit(1)).as("n_items"),
          Q.r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .orderBy("band_id")
    },

    // As-of join: each purchase gets the user's latest strictly-prior view
    // timestamp. Implemented the scalable way: union-tag + running
    // last(ignoreNulls) over one user_id shuffle (no per-row subquery).
    // The oracle states the same semantics as a correlated max.
    Q("q_join_asof",
      """SELECT e.event_id, e.user_id,
        |       (SELECT CAST(max(epoch(date_trunc('second', v.ts))) AS BIGINT)
        |        FROM events v
        |        WHERE v.user_id = e.user_id AND v.event_type = 'view'
        |          AND epoch(date_trunc('second', v.ts)) < epoch(date_trunc('second', e.ts))
        |       ) AS prior_view_es
        |FROM events e
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), Q.epochSec(col("ts")).as("es"))
      // rangeBetween(-inf, -1) over integer seconds == strictly-prior rows
      // (ties at the same second are excluded on both sides).
      val w = Window.partitionBy("user_id").orderBy("es")
        .rangeBetween(Window.unboundedPreceding, -1)
      e.withColumn("view_es", when(col("event_type") === "view", col("es")))
        .withColumn("prior_view_es", max(col("view_es")).over(w))
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "prior_view_es")
        .orderBy("event_id")
    },

    // Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match
    // each other instead of vanishing — the semantics SQL equality
    // cannot express without a COALESCE hack. Spark still plans a hash
    // join (null-safe key wrapping), and the 3-row dim side broadcasts,
    // so the fact table is never shuffled. Orders with status 'P' are
    // nulled to exercise the NULL↔NULL match path.
    Q("q_join_nullsafe",
      """WITH o AS (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS s FROM orders),
        |dim AS (SELECT 'F' AS s, 'final' AS verdict
        |        UNION ALL SELECT 'O', 'open'
        |        UNION ALL SELECT NULL, 'pending')
        |SELECT dim.verdict, count(*) AS n, CAST(min(o.o_orderkey) AS BIGINT) AS first_key
        |FROM o JOIN dim ON o.s IS NOT DISTINCT FROM dim.s
        |GROUP BY 1
        |ORDER BY verdict""".stripMargin) { (s, d) =>
      import s.implicits._
      val o = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("P")).as("s"))
      val dim = Seq(Some("F") -> "final", Some("O") -> "open", (None: Option[String]) -> "pending")
        .toDF("s", "verdict")
      o.join(broadcast(dim), o("s") <=> dim("s"))
        .groupBy("verdict")
        .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("first_key"))
        .orderBy("verdict")
    },

    // Bucketed co-located join: both sides pre-bucketed (8 buckets) on
    // the join key, so the sort-merge join consumes the bucketed scan's
    // hash partitioning directly — ZERO exchange under the join
    // (asserted in PlanAuditSpec). This is the 100 TB pattern for a
    // fact⋈fact join that recurs on the same key: pay the shuffle once
    // at write time, then every downstream join of the two tables is
    // shuffle-free. The merge hint pins SMJ so the toy-scale build side
    // doesn't get broadcast and defeat the demonstration; at production
    // scale neither side would fit a broadcast anyway.
    Q("q_join_bucketed",
      """SELECT o.o_orderpriority,
        |       count(*) AS n_orders,
        |       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_custs,
        |       floor((sum(o.o_totalprice))*100+0.5)/100 AS sum_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_acctbal > 0
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val (ot, ct) = ensureBucketed(s, d)
      val o = s.table(ot)
      val c = s.table(ct).filter(col("c_acctbal") > 0)
      o.join(c.hint("merge"), o("o_custkey") === c("c_custkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_custs"),
          Q.r2(sum(col("o_totalprice"))).as("sum_price"))
        .orderBy("o_orderpriority")
    },

    // LATERAL (correlated table-subquery) join (round 17): per nation,
    // the top-2 customers by cents balance through Spark 4's
    // Dataset.lateralJoin with an .outer() correlated reference — the
    // remaining subquery face beside q_exists_subquery (predicate) and
    // q_scalar_subquery (scalar). Catalyst DECORRELATES the per-row
    // limit into a window-over-join plan (DecorrelateInnerQuery), so
    // the executed shape is one nation-keyed exchange + rank filter —
    // never a per-nation re-scan of customer, which is what makes the
    // lateral surface safe at 100 TB. Balance is exact cents; ties
    // break on c_custkey in both engines.
    Q("q_join_lateral",
      """SELECT n.n_name, c.c_custkey, c.bal
        |FROM nation n,
        |     LATERAL (SELECT c_custkey,
        |                     CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal
        |              FROM customer
        |              WHERE c_nationkey = n.n_nationkey
        |              ORDER BY bal DESC, c_custkey
        |              LIMIT 2) c
        |ORDER BY n.n_name, c.bal DESC, c.c_custkey""".stripMargin) { (s, d) =>
      val n = Tables.load(s, d, "nation").select(col("n_nationkey"), col("n_name"))
      val c = Tables.load(s, d, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal"))
      n.lateralJoin(
          c.where(col("c_nationkey") === col("n_nationkey").outer())
            .orderBy(col("bal").desc, col("c_custkey"))
            .limit(2))
        .select(col("n_name"), col("c_custkey"), col("bal"))
        .orderBy(col("n_name"), col("bal").desc, col("c_custkey"))
    }
  )

  /** Writes orders/customer as bucketed managed tables (8 buckets on the
    * join key, one file per bucket via repartition) once per
    * session × scale factor; later calls reuse the catalog entry. The
    * bucket count is the knob a real deployment sizes to cluster width —
    * 8 keeps toy-scale file counts sane while exercising the identical
    * plan shape. */
  def ensureBucketed(s: SparkSession, d: String): (String, String) = {
    val tag = d.split('/').filter(_.nonEmpty).last.replaceAll("[^A-Za-z0-9]", "_")
    val names = Seq(
      ("orders", s"graft_bkt_orders_$tag", "o_custkey"),
      ("customer", s"graft_bkt_customer_$tag", "c_custkey"))
    names.foreach { case (src, tbl, key) =>
      if (!s.catalog.tableExists(tbl)) {
        // a previous session's managed-table directory survives the
        // (in-memory) catalog — saveAsTable refuses to reuse the
        // location even in overwrite mode, so clear the orphan first
        val warehouse = new java.net.URI(s.conf.get("spark.sql.warehouse.dir"))
        val loc = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(warehouse), tbl)
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        Tables.load(s, d, src)
          .repartition(8, col(key))
          .write.bucketBy(8, key).sortBy(key)
          .mode("overwrite").saveAsTable(tbl)
      }
    }
    (names(0)._2, names(1)._2)
  }

  /** Flagship star join — also SparkEntry.entry.
    *
    * broadcast() pinned only on region/nation (fixed 5/25 rows at any
    * scale); customer grows with SF, so its join is unhinted and AQE
    * chooses broadcast vs shuffle from runtime sizes.
    */
  def starJoin(s: SparkSession, d: String): DataFrame = {
    val region = Tables.load(s, d, "region").filter(col("r_name") === "ASIA")
    val nation = Tables.load(s, d, "nation")
    val customer = Tables.load(s, d, "customer")
    val orders = Tables.load(s, d, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
    val lineitem = Tables.load(s, d, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(
        Q.r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }
}
