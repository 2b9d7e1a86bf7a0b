package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregations (SURVEY §2.4).
  *
  * All of these are partial+final HashAggregate in Spark: map-side combine
  * happens before the single shuffle on the group keys, so at 100 TB the
  * shuffled volume is #groups × #partitions, not #rows. Group counts here
  * are tiny-to-moderate (flags, priorities, users) — no skew concern.
  */
object Aggregates {

  def defs: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape: the canonical multi-aggregate scan.
    Q("q_agg_hash",
      """SELECT l_returnflag, l_linestatus,
        |       floor((sum(l_quantity))*100+0.5)/100 AS sum_qty,
        |       floor((sum(l_extendedprice))*100+0.5)/100 AS sum_base,
        |       floor((sum(l_extendedprice * (1 - l_discount)))*100+0.5)/100 AS sum_disc,
        |       floor((avg(l_quantity))*10000+0.5)/10000 AS avg_qty,
        |       floor((avg(l_extendedprice))*10000+0.5)/10000 AS avg_price,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-08-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("2001-08-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Q.r2(sum(col("l_quantity"))).as("sum_qty"),
          Q.r2(sum(col("l_extendedprice"))).as("sum_base"),
          Q.r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc"),
          Q.r4(avg(col("l_quantity"))).as("avg_qty"),
          Q.r4(avg(col("l_extendedprice"))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Exact multi-distinct (Catalyst rewrites via Expand).
    Q("q_agg_distinct",
      """SELECT l_returnflag,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_parts,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd_supps,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("nd_parts"),
          countDistinct(col("l_suppkey")).as("nd_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // HLL++ sketch — the scale path for distinct counting. The raw
    // estimate can't be oracled (DuckDB's HLL is a different sketch),
    // so the driver-checked form is the ERROR-BAND audit: compute the
    // sketch AND the exact count in one aggregate pass, emit the exact
    // value plus a within-band boolean, and let the oracle pin (exact,
    // TRUE) — a hash mismatch now means either the exact path or the
    // sketch's error bound broke. rsd=0.01 ⇒ 3σ ≈ 3%; the band is 4%
    // + 2 absolute so a testdata regeneration cannot flip it. At
    // 100 TB you run only the sketch; this is the certification query.
    Q("q_agg_approx_distinct",
      """SELECT event_type,
        |       count(DISTINCT user_id) AS nd_users,
        |       TRUE AS hll_ok
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
          count_distinct(col("user_id")).as("nd_users"))
        .select(col("event_type"), col("nd_users"),
          (abs(col("approx_users") - col("nd_users")) <=
            lit(2) + lit(0.04) * col("nd_users")).as("hll_ok"))
        .orderBy("event_type")
    },

    // Mergeable-sketch rollup — the canonical 100 TB distinct-count
    // shape: build one Datasketches HLL per day partition (parallel,
    // one pass), then UNION the day sketches into the global estimate.
    // Pre-aggregated sketches are what make "distinct users last N
    // days" answerable without re-touching N days of raw data; the
    // union is associative/commutative, so any partitioning works.
    // Register content is order-independent (max per register) ⇒
    // deterministic output. The raw estimates can't be oracled (DuckDB's
    // HLL is a different sketch), so the driver-checked form is the
    // ERROR-BAND audit (r11): the sketch path runs exactly as before
    // (daily hll_sketch_agg, hll_union_agg into the overall), an exact
    // ROLLUP(day) twin runs beside it, and each grain row emits the
    // exact count plus a within-band boolean the oracle pins as (exact,
    // TRUE). The band is 5% + 2 absolute (default lgK=12 ⇒ rsd ≈ 1.6%,
    // 3σ ≈ 5%). The join is grain-table-sized (≤ days+1 rows/side).
    Q("q_sketch_rollup",
      s"""WITH e AS (SELECT date_trunc('day', ts) AS day, user_id FROM events)
         |SELECT CASE WHEN GROUPING(day) = 1 THEN 'overall' ELSE 'daily' END AS grain,
         |       CASE WHEN GROUPING(day) = 1 THEN NULL
         |            ELSE ${Q.sqlEpochSec("day")} END AS day_es,
         |       count(DISTINCT user_id) AS n_users,
         |       TRUE AS hll_ok
         |FROM e
         |GROUP BY ROLLUP(day)
         |ORDER BY grain, day_es""".stripMargin) { (s, d) =>
      // one materialized ~|days|-row sketch table under both grains:
      // the daily branch and the overall union would otherwise each
      // re-run the events scan + per-day sketch build (trees, not
      // DAGs; the checkpoint job costs ~0.3 s fixed at toy scale and
      // replaces a full corpus re-scan at 100 TB)
      val daily = Tables.events(s, d)
        .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
        .groupBy("day")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .transform(Q.snapshot)
      val est = daily
        .select(lit("daily").as("grain"), unix_timestamp(col("day")).as("day_es"),
          hll_sketch_estimate(col("sk")).as("est_users"))
        .unionByName(daily
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
          .select(lit("overall").as("grain"), lit(null).cast("long").as("day_es"),
            col("est_users")))
      val exact = Tables.events(s, d)
        .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
        .rollup("day")
        .agg(count_distinct(col("user_id")).as("n_users"), grouping(col("day")).as("g"))
        .select(
          when(col("g") === 1, "overall").otherwise("daily").as("grain"),
          when(col("g") === 1, lit(null).cast("long"))
            .otherwise(unix_timestamp(col("day"))).as("day_es"),
          col("n_users"))
      exact.join(est,
          exact("grain") === est("grain") && exact("day_es") <=> est("day_es"))
        .select(exact("grain"), exact("day_es"), col("n_users"),
          (abs(col("est_users") - col("n_users")) <=
            lit(2) + lit(0.05) * col("n_users")).as("hll_ok"))
        .orderBy("grain", "day_es")
    },

    // Exact twin of q_sketch_rollup at the same grains — ROLLUP(day)
    // plans ONE Expand + two-phase distinct aggregation, so the daily
    // counts and the overall count come from a single scan instead of a
    // scan per grain. This is the oracled companion that pins the HLL
    // rollup's grains exactly (the sketch op stays rows-only because no
    // cross-engine HLL parity exists; its ESTIMATES are bounded against
    // THIS query's exact counts in TwinAndPropertySpec). At 100 TB you
    // run the sketch; this exact twin is the audit query you run on the
    // slice you need to certify.
    Q("q_distinct_rollup",
      s"""WITH e AS (SELECT date_trunc('day', ts) AS day, user_id FROM events)
         |SELECT CASE WHEN GROUPING(day) = 1 THEN 'overall' ELSE 'daily' END AS grain,
         |       CASE WHEN GROUPING(day) = 1 THEN NULL
         |            ELSE ${Q.sqlEpochSec("day")} END AS day_es,
         |       count(DISTINCT user_id) AS n_users
         |FROM e
         |GROUP BY ROLLUP(day)
         |ORDER BY grain, day_es""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
        .rollup("day")
        .agg(count_distinct(col("user_id")).as("n_users"), grouping(col("day")).as("g"))
        .select(
          when(col("g") === 1, "overall").otherwise("daily").as("grain"),
          when(col("g") === 1, lit(null).cast("long"))
            .otherwise(unix_timestamp(col("day"))).as("day_es"),
          col("n_users"))
        .orderBy("grain", "day_es")
    },

    // KLL/GK-style quantile sketch — the scale path for percentiles. At
    // 100 TB exact percentile needs a full sort per group;
    // approx_percentile is one pass + mergeable sketches. The sketch
    // values can't be oracled (engine-specific), so the driver-checked
    // form is the ERROR-BAND audit (r11): both the sketch and the exact
    // percentile run in one aggregate pass, the output carries the
    // exact r4-rounded quantiles (the proven quantile_cont parity from
    // q_agg_stats) plus a within-band boolean the oracle pins as TRUE.
    // accuracy=1000 ⇒ rank error ≤ 1e-3; on this price distribution a
    // 2% relative value band holds with wide margin across regens.
    Q("q_agg_approx_pct",
      """SELECT l_linestatus,
        |       floor((quantile_cont(l_extendedprice, 0.5))*10000+0.5)/10000 AS p50,
        |       floor((quantile_cont(l_extendedprice, 0.95))*10000+0.5)/10000 AS p95,
        |       TRUE AS pct_ok
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000)).as("a50"),
          approx_percentile(col("l_extendedprice"), lit(0.95), lit(1000)).as("a95"),
          Q.r4(percentile(col("l_extendedprice"), lit(0.5))).as("p50"),
          Q.r4(percentile(col("l_extendedprice"), lit(0.95))).as("p95"))
        .select(col("l_linestatus"), col("p50"), col("p95"),
          (abs(col("a50") - col("p50")) <= lit(0.02) * col("p50") &&
            abs(col("a95") - col("p95")) <= lit(0.02) * col("p95")).as("pct_ok"))
        .orderBy("l_linestatus")
    },

    // Aggregation-pushed top-k (functions/TopKAgg): bounded-buffer typed
    // Aggregator, so partial aggregation keeps ≤k rows per group per
    // partition and the shuffle carries k·groups·partitions rows — vs
    // the window twin (q_win_topk_group), which must shuffle and sort
    // EVERY row of every group before row_number can filter. Same
    // ordering contract (revenue DESC, partkey ASC on r2-rounded
    // scores) ⇒ shares the twin's oracle; TwinAndPropertySpec asserts
    // the two implementations are row-identical.
    Q("q_topk_agg",
      """WITH pr AS (
        |  SELECT p_brand, p_partkey,
        |         floor((sum(l_extendedprice * (1 - l_discount)))*100+0.5)/100 AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_partkey)
        |SELECT p_brand, p_partkey, revenue, rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rnk
        |      FROM pr)
        |WHERE rnk <= 3
        |ORDER BY p_brand, rnk""".stripMargin) { (s, d) =>
      val topk = udaf(new graft.functions.TopKAgg(3),
        org.apache.spark.sql.Encoders.product[graft.functions.Scored])
      val pr = Tables.load(s, d, "lineitem")
        .join(Tables.load(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(Q.r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      pr.groupBy("p_brand")
        .agg(topk(col("revenue"), col("p_partkey")).as("top"))
        .select(col("p_brand"), posexplode(col("top")))
        .select(
          col("p_brand"),
          col("col.id").as("p_partkey"),
          col("col.score").as("revenue"),
          (col("pos") + 1).cast("long").as("rnk"))
        .orderBy("p_brand", "rnk")
    },

    // HAVING: post-aggregation predicate — planned as a filter ABOVE the
    // final HashAggregate, so partial aggregation and the single
    // group-key shuffle are unchanged; only qualifying groups survive.
    Q("q_agg_having",
      """SELECT o_custkey,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       floor((sum(o_totalprice))*100+0.5)/100 AS spend
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 12 AND sum(o_totalprice) > 100000.0
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("spend0"))
        .filter(col("n_orders") >= 12 && col("spend0") > 100000.0)
        .select(col("o_custkey"), col("n_orders"), Q.r2(col("spend0")).as("spend"))
        .orderBy("o_custkey")
    },

    // Scalar subquery: rows compared against a global aggregate. Spark
    // plans the uncorrelated subquery as a one-row broadcast join —
    // exactly what you want at 100 TB (the aggregate is computed once,
    // shipped everywhere, never a per-row re-evaluation).
    // (threshold r2-rounded on BOTH sides: the avg's accumulation order
    // differs across engines in the last ulp, and unlike output-side
    // rounding a drifting threshold would flip which ROWS qualify)
    Q("q_scalar_subquery",
      """SELECT c_custkey, c_acctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT floor((2 * avg(c_acctbal))*100+0.5)/100 FROM customer)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer")
      val threshold = c.agg(Q.r2(avg(col("c_acctbal")) * 2).as("thr"))
      c.join(broadcast(threshold), col("c_acctbal") > col("thr"))
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    },

    // Correlated EXISTS / NOT EXISTS through the SQL entry (the Graft
    // facade registers the corpus as views): Catalyst's
    // RewritePredicateSubquery decorrelates both predicates into a
    // LeftSemi and a LeftAnti join — per-GROUP set logic, never a
    // per-row subquery re-execution (PlanAuditSpec asserts the join
    // pair). The DataFrame API can't express the correlated form, so
    // this is the one place the SQL path IS the operator. Identical SQL
    // text runs on DuckDB: no arithmetic, no parity risk.
    Q("q_exists_subquery",
      """SELECT c.c_custkey, c.c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 200000.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
      graft.Graft.registerTables(s, d)
      s.sql(
        """SELECT c.c_custkey, c.c_mktsegment
          |FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 200000.0)
          |  AND NOT EXISTS (SELECT 1 FROM orders o
          |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
          |ORDER BY c.c_custkey""".stripMargin)
    },

    // Heavy hitters via the approx_top_k sketch (Spark 4.x) — the scale
    // path for "most frequent items" without a full count-all-groups
    // shuffle: mergeable per-partition sketches, one row out. Oracled,
    // unlike the other sketch ops: event_type has 5 distinct values,
    // far under the sketch's tracking capacity, where approx_top_k is
    // EXACT by construction — so the DuckDB exact top-k is a valid
    // oracle (same reasoning as the q_agg_distinct/HLL twin pairing).
    // The re-rank window pins tie order deterministically in both
    // engines.
    Q("q_agg_approx_topk",
      """SELECT event_type, n, rk
        |FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |             CAST(row_number() OVER (ORDER BY count(*) DESC, event_type) AS BIGINT) AS rk
        |      FROM events GROUP BY event_type)
        |WHERE rk <= 5
        |ORDER BY rk""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Tables.events(s, d)
        .agg(expr("approx_top_k(event_type, 5)").as("t"))
        .select(explode(col("t")).as("e"))
        .select(col("e.item").as("event_type"), col("e.count").as("n"))
        .withColumn("rk",
          row_number().over(Window.orderBy(col("n").desc, col("event_type"))).cast("long"))
        .filter(col("rk") <= 5)
        .orderBy("rk")
    },

    // ROLLUP with coalesced labels (grouping_id formats differ per engine,
    // label columns are portable).
    Q("q_agg_rollup",
      """SELECT coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
        |       coalesce(o_orderstatus, 'ALL') AS st,
        |       count(*) AS n,
        |       floor((sum(o_totalprice))*100+0.5)/100 AS total
        |FROM orders
        |GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
        |ORDER BY yr, st""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .rollup(year(col("o_orderdate")).as("yr0"), col("o_orderstatus").as("st0"))
        .agg(count(lit(1)).as("n"), Q.r2(sum(col("o_totalprice"))).as("total"))
        .select(
          coalesce(col("yr0").cast("string"), lit("ALL")).as("yr"),
          coalesce(col("st0"), lit("ALL")).as("st"),
          col("n"), col("total"))
        .orderBy("yr", "st")
    },

    Q("q_agg_cube",
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        |       coalesce(o_orderpriority, 'ALL') AS pri,
        |       count(*) AS n,
        |       floor((sum(o_totalprice))*100+0.5)/100 AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY st, pri""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .cube(col("o_orderstatus").as("st0"), col("o_orderpriority").as("pri0"))
        .agg(count(lit(1)).as("n"), Q.r2(sum(col("o_totalprice"))).as("total"))
        .select(
          coalesce(col("st0"), lit("ALL")).as("st"),
          coalesce(col("pri0"), lit("ALL")).as("pri"),
          col("n"), col("total"))
        .orderBy("st", "pri")
    },

    // GROUPING SETS via the Dataset.groupingSets API (Spark 4.x) — no
    // temp view, no session-catalog side effects.
    Q("q_agg_gsets",
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        |       coalesce(o_orderpriority, 'ALL') AS pri,
        |       count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY st, pri""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("n"))
        .orderBy("st", "pri")
    },

    // Conditional aggregation: CASE-sum and FILTER-count.
    Q("q_agg_filtered",
      """SELECT l_returnflag,
        |       floor((sum(l_extendedprice) FILTER (WHERE l_discount > 0.05))*100+0.5)/100 AS disc_base,
        |       count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          Q.r2(sum(when(col("l_discount") > 0.05, col("l_extendedprice")))).as("disc_base"),
          count(when(col("l_quantity") > 25, lit(1))).as("n_big"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // Statistical aggregates + exact interpolated percentile.
    Q("q_agg_stats",
      """SELECT l_linestatus,
        |       floor((stddev_samp(l_quantity))*10000+0.5)/10000 AS sd_qty,
        |       floor((var_samp(l_quantity))*10000+0.5)/10000 AS var_qty,
        |       floor((corr(l_extendedprice, l_quantity))*1000000+0.5)/1000000 AS corr_pq,
        |       floor((quantile_cont(l_quantity, 0.5))*10000+0.5)/10000 AS median_qty
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          Q.r4(stddev_samp(col("l_quantity"))).as("sd_qty"),
          Q.r4(var_samp(col("l_quantity"))).as("var_qty"),
          Q.r6(corr(col("l_extendedprice"), col("l_quantity"))).as("corr_pq"),
          Q.r4(percentile(col("l_quantity"), lit(0.5))).as("median_qty"))
        .orderBy("l_linestatus")
    },

    // Custom typed Aggregator (functions.WeightedAvg): price-weighted
    // mean discount. The two-field commutative buffer keeps map-side
    // partial aggregation — shuffle volume is |groups|, like built-ins.
    Q("q_agg_weighted",
      """SELECT l_returnflag,
        |       floor((sum(l_discount * l_extendedprice) / sum(l_extendedprice))*1000000+0.5)/1000000 AS wavg_disc,
        |       count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val wavg = udaf(new graft.functions.WeightedAvg)
      Tables.load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          Q.r6(wavg(col("l_discount"), col("l_extendedprice"))).as("wavg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // Per-group ordered collection, emitted as a CSV string (portable across
    // engines; list hashing is not).
    Q("q_agg_collect",
      """SELECT o_custkey,
        |       array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
        |       count(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .groupBy("o_custkey")
        .agg(
          array_join(
            transform(sort_array(collect_list(col("o_orderkey"))), _.cast("string")),
            ",").as("order_keys"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey")
    },

    // Unpivot (melt): wide per-user counts back to long (type, n) rows —
    // the inverse of q_pivot, via Dataset.unpivot. Oracle states it as
    // UNION ALL (dialect-safe vs UNPIVOT syntax drift).
    Q("q_unpivot",
      """WITH w AS (
        |  SELECT user_id,
        |         count(*) FILTER (WHERE event_type = 'click')    AS n_click,
        |         count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
        |  FROM events GROUP BY user_id)
        |SELECT user_id, kind, n FROM (
        |  SELECT user_id, 'click' AS kind, n_click AS n FROM w
        |  UNION ALL
        |  SELECT user_id, 'purchase' AS kind, n_purchase AS n FROM w)
        |ORDER BY user_id, kind""".stripMargin) { (s, d) =>
      val wide = Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"))
      wide.unpivot(
          Array(col("user_id")), Array(col("n_click"), col("n_purchase")),
          "kind", "n")
        .withColumn("kind", regexp_replace(col("kind"), "^n_", ""))
        .orderBy("user_id", "kind")
    },

    // Pivot: event_type → columns of counts per user.
    Q("q_pivot",
      """SELECT user_id,
        |       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
        |       count(*) FILTER (WHERE event_type = 'error')    AS n_error,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
        |       count(*) FILTER (WHERE event_type = 'view')     AS n_view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
        .orderBy("user_id")
    }
  )
}
