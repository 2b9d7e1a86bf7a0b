package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scans, projection/filter, sort/limit and set operations (SURVEY §2.1,
  * §2.2, §2.6, §2.7).
  *
  * Every oracle-declared query ends in an ORDER BY on a unique key and
  * rounds aggregated doubles with the floor-formula (Q.r2) so the driver's
  * hash-compare against DuckDB is deterministic. Raw (non-aggregated)
  * doubles are projected as-is: both engines read the same parquet bits
  * and per-row IEEE arithmetic with an identical expression tree is
  * bit-exact.
  */
object Relational {

  def defs: Seq[QueryDef] = Seq(

    // -- §2.1 scans ----------------------------------------------------------

    // Full scan with count + column checksums. At 100 TB this is a pure
    // map-side partial-aggregate: one pass, no shuffle beyond the final
    // single-row merge.
    Q("q_scan_parquet",
      """SELECT count(*) AS n_rows,
        |       floor((sum(l_quantity))*100+0.5)/100 AS sum_qty,
        |       CAST(sum(l_orderkey) AS BIGINT) AS sum_okey,
        |       CAST(min(l_linenumber) AS INT) AS min_line,
        |       CAST(max(l_linenumber) AS INT) AS max_line
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        Q.r2(sum(col("l_quantity"))).as("sum_qty"),
        sum(col("l_orderkey")).as("sum_okey"),
        min(col("l_linenumber")).as("min_line"),
        max(col("l_linenumber")).as("max_line"))
    },

    // Pruned scan: 3 of 11 columns + a pushed-down predicate. The physical
    // plan must show PushedFilters + a 3-column ReadSchema.
    Q("q_scan_pruned",
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-06-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("2000-06-01")))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Custom DataSource V2 scan (graft.sources.DocsSource): generated
    // corpus read through the public connector API — partition-planned,
    // column-pruned (SourcesSpec asserts both). DuckDB cannot read the
    // custom source, but the source's content is DETERMINISTIC by
    // contract (SourcesSpec proves identical rows across partition
    // counts and re-plans), so (r11) the oracle pins the aggregate as
    // literals — a generator drift, partition-dependent row loss, or
    // broken re-plan now hash-mismatches in the driver gate. Regenerate
    // the literals only on an INTENDED DocsSource change.
    Q("q_source_dsv2",
      """SELECT * FROM (VALUES
        |  ('de', CAST(1000 AS BIGINT), CAST(70335 AS BIGINT)),
        |  ('en', 1000, 69541),
        |  ('es', 1000, 70936),
        |  ('fr', 1000, 70879),
        |  ('pt', 1000, 70122)) AS t(lang, n_docs, sum_chars)
        |ORDER BY lang""".stripMargin) { (s, _) =>
      s.read.format("graft-docs")
        .option("rows", 5000).option("partitions", 8).load()
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang")
    },

    // Z-order layout key (native codegen'd ZOrder2 expression): Morton-
    // interleave (l_partkey, l_suppkey) and report per-z-bucket locality
    // stats — the min/max spans that parquet row-group pruning would use
    // after OPTIMIZE-ZORDER-style re-clustering of a 100 TB fact table
    // queried by either key. Narrow per-bucket spans in BOTH dims is the
    // whole point of the curve; the oracle computes the identical
    // interleave as plain int64 shift/mask SQL (bit ops are exact in
    // both engines), and TwinAndPropertySpec pins the native expression
    // byte-equal to the arithmetic formulation.
    Q("q_zorder",
      s"""WITH z AS (SELECT ${graft.functions.ZOrder2.zorderSql("l_partkey", "l_suppkey")} AS zv,
         |                  l_partkey, l_suppkey
         |           FROM lineitem)
         |SELECT CAST(zv >> 18 AS BIGINT) AS zbucket,
         |       count(*) AS n,
         |       CAST(min(l_partkey) AS BIGINT) AS min_part,
         |       CAST(max(l_partkey) AS BIGINT) AS max_part,
         |       CAST(min(l_suppkey) AS BIGINT) AS min_supp,
         |       CAST(max(l_suppkey) AS BIGINT) AS max_supp
         |FROM z
         |GROUP BY 1
         |ORDER BY 1""".stripMargin) { (s, d) =>
      val zv = graft.functions.ZOrder2.zorder2(col("l_partkey"), col("l_suppkey"))
      Tables.load(s, d, "lineitem")
        .select(shiftright(zv, 18).as("zbucket"), col("l_partkey"), col("l_suppkey"))
        .groupBy("zbucket")
        .agg(
          count(lit(1)).as("n"),
          min(col("l_partkey")).as("min_part"),
          max(col("l_partkey")).as("max_part"),
          min(col("l_suppkey")).as("min_supp"),
          max(col("l_suppkey")).as("max_supp"))
        .orderBy("zbucket")
    },

    // Run-length profile of a payload column under z-order layout: how
    // many value runs (and the average run length) l_returnflag forms
    // inside each z-bucket when rows are laid out in curve order — the
    // measurable answer to "what does OPTIMIZE-ZORDER buy this column",
    // since RLE/dictionary page compression and row-group min/max skips
    // are both run-driven. The lag() run-break window partitions by
    // zbucket, so per-reducer work is one bucket's rows; the shift
    // width (18 here, = q_zorder's bucketing) is the granularity knob —
    // widen it and buckets shrink as the corpus grows. Run counting is
    // pure int64 (flag inequality + running sum); only the final avg
    // run length divides, r4-rounded.
    Q("q_rle_zorder",
      s"""WITH z AS (SELECT ${graft.functions.ZOrder2.zorderSql("l_partkey", "l_suppkey")} AS zv,
         |                  l_orderkey, l_linenumber, l_returnflag
         |           FROM lineitem),
         |r AS (SELECT CAST(zv >> 18 AS BIGINT) AS zbucket, l_returnflag,
         |             CASE WHEN lag(l_returnflag) OVER w IS NULL THEN 1
         |                  WHEN l_returnflag <> lag(l_returnflag) OVER w THEN 1
         |                  ELSE 0 END AS brk
         |      FROM z
         |      WINDOW w AS (PARTITION BY zv >> 18
         |                   ORDER BY zv, l_orderkey, l_linenumber))
         |SELECT zbucket, count(*) AS n,
         |       CAST(sum(brk) AS BIGINT) AS runs,
         |       ${Q.sqlR4("CAST(count(*) AS DOUBLE) / sum(brk)")} AS avg_run_len
         |FROM r GROUP BY 1
         |ORDER BY zbucket""".stripMargin) { (s, d) =>
      val zv = graft.functions.ZOrder2.zorder2(col("l_partkey"), col("l_suppkey"))
      val w = Window.partitionBy("zbucket")
        .orderBy("zv", "l_orderkey", "l_linenumber")
      Tables.load(s, d, "lineitem")
        .select(zv.as("zv"), col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        .withColumn("zbucket", shiftright(col("zv"), 18))
        .withColumn("brk",
          when(lag("l_returnflag", 1).over(w).isNull, 1)
            .when(col("l_returnflag") =!= lag("l_returnflag", 1).over(w), 1)
            .otherwise(0))
        .groupBy("zbucket")
        .agg(count(lit(1)).as("n"), sum("brk").cast("long").as("runs"),
          Q.r4(count(lit(1)).cast("double") / sum("brk")).as("avg_run_len"))
        .orderBy("zbucket")
    },

    // -- §2.2 projection / filter -------------------------------------------

    Q("q_project",
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) AS revenue,
        |       (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS charge
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          ((col("l_extendedprice") * (lit(1) - col("l_discount"))) * (lit(1) + col("l_tax"))).as("charge"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    Q("q_filter_pred",
      """SELECT p_partkey, p_brand, p_type, p_size
        |FROM part
        |WHERE p_size BETWEEN 10 AND 30
        |  AND (p_brand IN ('Brand#1','Brand#3') OR p_type LIKE 'PROMO%')
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "part")
        .filter(col("p_size").between(10, 30) &&
          (col("p_brand").isin("Brand#1", "Brand#3") || col("p_type").like("PROMO%")))
        .select("p_partkey", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")
    },

    // Filter through the custom interval_match predicate: written with
    // the extension function, executed as native range comparisons —
    // the injected IntervalFilterUnfold optimizer rule (plans/
    // IntervalRewrite.scala) unfolds it inside Filter conditions, so
    // the bounds reach the parquet scan as PushedFilters and row-group
    // pruning applies (plan-audited). Without the rule this scan would
    // be a black-box full read; with it the query is exactly
    // q_filter-style native filtering — which is what the oracle runs.
    Q("q_filter_interval",
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_extendedprice >= 1000.0 AND l_extendedprice < 5000.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .filter(call_function("interval_match",
          col("l_extendedprice"), lit(1000.0), lit(5000.0)))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Three-valued logic: nulls are manufactured with nullif (the test
    // tables have none), then probed with IS NULL / IS NOT NULL / the
    // null-safe equality operator (<=> vs IS NOT DISTINCT FROM).
    Q("q_filter_null",
      """SELECT o_orderkey,
        |       nullif(o_orderstatus, 'P') AS s,
        |       nullif(o_orderstatus, 'P') IS NULL AS s_is_null,
        |       nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F' AS s_eq_f
        |FROM orders
        |WHERE o_orderkey % 10 = 0
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val o = Tables.load(s, d, "orders")
      val sCol = nullif(col("o_orderstatus"), lit("P"))
      o.filter(col("o_orderkey") % 10 === 0)
        .select(
          col("o_orderkey"),
          sCol.as("s"),
          sCol.isNull.as("s_is_null"),
          (sCol <=> lit("F")).as("s_eq_f"))
        .orderBy("o_orderkey")
    },

    // -- §2.6 sort / limit ----------------------------------------------------

    Q("q_sort_multi",
      """SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer
        |ORDER BY c_nationkey DESC NULLS LAST, c_mktsegment ASC, c_custkey ASC""".stripMargin) { (s, d) =>
      Tables.load(s, d, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
        .orderBy(col("c_nationkey").desc_nulls_last, col("c_mktsegment").asc, col("c_custkey").asc)
    },

    // Global top-k: Spark plans this as TakeOrderedAndProject — per-partition
    // top-20 then a single driver-side merge of 20-row heaps, no full sort
    // at any scale.
    Q("q_topk",
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) AS revenue
        |FROM lineitem
        |ORDER BY revenue DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)
    },

    // -- §2.7 set operations ---------------------------------------------------

    Q("q_union_all",
      """SELECT c_custkey, 'seg' AS src FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT c_custkey, 'bal' AS src FROM customer WHERE c_acctbal > 7500.0
        |ORDER BY c_custkey, src""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer")
      c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"), lit("seg").as("src"))
        .unionAll(
          c.filter(col("c_acctbal") > 7500.0).select(col("c_custkey"), lit("bal").as("src")))
        .orderBy("c_custkey", "src")
    },

    Q("q_union_distinct",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 7500.0
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer")
      c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .union(c.filter(col("c_acctbal") > 7500.0).select("c_custkey"))
        .distinct()
        .orderBy("c_custkey")
    },

    Q("q_intersect",
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error' AND value > 300.0
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      e.filter(col("event_type") === "purchase").select("user_id")
        .intersect(
          e.filter(col("event_type") === "error" && col("value") > 300.0).select("user_id"))
        .orderBy("user_id")
    },

    // Schema-evolution union: two sources with different column sets and
    // orders merged by NAME (unionByName + allowMissingColumns), the
    // everyday "append new-schema files to an old table" operation.
    // Positional UNION ALL would silently misalign here. The oracle
    // spells out the aligned projection with typed NULLs.
    Q("q_union_byname",
      """SELECT c_custkey AS entity_id, 'customer' AS src, c_acctbal AS acctbal,
        |       c_custkey AS rid, CAST(NULL AS DOUBLE) AS spend
        |FROM customer
        |UNION ALL
        |SELECT o_custkey, 'order', CAST(NULL AS DOUBLE), o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY src, rid""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "customer")
        .select(col("c_custkey").as("entity_id"), lit("customer").as("src"),
          col("c_acctbal").as("acctbal"), col("c_custkey").as("rid"))
      val o = Tables.load(s, d, "orders")
        .select(col("o_totalprice").as("spend"), col("o_custkey").as("entity_id"),
          col("o_orderkey").as("rid"), lit("order").as("src"))
      c.unionByName(o, allowMissingColumns = true)
        .orderBy("src", "rid")
    },

    Q("q_except",
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'error' AND value > 300.0
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      e.filter(col("event_type") === "purchase").select("user_id")
        .except(
          e.filter(col("event_type") === "error" && col("value") > 300.0).select("user_id"))
        .orderBy("user_id")
    },

    // Bag-semantics set ops (round 10): EXCEPT ALL / INTERSECT ALL keep
    // MULTIPLICITY — "purchases minus one per error" retains the count
    // difference where the distinct forms collapse it. Spark plans both
    // as a single hash aggregate computing per-key counts on each side
    // then replicating min/difference copies — one shuffle each, no
    // join. The ORDER BY user_id leaves duplicate rows adjacent and
    // identical, so the driver's sorted hash-compare is deterministic
    // despite the bag output.
    Q("q_except_all",
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |EXCEPT ALL
        |SELECT user_id FROM events WHERE event_type = 'error' AND value > 300.0
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      e.filter(col("event_type") === "purchase").select("user_id")
        .exceptAll(
          e.filter(col("event_type") === "error" && col("value") > 300.0).select("user_id"))
        .orderBy("user_id")
    },

    Q("q_intersect_all",
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT ALL
        |SELECT user_id FROM events WHERE event_type = 'view' AND value > 200.0
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      e.filter(col("event_type") === "purchase").select("user_id")
        .intersectAll(
          e.filter(col("event_type") === "view" && col("value") > 200.0).select("user_id"))
        .orderBy("user_id")
    }
  )
}
