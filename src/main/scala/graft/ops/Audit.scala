package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audit operators (round 15, SURVEY §2.17): the checks a
  * lakehouse runs BEFORE analytics trusts a drop — referential
  * integrity across the star schema's FK edges, functional-dependency
  * strength for declared key candidates, and per-column completeness.
  * All three are pure integer counting (no float ever crosses a row
  * boundary except the final rate divisions), so cross-engine parity
  * is structural.
  *
  * Scale shapes: RI collapses each child table to its (key, rows)
  * frame FIRST (map-side partials onto key-bounded frames), then
  * left-anti probes the parent key set — keyed joins only, no
  * broadcast of catalog-scaled dims; FD strength is a two-stage
  * (x, y) → x aggregation (the dominant-y count is a max over counts,
  * so tie-breaking never touches values); completeness is one
  * conditional-agg pass per table unpivoted to a fixed ~20-row
  * readout.
  */
object Audit {

  /** The audited column manifest per table (name, isString) — one home
    * for the batch q_completeness and the s_completeness streaming
    * face's events slice. */
  private[graft] val EventsCols: Seq[(String, Boolean)] =
    Seq(("event_id", false), ("event_type", true), ("value", false), ("props", true))

  /** Conditional-count aggregates for one table's manifest — the
    * MERGEABLE half of the completeness audit (a single global row of
    * int64 counters; the s_completeness streaming state). */
  private[graft] def completenessAggs(cols: Seq[(String, Boolean)]) =
    cols.flatMap { case (c, isStr) =>
      Seq(count(lit(1)).as(s"${c}__rows"),
        (count(lit(1)) - count(col(c))).as(s"${c}__null")) :+
        (if (isStr) sum(when(trim(col(c)) === "", 1L).otherwise(0L)).as(s"${c}__blank")
         else lit(null).cast("long").as(s"${c}__blank"))
    }

  /** Unpivot + rate projection over a [[completenessAggs]] row — the
    * read-time half shared by the batch query and the streaming
    * face. */
  private[graft] def completenessStack(tbl: String, one: DataFrame,
                                       cols: Seq[(String, Boolean)]): DataFrame = {
    val stacked = cols.map { case (c, _) =>
      s"'$c', ${c}__rows, ${c}__null, ${c}__blank"
    }.mkString(", ")
    one.select(lit(tbl).as("tbl"),
      expr(s"stack(${cols.size}, $stacked) AS (col_name, n_rows, n_null, n_blank)"))
      .select(col("tbl"), col("col_name"), col("n_rows").cast("long").as("n_rows"),
        col("n_null").cast("long").as("n_null"),
        col("n_blank").cast("long").as("n_blank"))
  }

  /** Full one-table audit = aggs + stack + rate; the batch assembly. */
  private[graft] def completenessOf(tbl: String, df: DataFrame,
                                    cols: Seq[(String, Boolean)]): DataFrame = {
    val aggs = completenessAggs(cols)
    completenessStack(tbl, df.agg(aggs.head, aggs.tail: _*), cols)
  }

  def defs: Seq[QueryDef] = Seq(

    // Referential-integrity audit over the star schema's four FK
    // edges (round 15): for each edge the child row count, the
    // distinct child keys, the orphan rows/keys (child keys with no
    // parent) and the orphan-row rate. Each child collapses to its
    // (key, rows) frame first, and the probe runs against the parent
    // KEY SET (distinct — a parent whose own PK is duplicated must
    // not fan the child frame out and inflate the very counts this
    // audit reports), so both sides of the left probe are
    // key-bounded.
    Q("q_ri_audit",
      s"""WITH e1 AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
         |o1 AS (SELECT 'lineitem.l_orderkey->orders' AS relation,
         |              CAST(sum(c) AS BIGINT) AS n_rows,
         |              CAST(count(*) AS BIGINT) AS n_keys,
         |              CAST(coalesce(sum(CASE WHEN o.o_orderkey IS NULL THEN c END), 0) AS BIGINT) AS orphan_rows,
         |              CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphan_keys
         |       FROM e1 LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o ON e1.k = o.o_orderkey),
         |e2 AS (SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
         |o2 AS (SELECT 'lineitem.l_partkey->part' AS relation,
         |              CAST(sum(c) AS BIGINT) AS n_rows,
         |              CAST(count(*) AS BIGINT) AS n_keys,
         |              CAST(coalesce(sum(CASE WHEN p.p_partkey IS NULL THEN c END), 0) AS BIGINT) AS orphan_rows,
         |              CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphan_keys
         |       FROM e2 LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p ON e2.k = p.p_partkey),
         |e3 AS (SELECT l_suppkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
         |o3 AS (SELECT 'lineitem.l_suppkey->supplier' AS relation,
         |              CAST(sum(c) AS BIGINT) AS n_rows,
         |              CAST(count(*) AS BIGINT) AS n_keys,
         |              CAST(coalesce(sum(CASE WHEN s.s_suppkey IS NULL THEN c END), 0) AS BIGINT) AS orphan_rows,
         |              CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphan_keys
         |       FROM e3 LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s ON e3.k = s.s_suppkey),
         |e4 AS (SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1),
         |o4 AS (SELECT 'orders.o_custkey->customer' AS relation,
         |              CAST(sum(c) AS BIGINT) AS n_rows,
         |              CAST(count(*) AS BIGINT) AS n_keys,
         |              CAST(coalesce(sum(CASE WHEN cu.c_custkey IS NULL THEN c END), 0) AS BIGINT) AS orphan_rows,
         |              CAST(sum(CASE WHEN cu.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphan_keys
         |       FROM e4 LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) cu ON e4.k = cu.c_custkey),
         |u AS (SELECT * FROM o1 UNION ALL SELECT * FROM o2
         |      UNION ALL SELECT * FROM o3 UNION ALL SELECT * FROM o4)
         |SELECT relation, n_rows, n_keys, orphan_rows, orphan_keys,
         |       ${Q.sqlR6("CAST(orphan_rows AS DOUBLE) / n_rows")} AS orphan_rate
         |FROM u
         |ORDER BY relation""".stripMargin) { (s, d) =>
      def edge(rel: String, child: DataFrame, key: String,
               parent: DataFrame, pkey: String): DataFrame = {
        val ck = child.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        ck.join(parent.select(col(pkey)).distinct(), col("k") === col(pkey), "left")
          .agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
            coalesce(sum(when(col(pkey).isNull, col("c"))), lit(0L)).as("orphan_rows"),
            sum(when(col(pkey).isNull, 1L).otherwise(0L)).as("orphan_keys"))
          .select(lit(rel).as("relation"), col("n_rows"), col("n_keys"),
            col("orphan_rows"), col("orphan_keys"))
      }
      val li = Tables.load(s, d, "lineitem")
      edge("lineitem.l_orderkey->orders", li, "l_orderkey",
          Tables.load(s, d, "orders"), "o_orderkey")
        .unionAll(edge("lineitem.l_partkey->part", li, "l_partkey",
          Tables.load(s, d, "part"), "p_partkey"))
        .unionAll(edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
          Tables.load(s, d, "supplier"), "s_suppkey"))
        .unionAll(edge("orders.o_custkey->customer", Tables.load(s, d, "orders"),
          "o_custkey", Tables.load(s, d, "customer"), "c_custkey"))
        .withColumn("orphan_rate",
          Q.r6(col("orphan_rows").cast("double") / col("n_rows")))
        .orderBy("relation")
    },

    // Functional-dependency strength audit (round 15): for each
    // declared candidate X→Y, how far the data is from satisfying it —
    // violating rows = rows outside each X-group's DOMINANT Y (the g3
    // error measure from the FD-discovery literature), violating LHS
    // = X values seeing >1 distinct Y. The dominant count is a max
    // over per-(x,y) counts, so ties never consult values and the
    // readout is pure int64. Two-stage keyed aggregation per FD; a
    // true key (p_partkey→p_brand) reads strength 1 as the control.
    Q("q_fd_violations",
      s"""WITH f1 AS (SELECT p_partkey AS x, p_brand AS y FROM part),
         |g1 AS (SELECT x, y, count(*) AS c FROM f1 GROUP BY 1, 2),
         |h1 AS (SELECT x, sum(c) AS rows_x, max(c) AS dom, count(*) AS ny FROM g1 GROUP BY 1),
         |a1 AS (SELECT 'part.p_partkey->p_brand' AS fd,
         |              CAST(count(*) AS BIGINT) AS n_lhs,
         |              CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lhs_violating,
         |              CAST(sum(rows_x) AS BIGINT) AS n_rows,
         |              CAST(sum(rows_x - dom) AS BIGINT) AS n_violating_rows
         |       FROM h1),
         |f2 AS (SELECT p_brand AS x, p_type AS y FROM part),
         |g2 AS (SELECT x, y, count(*) AS c FROM f2 GROUP BY 1, 2),
         |h2 AS (SELECT x, sum(c) AS rows_x, max(c) AS dom, count(*) AS ny FROM g2 GROUP BY 1),
         |a2 AS (SELECT 'part.p_brand->p_type' AS fd,
         |              CAST(count(*) AS BIGINT) AS n_lhs,
         |              CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lhs_violating,
         |              CAST(sum(rows_x) AS BIGINT) AS n_rows,
         |              CAST(sum(rows_x - dom) AS BIGINT) AS n_violating_rows
         |       FROM h2),
         |f3 AS (SELECT l_orderkey AS x, l_suppkey AS y FROM lineitem),
         |g3 AS (SELECT x, y, count(*) AS c FROM f3 GROUP BY 1, 2),
         |h3 AS (SELECT x, sum(c) AS rows_x, max(c) AS dom, count(*) AS ny FROM g3 GROUP BY 1),
         |a3 AS (SELECT 'lineitem.l_orderkey->l_suppkey' AS fd,
         |              CAST(count(*) AS BIGINT) AS n_lhs,
         |              CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lhs_violating,
         |              CAST(sum(rows_x) AS BIGINT) AS n_rows,
         |              CAST(sum(rows_x - dom) AS BIGINT) AS n_violating_rows
         |       FROM h3),
         |f4 AS (SELECT user_id AS x, event_type AS y FROM events),
         |g4 AS (SELECT x, y, count(*) AS c FROM f4 GROUP BY 1, 2),
         |h4 AS (SELECT x, sum(c) AS rows_x, max(c) AS dom, count(*) AS ny FROM g4 GROUP BY 1),
         |a4 AS (SELECT 'events.user_id->event_type' AS fd,
         |              CAST(count(*) AS BIGINT) AS n_lhs,
         |              CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lhs_violating,
         |              CAST(sum(rows_x) AS BIGINT) AS n_rows,
         |              CAST(sum(rows_x - dom) AS BIGINT) AS n_violating_rows
         |       FROM h4),
         |u AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2
         |      UNION ALL SELECT * FROM a3 UNION ALL SELECT * FROM a4)
         |SELECT fd, n_lhs, n_lhs_violating, n_rows, n_violating_rows,
         |       ${Q.sqlR6("1 - CAST(n_violating_rows AS DOUBLE) / n_rows")} AS fd_strength
         |FROM u
         |ORDER BY fd""".stripMargin) { (s, d) =>
      def fd(name: String, df: DataFrame, x: String, y: String): DataFrame =
        df.select(col(x).as("x"), col(y).as("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("c"))
          .groupBy("x").agg(sum("c").as("rows_x"), max("c").as("dom"),
            count(lit(1)).as("ny"))
          .agg(count(lit(1)).as("n_lhs"),
            sum(when(col("ny") > 1, 1L).otherwise(0L)).as("n_lhs_violating"),
            sum("rows_x").as("n_rows"),
            sum(col("rows_x") - col("dom")).as("n_violating_rows"))
          .select(lit(name).as("fd"), col("n_lhs"), col("n_lhs_violating"),
            col("n_rows"), col("n_violating_rows"))
      val part = Tables.load(s, d, "part")
      fd("part.p_partkey->p_brand", part, "p_partkey", "p_brand")
        .unionAll(fd("part.p_brand->p_type", part, "p_brand", "p_type"))
        .unionAll(fd("lineitem.l_orderkey->l_suppkey",
          Tables.load(s, d, "lineitem"), "l_orderkey", "l_suppkey"))
        .unionAll(fd("events.user_id->event_type",
          Tables.events(s, d), "user_id", "event_type"))
        .withColumn("fd_strength",
          Q.r6(lit(1) - col("n_violating_rows").cast("double") / col("n_rows")))
        .orderBy("fd")
    },

    // Per-column completeness audit (round 15): for a fixed column
    // manifest over orders/lineitem/events/documents, the row count,
    // null count, blank count (strings only — trimmed-empty; NULL for
    // non-strings) and the completeness rate. One conditional-agg
    // pass per table, unpivoted to the fixed readout — the profile a
    // pipeline gates ingest on.
    Q("q_completeness",
      s"""WITH m AS (
         |  SELECT 'orders' AS tbl, 'o_orderkey' AS col_name, count(*) AS n_rows,
         |         count(*) - count(o_orderkey) AS n_null, CAST(NULL AS BIGINT) AS n_blank FROM orders
         |  UNION ALL SELECT 'orders', 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
         |         sum(CASE WHEN trim(o_orderstatus) = '' THEN 1 ELSE 0 END) FROM orders
         |  UNION ALL SELECT 'orders', 'o_totalprice', count(*), count(*) - count(o_totalprice),
         |         CAST(NULL AS BIGINT) FROM orders
         |  UNION ALL SELECT 'orders', 'o_orderdate', count(*), count(*) - count(o_orderdate),
         |         CAST(NULL AS BIGINT) FROM orders
         |  UNION ALL SELECT 'lineitem', 'l_orderkey', count(*), count(*) - count(l_orderkey),
         |         CAST(NULL AS BIGINT) FROM lineitem
         |  UNION ALL SELECT 'lineitem', 'l_quantity', count(*), count(*) - count(l_quantity),
         |         CAST(NULL AS BIGINT) FROM lineitem
         |  UNION ALL SELECT 'lineitem', 'l_returnflag', count(*), count(*) - count(l_returnflag),
         |         sum(CASE WHEN trim(l_returnflag) = '' THEN 1 ELSE 0 END) FROM lineitem
         |  UNION ALL SELECT 'events', 'event_id', count(*), count(*) - count(event_id),
         |         CAST(NULL AS BIGINT) FROM events
         |  UNION ALL SELECT 'events', 'event_type', count(*), count(*) - count(event_type),
         |         sum(CASE WHEN trim(event_type) = '' THEN 1 ELSE 0 END) FROM events
         |  UNION ALL SELECT 'events', 'value', count(*), count(*) - count(value),
         |         CAST(NULL AS BIGINT) FROM events
         |  UNION ALL SELECT 'events', 'props', count(*), count(*) - count(props),
         |         sum(CASE WHEN trim(props) = '' THEN 1 ELSE 0 END) FROM events
         |  UNION ALL SELECT 'documents', 'text', count(*), count(*) - count(text),
         |         sum(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) FROM documents
         |  UNION ALL SELECT 'documents', 'lang', count(*), count(*) - count(lang),
         |         sum(CASE WHEN trim(lang) = '' THEN 1 ELSE 0 END) FROM documents
         |  UNION ALL SELECT 'documents', 'source', count(*), count(*) - count(source),
         |         sum(CASE WHEN trim(source) = '' THEN 1 ELSE 0 END) FROM documents)
         |SELECT tbl, col_name, CAST(n_rows AS BIGINT) AS n_rows,
         |       CAST(n_null AS BIGINT) AS n_null, CAST(n_blank AS BIGINT) AS n_blank,
         |       ${Q.sqlR6("1 - CAST(n_null AS DOUBLE) / n_rows")} AS completeness
         |FROM m
         |ORDER BY tbl, col_name""".stripMargin) { (s, d) =>
      completenessOf("orders", Tables.load(s, d, "orders"),
          Seq(("o_orderkey", false), ("o_orderstatus", true),
            ("o_totalprice", false), ("o_orderdate", false)))
        .unionAll(completenessOf("lineitem", Tables.load(s, d, "lineitem"),
          Seq(("l_orderkey", false), ("l_quantity", false), ("l_returnflag", true))))
        .unionAll(completenessOf("events", Tables.events(s, d), EventsCols))
        .unionAll(completenessOf("documents", Tables.load(s, d, "documents"),
          Seq(("text", true), ("lang", true), ("source", true))))
        .withColumn("completeness",
          Q.r6(lit(1) - col("n_null").cast("double") / col("n_rows")))
        .orderBy("tbl", "col_name")
    },

    // Candidate-key discovery audit over orders (round 15): per
    // column, the EXACT distinct-value count, null count and
    // uniqueness ratio, with is_key = 1 when the column is a
    // null-free total key — the PK-discovery pass q_fd_violations
    // assumes already ran. Values unpivot to (column, value-string)
    // — string casts are injective per engine, so the distinct COUNTS
    // agree cross-engine even where the rendered strings differ — and
    // collapse through ONE map-side-partial (column, value) agg, then
    // a 6-row readout; pure integer counting (the exact path; an
    // ultra-wide audit at 100 TB swaps in q_profile_approx's HLL
    // sketches, documented trade).
    Q("q_key_candidates",
      s"""WITH u AS (
         |  SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS v FROM orders
         |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
         |  UNION ALL SELECT 'o_orderstatus', CAST(o_orderstatus AS VARCHAR) FROM orders
         |  UNION ALL SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR) FROM orders
         |  UNION ALL SELECT 'o_orderdate', CAST(o_orderdate AS VARCHAR) FROM orders
         |  UNION ALL SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR) FROM orders),
         |g AS (SELECT col_name, v, count(*) AS c FROM u GROUP BY 1, 2),
         |a AS (SELECT col_name, CAST(sum(c) AS BIGINT) AS n_rows,
         |             CAST(coalesce(sum(CASE WHEN v IS NULL THEN c END), 0) AS BIGINT) AS n_null,
         |             CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct
         |      FROM g GROUP BY 1)
         |SELECT col_name, n_rows, n_null, n_distinct,
         |       CASE WHEN n_rows - n_null > 0 THEN
         |         ${Q.sqlR6("CAST(n_distinct AS DOUBLE) / (n_rows - n_null)")} END AS uniqueness,
         |       CAST(CASE WHEN n_distinct = n_rows THEN 1 ELSE 0 END AS BIGINT) AS is_key
         |FROM a
         |ORDER BY col_name""".stripMargin) { (s, d) =>
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val pairs = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
      Tables.load(s, d, "orders")
        .select(expr(s"stack(${cols.size}, $pairs) AS (col_name, v)"))
        .groupBy("col_name", "v").agg(count(lit(1)).as("c"))
        .groupBy("col_name")
        .agg(sum("c").as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("c"))), lit(0L)).as("n_null"),
          sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_distinct"))
        .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"),
          when(col("n_rows") - col("n_null") > 0,
            Q.r6(col("n_distinct").cast("double") /
              (col("n_rows") - col("n_null")))).as("uniqueness"),
          when(col("n_distinct") === col("n_rows"), 1L).otherwise(0L).as("is_key"))
        .orderBy("col_name")
    },

    // k-anonymity audit over the customer quasi-identifiers (round
    // 16): QI = (nation, market segment, account-balance $1000 band) —
    // the re-identification screen a privacy-conscious training
    // pipeline runs before releasing per-customer aggregates. Every
    // equivalence class is a QI cell; k = its size; the readout is the
    // single-row risk profile (min k, classes/rows below k = 5, the
    // at-risk row rate). Scale: the corpus collapses to the QI grid in
    // ONE map-side-partial agg — the grid is DOMAIN-bounded (25
    // nations × 5 segments × ~11 bands ≤ 1375 cells), so everything
    // downstream is constant-size. The band is floor(acctbal/1000) —
    // one IEEE division + floor, identical in both engines. Pure
    // int64 counting to the final rate division.
    Q("q_k_anonymity",
      s"""WITH g AS (SELECT c_nationkey, c_mktsegment,
         |                  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         |                  CAST(count(*) AS BIGINT) AS k
         |           FROM customer GROUP BY 1, 2, 3)
         |SELECT CAST(sum(k) AS BIGINT) AS n_rows,
         |       CAST(count(*) AS BIGINT) AS n_classes,
         |       CAST(min(k) AS BIGINT) AS min_k,
         |       CAST(coalesce(sum(CASE WHEN k < 5 THEN 1 END), 0) AS BIGINT) AS classes_below_5,
         |       CAST(coalesce(sum(CASE WHEN k < 5 THEN k END), 0) AS BIGINT) AS rows_below_5,
         |       ${Q.sqlR6("CAST(coalesce(sum(CASE WHEN k < 5 THEN k END), 0) AS DOUBLE) / sum(k)")} AS risk_rate
         |FROM g""".stripMargin) { (s, d) =>
      Tables.load(s, d, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_band"))
        .agg(count(lit(1)).as("k"))
        .agg(sum("k").as("n_rows"),
          count(lit(1)).as("n_classes"),
          min("k").as("min_k"),
          coalesce(sum(when(col("k") < 5, 1L)), lit(0L)).as("classes_below_5"),
          coalesce(sum(when(col("k") < 5, col("k"))), lit(0L)).as("rows_below_5"))
        .select(col("n_rows"), col("n_classes"), col("min_k"),
          col("classes_below_5"), col("rows_below_5"),
          Q.r6(col("rows_below_5").cast("double") / col("n_rows")).as("risk_rate"))
    },

    // l-diversity audit (round 16): within each (nation, balance-band)
    // QI class, how many DISTINCT market segments appear — the
    // homogeneity-attack screen k-anonymity alone misses (a class of
    // size 50 that is 100% one segment still leaks the attribute).
    // l = exact distinct sensitive values per class; the readout is
    // the single-row profile (min l, classes/rows with l < 3, the
    // at-risk row rate). Same domain-bounded QI grid shape: one
    // (nation, band, segment) agg (≤ 1375 cells), one (nation, band)
    // rollup (≤ 275), single row out. Pure int64 counting.
    Q("q_l_diversity",
      s"""WITH c0 AS (SELECT c_nationkey,
         |                   CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         |                   c_mktsegment, CAST(count(*) AS BIGINT) AS c
         |            FROM customer GROUP BY 1, 2, 3),
         |g AS (SELECT c_nationkey, bal_band,
         |             CAST(count(*) AS BIGINT) AS l,
         |             CAST(sum(c) AS BIGINT) AS k
         |      FROM c0 GROUP BY 1, 2)
         |SELECT CAST(count(*) AS BIGINT) AS n_classes,
         |       CAST(min(l) AS BIGINT) AS min_l,
         |       CAST(coalesce(sum(CASE WHEN l < 3 THEN 1 END), 0) AS BIGINT) AS classes_l_below_3,
         |       CAST(coalesce(sum(CASE WHEN l < 3 THEN k END), 0) AS BIGINT) AS rows_l_below_3,
         |       ${Q.sqlR6("CAST(coalesce(sum(CASE WHEN l < 3 THEN k END), 0) AS DOUBLE) / sum(k)")} AS risk_rate
         |FROM g""".stripMargin) { (s, d) =>
      Tables.load(s, d, "customer")
        .groupBy(col("c_nationkey"),
          floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_band"),
          col("c_mktsegment"))
        .agg(count(lit(1)).as("c"))
        .groupBy("c_nationkey", "bal_band")
        .agg(count(lit(1)).as("l"), sum("c").as("k"))
        .agg(count(lit(1)).as("n_classes"),
          min("l").as("min_l"),
          coalesce(sum(when(col("l") < 3, 1L)), lit(0L)).as("classes_l_below_3"),
          coalesce(sum(when(col("l") < 3, col("k"))), lit(0L)).as("rows_l_below_3"),
          sum("k").as("nr"))
        .select(col("n_classes"), col("min_l"),
          col("classes_l_below_3"), col("rows_l_below_3"),
          Q.r6(col("rows_l_below_3").cast("double") / col("nr")).as("risk_rate"))
    },

    // Partition-balance audit over the events day partitioning (round
    // 16): the partition-health readout a 100 TB table needs BEFORE a
    // backfill or repartition decision — rows per day-partition, the
    // min/max/mean, the max/mean skew factor (the straggler predictor:
    // one hot partition bounds the stage), and the coefficient of
    // variation. Exact int64 (S, Σc², n) per-day counts off ONE
    // map-side-partial agg onto the calendar-bounded day grid; the CV
    // is sqrt(n·Σc² − S²)/S — integer arithmetic to the last
    // operation (n·Σc² ≤ N²: the SF² headroom class, ~1e10 at sf0.1,
    // 9 decades inside int64).
    Q("q_partition_balance",
      s"""WITH g AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         |                  CAST(count(*) AS BIGINT) AS c
         |           FROM events GROUP BY 1),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
         |             CAST(sum(c) AS BIGINT) AS n_rows,
         |             CAST(min(c) AS BIGINT) AS min_rows,
         |             CAST(max(c) AS BIGINT) AS max_rows,
         |             CAST(sum(c * c) AS BIGINT) AS q
         |      FROM g)
         |SELECT n_parts, n_rows, min_rows, max_rows,
         |       ${Q.sqlR6("CAST(n_rows AS DOUBLE) / n_parts")} AS mean_rows,
         |       ${Q.sqlR6("CAST(max_rows AS DOUBLE) * n_parts / n_rows")} AS skew,
         |       ${Q.sqlR6("sqrt(CAST(n_parts * q - n_rows * n_rows AS DOUBLE)) / n_rows")} AS cv
         |FROM a""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_parts"), sum("c").as("n_rows"),
          min("c").as("min_rows"), max("c").as("max_rows"),
          sum(col("c") * col("c")).as("q"))
        .select(col("n_parts"), col("n_rows"), col("min_rows"), col("max_rows"),
          Q.r6(col("n_rows").cast("double") / col("n_parts")).as("mean_rows"),
          Q.r6(col("max_rows").cast("double") * col("n_parts") / col("n_rows")).as("skew"),
          Q.r6(sqrt((col("n_parts") * col("q") - col("n_rows") * col("n_rows"))
            .cast("double")) / col("n_rows")).as("cv"))
    },

    // t-closeness audit (round 16): the third leg of the privacy trio —
    // k-anonymity bounds re-identification, l-diversity bounds
    // homogeneity, t-closeness bounds ATTRIBUTE INFERENCE: how far each
    // (nation, balance-band) class's market-segment distribution drifts
    // from the global one, measured as total variation distance (the
    // equal-ground-distance EMD). The 20 worst classes plus their
    // violation flag at t = 0.3. The five segment shares pivot to FIXED
    // columns (max(CASE) — the domain is a 5-value enum), so each
    // class's TVD is ONE fixed-order expression over exact integer
    // counts — no float reduction whose order could differ; ranking is
    // on the ROUNDED tvd with (nation, band) tie-breaks (ulp-proof, the
    // q_graph_clustering move). Classes ≤ 275 — everything after the
    // one corpus agg rides a bounded frame.
    Q("q_t_closeness",
      s"""WITH c0 AS (SELECT c_nationkey,
         |                   CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         |                   c_mktsegment, CAST(count(*) AS BIGINT) AS c
         |            FROM customer GROUP BY 1, 2, 3),
         |g AS (SELECT c_nationkey, bal_band, CAST(sum(c) AS BIGINT) AS k,
         |             CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c ELSE 0 END) AS BIGINT) AS c1,
         |             CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN c ELSE 0 END) AS BIGINT) AS c2,
         |             CAST(sum(CASE WHEN c_mktsegment = 'FURNITURE' THEN c ELSE 0 END) AS BIGINT) AS c3,
         |             CAST(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN c ELSE 0 END) AS BIGINT) AS c4,
         |             CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN c ELSE 0 END) AS BIGINT) AS c5
         |      FROM c0 GROUP BY 1, 2),
         |t AS (SELECT CAST(sum(k) AS BIGINT) AS n,
         |             CAST(sum(c1) AS BIGINT) AS g1, CAST(sum(c2) AS BIGINT) AS g2,
         |             CAST(sum(c3) AS BIGINT) AS g3, CAST(sum(c4) AS BIGINT) AS g4,
         |             CAST(sum(c5) AS BIGINT) AS g5
         |      FROM g),
         |tv AS (SELECT g.c_nationkey, g.bal_band, g.k,
         |              ${Q.sqlR6("0.5 * (" +
                  "abs(CAST(g.c1 AS DOUBLE) / g.k - CAST(t.g1 AS DOUBLE) / t.n) + " +
                  "abs(CAST(g.c2 AS DOUBLE) / g.k - CAST(t.g2 AS DOUBLE) / t.n) + " +
                  "abs(CAST(g.c3 AS DOUBLE) / g.k - CAST(t.g3 AS DOUBLE) / t.n) + " +
                  "abs(CAST(g.c4 AS DOUBLE) / g.k - CAST(t.g4 AS DOUBLE) / t.n) + " +
                  "abs(CAST(g.c5 AS DOUBLE) / g.k - CAST(t.g5 AS DOUBLE) / t.n))")} AS tvd
         |       FROM g CROSS JOIN t)
         |SELECT c_nationkey AS nation_key, bal_band, k AS class_rows, tvd,
         |       CASE WHEN tvd > 0.3 THEN 1 ELSE 0 END AS violates_t03
         |FROM tv
         |ORDER BY tvd DESC, nation_key, bal_band
         |LIMIT 20""".stripMargin) { (s, d) =>
      val c0 = Tables.load(s, d, "customer")
        .groupBy(col("c_nationkey"),
          floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_band"),
          col("c_mktsegment"))
        .agg(count(lit(1)).as("c"))
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      val segCols = segs.zipWithIndex.map { case (sg, i) =>
        sum(when(col("c_mktsegment") === sg, col("c")).otherwise(0L)).as(s"c${i + 1}")
      }
      val g = c0.groupBy("c_nationkey", "bal_band")
        .agg(sum("c").as("k"), segCols: _*)
        .transform(Q.snapshot)
      val t = g.agg(sum("k").as("n"),
        (1 to 5).map(i => sum(s"c$i").as(s"g$i")): _*)
      val tvd = (1 to 5).map { i =>
        abs(col(s"c$i").cast("double") / col("k") - col(s"g$i").cast("double") / col("n"))
      }.reduce(_ + _)
      g.crossJoin(broadcast(t))
        .select(col("c_nationkey").as("nation_key"), col("bal_band"),
          col("k").as("class_rows"), Q.r6(lit(0.5) * tvd).as("tvd"))
        .withColumn("violates_t03", when(col("tvd") > 0.3, 1).otherwise(0))
        .orderBy(col("tvd").desc, col("nation_key"), col("bal_band"))
        .limit(20)
    },

    // Imputation-quality harness (round 16): mask a deterministic 10%
    // of customer balances (c_custkey % 10 = 0 — reproducible, not
    // sampled), train three imputers on the UNMASKED rows (global
    // mean, per-nation mean, per-segment mean) and score them against
    // the held-out truth — the backfill-strategy decision every
    // data-quality pipeline makes before filling a column. Truth is
    // int64 cents; each masked row's |error| and signed error floor
    // onto the 1e3 lattice BEFORE the per-imputer sums (order-free
    // int64); imputer tables are ≤25-row broadcasts. A nation with
    // every row masked imputes NULL and is skipped identically in
    // both engines (counted in n_unimputable).
    Q("q_impute_quality",
      s"""WITH cv AS (SELECT c_custkey, c_nationkey, c_mktsegment,
         |                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v,
         |                   CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END AS masked
         |            FROM customer),
         |gm AS (SELECT CAST(sum(v) AS DOUBLE) / count(*) AS m FROM cv WHERE masked = 0),
         |nm AS (SELECT c_nationkey, CAST(sum(v) AS DOUBLE) / count(*) AS m
         |       FROM cv WHERE masked = 0 GROUP BY 1),
         |sm AS (SELECT c_mktsegment, CAST(sum(v) AS DOUBLE) / count(*) AS m
         |       FROM cv WHERE masked = 0 GROUP BY 1),
         |mk AS (SELECT cv.v, gm.m AS img, nm.m AS imn, sm.m AS ims
         |       FROM cv CROSS JOIN gm
         |       LEFT JOIN nm ON cv.c_nationkey = nm.c_nationkey
         |       LEFT JOIN sm ON cv.c_mktsegment = sm.c_mktsegment
         |       WHERE cv.masked = 1),
         |f AS (SELECT 'global_mean' AS imputer,
         |             CAST(count(img) AS BIGINT) AS n_scored,
         |             CAST(count(*) - count(img) AS BIGINT) AS n_unimputable,
         |             CAST(sum(CAST(floor(abs(v - img) * 1e3 + 0.5) AS BIGINT)) AS BIGINT) AS ae3,
         |             CAST(sum(CAST(floor((img - v) * 1e3 + 0.5) AS BIGINT)) AS BIGINT) AS se3
         |      FROM mk
         |      UNION ALL
         |      SELECT 'nation_mean', CAST(count(imn) AS BIGINT),
         |             CAST(count(*) - count(imn) AS BIGINT),
         |             CAST(sum(CAST(floor(abs(v - imn) * 1e3 + 0.5) AS BIGINT)) AS BIGINT),
         |             CAST(sum(CAST(floor((imn - v) * 1e3 + 0.5) AS BIGINT)) AS BIGINT)
         |      FROM mk
         |      UNION ALL
         |      SELECT 'segment_mean', CAST(count(ims) AS BIGINT),
         |             CAST(count(*) - count(ims) AS BIGINT),
         |             CAST(sum(CAST(floor(abs(v - ims) * 1e3 + 0.5) AS BIGINT)) AS BIGINT),
         |             CAST(sum(CAST(floor((ims - v) * 1e3 + 0.5) AS BIGINT)) AS BIGINT)
         |      FROM mk)
         |SELECT imputer, n_scored, n_unimputable,
         |       ${Q.sqlR4("CAST(ae3 AS DOUBLE) / 1e3 / n_scored")} AS mae_cents,
         |       ${Q.sqlR4("CAST(se3 AS DOUBLE) / 1e3 / n_scored")} AS bias_cents
         |FROM f
         |ORDER BY imputer""".stripMargin) { (s, d) =>
      val cv = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("v"),
          when(col("c_custkey") % 10 === 0, 1).otherwise(0).as("masked"))
        .transform(Q.snapshot)
      val un = cv.filter(col("masked") === 0)
      val gm = un.agg((sum("v").cast("double") / count(lit(1))).as("img"))
      val nm = un.groupBy("c_nationkey")
        .agg((sum("v").cast("double") / count(lit(1))).as("imn"))
      val sm = un.groupBy("c_mktsegment")
        .agg((sum("v").cast("double") / count(lit(1))).as("ims"))
      val mk = cv.filter(col("masked") === 1)
        .crossJoin(broadcast(gm))
        .join(broadcast(nm), Seq("c_nationkey"), "left")
        .join(broadcast(sm), Seq("c_mktsegment"), "left")
        .select(col("v"), col("img"), col("imn"), col("ims"))
        .transform(Q.snapshot)
      def scoreOf(imp: String, name: String) =
        mk.filter(col(imp).isNotNull)
          .agg(count(col(imp)).as("n_scored"),
            sum(floor(abs(col("v") - col(imp)) * lit(1e3) + 0.5).cast("long")).as("ae3"),
            sum(floor((col(imp) - col("v")) * lit(1e3) + 0.5).cast("long")).as("se3"))
          .crossJoin(broadcast(mk.agg(count(lit(1)).as("n_all"))))
          .select(lit(name).as("imputer"), col("n_scored"),
            (col("n_all") - col("n_scored")).as("n_unimputable"),
            Q.r4(col("ae3").cast("double") / lit(1e3) / col("n_scored")).as("mae_cents"),
            Q.r4(col("se3").cast("double") / lit(1e3) / col("n_scored")).as("bias_cents"))
      scoreOf("img", "global_mean")
        .unionByName(scoreOf("imn", "nation_mean"))
        .unionByName(scoreOf("ims", "segment_mean"))
        .orderBy("imputer")
    })
}
