package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar functions (SURVEY §2.8): strings, datetime, math, arrays,
  * JSON, CASE/cast.
  *
  * All expressions here are Catalyst built-ins (whole-stage-codegen'd,
  * null-safe, vectorizable) — no UDFs anywhere. Cross-engine parity
  * traps handled explicitly:
  *  - Spark floor/ceil(double) return BIGINT while DuckDB returns
  *    DOUBLE → both sides cast to BIGINT;
  *  - double→int CAST truncates in Spark but ROUNDS in DuckDB → always
  *    floor() before casting;
  *  - day-of-week numbering differs (Spark dayofweek: Sun=1; DuckDB
  *    dow: Sun=0) → use Spark weekday()+1 == DuckDB isodow (Mon=1);
  *  - transcendental libm calls (ln/exp/pow) are only ~1-ulp accurate
  *    in either engine → inputs are kept small-magnitude and outputs
  *    rounded (Q.r6) so a last-bit difference cannot flip the rounded
  *    value;
  *  - dates are projected as formatted strings (engine-native DATE
  *    objects stringify differently through pandas).
  */
object Scalars {

  def defs: Seq[QueryDef] = Seq(

    // -- strings -------------------------------------------------------------
    Q("q_str",
      """SELECT p_partkey,
        |       upper(p_name) AS name_up,
        |       substring(p_name, 1, 5) AS name_5,
        |       CAST(length(p_name) AS BIGINT) AS name_len,
        |       concat_ws('|', p_brand, p_type) AS brand_type,
        |       replace(p_type, 'PROMO', 'PR') AS type_short,
        |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |       regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |       trim(concat(' ', p_brand, ' ')) AS brand_trim
        |FROM part
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_up"),
          substring(col("p_name"), 1, 5).as("name_5"),
          length(col("p_name")).cast(LongType).as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          replace(col("p_type"), lit("PROMO"), lit("PR")).as("type_short"),
          lpad(col("p_size").cast(StringType), 4, "0").as("size_pad"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          trim(concat(lit(" "), col("p_brand"), lit(" "))).as("brand_trim"))
        .orderBy("p_partkey")
    },

    // -- datetime ------------------------------------------------------------
    Q("q_date",
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(month(o_orderdate) AS INT) AS mo,
        |       CAST(day(o_orderdate) AS INT) AS dy,
        |       CAST(isodow(o_orderdate) AS INT) AS dow_iso,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dy"),
          (weekday(col("o_orderdate")) + 1).as("dow_iso"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          datediff(col("o_orderdate").cast(DateType), to_date(lit("1995-01-01"))).as("days_since"),
          date_format(date_add(col("o_orderdate").cast(DateType), 30), "yyyy-MM-dd").as("plus30"))
        .orderBy("o_orderkey")
    },

    // -- math ----------------------------------------------------------------
    // Inputs kept small (quantity ≤ 50, discount ≤ 0.1) so libm 1-ulp
    // differences sit ~10 orders of magnitude below the r6/r4 rounding
    // grid. floor/ceil cast to BIGINT on both sides.
    Q("q_math",
      """SELECT l_orderkey, l_linenumber,
        |       floor((power(l_quantity, 2))*10000+0.5)/10000 AS qty_sq,
        |       floor((sqrt(l_quantity))*1000000+0.5)/1000000 AS qty_sqrt,
        |       floor((ln(l_quantity + 1))*1000000+0.5)/1000000 AS qty_ln,
        |       floor((exp(l_discount))*1000000+0.5)/1000000 AS disc_exp,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |       floor((abs(l_discount - 0.05))*1000000+0.5)/1000000 AS disc_dev,
        |       l_orderkey % 7 AS key_mod
        |FROM lineitem
        |WHERE l_orderkey % 13 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.load(s, d, "lineitem")
        .filter(col("l_orderkey") % 13 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          Q.r4(pow(col("l_quantity"), 2)).as("qty_sq"),
          Q.r6(sqrt(col("l_quantity"))).as("qty_sqrt"),
          Q.r6(log(col("l_quantity") + 1)).as("qty_ln"),
          Q.r6(exp(col("l_discount"))).as("disc_exp"),
          floor(col("l_extendedprice")).cast(LongType).as("price_floor"),
          ceil(col("l_extendedprice")).cast(LongType).as("price_ceil"),
          Q.r6(abs(col("l_discount") - 0.05)).as("disc_dev"),
          (col("l_orderkey") % 7).as("key_mod"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // -- arrays (tokenize via split; SURVEY §2.8 q_array) --------------------
    Q("q_array",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        |SELECT doc_id,
        |       CAST(len(words) AS INT) AS n_words,
        |       CAST(len(list_distinct(words)) AS INT) AS n_distinct,
        |       list_contains(words, 'spark') AS has_spark,
        |       words[1] AS first_word,
        |       words[-1] AS last_word,
        |       array_to_string(list_sort(list_distinct(words))[1:3], ',') AS head3
        |FROM w
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.load(s, d, "documents")
        .withColumn("words", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("words")).as("n_words"),
          size(array_distinct(col("words"))).as("n_distinct"),
          array_contains(col("words"), "spark").as("has_spark"),
          element_at(col("words"), 1).as("first_word"),
          element_at(col("words"), -1).as("last_word"),
          array_join(slice(sort_array(array_distinct(col("words"))), 1, 3), ",").as("head3"))
        .orderBy("doc_id")
    },

    // -- JSON (the reference's per-record payload parsing made declarative) --
    Q("q_map_json",
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |       CAST(len(json_keys(props)) AS INT) AS n_keys,
        |       list_contains(json_keys(props), 'k') AS has_k
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val keysOfProps = map_keys(from_json(col("props"), MapType(StringType, StringType)))
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k_val"),
          (get_json_object(col("props"), "$.k").cast(LongType) % 10).as("k_bucket"),
          size(keysOfProps).as("n_keys"),
          array_contains(keysOfProps, "k").as("has_k"))
        .orderBy("event_id")
    },

    // -- CASE / cast ---------------------------------------------------------
    // double→int casts always floor() first: DuckDB CAST rounds,
    // Spark CAST truncates — floor makes them agree.
    Q("q_case_cast",
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice < 100000 THEN 'low'
        |            WHEN o_totalprice < 300000 THEN 'mid'
        |            ELSE 'high' END AS band,
        |       CAST(floor(o_totalprice) AS BIGINT) AS price_int,
        |       CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) AS price_str,
        |       CAST(floor((o_totalprice - floor(o_totalprice))*100 + 0.5) AS BIGINT) AS cents,
        |       CAST(substring(CAST(o_orderkey AS VARCHAR), 1, 3) AS BIGINT) AS key_prefix
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.load(s, d, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") < 100000, "low")
            .when(col("o_totalprice") < 300000, "mid")
            .otherwise("high").as("band"),
          floor(col("o_totalprice")).cast(LongType).as("price_int"),
          floor(col("o_totalprice")).cast(LongType).cast(StringType).as("price_str"),
          floor((col("o_totalprice") - floor(col("o_totalprice"))) * 100 + 0.5)
            .cast(LongType).as("cents"),
          substring(col("o_orderkey").cast(StringType), 1, 3).cast(LongType).as("key_prefix"))
        .orderBy("o_orderkey")
    }
  )
}
