package graft.ops

import graft.{Q, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoders}

/** Lexicon-level IR primitives over the documents corpus (SURVEY §2.10):
  * an inverted index, bigram association scoring (PMI-style lift),
  * per-doc lexical diversity, and deterministic per-group sampling.
  *
  * Scale notes:
  *  - every aggregation here is keyed by TOKEN (vocabulary-sized, Zipf —
  *    orders of magnitude smaller than the corpus), never by document,
  *    so the shuffles are bounded by vocabulary growth, not data growth;
  *  - postings and samples are bounded per key with the TopKAgg partial
  *    aggregator — the shuffle carries ≤ k rows per (key × partition),
  *    never a full posting list (hot tokens appear in ~every doc: an
  *    unbounded collect_list would be a straggler-maker at 100 TB);
  *  - the sampler's rank is a Lehmer permutation of the doc key — pure
  *    int64 arithmetic, identical in Spark and DuckDB, reshuffle-proof
  *    (same sample on any cluster layout), and collision-free below the
  *    2^31-1 modulus, unlike rand()-based sampling.
  */
object Lexicon {

  /** Top-k smallest doc_ids kept by TopKAgg (score = -doc_id). */
  private val PostingsK = 10

  /** Lehmer / Park–Miller permutation step: doc_id * 48271 mod (2^31-1).
    * Injective for doc_id in [0, 2^31-1), overflow-free in int64 for any
    * doc_id this side of 2^44 — the same expression works verbatim in
    * DuckDB, which is the whole point (hash-stable sampling oracle). */
  private val LehmerSql = "(doc_id * 48271) % 2147483647"

  /** DuckDB twin of the Spark-side CMS cell hash
    * `conv(substring(md5('d:' || tok), 1, 4), 16, 10) % 256`: the
    * proven instr-arithmetic hex4 parse (q_sample_stratified pairing)
    * over the depth-salted token hash. */
  private def cmsCellSql(d: String, tok: String): String = {
    val h = s"md5(CAST($d AS VARCHAR) || ':' || $tok)"
    (0 until 4).map(i =>
      s"(instr('0123456789abcdef', substring($h, ${i + 1}, 1)) - 1) * ${1 << (4 * (3 - i))}")
      .mkString("(", " + ", ") % 256")
  }

  /** CMS geometry + the ONE home of the Spark-side cell hash, shared by
    * batch q_countmin_err and the streaming face (Streams.countmin) so
    * the two grids can never drift: row `d` of [[CmsDepth]] buckets
    * token `tok` at conv(md5("d:"‖tok)[0:4], 16) mod [[CmsWidth]]. */
  private[graft] val CmsDepth = 4
  private[graft] val CmsWidth = 256
  private[graft] def cmsCellCol(dRow: Int): org.apache.spark.sql.Column =
    expr(s"CAST(conv(substring(md5(concat('$dRow:', tok)), 1, 4), 16, 10) AS BIGINT) % $CmsWidth")
  private[graft] def cmsDepthStructs: Seq[org.apache.spark.sql.Column] =
    (0 until CmsDepth).map { dRow =>
      struct(lit(dRow.toLong).as("d"), cmsCellCol(dRow).as("cell"))
    }

  def defs: Seq[QueryDef] = Seq(

    // Inverted index over the corpus: per token, document frequency,
    // total term frequency, and the first K postings (smallest doc_ids).
    // Per-doc tf is computed IN-ROW (transform over the distinct-token
    // array), so the plan has exactly ONE exchange — the token-keyed
    // rollup — and partial aggregation (sum/count + the TopKAgg buffer)
    // collapses it to ≤ vocab × partitions rows before the wire. The
    // naive two-level build would first shuffle every (doc, token) pair
    // on a near-unique composite key: a corpus-sized exchange with zero
    // combine benefit. (The in-row tf is O(distinct·len) per doc — the
    // standard CPU-for-shuffle trade; a sorted-run scan would make it
    // O(len log len) if ever needed.) Postings are bounded by TopKAgg
    // (score = -doc_id keeps the SMALLEST ids), so hot tokens ("the":
    // df ≈ corpus size) shuffle ≤ K rows per partition instead of a
    // full posting list. Output is capped to the 100 highest-df tokens
    // via TakeOrderedAndProject — a driver-bounded global top-k, not a
    // full sort. The oracle keeps the equivalent two-level SQL.
    Q("q_inverted_index",
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |per_doc AS (
         |  SELECT w, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
         |idx AS (
         |  SELECT w,
         |         count(*) AS df,
         |         CAST(sum(tf) AS BIGINT) AS tf,
         |         array_to_string(list_sort(list(doc_id))[1:$PostingsK], ',') AS first_postings
         |  FROM per_doc GROUP BY 1)
         |SELECT w, df, tf, first_postings
         |FROM idx
         |ORDER BY df DESC, w LIMIT 100""".stripMargin) { (s, d) =>
      val topk = udaf(new graft.functions.TopKAgg(PostingsK),
        Encoders.product[graft.functions.Scored])
      val perDoc = Tables.load(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(expr(
          "transform(array_distinct(ws), w -> struct(w AS w, size(filter(ws, x -> x = w)) AS tf))"))
          .as("e"))
        .select(col("doc_id"), col("e.w").as("w"), col("e.tf").cast("long").as("tf"))
      perDoc.groupBy("w")
        .agg(
          count(lit(1)).as("df"),
          sum(col("tf")).as("tf"),
          // smallest doc_ids first: score = -doc_id, TopKAgg sorts score DESC
          topk(negate(col("doc_id").cast("double")), col("doc_id")).as("top"))
        .select(col("w"), col("df"), col("tf"),
          array_join(expr("transform(top, x -> CAST(x.id AS STRING))"), ",")
            .as("first_postings"))
        .orderBy(col("df").desc, col("w"))
        .limit(100)
    },

    // Bigram association strength: lift = P(w1 w2) / (P(w1)·P(w2)) —
    // the exponent-free core of PMI (PMI = log2(lift); the log is
    // dropped because libm rounding differs across engines while
    // multiply/divide are IEEE-exact in both). Unigram and bigram
    // counts are vocabulary-sized aggregations; the two enrichment
    // joins are token-keyed (AQE broadcasts them at small scale,
    // shuffles vocab-sized — not corpus-sized — data at 100 TB). The
    // two totals are single-row broadcast cross joins.
    Q("q_cooccur_lift",
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |uc AS (SELECT w, count(*) AS nw
        |       FROM (SELECT unnest(ws) AS w FROM w) GROUP BY 1),
        |ut AS (SELECT CAST(sum(nw) AS BIGINT) AS nu FROM uc),
        |bc0 AS (SELECT bigram, count(*) AS n12
        |        FROM (SELECT unnest(list_transform(range(1, len(ws)),
        |                            i -> ws[i] || ' ' || ws[i+1])) AS bigram
        |              FROM w WHERE len(ws) >= 2) GROUP BY 1),
        |bt AS (SELECT CAST(sum(n12) AS BIGINT) AS nb FROM bc0),
        |j AS (SELECT bc.bigram, bc.n12,
        |             (CAST(bc.n12 AS DOUBLE) * ut.nu * ut.nu) /
        |             (CAST(bt.nb AS DOUBLE) * u1.nw * u2.nw) AS lift
        |      FROM bc0 bc, ut, bt, uc u1, uc u2
        |      WHERE bc.n12 >= 5
        |        AND split_part(bc.bigram, ' ', 1) = u1.w
        |        AND split_part(bc.bigram, ' ', 2) = u2.w)
        |SELECT bigram, n12, floor((lift)*10000+0.5)/10000 AS lift
        |FROM j
        |ORDER BY lift DESC, bigram LIMIT 20""".stripMargin) { (s, d) =>
      val ws = Tables.load(s, d, "documents").select(split(col("text"), " ").as("ws"))
      val uc = ws.select(explode(col("ws")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("nw"))
      // totals derived from the count tables: vocabulary-sized inputs,
      // no extra corpus scan
      val ut = uc.agg(sum(col("nw")).as("nu"))
      val bcAll = ws.filter(size(col("ws")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ws) - 2), i -> concat_ws(' ', ws[i], ws[i+1]))"))
          .as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n12"))
      val bc = bcAll.filter(col("n12") >= 5)
      val bt = bcAll.agg(sum(col("n12")).as("nb"))
      val u1 = uc.select(col("w").as("w1"), col("nw").as("nw1"))
      val u2 = uc.select(col("w").as("w2"), col("nw").as("nw2"))
      bc.crossJoin(broadcast(ut)).crossJoin(broadcast(bt))
        .join(u1, expr("split_part(bigram, ' ', 1)") === col("w1"))
        .join(u2, expr("split_part(bigram, ' ', 2)") === col("w2"))
        .select(col("bigram"), col("n12"),
          Q.r4((col("n12").cast("double") * col("nu") * col("nu")) /
            (col("nb").cast("double") * col("nw1") * col("nw2"))).as("lift"))
        .orderBy(col("lift").desc, col("bigram"))
        .limit(20)
    },

    // Lexical diversity per document: type-token ratio, Simpson index
    // (1 − Σtf², the log-free diversity measure — same reason
    // q_cooccur_lift drops the PMI log: libm differs across engines,
    // multiply/divide don't), and the top-token share. Everything is
    // computed IN-ROW with higher-order functions — the plan has ZERO
    // exchanges (a map-only projection; the orderBy is the output
    // contract, not a compute step). The interior sums are INT64
    // (Σtf², n², max tf), so each output is a single IEEE division of
    // two exactly-represented integers — bit-identical in DuckDB with
    // no rounding shim doing load-bearing work.
    Q("q_token_diversity",
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |            FROM documents),
         |tf AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
         |a AS (SELECT doc_id,
         |             CAST(sum(c) AS BIGINT) AS n,
         |             count(*) AS u,
         |             CAST(sum(c * c) AS BIGINT) AS s2,
         |             CAST(max(c) AS BIGINT) AS mx
         |      FROM tf GROUP BY 1)
         |SELECT doc_id, n AS n_tokens, u AS n_distinct,
         |       ${Q.sqlR6("CAST(u AS DOUBLE) / n")} AS ttr,
         |       ${Q.sqlR6("(CAST(n AS DOUBLE) * n - s2) / (CAST(n AS DOUBLE) * n)")} AS simpson,
         |       ${Q.sqlR6("CAST(mx AS DOUBLE) / n")} AS top_share
         |FROM a
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n"),
          size(array_distinct(col("ws"))).cast("long").as("u"),
          expr("""aggregate(
                 |  transform(array_distinct(ws),
                 |            w -> CAST(size(filter(ws, x -> x = w)) AS BIGINT)),
                 |  0L, (acc, c) -> acc + c * c)""".stripMargin).as("s2"),
          expr("""CAST(array_max(transform(array_distinct(ws),
                 |                w -> size(filter(ws, x -> x = w)))) AS BIGINT)"""
            .stripMargin).as("mx"))
        .select(col("doc_id"), col("n").as("n_tokens"), col("u").as("n_distinct"),
          Q.r6(col("u").cast("double") / col("n")).as("ttr"),
          Q.r6((col("n").cast("double") * col("n") - col("s2")) /
            (col("n").cast("double") * col("n"))).as("simpson"),
          Q.r6(col("mx").cast("double") / col("n")).as("top_share"))
        .orderBy("doc_id")
    },

    // Deterministic per-stratum sample: K docs per (lang, source), ranked
    // by a Lehmer permutation of doc_id. No window function: TopKAgg
    // partial-aggregates, so each stratum contributes ≤ K rows per map
    // partition to the shuffle regardless of stratum size — the
    // row_number() formulation would shuffle-and-sort every row of every
    // stratum into #strata partitions. The rank is content-derived:
    // re-running on a re-partitioned (or 1000×-larger) corpus selects
    // the same doc_ids for the strata they belong to.
    Q("q_group_sample",
      s"""WITH r AS (
         |  SELECT lang, source, doc_id,
         |         $LehmerSql AS rnd,
         |         row_number() OVER (PARTITION BY lang, source
         |                            ORDER BY $LehmerSql) AS rk
         |  FROM documents)
         |SELECT lang, source, CAST(rk AS BIGINT) AS rk, doc_id
         |FROM r WHERE rk <= 3
         |ORDER BY lang, source, rk""".stripMargin) { (s, d) =>
      val topk = udaf(new graft.functions.TopKAgg(3),
        Encoders.product[graft.functions.Scored])
      Tables.load(s, d, "documents")
        .select(col("lang"), col("source"), col("doc_id"),
          (col("doc_id") * 48271L % 2147483647L).as("rnd"))
        // smallest Lehmer ranks win: score = -rnd (exact in double: rnd < 2^31)
        .groupBy("lang", "source")
        .agg(topk(negate(col("rnd").cast("double")), col("doc_id")).as("top"))
        .select(col("lang"), col("source"), posexplode(col("top")))
        .select(col("lang"), col("source"),
          (col("pos") + 1).cast("long").as("rk"), col("col.id").as("doc_id"))
        .orderBy("lang", "source", "rk")
    },

    // Count-min sketch with an exact error audit (round 14) — the
    // mergeable frequency sketch a streaming/multi-pass pipeline keeps
    // when the vocabulary itself is too wide to hold: depth 4 × width
    // 256 counters, row d hashing each token by md5("d:" || token)
    // (deterministic, engine-portable — the q_minhash_est_err move
    // applied to frequencies), estimate = min over rows. The audit
    // reports, for the top-20 true tokens, the estimate next to the
    // exact count and the overestimate (CMS never underestimates —
    // asserted in tests; expected overshoot ≈ Σcnt·depth/width per
    // row). Shape: ONE vocab agg snapshot feeds both the 1024-cell
    // grid (in-row ×4 depth fan-out, map-side partials onto FIXED
    // keys) and the bounded top-20 TakeOrdered; estimates join the
    // broadcast grid. Nothing after the vocab collapse grows with the
    // corpus, and the grid is 1024 int64 cells at any scale.
    Q("q_countmin_err",
      s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
         |dd AS (SELECT unnest(range(0, 4)) AS d),
         |cells AS (SELECT c.cnt, dd.d, ${cmsCellSql("dd.d", "c.tok")} AS cell
         |          FROM c CROSS JOIN dd),
         |grid AS (SELECT d, cell, CAST(sum(cnt) AS BIGINT) AS cs
         |         FROM cells GROUP BY 1, 2),
         |top AS (SELECT tok, cnt FROM c ORDER BY cnt DESC, tok LIMIT 20),
         |tc AS (SELECT top.tok, top.cnt, dd.d, ${cmsCellSql("dd.d", "top.tok")} AS cell
         |       FROM top CROSS JOIN dd),
         |est AS (SELECT tc.tok, tc.cnt, CAST(min(g.cs) AS BIGINT) AS est
         |        FROM tc JOIN grid g ON g.d = tc.d AND g.cell = tc.cell
         |        GROUP BY 1, 2)
         |SELECT tok AS token, cnt AS true_cnt, est AS est_cnt,
         |       CAST(est - cnt AS BIGINT) AS overest
         |FROM est
         |ORDER BY true_cnt DESC, token""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .transform(Q.snapshot) // feeds the grid AND the top-20
      def fanOut(df: org.apache.spark.sql.DataFrame) = df
        .select(col("tok"), col("cnt"), explode(array(cmsDepthStructs: _*)).as("dc"))
        .select(col("tok"), col("cnt"), col("dc.d").as("d"), col("dc.cell").as("cell"))
      val grid = fanOut(c).groupBy("d", "cell").agg(sum("cnt").as("cs"))
      val top = c.orderBy(col("cnt").desc, col("tok")).limit(20)
      fanOut(top)
        .join(broadcast(grid), Seq("d", "cell"))
        .groupBy("tok", "cnt").agg(min("cs").as("est"))
        .select(col("tok").as("token"), col("cnt").as("true_cnt"),
          col("est").as("est_cnt"), (col("est") - col("cnt")).as("overest"))
        .orderBy(col("true_cnt").desc, col("token"))
    },

    // Zipf-law fit over the corpus unigram frequency spectrum (round
    // 10) — the distributional sanity check for synthetic / filtered
    // text: natural language has ln(freq) ≈ a − s·ln(rank) with s ≈ 1;
    // a flat or broken slope flags templated or deduplicated-to-death
    // corpora. OLS over the top-1000 (ln rank, ln freq) points. Ranks
    // come from INTEGER counts with a token tie-break (round-before-
    // top-k: the boundary is engine-exact); each ln is integer-scaled
    // to 1e-6 per point BEFORE the sums, so all five sufficient
    // statistics are exact int64 (|x6| ≤ 7e6 ⇒ Σx² ≤ 5e16) and the
    // slope/r² formula runs in doubles over identical integers (the
    // q_trend_fit move). Shape: one (token)-key count agg with
    // map-side partials, a 1000-row top-k, then a single-row fit —
    // the global sort is over the top-k frame only.
    Q("q_zipf_fit",
      s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         |c AS (SELECT tok, count(*) AS cnt FROM w GROUP BY 1),
         |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rk FROM c),
         |p AS (SELECT CAST(floor(ln(CAST(rk AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x6,
         |             CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y6
         |      FROM r WHERE rk <= 1000),
         |st AS (SELECT count(*) AS n,
         |              CAST(sum(x6) AS BIGINT) AS sx, CAST(sum(y6) AS BIGINT) AS sy,
         |              CAST(sum(x6 * y6) AS BIGINT) AS sxy,
         |              CAST(sum(x6 * x6) AS BIGINT) AS sxx,
         |              CAST(sum(y6 * y6) AS BIGINT) AS syy
         |       FROM p)
         |SELECT n,
         |       ${Q.sqlR6("(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)")} AS slope,
         |       ${Q.sqlR6("(CAST(sy AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sxy) / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) / 1e6")} AS intercept,
         |       ${Q.sqlR6("(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) * (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) / ((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))")} AS r2
         |FROM st""".stripMargin) { (s, d) =>
      val c = Tables.load(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      // top-1000 by integer count with token tie-break, THEN the rank
      // window over just that 1000-row frame (never a global window)
      val top = c.orderBy(col("cnt").desc, col("tok")).limit(1000)
        .withColumn("rk", row_number().over(Window.orderBy(col("cnt").desc, col("tok"))))
      val p = top.select(
        floor(log(col("rk").cast("double")) * lit(1e6) + 0.5).cast("long").as("x6"),
        floor(log(col("cnt").cast("double")) * lit(1e6) + 0.5).cast("long").as("y6"))
      val st = p.agg(count(lit(1)).as("n"),
        sum("x6").as("sx"), sum("y6").as("sy"),
        sum(col("x6") * col("y6")).as("sxy"),
        sum(col("x6") * col("x6")).as("sxx"),
        sum(col("y6") * col("y6")).as("syy"))
      val den = col("n") * col("sxx").cast("double") - col("sx").cast("double") * col("sx")
      val num = col("n") * col("sxy").cast("double") - col("sx").cast("double") * col("sy")
      st.select(col("n"),
        Q.r6(num / den).as("slope"),
        Q.r6((col("sy").cast("double") * col("sxx") -
          col("sx").cast("double") * col("sxy")) / den / lit(1e6)).as("intercept"),
        Q.r6(num * num / (den *
          (col("n") * col("syy").cast("double") -
            col("sy").cast("double") * col("sy")))).as("r2"))
    },

    // TextRank keyword scoring per language (round 15): PageRank
    // (d = 0.85, 3 unrolled rounds — the q_pagerank recipe verbatim)
    // over the word co-occurrence graph, edges between words within
    // token distance ≤ 2 (the window-2 TextRank construction),
    // undirected and deduplicated, self-loops dropped. The
    // graph-centrality companion of q_keyphrase's frequency scoring:
    // a word bridging many distinct contexts outranks one repeated in
    // a single template. Every iteration is one (lang, word)-keyed
    // join + agg on the snapshot edge frame (vocabulary-pair-bounded,
    // Zipf² — orders below the corpus); readout ranks the 1e-6-rounded
    // score with the word tie-break through per-lang bounded-buffer
    // TopK partials (no vocab-sized rank window).
    Q("q_textrank",
      """WITH t AS (SELECT doc_id, lang,
        |                  unnest(string_split(text, ' ')) AS w,
        |                  generate_subscripts(string_split(text, ' '), 1) AS pos
        |           FROM documents),
        |adj AS (SELECT lang, w,
        |               lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
        |               lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |        FROM t),
        |pr0 AS (SELECT lang, w AS a, w1 AS b FROM adj WHERE w1 IS NOT NULL AND w <> w1
        |        UNION ALL
        |        SELECT lang, w, w2 FROM adj WHERE w2 IS NOT NULL AND w <> w2),
        |und AS (SELECT DISTINCT lang, LEAST(a, b) AS a, GREATEST(a, b) AS b FROM pr0),
        |edges AS (SELECT lang, a AS src, b AS dst FROM und
        |          UNION ALL SELECT lang, b, a FROM und),
        |deg AS (SELECT lang, src, count(*) AS outdeg FROM edges GROUP BY 1, 2),
        |nn AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM deg GROUP BY 1),
        |it0 AS (SELECT d.lang, d.src AS node, 1.0 / nn.n AS pr
        |        FROM deg d JOIN nn ON d.lang = nn.lang),
        |it1 AS (SELECT e.lang, e.dst AS node,
        |               0.15 / nn.n + 0.85 * sum(r.pr / d.outdeg) AS pr
        |        FROM edges e JOIN it0 r ON e.lang = r.lang AND e.src = r.node
        |                     JOIN deg d ON e.lang = d.lang AND e.src = d.src
        |                     JOIN nn ON e.lang = nn.lang
        |        GROUP BY e.lang, e.dst, nn.n),
        |it2 AS (SELECT e.lang, e.dst AS node,
        |               0.15 / nn.n + 0.85 * sum(r.pr / d.outdeg) AS pr
        |        FROM edges e JOIN it1 r ON e.lang = r.lang AND e.src = r.node
        |                     JOIN deg d ON e.lang = d.lang AND e.src = d.src
        |                     JOIN nn ON e.lang = nn.lang
        |        GROUP BY e.lang, e.dst, nn.n),
        |it3 AS (SELECT e.lang, e.dst AS node,
        |               0.15 / nn.n + 0.85 * sum(r.pr / d.outdeg) AS pr
        |        FROM edges e JOIN it2 r ON e.lang = r.lang AND e.src = r.node
        |                     JOIN deg d ON e.lang = d.lang AND e.src = d.src
        |                     JOIN nn ON e.lang = nn.lang
        |        GROUP BY e.lang, e.dst, nn.n),
        |rk AS (SELECT lang, node, floor(pr*1000000+0.5)/1000000 AS pr6,
        |              row_number() OVER (PARTITION BY lang
        |                ORDER BY floor(pr*1000000+0.5)/1000000 DESC, node) AS rk
        |       FROM it3)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, node AS word, pr6 AS textrank
        |FROM rk WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin) { (s, d) =>
      val t = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val wd = Window.partitionBy("doc_id").orderBy("pos")
      val adj = t
        .withColumn("w1", lead("w", 1).over(wd))
        .withColumn("w2", lead("w", 2).over(wd))
      val pr0 = adj.filter(col("w1").isNotNull && col("w") =!= col("w1"))
        .select(col("lang"), col("w").as("a"), col("w1").as("b"))
        .unionAll(adj.filter(col("w2").isNotNull && col("w") =!= col("w2"))
          .select(col("lang"), col("w").as("a"), col("w2").as("b")))
      val und = pr0.select(col("lang"),
        least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
        .distinct()
      val edges = und.select(col("lang"), col("a").as("src"), col("b").as("dst"))
        .unionAll(und.select(col("lang"), col("b").as("src"), col("a").as("dst")))
      val deg = edges.groupBy("lang", "src").agg(count(lit(1)).as("outdeg"))
      val e = edges.join(deg, Seq("lang", "src")).transform(Q.snapshot)
      // node table and per-lang count derive from the SNAPSHOT, not from
      // `deg` (r18): deg's subtree is the whole corpus front (token
      // explode + two doc windows + the pair distinct), and the rank
      // seed plus each round's broadcast(nn) would otherwise re-plan —
      // and, outside exchange-reuse luck, re-run — that front up to 4×.
      // (lang, src, outdeg) rows repeat per dst in e; distinct restores
      // exactly deg's rows.
      val nodes = e.select(col("lang"), col("src"), col("outdeg")).distinct()
      val nn = nodes.groupBy("lang").agg(count(lit(1)).as("n"))
      var ranks = nodes.select(col("lang"), col("src").as("node"))
        .join(broadcast(nn), Seq("lang"))
        .select(col("lang"), col("node"), (lit(1.0) / col("n")).as("pr"))
      for (_ <- 1 to 3) {
        ranks = e
          .join(ranks.withColumnRenamed("node", "src"), Seq("lang", "src"))
          .groupBy(col("lang"), col("dst").as("node"))
          .agg(sum(col("pr") / col("outdeg")).as("mass"))
          .join(broadcast(nn), Seq("lang"))
          .select(col("lang"), col("node"),
            (lit(0.15) / col("n") + lit(0.85) * col("mass")).as("pr"))
      }
      val topk10 = udaf(new graft.functions.TopKStrAgg(10),
        Encoders.product[graft.functions.ScoredStr])
      ranks.select(col("lang"), col("node"), Q.r6(col("pr")).as("pr6"))
        .groupBy("lang").agg(topk10(col("pr6"), col("node")).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
          col("col.id").as("word"), col("col.score").as("textrank"))
        .orderBy("lang", "rk")
    },

    // RAKE-lite keyword extraction per language (round 15): stopwords
    // are DATA-DRIVEN — each language's top-10 tokens by frequency
    // (exactly the list q_stopword_profile sizes) — documents split
    // into stopword-delimited phrases (gaps-and-islands on token
    // positions), and every candidate word scores degree/frequency,
    // where degree sums the LENGTHS of the phrases the word occurs in
    // (RAKE's co-occurrence credit: words living in long content
    // phrases outrank isolated ones). Determinism: degree and freq are
    // exact int64, the score is one division of them (identical
    // doubles rank identically in both engines), ties break on the
    // token's UTF-8 order; both the stop set and the top-10 keywords
    // ride bounded-buffer TopK partials — no vocabulary-sized rank
    // window anywhere (the Heaps-law discipline). Shape: one corpus
    // token explode, position windows partitioned BY DOC (each tiny),
    // token-keyed aggs, ≤10·|langs| output rows.
    Q("q_keyphrase",
      """WITH t AS (SELECT doc_id, lang,
        |                  unnest(string_split(text, ' ')) AS w,
        |                  generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
        |           FROM documents),
        |cnt AS (SELECT lang, w, count(*) AS c FROM t GROUP BY 1, 2),
        |stp AS (SELECT lang, w FROM (
        |          SELECT lang, w,
        |                 row_number() OVER (PARTITION BY lang ORDER BY c DESC, w) AS rk
        |          FROM cnt) WHERE rk <= 10),
        |ns AS (SELECT t.doc_id, t.lang, t.w, t.pos,
        |              CAST(t.pos - row_number() OVER (PARTITION BY t.doc_id
        |                     ORDER BY t.pos) AS BIGINT) AS grp
        |       FROM t ANTI JOIN stp ON t.lang = stp.lang AND t.w = stp.w),
        |ph AS (SELECT doc_id, lang, w, grp,
        |              CAST(count(*) OVER (PARTITION BY doc_id, grp) AS BIGINT) AS l
        |       FROM ns),
        |ws AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS freq,
        |              CAST(sum(l) AS BIGINT) AS degree
        |       FROM ph GROUP BY 1, 2),
        |r AS (SELECT lang, w, freq, degree,
        |             row_number() OVER (PARTITION BY lang
        |               ORDER BY CAST(degree AS DOUBLE) / freq DESC, w) AS rk
        |      FROM ws)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, w AS keyword, freq, degree,
        |       floor((CAST(degree AS DOUBLE) / freq)*1000000+0.5)/1000000 AS score
        |FROM r WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin) { (s, d) =>
      val topk10 = udaf(new graft.functions.TopKStrAgg(10),
        Encoders.product[graft.functions.ScoredStr])
      val t = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val stops = t.groupBy("lang", "w").agg(count(lit(1)).as("c"))
        .groupBy("lang").agg(topk10(col("c").cast("double"), col("w")).as("st"))
        .select(col("lang"), expr("transform(st, x -> x.id)").as("stops"))
      val ns = t.join(broadcast(stops), Seq("lang"))
        .filter(!array_contains(col("stops"), col("w")))
        .withColumn("grp", col("pos") -
          row_number().over(Window.partitionBy("doc_id").orderBy("pos")))
      val ws = ns
        .withColumn("l", count(lit(1)).over(Window.partitionBy("doc_id", "grp")))
        .groupBy("lang", "w")
        .agg(count(lit(1)).as("freq"), sum("l").as("degree"))
      val top = ws
        .groupBy("lang")
        .agg(topk10((col("degree").cast("double") / col("freq")), col("w")).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
          col("col.id").as("w"))
      ws.join(broadcast(top), Seq("lang", "w"))
        .select(col("lang"), col("rk"), col("w").as("keyword"),
          col("freq"), col("degree"),
          Q.r6(col("degree").cast("double") / col("freq")).as("score"))
        .orderBy("lang", "rk")
    },

    // Chao1 vocabulary-richness estimator + Good–Turing sample
    // coverage per language (round 15): the "how much vocabulary is
    // still unseen" readout a curation team runs BEFORE deciding
    // whether more crawl is worth buying — chao1 = V + f1(f1−1)/
    // (2(f2+1)) (the bias-corrected form: defined even when no type
    // occurs exactly twice) extrapolates total vocabulary from the
    // hapax/dis-legomena ratio, and coverage = 1 − f1/N is Good &
    // Turing's estimate of the token mass already seen. The
    // diminishing-returns companion of q_heaps_fit's growth exponent
    // (that fits the curve; this one reads its asymptote). Every
    // sufficient statistic (V, N, f1, f2) is an exact int64 count off
    // one (lang, token) agg with map-side partials; the two divisions
    // are single IEEE ops on exact integers — nothing to lattice.
    // Scale: the only shuffle is vocabulary-keyed (Zipf — orders
    // below the corpus), the readout is |langs| rows, no window.
    Q("q_chao1",
      s"""WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
         |           FROM documents),
         |tf AS (SELECT lang, tok, count(*) AS c FROM w GROUP BY 1, 2),
         |a AS (SELECT lang,
         |             CAST(sum(c) AS BIGINT) AS n,
         |             CAST(count(*) AS BIGINT) AS v,
         |             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         |             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
         |      FROM tf GROUP BY 1)
         |SELECT lang, n AS n_tokens, v AS n_types, f1, f2,
         |       ${Q.sqlR2("v + CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1))")} AS chao1,
         |       ${Q.sqlR6("1.0 - CAST(f1 AS DOUBLE) / n")} AS coverage
         |FROM a
         |ORDER BY lang""".stripMargin) { (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
        .groupBy("lang")
        .agg(sum("c").as("n"), count(lit(1)).as("v"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
        .select(col("lang"), col("n").as("n_tokens"), col("v").as("n_types"),
          col("f1"), col("f2"),
          Q.r2(col("v") + col("f1").cast("double") * (col("f1") - 1) /
            (lit(2.0) * (col("f2") + 1))).as("chao1"),
          Q.r6(lit(1.0) - col("f1").cast("double") / col("n")).as("coverage"))
        .orderBy("lang")
    },

    // Word-bigram conditional entropy per language (round 15):
    // H(W₂|W₁) = Σ (c₁₂/N)·ln(c₁·/c₁₂) in nats over the in-document
    // word-bigram counts — how predictable the NEXT word is given the
    // current one; the lexical twin of q_entropy_rate's event-chain
    // number and the sequence-level signal q_char_entropy (characters)
    // and q_yule_k (unigram repetition) cannot see: templated text
    // reads LOW H even with a healthy vocabulary. Evenness divides by
    // ln(V₁) (the uniform-transition bound over observed first words).
    // Exactness: every count is int64 off one (lang, w1, w2) agg (the
    // bigram shape — vocabulary²-bounded, Zipf²); each cell's term
    // integer-scales to 1e-9 BEFORE the cross-cell sum (the
    // q_cat_entropy move), so the reduction is an order-free int64
    // fold; ln(V₁) is one libm call per language on an exact integer.
    Q("q_word_entropy",
      s"""WITH w AS (SELECT lang, string_split(text, ' ') AS words FROM documents),
         |b AS (SELECT lang, unnest(list_transform(range(1, len(words)),
         |             i -> words[i])) AS w1,
         |             unnest(list_transform(range(1, len(words)),
         |             i -> words[i+1])) AS w2
         |      FROM w WHERE len(words) >= 2),
         |c12 AS (SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2, 3),
         |c1 AS (SELECT lang, w1, CAST(sum(c) AS BIGINT) AS c1 FROM c12 GROUP BY 1, 2),
         |t AS (SELECT c12.lang,
         |             CAST(sum(c12.c) AS BIGINT) AS n,
         |             CAST(count(DISTINCT c12.w1) AS BIGINT) AS v1,
         |             CAST(sum(CAST(floor(CAST(c12.c AS DOUBLE) / st.n *
         |               ln(CAST(c1.c1 AS DOUBLE) / c12.c) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS h9
         |      FROM c12
         |      JOIN c1 ON c12.lang = c1.lang AND c12.w1 = c1.w1
         |      JOIN (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM c12 GROUP BY 1) st
         |        ON c12.lang = st.lang
         |      GROUP BY 1)
         |SELECT lang, n AS n_bigrams, v1 AS n_first_words,
         |       ${Q.sqlR6("h9 / 1e9")} AS h_cond,
         |       CASE WHEN v1 > 1 THEN ${Q.sqlR6("h9 / 1e9 / ln(CAST(v1 AS DOUBLE))")} END AS evenness
         |FROM t
         |ORDER BY lang""".stripMargin) { (s, d) =>
      val b = Tables.load(s, d, "documents")
        .select(col("lang"), split(col("text"), " ").as("words"))
        .filter(size(col("words")) >= 2)
        .select(col("lang"), explode(expr(
          """transform(sequence(0, size(words) - 2),
            |          i -> struct(words[i] AS w1, words[i+1] AS w2))""".stripMargin))
          .as("bg"))
        .select(col("lang"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val c12 = b.groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c"))
        .transform(Q.snapshot) // feeds the margin, the total and the fold
      val c1 = c12.groupBy("lang", "w1").agg(sum("c").as("c1"))
      val st = c12.groupBy("lang").agg(sum("c").as("n"))
      c12.join(c1, Seq("lang", "w1")).join(st, "lang")
        .groupBy("lang")
        .agg(max("n").as("n"), countDistinct("w1").as("v1"),
          sum(floor(col("c").cast("double") / col("n") *
            log(col("c1").cast("double") / col("c")) * lit(1e9) + 0.5)
            .cast("long")).as("h9"))
        .select(col("lang"), col("n").as("n_bigrams"), col("v1").as("n_first_words"),
          Q.r6(col("h9") / lit(1e9)).as("h_cond"),
          when(col("v1") > 1,
            Q.r6(col("h9") / lit(1e9) / log(col("v1").cast("double")))).as("evenness"))
        .orderBy("lang")
    },

    // Yule's characteristic K per language (round 15): K = 10⁴·(Σc² −
    // N)/N² over the term-frequency spectrum — the classical
    // repetitiveness constant (scale-invariant under corpus growth for
    // genuinely Zipfian text), which spikes on templated or
    // boilerplate-heavy sources where q_token_diversity's per-doc TTR
    // still looks healthy. Same (lang, token) agg as q_chao1; Σc² is
    // an exact int64 fold (c_max·N ≤ N² ≈ 9e12 per language at sf1 —
    // int64 holds to sf ≈ 300 even for degenerate single-token
    // corpora; Zipfian text sits orders below that), and K is one
    // IEEE tree over two exact integers in both engines.
    Q("q_yule_k",
      s"""WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
         |           FROM documents),
         |tf AS (SELECT lang, tok, count(*) AS c FROM w GROUP BY 1, 2),
         |a AS (SELECT lang,
         |             CAST(sum(c) AS BIGINT) AS n,
         |             CAST(count(*) AS BIGINT) AS v,
         |             CAST(sum(c * c) AS BIGINT) AS m2
         |      FROM tf GROUP BY 1)
         |SELECT lang, n AS n_tokens, v AS n_types, m2,
         |       ${Q.sqlR6("1e4 * (CAST(m2 AS DOUBLE) - n) / (CAST(n AS DOUBLE) * n)")} AS yule_k
         |FROM a
         |ORDER BY lang""".stripMargin) { (s, d) =>
      Tables.load(s, d, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
        .groupBy("lang")
        .agg(sum("c").as("n"), count(lit(1)).as("v"),
          sum(col("c") * col("c")).as("m2"))
        .select(col("lang"), col("n").as("n_tokens"), col("v").as("n_types"),
          col("m2"),
          Q.r6(lit(1e4) * (col("m2").cast("double") - col("n")) /
            (col("n").cast("double") * col("n"))).as("yule_k"))
        .orderBy("lang")
    },

    // Word-length histogram per language (round 17): token counts by
    // length band 1..15 (15 = "15+") plus each band's share and the
    // language's exact mean token length — the cheapest corpus
    // FINGERPRINT (a tokenizer/mojibake regression or a language
    // mislabel shifts the profile before any statistical screen
    // fires). Pure integers until the two readout divisions; the
    // explode collapses map-side onto the ≤ |langs|·15 band domain —
    // the smallest possible exchange for a corpus-wide profile.
    Q("q_word_len_hist",
      s"""WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
         |           FROM documents),
         |b AS (SELECT lang, least(length(tok), 15) AS wlen,
         |             CAST(count(*) AS BIGINT) AS n,
         |             CAST(sum(length(tok)) AS BIGINT) AS chars
         |      FROM w GROUP BY 1, 2),
         |t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tot,
         |             CAST(sum(chars) AS BIGINT) AS tchars
         |      FROM b GROUP BY 1)
         |SELECT b.lang, CAST(b.wlen AS BIGINT) AS wlen, b.n AS n_words,
         |       ${Q.sqlR6("CAST(b.n AS DOUBLE) / t.tot")} AS share,
         |       ${Q.sqlR4("CAST(t.tchars AS DOUBLE) / t.tot")} AS mean_len
         |FROM b JOIN t USING (lang)
         |ORDER BY lang, wlen""".stripMargin) { (s, d) =>
      wordLenOf(Tables.load(s, d, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("lang"), least(length(col("tok")), lit(15)).as("wlen"))
        .agg(count(lit(1)).as("n"), sum(length(col("tok"))).as("chars")))
    },

    // Character-class profile per source (round 17): shares of digit /
    // uppercase / space / other-class characters and mean document
    // length — the encoding/boilerplate fingerprint a feed audit reads
    // before any tokenizer runs (a source whose digit share doubles
    // started shipping tables; an upper-share spike is shouting or
    // OCR). Per-doc class counts are single-pass regexp strips IN-ROW
    // (no explode at all — the q_char_entropy zero-shuffle ethos);
    // the one exchange is the |sources|-bounded rollup of exact int64
    // counts; shares are readout divisions.
    Q("q_punct_profile",
      s"""WITH c AS (SELECT source,
         |                  CAST(length(text) AS BIGINT) AS n,
         |                  CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
         |                       AS BIGINT) AS dg,
         |                  CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))
         |                       AS BIGINT) AS up,
         |                  CAST(length(regexp_replace(text, '[^ ]', '', 'g'))
         |                       AS BIGINT) AS sp,
         |                  CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
         |                       AS BIGINT) AS ot
         |           FROM documents),
         |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(sum(n) AS BIGINT) AS n_chars,
         |             CAST(sum(dg) AS BIGINT) AS dg, CAST(sum(up) AS BIGINT) AS up,
         |             CAST(sum(sp) AS BIGINT) AS sp, CAST(sum(ot) AS BIGINT) AS ot
         |      FROM c GROUP BY 1)
         |SELECT source, n_docs, n_chars,
         |       CASE WHEN n_chars > 0 THEN ${Q.sqlR6("CAST(dg AS DOUBLE) / n_chars")} END AS digit_share,
         |       CASE WHEN n_chars > 0 THEN ${Q.sqlR6("CAST(up AS DOUBLE) / n_chars")} END AS upper_share,
         |       CASE WHEN n_chars > 0 THEN ${Q.sqlR6("CAST(sp AS DOUBLE) / n_chars")} END AS space_share,
         |       CASE WHEN n_chars > 0 THEN ${Q.sqlR6("CAST(ot AS DOUBLE) / n_chars")} END AS other_share,
         |       ${Q.sqlR2("CAST(n_chars AS DOUBLE) / n_docs")} AS mean_doc_chars
         |FROM g
         |ORDER BY source""".stripMargin) { (s, d) =>
      def strip(pat: String) = length(regexp_replace(col("text"), pat, "")).cast("long")
      // n_chars > 0 guard (r18 ADVICE): an all-empty-text source is
      // 0/0 — Spark (non-ANSI) would emit NULL while DuckDB's IEEE
      // division yields NaN; the CASE makes both engines emit NULL.
      def share(c: String) = when(col("n_chars") > 0,
        Q.r6(col(c).cast("double") / col("n_chars")))
      Tables.load(s, d, "documents")
        .select(col("source"), length(col("text")).cast("long").as("n"),
          strip("[^0-9]").as("dg"), strip("[^A-Z]").as("up"),
          strip("[^ ]").as("sp"), strip("[A-Za-z0-9 ]").as("ot"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("n_chars"),
          sum("dg").as("dg"), sum("up").as("up"),
          sum("sp").as("sp"), sum("ot").as("ot"))
        .select(col("source"), col("n_docs"), col("n_chars"),
          share("dg").as("digit_share"), share("up").as("upper_share"),
          share("sp").as("space_share"), share("ot").as("other_share"),
          Q.r2(col("n_chars").cast("double") / col("n_docs")).as("mean_doc_chars"))
        .orderBy("source")
    }
  )

  /** The word-length profile fold over a (lang, wlen, n, chars) band
    * grid — ONE home shared by batch q_word_len_hist and the
    * s_word_len_hist streaming read-time view (a new document shifts
    * its bands' counts and every share re-normalizes; the ≤
    * |langs|×15 band grid is the mergeable state). */
  private[graft] def wordLenOf(b: DataFrame): DataFrame = {
    val t = b.groupBy("lang").agg(sum("n").as("tot"), sum("chars").as("tchars"))
    b.join(t, "lang")
      .select(col("lang"), col("wlen").cast("long").as("wlen"),
        col("n").as("n_words"),
        Q.r6(col("n").cast("double") / col("tot")).as("share"),
        Q.r4(col("tchars").cast("double") / col("tot")).as("mean_len"))
      .orderBy("lang", "wlen")
  }
}
