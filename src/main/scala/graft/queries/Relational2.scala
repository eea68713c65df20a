package graft.queries

import graft.{QueryDef, Tables}
import graft.OracleSafe._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.1 continued: the rest of the Flink-SQL-parity operator surface
  * (percentiles, ordered string agg, multiset set-ops, lateral
  * explode, arg-extrema/conditional aggregates, full window-frame
  * vocabulary, regex extraction, scalar subqueries).
  */
object Relational2 {

  // ---------------------------------------------------------------- q25
  /** Exact interpolated percentiles. l_quantity's values are small
    * integers, so every interpolation lands on a dyadic rational and
    * both engines agree exactly. */
  private val q25 = QueryDef(
    "q25_percentile",
    (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          count(lit(1)).as("n")),
    Some("""SELECT l_returnflag,
      | quantile_cont(l_quantity, 0.25) AS p25,
      | quantile_cont(l_quantity, 0.5) AS p50,
      | quantile_cont(l_quantity, 0.75) AS p75,
      | COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin))

  // ---------------------------------------------------------------- q26
  /** Deterministic ordered string aggregation (LISTAGG shape). */
  private val q26 = QueryDef(
    "q26_string_agg",
    (s, dir) =>
      Tables.load(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          array_join(sort_array(collect_list(col("n_name"))), ",")
            .as("nations"),
          count(lit(1)).as("n")),
    Some("""SELECT n_regionkey,
      | string_agg(n_name, ',' ORDER BY n_name) AS nations,
      | COUNT(*) AS n
      |FROM nation GROUP BY n_regionkey""".stripMargin))

  // ---------------------------------------------------------------- q27
  /** Multiset EXCEPT ALL / INTERSECT ALL (bag semantics). */
  private val q27 = QueryDef(
    "q27_multiset_ops",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      def ids(et: String) =
        ev.filter(col("event_type") === et).select(col("user_id"))
      ids("click").exceptAll(ids("error"))
        .withColumn("tag", lit("extra_clicks"))
        .unionAll(ids("view").intersectAll(ids("purchase"))
          .withColumn("tag", lit("view_purchase")))
    },
    Some("""SELECT user_id, 'extra_clicks' AS tag FROM (
      |  SELECT user_id FROM events WHERE event_type = 'click'
      |  EXCEPT ALL
      |  SELECT user_id FROM events WHERE event_type = 'error')
      |UNION ALL
      |SELECT user_id, 'view_purchase' AS tag FROM (
      |  SELECT user_id FROM events WHERE event_type = 'view'
      |  INTERSECT ALL
      |  SELECT user_id FROM events WHERE event_type = 'purchase')
      |""".stripMargin))

  // ---------------------------------------------------------------- q28
  /** Lateral explode with ordinality (posexplode). */
  private val q28 = QueryDef(
    "q28_lateral_explode",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          expr("filter(split(text, '\\\\s+'), x -> x <> '')").as("ws"))
        .select(col("doc_id"), posexplode(col("ws")))
        .withColumnRenamed("pos", "pos").withColumnRenamed("col", "w")
        .filter(col("pos") < 5),
    Some("""WITH w AS (SELECT doc_id,
      |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
      |  FROM documents)
      |SELECT doc_id, CAST(i - 1 AS INT) AS pos, ws[i] AS w
      |FROM w CROSS JOIN LATERAL
      |  (SELECT unnest(generate_series(1, len(ws))) AS i) t
      |WHERE i <= 5""".stripMargin))

  // ---------------------------------------------------------------- q29
  /** Arg-extrema + conditional aggregates (max_by / count_if /
    * bool_and / bool_or), keyed on a unique column for determinism. */
  private val q29 = QueryDef(
    "q29_arg_extrema",
    (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("max_by(o_orderkey, o_totalprice + o_orderkey * 1e-9)")
            .as("top_order"),
          expr("min_by(o_orderkey, o_totalprice + o_orderkey * 1e-9)")
            .as("bottom_order"),
          expr("count_if(o_totalprice > 150000)").as("n_big"),
          expr("bool_or(o_orderstatus = 'F')").as("any_f"),
          expr("bool_and(o_totalprice > 0)").as("all_positive")),
    Some("""SELECT o_orderpriority,
      | arg_max(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS top_order,
      | arg_min(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS bottom_order,
      | CAST(COUNT(CASE WHEN o_totalprice > 150000 THEN 1 END) AS BIGINT) AS n_big,
      | bool_or(o_orderstatus = 'F') AS any_f,
      | bool_and(o_totalprice > 0) AS all_positive
      |FROM orders GROUP BY o_orderpriority""".stripMargin))

  // ---------------------------------------------------------------- q30
  /** Full window-frame vocabulary: ntile, percent_rank, cume_dist,
    * nth_value, sliding ROWS frame with exact-decimal sums. */
  private val q30 = QueryDef(
    "q30_window_frames",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
        .select(
          col("o_orderpriority"), col("o_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cdist"),
          nth_value(col("o_orderkey"), 2).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("second_key"),
          sum(col("o_totalprice").cast("decimal(28,6)"))
            .over(w.rowsBetween(-2, 0)).cast("double").as("sliding3"))
    },
    Some("""SELECT o_orderpriority, o_orderkey,
      | ntile(4) OVER w AS quartile,
      | percent_rank() OVER w AS pct_rank,
      | cume_dist() OVER w AS cdist,
      | nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
      |   ORDER BY o_totalprice ASC, o_orderkey ASC
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER
      |   (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice ASC, o_orderkey ASC
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sliding3
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin))

  // ---------------------------------------------------------------- q31
  /** Regex extraction + match predicates. */
  private val q31 = QueryDef(
    "q31_regex",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(col("text"), "([a-z]+) ([a-z]+)", 2).as("w2"),
          col("text").rlike("batch").cast("int").as("has_batch"),
          regexp_extract(col("source"), "src([0-9]+)", 1).cast("int")
            .as("src_num")),
    Some("""SELECT doc_id,
      | COALESCE(regexp_extract(text, '([a-z]+) ([a-z]+)', 2), '') AS w2,
      | CAST(regexp_matches(text, 'batch') AS INT) AS has_batch,
      | CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INT) AS src_num
      |FROM documents""".stripMargin))

  // ---------------------------------------------------------------- q32
  /** Scalar subquery against an exact-decimal global average. */
  private val q32 = QueryDef(
    "q32_scalar_subquery",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val avgDf = o.agg((dsum(col("o_totalprice")) / count(lit(1)))
        .as("global_avg"))
      o.crossJoin(broadcast(avgDf))
        .filter(col("o_totalprice") > col("global_avg") * 1.5)
        .select(col("o_orderkey"), col("o_totalprice"), col("global_avg"))
    },
    Some(s"""SELECT o_orderkey, o_totalprice,
      | (SELECT ${dsumSql("o_totalprice")} / COUNT(*) FROM orders) AS global_avg
      |FROM orders
      |WHERE o_totalprice >
      |  (SELECT ${dsumSql("o_totalprice")} / COUNT(*) FROM orders) * 1.5
      |""".stripMargin))

  // ---------------------------------------------------------------- q33
  /** Flink Top-N through the engine's custom operator
    * ([[graft.plans.TopKPerGroup]]): bounded heap per key instead of
    * the windowed row_number full partition sort. Same result set as
    * the q09 pattern, different (scale-correct) physical plan. */
  private val q33 = QueryDef(
    "q33_topk_custom",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      graft.plans.TopKPerGroup(o,
          keys = Seq(o("o_orderpriority")),
          order = Seq(o("o_totalprice").desc, o("o_orderkey").asc),
          k = 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    },
    Some("""SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      | SELECT o_orderpriority, o_orderkey, o_totalprice,
      |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      | FROM orders) WHERE rn <= 3""".stripMargin))

  // ---------------------------------------------------------------- q34
  /** CEP-style funnel detection — Flink's MATCH_RECOGNIZE territory
    * (PATTERN (S E* P) WITHIN INTERVAL '1' HOUR with a no-error
    * guard), declaratively: signup joined to its FIRST purchase within
    * one hour, anti-joined against any intervening error. The pattern
    * decomposes into a per-key range join + range anti join + argmin,
    * which Catalyst executes as ordinary hash joins on user_id — the
    * 100 TB shape (state per key, no global ordering) that a CEP
    * automaton needs an engine extension for. */
  private val q34 = QueryDef(
    "q34_cep_funnel",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      def typed(t: String, idAs: String, tsAs: String) =
        ev.filter(col("event_type") === t)
          .select(col("user_id"), col("event_id").as(idAs),
            col("ts_us").as(tsAs))
      val su = typed("signup", "s_id", "s_ts")
      val pu = typed("purchase", "p_id", "p_ts")
      val er = typed("error", "e_id", "e_ts")
      val cand = su.join(pu, "user_id")
        .filter(col("p_ts") > col("s_ts") &&
          col("p_ts") <= col("s_ts") + 3600000000L)
      val clean = cand.join(er,
        cand("user_id") === er("user_id") &&
          col("e_ts") > col("s_ts") && col("e_ts") < col("p_ts"),
        "left_anti")
      val w = Window.partitionBy(col("user_id"), col("s_id"))
        .orderBy(col("p_ts").asc, col("p_id").asc)
      clean.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("s_id"), col("s_ts"),
          col("p_id"), col("p_ts"),
          (col("p_ts") - col("s_ts")).as("latency_us"))
    },
    Some("""WITH ev AS (SELECT event_id, user_id, event_type,
      |  epoch_us(ts) AS ts_us FROM events),
      |su AS (SELECT user_id, event_id AS s_id, ts_us AS s_ts
      |  FROM ev WHERE event_type = 'signup'),
      |pu AS (SELECT user_id, event_id AS p_id, ts_us AS p_ts
      |  FROM ev WHERE event_type = 'purchase'),
      |er AS (SELECT user_id, ts_us AS e_ts
      |  FROM ev WHERE event_type = 'error'),
      |cand AS (
      |  SELECT su.user_id, s_id, s_ts, p_id, p_ts
      |  FROM su JOIN pu ON su.user_id = pu.user_id
      |    AND p_ts > s_ts AND p_ts <= s_ts + 3600000000
      |  WHERE NOT EXISTS (SELECT 1 FROM er
      |    WHERE er.user_id = su.user_id
      |      AND er.e_ts > s_ts AND er.e_ts < p_ts))
      |SELECT user_id, s_id, s_ts, p_id, p_ts,
      |  p_ts - s_ts AS latency_us FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, s_id
      |    ORDER BY p_ts ASC, p_id ASC) AS rn FROM cand)
      |WHERE rn = 1""".stripMargin))

  // ---------------------------------------------------------------- q35
  /** Approximate quantiles via a DETERMINISTIC log-linear histogram
    * sketch (DDSketch-style buckets: IEEE exponent × 16 linear
    * sub-buckets ⇒ relative error ≤ 1/16) — the mergeable-sketch
    * quantile family beside q20's HLL, rebuilt in round 7 so the
    * oracle can replay it EXACTLY. The r1-r6 form wrapped
    * percentile_approx (GK sketch); GK state is merge-order-sensitive
    * and engine-specific, so the query was stuck rows-only. This
    * sketch's state is (bucket → count): merges are integer adds —
    * commutative and associative, so 1000 executors produce the SAME
    * sketch as one, which is precisely the property a distributed
    * quantile needs — and every bucket boundary is computed with
    * EXACT math in both engines (exponent = bitlength(floor(x)) via
    * bin(), never libm log2; sub-bucket = floor(x·16/2^e), scaling by
    * powers of two is lossless). Quantile answer = lower bound of the
    * first bucket whose cumulative count reaches ceil(q·n).
    *
    * Scale shape: one narrow pass computes (group, bucket) — the
    * groupBy state is ≤ groups × ~16·11 rows for doubles up to 2^11 —
    * then a window cumsum over that tiny table; the corpus is
    * scanned once and never re-shuffled. Exact percentiles (q25) need
    * a full sort per group; this is the 100 TB recipe. */
  private val q35 = {
    // e = bitlength(floor(x)) - 1 (= floor(log2 x) for x ≥ 1, exact);
    // sub-bucket = floor(x·16 / 2^e) - 16 ∈ [0,15]; id = e·16 + sub.
    // x < 1 degrades to a width-1/16 linear histogram (sub < 0,
    // ordering preserved). Domain: x ≥ 0.
    val eS = "length(bin(CAST(floor(x) AS BIGINT))) - 1"
    val bidSpark = s"CAST(($eS) * 16 + " +
      s"floor(x * 16.0D / CAST(shiftleft(1L, $eS) AS DOUBLE)) - 16 AS BIGINT)"
    val bidSql = s"CAST(($eS) * 16 + " +
      s"FLOOR(x * 16.0 / CAST((CAST(1 AS BIGINT) << ($eS)) AS DOUBLE)) - 16 AS BIGINT)"
    // bucket lower bound, exact: ((16+sub)·2^e)/16
    val repSpark = s"CAST((16 + ($bidSpark) - ($eS) * 16) * " +
      s"shiftleft(1L, $eS) AS DOUBLE) / 16.0D"
    val repSql = s"CAST((16 + ($bidSql) - ($eS) * 16) * " +
      s"(CAST(1 AS BIGINT) << ($eS)) AS DOUBLE) / 16.0"
    QueryDef(
      "q35_approx_quantile",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val b = Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice").as("x"))
          .select(col("l_returnflag"), expr(bidSpark).as("bid"),
            expr(repSpark).as("rep"))
          .groupBy(col("l_returnflag"), col("bid"), col("rep"))
          .agg(count(lit(1)).as("c"))
        val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("bid"))
        val wAll = Window.partitionBy(col("l_returnflag"))
        b.withColumn("cum", sum(col("c")).over(wCum))
          .withColumn("n", sum(col("c")).over(wAll))
          .groupBy(col("l_returnflag"))
          .agg(
            min(when(col("cum") >= ceil(lit(0.25) * col("n")), col("rep")))
              .as("p25"),
            min(when(col("cum") >= ceil(lit(0.5) * col("n")), col("rep")))
              .as("p50"),
            min(when(col("cum") >= ceil(lit(0.75) * col("n")), col("rep")))
              .as("p75"),
            max(col("n")).as("n"))
      },
      Some(s"""WITH v AS (SELECT l_returnflag, l_extendedprice AS x
        |  FROM lineitem),
        |b AS (SELECT l_returnflag, $bidSql AS bid, $repSql AS rep,
        |    COUNT(*) AS c
        |  FROM v GROUP BY 1, 2, 3),
        |cw AS (SELECT l_returnflag, bid, rep, c,
        |    SUM(c) OVER (PARTITION BY l_returnflag ORDER BY bid) AS cum,
        |    SUM(c) OVER (PARTITION BY l_returnflag) AS n
        |  FROM b)
        |SELECT l_returnflag,
        |  MIN(CASE WHEN cum >= CEIL(0.25 * n) THEN rep END) AS p25,
        |  MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN rep END) AS p50,
        |  MIN(CASE WHEN cum >= CEIL(0.75 * n) THEN rep END) AS p75,
        |  CAST(MAX(n) AS BIGINT) AS n
        |FROM cw GROUP BY l_returnflag""".stripMargin))
  }
  // (oracle casts n to BIGINT: DuckDB's SUM over integers is DECIMAL)

  // ---------------------------------------------------------------- q36
  /** FULL OUTER JOIN — the one join flavor the inventory lacked:
    * per-user signup stats ⋈ per-user purchase stats, where each side
    * has users the other lacks, so both null-extension directions are
    * exercised. The aggregates shrink each side before the join (the
    * scale rule: join the aggregates, never outer-join raw facts and
    * re-aggregate); exact-decimal sums keep the money column
    * engine-equal. */
  private val q36 = QueryDef(
    "q36_join_full_outer",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_signups"),
          min(unix_micros(col("ts"))).as("first_signup_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          dsum(col("value")).as("spend"))
      signups.join(purchases, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("n_signups"), lit(0L)).as("n_signups"),
          col("first_signup_us"),
          coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
          coalesce(col("spend"), lit(0.0)).as("spend"))
    },
    Some(s"""WITH s AS (SELECT user_id, COUNT(*) AS n_signups,
      |    MIN(epoch_us(ts)) AS first_signup_us
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |p AS (SELECT user_id, COUNT(*) AS n_purchases,
      |    ${dsumSql("value")} AS spend
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
      |SELECT COALESCE(s.user_id, p.user_id) AS user_id,
      |  CAST(COALESCE(s.n_signups, 0) AS BIGINT) AS n_signups,
      |  s.first_signup_us,
      |  CAST(COALESCE(p.n_purchases, 0) AS BIGINT) AS n_purchases,
      |  COALESCE(p.spend, 0.0) AS spend
      |FROM s FULL OUTER JOIN p ON s.user_id = p.user_id
      |""".stripMargin))

  // ---------------------------------------------------------------- q37
  /** Statistical aggregates — STDDEV_SAMP / CORR, the analytics-SQL
    * vocabulary the inventory lacked — computed ENGINE-EXACTLY
    * (round 12): the built-in stddev/corr are streaming double folds
    * whose result depends on partitioning and engine, so the oracle
    * could never hash them. Instead, the five raw MOMENTS (Σx, Σx²,
    * Σy, Σy², Σxy) accumulate through [[dsum]]'s exact DECIMAL(28,6)
    * path — associative ⇒ partitioning-invariant, identical in both
    * engines — and variance/correlation emerge as ONE textually
    * identical double formula over those deterministic inputs
    * (IEEE ops on equal operands round equally; sqrt is correctly
    * rounded). Same pattern that made q19/q20 exact — with one more
    * cross-engine finding: DuckDB's DECIMAL→DOUBLE cast is NOT
    * correctly rounded once the decimal needs more than 53 bits
    * (measured: Σprice² ≈ 7·10¹³ with 6 decimals lands 1 ULP off
    * Java's BigDecimal.doubleValue), so the price moments are taken
    * on price/1000 — every moment then stays under 2⁵³ units where
    * BOTH engines' conversions are exact-input correctly-rounded
    * division. Correlation is scale-invariant; the stddev column
    * carries the _k suffix for its unit. Scale: a single map-side-
    * combinable aggregation — moment state is 5 decimals per group
    * per task, the corpus never shuffles raw rows. */
  private val q37 = QueryDef(
    "q37_stat_moments",
    (s, dir) => {
      def varOf(sxx: Column, sx: Column, n: Column): Column =
        (sxx - sx * sx / n) / (n - lit(1))
      val priceK = col("l_extendedprice") / lit(1000.0)
      val m = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          dsum(col("l_quantity")).as("sx"),
          dsum(col("l_quantity") * col("l_quantity")).as("sxx"),
          dsum(priceK).as("sy"),
          dsum(priceK * priceK).as("syy"),
          dsum(col("l_quantity") * priceK).as("sxy"))
      m.select(col("l_returnflag"),
          col("n").cast("long").as("n"),
          (col("sx") / col("n")).as("mean_qty"),
          sqrt(varOf(col("sxx"), col("sx"), col("n"))).as("std_qty"),
          sqrt(varOf(col("syy"), col("sy"), col("n"))).as("std_price_k"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) /
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) *
                 (col("syy") - col("sy") * col("sy") / col("n"))))
            .as("corr_qty_price"))
    },
    Some(s"""WITH m AS (SELECT l_returnflag,
      |  CAST(COUNT(*) AS DOUBLE) AS n,
      |  ${dsumSql("l_quantity")} AS sx,
      |  ${dsumSql("l_quantity * l_quantity")} AS sxx,
      |  ${dsumSql("(l_extendedprice / 1000.0)")} AS sy,
      |  ${dsumSql("(l_extendedprice / 1000.0) * (l_extendedprice / 1000.0)")} AS syy,
      |  ${dsumSql("l_quantity * (l_extendedprice / 1000.0)")} AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  sx / n AS mean_qty,
      |  sqrt((sxx - sx * sx / n) / (n - 1)) AS std_qty,
      |  sqrt((syy - sy * sy / n) / (n - 1)) AS std_price_k,
      |  (sxy - sx * sy / n) /
      |    sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
      |    AS corr_qty_price
      |FROM m""".stripMargin))

  // -------------------------------------------------------------- q38
  /** SKEW-SALTED shuffle join under the oracle gate — the 100 TB
    * skew recipe SURVEY §5 prescribes, demonstrated as a real query:
    * per-document z-score against its LANGUAGE cohort (cohort
    * normalization, a standard curation feature). `lang` is the
    * fixture's skewed key (~40% of documents are 'en'), so a plain
    * shuffle join on `lang` lands 40% of the table on one task; the
    * salted plan joins on (lang, salt) — the fact side gets
    * `pmod(hash(doc_id), S)`, the S-row-per-cohort stats side
    * EXPLODES ×[[Q38Salts]] — spreading the hot key across S
    * partitions while the fact table still shuffles exactly once.
    *
    * Honesty notes: at THIS fixture size the stats side would simply
    * broadcast (q08's plan) and no skew exists to fight — the salted
    * SortMergeJoin is FORCED via a merge hint because the technique
    * (not this corpus) is what the gate pins: the hash match proves
    * salting changes the partitioning and NOTHING else, and the spec
    * measures the spread directly (max key-group size drops ~S×).
    * The cohort stats are exact integer sums (n_tok ≤ doc length, no
    * decimal needed); the z formula is one textually identical
    * double expression in both engines (the q37 recipe), so the
    * result hash-matches bit-for-bit. Aggregation skew needs no salt:
    * the cohort stats groupBy is map-side combined (per-task partial
    * rows, 5 keys), the classic reason agg skew ≠ join skew. */
  private val Q38Salts = 16
  private val q38 = QueryDef(
    "q38_skew_salted_join",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          expr("CAST(size(filter(split(text, '\\\\s+'), x -> x <> '')) AS BIGINT)")
            .as("n_tok"))
      val st = d.groupBy(col("lang")).agg(
        count(lit(1)).as("n"),
        sum(col("n_tok")).as("s1"),
        sum(col("n_tok") * col("n_tok")).as("s2"))
      val salted = st.select(col("lang"), col("n"), col("s1"), col("s2"),
        explode(expr(s"sequence(0, ${Q38Salts - 1})")).as("salt"))
      // degenerate-cohort guard (ADVICE r12): n = 1 makes both the
      // (n - 1) divisor and the centered sum 0 — a 0/0 whose IEEE
      // NaN the hash gate would have to trust both engines to agree
      // on; a zero-variance cohort is 0/0 the same way. NULL z is the
      // honest answer for a cohort with no spread to normalize by.
      d.withColumn("salt", pmod(hash(col("doc_id")), lit(Q38Salts)))
        .join(salted.hint("merge"), Seq("lang", "salt"))
        .select(col("doc_id"), col("lang"), col("n_tok"),
          expr("""CASE WHEN n > 1 AND
              (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) > 0
            THEN (n_tok - CAST(s1 AS DOUBLE) / n) /
            sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
              / (n - 1)) ELSE NULL END""").as("z"))
    },
    Some(s"""WITH d AS (SELECT doc_id, lang,
      |  CAST(len(list_filter(string_split_regex(text, '\\s+'),
      |    x -> x <> '')) AS BIGINT) AS n_tok
      |  FROM documents),
      |st AS (SELECT lang, COUNT(*) AS n, SUM(n_tok) AS s1,
      |  SUM(n_tok * n_tok) AS s2 FROM d GROUP BY lang)
      |SELECT doc_id, d.lang, n_tok,
      |  CASE WHEN n > 1 AND
      |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) > 0
      |    THEN (n_tok - CAST(s1 AS DOUBLE) / n) /
      |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
      |      / (n - 1)) ELSE NULL END AS z
      |FROM d JOIN st ON d.lang = st.lang""".stripMargin))

  // ---------------------------------------------------------------- q39
  /** CUMULATE window TVF (round 12) — the one Flink SQL window family
    * q11/q12/q13 (tumble/hop/session) left uncovered: `CUMULATE(…,
    * step 6h, size 24h)` assigns each event to EVERY window that
    * starts at its period boundary and ends at a later step — the
    * early-firing daily dashboard ("today so far, refreshed every 6
    * hours") that would otherwise need a hop with window-sized slide
    * overlap. An event at offset Δ into its UTC day lands in windows
    * k ∈ [⌊Δ/step⌋+1, size/step], window k = [day, day + k·step).
    *
    * Engine-exact: day boundaries and window ends are pure integer
    * µs arithmetic (day = ts div 86400e6 — UTC-fixed, no timezone
    * surface), the k-range a bounded `sequence` explode (≤ 4 rows per
    * event), sums decimal-exact via dsum. Spark shape: narrow explode
    * riding the scan + ONE hash agg on (win_start, win_end) with
    * map-side partials — the fan-out is size/step (a constant),
    * never the corpus. */
  private val q39 = QueryDef(
    "q39_window_cumulate",
    (s, dir) => {
      val stepUs = 6L * 3600 * 1000000
      val sizeUs = 24L * 3600 * 1000000
      val maxK = (sizeUs / stepUs).toInt
      Tables.events(s, dir)
        .select(unix_micros(col("ts")).as("ts_us"), col("value"))
        .withColumn("day_us",
          expr(s"(ts_us div $sizeUs) * $sizeUs"))
        .withColumn("k", explode(expr(
          s"sequence((ts_us - day_us) div $stepUs + 1, CAST($maxK AS BIGINT))")))
        .groupBy(col("day_us").as("win_start_us"),
          (col("day_us") + col("k") * stepUs).as("win_end_us"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    },
    Some(s"""WITH e AS (SELECT epoch_us(ts) AS ts_us, value,
      |    (epoch_us(ts) // 86400000000) * 86400000000 AS day_us
      |  FROM events),
      |x AS (SELECT ts_us, value, day_us, k
      |  FROM e CROSS JOIN LATERAL (SELECT unnest(generate_series(
      |    (ts_us - day_us) // 21600000000 + 1, 4)) AS k) t)
      |SELECT day_us AS win_start_us,
      |  day_us + k * 21600000000 AS win_end_us,
      |  COUNT(*) AS n, ${dsumSql("value")} AS sum_value
      |FROM x GROUP BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q40
  /** MATCH_RECOGNIZE (round 13; true-SKIP semantics round 14) — Flink
    * SQL's row-pattern matching (SQL:2016; the canonical Ticker
    * example its docs open with): `PATTERN (START_ROW DOWN+ UP+)` per
    * key over event time — a strictly falling run from a local max,
    * then a strictly rising run: the V-shape. q34's CEP funnel covers
    * fixed event-TYPE sequences; this is the VALUE-pattern half of
    * the construct, with greedy quantifiers and AFTER MATCH SKIP PAST
    * LAST ROW.
    *
    * Re-expressed as run algebra: classify each row's direction vs
    * its predecessor (1/-1/0; ties break runs — DOWN/UP are STRICT),
    * cut maximal same-direction runs with one cumulative boundary
    * sum; a CANDIDATE match is a DOWN run whose immediate successor
    * run is UP (greedy `+` = maximal runs by construction).
    *
    * TRUE SKIP PAST LAST ROW (ADVICE r13): a candidate's anchor row
    * (the last row of the preceding run) may be the final UP row of
    * the PREVIOUS emitted match — consumed, so it cannot anchor
    * again. Two candidates are chained when their down-run ids differ
    * by exactly 2 (the previous match's UP run sits between). Within
    * a chain the sequential engine's emission obeys the recurrence
    * emitted(i) = strong(i) OR NOT emitted(i-1), where strong = the
    * down run has ≥ 2 rows (when its anchor is consumed the engine
    * resumes INSIDE the down run: the first down row becomes
    * START_ROW, one fall is spent anchoring — start/depth/n_down
    * adjust; a 1-row down run consumed this way has nothing left and
    * is suppressed). The recurrence closes into window algebra:
    * emitted = strong OR parity-since-last-strong (alternating
    * emit/suppress between strong posts), so no iteration — two
    * running maxes + one lag, all on the key partitioning. W-shapes
    * (back-to-back V's sharing a peak) now emit exactly what Flink's
    * engine emits: 3,2,5,1,6 is ONE match, not two.
    *
    * Extraction rides monotonicity: within a strictly falling run
    * prev_val falls too, so MAX(prev_val) IS the anchor value and
    * MIN(value) the bottom — plain aggregates. Measures: start/
    * bottom/end (ts µs + value), run lengths, depth = start−bottom
    * and rise = end−bottom as one textually identical double
    * subtraction per engine.
    *
    * Scale shape: ONE hash partition per key carries every window —
    * rows (lag, boundary sum), runs (adjacency lead), and matches
    * (chain cut, parity maxes, consumed lag): every window partitions
    * by user_id or a superset, so HashPartitioning(user_id) satisfies
    * them all and the plan keeps exactly one exchange (PlanSpec pins
    * it). Nothing is iterative; a 100 TB event log pattern-scans in
    * one pass. */
  private val q40 = QueryDef(
    "q40_match_recognize",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .withColumn("prev_val", lag(col("value"), 1).over(w))
        .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
        .withColumn("dir",
          when(col("prev_val").isNull, lit(null).cast("int"))
            .when(col("value") > col("prev_val"), 1)
            .when(col("value") < col("prev_val"), -1)
            .otherwise(0))
      // run extraction rides monotonicity: within a strictly falling
      // run prev_val is strictly falling too, so MAX(prev_val) IS the
      // anchor (START_ROW's value) and MIN(value) the bottom — no
      // positional lookups, plain aggregates. Runs of dir 0/null
      // still get run ids (they must BREAK adjacency, a tie between
      // a fall and a rise is not a V).
      val runs = e
        .withColumn("brk",
          when(expr("dir IS DISTINCT FROM lag(dir, 1) OVER " +
            "(PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)"),
            1).otherwise(0))
        .withColumn("run_id", sum(col("brk")).over(w))
        .groupBy(col("user_id"), col("run_id"))
        .agg(min(col("dir")).as("dir"),
          count(lit(1)).as("n"),
          min(col("ts_us")).as("first_ts"),
          min(col("prev_ts")).as("first_prev_ts"),
          max(col("prev_val")).as("hi_prev"),
          min(col("value")).as("lo_val"),
          max(col("value")).as("hi_val"),
          max(col("ts_us")).as("last_ts"))
      // adjacency via lead() over the run sequence — runs get dense
      // consecutive ids per key by construction, so the successor run
      // IS the next row: no self-join, the whole match rides the one
      // user_id partitioning the windows already established
      val wr = Window.partitionBy(col("user_id")).orderBy(col("run_id").asc)
      val cand = runs
        .withColumn("nxt_dir", lead(col("dir"), 1).over(wr))
        .withColumn("end_us", lead(col("last_ts"), 1).over(wr))
        .withColumn("end_val", lead(col("hi_val"), 1).over(wr))
        .withColumn("n_up", lead(col("n"), 1).over(wr))
        .filter(col("dir") === -1 && col("nxt_dir") === 1)
      // SKIP PAST LAST ROW emission: chain candidates whose down-run
      // ids step by exactly 2 (anchor = previous match's last UP
      // row), then close the emitted(i) = strong(i) OR !emitted(i-1)
      // recurrence with running maxes: cs = chain-start match index,
      // ls = last strong match index. Weak candidates alternate —
      // emitted iff an ODD number of steps since the chain start
      // (emitted head) or an EVEN number since the last strong
      // (emitted, consuming) post.
      val wm = Window.partitionBy(col("user_id")).orderBy(col("run_id").asc)
      val wmRun = wm.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val em = cand
        .withColumn("mrow", row_number().over(wm))
        .withColumn("adj",
          (col("run_id") - lag(col("run_id"), 1).over(wm)) === 2)
        .withColumn("cs", max(when(!coalesce(col("adj"), lit(false)),
          col("mrow"))).over(wmRun))
        .withColumn("ls", max(when(col("n") >= 2, col("mrow"))).over(wmRun))
        .withColumn("emitted", (col("n") >= 2) ||
          when(col("ls").isNull || col("ls") < col("cs"),
            (col("mrow") - col("cs")) % 2 === 0)
            .otherwise((col("mrow") - col("ls")) % 2 === 0))
      em
        .withColumn("consumed", coalesce(col("adj"), lit(false)) &&
          coalesce(lag(col("emitted"), 1).over(wm), lit(false)))
        .filter(col("emitted"))
        .select(col("user_id"),
          when(col("consumed"), col("first_ts"))
            .otherwise(col("first_prev_ts")).as("start_us"),
          when(col("consumed"), col("hi_val"))
            .otherwise(col("hi_prev")).as("start_val"),
          col("last_ts").as("bottom_us"), col("lo_val").as("bottom_val"),
          col("end_us"), col("end_val"),
          when(col("consumed"), col("n") - 1)
            .otherwise(col("n")).as("n_down"),
          col("n_up"),
          expr("CASE WHEN consumed THEN hi_val - lo_val " +
            "ELSE hi_prev - lo_val END").as("depth"),
          expr("end_val - lo_val").as("rise"))
    },
    Some(s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
      |    LAG(value) OVER w AS prev_val, LAG(epoch_us(ts)) OVER w AS prev_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)),
      |d AS (SELECT *, CASE WHEN prev_val IS NULL THEN NULL
      |    WHEN value > prev_val THEN 1
      |    WHEN value < prev_val THEN -1 ELSE 0 END AS dir
      |  FROM e),
      |b AS (SELECT *, CASE WHEN dir IS DISTINCT FROM LAG(dir) OVER w2
      |    THEN 1 ELSE 0 END AS brk
      |  FROM d
      |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)),
      |r AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
      |    ORDER BY ts_us ASC, event_id ASC) AS run_id
      |  FROM b),
      |runs AS (SELECT user_id, run_id, MIN(dir) AS dir,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    MIN(ts_us) AS first_ts,
      |    MIN(prev_ts) AS first_prev_ts, MAX(prev_val) AS hi_prev,
      |    MIN(value) AS lo_val, MAX(value) AS hi_val,
      |    MAX(ts_us) AS last_ts
      |  FROM r GROUP BY user_id, run_id),
      |m AS (SELECT *,
      |    LEAD(dir) OVER wr AS nxt_dir,
      |    LEAD(last_ts) OVER wr AS end_us,
      |    LEAD(hi_val) OVER wr AS end_val,
      |    LEAD(n) OVER wr AS n_up
      |  FROM runs WINDOW wr AS (PARTITION BY user_id ORDER BY run_id ASC)),
      |cand AS (SELECT * FROM m WHERE dir = -1 AND nxt_dir = 1),
      |cm AS (SELECT *,
      |    ROW_NUMBER() OVER wm AS mrow,
      |    (run_id - LAG(run_id) OVER wm = 2) AS adj
      |  FROM cand WINDOW wm AS (PARTITION BY user_id ORDER BY run_id ASC)),
      |cg AS (SELECT *,
      |    MAX(CASE WHEN NOT COALESCE(adj, FALSE) THEN mrow END) OVER wru AS cs,
      |    MAX(CASE WHEN n >= 2 THEN mrow END) OVER wru AS ls
      |  FROM cm WINDOW wru AS (PARTITION BY user_id ORDER BY mrow ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |ce AS (SELECT *, (n >= 2) OR
      |    (CASE WHEN ls IS NULL OR ls < cs THEN (mrow - cs) % 2 = 0
      |          ELSE (mrow - ls) % 2 = 0 END) AS emitted
      |  FROM cg),
      |cf AS (SELECT *, COALESCE(adj, FALSE)
      |      AND COALESCE(LAG(emitted) OVER wm, FALSE) AS consumed
      |  FROM ce WINDOW wm AS (PARTITION BY user_id ORDER BY run_id ASC))
      |SELECT user_id,
      |  CASE WHEN consumed THEN first_ts ELSE first_prev_ts END AS start_us,
      |  CASE WHEN consumed THEN hi_val ELSE hi_prev END AS start_val,
      |  last_ts AS bottom_us, lo_val AS bottom_val,
      |  end_us, end_val,
      |  CASE WHEN consumed THEN n - 1 ELSE n END AS n_down, n_up,
      |  CASE WHEN consumed THEN hi_val - lo_val
      |       ELSE hi_prev - lo_val END AS depth,
      |  end_val - lo_val AS rise
      |FROM cf WHERE emitted""".stripMargin))

  val defs: Seq[QueryDef] =
    Seq(q25, q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q36, q37,
      q38, q39, q40)
}
