package graft.queries

import graft.{QueryDef, Tables}
import graft.OracleSafe._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.1 Relational / Flink-SQL surface of the reference, re-expressed
  * as declarative Spark plans (Catalyst handles pushdown, pruning and
  * join selection; nothing here hand-schedules execution).
  *
  * The shapes mirror what the reference's SQL layer exercises:
  * projection + scalar functions and watermarked event-time processing
  * (ref: src/test/java/com/alibaba/flink/connectors/dts/sql/
  * DtsTableISelectTCaseTest.java:88), operation-type filtering (ref:
  * src/test/java/com/alibaba/flink/connectors/dts/datastream/
  * DtsExample.java filter), stream⋈dim left join (ref:
  * DtsTableIJoinTCase.java:66), plus the standard Flink SQL operator
  * set (group/windowed aggs, top-N, dedup, set ops, analytic windows).
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ---------------------------------------------------------------- q01
  private val q01 = QueryDef(
    "q01_project_scalar",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.select(
        col("event_id"),
        concat(lit("dts-"), col("event_type")).as("tagged"),
        upper(col("event_type")).as("etype_u"),
        substring(col("event_type"), 1, 3).as("etype3"),
        col("user_id"),
        year(col("ts")).as("y"),
        month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("d"),
        hour(col("ts")).as("h"))
    },
    Some("""SELECT event_id, 'dts-' || event_type AS tagged,
      | upper(event_type) AS etype_u, substring(event_type,1,3) AS etype3,
      | user_id,
      | CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS m,
      | CAST(day(ts) AS INTEGER) AS d, CAST(hour(ts) AS INTEGER) AS h
      |FROM events""".stripMargin))

  // ---------------------------------------------------------------- q02
  private val q02 = QueryDef(
    "q02_filter",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_returnflag").isin("A", "R") &&
          col("l_quantity") < 25 &&
          col("l_discount").between(0.02, 0.08))
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag", "l_shipdate")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      | l_returnflag, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_returnflag IN ('A','R')
      |  AND l_quantity < 25
      |  AND l_discount BETWEEN 0.02 AND 0.08""".stripMargin))

  // ---------------------------------------------------------------- q03
  private val q03 = QueryDef(
    "q03_agg_global",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        (dsum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"))
    },
    Some(s"""SELECT COUNT(*) AS n_rows,
      | ${dsumSql("l_quantity")} AS sum_qty,
      | ${dsumSql("l_extendedprice")} AS sum_price,
      | MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
      | COUNT(DISTINCT l_orderkey) AS n_orders,
      | ${dsumSql("l_quantity")} / COUNT(l_quantity) AS avg_qty
      |FROM lineitem""".stripMargin))

  // ---------------------------------------------------------------- q04
  /** TPC-H Q1 shape: the flagship grouped aggregation. Partial
    * (map-side) aggregation + exact decimal accumulation make this a
    * single-shuffle plan at any scale. */
  private val q04 = QueryDef(
    "q04_agg_group",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      | ${dsumSql("l_quantity")} AS sum_qty,
      | ${dsumSql("l_extendedprice")} AS sum_base_price,
      | ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
      | ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
      | ${dsumSql("l_quantity")} / COUNT(*) AS avg_qty,
      | ${dsumSql("l_discount")} / COUNT(*) AS avg_disc,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin))

  // ---------------------------------------------------------------- q05
  private val q05 = QueryDef(
    "q05_join_inner",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total"),
          countDistinct(col("o_custkey")).as("n_cust"))
    },
    Some(s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
      | ${dsumSql("o_totalprice")} AS total,
      | COUNT(DISTINCT o_custkey) AS n_cust
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin))

  // ---------------------------------------------------------------- q06
  /** Left outer join — the reference's stream⋈dim enrichment shape
    * (ref: DtsTableIJoinTCase.java:66). */
  private val q06 = QueryDef(
    "q06_join_left",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total"))
    },
    Some(s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
      | COALESCE(${dsumSql("o_totalprice")}, 0.0) AS total
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name""".stripMargin))

  // ---------------------------------------------------------------- q07
  private val q07 = QueryDef(
    "q07_join_semi_anti",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val big = o.filter(col("o_totalprice") > 150000)
      val sem = c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), lit("has").as("tag"))
      val ant = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), lit("none").as("tag"))
      sem.unionAll(ant)
    },
    Some("""SELECT c_custkey, c_name, 'has' AS tag FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
      |UNION ALL
      |SELECT c_custkey, c_name, 'none' AS tag FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |""".stripMargin))

  // ---------------------------------------------------------------- q08
  /** Star join: dims broadcast, single shuffle on the fact keys. */
  private val q08 = QueryDef(
    "q08_join_star",
    (s, dir) => {
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    },
    Some(s"""SELECT r_name, n_name,
      | ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
      | COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem
      | JOIN orders   ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation   ON c_nationkey = n_nationkey
      | JOIN region   ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY r_name, n_name""".stripMargin))

  // ---------------------------------------------------------------- q09
  /** Flink Top-N pattern: rank over partition, filter on rank. */
  private val q09 = QueryDef(
    "q09_topn_group",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    },
    Some("""SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      | SELECT o_orderpriority, o_orderkey, o_totalprice,
      |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      | FROM orders) WHERE rn <= 3""".stripMargin))

  // ---------------------------------------------------------------- q10
  /** Flink deduplication pattern: keep latest row per key — also the
    * changelog compaction primitive (SURVEY §2.2 cdc02 builds on it). */
  private val q10 = QueryDef(
    "q10_dedup_latest",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("last_us"))
    },
    Some("""SELECT user_id, event_id, event_type, value,
      | epoch_us(ts) AS last_us FROM (
      | SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |   ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1""".stripMargin))

  // ---------------------------------------------------------------- q11
  /** Event-time tumbling window (ref: watermarked `ts` metadata column,
    * DtsTableISelectTCaseTest.java:70). */
  private val q11 = QueryDef(
    "q11_window_tumble",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .select(unix_micros(col("w.start")).as("win_us"), col("event_type"),
          col("n"), col("sum_value"), col("n_users"))
    },
    Some(s"""SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_us,
      | event_type, COUNT(*) AS n,
      | ${dsumSql("value")} AS sum_value,
      | COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2""".stripMargin))

  // ---------------------------------------------------------------- q12
  /** Hopping (sliding) window: 1h window, 30m slide. */
  private val q12 = QueryDef(
    "q12_window_hop",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_micros(col("w.start")).as("win_us"), col("event_type"),
          col("n"), col("sum_value"))
    },
    Some(s"""WITH e AS (SELECT event_type, value,
      |  (epoch_us(ts) // 1800000000) * 1800000000 AS w0 FROM events),
      |x AS (SELECT w0 AS win_us, event_type, value FROM e
      |      UNION ALL
      |      SELECT w0 - 1800000000 AS win_us, event_type, value FROM e)
      |SELECT win_us, event_type, COUNT(*) AS n,
      | ${dsumSql("value")} AS sum_value
      |FROM x GROUP BY win_us, event_type""".stripMargin))

  // ---------------------------------------------------------------- q13
  /** Session window, 10-minute gap. Spark: native session_window
    * (merge-on-gap); oracle: gaps-and-islands. A new session starts
    * when the gap is >= 10 min (session_window's end bound is
    * exclusive). */
  private val q13 = QueryDef(
    "q13_window_session",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy(session_window(col("ts"), "10 minutes").as("w"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"), col("n_events"),
          col("sum_value"))
    },
    Some(s"""WITH g AS (
      |  SELECT user_id, value, epoch_us(ts) AS us,
      |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) >= 600000000
      |      OR LAG(epoch_us(ts)) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
      |      ROWS UNBOUNDED PRECEDING) AS sid FROM g)
      |SELECT user_id, MIN(us) AS start_us, MAX(us) + 600000000 AS end_us,
      | COUNT(*) AS n_events, ${dsumSql("value")} AS sum_value
      |FROM s GROUP BY user_id, sid""".stripMargin))

  // ---------------------------------------------------------------- q14
  private val q14 = QueryDef(
    "q14_analytic_window",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("long").as("rn"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        sum(col("o_totalprice").cast("decimal(28,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      | ROW_NUMBER() OVER w AS rn,
      | LAG(o_totalprice, 1) OVER w AS prev_price,
      | LEAD(o_totalprice, 1) OVER w AS next_price,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER
      |   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |   AS running_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |""".stripMargin))

  // ---------------------------------------------------------------- q15
  private val q15 = QueryDef(
    "q15_rollup",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("total"))
    },
    Some(s"""SELECT o_orderpriority, o_orderstatus,
      | CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER) AS gid,
      | COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
      |FROM orders
      |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)""".stripMargin))

  // ---------------------------------------------------------------- q16
  private val q16 = QueryDef(
    "q16_setops",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      // ONE aggregation pass: per-user conditional counts become
      // "heavy in <type>" booleans, and every set-op branch filters
      // the SAME aggregated frame. Two Catalyst traps make the naive
      // forms five-scan plans: a plain event_type filter pushes
      // through the grouping key and splits the scan (round 1), and
      // per-branch projection lets column pruning specialize each
      // branch's aggregate so no two subtrees match. Keeping ALL flag
      // columns through the set ops defeats both — pruning cannot
      // drop columns below an INTERSECT/EXCEPT (it would change row
      // equality), the five branch subtrees stay identical, and
      // ReuseExchange runs scan + partial agg exactly once. Rows of
      // one user are identical across branches, so whole-row set
      // semantics equal the round-1 user_id set semantics.
      val flagCols = Seq("purchase", "click", "error", "signup").map(et =>
        (count(when(col("event_type") === et, 1)) >= 15).as(s"h_$et"))
      val flags = ev.groupBy(col("user_id"))
        .agg(flagCols.head, flagCols.tail: _*)
      def heavy(et: String) = flags.filter(col(s"h_$et"))
      val loyal = heavy("purchase").intersect(heavy("click"))
        .except(heavy("error"))
        .select(col("user_id"), lit("loyal").as("tag"))
      val fresh = heavy("signup").except(heavy("purchase"))
        .select(col("user_id"), lit("new").as("tag"))
      loyal.unionAll(fresh)
    },
    Some("""WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |h AS (SELECT user_id, event_type FROM c WHERE n >= 15)
      |SELECT user_id, 'loyal' AS tag FROM (
      |  (SELECT user_id FROM h WHERE event_type='purchase'
      |   INTERSECT
      |   SELECT user_id FROM h WHERE event_type='click')
      |  EXCEPT
      |  SELECT user_id FROM h WHERE event_type='error')
      |UNION ALL
      |SELECT user_id, 'new' AS tag FROM (
      |  SELECT user_id FROM h WHERE event_type='signup'
      |  EXCEPT
      |  SELECT user_id FROM h WHERE event_type='purchase')
      |""".stripMargin))

  // ---------------------------------------------------------------- q17
  /** Global order-by + limit → TakeOrderedAndProject (no full sort at
    * scale; per-partition top-k then merge). */
  private val q17 = QueryDef(
    "q17_sort_limit",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin))

  // ---------------------------------------------------------------- q18
  private val q18 = QueryDef(
    "q18_case_expr",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("size_class"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
          .as("status2"),
        length(col("o_orderpriority")).as("pr_len"),
        lpad(col("o_orderstatus"), 3, "_").as("status_pad"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
          .as("days_to_98"),
        floor(col("o_totalprice") / 10000).cast("long").as("price_bucket"))
    },
    Some("""SELECT o_orderkey,
      | CASE WHEN o_totalprice > 200000 THEN 'big'
      |      WHEN o_totalprice > 100000 THEN 'mid'
      |      ELSE 'small' END AS size_class,
      | COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status2,
      | CAST(length(o_orderpriority) AS INTEGER) AS pr_len,
      | lpad(o_orderstatus, 3, '_') AS status_pad,
      | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
      |      AS INTEGER) AS days_to_98,
      | CAST(floor(o_totalprice / 10000) AS BIGINT) AS price_bucket
      |FROM orders""".stripMargin))

  // ---------------------------------------------------------------- q19
  private val q19 = QueryDef(
    "q19_count_distinct",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey") * 100000 + col("l_suppkey"))
            .as("n_part_supp"))
    },
    Some("""SELECT l_returnflag,
      | COUNT(DISTINCT l_partkey) AS n_parts,
      | COUNT(DISTINCT l_suppkey) AS n_supps,
      | COUNT(DISTINCT l_orderkey) AS n_orders,
      | COUNT(DISTINCT l_partkey * 100000 + l_suppkey) AS n_part_supp
      |FROM lineitem GROUP BY l_returnflag""".stripMargin))

  // ---------------------------------------------------------------- q20
  /** Approximate distinct counts via the native deterministic HLL
    * sketch ([[graft.functions.HllEstimateAgg]]) — rebuilt in round 7
    * so the oracle can replay it exactly. The r1-r6 form wrapped
    * Spark's approx_count_distinct, whose sketch state is
    * engine-private (rows-only forever); the custom aggregate's state
    * is 256 max-rho registers over 60-bit md5 hashes — merge is
    * elementwise max (order-invariant), the estimate's only float ops
    * are a shared constant chain and one division, so Spark and
    * DuckDB produce the IDENTICAL integer. One corpus pass, 256 bytes
    * of state per group per task (map-side partial agg) — the 100 TB
    * distinct-count recipe. */
  private val q20 = {
    val num = graft.functions.HllEstimateAgg.NumeratorSql
    val mask = graft.functions.HllEstimateAgg.WindowMask
    def regs(h: String) =
      s"""SELECT f, ($h) >> 52 AS b,
         |    MAX(CASE WHEN (($h) & $mask) = 0 THEN 53
         |        ELSE 53 - length(bin(($h) & $mask)) END) AS m
         |  FROM h GROUP BY 1, 2""".stripMargin
    val zs =
      s"""SELECT f, CAST(SUM(CAST(1 AS BIGINT) << (53 - m)) AS BIGINT)
         |    + (256 - COUNT(*)) * 9007199254740992 AS zs
         |  FROM RR GROUP BY f""".stripMargin
    QueryDef(
      "q20_approx_distinct",
      (s, dir) => {
        import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
        val li = t(s, dir, "lineitem")
          .select(col("l_returnflag"),
            expr(hash60("CAST(l_partkey AS STRING)")).as("hp"),
            expr(hash60("CAST(l_orderkey AS STRING)")).as("ho"))
        li.groupBy(col("l_returnflag"))
          .agg(
            column(graft.functions.HllEstimateAgg(expression(col("hp")))
              .toAggregateExpression()).as("approx_parts"),
            column(graft.functions.HllEstimateAgg(expression(col("ho")))
              .toAggregateExpression()).as("approx_orders"))
      },
      Some(s"""WITH h AS (SELECT l_returnflag AS f,
        |    ${hash60Sql("CAST(l_partkey AS VARCHAR)")} AS hp,
        |    ${hash60Sql("CAST(l_orderkey AS VARCHAR)")} AS ho
        |  FROM lineitem),
        |rp AS (${regs("hp")}),
        |ro AS (${regs("ho")}),
        |zp AS (${zs.replace("RR", "rp")}),
        |zo AS (${zs.replace("RR", "ro")})
        |SELECT zp.f AS l_returnflag,
        |  CAST(FLOOR($num / CAST(zp.zs AS DOUBLE) + 0.5) AS BIGINT)
        |    AS approx_parts,
        |  CAST(FLOOR($num / CAST(zo.zs AS DOUBLE) + 0.5) AS BIGINT)
        |    AS approx_orders
        |FROM zp JOIN zo ON zp.f = zo.f""".stripMargin))
  }

  // ---------------------------------------------------------------- q21
  /** Temporal as-of join: for each purchase, the latest click by the
    * same user at-or-before it (the reference's temporal-table join
    * semantics). Spark: union + last(ignoreNulls) over an event-time
    * window — one shuffle, no per-row subqueries, scales linearly. */
  private val q21 = QueryDef(
    "q21_asof_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      // dedupe clicks to one per (user, us) for a well-defined as-of
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("us"))
        .agg(max(col("event_id")).as("click_id"))
        .select(col("user_id"), col("us"), col("click_id"),
          lit(0).as("kind"), lit(null).cast("long").as("p_id"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          lit(null).cast("long").as("click_id"), lit(1).as("kind"),
          col("event_id").as("p_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("kind"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionAll(purch)
        .withColumn("asof_click", last(col("click_id"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("p_id"), col("user_id"), col("us").as("purch_us"),
          col("asof_click"))
    },
    Some("""WITH clicks AS (
      |  SELECT user_id, epoch_us(ts) AS us, MAX(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |purch AS (
      |  SELECT event_id AS p_id, user_id, epoch_us(ts) AS purch_us
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.p_id, p.user_id, p.purch_us, c.click_id AS asof_click
      |FROM purch p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.purch_us >= c.us""".stripMargin))

  // ---------------------------------------------------------------- q22
  /** Interval/range join: errors within ±5 minutes of a purchase by
    * the same user (equi key + range predicate → no cartesian). */
  private val q22 = QueryDef(
    "q22_range_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
      val e = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"),
          col("user_id").as("e_user"), unix_micros(col("ts")).as("e_us"))
      p.join(e, col("user_id") === col("e_user") &&
          col("e_us").between(col("p_us") - 300000000L, col("p_us") + 300000000L))
        .select(col("p_id"), col("user_id"), col("e_id"),
          (col("e_us") - col("p_us")).as("delta_us"))
    },
    Some("""WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
      |  FROM events WHERE event_type = 'purchase'),
      |e AS (SELECT event_id AS e_id, user_id AS e_user, epoch_us(ts) AS e_us
      |  FROM events WHERE event_type = 'error')
      |SELECT p_id, user_id, e_id, e_us - p_us AS delta_us
      |FROM p JOIN e ON user_id = e_user
      |  AND e_us BETWEEN p_us - 300000000 AND p_us + 300000000""".stripMargin))

  // ---------------------------------------------------------------- q23
  private val q23 = QueryDef(
    "q23_pivot",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },
    Some("""SELECT user_id,
      | CAST(COUNT(CASE WHEN event_type='click' THEN 1 END) AS BIGINT) AS click,
      | CAST(COUNT(CASE WHEN event_type='view' THEN 1 END) AS BIGINT) AS view,
      | CAST(COUNT(CASE WHEN event_type='purchase' THEN 1 END) AS BIGINT) AS purchase,
      | CAST(COUNT(CASE WHEN event_type='signup' THEN 1 END) AS BIGINT) AS signup,
      | CAST(COUNT(CASE WHEN event_type='error' THEN 1 END) AS BIGINT) AS error
      |FROM events GROUP BY user_id""".stripMargin))

  // ---------------------------------------------------------------- q24
  private val q24 = QueryDef(
    "q24_grouping_sets",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("y", year(col("o_orderdate")))
      o.cube(col("o_orderstatus"), col("y"))
        .agg(
          grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("total"))
    },
    Some(s"""SELECT o_orderstatus, y,
      | CAST(GROUPING(o_orderstatus, y) AS INTEGER) AS gid,
      | COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
      |FROM (SELECT *, CAST(year(o_orderdate) AS INTEGER) AS y FROM orders)
      |GROUP BY CUBE(o_orderstatus, y)""".stripMargin))

  val defs: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12,
    q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24)
}
