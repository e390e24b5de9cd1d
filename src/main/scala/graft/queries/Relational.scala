package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Layer-B relational surface (SURVEY.md §2-B): the capabilities the
  * reference delegates to Hive, re-expressed as declarative Spark plans so
  * Catalyst handles pushdown/pruning/join-selection.
  *
  * Cross-engine determinism rules used throughout (the driver hash-compares
  * against DuckDB):
  *   - money/quantity aggregates go through DECIMAL(9,2) (exact) and are cast
  *     to DOUBLE only at the very end — both engines land on the same bits;
  *   - every query has a total deterministic ORDER BY (ties broken by keys);
  *   - NULLS FIRST is spelled explicitly in the oracle (DuckDB defaults to
  *     NULLS LAST, Spark to NULLS FIRST);
  *   - interval logic uses integer epoch microseconds, never float seconds;
  *   - counts use COUNT (BIGINT in both), never SUM over INT (HUGEINT in
  *     DuckDB).
  */
object Relational {

  /** TPC-H Q1 shape: scan → filter (pushed to parquet) → partial+final hash
    * agg on 32 shuffle partitions. At 100 TB this is the canonical map-side
    * combine pattern: 6 aggregates over ~4 groups shuffle only 32×4 rows.
    */
  val q01 = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2))) * (CAST(1 AS DECIMAL(9,2)) + CAST(l_tax AS DECIMAL(9,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    val one = lit(1).cast("decimal(9,2)")
    t(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) * (one + dec(col("l_tax"))))
          .cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Selective filter + narrow projection: both the predicate and the
    * 5-column ReadSchema must reach the parquet scan (verified via explain).
    */
  val q02 = Q(
    "q02_filter_project",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_quantity < 5
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp")
        && col("l_quantity") < 5)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** TPC-H Q3 shape: small filtered dim is broadcast, the orders⋈lineitem
    * side stays shuffle-free on the probe; top-10 ordered on the exact
    * decimal before the final double cast.
    */
  val q03 = Q(
    "q03_top_revenue",
    """SELECT l_orderkey, o_orderdate, o_orderpriority, CAST(rev AS DOUBLE) AS revenue
      |FROM (
      |  SELECT l_orderkey, o_orderdate, o_orderpriority,
      |         SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))) AS rev
      |  FROM customer
      |  JOIN orders   ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  WHERE c_mktsegment = 'BUILDING'
      |  GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |) ORDER BY rev DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    val one = lit(1).cast("decimal(9,2)")
    val cust = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount")))).as("rev"))
      .orderBy(col("rev").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        col("rev").cast("double").as("revenue"))
  }

  /** Outer join retaining empty groups; SUM over an empty group is NULL in
    * both engines. nation/region are broadcast dims.
    */
  val q04 = Q(
    "q04_left_join_agg",
    """SELECT n_nationkey, n_name, r_name,
      |  COUNT(c_custkey) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(9,2))) AS DOUBLE) AS sum_bal
      |FROM nation
      |JOIN region ON n_regionkey = r_regionkey
      |LEFT JOIN customer ON c_nationkey = n_nationkey
      |GROUP BY n_nationkey, n_name, r_name
      |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
    t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .join(t(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"), "left")
      .groupBy(col("n_nationkey"), col("n_name"), col("r_name"))
      .agg(count(col("c_custkey")).as("n_cust"),
        sum(dec(col("c_acctbal"))).cast("double").as("sum_bal"))
      .orderBy(col("n_nationkey"))
  }

  /** LEFT SEMI join = EXISTS. */
  val q05 = Q(
    "q05_semi_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders").where(col("o_orderstatus") === "O")
    t(s, dir, "customer")
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** LEFT ANTI join = NOT EXISTS. */
  val q06 = Q(
    "q06_anti_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Exact COUNT(DISTINCT) — expands to a two-phase aggregate; the
    * approx_count_distinct (HLL) variant is exercised in tests, not here,
    * since its value is engine-specific.
    */
  val q07 = Q(
    "q07_distinct_agg",
    """SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS sum_value,
      |  CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) AS avg_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(dec(col("value"))).cast("double").as("sum_value"),
        (sum(dec(col("value"))).cast("double") / count(lit(1))).as("avg_value"))
      .orderBy(col("event_type"))
  }

  /** ROLLUP over the region→nation hierarchy. */
  val q08 = Q(
    "q08_rollup",
    """SELECT r_name, n_name, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_price
      |FROM region
      |JOIN nation   ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders   ON o_custkey = c_custkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** CUBE over two lineitem dimensions. */
  val q09 = Q(
    "q09_cube",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Explicit GROUPING SETS (SQL form — DataFrame API only exposes
    * rollup/cube; same Catalyst Expand underneath).
    */
  val q10 = Q(
    "q10_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
    t(s, dir, "orders").createOrReplaceTempView("graft_orders_q10")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM graft_orders_q10
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Per-group top-k via ranking window — the scalable "top N per key"
    * pattern (no global sort; partial sort within each hash partition).
    */
  val q11 = Q(
    "q11_window_topk",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Analytic windows: running sum (exact decimal frame), lag/lead. */
  val q12 = Q(
    "q12_window_running",
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2)))
      |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      |  LAG(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
      |  LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Global top-k: Spark's TakeOrderedAndProject — no full sort, each
    * partition keeps k rows, driver merges 32×k.
    */
  val q13 = Q(
    "q13_topk_global",
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)
  }

  /** Set operations: INTERSECT / EXCEPT / UNION(distinct). */
  val q14 = Q(
    "q14_set_ops",
    """(SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      | INTERSECT
      | SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
      |UNION
      |(SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
      | EXCEPT
      | SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |ORDER BY custkey""".stripMargin) { (s, dir) =>
    val cust = t(s, dir, "customer")
    val building = cust.where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val fOrders = t(s, dir, "orders").where(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    val rich = cust.where(col("c_acctbal") > 9000).select(col("c_custkey").as("custkey"))
    building.intersect(fOrders)
      .union(rich.except(building))
      .distinct()
      .orderBy("custkey")
  }

  /** Scalar string functions (all codegen'd builtins). */
  val q15 = Q(
    "q15_string_funcs",
    """SELECT p_partkey,
      |  lower(p_name)  AS lname,
      |  upper(p_brand) AS ubrand,
      |  length(p_name) AS name_len,
      |  substr(p_type, 1, 3) AS type_pfx,
      |  replace(p_name, ' ', '_') AS name_us,
      |  concat(p_brand, ':', p_type) AS brand_type,
      |  regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    t(s, dir, "part").select(
      col("p_partkey"),
      lower(col("p_name")).as("lname"),
      upper(col("p_brand")).as("ubrand"),
      length(col("p_name")).as("name_len"),
      substring(col("p_type"), 1, 3).as("type_pfx"),
      regexp_replace(col("p_name"), " ", "_").as("name_us"),
      concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
      regexp_extract(col("p_brand"), "#([0-9]+)", 1).as("brand_num"))
      .orderBy("p_partkey")
  }

  /** Date/time functions: truncation + field extraction. */
  val q16 = Q(
    "q16_date_funcs",
    """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
      |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month_start"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy("month_start")
  }

  /** Semi-structured: JSON path extraction from events.props. Spark side
    * uses get_json_object; the oracle reproduces it with a regex (DuckDB's
    * JSON extension may not be loadable offline).
    */
  val q17 = Q(
    "q17_json_extract",
    """SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy("k")
  }

  /** Theta (non-equi) self-join: equi part on region + inequality filter —
    * Catalyst plans the equi key and keeps the `<` as join condition.
    */
  val q18 = Q(
    "q18_theta_self_join",
    """SELECT a.n_name AS name_a, b.n_name AS name_b, a.n_regionkey AS region
      |FROM nation a JOIN nation b
      |  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
      |ORDER BY region, name_a, name_b""".stripMargin) { (s, dir) =>
    val n = t(s, dir, "nation")
    val a = n.select(col("n_nationkey").as("ka"), col("n_name").as("name_a"),
      col("n_regionkey").as("region"))
    val b = n.select(col("n_nationkey").as("kb"), col("n_name").as("name_b"),
      col("n_regionkey").as("region_b"))
    a.join(b, col("region") === col("region_b") && col("ka") < col("kb"))
      .select("name_a", "name_b", "region")
      .orderBy("region", "name_a", "name_b")
  }

  /** Scalar subquery threshold. The threshold itself is computed with exact
    * decimal arithmetic so both engines compare against the same double.
    */
  val q19 = Q(
    "q19_scalar_subquery",
    """SELECT COUNT(*) AS n_above,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS sum_above
      |FROM orders
      |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*) FROM orders)""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders")
    val thr = o.agg((sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("thr"))
    o.crossJoin(broadcast(thr))
      .where(col("o_totalprice") > col("thr"))
      .agg(count(lit(1)).as("n_above"),
        sum(dec(col("o_totalprice"))).cast("double").as("sum_above"))
  }

  /** Conditional aggregation (manual pivot). COUNT(CASE...) keeps both
    * engines in BIGINT (DuckDB SUM(INT) would widen to HUGEINT).
    */
  val q20 = Q(
    "q20_conditional_agg",
    """SELECT n_name,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
      |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
      |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
      |FROM nation
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders   ON o_custkey = c_custkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_p"))
      .orderBy("n_name")
  }

  /** Batch sessionization (gaps-and-islands): 30-minute inactivity gap.
    * Interval math on integer epoch-microseconds for exactness. The
    * streaming twin (session_window + watermark) lives in graft.streaming.
    */
  val q21 = Q(
    "q21_sessionize",
    """WITH e AS (
      |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
      |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
      |         OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, event_id, ts,
      |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
      |  FROM e)
      |SELECT user_id, sess_id, COUNT(*) AS n_events, MIN(ts) AS sess_start, MAX(ts) AS sess_end
      |FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    t(s, dir, "events")
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs
          || lag(col("us"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("sess_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("sess_start"),
        max(col("ts")).as("sess_end"))
      .orderBy("user_id", "sess_id")
  }

  /** Tumbling event-time window in batch (same window() operator Structured
    * Streaming uses); UTC day floor == date_trunc.
    */
  val q22 = Q(
    "q22_window_tumbling",
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(col("window.start").as("day_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("day_start", "event_type")
  }

  /** Scalar math functions (sqrt is IEEE-correctly-rounded in both engines;
    * round-half-up matches for positive values; ceil/floor normalized to
    * BIGINT since Spark returns LONG and DuckDB DOUBLE).
    */
  val q23 = Q(
    "q23_math_funcs",
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_discount - 0.05) AS d_abs,
      |  CAST(ceil(l_quantity / 7) AS BIGINT) AS q_ceil,
      |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS p_floor,
      |  sqrt(l_extendedprice) AS p_sqrt,
      |  round(l_extendedprice / 100, 1) AS p_round,
      |  l_orderkey % 7 AS mod7,
      |  greatest(l_quantity, l_discount * 100) AS g,
      |  least(l_tax, l_discount) AS l
      |FROM lineitem
      |WHERE l_orderkey % 50 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .where(col("l_orderkey") % 50 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("d_abs"),
        ceil(col("l_quantity") / 7).cast("long").as("q_ceil"),
        floor(col("l_extendedprice") / 1000).cast("long").as("p_floor"),
        sqrt(col("l_extendedprice")).as("p_sqrt"),
        round(col("l_extendedprice") / 100, 1).as("p_round"),
        (col("l_orderkey") % 7).as("mod7"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
        least(col("l_tax"), col("l_discount")).as("l"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Array/lambda functions over the tokenized text column. */
  val q24 = Q(
    "q24_array_funcs",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n,
      |  string_split(text, ' ')[1] AS first_tok,
      |  array_to_string(list_slice(string_split(text, ' '), 1, 3), '-') AS first3,
      |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
      |  CAST(list_position(string_split(text, ' '), 'join') AS BIGINT) AS join_pos,
      |  len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS n_long,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS uniq_sorted
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val tk = split(col("text"), " ")
    t(s, dir, "documents").select(
      col("doc_id"),
      size(tk).as("n"),
      element_at(tk, 1).as("first_tok"),
      concat_ws("-", slice(tk, 1, 3)).as("first3"),
      array_contains(tk, "spark").as("has_spark"),
      array_position(tk, "join").as("join_pos"),
      size(filter(tk, x => length(x) > 4)).as("n_long"),
      concat_ws(",", array_sort(array_distinct(tk))).as("uniq_sorted"))
      .orderBy("doc_id")
  }

  /** UNION ALL (bag union) then re-aggregate. */
  val q25 = Q(
    "q25_union_all_agg",
    """SELECT custkey, COUNT(*) AS n FROM (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |  UNION ALL
      |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
      |) GROUP BY custkey ORDER BY custkey""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders")
    val a = o.where(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
    val b = o.where(col("o_totalprice") > 100000).select(col("o_custkey").as("custkey"))
    a.unionByName(b).groupBy("custkey").agg(count(lit(1)).as("n")).orderBy("custkey")
  }

  /** Multiset INTERSECT ALL / EXCEPT ALL semantics. */
  val q26 = Q(
    "q26_multiset_ops",
    """SELECT custkey, COUNT(*) AS n FROM (
      |  SELECT custkey FROM (
      |    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |    INTERSECT ALL
      |    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000)
      |  UNION ALL
      |  SELECT custkey FROM (
      |    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |    EXCEPT ALL
      |    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000)
      |) GROUP BY custkey ORDER BY custkey""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders")
    val a = o.where(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
    val b = o.where(col("o_totalprice") > 100000).select(col("o_custkey").as("custkey"))
    a.intersectAll(b).union(a.exceptAll(b))
      .groupBy("custkey").agg(count(lit(1)).as("n")).orderBy("custkey")
  }

  /** Remaining window-function family: ntile, first/last value with an
    * explicit full frame (LAST_VALUE defaults to a running frame in both
    * engines — the full frame must be spelled out).
    */
  val q27 = Q(
    "q27_window_extras",
    """SELECT o_custkey, o_orderkey,
      |  NTILE(4) OVER w AS quartile,
      |  FIRST_VALUE(o_orderkey) OVER w AS first_ord,
      |  LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ord
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      ntile(4).over(w).as("quartile"),
      first(col("o_orderkey")).over(w).as("first_ord"),
      last(col("o_orderkey")).over(wFull).as("last_ord"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Exact interpolated percentiles (§2-B ordered-set aggregates). Only
    * integral-valued doubles (l_quantity ∈ 1..50) are interpolated: with
    * f ∈ {.25,.5,.75} both engines' linear-interpolation formulas
    * (a + f·(b−a) vs (1−f)·a + f·b) are exact in binary floating point, so
    * the hash compare is bit-stable; arbitrary doubles would diverge in the
    * last ulp between the two formulas.
    */
  val q28 = Q(
    "q28_percentiles",
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.50) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.50)).as("p50"),
        percentile(col("l_quantity"), lit(0.75)).as("p75"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** PIVOT (wide-format aggregation). Spark's `pivot` with an explicit
    * value list plans as one hash aggregation with conditional partials —
    * no extra shuffle vs the long form; the oracle is the equivalent
    * conditional aggregation (engine-neutral, and how PIVOT desugars).
    * Explicit values keep the plan static — value discovery would add a
    * driver-side distinct job, a scale anti-pattern.
    */
  val q29 = Q(
    "q29_pivot",
    """SELECT l_returnflag,
      |  COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F,
      |  COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .orderBy("l_returnflag")
  }

  /** FULL OUTER join (q76): reconciliation of two aggregates whose key
    * sets are guaranteed to mismatch (mod-7 vs mod-11 buckets), so both
    * null sides are exercised. At scale a full-outer is a single sort-merge
    * shuffle on the key — the shape to prefer over two anti-joins + union.
    */
  val q76 = Q(
    "q76_full_outer_join",
    """SELECT COALESCE(a.b, o.b) AS bucket, a.n_cust, o.n_ord
      |FROM (SELECT c_custkey % 7 AS b, COUNT(*) AS n_cust
      |      FROM customer GROUP BY c_custkey % 7) a
      |FULL OUTER JOIN
      |     (SELECT o_custkey % 11 AS b, COUNT(*) AS n_ord
      |      FROM orders GROUP BY o_custkey % 11) o
      |ON a.b = o.b
      |ORDER BY bucket""".stripMargin) { (s, dir) =>
    val cust = t(s, dir, "customer")
      .groupBy((col("c_custkey") % 7).as("b")).agg(count(lit(1)).as("n_cust"))
    val ord = t(s, dir, "orders")
      .groupBy((col("o_custkey") % 11).as("b")).agg(count(lit(1)).as("n_ord"))
    cust.join(ord, cust("b") === ord("b"), "full_outer")
      .select(coalesce(cust("b"), ord("b")).as("bucket"), col("n_cust"), col("n_ord"))
      .orderBy("bucket")
  }

  /** Time-range window frame (q77): per-user sliding 1-hour event count.
    * The frame is expressed in integer epoch microseconds in BOTH engines
    * (RANGE over a monotone BIGINT — interval-typed frames differ subtly
    * across engines; epoch-µs math is the determinism rule). Peers (equal
    * timestamps) are counted together by RANGE semantics, so the result is
    * order-deterministic without a tiebreak.
    */
  val q77 = Q(
    "q77_range_window",
    """SELECT event_id, user_id,
      |  COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |    AS n_last_hour
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_last_hour"))
      .orderBy("event_id")
  }

  /** UNPIVOT / melt (q78): wide per-type aggregates to (metric, val) long
    * form — Spark's unpivot operator (Expand under the hood, no shuffle
    * beyond the aggregation); the oracle is the engine-neutral UNION ALL
    * formulation. Values share one DOUBLE type (unpivot requires it; sums
    * go through DECIMAL first per the determinism rules).
    */
  val q78 = Q(
    "q78_unpivot",
    """WITH a AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_value
      |  FROM events GROUP BY event_type)
      |SELECT event_type, metric, val FROM (
      |  SELECT event_type, 'n' AS metric, n AS val FROM a
      |  UNION ALL
      |  SELECT event_type, 'sum_value' AS metric, sum_value AS val FROM a)
      |ORDER BY event_type NULLS FIRST, metric""".stripMargin) { (s, dir) =>
    val wide = t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("value").cast("decimal(18,3)")).cast("double").as("sum_value"))
    wide.unpivot(Array(col("event_type")), Array(col("n"), col("sum_value")),
        "metric", "val")
      .orderBy(col("event_type").asc_nulls_first, col("metric"))
  }

  /** Correlated EXISTS / NOT EXISTS (q81): customers that placed at least
    * one high-value order and never had a low-priority one. Catalyst's
    * RewriteCorrelatedScalarSubquery/RewritePredicateSubquery turn both
    * into semi/anti joins — exercised via the SQL surface on temp views,
    * because that subquery rewrite IS the feature under test (the
    * DataFrame twins are q05/q06).
    */
  val q81 = Q(
    "q81_correlated_exists",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 300000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '5-LOW')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").createOrReplaceTempView("graft_cust_q81")
    t(s, dir, "orders").createOrReplaceTempView("graft_ord_q81")
    s.sql(
      """SELECT c_custkey, c_name FROM graft_cust_q81 c
        |WHERE EXISTS (SELECT 1 FROM graft_ord_q81 o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 300000)
        |  AND NOT EXISTS (SELECT 1 FROM graft_ord_q81 o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '5-LOW')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** posexplode / UNNEST WITH ORDINALITY (q82): token position is part of
    * the output contract (chunking, positional n-grams, alignment all need
    * it). Spark's posexplode is Generate with an ordinal — shuffle-free,
    * pipelined into the scan.
    */
  val q82 = Q(
    "q82_posexplode",
    """SELECT doc_id, unnest(range(0, len(a))) AS pos, unnest(a) AS tok
      |FROM (SELECT doc_id, string_split(text, ' ') AS a
      |      FROM documents WHERE doc_id % 100 = 0)
      |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .where(col("doc_id") % 100 === 0)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .orderBy("doc_id", "pos")
  }

  /** Time-series resample + gap-fill (q83): hourly per-type event counts on
    * a dense hour spine (sequence/explode — generated, not scanned), missing
    * hours as 0, last observed hourly sum carried forward via
    * last(ignoreNulls) — the standard feature-engineering shape for training
    * data. Hours travel as integer epoch-µs (the determinism rule).
    */
  val q83 = Q(
    "q83_gap_fill",
    """WITH hh AS (SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sv
      |  FROM events GROUP BY event_type, date_trunc('hour', ts)),
      |spine AS (SELECT event_type,
      |    unnest(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS h
      |  FROM (SELECT event_type, min(h) AS hmin, max(h) AS hmax
      |        FROM hh GROUP BY event_type)),
      |j AS (SELECT spine.event_type, spine.h, COALESCE(hh.n, 0) AS n, hh.sv
      |      FROM spine LEFT JOIN hh USING (event_type, h))
      |SELECT event_type, epoch_us(h) AS h_us, n,
      |  last_value(sv IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h)
      |    AS sv_ff
      |FROM j ORDER BY event_type, h_us""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    val hourly = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,3)")).cast("double").as("sv"))
    val spine = hourly
      .groupBy(col("event_type"))
      .agg(min(col("h")).as("hmin"), max(col("h")).as("hmax"))
      .select(col("event_type"),
        explode(sequence(col("hmin"), col("hmax"),
          expr("INTERVAL 1 HOUR"))).as("h"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), unix_micros(col("h")).as("h_us"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("sv"), ignoreNulls = true).over(w).as("sv_ff"))
      .orderBy("event_type", "h_us")
  }

  /** Higher-order array-function breadth (q84): zip_with + ordered
    * aggregate fold, array_max, lambda filter — all whole-stage-codegen'd,
    * no UDF. The fold seeds 0.0 and the oracle prepends the same 0.0 so
    * both engines accumulate in identical IEEE order.
    */
  val q84 = Q(
    "q84_array_funcs",
    """SELECT vec_id,
      |  CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(range(1, 65),
      |      k -> CAST(embedding[k] AS DOUBLE) * CAST(embedding[65-k] AS DOUBLE))),
      |    (u, v) -> u + v) AS DOUBLE) AS rev_dot,
      |  CAST(list_max(embedding) AS DOUBLE) AS mx,
      |  len(list_filter(embedding, x -> x > 0)) AS n_pos
      |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val e = col("embedding")
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        aggregate(
          zip_with(e, reverse(e), (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("rev_dot"),
        array_max(e).cast("double").as("mx"),
        size(filter(e, x => x > 0)).as("n_pos"))
      .orderBy("vec_id")
  }

  /** Ordered string aggregation (q86): DuckDB's string_agg(… ORDER BY) vs
    * Spark's sort_array(collect_list(…)) + array_join — collect_list alone
    * is partition-order-nondeterministic, so the deterministic form is the
    * sorted-array one; sorting numerically BEFORE casting to string keeps
    * both engines on numeric order.
    */
  val q86 = Q(
    "q86_ordered_string_agg",
    """SELECT lang, COUNT(*) AS n,
      |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS ids
      |FROM documents WHERE doc_id < 200
      |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .where(col("doc_id") < 200)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        array_join(
          transform(sort_array(collect_list(col("doc_id"))),
            x => x.cast("string")), ",").as("ids"))
      .orderBy("lang")
  }

  /** Correlated LATERAL join with per-row ORDER BY + LIMIT (q90): top-2
    * orders per customer segment aggregate — the lateral-subquery surface
    * (DecorrelateInnerQuery path), distinct from the window-function top-k
    * formulation of q11. Money goes through DECIMAL per the determinism
    * rules.
    */
  val q90 = Q(
    "q90_lateral_topk",
    """SELECT c.c_mktsegment, t.o_orderkey,
      |  CAST(CAST(t.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      |FROM (SELECT DISTINCT c_mktsegment FROM customer) c,
      |LATERAL (SELECT o.o_orderkey, o.o_totalprice
      |         FROM orders o JOIN customer c2 ON o.o_custkey = c2.c_custkey
      |         WHERE c2.c_mktsegment = c.c_mktsegment
      |         ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t
      |ORDER BY c.c_mktsegment, price DESC, t.o_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").createOrReplaceTempView("graft_cust_q90")
    t(s, dir, "orders").createOrReplaceTempView("graft_ord_q90")
    s.sql(
      """SELECT c.c_mktsegment, t.o_orderkey,
        |  CAST(CAST(t.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM (SELECT DISTINCT c_mktsegment FROM graft_cust_q90) c,
        |LATERAL (SELECT o.o_orderkey, o.o_totalprice
        |         FROM graft_ord_q90 o JOIN graft_cust_q90 c2
        |           ON o.o_custkey = c2.c_custkey
        |         WHERE c2.c_mktsegment = c.c_mktsegment
        |         ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t
        |ORDER BY c.c_mktsegment, price DESC, t.o_orderkey""".stripMargin)
  }

  /** Moment statistics via exact decimal sums (q91): built-in stddev/corr
    * accumulate doubles in partition order — never hash-comparable across
    * engines — so mean/variance/correlation are derived from DECIMAL
    * Σx, Σx², Σxy (exact, order-free) with one identical double formula on
    * top. Same partial+final hash-agg shape as the built-ins, exact map-side
    * combine; at 100 TB the shuffle carries 5 decimals per group per
    * partition.
    */
  val q91 = Q(
    "q91_decimal_moments",
    """WITH s AS (SELECT event_type, COUNT(*) AS n,
      |    SUM(CAST(value AS DECIMAL(18,3))) AS sx,
      |    SUM(CAST(value AS DECIMAL(18,3)) * CAST(value AS DECIMAL(18,3))) AS sxx,
      |    SUM(CAST(user_id AS DECIMAL(18,3))) AS sy,
      |    SUM(CAST(user_id AS DECIMAL(18,3)) * CAST(user_id AS DECIMAL(18,3))) AS syy,
      |    SUM(CAST(value AS DECIMAL(18,3)) * CAST(user_id AS DECIMAL(18,3))) AS sxy
      |  FROM events GROUP BY event_type)
      |SELECT event_type, n,
      |  CAST(sx AS DOUBLE) / n AS mean_value,
      |  CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
      |    AS var_value,
      |  sqrt(CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
      |    AS stddev_value,
      |  (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) /
      |  (sqrt(CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) *
      |   sqrt(CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)))
      |    AS corr_value_user
      |FROM s ORDER BY event_type""".stripMargin) { (s, dir) =>
    val x = col("value").cast("decimal(18,3)")
    val y = col("user_id").cast("decimal(18,3)")
    val agg = t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(x * x).as("sxx"),
        sum(y).as("sy"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
    val n = col("n")
    def d(c: String) = col(c).cast("double")
    val mx = d("sx") / n
    val varx = d("sxx") / n - (d("sx") / n) * (d("sx") / n)
    val vary = d("syy") / n - (d("sy") / n) * (d("sy") / n)
    agg.select(col("event_type"), n,
      mx.as("mean_value"),
      varx.as("var_value"),
      sqrt(varx).as("stddev_value"),
      ((d("sxy") / n - (d("sx") / n) * (d("sy") / n)) / (sqrt(varx) * sqrt(vary)))
        .as("corr_value_user"))
      .orderBy("event_type")
  }

  /** Deterministic arg-max/arg-min (q92): `max_by` breaks ties arbitrarily
    * in both engines, so the portable form is max/min over a lexicographic
    * struct with a unique tiebreak column — same one-pass hash agg, fully
    * ordered result.
    */
  val q92 = Q(
    "q92_argmax_struct",
    """SELECT event_type,
      |  max({'value': value, 'event_id': event_id}).event_id AS max_event,
      |  CAST(max({'value': value, 'event_id': event_id}).value AS DOUBLE) AS max_value,
      |  min({'value': value, 'event_id': event_id}).event_id AS min_event,
      |  CAST(min({'value': value, 'event_id': event_id}).value AS DOUBLE) AS min_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val pair = struct(col("value"), col("event_id"))
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(max(pair).as("mx"), min(pair).as("mn"))
      .select(col("event_type"),
        col("mx.event_id").as("max_event"),
        col("mx.value").as("max_value"),
        col("mn.event_id").as("min_event"),
        col("mn.value").as("min_value"))
      .orderBy("event_type")
  }

  /** Distribution-window breadth (q93): ntile / percent_rank / cume_dist /
    * lag-with-default in one keyed window — equal-frequency binning and
    * ECDF features for curation. All four are rank-arithmetic (integer
    * ratios), so they hash-compare exactly; the window order is total
    * (value, event_id).
    */
  val q93 = Q(
    "q93_distribution_windows",
    """SELECT event_id, event_type,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  lag(CAST(value AS DOUBLE), 1, 0.0) OVER w AS prev_value
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    t(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        lag(col("value"), 1, 0.0).over(w).as("prev_value"))
      .orderBy("event_id")
  }

  /** Edit-distance fuzzy matching (q94): the record-linkage primitive —
    * pairwise levenshtein under a threshold. Both engines run the same
    * classic DP over the same strings → identical integers. The pair space
    * here is a bounded self-join; at 100 TB the same operator runs behind
    * a blocking key (e.g. q32's LSH buckets), never all-pairs.
    */
  val q94 = Q(
    "q94_fuzzy_match",
    """SELECT a.c_custkey AS ka, b.c_custkey AS kb,
      |  levenshtein(a.c_name, b.c_name) AS dist
      |FROM customer a JOIN customer b
      |  ON a.c_custkey < b.c_custkey
      |WHERE a.c_custkey < 40 AND b.c_custkey < 40
      |  AND levenshtein(a.c_name, b.c_name) <= 2
      |ORDER BY ka, kb""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer").where(col("c_custkey") < 40)
      .select(col("c_custkey"), col("c_name"))
    val a = c.as("a"); val b = c.as("b")
    // banded DP (r21): levenshtein with the threshold arg runs
    // O(len·maxDist) instead of O(len²) and the -1 sentinel filter
    // evaluates the DP ONCE per pair (the filter-then-project form ran it
    // twice for surviving rows). Identical kept rows and dist values —
    // the threshold form returns the exact distance when <= 2.
    a.join(b, col("a.c_custkey") < col("b.c_custkey"))
      .select(col("a.c_custkey").as("ka"), col("b.c_custkey").as("kb"),
        levenshtein(col("a.c_name"), col("b.c_name"), 2).as("dist"))
      .where(col("dist") >= 0)
      .orderBy("ka", "kb")
  }

  /** Equal-width histogram (q95): two-pass global min/max + one hash agg
    * on the bin index — the feature-engineering binning shape. The bin
    * formula is ONE double expression evaluated identically in both
    * engines; the 1-row extremes broadcast to the scan.
    */
  val q95 = Q(
    "q95_histogram",
    """WITH mm AS (SELECT min(CAST(value AS DOUBLE)) AS lo,
      |                   max(CAST(value AS DOUBLE)) AS hi FROM events)
      |SELECT CAST(least(floor((CAST(value AS DOUBLE) - lo) / (hi - lo) * 10), 9) AS BIGINT)
      |    AS bin,
      |  COUNT(*) AS n
      |FROM events, mm
      |GROUP BY 1 ORDER BY bin""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    val mm = ev.agg(min(col("value").cast("double")).as("lo"),
      max(col("value").cast("double")).as("hi"))
    ev.join(broadcast(mm))
      .select(least(floor((col("value").cast("double") - col("lo")) /
        (col("hi") - col("lo")) * 10), lit(9.0)).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      .orderBy("bin")
  }

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24,
    q25, q26, q27, q28, q29, q76, q77, q78, q81, q82, q83, q84, q86, q90,
    q91, q92, q93, q94, q95)
}
