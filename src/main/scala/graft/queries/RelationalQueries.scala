package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.sources.Inputs

/** The relational check-query surface (SURVEY.md §2.2–§2.9): every
  * capability the reference's built-ins and canonical user programs
  * express, as declarative DataFrame programs so Catalyst plans pushdown,
  * pruning, join strategy, and partial aggregation.
  */
object RelationalQueries {
  import QueryDef._

  /** DECIMAL(12,2) — exact money arithmetic, identical in Spark and
    * DuckDB regardless of summation order (see QueryDef scaladoc). */
  private val Dec = "decimal(12,2)"

  // ---- §2.1 scans / sources -------------------------------------------

  val scanFullCount = sql("scan_full_count",
    "SELECT count(*) AS cnt FROM lineitem") { (s, d) =>
    Tables.lineitem(s, d).agg(count(lit(1)).as("cnt"))
  }

  // DatastoreInputReader analogue: conjunctive pushdown filters + projection
  // (reference input_readers.py:607-785). Range + equality conjunction.
  val scanFilterRange = sql("scan_filter_range",
    """SELECT o_orderkey, o_custkey,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1997-01-01'
         AND o_orderstatus = 'F'""") { (s, d) =>
    Inputs.tableScan(s, s"$d/orders.parquet",
        filters = Seq(
          ("o_orderdate", ">=", java.sql.Timestamp.valueOf("1996-01-01 00:00:00")),
          ("o_orderdate", "<", java.sql.Timestamp.valueOf("1997-01-01 00:00:00")),
          ("o_orderstatus", "=", "F")))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast(Dec).cast("double").as("price"))
  }

  // Keys-only scan (input_readers.py:788-791): column pruning to the key.
  val scanKeysOnly = sql("scan_keys_only",
    "SELECT c_custkey FROM customer") { (s, d) =>
    Inputs.keyScan(s, s"$d/customer.parquet", "c_custkey")
  }

  // LogInputReader analogue (input_readers.py:2022-2244): time-range scan
  // + level filter, aggregated per type.
  val scanLogWindow = sql("scan_log_window",
    """SELECT event_type, count(*) AS cnt,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
       FROM events
       WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
         AND event_type IN ('error', 'purchase')
       GROUP BY event_type""") { (s, d) =>
    Inputs.logScan(s, s"$d/events.parquet",
        java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-20 00:00:00"),
        eventTypes = Seq("error", "purchase"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("total_cents"))
  }

  // NamespaceInputReader analogue (input_readers.py:1929-2019): metadata
  // namespace enumeration == distinct over the name column.
  val scanNamespaces = sql("scan_namespaces",
    "SELECT DISTINCT n_name FROM nation") { (s, d) =>
    Tables.nation(s, d).select(col("n_name")).distinct()
  }

  // ConsecutiveLongInput analogue (inputs/ConsecutiveLongInput.java).
  val rangeInputSum = sql("range_input_sum",
    """SELECT CAST(sum(range) AS BIGINT) AS s, count(*) AS n
       FROM range(0, 100000)""") { (s, _) =>
    Inputs.consecutiveLongs(s, 0L, 100000L, shards = 8).toDF("v")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
  }

  // ConcatenatingInputReader analogue (UNION ALL of two scans re-unioned,
  // SURVEY.md §2.8): split orders in halves, re-union, aggregate.
  val unionConcat = sql("union_concat",
    """SELECT o_orderstatus, count(*) AS cnt FROM (
         SELECT * FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL
         SELECT * FROM orders WHERE o_orderkey % 2 = 1
       ) t GROUP BY o_orderstatus""") { (s, d) =>
    val o = Tables.orders(s, d)
    Inputs.concatenating(Seq(
        o.filter(col("o_orderkey") % 2 === 0),
        o.filter(col("o_orderkey") % 2 === 1)))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
  }

  // ---- §2.2 filters / projections -------------------------------------

  val filterConj = sql("filter_conj",
    """SELECT count(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_discount = 0.05""") { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_discount") === 0.05)
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"))
  }

  val projectScalar = sql("project_scalar",
    """SELECT p_partkey, upper(p_name) AS name_up,
       concat(p_brand, ':', p_type) AS brand_type
       FROM part""") { (s, d) =>
    Tables.part(s, d).select(col("p_partkey"),
      upper(col("p_name")).as("name_up"),
      concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"))
  }

  // HAVING (CollisionFindingReducer pattern: keep groups over a threshold).
  val having = sql("having",
    """SELECT o_custkey, count(*) AS cnt FROM orders
       GROUP BY o_custkey HAVING count(*) >= 12""") { (s, d) =>
    Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 12)
  }

  // ---- §2.4 aggregation ------------------------------------------------

  // TPC-H Q1 shape — the canonical grouped-aggregate program. Partial
  // aggregation (the reference's combiner) is Catalyst's
  // HashAggregate(partial)/HashAggregate(final) split around the exchange.
  val aggQ1 = sql("agg_q1",
    """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc,
       count(*) AS cnt
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1999-06-30'
       GROUP BY l_returnflag, l_linestatus""") { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1999-06-30").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(Dec)).cast("double").as("sum_base"),
        sum(col("l_extendedprice").cast(Dec) *
          (lit(1).cast(Dec) - col("l_discount").cast(Dec)))
          .cast("double").as("sum_disc"),
        count(lit(1)).as("cnt"))
  }

  // DISTINCT == the KeyProjectionReducer pattern
  // (reducers/KeyProjectionReducer.java).
  val distinctKeys = sql("distinct_keys",
    "SELECT DISTINCT o_custkey FROM orders") { (s, d) =>
    Tables.orders(s, d).select(col("o_custkey")).distinct()
  }

  val distinctCount = sql("distinct_count",
    """SELECT count(DISTINCT o_custkey) AS n_cust,
       count(DISTINCT o_orderpriority) AS n_prio FROM orders""") { (s, d) =>
    Tables.orders(s, d).agg(
      countDistinct(col("o_custkey")).as("n_cust"),
      countDistinct(col("o_orderpriority")).as("n_prio"))
  }

  // ROLLUP subtotals — a capability upgrade over the reference
  // (SURVEY.md §2.4: "no grouping sets/cube/rollup … expressible for
  // free"), exact-checked against DuckDB's GROUP BY ROLLUP.
  val aggRollup = sql("agg_rollup",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""") { (s, d) =>
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(Dec)).cast("double").as("revenue"))
  }

  // CUBE over two dims (all four grouping combinations).
  val aggCube = sql("agg_cube",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""") { (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
  }

  // GROUPING SETS with disjoint sets — not expressible as cube/rollup;
  // Spark 4's Dataset.groupingSets API (one shuffle, Expand-based).
  val aggGroupingSets = sql("agg_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""") { (s, d) =>
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(Dec)).cast("double").as("revenue"))
  }

  // Ordered string aggregation (LISTAGG/string_agg): deterministic via
  // an explicit ORDER BY inside the aggregate — expressed portably as
  // sort-then-join so both engines concatenate identical sequences.
  val aggStringAgg = sql("agg_stringagg",
    """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
       FROM nation GROUP BY n_regionkey""") { (s, d) =>
    Tables.nation(s, d).groupBy(col("n_regionkey"))
      .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("names"))
  }

  // Variance / stddev / correlation from exact integer moments
  // (n, Σx, Σx², Σy, Σy², Σxy) — one partial-aggregatable pass, and
  // engine-portable where built-in var_samp/corr are not (their
  // partition-order-dependent double accumulation differs between
  // engines; integer moments are exact, and the final single division /
  // sqrt over identical exact operands is bit-deterministic). Moments
  // fit BIGINT here (|x|≤50, |y|≤10, n≤~1M per group); a 100 TB run
  // widens them to DECIMAL(38,0).
  val aggStats = sql("agg_stats",
    """WITH m AS (
         SELECT l_returnflag, count(*) AS n,
           CAST(SUM(q) AS BIGINT) AS sx, CAST(SUM(q*q) AS BIGINT) AS sxx,
           CAST(SUM(dc) AS BIGINT) AS sy, CAST(SUM(dc*dc) AS BIGINT) AS syy,
           CAST(SUM(q*dc) AS BIGINT) AS sxy
         FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
                 CAST(round(l_discount * 100) AS BIGINT) AS dc
               FROM lineitem) t
         GROUP BY l_returnflag)
       SELECT l_returnflag, n,
         CAST(n*sxx - sx*sx AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) AS var_qty,
         sqrt(CAST(n*sxx - sx*sx AS DOUBLE) / CAST(n*(n-1) AS DOUBLE)) AS std_qty,
         CAST(n*sxy - sx*sy AS DOUBLE)
           / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
            * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr_qty_disc
       FROM m""") { (s, d) =>
    val m = Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("q"),
        round(col("l_discount") * 100).cast("long").as("dc"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("sx"), sum(col("q") * col("q")).as("sxx"),
        sum(col("dc")).as("sy"), sum(col("dc") * col("dc")).as("syy"),
        sum(col("q") * col("dc")).as("sxy"))
    val dxx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val dyy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    m.select(col("l_returnflag"), col("n"),
      (dxx / (col("n") * (col("n") - 1)).cast("double")).as("var_qty"),
      sqrt(dxx / (col("n") * (col("n") - 1)).cast("double")).as("std_qty"),
      ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        / (sqrt(dxx) * sqrt(dyy))).as("corr_qty_disc"))
  }

  // Exact median (percentile with linear interpolation — both engines
  // interpolate identically over the same sorted integer values).
  val aggMedian = sql("agg_median",
    """SELECT l_returnflag,
       quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS med_qty,
       quantile_cont(CAST(l_quantity AS BIGINT), 0.9) AS p90_qty
       FROM lineitem GROUP BY l_returnflag""") { (s, d) =>
    Tables.lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(expr("percentile(CAST(l_quantity AS BIGINT), 0.5)").as("med_qty"),
        expr("percentile(CAST(l_quantity AS BIGINT), 0.9)").as("p90_qty"))
  }

  // Manual pivot via conditional aggregation (engine-portable PIVOT).
  val aggPivot = sql("agg_pivot",
    """SELECT o_orderpriority,
       count(*) FILTER (o_orderstatus = 'F') AS n_f,
       count(*) FILTER (o_orderstatus = 'O') AS n_o,
       count(*) FILTER (o_orderstatus = 'P') AS n_p
       FROM orders GROUP BY o_orderpriority""") { (s, d) =>
    Tables.orders(s, d).groupBy(col("o_orderpriority"))
      .agg(count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_p"))
  }

  // HLL sketch distinct-count (approx_count_distinct): the sketch
  // algorithms differ between engines, so raw estimates can't hash-match.
  // Instead each engine asserts its own sketch lands within 10% of the
  // exact distinct count (HLL++ default rsd is 5%) — a portable boolean
  // plus the exact counts, all oracle-checkable. At 100 TB the sketch is
  // the right default for cardinality estimation — no exact-distinct
  // shuffle of the full key set.
  val aggApproxDistinct = sql("agg_approx_distinct",
    """SELECT
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS exact_orders,
       abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey)) * 10
         <= count(DISTINCT o_custkey) AS cust_within_10pct,
       abs(approx_count_distinct(o_orderkey) - count(DISTINCT o_orderkey)) * 10
         <= count(DISTINCT o_orderkey) AS orders_within_10pct
       FROM orders""") { (s, d) =>
    Tables.orders(s, d).agg(
      countDistinct(col("o_custkey")).as("exact_cust"),
      countDistinct(col("o_orderkey")).as("exact_orders"),
      (abs(approx_count_distinct(col("o_custkey")) - countDistinct(col("o_custkey"))) * 10
        <= countDistinct(col("o_custkey"))).as("cust_within_10pct"),
      (abs(approx_count_distinct(col("o_orderkey")) - countDistinct(col("o_orderkey"))) * 10
        <= countDistinct(col("o_orderkey"))).as("orders_within_10pct"))
  }

  // ---- §2.5 joins ------------------------------------------------------

  val joinInner = sql("join_inner",
    """SELECT c_mktsegment, count(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""") { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(Dec)).cast("double").as("revenue"))
  }

  // Customers without orders — LEFT ANTI (the reference would need a
  // reduce-side tagged join; Spark plans broadcast-anti automatically).
  val joinAnti = sql("join_anti",
    """SELECT c_custkey FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""") { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
  }

  val joinSemi = sql("join_semi",
    """SELECT count(*) AS n FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders)""") { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n"))
  }

  // Small-dim broadcast join: part is tiny at every SF — explicitly
  // broadcast so the 100 TB plan has no shuffle on the fact side.
  val joinBroadcast = sql("join_broadcast",
    """SELECT p_brand,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       count(*) AS cnt
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand""") { (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)),
        col("l_partkey") === col("p_partkey"), "inner")
      .groupBy(col("p_brand"))
      .agg(sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"),
        count(lit(1)).as("cnt"))
  }

  // TPC-H Q3 shape: 3-way join + agg + deterministic top-k.
  val joinQ3 = sql("join_q3",
    """SELECT o_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS odate
       FROM customer JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-01-01'
         AND l_shipdate > TIMESTAMP '1998-01-01'
       GROUP BY o_orderkey, o_orderdate
       ORDER BY revenue DESC, o_orderkey LIMIT 10""") { (s, d) =>
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(col("l_extendedprice").cast(Dec) *
          (lit(1).cast(Dec) - col("l_discount").cast(Dec)))
        .cast("double").as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  // TPC-H Q5 shape: 6-table snowflake join (fact + 5 dims) with local
  // supplier constraint. At scale: supplier/nation/region broadcast
  // (explicit hints); customer⋈orders and the join to lineitem are
  // shuffle equi-joins on their keys — customer and orders grow with SF
  // and are not broadcastable, so those two exchanges are inherent.
  val joinQ5 = sql("join_q5",
    """SELECT n_name, count(*) AS cnt,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
       FROM customer, orders, lineitem, supplier, nation, region
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1999-01-01'
       GROUP BY n_name""") { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast(Dec) *
          (lit(1).cast(Dec) - col("l_discount").cast(Dec)))
          .cast("double").as("revenue"))
  }

  // LEFT OUTER with empty-side groups preserved.
  val joinOuter = sql("join_outer",
    """SELECT n_name, count(c_custkey) AS n_customers
       FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
       GROUP BY n_name""") { (s, d) =>
    Tables.nation(s, d)
      .join(Tables.customer(s, d),
        col("c_nationkey") === col("n_nationkey"), "left")
      .groupBy(col("n_name"))
      .agg(count(col("c_custkey")).as("n_customers"))
  }

  // Range join: equi key + band predicate (lineitems shipped within 90
  // days of their order). Spark keeps the equi part as the shuffle key
  // (sort-merge/shuffled-hash) and evaluates the band as a residual —
  // no cartesian blow-up, same plan shape at 100 TB.
  val joinRange = sql("join_range",
    """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         AND l_shipdate >= o_orderdate
         AND l_shipdate < o_orderdate + INTERVAL 90 DAY
       GROUP BY 1""") { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") >= col("o_orderdate")
          && col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
  }

  // ---- §2.6 windows ----------------------------------------------------

  val windowRowNumber = sql("window_rownum",
    """SELECT o_custkey, o_orderkey, rn FROM (
         SELECT o_custkey, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS rn
         FROM orders) t WHERE rn <= 3""") { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"))
  }

  val windowRunning = sql("window_running",
    """SELECT l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_orderkey
         ORDER BY l_linenumber, l_quantity
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty
       FROM lineitem""") { (s, d) =>
    // (l_orderkey, l_linenumber) is not unique in the testdata; ordering
    // additionally by l_quantity makes the running sums permutation-
    // invariant across tied rows (equal quantities commute).
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        sum(col("l_quantity").cast("long")).over(w).as("running_qty"))
  }

  val windowLag = sql("window_lag",
    """SELECT event_id,
       lag(CAST(round(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY event_id) AS prev_cents
       FROM events""") { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"),
        lag(round(col("value") * 100).cast("long"), 1).over(w).as("prev_cents"))
  }

  // rank/dense_rank: tie-sharing ranks are permutation-invariant, so the
  // output multiset is deterministic without a total-order tiebreak.
  val windowRank = sql("window_rank",
    """SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
       rank() OVER (PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS BIGINT)) AS rnk,
       dense_rank() OVER (PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS BIGINT)) AS drnk
       FROM lineitem""") { (s, d) =>
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity").cast("long"))
    Tables.lineitem(s, d).select(col("l_returnflag"),
      col("l_quantity").cast("long").as("qty"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"))
  }

  // ntile quartiles within each priority, summarized per bucket; the
  // window ORDER BY carries a unique tiebreak (o_orderkey) so bucket
  // membership — hence min/max boundaries — is deterministic.
  val windowNtile = sql("window_ntile",
    """SELECT o_orderpriority, q, count(*) AS cnt,
       CAST(CAST(min(o_totalprice) AS DECIMAL(12,2)) AS DOUBLE) AS lo,
       CAST(CAST(max(o_totalprice) AS DECIMAL(12,2)) AS DOUBLE) AS hi
       FROM (SELECT o_orderpriority, o_totalprice, ntile(4) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey) AS q
             FROM orders) t
       GROUP BY o_orderpriority, q""") { (s, d) =>
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_totalprice"),
        ntile(4).over(w).as("q"))
      .groupBy(col("o_orderpriority"), col("q"))
      .agg(count(lit(1)).as("cnt"),
        min(col("o_totalprice")).cast(Dec).cast("double").as("lo"),
        max(col("o_totalprice")).cast(Dec).cast("double").as("hi"))
  }

  // RANGE frame: the running sum includes ORDER BY peers, so tied order
  // dates aggregate together — deterministic without a unique tiebreak
  // (unlike ROWS frames), and exact through decimal.
  val windowRangeFrame = sql("window_range_frame",
    """SELECT o_custkey, CAST(epoch(o_orderdate) AS BIGINT) AS od,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
       FROM orders""") { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d).select(col("o_custkey"),
      unix_timestamp(col("o_orderdate")).as("od"),
      sum(col("o_totalprice").cast(Dec)).over(w).cast("double")
        .as("running_total"))
  }

  // first/last/nth over the full-partition frame: with a total-order
  // ORDER BY (unique o_orderkey tiebreak) every navigation value is
  // deterministic.
  val windowFirstLast = sql("window_first_last",
    """SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_ok,
       last_value(o_orderkey) OVER w AS last_ok,
       nth_value(o_orderkey, 2) OVER w AS second_ok
       FROM orders WINDOW w AS (PARTITION BY o_custkey
         ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""") { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
      first(col("o_orderkey")).over(w).as("first_ok"),
      last(col("o_orderkey")).over(w).as("last_ok"),
      nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
  }

  // percent_rank/cume_dist: tie-sharing relative ranks — a single double
  // division of identical integer operands in both engines (bit-equal
  // per the parity rules), permutation-invariant without a tiebreak.
  val windowPercent = sql("window_percent",
    """SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
       percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
       FROM lineitem WINDOW w AS (PARTITION BY l_returnflag
         ORDER BY CAST(l_quantity AS BIGINT))""") { (s, d) =>
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity").cast("long"))
    Tables.lineitem(s, d).select(col("l_returnflag"),
      col("l_quantity").cast("long").as("qty"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"))
  }

  // Percent-of-total: per-nation revenue share of its region via a window
  // SUM over the aggregated rows — one extra exchange over 25 rows, not a
  // self-join back onto the fact table. Shares as floored basis points of
  // exact integer cents (integer div is engine-portable; see QueryDef).
  val windowShare = sql("window_share",
    """WITH rev AS (
         SELECT r_name, n_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name)
       SELECT r_name, n_name,
         CAST(cents * 10000 // SUM(cents) OVER (PARTITION BY r_name) AS BIGINT)
           AS share_bps
       FROM rev""") { (s, d) =>
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg((sum(col("o_totalprice").cast(Dec)) * 100).cast("long").as("cents"))
    rev.select(col("r_name"), col("n_name"),
      expr("cents * 10000 div sum(cents) OVER (PARTITION BY r_name)").as("share_bps"))
  }

  // ---- §2.7 sort / top-k ----------------------------------------------

  // TakeOrderedAndProject: no global sort materialized, per-partition
  // top-k merged on the driver — the right plan at 100 TB.
  val topK = sql("topk",
    """SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price
       FROM lineitem
       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 15""") { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast(Dec).cast("double").as("price"))
      .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(15)
  }

  // Global total-order sort (range-partitioned in Spark).
  val globalSort = sql("global_sort",
    """SELECT n_name,
       row_number() OVER (ORDER BY n_name) AS pos
       FROM nation""") { (s, d) =>
    Tables.nation(s, d)
      .select(col("n_name"),
        row_number().over(Window.orderBy(col("n_name"))).as("pos"))
  }

  // ---- §2.8 set operations --------------------------------------------

  private def custkeysOfYear(s: SparkSession, d: String, y: Int): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp")
        && col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))

  val setIntersect = sql("set_intersect",
    """SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
       INTERSECT
       SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'""") {
    (s, d) => custkeysOfYear(s, d, 1996).intersect(custkeysOfYear(s, d, 1997))
  }

  val setExcept = sql("set_except",
    """SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
       EXCEPT
       SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'""") {
    (s, d) => custkeysOfYear(s, d, 1996).except(custkeysOfYear(s, d, 1997))
  }

  // Bag-semantics set ops: duplicates survive by multiplicity (the
  // multiset difference a reducer-based EXCEPT can't express without
  // counting). Spark plans these as aggregate-on-count + generate.
  val setIntersectAll = sql("set_intersect_all",
    """SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
       INTERSECT ALL
       SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'""") {
    (s, d) => custkeysOfYear(s, d, 1996).intersectAll(custkeysOfYear(s, d, 1997))
  }

  val setExceptAll = sql("set_except_all",
    """SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
       EXCEPT ALL
       SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'""") {
    (s, d) => custkeysOfYear(s, d, 1996).exceptAll(custkeysOfYear(s, d, 1997))
  }

  // Bitwise scalar surface (integer-exact in both engines).
  val scalarBitwise = sql("scalar_bitwise",
    """SELECT o_orderkey, o_orderkey & 255 AS band, o_orderkey | 1 AS orr,
       xor(o_orderkey, 255) AS xr, o_orderkey << 2 AS shl,
       o_orderkey >> 3 AS shr, bit_count(o_orderkey) AS bc
       FROM orders""") { (s, d) =>
    Tables.orders(s, d).select(col("o_orderkey"),
      col("o_orderkey").bitwiseAND(255).as("band"),
      col("o_orderkey").bitwiseOR(1).as("orr"),
      col("o_orderkey").bitwiseXOR(255).as("xr"),
      shiftleft(col("o_orderkey"), 2).as("shl"),
      shiftright(col("o_orderkey"), 3).as("shr"),
      bit_count(col("o_orderkey")).as("bc"))
  }

  // Row-generating scalar (UDTF shape, §2.12): explode/unnest token
  // lists relationally — rows multiply inside WholeStageCodegen.
  val scalarExplode = sql("scalar_explode",
    """SELECT tok, count(*) AS cnt FROM (
         SELECT unnest(list_filter(string_split(p_name, ' '), x -> x <> '')) AS tok
         FROM part) t GROUP BY tok""") { (s, d) =>
    Tables.part(s, d)
      .select(explode(expr("array_remove(split(p_name, ' '), '')")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
  }

  val unionDistinct = sql("union_distinct",
    """SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
       UNION
       SELECT o_custkey FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'""") {
    (s, d) =>
      custkeysOfYear(s, d, 1996).union(custkeysOfYear(s, d, 1997)).distinct()
  }

  // ---- §2.9 scalar functions ------------------------------------------

  val scalarString = sql("scalar_string",
    """SELECT p_partkey, lower(p_type) AS type_lo, length(p_name) AS name_len,
       substr(p_name, 1, 5) AS name5,
       replace(p_type, ' ', '_') AS type_us,
       concat_ws('|', p_brand, p_type) AS joined
       FROM part""") { (s, d) =>
    Tables.part(s, d).select(col("p_partkey"),
      lower(col("p_type")).as("type_lo"),
      length(col("p_name")).as("name_len"),
      substring(col("p_name"), 1, 5).as("name5"),
      regexp_replace(col("p_type"), " ", "_").as("type_us"),
      concat_ws("|", col("p_brand"), col("p_type")).as("joined"))
  }

  val scalarDate = sql("scalar_date",
    """SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(day(o_orderdate) AS INT) AS dd,
       strftime(o_orderdate, '%Y-%m-%d') AS ds,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
       FROM orders""") { (s, d) =>
    Tables.orders(s, d).select(col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dd"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"),
      unix_timestamp(col("o_orderdate")).as("epoch_s"))
  }

  val scalarMath = sql("scalar_math",
    """SELECT l_orderkey, l_linenumber,
       abs(l_quantity - 25) AS qd,
       CAST(ceil(l_quantity / 7) AS BIGINT) AS qc,
       CAST(floor(l_quantity / 7) AS BIGINT) AS qf,
       sqrt(l_quantity) AS qs,
       CAST(l_quantity AS BIGINT) % 5 AS qm
       FROM lineitem WHERE l_orderkey <= 100""") { (s, d) =>
    Tables.lineitem(s, d).filter(col("l_orderkey") <= 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("qd"),
        ceil(col("l_quantity") / 7).as("qc"),
        floor(col("l_quantity") / 7).as("qf"),
        sqrt(col("l_quantity")).as("qs"),
        (col("l_quantity").cast("long") % 5).as("qm"))
  }

  // JSON property extraction from events.props (the reference's Jackson
  // JSON marshaller surface, Marshallers.java:212-262).
  val scalarJson = sql("scalar_json",
    """SELECT k, count(*) AS cnt FROM (
         SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 10 AS k
         FROM events) t GROUP BY k""") { (s, d) =>
    Tables.events(s, d)
      .select((regexp_extract(col("props"), "\"k\": (\\d+)", 1)
        .cast("long") % 10).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
  }

  val scalarString2 = sql("scalar_string2",
    """SELECT p_partkey,
       trim(concat('  ', p_brand, '  ')) AS trimmed,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
       reverse(p_brand) AS rev,
       repeat(left(p_type, 2), 2) AS rep2,
       right(p_name, 3) AS tail3,
       CAST(strpos(p_type, 'E') AS INT) AS pos_e,
       translate(p_brand, 'AB', 'xy') AS tr,
       CASE WHEN regexp_matches(p_type, '^PROMO') THEN 1 ELSE 0 END AS is_promo
       FROM part""") { (s, d) =>
    Tables.part(s, d).select(col("p_partkey"),
      trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"),
      lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
      reverse(col("p_brand")).as("rev"),
      repeat(substring(col("p_type"), 1, 2), 2).as("rep2"),
      substring(col("p_name"), -3, 3).as("tail3"),
      instr(col("p_type"), "E").cast("int").as("pos_e"),
      translate(col("p_brand"), "AB", "xy").as("tr"),
      when(col("p_type").rlike("^PROMO"), 1).otherwise(0).as("is_promo"))
  }

  val scalarDate2 = sql("scalar_date2",
    """SELECT o_orderkey,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
       CAST(date_diff('day', TIMESTAMP '1996-01-01', o_orderdate) AS INT) AS days_since,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       CAST(dayofweek(o_orderdate) AS INT) AS dow,
       CAST(quarter(o_orderdate) AS INT) AS q
       FROM orders""") { (s, d) =>
    Tables.orders(s, d).select(col("o_orderkey"),
      date_format(col("o_orderdate") + expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").as("plus30"),
      datediff(col("o_orderdate"), lit("1996-01-01").cast("date")).as("days_since"),
      date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
      date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
      // DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1
      (dayofweek(col("o_orderdate")) - 1).as("dow"),
      quarter(col("o_orderdate")).as("q"))
  }

  // NULL-handling semantics over outer-join nulls.
  val nullHandling = sql("null_handling",
    """SELECT c_custkey,
       coalesce(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 0.0) AS total,
       count(o_orderkey) AS n_orders,
       CASE WHEN count(o_orderkey) = 0 THEN 'none'
            WHEN count(o_orderkey) < 12 THEN 'few' ELSE 'many' END AS bucket,
       nullif(count(o_orderkey), 0) AS n_or_null
       FROM customer LEFT JOIN orders ON o_custkey = c_custkey
       GROUP BY c_custkey""") { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        coalesce(sum(col("o_totalprice").cast(Dec)).cast("double"), lit(0.0)).as("total"),
        count(col("o_orderkey")).as("n_orders"))
      .select(col("c_custkey"), col("total"), col("n_orders"),
        when(col("n_orders") === 0, "none")
          .when(col("n_orders") < 12, "few").otherwise("many").as("bucket"),
        nullif(col("n_orders"), lit(0)).as("n_or_null"))
  }

  // Typed JSON parsing (from_json — the Jackson marshaller surface,
  // Marshallers.java:212-262) checked against DuckDB's JSON extension.
  val scalarJsonTyped = sql("scalar_json_typed",
    """SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
       FROM events""") { (s, d) =>
    Tables.events(s, d).select(col("event_id"),
      expr("from_json(props, 'k BIGINT').k").as("k"))
  }

  // Array column access (no arithmetic — raw floats pass through both
  // engines bit-identically).
  val scalarArray = sql("scalar_array",
    """SELECT vec_id, len(embedding) AS dim,
       embedding[1] AS first_d, embedding[len(embedding)] AS last_d
       FROM embeddings""") { (s, d) =>
    Tables.embeddings(s, d).select(col("vec_id"),
      size(col("embedding")).as("dim"),
      element_at(col("embedding"), 1).as("first_d"),
      element_at(col("embedding"), size(col("embedding"))).as("last_d"))
  }

  // Hash functions (reference murmur3/crc32, §2.9): md5/sha2 are the
  // portable pair both engines implement identically.
  val scalarHash = sql("scalar_hash",
    """SELECT p_partkey, md5(p_name) AS h_md5, sha256(p_name) AS h_sha
       FROM part""") { (s, d) =>
    Tables.part(s, d).select(col("p_partkey"),
      md5(col("p_name")).as("h_md5"),
      sha2(col("p_name"), 256).as("h_sha"))
  }

  // Wide-to-long unpivot (the inverse of agg_pivot): Dataset.unpivot
  // plans a Generate (codegen'd row expansion), not a 3-way self-union.
  val unpivotMelt = sql("unpivot_melt",
    """WITH wide AS (
         SELECT o_orderpriority,
           count(*) FILTER (o_orderstatus = 'F') AS n_f,
           count(*) FILTER (o_orderstatus = 'O') AS n_o,
           count(*) FILTER (o_orderstatus = 'P') AS n_p
         FROM orders GROUP BY o_orderpriority)
       SELECT o_orderpriority, 'n_f' AS status, n_f AS cnt FROM wide
       UNION ALL
       SELECT o_orderpriority, 'n_o' AS status, n_o AS cnt FROM wide
       UNION ALL
       SELECT o_orderpriority, 'n_p' AS status, n_p AS cnt FROM wide""") { (s, d) =>
    Tables.orders(s, d).groupBy(col("o_orderpriority"))
      .agg(count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_p"))
      .unpivot(Array(col("o_orderpriority")),
        Array(col("n_f"), col("n_o"), col("n_p")), "status", "cnt")
  }

  // regexp_extract_all (all matches, not just the first) — joined to a
  // string because list-column renderings differ between engines.
  val scalarRegexAll = sql("scalar_regex_all",
    """SELECT p_partkey,
       array_to_string(regexp_extract_all(p_name, '[aeiou]+'), ',') AS vowel_runs,
       len(regexp_extract_all(p_name, '[a-z]+')) AS n_words
       FROM part""") { (s, d) =>
    Tables.part(s, d).select(col("p_partkey"),
      array_join(expr("regexp_extract_all(p_name, '[aeiou]+', 0)"), ",")
        .as("vowel_runs"),
      size(expr("regexp_extract_all(p_name, '[a-z]+', 0)")).as("n_words"))
  }

  // FULL OUTER join with key coalescing: year-over-year revenue per
  // customer where either side may be absent.
  val joinFullCoalesce = sql("join_full_coalesce",
    """WITH a AS (
         SELECT o_custkey AS k,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev96
         FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY o_custkey),
       b AS (
         SELECT o_custkey AS k,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev97
         FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY o_custkey)
       SELECT coalesce(a.k, b.k) AS custkey,
         coalesce(rev96, 0.0) AS rev96, coalesce(rev97, 0.0) AS rev97
       FROM a FULL OUTER JOIN b ON a.k = b.k""") { (s, d) =>
    def revOfYear(y: Int, as: String): DataFrame =
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp")
          && col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
        .groupBy(col("o_custkey").as(s"k_$y"))
        .agg(sum(col("o_totalprice").cast(Dec)).cast("double").as(as))
    revOfYear(1996, "rev96")
      .join(revOfYear(1997, "rev97"), col("k_1996") === col("k_1997"), "full_outer")
      .select(coalesce(col("k_1996"), col("k_1997")).as("custkey"),
        coalesce(col("rev96"), lit(0.0)).as("rev96"),
        coalesce(col("rev97"), lit(0.0)).as("rev97"))
  }

  // CROSS JOIN (cartesian of two small dims — 25 × 5 rows).
  val joinCross = sql("join_cross",
    "SELECT n_name, r_name FROM nation CROSS JOIN region") { (s, d) =>
    Tables.nation(s, d).select(col("n_name"))
      .crossJoin(Tables.region(s, d).select(col("r_name")))
  }

  // Approximate quantiles (Spark t-digest-style percentile_approx vs
  // DuckDB t-digest approx_quantile): like agg_approx_distinct, the
  // sketches differ, so each engine asserts its own estimate lands
  // within 2% of its own exact continuous quantile over integer cents.
  val aggApproxQuantile = sql("agg_approx_quantile",
    """WITH t AS (
         SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           AS cents FROM lineitem)
       SELECT count(*) AS n,
         abs(approx_quantile(cents, 0.5) - quantile_cont(cents, 0.5)) * 50
           <= quantile_cont(cents, 0.5) AS p50_within_2pct,
         abs(approx_quantile(cents, 0.95) - quantile_cont(cents, 0.95)) * 50
           <= quantile_cont(cents, 0.95) AS p95_within_2pct
       FROM t""") { (s, d) =>
    Tables.lineitem(s, d)
      .select((col("l_extendedprice").cast(Dec) * 100).cast("long").as("cents"))
      .agg(count(lit(1)).as("n"),
        (abs(expr("approx_percentile(cents, 0.5, 10000)") - expr("percentile(cents, 0.5)")) * 50
          <= expr("percentile(cents, 0.5)")).as("p50_within_2pct"),
        (abs(expr("approx_percentile(cents, 0.95, 10000)") - expr("percentile(cents, 0.95)")) * 50
          <= expr("percentile(cents, 0.95)")).as("p95_within_2pct"))
  }

  /** The pure-SQL interface: registered views + spark.sql — the same
    * engine surface a SQL-only user gets (TPC-H Q6 shape). */
  val sqlInterfaceQ6 = sql("sql_interface_q6",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       count(*) AS cnt
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""") { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                     CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
         count(*) AS cnt
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""")
  }

  val all: Seq[QueryDef] = Seq(
    sqlInterfaceQ6,
    scanFullCount, scanFilterRange, scanKeysOnly, scanLogWindow,
    scanNamespaces, rangeInputSum, unionConcat,
    filterConj, projectScalar, having,
    aggQ1, aggRollup, aggCube, aggGroupingSets, aggMedian, aggPivot,
    aggStats, aggStringAgg, aggApproxDistinct, distinctKeys, distinctCount,
    joinInner, joinAnti, joinSemi, joinBroadcast, joinQ3, joinQ5, joinOuter,
    joinRange, joinFullCoalesce, joinCross,
    windowRowNumber, windowRunning, windowLag, windowRank, windowNtile,
    windowRangeFrame, windowFirstLast, windowPercent, windowShare,
    topK, globalSort,
    setIntersect, setExcept, setIntersectAll, setExceptAll, unionDistinct,
    scalarString, scalarString2, scalarDate, scalarDate2, scalarMath,
    scalarJson, scalarJsonTyped, scalarHash, scalarArray, scalarBitwise,
    scalarExplode, scalarRegexAll, nullHandling, unpivotMelt,
    aggApproxQuantile)
}
