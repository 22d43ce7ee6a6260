package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** The remaining TPC-H query shapes, adapted to the driver testdata
  * schema (no partsupp table — lineitem (partkey, suppkey) pairs stand
  * in; no commit/receipt dates — lateness is l_shipdate vs o_orderdate;
  * no phone — country codes come from the c_name digit suffix).
  *
  * Together with agg_q1 (Q1), join_q3 (Q3), join_q5 (Q5),
  * sql_interface_q6 (Q6), join_q10 (Q10), subquery_correlated (Q17) and
  * join_q18 (Q18) this completes the 22-query suite — the "every query
  * a user runs today" bar for a relational engine, each shape an
  * oracle-checked capability: correlated minima, EXISTS/NOT-EXISTS,
  * disjunctive pushdown, conditional aggregation, ratio-of-sums.
  *
  * Standing oracle-parity rules (QueryDef scaladoc): money stays in
  * DECIMAL(12,2) until a final DOUBLE cast; averages are cross-
  * multiplied into exact decimal comparisons; every ORDER BY carries a
  * unique tiebreak; ratios are one double division of identical decimal
  * sums, rounded identically on both sides.
  */
object TpchQueries {
  import QueryDef._

  private val Dec = "decimal(12,2)"
  private def rev = col("l_extendedprice").cast(Dec) *
    (lit(1).cast(Dec) - col("l_discount").cast(Dec))
  private val revSql =
    """CAST(l_extendedprice AS DECIMAL(12,2)) *
       (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"""

  /** Q2 — min-cost supplier per part. The partsupp surrogate is the
    * min decimal line price per (part, supplier); the correlated MIN
    * subquery becomes a per-part window rank over the joined relation
    * (one shuffle on partkey; region/nation/supplier dims broadcast).
    * At 100 TB the cost relation is a reusable grouped aggregate of the
    * fact table, not a second scan per probe. */
  val tpchQ2 = sql("tpch_q2",
    """WITH cost AS (
         SELECT l_partkey, l_suppkey,
           MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS supply_cost
         FROM lineitem GROUP BY 1, 2),
       eu AS (
         SELECT s_suppkey, s_name FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE')
       SELECT p_partkey, s_name, CAST(supply_cost AS DOUBLE) AS cost
       FROM (
         SELECT p.p_partkey, eu.s_name, c.supply_cost,
           row_number() OVER (PARTITION BY p.p_partkey
             ORDER BY c.supply_cost, c.l_suppkey) AS rn
         FROM part p
         JOIN cost c ON c.l_partkey = p.p_partkey
         JOIN eu ON eu.s_suppkey = c.l_suppkey
         WHERE p.p_size = 15 AND p.p_type = 'LARGE') t
       WHERE rn = 1""") { (s, d) =>
    val cost = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice").cast(Dec)).as("supply_cost"))
    val eu = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"))
    val p = Tables.part(s, d)
      .filter(col("p_size") === 15 && col("p_type") === "LARGE")
    val w = Window.partitionBy(col("p_partkey"))
      .orderBy(col("supply_cost"), col("l_suppkey"))
    cost
      .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("p_partkey"), col("s_name"),
        col("supply_cost").cast("double").as("cost"))
  }

  /** Q4 — order-priority checking: EXISTS becomes a left-semi join with
    * an equi key plus a non-equi residual (the lateness predicate rides
    * the orderkey shuffle — no cartesian, no second aggregate). */
  val tpchQ4 = sql("tpch_q4",
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate < TIMESTAMP '1997-10-01'
         AND EXISTS (
           SELECT 1 FROM lineitem
           WHERE l_orderkey = o_orderkey
             AND l_shipdate >= o_orderdate + INTERVAL 60 DAY)
       GROUP BY o_orderpriority""") { (s, d) =>
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
    val li = Tables.lineitem(s, d)
    o.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "leftsemi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** Q7 — volume shipping between two nations (both directions). The
    * disjunctive nation-pair filter lands after two broadcast nation
    * joins; the fact-side work is one orders⋈lineitem⋈customer/supplier
    * chain with the date filter pushed to the lineitem scan. */
  val tpchQ7 = sql("tpch_q7",
    s"""SELECT supp_nation, cust_nation, l_year,
         CAST(SUM(vol) AS DOUBLE) AS revenue
       FROM (
         SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           $revSql AS vol
         FROM supplier
         JOIN lineitem ON s_suppkey = l_suppkey
         JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01') shipping
       GROUP BY supp_nation, cust_nation, l_year""") { (s, d) =>
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === "NATION_1" &&
          col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" &&
          col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(rev).cast("double").as("revenue"))
  }

  /** Q8 — national market share within a region, per year: a ratio of
    * two decimal sums over the same rows (conditional numerator),
    * evaluated as ONE double division at the end. */
  val tpchQ8 = sql("tpch_q8",
    s"""SELECT o_year, round(CAST(nat AS DOUBLE) / CAST(tot AS DOUBLE), 6)
           AS mkt_share
       FROM (
         SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           SUM(CASE WHEN n1.n_name = 'NATION_3' THEN $revSql
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS nat,
           SUM($revSql) AS tot
         FROM lineitem
         JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN part ON p_partkey = l_partkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         JOIN region ON n2.n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
         GROUP BY 1) t""") { (s, d) =>
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("n2_key"),
        col("n_regionkey").as("n2_region"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "STANDARD")),
        col("p_partkey") === col("l_partkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n2_region") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", rev)
          .otherwise(lit(0).cast(Dec))).as("nat"),
        sum(rev).as("tot"))
      .select(col("o_year"),
        round(col("nat").cast("double") / col("tot").cast("double"), 6)
          .as("mkt_share"))
  }

  /** Q9 — product-type profit by supplier nation and year. The
    * partsupp supplycost surrogate is half the part's retail price;
    * profit stays in exact decimal until the final cast. */
  val tpchQ9 = sql("tpch_q9",
    s"""SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
       FROM (
         SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           $revSql - CAST(p_retailprice AS DECIMAL(12,2)) *
             CAST(0.5 AS DECIMAL(12,2)) *
             CAST(l_quantity AS DECIMAL(12,2)) AS amount
         FROM lineitem
         JOIN orders ON o_orderkey = l_orderkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN part ON p_partkey = l_partkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE p_name LIKE '%widget%') profit
       GROUP BY nation, o_year""") { (s, d) =>
    val amount = rev - col("p_retailprice").cast(Dec) *
      lit(0.5).cast(Dec) * col("l_quantity").cast(Dec)
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like("%widget%"))),
        col("p_partkey") === col("l_partkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
  }

  /** Q11 — important stock: per-part value above a fraction of the
    * global total. ONE lineitem pass: `rollup(l_partkey)` computes
    * every per-part sum AND the grand total (grouping_id = 1) in a
    * single scan+aggregate — at 100 TB the naive two-aggregate form
    * doubles fact-table IO for a 1-row total. The rolled relation
    * (#parts + 1 rows, the size any engine's aggregate output already
    * is) is materialized eagerly so the total row and the per-part
    * side both read it, not the fact table; the 1-row total then
    * broadcasts. `val > 0.001 * total` cross-multiplies to exact
    * decimals (val * 1000 > total). */
  val tpchQ11 = sql("tpch_q11",
    """WITH v AS (
         SELECT l_partkey,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS pval
         FROM lineitem GROUP BY 1)
       SELECT l_partkey, CAST(pval AS DOUBLE) AS value
       FROM v
       WHERE pval * 1000 > (
         SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2))) FROM lineitem)""") { (s, d) =>
    val rolled = Tables.lineitem(s, d)
      .rollup(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast(Dec)).as("pval"),
        grouping_id().as("gid"))
      .localCheckpoint(true)
    val total = rolled.filter(col("gid") === 1)
      .select(col("pval").as("total"))
    rolled.filter(col("gid") === 0)
      .crossJoin(broadcast(total))
      .where(col("pval") * 1000 > col("total"))
      .select(col("l_partkey"), col("pval").cast("double").as("value"))
  }

  /** Q12 — shipping-priority classes: one pass of conditional counts
    * (the CASE sums fold into a single partial-aggregatable scan of the
    * joined relation; lateness is the residual on the orderkey join). */
  val tpchQ12 = sql("tpch_q12",
    """SELECT l_returnflag,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
         AND l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
       GROUP BY l_returnflag""") { (s, d) =>
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(isHigh, 1).otherwise(0)).as("high_line_count"),
        sum(when(!isHigh, 1).otherwise(0)).as("low_line_count"))
  }

  /** Q13 — customer order-count distribution: a LEFT OUTER join whose
    * predicate lives in the join condition (not a post-filter — that
    * would drop the zero-order customers the query exists to count). */
  val tpchQ13 = sql("tpch_q13",
    """SELECT c_count, count(*) AS custdist
       FROM (
         SELECT c_custkey, count(o_orderkey) AS c_count
         FROM customer LEFT OUTER JOIN orders
           ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
         GROUP BY c_custkey) c_orders
       GROUP BY c_count""") { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT",
        "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** Q14 — promo revenue share: two decimal sums over one scan, one
    * double multiply + divide at the end, rounded identically. */
  val tpchQ14 = sql("tpch_q14",
    s"""SELECT round(CAST(promo AS DOUBLE) * 100 / CAST(tot AS DOUBLE), 4)
           AS promo_revenue
       FROM (
         SELECT SUM(CASE WHEN p_type = 'PROMO' THEN $revSql
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS promo,
           SUM($revSql) AS tot
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-03-01'
           AND l_shipdate < TIMESTAMP '1997-04-01') t""") { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d)),
        col("p_partkey") === col("l_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev)
          .otherwise(lit(0).cast(Dec))).as("promo"),
        sum(rev).as("tot"))
      .select(
        round(col("promo").cast("double") * 100 / col("tot").cast("double"), 4)
          .as("promo_revenue"))
  }

  /** Q15 — top supplier: the revenue view is computed once; the scalar
    * MAX re-aggregates the same relation and broadcasts one row back.
    * Decimal equality (not double) selects the winner exactly. */
  val tpchQ15 = sql("tpch_q15",
    s"""WITH revenue AS (
         SELECT l_suppkey AS supplier_no, SUM($revSql) AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1997-04-01'
         GROUP BY 1)
       SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
       FROM supplier JOIN revenue ON s_suppkey = supplier_no
       WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""") { (s, d) =>
    val revenue = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(rev).as("total_revenue"))
    val mx = revenue.agg(max(col("total_revenue")).as("mx"))
    revenue.crossJoin(broadcast(mx))
      .where(col("total_revenue") === col("mx"))
      .join(broadcast(Tables.supplier(s, d)),
        col("s_suppkey") === col("supplier_no"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_revenue").cast("double").as("total_revenue"))
  }

  /** Q16 — parts/supplier relationship count: distinct (part, supplier)
    * pairs from the fact table, bad suppliers removed by ANTI join
    * before the distinct count (the complaint-supplier exclusion). */
  val tpchQ16 = sql("tpch_q16",
    """SELECT p_brand, p_type, p_size,
         count(DISTINCT l_suppkey) AS supplier_cnt
       FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
       JOIN part ON p_partkey = l_partkey
       WHERE p_brand <> 'Brand#1'
         AND p_size IN (1, 5, 10, 15, 20, 25)
         AND l_suppkey NOT IN (
           SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       GROUP BY p_brand, p_type, p_size""") { (s, d) =>
    val bad = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val p = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25))
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "leftanti")
      .join(broadcast(p), col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Q19 — disjunctive predicate revenue: an OR of three
    * brand/size/quantity conjunctions. The part-key equi join carries
    * the disjunction as a residual; each conjunct's range predicates
    * remain eligible for scan-level pruning on their own columns. */
  val tpchQ19 = sql("tpch_q19",
    s"""SELECT CAST(SUM($revSql) AS DOUBLE) AS revenue
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
              AND p_size BETWEEN 1 AND 5)
          OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
              AND p_size BETWEEN 1 AND 10)
          OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30
              AND p_size BETWEEN 1 AND 15)""") { (s, d) =>
    val c1 = col("p_brand") === "Brand#12" &&
      col("l_quantity").between(1, 11) && col("p_size").between(1, 5)
    val c2 = col("p_brand") === "Brand#23" &&
      col("l_quantity").between(10, 20) && col("p_size").between(1, 10)
    val c3 = col("p_brand") === "Brand#3" &&
      col("l_quantity").between(20, 30) && col("p_size").between(1, 15)
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)),
        col("p_partkey") === col("l_partkey"))
      .where(c1 || c2 || c3)
      .agg(sum(rev).cast("double").as("revenue"))
  }

  /** Q20 — suppliers with excess stock of a part family: two nested
    * semi-joins (qualifying (supplier, part) sales → suppliers), both
    * riding equi shuffles; the nation gate broadcasts. */
  val tpchQ20 = sql("tpch_q20",
    """WITH sold AS (
         SELECT l_suppkey, l_partkey,
           SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY 1, 2)
       SELECT s_suppkey, s_name
       FROM supplier
       WHERE s_suppkey IN (
           SELECT l_suppkey FROM sold
           JOIN part ON p_partkey = l_partkey
           WHERE p_name LIKE 'blue%' AND qty > CAST(40 AS DECIMAL(12,2)))
         AND s_nationkey IN (
           SELECT n_nationkey FROM nation WHERE n_regionkey = 3)""") { (s, d) =>
    val sold = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast(Dec)).as("qty"))
    val qualifying = sold
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like("blue%"))),
        col("p_partkey") === col("l_partkey"))
      .where(col("qty") > lit(40).cast(Dec))
      .select(col("l_suppkey"))
    val euNations = Tables.nation(s, d)
      .filter(col("n_regionkey") === 3).select(col("n_nationkey"))
    Tables.supplier(s, d)
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "leftsemi")
      .join(broadcast(euNations),
        col("s_nationkey") === col("n_nationkey"), "leftsemi")
      .select(col("s_suppkey"), col("s_name"))
  }

  /** Q21 — suppliers who kept waiting: the EXISTS/NOT-EXISTS pair over
    * sibling lineitems decorrelates into per-(order, supplier) lateness
    * flags plus per-order aggregates (≥2 suppliers, exactly one late) —
    * two grouped passes over the same shuffle key instead of two
    * correlated probes per row. */
  val tpchQ21 = sql("tpch_q21",
    """WITH lo AS (
         SELECT l_orderkey, l_suppkey,
           max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END) AS late
         FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         WHERE o_orderstatus = 'F'
         GROUP BY 1, 2),
       og AS (
         SELECT l_orderkey, count(*) AS nsupp, SUM(late) AS nlate
         FROM lo GROUP BY 1)
       SELECT s_name, count(*) AS numwait
       FROM lo
       JOIN og ON og.l_orderkey = lo.l_orderkey
       JOIN supplier ON s_suppkey = l_suppkey
       WHERE lo.late = 1 AND og.nsupp >= 2 AND og.nlate = 1
       GROUP BY s_name
       ORDER BY numwait DESC, s_name LIMIT 10""") { (s, d) =>
    val lo = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        1).otherwise(0)).as("late"))
    val og = lo.groupBy(col("l_orderkey").as("og_key"))
      .agg(count(lit(1)).as("nsupp"), sum(col("late")).as("nlate"))
    lo.join(og, col("og_key") === col("l_orderkey"))
      .where(col("late") === 1 && col("nsupp") >= 2 && col("nlate") === 1)
      .join(broadcast(Tables.supplier(s, d)),
        col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** Q22 — global sales opportunity: country code from the c_name digit
    * suffix; "above average positive balance" cross-multiplies into an
    * exact decimal comparison; customers with no orders via ANTI join. */
  val tpchQ22 = sql("tpch_q22",
    """WITH pos AS (
         SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS s, count(*) AS n
         FROM customer WHERE c_acctbal > 0.0)
       SELECT code, count(*) AS numcust,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
       FROM (
         SELECT substr(c_name, 17, 2) AS code, c_acctbal, c_custkey
         FROM customer, pos
         WHERE c_acctbal > 0.0
           AND CAST(c_acctbal AS DECIMAL(12,2)) * pos.n > pos.s
           AND NOT EXISTS (
             SELECT 1 FROM orders WHERE o_custkey = c_custkey)) t
       GROUP BY code""") { (s, d) =>
    val c = Tables.customer(s, d)
    val pos = c.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("c_acctbal").cast(Dec)).as("s"), count(lit(1)).as("n"))
    c.filter(col("c_acctbal") > 0.0)
      .crossJoin(broadcast(pos))
      .where(col("c_acctbal").cast(Dec) * col("n") > col("s"))
      .join(Tables.orders(s, d),
        col("o_custkey") === col("c_custkey"), "leftanti")
      .groupBy(substring(col("c_name"), 17, 2).as("code"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast(Dec)).cast("double").as("totacctbal"))
  }

  val all: Seq[QueryDef] = Seq(
    tpchQ2, tpchQ4, tpchQ7, tpchQ8, tpchQ9, tpchQ11, tpchQ12, tpchQ13,
    tpchQ14, tpchQ15, tpchQ16, tpchQ19, tpchQ20, tpchQ21, tpchQ22)
}
