package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Fourth relational batch: boolean/bitwise aggregates, exact-moment
  * linear regression and higher-moment shape statistics, and the
  * correlated LATERAL join through the SQL interface.
  *
  * Moment-based statistics follow the agg_stats precedent: accumulate
  * raw moments exactly (integer/decimal sums are associative and
  * order-independent where float accumulation is not), then evaluate
  * the closed-form formula as a fixed sequence of double operations —
  * identical inputs + identical operation order = bit-identical output
  * on both engines.
  */
object RelationalQueries4 {
  import QueryDef._

  private val Dec = "decimal(12,2)"

  /** Boolean aggregates: ALL/ANY per group plus a filtered count — the
    * predicate-summary surface (bool_and / bool_or / count_if). */
  val aggBool = sql("agg_bool",
    """SELECT o_orderpriority,
         bool_and(o_totalprice > 1000.0) AS all_over_1k,
         bool_or(o_orderstatus = 'F') AS any_finished,
         CAST(count_if(o_totalprice > 50000.0) AS BIGINT) AS n_big
       FROM orders GROUP BY o_orderpriority""") { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
        bool_or(col("o_orderstatus") === "F").as("any_finished"),
        count_if(col("o_totalprice") > 50000.0).as("n_big"))
  }

  /** Bitwise aggregates over integer keys: AND/OR/XOR fold per group.
    * XOR is the useful one at scale — an order-independent checksum of
    * a key set (the reference's counters are the same idea for counts). */
  val aggBitagg = sql("agg_bitagg",
    """SELECT l_returnflag,
         bit_and(l_orderkey) AS key_and,
         bit_or(l_orderkey) AS key_or,
         bit_xor(l_orderkey) AS key_xor
       FROM lineitem GROUP BY l_returnflag""") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        bit_and(col("l_orderkey")).as("key_and"),
        bit_or(col("l_orderkey")).as("key_or"),
        bit_xor(col("l_orderkey")).as("key_xor"))
  }

  /** Least-squares regression of price on quantity per return flag,
    * from exact decimal raw moments (n, Σx, Σy, Σxy, Σx²):
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), then intercept from the
    * slope — built-in regr_slope accumulates floats in partition order
    * and is NOT reproducible across engines; the moment form is. */
  val aggRegr = sql("agg_regr",
    """SELECT l_returnflag,
         round(CAST(n * sxy - sx * sy AS DOUBLE) /
               CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
         round((CAST(sy AS DOUBLE) -
                CAST(n * sxy - sx * sy AS DOUBLE) /
                CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) / n,
               6) AS intercept
       FROM (
         SELECT l_returnflag, count(*) AS n,
           SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
           SUM(CAST(l_quantity AS DECIMAL(12,2)) *
               CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy,
           SUM(CAST(l_quantity AS DECIMAL(12,2)) *
               CAST(l_quantity AS DECIMAL(12,2))) AS sxx
         FROM lineitem GROUP BY l_returnflag) m""") { (s, d) =>
    val x = col("l_quantity").cast(Dec)
    val y = col("l_extendedprice").cast(Dec)
    val m = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    m.select(col("l_returnflag"),
      round(slope, 6).as("slope"),
      round((col("sy").cast("double") - slope * col("sx").cast("double")) /
        col("n"), 6).as("intercept"))
  }

  /** Skewness and excess kurtosis of quantity per return flag from
    * exact INTEGER raw moments (quantity is integer-valued 1..50, so
    * Σx..Σx⁴ are exact bigints at any accumulation order); the
    * standardized central-moment formulas then run in doubles. */
  val aggSkew = sql("agg_skew",
    """SELECT l_returnflag,
         round((CAST(s3 AS DOUBLE) / n
                - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                + 2.0 * pow(CAST(s1 AS DOUBLE) / n, 3))
               / pow(CAST(s2 AS DOUBLE) / n
                     - pow(CAST(s1 AS DOUBLE) / n, 2), 1.5), 6) AS skew,
         round((CAST(s4 AS DOUBLE) / n
                - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
                + 6.0 * pow(CAST(s1 AS DOUBLE) / n, 2) * (CAST(s2 AS DOUBLE) / n)
                - 3.0 * pow(CAST(s1 AS DOUBLE) / n, 4))
               / pow(CAST(s2 AS DOUBLE) / n
                     - pow(CAST(s1 AS DOUBLE) / n, 2), 2) - 3.0, 6) AS kurt
       FROM (
         SELECT l_returnflag, count(*) AS n,
           SUM(CAST(l_quantity AS BIGINT)) AS s1,
           SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s2,
           SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
               * CAST(l_quantity AS BIGINT)) AS s3,
           SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
               * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s4
         FROM lineitem GROUP BY l_returnflag) m""") { (s, d) =>
    val q = col("l_quantity").cast("bigint")
    val m = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(q).as("s1"), sum(q * q).as("s2"),
        sum(q * q * q).as("s3"), sum(q * q * q * q).as("s4"))
    val m1 = col("s1").cast("double") / col("n")
    val m2 = col("s2").cast("double") / col("n")
    val m3 = col("s3").cast("double") / col("n")
    val m4 = col("s4").cast("double") / col("n")
    val variance = m2 - pow(m1, 2)
    m.select(col("l_returnflag"),
      round((m3 - lit(3.0) * m1 * m2 + lit(2.0) * pow(m1, 3)) /
        pow(variance, 1.5), 6).as("skew"),
      round((m4 - lit(4.0) * m1 * m3 + lit(6.0) * pow(m1, 2) * m2 -
        lit(3.0) * pow(m1, 4)) / pow(variance, 2) - lit(3.0), 6).as("kurt"))
  }

  /** Correlated LATERAL join through the SQL interface: for each
    * region, the top-2 nations by customer count. Catalyst decorrelates
    * the lateral subquery into a grouped aggregate + window rank —
    * same plan the DataFrame topk_per_group builds by hand. */
  val sqlLateralTopn = sql("sql_lateral_topn",
    """SELECT r_name, n_name, n_cust
       FROM region, LATERAL (
         SELECT n_name, count(*) AS n_cust
         FROM nation JOIN customer ON c_nationkey = n_nationkey
         WHERE n_regionkey = r_regionkey
         GROUP BY n_name
         ORDER BY n_cust DESC, n_name LIMIT 2) t""") { (s, d) =>
    Tables.region(s, d).createOrReplaceTempView("region")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql(
      """SELECT r_name, n_name, n_cust
         FROM region, LATERAL (
           SELECT n_name, count(*) AS n_cust
           FROM nation JOIN customer ON c_nationkey = n_nationkey
           WHERE n_regionkey = r_regionkey
           GROUP BY n_name
           ORDER BY n_cust DESC, n_name LIMIT 2) t""")
  }

  /** Time-bounded moving window: 7-day trailing spend per customer via
    * a RANGE frame over epoch days (integer bounds — Spark's
    * rangeBetween is numeric, so event time becomes an exact epoch-day
    * long on both engines; no interval-frame semantics to reconcile). */
  val windowTimeRange = sql("window_time_range",
    """SELECT o_custkey, o_orderkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
           PARTITION BY o_custkey ORDER BY epoch_day
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_7d
       FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
           epoch_us(o_orderdate) // 86400000000 AS epoch_day
         FROM orders) t""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("epoch_day"))
      .rangeBetween(-6, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("epoch_day",
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(Dec)).over(w).cast("double")
          .as("spend_7d"))
  }

  /** Exact interpolated percentiles per group (Spark `percentile` =
    * DuckDB `quantile_cont`: both sort the group and lerp between the
    * two neighbors of rank (n-1)·p — quantity is integer-valued, so the
    * lerp runs on exactly-representable doubles). */
  val aggPercentile = sql("agg_percentile",
    """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.25), 6) AS p25,
         round(quantile_cont(l_quantity, 0.50), 6) AS p50,
         round(quantile_cont(l_quantity, 0.75), 6) AS p75
       FROM lineitem GROUP BY l_returnflag""") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
        round(expr("percentile(l_quantity, 0.50)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"))
  }

  /** The native codegen'd expression surface through SQL: cosine_sim
    * (functions.CosineSimilarity, also injectable cluster-wide via
    * GraftExtensions) ranking pairs of the first 20 vectors — proves
    * the registered function produces the same doubles as the oracle's
    * ascending-index multiply-add formulation. */
  val sqlExtensionCosine = sql("sql_extension_cosine",
    """WITH e AS (
         SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
         FROM embeddings WHERE vec_id < 20)
       SELECT a.vec_id AS v1, b.vec_id AS v2,
         round(list_sum(list_transform(range(1, len(a.embedding) + 1),
             i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE)
                * CAST(b.embedding[CAST(i AS INT)] AS DOUBLE)))
           / (a.nrm * b.nrm), 3) AS sim
       FROM e a JOIN e b ON a.vec_id < b.vec_id
       ORDER BY sim DESC, v1, v2 LIMIT 5""") { (s, d) =>
    graft.functions.VectorExpressions.register(s)
    Tables.embeddings(s, d).filter(col("vec_id") < 20)
      .createOrReplaceTempView("emb_small")
    s.sql(
      """SELECT a.vec_id AS v1, b.vec_id AS v2,
           round(cosine_sim(a.embedding, b.embedding), 3) AS sim
         FROM emb_small a JOIN emb_small b ON a.vec_id < b.vec_id
         ORDER BY sim DESC, v1, v2 LIMIT 5""")
  }

  /** The DataSource V2 range source (sources.v2.RangeSource) under the
    * oracle: a pushed range predicate prunes shards at split-planning
    * time (the custom-Input extension point of SURVEY §2.12, realized
    * as planInputPartitions + SupportsPushDownFilters instead of a
    * flatMap over spark.range) — and the whole-table aggregate then
    * pushes COMPLETELY into the source (SupportsPushDownAggregates):
    * count/min/max/sum over the pruned range are closed-form, so the
    * plan is a Project over a one-row pre-aggregated BatchScan with no
    * Aggregate node and zero data rows materialized (PlanSpec pins
    * this; SourcesSpec pins the grouped-aggregate fallback). */
  val rangeV2Pushdown = sql("range_v2_pushdown",
    """SELECT CAST(sum(range) AS BIGINT) AS s, count(*) AS n
       FROM range(0, 1000000) WHERE range >= 250000 AND range < 750000""") { (s, _) =>
    s.read.format("graft.sources.v2.RangeSource")
      .option("start", "0").option("end", "1000000").option("shards", "32")
      .load()
      .where(col("id") >= 250000L && col("id") < 750000L)
      .agg(sum(col("id")).as("s"), count(lit(1)).as("n"))
  }

  val all: Seq[QueryDef] = Seq(
    aggBool, aggBitagg, aggRegr, aggSkew, sqlLateralTopn,
    windowTimeRange, aggPercentile, sqlExtensionCosine, rangeV2Pushdown)
}
