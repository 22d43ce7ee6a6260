package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.Salting

/** Second relational batch: subquery shapes, sliding frames, per-group
  * top-k, histograms, generated sequences, skew-salted joins, and mode.
  *
  * Oracle-parity notes (see QueryDef scaladoc for the standing rules):
  * scalar-vs-average comparisons are cross-multiplied into exact decimal
  * integer comparisons (`x * n > sum`) instead of dividing, so neither
  * engine ever materializes a lossy average.
  */
object RelationalQueries2 {
  import QueryDef._

  private val Dec = "decimal(12,2)"

  // Scalar subquery: orders strictly above the global average price.
  // avg = sum/cnt is lossy in fp; compare price*cnt > sum in exact
  // decimal instead. Spark side: the one-row aggregate is cross-joined
  // (Catalyst broadcasts a single-row build side).
  val subqueryScalar = sql("subquery_scalar",
    """SELECT o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price
       FROM orders
       WHERE CAST(o_totalprice AS DECIMAL(12,2)) *
             (SELECT count(*) FROM orders) >
             (SELECT SUM(CAST(o_totalprice AS DECIMAL(12,2))) FROM orders)""") { (s, d) =>
    val o = Tables.orders(s, d)
    val stats = o.agg(
      count(lit(1)).as("n"),
      sum(col("o_totalprice").cast(Dec)).as("total"))
    o.crossJoin(broadcast(stats))
      .where(col("o_totalprice").cast(Dec) * col("n") > col("total"))
      .select(col("o_orderkey"),
        col("o_totalprice").cast(Dec).cast("double").as("price"))
  }

  // Correlated-subquery shape (TPC-H Q17): lineitems whose quantity is
  // below 20% of their part's average quantity. The correlated
  // `avg(l_quantity) per part` becomes a grouped aggregate joined back
  // on the fact's own join key — one shuffle, no per-row subquery —
  // and `q < 0.2*avg` cross-multiplies to `5*q*cnt < sum` exactly.
  val subqueryCorrelated = sql("subquery_correlated",
    """SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         AS small_qty_revenue,
       count(*) AS cnt
       FROM lineitem l
       JOIN (SELECT l_partkey, count(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
             FROM lineitem GROUP BY l_partkey) p
         ON l.l_partkey = p.l_partkey
       WHERE 5 * CAST(l.l_quantity AS DECIMAL(12,2)) * p.n < p.sq""") { (s, d) =>
    val li = Tables.lineitem(s, d)
    val perPart = li.groupBy("l_partkey").agg(
      count(lit(1)).as("n"),
      sum(col("l_quantity").cast(Dec)).as("sq"))
    li.join(perPart, "l_partkey")
      .where(lit(5) * col("l_quantity").cast(Dec) * col("n") < col("sq"))
      .agg(sum(col("l_extendedprice").cast(Dec)).cast("double")
          .as("small_qty_revenue"),
        count(lit(1)).as("cnt"))
  }

  // Sliding ROWS frame: 4-order moving spend per customer. The frame is
  // deterministic because (o_orderdate, o_orderkey) totally orders each
  // partition (o_orderkey is unique). One Exchange + one Sort.
  val windowSliding = sql("window_sliding",
    """SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_spend
       FROM orders""") { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(-3, Window.currentRow)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      sum(col("o_totalprice").cast(Dec)).over(w).cast("double")
        .as("moving_spend"))
  }

  // Per-group top-k: two highest-revenue parts per brand (rank-and-filter
  // — the distributed form of "N per group"; tiebreak on partkey keeps
  // it total). Revenue stays decimal until the final cast.
  val topkPerGroup = sql("topk_per_group",
    """SELECT p_brand, l_partkey,
       CAST(rev AS DOUBLE) AS revenue, rn
       FROM (
         SELECT p.p_brand, l.l_partkey,
           SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS rev,
           row_number() OVER (PARTITION BY p.p_brand
             ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) DESC,
                      l.l_partkey) AS rn
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY p.p_brand, l.l_partkey) t
       WHERE rn <= 2""") { (s, d) =>
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    val perPart = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand", "l_partkey")
      .agg(sum(col("l_extendedprice").cast(Dec)).as("rev"))
    val w = Window.partitionBy("p_brand")
      .orderBy(col("rev").desc, col("l_partkey"))
    perPart.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .select(col("p_brand"), col("l_partkey"),
        col("rev").cast("double").as("revenue"), col("rn"))
  }

  // Equi-width histogram: decile buckets over l_quantity. Bucket ids are
  // floor((q-1)/5) — a correctly-rounded IEEE division of identical
  // small-integer operands, so the floor is bit-identical across engines
  // (DuckDB CAST(double AS INT) rounds, so floor first, then cast).
  val histogramBucket = sql("histogram_bucket",
    """SELECT CAST(floor((l_quantity - 1) / 5) AS BIGINT) AS bucket,
       count(*) AS cnt,
       CAST(MIN(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS lo,
       CAST(MAX(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS hi
       FROM lineitem GROUP BY 1""") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(floor((col("l_quantity") - 1) / 5).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col("l_quantity").cast(Dec)).cast("double").as("lo"),
        max(col("l_quantity").cast(Dec)).cast("double").as("hi"))
  }

  // Row-generating sequence (ConsecutiveLongInput generalized to a
  // per-row lateral range): each order expands to a 3-day horizon.
  // Codegen'd explode(sequence) — no UDF, no driver loop.
  val genSequence = sql("gen_sequence",
    """SELECT o_orderkey,
       strftime(o_orderdate + INTERVAL (i) DAY, '%Y-%m-%d') AS day
       FROM orders, range(3) t(i)
       WHERE o_orderkey % 50 = 0""") { (s, d) =>
    Tables.orders(s, d)
      .where(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"),
        explode(sequence(lit(0), lit(2))).as("i"),
        col("o_orderdate"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate") + expr("make_interval(0,0,0,i)"),
          "yyyy-MM-dd").as("day"))
  }

  // Skew-salted shuffle join: Salting.saltedJoin splits each hot key
  // into SALT sub-keys (fact side salted, dim side replicated) so no
  // single reducer owns a whole hot key. The oracle is the PLAIN join —
  // salting must be invisible in the result.
  val joinSalted = sql("join_salted",
    """SELECT o.o_orderpriority,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS rev,
       count(*) AS cnt
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       GROUP BY o.o_orderpriority""") { (s, d) =>
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    Salting.saltedJoin(li, o, "l_orderkey", salts = 8)
      .groupBy("o_orderpriority")
      .agg(sum(col("l_extendedprice").cast(Dec)).cast("double").as("rev"),
        count(lit(1)).as("cnt"))
  }

  // Mode with a deterministic tiebreak: most frequent p_brand per p_type
  // prefix. Built-in mode() breaks ties arbitrarily in both engines, so
  // the portable form is count-desc/value-asc rank-and-filter.
  val aggMode = sql("agg_mode",
    """SELECT p_type, p_brand AS mode_brand, cnt
       FROM (
         SELECT p_type, p_brand, count(*) AS cnt,
           row_number() OVER (PARTITION BY p_type
             ORDER BY count(*) DESC, p_brand) AS rn
         FROM part GROUP BY p_type, p_brand) t
       WHERE rn = 1""") { (s, d) =>
    val counted = Tables.part(s, d)
      .groupBy("p_type", "p_brand").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("p_type")
      .orderBy(col("cnt").desc, col("p_brand"))
    counted.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("p_type"), col("p_brand").as("mode_brand"), col("cnt"))
  }

  // Array batch 2: construction (sequence), slice, reverse, containment,
  // and string assembly — all codegen'd expressions (no interpreted
  // higher-order lambdas; see BENCH_NOTES on the ann_cosine lesson).
  val scalarArray2 = sql("scalar_array2",
    """SELECT l_orderkey, l_linenumber,
       array_to_string(list_reverse(range(1, l_linenumber + 1)), ',')
         AS rev_seq,
       array_to_string(list_slice(range(1, l_linenumber + 1), 1, 2), ',')
         AS first_two,
       list_contains(range(1, l_linenumber + 1), 3) AS has_three,
       len(range(1, l_linenumber + 1)) AS n
       FROM lineitem WHERE l_orderkey % 100 = 0""") { (s, d) =>
    val arr = sequence(lit(1), col("l_linenumber"))
    Tables.lineitem(s, d)
      .where(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        array_join(reverse(arr), ",").as("rev_seq"),
        array_join(slice(arr, 1, 2), ",").as("first_two"),
        array_contains(arr, 3).as("has_three"),
        size(arr).cast("long").as("n"))
  }

  // MapType surface (the dynamic-schema escape hatch for property-bag
  // entities, SURVEY §7.4): construction from arrays, key extraction,
  // missing-key probe, key enumeration. Both engines preserve map
  // insertion order, so the joined key string is deterministic.
  val scalarMap = sql("scalar_map",
    """SELECT l_orderkey, l_linenumber,
       m['qty'][1] AS qty_v,
       len(map_keys(m)) AS nk,
       array_to_string(map_keys(m), ',') AS ks,
       len(m['missing']) > 0 AS has_missing
       FROM (
         SELECT l_orderkey, l_linenumber,
           MAP(['qty', 'line'],
               [CAST(floor(l_quantity) AS BIGINT),
                CAST(l_linenumber AS BIGINT)]) AS m
         FROM lineitem WHERE l_orderkey % 100 = 0) t""") { (s, d) =>
    Tables.lineitem(s, d)
      .where(col("l_orderkey") % 100 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        map_from_arrays(
          array(lit("qty"), lit("line")),
          array(floor(col("l_quantity")).cast("long"),
            col("l_linenumber").cast("long"))).as("m"))
      .select(col("l_orderkey"), col("l_linenumber"),
        element_at(col("m"), "qty").as("qty_v"),
        size(map_keys(col("m"))).cast("long").as("nk"),
        array_join(map_keys(col("m")), ",").as("ks"),
        element_at(col("m"), "missing").isNotNull.as("has_missing"))
  }

  // Time-series densification: daily order counts with missing days
  // filled as zero. The spine is generated from the data's own bounds
  // (a one-row aggregate feeding sequence+explode), then left-joined —
  // the calendar side is tiny and broadcasts; the fact side aggregates
  // before the join, so the shuffle carries days, not orders.
  val timeseriesFill = sql("timeseries_fill",
    """WITH daily AS (
         SELECT epoch_ns(o_orderdate) // 86400000000000 AS day,
           count(*) AS cnt
         FROM orders GROUP BY 1),
       bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
       spine AS (SELECT unnest(range(lo, hi + 1)) AS day FROM bounds)
       SELECT CAST(s.day AS BIGINT) AS day, COALESCE(d.cnt, 0) AS cnt
       FROM spine s LEFT JOIN daily d ON s.day = d.day""") { (s, d) =>
    // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC, so the cast to
    // TIMESTAMP is identity and matches DuckDB's naive epoch_ns
    val daily = Tables.orders(s, d)
      .select(expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000")
        .as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("cnt"))
    val spine = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  // IGNORE NULLS navigation: the most recent prior click's value at
  // each purchase, via lag over a sparse (CASE-nulled) column. Same
  // semantics as asof_prior_event's max-over-frame form, but exercising
  // the native IGNORE NULLS modifier both engines implement.
  val windowIgnoreNulls = sql("window_ignore_nulls",
    """WITH e AS (
         SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000000 AS ms,
           CAST(round(value * 100) AS BIGINT) AS cents
         FROM events)
       SELECT event_id, last_click_cents FROM (
         SELECT event_id, event_type,
           lag(CASE WHEN event_type = 'click' THEN cents END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ms, event_id)
             AS last_click_cents
         FROM e) t
       WHERE event_type = 'purchase' AND last_click_cents IS NOT NULL""") {
    (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("last_click_cents",
        lag(when(col("event_type") === "click", col("cents")), 1, null,
          ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase"
        && col("last_click_cents").isNotNull)
      .select(col("event_id"), col("last_click_cents"))
  }

  val all: Seq[QueryDef] = Seq(
    subqueryScalar, subqueryCorrelated, windowSliding, topkPerGroup,
    histogramBucket, genSequence, joinSalted, aggMode, scalarArray2,
    scalarMap, timeseriesFill, windowIgnoreNulls)
}
