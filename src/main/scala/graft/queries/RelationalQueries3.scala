package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.mr._

/** Round-3 relational additions: skew-hardened two-phase aggregation,
  * nested struct columns, two more canonical multi-join analytics
  * shapes (TPC-H Q10/Q18), and the secondary-sort MapReduce contract
  * under an oracle (MapSettings-style value ordering — the reference
  * never promises value order; `valueOrdering` is the explicit
  * opt-in, cf. java/.../impl/Shuffling.java:104-113).
  */
object RelationalQueries3 {
  import QueryDef._

  private val Dec = "decimal(12,2)"

  /** Two-phase salted SUM over a skewed group key: stage 1 aggregates
    * per (key, salt), stage 2 merges partials — a hot key spreads over
    * 8 reducers. Exact-decimal sums are associative, so the oracle is
    * the plain GROUP BY. (For algebraic sums Spark's partial
    * aggregation already does this implicitly; the explicit form is
    * for non-algebraic per-key state — the oracle check pins the
    * equivalence contract.) */
  val aggSaltedSum = sql("agg_salted_sum",
    """SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
       FROM lineitem GROUP BY l_returnflag""") { (s, d) =>
    graft.functions.Salting.saltedSum(Tables.lineitem(s, d),
        key = col("l_returnflag"),
        value = col("l_extendedprice").cast(Dec) *
          (lit(1).cast(Dec) - col("l_discount").cast(Dec)),
        salts = 8)
      .select(col("k").as("l_returnflag"),
        col("total").cast("double").as("revenue"))
  }

  /** Nested struct columns: per-order array of (linenumber, quantity)
    * structs, deterministically sorted, with first-element field
    * access — the typed-nested-schema surface (SURVEY §7.4's
    * counterpart to the MapType escape hatch). */
  val scalarStruct = sql("scalar_struct",
    """SELECT l_orderkey,
       CAST(lines[1].ln AS INT) AS first_ln,
       CAST(lines[1].qty AS DOUBLE) AS first_qty,
       len(lines) AS n_lines
       FROM (SELECT l_orderkey,
               list(struct_pack(ln := l_linenumber, qty := l_quantity)
                    ORDER BY l_linenumber, l_quantity) AS lines
             FROM lineitem GROUP BY l_orderkey) t""") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(
        struct(col("l_linenumber").as("ln"), col("l_quantity").as("qty"))))
        .as("lines"))
      .select(col("l_orderkey"),
        element_at(col("lines"), 1).getField("ln").cast("int").as("first_ln"),
        element_at(col("lines"), 1).getField("qty").cast("double").as("first_qty"),
        size(col("lines")).cast("long").as("n_lines"))
  }

  /** TPC-H Q10 shape — returned-item revenue by customer and nation:
    * date-windowed fact scan, three joins (two broadcastable dims),
    * grouped decimal aggregate, top-20. The plan to want at 100 TB:
    * filters pushed to the lineitem/orders scans, nation broadcast,
    * customer broadcast at small SF (AQE decides), one shuffle on the
    * group key, TakeOrderedAndProject for the top-k. */
  val joinQ10 = sql("join_q10",
    """SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE l_returnflag = 'R'
         AND o_orderdate >= TIMESTAMP '1997-01-01'
         AND o_orderdate < TIMESTAMP '1997-07-01'
       GROUP BY c_custkey, c_name, n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20""") { (s, d) =>
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
    val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
    Tables.customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(col("l_extendedprice").cast(Dec) *
        (lit(1).cast(Dec) - col("l_discount").cast(Dec)))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q18 shape — large-volume customers: a grouped HAVING
    * subquery gates the fact table (semi-join on the aggregate's own
    * key, so the filter rides the same shuffle), then re-aggregate
    * with the customer dimension. */
  val joinQ18 = sql("join_q18",
    """WITH big AS (
         SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
         HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > CAST(200 AS DECIMAL(12,2)))
       SELECT c_custkey, o_orderkey,
         CAST(o_totalprice AS DOUBLE) AS total,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
       FROM orders
       JOIN big ON o_orderkey = big.l_orderkey
       JOIN customer ON c_custkey = o_custkey
       JOIN lineitem ON lineitem.l_orderkey = o_orderkey
       GROUP BY c_custkey, o_orderkey, o_totalprice""") { (s, d) =>
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(Dec)).as("q"))
      .filter(col("q") > lit(200).cast(Dec))
      .select(col("l_orderkey").as("big_key"))
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("big_key"), "leftsemi")
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .agg(sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"))
      .select(col("c_custkey"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("total"), col("sum_qty"))
  }

  /** Secondary sort under an oracle: per order priority, the first
    * three (date, orderkey) values in value order, concatenated —
    * exercises MapReduceSpecification.valueOrdering end-to-end. */
  val mrSecondarySort = sql("mr_secondary_sort",
    """WITH r AS (
         SELECT o_orderpriority AS priority,
           strftime(o_orderdate, '%Y-%m-%d') || ':' ||
             CAST(o_orderkey AS VARCHAR) AS v,
           row_number() OVER (PARTITION BY o_orderpriority
             ORDER BY strftime(o_orderdate, '%Y-%m-%d'), o_orderkey) AS rn
         FROM orders)
       SELECT priority, string_agg(v, ',' ORDER BY rn) AS first3
       FROM r WHERE rn <= 3 GROUP BY priority""") { (s, d) =>
    import s.implicits._
    val in = Tables.orders(s, d).select(
      col("o_orderpriority"),
      date_format(col("o_orderdate"), "yyyy-MM-dd"),
      col("o_orderkey")).as[(String, String, Long)]
    MapReduceJob.run(MapReduceSpecification(
      jobName = "secondary-sort",
      input = in,
      mapper = new Mapper[(String, String, Long), String, (String, Long)] {
        def map(r: (String, String, Long),
            emit: (String, (String, Long)) => Unit): Unit =
          emit(r._1, (r._2, r._3))
      },
      reducer = new Reducer[String, (String, Long), (String, String)] {
        def reduce(key: String, values: Iterator[(String, Long)],
            emit: ((String, String)) => Unit): Unit =
          emit((key, values.take(3)
            .map { case (dt, k) => s"$dt:$k" }.mkString(",")))
      },
      valueOrdering = Some(Ordering.Tuple2(Ordering.String, Ordering.Long))))
      .toDF("priority", "first3")
  }

  /** General two-table as-of join (functions.AsOf): for each event,
    * the user's most recent prior order. The right side is pre-reduced
    * to one row per (key, time) — max orderkey — so the as-of match is
    * deterministic on both engines (neither Spark's carry-forward nor
    * DuckDB's ASOF JOIN promises a tiebreak among equal right times).
    * One shuffle on the key; the window pass costs |L|+|R|. */
  val joinAsOfEvents = sql("join_asof",
    """WITH o AS (
         SELECT o_custkey AS user_id, o_orderdate,
           max(o_orderkey) AS o_orderkey
         FROM orders GROUP BY 1, 2)
       SELECT e.event_id, o.o_orderkey AS asof_orderkey,
         epoch_us(o.o_orderdate) AS asof_ts
       FROM events e ASOF JOIN o
         ON e.user_id = o.user_id AND e.ts >= o.o_orderdate""") { (s, d) =>
    // time columns go through epoch micros (the library's long/epoch
    // contract): exact for both the µs event times and the midnight
    // order dates, no timestamp-precision comparisons anywhere
    val ev = Tables.events(s, d).select(col("user_id"),
      expr("unix_micros(ts)").as("ts"), col("event_id"))
    val ord = Tables.orders(s, d)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(col("o_custkey").as("user_id"),
        expr("unix_micros(cast(o_orderdate as timestamp))").as("ts"),
        col("o_orderkey"))
    graft.functions.AsOf.joinAsOf(ev, ord, "user_id", "ts", "o_orderkey")
      .filter(col("asof_o_orderkey").isNotNull)
      .select(col("event_id"),
        col("asof_o_orderkey").as("asof_orderkey"), col("asof_ts"))
  }

  /** As-of join with a tolerance bound (pandas merge_asof semantics):
    * same as join_asof but matches staler than 7 days null out — the
    * oracle filters DuckDB's ASOF JOIN result by the same exact
    * microsecond distance. */
  val joinAsOfTolerance = sql("join_asof_tolerance",
    """WITH o AS (
         SELECT o_custkey AS user_id, o_orderdate,
           max(o_orderkey) AS o_orderkey
         FROM orders GROUP BY 1, 2)
       SELECT e.event_id, o.o_orderkey AS asof_orderkey,
         epoch_us(o.o_orderdate) AS asof_ts
       FROM events e ASOF JOIN o
         ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
       WHERE epoch_ns(e.ts) // 1000 - epoch_us(o.o_orderdate)
             <= 604800000000""") { (s, d) =>
    val ev = Tables.events(s, d).select(col("user_id"),
      expr("unix_micros(ts)").as("ts"), col("event_id"))
    val ord = Tables.orders(s, d)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(col("o_custkey").as("user_id"),
        expr("unix_micros(cast(o_orderdate as timestamp))").as("ts"),
        col("o_orderkey"))
    graft.functions.AsOf.joinAsOf(ev, ord, "user_id", "ts", "o_orderkey",
        tolerance = Some(604800000000L)) // 7 days in µs
      .filter(col("asof_o_orderkey").isNotNull)
      .select(col("event_id"),
        col("asof_o_orderkey").as("asof_orderkey"), col("asof_ts"))
  }

  /** Multiple DISTINCT aggregates beside a plain aggregate in one query
    * — exercises Catalyst's Expand-based multi-distinct rewrite (each
    * distinct column tags its own expand branch; one pass, no
    * self-join). */
  val aggMultiDistinct = sql("agg_multi_distinct",
    """SELECT l_returnflag,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT l_partkey) AS n_part,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
       FROM lineitem GROUP BY l_returnflag""") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"))
  }

  val all: Seq[QueryDef] = Seq(
    aggSaltedSum, scalarStruct, joinQ10, joinQ18, mrSecondarySort,
    joinAsOfEvents, joinAsOfTolerance, aggMultiDistinct)
}
