package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Transform, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The reference's custom-Input extension point (`Input.createReaders`,
  * java/.../inputs/ConsecutiveLongInput.java:1-100) as a genuine
  * DataSource V2 implementation: `planInputPartitions` IS
  * `createReaders` — one InputPartition per shard, contiguous long
  * ranges — and filter pushdown prunes whole shards before they are
  * scheduled, the way `DatastoreShardStrategy.splitRange`
  * (inputs/DatastoreShardStrategy.java:406) narrows typed key ranges.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.v2.RangeSource")
  *   .option("start", "0").option("end", "1000000").option("shards", "32")
  *   .load()                      // schema: (id BIGINT NOT NULL)
  * }}}
  *
  * Supported pushdown on `id`: =, <, <=, >, >= conjunctions (the same
  * op set the reference's Datastore filters allow,
  * python/src/mapreduce/property_range.py:109-136). Pushed filters
  * tighten [start, end) so pruned shards never become tasks — at
  * 1000 executors that is the difference between 32 tasks and zero for
  * an out-of-range probe.
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RangeTable(
      properties.getOrDefault("start", "0").toLong,
      Option(properties.get("end")).map(_.toLong).getOrElse(
        throw new IllegalArgumentException("option 'end' is required")),
      properties.getOrDefault("shards", "4").toInt)
}

object RangeSource {
  val schema: StructType = new StructType().add("id", LongType, nullable = false)
}

class RangeTable(start: Long, end: Long, shards: Int)
    extends Table with SupportsRead {
  override def name: String = s"graft_range($start, $end, shards=$shards)"
  override def schema: StructType = RangeSource.schema
  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(start, end, shards)
}

/** Filter pushdown tightens the range before split planning; aggregate
  * pushdown goes further — COUNT/MIN/MAX/SUM over the (pruned) range
  * are closed-form arithmetic, so the "scan" emits ONE pre-aggregated
  * row and zero data rows ever materialize. This is the
  * `SupportsPushDownAggregates` analogue of what a storage engine with
  * range statistics does for a 100 TB table: answer the aggregate from
  * metadata. Complete pushdown is claimed only for the no-grouping,
  * whole-function-set case; anything else falls back to the row scan. */
class RangeScanBuilder(start: Long, end: Long, shards: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var lo = start
  private var hi = end // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var aggSchema: Option[StructType] = None
  private var aggFuncs: Seq[String] = Nil

  private def isId(children: Array[org.apache.spark.sql.connector.expressions.Expression]): Boolean =
    children.length == 1 && (children(0) match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
      case _ => false
    })

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case c: Count => !c.isDistinct && isId(c.children)
        case m: Min => isId(m.children)
        case m: Max => isId(m.children)
        // decline SUM whose closed form overflows Long: Spark's own
        // aggregate then raises ARITHMETIC_OVERFLOW under ANSI mode,
        // where a completed pushdown would silently wrap the value
        case s: Sum => !s.isDistinct && isId(s.children) && sumFitsInLong
        case _ => false
      }

  /** The exact SUM over [lo, hi) fits in a Long. Filters are pushed
    * before aggregates (V2ScanRelationPushDown order), so lo/hi are
    * final here. If the closed form overflows, DECLINE the pushdown:
    * Spark's own aggregate then raises ARITHMETIC_OVERFLOW under ANSI
    * mode — completing the pushdown would silently wrap the value,
    * changing an error into a wrong answer. */
  private def sumFitsInLong: Boolean = {
    val n = math.max(0L, hi - lo)
    n == 0 ||
      ((BigInt(lo) + BigInt(hi - 1)) * BigInt(n) / 2).isValidLong
  }

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) return false
    val fields = new StructType()
    val (schema, funcs) = agg.aggregateExpressions.zipWithIndex
      .foldLeft((fields, Seq.empty[String])) { case ((sc, fs), (e, i)) =>
        val kind = e match {
          case _: CountStar => "count_star"
          case _: Count => "count_id"
          case _: Min => "min"
          case _: Max => "max"
          case _: Sum => "sum"
        }
        // min/max/sum are NULL over an empty range (SQL semantics);
        // only counts are never null
        (sc.add(s"agg_$i", LongType, nullable = kind != "count_star" &&
          kind != "count_id"), fs :+ kind)
      }
    aggSchema = Some(schema)
    aggFuncs = funcs
    true
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("id", _: Long) | GreaterThan("id", _: Long) |
           GreaterThanOrEqual("id", _: Long) | LessThan("id", _: Long) |
           LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = accepted
    // accepted filters are fully handled by range tightening — nothing
    // left for Spark to re-evaluate; rejected ones stay in the plan
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = aggSchema match {
    case Some(schema) =>
      new RangeAggScan(schema, aggFuncs, lo, math.max(lo, hi))
    case None =>
      new RangeScan(start, end, shards, lo, math.max(lo, hi))
  }
}

/** The pre-aggregated "scan": one partition, one row, each value a
  * closed form over [lo, hi) — count = hi-lo, min = lo, max = hi-1,
  * sum = (lo + hi - 1)(hi - lo)/2. Empty range ⇒ count/sum 0, min/max
  * null (matching Spark's aggregate-over-empty semantics). */
class RangeAggScan(schema: StructType, funcs: Seq[String],
    lo: Long, hi: Long) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description: String =
    s"graft_range AGGREGATED [$lo, $hi): ${funcs.mkString(", ")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(RangeAggPartition(funcs, lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeAggReaderFactory
}

case class RangeAggPartition(funcs: Seq[String], lo: Long, hi: Long)
    extends InputPartition

class RangeAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val ap = p.asInstanceOf[RangeAggPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = {
        val n = math.max(0L, ap.hi - ap.lo)
        val vals: Seq[Any] = ap.funcs.map {
          case "count_star" | "count_id" => n
          case "min" => if (n == 0) null else ap.lo
          case "max" => if (n == 0) null else ap.hi - 1
          // pairwise (lo + hi-1) * n / 2 in BigInt to dodge the
          // intermediate overflow a 10^9-row range would hit in longs
          case "sum" =>
            if (n == 0) null
            else ((BigInt(ap.lo) + BigInt(ap.hi - 1)) * BigInt(n) / 2).toLong
        }
        InternalRow.fromSeq(vals)
      }
      override def close(): Unit = ()
    }
  }
}

class RangeScan(start: Long, end: Long, shards: Int,
    boundLo: Long, boundHi: Long) extends Scan with Batch {
  override def readSchema(): StructType = RangeSource.schema
  override def toBatch: Batch = this
  override def description: String =
    s"graft_range [$start, $end) pruned to [$boundLo, $boundHi)"

  /** createReaders: shard boundaries come from the ORIGINAL range
    * (ConsecutiveLongInput.java split arithmetic — fixed split points);
    * each shard is then intersected with the pushed-filter bounds and
    * dropped if empty. Pruned shards never become tasks, and surviving
    * shards keep their identity — the DatastoreShardStrategy model of
    * range pruning over a fixed sharding. */
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, shards)
    val total = math.max(0L, end - start)
    val base = total / n
    val rem = total % n
    val parts = Array.newBuilder[InputPartition]
    var shardLo = start
    var i = 0
    while (i < n) {
      val len = base + (if (i < rem) 1L else 0L)
      val lo = math.max(shardLo, boundLo)
      val hi = math.min(shardLo + len, boundHi)
      if (hi > lo) parts += RangePartition(lo, hi)
      shardLo += len
      i += 1
    }
    parts.result()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory
}

case class RangePartition(lo: Long, hi: Long) extends InputPartition

class RangeReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[RangePartition]
    new PartitionReader[InternalRow] {
      private var cur = rp.lo - 1
      override def next(): Boolean = { cur += 1; cur < rp.hi }
      override def get(): InternalRow = InternalRow(cur)
      override def close(): Unit = ()
    }
  }
}
