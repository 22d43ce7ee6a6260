package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
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

/** Filter pushdown tightens the range before split planning. */
class RangeScanBuilder(start: Long, end: Long, shards: Int)
    extends ScanBuilder with SupportsPushDownFilters {
  private var lo = start
  private var hi = end // exclusive
  private var pushed: Array[Filter] = Array.empty

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

  override def build(): Scan =
    new RangeScan(start, end, shards, lo, math.max(lo, hi))
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
