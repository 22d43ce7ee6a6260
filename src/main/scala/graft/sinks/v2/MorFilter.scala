package graft.sinks.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Executor-side MERGE-ON-READ delete filtering for catalog scans:
  * when a snapshot carries pending delete files
  * ([[graft.sinks.VersionedKeyedTable.deleteMor]]), the catalog's row
  * scan keeps its manifest file pruning and parquet reader but drops
  * rows whose key is in the snapshot's delete set — the DSv2 analogue
  * of the anti-join every programmatic read path applies (a DSv2 scan
  * has no join to ride, so the filter runs in the reader). The delete
  * set is loaded ONCE PER EXECUTOR from the (small by regimen —
  * compaction consumes them) delete files and cached by snapshot
  * delete-file signature, so a 32-task scan pays one load. Tables
  * without pending deletes never reach this path — their scans are
  * byte-identical to pre-MOR plans, vectorized reads included. */
object MorDeleteSet {
  /** Default per-executor bound on the MATERIALIZED delete-key set
    * (rows, summed over the scan's applicable delete files). The
    * regimen keeps pending deletes small — compaction consumes them —
    * but nothing upstream ENFORCES it on the batch path: a table
    * accumulating millions of MoR-deleted keys between compactions
    * would otherwise OOM every executor that scans it. ~2M boxed keys
    * ≈ low hundreds of MB of HashSet — tolerable on a small executor,
    * loud before it isn't. Override per session with
    * `spark.graft.mor.maxDeleteRows`; the scan refuses AT PLAN TIME
    * (driver, from the manifest's delete-file row counts — no file
    * opened) with "compact first" above the bound. */
  val DefaultMaxRows = 2000000L

  /** The session's bound, read driver-side at plan time. */
  def maxRows(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("spark.graft.mor.maxDeleteRows")
      .map(_.toLong).getOrElse(DefaultMaxRows)

  /** Driver-side PLAN-TIME gate: the manifest records every delete
    * file's row count, so the size of the executor set is known
    * before any partition is planned — a backlog past the bound
    * refuses the scan loudly ("compact first") instead of OOMing
    * every executor that touches the table. A delete file WITHOUT a
    * recorded count (legacy manifests) cannot be bounded and refuses
    * too. Returns the bound, to ship to the executors as the
    * belt-and-braces load cap. */
  def planCheck(spark: org.apache.spark.sql.SparkSession, dir: String,
      counts: Map[String, Long], applicable: Seq[String]): Long = {
    val cap = maxRows(spark)
    val total =
      if (applicable.forall(counts.contains)) applicable.map(counts).sum
      else Long.MaxValue // unknown count: cannot bound — refuse
    if (total > cap) throw new IllegalStateException(
      s"pending merge-on-read delete backlog at $dir " +
        (if (total == Long.MaxValue) "(a delete file with no recorded " +
           "row count) "
         else s"($total doomed keys) ") +
        s"exceeds spark.graft.mor.maxDeleteRows=$cap — the per-" +
        "executor delete set cannot be materialized safely; run " +
        "compact() (SQL: CALL <catalog>.compact) to fold the pending " +
        "deletes back into data files, or raise the bound for this " +
        "session")
    cap
  }

  /** Keyed by table dir + the sorted delete-file list — immutable
    * files, so a hit can never be stale; a new delete commit has a
    * new file list and therefore a new key. LRU with per-entry
    * eviction (access-ordered LinkedHashMap): long-lived executors
    * scanning many snapshots shed the OLDEST set only, so a
    * concurrent scan's live set is never dropped wholesale mid-use
    * and reloaded by a thundering herd. Single-flight by the map's
    * own lock: a 32-task scan pays one load. */
  private val MaxCached = 64
  private val cache =
    new java.util.LinkedHashMap[String, java.util.HashSet[Any]](
        16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.util.HashSet[Any]])
          : Boolean = size() > MaxCached
    }

  def load(dir: String, rels: Seq[String], keyName: String,
      keyType: DataType, conf: SerializableHadoopConf,
      maxRows: Long = DefaultMaxRows): java.util.HashSet[Any] =
    cache.synchronized {
      val key = dir + "#" + rels.sorted.mkString(",")
      val hit = cache.get(key)
      if (hit != null) hit
      else {
        val set = new java.util.HashSet[Any]()
        val schema = StructType(Seq(StructField(keyName, keyType)))
        rels.foreach { rel =>
          val r = new GroupParquetPartitionReader(s"$dir/$rel", schema,
            Map.empty, Some(conf))
          try {
            while (r.next()) {
              val row = r.get()
              if (!row.isNullAt(0)) {
                set.add(row.get(0, keyType)): Unit
                // executor-side backstop behind the driver's plan-time
                // refusal (manifests whose counts lied, or a raised
                // conf on the driver only)
                if (set.size > maxRows) throw new IllegalStateException(
                  s"merge-on-read delete backlog at $dir exceeds " +
                    s"spark.graft.mor.maxDeleteRows=$maxRows while " +
                    "loading the executor delete set — run compact() " +
                    "to fold the pending deletes, or raise the bound")
              }
            }
          } finally r.close()
        }
        cache.put(key, set)
        set
      }
    }
}

/** Wraps a row-based reader factory, dropping rows whose key (at
  * `keyIdx` of the inner read schema) is in the delete set. Row-based
  * by construction — the inner parquet read still decodes only the
  * (key-extended) projected columns and prunes row groups; the
  * columnar fast path returns with compaction, which purges the
  * delete files. */
/** An inner partition tagged with its SEQUENCE-CLASS index — how a
  * multi-class scan (a table [[graft.sinks.VersionedKeyedTable
  * .upsertMor]] appended to) pairs each partition with the delete
  * set that applies to its files' sequence. */
case class SeqClassPartition(inner: InputPartition, classIdx: Int)
    extends InputPartition

/** Dispatches each [[SeqClassPartition]] to its class's (possibly
  * delete-filtering) factory. Row-based: multi-class only exists
  * while merge-on-read state is pending. */
class SeqClassDispatchFactory(factories: Seq[PartitionReaderFactory])
    extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean =
    false
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqClassPartition]
    factories(p.classIdx).createReader(p.inner)
  }
}

class MorFilterReaderFactory(inner: PartitionReaderFactory, dir: String,
    rels: Seq[String], keyName: String, keyType: DataType, keyIdx: Int,
    conf: SerializableHadoopConf,
    maxRows: Long = MorDeleteSet.DefaultMaxRows)
    extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean =
    false

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val innerReader = inner.createReader(partition)
    val dels = MorDeleteSet.load(dir, rels, keyName, keyType, conf,
      maxRows)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (innerReader.next()) {
          val r = innerReader.get()
          // a deleted key never matches a null cell (keys are non-null
          // by the keyed contract; conservative either way)
          if (r.isNullAt(keyIdx) ||
              !dels.contains(r.get(keyIdx, keyType))) {
            cur = r
            return true
          }
        }
        false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = innerReader.close()
    }
  }
}
