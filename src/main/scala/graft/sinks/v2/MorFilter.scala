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
  /** Keyed by table dir + the sorted delete-file list — immutable
    * files, so a hit can never be stale; a new delete commit has a
    * new file list and therefore a new key. Bounded: cleared wholesale
    * past a small entry cap (long-lived executors scanning many
    * snapshots must not accrete dead sets). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashSet[Any]]()
  private val MaxCached = 64

  def load(dir: String, rels: Seq[String], keyName: String,
      keyType: DataType, conf: SerializableHadoopConf)
      : java.util.HashSet[Any] = {
    if (cache.size > MaxCached) cache.clear()
    cache.computeIfAbsent(dir + "#" + rels.sorted.mkString(","), _ => {
      val set = new java.util.HashSet[Any]()
      val schema = StructType(Seq(StructField(keyName, keyType)))
      rels.foreach { rel =>
        val r = new GroupParquetPartitionReader(s"$dir/$rel", schema,
          Map.empty, Some(conf))
        try {
          while (r.next()) {
            val row = r.get()
            if (!row.isNullAt(0)) set.add(row.get(0, keyType)): Unit
          }
        } finally r.close()
      }
      set
    })
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
    conf: SerializableHadoopConf) extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean =
    false

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val innerReader = inner.createReader(partition)
    val dels = MorDeleteSet.load(dir, rels, keyName, keyType, conf)
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
