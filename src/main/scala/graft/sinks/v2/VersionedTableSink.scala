package graft.sinks.v2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.{ChangeFeed, KeyedTable, VersionedKeyedTable}

/** `writeStream` INTO a [[VersionedKeyedTable]] — the write-side twin
  * of [[CdfSource]], as a genuine DataSource V2 [[StreamingWrite]]:
  *
  * {{{
  * df.writeStream.format("graft.sinks.v2.VersionedTableSink")
  *   .option("path", tableDir).option("keyCol", "k")
  *   .option("checkpointLocation", ckpt)
  *   .start()
  * }}}
  *
  * Semantics: every micro-batch is ONE keyed upsert commit (puts —
  * replace-by-key; the first epoch creates the table when absent).
  * EXACTLY-ONCE comes from the store itself, not from the sink: each
  * epoch's commit stamps `graft.sinkEpoch.<queryId> = epochId` in the
  * table's own commit metadata, atomically with the data — a replayed
  * epoch (crash after the table commit, before Spark's sink log
  * recorded it) finds its stamp in the commit lineage and SKIPS, so
  * the batch applies exactly once even though upserts are re-runnable.
  * This is the transactional-sink contract (Delta's
  * txnAppId/txnVersion idempotent writes) reduced to the commit
  * metadata the store already carries.
  *
  * Mechanics: executors stage their partitions as parquet files under
  * the table's `_staging/` dir (parquet-hadoop Group writer — no data
  * ever funnels through the driver); the driver's `commit(epoch)`
  * reads the staged files as one DataFrame, runs the upsert commit
  * with the epoch stamp, and removes the staging. `abort` removes the
  * staging and leaves no table state (visibility IS the manifest
  * commit). Downstream, the table's CDF — and therefore [[CdfSource]]
  * — sees each micro-batch as one commit: readStream → table →
  * readStream composes end to end.
  */
class VersionedTableSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    // sink-only source: the written schema comes from the query
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val mode = Option(opts.get("writeMode")).getOrElse("cow")
    require(mode == "cow" || mode == "mor",
      s"VersionedTableSink: writeMode must be 'cow' (bucket-rewrite " +
        s"upserts, the default) or 'mor' (merge-on-read appends); " +
        s"got '$mode'")
    val autoCompact = Option(opts.get("autoCompactFilesPerBucket"))
      .map(_.toInt).getOrElse(0)
    require(autoCompact >= 0,
      s"autoCompactFilesPerBucket must be >= 0 (0 = off); got " +
        s"$autoCompact")
    new VersionedSinkTable(CdfSource.required(opts, "path"),
      CdfSource.required(opts, "keyCol"),
      Option(opts.get("numBuckets")).map(_.toInt).getOrElse(16),
      Option(opts.get("captureChanges")).forall(_.toBoolean),
      morMode = mode == "mor", autoCompact = autoCompact)
  }
}

class VersionedSinkTable(dir: String, keyCol: String, numBuckets: Int,
    captureChanges: Boolean, morMode: Boolean = false,
    autoCompact: Int = 0)
    extends Table with SupportsWrite {
  override def name: String = s"graft_sink($dir)"
  override def schema: StructType = new StructType()
  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = {
          require(info.schema().fieldNames.contains(keyCol),
            s"VersionedTableSink: the written schema must carry the " +
              s"key column '$keyCol' (got " +
              s"${info.schema().fieldNames.mkString(", ")})")
          new VersionedStreamingWrite(dir, keyCol, numBuckets,
            captureChanges, info.queryId(), info.schema(), morMode,
            autoCompact)
        }
      }
    }
}

/** Per-task staged file path — the whole commit message. */
case class StagedFileMessage(path: String, rows: Long)
    extends WriterCommitMessage

object StagedFileMessage {
  /** Remove every staged file a write's tasks produced — shared by
    * commit (staging is dead weight once the table commit landed) and
    * abort (leave no state: visibility IS the manifest commit). */
  private[v2] def cleanup(spark: SparkSession, dir: String,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.foreach {
      case StagedFileMessage(p, _) =>
        fs.delete(new org.apache.hadoop.fs.Path(p), false): Unit
      case _ => ()
    }
  }
}

class VersionedStreamingWrite(dir: String, keyCol: String,
    numBuckets: Int, captureChanges: Boolean, queryId: String,
    schema: StructType, morMode: Boolean = false,
    autoCompact: Int = 0)
    extends StreamingWrite {

  private def spark = SparkSession.active
  private def stampKey = s"graft.sinkEpoch.$queryId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new VersionedSinkWriterFactory(dir, schema,
      SerializableHadoopConf.fromSession(spark))

  /** The epoch the table DURABLY holds for this query — walked off
    * the commit lineage like every consumer stamp. */
  private def lastEpoch: Option[Long] =
    if (KeyedTable.readMeta(spark, dir).isEmpty) None
    else ChangeFeed.stampedWatermark(spark, dir, stampKey)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect {
      case StagedFileMessage(p, n) if n > 0 => p
    }
    try {
      if (staged.isEmpty) return // empty epoch: nothing to commit
      if (!lastEpoch.exists(_ >= epochId)) { // else: replayed epoch —
        // the data already applied exactly once; FALL THROUGH to the
        // auto-compaction check, because the crash window this replay
        // covers is exactly "data commit landed, compact didn't"
        val rows = VersionedKeyedTable.scanPaths(spark, dir, schema,
          staged.toIndexedSeq)
        if (KeyedTable.readMeta(spark, dir).isEmpty)
          VersionedKeyedTable.create(rows, dir, keyCol, numBuckets,
            commitMeta = Map(stampKey -> epochId.toString))
        else if (morMode)
          // merge-on-read ingest: the micro-batch APPENDS data files +
          // a sequence-stamped equality-delete for replaced keys — per-
          // epoch cost is O(batch) regardless of how large the table's
          // buckets have grown (the 100 TB continuous-ingest shape;
          // compact() on a maintenance cadence folds the backlog)
          VersionedKeyedTable.upsertMor(spark, dir, rows, keyCol,
            captureChanges,
            commitMeta = Map(stampKey -> epochId.toString))
        else
          VersionedKeyedTable.upsert(spark, dir, rows, keyCol,
            captureChanges,
            commitMeta = Map(stampKey -> epochId.toString))
      }
      // AUTO-COMPACTION: unattended ingest must bound its own read
      // amplification — when any bucket's data-file count crosses the
      // threshold, fold THOSE buckets (surgical fragmentedOnly mode:
      // under MoR most buckets carry some pending delete at any
      // instant, and an unscoped pass would rewrite the whole table
      // every trigger; a rewritten bucket always consumes its own
      // delete backlog). The compact is its own CDF-invisible layout
      // commit AFTER the epoch's data commit, and it runs for
      // REPLAYED epochs too — a crash between the data commit and the
      // compact re-runs only the compact on replay, so exactly-once
      // is untouched AND the bounded-files contract survives a crash
      // on the final epoch.
      if (autoCompact > 0 &&
          VersionedKeyedTable.snapshot(spark, dir).files
            .valuesIterator.exists(_.size > autoCompact))
        VersionedKeyedTable.compact(spark, dir, keyCol,
          maxFilesPerBucket = autoCompact, fragmentedOnly = true)
    } finally cleanup(messages)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = cleanup(messages)

  private def cleanup(messages: Array[WriterCommitMessage]): Unit =
    StagedFileMessage.cleanup(spark, dir, messages)
}

class VersionedSinkWriterFactory(dir: String, schema: StructType,
    conf: SerializableHadoopConf)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new StagingParquetWriter(
      s"$dir/_staging/e$epochId-p$partitionId-t$taskId-" +
        s"${java.util.UUID.randomUUID()}.parquet", schema, Some(conf))
}

/** Writes InternalRows to one staged parquet file via the
  * parquet-hadoop Group API — the writer-side mirror of
  * [[CdfPartitionReader]], same supported types, nulls skipped
  * (optional fields). Carries the session's Hadoop conf so staging
  * works on non-default filesystems. */
class StagingParquetWriter(path: String, schema: StructType,
    hadoopConf: Option[SerializableHadoopConf] = None)
    extends DataWriter[InternalRow] {

  private def baseConf(): org.apache.hadoop.conf.Configuration =
    hadoopConf.map(c => new org.apache.hadoop.conf.Configuration(c.value))
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  import org.apache.parquet.schema.{LogicalTypeAnnotation => LTA,
    PrimitiveType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  private val messageType: org.apache.parquet.schema.MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val prim = f.dataType match {
        case LongType => Types.optional(INT64)
        case TimestampType => Types.optional(INT64)
          .as(LTA.timestampType(true, LTA.TimeUnit.MICROS))
        case IntegerType => Types.optional(INT32)
        case ShortType => Types.optional(INT32)
          .as(LTA.intType(16, true))
        case ByteType => Types.optional(INT32).as(LTA.intType(8, true))
        case DateType => Types.optional(INT32).as(LTA.dateType())
        case DoubleType => Types.optional(DOUBLE)
        case FloatType => Types.optional(FLOAT)
        case BooleanType => Types.optional(BOOLEAN)
        case StringType => Types.optional(BINARY).as(LTA.stringType())
        case other => throw new UnsupportedOperationException(
          s"VersionedTableSink: unsupported column type $other " +
            s"for '${f.name}'")
      }
      b.addField(prim.named(f.name): PrimitiveType)
    }
    b.named("graft_staged")
  }

  private val factory =
    new org.apache.parquet.example.data.simple.SimpleGroupFactory(
      messageType)

  private val writer = {
    val conf = baseConf()
    org.apache.parquet.hadoop.example.GroupWriteSupport
      .setSchema(messageType, conf)
    org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(path))
      .withConf(conf)
      .withType(messageType)
      .build()
  }

  private var n = 0L

  /** Row-level operations hand (metadata, record) pairs — the
    * metadata (`_file` provenance) is the planner's business, the
    * staged bytes are the record's. */
  override def write(metadata: InternalRow, record: InternalRow): Unit =
    write(record)

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val name = schema(i).name
        schema(i).dataType match {
          case LongType | TimestampType => g.add(name, row.getLong(i))
          case IntegerType | DateType => g.add(name, row.getInt(i))
          case ShortType => g.add(name, row.getShort(i).toInt)
          case ByteType => g.add(name, row.getByte(i).toInt)
          case DoubleType => g.add(name, row.getDouble(i))
          case FloatType => g.add(name, row.getFloat(i))
          case BooleanType => g.add(name, row.getBoolean(i))
          case StringType => g.add(name, row.getUTF8String(i).toString)
          case other => throw new UnsupportedOperationException(
            s"unsupported $other") // unreachable: messageType refused it
        }
      }
      i += 1
    }
    writer.write(g)
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    StagedFileMessage(path, n)
  }

  override def abort(): Unit = {
    writer.close()
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(baseConf())
      .delete(new org.apache.hadoop.fs.Path(path), false): Unit
  }

  override def close(): Unit = ()
}
