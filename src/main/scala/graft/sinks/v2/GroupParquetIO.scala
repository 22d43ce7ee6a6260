package graft.sinks.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hadoop `Configuration` made Java-serializable so driver-built DSv2
  * factories can carry the SESSION's filesystem settings (spark.hadoop.*
  * overrides, credentials, custom scheme impls) to executor-side
  * parquet readers/writers — a fresh `new Configuration()` on the
  * executor would silently drop them and break any non-default
  * filesystem (the pattern Spark itself uses for its file sources). */
class SerializableHadoopConf(@transient private var conf:
    org.apache.hadoop.conf.Configuration)
    extends java.io.Serializable {
  def value: org.apache.hadoop.conf.Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(in)
  }
}

object SerializableHadoopConf {
  /** The active session's Hadoop conf, snapshotted for shipping. */
  def fromSession(spark: org.apache.spark.sql.SparkSession)
      : SerializableHadoopConf =
    new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
}

/** Shared executor-side parquet → [[InternalRow]] reader over the
  * parquet-hadoop Group API, used by every custom DSv2 surface that
  * reads the store's immutable files: [[CdfSource]] partitions and
  * the catalog's `_file` metadata-column scan (the row-level
  * operations' full-width CoW read); plain [[GraftCatalog]] row scans
  * ride Spark's vectorized parquet scan instead. Fields resolve BY
  * NAME — absent fields (pre-evolution
  * files) and unset cells read as null; `virtual` columns are
  * constants injected per partition (a commit version, a file
  * provenance tag). Supported types are the keyed store's own:
  * integral, floating, boolean, string, date (INT32 days), timestamp
  * as EITHER physical encoding Spark writes — INT64 micros
  * (outputTimestampType=TIMESTAMP_MICROS) or INT96 (the default
  * writer encoding: 8-byte little-endian nanos-of-day + 4-byte
  * little-endian Julian day, decoded here exactly as Spark's own
  * reader does; no pre-1582 rebase — the store carries epoch-era
  * instants). */
class GroupParquetPartitionReader(path: String, schema: StructType,
    virtual: Map[String, Any] = Map.empty,
    hadoopConf: Option[SerializableHadoopConf] = None)
    extends PartitionReader[InternalRow] {

  private val reader = org.apache.parquet.hadoop.ParquetReader
    .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
      new org.apache.hadoop.fs.Path(path))
    .withConf(hadoopConf.map(_.value).getOrElse(
      new org.apache.hadoop.conf.Configuration()))
    .build()

  private var cur: org.apache.parquet.example.data.Group = _

  override def next(): Boolean = {
    cur = reader.read()
    cur != null
  }

  /** INT96 parquet timestamp → epoch micros (the Impala/Hive layout:
    * 12 bytes, nanos-of-day then Julian day, both little-endian). */
  private def int96ToMicros(bin: org.apache.parquet.io.api.Binary): Long = {
    val buf = bin.toByteBuffer.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    // 2440588 = Julian day of 1970-01-01
    (julianDay - 2440588L) * 86400L * 1000000L + nanosOfDay / 1000L
  }

  private def value(g: org.apache.parquet.example.data.Group,
      name: String, dt: DataType): Any = {
    val gt = g.getType
    if (!gt.containsField(name)) return null
    val idx = gt.getFieldIndex(name)
    if (g.getFieldRepetitionCount(idx) == 0) return null // null cell
    dt match {
      case TimestampType =>
        gt.getType(idx).asPrimitiveType().getPrimitiveTypeName match {
          case org.apache.parquet.schema.PrimitiveType
              .PrimitiveTypeName.INT96 => int96ToMicros(g.getInt96(idx, 0))
          case _ => g.getLong(idx, 0) // INT64 micros
        }
      case LongType => g.getLong(idx, 0)
      case IntegerType | DateType => g.getInteger(idx, 0)
      case ShortType => g.getInteger(idx, 0).toShort
      case ByteType => g.getInteger(idx, 0).toByte
      case DoubleType => g.getDouble(idx, 0)
      case FloatType => g.getFloat(idx, 0)
      case BooleanType => g.getBoolean(idx, 0)
      case StringType => UTF8String.fromString(g.getString(idx, 0))
      case other => throw new UnsupportedOperationException(
        s"graft group reader: unsupported column type $other for " +
          s"'$name'")
    }
  }

  override def get(): InternalRow = {
    val vals = schema.fields.map { f =>
      virtual.get(f.name) match {
        case Some(v) => v
        case None => value(cur, f.name, f.dataType)
      }
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = reader.close()
}
