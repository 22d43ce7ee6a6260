package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}
import org.apache.spark.sql.catalyst.ScalaReflection
import scala.reflect.runtime.universe.TypeTag

/** Sink library — Spark-native equivalents of the reference's
  * OutputWriters / Outputs (SURVEY.md §2.11). Spark's commit protocol
  * (task-attempt tmp dir + rename on commit) subsumes the reference's
  * tmp-file/rename shard-retry dance
  * (output_writers.py:669-848, GoogleCloudStorageConsistentOutputWriter)
  * — exactly-once file output is free.
  */
object Outputs {

  /** One file tree per job, one file per shard (task) — the
    * _GoogleCloudStorageOutputWriter analogue (output_writers.py:669-848).
    * Parquet replaces LevelDB record framing: columnar, checksummed,
    * splittable (SURVEY.md §1.3). */
  def parquet[T](ds: Dataset[T], path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    ds.write.mode(mode).parquet(path)

  /** Raw text, one line per record — GoogleCloudStorageFileOutput /
    * StringOutput analogue (outputs/StringOutput.java:33). */
  def text(ds: Dataset[String], path: String): Unit =
    ds.write.mode(SaveMode.Overwrite).text(path)

  /** Newline-delimited JSON with a schema derived from the row type —
    * the BigQuery sink analogue: schema-by-reflection + NDJSON encode
    * (reference impl/BigQueryMarshallerByType.java:20-60,
    * impl/BigQuerySchemaMarshallerByType.java). `schemaFor[T]` covers the
    * same surface: nested records → StructType, repeated → ArrayType. */
  def ndjson[T](ds: Dataset[T], path: String): Unit =
    ds.write.mode(SaveMode.Overwrite).json(path)

  /** ORC write — columnar alternative to parquet with the same commit
    * protocol, for consumers standardized on the ORC stack. */
  def orc[T](ds: Dataset[T], path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    ds.write.mode(mode).orc(path)

  /** Derive the declared schema for a case class the way the reference
    * derives a BigQuery TableSchema by reflection. */
  def derivedSchema[T: TypeTag]: StructType =
    ScalaReflection.schemaFor[T].dataType match {
      case s: StructType => s
      case other => new StructType().add("value", other)
    }

  /** Per-field (rename, mode, ignore) adjustments read from the
    * OutputName / OutputMode / OutputIgnore annotations on T's primary
    * constructor — reference BigQueryDataField.java / BigQueryIgnore
    * .java as honored by impl/BigQueryFieldUtil.java:47-56. */
  private def fieldAdjustments[T: TypeTag]
      : Seq[(String, Option[String], Option[String], Boolean)] = {
    import scala.reflect.runtime.universe._
    val ctor = typeOf[T].typeSymbol.asClass.primaryConstructor
    if (!ctor.isMethod) Nil
    else ctor.asMethod.paramLists.headOption.getOrElse(Nil).map { p =>
      val anns = p.annotations
      def strArg(t: Type): Option[String] =
        anns.find(_.tree.tpe =:= t).flatMap(_.tree.children.tail.collectFirst {
          case Literal(Constant(s: String)) => s
        })
      (p.name.decodedName.toString,
        strArg(typeOf[OutputName]),
        strArg(typeOf[OutputMode]),
        anns.exists(_.tree.tpe =:= typeOf[OutputIgnore]))
    }
  }

  /** Derived schema with annotation overrides applied: OutputIgnore
    * drops the field, OutputName renames it, OutputMode("REQUIRED")
    * makes it non-nullable (NULLABLE the inverse) — the annotated
    * TableSchema derivation of the reference. */
  def annotatedSchema[T: TypeTag]: StructType = {
    val adj = fieldAdjustments[T]
    StructType(derivedSchema[T].fields.toSeq.flatMap { f =>
      adj.find(_._1 == f.name) match {
        case Some((_, _, _, true)) => None
        case Some((_, rename, mode, _)) =>
          Some(f.copy(
            name = rename.getOrElse(f.name),
            nullable = mode match {
              case Some("REQUIRED") => false
              case Some("NULLABLE") => true
              case _ => f.nullable
            }))
        case None => Some(f)
      }
    })
  }

  /** Marshal a typed Dataset to a DataFrame honoring the annotations —
    * ignored fields dropped, renamed fields renamed — so any writer
    * (ndjson, parquet, ...) emits the annotated shape. */
  def toAnnotatedDF[T: TypeTag](ds: Dataset[T]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val adj = fieldAdjustments[T]
    val cols = ds.toDF().columns.toSeq.flatMap { c =>
      adj.find(_._1 == c) match {
        case Some((_, _, _, true)) => None
        case Some((_, rename, _, _)) => Some(col(c).as(rename.getOrElse(c)))
        case None => Some(col(c))
      }
    }
    ds.toDF().select(cols: _*)
  }

  /** Render a derived schema in a BigQuery-ish field list form
    * (name, type, mode) — the TableSchema analogue. */
  def schemaFields(schema: StructType, prefix: String = ""): Seq[(String, String, String)] =
    schema.fields.toSeq.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      def leaf(dt: DataType, mode: String): Seq[(String, String, String)] =
        dt match {
          case s: StructType =>
            (name, "RECORD", mode) +: schemaFields(s, name)
          case ArrayType(el, _) => leaf(el, "REPEATED")
          case other =>
            Seq((name, other.typeName.toUpperCase, mode))
        }
      leaf(f.dataType, if (f.nullable) "NULLABLE" else "REQUIRED")
    }

  /** Collect per-shard results to the driver — InMemoryOutput analogue
    * (outputs/InMemoryOutput.java:21). For tests/small results only;
    * never in a 100 TB path. */
  def inMemory[T](ds: Dataset[T]): Seq[T] = ds.collect().toSeq

  /** Discard all records — NoOutput analogue. Forces full evaluation. */
  def none[T](ds: Dataset[T]): Unit = ds.foreach(_ => ())

  /** Route records to per-key directories — ShardingOutputWriter analogue
    * (outputs/ShardingOutputWriter.java:1-40): write.partitionBy is the
    * declarative form of "route to sub-writer by sharder(key)". */
  def shardedBy[T](ds: Dataset[T], path: String, cols: String*): Unit =
    ds.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Start a new file every N records — Item/SizeSegmentingOutputWriter
    * analogue (outputs/ItemSegmentingOutputWriter.java:15,
    * SizeSegmentingOutputWriter.java:12). */
  def segmented[T](ds: Dataset[T], path: String, maxRecordsPerFile: Long): Unit =
    ds.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile).parquet(path)

  /** Write a DataFrame partitioned into exactly n output shards on a key —
    * the HashingSharder fan-out analogue (MapReduceJob.java:138-143). */
  def hashSharded(df: DataFrame, path: String, shards: Int, keyCol: String): Unit =
    df.repartition(shards, df(keyCol)).write.mode(SaveMode.Overwrite).parquet(path)

  /** Save as a bucketed (+ optionally sorted) catalog table: the storage
    * form of the reference's hash-sharded intermediate files
    * (FilesByShard), but queryable — two tables bucketed on the same key
    * with the same bucket count join with NO exchange on either side
    * (asserted in OutputsSpec). At 100 TB this is how repeated joins on
    * a fact key amortize their shuffle to write time. */
  def bucketTable(df: DataFrame, table: String, buckets: Int,
      keyCol: String, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCol)
    (if (sorted) w.sortBy(keyCol) else w).saveAsTable(table)
  }
}
