package graft.sinks.v2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, Table, TableCatalog, TableCapability, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder => V2SortOrder}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min, Sum => V2Sum}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.{KeyedTable, VersionedKeyedTable}

/** The versioned store as a SPARK SQL CATALOG — register once:
  * {{{
  * spark.conf.set("spark.sql.catalog.graft",
  *   "graft.sinks.v2.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.graft.base", "/data/tables")
  * }}}
  * and every `VersionedKeyedTable` under the base directory is a SQL
  * identifier with the engine's OWN time-travel syntax:
  * {{{
  * SELECT * FROM graft.orders
  * SELECT * FROM graft.orders VERSION AS OF 3
  * SELECT * FROM graft.orders TIMESTAMP AS OF '2026-01-01 00:00:00'
  * }}}
  * `VERSION AS OF` resolves through `loadTable(ident, version)` and
  * `TIMESTAMP AS OF` through the commit-instant rule `versionAsOf`
  * uses — the same snapshots the programmatic API pins.
  *
  * Scans are DSv2 with BOTH pushdowns a planner needs:
  *  - filter pushdown prunes DATA FILES against the manifest's zone
  *    maps (typed images for the key column recorded in the meta
  *    sidecar's `key=` line, named maps for clusterBy'd columns,
  *    string envelopes in string order) BEFORE any partition is
  *    planned — every pushed filter is also RETAINED as a residual,
  *    so pruning can only skip files, never rows;
  *  - column pruning reaches the Group reader, which materializes
  *    only the requested fields.
  *
  * DML: `INSERT INTO cat.t ...` lands as ONE optimistic upsert
  * commit (put semantics — the table is keyed), `DELETE FROM cat.t
  * WHERE ...` as one delete commit with the doomed keys resolved
  * through the zone-map-pruned scan, and `TRUNCATE TABLE` as a
  * delete-all — so SQL writers get the same CDF capture, zone maps
  * and concurrency the programmatic API gives. DDL: `CREATE TABLE`
  * (layout from a bucket transform or TBLPROPERTIES — the key column
  * is mandatory), CTAS, `DROP TABLE` (refused on directories that
  * are not stores), `ALTER TABLE … ADD COLUMNS` (one additive
  * schema-evolution commit — metadata-only, existing rows read the
  * new columns as null), and `ALTER TABLE … SET/UNSET TBLPROPERTIES`
  * for `write.mode` (cow|mor DML regimen) and `constraint.*` (CHECK
  * constraints). RENAME and non-additive column changes are refused —
  * a table's layout (key column, buckets) is fixed at creation.
  *
  * The catalog is ALSO a FunctionCatalog serving the store's `bucket`
  * placement function — what lets a scan's KeyGroupedPartitioning
  * resolve, so co-bucketed store tables join WITHOUT a shuffle (see
  * [[GraftRowScan]] and [[GraftBucketUnbound]]).
  * (Reference analogue: the reference had no SQL surface at all;
  * this is the store meeting Spark's catalog contract so BI-style
  * SQL reaches the same snapshots.) */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {
  private var catName: String = _
  private var base: String = _

  /** The FUNCTION face: Catalyst loads `bucket` from the table's own
    * catalog when it resolves the `bucket(n, key)` transform a scan's
    * KeyGroupedPartitioning reports — serving it is what lets two
    * co-bucketed store tables join WITHOUT a shuffle (the
    * storage-partitioned join). */
  override def listFunctions(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(Array.empty, "bucket"))
    else Array.empty

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace().isEmpty && ident.name() == "bucket")
      new GraftBucketUnbound
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  /** The PROCEDURE face: `CALL cat.compact/cluster/cluster_by/vacuum`
    * — the store's maintenance operations from SQL (see
    * [[GraftProcedures]]). */
  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    if (namespace.isEmpty)
      GraftProcedures.All.map(Identifier.of(Array.empty, _)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    if (ident.namespace().isEmpty)
      GraftProcedures(base, ident.name())
    else throw new IllegalArgumentException(
      s"no such procedure $ident (available: " +
        GraftProcedures.All.mkString(", ") + ")")

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    base = Option(options.get("base")).getOrElse(
      throw new IllegalArgumentException(
        s"GraftCatalog '$name' requires spark.sql.catalog.$name.base"))
  }

  override def name(): String = catName

  private def spark = SparkSession.active

  private def dirOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(s"$base/", "/", "")

  override def tableExists(ident: Identifier): Boolean =
    KeyedTable.readMeta(spark, dirOf(ident)).isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val root = new org.apache.hadoop.fs.Path(
      (namespace.foldLeft(base)(_ + "/" + _)))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => KeyedTable.readMeta(spark,
        (namespace.foldLeft(base)(_ + "/" + _)) + "/" + n).isDefined)
      .map(n => Identifier.of(namespace, n))
  }

  private def load(ident: Identifier, version: Option[Long]): Table = {
    // `t$changes`: the table's change feed as a BATCH relation (the
    // Delta table_changes shape) — every captured change AFTER the
    // create commit, with `WHERE _commit_version ...` predicates
    // pruning whole change files. `VERSION AS OF v` bounds the feed
    // at v (endingVersion). SQL needs backticks for the `$`:
    // SELECT * FROM cat.`t$changes` WHERE _commit_version >= 2
    if (ident.name().endsWith("$changes")) {
      val baseName = ident.name().stripSuffix("$changes")
      val dir = (ident.namespace() :+ baseName)
        .mkString(s"$base/", "/", "")
      if (KeyedTable.readMeta(spark, dir).isEmpty)
        throw new NoSuchTableException(ident)
      val key = KeyedTable.readMetaKey(spark, dir).getOrElse(
        throw new UnsupportedOperationException(
          s"table $baseName records no key column — the change feed " +
            "needs the keyed contract"))
      return new CdfTable(dir, key, startingVersion = Some(1L),
        endingVersion = version)
    }
    // `t$history` / `t$files`: the commit log and the current
    // snapshot's file-level layout as driver-materialized relations
    // (metadata scale — they read the manifest, never data).
    // `VERSION AS OF v` bounds the history at v / pins the file
    // listing to v's snapshot.
    if (ident.name().endsWith("$history") ||
        ident.name().endsWith("$files") ||
        ident.name().endsWith("$deletes") ||
        ident.name().endsWith("$tags") ||
        ident.name().endsWith("$constraints") ||
        ident.name().endsWith("$ingest") ||
        ident.name().endsWith("$views")) {
      val isHistory = ident.name().endsWith("$history")
      val isDeletes = ident.name().endsWith("$deletes")
      val isTags = ident.name().endsWith("$tags")
      val isConstraints = ident.name().endsWith("$constraints")
      val isIngest = ident.name().endsWith("$ingest")
      val isViews = ident.name().endsWith("$views")
      val suffix =
        if (isHistory) "$history"
        else if (isDeletes) "$deletes"
        else if (isTags) "$tags"
        else if (isConstraints) "$constraints"
        else if (isIngest) "$ingest"
        else if (isViews) "$views" else "$files"
      val dir = (ident.namespace() :+ ident.name().stripSuffix(suffix))
        .mkString(s"$base/", "/", "")
      if (KeyedTable.readMeta(spark, dir).isEmpty)
        throw new NoSuchTableException(ident)
      def utf8(s: String) =
        org.apache.spark.unsafe.types.UTF8String.fromString(s)
      // `t$tags`: the table's live tags (name, version)
      if (isTags)
        return new GraftMetaTable(ident.toString,
          GraftCatalog.TagsSchema,
          () => VersionedKeyedTable.tags(SparkSession.active, dir)
            .toArray.sortBy(_._1).map { case (n, v) =>
              InternalRow(utf8(n), v)
            })
      // `t$constraints`: the live CHECK constraints (name, check_expr)
      if (isConstraints)
        return new GraftMetaTable(ident.toString,
          GraftCatalog.ConstraintsSchema,
          () => VersionedKeyedTable.constraints(SparkSession.active, dir)
            .toArray.sortBy(_._1).map { case (n, e) =>
              InternalRow(utf8(n), utf8(e))
            })
      // `t$views`: the registered incremental views (view name,
      // dimensions, durable watermark, freshness against the base's
      // CURRENT version) — the operator's one-look answer to "will
      // my rollup be served, and if not, what refresh is missing"
      if (isViews)
        return new GraftMetaTable(ident.toString,
          GraftCatalog.ViewsSchema,
          () => {
            val spark0 = SparkSession.active
            val baseV = VersionedKeyedTable.snapshot(spark0, dir).version
            val cut = dir.lastIndexOf('/')
            VersionedKeyedTable.properties(spark0, dir).toArray
              .collect { case (k, v) if k.startsWith("ivm.view.") => v }
              .flatMap(_.split('|') match {
                case Array(n, gc, vc) => Some((
                  java.net.URLDecoder.decode(n, "UTF-8"),
                  java.net.URLDecoder.decode(gc, "UTF-8"),
                  java.net.URLDecoder.decode(vc, "UTF-8")))
                case _ => None
              })
              .sortBy(_._1)
              .map { case (n, gc, vc) =>
                val wm =
                  try graft.sinks.IncrementalView.watermarkOf(spark0,
                    s"${dir.take(cut)}/$n",
                    VersionedKeyedTable.snapshot(spark0,
                      s"${dir.take(cut)}/$n"))
                  catch { case scala.util.control.NonFatal(_) => None }
                InternalRow(utf8(n), utf8(gc), utf8(vc),
                  wm.map(Long.box).orNull,
                  wm.contains(baseV))
              }
          })
      // `t$ingest`: the COPY INTO registry — every source-file
      // identity (relative path + length) already loaded
      if (isIngest)
        return new GraftMetaTable(ident.toString,
          GraftCatalog.IngestSchema,
          () => VersionedKeyedTable.ingestedFiles(SparkSession.active,
              dir).toArray.sorted.map { id =>
            val cut = id.lastIndexOf('|')
            val (rel, len) =
              if (cut < 0) (id, null)
              else (id.take(cut),
                id.drop(cut + 1).toLongOption.map(Long.box).orNull)
            InternalRow(utf8(rel), len)
          })
      // `t$deletes`: the snapshot's pending merge-on-read delete
      // files (bucket, file, doomed-row count) — empty once
      // compaction purges them
      if (isDeletes)
        return new GraftMetaTable(ident.toString,
          GraftCatalog.DeletesSchema,
          () => {
            val snap = VersionedKeyedTable.snapshot(
              SparkSession.active, dir, version)
            snap.deletes.toArray.sortBy(_._1).flatMap { case (b, fs) =>
              fs.sorted.map(f => InternalRow(b, utf8(f),
                snap.counts.get(f).map(Long.box).orNull))
            }
          })
      return if (isHistory)
        new GraftMetaTable(ident.toString, GraftCatalog.HistorySchema,
          () => {
            val rows = VersionedKeyedTable.history(
                SparkSession.active, dir).collect()
              .filter(r => version.forall(r.getLong(0) <= _))
            rows.map(r => InternalRow(r.getLong(0), r.getLong(1),
              r.getLong(2), r.getLong(3), r.getBoolean(4), r.getLong(5),
              r.getLong(6), utf8(r.getString(7))))
          })
      else
        new GraftMetaTable(ident.toString, GraftCatalog.FilesSchema,
          () => {
            val snap = VersionedKeyedTable.snapshot(
              SparkSession.active, dir, version)
            snap.files.toArray.sortBy(_._1).flatMap { case (b, fs) =>
              fs.sorted.map { f =>
                val (mn, mx) = snap.stats.get(f)
                  .map { case (a, c) => (utf8(a), utf8(c)) }
                  .getOrElse((null, null))
                InternalRow(b, utf8(f),
                  snap.counts.get(f).map(Long.box).orNull, mn, mx)
              }
            }
          })
    }
    val dir = dirOf(ident)
    if (KeyedTable.readMeta(spark, dir).isEmpty)
      throw new NoSuchTableException(ident)
    new GraftSqlTable(dir, ident.toString, version)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <v>` — a number pins that version; any other
    * string resolves as a TAG name on the table (immutable named
    * snapshots; `VERSION AS OF 'release-2026-08'`). Metadata-suffixed
    * identifiers (`t$changes`/`t$history`/`t$files`/`t$deletes`)
    * resolve the tag against the BASE table's log. */
  override def loadTable(ident: Identifier, version: String): Table =
    version.toLongOption match {
      case Some(v) => load(ident, Some(v))
      case None =>
        val resolveDir =
          Seq("$changes", "$history", "$files", "$deletes",
            "$tags", "$constraints", "$ingest", "$views")
            .find(ident.name().endsWith)
            .map(sfx =>
              (ident.namespace() :+ ident.name().stripSuffix(sfx))
                .mkString(s"$base/", "/", ""))
            .getOrElse(dirOf(ident))
        load(ident, Some(
          VersionedKeyedTable.tagVersion(spark, resolveDir, version)
            .getOrElse(throw new IllegalArgumentException(
              s"GraftCatalog: VERSION AS OF '$version' — not a " +
                s"version number and no such tag on $resolveDir"))))
    }

  /** `TIMESTAMP AS OF <ts>` (micros since epoch from Spark). For a
    * `t$changes` / `t$history` / `t$files` identifier the instant
    * resolves against the BASE table's commit log and bounds the
    * virtual relation there. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val resolveDir =
      Seq("$changes", "$history", "$files", "$deletes",
            "$tags", "$constraints", "$ingest", "$views")
        .find(ident.name().endsWith)
      .map(sfx => (ident.namespace() :+ ident.name().stripSuffix(sfx))
        .mkString(s"$base/", "/", ""))
      .getOrElse(dirOf(ident))
    load(ident, Some(VersionedKeyedTable.versionAsOf(
      spark, resolveDir, timestampMicros / 1000L)))
  }

  private def readOnly: Nothing = throw new UnsupportedOperationException(
    "GraftCatalog supports SQL reads, DML, CREATE TABLE/CTAS, DROP " +
      "TABLE, ALTER TABLE ADD COLUMNS and ALTER TABLE SET/UNSET " +
      "TBLPROPERTIES ('write.mode', 'constraint.*'); everything else " +
      "(RENAME, column drops/renames/retypes, repartitioning) is " +
      "refused — a table's layout (key column, buckets) is fixed at " +
      "creation and evolution is additive only")

  /** SQL DDL: `CREATE TABLE cat.t (…) PARTITIONED BY (bucket(8, k))`
    * — or with `TBLPROPERTIES ('key'='k', 'buckets'='8')` — creates
    * an EMPTY versioned table (meta sidecar + version-1 commit), and
    * CTAS rides the same path: Spark creates the table, then lands
    * the query's rows through the ordinary INSERT face (one upsert
    * commit), so a CTAS is exactly two commits with full CDF capture
    * from the first row on. The key column is MANDATORY (it is the
    * store's layout contract): named either by the single bucket
    * transform's column or by the `key` property. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val dir = dirOf(ident)
    if (KeyedTable.readMeta(spark, dir).isDefined)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident.toString)
    val props = properties
    val (bucketKey, bucketN): (Option[String], Option[Int]) =
      partitions.toSeq match {
        case Seq() => (None, None)
        case Seq(t) if t.name == "bucket" =>
          val n = t.arguments.collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              l.value.toString.toInt
          }
          val c = t.references.headOption
            .map(_.fieldNames().mkString("."))
          (c, n)
        case other => throw new UnsupportedOperationException(
          s"GraftCatalog tables are bucketed by ONE key column — " +
            s"PARTITIONED BY (bucket(n, key)) or TBLPROPERTIES " +
            s"('key'='…'); got ${other.mkString(", ")}")
      }
    val key = bucketKey.orElse(Option(props.get("key"))).getOrElse(
      throw new IllegalArgumentException(
        s"CREATE TABLE $ident needs its key column: PARTITIONED BY " +
          "(bucket(n, key)) or TBLPROPERTIES ('key'='<col>')"))
    require(schema.fieldNames.contains(key),
      s"key column '$key' is not in the schema " +
        s"(${schema.fieldNames.mkString(", ")})")
    val buckets = bucketN
      .orElse(Option(props.get("buckets")).map(_.toInt))
      .getOrElse(16)
    require(buckets > 0, s"buckets must be positive (got $buckets)")
    import scala.jdk.CollectionConverters._
    val constraintProps = props.asScala.toSeq.sortBy(_._1)
      .filter(_._1.startsWith("constraint."))
    // VALIDATE constraint predicates against the DECLARED schema
    // BEFORE anything is created: an unresolvable column or a
    // non-boolean predicate must fail the CREATE TABLE statement
    // cleanly — failing after the create would leave the table
    // durably behind, so the corrected retry hits "already exists"
    constraintProps.foreach { case (k, v) =>
      val probe = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .select(org.apache.spark.sql.functions.expr(v).as("c"))
      if (probe.schema.fields.head.dataType != BooleanType)
        throw new IllegalArgumentException(
          s"CREATE TABLE $ident: TBLPROPERTIES '$k' must be a BOOLEAN " +
            s"predicate over the declared schema, got " +
            s"${probe.schema.fields.head.dataType.simpleString}: $v")
    }
    val writeMode = Option(props.get("write.mode")).map(_.toLowerCase)
    writeMode.foreach(m => require(m == "cow" || m == "mor",
      s"CREATE TABLE $ident: TBLPROPERTIES 'write.mode' must be " +
        s"'cow' or 'mor' (got $m)"))
    VersionedKeyedTable.create(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      dir, key, buckets,
      commitMeta = Map("graft.sql.create" -> ident.toString))
    // registration after the create commit; any residual failure
    // (e.g. a claim race) tears the fresh table down so CREATE TABLE
    // is all-or-nothing
    try {
      // TBLPROPERTIES ('constraint.<name>' = '<predicate>') registers
      // CHECK constraints at creation — for CTAS they exist BEFORE the
      // query's rows land, so the very first insert is already enforced
      constraintProps.foreach { case (k, v) =>
        VersionedKeyedTable.addConstraint(spark, dir,
          k.stripPrefix("constraint."), v)
      }
      // TBLPROPERTIES ('write.mode'='mor'): SQL DML on this table
      // defers mutations as merge-on-read commits by default
      writeMode.foreach(
        VersionedKeyedTable.setProperty(spark, dir, "write.mode", _))
    } catch {
      case scala.util.control.NonFatal(t) =>
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true): Unit
        throw t
    }
    new GraftSqlTable(dir, ident.toString, None)
  }

  /** `DROP TABLE cat.t`: removes the table directory — but ONLY when
    * it actually holds a store (the meta sidecar is present); any
    * other directory is refused, so a mis-typed identifier can never
    * recursively delete arbitrary data. Returns false for a missing
    * table (Spark turns that into IF EXISTS semantics). */
  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (KeyedTable.readMeta(spark, dir).isEmpty) false
    else {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
  }

  /** `ALTER TABLE cat.t ADD COLUMNS (x BIGINT, …)`: each added column
    * is one ADDITIVE schema-evolution commit through
    * [[VersionedKeyedTable.addColumns]] — metadata-only, no data file
    * touched, existing rows read the new column as null (by-name
    * parquet resolution), the same evolution a wider programmatic
    * upsert performs implicitly. This is what lets a SQL-ONLY user
    * evolve a live table: Spark analyzes INSERT against the table
    * schema, so without ALTER the catalog's schema could never widen
    * ahead of the data. Also supported: `SET TBLPROPERTIES` /
    * `UNSET TBLPROPERTIES` for `write.mode` (cow|mor — the regimen
    * SQL DML writes under) and `constraint.<name>` (ADD/DROP a CHECK
    * constraint, the Delta ALTER TABLE ADD CONSTRAINT shape).
    * `ALTER TABLE cat.t DROP COLUMN x` maps to
    * [[VersionedKeyedTable.dropColumn]] — ONE metadata-only commit
    * narrowing the per-version schema (no data file touched; old
    * files keep the bytes until a rewrite), with the name TOMBSTONED
    * so no later ADD can resurrect stale values out of pre-drop
    * files. Refused for the key column, constraint-referenced
    * columns, and the last column. Everything else — renames,
    * retypes, repositioning, key changes — is refused: data files
    * are addressed by column NAME (no field-id/physical-name
    * indirection), so a rename would orphan every existing value;
    * ADD a new column and backfill instead. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (KeyedTable.readMeta(spark, dir).isEmpty)
      throw new NoSuchTableException(ident)
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    adds.foreach { a =>
      require(a.fieldNames().length == 1,
        s"ALTER TABLE $ident: only top-level columns can be added " +
          s"(got ${a.fieldNames().mkString(".")})")
      require(a.isNullable,
        s"ALTER TABLE $ident: added column '${a.fieldNames()(0)}' " +
          "must be nullable — existing rows have no value for it")
      require(a.position() == null,
        s"ALTER TABLE $ident: column position is not supported — " +
          "added columns append (additive evolution)")
    }
    if (adds.nonEmpty)
      VersionedKeyedTable.addColumns(spark, dir, adds.map(a =>
        StructField(a.fieldNames()(0), a.dataType(), nullable = true)))
    changes.foreach {
      case _: TableChange.AddColumn => () // handled above, one commit
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames().length == 1,
          s"ALTER TABLE $ident: only top-level columns can be " +
            s"dropped (got ${d.fieldNames().mkString(".")})")
        try VersionedKeyedTable.dropColumn(spark, dir, d.fieldNames()(0))
        catch {
          case e: IllegalArgumentException
              if d.ifExists() && e.getMessage != null &&
                e.getMessage.contains("no column") => ()
        }
      case r: TableChange.RenameColumn =>
        throw new UnsupportedOperationException(
          s"ALTER TABLE $ident RENAME COLUMN " +
            s"${r.fieldNames().mkString(".")}: data files are " +
            "addressed by column name (no field-id indirection), so " +
            "a rename would orphan every existing value — ADD a new " +
            "column and backfill, or rebuild the table")
      case sp: TableChange.SetProperty => sp.property() match {
        case p if p.startsWith("constraint.") =>
          VersionedKeyedTable.addConstraint(spark, dir,
            p.stripPrefix("constraint."), sp.value())
        case "write.mode" =>
          val m = sp.value().toLowerCase
          require(m == "cow" || m == "mor",
            s"ALTER TABLE $ident: 'write.mode' must be 'cow' or " +
              s"'mor' (got ${sp.value()})")
          VersionedKeyedTable.setProperty(spark, dir, "write.mode", m)
        case other => throw new UnsupportedOperationException(
          s"ALTER TABLE $ident SET TBLPROPERTIES: '$other' is not a " +
            "settable property (supported: write.mode, constraint.*)")
      }
      case rp: TableChange.RemoveProperty => rp.property() match {
        case p if p.startsWith("constraint.") =>
          VersionedKeyedTable.dropConstraint(spark, dir,
            p.stripPrefix("constraint.")): Unit
        case "write.mode" =>
          VersionedKeyedTable.removeProperty(spark, dir,
            "write.mode"): Unit
        case other => throw new UnsupportedOperationException(
          s"ALTER TABLE $ident UNSET TBLPROPERTIES: '$other' is not " +
            "a removable property (supported: write.mode, " +
            "constraint.*)")
      }
      case _ => readOnly
    }
    loadTable(ident)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly
}

class GraftSqlTable(dir: String, ident: String, version: Option[Long])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  /** `_file`: the data file a row lives in — queryable like
    * Delta/Iceberg's file metadata column, and the metadata attribute
    * the row-level operations REQUIRE (Spark only applies its
    * data/metadata write projections — stripping the internal
    * `__row_operation` marker — when the operation declares one). */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name: String = "_file"
      override def dataType: org.apache.spark.sql.types.DataType =
        StringType
      override def isNullable: Boolean = false
      override def comment: String =
        "relative path of the data file holding the row"
    })
  private def spark = SparkSession.active
  private val snap = VersionedKeyedTable.snapshot(spark, dir, version)
  private val numBuckets: Int = KeyedTable.readMeta(spark, dir).get._1
  private val keyCol: Option[String] = KeyedTable.readMetaKey(spark, dir)
  /** The KEY column reports NON-NULLABLE — the keyed contract (the
    * key is the row's identity; every write surface drops or refuses
    * null keys), and what lets the delta row-level rewrite accept it
    * as the row id. Under ANSI store assignment an INSERT of a null
    * key fails at runtime instead of writing an unaddressable row. */
  private val tableSchema: StructType = {
    val raw = snap.schema.getOrElse(KeyedTable.readMeta(spark, dir).get._2)
    StructType(raw.fields.map(f =>
      if (keyCol.contains(f.name)) f.copy(nullable = false) else f))
  }

  /** The table's persistent write regimen (`write.mode` property):
    * `mor` defers SQL DML as merge-on-read commits (delete files /
    * appends — O(batch) writes, the continuous-ingest and
    * GDPR-erasure shape), `cow` (default) rewrites buckets
    * copy-on-write (the right cost for dense mutations). The session
    * confs `spark.graft.delete.mode` / `spark.graft.insert.mode`
    * override per session. */
  private val tableWriteMor: Boolean =
    VersionedKeyedTable.property(spark, dir, "write.mode")
      .exists(_.equalsIgnoreCase("mor"))

  private def morFor(sessionConf: String): Boolean =
    spark.conf.getOption(sessionConf) match {
      case Some(m) => m.equalsIgnoreCase("mor")
      case None => tableWriteMor
    }

  override def name: String = ident + version.fold("")(v => s"@v$v")
  override def schema: StructType = tableSchema

  /** The store's physical layout, declared: `bucket(n, key)`. What
    * DESCRIBE shows — and the contract the scan's
    * KeyGroupedPartitioning report is grounded in. */
  override def partitioning(): Array[Transform] =
    keyCol.toArray.map(k =>
      org.apache.spark.sql.connector.expressions.Expressions
        .bucket(numBuckets, k))

  /** What `DESCRIBE TABLE EXTENDED` / `SHOW TBLPROPERTIES` surface:
    * the layout contract and the pinned snapshot's coordinates. */
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    keyCol.foreach(m.put("key", _))
    m.put("buckets", numBuckets.toString)
    m.put("version", snap.version.toString)
    m.put("data_files", snap.files.valuesIterator.map(_.size).sum.toString)
    m.put("delete_files",
      snap.deletes.valuesIterator.map(_.size).sum.toString)
    // live CHECK constraints, Delta-style `constraint.<name>` keys
    VersionedKeyedTable.constraints(spark, dir).toSeq.sortBy(_._1)
      .foreach { case (n, e) => m.put(s"constraint.$n", e) }
    // persistent table properties (write.mode and future knobs)
    VersionedKeyedTable.properties(spark, dir).toSeq.sortBy(_._1)
      .foreach { case (k, v) => m.put(k, v) }
    m
  }
  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_DYNAMIC)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(dir, snap, tableSchema, keyCol, Some(numBuckets),
      scanOptions = options, timeTravel = version.isDefined)

  /** `DELETE FROM cat.t WHERE ...` (and `TRUNCATE TABLE` through the
    * SupportsDelete default, which deletes with an always-true
    * filter): the doomed KEYS are computed through the zone-map-pruned
    * Catalyst table path — a key-ranged DELETE plans only covering
    * files — and removed in ONE optimistic delete commit, CDF-captured
    * like every mutation. Conditions must be expressible as source
    * filters (`canDeleteWhere` declines the rest, so Spark errors
    * loudly instead of half-deleting); arbitrary-expression DELETEs
    * route through the programmatic API. */
  private def filterColumn(f: org.apache.spark.sql.sources.Filter)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{col, lit, not}
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo(a, v) => Some(col(a) === lit(v))
      case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
      case GreaterThan(a, v) => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v) => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
      case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
      case IsNull(a) => Some(col(a).isNull)
      case IsNotNull(a) => Some(col(a).isNotNull)
      case StringStartsWith(a, p) => Some(col(a).startsWith(p))
      case StringEndsWith(a, p) => Some(col(a).endsWith(p))
      case StringContains(a, p) => Some(col(a).contains(p))
      case And(l, r) =>
        for (lc <- filterColumn(l); rc <- filterColumn(r)) yield lc && rc
      case Or(l, r) =>
        for (lc <- filterColumn(l); rc <- filterColumn(r)) yield lc || rc
      case Not(c) => filterColumn(c).map(not)
      case AlwaysTrue() => Some(lit(true))
      case AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }

  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    version.isEmpty && keyCol.isDefined &&
      filters.forall(f => filterColumn(f).isDefined)

  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    if (version.isDefined) throw new UnsupportedOperationException(
      s"cannot DELETE FROM a time-travel snapshot of $ident")
    val key = keyCol.getOrElse(throw new UnsupportedOperationException(
      s"table $ident records no key column — DELETE needs it"))
    val cond = filters.flatMap(filterColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    // doomed keys resolve through the pruned table path: a
    // key/stat-ranged DELETE reads only covering files
    val doomed = VersionedKeyedTable.table(spark, dir, key)
      .where(cond)
      .select(org.apache.spark.sql.functions.col(key))
    // merge-on-read routing: the table property `write.mode=mor`
    // (or the session conf spark.graft.delete.mode=mor, which
    // overrides either way) defers the delete as per-bucket delete
    // files — no bucket rewrite, O(doomed keys) bytes (the Delta
    // deletion-vectors / Iceberg equality-delete shape: a surgical
    // `DELETE WHERE k IN (…)` on a 100 TB table writes kilobytes).
    // TRUNCATE-shaped deletes (an always-true filter) stay
    // copy-on-write regardless: a delete file holding EVERY key is
    // strictly worse than the one-commit delete-all.
    val truncateShaped = filters.isEmpty ||
      filters.exists(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
    if (morFor("spark.graft.delete.mode") && !truncateShaped)
      VersionedKeyedTable.deleteMor(spark, dir, doomed, key,
        commitMeta = Map("graft.sql.delete" -> "mor"))
    else VersionedKeyedTable.delete(spark, dir, doomed, key)
  }

  /** SQL DML: `INSERT INTO cat.t ...` lands as ONE optimistic upsert
    * commit — and because the table is KEYED, the insert carries the
    * store's put contract (replace-by-key), exactly what the
    * programmatic `upsert` does; the Delta answer would be MERGE, but
    * a keyed store has only puts. Executors stage parquet under
    * `_staging/` (the [[VersionedTableSink]] mechanics), the driver's
    * commit applies them as one upsert stamped with
    * `graft.sql.insert = <queryId>` in commit metadata. Time-travel
    * identifiers refuse writes (history is immutable), and
    * `INSERT OVERWRITE` is unsupported by construction (no
    * SupportsTruncate/SupportsOverwrite face — replacing a table is a
    * create, not DML). */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    if (version.isDefined) throw new UnsupportedOperationException(
      s"cannot INSERT INTO a time-travel snapshot of $ident — " +
        "versions are immutable; write to the current table")
    val key = keyCol.getOrElse(throw new UnsupportedOperationException(
      s"table $ident records no key column in its meta sidecar — " +
        "SQL INSERT needs the key to upsert by"))
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate
        with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
      private var overwrite = false
      // INSERT OVERWRITE: Spark expresses "replace the whole table"
      // as truncate + append on one builder — we land it as ONE
      // atomic replaceAll commit, never a visible empty state
      override def truncate()
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        overwrite = true; this
      }
      // under partitionOverwriteMode=dynamic Spark plans
      // OverwritePartitionsDynamic instead; on an UNPARTITIONED keyed
      // table "the partitions present in the data" is the whole
      // table, so dynamic degenerates to the same full replace (the
      // Hive unpartitioned-table behavior)
      override def overwriteDynamicPartitions()
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        overwrite = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch
              : org.apache.spark.sql.connector.write.BatchWrite = {
            require(info.schema().fieldNames.contains(key),
              s"INSERT schema must carry the key column '$key' (got " +
                s"${info.schema().fieldNames.mkString(", ")})")
            if (overwrite)
              new GraftReplaceBatchWrite(dir, key, info.queryId(),
                info.schema(), expectedVersion = None,
                stampKey = "graft.sql.overwrite")
            else
              new GraftSqlBatchWrite(dir, key, info.queryId(),
                info.schema(), morDefault = tableWriteMor)
          }
        }
    }
  }

  /** SQL UPDATE / MERGE INTO / expression-DELETE, as GROUP-BASED
    * (copy-on-write) row-level operations with the WHOLE TABLE as the
    * group: Spark's rewrite rules compute the table's full new
    * content (unmatched rows pass through, matched rows update or
    * drop, unmatched source rows insert) and the write REPLACES the
    * content in one commit, pinned to the snapshot the rewrite READ —
    * an intervening commit fails the statement with the standard
    * serializable-conflict error instead of silently dropping the
    * racer's writes. Filter-expressible DELETEs never reach this
    * path (Spark's OptimizeMetadataOnlyDeleteFromTable routes them to
    * [[deleteWhere]]'s O(matching buckets) commit). At 100 TB the
    * whole-table rewrite is the coarse mode by design — surgical
    * key-level mutations route through the store's own
    * upsert/delete/merge, which rewrite only touched buckets; SQL
    * UPDATE/MERGE is the declarative face for the batch-refresh
    * shapes that rewrite most rows anyway. */
  /** Row-level SQL rides ONE of two regimens, per the table's
    * `write.mode` property (session conf
    * `spark.graft.rowlevel.mode` overrides): copy-on-write
    * (group-based ReplaceData — the default; see
    * [[GraftRowLevelOperation]]) or MERGE-ON-READ (delta-based
    * WriteDelta via [[GraftDeltaRowLevelOperation]]): a surgical SQL
    * UPDATE/MERGE/DELETE on an opted-in table writes O(matched rows)
    * — appended data files plus equality-delete entries in one commit
    * — instead of rewriting every file its scan read. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    if (version.isDefined) throw new UnsupportedOperationException(
      s"cannot UPDATE/MERGE/DELETE a time-travel snapshot of $ident — " +
        "versions are immutable; write to the current table")
    val key = keyCol.getOrElse(throw new UnsupportedOperationException(
      s"table $ident records no key column — row-level SQL needs it"))
    new org.apache.spark.sql.connector.write.RowLevelOperationBuilder {
      override def build()
          : org.apache.spark.sql.connector.write.RowLevelOperation =
        if (morFor("spark.graft.rowlevel.mode"))
          new GraftDeltaRowLevelOperation(dir, key, snap, tableSchema,
            info.command)
        else
          new GraftRowLevelOperation(dir, key, snap, tableSchema,
            info.command)
    }
  }
}

object GraftCatalog {
  /** `t$history` — one row per complete commit (metadata scale). */
  val HistorySchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("committed_at_ms", LongType, nullable = false),
    StructField("n_touched_buckets", LongType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("captured_changes", BooleanType, nullable = false),
    StructField("n_change_files", LongType, nullable = false),
    StructField("base_version", LongType, nullable = false),
    StructField("meta_keys", StringType, nullable = false)))

  /** `t$files` — the snapshot's data files with their manifest stats
    * (rows / key envelope nullable: pre-stats commits lack them). */
  val FilesSchema: StructType = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("rows", LongType, nullable = true),
    StructField("key_min", StringType, nullable = true),
    StructField("key_max", StringType, nullable = true)))

  /** `t$deletes` — the snapshot's pending merge-on-read delete files
    * (each `rows` doomed keys; empty after compaction purges). */
  val DeletesSchema: StructType = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("rows", LongType, nullable = true)))

  /** `t$tags` — the table's live tags (immutable named snapshots). */
  val TagsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("version", LongType, nullable = false)))

  /** `t$constraints` — the live CHECK constraints. */
  val ConstraintsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("check_expr", StringType, nullable = false)))

  /** `t$ingest` — the COPY INTO registry (loaded source files). */
  val IngestSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("length", LongType, nullable = true)))

  val ViewsSchema: StructType = StructType(Seq(
    StructField("view", StringType, nullable = false),
    StructField("group_col", StringType, nullable = false),
    StructField("value_col", StringType, nullable = false),
    StructField("watermark", LongType, nullable = true),
    StructField("fresh", BooleanType, nullable = false)))
}

/** A driver-materialized metadata relation (`t$history` / `t$files`):
  * a [[org.apache.spark.sql.connector.read.LocalScan]] computed from
  * the manifest at scan time — Spark plans it as a LocalTableScan,
  * no executor tasks, no data files touched. */
class GraftMetaTable(ident: String, schema0: StructType,
    compute: () => Array[InternalRow])
    extends Table with SupportsRead {
  override def name: String = ident
  override def schema: StructType = schema0
  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan =
      new org.apache.spark.sql.connector.read.LocalScan {
        override def rows(): Array[InternalRow] = compute()
        override def readSchema(): StructType = schema0
      }
  }
}

/** One SQL UPDATE/MERGE/DELETE as scan + GROUP replace: the scan
  * reads the PINNED snapshot's matching files (zone-map pruning on
  * the statement's condition narrows the set — a key-ranged UPDATE
  * rewrites only covering files), the write lands
  * [[VersionedKeyedTable.replaceFiles]] over EXACTLY the files the
  * scan planned, with `expectedVersion` = that snapshot — read and
  * replace are one serializable unit, and unread files' rows are
  * untouched by construction (replacing more than was read would
  * silently drop them). */
class GraftRowLevelOperation(dir: String, keyCol: String,
    snap: VersionedKeyedTable.Snapshot, tableSchema: StructType,
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command)
    extends org.apache.spark.sql.connector.write.RowLevelOperation {

  /** The data files the CoW scan planned — set at scan build (driver,
    * during planning), consumed by the write's commit. */
  @volatile private var plannedFiles: Seq[String] = _

  override def command
      : org.apache.spark.sql.connector.write.RowLevelOperation.Command =
    cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new GraftScanBuilder(dir, snap, tableSchema, Some(keyCol),
      onRowLevelPlan = fs => plannedFiles = fs)

  /** Spark applies its ReplaceData row projections (which strip the
    * internal `__row_operation` marker before the connector's writer)
    * only when the operation declares metadata attributes — `_file`
    * is ours, served by the scan as a per-partition virtual column. */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("_file"))

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch
              : org.apache.spark.sql.connector.write.BatchWrite =
            new GraftReplaceBatchWrite(dir, keyCol, info.queryId(),
              info.schema(), expectedVersion = Some(snap.version),
              stampKey = "graft.sql." + cmd.toString.toLowerCase,
              replaceOnly = Some(() => {
                val fs = plannedFiles
                if (fs == null) throw new IllegalStateException(
                  "row-level write committed before its CoW scan was " +
                    "planned — no file set to replace")
                fs
              }))
        }
    }
}

/** One SQL UPDATE/MERGE/DELETE as a DELTA-BASED row-level operation
  * (`SupportsDelta` — the Iceberg merge-on-read DML shape): instead
  * of the group-based read-files/replace-files cycle, Spark's rewrite
  * emits PER-ROW operations — with `representUpdateAsDeleteAndInsert`
  * every update arrives as a delete of the old row id plus an insert
  * of the new image — and the write lands them through
  * [[VersionedKeyedTable.mutateMor]] as ONE commit: appended,
  * sequence-stamped data files for the inserts plus equality-delete
  * files for the doomed keys. The row id IS the key column (the
  * store's identity), so no synthetic row lineage is needed.
  *
  * The 100 TB point: the scan prunes FREELY (no file set to pin — the
  * group-based CoW read must replace exactly what it reads, and under
  * pending deletes even un-prunes; this one doesn't), and the write
  * is O(matched rows) bytes — a surgical `UPDATE … WHERE k IN (…)` on
  * a TB-scale bucket writes kilobytes where CoW rewrites every
  * covering file. Serializable like the group path: the commit is
  * pinned to the snapshot the rewrite read (`expectedVersion`), and
  * any intervening commit fails the statement loudly. */
class GraftDeltaRowLevelOperation(dir: String, keyCol: String,
    snap: VersionedKeyedTable.Snapshot, tableSchema: StructType,
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command)
    extends org.apache.spark.sql.connector.write.RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta {

  override def command
      : org.apache.spark.sql.connector.write.RowLevelOperation.Command =
    cmd

  /** An ORDINARY pruned scan — no row-level pinning: the delta write
    * replaces nothing, so the scan may skip every file the statement's
    * predicates exclude (and keeps pruning under pending MoR state). */
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new GraftScanBuilder(dir, snap, tableSchema, Some(keyCol))

  override def rowId()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(keyCol))

  /** Updates split into delete + insert: the writer then needs only
    * two verbs, and a key-reassigning UPDATE (new id ≠ old id) is
    * correct by construction — the old key's delete entry and the new
    * key's row land in the same commit. */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array.empty

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriteBuilder =
    new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
      override def build()
          : org.apache.spark.sql.connector.write.DeltaWrite =
        new org.apache.spark.sql.connector.write.DeltaWrite {
          override def toBatch
              : org.apache.spark.sql.connector.write.DeltaBatchWrite =
            new GraftDeltaBatchWrite(dir, keyCol, info.queryId(),
              // MERGE's WriteDelta hands an EMPTY LogicalWriteInfo
              // schema (its row projection is plan-side); the rows
              // always arrive in the TABLE's column order
              if (info.schema().isEmpty) tableSchema else info.schema(),
              StructType(Seq(tableSchema(keyCol))),
              expectedVersion = Some(snap.version),
              stampKey = "graft.sql." + cmd.toString.toLowerCase)
        }
    }
}

/** Per-task staged pair of a delta write: the task's inserted rows
  * and its doomed row ids, each one parquet file. */
case class GraftDeltaStagedMessage(insPath: String, insRows: Long,
    delPath: String, delRows: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

/** The delta batch write: executors stage (inserts, doomed ids) pairs,
  * the driver commit lands BOTH through ONE
  * [[VersionedKeyedTable.mutateMor]] commit pinned to the statement's
  * snapshot. An empty delta (no row matched) commits nothing. */
class GraftDeltaBatchWrite(dir: String, keyCol: String, queryId: String,
    rowSchema: StructType, keySchema: StructType,
    expectedVersion: Option[Long], stampKey: String)
    extends org.apache.spark.sql.connector.write.DeltaBatchWrite {
  private def spark = SparkSession.active

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriterFactory =
    new GraftDeltaWriterFactory(dir, rowSchema, keySchema,
      SerializableHadoopConf.fromSession(spark))

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val ms = messages.collect { case m: GraftDeltaStagedMessage => m }
    try {
      val ins = ms.collect { case m if m.insRows > 0 => m.insPath }
      val del = ms.collect { case m if m.delRows > 0 => m.delPath }
      if (ins.isEmpty && del.isEmpty) return // nothing matched
      val puts =
        if (ins.isEmpty) spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          rowSchema)
        else VersionedKeyedTable.scanPaths(spark, dir, rowSchema,
          ins.toIndexedSeq)
      val doomed =
        if (del.isEmpty) None
        else Some(VersionedKeyedTable.scanPaths(spark, dir, keySchema,
          del.toIndexedSeq))
      VersionedKeyedTable.mutateMor(spark, dir, puts, doomed, keyCol,
        commitMeta = Map(stampKey -> queryId),
        expectedVersion = expectedVersion)
    } finally cleanup(ms)
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit =
    cleanup(messages.collect { case m: GraftDeltaStagedMessage => m })

  private def cleanup(ms: Array[GraftDeltaStagedMessage]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ms.foreach { m =>
      fs.delete(new org.apache.hadoop.fs.Path(m.insPath), false): Unit
      fs.delete(new org.apache.hadoop.fs.Path(m.delPath), false): Unit
    }
  }
}

class GraftDeltaWriterFactory(dir: String, rowSchema: StructType,
    keySchema: StructType, conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {
      private def path(kind: String) =
        s"$dir/_staging/delta-$kind-p$partitionId-t$taskId-" +
          s"${java.util.UUID.randomUUID()}.parquet"
      private val ins =
        new StagingParquetWriter(path("ins"), rowSchema, Some(conf))
      private val dels =
        new StagingParquetWriter(path("del"), keySchema, Some(conf))

      override def delete(meta: InternalRow, id: InternalRow): Unit =
        dels.write(id)
      // unreachable under representUpdateAsDeleteAndInsert, kept as
      // the faithful fallback
      override def update(meta: InternalRow, id: InternalRow,
          row: InternalRow): Unit = { dels.write(id); ins.write(row) }
      override def insert(row: InternalRow): Unit = ins.write(row)

      override def commit()
          : org.apache.spark.sql.connector.write.WriterCommitMessage = {
        val a = ins.commit().asInstanceOf[StagedFileMessage]
        val b = dels.commit().asInstanceOf[StagedFileMessage]
        GraftDeltaStagedMessage(a.path, a.rows, b.path, b.rows)
      }
      override def abort(): Unit = { ins.abort(); dels.abort() }
      override def close(): Unit = { ins.close(); dels.close() }
    }
}

/** Replace batch write: tasks stage parquet on executors, the driver
  * commit is ONE replace — the WHOLE table
  * ([[VersionedKeyedTable.replaceAll]], the INSERT OVERWRITE face) or,
  * with `replaceOnly`, EXACTLY the files the row-level CoW scan
  * planned ([[VersionedKeyedTable.replaceFiles]] — the group-based
  * contract: ReplaceData's output carries only the READ files' rows,
  * so replacing more would drop unread rows). CDF-captured, optionally
  * pinned to an expected snapshot version. An empty staged set is a
  * LEGITIMATE replacement (a DELETE that matched everything the scan
  * read). */
class GraftReplaceBatchWrite(dir: String, keyCol: String,
    queryId: String, schema: StructType, expectedVersion: Option[Long],
    stampKey: String,
    replaceOnly: Option[() => Seq[String]] = None)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  private def spark = SparkSession.active

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new GraftSqlWriterFactory(dir, schema,
      SerializableHadoopConf.fromSession(spark))

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val staged = messages.collect {
      case StagedFileMessage(p, n) if n > 0 => p
    }
    try {
      val rows =
        if (staged.isEmpty) spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else VersionedKeyedTable.scanPaths(spark, dir, schema,
          staged.toIndexedSeq)
      replaceOnly match {
        case Some(filesOf) =>
          VersionedKeyedTable.replaceFiles(spark, dir, filesOf(), rows,
            keyCol, expectedVersion = expectedVersion,
            commitMeta = Map(stampKey -> queryId))
        case None =>
          VersionedKeyedTable.replaceAll(spark, dir, rows, keyCol,
            commitMeta = Map(stampKey -> queryId),
            expectedVersion = expectedVersion)
      }
    } finally StagedFileMessage.cleanup(spark, dir, messages)
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = StagedFileMessage.cleanup(spark, dir, messages)
}

/** One SQL INSERT as one upsert commit: tasks stage parquet on the
  * executors (no driver funnel), the driver commit reads the staged
  * files as a DataFrame and runs the store's own optimistic upsert —
  * concurrency, CDF capture, zone maps and blooms all come from the
  * commit path SQL now shares with the programmatic API. */
class GraftSqlBatchWrite(dir: String, keyCol: String, queryId: String,
    schema: StructType,
    /** true when the table's `write.mode=mor` property routes inserts
      * merge-on-read by default (session conf still overrides). */
    morDefault: Boolean = false)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  private def spark = SparkSession.active

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new GraftSqlWriterFactory(dir, schema,
      SerializableHadoopConf.fromSession(spark))

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = {
    val staged = messages.collect {
      case StagedFileMessage(p, n) if n > 0 => p
    }
    try {
      if (staged.isEmpty) return // INSERT of zero rows: no commit
      val rows = VersionedKeyedTable.scanPaths(spark, dir, schema,
        staged.toIndexedSeq)
      // merge-on-read routing (the table's write.mode=mor property,
      // or spark.graft.insert.mode overriding per session): the put
      // defers as appended data files + a sequence-stamped delete (no
      // bucket rewrite — the continuous-ingest SQL face; compact()
      // folds the backlog); default is the copy-on-write upsert
      val mor = spark.conf.getOption("spark.graft.insert.mode") match {
        case Some(m) => m.equalsIgnoreCase("mor")
        case None => morDefault
      }
      if (mor)
        VersionedKeyedTable.upsertMor(spark, dir, rows, keyCol,
          commitMeta = Map("graft.sql.insert" -> queryId))
      else VersionedKeyedTable.upsert(spark, dir, rows, keyCol,
        commitMeta = Map("graft.sql.insert" -> queryId))
    } finally StagedFileMessage.cleanup(spark, dir, messages)
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage])
      : Unit = StagedFileMessage.cleanup(spark, dir, messages)
}

class GraftSqlWriterFactory(dir: String, schema: StructType,
    conf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new StagingParquetWriter(
      s"$dir/_staging/sql-p$partitionId-t$taskId-" +
        s"${java.util.UUID.randomUUID()}.parquet", schema, Some(conf))
}

class GraftScanBuilder(dir: String,
    snap: VersionedKeyedTable.Snapshot, tableSchema: StructType,
    keyCol: Option[String], numBuckets: Option[Int] = None,
    /** Row-level operations pass this to learn which files their CoW
      * scan planned — the exact set the group-based write must then
      * replace (see [[VersionedKeyedTable.replaceFiles]]). */
    onRowLevelPlan: Seq[String] => Unit = null,
    /** Reader options (`readStream.option(...)`) — consumed by the
      * streaming tail (startingVersion / maxVersionsPerTrigger /
      * ignoreDeletes); batch scans ignore them. */
    scanOptions: CaseInsensitiveStringMap =
      CaseInsensitiveStringMap.empty(),
    /** A pinned `VERSION/TIMESTAMP AS OF` snapshot refuses streaming
      * (history is immutable — there is nothing to tail). */
    timeTravel: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {

  private var accepted: Array[Filter] = Array.empty
  private var sawFilters = false
  private var required: StructType = tableSchema
  private var aggRow: Option[(StructType, Seq[Any])] = None
  private var pushedLimit: Option[Int] = None
  private var pushedTopN: Option[(Boolean, Int)] = None

  private def longImage(v: Any): Option[Long] =
    GraftScanBuilder.longImage(v)

  private def numericCol(name: String): Boolean =
    tableSchema.fields.find(_.name == name)
      .exists(f => VersionedKeyedTable.hasNumericImage(f.dataType))
  private def stringCol(name: String): Boolean =
    tableSchema.fields.find(_.name == name)
      .exists(_.dataType == StringType)

  /** A filter participates in pruning when it constrains a column we
    * hold stats for, in a shape the zone maps can answer. */
  private def prunable(f: Filter): Boolean = f match {
    case EqualTo(a, v) => bound(a, v).isDefined
    case GreaterThan(a, v) => bound(a, v).isDefined
    case GreaterThanOrEqual(a, v) => bound(a, v).isDefined
    case LessThan(a, v) => bound(a, v).isDefined
    case LessThanOrEqual(a, v) => bound(a, v).isDefined
    case In(a, vs) => vs.nonEmpty && vs.forall(v => bound(a, v).isDefined)
    case _ => false
  }

  private def bound(col: String, v: Any): Option[Either[Long, String]] =
    if (numericCol(col)) longImage(v).map(Left(_))
    else if (stringCol(col)) v match {
      case s: String => Some(Right(s))
      case _ => None
    }
    else None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    sawFilters = filters.nonEmpty
    accepted = filters.filter(prunable)
    filters // every filter stays a residual: pruning skips files, not rows
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- LIMIT / ORDER-BY-KEY TOP-N: FILE-PREFIX PLANNING -------------
  // Pushed limits never answer rows here — they bound which FILES the
  // scan plans. `isPartiallyPushed` stays true, so Spark always
  // re-applies its own row-level limit/sort on top; truncation is
  // therefore pure I/O avoidance and can only ever be conservative.
  // `SELECT * FROM t LIMIT n`: the manifest's exact per-file row
  // counts pick the shortest file prefix covering n rows — at 100 TB a
  // peek query plans ~1 file instead of the fleet-wide scan. `ORDER BY
  // key LIMIT n`: the n-th extreme value is bounded by folding the
  // zone maps (sort files by max ascending, accumulate counts to n —
  // at least n rows sit at or below that boundary), then every file
  // whose envelope lies strictly beyond the bound is skipped; on a
  // cluster()ed table that is the few files covering the extreme key
  // interval. Both decline under pending merge-on-read deletes (counts
  // overstate live rows, envelopes may be dead) and never drop a file
  // without stats — the same conservatism as every other pruning path.

  override def pushLimit(limit: Int): Boolean = {
    if (limit <= 0) return false
    pushedLimit = Some(limit)
    true
  }

  /** Spark must keep its own limit (and sort) — see above. */
  override def isPartiallyPushed(): Boolean = true

  override def pushTopN(orders: Array[V2SortOrder], limit: Int): Boolean =
    orders match {
      case Array(o) if limit > 0 && keyCol.isDefined =>
        val onKey = o.expression() match {
          case nr: NamedReference =>
            nr.fieldNames.length == 1 && nr.fieldNames()(0) == keyCol.get
          case _ => false
        }
        // null ordering is irrelevant: the store enforces the
        // no-null-key invariant on every write surface
        if (onKey) {
          pushedTopN =
            Some((o.direction() == SortDirection.ASCENDING, limit))
          true
        } else false
      case _ => false
    }

  /** The shortest manifest-ordered file prefix whose exact row counts
    * cover `n` — or the input unchanged when any count is missing. */
  private def limitPrefix(kept: Seq[String], n: Int): Seq[String] = {
    if (!kept.forall(snap.counts.contains)) return kept
    val pos = snap.files.toSeq.sortBy(_._1).flatMap(_._2)
      .zipWithIndex.toMap
    val ordered = kept.sortBy(f => pos.getOrElse(f, Int.MaxValue))
    val out = Seq.newBuilder[String]
    var acc = 0L
    val it = ordered.iterator
    while (acc < n && it.hasNext) {
      val f = it.next()
      out += f
      acc += math.max(0L, snap.counts(f))
    }
    out.result()
  }

  /** Zone-map top-N pruning on the key (see the section comment):
    * keeps every file whose envelope can reach the n-extreme bound,
    * plus every file without a parseable envelope or count. */
  private def topNKeep(kept: Seq[String], asc: Boolean, n: Int)
      : Seq[String] = {
    val k = keyCol.get
    val isNum = numericCol(k)
    if (!isNum && !stringCol(k)) return kept
    val utf8 = VersionedKeyedTable.Utf8Ord
    def img(f: String)
        : Option[(Either[Long, String], Either[Long, String])] =
      snap.stats.get(f).flatMap { case (mn, mx) =>
        if (isNum)
          for (a <- mn.toLongOption; b <- mx.toLongOption)
            yield (Left(a), Left(b))
        else Some((Right(mn), Right(mx)))
      }
    def le(a: Either[Long, String], b: Either[Long, String]): Boolean =
      (a, b) match {
        case (Left(x), Left(y)) => x <= y
        case (Right(x), Right(y)) => utf8.lteq(x, y)
        case _ => true // mixed images never happen for one column
      }
    val withMeta = kept.map(f => (f, img(f), snap.counts.get(f)))
    val measurable = withMeta.collect {
      case (f, Some(iv), Some(c)) if c > 0 => (f, iv, c)
    }
    // fold toward the extreme: ascending accumulates files by MAX
    // ascending (their every row is <= the running boundary);
    // descending mirrors with MIN descending
    val folded =
      if (asc) measurable.sortWith((x, y) => le(x._2._2, y._2._2))
      else measurable.sortWith((x, y) => le(y._2._1, x._2._1))
    var acc = 0L
    var bound: Option[Either[Long, String]] = None
    val it = folded.iterator
    while (acc < n && it.hasNext) {
      val (_, iv, c) = it.next()
      acc += c
      bound = Some(if (asc) iv._2 else iv._1)
    }
    if (acc < n) kept // not enough measurable rows to bound the n-th
    else {
      val b = bound.get
      withMeta.filter {
        case (_, Some(iv), Some(_)) =>
          if (asc) le(iv._1, b) else le(b, iv._2)
        case _ => true // unmeasurable files are never dropped
      }.map(_._1)
    }
  }

  // ---- METADATA-ONLY AGGREGATES ------------------------------------
  // COUNT(*) is the manifest's row-count sum and MIN/MAX of a
  // stats-covered column is the fold of its per-file envelopes — the
  // Delta/Iceberg "answer the aggregate from statistics" fast path,
  // COMPLETE pushdown only (no grouping, no filters, every referenced
  // file carrying the needed stat); anything else declines and the
  // ordinary scan runs. Zero data files open on the fast path — the
  // agg scan plans zero partitions' worth of reads.

  private def singleCol(
      children: Array[org.apache.spark.sql.connector.expressions.Expression])
      : Option[String] = children match {
    case Array(nr: NamedReference) if nr.fieldNames.length == 1 =>
      Some(nr.fieldNames()(0))
    case _ => None
  }

  private def allFiles: Seq[String] = snap.files.values.flatten.toSeq

  private def statOf(f: String, c: String): Option[(String, String)] =
    if (keyCol.contains(c)) snap.stats.get(f)
    else snap.extraStats.get(f).flatMap(_.get(c))

  /** Typed value from a stat image string, or None when the column's
    * type has no faithful image (floats are string-cast — decline). */
  private def typedImage(c: String, img: String): Option[Any] =
    tableSchema.fields.find(_.name == c).flatMap(_.dataType match {
      case LongType | TimestampType => img.toLongOption
      case IntegerType | DateType => img.toLongOption.map(_.toInt)
      case ShortType => img.toLongOption.map(_.toShort)
      case ByteType => img.toLongOption.map(_.toByte)
      case StringType =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromString(img))
      case _ => None
    })

  /** The fold of a column's per-file envelopes: Some(value-or-null)
    * when EVERY referenced file carries a parseable stat for it (an
    * empty table folds to SQL's null), None when any file lacks one
    * (pre-stats files, all-null files — indistinguishable, so never
    * guess). */
  private def metaExtremum(c: String, takeMin: Boolean): Option[Any] = {
    // pending MERGE-ON-READ deletes may have removed the recorded
    // extremum's row — envelope folds are unsound until compaction
    // purges the delete files; COUNT(*) is unaffected (countRows
    // subtracts exact delete counts)
    if (snap.deletes.nonEmpty) return None
    val files = allFiles
    if (files.isEmpty) return Some(null)
    val vals = files.map(f => statOf(f, c)
      .map(s => if (takeMin) s._1 else s._2)
      .flatMap(typedImage(c, _)))
    if (vals.exists(_.isEmpty)) None
    else {
      val vs = vals.map(_.get)
      val lt: (Any, Any) => Boolean = (a, b) => (a, b) match {
        case (x: Long, y: Long) => x < y
        case (x: Int, y: Int) => x < y
        case (x: Short, y: Short) => x < y
        case (x: Byte, y: Byte) => x < y
        case (x: org.apache.spark.unsafe.types.UTF8String,
              y: org.apache.spark.unsafe.types.UTF8String) =>
          x.compareTo(y) < 0
        case _ => false
      }
      Some(vs.reduce((a, b) =>
        if (if (takeMin) lt(a, b) else lt(b, a)) a else b))
    }
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    aggValuesFor(agg).isDefined || viewServeFor(agg).isDefined

  private def aggValuesFor(agg: Aggregation)
      : Option[Seq[(DataType, Boolean, Any)]] = {
    if (sawFilters || agg.groupByExpressions.nonEmpty ||
        agg.aggregateExpressions.isEmpty) return None
    val vals = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        VersionedKeyedTable.countRows(
            SparkSession.active, dir, Some(snap.version))
          .map(n => (LongType: DataType, false, n: Any))
      case m: Min => singleCol(m.children).flatMap { c =>
        metaExtremum(c, takeMin = true).map(v =>
          (tableSchema.fields.find(_.name == c).get.dataType, true, v))
      }
      case m: Max => singleCol(m.children).flatMap { c =>
        metaExtremum(c, takeMin = false).map(v =>
          (tableSchema.fields.find(_.name == c).get.dataType, true, v))
      }
      case _ => None
    }
    if (vals.forall(_.isDefined)) Some(vals.map(_.get)) else None
  }

  override def pushAggregation(agg: Aggregation): Boolean =
    aggValuesFor(agg) match {
      case Some(vals) =>
        val schema = vals.zipWithIndex.foldLeft(new StructType()) {
          case (sc, ((dt, nullable, _), i)) => sc.add(s"agg_$i", dt, nullable)
        }
        aggRow = Some((schema, vals.map(_._3)))
        true
      case None => viewServeFor(agg) match {
        case Some(plan) => viewServe = Some(plan); true
        case None => false
      }
    }

  // ---- MAINTAINED-VIEW SERVING (grouped aggregate pushdown) --------
  // The materialized-view auto-rewrite, seated in DSv2's OWN
  // aggregate-pushdown contract so it works in ANY session (no
  // optimizer extension to install): when a grouped aggregate over
  // this table matches a REGISTERED incremental view (see
  // `CALL cat.create_agg_view` — an [[IncrementalView]] full view:
  // per-group cnt/total/mn/mx maintained from the CDF) AND that
  // view's durable watermark equals EXACTLY this scan's snapshot
  // version, the "complete pushdown" answer is a scan of the VIEW's
  // files — O(groups) instead of O(table). The freshness check pairs
  // the watermark with a PINNED view snapshot, so a refresh racing
  // past it can never serve rows newer than this scan's version; any
  // staleness, any filter, any unmatched aggregate falls back to the
  // ordinary scan + real aggregation. At 100 TB this is the
  // dashboard-query story: the big table's grouped rollup reads the
  // few files of its maintained view, with correctness anchored to
  // the snapshot the plan already promised.

  private case class ViewServe(viewDir: String,
      viewSnap: VersionedKeyedTable.Snapshot,
      viewSchema: StructType, required: StructType, viewKey: String,
      baseVersion: Long)

  private var viewServe: Option[ViewServe] = None
  private var viewServeMemo: Option[(Aggregation, Option[ViewServe])] =
    None

  private def viewServeFor(agg: Aggregation): Option[ViewServe] = {
    // supportCompletePushDown and pushAggregation both ask — compute
    // once per Aggregation instance (freshness must not be re-read
    // between the two, or a racing refresh could flip the answer)
    viewServeMemo match {
      case Some((a, r)) if a eq agg => return r
      case _ => ()
    }
    val r = computeViewServe(agg)
    viewServeMemo = Some((agg, r))
    r
  }

  private def computeViewServe(agg: Aggregation): Option[ViewServe] = {
    if (sawFilters || timeTravel) return None
    if (agg.groupByExpressions.length != 1 ||
        agg.aggregateExpressions.isEmpty) return None
    val g = agg.groupByExpressions()(0) match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        nr.fieldNames()(0)
      case _ => return None
    }
    val spark = SparkSession.active
    val resolver = spark.sessionState.analyzer.resolver
    val views = VersionedKeyedTable.properties(spark, dir).toSeq
      .collect { case (k, v) if k.startsWith("ivm.view.") => v }
      .flatMap { v =>
        v.split('|') match {
          case Array(n, gc, vc) => Some((dec0(n), dec0(gc), dec0(vc)))
          case _ => None
        }
      }
    views.iterator.flatMap { case (viewName, groupCol, valueCol) =>
      if (resolver(groupCol, g))
        serveFrom(spark, viewName, groupCol, valueCol, agg)
      else None
    }.nextOption()
  }

  private def dec0(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** One registered view against the pushed aggregation: map every
    * aggregate onto a view column or give up. */
  private def serveFrom(spark: SparkSession, viewName: String,
      groupCol: String, valueCol: String, agg: Aggregation)
      : Option[ViewServe] = {
    val resolver = spark.sessionState.analyzer.resolver
    def isValueCol(
        children: Array[org.apache.spark.sql.connector.expressions.Expression])
        : Boolean = children match {
      case Array(nr: NamedReference) if nr.fieldNames.length == 1 =>
        resolver(nr.fieldNames()(0), valueCol)
      case _ => false
    }
    val mapped: Seq[Option[String]] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("cnt")
      case s: V2Sum if !s.isDistinct && isValueCol(s.children) =>
        Some("total")
      case m: Min if isValueCol(m.children) => Some("mn")
      case m: Max if isValueCol(m.children) => Some("mx")
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) return None
    val cols = mapped.map(_.get)
    if (cols.distinct.size != cols.size) return None // dup read names
    val viewDir = {
      val cut = dir.lastIndexOf('/')
      if (cut < 0) return None
      dir.substring(0, cut) + "/" + viewName
    }
    if (KeyedTable.readMeta(spark, viewDir).isEmpty) return None
    val viewSnap =
      try VersionedKeyedTable.snapshot(spark, viewDir)
      catch { case scala.util.control.NonFatal(_) => return None }
    // freshness: the view's DURABLE watermark (walked from the PINNED
    // snapshot) must equal exactly this scan's snapshot version
    if (!graft.sinks.IncrementalView
        .watermarkOf(spark, viewDir, viewSnap)
        .contains(snap.version)) return None
    val viewSchema = viewSnap.schema.getOrElse(
      KeyedTable.readMeta(spark, viewDir).get._2)
    def field(n: String): Option[StructField] =
      viewSchema.fields.find(f => resolver(f.name, n))
    val gField = field(groupCol).getOrElse(return None)
    // the base group column's type must match the view's (same source
    // column, but never trust without checking)
    if (tableSchema.fields.find(f => resolver(f.name, groupCol))
        .forall(_.dataType != gField.dataType)) return None
    val aggFields = cols.map(c => field(c).getOrElse(return None))
    // expected result types: count -> LongType; sum(int family) ->
    // LongType (the view's total, summed the same way); min/max ->
    // the value column's own type. The view was built by the same
    // engine's aggregates, so its column types ARE the expected
    // types; mismatches (schema drift) fall back.
    if (cols.contains("cnt") &&
        field("cnt").exists(_.dataType != LongType)) return None
    val required = StructType(gField +: aggFields)
    val viewKey = KeyedTable.readMetaKey(spark, viewDir)
      .getOrElse(return None)
    Some(ViewServe(viewDir, viewSnap, viewSchema, required, viewKey,
      snap.version))
  }

  /** Per-column [lo, hi] in the stat image, from the accepted
    * conjuncts (strict bounds widen by one / stay inclusive — only
    * ever conservative). */
  private def bounds(): (Map[String, (Option[Long], Option[Long])],
      Map[String, (Option[String], Option[String])]) = {
    val num = scala.collection.mutable
      .Map.empty[String, (Option[Long], Option[Long])]
    val str = scala.collection.mutable
      .Map.empty[String, (Option[String], Option[String])]
    // string bounds compose in UTF-8 BINARY order (Utf8Ord) — the
    // order the envelopes were aggregated in
    val utf8 = VersionedKeyedTable.Utf8Ord
    def raise(c: String, v: Either[Long, String]): Unit = v match {
      case Left(l) =>
        val (lo, hi) = num.getOrElse(c, (None, None))
        num(c) = (Some(lo.fold(l)(math.max(_, l))), hi)
      case Right(s) =>
        val (lo, hi) = str.getOrElse(c, (None, None))
        str(c) = (Some(lo.fold(s)(x => utf8.max(x, s))), hi)
    }
    def lower(c: String, v: Either[Long, String]): Unit = v match {
      case Left(l) =>
        val (lo, hi) = num.getOrElse(c, (None, None))
        num(c) = (lo, Some(hi.fold(l)(math.min(_, l))))
      case Right(s) =>
        val (lo, hi) = str.getOrElse(c, (None, None))
        str(c) = (lo, Some(hi.fold(s)(x => utf8.min(x, s))))
    }
    accepted.foreach {
      case EqualTo(a, v) => bound(a, v).foreach { b =>
        raise(a, b); lower(a, b) }
      case GreaterThan(a, v) => bound(a, v).foreach(raise(a, _))
      case GreaterThanOrEqual(a, v) => bound(a, v).foreach(raise(a, _))
      case LessThan(a, v) => bound(a, v).foreach(lower(a, _))
      case LessThanOrEqual(a, v) => bound(a, v).foreach(lower(a, _))
      case In(a, vs) =>
        val bs = vs.flatMap(bound(a, _))
        if (bs.length == vs.length && bs.nonEmpty) {
          (bs.head, bs.last) match {
            case (Left(_), _) =>
              val ls = bs.collect { case Left(l) => l }
              raise(a, Left(ls.min)); lower(a, Left(ls.max))
            case (Right(_), _) =>
              val ss = bs.collect { case Right(s) => s }
              raise(a, Right(ss.min(utf8))); lower(a, Right(ss.max(utf8)))
          }
        }
      case _ => ()
    }
    (num.toMap, str.toMap)
  }

  override def build(): Scan = aggRow match {
    case Some((aggSchema, vals)) =>
      new GraftAggScan(aggSchema, vals, allFiles.size)
    case None => viewServe match {
      case Some(vs) =>
        new GraftViewAggScan(vs.viewDir, vs.viewSnap, vs.viewSchema,
          vs.required, vs.viewKey, dir, vs.baseVersion)
      case None => buildRowScan()
    }
  }

  /** The ROW scan: manifest zone-map FILE pruning (ours) composed
    * with Spark's OWN vectorized parquet scan (theirs). The kept file
    * set — pruned against the manifest's typed/string envelopes
    * BEFORE any partition is planned — becomes the file index of a
    * [[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]],
    * so within each kept file the read is everything Spark's native
    * path gives: VECTORIZED columnar decode (whole-stage-codegen
    * friendly), COLUMN-CHUNK projection (a 2-column SELECT over a
    * 20-column table decodes 2 columns, not 20), parquet ROW-GROUP
    * statistics pruning from the pushed filters, and both timestamp
    * encodings (INT96/INT64). The Group reader remains only for
    * [[CdfSource]] change files, whose narrow schema it fits. At
    * 100×: the manifest prunes files driver-side at metadata scale;
    * everything per-file rides the same reader the warehouse's plain
    * parquet scans use. */
  private def buildRowScan(): Scan = {
    val spark = SparkSession.active
    val (num, str) = bounds()
    def surviveNum(stats: Option[(String, String)],
        b: Option[(Option[Long], Option[Long])]): Boolean =
      (stats.flatMap { case (mn, mx) =>
        for (a <- mn.toLongOption; c <- mx.toLongOption)
          yield (a, c) }, b) match {
        case (Some((mn, mx)), Some((lo, hi))) =>
          lo.forall(mx >= _) && hi.forall(mn <= _)
        case _ => true
      }
    def surviveStr(stats: Option[(String, String)],
        b: Option[(Option[String], Option[String])]): Boolean =
      (stats, b) match {
        case (Some((mn, mx)), Some((lo, hi))) =>
          // UTF-8 binary order — matches the envelope's own order
          val utf8 = VersionedKeyedTable.Utf8Ord
          lo.forall(utf8.gteq(mx, _)) && hi.forall(utf8.lteq(mn, _))
        case _ => true
      }
    val files = snap.files.values.flatten.toSeq
    val keptPruned = files.filter { f =>
      val keyOk = keyCol.forall { k =>
        (if (numericCol(k)) surviveNum(snap.stats.get(f), num.get(k))
         else true) &&
        (if (stringCol(k)) surviveStr(snap.stats.get(f), str.get(k))
         else true)
      }
      val extras = snap.extraStats.getOrElse(f, Map.empty)
      keyOk && num.forall { case (c, b) =>
        keyCol.contains(c) || !numericCol(c) ||
          surviveNum(extras.get(c), Some(b))
      } && str.forall { case (c, b) =>
        keyCol.contains(c) || !stringCol(c) ||
          surviveStr(extras.get(c), Some(b))
      }
    }
    if (required.fieldNames.contains("_file")) {
      // the METADATA-COLUMN path (row-level operations' CoW read, or
      // an explicit SELECT _file): one partition per kept file, the
      // Group reader injecting the file's relative path as the
      // virtual `_file`. Full-width by nature — a rewrite carries
      // every column anyway — so the row-at-a-time reader is the
      // right tool here; plain scans stay on the vectorized path.
      val req = required
      val conf = SerializableHadoopConf.fromSession(spark)
      val delRels = snap.deletes.values.flatten.toSeq
      // a ROW-LEVEL CoW read under pending MOR deletes must scan ALL
      // files: a partial replacement would leave dangling delete keys
      // (replaceFiles refuses it) — pruning resumes after compaction
      val kept =
        if (onRowLevelPlan != null && delRels.nonEmpty) files
        else keptPruned
      // the group-based write replaces EXACTLY this file set
      if (onRowLevelPlan != null) onRowLevelPlan(kept)
      // per-file partitions pair naturally with per-SEQUENCE-CLASS
      // delete filtering (the upsertMor rule: a delete kills only
      // strictly-older files), so pending MOR state cannot resurrect
      // deleted rows NOR kill re-added ones through the CoW read.
      // The key rides as a trailing extra field when the projection
      // lacks it (downstream reads ordinals 0..n-1).
      val classes: Seq[Long] =
        kept.map(VersionedKeyedTable.dataSeq(snap, _)).distinct.sorted
      val classIdx: Map[Long, Int] = classes.zipWithIndex.toMap
      val snapForSeq = snap
      new Scan {
        override def readSchema(): StructType = req
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            kept.map { f =>
              val p = GraftMetaFilePartition(s"$dir/$f", f)
              if (delRels.isEmpty) p: InputPartition
              else SeqClassPartition(p,
                classIdx(VersionedKeyedTable.dataSeq(snapForSeq, f)))
            }.toArray
          override def createReaderFactory(): PartitionReaderFactory = {
            if (delRels.isEmpty) new GraftMetaFileReaderFactory(req, conf)
            else {
              val k = keyCol.getOrElse(throw new IllegalStateException(
                s"$dir carries merge-on-read delete files but records " +
                  "no key column"))
              val reqPlus =
                if (req.fieldNames.contains(k)) req
                else req.add(tableSchema(k))
              val base = new GraftMetaFileReaderFactory(reqPlus, conf)
              new SeqClassDispatchFactory(classes.map { s =>
                val applicable = delRels.filter(d =>
                  VersionedKeyedTable.deleteSeq(snapForSeq, d) > s)
                if (applicable.isEmpty) base
                else {
                  // plan-time backlog gate (driver, manifest counts):
                  // refuse before any executor materializes the set
                  val cap = MorDeleteSet.planCheck(SparkSession.active,
                    dir, snapForSeq.counts, applicable)
                  new MorFilterReaderFactory(base, dir, applicable,
                    k, tableSchema(k).dataType, reqPlus.fieldIndex(k),
                    conf, cap): PartitionReaderFactory
                }
              })
            }
          }
        }
      }
    } else {
      // limit/top-N file truncation (plain row scans only — the
      // metadata-column path above serves row-level rewrites, which
      // must see every kept file). Gated on: no residual filters (a
      // filter between scan and limit blocks the pushdown anyway, but
      // never trust that implicitly) and no pending MoR deletes.
      val noPendingDeletes = snap.deletes.values.forall(_.isEmpty)
      val (keptFinal, limitPlan): (Seq[String], Option[(Int, Int)]) =
        if (sawFilters || !noPendingDeletes) (keptPruned, None)
        else (pushedTopN, pushedLimit) match {
          case (Some((asc, n)), _) =>
            val keep = topNKeep(keptPruned, asc, n)
            (keep, Some((keep.size, keptPruned.size)))
          case (_, Some(n)) =>
            val keep = limitPrefix(keptPruned, n)
            (keep, Some((keep.size, keptPruned.size)))
          case _ => (keptPruned, None)
        }
      new GraftRowScan(dir, snap, tableSchema, required, accepted,
        keyCol, keptFinal, numBuckets, scanOptions, timeTravel,
        limitPlan)
    }
  }
}

/** A grouped aggregate served COMPLETE from a maintained incremental
  * view (see GraftScanBuilder's view-serving section): a [[GraftRowScan]]
  * over the VIEW table's pinned snapshot, whose read schema is laid
  * out exactly as the pushed aggregation expects (group column first,
  * then one column per aggregate, in pushed order). The distinct type
  * exists so specs and check queries can pin "this aggregate read the
  * view, not the base" off the executed plan. */
class GraftViewAggScan(viewDir: String,
    viewSnap: VersionedKeyedTable.Snapshot, viewSchema: StructType,
    required: StructType, viewKey: String,
    /** The BASE table dir + snapshot version this serve is anchored
      * to — the view's durable watermark equals it by construction. */
    val servedBaseDir: String, val servedBaseVersion: Long)
    extends GraftRowScan(viewDir, viewSnap, viewSchema, required,
      Array.empty, Some(viewKey),
      viewSnap.files.values.flatten.toSeq, None)

/** The catalog ROW scan: manifest-pruned files handed to Spark's own
  * vectorized [[org.apache.spark.sql.execution.datasources.v2.parquet
  * .ParquetScan]] — PLUS RUNTIME file pruning
  * ([[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]],
  * the Iceberg/Delta dynamic-partition-pruning analogue): when this
  * table is the FACT side of an equi join whose other side is small
  * and filtered, Spark's `PartitionPruning` rule injects a dynamic
  * subquery on the join key, the dim side's broadcast result arrives
  * here as an `In` filter at EXECUTION time, and the scan re-prunes
  * its file set against the manifest's zone maps and bloom sidecars
  * BEFORE any partition is read. At 100 TB this is the star-join
  * story: `fact JOIN dim WHERE dim.region = 'EU'` reads only the fact
  * files whose key envelopes/blooms can hold the EU keys — no static
  * predicate on the fact required. Driver work stays bounded: key
  * sets above [[VersionedKeyedTable.MaxPointLookupKeys]] collapse to
  * one [min, max] range probe (zone maps only, no per-key loop).
  * Pruning is conservative by construction — files without stats or
  * blooms are never dropped, and the runtime filter is ALSO applied
  * row-wise by the join itself, so a kept false-positive file costs
  * I/O, never correctness. */
class GraftRowScan(dir: String,
    snap: VersionedKeyedTable.Snapshot,
    tableSchema: StructType, required: StructType,
    accepted: Array[Filter], keyCol: Option[String],
    keptAtPlan: Seq[String], numBuckets: Option[Int] = None,
    scanOptions: CaseInsensitiveStringMap =
      CaseInsensitiveStringMap.empty(),
    timeTravel: Boolean = false,
    /** (files planned, files kept before limit/top-N truncation) when
      * a pushed limit participated in file planning — spec evidence. */
    limitPlan: Option[(Int, Int)] = None)
    extends Scan
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  /** `spark.readStream.table("cat.t")`: tail the table as a stream of
    * row POST-IMAGES (see [[TableTailMicroBatchStream]]) — the CDF
    * offsets/lineage/admission machinery with the rows projected in
    * THIS scan's pruned schema. Options: `startingVersion` (changes
    * strictly after it; default = latest at stream start),
    * `maxVersionsPerTrigger`, `ignoreDeletes`. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    if (timeTravel) throw new UnsupportedOperationException(
      s"cannot stream a time-travel snapshot of $dir — versions are " +
        "immutable; tail the current table")
    val k = keyCol.getOrElse(throw new UnsupportedOperationException(
      s"table at $dir records no key column — streaming reads need " +
        "the keyed contract"))
    val sv = Option(scanOptions.get("startingVersion")).map(_.toLong)
    val st = Option(scanOptions.get("startingTimestamp"))
      .map(CdfSource.parseTsMillis)
    require(sv.isEmpty || st.isEmpty,
      "readStream.table: startingVersion and startingTimestamp are " +
        "mutually exclusive — pick one starting rule")
    new TableTailMicroBatchStream(dir, k, required, sv,
      Option(scanOptions.get("maxVersionsPerTrigger")).map(_.toLong),
      Option(scanOptions.get("ignoreDeletes")).exists(_.toBoolean), st)
  }

  @volatile private var kept: Seq[String] = keptAtPlan
  @volatile private var runtimeFiltered = false
  @volatile private var inners
      : Seq[(Long,
        org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan)] =
    null

  // ---- scoped observability ------------------------------------------
  // Evidence accessors for specs and in-row check-query requires, read
  // off THIS scan instance (extract it from the executed plan via
  // [[GraftScanInspect]]) — no process-wide state, so concurrent
  // queries can never interleave each other's numbers.

  /** (files planned after manifest zone-map pruning, total data files
    * in the snapshot). */
  def plannedFileCounts: (Int, Int) =
    (keptAtPlan.size, snap.files.valuesIterator.map(_.size).sum)

  /** (files kept after runtime filtering, files at plan time) — equal
    * until a runtime filter fires. Read AFTER executing the plan. */
  def runtimeFileCounts: (Int, Int) = (kept.size, keptAtPlan.size)

  /** Whether Spark's runtime filtering ([[filter]]) reached this scan
    * during execution — fires even when nothing could be pruned. */
  def runtimeFilterFired: Boolean = runtimeFiltered

  /** The pruned read schema handed to the vectorized parquet scan —
    * what projection-pushdown specs pin. */
  def readSchemaNames: Seq[String] = required.fieldNames.toSeq

  /** (files planned, files kept before truncation) when a pushed
    * LIMIT / ORDER-BY-key top-N participated in file planning; None
    * when no limit reached the scan or truncation stood down. */
  def limitFileCounts: Option[(Int, Int)] = limitPlan

  private def spark = SparkSession.active

  // ---- merge-on-read deletes ---------------------------------------
  // A snapshot with pending delete files filters deleted keys in the
  // reader (the DSv2 seat of the anti-join the programmatic paths
  // apply). The inner parquet read carries the key as a trailing
  // extra column when the projection lacks it — downstream consumes
  // ordinals 0..n-1 of readSchema(), so the extra field is invisible.
  // Row-based while deletes are pending; compaction purges them and
  // restores the vectorized path.
  private val delRels: Seq[String] = snap.deletes.values.flatten.toSeq
  private val morKeyName: Option[String] =
    if (delRels.isEmpty) None
    else Some(keyCol.getOrElse(throw new IllegalStateException(
      s"$dir carries merge-on-read delete files but records no key " +
        "column")))
  private val innerSchema: StructType = morKeyName match {
    case Some(k) if !required.fieldNames.contains(k) =>
      required.add(tableSchema(k))
    case _ => required
  }

  /** Delete files that apply to data files of sequence `s` — the
    * strictly-above rule that keeps [[VersionedKeyedTable.upsertMor]]'s
    * re-added rows alive. */
  private def applicableDeletes(s: Long): Seq[String] =
    delRels.filter(d => VersionedKeyedTable.deleteSeq(snap, d) > s)

  private def morWrapFor(s: Long, factory: PartitionReaderFactory)
      : PartitionReaderFactory = morKeyName match {
    case None => factory
    case Some(k) =>
      val applicable = applicableDeletes(s)
      if (applicable.isEmpty) factory
      else {
        // plan-time backlog gate (driver, manifest counts): a delete
        // backlog past spark.graft.mor.maxDeleteRows refuses the scan
        // with "compact first" before any executor materializes it
        val cap = MorDeleteSet.planCheck(spark, dir, snap.counts,
          applicable)
        new MorFilterReaderFactory(factory, dir, applicable, k,
          tableSchema(k).dataType, innerSchema.fieldIndex(k),
          SerializableHadoopConf.fromSession(spark), cap)
      }
  }

  /** The sequence classes of the PLAN-TIME kept set (one class — 0 —
    * for every table no [[VersionedKeyedTable.upsertMor]] touched).
    * Pinned at planning like spjActive: runtime filtering can only
    * SHRINK a class, never add one. */
  private lazy val classesAtPlan: Seq[Long] =
    keptAtPlan.map(VersionedKeyedTable.dataSeq(snap, _)).distinct.sorted

  // ---- storage-partitioned reads -----------------------------------
  // The store's layout IS a key-clustering: bucket(n, key) by
  // pmod(xxhash64(key), n). Reported to Catalyst as
  // KeyGroupedPartitioning — with the `bucket` function served by
  // GraftCatalog's FunctionCatalog face — a key equi join between two
  // co-bucketed store tables and a groupBy(key) aggregation both run
  // WITHOUT their shuffle. Opt-in via Spark's own switch
  // (spark.sql.sources.v2.bucketing.enabled), because bucket-grouped
  // planning caps a plain scan's parallelism at the bucket count —
  // default split-level planning stays the right answer for everything
  // that doesn't exploit the clustering.

  /** `<parent>/<fileName>` → owning bucket. Bare file names repeat
    * across bucket directories (each bucket dir holds the same
    * `part-NNNNN-<uuid>` names from one write job), so the key is the
    * last TWO path segments — unique across the snapshot by
    * construction. Empty on a collision — the conservative "cannot
    * group" answer. */
  private def tailKey(p: String): String = {
    val segs = p.split('/')
    segs.takeRight(math.min(2, segs.length)).mkString("/")
  }

  private lazy val nameToBucket: Map[String, Int] = {
    val pairs = snap.files.toSeq.flatMap { case (b, fs) =>
      fs.map(f => tailKey(f) -> b)
    }
    if (pairs.map(_._1).distinct.size != pairs.size) Map.empty
    else pairs.toMap
  }

  /** Buckets holding PLAN-TIME kept files, in stable order. Runtime
    * filtering narrows files WITHIN this grouping (a pruned bucket
    * keeps an empty partition) so the reported partition values never
    * change under a runtime filter. */
  private lazy val bucketsAtPlan: Seq[Int] =
    keptAtPlan.flatMap(f => nameToBucket.get(tailKey(f)))
      .distinct.sorted

  private def v2BucketingOn: Boolean =
    spark.conf.get("spark.sql.sources.v2.bucketing.enabled", "false")
      .toBoolean

  /** Decided ONCE (first evaluation, during planning) and pinned for
    * the scan's lifetime: `outputPartitioning` promises the partition
    * shape `toBatch` must then deliver, so a session-conf flip
    * between optimization and execution must not split the two. */
  private lazy val spjActive: Boolean =
    v2BucketingOn && keyCol.isDefined && numBuckets.isDefined &&
      required.fieldNames.contains(keyCol.get) &&
      nameToBucket.nonEmpty && bucketsAtPlan.nonEmpty &&
      // bucket-grouped partitions mix files of different sequence
      // classes, which the per-class delete filter cannot untangle —
      // SPJ stands down until compaction folds the classes back
      (delRels.isEmpty || classesAtPlan.size == 1)

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (spjActive)
      new org.apache.spark.sql.connector.read.partitioning
        .KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .bucket(numBuckets.get, keyCol.get)),
          bucketsAtPlan.size)
    else new org.apache.spark.sql.connector.read.partitioning
      .UnknownPartitioning(0)

  private def buildScan(files: Seq[String])
      : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan = {
    // manifest-known files: a PreListedFileIndex hands the statuses
    // straight to the scan (one listStatus per commit dir) — an
    // InMemoryFileIndex here re-listed every path per scan build, and
    // past 32 paths launched a distributed listing JOB per query
    val index = new graft.sinks.PreListedFileIndex(spark,
      new org.apache.hadoop.fs.Path(dir),
      graft.sinks.VersionedKeyedTable.statFiles(spark, dir, files))
    // a DEFENSIVE COPY: ParquetScan.createReaderFactory mutates the
    // conf it is given (read-support keys, SQLConf mirror keys) —
    // never hand it the session-global one
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan(
      spark, conf, index, tableSchema, innerSchema,
      new StructType() /* no partition columns: buckets live in the
        manifest, not in directory names the scan must decode */,
      accepted, CaseInsensitiveStringMap.empty(), None,
      Seq.empty, Seq.empty)
  }

  /** One delegate ParquetScan PER SEQUENCE CLASS of the CURRENT kept
    * set (exactly one class — the whole set — for tables with no
    * pending merge-on-read state), rebuilt after a runtime filter
    * narrows it (BatchScanExec calls `toBatch` again after `filter`,
    * per the SupportsRuntimeFiltering contract). */
  private def classScans(): Seq[(Long,
      org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan)] = {
    var cs = inners
    if (cs == null) {
      // sequence classes matter ONLY while delete files are pending
      // (stamps outlive their deletes — an all-new-keys upsertMor
      // writes stamped files with no delete file, and a consumed
      // backlog leaves stamps behind until the bucket is rewritten):
      // with delRels empty, ONE scan serves everything — vectorized,
      // SPJ-groupable, no per-class split
      cs =
        if (delRels.isEmpty) Seq(0L -> buildScan(kept))
        else kept.groupBy(VersionedKeyedTable.dataSeq(snap, _))
          .toSeq.sortBy(_._1)
          .map { case (s, fs) => s -> buildScan(fs) }
      if (cs.isEmpty) cs = Seq(0L -> buildScan(Seq.empty))
      inners = cs
    }
    cs
  }

  override def readSchema(): StructType = required

  /** Default: the delegate's split-level partitions (parallelism from
    * file splits). Under v2 bucketing: the SAME PartitionedFiles
    * regrouped one-partition-per-bucket, each carrying its bucket id
    * as the partition key — what BatchScanExec groups
    * KeyGroupedPartitioning on. The reader factory is the delegate's
    * either way (vectorized parquet). */
  override def toBatch: Batch = {
    val classes = classScans()
    if (spjActive) {
      // single class by the spjActive pin — bucket-grouped partitions
      val (cseq, sc) = classes.head
      val delegate = sc.toBatch
      new Batch {
        override def planInputPartitions(): Array[InputPartition] = {
          val pfs = delegate.planInputPartitions().flatMap {
            case fp: org.apache.spark.sql.execution.datasources
              .FilePartition => fp.files
          }
          val byBucket = pfs.groupBy(pf =>
            nameToBucket.get(tailKey(pf.toPath.toUri.getPath)))
          bucketsAtPlan.zipWithIndex.map { case (b, i) =>
            new GraftBucketFilePartition(i,
              byBucket.getOrElse(Some(b), Array.empty),
              InternalRow(b)): InputPartition
          }.toArray
        }
        override def createReaderFactory(): PartitionReaderFactory =
          morWrapFor(cseq, delegate.createReaderFactory())
      }
    } else if (classes.size == 1) {
      val (cseq, sc) = classes.head
      val delegate = sc.toBatch
      if (morKeyName.isEmpty || applicableDeletes(cseq).isEmpty)
        delegate // the steady state: pure vectorized scan
      else new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          delegate.planInputPartitions()
        override def createReaderFactory(): PartitionReaderFactory =
          morWrapFor(cseq, delegate.createReaderFactory())
      }
    } else {
      // MULTI-CLASS (upsertMor appended over older files): each
      // class's partitions ride its own delegate, tagged so the
      // dispatching factory pairs them with the class's delete set
      val parts = classes.map { case (s, sc) => (s, sc.toBatch) }
      new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          parts.zipWithIndex.flatMap { case ((_, b), ci) =>
            b.planInputPartitions()
              .map(p => SeqClassPartition(p, ci): InputPartition)
          }.toArray
        override def createReaderFactory(): PartitionReaderFactory =
          new SeqClassDispatchFactory(parts.map { case (s, b) =>
            morWrapFor(s, b.createReaderFactory())
          })
      }
    }
  }

  override def description(): String =
    s"GraftRowScan $dir files=${kept.size}/${keptAtPlan.size}" +
      (if (spjActive) s" buckets=${bucketsAtPlan.size}" else "")

  /** Accurate size/row-count for the planner's broadcast decisions:
    * sizeInBytes is the delegate's fold of the kept files' on-disk
    * sizes (FileScan's own estimate), so a well-pruned store table
    * broadcasts when it should. On top of that the manifest answers
    * what a plain file source cannot, with ZERO file reads:
    *  - EXACT numRows: the kept files' recorded row counts (absent
    *    when any kept file predates counts or merge-on-read deletes
    *    are pending — never guess);
    *  - per-column min/max + null counts
    *    ([[org.apache.spark.sql.connector.read.colstats
    *    .ColumnStatistics]]) folded from the zone-map envelopes for
    *    the KEY (non-null by the write invariant) and every
    *    clusterBy'd column carrying named maps — the planner-grade
    *    metadata (CBO range selectivity, join estimation) a 100 TB
    *    table cannot afford to ANALYZE by scanning. Values are
    *    Catalyst-internal (Long / UTF8String), matching what the
    *    stats conversion expects; columns whose envelopes are
    *    unparseable or incomplete are simply absent. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val delegate = classScans() match {
      case Seq((_, sc)) => sc.estimateStatistics()
      case cs =>
        // fold the classes' size estimates (pending MOR deletes make
        // this a slight over-estimate — acceptable for planner
        // sizing; compaction restores the single-scan path)
        val ss = cs.map(_._2.estimateStatistics())
        new org.apache.spark.sql.connector.read.Statistics {
          override def sizeInBytes(): java.util.OptionalLong =
            java.util.OptionalLong.of(
              ss.map(s => s.sizeInBytes().orElse(0L)).sum)
          override def numRows(): java.util.OptionalLong =
            if (ss.forall(_.numRows().isPresent))
              java.util.OptionalLong.of(ss.map(_.numRows().getAsLong).sum)
            else java.util.OptionalLong.empty()
        }
    }
    val exactRows: Option[Long] =
      if (delRels.nonEmpty || !kept.forall(snap.counts.contains)) None
      else Some(kept.map(snap.counts).sum)
    val colStats = manifestColumnStats()
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        delegate.sizeInBytes()
      override def numRows(): java.util.OptionalLong =
        exactRows.map(java.util.OptionalLong.of)
          .getOrElse(delegate.numRows())
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
        colStats
    }
  }

  /** Fold the kept files' envelopes into per-column statistics (see
    * [[estimateStatistics]]); a column appears only when EVERY kept
    * file carries a parseable envelope for it. */
  private def manifestColumnStats(): java.util.Map[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
    val out = new java.util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    if (delRels.nonEmpty || kept.isEmpty) return out // envelopes unsound
    val extraCols: Seq[String] =
      snap.extraStats.values.flatMap(_.keys).toSeq.distinct
    def envOf(c: String, f: String): Option[(String, String)] =
      if (keyCol.contains(c)) snap.stats.get(f)
      else snap.extraStats.get(f).flatMap(_.get(c))
    def fold(c: String): Option[(Any, Any, Long)] = {
      val dt = tableSchema.fields.find(_.name == c).map(_.dataType)
        .getOrElse(return None)
      val numeric = VersionedKeyedTable.hasNumericImage(dt)
      val isStr = dt == StringType
      if (!numeric && !isStr) return None
      val envs = kept.map(envOf(c, _))
      if (envs.exists(_.isEmpty)) return None
      val es = envs.map(_.get)
      if (numeric) {
        val parsed = es.map { case (a, b) =>
          for (x <- a.toLongOption; y <- b.toLongOption) yield (x, y) }
        if (parsed.exists(_.isEmpty)) return None
        val ps = parsed.map(_.get)
        // key rows are non-null by the write invariant; other
        // columns' null counts are unknown (envelopes skip nulls)
        Some((Long.box(ps.map(_._1).min), Long.box(ps.map(_._2).max),
          if (keyCol.contains(c)) 0L else -1L))
      } else {
        val utf8 = VersionedKeyedTable.Utf8Ord
        Some((
          org.apache.spark.unsafe.types.UTF8String.fromString(
            es.map(_._1).min(utf8)),
          org.apache.spark.unsafe.types.UTF8String.fromString(
            es.map(_._2).max(utf8)),
          if (keyCol.contains(c)) 0L else -1L))
      }
    }
    (keyCol.toSeq ++ extraCols).distinct.foreach { c =>
      fold(c).foreach { case (mn, mx, nulls) =>
        out.put(
          org.apache.spark.sql.connector.expressions.Expressions
            .column(c),
          new org.apache.spark.sql.connector.read.colstats
              .ColumnStatistics {
            override def min(): java.util.Optional[Object] =
              java.util.Optional.of(mn.asInstanceOf[Object])
            override def max(): java.util.Optional[Object] =
              java.util.Optional.of(mx.asInstanceOf[Object])
            override def nullCount(): java.util.OptionalLong =
              if (nulls >= 0L) java.util.OptionalLong.of(nulls)
              else java.util.OptionalLong.empty()
          })
      }
    }
    out
  }

  /** Join columns a runtime filter can prune FILES on: the key column
    * (zone maps + bloom sidecars) and every clusterBy'd column
    * carrying named zone maps in the manifest — intersected with the
    * scan's PROJECTED output, because Spark resolves these references
    * against the pruned read schema (a column this scan doesn't emit
    * can't be a join key of this scan anyway). */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val extras: Set[String] =
      snap.extraStats.values.flatMap(_.keys).toSet
    val visible = required.fieldNames.toSet
    (keyCol.toSet ++ extras).intersect(visible).toArray.map(
      org.apache.spark.sql.connector.expressions.Expressions.column)
  }

  private def dataTypeOf(c: String): Option[DataType] =
    tableSchema.fields.find(_.name == c).map(_.dataType)

  private def statOf(f: String, c: String): Option[(String, String)] =
    if (keyCol.contains(c)) snap.stats.get(f)
    else snap.extraStats.get(f).flatMap(_.get(c))

  private def isIntegral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  override def filter(filters: Array[Filter]): Unit = {
    runtimeFiltered = true
    var files = kept
    filters.foreach { f =>
      val colVals: Option[(String, Seq[Any])] = f match {
        case In(a, vs) => Some((a, vs.toSeq.filter(_ != null)))
        case EqualTo(a, v) if v != null => Some((a, Seq(v)))
        case _ => None
      }
      colVals.foreach { case (c, vs) =>
        dataTypeOf(c).foreach { dt =>
          if (VersionedKeyedTable.hasNumericImage(dt)) {
            val imgs = vs.map(GraftScanBuilder.longImage)
            if (vs.nonEmpty && imgs.forall(_.isDefined)) {
              val ks = imgs.map(_.get)
              val bounded =
                ks.size <= VersionedKeyedTable.MaxPointLookupKeys
              val (lo, hi) = (ks.min, ks.max)
              files = files.filter { fl =>
                statOf(fl, c).flatMap { case (mn, mx) =>
                  for (a <- mn.toLongOption; b <- mx.toLongOption)
                    yield
                      if (bounded) ks.exists(k => k >= a && k <= b)
                      else hi >= a && lo <= b
                }.getOrElse(true) // no parseable stat: must read
              }
              // key-column point sets also probe the bloom sidecars
              // (built over the RAW long for integral keys only)
              if (bounded && keyCol.contains(c) && isIntegral(dt) &&
                  files.nonEmpty) {
                val fs = new org.apache.hadoop.fs.Path(dir)
                  .getFileSystem(spark.sparkContext.hadoopConfiguration)
                val blooms = VersionedKeyedTable.bloomsFor(fs, dir, files)
                files = files.filter { fl =>
                  blooms.get(fl) match {
                    case Some(bl) => ks.exists(bl.mightContainLong)
                    case None => true
                  }
                }
              }
            }
          } else if (dt == StringType) {
            val ss = vs.collect {
              case s: String => s
              case u: org.apache.spark.unsafe.types.UTF8String =>
                u.toString
            }
            if (ss.size == vs.size && ss.nonEmpty) {
              val utf8 = VersionedKeyedTable.Utf8Ord
              val bounded =
                ss.size <= VersionedKeyedTable.MaxPointLookupKeys
              val (lo, hi) = (ss.min(utf8), ss.max(utf8))
              files = files.filter { fl =>
                statOf(fl, c).map { case (mn, mx) =>
                  if (bounded)
                    ss.exists(k => utf8.gteq(k, mn) && utf8.lteq(k, mx))
                  else utf8.gteq(hi, mn) && utf8.lteq(lo, mx)
                }.getOrElse(true)
              }
              // string keys bloom xxhash64(key) — probe the image
              if (bounded && keyCol.contains(c) && files.nonEmpty) {
                val fs = new org.apache.hadoop.fs.Path(dir)
                  .getFileSystem(spark.sparkContext.hadoopConfiguration)
                val blooms = VersionedKeyedTable.bloomsFor(fs, dir, files)
                val hashes = ss.map(VersionedKeyedTable.strKeyHash)
                files = files.filter { fl =>
                  blooms.get(fl) match {
                    case Some(bl) => hashes.exists(bl.mightContainLong)
                    case None => true
                  }
                }
              }
            }
          }
        }
      }
    }
    if (files.size != kept.size) {
      kept = files
      inners = null // next toBatch plans the narrowed file set
    }
  }
}

/** A bucket's worth of parquet splits, keyed by its bucket id — the
  * partition unit of storage-partitioned reads. Extends Spark's own
  * FilePartition so the delegate's ParquetPartitionReaderFactory
  * consumes it unchanged (vectorized path intact). */
class GraftBucketFilePartition(index: Int,
    files: Array[org.apache.spark.sql.execution.datasources.PartitionedFile],
    key: InternalRow)
    extends org.apache.spark.sql.execution.datasources.FilePartition(
      index, files)
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** One data file with its manifest-relative path — the partition of
  * the metadata-column scan. */
case class GraftMetaFilePartition(path: String, rel: String)
    extends InputPartition

class GraftMetaFileReaderFactory(schema: StructType,
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftMetaFilePartition]
    new GroupParquetPartitionReader(p.path, schema,
      Map("_file" ->
        org.apache.spark.unsafe.types.UTF8String.fromString(p.rel)),
      Some(conf))
  }
}

object GraftScanBuilder {
  /** Long image of a literal under the column's recorded stat image
    * (identity for integral, epoch days for date, epoch micros for
    * timestamp) — None when the literal's runtime type does not fit
    * the column (never prune on a guess). */
  def longImage(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000L + (t.getNanos % 1000000) / 1000L)
    case t: java.time.Instant =>
      Some(t.getEpochSecond * 1000000L + t.getNano / 1000L)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case _ => None
  }

}

/** The METADATA-ONLY aggregate scan: the whole result of a completely
  * pushed COUNT(*)/MIN/MAX, computed from the manifest at plan time —
  * ZERO data files planned by construction (one synthetic partition
  * carries the pre-folded row). Named so specs can pin the fast path
  * by the scan's TYPE in their own executed plan ([[GraftScanInspect
  * .aggScans]]) instead of reading process-wide state. */
class GraftAggScan(aggSchema: StructType, vals: Seq[Any],
    /** Data files in the snapshot the fold summarized — what the
      * "zero of N files read" evidence is stated against. */
    val totalFiles: Int) extends Scan {
  override def readSchema(): StructType = aggSchema
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      Array(GraftAggPartition(vals))
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftAggReaderFactory
  }
  override def description(): String =
    s"GraftAggScan files=0/$totalFiles (manifest fold)"
}

/** One pre-aggregated row computed from manifest metadata — the whole
  * result of a completely-pushed aggregate. */
case class GraftAggPartition(values: Seq[Any]) extends InputPartition

class GraftAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val vals = partition.asInstanceOf[GraftAggPartition].values
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(vals)
      override def close(): Unit = ()
    }
  }
}
