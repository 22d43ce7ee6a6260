package graft.sinks.v2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.{KeyedTable, VersionedKeyedTable}

/** The store's MAINTENANCE operations as SQL stored procedures
  * (Spark 4's DSv2 procedure contract — the `CALL` statement Iceberg
  * pioneered for exactly this):
  * {{{
  * CALL cat.compact(tbl => 't', max_files_per_bucket => 1)
  * CALL cat.cluster(tbl => 't', target_rows_per_file => 1000000)
  * CALL cat.cluster_by(tbl => 't', by_col => 'day',
  *                     target_rows_per_file => 1000000)
  * CALL cat.vacuum(tbl => 't', keep_versions => 2)
  * }}}
  * With DDL + DML already SQL-reachable, this closes the lifecycle: a
  * SQL-only user can create, load, mutate, OPTIMIZE and reclaim a
  * table without touching the programmatic API. Each call returns one
  * row of evidence — (table, version_before, version_after,
  * files_before, files_after) — so the operator sees what the
  * maintenance actually did (compaction/clustering are CDF-invisible
  * layout commits; vacuum commits nothing, only reclaims).
  *
  * All procedures resolve the table's key column from the meta
  * sidecar and REFUSE tables that predate the `key=` line — guessing
  * a layout contract is how a rewrite corrupts placement. */
object GraftProcedures {
  val ResultSchema: StructType = StructType(Seq(
    StructField("table", StringType, nullable = false),
    StructField("version_before", LongType, nullable = false),
    StructField("version_after", LongType, nullable = false),
    StructField("files_before", IntegerType, nullable = false),
    StructField("files_after", IntegerType, nullable = false)))

  val All: Seq[String] =
    Seq("compact", "cluster", "cluster_by", "vacuum", "tag", "drop_tag",
      "add_constraint", "drop_constraint", "ingest_files",
      "branch", "publish",
      "create_agg_view", "refresh_view", "drop_agg_view")

  def apply(base: String, name: String): UnboundProcedure = name match {
    case "compact" => new GraftProc(base, "compact",
      Array(
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("max_files_per_bucket", IntegerType)
          .defaultValue("1").build())) {
      def run(spark: SparkSession, dir: String, key: String,
          args: InternalRow): Unit =
        VersionedKeyedTable.compact(spark, dir, key,
          maxFilesPerBucket = args.getInt(1))
    }
    case "cluster" => new GraftProc(base, "cluster",
      Array(
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("target_rows_per_file", LongType)
          .defaultValue("1000000").build())) {
      def run(spark: SparkSession, dir: String, key: String,
          args: InternalRow): Unit =
        VersionedKeyedTable.cluster(spark, dir, key,
          targetRowsPerFile = args.getLong(1))
    }
    case "cluster_by" => new GraftProc(base, "cluster_by",
      Array(
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("by_col", StringType).build(),
        ProcedureParameter.in("target_rows_per_file", LongType)
          .defaultValue("1000000").build())) {
      def run(spark: SparkSession, dir: String, key: String,
          args: InternalRow): Unit =
        VersionedKeyedTable.clusterBy(spark, dir, key,
          args.getUTF8String(1).toString,
          targetRowsPerFile = args.getLong(2))
    }
    case "vacuum" => new GraftProc(base, "vacuum",
      Array(
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("keep_versions", IntegerType)
          .defaultValue("2").build())) {
      def run(spark: SparkSession, dir: String, key: String,
          args: InternalRow): Unit =
        VersionedKeyedTable.vacuum(spark, dir,
          keepVersions = args.getInt(1))
    }
    // `CALL cat.tag(tbl => 't', name => 'release-1')` pins the
    // LATEST complete version (or an explicit `version`) under an
    // immutable name — vacuum then retains it; drop_tag releases it.
    // Version-neutral operations: the evidence row's before == after.
    case "tag" => new GraftProc(base, "tag",
      Array(
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("version", LongType)
          .defaultValue("-1").build())) {
      def run(spark: SparkSession, dir: String, key: String,
          args: InternalRow): Unit = {
        val v = args.getLong(2)
        VersionedKeyedTable.tag(spark, dir,
          args.getUTF8String(1).toString,
          if (v < 0) None else Some(v)): Unit
      }
    }
    case "drop_tag" => new GraftProc(base, "drop_tag",
      Array(
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("name", StringType).build())) {
      def run(spark: SparkSession, dir: String, key: String,
          args: InternalRow): Unit =
        VersionedKeyedTable.deleteTag(spark, dir,
          args.getUTF8String(1).toString): Unit
    }
    // `CALL cat.add_constraint(tbl => 't', name => 'pos',
    //  check_expr => 'qty > 0')` — a named CHECK every future commit
    // enforces on every written row (existing rows validated first);
    // drop_constraint releases it. Version-neutral: before == after.
    case "add_constraint" => new GraftProc(base, "add_constraint",
      Array(
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("name", StringType).build(),
        ProcedureParameter.in("check_expr", StringType).build())) {
      def run(spark: SparkSession, dir: String, key: String,
          args: InternalRow): Unit =
        VersionedKeyedTable.addConstraint(spark, dir,
          args.getUTF8String(1).toString,
          args.getUTF8String(2).toString)
    }
    case "drop_constraint" => new GraftProc(base, "drop_constraint",
      Array(
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("name", StringType).build())) {
      def run(spark: SparkSession, dir: String, key: String,
          args: InternalRow): Unit =
        VersionedKeyedTable.dropConstraint(spark, dir,
          args.getUTF8String(1).toString): Unit
    }
    // `CALL cat.ingest_files(tbl => 't', source => '/lake/raw',
    //  format => 'parquet')` — idempotent COPY INTO: loads only files
    // not yet ingested (one upsert commit), a caught-up re-run is a
    // no-op (before == after in the evidence row).
    case "ingest_files" => new GraftProc(base, "ingest_files",
      Array(
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("source", StringType).build(),
        ProcedureParameter.in("format", StringType)
          .defaultValue("'parquet'").build())) {
      def run(spark: SparkSession, dir: String, key: String,
          args: InternalRow): Unit =
        VersionedKeyedTable.ingestFiles(spark, dir,
          args.getUTF8String(1).toString, key,
          format = args.getUTF8String(2).toString): Unit
    }
    // `CALL cat.branch(tbl => 't', name => 'dev')` — a WRITABLE
    // branch of the table as the catalog identifier `dev` (a linked
    // zero-copy clone stamped with its fork version): the WAP
    // write-audit step happens on `cat.dev` with every SQL surface;
    // `CALL cat.publish(tbl => 't', branch => 'dev')` then lands the
    // branch's NET changes back on `t` as ONE merge commit, refusing
    // if `t` advanced past the audited fork (allow_diverged => true
    // merges keyed last-writer-wins). The evidence row's
    // version_before/after show the publish commit (a no-change
    // publish has before == after).
    case "branch" => new GraftProc(base, "branch",
      Array(
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("name", StringType).build())) {
      def run(spark: SparkSession, dir: String, key: String,
          args: InternalRow): Unit =
        VersionedKeyedTable.branchFrom(spark, dir,
          s"$base/${args.getUTF8String(1).toString}"): Unit
    }
    case "publish" => new GraftProc(base, "publish",
      Array(
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("branch", StringType).build(),
        ProcedureParameter.in("allow_diverged", BooleanType)
          .defaultValue("false").build())) {
      def run(spark: SparkSession, dir: String, key: String,
          args: InternalRow): Unit =
        VersionedKeyedTable.publish(spark, dir,
          s"$base/${args.getUTF8String(1).toString}", key,
          allowDiverged = args.getBoolean(2)): Unit
    }
    // `CALL cat.create_agg_view(tbl => 't', view => 't_by_g',
    //  group_col => 'g', value_col => 'x')` — a MAINTAINED
    // per-group (cnt, total, mn, mx) rollup as its own catalog table
    // (IncrementalView full view), registered on the base so grouped
    // aggregates over `t` that match are SERVED from the view's few
    // files whenever its watermark equals the scan's snapshot
    // (GraftViewAggScan). `refresh_view` advances it from the CDF
    // (O(changed rows)); `drop_agg_view` removes the registration
    // (DROP TABLE removes the data). Version-neutral on the base.
    case "create_agg_view" => new GraftProc(base, "create_agg_view",
      Array(
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("view", StringType).build(),
        ProcedureParameter.in("group_col", StringType).build(),
        ProcedureParameter.in("value_col", StringType).build(),
        ProcedureParameter.in("buckets", IntegerType)
          .defaultValue("8").build())) {
      def run(spark: SparkSession, dir: String, key: String,
          args: InternalRow): Unit = {
        val view = args.getUTF8String(1).toString
        val groupCol = args.getUTF8String(2).toString
        val valueCol = args.getUTF8String(3).toString
        val viewDir = s"$base/$view"
        require(KeyedTable.readMeta(spark, viewDir).isEmpty,
          s"create_agg_view: table '$view' already exists")
        val schema = VersionedKeyedTable
          .snapshot(spark, dir).schema
          .getOrElse(KeyedTable.readMeta(spark, dir).get._2)
        val resolver = spark.sessionState.analyzer.resolver
        Seq(groupCol, valueCol).foreach(c =>
          require(schema.fieldNames.exists(resolver(_, c)),
            s"create_agg_view: no column '$c' in " +
              schema.fieldNames.mkString(", ")))
        graft.sinks.IncrementalView.createFromFull(spark, dir,
          viewDir, groupCol, valueCol,
          numBuckets = args.getInt(4)): Unit
        def e(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
        VersionedKeyedTable.setProperty(spark, dir,
          s"ivm.view.$view", s"${e(view)}|${e(groupCol)}|${e(valueCol)}")
      }
    }
    case "refresh_view" => new GraftProc(base, "refresh_view",
      Array(
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("view", StringType).build())) {
      def run(spark: SparkSession, dir: String, key: String,
          args: InternalRow): Unit = {
        val view = args.getUTF8String(1).toString
        val reg = VersionedKeyedTable.property(spark, dir,
          s"ivm.view.$view").getOrElse(throw new IllegalArgumentException(
            s"refresh_view: no view '$view' registered on this table " +
              "(CALL create_agg_view first)"))
        def d(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
        val Array(_, gc, vc) = reg.split('|')
        graft.sinks.IncrementalView.refreshFromCommittedFull(spark,
          dir, s"$base/$view", key, d(gc), d(vc)): Unit
      }
    }
    case "drop_agg_view" => new GraftProc(base, "drop_agg_view",
      Array(
        ProcedureParameter.in("tbl", StringType).build(),
        ProcedureParameter.in("view", StringType).build())) {
      def run(spark: SparkSession, dir: String, key: String,
          args: InternalRow): Unit =
        VersionedKeyedTable.removeProperty(spark, dir,
          s"ivm.view.${args.getUTF8String(1).toString}"): Unit
    }
    case other => throw new IllegalArgumentException(
      s"no such procedure $other (available: ${All.mkString(", ")})")
  }
}

/** One maintenance procedure: binds as itself (the parameter list is
  * static), runs the operation, returns the one-row evidence scan. */
abstract class GraftProc(base: String, procName: String,
    params: Array[ProcedureParameter])
    extends UnboundProcedure with BoundProcedure {

  def run(spark: SparkSession, dir: String, key: String,
      args: InternalRow): Unit

  override def name(): String = procName
  override def description(): String =
    s"versioned-store maintenance: $procName"
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters(): Array[ProcedureParameter] = params
  override def isDeterministic: Boolean = false // side-effecting

  override def call(input: InternalRow): util.Iterator[Scan] = {
    val spark = SparkSession.active
    val tbl = input.getUTF8String(0).toString
    val dir = s"$base/$tbl"
    if (KeyedTable.readMeta(spark, dir).isEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(Seq(tbl))
    val key = KeyedTable.readMetaKey(spark, dir).getOrElse(
      throw new UnsupportedOperationException(
        s"table $tbl records no key column in its meta sidecar — " +
          "maintenance needs the layout contract"))
    val before = VersionedKeyedTable.snapshot(spark, dir)
    run(spark, dir, key, input)
    val after = VersionedKeyedTable.snapshot(spark, dir)
    val row = InternalRow(UTF8String.fromString(tbl),
      before.version, after.version,
      before.files.valuesIterator.map(_.size).sum,
      after.files.valuesIterator.map(_.size).sum)
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = Array(row)
      override def readSchema(): StructType = GraftProcedures.ResultSchema
    }
    util.Collections.singletonList(scan).iterator()
  }
}
