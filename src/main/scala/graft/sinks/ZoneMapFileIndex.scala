package graft.sinks

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, In, LessThan,
  LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex,
  PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Catalyst-integrated zone-map data skipping for
  * [[VersionedKeyedTable]]: a [[FileIndex]] whose `listFiles` prunes
  * the snapshot's data files against the manifest's per-file key
  * (min, max) using the QUERY'S OWN predicates — the dynamic face of
  * `readRange`, where the bounds come from any `WHERE` clause on the
  * key instead of an explicit range call. Spark hands every data
  * filter to the index before split planning, so a key-localized
  * query never plans tasks for files it cannot match — the same
  * mechanism partition pruning uses, applied at FILE granularity
  * from table-format metadata (what Delta/Iceberg do with their
  * stats; reduced here to the manifest the store already keeps).
  *
  * Handled predicate shapes (conjuncts over the key column):
  * `= < <= > >= IN`, with long-typed literals; everything else keeps
  * every file (pruning is an optimization, the residual filter Spark
  * applies anyway guarantees exactness — so unknown shapes are safe,
  * never wrong). Files without recorded stats are never pruned.
  */
/** A [[FileIndex]] over an ALREADY-STATTED file list — the scan path
  * for manifest-known files (`VersionedKeyedTable.scanFiles`). Where
  * `spark.read.parquet(path, path, ...)` builds an InMemoryFileIndex
  * that re-lists every path — and past
  * `spark.sql.sources.parallelPartitionDiscovery.threshold` paths
  * launches a whole DISTRIBUTED LISTING JOB for files the manifest
  * already enumerates — this index hands Spark the statuses directly:
  * zero listing at scan build (guide §6: manifest metadata avoids
  * directory listing; the statuses come from one listStatus per
  * commit dir, see [[VersionedKeyedTable.statFiles]]). */
final class PreListedFileIndex(spark: SparkSession, root: Path,
    files: Seq[FileStatus])
    extends org.apache.spark.sql.execution.datasources
      .PartitioningAwareFileIndex(spark, Map.empty, None) {
  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSpec()
      : org.apache.spark.sql.execution.datasources.PartitionSpec =
    org.apache.spark.sql.execution.datasources.PartitionSpec.emptySpec
  override protected def leafFiles
      : scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
    files.foreach(st => m(st.getPath) = st)
    m
  }
  override protected def leafDirToChildrenFiles
      : Map[Path, Array[FileStatus]] =
    files.groupBy(_.getPath.getParent).map { case (d, fs0) =>
      d -> fs0.toArray
    }
  override def refresh(): Unit = ()
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, files.toArray))
  override def sizeInBytes: Long = files.map(_.getLen).sum
  override def inputFiles: Array[String] =
    files.map(_.getPath.toString).toArray
}

final class ZoneMapFileIndex(
    spark: SparkSession, dir: String,
    snap: VersionedKeyedTable.Snapshot, keyCol: String,
    dataSchema: StructType)
    extends FileIndex {

  // numeric pruning is sound only for columns whose recorded stats
  // are a NUMERIC IMAGE (integral values; epoch days for DATE, epoch
  // micros for TIMESTAMP — VersionedKeyedTable.statImage): a plain
  // string column's stats are its string-ordered envelope (a file
  // holding {"9","10"} records mn="10", mx="9") — parsing those as
  // longs would prune matching rows. String columns instead prune in
  // STRING order against string literals (colStrBounds). Catalyst's
  // own literal encodings line up with the images exactly: a
  // timestamp literal IS Long micros and a date literal Int days, so
  // typed predicates need no conversion here at all.
  private def numericImage(name: String): Boolean =
    dataSchema.fields.find(_.name == name)
      .exists(f => VersionedKeyedTable.hasNumericImage(f.dataType))

  private def stringTyped(name: String): Boolean =
    dataSchema.fields.find(_.name == name)
      .exists(_.dataType == org.apache.spark.sql.types.StringType)

  private val relFiles: Seq[String] = snap.files.values.flatten.toSeq
  private val statuses: Seq[FileStatus] =
    VersionedKeyedTable.statFiles(spark, dir, relFiles)
  private val statsByPath: Map[Path, (Long, Long)] =
    if (!numericImage(keyCol)) Map.empty
    else relFiles.zip(statuses).flatMap { case (rel, st) =>
      snap.stats.get(rel).flatMap { case (mn, mx) =>
        (mn.toLongOption, mx.toLongOption) match {
          case (Some(a), Some(b)) => Some(st.getPath -> (a, b))
          case _ => None // legacy string-image stats: never prune
        }
      }
    }.toMap

  /** String-keyed tables' native string envelopes, pruned in STRING
    * order against string literals. */
  private val strStatsByPath: Map[Path, (String, String)] =
    if (!stringTyped(keyCol)) Map.empty
    else relFiles.zip(statuses).flatMap { case (rel, st) =>
      snap.stats.get(rel).map(st.getPath -> _)
    }.toMap

  /** Named SECONDARY-column maps (written by clusterBy, inherited by
    * mutations): path → column → numeric (min, max). Predicates on any
    * of these columns prune exactly like key predicates. */
  private val extraByPath: Map[Path, Map[String, (Long, Long)]] =
    relFiles.zip(statuses).flatMap { case (rel, st) =>
      val perCol = snap.extraStats.getOrElse(rel, Map.empty)
        .flatMap { case (c, (mn, mx)) =>
          (mn.toLongOption, mx.toLongOption) match {
            case (Some(a), Some(b)) if numericImage(c) => Some(c -> (a, b))
            case _ => None
          }
        }
      if (perCol.isEmpty) None else Some(st.getPath -> perCol)
    }.toMap

  /** String-typed secondary maps — the clusterBy-on-a-string-column
    * layout prunes here. */
  private val extraStrByPath: Map[Path, Map[String, (String, String)]] =
    relFiles.zip(statuses).flatMap { case (rel, st) =>
      val perCol = snap.extraStats.getOrElse(rel, Map.empty)
        .filter { case (c, _) => stringTyped(c) }
      if (perCol.isEmpty) None else Some(st.getPath -> perCol)
    }.toMap

  private val extraCols: Set[String] =
    extraByPath.valuesIterator.flatMap(_.keysIterator).toSet ++
      extraStrByPath.valuesIterator.flatMap(_.keysIterator)

  /** Observability for specs and in-row assertions: (files listed for
    * the last query, total files in the snapshot). */
  @volatile var lastListed: (Int, Int) = (relFiles.size, relFiles.size)

  override def rootPaths: Seq[Path] = Seq(new Path(dir))
  override def partitionSchema: StructType = new StructType()
  override def inputFiles: Array[String] =
    statuses.map(_.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.map(_.getLen).sum

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def nameOf(e: Expression): Option[String] = e match {
    case a: Attribute if a.name == keyCol || extraCols(a.name) =>
      Some(a.name)
    case _ => None
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case _ => None
  }

  private def strLit(e: Expression): Option[String] = e match {
    case Literal(u: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) => Some(u.toString)
    case _ => None
  }

  /** Per-COLUMN string intervals implied by conjuncts over
    * STRING-typed key/stats columns. Strict bounds stay inclusive
    * (strings have no +1) — conservative, never wrong. All
    * comparisons run in UTF-8 BINARY order
    * ([[VersionedKeyedTable.Utf8Ord]]) — the order Spark aggregated
    * the envelopes in; java.lang.String order diverges on
    * supplementary-plane characters and would prune matching files. */
  private val utf8 = VersionedKeyedTable.Utf8Ord
  private def colStrBounds(filters: Seq[Expression])
      : Map[String, (Option[String], Option[String])] = {
    val bounds = scala.collection.mutable
      .Map.empty[String, (Option[String], Option[String])]
    def raiseLo(c: String, v: String): Unit = {
      val (lo, hi) = bounds.getOrElse(c, (None, None))
      bounds(c) = (Some(lo.fold(v)(l => utf8.max(l, v))), hi)
    }
    def lowerHi(c: String, v: String): Unit = {
      val (lo, hi) = bounds.getOrElse(c, (None, None))
      bounds(c) = (lo, Some(hi.fold(v)(h => utf8.min(h, v))))
    }
    def strName(e: Expression): Option[String] =
      nameOf(e).filter(stringTyped)
    filters.flatMap(conjuncts).foreach {
      case EqualTo(a, l) if strName(a).isDefined && strLit(l).isDefined =>
        raiseLo(strName(a).get, strLit(l).get)
        lowerHi(strName(a).get, strLit(l).get)
      case EqualTo(l, a) if strName(a).isDefined && strLit(l).isDefined =>
        raiseLo(strName(a).get, strLit(l).get)
        lowerHi(strName(a).get, strLit(l).get)
      case GreaterThanOrEqual(a, l)
          if strName(a).isDefined && strLit(l).isDefined =>
        raiseLo(strName(a).get, strLit(l).get)
      case GreaterThan(a, l)
          if strName(a).isDefined && strLit(l).isDefined =>
        raiseLo(strName(a).get, strLit(l).get)
      case LessThanOrEqual(a, l)
          if strName(a).isDefined && strLit(l).isDefined =>
        lowerHi(strName(a).get, strLit(l).get)
      case LessThan(a, l)
          if strName(a).isDefined && strLit(l).isDefined =>
        lowerHi(strName(a).get, strLit(l).get)
      case GreaterThanOrEqual(l, a)
          if strName(a).isDefined && strLit(l).isDefined =>
        lowerHi(strName(a).get, strLit(l).get)
      case GreaterThan(l, a)
          if strName(a).isDefined && strLit(l).isDefined =>
        lowerHi(strName(a).get, strLit(l).get)
      case LessThanOrEqual(l, a)
          if strName(a).isDefined && strLit(l).isDefined =>
        raiseLo(strName(a).get, strLit(l).get)
      case LessThan(l, a)
          if strName(a).isDefined && strLit(l).isDefined =>
        raiseLo(strName(a).get, strLit(l).get)
      case In(a, vs) if strName(a).isDefined && vs.nonEmpty &&
          vs.forall(strLit(_).isDefined) =>
        val set = vs.map(strLit(_).get)
        raiseLo(strName(a).get, set.min(utf8))
        lowerHi(strName(a).get, set.max(utf8))
      case _ => () // unknown shape: contributes no bound (never prunes)
    }
    bounds.toMap
  }

  /** Per-COLUMN intervals [lo, hi] implied by the filters' conjuncts
    * over the key column and every named stats column (None bound =
    * unbounded); IN-sets contribute their min/max. */
  private def colBounds(filters: Seq[Expression])
      : Map[String, (Option[Long], Option[Long])] = {
    val bounds = scala.collection.mutable
      .Map.empty[String, (Option[Long], Option[Long])]
    def raiseLo(c: String, v: Long): Unit = {
      val (lo, hi) = bounds.getOrElse(c, (None, None))
      bounds(c) = (Some(lo.fold(v)(math.max(_, v))), hi)
    }
    def lowerHi(c: String, v: Long): Unit = {
      val (lo, hi) = bounds.getOrElse(c, (None, None))
      bounds(c) = (lo, Some(hi.fold(v)(math.min(_, v))))
    }
    filters.flatMap(conjuncts).foreach {
      case EqualTo(a, l) if nameOf(a).isDefined && longLit(l).isDefined =>
        raiseLo(nameOf(a).get, longLit(l).get)
        lowerHi(nameOf(a).get, longLit(l).get)
      case EqualTo(l, a) if nameOf(a).isDefined && longLit(l).isDefined =>
        raiseLo(nameOf(a).get, longLit(l).get)
        lowerHi(nameOf(a).get, longLit(l).get)
      case GreaterThanOrEqual(a, l)
          if nameOf(a).isDefined && longLit(l).isDefined =>
        raiseLo(nameOf(a).get, longLit(l).get)
      case GreaterThan(a, l)
          if nameOf(a).isDefined && longLit(l).isDefined =>
        raiseLo(nameOf(a).get, longLit(l).get + 1)
      case LessThanOrEqual(a, l)
          if nameOf(a).isDefined && longLit(l).isDefined =>
        lowerHi(nameOf(a).get, longLit(l).get)
      case LessThan(a, l)
          if nameOf(a).isDefined && longLit(l).isDefined =>
        lowerHi(nameOf(a).get, longLit(l).get - 1)
      case GreaterThanOrEqual(l, a)
          if nameOf(a).isDefined && longLit(l).isDefined =>
        lowerHi(nameOf(a).get, longLit(l).get)
      case GreaterThan(l, a)
          if nameOf(a).isDefined && longLit(l).isDefined =>
        lowerHi(nameOf(a).get, longLit(l).get - 1)
      case LessThanOrEqual(l, a)
          if nameOf(a).isDefined && longLit(l).isDefined =>
        raiseLo(nameOf(a).get, longLit(l).get)
      case LessThan(l, a)
          if nameOf(a).isDefined && longLit(l).isDefined =>
        raiseLo(nameOf(a).get, longLit(l).get + 1)
      case In(a, vs) if nameOf(a).isDefined && vs.nonEmpty &&
          vs.forall(longLit(_).isDefined) =>
        val set = vs.map(longLit(_).get)
        raiseLo(nameOf(a).get, set.min); lowerHi(nameOf(a).get, set.max)
      case _ => () // unknown shape: contributes no bound (never prunes)
    }
    bounds.toMap
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val bounds = colBounds(dataFilters)
    val sBounds = colStrBounds(dataFilters)
    def survives[T](stats: Option[(T, T)],
        b: Option[(Option[T], Option[T])])(
        implicit ord: Ordering[T]): Boolean =
      (stats, b) match {
        case (Some((mn, mx)), Some((lo, hi))) =>
          lo.forall(ord.gteq(mx, _)) && hi.forall(ord.lteq(mn, _))
        case _ => true // no map or no bound for this column: must read
      }
    val kept = statuses.filter { st =>
      survives(statsByPath.get(st.getPath), bounds.get(keyCol)) &&
        survives(strStatsByPath.get(st.getPath), sBounds.get(keyCol))(
          utf8) &&
        bounds.forall { case (c, b) =>
          c == keyCol ||
            survives(extraByPath.get(st.getPath).flatMap(_.get(c)),
              Some(b))
        } &&
        sBounds.forall { case (c, b) =>
          c == keyCol ||
            survives(extraStrByPath.get(st.getPath).flatMap(_.get(c)),
              Some(b))(utf8)
        }
    }
    lastListed = (kept.size, statuses.size)
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }
}
