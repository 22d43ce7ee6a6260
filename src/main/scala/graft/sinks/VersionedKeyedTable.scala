package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** MVCC keyed table with OPTIMISTIC multi-writer concurrency — the
  * round-10 upgrade of the one capability [[KeyedTable]] documents as
  * out of scope: its pessimistic write lease makes a second concurrent
  * writer FAIL loudly; this table lets disjoint writers BOTH SUCCEED,
  * with snapshot-isolated readers, by re-expressing the store as an
  * immutable-file manifest log (the mechanism Delta/Iceberg built into
  * a table format, reduced here to the two primitives a filesystem
  * gives: immutable data files + one atomic create-if-absent per
  * commit). The reference's analogue is DatastoreOutput, which
  * inherited transactions from the Datastore itself
  * (outputs/DatastoreOutput.java:1-50).
  *
  * Layout:
  * {{{
  *   dir/_graft_table_meta        numBuckets + data schema (immutable)
  *   dir/data/c-<uuid>/__bucket=N/part-*.parquet   immutable data files
  *   dir/_versions/v%012d         manifest: full bucket -> file listing
  * }}}
  *
  * Every version file is a FULL snapshot manifest (metadata-scale:
  * buckets × files) plus the set of buckets that commit changed. A
  * mutation never rewrites or deletes a referenced file — it writes
  * NEW files for its touched buckets and commits a new manifest, so:
  *
  *  - '''Readers are snapshot-isolated for free''': a read resolves
  *    the latest complete manifest once; every file it references is
  *    immutable, so concurrent commits cannot tear the view. Older
  *    versions stay readable (time travel) until [[vacuum]].
  *  - '''Commit is compare-and-swap''': version N+1 is claimed by an
  *    atomic create-if-absent (a hard link on local filesystems — one
  *    link(2) syscall that fails with EEXIST on conflict). The loser
  *    re-reads the log: if the intervening commits touched a DISJOINT
  *    bucket set, its already-written files are still valid and it
  *    REBASES (re-targets its manifest onto the new snapshot — no
  *    data rewrite); if they overlap, its merge inputs are stale and
  *    it RECOMPUTES from the new snapshot. Bounded retries, then a
  *    loud failure.
  *  - '''Upsert semantics are puts''' (replace-by-key with given
  *    VALUES, the Datastore entity-put contract, like KeyedTable):
  *    under an overlap retry the mutation's rows are re-applied onto
  *    the winner's state, which is exactly serializable for puts.
  *    Read-modify-write derivations must re-derive inside a caller
  *    retry loop — the standard optimistic-concurrency contract.
  *  - '''Crash safety''': a writer that dies pre-commit leaves only
  *    unreferenced files (invisible; removed by [[vacuum]]); there is
  *    no partially-applied state to recover, because visibility IS
  *    the manifest commit.
  *
  * Scale: mutations remain O(batch) — only touched buckets' files are
  * read and rewritten; manifests are metadata-scale and commits are
  * one syscall, so writer throughput is bounded by data movement, not
  * coordination. The fully-emptied-bucket edge that needed explicit
  * handling under dynamic partition overwrite disappears: an emptied
  * bucket is just an empty file list in the next manifest.
  */
object VersionedKeyedTable {

  // meta sidecar, bucket expression, and control-file IO are SHARED
  // with KeyedTable (one definition of the sidecar format and the
  // bucket function — the two stores can never silently diverge)
  private def bucketOf(keyCol: String, numBuckets: Int) =
    KeyedTable.bucket(keyCol, numBuckets)

  private def hfs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeMeta(spark: SparkSession, dir: String, numBuckets: Int,
      schema: org.apache.spark.sql.types.StructType): Unit =
    KeyedTable.writeMeta(spark, dir, numBuckets, schema)

  private def readMeta(spark: SparkSession, dir: String)
      : (Int, org.apache.spark.sql.types.StructType) =
    KeyedTable.readMeta(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"VersionedKeyedTable at $dir has no metadata sidecar"))

  // ---- manifest log ------------------------------------------------

  /** One committed table state: the version number, the full
    * bucket → data-file listing (paths relative to the table dir),
    * the buckets this version's commit changed, and the schema AT
    * THIS VERSION (None only for pre-evolution manifests — the meta
    * sidecar's creation schema governs those). */
  final case class Snapshot(version: Long, files: Map[Int, Seq[String]],
      touched: Set[Int],
      schema: Option[org.apache.spark.sql.types.StructType] = None)

  private def versionsDir(dir: String) = new Path(dir, "_versions")
  private def versionPath(dir: String, v: Long) =
    new Path(versionsDir(dir), f"v$v%012d")

  private def renderManifest(touched: Set[Int],
      files: Map[Int, Seq[String]],
      schema: org.apache.spark.sql.types.StructType): String = {
    val sb = new StringBuilder
    sb.append("touched\t").append(touched.toSeq.sorted.mkString(","))
      .append('\n')
    // per-VERSION schema: additive evolution changes it going forward
    // while time-travel reads keep each version's own (schema.json is
    // a single line — no tabs or newlines)
    sb.append("schema\t").append(schema.json).append('\n')
    files.toSeq.sortBy(_._1).foreach { case (b, fs0) =>
      fs0.foreach(f => sb.append(b).append('\t').append(f).append('\n'))
      if (fs0.isEmpty) sb.append(b).append("\t-\n") // emptied bucket
    }
    sb.append("#end\n")
    sb.toString
  }

  private def parseManifest(v: Long, txt: String): Option[Snapshot] = {
    val lines = txt.split('\n')
    // a manifest without the end marker is a torn write from a
    // non-atomic fallback scheme — skip it, an older version governs
    if (!lines.lastOption.contains("#end")) return None
    if (!lines.headOption.exists(_.startsWith("touched\t"))) return None
    val touched = lines.head.stripPrefix("touched\t").split(',')
      .filter(_.nonEmpty).map(_.toInt).toSet
    val schema = lines.find(_.startsWith("schema\t")).map(ln =>
      org.apache.spark.sql.types.DataType
        .fromJson(ln.stripPrefix("schema\t"))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    val files = scala.collection.mutable.Map.empty[Int, Vector[String]]
    lines.iterator.drop(1).takeWhile(_ != "#end").foreach { ln =>
      val t = ln.indexOf('\t')
      if (t > 0 && !ln.startsWith("schema\t")) {
        val b = ln.substring(0, t).toInt
        val f = ln.substring(t + 1)
        if (f == "-") files.getOrElseUpdate(b, Vector.empty)
        else files(b) = files.getOrElse(b, Vector.empty) :+ f
      }
    }
    Some(Snapshot(v, files.toMap, touched, schema))
  }

  private def readVersionFile(fs: FileSystem, p: Path): String =
    KeyedTable.readFully(fs, p)

  private def listVersions(fs: FileSystem, dir: String): Seq[Long] = {
    val vd = versionsDir(dir)
    if (!fs.exists(vd)) Seq.empty
    else fs.listStatus(vd).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong).sorted
  }

  /** The snapshot at `version`, or the latest complete one. */
  def snapshot(spark: SparkSession, dir: String,
      version: Option[Long] = None): Snapshot = {
    val fs = hfs(spark, dir)
    val candidates = version match {
      case Some(v) => Seq(v)
      case None => listVersions(fs, dir).reverse
    }
    candidates.iterator
      .flatMap { v =>
        val p = versionPath(dir, v)
        if (!fs.exists(p)) None
        else parseManifest(v, readVersionFile(fs, p))
      }
      .nextOption()
      .getOrElse(throw new IllegalStateException(
        s"VersionedKeyedTable at $dir has no " +
          version.fold("committed version")(v => s"complete version v$v")))
  }

  /** The next CLAIMABLE version number at or after `atLeast`: one past
    * the highest claimed name, complete or torn. A torn claim (a
    * crashed weak-scheme writer's file without `#end`) permanently
    * occupies its number — committers must skip past it, or a single
    * dead claim at latest-complete+1 would wedge the protocol forever.
    * Weak-scheme caveat, documented: a glacially slow fallback writer
    * whose claim is skipped and who then finishes lands at a number
    * BELOW the latest — readers resolve the latest complete manifest,
    * so that late commit is never observed (lost, not corrupting). */
  private def nextClaimable(fs: FileSystem, dir: String,
      atLeast: Long): Long =
    math.max(atLeast, listVersions(fs, dir).lastOption.getOrElse(0L) + 1)

  /** Atomic claim of version file `target` with `content`. Local
    * filesystems get a true CAS: content lands in a temp file and a
    * HARD LINK claims the version name — link(2) fails with EEXIST if
    * a racer won, and the content is complete the instant the name
    * exists. Other schemes fall back to create-if-absent + write,
    * whose torn-write window the `#end` marker makes detectable. */
  private def tryCommit(fs: FileSystem, dir: String, target: Path,
      content: String): Boolean = {
    fs.mkdirs(versionsDir(dir))
    if (fs.getUri.getScheme == "file") {
      val tmp = new Path(versionsDir(dir),
        s".tmp-${java.util.UUID.randomUUID()}")
      val local = (p: Path) => java.nio.file.Paths.get(
        Path.getPathWithoutSchemeAndAuthority(p).toString)
      java.nio.file.Files.write(local(tmp), content.getBytes("UTF-8"))
      try {
        java.nio.file.Files.createLink(local(target), local(tmp))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally java.nio.file.Files.deleteIfExists(local(tmp))
    } else {
      val created =
        try fs.createNewFile(target)
        catch { case _: java.io.IOException => false }
      if (created) {
        val out = fs.create(target, true)
        try out.write(content.getBytes("UTF-8")) finally out.close()
      }
      created
    }
  }

  // ---- data files --------------------------------------------------

  /** Write `withBucket` (data columns + __bucket) as immutable files
    * under a fresh commit dir; returns bucket → relative paths. The
    * partition column stays in the PATH, so data files carry the pure
    * data schema. */
  private def writeDataFiles(spark: SparkSession, dir: String,
      withBucket: DataFrame): Map[Int, Seq[String]] = {
    val rel = s"data/c-${java.util.UUID.randomUUID()}"
    withBucket.write.partitionBy("__bucket").parquet(s"$dir/$rel")
    val fs = hfs(spark, dir)
    val base = new Path(s"$dir/$rel")
    fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__bucket="))
      .map { d =>
        val b = d.getPath.getName.stripPrefix("__bucket=").toInt
        b -> fs.listStatus(d.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(f => s"$rel/__bucket=${b}/${f.getPath.getName}")
      }.toMap
  }

  // ---- public API --------------------------------------------------

  /** Create the table from a full snapshot (version 1, or a full
    * replace committed as the next version of an existing table). */
  def create(df: DataFrame, dir: String, keyCol: String,
      numBuckets: Int = 16): Unit = {
    val spark = df.sparkSession
    writeMeta(spark, dir, numBuckets, df.schema)
    val files = writeDataFiles(spark, dir,
      df.withColumn("__bucket", bucketOf(keyCol, numBuckets)))
    val fs = hfs(spark, dir)
    var v = listVersions(fs, dir).lastOption.getOrElse(0L) + 1
    val all = (0 until numBuckets)
      .map(b => b -> files.getOrElse(b, Seq.empty)).toMap
    while (!tryCommit(fs, dir, versionPath(dir, v),
        renderManifest(all.keySet, all, df.schema))) { v += 1 }
  }

  /** Read the table at the latest (or a named) version — snapshot
    * isolation by construction: every referenced file is immutable. */
  def read(spark: SparkSession, dir: String,
      version: Option[Long] = None): DataFrame = {
    val (_, metaSchema) = readMeta(spark, dir)
    val snap = snapshot(spark, dir, version)
    val schema = snap.schema.getOrElse(metaSchema)
    val paths = snap.files.values.flatten.map(f => s"$dir/$f").toSeq
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths: _*)
  }

  /** Keyed put batch: rows whose key exists are replaced, new keys
    * inserted. Optimistic: concurrent disjoint-bucket writers both
    * commit (loser rebases); overlapping writers serialize by
    * recompute-retry. */
  def upsert(spark: SparkSession, dir: String, updates: DataFrame,
      keyCol: String): Unit =
    mutate(spark, dir, updates, keyCol, isDelete = false, () => ())

  /** Keyed delete batch (same optimistic protocol; an emptied bucket
    * is just an empty manifest entry — no overwrite edge case). */
  def delete(spark: SparkSession, dir: String, keys: DataFrame,
      keyCol: String): Unit =
    mutate(spark, dir, keys, keyCol, isDelete = true, () => ())

  /** SERIALIZABLE read-modify-write: `derive` computes a put batch
    * FROM the table's current snapshot, and the commit succeeds only
    * if NO other commit landed since that snapshot was read — bucket
    * overlap is irrelevant here, because the derivation may have read
    * ANY row, so any intervening commit invalidates it and the whole
    * derivation re-runs against the new snapshot. This is the
    * primitive plain [[upsert]] (puts of given values) cannot
    * express: two concurrent `transact`-ed increments of the same key
    * both land (no lost update), where two concurrent upserts of
    * derived values would overwrite each other. Bounded retries, then
    * a loud failure.
    *
    * `derive` receives the snapshot as a DataFrame and returns the
    * put batch (full rows, table schema); it must be a pure function
    * of its input — side effects re-run per retry. */
  def transact(spark: SparkSession, dir: String, keyCol: String)(
      derive: DataFrame => DataFrame): Unit = {
    val (nb, metaSchema) = readMeta(spark, dir)
    val fs = hfs(spark, dir)
    var attempts = 0
    while (true) {
      attempts += 1
      if (attempts > 10) throw new IllegalStateException(
        s"VersionedKeyedTable at $dir: transact contention exceeded " +
          "10 attempts")
      val snap = snapshot(spark, dir)
      val snapDF = read(spark, dir, Some(snap.version))
      val batch = derive(snapDF)
        .withColumn("__bucket", bucketOf(keyCol, nb))
        .localCheckpoint(true) // pin the derivation before any racer commits
      val myTouched = batch.select("__bucket").distinct()
        .collect().map(_.getInt(0)).toSet
      if (myTouched.isEmpty) return
      val existingPaths = myTouched.toSeq.sorted
        .flatMap(b => snap.files.getOrElse(b, Seq.empty))
        .map(f => s"$dir/$f")
      val schema = snap.schema.getOrElse(metaSchema)
      // same additive-only rule as mutate: a derivation that changes
      // an existing column's type would write files later reads
      // cannot convert — refuse loudly before anything lands
      org.apache.spark.sql.types.StructType(
          batch.schema.fields.filterNot(_.name == "__bucket"))
        .fields.foreach { f =>
          schema.fields.find(_.name == f.name).foreach { cf =>
            require(cf.dataType == f.dataType,
              s"schema evolution is additive only: column '${f.name}' " +
                s"cannot change ${cf.dataType} -> ${f.dataType}")
          }
        }
      val existing =
        if (existingPaths.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else spark.read.schema(schema).parquet(existingPaths: _*)
      val merged = existing.join(
          broadcast(batch.select(col(keyCol))), Seq(keyCol), "left_anti")
        .unionByName(batch.drop("__bucket"), allowMissingColumns = true)
      val newFiles = writeDataFiles(spark, dir,
        merged.withColumn("__bucket", bucketOf(keyCol, nb))
          .localCheckpoint(true))
      val manifest = snap.files ++
        myTouched.toSeq.map(b => b -> newFiles.getOrElse(b, Seq.empty))
      // strict CAS at snapshot+1: NO rebase — any intervening commit
      // means the derivation read stale state and must re-run
      // strict CAS: any NEW COMPLETE version re-runs the derivation;
      // a lost CAS with no new complete version means a TORN claim
      // (dead weak-scheme writer) — skip past it, derivation intact
      val content = renderManifest(myTouched, manifest,
        org.apache.spark.sql.types.StructType(
          schema.fields ++ merged.schema.fields.filterNot(f =>
            schema.fieldNames.contains(f.name))))
      var target = snap.version + 1
      var committed = false
      var stale = false
      while (!committed && !stale) {
        if (tryCommit(fs, dir, versionPath(dir, target), content))
          committed = true
        else if (snapshot(spark, dir).version > snap.version)
          stale = true // someone really committed: re-derive
        else target = nextClaimable(fs, dir, target + 1) // torn claim
      }
      if (committed) return
      // stale: loop re-reads, re-derives, re-writes (orphans -> vacuum)
    }
  }

  /** Test seam: `onBeforeCommit` runs between data-file write and the
    * manifest CAS — specs inject a racing commit there to pin the
    * rebase and recompute paths deterministically. */
  private[sinks] def mutate(spark: SparkSession, dir: String,
      rows: DataFrame, keyCol: String, isDelete: Boolean,
      onBeforeCommit: () => Unit): Unit = {
    val (nb, metaSchema) = readMeta(spark, dir)
    val fs = hfs(spark, dir)
    val batch = rows.withColumn("__bucket", bucketOf(keyCol, nb))
      .localCheckpoint(true)
    val myTouched = batch.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSet // bounded by numBuckets
    if (myTouched.isEmpty) return
    var snap = snapshot(spark, dir)
    var attempts = 0
    while (true) {
      attempts += 1
      if (attempts > 20) throw new IllegalStateException(
        s"VersionedKeyedTable at $dir: commit contention exceeded 20 " +
          "attempts — backlogged writers on the same buckets")
      // merge against THIS snapshot's touched-bucket files, under
      // the snapshot's schema EVOLVED by any columns the update batch
      // adds (additive only; shared columns must keep their type) —
      // old files read the added columns as null, the parquet
      // missing-column contract the source_evolving_schema row pins
      val current = snap.schema.getOrElse(metaSchema)
      val updSchema = org.apache.spark.sql.types.StructType(
        batch.schema.fields.filterNot(_.name == "__bucket"))
      updSchema.fields.foreach { f =>
        current.fields.find(_.name == f.name).foreach { cf =>
          require(cf.dataType == f.dataType,
            s"schema evolution is additive only: column '${f.name}' " +
              s"cannot change ${cf.dataType} -> ${f.dataType}")
        }
      }
      val evolved = org.apache.spark.sql.types.StructType(
        current.fields ++
          updSchema.fields.filterNot(f =>
            current.fieldNames.contains(f.name)))
      val existingPaths = myTouched.toSeq.sorted
        .flatMap(b => snap.files.getOrElse(b, Seq.empty))
        .map(f => s"$dir/$f")
      val existing =
        if (existingPaths.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], evolved)
        else spark.read.schema(evolved).parquet(existingPaths: _*)
      val survivors = existing.join(
        broadcast(batch.select(col(keyCol))), Seq(keyCol), "left_anti")
      val merged =
        if (isDelete) survivors
        else survivors.unionByName(batch.drop("__bucket"),
          allowMissingColumns = true)
      val newFiles = writeDataFiles(spark, dir,
        merged.withColumn("__bucket", bucketOf(keyCol, nb))
          .localCheckpoint(true)) // never read a file a racer vacuums
      onBeforeCommit()
      // rebase loop: re-target the SAME written files onto newer
      // snapshots while the intervening commits stay bucket-disjoint
      var base = snap
      var target = base.version + 1
      var resolved = false
      while (!resolved) {
        // bounded like the outer loop: a rebase retry is cheap but a
        // pathological claim stream must still surface, not spin
        attempts += 1
        if (attempts > 20) throw new IllegalStateException(
          s"VersionedKeyedTable at $dir: commit contention exceeded " +
            "20 attempts — backlogged writers on this table")
        val manifest = base.files ++
          myTouched.toSeq.map(b => b -> newFiles.getOrElse(b, Seq.empty))
        // the committed schema carries forward any columns a DISJOINT
        // racer added (rebase keeps both evolutions additive)
        val commitSchema = org.apache.spark.sql.types.StructType(
          evolved.fields ++
            base.schema.getOrElse(metaSchema).fields.filterNot(f =>
              evolved.fieldNames.contains(f.name)))
        if (tryCommit(fs, dir, versionPath(dir, target),
            renderManifest(myTouched, manifest, commitSchema))) return
        val cur = snapshot(spark, dir)
        if (cur.version <= base.version) {
          // CAS lost but NO new complete version exists: the claim
          // blocking us is TORN (a dead weak-scheme writer) — skip
          // past every claimed name, same base, no data rewrite.
          // Unreachable on file:// (the hard-link CAS is atomic with
          // content, so a lost CAS always means a complete commit);
          // on weak schemes a glacially slow writer whose claim we
          // skip lands below the latest and is never observed (the
          // documented lost-not-corrupting fallback semantics).
          target = nextClaimable(fs, dir, target + 1)
        } else {
          val interveningTouched =
            (base.version + 1 to cur.version).flatMap { v =>
              val p = versionPath(dir, v)
              if (!fs.exists(p)) Seq.empty
              else parseManifest(v, readVersionFile(fs, p))
                .map(_.touched.toSeq).getOrElse(Seq.empty)
            }.toSet
          if ((interveningTouched & myTouched).nonEmpty) {
            // overlap: merge inputs are stale — recompute from the
            // winner's snapshot (puts re-apply serializably); the files
            // just written become unreferenced (vacuum removes them)
            snap = cur
            resolved = true
          } else {
            base = cur // disjoint: rebase the same files, retry the CAS
            target = math.max(base.version + 1, target)
          }
        }
      }
    }
  }

  /** Remove versions older than the latest `keepVersions` and every
    * data file none of the retained versions references. Two safety
    * rails: (a) an in-flight WRITER's files exist unreferenced between
    * its data write and its manifest CAS, so commit dirs modified
    * within `graceMs` are never touched — size it above the longest
    * expected write; (b) a reader or writer pinned to a vacuumed
    * VERSION fails loudly on its next file access — size the retention
    * window to the longest expected reader (the standard
    * optimistic-store caveat). */
  def vacuum(spark: SparkSession, dir: String,
      keepVersions: Int = 2, graceMs: Long = 900000L): Unit = {
    val fs = hfs(spark, dir)
    // retention math runs over COMPLETE versions only: counting a torn
    // claim toward keepVersions could retain nothing parseable and
    // reclaim every referenced file. Torn claims past the grace window
    // are dead weak-scheme writers — their files are reclaimed and the
    // claim name removed (a re-commit at an old number would sit below
    // the latest complete version and never be observed anyway).
    val cutoffTorn = System.currentTimeMillis() - graceMs
    val parsed = listVersions(fs, dir).map { v =>
      val p = versionPath(dir, v)
      v -> parseManifest(v, readVersionFile(fs, p))
    }
    parsed.collect { case (v, None) => v }.foreach { v =>
      val p = versionPath(dir, v)
      if (fs.getFileStatus(p).getModificationTime < cutoffTorn)
        fs.delete(p, false)
    }
    val versions = parsed.collect { case (v, Some(_)) => v }
    // file reclamation runs even when no version needs dropping: a
    // previous vacuum may have pruned the log while the grace window
    // deferred its files — re-running finishes the job
    val (drop, keep) =
      if (versions.size <= keepVersions) (Seq.empty[Long], versions)
      else versions.splitAt(versions.size - keepVersions)
    val referenced = keep.flatMap { v =>
      parseManifest(v, readVersionFile(fs, versionPath(dir, v)))
        .map(_.files.values.flatten.toSeq).getOrElse(Seq.empty)
    }.toSet
    require(keep.nonEmpty || versions.isEmpty,
      s"vacuum at $dir would retain no complete version")
    val cutoff = System.currentTimeMillis() - graceMs
    val dataDir = new Path(dir, "data")
    if (fs.exists(dataDir)) {
      fs.listStatus(dataDir).foreach { commit =>
        val rel0 = s"data/${commit.getPath.getName}"
        // a commit dir younger than the grace window may belong to an
        // in-flight writer whose manifest CAS has not happened yet
        if (commit.getModificationTime < cutoff) {
          fs.listStatus(commit.getPath).foreach { bd =>
            if (bd.isDirectory) fs.listStatus(bd.getPath).foreach { f =>
              val rel = s"$rel0/${bd.getPath.getName}/${f.getPath.getName}"
              if (f.getPath.getName.endsWith(".parquet") &&
                !referenced.contains(rel)) fs.delete(f.getPath, false)
            }
          }
        }
      }
    }
    drop.foreach(v => fs.delete(versionPath(dir, v), false))
  }
}
