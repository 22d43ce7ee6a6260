package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.core.Tables
import graft.sinks.{KeyedTable, Outputs}
import graft.sources.Inputs

/** Oracle-checked exercises of the source/sink surface that writes (or
  * fabricates) data and reads it back — the checks that used to be
  * spec-only because "writes aren't oracle-able". They are: write to a
  * scratch dir, read back through the public source operator, and
  * reduce to a relation DuckDB can recompute from the original parquet
  * (or from constants, for the generator sources). Only zip archives
  * (no zip testdata) and seeded PRNGs (no DuckDB analogue) remain
  * legitimately spec-only.
  */
object StorageQueries {
  import QueryDef._

  private val Dec = "decimal(12,2)"

  private def scratch(prefix: String): String =
    sys.props("java.io.tmpdir") + "/graft_" + prefix + "_" +
      java.util.UUID.randomUUID().toString

  /** Keyed upsert through the bucketed parquet table (DatastoreOutput
    * semantics — reference outputs/DatastoreOutput.java:1-50,
    * DatastoreMutationPool.java:56): build the table from customer,
    * apply a mutation batch that UPDATES every custkey ≡ 3 (mod 10)
    * (doubled balance) and INSERTS a shifted key for every custkey ≡ 7
    * (mod 100), then read the table back. The oracle computes the same
    * merge relationally (updates ∪ untouched base). Balances ride
    * DECIMAL(12,2) (doubling is exact) and cast to double at the end. */
  val upsertKeyed = sql("upsert_keyed",
    s"""WITH base AS (
          SELECT c_custkey AS k,
            CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS v
          FROM customer),
        up AS (
          SELECT c_custkey AS k,
            CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 2 AS DOUBLE) AS v
          FROM customer WHERE c_custkey % 10 = 3
          UNION ALL
          SELECT c_custkey + 1000000 AS k, CAST(c_custkey AS DOUBLE) AS v
          FROM customer WHERE c_custkey % 100 = 7)
        SELECT k, v FROM up
        UNION ALL
        SELECT b.k, b.v FROM base b
        WHERE b.k NOT IN (SELECT k FROM up)""") { (s, d) =>
    val dir = scratch("upsert")
    val cust = Tables.customer(s, d)
    val base = cust.select(col("c_custkey").as("k"),
      col("c_acctbal").cast(Dec).cast("double").as("v"))
    KeyedTable.create(base, dir, "k")
    val updates = cust.filter(col("c_custkey") % 10 === 3)
      .select(col("c_custkey").as("k"),
        (col("c_acctbal").cast(Dec) * 2).cast("double").as("v"))
      .unionByName(cust.filter(col("c_custkey") % 100 === 7)
        .select((col("c_custkey") + 1000000L).as("k"),
          col("c_custkey").cast("double").as("v")))
    KeyedTable.upsert(s, dir, updates, "k")
    KeyedTable.read(s, dir).select(col("k"), col("v"))
  }

  /** InMemoryInput (reference InMemoryInput.java:18): two shards of
    * longs, reduced to their sum — DuckDB recomputes the constant. */
  val sourceInMemory = sql("source_inmemory",
    "SELECT CAST(5050 AS BIGINT) AS total") { (s, _) =>
    import s.implicits._
    Inputs.inMemory(s, Seq((1L to 50L), (51L to 100L)).map(_.toSeq))
      .toDF("x").agg(sum(col("x")).as("total"))
  }

  /** NoInput (reference NoInput.java:20): zero records, schema intact —
    * observable as a zero count. */
  val sourceNone = sql("source_none",
    "SELECT CAST(0 AS BIGINT) AS n") { (s, _) =>
    import s.implicits._
    Inputs.none[Long](s).toDF("x").agg(count(col("x")).as("n"))
  }

  /** NDJSON write → read round trip (the BigQuery NDJSON export/load
    * pair, outputs/BigQueryGoogleCloudStorageStoreOutput.java +
    * load-side read): events' key columns survive the trip bit-exactly
    * and re-aggregate to what DuckDB computes from the parquet. */
  val sourceNdjsonRoundtrip = sql("source_ndjson_roundtrip",
    """SELECT event_type, count(*) AS cnt,
       CAST(sum(event_id) AS BIGINT) AS sum_id,
       CAST(sum(user_id) AS BIGINT) AS sum_user
       FROM events GROUP BY event_type""") { (s, d) =>
    val dir = scratch("ndjson")
    val rows = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
    Outputs.ndjson(rows, dir)
    val schema = new StructType()
      .add("event_id", LongType).add("user_id", LongType)
      .add("event_type", StringType)
    Inputs.ndjson(s, dir, Some(schema))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("event_id")).as("sum_id"),
        sum(col("user_id")).as("sum_user"))
  }

  /** CSV write → header-aware read round trip (the reference's
    * text-file output + line-input pair, typed). */
  val sourceCsvRoundtrip = sql("source_csv_roundtrip",
    """SELECT event_type, count(*) AS cnt,
       CAST(sum(event_id) AS BIGINT) AS sum_id
       FROM events GROUP BY event_type""") { (s, d) =>
    val dir = scratch("csv")
    Tables.events(s, d).select(col("event_id"), col("event_type"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    val schema = new StructType()
      .add("event_id", LongType).add("event_type", StringType)
    Inputs.csv(s, dir, Some(schema))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("event_id")).as("sum_id"))
  }

  /** ANN index MAINTENANCE: the PQ code index lives as a keyed table
    * (vec_id → code word); an ingest batch (vec_id % 5 = 0) is coded
    * with the SHARED codebook and merged in via KeyedTable.upsert —
    * O(batch) coding plus O(touched buckets) rewrite, the continuous
    * index-refresh shape of a production vector store. The invariant
    * the oracle checks: corpus-index + batch-upsert must equal coding
    * the WHOLE table in one pass (the emb_pq_codes oracle verbatim). */
  val pqIndexUpsert = sql("pq_index_upsert",
    """WITH fx AS (
         SELECT vec_id, CAST((i - 1) // 16 AS BIGINT) AS sub, i - 1 AS pos,
           CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576)
             AS BIGINT) AS fx
         FROM embeddings,
           LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) t),
       cb AS (SELECT vec_id AS code, sub, pos, fx AS cfx
              FROM fx WHERE vec_id < 16),
       dist AS (
         SELECT f.vec_id, f.sub, c.code,
           sum((f.fx - c.cfx) * (f.fx - c.cfx)) AS d2
         FROM fx f JOIN cb c ON c.sub = f.sub AND c.pos = f.pos
         GROUP BY 1, 2, 3),
       best AS (
         SELECT vec_id, sub, code, d2, row_number() OVER (
           PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
         FROM dist)
       SELECT vec_id,
         string_agg(CAST(code AS VARCHAR), '|' ORDER BY sub) AS pq,
         CAST(sum(d2) AS BIGINT) AS d2_total
       FROM best WHERE rn = 1 GROUP BY vec_id""") { (s, d) =>
    import graft.functions.VectorSearch
    val dir = scratch("pq_index")
    val emb = Tables.embeddings(s, d)
    val cb = VectorSearch.firstKPqCodebook(emb, m = 4, codesPerSub = 16)
    def codeWords(df: DataFrame): DataFrame =
      VectorSearch.pqAssignWith(df, cb)
        .groupBy(col("vec_id"))
        .agg(expr("""array_join(transform(array_sort(collect_list(
               struct(sub, code))), x -> CAST(x.code AS STRING)), '|')""")
            .as("pq"),
          sum(col("d2")).as("d2_total"))
    KeyedTable.create(codeWords(emb.where(col("vec_id") % 5 =!= 0)),
      dir, "vec_id")
    KeyedTable.upsert(s, dir,
      codeWords(emb.where(col("vec_id") % 5 === 0)), "vec_id")
    KeyedTable.read(s, dir)
      .select(col("vec_id"), col("pq"), col("d2_total"))
  }

  /** SUBSTRING-index MAINTENANCE: the winnowing anchor index lives as
    * a keyed table (doc_id → anchor count + md5 digest of the ordered
    * anchor-gram list); the indexed corpus (doc_id % 4 <> 0) creates
    * it, an ingest batch (% 4 = 0) merges in via KeyedTable.upsert,
    * and a RE-INGEST of already-indexed docs (% 8 = 1) upserts
    * identical rows — idempotent by construction. The invariant the
    * oracle checks: corpus-index + batch-upsert + re-ingest must equal
    * winnowing the WHOLE corpus in one pass, per-doc digest included
    * (the digest pins every anchor gram and its order, not just
    * counts). This is the materialized index `substr_incremental_dedup`
    * labels against, as a doc-keyed table a production pipeline
    * refreshes per ingest — O(batch) winnowing plus O(touched buckets)
    * rewrite. */
  val substrIndexUpsert = sql("substr_index_upsert",
    s"""${DataPipelineQueries7.oracleCtesFor(20, 11)}
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_anchors,
         md5(string_agg(gram, '|' ORDER BY pos)) AS sig
       FROM anch GROUP BY doc_id""") { (s, d) =>
    import graft.functions.SubstringDedup
    val dir = scratch("substr_index")
    val docs = Tables.documents(s, d)
    def perDoc(df: DataFrame): DataFrame =
      SubstringDedup.anchors(df)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_anchors"),
          md5(expr("""array_join(transform(array_sort(collect_list(
              struct(pos, g))), x -> x.g), '|')""")).as("sig"))
    val isBatch = col("doc_id") % 4 === 0
    KeyedTable.create(perDoc(docs.where(!isBatch)), dir, "doc_id")
    KeyedTable.upsert(s, dir, perDoc(docs.where(isBatch)), "doc_id")
    // re-ingest: identical rows for already-indexed docs — a no-op
    KeyedTable.upsert(s, dir,
      perDoc(docs.where(col("doc_id") % 8 === 1)), "doc_id")
    KeyedTable.read(s, dir)
      .select(col("doc_id"), col("n_anchors"), col("sig"))
  }

  /** ORC write → read round trip (the second columnar format,
    * Inputs.orc/Outputs.orc): events' key columns survive the trip
    * bit-exactly and re-aggregate to what DuckDB computes from the
    * parquet — closes the one source path that was spec-only. */
  val sourceOrcRoundtrip = sql("source_orc_roundtrip",
    """SELECT event_type, count(*) AS cnt,
       CAST(sum(event_id) AS BIGINT) AS sum_id,
       CAST(sum(user_id) AS BIGINT) AS sum_user
       FROM events GROUP BY event_type""") { (s, d) =>
    val dir = scratch("orc")
    val rows = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
    Outputs.orc(rows, dir)
    Inputs.orc(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("event_id")).as("sum_id"),
        sum(col("user_id")).as("sum_user"))
  }

  /** Schema-EVOLUTION read (Inputs.parquetEvolving): generation-1
    * files carry (event_id, event_type), generation-2 files add
    * user_id — the late-added-column shape every long-lived table
    * grows. mergeSchema unions the footers; gen-1 rows read user_id
    * as null. The oracle reproduces the evolution with a CASE that
    * nulls user_id exactly where the old files lack it, and the
    * aggregate proves both the union (counts) and the null semantics
    * (sum over the surviving user_ids only). */
  val sourceEvolvingSchema = sql("source_evolving_schema",
    """SELECT event_type, count(*) AS cnt,
       CAST(sum(CASE WHEN event_id % 2 = 0 THEN NULL ELSE user_id END)
         AS BIGINT) AS sum_user,
       CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_legacy
       FROM events GROUP BY event_type""") { (s, d) =>
    val dir = scratch("evolve")
    val ev = Tables.events(s, d)
    ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("event_type"))
      .write.parquet(s"$dir/gen1")
    ev.filter(col("event_id") % 2 =!= 0)
      .select(col("event_id"), col("event_type"), col("user_id"))
      .write.parquet(s"$dir/gen2")
    Inputs.parquetEvolving(s, s"$dir/gen1", s"$dir/gen2")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("user_id")).as("sum_user"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("n_legacy"))
  }

  /** Multi-prefix file-set read (reference
    * _GoogleCloudStorageInputReader glob expansion,
    * input_readers.py:2247-2538): events split across two directory
    * prefixes, read back as ONE input via fileSet, re-aggregated. */
  val sourceFileset = sql("source_fileset",
    """SELECT count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id
       FROM events""") { (s, d) =>
    val dir = scratch("fileset")
    val ev = Tables.events(s, d).select(col("event_id"), col("user_id"))
    ev.filter(col("event_id") % 2 === 0).write.parquet(s"$dir/shard0")
    ev.filter(col("event_id") % 2 =!= 0).write.parquet(s"$dir/shard1")
    Inputs.fileSet(s, "parquet", Seq(s"$dir/shard0", s"$dir/shard1"))
      .agg(count(lit(1)).as("cnt"), sum(col("event_id")).as("sum_id"))
  }

  /** Zip-archive line reader (reference BlobstoreZipLineInputReader,
    * input_readers.py:1604-1831): no zip file ships in the testdata, so
    * the check SYNTHESIZES one deterministically from it — a bounded
    * key sample (~1/50 of events) written as text lines across two
    * archives × two entries — then reads it back through the public
    * zipTextLines operator (binaryFile scan + streamed decode,
    * distributed) and re-aggregates. Only the tiny fixture is built on
    * the driver; the read path under test is the distributed one. */
  val sourceZipLines = sql("source_zip_lines",
    """SELECT count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id
       FROM events WHERE event_id % 50 = 0""") { (s, d) =>
    import s.implicits._
    val dir = scratch("zip")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val ids = Tables.events(s, d).filter(col("event_id") % 50 === 0)
      .select(col("event_id")).as[Long].collect().sorted
    for (archive <- 0 until 2) {
      val zout = new java.util.zip.ZipOutputStream(
        java.nio.file.Files.newOutputStream(
          java.nio.file.Paths.get(s"$dir/fixture$archive.zip")))
      try for (entry <- 0 until 2) {
        zout.putNextEntry(new java.util.zip.ZipEntry(s"part$entry.txt"))
        val lines = ids.zipWithIndex
          .filter { case (_, i) => i % 4 == archive * 2 + entry }
          .map(_._1.toString).mkString("", "\n", "\n")
        zout.write(lines.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        zout.closeEntry()
      } finally zout.close()
    }
    Inputs.zipTextLines(s, s"$dir/*.zip")
      .select(col("line").cast("long").as("event_id"))
      .agg(count(lit(1)).as("cnt"), sum(col("event_id")).as("sum_id"))
  }

  /** Hive-style partition pruning — the OTHER half of the scan story
    * (PlanSpec pins file-level `PushedFilters` elsewhere; this pins
    * directory-level `PartitionFilters`): write events partitioned by
    * event_type, read back with a partition predicate, and verify the
    * aggregate against the original table. At 100 TB a partition
    * column turns a predicate into a directory listing — whole
    * partitions never produce splits, which is layout-level pruning no
    * row-group statistic can match. The PlanSpec row asserts the
    * predicate lands in PartitionFilters (not as a data filter). */
  val scanPartitionedTable = sql("scan_partitioned_table",
    """SELECT event_type, count(*) AS cnt,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
       FROM events WHERE event_type IN ('purchase', 'signup')
       GROUP BY event_type""") { (s, d) =>
    partitionedEventsAgg(s, d)
  }

  private[queries] def partitionedEventsAgg(s: SparkSession, d: String): DataFrame = {
    val dir = scratch("part_events")
    Tables.events(s, d)
      .select(col("event_id"), col("value"), col("event_type"))
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    s.read.parquet(dir)
      .where(col("event_type").isin("purchase", "signup"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
  }

  /** Co-bucketed join — the pre-partitioned co-location story: write
    * customer and orders bucketed on the SAME key into catalog tables,
    * join them, and the shuffle disappears — both sides' bucket layout
    * already satisfies the join's distribution (PlanSpec asserts zero
    * Exchange on the join path). At 100 TB this is the difference
    * between re-shuffling two fact tables per run and paying the
    * layout cost ONCE at ingest (reference analogue: FilesByShard's
    * hash-bucketed shuffle files, java/.../shuffle/FilesByShard.java —
    * made durable and reusable instead of per-job). The oracle joins
    * the original parquet. */
  val joinBucketed = sql("join_bucketed",
    s"""SELECT c.c_mktsegment AS seg, count(*) AS cnt,
        CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1""") { (s, d) =>
    // a managed table's location can survive a previous JVM whose
    // in-memory catalog is gone — drop both name and leftover dir, or
    // saveAsTable fails with LOCATION_ALREADY_EXISTS
    def freshBucketTable(df: DataFrame, name: String, key: String): Unit = {
      s.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new java.io.File(
        new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath, name)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      if (loc.exists) rm(loc)
      Outputs.bucketTable(df, name, buckets = 8, keyCol = key)
    }
    freshBucketTable(Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment")),
      "graft_bkt_customer", "c_custkey")
    freshBucketTable(Tables.orders(s, d)
      .select(col("o_custkey"), col("o_totalprice")),
      "graft_bkt_orders", "o_custkey")
    // merge hint: at check SF the tables fit the broadcast threshold,
    // which would ALSO be exchange-free but hide the bucket-layout
    // point; the hint pins the 100 TB plan (sort-merge over
    // co-bucketed scans, no Exchange on either side)
    s.table("graft_bkt_customer").hint("merge")
      .join(s.table("graft_bkt_orders"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(Dec)).cast("double").as("total"))
  }

  /** Keyed delete through the bucketed table — the right-to-be-
    * forgotten operation (entity delete semantics; the reference's
    * DatastoreMutationPool batched deletes alongside puts): build the
    * table from customer, delete every custkey ≡ 0 (mod 5) PLUS a
    * second pass re-deleting a subset (idempotence under retry), then
    * read back. Touched buckets only are rewritten; a fully-emptied
    * bucket's partition disappears rather than resurrecting rows
    * (KeyedTableSpec pins that edge — this check pins the surviving
    * relation). */
  /** The same keyed merge through the MVCC manifest table
    * (VersionedKeyedTable) — the optimistic-concurrency store where
    * disjoint concurrent writers both commit (KeyedTable's write
    * lease instead fails the second loudly). Same mutation batch and
    * oracle as `upsert_keyed`, PLUS a delete, so the row pins upsert
    * semantics AND the emptied-bucket-as-manifest-entry path through
    * the commit protocol end to end. */
  val upsertVersioned = sql("upsert_versioned",
    s"""WITH base AS (
          SELECT c_custkey AS k,
            CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS v
          FROM customer),
        up AS (
          SELECT c_custkey AS k,
            CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 2 AS DOUBLE) AS v
          FROM customer WHERE c_custkey % 10 = 3
          UNION ALL
          SELECT c_custkey + 1000000 AS k, CAST(c_custkey AS DOUBLE) AS v
          FROM customer WHERE c_custkey % 100 = 7),
        merged AS (
          SELECT k, v FROM up
          UNION ALL
          SELECT b.k, b.v FROM base b
          WHERE b.k NOT IN (SELECT k FROM up))
        SELECT k, v FROM merged WHERE k % 5 <> 0""") { (s, d) =>
    import graft.sinks.VersionedKeyedTable
    val dir = scratch("versioned")
    val cust = Tables.customer(s, d)
    val base = cust.select(col("c_custkey").as("k"),
      col("c_acctbal").cast(Dec).cast("double").as("v"))
    VersionedKeyedTable.create(base, dir, "k")
    val updates = cust.filter(col("c_custkey") % 10 === 3)
      .select(col("c_custkey").as("k"),
        (col("c_acctbal").cast(Dec) * 2).cast("double").as("v"))
      .unionByName(cust.filter(col("c_custkey") % 100 === 7)
        .select((col("c_custkey") + 1000000L).as("k"),
          col("c_custkey").cast("double").as("v")))
    VersionedKeyedTable.upsert(s, dir, updates, "k")
    val doomed = VersionedKeyedTable.read(s, dir)
      .filter(col("k") % 5 === 0).select(col("k"))
    VersionedKeyedTable.delete(s, dir, doomed, "k")
    VersionedKeyedTable.read(s, dir).select(col("k"), col("v"))
  }

  /** Additive schema evolution through the MUTABLE store — the
    * `source_evolving_schema` analogue where generations are
    * VERSIONS: the table is created 2-column, a later put batch
    * carries a third column, and the merged read shows the new
    * column NULL for every pre-evolution row and populated for the
    * updated ones (old files read missing columns as null under the
    * evolved per-version schema). The oracle computes the same merge
    * with an explicit NULL. */
  val versionedSchemaEvolution = sql("versioned_schema_evolution",
    s"""SELECT c_custkey AS k,
          CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS v,
          CASE WHEN c_custkey % 10 = 3
            THEN CAST(c_custkey * 7 AS BIGINT) END AS extra
        FROM customer""") { (s, d) =>
    import graft.sinks.VersionedKeyedTable
    val dir = scratch("evolve")
    val cust = Tables.customer(s, d)
    VersionedKeyedTable.create(
      cust.select(col("c_custkey").as("k"),
        col("c_acctbal").cast(Dec).cast("double").as("v")), dir, "k")
    VersionedKeyedTable.upsert(s, dir,
      cust.filter(col("c_custkey") % 10 === 3)
        .select(col("c_custkey").as("k"),
          col("c_acctbal").cast(Dec).cast("double").as("v"),
          (col("c_custkey") * 7).cast("long").as("extra")), "k")
    VersionedKeyedTable.read(s, dir)
  }

  /** Snapshot time travel through the manifest log: after the same
    * create → upsert sequence, reading VERSION 1 returns the creation
    * snapshot bit-exactly — the oracle is the base relation alone,
    * so a store that mutated v1's files in place (instead of writing
    * new ones) breaks the hash. */
  val versionedTimeTravel = sql("versioned_time_travel",
    s"""SELECT c_custkey AS k,
          CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS v
        FROM customer""") { (s, d) =>
    import graft.sinks.VersionedKeyedTable
    val dir = scratch("timetravel")
    val cust = Tables.customer(s, d)
    val base = cust.select(col("c_custkey").as("k"),
      col("c_acctbal").cast(Dec).cast("double").as("v"))
    VersionedKeyedTable.create(base, dir, "k")
    VersionedKeyedTable.upsert(s, dir,
      cust.select(col("c_custkey").as("k"),
        lit(0.0).as("v")), "k")
    VersionedKeyedTable.read(s, dir, version = Some(1L))
  }

  val deleteKeyed = sql("delete_keyed",
    s"""SELECT c_custkey AS k,
          CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS v
        FROM customer WHERE c_custkey % 5 <> 0""") { (s, d) =>
    val dir = scratch("delete")
    val cust = Tables.customer(s, d)
    val base = cust.select(col("c_custkey").as("k"),
      col("c_acctbal").cast(Dec).cast("double").as("v"))
    KeyedTable.create(base, dir, "k")
    val doomed = cust.filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey").as("k"))
    KeyedTable.delete(s, dir, doomed, "k")
    // retry a subset: idempotent, nothing further changes
    KeyedTable.delete(s, dir, doomed.limit(10), "k")
    KeyedTable.read(s, dir).select(col("k"), col("v"))
  }

  val all: Seq[QueryDef] = Seq(
    upsertKeyed, upsertVersioned, versionedTimeTravel,
    versionedSchemaEvolution,
    deleteKeyed, pqIndexUpsert, substrIndexUpsert,
    sourceEvolvingSchema,
    sourceInMemory, sourceNone,
    sourceNdjsonRoundtrip, sourceCsvRoundtrip, sourceOrcRoundtrip,
    sourceFileset, sourceZipLines, scanPartitionedTable, joinBucketed)
}
