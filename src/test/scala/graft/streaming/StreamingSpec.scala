package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = TestSpark.sfDir

  test("stateful sessionization matches the batch window-function result") {
    val streamed = StreamingJobs.sessionizeStateful(spark, d)
      .select("user_id", "session_no", "session_start_ms", "n_events", "total_cents")
      .collect().map(_.toSeq).toSet
    val batch = graft.queries.StreamingQueries.sessionize.fn(spark, d)
      .select("user_id", "session_no", "session_start_ms", "n_events", "total_cents")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("streaming upsert into KeyedTable: last write wins per key and " +
      "a replay leaves the table unchanged") {
    val dir = "/tmp/graft-test-stream-upsert"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(dir))
    // seed: every customer key starts at n_events = 0; streamed events
    // then upsert real per-user counts over it
    val seed = spark.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey").as("user_id"), lit(0L).as("n_events"))
    graft.sinks.KeyedTable.create(seed, dir, keyCol = "user_id")
    val result = StreamingJobs.streamUpsertKeyed(spark, d, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = graft.core.Tables.events(spark, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seeded = seed.collect().map(r => r.getLong(0) -> 0L).toMap
    assert(result === seeded ++ expected)
    // replaying the same bounded stream must not change the table
    val again = StreamingJobs.streamUpsertKeyed(spark, d, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === result)
    rm(new java.io.File(dir))
  }

  test("streaming upsert into the VERSIONED store: per-batch puts " +
      "commit through the manifest log and a replayed stream is " +
      "idempotent (same content -> same puts -> same state)") {
    import graft.sinks.VersionedKeyedTable
    val dir = "/tmp/graft-test-stream-versioned"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(dir))
    val seed = spark.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey").as("user_id"), lit(0L).as("n_events"))
    VersionedKeyedTable.create(seed, dir, keyCol = "user_id")
    def runStream(): Map[Long, Long] = {
      val qname = "graft_stream_upsert_versioned"
      spark.streams.active.filter(_.name == qname).foreach(_.stop())
      val q = StreamingJobs.eventsStream(spark, d)
        .writeStream.queryName(qname)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val up = batch.groupBy(col("user_id"))
            .agg(count(lit(1)).as("n_events"))
          VersionedKeyedTable.upsert(batch.sparkSession, dir, up,
            keyCol = "user_id")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try { q.processAllAvailable() } finally { q.stop() }
      VersionedKeyedTable.read(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val result = runStream()
    val expected = graft.core.Tables.events(spark, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seeded = seed.collect().map(r => r.getLong(0) -> 0L).toMap
    assert(result === seeded ++ expected)
    // replaying the bounded stream re-applies identical puts: state
    // unchanged, but the log RECORDS the re-application (new version)
    val v1 = VersionedKeyedTable.snapshot(spark, dir).version
    assert(runStream() === result)
    assert(VersionedKeyedTable.snapshot(spark, dir).version > v1)
    rm(new java.io.File(dir))
  }

  test("foreachBatch idempotent sink: a replayed batch does not duplicate rows") {
    val out = "/tmp/graft-test-foreachbatch"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(out))
    val written = StreamingJobs.eventsToParquetExactlyOnce(spark, d, out)
    val expected = spark.read.parquet(s"$d/events.parquet").count()
    assert(written.count() === expected)
    // simulate a sink-side retry: re-apply the SAME batch (id 0) — the
    // dynamic partition overwrite must replace, not append
    val batch0 = written.where(col("batch_id") === 0)
      .drop("batch_id").limit(1000000)
    StreamingJobs.idempotentBatchWriter(spark, out)(batch0.toDF(), 0L)
    assert(spark.read.parquet(out).count() === expected,
      "replaying batch 0 must leave the table unchanged")
  }

  test("windowed streaming agg partitions every event into exactly one window") {
    val win = StreamingJobs.windowedEventCounts(spark, d)
    val total = win.agg(sum("cnt")).collect()(0).getLong(0)
    assert(total === graft.core.Tables.events(spark, d).count())
    // windows are hour-aligned
    val aligned = win.filter(expr("win_start % 3600 != 0")).count()
    assert(aligned === 0)
  }

  test("watermarked append-mode windows are a subset of the complete result") {
    val complete = StreamingJobs.windowedEventCounts(spark, d)
      .collect().map(_.toSeq).toSet
    val appended = StreamingJobs.windowedEventCountsWatermarked(spark, d)
      .collect().map(_.toSeq).toSet
    // append emits only windows closed by the watermark — never extra rows,
    // and every emitted row must equal its complete-mode counterpart
    assert(appended.subsetOf(complete))
  }

  test("stream-stream join matches the batch join on the same condition") {
    val streamed = StreamingJobs.signupPurchaseJoin(spark, d)
      .collect().map(_.toSeq).toSet
    val ev = graft.core.Tables.events(spark, d)
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("signup_event"),
        col("ts").as("s_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_event"),
        col("ts").as("p_ts"))
    val batch = s.join(p,
        col("s_user") === col("p_user")
          && col("p_ts") >= col("s_ts")
          && col("p_ts") < col("s_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("s_user").as("user_id"), col("signup_event"),
        col("purchase_event"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty, "testdata must exercise the join")
  }

  test("GraftExtensions descriptors build working expressions and apply cleanly") {
    // extension-builder path: apply to a fresh SparkSessionExtensions
    new graft.GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions)
    // and the injected builder constructs an evaluable expression
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val (_, _, builder) = graft.GraftExtensions.functions.head
    val arr = Literal.create(ArrayData.toArrayData(Array(1.0f, 0.0f)),
      ArrayType(FloatType))
    val e = builder(Seq(arr, arr))
    assert(e.eval(null).asInstanceOf[Double] === 1.0)
    intercept[IllegalArgumentException] { builder(Seq(arr)) }
    // same function via the per-session registry path evaluates in SQL
    graft.functions.VectorExpressions.register(spark)
    assert(spark.sql("SELECT cosine_sim(array(CAST(1.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT)))").collect()(0).getDouble(0) === 1.0)
  }

  test("custom cosine expression agrees with interpreted HOF arithmetic") {
    graft.functions.VectorExpressions.register(spark)
    val e = spark.read.parquet(s"$d/embeddings.parquet").limit(50)
    val a = e.select(col("vec_id"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("eb"))
    val both = a.join(b, col("vec_id") < col("v2"))
      .withColumn("fast", expr("cosine_sim(ea, eb)"))
      .withColumn("slow", expr(
        """aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
           0D, (acc, x) -> acc + x)
           / (sqrt(aggregate(ea, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
            * sqrt(aggregate(eb, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"""))
    val bad = both.filter(col("fast") =!= col("slow")).count()
    assert(bad === 0, "codegen'd cosine must be bit-identical to HOF form")
  }

  test("durable streaming curation survives a mid-ingest crash: " +
      "restart resumes from the persisted index + fold and equals the " +
      "one-shot run; a third invocation is a no-op") {
    import graft.functions.TextCuration
    val base = "/tmp/graft-test-durable-curation"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(base))
    val cfg = TextCuration.Config(
      stopwords = TextCuration.DemoStopwords,
      classifierRounds = 2) // spec speed; invariance is rounds-agnostic
    val staged = StreamingJobs.stageIngestFiles(spark, d,
      s"$base/staging", nFiles = 3)
    assert(staged === 3)
    // run 1: injected crash after batch 1 wrote output + folded state
    // but BEFORE its checkpoint commit — the worst crash point
    StreamingJobs.streamingCurationDurable(spark, d, s"$base/out",
      s"$base/state", s"$base/staging", cfg, failAt = Some(1L))
    assert(ServingState.indexExists(spark, s"$base/state"),
      "the ServingIndex must be durably persisted by run 1")
    // run 2: loads the index (no rebuild), re-runs batch 1 under the
    // same id, finishes batch 2 against the durably folded prior
    val resumed = StreamingJobs.streamingCurationDurable(spark, d,
      s"$base/out", s"$base/state", s"$base/staging", cfg)
    def decisions(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("decision"), r.getAs[String]("reason"))).toMap
    val got = decisions(resumed)
    // one-shot reference: the batch serving operator over the whole
    // ingest with an empty prior (what an uninterrupted run computes)
    val docs = graft.core.Tables.documents(spark, d)
    val isBatch = org.apache.spark.sql.functions.col("doc_id") % 4 === 0
    val idx = TextCuration.buildServingIndex(spark,
      docs.where(!isBatch), cfg)
    val oneShot = decisions(TextCuration.servingDecisions(spark,
      docs.where(isBatch), idx, TextCuration.IngestPrior(), cfg))
    assert(got.keySet === oneShot.keySet,
      "restart must lose no documents and duplicate none")
    got.foreach { case (id, dr) =>
      assert(dr === oneShot(id), s"doc $id after crash+restart")
    }
    // run 3: nothing left to ingest — the checkpoint yields no batches
    // and the output table is unchanged (idempotent re-invocation)
    val again = decisions(StreamingJobs.streamingCurationDurable(spark, d,
      s"$base/out", s"$base/state", s"$base/staging", cfg))
    assert(again === got)
    rm(new java.io.File(base))
  }

  test("stream-stream as-of join is batch-split-invariant and equals " +
      "the batch as-of join under the final-watermark cutoff") {
    def run(n: Int): Map[Long, (Long, Option[Long], Option[Long])] = {
      val staging = java.nio.file.Files
        .createTempDirectory("graft-asof-spec").toString + "/s"
      StreamingJobs.streamingAsOfJoin(spark, d, staging, nFiles = n)
        .collect().map(r => r.getLong(1) -> ((r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    }
    val two = run(2)
    val four = run(4)
    assert(two === four,
      "micro-batch boundaries must not change as-of matches")
    // batch reference: functions.AsOf over the same sides, restricted
    // to the lefts the final watermark passed (ms-truncated like the
    // engine's watermark)
    val ev = graft.core.Tables.events(spark, d)
      .where(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ms"),
        round(col("value") * 100).cast("long").as("cents"))
    val cut = (ev.agg(max(col("ms"))).head.getLong(0) / 1000L
      - 3600000L) * 1000L
    val left = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ms"))
    val right = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ms")).agg(max(col("cents")).as("cents"))
    val batch = graft.functions.AsOf.joinAsOf(
        left, right, "user_id", "ms", "cents")
      .where(col("ms") < cut)
      .collect().map(r => r.getAs[Long]("event_id") -> ((
        r.getAs[Long]("ms"),
        Option(r.getAs[java.lang.Long]("asof_cents")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("asof_ms")).map(_.toLong)))).toMap
    assert(four === batch,
      "streaming as-of must equal the batch as-of under the cutoff")
    assert(four.values.exists(_._2.isDefined) &&
      four.values.exists(_._2.isEmpty),
      "fixture must exercise both matched and unmatched lefts")
  }

  test("session_window MERGES an event at a gap of exactly the window") {
    // Pins the boundary the session_window_native oracle encodes
    // (new session iff gap > window, i.e. merge is INCLUSIVE at exactly
    // the gap). The synthetic events table has no exact-boundary gaps,
    // so only this test exercises the semantics — measured here, since
    // the [ts, ts+gap) window notation suggests (wrongly) that an event
    // at exactly prev+gap would start a new session.
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-01-01 00:00:00"),  // opens the session
      (1L, "2024-01-01 00:30:00"),  // exactly 30min later → still merges
      (1L, "2024-01-01 01:00:01"),  // 30:01 after prev → new session
      (2L, "2024-01-01 00:00:00"),
      (2L, "2024-01-01 00:29:59"))  // merges
      .toDF("user_id", "t")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"))
    val sess = rows
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sess === Set((1L, 2L), (1L, 1L), (2L, 2L)),
      "gap == window must merge; gap > window must split")
  }
}
