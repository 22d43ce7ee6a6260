package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.mr.{CounterNames, Counters, MapReduceSpecification, Mapper,
  Pipeline, Reducer}

/** The capstone manifest's composition contract: the decision column
  * partitions the corpus, reasons map to decisions per the policy
  * table, the priority order is what the scaladoc promises, and the
  * per-reason NAMED COUNTERS ride the MR counter machinery
  * (Pipeline.runWithResult) in agreement with the relational
  * aggregation — the chained-job accounting the reference's
  * ChainedMapReduceJob surfaces through its counters map. */
class TextCurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val manifest = {
    val docs = graft.core.Tables.documents(spark, TestSpark.sfDir)
    val sh = TextDedup.shingles(docs)
    TextCuration.manifest(spark, docs, sh,
      TextCuration.Config(stopwords = graft.functions.TextCuration.DemoStopwords))
      .localCheckpoint(true)
  }

  test("manifest covers every document exactly once with a valid " +
      "(decision, reason) pair") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sfDir)
    assert(manifest.count() === docs.count())
    assert(manifest.select(col("doc_id")).distinct().count() === docs.count())
    val pairs = manifest.select(col("decision"), col("reason"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val dropReasons = Set("benchmark_member", "exact_dup", "near_dup",
      "contaminated", "low_quality", "classifier_reject")
    pairs.foreach {
      case ("keep", r)   => assert(r === "clean")
      case ("redact", r) => assert(r === "dup_spans")
      case ("drop", r)   => assert(dropReasons.contains(r), r)
      case (d, r)        => fail(s"unknown decision $d (reason $r)")
    }
  }

  test("priority order: a reason implies every higher-priority gate " +
      "passed (signals are on the row, so this is checkable per doc)") {
    manifest.collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val exact = r.getAs[Int]("exact_dup")
      val near = r.getAs[Int]("near_dup")
      val dupChars = r.getAs[Long]("dup_chars")
      val obp = r.getAs[Long]("overlap_bp")
      val qp = r.getAs[Int]("quality_pass")
      val margin = r.getAs[Long]("margin")
      val expected =
        if (id % 7 == 0) "benchmark_member"
        else if (exact == 1) "exact_dup"
        else if (near == 1) "near_dup"
        else if (obp >= 1000) "contaminated"
        else if (qp == 0) "low_quality"
        else if (margin <= 0) "classifier_reject"
        else if (dupChars > 0 || obp > 0) "dup_spans"
        else "clean"
      assert(r.getAs[String]("reason") === expected, s"doc $id")
    }
  }

  test("servingDecisions is batch-split-invariant: two sequential " +
      "micro-batches with folded IngestPrior == the one-shot run") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sfDir)
    val isBatch = col("doc_id") % 4 === 0
    val cfg = TextCuration.Config(stopwords = graft.functions.TextCuration.DemoStopwords,
      classifierRounds = 2) // spec speed; invariance is rounds-agnostic
    val idx = TextCuration.buildServingIndex(spark,
      docs.where(!isBatch), cfg)
    def collectDecisions(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("decision"), r.getAs[String]("reason"))).toMap
    val oneShot = collectDecisions(TextCuration.servingDecisions(spark,
      docs.where(isBatch), idx, TextCuration.IngestPrior(), cfg))
    // split the ingest in doc_id order at the median batch id
    val ids = docs.where(isBatch).select(col("doc_id"))
      .collect().map(_.getLong(0)).sorted
    val mid = ids(ids.length / 2)
    val b1 = docs.where(isBatch && col("doc_id") < mid)
    val b2 = docs.where(isBatch && col("doc_id") >= mid)
    val first = collectDecisions(TextCuration.servingDecisions(spark,
      b1, idx, TextCuration.IngestPrior(), cfg))
    val b1Sh = TextDedup.shingles(b1)
    val prior = TextCuration.IngestPrior(
      hashes = Some(b1.select(md5(col("text")).as("h")).distinct()),
      shingles = Some(b1Sh),
      grams = Some(SubstringDedup.anchors(b1).select(col("g")).distinct()),
      bands = Some(TextDedup.lshBands(
        TextDedup.minhashSignatures(b1Sh, numHashes = 12),
        bands = 4, rowsPerBand = 3)))
    val second = collectDecisions(TextCuration.servingDecisions(spark,
      b2, idx, prior, cfg))
    val split = first ++ second
    // decisions must match; reasons may shift only between the
    // equivalent duplicate labels (an earlier-batch exact dup labels
    // batch_exact_dup either way; an earlier-batch NEAR dup labels
    // near_dup either way via the folded corpus side)
    assert(split.keySet === oneShot.keySet)
    split.foreach { case (id, (dec, reason)) =>
      assert(dec === oneShot(id)._1, s"doc $id decision")
      assert(reason === oneShot(id)._2, s"doc $id reason")
    }
  }

  test("byte-tier scrub: hex-space stitching equals an independent " +
      "byte-splicing reference, and spans really split codepoints") {
    import org.apache.spark.sql.functions._
    val docs2 = graft.core.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), expr("replace(text, 'e', 'é')").as("text"))
    val anch = SubstringDedup.anchorsBytes(docs2).localCheckpoint(true)
    val spans = SubstringDedup.duplicatedSpans(
      SubstringDedup.duplicatedAnchors(anch)).localCheckpoint(true)
    val spanRows = spans.collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Int]("span_start"), r.getAs[Int]("span_end")))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted).toMap
    assert(spanRows.nonEmpty, "fixture must produce duplicated byte spans")
    // the engine path: spans embedded into hex space, char scrub algebra
    val hexDocs = docs2.select(col("doc_id"),
      hex(encode(col("text"), "UTF-8")).as("hx"))
    val hexSpans = spans.select(col("doc_id"),
      (col("span_start") * 2 - 1).as("span_start"),
      (col("span_end") * 2).as("span_end"))
    val engine = SubstringDedup.scrub(hexDocs, hexSpans, textCol = "hx")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text_scrubbed")).toMap
    // the reference path: splice the UTF-8 byte array directly
    val texts = docs2.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    var boundaryInsideCodepoint = 0
    texts.foreach { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val ss = spanRows.getOrElse(id, Array.empty[(Int, Int)])
      val buf = new java.io.ByteArrayOutputStream()
      var cur = 0 // 0-based next byte to keep
      ss.foreach { case (s1, e1) =>
        buf.write(bytes, cur, (s1 - 1) - cur) // spans are 1-based inclusive
        cur = math.min(e1, bytes.length)
        def isCont(i: Int) = i >= 0 && i < bytes.length &&
          (bytes(i) & 0xc0) == 0x80
        // a span boundary lands mid-codepoint when the first removed
        // byte or the first kept byte after it is a continuation byte
        if (isCont(s1 - 1) || isCont(e1)) boundaryInsideCodepoint += 1
      }
      if (cur < bytes.length) buf.write(bytes, cur, bytes.length - cur)
      val refHex = buf.toByteArray.map(b => f"${b & 0xff}%02X").mkString
      assert(engine(id) === refHex, s"doc $id byte stitch")
    }
    assert(boundaryInsideCodepoint > 0,
      "fixture must exercise spans whose cuts split an 'é' in half")
  }

  test("per-reason counters through Pipeline.runWithResult agree with " +
      "the relational aggregation; mapper-calls == corpus size") {
    import spark.implicits._
    val rows = manifest
      .select(col("doc_id"), col("reason")).as[(Long, String)]
    // named per-reason counters — the ChainedMapReduceJob accounting:
    // the mapper closes over its own Counters (accumulators registered
    // on the driver, updated exactly-once per successful task)
    val counters = new Counters(spark)
    // accumulators must be registered on the DRIVER before the closure
    // ships (an executor-side counter() call has no SparkContext):
    // pre-declare one named counter per policy reason
    Seq("benchmark_member", "exact_dup", "near_dup", "contaminated",
      "low_quality", "classifier_reject", "dup_spans", "clean")
      .foreach(r => counters.counter("reason:" + r))
    val spec = MapReduceSpecification[(Long, String), String, Long,
        (String, Long)](
      jobName = "curation-reason-count",
      input = rows,
      mapper = new Mapper[(Long, String), String, Long] {
        def map(in: (Long, String), emit: (String, Long) => Unit): Unit = {
          counters.counter("reason:" + in._2).add(1L)
          emit(in._2, 1L)
        }
      },
      reducer = new Reducer[String, Long, (String, Long)] {
        def reduce(k: String, vs: Iterator[Long],
            emit: ((String, Long)) => Unit): Unit = emit((k, vs.sum))
      })
    val res = Pipeline.runWithResult(spec)
    val fromJob = res.output.collect().toMap
    val fromSql = manifest.groupBy(col("reason")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromJob === fromSql)
    val fromCounters = counters.snapshot.collect {
      case (k, v) if k.startsWith("reason:") && v > 0 =>
        k.stripPrefix("reason:") -> v
    }
    assert(fromCounters === fromSql)
    assert(res.counters(CounterNames.MapperCalls) === manifest.count())
    assert(res.progress.stagesRunning === 0L)
  }
}
