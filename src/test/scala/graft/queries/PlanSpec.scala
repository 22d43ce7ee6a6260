package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Physical-plan assertions: the properties that decide whether a query
  * survives a 100× scale-up. A query can be value-correct and still
  * wrong at 100 TB — these specs pin the plan shape itself:
  * filters reach the parquet scan (row-group pruning), projections prune
  * the read schema (columnar IO), small dims broadcast (no fact-side
  * shuffle), aggregation is partial before the exchange (map-side
  * combine), and top-k never materializes a global sort. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = TestSpark.sfDir

  private def plan(name: String): String =
    Registry.queries(name)(spark, d).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** True when some Window node in the physical plan is fed by an
    * `Exchange SinglePartition` directly beneath it (through the
    * Sort/Project the planner inserts) — the corpus-scale
    * single-partition-window shape. Traverses the actual plan tree
    * instead of two independent substring checks, so an unrelated
    * bounded aggregate legitimately using SinglePartition can never
    * fail it spuriously, and a real single-partition window can never
    * hide behind the absence of the literal elsewhere. */
  private def hasSinglePartitionWindow(name: String): Boolean = {
    import org.apache.spark.sql.execution.{ProjectExec, SortExec, SparkPlan}
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        unwrap(a.executedPlan)
      case other => other
    }
    def fedBySinglePartition(p: SparkPlan): Boolean = p match {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.outputPartitioning.numPartitions == 1
      case s: SortExec => fedBySinglePartition(s.child)
      case pr: ProjectExec => fedBySinglePartition(pr.child)
      case _ => false
    }
    unwrap(Registry.queries(name)(spark, d).queryExecution.executedPlan)
      .collect {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          fedBySinglePartition(w.child)
      }.exists(identity)
  }

  test("agg_q1: shipdate filter is pushed to the parquet scan") {
    val p = plan("agg_q1")
    assert(p.contains("PushedFilters"), p.take(500))
    assert(p.contains("LessThanOrEqual(l_shipdate"),
      "date range must reach the scan for row-group pruning")
  }

  test("agg_q1: aggregation is split partial/final around the exchange") {
    val p = plan("agg_q1")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expect map-side partial aggregation (the combiner, for free)")
  }

  test("scan_filter_range: conjunctive filters reach the scan") {
    val p = plan("scan_filter_range")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"))
    assert(p.contains("EqualTo(o_orderstatus,F)"))
  }

  test("scan_keys_only: read schema is pruned to the key column") {
    val p = plan("scan_keys_only")
    assert(p.contains("ReadSchema: struct<c_custkey:bigint>"),
      "keys-only scan must not read other columns")
  }

  test("scan_log_window: time range is pushed down on the events scan") {
    val p = plan("scan_log_window")
    // ts is read as raw nanos (legacy long), so pushdown happens on the
    // derived filter; assert the scan at least prunes columns
    assert(p.contains("ReadSchema") &&
      !p.contains("props"), "events scan must prune unused columns")
  }

  test("join_broadcast: the part dimension broadcasts") {
    val p = plan("join_broadcast")
    assert(p.contains("BroadcastHashJoin"),
      "small dim must broadcast — no shuffle of the fact side")
    assert(!p.contains("SortMergeJoin"))
  }

  test("join_q3: mktsegment filter is pushed below the joins") {
    val p = plan("join_q3")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      "dim filter must reach the customer scan, not run post-join")
  }

  test("topk executes as TakeOrderedAndProject, not a global sort") {
    val p = plan("topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("join_anti plans as an anti join, not a cartesian") {
    val p = plan("join_anti")
    assert(p.contains("LeftAnti"), p.take(300))
    assert(!p.contains("Cartesian"))
  }

  test("distinct_keys aggregates partially before the exchange") {
    val p = plan("distinct_keys")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("window queries shuffle once on the partition key") {
    val p = plan("window_rownum")
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size === 1,
      "one shuffle for the window partition, no extra exchanges")
  }

  test("join_range keeps the equi key as join key; band is residual") {
    val p = plan("join_range")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"),
      "equi+band join must not degrade to a nested-loop/cartesian")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("text_editdist broadcasts the probe sample over the corpus") {
    val p = plan("text_editdist")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "tiny probe side must broadcast; corpus side streams")
  }

  test("agg_grouping_sets expands once and aggregates partial/final") {
    val p = plan("agg_grouping_sets")
    assert(p.contains("Expand"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("window_range_frame shuffles once on the partition key") {
    val p = plan("window_range_frame")
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size === 1,
      "one shuffle for the window partition, no extra exchanges")
    assert(p.contains("Window"))
  }

  test("dedup pair joins are equi joins, never cartesian") {
    for (q <- Seq("dedup_jaccard", "dedup_minhash_lsh")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q: candidate pairs must come from equi joins on shingle/band keys")
    }
  }

  test("srp candidate generation is an equi join on (table, sig) — " +
      "never cartesian, embeddings not carried through the explode") {
    val cand = graft.functions.VectorSearch.srpLshCandidatePairs(
      graft.core.Tables.embeddings(spark, d), bits = 6, tables = 8)
    val p = cand.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "OR-amplified candidates must come from per-table equi joins")
    // the join keys are the exploded (t, sig) pair
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"))
    // candidate generation shuffles L small signature rows per vector,
    // not L embedding copies: no exchange carries the embedding column
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(!_.contains("embedding")),
      s"embedding must not shuffle in candidate generation:\n${exchanges.mkString("\n")}")
  }

  test("window_sliding shuffles once on the partition key") {
    val p = plan("window_sliding")
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size === 1,
      "sliding ROWS frame must reuse the single window shuffle")
    assert(p.contains("Window"))
  }

  test("subquery_scalar broadcasts the one-row aggregate") {
    val p = plan("subquery_scalar")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the scalar must broadcast; the fact side must not shuffle")
    assert("""\(\d+\) Exchange hashpartitioning""".r.findAllIn(p).isEmpty,
      "no hash exchange anywhere: scalar compare is map-side work")
  }

  test("topk_per_group broadcasts the part dimension") {
    val p = plan("topk_per_group")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("join_salted leaves no salt column in the output") {
    val df = Registry.queries("join_salted")(spark, d)
    assert(!df.columns.contains("_salt"))
  }

  test("subquery_correlated aggregates partially before its exchange") {
    val p = plan("subquery_correlated")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(!p.contains("CartesianProduct"))
  }

  test("decontaminate probes the benchmark set as a broadcast semi-join") {
    val p = plan("decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "the held-out set must broadcast; the corpus side must stream")
  }

  test("timeseries_fill joins the generated spine without a cartesian") {
    val p = plan("timeseries_fill")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("LeftOuter"), "missing days must come from the spine")
  }

  test("quality_funnel is one scan + one aggregate, no data shuffle") {
    val p = plan("quality_funnel")
    // formatted explain names each scan twice (tree + details): count
    // the Location lines, one per physical scan node
    assert("Location: InMemoryFileIndex".r.findAllIn(p).size === 1,
      "every rule must ride the same single scan")
    assert(!p.contains("hashpartitioning"),
      "a global aggregate needs no hash exchange — partials meet at one partition")
  }

  test("text_curation_manifest: tiers meet in keyed joins — no cartesian, " +
      "bounded relations broadcast, shuffle count stays pinned") {
    val p = plan("text_curation_manifest")
    assert(!p.contains("CartesianProduct"))
    assert(!hasSinglePartitionWindow("text_curation_manifest"),
      "no corpus-scale single-partition window")
    // the benchmark 5-gram set and the classifier weight relation are
    // bounded (eval suite / bucket space) and must broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "bench grams + classifier weights must broadcast")
    // shuffle-count pin: each tier contributes its own keyed
    // exchange(s) plus the per-doc assembly joins; the composition must
    // not silently grow extra corpus shuffles. 30 is the measured shape
    // with headroom of ~20% — a jump past it means a tier lost its
    // broadcast or a join lost its keys.
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 30,
      s"manifest plan grew to $exchanges exchanges — a tier regressed")
  }

  test("text_curation_apply: scrub/assembly stays keyed — no cartesian, " +
      "one shared anchor scan, bounded exchanges") {
    val p = plan("text_curation_apply")
    assert(!p.contains("CartesianProduct"))
    // the winnowing anchor relation is checkpointed ONCE and shared by
    // the manifest's dup-span tier and the apply step's scrub spans —
    // a second Scan of the documents parquet for anchors would show as
    // extra FileScans; the apply plan reads only checkpointed RDDs +
    // the documents scan for the text join
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 16,
      s"apply plan grew to $exchanges exchanges — a tier regressed")
  }

  test("text_curation_apply_bytes: the byte-tier apply keeps the apply " +
      "plan shape — no cartesian, bounded exchanges (hex embedding is " +
      "pure column arithmetic, not a new exchange class)") {
    val p = plan("text_curation_apply_bytes")
    assert(!p.contains("CartesianProduct"))
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 16,
      s"byte apply plan grew to $exchanges exchanges — a tier regressed")
  }

  test("join_q10: filters reach both fact scans, nation broadcasts, top-k avoids global sort") {
    val p = plan("join_q10")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "returnflag filter must reach the lineitem scan")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "date window must reach the orders scan")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must not materialize a global sort")
  }

  test("agg_salted_sum: both stages aggregate partially before their exchange") {
    val p = plan("agg_salted_sum")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "two stages x partial/final halves")
  }

  test("emb_quantize broadcasts the per-dimension stats") {
    val p = plan("emb_quantize")
    assert(p.contains("BroadcastHashJoin"),
      "64-row stats must broadcast — vector rows never shuffle")
    assert(!p.contains("SortMergeJoin"))
  }

  test("ann_ivf_top1: in-cell search is an equi join, never a cartesian") {
    val p = plan("ann_ivf_top1")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("cosine_sim"),
      "similarity must run through the codegen'd expression")
  }

  test("tpch_q2: dims broadcast; the min-cost rank needs no extra exchange") {
    val p = plan("tpch_q2")
    assert(p.contains("BroadcastHashJoin"),
      "supplier/nation/region and the filtered part list must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("EqualTo(p_size,15)"),
      "part filters must reach the part scan")
  }

  test("tpch_q4: EXISTS plans as a semi join with the lateness residual") {
    val p = plan("tpch_q4")
    assert(p.contains("LeftSemi"), p.take(300))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "date window must reach the orders scan")
  }

  test("tpch_q11: ONE fact pass — rollup supplies per-part sums and the " +
      "total together; the total broadcasts; lineitem is never rescanned") {
    val p = plan("tpch_q11")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "one-row total must broadcast against the grouped relation")
    // the single lineitem scan ran inside the eager rollup
    // materialization; the final plan reads the checkpointed aggregate
    // on BOTH sides — a second FileScan here would mean 2x fact IO
    assert(!p.contains("FileScan"),
      "fact table must not be rescanned for the global total:\n" + p.take(800))
    assert(p.contains("ExistingRDD"),
      "both sides must read the materialized rollup:\n" + p.take(800))
  }

  test("media_band_funnel: truth tier is a nested loop with the Hamming " +
      "test as the join residual — pairs never materialize past it") {
    val p = plan("media_band_funnel")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "exhaustive tier must be one broadcast nested loop")
    assert(!p.contains("CartesianProduct"))
    // the residual lives IN the join: in formatted explain the BNLJ's
    // details carry a "Join condition:" line — the Hamming bit_count
    // must appear there, so only surviving pairs flow out of the loop
    assert(p.linesIterator.exists(l =>
      l.contains("Join condition:") && l.contains("bit_count")),
      "Hamming test must be the BNLJ residual, not a post-join filter " +
        s"over the n^2 pair relation:\n${p.take(1200)}")
  }

  test("tpch_q15: scalar max broadcasts; winner selection is map-side") {
    val p = plan("tpch_q15")
    // the one-row max may plan as BNLJ or as a broadcast cross BHJ —
    // either way the revenue relation must not shuffle for the compare
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin Cross"), p.take(400))
    assert(!p.contains("CartesianProduct"))
  }

  test("tpch_q16: complaint suppliers exclude via broadcast ANTI join") {
    val p = plan("tpch_q16")
    assert(p.contains("LeftAnti"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("tpch_q19: disjunctive residual rides the broadcast part join") {
    val p = plan("tpch_q19")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("tpch_q21: lateness flags come from grouped passes, never correlated probes") {
    val p = plan("tpch_q21")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 must not materialize a global sort")
  }

  test("vocab_oov: the vocabulary probes as a broadcast join") {
    val p = plan("vocab_oov")
    assert(p.contains("BroadcastHashJoin"),
      "top-100 vocab must broadcast; the token stream must not shuffle")
  }

  test("seq_pack: packing reuses the source partitioning for the batch aggregate") {
    val p = plan("seq_pack")
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size === 1,
      "window partitioning by source must satisfy the (source, batch) " +
        "aggregate's distribution — no second exchange")
  }

  test("decontaminate_bloom: the sketch filters map-side, the verify " +
      "join broadcasts") {
    val p = plan("decontaminate_bloom")
    assert(p.toLowerCase.contains("might_contain"),
      "the bloom probe must appear as a filter in the corpus branch")
    assert(p.contains("BroadcastHashJoin"),
      "the exact verify must broadcast the benchmark grams")
    assert(!p.contains("SortMergeJoin"),
      "the corpus side must never shuffle for the verify")
  }

  test("join_asof runs as one keyed window pass, not a join") {
    val p = plan("join_asof")
    assert(p.contains("Window"))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"),
      "the as-of composition is union + carry-forward window — no pairwise join")
  }

  test("profile_columns: two passes — stats, and hash-agg'd distincts") {
    val p = plan("profile_columns")
    assert("Location: InMemoryFileIndex".r.findAllIn(p).size === 2,
      "exactly one stats pass + one shared multi-distinct pass — " +
        "never a scan per column")
    assert(p.contains("Expand") && p.contains("HashAggregate"),
      "the four distinct counts must share one Expand with all-numeric " +
        "buffers (hash aggregation); mixing string min/max into it would " +
        "force SortAggregate over the expanded rows")
  }

  test("mix_rebalance: per-source thresholds broadcast; corpus never shuffles") {
    val p = plan("mix_rebalance")
    assert(p.contains("BroadcastHashJoin"),
      "the per-source weight relation is tiny — it must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "the document side must not shuffle for the weight join")
  }

  test("heavy_hitters: top-10 is TakeOrdered over a partial-agg'd count") {
    val p = plan("heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must never materialize a global sort")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "the per-key count must partial-aggregate before the exchange")
  }

  test("range_v2_pushdown: the aggregate pushes completely into the source") {
    val p = plan("range_v2_pushdown")
    assert(p.contains("AGGREGATED"),
      "the scan must answer count/sum from range arithmetic")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      "complete pushdown leaves no Aggregate node in the plan")
  }

  test("scan_partitioned_table: the predicate prunes PARTITIONS, not rows") {
    val p = plan("scan_partitioned_table")
    assert(p.contains("PartitionFilters: [") &&
      """PartitionFilters: \[[^\]]*event_type""".r.findFirstIn(p).isDefined,
      "the event_type predicate must prune at the directory level")
    assert(!p.contains("PushedFilters: [In(event_type"),
      "a partition-column predicate must not degrade to a data filter")
  }

  test("join_bucketed: co-bucketed layout satisfies the join — one " +
      "exchange total (the final aggregate's)") {
    val p = plan("join_bucketed")
    assert(p.contains("SortMergeJoin"))
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size === 1,
      "neither join side may shuffle: the bucket layout IS the " +
        "distribution; only the mktsegment aggregate exchanges")
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
      "both scans must read as bucketed")
  }

  test("no registered query plans a non-broadcast cartesian product") {
    // CartesianProduct (both sides shuffled, |L|×|R| work with no key)
    // is the one join shape that can never survive a 100× scale-up.
    // BroadcastNestedLoopJoin is allowed: every use in this suite
    // broadcasts a 1-row aggregate or a capped probe sample (asserted
    // individually above); a CartesianProduct would mean a join lost
    // its keys entirely. Streaming and driver-looped queries can't be
    // explained statically — they are exercised by their own specs.
    val skip = Set("bpe_vocab_merges", "bpe_tokenize", "corpus_shuffle") ++
      Registry.queries.keys.filter(_.startsWith("stream_"))
    val unplannable = scala.collection.mutable.ArrayBuffer[String]()
    val offenders = Registry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skip.contains(n) }
      .flatMap { case (name, fn) =>
        val p = try plan(name)
          catch { case e: Throwable =>
            unplannable += s"$name (${e.getClass.getSimpleName})"; ""
          }
        if (p.contains("CartesianProduct")) Some(name) else None
      }
    assert(unplannable.isEmpty,
      s"queries that failed to PLAN (silently skipping them would " +
        s"void this gate): ${unplannable.mkString(", ")}")
    assert(offenders.isEmpty,
      s"cartesian joins found in: ${offenders.mkString(", ")}")
  }

  test("exactly three queries may plan an unpartitioned window — all " +
      "bounded-cardinality inputs; a fourth is a scale regression") {
    // A Window with an empty partitionSpec forces every row through ONE
    // task — the canonical does-not-survive-100× shape. Three uses are
    // deliberate because their inputs are bounded far below corpus
    // scale, and this sweep is the line that keeps a corpus-scale one
    // from hiding behind the same WindowExec warning:
    //   compaction_plan — file-LISTING running sum (metadata scale)
    //   global_sort     — 25-row nation dimension
    //   length_band     — length-histogram cumsum (distinct lengths)
    val allowed = Set("compaction_plan", "global_sort", "length_band")
    val skip = Set("bpe_vocab_merges", "bpe_tokenize", "corpus_shuffle") ++
      Registry.queries.keys.filter(_.startsWith("stream_"))
    val offenders = Registry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skip.contains(n) }
      .filter { case (name, fn) =>
        fn(spark, d).queryExecution.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
              if w.partitionSpec.isEmpty => w
        }.nonEmpty
      }.map(_._1).toSet
    assert(offenders === allowed,
      s"unpartitioned-window queries changed: unexpected=" +
        s"${(offenders -- allowed).mkString(",")} missing=" +
        s"${(allowed -- offenders).mkString(",")}")
  }

  test("interpreted higher-order lambdas appear only at per-ROW sites " +
      "(allowed list) — never in per-PAIR hot paths") {
    // HOFs (transform/exists/zip_with/...) never enter whole-stage
    // codegen — per-PAIR they tax every candidate (the SRP residual
    // measured 3x at sf0.1 before its removal, BENCH_NOTES r8); per-ROW
    // over short arrays they are noise. This sweep freezes the per-row
    // sites so a new lambda anywhere (most dangerously inside a join
    // condition or post-join filter) fails loudly and gets reviewed:
    //   ann_bucketed_top1 / dedup_embedding / emb_*_funnel — the
    //     6-element signBucket projection (per vector, not per pair)
    //   text_langid / text_quality / text_fingerprint — per-doc token
    //     voting and stats over already-exploded small arrays
    // (substr_dedup_scrub's per-doc segment stitch — array_join ∘
    // transform over spans-per-doc segments — is also per-row and
    // bounded, but its lambda lives inside an aggregate expression
    // the sparkPlan string does not surface, so it needs no entry)
    val allowed = Set("ann_bucketed_top1", "dedup_embedding",
      "emb_dedup_funnel", "emb_multiprobe_funnel",
      "text_fingerprint", "text_langid", "text_quality")
    val skip = Set("bpe_vocab_merges", "bpe_tokenize", "corpus_shuffle") ++
      Registry.queries.keys.filter(_.startsWith("stream_"))
    val offenders = Registry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skip.contains(n) }
      .filter { case (_, fn) =>
        fn(spark, d).queryExecution.sparkPlan.toString
          .toLowerCase.contains("lambdafunction")
      }.map(_._1).toSet
    assert(offenders === allowed,
      s"lambda sites changed: unexpected=" +
        s"${(offenders -- allowed).mkString(",")} missing=" +
        s"${(allowed -- offenders).mkString(",")}")
  }

  test("zorder_layout: no global window; layout exchange is a PARALLEL " +
      "range partitioning (never single-partition)") {
    val p = plan("zorder_layout")
    assert(!p.contains("BatchEvalPython"), "no Python/UDF round-trip")
    assert(!p.contains("Window"),
      "file boundaries must come from globalRowNumber (range repartition " +
        "+ zipWithIndex), not a global ntile window")
    // The layout stage itself sits behind the RDD boundary of
    // globalRowNumber — pin its shape directly: the one exchange is
    // rangepartitioning over N > 1 partitions.
    import org.apache.spark.sql.functions._
    val z = graft.core.Tables.events(spark, d).select(
        col("event_id"),
        (col("user_id") % 256).as("x"),
        (col("event_id") % 256).as("y"))
      .withColumn("zkey", graft.functions.Layout.zkey(col("x"), col("y"), 8))
    val lp = graft.functions.Layout.rangeSorted(z, col("zkey"), col("event_id"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!lp.contains("SinglePartition"), lp.take(800))
    val nParts = """rangepartitioning\([^)]*\brows\b[^)]*, (\d+)\)""".r
      .findFirstMatchIn(lp)
      .orElse("""rangepartitioning\(.*?, (\d+)\)""".r.findFirstMatchIn(lp))
      .map(_.group(1).toInt)
    assert(nParts.exists(_ > 1),
      s"layout exchange must be a parallel range partitioning, got: " +
        lp.linesIterator.filter(_.contains("partitioning")).mkString("; "))
    assert(!lp.contains("SerializeFromObject"),
      "the z-key must stay column arithmetic inside codegen")
  }
}
