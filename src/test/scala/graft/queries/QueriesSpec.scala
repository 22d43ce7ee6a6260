package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Smoke + invariant tests over the declared check queries at sf0.001.
  * Full value correctness is the DuckDB-oracle gate (tools/check.py /
  * the driver); these specs pin the invariants that gate can't see. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = TestSpark.sfDir

  test("every oracle entry has a query and names are unique") {
    val qs = Registry.queries
    assert(qs.size === Registry.all.size, "duplicate query names")
    Registry.oracleSql.keys.foreach(k => assert(qs.contains(k)))
  }

  // The every-query smoke pass, split per bench family: one 338-query
  // test ran for tens of minutes and the round harness killed the JVM
  // mid-test (r14: "SparkContext was shut down"), leaving the gate red
  // with zero isolation of what failed. Same total coverage, bounded
  // per-test runtime, per-family failure attribution.
  for ((fam, names) <- Registry.queries.keys
      .groupBy(graft.Bench.familyOf).toSeq.sortBy(_._1)) {
    test(s"every $fam query runs (${names.size})") {
      for (name <- names.toSeq.sorted) {
        val n = Registry.queries(name)(spark, d).count()
        assert(n >= 0, s"$name failed")
      }
    }
  }

  test("known row counts at sf0.001") {
    def rows(n: String) = Registry.queries(n)(spark, d)
    assert(rows("scan_full_count").collect()(0).getLong(0) === 6000L)
    assert(rows("scan_keys_only").count() === 150L)
    assert(rows("global_sort").count() === 25L)
    assert(rows("topk").count() === 15L)
    assert(rows("text_langid").count() === 500L)
    assert(rows("dedup_simhash").count() === 500L)
    assert(rows("ann_cosine_top1").count() === 500L)
  }

  test("dedup: LSH candidates reproduce the exhaustive Jaccard pairs") {
    val exact = Registry.queries("dedup_jaccard")(spark, d)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Registry.queries("dedup_minhash_lsh")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH pairs must be verified true pairs")
    assert(lsh.size >= (exact.size * 0.9).toInt, "LSH recall below 90%")
  }

  test("bucketed ANN is a sound approximation of brute force") {
    val brute = Registry.queries("ann_cosine_top1")(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val bucketed = Registry.queries("ann_bucketed_top1")(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    // approximate search can never beat exact search...
    bucketed.foreach { case (v, (_, sim)) =>
      assert(sim <= brute(v)._2 + 1e-9, s"vec $v: bucketed beat brute force")
    }
    // ...and when it reaches the true neighbor, similarities agree
    val agree = bucketed.filter { case (v, (nb, _)) => brute(v)._1 == nb }
    agree.foreach { case (v, (_, sim)) =>
      assert(math.abs(sim - brute(v)._2) < 1e-9)
    }
    assert(agree.nonEmpty)
  }

  test("window row_number never exceeds its cap") {
    val rn = Registry.queries("window_rownum")(spark, d)
    assert(rn.agg(org.apache.spark.sql.functions.max("rn"))
      .collect()(0).getInt(0) <= 3)
  }

  test("streaming window agg equals batch aggregation") {
    import org.apache.spark.sql.functions._
    val stream = Registry.queries("stream_window_agg")(spark, d)
      .agg(sum("cnt")).collect()(0).getLong(0)
    val batch = graft.core.Tables.events(spark, d).count()
    assert(stream === batch)
  }
}
