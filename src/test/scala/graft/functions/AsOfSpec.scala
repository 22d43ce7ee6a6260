package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("joinAsOf picks the latest right row at or before each left time") {
    val trades = Seq(
      ("A", 10L, "t1"), ("A", 25L, "t2"), ("A", 30L, "t3"),
      ("B", 5L, "t4"), ("B", 50L, "t5")
    ).toDF("sym", "ts", "trade")
    val quotes = Seq(
      ("A", 8L, 100.0), ("A", 25L, 101.0), ("A", 40L, 102.0),
      ("B", 60L, 200.0)
    ).toDF("sym", "ts", "px")
    val out = AsOf.joinAsOf(trades, quotes, "sym", "ts", "px")
      .select("trade", "asof_px", "asof_ts")
      .collect().map(r => (r.getString(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(out === Set(
      ("t1", Some(100.0), Some(8L)),   // latest quote <= 10
      ("t2", Some(101.0), Some(25L)),  // equal time counts ("at or before")
      ("t3", Some(101.0), Some(25L)),
      ("t4", None, None),              // no quote yet
      ("t5", None, None)))             // B's only quote is later
  }

  test("joinAsOf tolerance nulls out matches staler than the bound") {
    val trades = Seq(("A", 10L, "t1"), ("A", 100L, "t2"))
      .toDF("sym", "ts", "trade")
    val quotes = Seq(("A", 8L, 100.0)).toDF("sym", "ts", "px")
    val out = AsOf.joinAsOf(trades, quotes, "sym", "ts", "px",
        tolerance = Some(10L))
      .select("trade", "asof_px")
      .collect().map(r => (r.getString(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]))).toSet
    assert(out === Set(
      ("t1", Some(100.0)), // distance 2 <= 10
      ("t2", None)))       // distance 92 > 10: stale, nulled
  }

  test("joinAsOf preserves the left side's row count and columns") {
    val left = Seq(("k", 1L, "x")).toDF("key", "ts", "payload")
    val right = Seq(("k", 1L, 9.0)).toDF("key", "ts", "v")
    val out = AsOf.joinAsOf(left, right, "key", "ts", "v")
    assert(out.count() === 1)
    assert(out.columns.toSet ===
      Set("key", "ts", "payload", "asof_v", "asof_ts"))
    assert(out.select("asof_v").as[Double].collect() === Array(9.0))
  }
}
