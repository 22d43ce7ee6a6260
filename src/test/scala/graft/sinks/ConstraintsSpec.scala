package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.TestSpark

/** CHECK CONSTRAINTS: named boolean predicates enforced on every row
  * every commit writes (the Delta ADD CONSTRAINT contract) — creation
  * semantics (existing rows validated, idempotent re-add, refused
  * mutation), enforcement across write surfaces (upsert / merge /
  * SQL INSERT), SQL-null semantics (NULL passes), additive-evolution
  * padding (absent columns evaluate as null), and the failed-write
  * guarantee (a violating batch leaves the table unchanged). */
class ConstraintsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-constraints").toString + "/t"

  test("add validates existing rows; lists; idempotent re-add; " +
      "refused mutation; drop releases") {
    val dir = freshDir()
    VersionedKeyedTable.create(
      (1L to 50L).map(i => (i, i * 2)).toDF("k", "qty"), dir, "k", 4)
    // a predicate current rows violate is refused
    intercept[IllegalArgumentException] {
      VersionedKeyedTable.addConstraint(spark, dir, "big",
        "qty > 50")
    }
    // a non-boolean expression is refused loudly at add time
    intercept[IllegalArgumentException] {
      VersionedKeyedTable.addConstraint(spark, dir, "notbool", "qty + 1")
    }
    VersionedKeyedTable.addConstraint(spark, dir, "pos", "qty > 0")
    VersionedKeyedTable.addConstraint(spark, dir, "pos", "qty > 0") // no-op
    intercept[IllegalStateException] { // constraints never mutate in place
      VersionedKeyedTable.addConstraint(spark, dir, "pos", "qty > 1")
    }
    assert(VersionedKeyedTable.constraints(spark, dir) ===
      Map("pos" -> "qty > 0"))
    assert(VersionedKeyedTable.dropConstraint(spark, dir, "pos"))
    assert(VersionedKeyedTable.constraints(spark, dir).isEmpty)
  }

  test("violating upsert fails BEFORE commit — version and content " +
      "unchanged; valid upsert lands; NULL passes (SQL CHECK rule)") {
    val dir = freshDir()
    VersionedKeyedTable.create(
      (1L to 20L).map(i => (i, java.lang.Long.valueOf(i))).toDF("k", "qty"),
      dir, "k", 4)
    VersionedKeyedTable.addConstraint(spark, dir, "pos", "qty > 0")
    val before = VersionedKeyedTable.snapshot(spark, dir).version
    val ex = intercept[Exception] {
      VersionedKeyedTable.upsert(spark, dir,
        Seq((21L, java.lang.Long.valueOf(-5L))).toDF("k", "qty"), "k")
    }
    assert(ex.toString.contains("pos") || Option(ex.getCause)
      .exists(_.toString.contains("pos")) ||
      ex.getMessage.contains("pos"))
    assert(VersionedKeyedTable.snapshot(spark, dir).version === before)
    assert(VersionedKeyedTable.read(spark, dir).count() === 20L)
    // NULL predicate passes — the SQL CHECK rule
    VersionedKeyedTable.upsert(spark, dir,
      Seq((22L, Option.empty[Long])).toDF("k", "qty"), "k")
    // and a valid batch lands
    VersionedKeyedTable.upsert(spark, dir,
      Seq((23L, Option(9L))).toDF("k", "qty"), "k")
    assert(VersionedKeyedTable.read(spark, dir).count() === 22L)
  }

  test("enforced on the merge path; a batch missing the constrained " +
      "column (additive evolution) passes as null") {
    val dir = freshDir()
    VersionedKeyedTable.create(
      (1L to 10L).map(i => (i, java.lang.Long.valueOf(i))).toDF("k", "qty"),
      dir, "k", 4)
    VersionedKeyedTable.addConstraint(spark, dir, "cap", "qty <= 100")
    // merge assignment that would push qty past the cap must fail
    val before = VersionedKeyedTable.snapshot(spark, dir).version
    intercept[Exception] {
      VersionedKeyedTable.merge(spark, dir,
        Seq((1L, java.lang.Long.valueOf(200L))).toDF("k", "qty"), "k",
        whenMatchedUpdate = Map("qty" ->
          org.apache.spark.sql.functions.col("s.qty")))
    }
    assert(VersionedKeyedTable.snapshot(spark, dir).version === before)
    // a key-only delete batch (no qty column at all) is unaffected
    VersionedKeyedTable.delete(spark, dir, Seq(10L).toDF("k"), "k")
    assert(VersionedKeyedTable.read(spark, dir).count() === 9L)
  }

  test("a constraint referencing a column in DIFFERENT letter case " +
      "resolves like the session would — the write keeps the real " +
      "column and the check stays live") {
    val dir = freshDir()
    VersionedKeyedTable.create(
      (1L to 5L).map(i => (i, java.lang.Long.valueOf(i))).toDF("k", "qty"),
      dir, "k", 4)
    VersionedKeyedTable.addConstraint(spark, dir, "cs", "QTY > 0")
    // a valid batch lands WITH its qty values intact (the bug this
    // pins: case-mismatched refs once null-padded and DROPPED the
    // real column)
    VersionedKeyedTable.upsert(spark, dir,
      Seq((6L, Option(60L))).toDF("k", "qty"), "k")
    val got = VersionedKeyedTable.read(spark, dir)
    assert(got.columns.toSeq === Seq("k", "qty"))
    assert(got.where($"k" === 6L).select("qty").as[Long].head() === 60L)
    // and the check is live, not vacuously null
    intercept[Exception] {
      VersionedKeyedTable.upsert(spark, dir,
        Seq((7L, Option(-1L))).toDF("k", "qty"), "k")
    }
    assert(VersionedKeyedTable.read(spark, dir).count() === 6L)
  }

  test("SQL INSERT through the catalog enforces; add_constraint / " +
      "drop_constraint procedures; properties expose constraints") {
    val base = Files.createTempDirectory("graft-constraints-sql").toString
    val dir = s"$base/t"
    VersionedKeyedTable.create(
      (1L to 5L).map(i => (i, java.lang.Long.valueOf(i))).toDF("k", "qty"),
      dir, "k", 4)
    val cat = "gcons" + scala.util.Random.alphanumeric.take(6)
      .mkString.toLowerCase
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sinks.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    spark.sql(s"CALL $cat.add_constraint(tbl => 't', name => 'pos', " +
      "check_expr => 'qty > 0')")
    assert(VersionedKeyedTable.constraints(spark, dir) ===
      Map("pos" -> "qty > 0"))
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES (99, -1)")
    }
    assert(VersionedKeyedTable.read(spark, dir).count() === 5L)
    spark.sql(s"INSERT INTO $cat.t VALUES (99, 1)")
    assert(VersionedKeyedTable.read(spark, dir).count() === 6L)
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("constraint.pos").contains("qty > 0"))
    // the t$constraints metadata relation mirrors the registry
    assert(spark.sql(s"SELECT name, check_expr FROM $cat.`t$$constraints`")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("pos", "qty > 0")))
    spark.sql(s"CALL $cat.drop_constraint(tbl => 't', name => 'pos')")
    assert(VersionedKeyedTable.constraints(spark, dir).isEmpty)
    assert(spark.sql(s"SELECT * FROM $cat.`t$$constraints`").count() === 0L)
  }

  test("CREATE TABLE with constraint.* TBLPROPERTIES registers the " +
      "CHECK at creation — a CTAS-shaped first insert is already " +
      "enforced") {
    val base = Files.createTempDirectory("graft-constraints-ddl").toString
    val cat = "gcdl" + scala.util.Random.alphanumeric.take(6)
      .mkString.toLowerCase
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sinks.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    spark.sql(s"CREATE TABLE $cat.c1 (k BIGINT, qty BIGINT) " +
      "TBLPROPERTIES ('key'='k', 'constraint.pos'='qty > 0')")
    assert(VersionedKeyedTable.constraints(spark, s"$base/c1") ===
      Map("pos" -> "qty > 0"))
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.c1 VALUES (1, -1)")
    }
    spark.sql(s"INSERT INTO $cat.c1 VALUES (1, 1)")
    assert(VersionedKeyedTable.read(spark, s"$base/c1").count() === 1L)
  }

  test("CREATE TABLE with an INVALID constraint predicate fails the " +
      "statement CLEANLY — no table is left behind, so the corrected " +
      "retry succeeds instead of hitting 'already exists'") {
    val base = Files.createTempDirectory("graft-constraints-bad").toString
    val cat = "gcbad" + scala.util.Random.alphanumeric.take(6)
      .mkString.toLowerCase
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sinks.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.base", base)
    // unresolvable column: the predicate references a column the
    // declared schema does not have
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.bad (k BIGINT, qty BIGINT) " +
        "TBLPROPERTIES ('key'='k', 'constraint.pos'='no_such_col > 0')")
    }
    assert(!new java.io.File(s"$base/bad").exists(),
      "a failed CREATE must not leave the table directory behind")
    // non-boolean predicate: same clean failure
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.bad (k BIGINT, qty BIGINT) " +
        "TBLPROPERTIES ('key'='k', 'constraint.pos'='qty + 1')")
    }
    assert(!new java.io.File(s"$base/bad").exists())
    // the corrected retry works — the name was never burned
    spark.sql(s"CREATE TABLE $cat.bad (k BIGINT, qty BIGINT) " +
      "TBLPROPERTIES ('key'='k', 'constraint.pos'='qty > 0')")
    spark.sql(s"INSERT INTO $cat.bad VALUES (1, 1)")
    assert(VersionedKeyedTable.read(spark, s"$base/bad").count() === 1L)
  }

  test("a bucket poisoned through the documented addConstraint race " +
      "cannot WEDGE maintenance: compact/cluster rewrite the committed " +
      "rows without re-enforcing, while DML keeps enforcing — and the " +
      "pending-MoR purge still folds under a live violated constraint") {
    val dir = freshDir()
    VersionedKeyedTable.create(
      (1L to 40L).map(i => (i, i * 2)).toDF("k", "qty"), dir, "k", 4)
    VersionedKeyedTable.upsert(spark, dir,
      Seq((100L, -5L)).toDF("k", "qty"), "k") // the row the racer landed
    // simulate the race window: the constraint registers WITHOUT the
    // current-rows validation (a concurrent writer validated against
    // the old set and committed the violating row)
    VersionedKeyedTable.addConstraintUnchecked(spark, dir, "pos",
      "qty > 0")
    // a MoR delete leaves pending state compaction must consume — the
    // exact shape the streaming sink's auto-compaction hits per epoch
    VersionedKeyedTable.deleteMor(spark, dir, Seq(3L).toDF("k"), "k")
    // maintenance must NOT throw on the pre-existing violating row
    VersionedKeyedTable.compact(spark, dir, "k")
    assert(VersionedKeyedTable.snapshot(spark, dir).deletes.isEmpty,
      "compaction must still consume the pending deletes")
    VersionedKeyedTable.cluster(spark, dir, "k", targetRowsPerFile = 10L)
    // the poisoned row survives the rewrites verbatim (maintenance is
    // logically a no-op; it never edits data)
    assert(VersionedKeyedTable.read(spark, dir)
      .filter(org.apache.spark.sql.functions.col("k") === 100L)
      .collect().map(_.getLong(1)).toSeq === Seq(-5L))
    // DML keeps enforcing: a new violating batch still fails
    intercept[Exception] {
      VersionedKeyedTable.upsert(spark, dir,
        Seq((101L, -1L)).toDF("k", "qty"), "k")
    }
    // and a compliant batch lands
    VersionedKeyedTable.upsert(spark, dir,
      Seq((101L, 1L)).toDF("k", "qty"), "k")
    // 40 seeded + the poisoned row − the MoR-deleted key + the new row
    assert(VersionedKeyedTable.read(spark, dir).count() === 41L)
  }
}
