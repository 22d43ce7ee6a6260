package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.TestSpark

/** Claim-backend SELECTION, pinned per scheme and per override knob:
  * which CAS primitive a deployment's commits actually ride is a
  * correctness contract (a mis-selected backend on an object store is
  * a TOCTOU that can overwrite committed manifests), so the selection
  * table is spec'd, not just documented. */
class ClaimBackendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fsFor(scheme: String): org.apache.hadoop.fs.FileSystem =
    scheme match {
      case "file" => org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration).getRawFileSystem
      case s =>
        // a local filesystem masquerading under the scheme: backend
        // selection reads ONLY the scheme (and the session knobs)
        val fs = new org.apache.hadoop.fs.RawLocalFileSystem {
          override def getUri: java.net.URI =
            java.net.URI.create(s"$s:///")
        }
        fs.setConf(spark.sparkContext.hadoopConfiguration)
        fs
    }

  private def backendName(scheme: String): String =
    VersionedKeyedTable.claimBackendFor(fsFor(scheme))
      .getClass.getSimpleName.stripSuffix("$")

  test("per-scheme defaults: file -> hard-link CAS, the HDFS family " +
      "-> rename CAS, object stores -> exclusive-create fallback " +
      "(conditional PUT is an explicit opt-in, never a scheme guess)") {
    assert(backendName("file") === "LinkCasClaim")
    for (s <- Seq("hdfs", "viewfs", "webhdfs", "swebhdfs"))
      assert(backendName(s) === "RenameClaim", s"scheme $s")
    // s3a/gs/abfs are NOT auto-detected: whether create(overwrite =
    // false) is a true conditional PUT depends on the connector's
    // configuration, so the safe fallback governs until the operator
    // opts in
    for (s <- Seq("s3a", "gs", "abfs", "oss", "wasb"))
      assert(backendName(s) === "ExclusiveCreateClaim", s"scheme $s")
  }

  test("spark.graft.claim.condput.schemes opts a scheme into the " +
      "conditional-PUT backend without code registration") {
    spark.conf.set("spark.graft.claim.condput.schemes", "s3a, gs")
    try {
      assert(backendName("s3a") === "ConditionalPutClaim")
      assert(backendName("gs") === "ConditionalPutClaim")
      assert(backendName("abfs") === "ExclusiveCreateClaim",
        "a scheme not in the list keeps the safe fallback")
    } finally spark.conf.unset("spark.graft.claim.condput.schemes")
    assert(backendName("s3a") === "ExclusiveCreateClaim",
      "unsetting the knob restores the fallback")
  }

  test("spark.graft.claim.backend FORCES one backend for every " +
      "scheme; an unknown name refuses loudly") {
    spark.conf.set("spark.graft.claim.backend", "create")
    try {
      assert(backendName("file") === "ExclusiveCreateClaim")
      assert(backendName("hdfs") === "ExclusiveCreateClaim")
    } finally spark.conf.unset("spark.graft.claim.backend")
    spark.conf.set("spark.graft.claim.backend", "rename")
    try assert(backendName("s3a") === "RenameClaim")
    finally spark.conf.unset("spark.graft.claim.backend")
    spark.conf.set("spark.graft.claim.backend", "paxos")
    try intercept[IllegalArgumentException](backendName("file"))
    finally spark.conf.unset("spark.graft.claim.backend")
    assert(backendName("file") === "LinkCasClaim")
  }

  test("a forced backend actually drives commits: create/upsert/read " +
      "round-trips on file:// under the exclusive-create fallback") {
    val dir = Files.createTempDirectory("graft-claimforce").toString + "/t"
    spark.conf.set("spark.graft.claim.backend", "create")
    try {
      VersionedKeyedTable.create(
        Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, "k",
        numBuckets = 2)
      VersionedKeyedTable.upsert(spark, dir,
        Seq((2L, "B"), (3L, "c")).toDF("k", "v"), "k")
    } finally spark.conf.unset("spark.graft.claim.backend")
    assert(VersionedKeyedTable.read(spark, dir)
      .as[(Long, String)].collect().toMap ===
      Map(1L -> "a", 2L -> "B", 3L -> "c"))
    assert(VersionedKeyedTable.completeVersions(spark, dir) ===
      Seq(1L, 2L))
  }
}
