package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.TextCuration

/** The durable-state contracts the streaming capstone leans on:
  * weights-last save marker (a crash mid-save reads as absent),
  * batch-id-stamped fold idempotency, and the empty prior. */
class ServingStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-servingstate")
      .toString + "/s"

  private lazy val cfg = TextCuration.Config(
    stopwords = TextCuration.DemoStopwords, classifierRounds = 2)

  private def tinyIndex(dir: String): TextCuration.ServingIndex = {
    val docs = graft.core.Tables.documents(spark, TestSpark.sfDir)
      .where(col("doc_id") % 4 =!= 0).limit(50).localCheckpoint(true)
    val idx = TextCuration.buildServingIndex(spark, docs, cfg)
    ServingState.saveServingIndex(spark, idx, dir)
    idx
  }

  test("save/load round trip preserves every index relation and the " +
      "weights map; a save missing its weights marker reads as absent") {
    val dir = freshDir()
    val built = tinyIndex(dir)
    assert(ServingState.indexExists(spark, dir))
    val loaded = ServingState.loadServingIndex(spark, dir)
    assert(loaded.weights === built.weights)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(loaded.corpusHashes) === rows(built.corpusHashes))
    assert(rows(loaded.corpusShingles) === rows(built.corpusShingles))
    assert(rows(loaded.corpusBands) === rows(built.corpusBands))
    assert(rows(loaded.indexGrams) === rows(built.indexGrams))
    assert(rows(loaded.benchGrams) === rows(built.benchGrams))
    // simulate a crash mid-save: the weights table (written LAST) is
    // missing -> the index must read as absent and rebuild, never
    // serve a partial index
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(s"$dir/index/weights"))
    assert(!ServingState.indexExists(spark, dir),
      "a partial save (no weights marker) must not read as an index")
  }

  test("fold is idempotent per batch id and priorFor sees exactly the " +
      "earlier batches; the empty prior has no components") {
    val dir = freshDir()
    val empty = ServingState.priorFor(spark, dir, 0L)
    assert(empty.hashes.isEmpty && empty.shingles.isEmpty &&
      empty.grams.isEmpty && empty.bands.isEmpty)
    def foldBatch(id: Long, tag: String): Unit =
      ServingState.fold(spark, dir, id,
        hashes = Seq(s"h-$tag").toDF("h"),
        shingles = Seq((id, s"s-$tag")).toDF("doc_id", "s"),
        grams = Seq(s"g-$tag").toDF("g"),
        bands = Seq((id, 0, s"b-$tag")).toDF("doc_id", "band", "sig"))
    foldBatch(0L, "zero")
    foldBatch(1L, "one")
    def hashesFor(batchId: Long): Set[String] =
      ServingState.priorFor(spark, dir, batchId).hashes
        .map(_.as[String].collect().toSet).getOrElse(Set.empty)
    assert(hashesFor(0L) === Set.empty, "batch 0 sees no prior")
    assert(hashesFor(1L) === Set("h-zero"))
    assert(hashesFor(2L) === Set("h-zero", "h-one"))
    // a RETRIED batch folds the same rows -> tables unchanged
    foldBatch(1L, "one")
    assert(hashesFor(2L) === Set("h-zero", "h-one"))
    // the same content in TWO batches keeps both facts (batch id is
    // part of the key): retrying batch 1 never erases batch 0's row
    ServingState.fold(spark, dir, 2L,
      hashes = Seq("h-zero").toDF("h"), // batch 2 re-sees batch 0's hash
      shingles = Seq((2L, "s-two")).toDF("doc_id", "s"),
      grams = Seq("g-two").toDF("g"),
      bands = Seq((2L, 0, "b-two")).toDF("doc_id", "band", "sig"))
    assert(hashesFor(3L) === Set("h-zero", "h-one"),
      "distinct content view: h-zero present (from batches 0 AND 2)")
    assert(hashesFor(1L) === Set("h-zero"),
      "batch 1's prior still excludes batch 2's rows")
  }
}
