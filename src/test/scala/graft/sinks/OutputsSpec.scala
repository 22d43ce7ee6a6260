package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import java.nio.file.Files
import graft.TestSpark

case class Inner(tag: String, score: Double)
case class Outer(id: Long, name: String, inner: Inner, labels: Seq[String])

/** Golden shape mirroring the reference's annotated-marshalling cases
  * (BigQuerySchemaMarshallerTest.java: rename via @BigQueryDataField,
  * exclusion via @BigQueryIgnore, explicit mode). */
case class Annotated(
    @OutputName("renamed_id") id: Long,
    @OutputMode("REQUIRED") name: String,
    @OutputIgnore secret: String,
    plain: Double)

class OutputsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("derivedSchema reflects nested + repeated fields (BigQuery analogue)") {
    val schema = Outputs.derivedSchema[Outer]
    assert(schema.fieldNames === Array("id", "name", "inner", "labels"))
    val fields = Outputs.schemaFields(schema)
    assert(fields.contains(("inner", "RECORD", "NULLABLE")))
    assert(fields.contains(("inner.tag", "STRING", "NULLABLE")))
    assert(fields.contains(("id", "LONG", "REQUIRED")))
    assert(fields.exists { case (n, _, m) => n == "labels" && m == "REPEATED" })
  }

  test("annotatedSchema honors rename/ignore/mode annotations") {
    val schema = Outputs.annotatedSchema[Annotated]
    assert(schema.fieldNames === Array("renamed_id", "name", "plain"))
    assert(!schema("name").nullable) // REQUIRED
    assert(!schema("renamed_id").nullable) // Long derives non-nullable
    val fields = Outputs.schemaFields(schema)
    assert(fields.contains(("renamed_id", "LONG", "REQUIRED")))
    assert(fields.contains(("name", "STRING", "REQUIRED")))
    assert(fields.contains(("plain", "DOUBLE", "REQUIRED")))
    assert(!fields.exists(_._1 == "secret"))
  }

  test("toAnnotatedDF marshals renamed/ignored columns for any writer") {
    val ds = spark.createDataset(Seq(Annotated(7L, "n", "hide-me", 1.5)))
    val df = Outputs.toAnnotatedDF(ds)
    assert(df.columns === Array("renamed_id", "name", "plain"))
    val dir = Files.createTempDirectory("graft-annjson").toString
    df.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.select("renamed_id").as[Long].collect() === Array(7L))
    assert(!back.columns.contains("secret"))
  }

  test("ndjson writes one JSON object per record with derived schema") {
    val dir = Files.createTempDirectory("graft-ndjson").toString
    val ds = spark.createDataset(Seq(
      Outer(1, "a", Inner("x", 0.5), Seq("p", "q"))))
    Outputs.ndjson(ds, dir)
    val back = spark.read.json(dir)
    assert(back.count() === 1)
    assert(back.select("inner.tag").as[String].collect() === Array("x"))
  }

  test("segmented write caps records per file") {
    val dir = Files.createTempDirectory("graft-seg").toString
    Outputs.segmented(spark.range(100).coalesce(1), dir, maxRecordsPerFile = 30)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length === 4) // 30+30+30+10
    assert(spark.read.parquet(dir).count() === 100)
  }

  test("shardedBy writes key-partitioned directories") {
    val dir = Files.createTempDirectory("graft-part").toString
    val df = spark.range(20).selectExpr("id", "id % 3 AS k")
    Outputs.shardedBy(df.toDF(), dir, "k")
    val parts = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("k="))
    assert(parts.sorted === Array("k=0", "k=1", "k=2"))
    assert(spark.read.parquet(dir).count() === 20)
  }

  test("hashSharded produces at most the requested shard count") {
    val dir = Files.createTempDirectory("graft-hash").toString
    val df = spark.range(100).selectExpr("id", "id % 10 AS k").toDF()
    Outputs.hashSharded(df, dir, shards = 4, keyCol = "k")
    // empty hash partitions write no file, so <= shards files
    val files = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files >= 1 && files <= 4)
    assert(spark.read.parquet(dir).count() === 100)
    assert(df.repartition(4, df("k")).rdd.getNumPartitions === 4)
  }

  test("bucketed tables join with no exchange on either side") {
    val li = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
    val o = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
    Outputs.bucketTable(li, "li_bucketed", buckets = 4, keyCol = "l_orderkey")
    Outputs.bucketTable(o, "o_bucketed", buckets = 4, keyCol = "o_orderkey")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed").join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle either side:\n" + plan.take(800))
      assert(j.count() === li.count()) // every lineitem matches its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("inMemory collects and parquet round-trips") {
    val dir = Files.createTempDirectory("graft-pq").toString
    val ds = spark.createDataset(Seq(1L, 2L, 3L))
    Outputs.parquet(ds, dir)
    assert(spark.read.parquet(dir).as[Long].collect().sorted === Array(1L, 2L, 3L))
    assert(Outputs.inMemory(ds).sorted === Seq(1L, 2L, 3L))
  }
}
