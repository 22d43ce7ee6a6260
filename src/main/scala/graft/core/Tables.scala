package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * Analogue of the reference's input-side catalog: each table is the
  * Spark-native stand-in for a Datastore entity kind
  * (reference: python/src/mapreduce/input_readers.py:247-580). The parquet
  * scan replaces `AbstractDatastoreInputReader.split_input` — Spark's
  * FileSourceScanExec plans splits, and Catalyst pushes predicates and
  * projections into the scan (SURVEY.md §4 rows 1-4).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")

  /** The events table's `ts` column normalized to Spark's native
    * TimestampType regardless of how the generator annotated it —
    * the physical encoding has varied across testdata generations:
    *  - parquet TIMESTAMP(NANOS) (not UTC-adjusted), which Spark's
    *    vectorized reader rejects → read nanos as long, floor to
    *    micros (integer `div`, NOT `/`: epoch nanos ~1.7e18 exceed
    *    double's exact range, so float division would be off by ±1µs);
    *  - parquet TIMESTAMP(MICROS) not UTC-adjusted → Spark reads
    *    TIMESTAMP_NTZ, which time functions (unix_millis, windowing)
    *    reject → cast to TimestampType; the session timezone is
    *    pinned to UTC everywhere (Verify/Bench/TestSpark), so the
    *    cast reinterprets the naive value as the same instant DuckDB
    *    sees.
    * Flooring nanos can never flip a >=/< predicate at whole-second
    * boundaries, so oracle comparisons at day/hour granularity are
    * unaffected. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so spark.sql(...) mirrors the
    * DuckDB oracle's table naming. `events` goes through its
    * ts-normalizing loader so SQL-interface queries see TimestampType
    * no matter which physical encoding the generator used. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
