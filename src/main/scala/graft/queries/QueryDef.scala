package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared check query: a Spark program plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names must match exactly between the two (the driver
  * sorts columns by name before hashing values).
  *
  * Oracle-parity rules used throughout this package:
  *  - money/quantity sums run through DECIMAL(18,2) arithmetic and are
  *    cast to DOUBLE at the end — exact decimal arithmetic is engine- and
  *    order-independent, so both engines produce the bit-identical double;
  *  - ratios are single double divisions of identical operands (bit-exact),
  *    rounded the same on both sides;
  *  - orderings always carry a unique tiebreak column;
  *  - timestamps are never emitted raw (ns-vs-µs precision): they are
  *    bucketed to epoch seconds or formatted as strings.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    dynOracle: Option[(SparkSession, String) => String] = None)

object QueryDef {
  def sql(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle.trim))

  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  /** A check whose oracle SQL is *generated at verify time* by an
    * independent driver-side replay of the same computation (e.g. the
    * BPE reference trainer): the generator returns a `VALUES`-literal
    * SELECT that DuckDB runs and the driver hash-compares against the
    * distributed result. Used for ops whose algorithm is not
    * SQL-expressible but whose *output* is a small, deterministic
    * relation. */
  def replayed(name: String)(fn: (SparkSession, String) => DataFrame)(
      gen: (SparkSession, String) => String): QueryDef =
    QueryDef(name, fn, None, Some(gen))

  /** SQL single-quoted string literal (escapes embedded quotes). */
  def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"
}
