package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional third arg: comma-separated query names to dump (local
    // iteration); the driver's two-arg invocation dumps everything
    val only = args.lift(2).map(_.split(',').toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Dynamic oracles (QueryDef.replayed): generated here, at verify
    // time, by an independent driver-side replay — the generator emits
    // a VALUES-literal SELECT that DuckDB runs like any static oracle.
    // A generator failure must NOT silently degrade the query from
    // verified to unchecked (a broken replay is exactly what the oracle
    // guards): emit an oracle that cannot match the dumped result, so
    // the driver's compare records a loud red row instead of a gap.
    val dynamic = graft.queries.Registry.all
      .filter(qd => only.forall(_.contains(qd.name)))
      .flatMap(qd => qd.dynOracle.map { gen =>
        try qd.name -> gen(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[verify] dyn oracle ${qd.name} failed: ${e.getMessage}")
          qd.name -> ("SELECT 'dyn oracle generation FAILED: " +
            String.valueOf(e.getMessage).replace("'", "''").take(200) +
            "' AS dyn_oracle_error")
        }
      }).toMap
    val json = (SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) } ++ dynamic)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
