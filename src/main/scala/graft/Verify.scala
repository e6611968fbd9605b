package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE explicitly ON: the correctness gate must run the same runtime
      // re-planning surface (coalescing, skew-join splits) that a 100 TB
      // deployment would — all queries stay hash-green under it.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // the library's SparkSessionExtensions entry point: native function
      // registry, the TopKPerGroup strategy, and RankLimitRewrite — the
      // driver gate must exercise the same session surface a production
      // deployment configures (rank-limit windows lower onto the
      // two-phase heap HERE, not just in the plan tests)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional subset for local iteration (tools/check.py): comma-separated
    // name prefixes. The driver never sets it — full surface by default.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    def selected(name: String) = only.forall(_.exists(name.startsWith))
    val attempted = SparkEntry.queries.filter(kv => selected(kv._1))
    val failed = scala.collection.mutable.ListBuffer.empty[(String, String)]
    attempted.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += ((name, Option(e.getMessage).getOrElse(e.getClass.getName)))
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
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Coverage gate (round-8 verdict #3): 3 of 125 queries silently
    // vanished from CORRECTNESS_r08 because a per-query failure was only
    // stderr-logged. Record registry-vs-artifact coverage as its own
    // artifact AND shout on both streams, so an incomplete dump can never
    // again read as a clean one. (No nonzero exit: the successful dumps
    // and oracle_sql.json are already on disk and must reach the driver's
    // DuckDB compare regardless.)
    val coverage = s"""{"declared": ${attempted.size}, """ +
      s""""produced": ${attempted.size - failed.size}, """ +
      s""""missing": ${failed.map(f => q(f._1)).mkString("[", ",", "]")}, """ +
      s""""errors": ${failed.map(f => s"{${q(f._1)}: ${q(f._2)}}").mkString("[", ",", "]")}}"""
    Files.writeString(Paths.get(s"$outDir/coverage.json"), coverage)
    val summary = s"[verify] coverage: ${attempted.size - failed.size}/${attempted.size}" +
      (if (failed.isEmpty) " — complete"
       else s" — MISSING ${failed.map(_._1).mkString(", ")}")
    println(summary)
    System.err.println(summary)
    spark.stop()
  }
}
