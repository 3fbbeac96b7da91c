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
      // Engine-wide pinned conf: TIMESTAMP(NANOS) parquet (events table)
      // reads as BIGINT nanos — see graft.io.Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // 74 queries overflow the default 100-entry compiled-codegen cache
      // (see Bench.scala note)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // graft's optimizer rules (see plans.GraftExtensions; equivalent to
    // spark.sql.extensions=graft.plans.GraftExtensions at submit time)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RewriteLongDotProduct
    new java.io.File(outDir).mkdirs()
    // Dev-loop subset knob (same contract as Bench's): a comma list
    // restricts BOTH the dumped results and the oracle entries, so
    // check_oracle.py checks exactly the subset. The driver runs with
    // the env unset — full surface.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a misspelled/stale name would select NOTHING: Verify would write an
    // empty oracle_sql.json and the dev-loop oracle check passes
    // vacuously — fail fast instead
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names no known query: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    def selected(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.filter(q => selected(q._1)).foreach { case (name, fn) =>
      // Driver contract: result lands at outDir/<name>.parquet
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // A STALE result from a previous run into the same outDir would
        // otherwise hash-compare as this run's output and mask the
        // failure — a broken query must fail its row, not pass on relics.
        try {
          val stale = new org.apache.hadoop.fs.Path(s"$outDir/$name.parquet")
          val fs = stale.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(stale)) fs.delete(stale, true)
        } catch { case _: Throwable => }
      }
      // caches persisted inside operators (x7's shingle sets, x28's range
      // frame) are per-query scratch — don't let them accumulate across
      // the 74-query session
      spark.catalog.clearCache()
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
    // Driver contract hardening: the driver keys its oracle lookup by the
    // RESULT FILE name ("<name>.parquet"), while round 1's convention was
    // the bare "<name>". Emit every entry under BOTH keys so either driver
    // convention resolves (r01 lost correctness to one mismatch, r02 to
    // the other — see VERDICT r2 "What's wrong" #1).
    // A query name already ending in ".parquet" would make the bare key
    // of one entry collide with the derived key of another — forbid it
    // outright rather than emit ambiguous JSON.
    require(!SparkEntry.oracleSql.keys.exists(_.endsWith(".parquet")),
      "oracleSql keys must not end in .parquet (dual-key emission would collide)")
    val json = SparkEntry.oracleSql.filter(q => selected(q._1))
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
