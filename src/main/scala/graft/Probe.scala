package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop latency probe: decomposes per-query wall time into Catalyst
  * planning (analysis→optimized→executedPlan) and execution (noop-sink
  * write), and A/B-tests runtime SQL confs (AQE, shuffle partitions)
  * within one JVM. Not part of the driver contract — used to find where
  * the per-query constant floor comes from on the 74-query bench. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("m1_media_meta", "a12_distinct_agg", "x24_hll_distinct",
        "g1_rollup", "x21_tfidf_topk", "x17_repetition", "j4_facts_join",
        "w2_tumbling_hourly", "x29_bloom_prefilter", "x18_pii_scrub")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      // match Bench (compiled-codegen cache sized to the suite, shuffle
      // scratch on RAM-backed storage)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.local.dir", Bench.localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RewriteLongDotProduct
    // mirror Bench's warehouse import (same default, same knob): probed
    // per-query numbers must be read against the layout Bench times, or
    // the dev loop optimizes the wrong floor (bit round 6 — probe showed
    // original-layout costs for import-affected queries)
    if (sys.env.getOrElse("SPARK_GRAFT_IMPORT", "1") != "0")
      sys.props("graft.import") = "1"
    graft.io.Tables.importAll(spark, sfDir)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warmup: full pass at sf0.001 like Bench
    for (n <- names)
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    spark.catalog.clearCache(); System.gc()

    // Raw floor: what does an empty / scan-only noop job cost?
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE_FLOOR", "0") == "1") {
      import org.apache.spark.sql.functions._
      def floor(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
        val t = (1 to 3).map(_ => timed {
          mk.write.format("noop").mode("overwrite").save()
        }).min
        println(f"PROBE floor $label%-24s total=$t%6.3f")
      }
      floor("range10")(spark.range(10).toDF())
      floor("range10M")(spark.range(10000000L).toDF())
      floor("docs_scan")(spark.read.parquet(s"$sfDir/documents.parquet"))
      floor("docs_1col")(spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id"))
      floor("lineitem_scan")(spark.read.parquet(s"$sfDir/lineitem.parquet"))
      floor("lineitem_agg")(spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").agg(count(lit(1))))
      floor("events_scan")(spark.read.parquet(s"$sfDir/events.parquet"))
      floor("media_scan")(graft.ext.Multimodal.mediaFromDocuments(
        graft.io.Tables.documents(spark, sfDir)))
      floor("shuffle32")(spark.range(1000000L).toDF().repartition(32, col("id"))
        .groupBy(col("id") % 97).agg(count(lit(1))))
    }

    // A/B: expensive projection ABOVE the final range sort vs below it.
    // Hypothesis: Sort's range-partitioner samples boundaries by
    // re-executing its child, so project-then-sort runs the projection
    // twice when no shuffle boundary sits between scan and sort.
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE_SORTFIRST", "0") == "1") {
      import org.apache.spark.sql.functions._
      import graft.ext.{TextAnalysis => TA}
      def ab(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
        val t = (1 to 3).map(_ => timed {
          mk.write.format("noop").mode("overwrite").save()
        }).min
        println(f"PROBE sortfirst $label%-24s total=$t%6.3f")
      }
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      ab("x4_projthensort")(docs
        .select(col("doc_id"), TA.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"))
      ab("x4_sortthenproj")(docs
        .orderBy("doc_id")
        .select(col("doc_id"), TA.fingerprint(col("text")).as("fp")))
      ab("x4_range32thenproj")(docs
        .repartitionByRange(32, col("doc_id")).sortWithinPartitions("doc_id")
        .select(col("doc_id"), TA.fingerprint(col("text")).as("fp")))
      ab("x11_range32thenproj")(docs
        .repartitionByRange(32, col("doc_id")).sortWithinPartitions("doc_id")
        .select(col("doc_id"), TA.normalizeText(col("text")).as("norm"),
          length(TA.normalizeText(col("text"))).as("n_norm")))
      ab("x11_projthensort")(docs
        .select(col("doc_id"), TA.normalizeText(col("text")).as("norm"),
          length(TA.normalizeText(col("text"))).as("n_norm"))
        .orderBy("doc_id"))
      ab("x11_sortthenproj")(docs
        .orderBy("doc_id")
        .select(col("doc_id"), TA.normalizeText(col("text")).as("norm"),
          length(TA.normalizeText(col("text"))).as("n_norm")))
    }

    if (sys.env.getOrElse("SPARK_GRAFT_PROBE_EXPLAIN", "0") == "1") {
      for (n <- names) {
        println(s"===== EXPLAIN $n =====")
        println(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
          .toString.take(12000))
      }
      spark.stop(); return
    }

    for (variant <- Seq("aqe_on", "aqe_minps", "aqe_off")) {
      spark.conf.set("spark.sql.adaptive.enabled",
        if (variant == "aqe_off") "false" else "true")
      // aqe_minps: AQE on, but the coalescer's 1 MB minimum partition
      // size lowered so compute-dense reduce stages over small shuffle
      // payloads keep ~core-count tasks instead of collapsing to 2-3.
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        if (variant == "aqe_minps") "64k" else "1m")
      for (n <- names) {
        val (plan, exec) = (1 to 3).map { _ =>
          var df: org.apache.spark.sql.DataFrame = null
          val tPlan = timed {
            df = SparkEntry.queries(n)(spark, sfDir)
            df.queryExecution.executedPlan // force analysis+optimize+physical
          }
          val tExec = timed {
            df.write.format("noop").mode("overwrite").save()
          }
          spark.catalog.clearCache(); System.gc()
          (tPlan, tExec)
        }.reduce((a, b) => (math.min(a._1, b._1), math.min(a._2, b._2)))
        println(f"PROBE $variant $n%-24s plan=$plan%6.3f exec=$exec%6.3f total=${plan + exec}%6.3f")
      }
    }
    spark.stop()
  }
}
