package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop micro-profiler: times one named query (or a comma list) from
  * SparkEntry.queries N times against a scale dir. Not part of the driver
  * contract — used to separate real per-query cost from JVM warmup noise
  * when tuning plans. */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $label%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    for (name <- names; r <- 1 to reps) {
      if (name == "x7nopersist") {
        import graft.ext.Dedup
        import org.apache.spark.sql.functions.col
        val corpus = graft.io.Tables.documents(spark, sfDir)
          .select(col("doc_id").as("id"), col("text"))
        val m = Dedup.shingleMd5(corpus, "id", "text", 3)
        val sig = Dedup.minhashSignatureFromMd5(m, 12)
        val pairs = Dedup.candidatePairs(Dedup.lshBands(sig, 12, 3))
        t(s"x7nopersist rep$r")(
          Dedup.jaccardOnPairsFromMd5(m, pairs).filter(col("jaccard") >= 0.5).count())
        spark.catalog.clearCache()
      } else if (name == "x7persist") {
        import graft.ext.Dedup
        import org.apache.spark.sql.functions.col
        val corpus = graft.io.Tables.documents(spark, sfDir)
          .select(col("doc_id").as("id"), col("text"))
        val m = Dedup.shingleMd5(corpus, "id", "text", 3).persist()
        val sig = Dedup.minhashSignatureFromMd5(m, 12)
        val pairs = Dedup.candidatePairs(Dedup.lshBands(sig, 12, 3))
        t(s"x7persist rep$r")(
          Dedup.jaccardOnPairsFromMd5(m, pairs).filter(col("jaccard") >= 0.5).count())
        m.unpersist()
        spark.catalog.clearCache()
      } else if (name == "x7parts") {
        import graft.ext.Dedup
        import org.apache.spark.sql.functions.col
        val corpus = graft.io.Tables.documents(spark, sfDir)
          .select(col("doc_id").as("id"), col("text"))
        t(s"corpus rep$r")(corpus.count())
        val m = Dedup.shingleMd5(corpus, "id", "text", 3)
        t(s"shingleMd5 rep$r")(m.count())
        val mp = m.persist()
        t(s"persist rep$r")(mp.count())
        val sig = Dedup.minhashSignatureFromMd5(mp, 12)
        t(s"sig rep$r")(sig.count())
        val pairs = Dedup.candidatePairs(Dedup.lshBands(sig, 12, 3))
        t(s"pairs rep$r")(pairs.count())
        t(s"jaccard rep$r")(Dedup.jaccardOnPairsFromMd5(mp, pairs).count())
        mp.unpersist()
      } else if (name == "x7f") {
        import graft.ext.Dedup
        import org.apache.spark.sql.functions.col
        val corpus = graft.io.Tables.documents(spark, sfDir)
          .select(col("doc_id").as("id"), col("text"))
        val perDoc = Dedup.minhashWithSets(corpus, "id", "text", 3, 12).persist()
        t(s"perDoc rep$r")(perDoc.count())
        val pairs = Dedup.candidatePairs(Dedup.lshBands(perDoc, 12, 3))
        t(s"pairs rep$r")(pairs.count())
        t(s"jaccard rep$r")(Dedup.jaccardFromSets(perDoc, pairs).count())
        perDoc.unpersist()
      } else if (name == "events") {
        val ev = graft.io.Tables.events(spark, sfDir)
        t(s"events_count rep$r")(ev.count())
        t(s"events_parts rep$r")(ev.rdd.getNumPartitions.toLong)
        t(s"tumbling rep$r")(graft.streaming.EventStream.tumblingHourly(ev).count())
        t(s"sessions rep$r")(graft.streaming.EventStream.userSessions(ev).count())
      } else {
        t(s"$name rep$r")(SparkEntry.queries(name)(spark, sfDir).count())
      }
    }
    spark.stop()
  }
}
