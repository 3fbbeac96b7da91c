package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop micro-profiler: times one named query (or a comma list) from
  * SparkEntry.queries N times against a scale dir. Not part of the driver
  * contract — used to separate real per-query cost from JVM warmup noise
  * when tuning plans. */
object Profile {
  /** One temp root + ONE cleanup hook for the whole run — kparts used to
    * create a dir and register a shutdown hook per repetition, leaking a
    * hook (and deferring a directory walk) per rep. Per-rep paths carry
    * the rep index, so a shared root is collision-free. */
  private lazy val kpartsTmp: java.nio.file.Path = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-kparts")
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
    tmp
  }

  /** The most expensive bench rows at sf0.1 — the set both scale gates
    * (soakgate, sftrend) exercise at replica scale. r18 adds the two
    * retrieval rows (x47/x48 now top the cold list): at replica scale
    * their work is |queries|·|matching postings|, and the suffixed
    * replica tokens keep each query matching only its own replica — so
    * the gates audit that retrieval stays linear, not queries×corpus. */
  private val soakTop10 = Seq("x46_ivfpq_topk", "x45_bigram_nll",
    "x36_quality_survivors", "x44_dup_span_scrub", "x35_semdedup",
    "x16_ivf_topk", "x39_cluster_balance", "x19_dedup_clusters",
    "x43_dsir_select", "x20_dedup_survivors",
    "x47_bm25_topk", "x48_rrf_fusion",
    // r19: the anchor-probe candidate join (x50 — the linearity claim
    // is ≤ k·maxDf·|docs| candidates), the interpolated-LM scoring
    // pass (x51), and the two-stage exact rerank (x52) audited at
    // replica scale like the rest
    "x50_inclusion", "x51_interp_nll", "x52_pq_rerank",
    // r20: incremental LM maintenance (x53 — the log-table fixture is
    // per-sfDir setup, excluded by min-of-2; the measured body must
    // stay O(delta + gram-table merge)) and arrival containment dedup
    // (x54 — same candidate-join linearity claim as x50, arrival-aware)
    "x53_incremental_lm", "x54_arrival_inclusion")

  /** Build (or reuse) the SOAK fixture: a `reps`× replica of the sf
    * dir's documents/embeddings with the other tables symlinked.
    * Per-TOKEN replica suffixes make vocabulary scale ×reps with zero
    * cross-replica Jaccard (near-dup work scales linearly while
    * vocabulary-class artifacts are forced over the regime bound);
    * element ROTATION keeps replica vectors near-orthogonal (no
    * cross-replica near-dups). Gated on _SUCCESS, not the directory: a
    * killed previous build leaves partial part files that would silently
    * shrink the corpus a gate claims to audit. */
  private def soakFixture(
      spark: SparkSession, sfDir: String, reps: Int): String = {
    import org.apache.spark.sql.functions._
    import java.nio.file.{Files, Paths}
    val tag = java.lang.Long.toHexString(sfDir.hashCode.toLong & 0xffffffffL)
    val gateDir = s"/tmp/graft_soak/sfgate_${reps}x_$tag"
    if (!new java.io.File(s"$gateDir/documents.parquet/_SUCCESS").exists() ||
        !new java.io.File(s"$gateDir/embeddings.parquet/_SUCCESS").exists()) {
      Files.createDirectories(Paths.get(gateDir))
      val repCol = spark.range(0, reps).select(col("id").as("rep"))
      graft.io.Tables.documents(spark, sfDir)
        .crossJoin(repCol)
        .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("_"), col("rep"))), " ").as("text"),
          col("lang"), col("source"))
        // n_chars measures the SUFFIXED text — the replica corpus must
        // be internally consistent or chars-per-token-style quality
        // logic sees a distribution the fixture never has
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$gateDir/documents.parquet")
      graft.io.Tables.embeddings(spark, sfDir)
        .crossJoin(repCol)
        .select((col("vec_id") + col("rep") * 1000000L).as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            i => element_at(col("embedding"),
              pmod(i + col("rep"), lit(64)).cast("int") + 1)).as("embedding"),
          col("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$gateDir/embeddings.parquet")
      for (tbl <- Seq("region", "nation", "customer", "supplier",
          "part", "orders", "lineitem", "events")) {
        val link = Paths.get(s"$gateDir/$tbl.parquet")
        if (!Files.exists(link))
          Files.createSymbolicLink(link, Paths.get(s"$sfDir/$tbl.parquet"))
      }
    }
    gateDir
  }

  def main(args: Array[String]): Unit = {
    // mirror Bench's RAM-backed scratch (tables + shuffle) so probe
    // timings predict bench behavior; must precede any temp-file use
    sys.props("java.io.tmpdir") = Bench.localDir.split(",").head
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same extensions as Bench: the SQL row-level verbs (MERGE/UPDATE
      // through the graft-log catalog) plan via these rules — a probe
      // session without them cannot run the k-rows at all
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Bench.localDir)
      // A/B knob mirroring Bench's: quantify AQE's per-statement driver
      // overhead on the storage verbs (default ON = production conf)
      .config("spark.sql.adaptive.enabled",
        (sys.env.getOrElse("SPARK_GRAFT_AQE", "1") != "0").toString)
      // match Bench's session exactly (r21): probe numbers must predict
      // bench numbers — the codegen-cache size and shuffle-compression
      // settings both moved per-query timings measurably
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.ui.retainedExecutions", "15")
      // A/B knob (r21): let AQE re-plan (and coalesce) the plans of
      // persisted frames — default false upstream for partitioning
      // stability; the probe quantifies what it buys on persist-heavy
      // pipelines before Bench considers it
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        (sys.env.getOrElse("SPARK_GRAFT_CACHEAQE", "0") == "1").toString)
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
      } else if (name == "recall") {
        // ANN recall gate (r14 verdict item 8): at SOAK_REPS× replicas,
        // recall@10 of BOTH approximate paths (hyperplane-LSH annTopK =
        // x15, k-means ivfTopK = x16) against brute-force cosine must
        // hold ≥ 0.9, asserted LOUDLY — the oracle rows pin exactness
        // only at fixture scale, so quantizer/bucketing drift that only
        // shows at volume is caught here. Reuses the soak's replica
        // fixture (rotated vectors: near-orthogonal across replicas, so
        // true neighbors stay within a replica and the task gets harder,
        // not degenerate, with scale).
        import graft.ext.Similarity
        import org.apache.spark.sql.functions._
        val soakDir = "/tmp/graft_soak"
        val soakReps = sys.env.getOrElse("SPARK_GRAFT_SOAK_REPS", "10").toInt
        val embPath = s"$soakDir/emb$soakReps.parquet"
        if (!new java.io.File(embPath).isDirectory) {
          val reps = spark.range(0, soakReps).select(col("id").as("rep"))
          graft.io.Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), col("embedding"))
            .crossJoin(reps)
            .select((col("vec_id") + col("rep") * 1000000L).as("vec_id"),
              transform(sequence(lit(0), lit(63)),
                i => element_at(col("embedding"),
                  pmod(i + col("rep"), lit(64)).cast("int") + 1)).as("embedding"))
            .repartition(32)
            .write.mode("overwrite").parquet(embPath)
        }
        // Operating point: the gate measures recall in the NEAR-NEIGHBOR
        // regime (planted jittered copies, cosine ≈ 0.999) — the regime
        // x10/x15/x35 actually serve. A first cut gated DIFFUSE top-k
        // (background cosines ~0.4 between random vectors) and read
        // 0.48: that is the similarity-dependence of LSH/IVF guarantees,
        // not drift — at near-uniform cosines no sublinear method
        // separates neighbors, and the published recall curves are all
        // quoted at an operating point. Planting makes the truth set
        // findable-by-contract, so a drop below 0.9 means the BUCKETING
        // broke (the phash-slice-width bug class), which is what a gate
        // is for.
        val embBase = spark.read.parquet(embPath)
        val queries = embBase.filter(col("vec_id") % 1000000L < 4)
        // 10 deterministic ±4% element-jittered copies per query: ids far
        // above every replica/dup id, cosine-to-query ≈ 0.999 ≫ the
        // ~0.4 background, so true top-10 = the planted copies
        val planted = queries
          .crossJoin(spark.range(0, 10).select(col("id").as("j")))
          .select((col("vec_id") + lit(40000000L) + col("j")).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x * (lit(1.0) + ((i * 7 + col("j") * 13) % 9 - 4) * lit(0.01)))
              .as("embedding"))
        val embN = embBase.unionByName(planted)
        val prepQ = Similarity.prepared(queries, "vec_id", "embedding")
        val prepC = Similarity.prepared(embN, "vec_id", "embedding")
        val truth = Similarity.bruteForceTopK(prepQ, prepC, 10)
          .select(col("query_id"), col("neighbor_id")).persist()
        val tCount = truth.count()
        def recall(approx: org.apache.spark.sql.DataFrame): Double =
          approx.select("query_id", "neighbor_id")
            .join(truth, Seq("query_id", "neighbor_id"), "left_semi")
            .count().toDouble / tCount
        val annR = recall(Similarity.annTopK(queries, embN, "vec_id",
          "embedding", k = 10, numPlanes = 4, dim = 64))
        val ivfR = recall(Similarity.ivfTopK(queries, embN, "vec_id",
          "embedding", k = 10, nLists = 16, nProbe = 4))
        // the PQ rung gates at the same operating point: 64x-compressed
        // ADC scoring must still separate planted near-copies (cosine
        // ~0.999) from the ~0.4 background — a drop means the codebook
        // training or the ADC arithmetic drifted
        val ivfpqR = recall {
          val cents = Similarity.trainIvfKmeans(embN, "vec_id", "embedding",
            nLists = 16, rounds = 2)
          val cbs = Similarity.trainPqCodebooks(embN, "vec_id", "embedding",
            m = 8, ksub = 16, rounds = 2)
          Similarity.ivfpqTopK(queries, embN, "vec_id", "embedding",
            k = 10, centroids = cents, cbs = cbs, nProbe = 4)
        }
        truth.unpersist()
        println(f"RECALL ann@10=$annR%.4f ivf@10=$ivfR%.4f ivfpq@10=$ivfpqR%.4f reps=$soakReps queries=${tCount / 10}")
        require(annR >= 0.9 && ivfR >= 0.9 && ivfpqR >= 0.9,
          f"ANN recall gate FAILED at ${soakReps}x replicas: " +
            f"ann@10=$annR%.4f ivf@10=$ivfR%.4f ivfpq@10=$ivfpqR%.4f (floor 0.9)")
      } else if (name == "kparts") {
        // storage-row decomposition: clone vs verb vs read-back — where
        // does a k-row's ~0.7 s actually go? Job counter: how many Spark
        // jobs does each phase launch (launch overhead ~30-80 ms each)?
        import org.apache.spark.sql.functions._
        val jobs = new java.util.concurrent.atomic.AtomicInteger()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              jobs.incrementAndGet()
          })
        def tj(label: String)(f: => Long): Unit = {
          val j0 = jobs.get()
          t(label)(f)
          println(s"  JOBS $label ${jobs.get() - j0}")
        }
        val base = graft.io.Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
          .select(col("o_orderkey").as("order_id"),
            col("o_orderstatus").as("status"), lit("base").as("src"))
        val tmp = kpartsTmp
        val basePath = tmp.resolve(s"base$r").toString
        tj(s"create_base rep$r") {
          graft.io.LogTable.create(spark, basePath,
            base.repartitionByRange(8, col("order_id")), "order_id"); 1L
        }
        val clonePath = tmp.resolve(s"clone$r").toString
        tj(s"clone rep$r") {
          graft.io.LogTable.cloneTable(basePath, clonePath); 1L
        }
        val incoming = graft.io.Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select(col("o_orderkey").as("order_id"),
            col("o_orderstatus").as("status"), lit("resynced").as("src"))
        tj(s"upsert rep$r") {
          graft.io.LogTable.upsert(spark, clonePath, incoming, "order_id"); 1L
        }
        tj(s"read_sort_noop rep$r") {
          graft.io.LogTable.read(spark, clonePath).orderBy("order_id")
            .write.format("noop").mode("overwrite").save(); 1L
        }
        tj(s"read_noop rep$r") {
          graft.io.LogTable.read(spark, clonePath)
            .write.format("noop").mode("overwrite").save(); 1L
        }
        tj(s"incoming_scan rep$r")(incoming.count())
      } else if (name == "warmprobe") { if (r == 1) {
        // Bench's warm protocol for one query (env SPARK_GRAFT_PROBE_QUERIES):
        // prime with artifacts retained, then reps with clearCache+gc
        // between — with per-rep job counts, to localize warm-facet cost.
        val jobs = new java.util.concurrent.atomic.AtomicInteger()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
              jobs.incrementAndGet()
          })
        val qn = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES", "x45_bigram_nll")
        graft.io.ArtifactCache.retainOnly(_.startsWith("import:"))
        def run(label: String): Unit = {
          val j0 = jobs.get()
          val t0 = System.nanoTime()
          SparkEntry.queries(qn)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          println(f"PROFILE warmprobe $label ${(System.nanoTime() - t0) / 1e9}%6.3f s jobs=${jobs.get() - j0}")
          spark.catalog.clearCache()
          System.gc()
          Thread.sleep(150)
        }
        run("prime")
        for (i <- 1 to reps) run(s"warm$i")
      } } else if (name == "kjobs") {
        // per-storage-row job counts: which row launches outlier job
        // counts (each job is ~30-80 ms launch overhead at local[32])?
        val jobs = new java.util.concurrent.atomic.AtomicInteger()
        val inJobNs = new java.util.concurrent.atomic.AtomicLong()
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              jobs.incrementAndGet()
              starts.put(js.jobId, System.nanoTime())
            }
            override def onJobEnd(
                je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
              val st = starts.remove(je.jobId)
              if (st != null) inJobNs.addAndGet(System.nanoTime() - st)
            }
          })
        for (qn <- Seq("k11_log_upsert", "k12_log_maintenance",
            "k13_change_feed", "k14_merge", "k17_catalog_merge",
            "k18_full_sync", "k19_restore", "k20_catalog_update",
            "k22_rename_column", "k23_dv_merge", "k24_dv_conditional",
            "k25_mor_update", "k26_dv_bulk")) {
          val j0 = jobs.get()
          val n0 = inJobNs.get()
          t(s"$qn rep$r") {
            SparkEntry.queries(qn)(spark, sfDir)
              .write.format("noop").mode("overwrite").save(); 1L
          }
          println(s"  JOBS $qn rep$r ${jobs.get() - j0} " +
            f"injob=${(inJobNs.get() - n0) / 1e9}%.3f")
        }
      } else if (name == "soakgate") { if (r == 1) {
        // Round-close scale soak (r16 verdict item 6): every 100 TB claim
        // (regime dispatch bounds, DV budgets, LSH band fan-out, artifact
        // cache cap) is otherwise only proven at fixture scale. This gate
        // synthesizes a SOAK_REPS× (default 10×) replica of the sf dir's
        // documents/embeddings (other tables symlinked), runs the TOP-10
        // most expensive bench queries against it end to end, runs one
        // BULK merge-on-read upsert over a replicated 10× orders log
        // table, and asserts:
        //   (a) completion at the bench heap (-Xmx24g via tools/soak.sh)
        //       — no OOM;
        //   (b) no corpus-scaling artifact (vocabulary-class Regime keys:
        //       unigram-tf / bigram-tf / tfidf-df) flipped to the
        //       driver-side collected path — at 10× those artifacts MUST
        //       dispatch distributed;
        //   (c) the bulk upsert stayed merge-on-read (positional
        //       sidecars minted, zero base files rewritten, exact rows).
        // Pair-class keys (lsh-cand/cc/boiler/dupspan) are REPORTED, not
        // gated: near-dup pair counts legitimately stay driver-small at
        // this replica scale.
        import org.apache.spark.sql.functions._
        import java.nio.file.{Files, Paths}
        val soakReps = sys.env.getOrElse("SPARK_GRAFT_SOAK_REPS", "10").toInt
        val tag = java.lang.Long.toHexString(sfDir.hashCode.toLong & 0xffffffffL)
        val gateDir = soakFixture(spark, sfDir, soakReps)
        graft.io.Regime.lastDecision.clear()
        val top10 = soakTop10
        for (qn <- top10)
          t(s"soakgate $qn ${soakReps}x")(
            SparkEntry.queries(qn)(spark, gateDir).count())
        // bulk merge-on-read at scale: replicated orders → one upsert
        // whose distinct-key count is far over DvMaxKeys, so the
        // positional-sidecar path MUST engage (never a driver key set,
        // never a copy-on-write rewrite)
        t(s"soakgate dv_bulk_merge ${soakReps}x") {
          val tbl = s"/tmp/graft_soak/dvmerge_${soakReps}x_$tag"
          if (Files.isDirectory(Paths.get(tbl))) {
            import scala.jdk.CollectionConverters._
            val walk = Files.walk(Paths.get(tbl))
            try walk.sorted(java.util.Comparator.reverseOrder())
              .iterator().asScala.foreach(Files.deleteIfExists(_))
            finally walk.close()
          }
          val reps = spark.range(0, soakReps).select(col("id").as("rep"))
          val base = graft.io.Tables.orders(spark, sfDir)
            .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
            .crossJoin(reps)
            .select((col("o_orderkey") + col("rep") * 10000000L).as("k"),
              col("o_orderstatus").as("status"),
              col("o_totalprice").as("total"))
          graft.io.LogTable.create(spark, tbl,
            base.repartitionByRange(32, col("k")), "k")
          val filesBefore = graft.io.LogTable.read(spark, tbl).inputFiles.toSet
          val nBase = graft.io.LogTable.read(spark, tbl).count()
          val inc = graft.io.LogTable.read(spark, tbl)
            .filter(col("k") % 3 === 0)
            .select(col("k"), lit("X").as("status"), col("total"))
          val nInc = inc.count()
          graft.io.LogTable.upsertDV(spark, tbl, inc, "k")
          val after = graft.io.LogTable.read(spark, tbl)
          require(graft.io.LogTable.livePosDvs(tbl, None).nonEmpty,
            "SOAKGATE: bulk upsert fell off the positional merge-on-read path")
          val filesAfter = after.inputFiles.toSet
          require(filesBefore.subsetOf(filesAfter),
            s"SOAKGATE: bulk merge rewrote ${(filesBefore -- filesAfter).size} base files")
          val nAfter = after.count()
          require(nAfter == nBase,
            s"SOAKGATE: row count drifted $nBase -> $nAfter")
          val nUpd = after.filter(col("status") === "X").count()
          require(nUpd == nInc,
            s"SOAKGATE: expected $nInc updated rows, found $nUpd")
          nAfter
        }
        // Regime audit, two directions.
        // (1) Natural scale: the artifact that PROVABLY outgrows the 2^13
        // bound at 10× is the bigram table (fixture vocabulary is 31
        // words; per-replica suffixes make ~31²×reps distinct bigram
        // hashes ≈ 9.6k > 8192) — it must have dispatched distributed.
        // Unigram/df artifacts stay genuinely driver-small on this
        // fixture (~31×reps rows) and collecting them is CORRECT
        // dispatch, so they are reported, not gated.
        import scala.jdk.CollectionConverters._
        val decisions = graft.io.Regime.lastDecision.asScala.toMap
        val scalingFlips = decisions.filter { case (k, v) =>
          k.startsWith("bigram-tf") && v == "collected" }
        require(scalingFlips.isEmpty,
          s"SOAKGATE: corpus-scaling artifacts collected driver-side at " +
            s"${soakReps}x: ${scalingFlips.keys.mkString(", ")}")
        val reported = decisions.map { case (k, v) => s"$k=$v" }.toSeq.sorted
        // (2) Forced bound: plant a tiny regime bound, sweep artifacts,
        // and re-run one vocabulary-backed query — at soak scale the
        // DISTRIBUTED regime must both engage (no collected decision) and
        // serve the same result (RegimeSpec proves this at fixture scale;
        // this is the 10× datapoint).
        graft.io.Regime.lastDecision.clear()
        graft.io.ArtifactCache.retainOnly(_.startsWith("import:"))
        sys.props("graft.regime.collectMaxRows") = "64"
        try {
          t(s"soakgate x43 forced-bound ${soakReps}x") {
            val n = SparkEntry.queries("x43_dsir_select")(spark, gateDir).count()
            require(n > 0, "SOAKGATE: forced-bound x43 returned no rows")
            n
          }
          val forced = graft.io.Regime.lastDecision.asScala.toMap
          val still = forced.filter(_._2 == "collected")
          require(still.isEmpty,
            s"SOAKGATE: forced bound 64 still collected driver-side: " +
              s"${still.keys.mkString(", ")}")
        } finally {
          sys.props.remove("graft.regime.collectMaxRows")
          graft.io.ArtifactCache.retainOnly(_.startsWith("import:"))
        }
        println(s"SOAKGATE PASS reps=$soakReps queries=${top10.size} " +
          s"scaling_flips=0 forced_bound_flips=0 " +
          s"decisions=[${reported.mkString(", ")}]")
      } } else if (name == "sftrend") { if (r == 1) {
        // Scale-TREND gate (r17 verdict item 6): correctness runs at
        // sf0.01 and the bench at sf0.1 — neither measures the GROWTH
        // CURVE, so a stage that is accidentally quadratic in corpus
        // size (an all-pairs fallback, band-bucket skew, a collect that
        // grows with the corpus) stays invisible until real scale. This
        // times each of the most expensive corpus rows COLD (artifact
        // caches dropped before every run — the bench's cold protocol)
        // at 1× and at SOAK_REPS× replicas (the soak fixture: suffixed
        // tokens / rotated vectors, so RESULT cardinality scales
        // linearly by construction) and asserts wall time grows at most
        // ~linearly:  t(N×) ≤ SLACK·N·t(1×) + FLOOR.
        // SLACK 2.0 absorbs constant-amortization and host noise; FLOOR
        // 1.5 s absorbs per-query fixed cost on sub-second rows. A
        // quadratic stage lands at ~N·t(1×) OVER the bound at N=10 —
        // loudly red. tools/sftrend.sh appends the lines to
        // tools/sftrend.log once per round.
        val soakReps = sys.env.getOrElse("SPARK_GRAFT_SOAK_REPS", "10").toInt
        val gateDir = soakFixture(spark, sfDir, soakReps)
        val slack = sys.env.getOrElse("SPARK_GRAFT_TREND_SLACK", "2.0").toDouble
        val floor = sys.env.getOrElse("SPARK_GRAFT_TREND_FLOOR", "1.5").toDouble
        val trendReps = 2
        def coldMin(qn: String, dir: String): Double =
          (1 to trendReps).map { _ =>
            spark.catalog.clearCache()
            graft.io.ArtifactCache.retainOnly(_.startsWith("import:"))
            val t0 = System.nanoTime()
            SparkEntry.queries(qn)(spark, dir)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }.min
        val red = scala.collection.mutable.ListBuffer.empty[String]
        for (qn <- soakTop10) {
          val t1 = coldMin(qn, sfDir)
          val tN = coldMin(qn, gateDir)
          val bound = slack * soakReps * t1 + floor
          val ok = tN <= bound
          if (!ok) red += qn
          println(f"SFTREND $qn t1=$t1%.3f t$soakReps=$tN%.3f " +
            f"ratio=${tN / math.max(t1, 1e-9)}%.1f bound=$bound%.3f " +
            (if (ok) "OK" else "RED"))
        }
        graft.io.ArtifactCache.retainOnly(_.startsWith("import:"))
        require(red.isEmpty,
          s"SFTREND: superlinear growth ${sfDir}→${soakReps}x on: " +
            red.mkString(", "))
        println(s"SFTREND PASS reps=$soakReps queries=${soakTop10.size} " +
          s"slack=$slack floor=$floor")
      } } else if (name == "kdetail") {
        // per-JOB decomposition of one query's timed body (env
        // SPARK_GRAFT_PROBE_QUERIES, comma list): call site, duration,
        // task count — localizes which driver action inside a storage
        // verb pays, where kjobs only gives the aggregate.
        case class JobRec(id: Int, site: String, tasks: Int,
            start: Long, var end: Long)
        val recs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
                .take(90)
              val tasks = js.stageInfos.map(_.numTasks).sum
              recs.put(js.jobId,
                JobRec(js.jobId, site, tasks, System.nanoTime(), 0L))
            }
            override def onJobEnd(
                je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
              val rec = recs.get(je.jobId)
              if (rec != null) rec.end = System.nanoTime()
            }
          })
        val qns = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES",
          "k13_change_feed,k17_catalog_merge,k20_catalog_update")
          .split(",").map(_.trim).filter(_.nonEmpty)
        for (qn <- qns) {
          recs.clear()
          val fc0 = graft.io.LogTable.foldCalls.get()
          val fn0 = graft.io.LogTable.foldNanos.get()
          val t0 = System.nanoTime()
          SparkEntry.queries(qn)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"  FOLDS $qn rep$r n=${graft.io.LogTable.foldCalls.get() - fc0} " +
            f"sec=${(graft.io.LogTable.foldNanos.get() - fn0) / 1e9}%.3f")
          import scala.jdk.CollectionConverters._
          val rows = recs.values.asScala.toSeq.sortBy(_.id)
          val injob = rows.map(r =>
            if (r.end > 0) (r.end - r.start) / 1e9 else 0.0).sum
          println(f"KDETAIL $qn rep$r wall=$wall%.3f injob=$injob%.3f jobs=${rows.size}")
          rows.foreach { jr =>
            val d = if (jr.end > 0) (jr.end - jr.start) / 1e9 else -1.0
            println(f"  JOB ${jr.id}%3d $d%7.3f s tasks=${jr.tasks}%4d  ${jr.site}")
          }
        }
      } else if (name == "coldjobs") { if (r == 1) {
        // Bench's COLD protocol for a query list (env
        // SPARK_GRAFT_PROBE_QUERIES) with kdetail's per-job decomposition:
        // sf0.001 warmup first (codegen/JIT steady state, like Bench),
        // then per rep sweep BOTH cache layers so every rep pays its own
        // artifact builds — the number the bench's cold facet reports —
        // and print each job's call site, duration, and task count.
        case class JobRec(id: Int, site: String, tasks: Int,
            start: Long, var end: Long)
        val recs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
              val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
                .take(90)
              val tasks = js.stageInfos.map(_.numTasks).sum
              recs.put(js.jobId,
                JobRec(js.jobId, site, tasks, System.nanoTime(), 0L))
            }
            override def onJobEnd(
                je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
              val rec = recs.get(je.jobId)
              if (rec != null) rec.end = System.nanoTime()
            }
          })
        val qns = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES", "x45_bigram_nll")
          .split(",").map(_.trim).filter(_.nonEmpty)
        val warmDir = "/root/testdata/sf0.001"
        if (new java.io.File(warmDir).isDirectory)
          for (qn <- qns)
            try SparkEntry.queries(qn)(spark, warmDir)
              .write.format("noop").mode("overwrite").save()
            catch { case _: Throwable => }
        spark.catalog.clearCache()
        graft.io.ArtifactCache.retainOnly(_.startsWith("import:"))
        System.gc(); Thread.sleep(150)
        for (qn <- qns; rep <- 1 to reps) {
          recs.clear()
          var df: org.apache.spark.sql.DataFrame = null
          val tc0 = System.nanoTime()
          df = SparkEntry.queries(qn)(spark, sfDir)
          val tCons = (System.nanoTime() - tc0) / 1e9
          val tp0 = System.nanoTime()
          df.queryExecution.executedPlan
          val tPlan = (System.nanoTime() - tp0) / 1e9
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          import scala.jdk.CollectionConverters._
          val rows = recs.values.asScala.toSeq.sortBy(_.id)
          val injob = rows.map(r =>
            if (r.end > 0) (r.end - r.start) / 1e9 else 0.0).sum
          println(f"COLDJOBS $qn rep$rep cons=$tCons%.3f plan=$tPlan%.3f " +
            f"exec=$wall%.3f injob=$injob%.3f jobs=${rows.size}")
          rows.foreach { jr =>
            val d = if (jr.end > 0) (jr.end - jr.start) / 1e9 else -1.0
            val phase =
              if (jr.start < tp0) "cons" else if (jr.start < t0) "plan" else "exec"
            val off = (jr.start - tc0) / 1e9
            println(f"  JOB ${jr.id}%3d $d%7.3f s tasks=${jr.tasks}%4d $phase%-4s +$off%6.3f  ${jr.site}")
          }
          spark.catalog.clearCache()
          graft.io.ArtifactCache.retainOnly(_.startsWith("import:"))
          System.gc(); Thread.sleep(150)
        }
      } } else if (name == "explain") { if (r == 1) {
        // executed-plan summary for SPARK_GRAFT_PROBE_QUERIES: node-type
        // counts that matter for plan review (reused exchanges/subtrees,
        // aggregation and join counts), plus the full plan on request.
        val qns = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES", "x48_rrf_fusion")
          .split(",").map(_.trim).filter(_.nonEmpty)
        for (qn <- qns) {
          val df = SparkEntry.queries(qn)(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          val plan = df.queryExecution.executedPlan.toString
          def n(p: String) = p.r.findAllIn(plan).length
          println(s"EXPLAIN $qn reusedExchange=${n("ReusedExchange")} " +
            s"reusedSubquery=${n("ReusedSubquery")} " +
            s"hashAgg=${n("HashAggregate")} smj=${n("SortMergeJoin")} " +
            s"bhj=${n("BroadcastHashJoin")} window=${n("Window")} " +
            s"exchange=${n("Exchange")}")
          if (sys.env.get("SPARK_GRAFT_EXPLAIN_FULL").contains("1"))
            println(plan)
        }
      } } else if (name == "planscan") {
        // Print every query whose physical plan contains a quadratic
        // join — dev-loop companion to PlanSpec's blanket gate.
        graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (qn, fn) =>
          try {
            val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
            val cart = plan.contains("CartesianProduct")
            val bnlj = plan.contains("BroadcastNestedLoopJoin")
            if (cart || bnlj) println(s"PLANSCAN $qn cartesian=$cart bnlj=$bnlj")
          } catch { case e: Throwable =>
            println(s"PLANSCAN $qn ERROR ${e.getClass.getSimpleName}") }
        }
        println("PLANSCAN done")
      } else if (name == "soak") {
        // Scale soak (r3 verdict item 8): 10× replicas of documents/
        // embeddings with per-replica perturbations chosen so result
        // cardinality scales LINEARLY by construction (replica text gets
        // a distinct suffix; replica vectors get ±50% deterministic noise
        // → cross-replica cosine ≪ 0.99). If any stage were quadratic in
        // corpus size (band-bucket or LSH-bucket skew), the 10× timing
        // would blow past ~10× the 1× timing.
        import graft.ext.{Dedup, Similarity}
        import org.apache.spark.sql.functions._
        val soakDir = "/tmp/graft_soak"
        // replica count is a run parameter (10x default; the r6 verdict
        // asked for a second datapoint at 30x)
        val soakReps = sys.env.getOrElse("SPARK_GRAFT_SOAK_REPS", "10").toInt
        val docs1 = graft.io.Tables.documents(spark, sfDir)
          .select(col("doc_id").as("id"), col("text"))
        val emb1 = graft.io.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"))
        if (!new java.io.File(s"$soakDir/docs$soakReps.parquet").isDirectory) {
          val reps = spark.range(0, soakReps).select(col("id").as("rep"))
          // Per-TOKEN replica suffix: every shingle differs across
          // replicas (cross-replica Jaccard = 0, uncorrelated simhash
          // bits), so near-dup pair counts scale linearly with replicas
          // — the soak then measures algorithmic scaling, not a planted
          // quadratic pair blowup.
          docs1.crossJoin(reps)
            .select((col("id") + col("rep") * 1000000L).as("id"),
              array_join(transform(split(col("text"), " "),
                t => concat(t, lit("_"), col("rep"))), " ").as("text"))
            .repartition(32)
            .write.mode("overwrite").parquet(s"$soakDir/docs$soakReps.parquet")
          // Element ROTATION by replica: rotated random vectors are
          // near-orthogonal (cosine ~ N(0, 1/64)), so no cross-replica
          // near-dups; within-replica planted copies stay identical.
          emb1.crossJoin(reps)
            .select((col("vec_id") + col("rep") * 1000000L).as("vec_id"),
              transform(sequence(lit(0), lit(63)),
                i => element_at(col("embedding"),
                  pmod(i + col("rep"), lit(64)).cast("int") + 1)).as("embedding"))
            .repartition(32)
            .write.mode("overwrite").parquet(s"$soakDir/emb$soakReps.parquet")
        }
        val docsN = spark.read.parquet(s"$soakDir/docs$soakReps.parquet")
        val embN = spark.read.parquet(s"$soakDir/emb$soakReps.parquet")

        // planted-dup offset derived from the replica count so dup ids
        // can never collide with replica ids at any SOAK_REPS setting
        val dupOffset = math.max(100000000L, (soakReps + 1).toLong * 1000000L)
        def dupDocs(df: org.apache.spark.sql.DataFrame) = df.unionByName(
          df.filter(col("id") % 20 === 0)
            .select((col("id") + dupOffset).as("id"),
              concat(col("text"), lit(" extra extra token")).as("text")))
        def dupEmb(df: org.apache.spark.sql.DataFrame) = df.unionByName(
          df.filter(col("vec_id") % 25 === 0)
            .select((col("vec_id") + dupOffset).as("vec_id"), col("embedding")))

        for ((label, d, e) <- Seq(("x1", docs1, emb1), (s"x$soakReps", docsN, embN))) {
          val corpus = dupDocs(d)
          val ecorp = dupEmb(e)
          t(s"$label minhash_cand rep$r") {
            val sig = Dedup.minhashSignature(corpus, "id", "text")
            Dedup.candidatePairs(Dedup.lshBands(sig, 12, 3)).count()
          }
          t(s"$label jaccard rep$r") {
            val perDoc = Dedup.minhashWithSets(corpus, "id", "text").persist()
            val pairs = Dedup.candidatePairs(Dedup.lshBands(perDoc, 12, 3))
            val n = Dedup.jaccardFromSets(perDoc, pairs)
              .filter(col("jaccard") >= 0.5).count()
            perDoc.unpersist(); n
          }
          t(s"$label simhash rep$r") {
            Dedup.simhashPairs(Dedup.simhash32(corpus, "id", "text"), 3).count()
          }
          t(s"$label embed_neardup rep$r") {
            Similarity.nearDupPairs(
              Similarity.prepared(ecorp, "vec_id", "embedding"), 0.99, dim = 64).count()
          }
          t(s"$label ann_topk rep$r") {
            Similarity.annTopK(e.filter(col("vec_id") < 8), e,
              "vec_id", "embedding", k = 5, numPlanes = 4, dim = 64).count()
          }
          t(s"$label dup_ngrams rep$r") {
            graft.ext.Corpus.duplicateNgramStats(corpus, "id", "text", 6).count()
          }
          t(s"$label contamination rep$r") {
            graft.ext.Corpus.benchmarkOverlap(
              d, "id", "text", col("id") % 50 === 0, 3).count()
          }
          t(s"$label prefix_sum rep$r") {
            graft.ext.Corpus.prefixSum(
              d.select(col("id"),
                size(split(col("text"), " ")).cast("long").as("v")),
              "id", "v", "cum").count()
          }
          t(s"$label line_dedup rep$r") {
            graft.ext.Corpus.boilerplateLines(
              corpus, "id", "text", lineTokens = 8, minCount = 2).count()
          }
          t(s"$label unigram_nll rep$r") {
            // the x41 shape without its cache wrapper: vocabulary
            // groupBy + per-doc join/reduce, all corpus-sized
            val tf = d.select(col("id"),
              explode(graft.functions.TermStats(split(col("text"), " "))
                .getField("counts")).as("tc"))
              .select(col("id"), col("tc").getField("term").as("term"),
                col("tc").getField("tf").as("tf"))
            val cnt = tf.groupBy("term").agg(sum("tf").as("ctf"))
            tf.join(cnt, Seq("term")).groupBy("id")
              .agg(sum(col("tf") * (length(bin(col("ctf"))) - 1)).as("bits"))
              .count()
          }
          spark.catalog.clearCache()
        }
      } else if (name == "g1v") {
        // g1_rollup variants: isolate the decimal-cast tax vs Expand cost.
        import org.apache.spark.sql.functions._
        val li = graft.io.Tables.lineitem(spark, sfDir)
        def run(label: String)(df: org.apache.spark.sql.DataFrame): Unit =
          t(s"$label rep$r") { df.write.format("noop").mode("overwrite").save(); 0L }
        // current: moneySum inside rollup agg (cast per expanded row)
        run("g1_current")(li.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(graft.util.Parity.moneySum(col("l_quantity")).as("sum_qty"),
            graft.util.Parity.moneySum(col("l_extendedprice")).as("sum_price"),
            count(lit(1)).as("n")))
        // pre-projected decimal micros (cast once per input row, pre-Expand)
        def decMicros(c: org.apache.spark.sql.Column) =
          (c.cast("decimal(24,6)") * lit(1000000)).cast("long")
        run("g1_premicros")(li
          .select(col("l_returnflag"), col("l_linestatus"),
            decMicros(col("l_quantity")).as("qu"),
            decMicros(col("l_extendedprice")).as("pu"))
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg((sum(col("qu")).cast("decimal(38,0)") *
              lit(new java.math.BigDecimal("0.000001"))).cast("double").as("sum_qty"),
            (sum(col("pu")).cast("decimal(38,0)") *
              lit(new java.math.BigDecimal("0.000001"))).cast("double").as("sum_price"),
            count(lit(1)).as("n")))
        // pure-codegen floor micros (no BigDecimal anywhere)
        def floorMicros(c: org.apache.spark.sql.Column) =
          floor(c * lit(1000000.0) + lit(0.5))
        run("g1_floormicros")(li
          .select(col("l_returnflag"), col("l_linestatus"),
            floorMicros(col("l_quantity")).as("qu"),
            floorMicros(col("l_extendedprice")).as("pu"))
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg((sum(col("qu")).cast("decimal(38,0)") *
              lit(new java.math.BigDecimal("0.000001"))).cast("double").as("sum_qty"),
            (sum(col("pu")).cast("decimal(38,0)") *
              lit(new java.math.BigDecimal("0.000001"))).cast("double").as("sum_price"),
            count(lit(1)).as("n")))
        // plain double sums (the no-parity floor)
        run("g1_double")(li.rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("sum_qty"),
            sum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n")))
      } else if (name == "micreq") {
        // Equality audit: floor(x*1e6+0.5) vs (cast decimal(24,6))*1e6 over
        // every money expression the suite sums. Expect 0 mismatches.
        import org.apache.spark.sql.functions._
        val li = graft.io.Tables.lineitem(spark, sfDir)
        val or = graft.io.Tables.orders(spark, sfDir)
        def decMicros(c: org.apache.spark.sql.Column) =
          (c.cast("decimal(24,6)") * lit(1000000)).cast("long")
        def floorMicros(c: org.apache.spark.sql.Column) =
          floor(c * lit(1000000.0) + lit(0.5))
        val exprs: Seq[(String, org.apache.spark.sql.DataFrame, org.apache.spark.sql.Column)] = Seq(
          ("qty", li, col("l_quantity")),
          ("extprice", li, col("l_extendedprice")),
          ("revenue", li, col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          ("charged", li, col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))),
          ("totalprice", or, col("o_totalprice")),
          ("negrev", li, -col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        for ((lbl, df, e) <- exprs)
          t(s"micreq_$lbl rep$r")(
            df.filter(decMicros(e) =!= floorMicros(e)).count())
      } else if (name == "j4v") {
        import org.apache.spark.sql.functions._
        val li = graft.io.Tables.lineitem(spark, sfDir)
        val or = graft.io.Tables.orders(spark, sfDir)
        def run(label: String)(df: org.apache.spark.sql.DataFrame): Unit =
          t(s"$label rep$r") { df.write.format("noop").mode("overwrite").save(); 0L }
        run("j4_current")(li.join(or, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("line_cnt"),
            graft.util.Parity.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy("priority"))
        // pre-aggregate lineitem per orderkey BEFORE the join (600k→150k)
        run("j4_preagg")(li
          .select(col("l_orderkey"),
            ((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast("decimal(24,6)") * lit(1000000)).cast("long").as("ru"))
          .groupBy("l_orderkey")
          .agg(sum(col("ru")).as("ru"), count(lit(1)).as("nl"))
          .join(or, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(sum(col("nl")).as("line_cnt"),
            (sum(col("ru")).cast("decimal(38,0)") *
              lit(new java.math.BigDecimal("0.000001"))).cast("double").as("revenue"))
          .orderBy("priority"))
        // broadcast the pruned orders side
        run("j4_bcast")(li.join(
            broadcast(or.select("o_orderkey", "o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("line_cnt"),
            graft.util.Parity.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy("priority"))
      } else if (name == "w1fan") {
        // w1 with the lineitem scan fanned out before the decimal agg:
        // does parallelizing the partial aggregation beat the extra
        // shuffle of 600k raw rows?
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val li = graft.util.Partitioning.fanOut(
          graft.io.Tables.lineitem(spark, sfDir)
            .select("l_returnflag", "l_partkey", "l_extendedprice", "l_discount"))
        val rev = li.groupBy(col("l_returnflag"), col("l_partkey"))
          .agg(graft.util.Parity.moneySum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        val w = Window.partitionBy("l_returnflag")
          .orderBy(desc("revenue"), col("l_partkey"))
        t(s"w1fan rep$r")(
          rev.withColumn("rnk", row_number().over(w))
            .filter(col("rnk") <= 3)
            .select("l_returnflag", "rnk", "l_partkey", "revenue")
            .orderBy("l_returnflag", "rnk").count())
      } else if (name == "w1parts") {
        import org.apache.spark.sql.functions._
        val rev0 = graft.io.Tables.lineitem(spark, sfDir)
          .groupBy(col("l_returnflag"), col("l_partkey"))
          .agg(graft.util.Parity.moneySum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        t(s"w1parts agg rep$r")(rev0.count())
      } else if (name == "w1double") {
        // Same agg with a plain double sum: isolates the decimal tax.
        import org.apache.spark.sql.functions._
        val rev0 = graft.io.Tables.lineitem(spark, sfDir)
          .groupBy(col("l_returnflag"), col("l_partkey"))
          .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        t(s"w1double agg rep$r")(rev0.count())
      } else if (name == "w1long") {
        // Decimal cast per row, but the SUM runs over the unscaled long.
        import org.apache.spark.sql.functions._
        val rev0 = graft.io.Tables.lineitem(spark, sfDir)
          .groupBy(col("l_returnflag"), col("l_partkey"))
          .agg((sum((  (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(24,6)") * lit(1000000)).cast("long"))
            .cast("double") / lit(1e6)).as("revenue"))
        t(s"w1long agg rep$r")(rev0.count())
      } else if (name == "x21win") {
        // TF-IDF with df via a window over the tf frame instead of
        // groupBy+join-back (one fewer exchange + no join build).
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val docs = graft.util.Partitioning.fanOut(graft.io.Tables.documents(spark, sfDir))
        val n = graft.io.Tables.documents(spark, sfDir).count()
        val tf = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("term"))
        t(s"x21win rep$r")(
          tf.withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
            .withColumn("score",
              (col("tf") * lit(n)).cast("double") / col("df").cast("double"))
            .withColumn("rnk", row_number().over(w))
            .filter(col("rnk") <= 3)
            .select("doc_id", "rnk", "term", "tf", "df", "score")
            .orderBy("doc_id", "rnk").count())
      } else if (name == "x29parts") {
        import graft.functions.BloomFilter
        import org.apache.spark.sql.functions._
        val keys = graft.io.Tables.part(spark, sfDir).filter(col("p_size") <= 2)
          .select(col("p_partkey").cast("string").as("k"))
        var bits: Seq[Long] = null
        t(s"build rep$r") { bits = keys.agg(BloomFilter.bloomAgg(col("k"))).head().getSeq[Long](0); 1L }
        val li = graft.io.Tables.lineitem(spark, sfDir).select("l_returnflag", "l_partkey")
        t(s"probe_nofan rep$r")(li.filter(BloomFilter.mightContain(bits, col("l_partkey"))).count())
        t(s"probe_fan rep$r")(graft.util.Partitioning.fanOut(li)
          .filter(BloomFilter.mightContain(bits, col("l_partkey"))).count())
        t(s"exact rep$r")(li.join(broadcast(graft.io.Tables.part(spark, sfDir)
            .filter(col("p_size") <= 2).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi").count())
      } else if (name == "aqeprobe") { if (r == 1) { // rep loop handled internally
        // Noop-sink timing of every query with AQE on vs off, same JVM:
        // isolates the adaptive re-planning + extra stage-barrier latency
        // from real compute at bench scale. Runtime conf, so no restart.
        val qnames = sys.env.get("SPARK_GRAFT_PROBE_QUERIES")
          .map(_.split(",").toSeq)
          .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
        def timeNoop(qn: String): Double = {
          val t0 = System.nanoTime()
          SparkEntry.queries(qn)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        // warmup both AQE modes
        for (aqe <- Seq("true", "false"); qn <- qnames) {
          spark.conf.set("spark.sql.adaptive.enabled", aqe)
          try timeNoop(qn) catch { case e: Throwable => println(s"WARMERR $qn $aqe ${e.getClass.getSimpleName}") }
        }
        var totOn = 0.0; var totOff = 0.0
        for (qn <- qnames) {
          def best(aqe: String): Double = {
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            (1 to reps).map { _ =>
              val dt = timeNoop(qn); spark.catalog.clearCache(); System.gc(); dt
            }.min
          }
          val on = best("true"); val off = best("false")
          totOn += on; totOff += off
          println(f"AQEPROBE $qn%-28s on=$on%6.3f off=$off%6.3f delta=${on - off}%+6.3f")
        }
        println(f"AQEPROBE TOTAL on=$totOn%7.2f off=$totOff%7.2f delta=${totOn - totOff}%+7.2f")
      } } else if (name == "events") {
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
