package graft.streaming

import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Continuous DOCUMENT ingestion with dedup-on-arrival: raw document
  * JSON lands in a directory, each micro-batch runs
  * [[graft.ext.Dedup.arrivalStep]] against the accumulated retained
  * corpus (x30's batch-vs-index band probe composed into the live
  * path), and only first-arrival survivors are appended to the
  * warehouse — the training-data shape where the corpus must stay
  * deduplicated WHILE it is being collected, not re-clustered after
  * the fact.
  *
  * State is ONE LOG-STRUCTURED table (`dedup_corpus`, via
  * [[graft.io.LogTable]]: id, text, bands) — a doc and its LSH band
  * keys commit in the same rows AND the multi-file batch append is one
  * atomic manifest commit, so neither a torn write nor a foreachBatch
  * retry can leave a doc indexed without bands (or half a batch
  * visible); the replay-id guard in [[Dedup.arrivalStep]] then makes
  * retries absorbing (at-least-once delivery → exactly-once state),
  * the same contract OrderStream's keyed upsert gives facts — plus the
  * log's time travel: the corpus as of any earlier ingest batch stays
  * readable for training-run reproducibility.
  *
  * Scale: the per-batch probe is a band equi-join of batch-bands
  * against index-bands — linear in batch size, never corpus×corpus;
  * the index itself is an append-only columnar table that Spark scans
  * predicate-pruned (only the two band-key columns feed the join). The
  * stream holds no executor state — the warehouse IS the state, so a
  * restart resumes from the checkpoint with nothing to rebuild. */
object DocStream {

  /** Landing-file schema: one JSON document object per line. */
  val docSchema: StructType = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private def corpusPath(warehouse: String) = s"$warehouse/dedup_corpus"

  /** The retained (deduplicated) corpus: (id, text). */
  def retainedDocs(spark: SparkSession, warehouse: String): DataFrame =
    graft.io.LogTable.read(spark, corpusPath(warehouse)).select("id", "text")

  /** Full state snapshot (id, text, bands) at the head version. */
  def corpusState(spark: SparkSession, warehouse: String): DataFrame =
    graft.io.LogTable.read(spark, corpusPath(warehouse))

  /** One ingest micro-batch: probe, drop duplicates/replays, append
    * survivors (with their band keys) to the corpus table. Also the
    * batch-mode entry — the stream's foreachBatch body and any bounded
    * backfill call the same function. */
  def ingestBatch(
      spark: SparkSession, batch: DataFrame, warehouse: String,
      numHashes: Int = 12, rowsPerBand: Int = 3,
      minQuality: Option[Double] = None): Unit = {
    // quality gate BEFORE the dedup probe — the standard curation order
    // (a rejected doc must not claim a band bucket and shadow a
    // better-quality near-dup arriving later), and the cheap row-local
    // filter shrinks the minhash pass
    val gated = minQuality.fold(batch)(q =>
      batch.filter(graft.ext.TextAnalysis.qualityScore(col("text")) >= q))
    // WITHIN-batch id dedup: two copies of one doc_id in a single
    // trigger share every band but `id_a < id_b` cannot drop equal ids,
    // and the corpus append is an append, not an upsert — both rows
    // would land and every later snapshot would carry the duplicate.
    // One combinable groupBy keeps a deterministic copy (max text);
    // cross-batch replays stay absorbed by the arrival probe.
    val newDocs = gated.select(col("doc_id").as("id"), col("text"))
      .groupBy("id").agg(max(col("text")).as("text"))
    if (newDocs.isEmpty) return // P11: empty batch is a no-op, not an error
    val path = corpusPath(warehouse)
    val exists = new java.io.File(s"$path/_log").isDirectory &&
      graft.io.LogTable.version(path) > 0
    val state =
      if (exists) {
        val corpus = graft.io.LogTable.read(spark, path)
        Some((corpus.select("id"),
          corpus.select(col("id"), explode(col("bands")).as("b"))
            .select(col("id"), col("b.band"), col("b.bh"))))
      } else None
    val (retained, retainedBands) = Dedup.arrivalStep(
      newDocs, state, numHashes, rowsPerBand)
    // one row per doc carries text AND bands — single-table rows inside
    // a single-manifest commit (see class doc); localCheckpoint cuts the
    // lineage back to the state files this commit is about to extend
    val out = retained.join(
        retainedBands.groupBy("id")
          .agg(collect_list(struct(col("band"), col("bh"))).as("bands")),
        Seq("id"), "left")
      .select(col("id"), col("text"),
        coalesce(col("bands"), array().cast("array<struct<band:int,bh:string>>"))
          .as("bands"))
      .localCheckpoint(true)
    if (exists) graft.io.LogTable.append(spark, path, out, "id")
    else graft.io.LogTable.create(spark, path, out, "id")
    out.unpersist()
  }

  private def containmentPath(warehouse: String) = s"$warehouse/containment_corpus"

  /** The retained corpus of the CONTAINMENT ingest: (id, text). */
  def retainedContainmentDocs(spark: SparkSession, warehouse: String): DataFrame =
    graft.io.LogTable.read(spark, containmentPath(warehouse))
      .filter(col("retained")).select("id", "text")

  /** Full containment-ingest state (id, text, shset, retained). */
  def containmentState(spark: SparkSession, warehouse: String): DataFrame =
    graft.io.LogTable.read(spark, containmentPath(warehouse))

  /** One CONTAINMENT-dedup ingest micro-batch —
    * [[graft.ext.Dedup.containmentArrivalStep]]'s algebra over durable
    * single-table state (the x50 inclusion detector composed into the
    * live path; x54's closed form is its backfill twin).
    *
    * State design differs from the band ingest in ONE deliberate way:
    * EVERY first-delivery arrival commits a row — retained docs and
    * dropped docs alike — because the stop-shingle guard counts corpus
    * frequency over ALL arrivals, exactly like the step's df state; a
    * dropped doc keeps only its hash-sketch column (`shset`) and the
    * `retained = false` flag. That keeps the whole state in ONE atomic
    * manifest commit per batch (doc + sketch + verdict in lockstep —
    * no torn two-table df/corpus split, no fencing machinery), and the
    * first-delivery guard anti-joins ALL seen ids, so a re-delivered
    * DROPPED doc is absorbed too (never re-counted into df, never
    * re-judged) — stricter than the step's retained-only replay rule
    * and the right call for a durable corpus.
    *
    * Scale: the per-batch probe reads only the state table's hash
    * columns (column-pruned scan — the band ingest's documented trade);
    * the per-batch df recount over those hashes is the simple spelling —
    * a deployment whose vocabulary outgrows it maintains the df table
    * incrementally off the change feed instead (the x53 pattern: counts
    * are additive). */
  def ingestBatchContainment(
      spark: SparkSession, batch: DataFrame, warehouse: String,
      k: Int = 4, maxDf: Long = 64,
      n: Int = 3, numHashes: Int = 12): Unit = {
    val newDocs = batch.select(col("doc_id").as("id"), col("text"))
      .groupBy("id").agg(max(col("text")).as("text"))
    if (newDocs.isEmpty) return // P11: empty batch is a no-op
    val path = containmentPath(warehouse)
    val exists = new java.io.File(s"$path/_log").isDirectory &&
      graft.io.LogTable.version(path) > 0
    val seen = if (exists) Some(graft.io.LogTable.read(spark, path)) else None
    val fresh = (seen match {
      case Some(tbl) => newDocs.join(tbl.select("id"), Seq("id"), "left_anti")
      case None => newDocs
    }).localCheckpoint(false)
    if (fresh.isEmpty) return // replayed delivery: absorbed wholesale
    val perDoc = Dedup.minhashWithSets(fresh, "id", "text", n, numHashes)
      .localCheckpoint(false)
    val state = seen.map { tbl =>
      val ret = tbl.filter(col("retained"))
      (ret.select(col("id"), explode(col("shset")).as("h")),
        ret.select(col("id"),
          explode(slice(array_sort(col("shset")), 1, k)).as("h")),
        tbl.select(explode(col("shset")).as("h"))
          .groupBy("h").agg(count(lit(1)).cast("long").as("df")))
    }
    val (retained, _) =
      Dedup.containmentStepFrom(fresh, perDoc, state, k, maxDf)
    // one row per arrival: text + sketch + verdict, single-manifest
    // commit. A doc under n tokens has no sketch row (it can never
    // collide) — it commits with an empty set, retained.
    val out = fresh
      .join(perDoc.select(col("id"), col("shset")), Seq("id"), "left")
      .join(retained.select(col("id")).withColumn("_r", lit(true)),
        Seq("id"), "left")
      .select(col("id"), col("text"),
        coalesce(col("shset"), array().cast("array<long>")).as("shset"),
        coalesce(col("_r"), lit(false)).as("retained"))
      .localCheckpoint(true)
    if (exists) graft.io.LogTable.append(spark, path, out, "id")
    else graft.io.LogTable.create(spark, path, out, "id")
    out.unpersist()
  }

  /** Start the containment-dedup ingest stream — [[startDedupIngest]]'s
    * contract (file-source checkpointing, bounded backfill via
    * `maxFilesPerTrigger`, `availableNow` catch-up-then-stop) with
    * [[ingestBatchContainment]] as the micro-batch body. */
  def startContainmentIngest(
      spark: SparkSession,
      docsJsonDir: String,
      warehouse: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      availableNow: Boolean = false,
      k: Int = 4, maxDf: Long = 64): StreamingQuery = {
    val reader = spark.readStream
      .schema(docSchema)
      .option("pathGlobFilter", "*.json")
    maxFilesPerTrigger.foreach(nf => reader.option("maxFilesPerTrigger", nf))
    val writer = reader.json(docsJsonDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        ingestBatchContainment(spark, batch.toDF(), warehouse, k, maxDf)
        ()
      }
    (if (availableNow)
      writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else writer).start()
  }

  /** Start the dedup-ingest stream over a landing directory of
    * document-JSON files. Mirrors [[OrderStream.startEtlStream]]'s
    * contract: file-source checkpointing gives exactly-once per file,
    * `maxFilesPerTrigger` bounds a backfill's micro-batches, and
    * `availableNow = true` is the bounded catch-up-then-stop replay. */
  def startDedupIngest(
      spark: SparkSession,
      docsJsonDir: String,
      warehouse: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      availableNow: Boolean = false,
      numHashes: Int = 12, rowsPerBand: Int = 3,
      minQuality: Option[Double] = None): StreamingQuery = {
    val reader = spark.readStream
      .schema(docSchema)
      .option("pathGlobFilter", "*.json")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val writer = reader.json(docsJsonDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        ingestBatch(spark, batch.toDF(), warehouse, numHashes, rowsPerBand, minQuality)
        ()
      }
    (if (availableNow)
      writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else writer).start()
  }
}
