package graft.streaming

import graft.SparkTestSession
import graft.io.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** End-to-end for the dedup-ingest stream: a corpus fed through
  * DocStream (file-source micro-batches → foreachBatch arrivalStep →
  * warehouse append) must retain EXACTLY the ids the x38 batch fold
  * retains over the same arrival batches, and a replayed delivery must
  * be absorbed — mirroring OrderStreamSpec's equality pattern for the
  * dedup state instead of the fact tables. */
class DocStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // one JSON line per doc, the landing-file shape
  private def jsonLines(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(to_json(struct(col("id").as("doc_id"), col("text"))).as("j"))
      .collect().map(_.getString(0)).toSeq

  test("within-batch duplicate doc_id: one trigger carrying the same doc twice retains ONE row") {
    // equal ids share every band but id_a < id_b cannot drop equal ids,
    // and the corpus append is an append — without the within-batch id
    // dedup both copies landed and every later snapshot carried the dup
    val wh = java.nio.file.Files.createTempDirectory("graft-docdup").toString
    import spark.implicits._
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    DocStream.ingestBatch(spark, batch, wh)
    val corpus = DocStream.retainedDocs(spark, wh)
    assert(corpus.groupBy("id").count().filter(col("count") > 1).count() == 0L,
      "duplicate doc_id rows in the retained corpus")
    assert(corpus.count() == 2L)
  }

  test("stream-fed dedup state equals the x38 arrival fold; a replayed file is absorbed") {
    val base = Tables.documents(spark, sf)
    val b0 = base.select(col("doc_id").as("id"), col("text"))
    val b1 = base.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 10000).as("id"),
        concat(col("text"), lit(" extra extra token")).as("text"))
    val b2 = base.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 20000).as("id"), col("text"))

    // ---- reference: the x38 query IS the batch fold over these batches
    val expected = graft.SparkEntry.queries("x38_ingest_dedup")(spark, sf)
      .select("id").collect().map(_.getLong(0)).toSet

    // ---- streaming: land one file per arrival batch; mtimes force the
    // file source to process them in arrival order (dedup-on-arrival is
    // order-sensitive, unlike the order stream's commutative upsert)
    val landing = Files.createTempDirectory("graft-doc-landing").toString
    val wh = Files.createTempDirectory("graft-doc-wh").toString
    val ckpt = Files.createTempDirectory("graft-doc-ckpt").toString
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      val p = Paths.get(landing, s"batch$i.json")
      Files.write(p, jsonLines(b).mkString("\n").getBytes("UTF-8"))
      p.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    val q = DocStream.startDedupIngest(spark, landing, wh, ckpt,
      maxFilesPerTrigger = Some(1), availableNow = true)
    try q.awaitTermination() finally q.stop()

    val streamed = DocStream.retainedDocs(spark, wh)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(streamed == expected,
      s"stream retained ${streamed.size} ids, fold retained ${expected.size}; " +
        s"missing=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")

    // ---- replay: re-deliver batch1 as a NEW file; every id is already
    // in the index, so the replay guard must absorb it wholesale
    val p = Paths.get(landing, "replay.json")
    Files.write(p, jsonLines(b1).mkString("\n").getBytes("UTF-8"))
    p.toFile.setLastModified(1700000000000L + 10 * 60000L)
    val q2 = DocStream.startDedupIngest(spark, landing, wh, ckpt,
      maxFilesPerTrigger = Some(1), availableNow = true)
    try q2.awaitTermination() finally q2.stop()
    val afterReplay = DocStream.retainedDocs(spark, wh)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(afterReplay.size == afterReplay.distinct.size, "replay duplicated rows")
    assert(afterReplay.toSet == expected, "replayed delivery changed dedup state")

    // the retained corpus carries its band keys (the single-table state
    // contract): every retained doc has a non-empty band set
    val noBands = DocStream.corpusState(spark, wh)
      .filter(size(col("bands")) === 0).count()
    assert(noBands == 0, s"$noBands retained docs committed without band keys")

    // state rides the log table, and only batches with SURVIVORS
    // commit: the copy batches (1, 2) and the replay all dedupe to
    // nothing, so the log holds exactly ONE version — survivor-free
    // micro-batches never spam manifests. The fixture's survivors are
    // therefore all originals, and the v1 snapshot IS the final state.
    val tablePath = s"$wh/dedup_corpus"
    assert(expected.forall(_ < 10000L),
      "fixture drift: copy batches produced survivors — update the version assertions")
    assert(graft.io.LogTable.version(tablePath) == 1L,
      s"survivor-free batches must not commit, log at v${graft.io.LogTable.version(tablePath)}")
    val v1 = graft.io.LogTable.readVersion(spark, tablePath, 1L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(v1 == expected, "as-of-v1 snapshot must equal the surviving corpus")
  }

  test("containment ingest: stream-fed state == the x54 closed form; replayed files (incl. dropped docs) absorbed") {
    // the x54 arrival corpus: originals, +10000 head snippets (verbatim
    // inclusions), +20000 re-sent snippets + token-reversed docs
    val base = Tables.documents(spark, sf)
    def headSnip(pred: org.apache.spark.sql.Column, off: Long) = base.filter(pred)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select((col("doc_id") + off).as("id"),
        array_join(slice(col("t"), lit(1),
          greatest(expr("size(t) div 5"), lit(4))), " ").as("text"))
    val b0 = base.select(col("doc_id").as("id"), col("text"))
    val b1 = headSnip(col("doc_id") % 25 === 0, 10000L)
    val b2 = headSnip(col("doc_id") % 50 === 0, 20000L)
      .unionByName(base.filter(col("doc_id") % 25 === 7)
        .select((col("doc_id") + 20000L).as("id"),
          array_join(reverse(split(col("text"), " ")), " ").as("text")))

    // reference: the x54 closed form IS the batch fold over these batches
    val expected = graft.SparkEntry.queries("x54_arrival_inclusion")(spark, sf)
      .select("id").collect().map(_.getLong(0)).toSet

    val landing = Files.createTempDirectory("graft-cont-landing").toString
    val wh = Files.createTempDirectory("graft-cont-wh").toString
    val ckpt = Files.createTempDirectory("graft-cont-ckpt").toString
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      val p = Paths.get(landing, s"batch$i.json")
      Files.write(p, jsonLines(b).mkString("\n").getBytes("UTF-8"))
      p.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    val q = DocStream.startContainmentIngest(spark, landing, wh, ckpt,
      maxFilesPerTrigger = Some(1), availableNow = true)
    try q.awaitTermination() finally q.stop()

    val streamed = DocStream.retainedContainmentDocs(spark, wh)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(streamed == expected,
      s"stream retained ${streamed.size}, closed form ${expected.size}; " +
        s"missing=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")

    // EVERY first-delivery arrival holds a state row (dropped docs keep
    // their sketch for the df guard), one atomic commit per batch
    val st = DocStream.containmentState(spark, wh)
    val total = b0.count() + b1.count() + b2.count()
    assert(st.count() == total,
      s"state rows ${st.count()} != arrivals $total — dropped docs must commit too")
    assert(st.filter(!col("retained") && size(col("shset")) === 0).count() == 0,
      "a dropped doc without its sketch can't back the df guard")
    val tablePath = s"$wh/containment_corpus"
    assert(graft.io.LogTable.version(tablePath) == 3L,
      s"three arrival batches must be three commits, log at v${graft.io.LogTable.version(tablePath)}")

    // replay a file whose docs were ALL DROPPED (the %50 snippets) plus
    // one retained original: both classes absorb wholesale — a dropped
    // doc re-sent must not re-count df or be re-judged
    val p = Paths.get(landing, "replay.json")
    Files.write(p, jsonLines(b2.limit(5).unionByName(b0.limit(1)))
      .mkString("\n").getBytes("UTF-8"))
    p.toFile.setLastModified(1700000000000L + 10 * 60000L)
    val q2 = DocStream.startContainmentIngest(spark, landing, wh, ckpt,
      maxFilesPerTrigger = Some(1), availableNow = true)
    try q2.awaitTermination() finally q2.stop()
    assert(DocStream.containmentState(spark, wh).count() == total,
      "replayed delivery changed the containment state")
    assert(graft.io.LogTable.version(tablePath) == 3L,
      "a fully-absorbed replay must not commit a version")
    assert(DocStream.retainedContainmentDocs(spark, wh)
      .select("id").collect().map(_.getLong(0)).toSet == expected)
  }

  test("multi-version ingest: later batches with survivors append manifest versions; v1 stays readable") {
    val docs = Tables.documents(spark, sf).select(col("doc_id").as("id"), col("text"))
    val b0 = docs.filter(col("id") < 250)
    val b1 = docs.filter(col("id") >= 250)

    // reference fold through the same engine function
    val (r0, bands0) = graft.ext.Dedup.arrivalStep(b0, None)
    val ids0 = r0.select("id").collect().map(_.getLong(0)).toSet
    val (r1, _) = graft.ext.Dedup.arrivalStep(b1, Some((r0.select("id"), bands0)))
    val ids1 = r1.select("id").collect().map(_.getLong(0)).toSet
    assert(ids1.nonEmpty, "second batch must contribute survivors to exercise append")

    val landing = java.nio.file.Files.createTempDirectory("graft-mv-landing").toString
    val wh = java.nio.file.Files.createTempDirectory("graft-mv-wh").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mv-ckpt").toString
    Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
      val p = Paths.get(landing, s"batch$i.json")
      Files.write(p, jsonLines(b).mkString("\n").getBytes("UTF-8"))
      p.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    val q = DocStream.startDedupIngest(spark, landing, wh, ckpt,
      maxFilesPerTrigger = Some(1), availableNow = true)
    try q.awaitTermination() finally q.stop()

    val tablePath = s"$wh/dedup_corpus"
    assert(graft.io.LogTable.version(tablePath) == 2L,
      s"two surviving batches → two versions, got v${graft.io.LogTable.version(tablePath)}")
    val head = DocStream.retainedDocs(spark, wh)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(head == ids0 ++ ids1, "head snapshot differs from the two-step fold")
    val v1 = graft.io.LogTable.readVersion(spark, tablePath, 1L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(v1 == ids0, "as-of-v1 must hold exactly the first batch's survivors")
  }

  test("quality gate runs before the dedup probe: rejected docs never claim band buckets") {
    val base = Tables.documents(spark, sf).select(col("doc_id").as("id"), col("text"))
    // pick a threshold that splits the fixture non-trivially
    val q = graft.ext.TextAnalysis.qualityScore(col("text"))
    val cut = base.select(percentile_approx(q, lit(0.5), lit(100))).head().getDouble(0)
    val passing = base.filter(q >= cut).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(passing.nonEmpty && passing.size < base.count())

    val landing = java.nio.file.Files.createTempDirectory("graft-qgate-landing").toString
    val wh = java.nio.file.Files.createTempDirectory("graft-qgate-wh").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-qgate-ckpt").toString
    Files.write(Paths.get(landing, "b0.json"),
      jsonLines(base).mkString("\n").getBytes("UTF-8"))
    val strm = DocStream.startDedupIngest(spark, landing, wh, ckpt,
      availableNow = true, minQuality = Some(cut))
    try strm.awaitTermination() finally strm.stop()

    val retained = DocStream.retainedDocs(spark, wh)
      .select("id").collect().map(_.getLong(0)).toSet
    // retained ⊆ passing (no rejected doc entered the corpus), and equals
    // the arrival fold over the PRE-GATED batch
    assert(retained.subsetOf(passing), s"rejected docs entered: ${(retained -- passing).take(5)}")
    val (expected, _) = graft.ext.Dedup.arrivalStep(base.filter(q >= cut), None)
    assert(retained == expected.select("id").collect().map(_.getLong(0)).toSet,
      "gated ingest differs from dedup over the pre-gated batch")
  }

  test("downstream consumers tail the corpus table's change feed, one pure-append delta per batch") {
    val docs = Tables.documents(spark, sf).select(col("doc_id").as("id"), col("text"))
    val b0 = docs.filter(col("id") < 250)
    val b1 = docs.filter(col("id") >= 250)
    val wh = java.nio.file.Files.createTempDirectory("graft-cdc-wh").toString
    val tablePath = s"$wh/dedup_corpus"

    DocStream.ingestBatch(spark, b0.select(col("id").as("doc_id"), col("text")), wh)
    val v1 = graft.io.LogTable.version(tablePath)
    DocStream.ingestBatch(spark, b1.select(col("id").as("doc_id"), col("text")), wh)
    val v2 = graft.io.LogTable.version(tablePath)
    assert(v1 == 1L && v2 == 2L)

    // each batch's delta = exactly that commit's survivors, as inserts,
    // served through the no-join append fast path (ingest commits are
    // pure appends — the cheap-CDC property DocStream's state relies on)
    val feed = graft.io.LogTable.changes(spark, tablePath, "id", v1, v2)
    assert(!feed.queryExecution.optimizedPlan.toString.contains("Join"),
      "append-only ingest delta must not diff snapshots")
    val delta = feed.select("id").collect().map(_.getLong(0)).toSet
    val headIds = DocStream.retainedDocs(spark, wh)
      .select("id").collect().map(_.getLong(0)).toSet
    val v1Ids = graft.io.LogTable.readVersion(spark, tablePath, v1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(delta == (headIds -- v1Ids),
      "batch-2 change feed differs from the snapshot delta")
    assert(feed.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("insert"))
  }
}
