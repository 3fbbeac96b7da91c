package graft.queries

import graft.QueryDef
import graft.ext.Multimodal
import graft.io.Tables
import graft.util.Partitioning
import org.apache.spark.sql.functions._

/** Oracle-checked surface for the multimodal column operators
  * ([[graft.ext.Multimodal]]): media table construction, the typed
  * decode→feature pipeline, average-pool resize, and frame sampling.
  *
  * The Spark side runs the REAL typed mapPartitions/map/flatMap pipeline
  * over BINARY payloads (the production batch shape); the DuckDB twin
  * reproduces the deterministic stub-codec arithmetic hex-pair by
  * hex-pair from md5(text), so values match exactly. Byte i (0-based) of
  * the payload is `CAST('0x' || substr(md5(text), 2i+1, 2) AS BIGINT)`.
  */
object MultimodalQueries {

  /** Documents pre-arranged in (range-partitioned, sorted) doc_id order —
    * see [[Partitioning.orderedFanOut]]. The media build and every typed
    * stage after it are narrow, order-preserving operators (map /
    * mapPartitions / flatMap over partition iterators), so the output
    * keeps this total order WITHOUT a trailing `.orderBy` — which would
    * re-execute the whole typed pipeline once more for range-boundary
    * sampling and then coalesce away its parallelism. */
  private def orderedDocs(s: org.apache.spark.sql.SparkSession, d: String) =
    Partitioning.orderedFanOut(Tables.documents(s, d), col("doc_id"))

  /** SQL for payload byte i (0-based) as BIGINT. */
  private def b(i: Int): String = s"CAST('0x' || substr(md5(text), ${2 * i + 1}, 2) AS BIGINT)"

  /** SQL for a factor-2 average-pooled output pixel of the 4×4 image. */
  private def pool(y: Int, x: Int): String = {
    val i1 = (2 * y) * 4 + 2 * x
    val i3 = (2 * y + 1) * 4 + 2 * x
    s"CAST((${b(i1)} + ${b(i1 + 1)} + ${b(i3)} + ${b(i3 + 1)}) // 4 AS INT)"
  }

  val defs: Seq[QueryDef] = Seq(

    // M1 — media table: opaque binary payload + typed metadata columns.
    QueryDef(
      "m1_media_meta",
      (s, d) =>
        Multimodal.mediaFromDocuments(orderedDocs(s, d), fan = false)
          .select(
            col("doc_id"),
            col("meta.kind").as("kind"),
            col("meta.width").as("width"),
            col("meta.height").as("height"),
            col("meta.nFrames").as("n_frames"),
            length(col("payload")).as("n_bytes")),
      Some("""SELECT doc_id,
             |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
             |  CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
             |  CAST(doc_id % 4 + 1 AS INT) AS n_frames,
             |  octet_length(unhex(md5(text))) AS n_bytes
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // M2 — decode (stub codec) + per-image feature extraction through the
    // typed mapPartitions pipeline; features only, payload never shuffles.
    QueryDef(
      "m2_image_features",
      (s, d) => {
        val items = Multimodal.asMediaItems(
          s, Multimodal.mediaFromDocuments(orderedDocs(s, d), fan = false))
        Multimodal.imageFeatures(s, Multimodal.decodeImages(s, items))
          .toDF() // ordered via orderedDocs; all stages are narrow
      },
      Some(s"""SELECT doc_id, CAST(16 AS INT) AS n_px,
              |  CAST(list_sum(list_transform(generate_series(1,16),
              |    i -> CAST('0x' || substr(md5(text), 2*i-1, 2) AS BIGINT))) AS DOUBLE)
              |    / CAST(16 AS DOUBLE) AS mean_px,
              |  CAST(list_min(list_transform(generate_series(1,16),
              |    i -> CAST('0x' || substr(md5(text), 2*i-1, 2) AS BIGINT))) AS INT) AS min_px,
              |  CAST(list_max(list_transform(generate_series(1,16),
              |    i -> CAST('0x' || substr(md5(text), 2*i-1, 2) AS BIGINT))) AS INT) AS max_px
              |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // M3 — integer average-pool resize 4×4 → 2×2 through the typed path.
    QueryDef(
      "m3_resize_pool",
      (s, d) => {
        val items = Multimodal.asMediaItems(
          s, Multimodal.mediaFromDocuments(orderedDocs(s, d), fan = false))
        Multimodal.resize(s, Multimodal.decodeImages(s, items), factor = 2)
          .toDF()
          .select(
            col("doc_id"),
            element_at(col("pixels"), 1).as("p00"),
            element_at(col("pixels"), 2).as("p01"),
            element_at(col("pixels"), 3).as("p10"),
            element_at(col("pixels"), 4).as("p11"))
        // ordered via orderedDocs; all stages are narrow
      },
      Some(s"""SELECT doc_id,
              |  ${pool(0, 0)} AS p00, ${pool(0, 1)} AS p01,
              |  ${pool(1, 0)} AS p10, ${pool(1, 1)} AS p11
              |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // M4 — frame sampling: payload split into n_frames blocks (flatMap,
    // the media twin of the order→line_items explode); frames identified
    // by their hex bytes for downstream exact dedup.
    QueryDef(
      "m4_frame_sample",
      (s, d) => {
        val items = Multimodal.asMediaItems(
          s, Multimodal.mediaFromDocuments(orderedDocs(s, d), fan = false))
        Multimodal.sampleFrames(s, items, stride = 1)
          .toDF()
          .select(
            col("doc_id"), col("frame_idx"),
            lower(hex(col("frame_bytes"))).as("frame_hex"))
        // ordered via orderedDocs; flatMap emits frames in frame_idx
        // order inside each doc, so (doc_id, frame_idx) order holds
      },
      Some("""WITH m AS (
             |  SELECT doc_id, md5(text) AS hx,
             |         CAST(doc_id % 4 + 1 AS INT) AS n_frames,
             |         16 // CAST(doc_id % 4 + 1 AS INT) AS block
             |  FROM documents
             |)
             |SELECT doc_id, CAST(f AS INT) AS frame_idx,
             |       substr(hx, CAST(f * block * 2 + 1 AS INT),
             |              CAST(block * 2 AS INT)) AS frame_hex
             |FROM m, unnest(generate_series(0, n_frames - 1)) AS t(f)
             |ORDER BY doc_id, frame_idx""".stripMargin),
    ),

    // M6 — windowed AUDIO energy (r18: the audio modality's first
    // curation feature — silence/clipping detection and energy-based
    // segment selection run on exactly this statistic): the audio-kind
    // payloads "decode" through the same pluggable-codec seam as the
    // image pipelines (StubCodec.decodeAudio → signed 8-bit PCM;
    // a real deployment swaps one function), 50 samples split into five
    // 10-sample windows, per window the EXACT integer sum of squared
    // samples (order-independent — no float-sum drift cross-engine) and
    // its mean. Payloads never cross an exchange; only (doc_id,
    // window_idx, two numbers) leave the map stage. The oracle replays
    // the byte→sample interpretation from the md5 hex.
    QueryDef(
      "m6_audio_energy",
      (s, d) => {
        val audio = Multimodal.mediaFromDocuments(orderedDocs(s, d), fan = false)
          .filter(col("meta.kind") === "audio")
        Multimodal.audioEnergy(s, Multimodal.asMediaItems(s, audio),
          nSamples = 50, window = 10)
          .toDF()
        // ordered via orderedDocs; flatMap emits windows in window_idx
        // order inside each doc, so (doc_id, window_idx) order holds
      },
      Some("""WITH audio AS (
             |  SELECT doc_id, md5(text) AS hx FROM documents
             |  WHERE doc_id % 3 = 1),
             |s AS (
             |  SELECT doc_id, CAST(i // 10 AS INT) AS window_idx,
             |    CAST('0x' || substr(hx, CAST((i % 16) * 2 + 1 AS INT), 2) AS BIGINT)
             |      - 128 AS v
             |  FROM audio, unnest(generate_series(0, 49)) AS t(i))
             |SELECT doc_id, window_idx,
             |  CAST(SUM(v * v) AS BIGINT) AS energy_sq,
             |  CAST(SUM(v * v) AS DOUBLE) / 10.0 AS mean_sq
             |FROM s GROUP BY 1, 2 ORDER BY doc_id, window_idx""".stripMargin),
    ),

    // M5 — perceptual-hash image near-dup (the LAION-style multimodal
    // dedup step): the published aHash(16)+dHash(24) construction over
    // the decoded 4×4 images, pairs at hamming ≤ 2 found by pigeonhole
    // blocking (3 slices, equi-join, exact bit_count check on candidates
    // only — never all-pairs; the oracle brute-forces the same 40-bit
    // hashes). The corpus is the image-kind docs plus planted +30000
    // exact copies of every 15th doc, so every planted pair surfaces at
    // distance 0 while the 40-bit space keeps organic collisions to
    // genuinely identical payloads. Pixels never shuffle — only (id,
    // hash, slice) longs cross exchanges.
    QueryDef(
      "m5_phash_neardup",
      (s, d) => {
        val corpus = graft.util.Corpora.derived(
          Tables.documents(s, d).filter(col("doc_id") % 3 === 0),
          col("doc_id"), col("text"),
          Seq((col("doc_id") % 15 === 0, col("doc_id") + 30000, col("text"))),
          "doc_id", "text")
        val decoded = Multimodal.decodeImages(s,
          Multimodal.asMediaItems(s, Multimodal.mediaFromDocuments(corpus)))
        Multimodal.phashNearDups(
            Multimodal.imageHashes(s, decoded), bits = 40, maxDist = 2)
          .orderBy("id_a", "id_b")
      },
      Some {
        val aBits = (0 until 16)
          .map(i => s"(CASE WHEN p$i * 16 > psum THEN ${1L << i} ELSE 0 END)")
        val dhBits = for (y <- 0 until 4; x <- 0 until 3) yield
          s"(CASE WHEN p${y * 4 + x} > p${y * 4 + x + 1} THEN ${1L << (16 + y * 3 + x)} ELSE 0 END)"
        val dvBits = for (y <- 0 until 3; x <- 0 until 4) yield
          s"(CASE WHEN p${y * 4 + x} > p${(y + 1) * 4 + x} THEN ${1L << (28 + y * 4 + x)} ELSE 0 END)"
        val hashExpr = (aBits ++ dhBits ++ dvBits).mkString(" + ")
        s"""WITH corpus AS (
           |  SELECT doc_id AS id, text FROM documents WHERE doc_id % 3 = 0
           |  UNION ALL
           |  SELECT doc_id + 30000, text FROM documents WHERE doc_id % 15 = 0),
           |px AS (
           |  SELECT id, ${(0 until 16).map(i => s"${b(i)} AS p$i").mkString(", ")}
           |  FROM corpus),
           |hs AS (
           |  SELECT id, CAST($hashExpr AS BIGINT) AS h
           |  FROM (SELECT *, ${(0 until 16).map(i => s"p$i").mkString(" + ")} AS psum
           |        FROM px))
           |SELECT a.id AS id_a, b.id AS id_b,
           |       CAST(bit_count(xor(a.h, b.h)) AS INT) AS dist
           |FROM hs a JOIN hs b ON a.id < b.id
           |WHERE bit_count(xor(a.h, b.h)) <= 2
           |ORDER BY id_a, id_b""".stripMargin
      },
    ),
  )
}
