package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque BINARY payloads with typed metadata, plus the per-batch decode /
  * feature-extract / resize / frame-sample operators a 100 TB media
  * pipeline needs. Extension surface beyond the reference (the reference
  * is relational-only; see SURVEY.md §7.2 step 6 and BASELINE.json north
  * star).
  *
  * == What is real vs stubbed ==
  * The Spark-side plumbing is REAL and what actually matters at scale:
  * the media schema (binary payload + metadata struct), the typed
  * `mapPartitions` batch shape (one iterator per partition — the Scala
  * analogue of `mapInPandas`, amortizing per-batch setup like a decoder
  * context across rows), partition-preserving execution (no shuffle for
  * per-item media ops), and the column pruning that keeps payload bytes
  * OUT of shuffles (operators project metadata/features, never raw bytes,
  * after the decode stage).
  *
  * The DECODE ITSELF is a clearly-marked deterministic STUB
  * ([[StubCodec]]): this container has no image/audio libraries, so
  * "decoding" interprets payload bytes as grayscale pixels / PCM samples
  * directly. Swapping in a real codec changes ONE function (the
  * byte→sample interpretation), none of the distributed plumbing.
  *
  * Determinism contract: payloads are derived from document text via md5
  * (16 exact bytes), so every derived statistic is exact integer/double
  * arithmetic mirrored by the DuckDB oracle hex-pair by hex-pair.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  case class MediaMeta(kind: String, width: Int, height: Int, nFrames: Int)

  /** A media row: opaque bytes + typed metadata. */
  case class MediaItem(doc_id: Long, payload: Array[Byte], meta: MediaMeta)

  /** Decoded "image": row-major grayscale pixels in [0,255]. */
  case class DecodedImage(doc_id: Long, width: Int, height: Int, pixels: Array[Int])

  /** Per-image features (the embarrassingly-parallel map stage that at
    * 100 TB replaces the payload with a few floats before any shuffle). */
  case class ImageFeatures(doc_id: Long, n_px: Int, mean_px: Double,
                           min_px: Int, max_px: Int)

  /** A sampled frame: which frame, and its payload slice hash for
    * downstream exact-dedup of frames. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** One fixed-width audio analysis window: `energy_sq` is the EXACT
    * integer sum of squared samples (order-independent, engine-portable
    * — RMS's sqrt is deferred to consumers), `mean_sq` one division. */
  case class AudioWindow(doc_id: Long, window_idx: Int,
                         energy_sq: Long, mean_sq: Double)

  // -------------------------------------------------------------------
  // STUB CODEC — deterministic fake standing in for libjpeg/ffmpeg.
  // -------------------------------------------------------------------

  /** Deterministic stand-in for a real media codec. Real systems would
    * call into a native decoder here; the container has none, so bytes
    * ARE the samples. The interpretation is fixed and documented so the
    * DuckDB oracle reproduces it exactly. */
  object StubCodec {
    /** "Decode" a grayscale image: pixel i = unsigned payload byte
      * (i mod payload.length), for width×height pixels. */
    def decodeImage(payload: Array[Byte], width: Int, height: Int): Array[Int] = {
      val n = width * height
      val out = new Array[Int](n)
      var i = 0
      while (i < n) { out(i) = payload(i % payload.length) & 0xff; i += 1 }
      out
    }

    /** "Decode" PCM audio: sample i = unsigned payload byte
      * (i mod payload.length) recentered to [-128, 127] — the signed
      * 8-bit PCM shape a real decoder would produce. */
    def decodeAudio(payload: Array[Byte], nSamples: Int): Array[Int] = {
      val out = new Array[Int](nSamples)
      var i = 0
      while (i < nSamples) {
        out(i) = (payload(i % payload.length) & 0xff) - 128; i += 1
      }
      out
    }
  }

  // -------------------------------------------------------------------
  // Media table construction (fixture-deterministic)
  // -------------------------------------------------------------------

  /** Build the media table from the documents fixture: payload = the 16
    * md5 bytes of the text (an opaque deterministic blob), metadata kind
    * rotates image/audio/video. This is the column-level contract a real
    * ingest (S3 object fetch, tar shard explode) would produce.
    *
    * `fan = false` skips the parallelism guard for callers that already
    * arranged the input layout (e.g. [[graft.util.Partitioning
    * .orderedFanOut]], whose range partitioning both parallelizes and
    * orders the scan — fanOut's round-robin repartition would destroy
    * that order, and its partition-count check forces an eager AQE job). */
  def mediaFromDocuments(docs: DataFrame, fan: Boolean = true): DataFrame =
    (if (fan) graft.util.Partitioning.fanOut(docs) else docs).select(
      col("doc_id"),
      unhex(md5(col("text"))).as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        lit(4).as("width"),
        lit(4).as("height"),
        (col("doc_id") % 4 + 1).cast("int").as("nFrames")).as("meta"))

  // -------------------------------------------------------------------
  // Operators — typed mapPartitions pipelines (mapInPandas analogue)
  // -------------------------------------------------------------------

  /** A pluggable byte→pixel decoder: the ONE seam a real deployment
    * swaps ([[StubCodec.decodeImage]] → libjpeg/ffmpeg bindings). Must
    * be Serializable — it ships into executor tasks. MultimodalSpec's
    * codec-injection test PROVES the swap is one function: it runs the
    * m1–m4 pipelines under an alternative codec with zero other changes. */
  type ImageCodec = (Array[Byte], Int, Int) => Array[Int]

  /** Decode stage: one codec context per PARTITION (not per row) — the
    * batch shape that makes real decoders affordable. Output drops the
    * payload: downstream stages shuffle pixels/features, never raw media.
    * `codec` defaults to the deterministic stub; inject a real decoder
    * here and every downstream operator (features, resize, dedup)
    * runs unchanged. */
  def decodeImages(
      spark: SparkSession, media: Dataset[MediaItem],
      codec: ImageCodec = StubCodec.decodeImage): Dataset[DecodedImage] = {
    import spark.implicits._
    media.mapPartitions { items =>
      // Real codec: initialize native decoder HERE, once per batch.
      items.map { m =>
        DecodedImage(m.doc_id, m.meta.width, m.meta.height,
          codec(m.payload, m.meta.width, m.meta.height))
      }
    }
  }

  /** Feature extraction over decoded images: per-item stats, no shuffle.
    * At 100 TB this is the stage that shrinks each item from megabytes of
    * payload to a handful of doubles before anything wide happens. */
  def imageFeatures(spark: SparkSession, decoded: Dataset[DecodedImage]): Dataset[ImageFeatures] = {
    import spark.implicits._
    decoded.map { d =>
      val px = d.pixels
      var sum = 0L; var mn = 255; var mx = 0
      var i = 0
      while (i < px.length) {
        sum += px(i); if (px(i) < mn) mn = px(i); if (px(i) > mx) mx = px(i)
        i += 1
      }
      ImageFeatures(d.doc_id, px.length, sum.toDouble / px.length, mn, mx)
    }
  }

  /** Resize by integer-factor average pooling (e.g. 4×4 → 2×2 with
    * factor 2): each output pixel is the floor mean of its factor×factor
    * block. Partition-preserving map, exact integer arithmetic. */
  def resize(spark: SparkSession, decoded: Dataset[DecodedImage], factor: Int): Dataset[DecodedImage] = {
    import spark.implicits._
    decoded.map { d =>
      val w2 = d.width / factor; val h2 = d.height / factor
      val out = new Array[Int](w2 * h2)
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          var acc = 0
          var dy = 0
          while (dy < factor) {
            var dx = 0
            while (dx < factor) {
              acc += d.pixels((y * factor + dy) * d.width + (x * factor + dx))
              dx += 1
            }
            dy += 1
          }
          out(y * w2 + x) = acc / (factor * factor)
          x += 1
        }
        y += 1
      }
      DecodedImage(d.doc_id, w2, h2, out)
    }
  }

  /** Perceptual hash of a decoded grayscale image — the PUBLISHED
    * average-hash + difference-hash construction (aHash/dHash, the
    * image-dedup workhorses of web-scale multimodal pipelines), exact
    * integer arithmetic so the oracle reproduces it bit for bit:
    *
    *   - bits [0, n):   aHash — bit i set iff pixel i is strictly above
    *     the image mean (compared as `p(i)·n > Σp`, no division);
    *   - next h·(w−1):  dHash horizontal — p(y,x) > p(y,x+1);
    *   - next (h−1)·w:  dHash vertical   — p(y,x) > p(y+1,x).
    *
    * For the 4×4 stub images: 16 + 12 + 12 = 40 bits in a Long. A real
    * deployment hashes the resize() output of real decodes — same
    * function, bigger grid. */
  def imageHash(px: Array[Int], w: Int, h: Int): Long = {
    val n = w * h
    require(n + h * (w - 1) + (h - 1) * w <= 63,
      s"imageHash: ${w}x$h needs more than 63 bits — pool first (resize)")
    var s = 0L
    var i = 0
    while (i < n) { s += px(i); i += 1 }
    var hash = 0L
    i = 0
    while (i < n) { if (px(i).toLong * n > s) hash |= 1L << i; i += 1 }
    var bit = n
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w - 1) {
        if (px(y * w + x) > px(y * w + x + 1)) hash |= 1L << bit
        bit += 1; x += 1
      }
      y += 1
    }
    y = 0
    while (y < h - 1) {
      var x = 0
      while (x < w) {
        if (px(y * w + x) > px((y + 1) * w + x)) hash |= 1L << bit
        bit += 1; x += 1
      }
      y += 1
    }
    hash
  }

  /** Per-image perceptual hashes as (id, h) — partition-preserving map,
    * pixels never shuffle (the hash is the only thing that leaves the
    * decode stage). */
  def imageHashes(spark: SparkSession, decoded: Dataset[DecodedImage]): DataFrame = {
    import spark.implicits._
    decoded.map(d => (d.doc_id, imageHash(d.pixels, d.width, d.height)))
      .toDF("id", "h")
  }

  /** Near-duplicate image pairs at hamming distance ≤ `maxDist` over
    * `bits`-bit perceptual hashes — pigeonhole-blocked, NEVER all-pairs:
    * the hash splits into maxDist+1 bit slices, two hashes within
    * distance maxDist must agree on at least one whole slice, so
    * candidates come from an equi-join on (slice index, slice value)
    * and only candidates pay the exact bit_count(xor) check. Exchanges
    * carry (id, hash, slice) longs only — at 100 TB the join key space
    * is the hash space, payload bytes never move. Same mechanic as the
    * text side's SimHash blocking (x8/x34), here over image hashes. */
  def phashNearDups(df: DataFrame, bits: Int, maxDist: Int): DataFrame = {
    require(bits >= 1 && bits <= 63 && maxDist >= 0 && maxDist < bits,
      s"phashNearDups: bad bits=$bits maxDist=$maxDist")
    val nSlices = maxDist + 1
    // Distribute bits EVENLY (first bits % nSlices slices one wider), not
    // by ceil-division: ceil widths can exhaust the hash before the last
    // slice (e.g. bits=10, maxDist=5 → width 2, slice 5 starts at bit 10),
    // leaving trailing slices of width <= 0 whose value is the same
    // constant for every row — the equi-join on that slice degenerates to
    // all-pairs (results stay exact, the never-all-pairs scaling breaks).
    // maxDist < bits guarantees every even slice has width >= 1.
    val base = bits / nSlices
    val rem = bits % nSlices
    val widths = (0 until nSlices).map(i => if (i < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    assert(widths.forall(_ >= 1),
      s"phashNearDups: internal slice width < 1 for bits=$bits maxDist=$maxDist")
    // ONE pass over the (possibly expensive) upstream per join side, not
    // one union branch per slice: the slice table is a 3-element literal
    // exploded per row, so the input lineage — decode/hash pipelines for
    // the image path — computes once per side instead of nSlices times,
    // and the two identical sides let AQE reuse the exchange. Same rows,
    // same keys, same join as the union spelling.
    val sliceDefs = array((0 until nSlices).map(i =>
      struct(lit(i).as("s"), lit(offsets(i)).as("lo"),
        lit((1L << widths(i)) - 1).as("mask"))): _*)
    val slices = df
      .select(col("id"), col("h"), explode(sliceDefs).as("sl"))
      .select(col("id"), col("h"), col("sl.s").as("s"),
        expr("shiftright(h, sl.lo)").bitwiseAND(col("sl.mask")).as("sv"))
    slices.as("a")
      .join(slices.as("b"),
        col("a.s") === col("b.s") && col("a.sv") === col("b.sv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.h").as("ha"), col("b.h").as("hb"))
      .distinct() // a pair can match on several slices
      .withColumn("dist", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Frame sampling for video payloads: split the payload into
    * meta.nFrames equal byte blocks and emit every `stride`-th frame.
    * flatMap shape (1 item → 0..n frames) — the media twin of the
    * reference's order→line_items explode. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaItem], stride: Int): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { m =>
      val n = m.meta.nFrames
      val block = m.payload.length / n
      (0 until n by stride).iterator.map { f =>
        Frame(m.doc_id, f, m.payload.slice(f * block, (f + 1) * block))
      }
    }
  }

  /** A pluggable byte→sample decoder — the audio twin of [[ImageCodec]]
    * (StubCodec.decodeAudio → an ffmpeg/PCM binding in a real deploy);
    * Serializable, ships into executor tasks. */
  type AudioCodec = (Array[Byte], Int) => Array[Int]

  /** Windowed audio energy — the standard first feature of an audio
    * curation pass (silence/clipping detection, energy-based segment
    * selection): decode nSamples per item, split into fixed `window`-
    * sample frames, per frame the EXACT integer sum of squared samples
    * (order-independent — engine-portable without float-sum drift) and
    * its mean. Same mapPartitions batch shape as the image pipelines:
    * one codec context per partition, payloads never cross an exchange —
    * only (doc_id, window_idx, two numbers) leave the map stage. */
  def audioEnergy(
      spark: SparkSession, media: Dataset[MediaItem],
      nSamples: Int, window: Int,
      codec: AudioCodec = StubCodec.decodeAudio): Dataset[AudioWindow] = {
    import spark.implicits._
    require(nSamples % window == 0 && window > 0,
      s"audioEnergy: nSamples ($nSamples) must be a positive multiple of window ($window)")
    media.mapPartitions { items =>
      items.flatMap { m =>
        val s = codec(m.payload, nSamples)
        (0 until nSamples / window).iterator.map { w =>
          var e = 0L
          var k = 0
          while (k < window) {
            val v = s(w * window + k).toLong; e += v * v; k += 1
          }
          AudioWindow(m.doc_id, w, e, e.toDouble / window)
        }
      }
    }
  }

  /** DataFrame spelling of the media table as typed Dataset[MediaItem]. */
  def asMediaItems(spark: SparkSession, media: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    media.select(
      col("doc_id"),
      col("payload"),
      col("meta.kind").as("kind"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.nFrames").as("nFrames"))
      .as[(Long, Array[Byte], String, Int, Int, Int)]
      .map { case (id, p, k, w, h, f) => MediaItem(id, p, MediaMeta(k, w, h, f)) }
  }
}
