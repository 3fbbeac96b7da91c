package graft.ext

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._
  import Multimodal._

  private def media(id: Long, bytes: Array[Byte], w: Int, h: Int, frames: Int) =
    MediaItem(id, bytes, MediaMeta("image", w, h, frames))

  test("stub decode tiles payload bytes over width×height unsigned") {
    val px = StubCodec.decodeImage(Array[Byte](0, -1, 64), 2, 2)
    // -1 as unsigned = 255; 4th pixel wraps back to payload(0)
    assert(px.toSeq == Seq(0, 255, 64, 0))
  }

  test("decode→features pipeline keeps one row per item and exact stats") {
    val items = Seq(
      media(1L, Array[Byte](10, 20, 30, 40), 2, 2, 1),
      media(2L, Array[Byte](0, -1), 2, 1, 1)).toDS()
    val feats = imageFeatures(spark, decodeImages(spark, items))
      .collect().sortBy(_.doc_id)
    assert(feats.length == 2)
    assert(feats(0) == ImageFeatures(1L, 4, 25.0, 10, 40))
    assert(feats(1) == ImageFeatures(2L, 2, 127.5, 0, 255))
  }

  test("resize average-pools factor×factor blocks with integer floor") {
    val pixels = (0 until 16).toArray // 4×4: 0..15
    val d = Seq(DecodedImage(7L, 4, 4, pixels)).toDS()
    val out = resize(spark, d, 2).collect().head
    assert(out.width == 2 && out.height == 2)
    // blocks: (0,1,4,5)=10/4=2; (2,3,6,7)=18/4=4; (8,9,12,13)=42/4=10; (10,11,14,15)=50/4=12
    assert(out.pixels.toSeq == Seq(2, 4, 10, 12))
  }

  test("frame sampling splits payload into nFrames blocks honoring stride") {
    val payload = (0 until 12).map(_.toByte).toArray
    val items = Seq(media(3L, payload, 1, 1, 4)).toDS()
    val all = sampleFrames(spark, items, stride = 1).collect().sortBy(_.frame_idx)
    assert(all.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
    assert(all.forall(_.frame_bytes.length == 3))
    assert(all(2).frame_bytes.toSeq == Seq[Byte](6, 7, 8))
    val strided = sampleFrames(spark, items, stride = 2).collect()
    assert(strided.map(_.frame_idx).sorted.toSeq == Seq(0, 2))
  }

  test("codec injection: an alternative decoder swaps in one function, pipelines run unchanged") {
    // the "real codec" stand-in: inverted grayscale — any byte→sample
    // interpretation with the same signature
    val inverted: Multimodal.ImageCodec =
      (payload, w, h) => Multimodal.StubCodec.decodeImage(payload, w, h).map(255 - _)
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val items = asMediaItems(spark, mediaFromDocuments(docs))
    // the FULL m1-m3 pipeline shape under the injected codec: decode →
    // features and decode → resize, zero changes outside the codec arg
    val stubFeat = imageFeatures(spark, decodeImages(spark, items))
      .collect().map(f => f.doc_id -> f).toMap
    val invFeat = imageFeatures(spark, decodeImages(spark, items, inverted))
      .collect().map(f => f.doc_id -> f).toMap
    assert(invFeat.keySet == stubFeat.keySet)
    invFeat.foreach { case (id, f) =>
      val s = stubFeat(id)
      // inversion is exact on every statistic: the plumbing is codec-blind
      assert(f.n_px == s.n_px)
      assert(f.min_px == 255 - s.max_px && f.max_px == 255 - s.min_px)
      assert(math.abs(f.mean_px - (255.0 - s.mean_px)) < 1e-9)
    }
    val resized = resize(spark, decodeImages(spark, items, inverted), 2)
      .collect().map(d => d.doc_id -> d.pixels.toSeq).toMap
    val resizedStub = resize(spark, decodeImages(spark, items), 2)
      .collect().map(d => d.doc_id -> d.pixels.toSeq).toMap
    assert(resized.keySet == resizedStub.keySet && resized.nonEmpty)
  }

  test("audio codec injection: scaled decoder scales window energy exactly") {
    // the audio seam is the image seam's twin: a 2x-amplitude "decoder"
    // must scale every window's integer energy by EXACTLY 4 (sum of
    // squares of doubled samples) with zero other changes — plumbing is
    // codec-blind and the statistic is exact integer arithmetic
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(30)
    val items = asMediaItems(spark,
      mediaFromDocuments(docs).filter(
        org.apache.spark.sql.functions.col("meta.kind") === "audio"))
    val doubled: AudioCodec = (p, n) =>
      StubCodec.decodeAudio(p, n).map(_ * 2)
    val base = audioEnergy(spark, items, nSamples = 50, window = 10)
      .collect().map(w => (w.doc_id, w.window_idx) -> w.energy_sq).toMap
    val amp = audioEnergy(spark, items, nSamples = 50, window = 10, doubled)
      .collect().map(w => (w.doc_id, w.window_idx) -> w.energy_sq).toMap
    assert(base.nonEmpty && amp.keySet == base.keySet)
    base.foreach { case (k, e) =>
      assert(amp(k) == 4L * e, s"window $k energy not scaled exactly: ${amp(k)} vs 4*$e")
    }
  }

  test("media table from documents fixture: binary payload + typed metadata") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = mediaFromDocuments(docs)
    assert(m.schema("payload").dataType.typeName == "binary")
    val row = m.selectExpr("length(payload)", "meta.width", "meta.nFrames").head()
    assert(row.getInt(0) == 16 && row.getInt(1) == 4)
    assert((1 to 4).contains(row.getInt(2)))
    // typed round-trip drives the full decode pipeline end-to-end
    val n = imageFeatures(spark, decodeImages(spark, asMediaItems(spark, m))).count()
    assert(n == docs.count())
  }

  test("imageHash: aHash+dHash bit layout is exact and shape-checked") {
    // hand-computable 2x2 image: pixels (10, 20, 30, 40), sum 100
    // aHash (bits 0-3): p*4 > 100 -> 40,80,120,160 -> bits 2,3
    // dHash horizontal (bits 4-5): 10>20 F, 30>40 F
    // dHash vertical (bits 6-7): 10>30 F, 20>40 F
    assert(Multimodal.imageHash(Array(10, 20, 30, 40), 2, 2) ==
      ((1L << 2) | (1L << 3)))
    // descending pixels flip the comparisons
    // aHash: 40*4=160>100 T(bit0), 30*4=120>100 T(bit1), 80 F, 40 F
    // dH: 40>30 T(bit4), 20>10 T(bit5); dV: 40>20 T(bit6), 30>10 T(bit7)
    assert(Multimodal.imageHash(Array(40, 30, 20, 10), 2, 2) == 0xF3L)
    // a grid too large for 63 bits refuses instead of silently wrapping
    intercept[IllegalArgumentException](
      Multimodal.imageHash(new Array[Int](64), 8, 8))
  }

  test("phashNearDups: pigeonhole blocking equals brute force, boundary distance included") {
    import spark.implicits._
    val rnd = new scala.util.Random(77L)
    val base = rnd.nextLong() & ((1L << 40) - 1)
    val planted = Seq(
      1L -> base,
      2L -> base,                                  // dist 0
      3L -> (base ^ ((1L << 5) | (1L << 25))),     // dist 2 (== maxDist)
      4L -> (base ^ ((1L << 1) | (1L << 20) | (1L << 39))), // dist 3: out
    )
    val noise = (10L until 80L).map(i =>
      i -> (rnd.nextLong() & ((1L << 40) - 1)))
    val all = planted ++ noise
    val got = Multimodal.phashNearDups(all.toDF("id", "h"), bits = 40, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = (for {
      (ia, ha) <- all; (ib, hb) <- all
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 2
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb))).toSet
    assert(got == brute,
      s"blocking diverged from brute force: only-blocked=${got -- brute} " +
        s"missed=${brute -- got}")
    assert(got.contains((1L, 2L, 0)) && got.contains((1L, 3L, 2)) &&
      got.contains((2L, 3L, 2)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L),
      "a distance-3 pair leaked through the maxDist=2 filter")
  }
}
