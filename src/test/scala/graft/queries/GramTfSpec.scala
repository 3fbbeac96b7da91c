package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** r21: the fused native gram pass ([[graft.functions.GramTf]] via
  * ExtQueries.gramTfOf) pinned against the pre-r21 declarative spelling
  * (two TermStats passes + explode + three md5 chains per row,
  * ExtQueries.gramTfOfDecl), aggregated by the 60-bit hash identity
  * both spell — the identity every consumer (x45/x51/x53, the unigram/
  * bigram corpus tables) aggregates or joins on. Generated docs cover
  * empty strings, one-token docs (no bigrams), repeated tokens,
  * unicode, and empty tokens from consecutive delimiters; the extra-
  * column passthrough (x53's `_sign`) is exercised too.
  */
class GramTfSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int, size: Int = 14): Seq[T] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(size), Seed(i.toLong)))

  private val tokenGen =
    Gen.oneOf("a", "bb", "ccc", "the", "η", "日本", "x9", ".", "", "zz")
  private val docGen = Gen.listOf(tokenGen).map(_.mkString(" "))

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("doc_id", "tag", "h", "hp", "hs")
      .agg(sum("tf").cast("long").as("tf"))

  test("native gramTfOf == declarative spelling aggregated by hash identity") {
    val docs = samples(docGen, 150).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val a = agg(ExtQueries.gramTfOf(docs))
    val b = agg(ExtQueries.gramTfOfDecl(docs))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("native gramTfOf passes extra columns through unchanged (x53's _sign)") {
    val docs = samples(docGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t, if (i % 2 == 0) 1L else -1L) }
      .toDF("doc_id", "text", "_sign")
    def aggS(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("doc_id", "_sign", "tag", "h", "hp", "hs")
        .agg(sum("tf").cast("long").as("tf"))
    val a = aggS(ExtQueries.gramTfOf(docs, extra = Seq("_sign")))
    val b = aggS(ExtQueries.gramTfOfDecl(docs, extra = Seq("_sign")))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("unigram rows carry hp = hs = h; bigram hp/hs hash the prefix/suffix word") {
    val docs = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
    val g = ExtQueries.gramTfOf(docs).collect()
    val uni = g.filter(_.getInt(1) == 0)
    assert(uni.forall(r => r.getLong(2) == r.getLong(3) &&
      r.getLong(2) == r.getLong(4)))
    val hAlpha = uni.find(_.getLong(5) == 2L).get.getLong(2)
    val hBeta = uni.find(_.getLong(5) == 1L).get.getLong(2)
    val bi = g.filter(_.getInt(1) == 1)
    assert(bi.length == 2) // "alpha beta", "beta alpha"
    assert(bi.exists(r => r.getLong(3) == hAlpha && r.getLong(4) == hBeta))
    assert(bi.exists(r => r.getLong(3) == hBeta && r.getLong(4) == hAlpha))
  }
}
