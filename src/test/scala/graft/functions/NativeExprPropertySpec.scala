package graft.functions

import graft.SparkTestSession
import graft.ext.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based differential tests for the native expressions
  * (MinhashSigSet, Simhash32, QuantizeVec, HyperplaneBucket) against
  * their built-in/HOF reference spellings, over generated data with
  * fixed seeds — exercising shapes the parquet fixtures don't: empty
  * and 1-token docs, repeated tokens, unicode, negative embeddings and
  * values on the ×10⁶ rounding boundary. */
class NativeExprPropertySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int, size: Int = 14): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default.withSize(size), Seed(i.toLong)))

  private val tokenGen =
    Gen.oneOf("a", "bb", "ccc", "the", "η", "日本", "x9", ".", "", "zz")
  private val docGen = Gen.listOf(tokenGen).map(_.mkString(" "))

  test("property: MinhashSigSet matches the exploded shingle-md5 reference on generated docs") {
    val docs = samples(docGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val native = Dedup.minhashWithSets(docs, "id", "text", 3, 12).cache()
    val m = Dedup.shingleMd5(docs, "id", "text", 3)
    val sigRef = Dedup.minhashSignatureFromMd5(m, 12)
    val a = native.drop("shset")
    assert(a.except(sigRef).count() == 0 && sigRef.except(a).count() == 0)
    val setNative = native.select(col("id"), explode(col("shset")).as("sh"))
    val setRef = m.select(col("id"),
      conv(substring(col("m"), 1, 15), 16, 10).cast("long").as("sh")).distinct()
    assert(setNative.except(setRef).count() == 0 &&
      setRef.except(setNative).count() == 0)
    native.unpersist()
  }

  test("property: ShingleDupStats matches the shingle-array reference on generated docs") {
    // includes empty docs, docs shorter than n, repeated grams, empty
    // tokens from consecutive delimiters, unicode
    val docs = samples(docGen, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val toks = split(col("text"), " ")
    for (n <- Seq(1, 3, 6)) {
      val native = docs.select(col("id"),
        ShingleDupStats(toks, n).getField("total").as("total"),
        ShingleDupStats(toks, n).getField("dist").as("dist"))
      val shs = Dedup.shinglesFromTokens(toks, n)
      val ref = docs.select(col("id"),
        size(shs).cast("long").as("total"),
        size(array_distinct(shs)).cast("long").as("dist"))
      assert(native.except(ref).count() == 0 && ref.except(native).count() == 0,
        s"n=$n")
    }
    // null ELEMENTS (not producible via split): concat_ws skip semantics
    val withNulls = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b', 'a', NULL, 'b') AS t")
    val got = withNulls.select(
      ShingleDupStats(col("t"), 2).getField("total").as("total"),
      ShingleDupStats(col("t"), 2).getField("dist").as("dist")).head()
    val shs = Dedup.shinglesFromTokens(col("t"), 2)
    val want = withNulls.select(
      size(shs).cast("long"), size(array_distinct(shs)).cast("long")).head()
    assert((got.getLong(0), got.getLong(1)) == (want.getLong(0), want.getLong(1)))
  }

  test("property: Simhash32 matches the exploded groupBy reference on generated docs") {
    val docs = samples(docGen, 80).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val a = Dedup.simhash32(docs, "id", "text")
    val b = Dedup.simhash32ViaGroupBy(docs, "id", "text")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  private val floatGen = Gen.oneOf(
    Gen.chooseNum(-2.0f, 2.0f),
    // exact ×10⁶ rounding boundaries (x.5 after scaling) and signed zeros
    Gen.oneOf(0.4999995f, -0.4999995f, 0.0000005f, -0.0000005f, 0.0f, -0.0f, 1.0f, -1.0f))
  private val vecGen = Gen.listOfN(8, floatGen).map(_.toArray)

  test("property: QuantizeVec matches the HOF round spelling on generated vectors") {
    val vecs = samples(vecGen, 120).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "embedding")
    val hof = transform(col("embedding"),
      x => round(x.cast("double") * lit(1000000.0)).cast("long"))
    val diff = vecs.select(
      Similarity.quantize(col("embedding")).as("a"), hof.as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff == 0)
  }

  test("property: Md5Hash60 matches the conv(substring(md5)) reference on generated strings") {
    // unicode, empty string, long strings, spaces — plus NULL
    val strs = (samples(docGen, 200) :+ null).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "s")
    val diff = strs.select(
      Md5Hash60(col("s")).as("a"),
      graft.ext.Dedup.shingleHash60Decl(col("s")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff == 0)
  }

  test("property: HyperplaneBucket matches the HOF lshBucket on generated vectors") {
    val vecs = samples(vecGen, 120).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "embedding")
    val prep = Similarity.prepared(vecs, "id", "embedding")
    val ps = Similarity.planes(8, 8)
    val diff = prep.select(
      HyperplaneBucket(col("qv"), ps).as("a"),
      Similarity.lshBucket(
        transform(col("qv"), x => x.cast("double") / lit(1000000.0)), ps).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff == 0)
  }
}
