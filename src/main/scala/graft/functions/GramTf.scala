package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused native gram pass for the LM ladder's tagged hashed gram stream
  * ([[graft.queries.ExtQueries]] gramTfOf): ONE loop over the token
  * array computes what the declarative spelling assembled from five
  * passes' worth of expression work —
  *
  *   - tag 0: one (h, h, h, tf) struct per distinct unigram,
  *   - tag 1: one (h, hp, hs, tf) struct per distinct bigram, where
  *     `h` hashes the space-joined bigram and `hp`/`hs` the prefix /
  *     suffix word,
  *
  * all hashes the engine's standing 60-bit md5 prefix
  * ([[Md5Hash60]]). The declarative chain paid, per document: two
  * [[TermStats]] hash-map passes (the bigram one over a `transform`-
  * built string array), a struct-array concat + explode, and then
  * THREE md5→hex→conv chains per exploded row (h, hp, hs — the tag-0
  * rows computing the identical value three times). Here each distinct
  * word is digested exactly once (a per-document memo serves prefix and
  * suffix lookups) and each distinct bigram once, with digest bytes
  * shifting straight into longs.
  *
  * Identity contract: per-document gram identity is the 60-bit hash —
  * exactly the identity every consumer already aggregates or joins on
  * (the corpus tables groupBy `h`; the scoring joins key on `h`/`hp`/
  * `hs`; the DuckDB oracles group by the same md5-prefix hash), so
  * hash-keyed within-doc dedup is value-identical to the old
  * string-keyed dedup for every consumer, under the engine's standing
  * gram-identity contract (x40/x44's documented collision discount).
  *
  * Struct order: unigrams in first-occurrence order, then bigrams in
  * first-occurrence order. No caller may depend on array order —
  * consumers explode it and aggregate/join.
  *
  * NULL contract: NULL token array → NULL (explode then drops the row,
  * matching the declarative spelling where concat(transform(NULL..))
  * is NULL). Token elements are assumed non-null (arrays come from
  * `split`).
  */
case class GramTf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> tokens, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tag", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false),
      StructField("hp", LongType, nullable = false),
      StructField("hs", LongType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "gram_tf"

  override def nullSafeEval(input: Any): Any =
    GramTf.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.GramTf.compute($toks);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramTf {

  /** Called from generated code — keep the signature stable. */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val md = Md5Hash60.md5()
    // per-document word-hash memo: each distinct word digested once,
    // serving the unigram row and every prefix/suffix lookup
    val wordH = new java.util.HashMap[UTF8String, java.lang.Long]()
    def hashWord(w: UTF8String): Long = {
      val cached = wordH.get(w)
      if (cached != null) cached.longValue()
      else {
        md.reset()
        val h = Md5Hash60.h60(md.digest(w.getBytes))
        wordH.put(w, java.lang.Long.valueOf(h))
        h
      }
    }
    // unigram tf keyed by hash, insertion-ordered (first occurrence)
    val uni = new java.util.LinkedHashMap[java.lang.Long, Array[Long]]()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = hashWord(toks.getUTF8String(i))
      hs(i) = h
      val c = uni.get(h)
      if (c == null) uni.put(h, Array(1L)) else c(0) += 1L
      i += 1
    }
    // bigram (tf, hp, hs) keyed by the joined-string hash
    val bi = new java.util.LinkedHashMap[java.lang.Long, Array[Long]]()
    i = 0
    while (i < n - 1) {
      val a = toks.getUTF8String(i)
      val b = toks.getUTF8String(i + 1)
      val ab = a.numBytes()
      val bb = b.numBytes()
      val joined = new Array[Byte](ab + 1 + bb)
      a.writeToMemory(joined, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
      joined(ab) = ' '
      b.writeToMemory(joined,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + ab + 1)
      md.reset()
      val h = Md5Hash60.h60(md.digest(joined))
      val c = bi.get(h)
      if (c == null) bi.put(h, Array(1L, hs(i), hs(i + 1))) else c(0) += 1L
      i += 1
    }
    val out = new Array[Any](uni.size + bi.size)
    var j = 0
    var it = uni.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = e.getKey.longValue()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0, h, h, h, e.getValue()(0)))
      j += 1
    }
    it = bi.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](1, e.getKey.longValue(), v(1), v(2), v(0)))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point over a token-array column. */
  def apply(toks: Column): Column =
    GraftColumnBridge.column(new GramTf(GraftColumnBridge.expression(toks)))
}
