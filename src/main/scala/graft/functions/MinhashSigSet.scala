package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native per-document MinHash + shingle-set pass: takes the document's
  * token array and computes, in one tight Java loop,
  *
  *   - word n-gram shingles ("t1 t2 t3", space-joined),
  *   - per-shingle md5, from which
  *   - the MinHash signature s0..s{numHashes-1}
  *     (universal-hash family over the first 32 md5 bits — identical
  *     constants/arithmetic to [[graft.ext.Dedup.hashParams]] and the
  *     DuckDB oracle CTEs), and
  *   - the DISTINCT 60-bit shingle-hash set (first 15 md5 hex chars)
  *     for exact Jaccard verification,
  *
  * returned as a struct (s0..s{n-1} BIGINT, shset ARRAY<BIGINT>).
  *
  * Why an Expression and not higher-order functions: the HOF spelling
  * (`transform`/`array_min`/`array_distinct`) runs the lambda interpreter
  * per ELEMENT; its call sites turn megamorphic once a session has
  * compiled many other queries, degrading ~5× (measured: x6 0.7 s in a
  * fresh JVM → 3.7 s after 50 other queries in the bench JVM). One
  * monomorphic per-ROW loop is immune, and the md5 work dominates so the
  * codegen boundary costs nothing. Same pattern as [[LongDotProduct]].
  *
  * NULL contract: NULL input array → NULL; token elements are assumed
  * non-null (arrays come from `split`). Fewer than n tokens → zero
  * shingles → empty shset and signature mins of Long.MaxValue; callers
  * filter those rows out beforehand (matching the explode path, where
  * such docs produce no rows at all).
  */
case class MinhashSigSet(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> tokens, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(
    (0 until numHashes).map(i => StructField(s"s$i", LongType, nullable = false)) :+
      StructField("shset", ArrayType(LongType, containsNull = false), nullable = false))

  override def prettyName: String = "minhash_sig_set"

  override def nullSafeEval(input: Any): Any =
    MinhashSigSet.compute(input.asInstanceOf[ArrayData], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.MinhashSigSet.compute($toks, $n, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSigSet {

  /** (aᵢ, bᵢ) pairs flattened as [a0, b0, a1, b1, ...]; lazily sized up.
    * Thread-safe via volatile publish of immutable arrays. */
  @volatile private var params: Array[Long] = Array.empty

  private def paramsFor(numHashes: Int): Array[Long] = {
    val cur = params
    if (cur.length >= 2 * numHashes) cur
    else {
      val ps = graft.ext.Dedup.hashParams(numHashes)
      val flat = new Array[Long](2 * numHashes)
      var i = 0
      while (i < numHashes) {
        flat(2 * i) = ps(i)._1; flat(2 * i + 1) = ps(i)._2; i += 1
      }
      params = flat
      flat
    }
  }

  private val P = graft.ext.Dedup.MinhashP

  /** Called from generated code — keep the signature stable. */
  def compute(toks: ArrayData, n: Int, numHashes: Int): InternalRow = {
    val ps = paramsFor(numHashes)
    // thread-cached digest + shingle bytes straight from the UTF8String
    // payloads (r22, ADVICE — same byte identity argument as
    // [[ShingleSet60.compute]]: UTF8String already stores UTF-8)
    val md = Md5Hash60.md5()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val seen = new java.util.HashSet[java.lang.Long]()
    val nToks = toks.numElements()
    val nShingles = nToks - (n - 1)
    var i = 0
    while (i < nShingles) {
      var len = n - 1
      var k = 0
      while (k < n) { len += toks.getUTF8String(i + k).numBytes(); k += 1 }
      val joined = new Array[Byte](len)
      var off = 0
      k = 0
      while (k < n) {
        if (k > 0) { joined(off) = ' '; off += 1 }
        val u = toks.getUTF8String(i + k)
        u.writeToMemory(joined,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
        off += u.numBytes()
        k += 1
      }
      md.reset()
      val d = md.digest(joined)
      // first 8 hex chars = first 4 bytes, unsigned 32-bit
      val h0 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      // first 15 hex chars = first 60 bits
      val h60 = ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
        ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
        ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
        ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >> 4)
      var j = 0
      while (j < numHashes) {
        val v = (ps(2 * j) * h0 + ps(2 * j + 1)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      seen.add(h60)
      i += 1
    }
    val set = new Array[Any](seen.size)
    val it = seen.iterator()
    var s = 0
    while (it.hasNext) { set(s) = it.next().longValue(); s += 1 }
    val fields = new Array[Any](numHashes + 1)
    System.arraycopy(mins.map(v => v: Any), 0, fields, 0, numHashes)
    fields(numHashes) = new GenericArrayData(set)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(fields)
  }

  /** Column-API entry point over a token-array column. */
  def apply(toks: Column, n: Int, numHashes: Int): Column =
    GraftColumnBridge.column(
      new MinhashSigSet(GraftColumnBridge.expression(toks), n, numHashes))
}
