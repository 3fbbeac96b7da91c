package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native distinct 60-bit shingle-hash set of a token array —
  * [[MinhashSigSet]]'s `shset` without the signature columns: one
  * monomorphic loop builds each n-gram's bytes and digests it once,
  * emitting the DISTINCT [[Md5Hash60]] values in first-occurrence
  * order. Replaces the interpreted HOF chain
  * `explode(array_distinct(shinglesFromTokens(toks, n)))` + an md5
  * expression per gram (per-element lambda interpretation, a distinct
  * pass over gram STRINGS, then hex→long parsing) for consumers whose
  * gram identity is already the 60-bit hash (contamination overlap
  * x22/x42).
  *
  * Fewer than n tokens → empty array (explode drops the document,
  * matching the HOF spelling). NULL token array → NULL. Token elements
  * are assumed non-null (arrays come from `split`).
  */
case class ShingleSet60(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> tokens, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_set60"

  override def nullSafeEval(input: Any): Any =
    ShingleSet60.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.ShingleSet60.compute($toks, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSet60 {

  /** Called from generated code — keep the signature stable. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    // thread-cached digest + shingle bytes built straight from the
    // UTF8String payloads (r22, ADVICE): the old spelling round-tripped
    // every token through UTF-16 (toString + StringBuilder + getBytes)
    // and allocated a digest per document; UTF8String already stores
    // UTF-8, so the space-joined bytes are identical.
    val md = Md5Hash60.md5()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
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
      seen.add(Md5Hash60.h60(md.digest(joined)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var s = 0
    while (it.hasNext) { out(s) = it.next().longValue(); s += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry point over a token-array column. */
  def apply(toks: Column, n: Int): Column =
    GraftColumnBridge.column(
      new ShingleSet60(GraftColumnBridge.expression(toks), n))
}
