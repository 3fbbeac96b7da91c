package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5-prefix hash of a string — the value of
  * `conv(substring(md5(s), 1, 15), 16, 10) :: long` (the engine's
  * standing gram/shingle/line identity, [[graft.ext.Dedup.shingleHash60]])
  * computed without the hex round-trip: the declarative chain
  * materializes a 32-char hex UTF8String per row, substrings it, and
  * parses 15 hex digits back into a long (`Conv` does digit-by-digit
  * radix arithmetic); here the digest's first 8 bytes shift directly
  * into the long — same bits, no intermediate allocation. The byte
  * extraction is [[MinhashSigSet]]'s h60 line, so every hash-identity
  * consumer (gram tables, line dedup, postings) agrees with the sketch
  * path by construction.
  *
  * NULL contract: NULL string → NULL, matching md5(NULL).
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"

  override def nullSafeEval(input: Any): Any =
    Md5Hash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.Md5Hash60.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash60 {

  /** Per-thread reusable MD5 instance (r22, ADVICE): `getInstance`
    * allocates a fresh digest plus a JCA provider lookup per call —
    * measurable in the hot paths that digest once per ROW ([[compute]])
    * or per document (the sketch/gram natives). Tasks are
    * single-threaded, so a thread-cached instance is safe; `digest()`
    * leaves the instance reset, and [[md5]] resets again before handing
    * it out as belt and braces against an aborted previous use. */
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** The calling thread's reset MD5 digest — shared by every per-row /
    * per-document hashing native. */
  def md5(): java.security.MessageDigest = {
    val md = tlMd.get(); md.reset(); md
  }

  /** First 60 bits (15 hex chars) of an md5 digest as a non-negative
    * long — shared by [[compute]] and [[GramTf]]'s in-loop hashing. */
  def h60(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
      ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
      ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >> 4)

  /** Called from generated code — keep the signature stable. */
  def compute(s: UTF8String): Long =
    h60(md5().digest(s.getBytes))

  /** Column-API entry point. */
  def apply(s: Column): Column =
    GraftColumnBridge.column(new Md5Hash60(GraftColumnBridge.expression(s)))
}
