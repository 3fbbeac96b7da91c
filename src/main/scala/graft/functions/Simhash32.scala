package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 32-bit SimHash of a token array: bit j of each token's md5 is
  * the high bit of hex nibble j; the document bit j is the sign of the
  * ±1 vote sum — identical semantics (and md5 family) to the exploded
  * groupBy spelling in [[graft.ext.Dedup.simhash32]] and the DuckDB
  * oracle CTE, but computed in one monomorphic loop per document: no
  * token explode, no 32-aggregate shuffle, no per-element lambda
  * interpretation. The corpus's tokens never leave their row.
  *
  * NULL contract: NULL token array → NULL; token elements are assumed
  * non-null (arrays come from `split`). An empty array yields votes of
  * all zero → simhash 0, which cannot occur via `split` (it always
  * returns ≥1 element).
  */
case class Simhash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> tokens, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    Simhash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.Simhash32.compute($toks);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash32 {
  /** Called from generated code — keep the signature stable. */
  def compute(toks: ArrayData): Long = {
    val md = Md5Hash60.md5()
    val votes = new Array[Int](32)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(toks.getUTF8String(i).getBytes)
      var j = 0
      while (j < 32) {
        // hex char j of the digest: byte j/2, high nibble for even j;
        // chars '8'..'f' are exactly nibble >= 8
        val nib = if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf else d(j >> 1) & 0xf
        if (nib >= 8) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var bits = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) bits |= (1L << j)
      j += 1
    }
    bits
  }

  /** Column-API entry point over a token-array column. */
  def apply(toks: Column): Column =
    GraftColumnBridge.column(new Simhash32(GraftColumnBridge.expression(toks)))
}
