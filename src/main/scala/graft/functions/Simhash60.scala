package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 60-bit SimHash of a token array — the wide-radius companion to
  * [[Simhash32]]. Bit j (0 ≤ j < 60) of each token's md5 is bit
  * `3 - (j % 2)` of hex nibble `j / 2` (two bits per nibble over the
  * first 30 nibbles); the document bit is the sign of the ±1 vote sum.
  *
  * Why 60 and not 64: bit 63 would overflow BIGINT shift arithmetic in
  * the DuckDB oracle (and flip the sign of the Spark Long), while 60
  * keeps every simhash a non-negative int64 in both engines — the same
  * convention as the engine's 60-bit shingle hashes. Why wide at all:
  * pigeonhole blocking at radius d cuts the hash into d+1 slices, and a
  * 32-bit hash at d ≥ 4 leaves ≤ 6-bit slices (unselective buckets);
  * 60 bits keep slices ≥ 10 bits through d = 5
  * ([[graft.ext.Dedup.simhashPairs]]).
  *
  * Same execution shape as Simhash32: one monomorphic loop per document,
  * no token explode, no 60-aggregate shuffle; tokens never leave their
  * row. NULL contract: NULL token array → NULL; elements assumed
  * non-null (arrays come from `split`).
  */
case class Simhash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> tokens, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    Simhash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.Simhash60.compute($toks);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash60 {
  /** Called from generated code — keep the signature stable. */
  def compute(toks: ArrayData): Long = {
    val md = Md5Hash60.md5()
    val votes = new Array[Int](60)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(toks.getUTF8String(i).getBytes)
      var j = 0
      while (j < 60) {
        // hex nibble j/2 of the digest: byte (j/2)/2, high nibble for
        // even nibble index; then bit 3 for even j, bit 2 for odd j —
        // exactly the oracle's ((nib >> (3 - j % 2)) & 1)
        val k = j >> 1
        val nib = if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xf else d(k >> 1) & 0xf
        if (((nib >> (3 - (j & 1))) & 1) == 1) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var bits = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) bits |= (1L << j)
      j += 1
    }
    bits
  }

  /** Column-API entry point over a token-array column. */
  def apply(toks: Column): Column =
    GraftColumnBridge.column(new Simhash60(GraftColumnBridge.expression(toks)))
}
