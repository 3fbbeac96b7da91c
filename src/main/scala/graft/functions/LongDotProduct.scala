package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen dot product of two BIGINT arrays.
  *
  * The built-in spelling `aggregate(zip_with(a, b, _*_), 0L, _+_)` runs
  * the higher-order-function interpreter per element — fine once per row,
  * far too slow in the inner loop of an all-pairs similarity join where
  * it executes O(pairs × dims) times. This expression compiles to a tight
  * primitive `long` loop inside whole-stage codegen (and a matching
  * interpreted path for completeness).
  *
  * Null contract: NULL if either array is NULL; elements are assumed
  * non-null (quantized embeddings — see [[graft.ext.Similarity]]).
  * Arrays of different lengths dot over the common prefix.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is avoided deliberately: its inputTypes signature names
  // AbstractDataType, which is private[sql] in Spark 4.1's spark-sql-api and
  // unreferencable from a library package. Equivalent check done by hand.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongDotProduct {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      new LongDotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
