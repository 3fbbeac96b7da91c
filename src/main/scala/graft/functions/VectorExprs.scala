package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native quantization of a float/double embedding to exact integers
  * (×10⁶): `round(x * 1e6)` per element with Spark's own Round semantics
  * (BigDecimal HALF_UP — also DuckDB's `round`, which is what keeps the
  * oracle parity bit-exact), as one monomorphic loop per vector instead
  * of a per-element `transform` lambda. NULL elements pass through as
  * NULL slots, matching the higher-order-function spelling.
  */
case class QuantizeVec(child: Expression) extends UnaryExpression {

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  private lazy val childContainsNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _                => true
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = childContainsNull)
  override def prettyName: String = "quantize_vec"

  override def nullSafeEval(input: Any): Any =
    QuantizeVec.compute(input.asInstanceOf[ArrayData], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.QuantizeVec.compute($v, $elemIsFloat);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeVec {
  /** Called from generated code — keep the signature stable. */
  def compute(arr: ArrayData, elemIsFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        // NaN/Infinity can't quantize: BigDecimal.valueOf would throw a
        // bare NumberFormatException deep in generated code (and the
        // ANSI-mode HOF spelling throws its own cast error) — fail with
        // an actionable message instead
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
          throw new IllegalArgumentException(
            s"quantize_vec: non-finite embedding element $d at index $i — " +
              "clean or clip embeddings before quantization")
        // exactly Spark's Round(double, 0) = BigDecimal HALF_UP, then the
        // long cast the HOF spelling applied to the rounded double
        out(i) = java.math.BigDecimal.valueOf(d * 1000000.0)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(emb: Column): Column =
    GraftColumnBridge.column(new QuantizeVec(GraftColumnBridge.expression(emb)))
}

/** Native random-hyperplane LSH bucket id over a QUANTIZED vector: bit p
  * is the sign of Σᵢ (qv[i]/10⁶)·w[p][i], summed left-to-right (the same
  * order as the `aggregate(zip_with(...))` spelling and DuckDB's
  * `list_reduce`, so bucket bits — hence candidates — match bit-for-bit).
  * One loop per row replaces numPlanes interpreted per-element lambdas.
  * Planes are carried as Seq[Seq[Double]] so expression equality stays
  * structural. NULL vector → NULL bucket; elements assumed non-null
  * (quantized embeddings).
  */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> (quantized), got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  @transient private lazy val flat: Array[Double] = planes.flatten.toArray
  @transient private lazy val dim: Int = if (planes.isEmpty) 0 else planes.head.size

  override def nullSafeEval(input: Any): Any =
    HyperplaneBucket.compute(input.asInstanceOf[ArrayData], flat, planes.size, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("planesFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HyperplaneBucket.compute(" +
        s"$v, $flatRef, ${planes.size}, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Called from generated code — keep the signature stable. */
  def compute(qv: ArrayData, flat: Array[Double], numPlanes: Int, dim: Int): Long = {
    // A vector whose length differs from the plane dimension: the
    // HOF/oracle spelling (zip_with null-pads the shorter side, so the
    // aggregate includes a NULL product and the projection is NULL → bit
    // 0 on every plane) yields bucket 0 — match it rather than bucketing
    // on a partial dot product.
    if (qv.numElements() != dim) return 0L
    val n = math.min(qv.numElements(), dim)
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      var acc = 0.0
      val base = p * dim
      var i = 0
      while (i < n) {
        acc += (qv.getLong(i).toDouble / 1000000.0) * flat(base + i)
        i += 1
      }
      if (acc >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def apply(qv: Column, planes: Array[Array[Double]]): Column =
    GraftColumnBridge.column(new HyperplaneBucket(
      GraftColumnBridge.expression(qv),
      planes.toIndexedSeq.map(_.toIndexedSeq)))
}
