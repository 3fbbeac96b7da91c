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

/** Native HLL cell derivation from a 60-bit truncated md5 hash (the
  * integer twin of [[HyperLogLog.packedCell]]'s string inspection):
  * bucket = top 8 of the 60 bits mod 64, rho = 1 + leading zero bits of
  * the next 44 (45 when all-zero). See packedCellFromH60 for the bit
  * correspondence proof; HyperLogLogSpec pins the two spellings equal.
  * NULL in → NULL out.
  */
case class HllCellFromH60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT (h60), got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hll_cell_from_h60"

  override def nullSafeEval(input: Any): Any =
    HllCellFromH60.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HllCellFromH60.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HllCellFromH60 {
  /** Called from generated code — keep the signature stable. */
  def compute(h60: Long): Long = {
    val bucket = ((h60 >>> 52) % 64L).toInt
    val tail = (h60 >>> 8) & ((1L << 44) - 1L)
    val rho =
      if (tail == 0L) 45
      else java.lang.Long.numberOfLeadingZeros(tail) - 20 + 1
    bucket * 64L + rho
  }

  def apply(h60: Column): Column =
    GraftColumnBridge.column(new HllCellFromH60(
      GraftColumnBridge.expression(h60)))
}

/** Native IVF coarse-quantizer assignment: the `keep` nearest centroid
  * list ids for a (quantized-vector, norm) pair, by cosine desc then
  * list id asc — FAISS's in-memory assignment loop as one expression.
  *
  * The declarative spelling (array of per-centroid structs of
  * `aggregate(zip_with(...))` dots over `typedlit` vectors, then
  * `sort_array`+`slice`) builds an O(nLists·dim) literal tree that
  * Catalyst re-walks on every construction — 0.25 s of plan time per
  * query at 16×64 — and evaluates through interpreted struct sorts. Here
  * the centroid matrix is a constructor field (structural equality
  * preserved, like [[HyperplaneBucket]]'s planes), the plan node is one
  * expression, and the row loop is monomorphic. Tie and NaN ordering
  * mirror the struct-sort spelling exactly: ascending (−cosine, listId)
  * with NaN last (a zero-norm side yields NaN cosine → that centroid
  * ranks after every finite one, Double.compare semantics).
  *
  * Children are (qv ARRAY<BIGINT>, nrm DOUBLE); NULL in either → NULL.
  */
case class IvfNearestLists(
    left: Expression, right: Expression,
    listIds: Seq[Int], centFlat: Seq[Long], centNrms: Seq[Double],
    dim: Int, keep: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<BIGINT>, DOUBLE), got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_nearest_lists"

  @transient private lazy val idsArr: Array[Int] = listIds.toArray
  @transient private lazy val flatArr: Array[Long] = centFlat.toArray
  @transient private lazy val nrmArr: Array[Double] = centNrms.toArray

  override def nullSafeEval(qv: Any, nrm: Any): Any =
    IvfNearestLists.compute(qv.asInstanceOf[ArrayData],
      nrm.asInstanceOf[Double], idsArr, flatArr, nrmArr, dim, keep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("ivfIds", idsArr, "int[]")
    val flat = ctx.addReferenceObj("ivfFlat", flatArr, "long[]")
    val nrms = ctx.addReferenceObj("ivfNrms", nrmArr, "double[]")
    nullSafeCodeGen(ctx, ev, (qv, nrm) =>
      s"${ev.value} = graft.functions.IvfNearestLists.compute(" +
        s"$qv, $nrm, $ids, $flat, $nrms, $dim, $keep);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IvfNearestLists {
  def apply(qv: Column, nrm: Column, listIds: Seq[Int], centFlat: Seq[Long],
      centNrms: Seq[Double], dim: Int, keep: Int): Column =
    GraftColumnBridge.column(new IvfNearestLists(
      GraftColumnBridge.expression(qv), GraftColumnBridge.expression(nrm),
      listIds, centFlat, centNrms, dim, keep))

  /** Called from generated code — keep the signature stable. */
  def compute(qv: ArrayData, nrm: Double, ids: Array[Int], flat: Array[Long],
      nrms: Array[Double], dim: Int, keep: Int): ArrayData = {
    val nc = ids.length
    val negcos = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      val base = c * dim
      // a length-mismatched vector ranks LAST (NaN, Double.compare
      // order) — deliberately diverging from the struct spelling, where
      // the zip_with dot's NULL sorted such a centroid FIRST (an
      // accident of struct NULLS-FIRST ordering, never a sane pick)
      if (qv.numElements() != dim) { negcos(c) = Double.NaN }
      else {
        var acc = 0L
        var i = 0
        while (i < dim) { acc += qv.getLong(i) * flat(base + i); i += 1 }
        negcos(c) = -(acc.toDouble / (nrm * nrms(c)))
      }
      c += 1
    }
    val k = math.min(keep, nc)
    val out = new Array[Any](k)
    val taken = new Array[Boolean](nc)
    var r = 0
    while (r < k) {
      var best = -1
      var c2 = 0
      while (c2 < nc) {
        if (!taken(c2) && (best < 0 || {
          val cmp = java.lang.Double.compare(negcos(c2), negcos(best))
          cmp < 0 || (cmp == 0 && ids(c2) < ids(best))
        })) best = c2
        c2 += 1
      }
      taken(best) = true
      out(r) = ids(best)
      r += 1
    }
    new GenericArrayData(out)
  }
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
    val n = dim // the guard above makes the old min() always dim
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
