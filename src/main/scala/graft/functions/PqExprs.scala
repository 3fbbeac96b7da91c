package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Product-quantization primitives (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search") over the engine's
  * integer-quantized vectors: the vector splits into `m` sub-vectors of
  * `subDim` dims, each encoded as the id of its nearest codeword in a
  * per-sub-space codebook of `ksub` entries. All arithmetic is EXACT
  * int64 — encoding minimizes the integer L2 surrogate
  * `‖c‖² − 2·x·c` (‖x‖² is constant per sub-vector), so both engines
  * reproduce codes bit-for-bit. The flat codebook layout is
  * `cb[(i*ksub + j)*subDim + d]` = dim d of codeword j in sub-space i.
  *
  * All three are native codegen expressions (reference-object call,
  * precomputed codeword self-dots) — the per-row cost is a tight
  * primitive loop, never an interpreted HOF.
  */
object PqShared {
  /** codeword self-dots: selfdot[i*ksub + j] = ‖c_{i,j}‖², precomputed
    * once per expression instance. */
  def selfDots(cb: Array[Long], m: Int, ksub: Int, subDim: Int): Array[Long] = {
    val out = new Array[Long](m * ksub)
    var t = 0
    while (t < m * ksub) {
      var s = 0L
      var d = 0
      while (d < subDim) { val v = cb(t * subDim + d); s += v * v; d += 1 }
      out(t) = s
      t += 1
    }
    out
  }

  /** The PQ assignment loop over a plain long[] — shared by the
    * [[PqEncode]] expression (row path) and the driver-side training
    * regime ([[graft.ext.Similarity.trainPqCodebooks]]), so both paths
    * are the SAME arithmetic by construction: per sub-space, the
    * codeword minimizing ‖c‖² − 2·x·c, tie-break smaller code id. */
  def encodeArr(qv: Array[Long], cb: Array[Long], self: Array[Long],
      m: Int, ksub: Int, subDim: Int): Array[Int] = {
    val codes = new Array[Int](m)
    var i = 0
    while (i < m) {
      var best = 0
      var bestScore = Long.MaxValue
      var j = 0
      while (j < ksub) {
        val t = i * ksub + j
        var dot = 0L
        var d = 0
        val base = t * subDim
        val off = i * subDim
        while (d < subDim) {
          dot += qv(off + d) * cb(base + d)
          d += 1
        }
        val score = self(t) - 2L * dot
        if (score < bestScore) { bestScore = score; best = j }
        j += 1
      }
      codes(i) = best
      i += 1
    }
    codes
  }
}

/** `qv → Array[Int]` of `m` PQ codes: per sub-space, the codeword
  * minimizing `‖c‖² − 2·x·c` (exact integer L2 surrogate), tie-break
  * smaller code id. NULL in → NULL out. */
case class PqEncode(
    child: Expression, cb: Seq[Long], m: Int, ksub: Int, subDim: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val cbArr: Array[Long] = cb.toArray
  @transient private lazy val self: Array[Long] =
    PqShared.selfDots(cbArr, m, ksub, subDim)

  def encode(qv: ArrayData): ArrayData =
    new GenericArrayData(
      PqShared.encodeArr(qv.toLongArray(), cbArr, self, m, ksub, subDim))

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `qv → Array[Long]` ADC distance table: entry `i*ksub + j` =
  * `dot(q_sub_i, c_{i,j})` — computed once per QUERY row so each
  * candidate pair costs O(m) lookups, the published ADC shape. */
case class PqDistTable(
    child: Expression, cb: Seq[Long], m: Int, ksub: Int, subDim: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_dist_table"

  @transient private lazy val cbArr: Array[Long] = cb.toArray

  def table(qv: ArrayData): ArrayData = {
    // LOUD on a dim mismatch: UnsafeArrayData.getLong has no runtime
    // bounds check, so a short vector would read adjacent buffer memory
    // into nondeterministic garbage distances (PqEncode fails loudly via
    // its toLongArray copy; this path must too)
    require(qv.numElements() == m * subDim,
      s"pq_dist_table: vector has ${qv.numElements()} dims, codebooks " +
        s"expect ${m * subDim}")
    val out = new Array[Long](m * ksub)
    var i = 0
    while (i < m) {
      val off = i * subDim
      var j = 0
      while (j < ksub) {
        val t = i * ksub + j
        val base = t * subDim
        var dot = 0L
        var d = 0
        while (d < subDim) {
          dot += qv.getLong(off + d) * cbArr(base + d)
          d += 1
        }
        out(t) = dot
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    table(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqTable", this, classOf[PqDistTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.table($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `(table: Array[Long], codes: Array[Int]) → Σ_i table[i*ksub+codes[i]]`
  * — the per-candidate ADC sum: O(m) lookups into the query's
  * precomputed table. Also serves the reconstructed-norm lookup with a
  * LITERAL self-dot table. */
case class PqAdcSum(left: Expression, right: Expression, ksub: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, ARRAY<INT>), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc_sum"

  override protected def nullSafeEval(t: Any, c: Any): Any =
    PqAdcSum.compute(t.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) =>
      s"${ev.value} = graft.functions.PqAdcSum.compute($t, $c, $ksub);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqEncode {
  /** Column-API entry point. */
  def apply(qv: org.apache.spark.sql.Column, cb: Seq[Long],
      m: Int, ksub: Int, subDim: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      new PqEncode(org.apache.spark.sql.GraftColumnBridge.expression(qv),
        cb, m, ksub, subDim))
}

object PqDistTable {
  /** Column-API entry point. */
  def apply(qv: org.apache.spark.sql.Column, cb: Seq[Long],
      m: Int, ksub: Int, subDim: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      new PqDistTable(org.apache.spark.sql.GraftColumnBridge.expression(qv),
        cb, m, ksub, subDim))
}

object PqAdcSum {
  /** Called from generated code — bounds-checked: an out-of-range
    * (code, table) pair reads unchecked UnsafeArrayData memory
    * otherwise. */
  def compute(table: ArrayData, codes: ArrayData, ksub: Int): Long = {
    val n = codes.numElements()
    val tn = table.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val idx = i * ksub + codes.getInt(i)
      if (idx < 0 || idx >= tn)
        throw new IllegalArgumentException(
          s"pq_adc_sum: code ${codes.getInt(i)} at sub-space $i indexes " +
            s"cell $idx outside the $tn-entry table")
      s += table.getLong(idx)
      i += 1
    }
    s
  }

  /** Column-API entry point. */
  def apply(table: org.apache.spark.sql.Column,
      codes: org.apache.spark.sql.Column, ksub: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      new PqAdcSum(org.apache.spark.sql.GraftColumnBridge.expression(table),
        org.apache.spark.sql.GraftColumnBridge.expression(codes), ksub))
}
