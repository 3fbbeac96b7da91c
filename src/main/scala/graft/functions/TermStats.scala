package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document term-frequency pass: takes the document's token
  * array and computes, in one hash-map loop,
  *
  *   - `counts`: one (term, tf) struct per DISTINCT token,
  *   - `maxtf`: the highest single-term frequency, and
  *   - `ntok`: the total token count,
  *
  * returned as a struct. This is the row-local half of the wordcount
  * shape: callers explode `counts` and the downstream groupBy/window
  * operates on ~vocabulary-sized data instead of one row per token —
  * the explode+groupBy(doc, term) spelling shuffles every token of the
  * corpus, where this shuffles nothing (x17) or only per-doc distinct
  * terms (x21).
  *
  * Why an Expression and not higher-order functions: same reason as
  * [[MinhashSigSet]] — the HOF interpreter runs per ELEMENT and its
  * call sites go megamorphic in a many-query session; one monomorphic
  * per-ROW loop is immune, and whole-stage codegen keeps the
  * surrounding projection fused.
  *
  * Determinism: `counts` is emitted in insertion order of a LinkedHashMap
  * (first occurrence order). No caller may depend on the array order —
  * consumers explode it or reduce over it.
  *
  * NULL contract: NULL input array → NULL row result; token elements are
  * assumed non-null (arrays come from `split`). Empty tokens ("" from
  * consecutive delimiters) count like any other token, matching the
  * explode spelling and DuckDB's unnest(string_split(...)).
  */
case class TermStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> tokens, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("counts", ArrayType(
      StructType(Seq(
        StructField("term", StringType, nullable = false),
        StructField("tf", LongType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("maxtf", LongType, nullable = false),
    StructField("ntok", LongType, nullable = false)))

  override def prettyName: String = "term_stats"

  override def nullSafeEval(input: Any): Any =
    TermStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.TermStats.compute($toks);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermStats {

  /** Called from generated code — keep the signature stable. */
  def compute(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    // UTF8String keys hash/compare on the raw bytes — no String decode.
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val c = m.get(t)
      if (c == null) m.put(t.clone(), Array(1L)) else c(0) += 1L
      i += 1
    }
    var maxtf = 0L
    val entries = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      val tf = e.getValue()(0)
      if (tf > maxtf) maxtf = tf
      entries(j) =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](e.getKey, tf))
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(entries), maxtf, n.toLong))
  }

  /** Column-API entry point over a token-array column. */
  def apply(toks: Column): Column =
    GraftColumnBridge.column(new TermStats(GraftColumnBridge.expression(toks)))
}

/** Native per-document shingle duplication stats: `(total, dist)` counts
  * of the document's n-gram multiset — the repetition-scoring primitive
  * (x17) — in one loop over the token array.
  *
  * The declarative spelling materialized every gram as a string (an
  * interpreted `transform` running n element_at + concat_ws per ELEMENT)
  * and then re-hashed them all through `array_distinct`; here no gram
  * array ever exists. Exactness: grams are compared as the
  * space-joined string the oracle's gramExpr builds — tokens come from
  * `split(text, ' ')` and so contain no spaces, making the join
  * bijective on token windows (equal joined grams ⇔ equal windows),
  * including empty tokens from consecutive delimiters.
  *
  * NULL contract: NULL token array → NULL result, matching the explode
  * spelling's dropped rows (callers filter or coalesce). NULL ELEMENTS
  * are skipped inside a gram — concat_ws semantics, so the reference
  * spelling and this one agree on arrays not produced by `split` too.
  * Fewer than n tokens → (0, 0).
  */
case class ShingleDupStats(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) =>
      if (n >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName requires n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> tokens, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("dist", LongType, nullable = false)))

  override def prettyName: String = "shingle_dup_stats"

  override def nullSafeEval(input: Any): Any =
    ShingleDupStats.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = graft.functions.ShingleDupStats.compute($toks, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleDupStats {
  private val Space = UTF8String.fromString(" ")

  /** Called from generated code — keep the signature stable. */
  def compute(toks: ArrayData, n: Int): InternalRow = {
    val nt = toks.numElements()
    val total = math.max(nt - n + 1, 0)
    if (total == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L))
    val seen = new java.util.HashSet[UTF8String](total * 2)
    // concat_ws semantics: NULL tokens are SKIPPED (no separator either),
    // so the gram is the join of the window's non-null tokens
    val parts = new Array[UTF8String](2 * n - 1)
    var i = 0
    while (i < total) {
      var np = 0
      var k = 0
      while (k < n) {
        val t = toks.getUTF8String(i + k)
        if (t != null) {
          if (np > 0) { parts(np) = Space; np += 1 }
          parts(np) = t; np += 1
        }
        k += 1
      }
      seen.add(UTF8String.concat(parts.take(np).toIndexedSeq: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total.toLong, seen.size.toLong))
  }

  def apply(toks: Column, n: Int): Column =
    GraftColumnBridge.column(new ShingleDupStats(
      GraftColumnBridge.expression(toks), n))
}
