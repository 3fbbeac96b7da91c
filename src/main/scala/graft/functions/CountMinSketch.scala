package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min Sketch over a string column as a custom typed Aggregator —
  * the "novel sketch" slot of the engine's extension surface (SURVEY.md
  * §4 note: custom aggregate machinery only for sketches beyond
  * approx_count_distinct).
  *
  * Shape: depth×width int64 counter matrix; each value increments one
  * cell per row (`row i, col = hash_i(value) mod width`); merge is
  * element-wise addition — associative and commutative, so Spark runs it
  * as partial+final aggregation with a fixed-size buffer: the whole
  * corpus reduces to depth×width longs regardless of cardinality, the
  * property that makes frequency estimation affordable at 100 TB.
  * Point estimate = min over rows of the value's cell (classic CMS
  * overestimate bound).
  *
  * Determinism contract: hash_i(v) = first 8 md5 hex chars of "i|v" as
  * int64 — reproducible in DuckDB SQL, so the ORACLE rebuilds the exact
  * same sketch and estimates (x14). No RNG, no platform dependence.
  */
object CountMinSketch {
  val Depth = 4
  val Width = 64

  /** hash_i(value): md5-prefix family shared with the DuckDB oracle. */
  def cell(i: Int, value: String): Int =
    cellWith(Md5Hash60.md5(), i, value)

  private def cellWith(
      md: java.security.MessageDigest, i: Int, value: String): Int = {
    md.reset()
    val h = md.digest(s"$i|$value".getBytes("UTF-8"))
    def u(b: Byte): Long = b & 0xffL
    val v = (u(h(0)) << 24) | (u(h(1)) << 16) | (u(h(2)) << 8) | u(h(3))
    (v % Width).toInt
  }

  /** The Aggregator: String in, flat Depth×Width matrix out. */
  val sketch: Aggregator[String, Array[Long], Seq[Long]] =
    new Aggregator[String, Array[Long], Seq[Long]] {
      override def zero: Array[Long] = new Array[Long](Depth * Width)
      override def reduce(buf: Array[Long], value: String): Array[Long] = {
        if (value != null) {
          // ONE digest instance per row, reset between depths — the
          // per-depth getInstance paid 4 JCA provider lookups per input
          // row in the hot aggregation loop (MinhashSigSet's pattern;
          // r22: thread-cached, so not even one lookup per row)
          val md = Md5Hash60.md5()
          var i = 0
          while (i < Depth) { buf(i * Width + cellWith(md, i, value)) += 1L; i += 1 }
        }
        buf
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      override def finish(buf: Array[Long]): Seq[Long] = buf.toIndexedSeq
      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  /** Column spelling: `cmsAgg(col)` aggregates to the sketch array. */
  def cmsAgg(c: Column): Column =
    org.apache.spark.sql.functions.udaf(sketch).apply(c)

  /** Point estimate for a LITERAL probe value out of a sketch column:
    * min over rows of the probed cell — pure column arithmetic (the cell
    * indices are driver-side constants, no UDF at query time). */
  def estimate(sketchCol: Column, value: String): Column = {
    import org.apache.spark.sql.functions._
    (0 until Depth)
      .map(i => element_at(sketchCol, i * Width + cell(i, value) + 1))
      .reduce(least(_, _))
  }
}
