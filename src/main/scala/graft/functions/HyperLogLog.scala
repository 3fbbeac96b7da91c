package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch as a custom typed Aggregator — the
  * second sketch of the extension surface next to [[CountMinSketch]].
  * Unlike Spark's built-in `approx_count_distinct` (whose HLL++ register
  * layout and bias tables are engine-internal), this sketch is built from
  * a DETERMINISTIC md5-derived (bucket, rho) pair that DuckDB can
  * recompute cell-for-cell, so the estimate itself is differentially
  * tested (x24) rather than tolerance-checked.
  *
  * Shape: m=64 byte registers; reduce/merge are element-wise max —
  * associative, commutative, idempotent — so Spark runs partial+final
  * aggregation with a fixed 64-byte buffer: distinct counting at 100 TB
  * reduces to one tiny mergeable state per group, no shuffle of values.
  *
  * Determinism contract (shared with the oracle SQL):
  *   - h = md5 hex of the value; bucket = first 2 hex chars mod 64;
  *   - rho = 1 + number of leading zero BITS of hex chars 3..13 (44
  *     bits), computed by string inspection (leading-'0' run length × 4
  *     plus the first non-zero nibble's leading zeros) — all integer and
  *     string ops, bit-identical across engines;
  *   - estimate = (0.709 · 4096) / Σⱼ 2^(−Mⱼ). Every 2^(−Mⱼ) is an exact
  *     power of two and the 64-term sum stays within 53 mantissa bits, so
  *     the sum is EXACT (order-independent) and the final divide is one
  *     IEEE op — bit-equal in both engines. The raw estimate is used at
  *     every range: the classic linear-counting small-range correction
  *     needs ln(), which is not bit-reproducible across engines, so it is
  *     deliberately omitted (documented bias below ~2.5·m distinct) —
  *     callers read the exact companion column when cardinality is tiny.
  */
object HyperLogLog {
  val M = 64          // registers; Alpha below is α₆₄ — change them together
  val MaxRho = 45     // 44 hashed bits all zero → rho = 45
  /** α₆₄ from the HLL paper; valid ONLY for m=64 (α is m-dependent). */
  val Alpha = 0.709
  assert(M == 64, "Alpha is α_64: pick the matching α when changing M")

  /** (bucket, rho) packed as bucket·64 + rho, as a pure column expression
    * over an md5-hex column (codegen'd; the aggregator input). */
  def packedCell(md5Hex: Column): Column = {
    val bucket = conv(substring(md5Hex, 1, 2), 16, 10).cast("int") % M
    val tail = substring(md5Hex, 3, 11)
    val z = length(regexp_extract(tail, "^0*", 0))
    val nib = tail.substr(z + lit(1), lit(1))
    val nibLz = when(nib.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
      .when(nib.isin("4", "5", "6", "7"), 1)
      .when(nib.isin("2", "3"), 2)
      .otherwise(3)
    val rho = when(z === 11, MaxRho).otherwise(z * 4 + nibLz + 1)
    (bucket * lit(M) + rho).cast("long")
  }

  /** [[packedCell]] over a 60-bit truncated md5 hash (the `h60` carried
    * by [[MinhashSigSet]]'s shset: first 15 md5 hex chars as a BIGINT).
    * Hex chars 1..13 — all the bits [[packedCell]] inspects — live in
    * h60's top 52 bits, so the two spellings derive the SAME cell from
    * the same md5; this one replaces per-row string substr/regexp work
    * with four integer ops and a leading-zero count. Pinned equal to
    * packedCell in HyperLogLogSpec. */
  def packedCellFromH60(h60: Column): Column =
    graft.functions.HllCellFromH60(h60)

  /** The Aggregator: packed (bucket, rho) cells in, m registers out. */
  val sketch: Aggregator[Long, Array[Int], Seq[Int]] =
    new Aggregator[Long, Array[Int], Seq[Int]] {
      override def zero: Array[Int] = new Array[Int](M)
      override def reduce(buf: Array[Int], packed: Long): Array[Int] = {
        val b = (packed / M).toInt
        val r = (packed % M).toInt
        if (r > buf(b)) buf(b) = r
        buf
      }
      override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
        var i = 0
        while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
        a
      }
      override def finish(buf: Array[Int]): Seq[Int] = buf.toIndexedSeq
      override def bufferEncoder: Encoder[Array[Int]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
      override def outputEncoder: Encoder[Seq[Int]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]()
    }

  /** Column spelling: aggregates packed cells to the register array. */
  def hllAgg(packed: Column): Column = udaf(sketch).apply(packed)

  /** Cardinality estimate from a register-array column. 2^(−Mⱼ) is spelled
    * 1.0 / (1L << Mⱼ) — exact in both engines (no pow/exp). */
  def estimate(registers: Column): Column =
    (lit(Alpha) * lit((M * M).toDouble)) /
      aggregate(registers, lit(0.0),
        (acc, r) => acc + lit(1.0) /
          call_function("shiftleft", lit(1L), r).cast("double"))
}
