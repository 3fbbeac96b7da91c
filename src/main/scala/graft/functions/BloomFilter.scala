package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom filter as a custom typed Aggregator — the join-pruning sketch
  * next to [[CountMinSketch]] (frequency) and [[HyperLogLog]] (distinct).
  *
  * Use-case at 100 TB: a semi-join whose "small" side is too large to
  * broadcast as a hash set still fits as a 4096-bit (here; width is a
  * constant to keep the oracle SQL finite) filter — build it in one
  * mergeable aggregation, push `mightContain` into the probe side's scan
  * stage, and let the exact join run on the survivors. The filter never
  * drops a true match (no false negatives); false positives only cost
  * extra rows into the exact join. Spark's own runtime row-level
  * filtering does this implicitly; this operator makes the primitive
  * explicit, deterministic, and differentially testable.
  *
  * Determinism contract (shared with the DuckDB oracle, x29): two
  * Kirsch–Mitzenmacher double-hash families, bit position i =
  * (h1 + i·h2) mod 4096 for i in 0..3 (exact int64 arithmetic:
  * h1 + 3·h2 < 2³⁴). String keys: ONE md5 per value, h1 = first 8 hex
  * chars as int64, h2 = next 8 — one digest per probe row instead of K
  * keeps the membership test a cheap scan predicate. Integer keys: the
  * LCG family below — no digest at all, five integer ops per hash,
  * fully inside whole-stage codegen. Reduce sets bits, merge is bitwise
  * OR: associative, commutative, idempotent — partial aggregation with
  * a fixed 512-byte buffer.
  */
object BloomFilter {
  val Words = 64
  val Bits = Words * 64
  val K = 4

  /** Long-key double-hash family (integer keys — the join-pruning case).
    *
    * An md5 per probe row is digest-call + string-cast dominated; for
    * integer join keys a multiplicative family is the production choice
    * (Spark's own BloomFilterImpl uses Murmur3 on the long bits). The
    * family below is chosen to be EXACTLY reproducible in portable SQL:
    * every intermediate fits signed-64 for ANY int64 key (key is first
    * reduced mod the ~2³¹ prime, so A·k' ≤ 2³¹·2²⁴ < 2⁵⁵), so the same
    * five arithmetic ops run as Spark Column exprs (ANSI-safe, no
    * overflow), JVM longs, and DuckDB BIGINT SQL — no wrapping-multiply
    * semantics to emulate. h1/h2 use distinct primes P1/P2 so the two
    * streams decorrelate; bit position i = (h1 + i·h2) mod Bits as in
    * the string family.
    */
  val P1 = 2147483647L // 2^31 - 1 (prime)
  val P2 = 2147483629L // prime < P1
  val A1 = 1299721L
  val B1 = 104729L
  val A2 = 15485863L
  val B2 = 32452843L

  /** (h1, h2) of an int64 key — reference (driver/test) spelling. */
  def longHashes(k: Long): (Long, Long) = {
    val k1 = ((k % P1) + P1) % P1
    val k2 = ((k % P2) + P2) % P2
    ((A1 * k1 + B1) % P1, (A2 * k2 + B2) % P2)
  }

  /** bit position of hash i for an int64 key (long-key family). */
  def bitPosLong(i: Int, key: Long): Int = {
    val (h1, h2) = longHashes(key)
    ((h1 + i * h2) % Bits).toInt
  }

  /** SQL twin of [[longHashes]] — the oracle-side spelling (DuckDB
    * dialect-neutral: %, +, * on BIGINT only). `keyExpr` must already
    * be BIGINT-typed (CAST in the caller; 32-bit engines overflow on
    * INT32 multiply). */
  def longHashesSql(keyExpr: String): (String, String) = (
    // keyExpr parenthesized: a compound expression ('a + b') would
    // otherwise bind as a + (b % P1) under % precedence and the oracle
    // hashes would silently diverge from the Spark side
    s"($A1 * (((($keyExpr) % $P1) + $P1) % $P1) + $B1) % $P1",
    s"($A2 * (((($keyExpr) % $P2) + $P2) % $P2) + $B2) % $P2")

  /** bit position of hash i for a value (double-hash family). */
  def bitPos(i: Int, value: String): Int = {
    val md = Md5Hash60.md5()
    val h = md.digest(value.getBytes("UTF-8"))
    def u(b: Byte): Long = b & 0xffL
    val h1 = (u(h(0)) << 24) | (u(h(1)) << 16) | (u(h(2)) << 8) | u(h(3))
    val h2 = (u(h(4)) << 24) | (u(h(5)) << 16) | (u(h(6)) << 8) | u(h(7))
    ((h1 + i * h2) % Bits).toInt
  }

  /** The Aggregator: String in, 8 bit-words out. */
  val sketch: Aggregator[String, Array[Long], Seq[Long]] =
    new Aggregator[String, Array[Long], Seq[Long]] {
      override def zero: Array[Long] = new Array[Long](Words)
      override def reduce(buf: Array[Long], value: String): Array[Long] = {
        if (value != null) {
          val md = Md5Hash60.md5()
          val h = md.digest(value.getBytes("UTF-8"))
          def u(b: Byte): Long = b & 0xffL
          val h1 = (u(h(0)) << 24) | (u(h(1)) << 16) | (u(h(2)) << 8) | u(h(3))
          val h2 = (u(h(4)) << 24) | (u(h(5)) << 16) | (u(h(6)) << 8) | u(h(7))
          var i = 0
          while (i < K) {
            val p = ((h1 + i * h2) % Bits).toInt
            buf(p / 64) |= 1L << (p % 64)
            i += 1
          }
        }
        buf
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < Words) { a(i) |= b(i); i += 1 }
        a
      }
      override def finish(buf: Array[Long]): Seq[Long] = buf.toIndexedSeq
      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  /** The long-key Aggregator: int64 in, 8 bit-words out (LCG family). */
  val sketchLong: Aggregator[java.lang.Long, Array[Long], Seq[Long]] =
    new Aggregator[java.lang.Long, Array[Long], Seq[Long]] {
      override def zero: Array[Long] = new Array[Long](Words)
      override def reduce(buf: Array[Long], value: java.lang.Long): Array[Long] = {
        if (value != null) {
          val (h1, h2) = longHashes(value.longValue())
          var i = 0
          while (i < K) {
            val p = ((h1 + i * h2) % Bits).toInt
            buf(p / 64) |= 1L << (p % 64)
            i += 1
          }
        }
        buf
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < Words) { a(i) |= b(i); i += 1 }
        a
      }
      override def finish(buf: Array[Long]): Seq[Long] = buf.toIndexedSeq
      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  /** Column spelling: aggregates a string column to the bit words. */
  def bloomAgg(c: Column): Column = udaf(sketch).apply(c)

  /** Column spelling: aggregates an int64 key column to the bit words. */
  def bloomAggLong(c: Column): Column = udaf(sketchLong).apply(c)

  /** h1/h2 of an int64 key column — five integer ops each, stays inside
    * whole-stage codegen (vs one digest + hex-parse per row for the md5
    * family; that is the entire x29 Spark-vs-DuckDB gap closed). Same
    * projection guidance as [[probeHashes]]. */
  def probeHashesLong(probe: Column): (Column, Column) = {
    val k = probe.cast("long")
    val k1 = ((k % P1) + P1) % P1
    val k2 = ((k % P2) + P2) % P2
    ((lit(A1) * k1 + B1) % P1, (lit(A2) * k2 + B2) % P2)
  }

  /** h1/h2 double-hash projections of a probe column. PROJECT these to
    * real columns before filtering: a filter predicate that inlines them
    * re-evaluates the md5 once per reference (up to 2K times per row —
    * measured 5 s vs 0.5 s at 600k rows), while a projection boundary
    * evaluates each hash exactly once. */
  def probeHashes(probe: Column): (Column, Column) = {
    val h = md5(probe.cast("string"))
    (conv(substring(h, 1, 8), 16, 10).cast("long"),
      conv(substring(h, 9, 8), 16, 10).cast("long"))
  }

  /** Membership test over PRE-PROJECTED hash columns against DRIVER-HELD
    * bit words (the built filter is 512 bytes — collected once and
    * inlined as a literal, exactly how a pushed-down runtime filter ships
    * to the scan side; the probe plan stays broadcast-free). Pure column
    * arithmetic, codegen'd. */
  def mightContainHashes(bits: Seq[Long], h1: Column, h2: Column): Column = {
    require(bits.length == Words, s"expected $Words words, got ${bits.length}")
    (0 until K).map { i =>
      val pos = (h1 + lit(i.toLong) * h2) % Bits
      // pure integer bit ops: `/ 64` on Columns is DOUBLE division (a
      // cast→divide→cast chain per probe); Bits is a power of two, so
      // word = pos >> 6 and bit = pos & 63
      typedlit(bits).getItem(shiftright(pos, 6).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pos.bitwiseAND(lit(63L)).cast("int"))) =!= 0
    }.reduce(_ && _)
  }

  /** Convenience inline spelling for small frames; hot paths should
    * project [[probeHashes]] first (see note there). */
  def mightContain(bits: Seq[Long], probe: Column): Column = {
    val (h1, h2) = probeHashes(probe)
    mightContainHashes(bits, h1, h2)
  }

  /** Membership test against a bit-words ARRAY COLUMN (the built filter
    * carried as a broadcast one-row frame and cross-joined onto the probe
    * side). Same arithmetic as [[mightContainHashes]], but the filter
    * never touches the driver between build and probe — one Spark action
    * end-to-end, where the literal spelling needs an eager `.head()` job
    * per plan construction. Pure column arithmetic, codegen'd. */
  def mightContainBits(bits: Column, h1: Column, h2: Column): Column =
    (0 until K).map { i =>
      val pos = (h1 + lit(i.toLong) * h2) % Bits
      // integer word/bit split, as in mightContainHashes
      element_at(bits, shiftright(pos, 6).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pos.bitwiseAND(lit(63L)).cast("int"))) =!= 0
    }.reduce(_ && _)
}
