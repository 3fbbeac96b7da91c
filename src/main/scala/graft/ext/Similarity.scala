package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exactness baseline, random-hyperplane
  * LSH bucketing as the scale path, and embedding-cosine near-dup.
  * Extension surface beyond the reference (SURVEY.md §7.2 step 6).
  *
  * Determinism contract: embeddings are QUANTIZED to integers
  * (round(x·10⁶) as BIGINT — the int8/int16 quantization standard in ANN
  * systems, taken to int64 here) so dot products are exact integer
  * arithmetic, bit-identical between Spark and the DuckDB oracle. The dot
  * fits comfortably: 64 dims × (10⁶)² ≈ 2^47 < 2^53 also keeps the double
  * cast exact. Cosine = dot / (√|a|·√|b|) — IEEE sqrt/division are
  * correctly rounded, so identical doubles on identical integers.
  *
  * Scale design: brute-force is O(queries × corpus) — fine for a bounded
  * query set against any corpus (the corpus side streams; the query side
  * broadcasts), wrong for all-pairs. The LSH path buckets both sides so
  * candidate generation is linear, with multiprobe (hamming-1 buckets) to
  * recover recall.
  */
object Similarity {

  /** Quantize a float-array embedding to exact integers (×10⁶) — native
    * expression ([[graft.functions.QuantizeVec]]), one loop per vector;
    * semantics identical to the HOF spelling
    * `transform(emb, x => round(x.cast("double") * 1e6).cast("long"))`
    * (differential spec in SimilaritySpec). */
  def quantize(emb: Column): Column = graft.functions.QuantizeVec(emb)

  /** Exact integer dot product of two quantized vectors — a native
    * codegen expression ([[graft.functions.LongDotProduct]]): the
    * built-in `aggregate(zip_with(...))` spelling interprets the lambda
    * per element, which dominates all-pairs similarity joins. */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.LongDotProduct(a, b)

  /** Euclidean norm of a quantized vector, as double. */
  def normQ(a: Column): Column = sqrt(dotQ(a, a).cast("double"))

  /** (id, qv, nrm) projection: quantized vector + precomputed norm, so
    * the per-pair work in a join is one dot product, not three. Fans a
    * degenerate single-partition source out first so the downstream
    * vector math parallelizes (no-op at scale). */
  def prepared(df: DataFrame, idCol: String, embCol: String): DataFrame =
    graft.util.Partitioning.fanOut(df)
      .select(col(idCol).as("id"), quantize(col(embCol)).as("qv"))
      .withColumn("nrm", normQ(col("qv")))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), ranked by (cosine desc, id).
    * The query side is broadcast — the corpus never shuffles. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm"))
    val c = corpus.select(col("id").as("neighbor_id"), col("qv").as("n_qv"), col("nrm").as("n_nrm"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        (dotQ(col("q_qv"), col("n_qv")).cast("double") /
          (col("q_nrm") * col("n_nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Embedding near-dup, all-pairs spelling: pairs (a<b) with cosine ≥
    * threshold via an explicit cross join. O(n²) — retained ONLY as the
    * exactness baseline for [[nearDupPairs]]' equivalence spec; the
    * production/verified path is the blocked variant below. */
  def nearDupPairsExact(prep: DataFrame, threshold: Double): DataFrame = {
    val a = prep.select(col("id").as("id_a"), col("qv").as("qv_a"), col("nrm").as("nrm_a"))
    val b = prep.select(col("id").as("id_b"), col("qv").as("qv_b"), col("nrm").as("nrm_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dotQ(col("qv_a"), col("qv_b")).cast("double") /
          (col("nrm_a") * col("nrm_b"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Embedding near-dup, LSH-blocked: candidates come from an EQUI-JOIN on
    * a random-hyperplane bucket id (own bucket on one side, own +
    * multiprobe buckets up to hamming-`probeDepth` on the other), then
    * exact cosine verifies. No dedup pass is needed: the own side
    * carries ONE bucket per row and a row's probe buckets are distinct
    * values (XOR with distinct masks), so each ordered (id_a < id_b)
    * pair can meet on at most one bucket — a trailing distinct was a
    * full identity exchange (the same class annTopK removed). No
    * CartesianProduct / BroadcastNestedLoopJoin anywhere in the plan
    * (gated by PlanSpec).
    *
    * Cost: candidate volume ≈ n²·(probe fan-out)/2^numPlanes of the cross
    * join's n² — the reduction is exponential in numPlanes while probe
    * fan-out grows only polynomially (1+numPlanes at depth 1, +C(numPlanes,2)
    * at depth 2), so at 100 TB you raise numPlanes ~log₂(n) and the join
    * stays linear per bucket.
    *
    * Recall at high thresholds: a pair is missed only if > probeDepth of
    * the numPlanes hyperplanes separate it. At threshold 0.99 the angle is
    * ≤8.1°, so each plane separates with p≈0.045 — miss ≈ 5% at depth 1,
    * ≈ 0.5% at the default depth 2 — and true duplicates (identical
    * vectors) have identical codes, i.e. can never be missed. This is an
    * APPROXIMATE operator for non-identical near-dups; for exact results
    * use [[nearDupPairsExact]] on a pre-blocked partition, and see
    * SimilaritySpec's planted-perturbation recall spec for the measured
    * behavior. */
  def nearDupPairs(
      prep: DataFrame, threshold: Double, numPlanes: Int = 8,
      dim: Int = 0, probeDepth: Int = 2): DataFrame = {
    val d0 =
      if (dim > 0) dim
      // probe the first USABLE vector: a NULL or zero-length first row
      // must not NPE / silently empty a corpus that has real embeddings
      else prep.filter(col("qv").isNotNull && size(col("qv")) > 0)
        .select(size(col("qv")).as("d")).take(1)
        .headOption.map(_.getInt(0)).getOrElse(0)
    if (d0 == 0)
      // No usable vectors at all (or empty input): no pairs — return an
      // empty frame with the output schema instead of throwing.
      return prep.select(col("id").as("id_a"), col("id").as("id_b"),
        lit(0.0).as("cosine")).limit(0)
    val ps = planes(numPlanes, d0)
    val withB = prep.withColumn("bucket",
      graft.functions.HyperplaneBucket(col("qv"), ps))
    val own = withB.select(col("bucket"),
      col("id").as("id_a"), col("qv").as("qv_a"), col("nrm").as("nrm_a"))
    val probe = withB
      .withColumn("bucket", explode(probeBuckets(col("bucket"), numPlanes, probeDepth)))
      .select(col("bucket"),
        col("id").as("id_b"), col("qv").as("qv_b"), col("nrm").as("nrm_b"))
    own.join(probe, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dotQ(col("qv_a"), col("qv_b")).cast("double") /
          (col("nrm_a") * col("nrm_b"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // ---------------------------------------------------------------------
  // LSH scale path (Spark-only surface; verified by recall spec, not SQL)
  // ---------------------------------------------------------------------

  /** Integer form of the deterministic hyperplane weights: value (p,d)
    * derived from md5 of "p,d" in [-1000, 1000]. Exposed so oracle SQL
    * can embed the exact constants and divide by 1000.0 itself — the
    * division is then the identical IEEE op in both engines. */
  def planeInts(numPlanes: Int, dim: Int): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dim) { (p, d) =>
      val h = md.digest(s"$p,$d".getBytes("UTF-8"))
      val v = ((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff)
      v % 2001 - 1000
    }
  }

  /** Deterministic random hyperplanes: weight (p,d) derived from md5 of
    * "p,d" — reproducible across runs and JVMs, no RNG state. */
  def planes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    planeInts(numPlanes, dim).map(_.map(_ / 1000.0))

  /** Random-hyperplane LSH bucket id in [0, 2^numPlanes): bit p is the
    * sign of x·plane_p. Pure column expression — codegen, no UDF. */
  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (w, p) =>
      val lw = array(w.toIndexedSeq.map(lit): _*)
      val proj = aggregate(
        zip_with(emb, lw, (x, wi) => x.cast("double") * wi),
        lit(0.0), (s, v) => s + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multiprobe bucket set: own bucket + all hamming-1 flips (and, at
    * probeDepth=2, all hamming-2 flips), as an array column to explode on
    * the probe side. Depth trades candidate volume for recall: at
    * threshold 0.99 a pair is missed only when > probeDepth of the
    * numPlanes hyperplanes separate it — ~5% for depth 1, ~0.5% for
    * depth 2 at 8 planes (identical vectors are never missed at any
    * depth: identical codes always collide). */
  def probeBuckets(bucket: Column, numPlanes: Int, probeDepth: Int = 1): Column = {
    require(probeDepth == 1 || probeDepth == 2,
      s"probeBuckets: probeDepth must be 1 or 2, got $probeDepth")
    val flips1 = (0 until numPlanes).map(p => 1L << p)
    val flips2 =
      if (probeDepth < 2) Seq.empty
      else for {
        p <- 0 until numPlanes; r <- p + 1 until numPlanes
      } yield (1L << p) | (1L << r)
    array(bucket +: (flips1 ++ flips2).map(m => bucket.bitwiseXOR(lit(m))): _*)
  }

  /** Approximate top-k: queries probe their own + hamming-1 LSH buckets;
    * candidates shuffle on bucket id (linear), exact cosine re-ranks.
    * Recall tunes with numPlanes (fewer planes → bigger buckets →
    * higher recall, more work).
    *
    * `dim` is the embedding dimensionality; pass it explicitly or leave 0
    * to derive it from the first corpus row (one tiny setup job). Getting
    * it wrong is not a silent degradation: a short plane vector would
    * null-pad every projection and collapse all buckets to one, so the
    * derivation/explicit parameter is load-bearing. */
  def annTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, embCol: String,
      k: Int, numPlanes: Int = 4, dim: Int = 0): DataFrame = {
    val d0 =
      if (dim > 0) dim
      else corpus.filter(col(embCol).isNotNull && size(col(embCol)) > 0)
        .select(size(col(embCol)).as("d")).take(1)
        .headOption.map(_.getInt(0)).getOrElse(0)
    if (d0 == 0)
      // Empty corpus: no neighbors for any query — empty frame with the
      // output schema instead of throwing.
      return prepared(queries, idCol, embCol)
        .select(col("id").as("query_id"), lit(1).as("rank"),
          col("id").as("neighbor_id"), lit(0.0).as("cosine")).limit(0)
    val ps = planes(numPlanes, d0)
    val c = prepared(corpus, idCol, embCol)
      .withColumn("bucket", graft.functions.HyperplaneBucket(col("qv"), ps))
      .select(col("id").as("neighbor_id"), col("qv").as("n_qv"),
        col("nrm").as("n_nrm"), col("bucket"))
    val q = prepared(queries, idCol, embCol)
      .withColumn("bucket",
        explode(probeBuckets(
          graft.functions.HyperplaneBucket(col("qv"), ps), numPlanes)))
      .select(col("id").as("query_id"), col("qv").as("q_qv"),
        col("nrm").as("q_nrm"), col("bucket"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
    // no (query, neighbor) dedup aggregate: each corpus vector hashes to
    // exactly ONE bucket and the query's probe set is distinct, so a
    // pair can only meet once — the defensive groupBy(max) was a full
    // extra exchange for an identity
    // no forced broadcast here: `queries` is caller-supplied and may be
    // corpus-sized — the shuffle join degrades gracefully at 100 TB
    // where a broadcast hint would OOM the driver. Callers with a
    // BOUNDED query set hint it themselves (broadcast(queries), x15) —
    // the hint survives the projections above and reaches the join.
    c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotQ(col("q_qv"), col("n_qv")).cast("double") /
          (col("q_nrm") * col("n_nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  // ---------------------------------------------------------------------
  // IVF scale path: coarse quantizer + inverted lists
  // ---------------------------------------------------------------------

  /** A trained IVF coarse centroid: inverted-list id, quantized vector,
    * precomputed norm. The full centroid table is O(√n) rows — driver- and
    * broadcast-sized by design (FAISS ships the same object to every
    * search worker). */
  final case class IvfCentroid(listId: Int, qv: Seq[Long], nrm: Double)

  /** Train the IVF coarse quantizer: `nLists` centroids chosen
    * deterministically (the nLists lowest corpus rows in md5(id)-order —
    * a content-independent uniform sample that works for ANY id space; a
    * mod-step sample returns ZERO centroids when ids share a residue
    * class). orderBy+limit plans TakeOrderedAndProject: per-partition
    * top-k then a driver merge of nLists rows — no global sort funnels
    * the corpus through one partition. The only window runs over the
    * ≤nLists sampled rows. This is also the k-means INIT:
    * [[trainIvfKmeans]] refines it with distributed Lloyd's rounds;
    * everything downstream is unchanged either way. Train ONCE per
    * corpus snapshot (cache via [[graft.io.ArtifactCache]]) —
    * retraining per query re-scans the corpus for an identical
    * result. */
  def trainIvfCentroids(
      corpus: DataFrame, idCol: String, embCol: String,
      nLists: Int = 16): Seq[IvfCentroid] = {
    val c = prepared(corpus, idCol, embCol)
    val centOrd = Seq(md5(col("id").cast("string")), col("id"))
    // list_id = rank in md5 order, assigned DRIVER-side: orderBy+limit
    // plans TakeOrderedAndProject whose collect() returns the ≤nLists
    // rows already in order, so zipWithIndex numbers them without the
    // unpartitioned row_number window a distributed numbering would need
    // (≤nLists rows either way, but the window emitted a WindowExec
    // single-partition warning per training call)
    c.orderBy(centOrd: _*).limit(nLists)
      .select(col("qv"), col("nrm"))
      .collect()
      .zipWithIndex
      .map { case (r, i) => IvfCentroid(i, r.getSeq[Long](0), r.getDouble(1)) }
      .toIndexedSeq
  }

  /** Exact round-half-up of s/n on integers (n > 0): the ONE rounding
    * rule the k-means mean uses, spelled in pure int64 arithmetic so the
    * SQL oracle can reproduce it bit-for-bit (no float round() whose tie
    * behavior differs subtly between engines). */
  private[ext] def roundDiv(s: Long, n: Long): Long =
    Math.floorDiv(2 * s + n, 2 * n)

  /** Distributed Lloyd's k-means refinement of the IVF coarse quantizer.
    *
    * Init is the deterministic md5-order sample ([[trainIvfCentroids]]);
    * each of the `rounds` iterations then runs
    *   (a) ASSIGN — every corpus vector picks its nearest centroid by
    *       cosine (tie-break list_id) via the broadcast-literal
    *       [[nearestLists]] expression: pure map-side, the corpus never
    *       shuffles for assignment;
    *   (b) UPDATE — per-list per-dimension means as one
    *       map-side-combinable groupBy producing nLists×(dim+1) partial
    *       aggregates; only ≤nLists tiny rows reach the driver.
    * New centroids are re-quantized to the 1e-6 integer grid
    * ([[roundDiv]] per dimension — exact integer round-half-up), which
    * keeps every subsequent dot product exact int64 and the whole
    * training loop bit-reproducible by the DuckDB oracle. A list that
    * attracts no vectors keeps its previous centroid (the standard
    * empty-cluster rule, and the deterministic one).
    *
    * Cost per round at 100 TB: one corpus scan + an nLists-row shuffle —
    * linear, no quadratic stage; rounds is a small constant (FAISS-style
    * coarse quantizers converge in a few iterations, and the inverted
    * lists only need balanced-ish cells, not converged ones). */
  def trainIvfKmeans(
      corpus: DataFrame, idCol: String, embCol: String,
      nLists: Int = 16, rounds: Int = 2): Seq[IvfCentroid] = {
    // Regime-dispatched training (the repo-wide measured-size pattern):
    // a driver-small corpus trains in local arrays off ONE collect job —
    // the per-round Spark jobs (assign scan + tiny shuffle + collect)
    // are pure launch overhead at fixture scale. The arithmetic is the
    // SAME integer loop either way (IvfNearestLists.compute for the
    // assignment, long sums, roundDiv means), long addition is
    // order-free, and SimilaritySpec pins driver == distributed
    // centroid-for-centroid. Above the bound the distributed rounds run
    // exactly as before — one corpus scan + an nLists-row shuffle each.
    collectTrainRows(prepared(corpus, idCol, embCol), "ivf-train") match {
      case Some(rows) => kmeansDriver(rows, nLists, rounds)
      case None => trainIvfKmeansDistributed(corpus, idCol, embCol, nLists, rounds)
    }
  }

  private def trainIvfKmeansDistributed(
      corpus: DataFrame, idCol: String, embCol: String,
      nLists: Int, rounds: Int): Seq[IvfCentroid] = {
    val init = trainIvfCentroids(corpus, idCol, embCol, nLists)
    if (init.isEmpty) return init
    val dim = init.head.qv.size
    val c = prepared(corpus, idCol, embCol)
    (1 to rounds).foldLeft(init) { (cents, _) =>
      val sums = (0 until dim).map(i =>
        sum(element_at(col("qv"), i + 1)).as(s"d$i"))
      val agg = c.withColumn("list_id", explode(nearestLists(cents, 1)))
        .groupBy("list_id")
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
        .map(r => r.getInt(0) -> r).toMap
      cents.map { old =>
        agg.get(old.listId).fold(old) { r =>
          val n = r.getLong(1)
          val qv = (0 until dim).map(i => roundDiv(r.getLong(i + 2), n))
          // exact int64 self-dot, then the same sqrt-of-double as normQ
          val nrm = math.sqrt(qv.map(v => v * v).sum.toDouble)
          IvfCentroid(old.listId, qv, nrm)
        }
      }
    }
  }

  /** One training row collected to the driver: (md5(id) hex, id, qv,
    * nrm) — md5 computed by SPARK in the collected projection so the
    * driver-side seed order is the engine's own, never a reimplementation. */
  private final case class TrainRow(
      h: String, id: Long, qv: Array[Long], nrm: Double)

  /** The corpus's prepared rows iff it holds at most
    * [[graft.io.Regime.collectMaxRows]] of them, else None (train
    * distributed). Decision recorded under `key` for observability —
    * the scale soak's forced-bound audit covers training dispatch too.
    * The byte cap deliberately does NOT apply: the rows are transient
    * training input (≤8192 × ~0.5 KB ≈ 4 MB, dropped after training),
    * not a cached artifact.
    *
    * Non-integral id columns dispatch distributed unconditionally: the
    * driver tiebreak sorts (md5 hex, id AS LONG), and a long cast of a
    * string id would be NULL (a crash, or a wrong seed order) — the
    * distributed path orders by the id's own type and served such
    * corpora before this regime existed. md5-hex ties between DISTINCT
    * ids do not occur in practice; DUPLICATE ids tie exactly and
    * resolve in collect order here vs TakeOrdered's arbitrary order
    * there — but a corpus with duplicate ids already violates the
    * trainers' determinism contract (md5(id)-order sampling presumes id
    * is the corpus key), so neither regime is deterministic for it. */
  private def collectTrainRows(
      prep: DataFrame, key: String): Option[IndexedSeq[TrainRow]] = {
    val integralId = prep.schema("id").dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => true
      case _ => false
    }
    if (!integralId) {
      graft.io.Regime.lastDecision.put(key, "distributed")
      return None
    }
    val bound = graft.io.Regime.collectMaxRows
    val probe = prep
      .select(md5(col("id").cast("string")).as("h"),
        col("id").cast("long").as("id"), col("qv"), col("nrm"))
      .limit(bound + 1).collect()
    val fits = probe.length <= bound
    graft.io.Regime.lastDecision.put(key, if (fits) "collected" else "distributed")
    if (!fits) None
    else Some(probe.iterator.map(r => TrainRow(r.getString(0), r.getLong(1),
      r.getSeq[Long](2).toArray, r.getDouble(3))).toIndexedSeq)
  }

  /** Driver-side Lloyd's over collected rows — the exact arithmetic of
    * the distributed rounds: seed = nLists lowest (md5, id) rows,
    * assignment through the SAME [[graft.functions.IvfNearestLists]]
    * compute loop, per-list long sums (order-free), [[roundDiv]] means,
    * empty list keeps its centroid. */
  private def kmeansDriver(
      rows: IndexedSeq[TrainRow], nLists: Int, rounds: Int): Seq[IvfCentroid] = {
    val seed = rows.sortBy(r => (r.h, r.id)).take(nLists)
    val init = seed.zipWithIndex
      .map { case (r, i) => IvfCentroid(i, r.qv.toIndexedSeq, r.nrm) }
    if (init.isEmpty) return init
    val dim = init.head.qv.size
    (1 to rounds).foldLeft(init: Seq[IvfCentroid]) { (cents, _) =>
      val ids = cents.map(_.listId).toArray
      val flat = cents.flatMap(_.qv).toArray
      val nrms = cents.map(_.nrm).toArray
      val sums = Array.ofDim[Long](nLists, dim)
      val counts = new Array[Long](nLists)
      rows.foreach { r =>
        val lid = graft.functions.IvfNearestLists.compute(
          org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
            .fromPrimitiveArray(r.qv),
          r.nrm, ids, flat, nrms, dim, 1).getInt(0)
        counts(lid) += 1
        var i = 0
        while (i < dim) { sums(lid)(i) += r.qv(i); i += 1 }
      }
      cents.map { old =>
        if (counts(old.listId) == 0L) old
        else {
          val n = counts(old.listId)
          val qv = (0 until dim).map(i => roundDiv(sums(old.listId)(i), n))
          IvfCentroid(old.listId, qv, math.sqrt(qv.map(v => v * v).sum.toDouble))
        }
      }
    }
  }

  /** Top-`keep` nearest centroid list ids for the current row's
    * (`qv`, `nrm`), as a pure map-side expression over the trained
    * centroids — the FAISS assignment shape: centroids live in memory on
    * every worker, each vector scores all of them locally and keeps the
    * best. Zero shuffle, no join. Ordering (cosine desc, list_id asc) is
    * spelled as an ascending struct sort on (−cosine, list_id): negation
    * is IEEE-exact, so the ranking is identical to the windowed argmax it
    * replaces (−0.0 sorts before +0.0 in struct order, but a zero dot
    * always yields the same one of the two on both spellings). */
  private def nearestLists(cent: Seq[IvfCentroid], keep: Int): Column = {
    // native expression, not an unrolled literal struct array: the
    // declarative spelling rebuilt an O(nLists·dim) literal tree per
    // construction (0.25 s of Catalyst walk at 16×64) and sorted 16
    // interpreted structs per row — see IvfNearestLists
    val dim = if (cent.isEmpty) 0 else cent.head.qv.size
    graft.functions.IvfNearestLists(
      col("qv"), col("nrm"),
      cent.map(_.listId), cent.flatMap(_.qv), cent.map(_.nrm), dim, keep)
  }

  /** IVF search against a pre-trained coarse quantizer: each corpus
    * vector joins its inverted list, each query probes its `nProbe`
    * nearest lists, exact cosine ranks the candidates. Assignment is
    * map-side ([[nearestLists]]) — the corpus never shuffles for it; the
    * only exchanges are the candidate equi-join on the
    * (small-cardinality) list id and the final per-query top-k window.
    *
    * At 100 TB: centroids stay O(√n) and in-memory, index assignment is
    * one scan, and search cost is corpus/nLists × nProbe per query —
    * linear, tunable recall/cost via nProbe, no quadratic stage anywhere.
    */
  def ivfTopKIndexed(
      queries: DataFrame, corpus: DataFrame, idCol: String, embCol: String,
      k: Int, centroids: Seq[IvfCentroid], nProbe: Int = 4): DataFrame = {
    if (centroids.isEmpty)
      // untrained/empty corpus: no neighbors for any query — empty frame
      // with the output schema instead of throwing
      return prepared(queries, idCol, embCol)
        .select(col("id").as("query_id"), lit(1).as("rank"),
          col("id").as("neighbor_id"), lit(0.0).as("cosine")).limit(0)
    val indexed = prepared(corpus, idCol, embCol)
      .withColumn("list_id", explode(nearestLists(centroids, 1)))
      .select(col("list_id"), col("id").as("neighbor_id"),
        col("qv").as("n_qv"), col("nrm").as("n_nrm"))
    val probing = prepared(queries, idCol, embCol)
      .withColumn("list_id", explode(nearestLists(centroids, nProbe)))
      .select(col("list_id"), col("id").as("query_id"),
        col("qv").as("q_qv"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
    // no (query, neighbor) dedup aggregate: corpus vectors index into
    // exactly ONE list (keep=1) and a query's nProbe list ids are
    // distinct by construction, so each pair meets once — the defensive
    // groupBy(max) was a full extra exchange for an identity
    // no forced broadcast (see annTopK): bounded-query callers hint at
    // the call site (x16); a corpus-sized probe side must keep the
    // shuffle join
    indexed.join(probing, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotQ(col("q_qv"), col("n_qv")).cast("double") /
          (col("q_nrm") * col("n_nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** IVF top-k, self-contained spelling: trains the coarse quantizer on
    * `corpus` and searches it in one call. Amortizing callers (a session
    * serving many queries against one corpus snapshot) should train once
    * via [[trainIvfCentroids]] and call [[ivfTopKIndexed]]. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, embCol: String,
      k: Int, nLists: Int = 16, nProbe: Int = 4): DataFrame =
    ivfTopKIndexed(queries, corpus, idCol, embCol, k,
      trainIvfCentroids(corpus, idCol, embCol, nLists), nProbe)

  /** Map-side cluster assignment over a [[prepared]] frame: (id,
    * list_id) — each vector's nearest centroid by cosine (tie-break
    * list_id), zero shuffle. The building block [[semDedupPairs]] and
    * cluster-balanced resampling share. */
  def assignClusters(prep: DataFrame, centroids: Seq[IvfCentroid]): DataFrame =
    prep.withColumn("list_id", explode(nearestLists(centroids, 1)))
      .select(col("id"), col("list_id"))

  // ---------------------------------------------------------------------
  // IVFPQ: product-quantized codes in the inverted lists
  // ---------------------------------------------------------------------

  /** A trained PQ codebook set: flat layout
    * `cb[(i*ksub + j)*subDim + d]` (sub-space i, codeword j, dim d) plus
    * the shape. Total size m·ksub·subDim longs — driver- and
    * plan-literal-sized by design (FAISS ships the same table to every
    * worker). */
  final case class PqCodebooks(cb: Seq[Long], m: Int, ksub: Int, subDim: Int) {
    def selfDots: Seq[Long] =
      graft.functions.PqShared.selfDots(cb.toArray, m, ksub, subDim).toSeq
  }

  /** Train PQ sub-quantizers (Jégou et al. 2011) over the corpus, fully
    * deterministic and oracle-reproducible:
    *   - INIT: the ksub lowest corpus rows in md5(id)-order seed EVERY
    *     sub-space with their slices (one sample, m seedings);
    *   - each round ASSIGNS every vector's every sub-slice to its
    *     nearest codeword by the EXACT integer L2 surrogate
    *     ‖c‖² − 2·x·c (map-side native [[graft.functions.PqEncode]] —
    *     the corpus never shuffles for assignment) and UPDATES codewords
    *     as per-(sub-space, code) per-dim means via ONE
    *     map-side-combinable groupBy producing m·ksub tiny rows
    *     ([[roundDiv]] re-quantizes to the integer grid — every later
    *     dot stays exact int64); an empty cell keeps its codeword.
    *
    * Cost per round at 100 TB: one corpus scan + an m·ksub-row shuffle —
    * the same linear shape as [[trainIvfKmeans]]. */
  def trainPqCodebooks(
      corpus: DataFrame, idCol: String, embCol: String,
      m: Int = 8, ksub: Int = 16, rounds: Int = 2): PqCodebooks = {
    // same regime dispatch as [[trainIvfKmeans]]: driver-small corpora
    // train in local arrays off one collect (the PQ assignment loop is
    // the SAME [[graft.functions.PqShared.encodeArr]] the expression
    // row path runs); SimilaritySpec pins driver == distributed
    // codebook-for-codebook
    collectTrainRows(prepared(corpus, idCol, embCol), "pq-train") match {
      case Some(rows) => pqDriver(rows, m, ksub, rounds)
      case None =>
        trainPqCodebooksDistributed(corpus, idCol, embCol, m, ksub, rounds)
    }
  }

  /** Driver-side PQ training over collected rows — the distributed
    * rounds' exact arithmetic (same seed order, same encode loop, same
    * long sums and [[roundDiv]] means, empty cell keeps its codeword). */
  private def pqDriver(
      rows: IndexedSeq[TrainRow], m: Int, ksub: Int, rounds: Int): PqCodebooks = {
    val seed = rows.sortBy(r => (r.h, r.id)).take(ksub).map(_.qv.toSeq)
    require(seed.nonEmpty, "trainPqCodebooks: empty corpus")
    val dim = seed.head.size
    require(dim % m == 0,
      s"trainPqCodebooks: dim $dim not divisible into $m sub-spaces")
    val subDim = dim / m
    val init: Array[Long] = Array.tabulate(m * ksub * subDim) { x =>
      val d = x % subDim
      val j = (x / subDim) % ksub
      val i = x / (subDim * ksub)
      seed(j % seed.size)(i * subDim + d)
    }
    (1 to rounds).foldLeft(PqCodebooks(init.toSeq, m, ksub, subDim)) { (cbs, _) =>
      val cbArr = cbs.cb.toArray
      val self = graft.functions.PqShared.selfDots(cbArr, m, ksub, subDim)
      val sums = Array.ofDim[Long](m * ksub, subDim)
      val counts = new Array[Long](m * ksub)
      rows.foreach { r =>
        val codes = graft.functions.PqShared.encodeArr(
          r.qv, cbArr, self, m, ksub, subDim)
        var i = 0
        while (i < m) {
          val cell = i * ksub + codes(i)
          counts(cell) += 1
          var d = 0
          while (d < subDim) { sums(cell)(d) += r.qv(i * subDim + d); d += 1 }
          i += 1
        }
      }
      val next = cbs.cb.toArray
      for (i <- 0 until m; j <- 0 until ksub; if counts(i * ksub + j) > 0L) {
        val n = counts(i * ksub + j)
        for (d <- 0 until subDim)
          next((i * ksub + j) * subDim + d) = roundDiv(sums(i * ksub + j)(d), n)
      }
      cbs.copy(cb = next.toSeq)
    }
  }

  private def trainPqCodebooksDistributed(
      corpus: DataFrame, idCol: String, embCol: String,
      m: Int, ksub: Int, rounds: Int): PqCodebooks = {
    val prep = prepared(corpus, idCol, embCol)
    val seed = prep.orderBy(md5(col("id").cast("string")), col("id"))
      .limit(ksub)
      .select(col("qv")).collect().map(_.getSeq[Long](0))
    require(seed.nonEmpty, "trainPqCodebooks: empty corpus")
    val dim = seed.head.size
    require(dim % m == 0,
      s"trainPqCodebooks: dim $dim not divisible into $m sub-spaces")
    val subDim = dim / m
    // ksub codewords per sub-space; a short corpus pads by cycling the
    // sample (deterministic; duplicate codewords are harmless — argmin
    // tie-break picks the smaller code)
    val init: Array[Long] = Array.tabulate(m * ksub * subDim) { x =>
      val d = x % subDim
      val j = (x / subDim) % ksub
      val i = x / (subDim * ksub)
      seed(j % seed.size)(i * subDim + d)
    }
    (1 to rounds).foldLeft(PqCodebooks(init.toSeq, m, ksub, subDim)) { (cbs, _) =>
      val sums = (0 until subDim).map(d =>
        sum(element_at(col("qv"), col("m") * subDim + d + 1)).as(s"d$d"))
      val agg = prep
        .withColumn("codes", graft.functions.PqEncode(
          col("qv"), cbs.cb, m, ksub, subDim))
        .select(col("qv"), posexplode(col("codes")).as(Seq("m", "code")))
        .groupBy("m", "code")
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
      val next = cbs.cb.toArray
      for (i <- 0 until m; j <- 0 until ksub) agg.get((i, j)).foreach { r =>
        val n = r.getLong(2)
        for (d <- 0 until subDim)
          next((i * ksub + j) * subDim + d) = roundDiv(r.getLong(d + 3), n)
      }
      cbs.copy(cb = next.toSeq)
    }
  }

  /** IVFPQ search (the FAISS IVFPQ shape): the IVF coarse quantizer
    * routes vectors to inverted lists as in [[ivfTopKIndexed]], but the
    * lists carry PQ CODES (m small ints ≈ m bytes) instead of full
    * quantized vectors — at 100 TB the inverted lists shrink by
    * 8·dim/m ≈ 64× and candidate scoring touches no vector data at all:
    * each query precomputes ONE m·ksub ADC table map-side
    * ([[graft.functions.PqDistTable]]) and every candidate pair costs
    * O(m) table lookups ([[graft.functions.PqAdcSum]]). The approximate
    * cosine is `adc / (‖q‖ · ‖ĉ‖)` with ĉ the reconstructed codeword
    * norm (self-dot lookups through the same ADC sum against a LITERAL
    * table). Exact integer arithmetic throughout, so the DuckDB oracle
    * bit-matches the whole pipeline — training, codes, ADC, ranking. */
  def ivfpqTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, embCol: String,
      k: Int, centroids: Seq[IvfCentroid], cbs: PqCodebooks,
      nProbe: Int = 4): DataFrame = {
    if (centroids.isEmpty)
      return prepared(queries, idCol, embCol)
        .select(col("id").as("query_id"), lit(1).as("rank"),
          col("id").as("neighbor_id"), lit(0.0).as("cosine")).limit(0)
    val selfTable = typedLit(cbs.selfDots)
    val indexed = prepared(corpus, idCol, embCol)
      .withColumn("list_id", explode(nearestLists(centroids, 1)))
      .withColumn("codes", graft.functions.PqEncode(
        col("qv"), cbs.cb, cbs.m, cbs.ksub, cbs.subDim))
      .withColumn("n_hat", sqrt(graft.functions.PqAdcSum(
        selfTable, col("codes"), cbs.ksub).cast("double")))
      .select(col("list_id"), col("id").as("neighbor_id"),
        col("codes"), col("n_hat"))
    val probing = prepared(queries, idCol, embCol)
      .withColumn("list_id", explode(nearestLists(centroids, nProbe)))
      .withColumn("q_table", graft.functions.PqDistTable(
        col("qv"), cbs.cb, cbs.m, cbs.ksub, cbs.subDim))
      .select(col("list_id"), col("id").as("query_id"),
        col("q_table"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
    indexed.join(probing, Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (graft.functions.PqAdcSum(col("q_table"), col("codes"), cbs.ksub)
          .cast("double") / (col("q_nrm") * col("n_hat"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** Two-stage EXACT re-ranking over an ANN shortlist (the standard
    * production serving pattern for quantized indexes — FAISS's
    * "refine" stage): the compressed index (IVFPQ's ADC scores) selects
    * a shortlist of R candidates per query, then the ORIGINAL vectors
    * are gathered for exactly those |queries|·R pairs and re-scored with
    * the exact integer dot — ADC's reconstruction error can reorder
    * near-ties, and the refine stage restores exact top-k ordering
    * WITHIN the shortlist for the cost of R full-vector reads per query
    * instead of a corpus scan.
    *
    * Scale shape: the shortlist is bounded by the query workload
    * (|queries|·R id pairs), so it broadcasts; the corpus-side gather is
    * one broadcast-semi join — no corpus shuffle, no vector ever moves
    * except the R·|queries| gathered rows. Exact integer arithmetic, so
    * the oracle replays the rescoring bit-for-bit. */
  def rerankExact(
      queries: DataFrame, corpus: DataFrame, idCol: String, embCol: String,
      shortlist: DataFrame, k: Int): DataFrame = {
    val q = prepared(queries, idCol, embCol)
      .select(col("id").as("query_id"),
        col("qv").as("q_qv"), col("nrm").as("q_nrm"))
    val c = prepared(corpus, idCol, embCol)
      .select(col("id").as("neighbor_id"),
        col("qv").as("n_qv"), col("nrm").as("n_nrm"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))
    c.join(broadcast(shortlist.select("query_id", "neighbor_id")),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotQ(col("q_qv"), col("n_qv")).cast("double") /
          (col("q_nrm") * col("n_nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    * arXiv:2303.09540): assign every vector to its nearest coarse
    * centroid map-side ([[nearestLists]], keep=1 — zero shuffle for the
    * assignment), then compare pairs ONLY within a cluster and keep those
    * with cosine ≥ threshold. Output: (list_id, id_a, id_b, cosine),
    * id_a < id_b.
    *
    * At 100 TB this is the published trade: the within-cluster self-join
    * is quadratic per cluster but clusters are corpus/nLists sized — set
    * nLists ~ √n and total candidate volume stays ~n, vs n² all-pairs.
    * The clustering is also the operator's documented approximation: a
    * pair split across two clusters is never compared (byte-identical
    * vectors can never split — identical qv scores rank centroids
    * identically). The equi-join on list_id is gated by PlanSpec: no
    * CartesianProduct at any scale.
    *
    * Complements [[nearDupPairs]] (hyperplane-bucket blocking): LSH
    * buckets bound the MISS PROBABILITY per pair, IVF clusters bound the
    * CANDIDATE VOLUME per cluster — SemDeDup is the shape the published
    * pipeline runs at corpus scale. */
  def semDedupPairs(
      prep: DataFrame, centroids: Seq[IvfCentroid], threshold: Double): DataFrame = {
    if (centroids.isEmpty)
      return prep.select(lit(0).as("list_id"), col("id").as("id_a"),
        col("id").as("id_b"), lit(0.0).as("cosine")).limit(0)
    val assigned = prep.withColumn("list_id", explode(nearestLists(centroids, 1)))
    val a = assigned.select(col("list_id"), col("id").as("id_a"),
      col("qv").as("qv_a"), col("nrm").as("nrm_a"))
    val b = assigned.select(col("list_id"), col("id").as("id_b"),
      col("qv").as("qv_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("list_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("list_id"), col("id_a"), col("id_b"),
        (dotQ(col("qv_a"), col("qv_b")).cast("double") /
          (col("nrm_a") * col("nrm_b"))).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
