package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SquaredL2

/** Exact ε-neighborhood self-join over long-quantized vectors: every
  * unordered pair (idA < idB) with squared L2 distance <= `eps2`, with NO
  * all-pairs stage in the plan — the candidate generator is an EQUI-join
  * on pivot-ring keys, so Catalyst plans a hash/sort-merge join, never a
  * broadcast-nested-loop over n² pairs.
  *
  * Why this is EXACT (not a recall trade like [[SemDedup]]'s cell
  * bucketing): for any pivot p and points a, b the triangle inequality
  * gives |d(a,p) − d(b,p)| <= d(a,b). Bucket each point by
  * ring(x) = floor(d(x,p) / w) with ring width w = sqrt(eps2); then any
  * pair within ε sits in the SAME or ADJACENT rings of every pivot, so
  * joining ring r against rings {r−1, r, r+1} of one pivot (the join key)
  * and filtering |d(a,p_k) − d(b,p_k)| <= w on the remaining pivots keeps
  * a SUPERSET of the true pairs. The final `squared_l2 <= eps2` verify
  * (exact long arithmetic, codegen) makes the result set exactly the
  * brute-force one — [[EpsilonJoinSpec]] pins set equality against the
  * literal all-pairs oracle under fuzzing.
  *
  * Floating-point safety at the ring boundary: d(·,p) is computed as
  * `sqrt` of an exact long, so each distance carries <= 1 ulp of error;
  * the ring width is inflated by 1e-9 relative so a true-boundary pair
  * (|Δd| == w exactly) can never round into non-adjacent rings. The
  * inflation only ADMITS extra candidates — the exact verify discards
  * them — so completeness is preserved and correctness unaffected.
  *
  * Scale shape: two scans of the input (one per join side — the ring
  * projection is a cheap codegen'd map), a 3ᵏᵒⁱⁿ-way key explode on the
  * left (k_join <= 2 pivots in the join key → 3 or 9 keys/row), one
  * shuffle equi-join on the ring key, then per-candidate O(d) verify.
  * Candidate volume is data-dependent: pivots are chosen greedy
  * max-min (k-center style, driver-side over a one-job hash-spread
  * sample), which spreads them across the data's own clusters so
  * ring populations — and therefore per-key join fan-out — track the true
  * ε-graph density rather than n². In concentrated high-dimensional data
  * the rings prune less (distances concentrate — an inherent property of
  * exact ε-joins, not of this plan), and the MEASURED guidance
  * (dev/EPSJOIN_CONCENTRATION.md, via [[selfJoinStats]]) is regime-
  * dependent: on ISOTROPIC concentration nothing prunes — candidates
  * degenerate to exactly n(n−1)/2, extra `filterPivots` are pure
  * overhead, and the right moves are dimensionality reduction, a
  * smaller ε, or approximate pre-blocking; on CLUSTERED data the rings
  * prune ~10x and `filterPivots = 2` cuts the verify input a further
  * ~2.5-2.7x (each pivot adds one cheap |Δd| <= w band filter ahead of
  * the O(d) verify; beyond 2 buys ≤5%). Callers who don't know their
  * regime pass [[AutoFilterPivots]]: a driver-side probe over the
  * pivot sample replays the funnel and enables the band pivots only
  * where they pay ([[probeFilterPivots]] — the decision table applied
  * inside the operator). AQE's skew-join split handles a hot ring at
  * runtime.
  *
  * Input contract: `vecCol` is `array<long>` (the quantized embedding
  * convention shared with [[SquaredL2]] / [[Pq]]); rows with NULL vectors
  * are ignored (no pair can be within ε of an unknown point).
  *
  * NO-OVERFLOW PRECONDITION (inherited from [[SquaredL2]], and STRICTER
  * here than in ranking consumers): ring assignment partitions points by
  * pivot distance, so a wrapped-around distance doesn't just mis-rank —
  * it can place a true pair in non-adjacent rings and DROP it before the
  * exact verify. Exactness therefore requires max|Δcoord| <=
  * sqrt(Long.MaxValue / d) ≈ 3.0e9/sqrt(d) across all point pairs AND
  * point-pivot pairs (d=768: ~1.1e8; the library's x1000 quantization is
  * 4+ orders inside). Callers with coarser quantization must rescale
  * before joining — the all-pairs fallback only mis-verified under
  * overflow, this plan can silently lose pairs.
  */
object EpsilonJoin {

  /** Sentinel for `filterPivots`: pick 0 or [[AutoMaxFilterPivots]]
    * from a bounded sampled probe instead of requiring the caller to
    * know their data's concentration regime (the
    * dev/EPSJOIN_CONCENTRATION.md decision table, applied inside the
    * operator): the probe replays the ring-key + band funnel over the
    * SAME ≤2048-row hash-spread sample pivot selection already collects
    * (driver-side, microseconds — no extra Spark job), and enables the
    * extra band pivots only when they cut the verify input ≥1.25× on
    * the sample — measured ~2.5-2.7× on clustered data, ~1.0× (pure
    * overhead) on isotropic concentration. The choice only affects
    * pruning cost, never the result set (exact verify runs either way).
    */
  val AutoFilterPivots: Int = -1

  /** What auto mode enables when the probe says the band pivots pay:
    * the measured knee — beyond 2 buys ≤5% (dev/EPSJOIN_CONCENTRATION.md). */
  val AutoMaxFilterPivots: Int = 2

  /** All pairs (idA < idB, d2) with squared L2 <= eps2.
    *
    * @param joinPivots   pivots participating in the equi-join KEY
    *                     (1 or 2; 2 → 9-way left explode, finer
    *                     partitioning and earlier pruning)
    * @param filterPivots additional pivots applied as |Δd| <= w band
    *                     FILTERS after the key join (cheap long/double
    *                     compares ahead of the O(d) exact verify), or
    *                     [[AutoFilterPivots]] to let a sampled probe
    *                     decide per the measured concentration regime
    */
  def selfJoin(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      eps2: Long,
      joinPivots: Int = 2,
      filterPivots: Int = 2): DataFrame =
    build(df, idCol, vecCol, eps2, joinPivots, filterPivots) match {
      case Some(s) => s.result
      case None    => emptyResult(df, idCol)
    }

  /** Candidate-volume diagnostics for the SAME plan [[selfJoin]] runs
    * (one shared builder — the numbers can't drift from the shipped
    * operator): one row with
    *  - `n_key_candidates` — ordered pairs surviving the ring-key
    *    equi-join (before band filters): the join's shuffle/fan-out cost;
    *  - `n_band_survivors` — after the per-pivot |Δd| <= w band filters:
    *    what reaches the O(d) exact verify;
    *  - `n_true_pairs` — the exact result.
    * `n_key_candidates / n_true_pairs` is the pruning health metric the
    * concentration curve (dev/EPSJOIN_CONCENTRATION.md) tracks; costs 3
    * jobs, so it's a diagnosis tool, not the production path.
    */
  def selfJoinStats(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      eps2: Long,
      joinPivots: Int = 2,
      filterPivots: Int = 2): (Long, Long, Long) =
    build(df, idCol, vecCol, eps2, joinPivots, filterPivots) match {
      case Some(s) => (s.candidates.count(), s.banded.count(), s.result.count())
      case None    => (0L, 0L, 0L)
    }

  private final case class Stages(
      candidates: DataFrame, banded: DataFrame, result: DataFrame)

  private def emptyResult(df: DataFrame, idCol: String): DataFrame = {
    val idT = df.schema(idCol).dataType
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("idA", idT),
        org.apache.spark.sql.types.StructField("idB", idT),
        org.apache.spark.sql.types.StructField("d2",
          org.apache.spark.sql.types.LongType))))
  }

  private def build(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      eps2: Long,
      joinPivots: Int,
      filterPivots: Int): Option[Stages] = {
    require(eps2 >= 0, s"eps2 must be >= 0, got $eps2")
    require(joinPivots >= 1 && joinPivots <= 2,
      s"joinPivots must be 1 or 2, got $joinPivots")
    require(filterPivots >= 0 || filterPivots == AutoFilterPivots,
      s"filterPivots must be >= 0 or AutoFilterPivots, got $filterPivots")
    val maxFp =
      if (filterPivots == AutoFilterPivots) AutoMaxFilterPivots else filterPivots
    val pro = prologue(df, idCol, vecCol, eps2, joinPivots, maxFp)
      .getOrElse(return None)
    import pro.{in, jp, sample, w}
    val allPivots = pro.pivots
    val fp =
      if (filterPivots == AutoFilterPivots)
        probeFilterPivots(sample, allPivots.map(_.toArray).toArray, jp, w)
      else math.min(filterPivots, allPivots.size - jp)
    val pivots = allPivots.take(jp + fp)
    val usable = pivots.size

    def dists(v: Column): Column =
      array(pivots.map(p => sqrt(SquaredL2(v, typedLit(p)).cast("double"))): _*)
    val ringed = in.select(col("__id"), col("__v"), dists(col("__v")).as("__d"))

    def ring(k: Int, side: String): Column =
      floor(col(s"__d$side").getItem(k) / lit(w)).cast("long")
    // left side: explode each join pivot's ring into {r-1, r, r+1} so a
    // pair adjacent in any direction meets on exactly one key
    def offsets(c: Column): Column = array(c - 1, c, c + 1)
    val left0 = ringed.toDF("__ida", "__va", "__da")
    val left = (if (jp == 2)
      left0
        .withColumn("__k0", explode(offsets(ring(0, "a"))))
        .withColumn("__k1", explode(offsets(ring(1, "a"))))
    else
      left0.withColumn("__k0", explode(offsets(ring(0, "a")))))
    val right0 = ringed.toDF("__idb", "__vb", "__db")
    val right = (if (jp == 2)
      right0.withColumn("__k0", ring(0, "b")).withColumn("__k1", ring(1, "b"))
    else
      right0.withColumn("__k0", ring(0, "b")))

    val keyCols = if (jp == 2) Seq("__k0", "__k1") else Seq("__k0")
    val bandFilters = (0 until usable).map { k =>
      abs(col("__da").getItem(k) - col("__db").getItem(k)) <= lit(w)
    }.reduce(_ && _)
    val candidates = left.join(right, keyCols)
      .filter(col("__ida") < col("__idb"))
    val banded = candidates.filter(bandFilters)
    val result = banded
      .withColumn("__d2", SquaredL2(col("__va"), col("__vb")))
      .filter(col("__d2") <= lit(eps2))
      .select(col("__ida").as("idA"), col("__idb").as("idB"),
        col("__d2").as("d2"))
    Some(Stages(candidates, banded, result))
  }

  private final case class Prologue(
      in: DataFrame, w: Double, sample: Array[Array[Long]],
      pivots: Seq[Seq[Long]], jp: Int)

  /** The ONE shared derivation of the join's decision inputs — null
    * filter, ring width, pivot sample, greedy pivots, join-pivot clamp —
    * used by [[build]] AND [[resolveFilterPivots]], so the diagnostic
    * can never silently report a different choice than the operator
    * makes (the two-sites-re-deriving-a-policy drift hazard). None =
    * empty input = no pairs by construction.
    *
    * `w` inflated 1e-9 relative: absorbs the <=1-ulp sqrt error at the
    * ring boundary (object doc); only ever ADMITS candidates. Floored
    * at 1e-3 so eps2=0 (exact-equality join) gets finite ring ids
    * instead of a d/0 infinity that overflows the long cast — a
    * wider-than-ε ring is always safe, never lossy. Fewer distinct
    * vectors than requested pivots (tiny/degenerate input): every
    * selected pivot still yields a valid band, just a weaker one —
    * proceed with what exists.
    */
  private def prologue(
      df: DataFrame, idCol: String, vecCol: String, eps2: Long,
      joinPivots: Int, maxFp: Int): Option[Prologue] = {
    val in = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val w = math.max(math.sqrt(eps2.toDouble) * (1 + 1e-9), 1e-3)
    val sample = pivotSample(in)
    if (sample.isEmpty) return None
    val pivots = greedyPivots(sample, joinPivots + maxFp)
    if (pivots.isEmpty) None
    else Some(Prologue(in, w, sample, pivots, math.min(joinPivots, pivots.size)))
  }

  /** Bounded deterministic sample for pivot selection AND the auto-mode
    * probe — ONE Spark job, not one per pivot:
    * `orderBy(xxhash64(id)).limit(2048)` plans as
    * TakeOrderedAndProject (per-partition top-k + driver merge, no
    * shuffle), giving a deterministic hash-spread sample regardless of
    * the input's physical order.
    */
  private def pivotSample(in: DataFrame): Array[Array[Long]] =
    in.orderBy(xxhash64(col("__id").cast("string")), col("__id"))
      .limit(2048).select(col("__v")).collect()
      .map(_.getSeq[Long](0).toArray)

  private def d2(a: Array[Long], b: Array[Long]): Long = {
    if (a.length != b.length) return Long.MaxValue
    var acc = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  /** Greedy max-min (k-center) pivot selection, driver-side over the
    * bounded sample (k·2048 O(d) kernels — microseconds). Pivot QUALITY
    * only affects candidate pruning — the exact verify makes the result
    * identical for ANY pivot set — so sampling trades nothing but (a
    * little) pruning power for (nPivots − 1) fewer sequential jobs.
    */
  private def greedyPivots(
      sample: Array[Array[Long]], nPivots: Int): Seq[Seq[Long]] = {
    if (sample.isEmpty) return Nil
    val picked = scala.collection.mutable.ArrayBuffer[Array[Long]](sample(0))
    var exhausted = false
    while (picked.size < nPivots && !exhausted) {
      var best = -1
      var bestD = 0L // strictly-greater keeps the FIRST argmax: deterministic
      var i = 0
      while (i < sample.length) {
        var m = Long.MaxValue
        picked.foreach { p => val d = d2(sample(i), p); if (d < m) m = d }
        if (m > bestD && m != Long.MaxValue) { bestD = m; best = i }
        i += 1
      }
      if (best < 0) exhausted = true // all remaining at distance 0: no new band
      else picked += sample(best)
    }
    picked.toSeq.map(_.toSeq)
  }

  /** The auto-mode probe ([[AutoFilterPivots]]): replay the shipped
    * funnel — ring-key adjacency on the `jp` join pivots, then the
    * |Δd| <= w band on join pivots, then the band on the EXTRA pivots —
    * over (a ≤1024-row slice of) the pivot sample, all driver-side
    * (≤ ~0.5M O(d) kernels — the same order as greedy pivot selection
    * itself). Returns the number of extra band pivots to enable:
    * `pivots.length − jp` when they cut the sample's verify input
    * ≥1.25× (clustered regime — measured 2.5-2.7× there), else 0
    * (isotropic-concentration regime — measured ~1.0×, pure overhead).
    * Deterministic: the sample is hash-spread by id, not
    * physical-order-dependent.
    */
  private[graft] def probeFilterPivots(
      sample: Array[Array[Long]],
      pivots: Array[Array[Long]],
      jp: Int,
      w: Double): Int = {
    val extra = pivots.length - jp
    if (extra <= 0) return 0
    val n = math.min(sample.length, 1024)
    val dist = Array.tabulate(n, pivots.length) { (i, k) =>
      math.sqrt(d2(sample(i), pivots(k)).toDouble)
    }
    var cand = 0L // band survivors with fp=0 (what reaches the verify then)
    var surv = 0L // band survivors with the extra pivots enabled
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var k = 0; var keyOk = true
        while (k < jp && keyOk) {
          if (math.abs(math.floor(dist(i)(k) / w) - math.floor(dist(j)(k) / w)) > 1)
            keyOk = false
          k += 1
        }
        if (keyOk) {
          var b = 0; var bandOk = true // join-pivot band: both variants pay it
          while (b < jp && bandOk) {
            if (math.abs(dist(i)(b) - dist(j)(b)) > w) bandOk = false
            b += 1
          }
          if (bandOk) {
            cand += 1
            var e = jp; var extOk = true
            while (e < pivots.length && extOk) {
              if (math.abs(dist(i)(e) - dist(j)(e)) > w) extOk = false
              e += 1
            }
            if (extOk) surv += 1
          }
        }
        j += 1
      }
      i += 1
    }
    // enable iff the extra pivots cut the verify input >= 1.25x on the
    // sample (5*surv <= 4*cand) — between the measured regimes (~1.0x
    // isotropic, 2.5-2.7x clustered) with margin on both sides
    if (cand > 0 && surv * 5 <= cand * 4) extra else 0
  }

  /** What auto mode would pick for `df` — the probe on its own, for
    * diagnosis and tests. Shares [[prologue]] with [[build]], so its
    * answer IS the operator's decision (same sample job, same w, same
    * pivots), not a re-derivation that could drift. */
  private[graft] def resolveFilterPivots(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      eps2: Long,
      joinPivots: Int = 2): Int =
    prologue(df, idCol, vecCol, eps2, joinPivots, AutoMaxFilterPivots)
      .map(p => probeFilterPivots(p.sample, p.pivots.map(_.toArray).toArray, p.jp, p.w))
      .getOrElse(0)
}
