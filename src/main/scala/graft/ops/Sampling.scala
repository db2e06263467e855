package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, seed-stable sampling for training-data pipelines.
  *
  * Why not `df.sample()`: rand()-based sampling is evaluated per-task, so a
  * task RETRY (routine on a 1000-executor cluster) resamples its partition
  * — the job "succeeds" with a different row set than a clean run, which
  * breaks exactly-once sinks, reproducibility, and any downstream join
  * against the sample. Hashing a KEY instead makes membership a pure
  * function of (key, seed): retry-stable, reproducible across runs and
  * engines, and evaluated scan-side with zero shuffle (the filter pushes
  * into the scan like any other predicate).
  *
  * The hash is a two-step Lehmer/Park–Miller round (mod 2^31-1, multiplier
  * 48271) reduced to a bucket in [0, 10000). It is deliberately expressible
  * in portable ANSI SQL (`((key + seed) % p * 48271) % p % 10000`) so any
  * other engine — including the DuckDB oracle — reproduces membership
  * bit-for-bit; intermediate products stay under 2^48, safe in ANSI mode.
  * Not cryptographic: fine for rate sampling and splits, not for
  * adversarial inputs.
  *
  * Nesting property: buckets are TOTALLY ORDERED, so a 5% sample is a
  * strict subset of a 20% sample at the same seed — growing a sample never
  * resamples what a smaller rate already selected.
  */
object Sampling {

  private val P = 2147483647L // 2^31 - 1

  /** Deterministic bucket in [0, 10000) for a non-negative integral key. */
  def bucket(key: Column, seed: Long): Column =
    pmod(pmod(key.cast("long") + lit(seed), lit(P)) * lit(48271L), lit(P)) % lit(10000L)

  /** Keep rows whose bucket falls below `rate` (0.0 to 1.0, resolution
    * 1/10000).
    */
  def hashSample(df: DataFrame, key: Column, rate: Double, seed: Long): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(bucket(key, seed) < lit(math.round(rate * 10000)))
  }

  /** WEIGHTED Bernoulli (Poisson) sampling: keep a row with probability
    * `min(1, weight * num / den)` — quality- or length-proportional
    * corpus downsampling, the importance-sampling counterpart of the
    * flat [[hashSample]]. Pure integer arithmetic end to end: membership
    * is `bucket(key) * den < weight * 10000 * num` (the same Lehmer
    * [[bucket]], resolution 1/10000; the division is avoided entirely so
    * there is no rounding decision to keep in sync cross-engine) —
    * deterministic per (seed, key), retry-stable, and NESTED in the
    * rate: the kept set at num/den is a subset of the kept set at any
    * higher num'/den'. Shuffle-free: the whole predicate is scan-side.
    * Caller bounds: `weight * 10000 * num` and `9999 * den` must fit a
    * long. Weights are TRUNCATED to integers (a double quality score in
    * (0,1) would keep nothing) — pre-scale fractional scores to an
    * integer grid (e.g. `floor(score * 1000)`) and fold the grid into
    * `den`.
    */
  def weightedSample(
      df: DataFrame,
      key: Column,
      weight: Column,
      num: Long,
      den: Long,
      seed: Long): DataFrame = {
    require(num >= 0 && den > 0, s"need num >= 0, den > 0; got $num/$den")
    df.filter(bucket(key, seed) * lit(den) <
      weight.cast("long") * lit(10000L * num))
  }

  /** Per-stratum rates: `rates(stratumValue) -> rate`, rows of unlisted
    * strata get `defaultRate`. The rate lookup folds to a CASE expression —
    * still scan-side, still shuffle-free.
    */
  /** EXACT-k-per-group deterministic sample — fixed-size per-stratum
    * eval/holdout sets, where rate-based sampling ([[stratifiedSample]])
    * can only hit a size in expectation. Rows rank within their group by
    * `md5(seed ':' id)` — a cross-engine pseudo-random order (md5 is
    * identical everywhere, unlike xxhash64 which SQL engines lack), so
    * the selected SET is reproducible from any engine, retry-stable, and
    * re-drawable with a fresh seed. Groups smaller than k keep all rows.
    *
    * Scale shape: the rank filter compiles to WindowGroupLimit (Spark's
    * pre-shuffle per-group top-k, the q_domain_cap pattern — plan-
    * asserted in PlanSpec), so each map task forwards at most k rows per
    * group before the exchange; no global sort, no full-group
    * materialization.
    */
  def exactKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      k: Int,
      seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val key = seededKey(seed, idCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(key.asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  def stratifiedSample(
      df: DataFrame,
      key: Column,
      stratum: Column,
      rates: Map[String, Double],
      defaultRate: Double,
      seed: Long): DataFrame = {
    val threshold = rates.foldLeft(lit(math.round(defaultRate * 10000))) {
      case (acc, (value, rate)) =>
        when(stratum === lit(value), lit(math.round(rate * 10000))).otherwise(acc)
    }
    df.filter(bucket(key, seed) < threshold)
  }

  /** Domain-mixing subsample (the DoReMi/data-mixture shape): subsample
    * each group of `groupCol` so the OUTPUT approximates `targetShares`
    * (group -> share of the output) at output size `totalTarget`.
    * Per-group keep rate = `min(1, share * totalTarget / count(g))` — a
    * group short of its quota keeps everything (real mixers then
    * renormalize or upsample; upsampling is a join against a replication
    * count, out of scope here). Groups NOT in `targetShares` are
    * dropped — the mixture definition is exhaustive by design.
    *
    * Group counts come from ONE aggregate restricted to the groups the
    * mixture names, so the driver-side map is bounded by |targetShares|
    * (the caller's spec), NOT by the data's group cardinality — a corpus
    * with millions of distinct sources can never flood the driver here;
    * membership is the deterministic [[bucket]] hash — retry-stable,
    * engine-portable, scan-side.
    */
  def proportionalSample(
      df: DataFrame,
      key: Column,
      groupCol: String,
      targetShares: Map[String, Double],
      totalTarget: Long,
      seed: Long): DataFrame = {
    require(targetShares.values.forall(s => s >= 0 && s <= 1),
      "shares must be in [0,1]")
    require(totalTarget > 0, s"totalTarget must be positive, got $totalTarget")
    // cast-to-string comparison matches the String-keyed rate CASE fold in
    // stratifiedSample, so non-string group columns behave identically here
    val counts = df
      .filter(col(groupCol).cast("string").isin(targetShares.keys.toSeq: _*))
      .groupBy(groupCol).agg(count(lit(1)).as("__c")).collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val rates: Map[String, Double] = targetShares.flatMap { case (g, share) =>
      counts.get(g).map(c => g -> math.min(1.0, share * totalTarget / c))
    }
    stratifiedSample(df, key, col(groupCol), rates, defaultRate = 0.0, seed)
  }

  /** Deterministic train/val/test-style split assignment: `fractions` are
    * (label, fraction) in order; fractions must sum to 1. A row's label is
    * a pure function of (key, seed) — the same row lands in the same split
    * on every run, engine, and retry.
    */
  def assignSplit(key: Column, seed: Long, fractions: Seq[(String, Double)]): Column = {
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val b = bucket(key, seed)
    val cuts = fractions.scanLeft(0L) { case (acc, (_, f)) => acc + math.round(f * 10000) }
    fractions.zip(cuts.tail).init.foldRight(lit(fractions.last._1): Column) {
      case (((label, _), cut), acc) => when(b < lit(cut), lit(label)).otherwise(acc)
    }
  }

  /** THE cross-engine pseudo-random ordering key: `md5(seed ':' id)`.
    * One definition shared by [[exactKPerGroup]] and [[shardAssign]] —
    * the "same md5 order" contract between them (and their SQL oracles)
    * only holds while the byte layout stays identical.
    */
  private def seededKey(seed: String, idCol: String): Column =
    md5(concat(lit(seed + ":"), col(idCol).cast("string")).cast("binary"))

  /** Deterministic fractional UPSAMPLING — the mixture counterpart of
    * [[stratifiedSample]] for weights above 1 (epoch-style repetition of
    * prized sources: "see wiki 2.5 times per pass"). A row with rate `r`
    * basis points (1x = 10000) yields `r div 10000` whole copies plus
    * one more exactly when its [[bucket]] falls below `r mod 10000` —
    * so the fractional copies are a deterministic hash-selected subset,
    * not a rand() draw: retry-stable, engine-reproducible, and NESTED
    * (the extra-copy set at 2.3x is a strict subset of the one at 2.7x,
    * so raising a weight never unselects a copy an earlier run emitted).
    * `copy_idx` (0-based) distinguishes the copies downstream (fold it
    * into the id for re-keying). Rows at rate 0 disappear; rates must
    * be non-negative (a negative `div`/`pmod` pair would floor toward
    * surprising values — documented contract, not checked per-row).
    *
    * Scale shape: pure scan-side column arithmetic + one explode — zero
    * shuffles, zero joins, output size = Σ rates, evaluated inside
    * whole-stage codegen next to the scan.
    */
  def upsample(df: DataFrame, key: Column, rateBp: Column, seed: Long): DataFrame = {
    for (c <- Seq("copy_idx", "__bp", "__copies"))
      require(!df.columns.contains(c),
        s"upsample: input already has a $c column — rename it first " +
          "(the operator must not silently clobber or drop it)")
    df.withColumn("__bp", rateBp.cast("long"))
      .withColumn("__copies",
        expr("__bp div 10000") +
          when(bucket(key, seed) < pmod(col("__bp"), lit(10000L)), 1L)
            .otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__bp", "__copies")
  }

  /** Leakage-free split assignment: near-duplicate GROUPS (connected
    * components over the verified dup-pair graph,
    * [[DupGroups.connectedComponents]]) land in ONE split together, so a
    * train/test boundary never separates two near-copies of the same
    * document — the contamination path a per-row [[assignSplit]] leaves
    * open (one copy trains, its near-copy evaluates, and the eval metric
    * is memorization, not generalization).
    *
    * `components` is the (node, component) frame; docs absent from it are
    * singleton groups and split by their own id — which IS component-min
    * semantics (a singleton's component is itself), so one formula covers
    * both cases and the assignment stays a pure function of
    * (group key, seed): retry-stable, engine-portable, reseedable.
    *
    * Scale shape: the component frame is bounded by the dup-PAIR graph
    * (sparse after LSH blocking + verification — a few percent of the
    * corpus at web scale), so the left join is UNPINNED: AQE broadcasts
    * it when it fits and falls back to a hash join when a pathological
    * corpus makes it large. The split CASE is scan-side column arithmetic
    * after the join — no other shuffle.
    *
    * Output: df + (`split_group` LONG, `split` STRING).
    */
  def groupedSplit(
      df: DataFrame,
      idCol: String,
      components: DataFrame,
      seed: Long,
      fractions: Seq[(String, Double)]): DataFrame = {
    for (c <- Seq("split", "split_group", "__node"))
      require(!df.columns.contains(c),
        s"groupedSplit: input already has a $c column — rename it first " +
          "(the operator must not silently clobber or drop it)")
    val comp = components.select(
      col("node").cast("long").as("__node"),
      col("component").cast("long").as("split_group"))
    df.join(comp, df.col(idCol).cast("long") === comp.col("__node"), "left")
      .withColumn("split_group",
        coalesce(col("split_group"), col(idCol).cast("long")))
      .withColumn("split", assignSplit(col("split_group"), seed, fractions))
      .drop("__node")
  }

  /** Deterministic global shuffle + EXACT-size shard assignment — the
    * training-export step: randomize document order corpus-wide (so no
    * shard inherits crawl/source locality) and cut the order into
    * `nShards` contiguous shards whose sizes differ by at most one row.
    *
    * The shuffle key is `md5(seed ':' id)` (the [[exactKPerGroup]]
    * cross-engine order: reproducible from any SQL engine, retry-stable,
    * reseedable); the global position in that order comes from
    * [[Packing.withExclusivePrefixSum]] — the distributed two-pass rank,
    * NOT a single-partition `row_number()` window (the plan that dies at
    * 100 TB). Shard id is then `rank · nShards div total`: pure long
    * arithmetic, floor division, sizes exactly ⌈/⌉-balanced — unlike the
    * hash-mod assignment (`md5 % n`), whose binomial spread leaves shards
    * percent-level uneven, this is balanced to ±1 row, which is what
    * data-parallel training loaders assume.
    *
    * Requires distinct `idCol` values (md5 of the id IS the total order;
    * duplicate ids would tie). Returns (df + `shuffle_key`, `shard`) and
    * the prefix-sum cache release handle — call it after the terminal
    * action. Overflow: `rank · nShards` bounded by rows·shards; the
    * require keeps it inside long range.
    */
  def shardAssign(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      seed: String,
      assertUniqueIds: Boolean = false): (DataFrame, () => Unit) = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    for (c <- Seq("shuffle_key", "shard", "__one", "__rank"))
      require(!df.columns.contains(c),
        s"shardAssign: input already has a $c column — rename it first")
    val keyed = df.withColumn("shuffle_key", seededKey(seed, idCol))
    // total rides out of the prefix sum's subtotal collect — no second scan
    val (ranked, total, release) = Packing.withExclusivePrefixSumAndTotal(
      keyed.withColumn("__one", lit(1L)), "shuffle_key", "__one", "__rank",
      assertUniqueOrder = assertUniqueIds)
    require(total <= Long.MaxValue / math.max(nShards, 1),
      s"rank*nShards would overflow long: rows=$total shards=$nShards")
    val out =
      if (total == 0) ranked.drop("__one", "__rank").withColumn("shard", lit(0L))
      else ranked
        .withColumn("shard", expr(s"(__rank * $nShards) div ${total}L"))
        .drop("__one", "__rank")
    (out, release)
  }

  /** Deterministic curriculum-mixing order: every row gets a virtual time
    * `vtime = bucket(id, seed) * 1e6 div weight`, and reading rows in
    * `(vtime, id)` order interleaves sources proportionally to their
    * weights at EVERY prefix — the data-mixture schedule shape (heavier
    * weight → denser early positions), without sampling anything away.
    *
    * Why this works: `bucket` is uniform on [0, 10000), so the fraction
    * of a weight-w source at vtime ≤ V is `min(1, V·w/1e10)` — prefix
    * share proportional to w until a source exhausts. Pure scan-side
    * integer arithmetic (the same Lehmer [[bucket]] contract, portable
    * to any engine); the global order itself is whatever the consumer
    * does with `__vtime` — a distributed sort for a full shuffle-write,
    * a TakeOrdered for a bounded head. Non-positive weights are a data
    * error surfaced per-row (a silent weight-0 row would sort last and
    * quietly starve its source).
    *
    * Resolution: 10 000 distinct buckets per weight — schedule ties are
    * broken by id, so the order is total and reproducible; per-epoch
    * re-keying = a new seed.
    */
  def curriculumOrder(
      df: DataFrame,
      idCol: String,
      weight: Column,
      seed: Long): DataFrame = {
    for (c <- Seq("__vtime", "__b", "__w"))
      require(!df.columns.contains(c),
        s"curriculumOrder: input already has a $c column — rename it first")
    df.withColumn("__b", bucket(col(idCol), seed) * lit(1000000L))
      .withColumn("__w",
        when(weight <= 0, raise_error(concat(
          lit("curriculumOrder: non-positive weight for id="), col(idCol))))
          .otherwise(weight.cast("long")))
      .withColumn("__vtime", expr("__b div __w"))
      .drop("__b", "__w")
  }
}
