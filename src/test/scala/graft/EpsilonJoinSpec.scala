package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.EpsilonJoin

/** [[graft.ops.EpsilonJoin]] claims EXACT ε-join results from a
  * non-all-pairs plan (pivot-ring candidate generation is triangle-
  * inequality-complete, the squared_l2 verify is exact long arithmetic).
  * This spec pins:
  *   - set equality against the literal all-pairs oracle, fuzzed over
  *     random corpora, dimensions, eps values, and pivot configs —
  *     including eps at EXACT pair distances (the ring-boundary case the
  *     1e-9 width inflation exists for);
  *   - plan shape: the candidate join is an equi-join (hash or sort-merge
  *     key join), never a nested-loop over n²;
  *   - degenerate inputs (empty, single row, all-identical vectors, fewer
  *     distinct vectors than pivots, NULL vectors).
  */
class EpsilonJoinSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Seq[Long])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", ArrayType(LongType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) =>
        Row(i, if (v == null) null else v)
      }, 3), schema)
  }

  private def brute(rows: Seq[(Long, Seq[Long])], eps2: Long): Set[(Long, Long, Long)] = {
    val live = rows.filter(_._2 != null)
    (for {
      (ia, va) <- live; (ib, vb) <- live
      if ia < ib && va.size == vb.size
      d2 = va.zip(vb).map { case (x, y) => (x - y) * (x - y) }.sum
      if d2 <= eps2
    } yield (ia, ib, d2)).toSet
  }

  private def run(rows: Seq[(Long, Seq[Long])], eps2: Long,
      joinPivots: Int = 2, filterPivots: Int = 2): Set[(Long, Long, Long)] =
    EpsilonJoin.selfJoin(df(rows), "id", "v", eps2, joinPivots, filterPivots)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("matches brute force on a clustered fixture") {
    val rows = Seq(
      1L -> Seq(0L, 0L), 2L -> Seq(1L, 1L), 3L -> Seq(0L, 2L),
      4L -> Seq(100L, 100L), 5L -> Seq(101L, 99L), 6L -> Seq(103L, 103L),
      7L -> Seq(-50L, 60L))
    for (eps2 <- Seq(0L, 1L, 2L, 5L, 8L, 10L, 50L, 100000L))
      assert(run(rows, eps2) === brute(rows, eps2), s"eps2=$eps2")
  }

  test("fuzz: set equality vs all-pairs oracle over random corpora") {
    val rnd = new scala.util.Random(20260816L)
    for (round <- 0 until 25) {
      val n = 5 + rnd.nextInt(60)
      val d = 1 + rnd.nextInt(8)
      val spreadR = 1 + rnd.nextInt(40)
      val rows = (0L until n.toLong).map(i =>
        i -> Seq.fill(d)((rnd.nextInt(2 * spreadR) - spreadR).toLong))
      // eps drawn from the ACTUAL pair-distance distribution half the
      // time, so ring-boundary ties (d2 == eps2 exactly) are exercised
      val allD2 = brute(rows, Long.MaxValue).map(_._3).toSeq.sorted
      val eps2 =
        if (allD2.nonEmpty && rnd.nextBoolean()) allD2(rnd.nextInt(allD2.size))
        else rnd.nextInt(4 * spreadR * spreadR).toLong
      val jp = 1 + rnd.nextInt(2)
      val fp = // auto must be exact on arbitrary corpora like any manual fp
        if (rnd.nextInt(5) == 0) EpsilonJoin.AutoFilterPivots else rnd.nextInt(4)
      val got = run(rows, eps2, jp, fp)
      val want = brute(rows, eps2)
      assert(got === want,
        s"round=$round n=$n d=$d eps2=$eps2 jp=$jp fp=$fp " +
          s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("degenerate inputs") {
    assert(run(Nil, 10L) === Set.empty)
    assert(run(Seq(1L -> Seq(5L, 5L)), 10L) === Set.empty)
    // all-identical vectors: every pair at d2=0, max-min selection finds
    // no second pivot — single-band path must still be complete
    val same = (0L until 6L).map(i => i -> Seq(7L, 7L, 7L))
    assert(run(same, 0L) === brute(same, 0L))
    // NULL vectors are ignored, not paired
    val withNull = Seq(1L -> Seq(0L, 0L), 2L -> null, 3L -> Seq(1L, 0L))
    assert(run(withNull, 5L) === Set((1L, 3L, 1L)))
  }

  test("plan has no nested-loop / cartesian stage") {
    val rows = (0L until 40L).map(i => i -> Seq(i % 7, i / 7))
    val plan = EpsilonJoin.selfJoin(df(rows), "id", "v", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("selfJoinStats shares the selfJoin plan: funnel monotone, result count identical") {
    val rnd = new scala.util.Random(20260815L)
    val rows = (0L until 80L).map(i =>
      i -> Seq.fill(6)((rnd.nextInt(30) - 15).toLong))
    for (fp <- Seq(0, 3)) {
      val (cand, band, truePairs) =
        EpsilonJoin.selfJoinStats(df(rows), "id", "v", 120L, 2, fp)
      assert(cand >= band && band >= truePairs,
        s"funnel not monotone: $cand >= $band >= $truePairs (fp=$fp)")
      assert(truePairs == brute(rows, 120L).size.toLong, s"fp=$fp")
    }
    // more filter pivots can only SHRINK the band-survivor set (each adds
    // one conjunct), never change the exact result
    val (_, band0, t0) = EpsilonJoin.selfJoinStats(df(rows), "id", "v", 120L, 2, 0)
    val (_, band3, t3) = EpsilonJoin.selfJoinStats(df(rows), "id", "v", 120L, 2, 3)
    assert(band3 <= band0 && t0 == t3)
    // degenerate: empty input
    assert(EpsilonJoin.selfJoinStats(df(Nil), "id", "v", 10L) == ((0L, 0L, 0L)))
  }

  test("auto filterPivots picks the measured regime (0 isotropic, 2 clustered) and matches the best manual funnel") {
    // the dev/EPSJOIN_CONCENTRATION.md corpora at spec scale: same d=256
    // per-point noise (sum of 4 hashed uniforms), one isotropic blob vs
    // 50 well-separated clusters, 1% planted near-dups so true pairs
    // are never zero
    def gauss(n: Long, clusters: Int): DataFrame = {
      val clusterOff =
        if (clusters <= 1) "0L"
        else s"cast((pmod(hash(pmod(id, $clusters) * 131 + j), 7) - 3) * 20000L as bigint)"
      spark.range(n).select(col("id").as("vec_id"),
        expr(s"transform(sequence(0, 255), j -> $clusterOff + " +
          "cast(pmod(hash(id * 769 + j * 31 + 1), 1000) " +
          "+ pmod(hash(id * 769 + j * 31 + 2), 1000) " +
          "+ pmod(hash(id * 769 + j * 31 + 3), 1000) " +
          "+ pmod(hash(id * 769 + j * 31 + 4), 1000) - 2000 as bigint))").as("q"))
    }
    def withDups(b: DataFrame): DataFrame =
      b.unionAll(b.filter(col("vec_id") % 100 === 0)
        .select((col("vec_id") + 100000000L).as("vec_id"),
          expr("transform(q, (x, j) -> x + IF(j = 0, 1L, 0L))").as("q")))
    val eps2 = 120000000L
    val conc = withDups(gauss(400, 1))
    val clus = withDups(gauss(400, 50))
    // the probe lands on the measured decision: band pivots are pure
    // overhead on isotropic concentration, a >=1.25x verify-input cut
    // on clustered data
    assert(EpsilonJoin.resolveFilterPivots(conc, "vec_id", "q", eps2) == 0)
    assert(EpsilonJoin.resolveFilterPivots(clus, "vec_id", "q", eps2)
      == EpsilonJoin.AutoMaxFilterPivots)
    // auto == the best manual variant STAGE FOR STAGE (same funnel
    // counts), and exact either way (planted dups guarantee pairs)
    for ((data, fpBest) <- Seq(conc -> 0, clus -> EpsilonJoin.AutoMaxFilterPivots)) {
      val auto = EpsilonJoin.selfJoinStats(
        data, "vec_id", "q", eps2, 2, EpsilonJoin.AutoFilterPivots)
      val manual = EpsilonJoin.selfJoinStats(data, "vec_id", "q", eps2, 2, fpBest)
      assert(auto == manual, s"fpBest=$fpBest auto=$auto manual=$manual")
      assert(auto._3 >= 4)
    }
  }

  test("real embeddings slice matches brute force at the q_dbscan eps") {
    val q = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000 + lit(0.5)).cast("long")).as("q"))
    val rows = q.collect().map(r => (r.getLong(0), r.getSeq[Long](1): Seq[Long])).toSeq
    val eps2 = 1400000L
    val got = EpsilonJoin.selfJoin(q, "vec_id", "q", eps2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute(rows, eps2))
  }
}
