package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (0L until 50000L).toDF("id")

  test("membership is a pure function of (key, seed)") {
    val a = Sampling.hashSample(keys, $"id", 0.3, seed = 7).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(keys, $"id", 0.3, seed = 7).collect().map(_.getLong(0)).toSet
    assert(a == b)
    val c = Sampling.hashSample(keys, $"id", 0.3, seed = 8).collect().map(_.getLong(0)).toSet
    assert(a != c, "different seeds must select different rows")
  }

  test("samples nest: a smaller rate is a strict subset of a larger one") {
    val small = Sampling.hashSample(keys, $"id", 0.1, seed = 7).collect().map(_.getLong(0)).toSet
    val large = Sampling.hashSample(keys, $"id", 0.4, seed = 7).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large) && small.size < large.size)
  }

  test("realized rate tracks the requested rate") {
    for (rate <- Seq(0.05, 0.25, 0.5, 0.9)) {
      val n = Sampling.hashSample(keys, $"id", rate, seed = 42).count()
      assert(math.abs(n.toDouble / 50000 - rate) < 0.02, s"rate $rate realized ${n / 50000.0}")
    }
  }

  test("stratified rates apply per stratum, default for unlisted strata") {
    val df = keys.withColumn("lang",
      when($"id" % 3 === 0, "en").when($"id" % 3 === 1, "de").otherwise("fr"))
    val out = Sampling.stratifiedSample(df, $"id", $"lang",
      Map("en" -> 0.6, "de" -> 0.1), defaultRate = 0.3, seed = 7)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("en") / (50000 / 3.0) - 0.6) < 0.03)
    assert(math.abs(out("de") / (50000 / 3.0) - 0.1) < 0.03)
    assert(math.abs(out("fr") / (50000 / 3.0) - 0.3) < 0.03)
  }

  test("assignSplit partitions every row deterministically at the requested ratios") {
    val split = keys.withColumn("split",
      Sampling.assignSplit($"id", 7, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 50000L)
    assert(math.abs(counts("train") / 50000.0 - 0.8) < 0.02)
    assert(math.abs(counts("val") / 50000.0 - 0.1) < 0.02)
    // deterministic: re-evaluation yields identical assignment
    val twice = split.withColumn("split2",
      Sampling.assignSplit($"id", 7, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    assert(twice.filter($"split" =!= $"split2").count() == 0)
  }

  test("proportionalSample: rates from target shares, unlisted groups dropped, deterministic") {
    val df = spark.range(0, 1000)
      .selectExpr("id AS doc_id", "concat('g', cast(id % 4 AS string)) AS grp")
    // g0 wants 0.8*100/250 = 32%, g1 wants 0.2*100/250 = 8%, g2/g3 dropped
    val out = Sampling.proportionalSample(df, col("doc_id"), "grp",
      Map("g0" -> 0.8, "g1" -> 0.2), totalTarget = 100L, seed = 5)
    val byGrp = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp.keySet == Set("g0", "g1"))
    // bucket resolution 1/10000 over 250 rows: expect ~80 and ~20, loosely
    assert(byGrp("g0") > 50 && byGrp("g0") < 110)
    assert(byGrp("g1") > 5 && byGrp("g1") < 40)
    // a group short of quota keeps everything (rate clamps at 1)
    val all = Sampling.proportionalSample(df, col("doc_id"), "grp",
      Map("g0" -> 1.0), totalTarget = 100000L, seed = 5)
    assert(all.count() == 250)
    // determinism: identical row set on re-evaluation
    val ids1 = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Sampling.proportionalSample(df, col("doc_id"), "grp",
        Map("g0" -> 0.8, "g1" -> 0.2), totalTarget = 100L, seed = 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
  }

  test("proportionalSample: driver-side counts are bounded by the mixture spec, not group cardinality") {
    // a million-distinct-group corpus with only 2 named groups: the counts
    // aggregate must filter to the named groups BEFORE collecting — same
    // output as before, but only |targetShares| rows can ever reach the
    // driver (the 100 TB posture; unlisted groups are dropped regardless)
    val wide = spark.range(0, 5000)
      .selectExpr("id AS doc_id",
        "CASE WHEN id < 500 THEN 'g0' WHEN id < 1000 THEN 'g1' " +
          "ELSE concat('u', cast(id AS string)) END AS grp")
    val out = Sampling.proportionalSample(wide, col("doc_id"), "grp",
      Map("g0" -> 0.5, "g1" -> 0.5), totalTarget = 1000000L, seed = 7)
    // both named groups clamp at rate 1 -> all 1000 named rows, 0 unlisted
    assert(out.count() == 1000)
    assert(out.filter(col("grp").startsWith("u")).count() == 0)
    // integer group column: cast-to-string matching still resolves shares
    val intGrp = spark.range(0, 100).selectExpr("id AS doc_id", "cast(id % 3 AS int) AS grp")
    val got = Sampling.proportionalSample(intGrp, col("doc_id"), "grp",
      Map("0" -> 1.0), totalTarget = 1000L, seed = 7)
    assert(got.count() == 34 && got.filter(col("grp") =!= 0).count() == 0)
  }

  test("exactKPerGroup: exact k, small groups kept whole, seed redraws") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, if (i <= 90) "big" else "small"))
      .toDF("id", "grp").repartition(7)
    val out = Sampling.exactKPerGroup(df, Seq("grp"), "id", k = 15, seed = "a")
      .select("grp", "id").as[(String, Long)].collect().toSeq
    assert(out.count(_._1 == "big") == 15)
    assert(out.count(_._1 == "small") == 10) // group of 10 < k: all kept
    // deterministic under re-evaluation and layout, redrawn under a new seed
    val again = Sampling.exactKPerGroup(df.repartition(3), Seq("grp"), "id",
        k = 15, seed = "a")
      .select("grp", "id").as[(String, Long)].collect().toSeq
    assert(out.toSet == again.toSet)
    val other = Sampling.exactKPerGroup(df, Seq("grp"), "id", k = 15, seed = "b")
      .filter($"grp" === "big").select("id").as[Long].collect().toSet
    assert(out.filter(_._1 == "big").map(_._2).toSet != other)
  }

  test("upsample: whole rates replicate exactly, rate 0 drops, 1x is identity") {
    import spark.implicits._
    val df = (0L until 100L).toDF("id")
    val x3 = Sampling.upsample(df, $"id", lit(30000L), seed = 5)
    assert(x3.count() == 300)
    assert(x3.groupBy("id").count().select("count").as[Long].collect().toSet == Set(3L))
    assert(x3.select("copy_idx").as[Long].collect().toSet == Set(0L, 1L, 2L))
    assert(Sampling.upsample(df, $"id", lit(0L), seed = 5).count() == 0)
    val x1 = Sampling.upsample(df, $"id", lit(10000L), seed = 5)
    assert(x1.count() == 100 &&
      x1.select("copy_idx").as[Long].collect().toSet == Set(0L))
  }

  test("upsample: fractional copies are the hashSample membership, nested") {
    import spark.implicits._
    val df = (0L until 50000L).toDF("id")
    val up = Sampling.upsample(df, $"id", lit(25000L), seed = 9)
      .groupBy("id").count()
    val extra = up.filter($"count" === 3).select("id").as[Long].collect().toSet
    // the fractional-copy set IS hashSample at the fractional rate
    val members = Sampling.hashSample(df, $"id", 0.5, seed = 9)
      .select("id").as[Long].collect().toSet
    assert(extra == members)
    // nesting: extras at 2.3x are a subset of extras at 2.7x
    val lo = Sampling.upsample(df, $"id", lit(23000L), seed = 9)
      .groupBy("id").count().filter($"count" === 3)
      .select("id").as[Long].collect().toSet
    val hi = Sampling.upsample(df, $"id", lit(27000L), seed = 9)
      .groupBy("id").count().filter($"count" === 3)
      .select("id").as[Long].collect().toSet
    assert(lo.subsetOf(hi) && lo.size < hi.size)
  }

  test("upsample plan is scan-side: no shuffle, no join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = Sampling.upsample(docs, col("doc_id"), lit(25000L), seed = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("shardAssign: exact ±1 sizes, contiguous key ranges, seed redraw") {
    import spark.implicits._
    val df = (0L until 503L).toDF("id").repartition(7)
    val (out, release) = Sampling.shardAssign(df, "id", nShards = 8, seed = "s")
    val rows = out.select("shard", "id", "shuffle_key")
      .as[(Long, Long, String)].collect().toSeq
    release()
    assert(rows.size == 503)
    val sizes = rows.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes.keySet == (0L until 8L).toSet, "every shard populated")
    assert(sizes.values.max - sizes.values.min <= 1, s"sizes=$sizes")
    // shards are contiguous ranges of the md5 order
    val bounds = rows.groupBy(_._1).view
      .mapValues(g => (g.map(_._3).min, g.map(_._3).max)).toMap
    for (s <- 0L until 7L)
      assert(bounds(s)._2 < bounds(s + 1)._1, s"shards $s/${s + 1} overlap")
    // deterministic under layout, redrawn under a new seed
    val (again, release2) = Sampling.shardAssign(df.repartition(3), "id", 8, "s")
    val againMap = again.select("id", "shard").as[(Long, Long)].collect().toMap
    release2()
    assert(rows.map(r => r._2 -> r._1).toMap == againMap)
    val (other, release3) = Sampling.shardAssign(df, "id", 8, "t")
    val otherMap = other.select("id", "shard").as[(Long, Long)].collect().toMap
    release3()
    assert(rows.exists(r => otherMap(r._2) != r._1), "new seed reshuffles")
  }

  test("shardAssign: nShards=1 puts everything in shard 0") {
    import spark.implicits._
    val (out, release) = Sampling.shardAssign((0L until 9L).toDF("id"), "id", 1, "s")
    assert(out.select("shard").as[Long].collect().toSet == Set(0L))
    release()
  }

  test("shardAssign: duplicate ids are caught by the uniqueness assert") {
    import spark.implicits._
    val dup = Seq(1L, 2L, 2L).toDF("id")
    val ex = intercept[IllegalArgumentException] {
      Sampling.shardAssign(dup, "id", 2, "s", assertUniqueIds = true)
    }
    assert(ex.getMessage.contains("total order"))
  }

  test("groupedSplit: components share a split, singletons fall back to own id") {
    import graft.ops.DupGroups
    // two components: {1,2,3} (chain) and {10,11}; 20 and 21 isolated
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v")
    val comp = DupGroups.connectedComponents(edges, "u", "v")
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.groupedSplit(docs, "doc_id", comp, seed = 29, fr)
      .select("doc_id", "split_group", "split").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // members of one component agree on group AND split
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(out(1L)._1 == 1L, "group key is the component min")
    assert(Set(out(10L), out(11L)).size == 1)
    // singletons: group = own id, split = plain assignSplit of that id
    val own = Seq(20L, 21L).toDF("doc_id")
      .withColumn("s", Sampling.assignSplit($"doc_id", 29, fr))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(20L) == ((20L, own(20L))) && out(21L) == ((21L, own(21L))))
    // no group straddles two splits
    val straddle = Sampling.groupedSplit(docs, "doc_id", comp, seed = 29, fr)
      .groupBy("split_group").agg(countDistinct("split").as("k"))
      .filter($"k" > 1).count()
    assert(straddle == 0)
  }

  test("groupedSplit: reserved output columns are rejected") {
    val comp = Seq((1L, 1L)).toDF("node", "component")
    val bad = Seq((1L, "x")).toDF("doc_id", "split")
    val e = intercept[IllegalArgumentException] {
      Sampling.groupedSplit(bad, "doc_id", comp, 7, Seq("a" -> 1.0))
    }
    assert(e.getMessage.contains("split"))
  }

  test("weightedSample: zero weight never kept, saturated weight always kept, nested in rate") {
    val rows = Seq.tabulate(2000)(i => (i.toLong, (i % 5).toLong * 25)).toDF("id", "w")
    // weight 0 rows can never pass; weight >= den/num/10000 always passes
    val kept = Sampling.weightedSample(rows, col("id"), col("w"), 1L, 400L, 9L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.forall(_._2 > 0))
    val saturated = Sampling.weightedSample(
      rows.withColumn("w", col("w") + 10000L), col("id"), col("w"), 1L, 1L, 9L)
    assert(saturated.count() == 2000)
    // nesting: kept set at p is a subset of kept set at 2p
    val lo = Sampling.weightedSample(rows, col("id"), col("w"), 1L, 800L, 9L)
      .collect().map(_.getLong(0)).toSet
    val hi = Sampling.weightedSample(rows, col("id"), col("w"), 2L, 800L, 9L)
      .collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi) && lo.size < hi.size)
    // realized rate tracks expectation: E[kept] = sum(w)/(den/num) buckets
    val expected = rows.collect().map(r => math.min(10000L, r.getLong(1) * 10000L / 400L)).sum / 10000.0
    assert(math.abs(kept.length - expected) < expected * 0.2 + 10)
  }

  test("weightedSample rejects non-positive denominators") {
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(Seq((1L, 1L)).toDF("id", "w"), col("id"), col("w"), 1L, 0L, 1L)
    }
  }

  test("sampling filter reaches the parquet scan as a pushed/partial predicate") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = Sampling.hashSample(docs, col("doc_id"), 0.5, seed = 7)
      .queryExecution.executedPlan.toString
    // the bucket expression is deterministic, so Catalyst keeps it in the
    // scan-adjacent Filter (no Exchange between scan and filter)
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("curriculumOrder: closed-form vtime, determinism, and total order") {
    val d = Seq((7L, 3L), (8L, 1L)).toDF("id", "w")
    val out = Sampling.curriculumOrder(d, "id", col("w"), seed = 17L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // hand-computed: bucket(id,17) = ((id+17) % P * 48271) % P % 10000
    def b(id: Long) = ((id + 17) % 2147483647L * 48271L) % 2147483647L % 10000L
    assert(out(7L) == b(7L) * 1000000L / 3L)
    assert(out(8L) == b(8L) * 1000000L / 1L)
    val again = Sampling.curriculumOrder(d, "id", col("w"), seed = 17L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out == again)
  }

  test("curriculumOrder: every prefix interleaves sources proportionally to weight") {
    // even ids weight 3, odd ids weight 1 → early prefixes ~3:1 even-heavy
    val d = keys.withColumn("w", when(col("id") % 2 === 0, 3L).otherwise(1L))
    val ordered = Sampling.curriculumOrder(d, "id", col("w"), seed = 5L)
      .orderBy(col("__vtime"), col("id")).limit(4000)
      .collect().map(_.getLong(0))
    val evens = ordered.count(_ % 2 == 0)
    val share = evens.toDouble / ordered.length
    assert(share > 0.70 && share < 0.80, s"even share $share should track 3/(3+1)")
    // and the weight-1 source is not starved
    assert(ordered.length - evens > 500)
  }

  test("curriculumOrder: non-positive weight is a per-row data error") {
    val d = Seq((1L, 0L)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.curriculumOrder(d, "id", col("w"), seed = 1L).collect()
    }
    assert(e.getMessage != null)
  }

  test("curriculumOrder: reserved output column collision is a config error") {
    intercept[IllegalArgumentException] {
      Sampling.curriculumOrder(
        Seq((1L, 1L)).toDF("id", "__vtime"), "id", col("__vtime"), 1L)
    }
  }
}
