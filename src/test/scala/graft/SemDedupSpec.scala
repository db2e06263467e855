package graft

import org.apache.spark.sql.functions._

import graft.ops.{IvfIndex, SemDedup}

/** SemDeDup semantic dedup: IVF-cell blocking + within-cell cosine
  * near-dup + keep-best. Unit vectors at known angles make cosines and
  * cell assignments exact by construction.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def unit(deg: Double): Seq[Double] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r), math.sin(r))
  }

  // centroids (iterations = 0) = the two lowest-id vectors: 0° and 30°.
  // Cell boundary sits at 15°. Threshold 0.9996 ~ cos(1.62°): only the
  // 1°-apart (2,3), the 0.5°-apart (1,6), and the 0.2°-apart (4,5)
  // qualify — and (4,5) straddles the boundary.
  private def corpus() = Seq(
    (0L, unit(0), 1.0),     // centroid of cell 0
    (1L, unit(30), 1.0),    // centroid of cell 1
    (2L, unit(5), 0.5),     // cell 0
    (3L, unit(6), 2.0),     // cell 0; cos(1°) to id 2 -> near-dup pair
    (4L, unit(14.9), 1.0),  // cell 0, just inside the boundary
    (5L, unit(15.1), 1.0),  // cell 1 — cos(0.2°) to id 4 but NEVER compared
    (6L, unit(29.5), 1.0)   // cell 1; cos(0.5°) to id 1 -> near-dup pair
  ).toDF("id", "vec", "quality")

  private val Thr = 0.9996

  private def model() = IvfIndex.train(corpus(), "id", "vec", nLists = 2, iterations = 0)

  test("withinCellPairs: same-cell near-dups found once; cross-cell pairs never scored") {
    val pairs = SemDedup.withinCellPairs(model(), corpus(), "id", "vec", Thr)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    // only the two same-cell near-dup pairs qualify at Thr
    assert(pairs.contains((2L, 3L)) && pairs.contains((1L, 6L)))
    // the boundary-straddling near-identical pair (4, 5) is the documented
    // recall trade: cells block it, so it must NOT appear
    assert(!pairs.contains((4L, 5L)))
    // each pair exactly once, idA < idB
    val all = SemDedup.withinCellPairs(model(), corpus(), "id", "vec", Thr)
      .select("idA", "idB").as[(Long, Long)].collect().toSeq
    assert(all.size == all.toSet.size && all.forall(p => p._1 < p._2))
  }

  test("semanticDedup min-id default drops the higher id of each pair") {
    val kept = SemDedup.semanticDedup(model(), corpus(), "id", "vec", Thr)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 2L, 4L, 5L)) // 3 loses to 2, 6 loses to 1
  }

  test("semanticDedup keep-best: quality score overrides the min-id rule") {
    val kept = SemDedup.semanticDedup(model(), corpus(), "id", "vec", Thr,
        score = col("quality"))
      .select("id").as[Long].collect().toSet
    // pair (2,3): 3 has higher quality -> 2 dropped despite lower id;
    // pair (1,6): equal quality -> min id 1 kept
    assert(kept == Set(0L, 1L, 3L, 4L, 5L))
  }

  test("maxCellSize drops oversized cells as a logged coverage bound") {
    // cell 0 holds ids {0,2,3,4} (4 rows), cell 1 holds {1,5,6} (3 rows)
    val pairs = SemDedup.withinCellPairs(model(), corpus(), "id", "vec", Thr,
      maxCellSize = 3L)
    val got = pairs.select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 6L))) // cell 0 dropped entirely; cell 1 intact
  }

  test("plan: cell equi-join, no nested loop, no cross-cell comparison path") {
    val pairs = SemDedup.withinCellPairs(model(), corpus(), "id", "vec", Thr)
    pairs.collect()
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"within-cell pairing must never plan a nested loop:\n${p.take(1500)}")
    assert(p.contains("cell"), "join must key on the cell id")
  }

  test("PQ: centroid vectors encode to their own cell with zero error") {
    import graft.ops.Pq
    // 4 vectors of dim 4, blocks = 2, codebookSize = 4: every corpus
    // vector IS a codebook entry (iterations = 0, lowest-id init), so
    // each encodes to code (i, i) with reconstruction error exactly 0
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 5.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 5.0)),
      (2L, Seq(2.0, 2.0, 7.0, 7.0)),
      (3L, Seq(9.0, 9.0, 3.0, 3.0))
    ).toDF("id", "vec")
    val model = Pq.train(vecs, "id", "vec", blocks = 2, codebookSize = 4)
    assert(model.subDim == 2 && model.codebooks.length == 2)
    val out = vecs
      .withColumn("code", Pq.encode(col("vec"), model))
      .withColumn("errs", Pq.scaledSqError(col("vec"), col("code"), model))
      .select("id", "code", "errs")
      .as[(Long, Seq[Int], Seq[Long])].collect().sortBy(_._1)
    for ((id, code, errs) <- out) {
      assert(code == Seq(id.toInt, id.toInt), s"id $id got code $code")
      assert(errs == Seq(0L, 0L), s"id $id got errors $errs")
    }
    // a non-codebook vector picks its nearest block centroids and pays
    // a positive, exactly-computable error
    val probe = Seq((9L, Seq(1.1, 0.0, 5.0, 0.1))).toDF("id", "vec")
    val (pc, pe) = probe
      .withColumn("code", Pq.encode(col("vec"), model))
      .withColumn("errs", Pq.scaledSqError(col("vec"), col("code"), model))
      .select("code", "errs").as[(Seq[Int], Seq[Long])].head()
    assert(pc == Seq(0, 0)) // nearest to vec 0's blocks
    // block errors: (0.1^2 + 0) and (0 + 0.1^2), 1e12-scaled with the floor formula
    val want = math.floor((1.1 - 1.0) * (1.1 - 1.0) * 1e12 + 0.5).toLong
    assert(pe == Seq(want, math.floor(0.1 * 0.1 * 1e12 + 0.5).toLong))
  }

  test("PQ ADC search: exact table-lookup distances on a self-codebook corpus") {
    import graft.ops.Pq
    // every corpus vector is a codebook entry, so a neighbor's ADC from
    // query q is the scaled TRUE squared distance q -> neighbor
    val vecs = Seq(
      (0L, Seq(0.0, 0.0, 0.0, 0.0)),
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),   // d2 = 1
      (2L, Seq(0.0, 2.0, 2.0, 0.0)),   // d2 = 8
      (3L, Seq(3.0, 0.0, 0.0, 3.0))    // d2 = 18
    ).toDF("id", "vec")
    val model = Pq.train(vecs, "id", "vec", blocks = 2, codebookSize = 4)
    val out = Pq.adcSearch(model, vecs, vecs.filter($"id" === 0L), "id", "vec", 3)
      .select("rank", "neighbor_id", "scaled_adc")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1, 1L, 1000000000000L),
      (2, 2L, 8000000000000L),
      (3, 3L, 18000000000000L)))
  }

  test("IVF-PQ search: coarse routing bounds candidates; full probe equals plain ADC") {
    import graft.ops.{IvfIndex, Pq}
    val vecs = Seq(
      (0L, Seq(0.0, 0.0, 0.0, 0.0)),
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 2.0, 2.0, 0.0)),
      (3L, Seq(3.0, 0.0, 0.0, 3.0))
    ).toDF("id", "vec")
    val coarse = IvfIndex.train(vecs, "id", "vec", nLists = 4, iterations = 0)
    val pq = Pq.train(vecs, "id", "vec", blocks = 2, codebookSize = 4)
    val q0 = vecs.filter($"id" === 0L)
    // every vector is its own coarse cell; nProbe = 1 probes only the
    // query's own cell, whose sole member is the query itself -> empty
    val routed = Pq.ivfPqSearch(coarse, pq, vecs, q0, "id", "vec", k = 3, nProbe = 1)
    assert(routed.count() == 0)
    // probing every cell recovers exactly the un-routed ADC result
    val full = Pq.ivfPqSearch(coarse, pq, vecs, q0, "id", "vec", k = 3, nProbe = 4)
      .select("rank", "neighbor_id", "scaled_adc")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    val plain = Pq.adcSearch(pq, vecs, q0, "id", "vec", k = 3)
      .select("rank", "neighbor_id", "scaled_adc")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(full == plain && full.nonEmpty)
  }

  test("PQ build/query split: persisted model + codes reproduce ivfPqSearch exactly") {
    import graft.ops.{IvfIndex, Pq}
    val vecs = Seq(
      (0L, Seq(0.0, 0.0, 0.0, 0.0)),
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 2.0, 2.0, 0.0)),
      (3L, Seq(3.0, 0.0, 0.0, 3.0))
    ).toDF("id", "vec")
    val coarse = IvfIndex.train(vecs, "id", "vec", nLists = 4, iterations = 0)
    val pq = Pq.train(vecs, "id", "vec", blocks = 2, codebookSize = 4)
    val dir = java.nio.file.Files.createTempDirectory("pq_split").toString
    // model round-trips bit-exact
    Pq.save(pq, spark, s"$dir/model")
    val pq2 = Pq.load(spark, s"$dir/model")
    assert(pq2.blocks == pq.blocks && pq2.subDim == pq.subDim)
    assert(pq2.codebooks.map(_.centroids.toSeq).toSeq ==
      pq.codebooks.map(_.centroids.toSeq).toSeq)
    // codes persist; query half over the RELOADED model + codes equals the
    // one-shot path (build once, query many — across jobs)
    Pq.encodeCorpus(coarse, pq, vecs, "id", "vec")
      .write.mode("overwrite").parquet(s"$dir/codes")
    val q0 = vecs.filter($"id" === 0L)
    val fromCodes = Pq.ivfPqSearchFromCodes(coarse, pq2,
        spark.read.parquet(s"$dir/codes"), q0, "id", "vec", k = 3, nProbe = 4)
      .select("rank", "neighbor_id", "scaled_adc")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    val oneShot = Pq.ivfPqSearch(coarse, pq, vecs, q0, "id", "vec", k = 3, nProbe = 4)
      .select("rank", "neighbor_id", "scaled_adc")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(fromCodes == oneShot && fromCodes.nonEmpty, s"$fromCodes vs $oneShot")
  }

  test("crossSetPairs: only corpus-x-eval same-cell pairs, with carry columns") {
    val full = corpus()
    val evalSet = full.filter($"id".isin(3L, 5L))
    val corp = full.filter(!$"id".isin(3L, 5L))
    val got = SemDedup.crossSetPairs(model(), corp, evalSet, "id", "vec", Thr,
        carryCols = Seq("quality"))
      .select("corpus_id", "eval_id", "quality")
      .as[(Long, Long, Double)].collect().toSet
    // eval 3 (6°, cell 0) matches corpus 2 (5°, cell 0) at cos(1°).
    // eval 5 (15.1°, cell 1) is cos(0.2°) from corpus 4 (14.9°) but they
    // straddle the cell boundary → blocked (the documented recall trade).
    // corpus-x-corpus near-dup (1, 6) must never appear.
    assert(got == Set((2L, 3L, 0.5)))
  }

  test("crossSetPairs: maxCellSize caps the corpus side only") {
    val full = corpus()
    val evalSet = full.filter($"id".isin(3L, 5L))
    val corp = full.filter(!$"id".isin(3L, 5L))
    val got = SemDedup.crossSetPairs(model(), corp, evalSet, "id", "vec", Thr,
      maxCellSize = 1L)
    // corpus cell 0 holds {0, 2, 4} > 1 → dropped, so the (2, 3) pair goes
    assert(got.count() == 0)
  }

  test("q_semantic_dedup plan is cell-blocked too (driver-query shape)") {
    val out = SparkEntry.queries("q_semantic_dedup")(spark, sf)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"q_semantic_dedup must never compare across cells:\n${p.take(1500)}")
  }
}
