package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the properties that decide 100 TB behavior —
  * filters/projections reaching the parquet scan, small dims broadcast,
  * one-shuffle as-of join, codegen coverage — asserted so they can't
  * silently regress.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): SparkPlan = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan
  }
  private def planStr(df: DataFrame): String = plan(df).toString

  test("parquet filter pushdown: shipdate predicate reaches the scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-01") && col("l_quantity") > 10)
      .select("l_orderkey")
    val leaves = plan(df).collectLeaves().mkString("\n")
    assert(leaves.contains("PushedFilters") && leaves.contains("l_shipdate"),
      s"no pushed filter in:\n$leaves")
    assert(leaves.contains("ReadSchema") && !leaves.contains("l_extendedprice"),
      "projection not pruned to required columns")
  }

  test("broadcast join: dimension tables broadcast, no shuffle of the small side") {
    val p = planStr(SparkEntry.queries("q_join_broadcast")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin in:\n${p.take(2000)}")
  }

  test("5-way join plan broadcasts nation and region") {
    val p = planStr(SparkEntry.queries("q_join_5way")(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q_gap_fill / q_funnel / q_scd2: equi-joins only, never a nested loop") {
    for (q <- Seq("q_gap_fill", "q_funnel", "q_scd2")) {
      val p = planStr(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q should plan equi-joins only:\n${p.take(2000)}")
    }
  }

  test("q_value_histogram: shard histograms merge by hash aggregation, p50 side broadcasts") {
    val p = planStr(SparkEntry.queries("q_value_histogram")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"p50 bucket side should broadcast:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("runtime bloom filter: selective build side prunes the probe scan pre-shuffle") {
    // the q_runtime_bloom regime: shuffle join (no broadcast), zero
    // app-side scan floor so the tiny test table qualifies
    val tuned = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "512MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val urgent = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000)
        .select("o_orderkey")
      val joined = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val p = planStr(joined)
      assert(p.contains("might_contain"),
        s"expected a runtime bloom filter probe in the plan:\n${p.take(3000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("as-of join is a single shuffle (no join explosion node)") {
    import graft.ops.AsOfJoin
    import spark.implicits._
    val l = Seq((1, 10), (2, 20)).toDF("k", "t")
    val r = Seq((1, 5, 1.0), (2, 15, 2.0)).toDF("k", "rt", "v")
    val out = AsOfJoin.backward(l, r, "k", "k", "t", "rt", Seq("v"))
    val p = planStr(out)
    assert(!p.contains("Join"), s"as-of should be window-based, not a join:\n${p.take(1500)}")
    val shuffles = plan(out).collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(shuffles.size <= 2, s"expected at most union+window shuffles, got ${shuffles.size}")
  }

  test("log scan: only required capture groups in scan output; codegen'd consumer") {
    val df = spark.read.format("log")
      .option("pattern", "(\\d{6})\\s(\\d{2}:\\d{2}:\\d{2})\\s+(\\d+)\\s(\\w+)\\s+(.+)")
      .option("fieldNames", "date, time, pid, action, query")
      .option("dataTypes", "DATE, TIME, INT, VARCHAR, VARCHAR")
      .option("dateFormat", "yyMMdd")
      .load(fixture("mysql.log"))
      .groupBy("action").count()
    val p = planStr(df)
    // AQE's plan string marks whole-stage-codegen stages with "*(n)"
    assert(p.contains("*("), s"aggregation should be codegen'd:\n${p.take(800)}")
    val leaf = plan(df).collectLeaves().head.toString
    assert(leaf.contains("required=action") || leaf.contains("Output [1]"),
      s"scan should output only 'action':\n$leaf")
  }

  test("log scan: supported predicates pushed into the reader, no residual Filter") {
    val df = spark.read.format("log")
      .option("pattern", "(\\d{6})\\s(\\d{2}:\\d{2}:\\d{2})\\s+(\\d+)\\s(\\w+)\\s+(.+)")
      .option("fieldNames", "date, time, pid, action, query")
      .option("dataTypes", "DATE, TIME, INT, VARCHAR, VARCHAR")
      .option("dateFormat", "yyMMdd")
      .load(fixture("mysql.log"))
      .filter(col("action") === "Query" && col("pid") > 0)
      .select("pid")
    val p = plan(df)
    val leaf = p.collectLeaves().head.toString
    assert(leaf.contains("EqualTo(action,Query)") && leaf.contains("GreaterThan(pid,0)"),
      s"predicates should be claimed by the scan:\n$leaf")
    // fully-claimed predicates leave NO Catalyst Filter node in the plan
    val filters = p.collect { case f: org.apache.spark.sql.execution.FilterExec => f }
    assert(filters.isEmpty, s"expected no residual Filter, got:\n${filters.mkString("\n")}")
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 1, 21, 21))
  }

  test("q_log_partitioned: DATE range claimed as partition filters, no residual Filter") {
    val df = SparkEntry.queries("q_log_partitioned")(spark, sf)
    val p = plan(df)
    val leaf = p.collectLeaves().head.toString
    assert(leaf.contains("partitionFilters=[") &&
      leaf.contains("GreaterThanOrEqual(dt,2024-01-08)") &&
      leaf.contains("LessThanOrEqual(dt,2024-01-14)"),
      s"week range should be claimed as partition filters:\n$leaf")
    val filters = p.collect { case f: org.apache.spark.sql.execution.FilterExec => f }
    assert(filters.isEmpty, s"expected no residual Filter, got:\n${filters.mkString("\n")}")
  }

  test("minhash signature pipeline contains the one-pass expressions (no 64x transform)") {
    import graft.ops.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sigPlan = docs.select(Dedup.minhashSignature(col("text"), 3, 64))
      .queryExecution.optimizedPlan.toString
    assert(sigPlan.contains("minhash_signature") && sigPlan.contains("hashed_shingles"),
      s"expected custom one-pass expressions in:\n${sigPlan.take(800)}")
  }

  test("window top-k gets partial-limit pushdown (WindowGroupLimit)") {
    // rank<=k filters push a per-partition top-k below the shuffle — the
    // reason Window+row_number top-k is scale-safe on 100 TB
    val p = planStr(SparkEntry.queries("q_window_topk")(spark, sf))
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n${p.take(1500)}")
  }

  test("brute-force topk broadcasts the query side") {
    import graft.ops.Similarity
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = planStr(Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", 3))
    assert(p.contains("BroadcastNestedLoopJoin"), "query side should be broadcast")
  }

  test("minhash candidate plan: bucket cap is sort-free in the logical plan") {
    // the degenerate-bucket guard is a hash-aggregate + anti-join, NOT a
    // window count — a window would sort every banded row at corpus scale
    import graft.ops.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .queryExecution.optimizedPlan
    val sorts = plan.collect { case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s }
    val windows = plan.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(sorts.isEmpty && windows.isEmpty,
      s"bucket cap must not sort banded rows: sorts=${sorts.size} windows=${windows.size}")
  }

  test("simhash candidate plan: bucket cap is sort-free in the logical plan") {
    // same invariant as the minhash cap: hash-aggregate + anti-join, never a
    // window/sort over the banded rows
    import graft.ops.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = Dedup.simhashCandidatePairs(docs, "doc_id", "text")
      .queryExecution.optimizedPlan
    val sorts = plan.collect { case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s }
    val windows = plan.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(sorts.isEmpty && windows.isEmpty,
      s"bucket cap must not sort banded rows: sorts=${sorts.size} windows=${windows.size}")
  }

  test("range join is a shuffled equi-join, not a nested-loop/cartesian") {
    val p = planStr(SparkEntry.queries("q_range_join")(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketized range join must not fall back to O(n*m):\n${p.take(800)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"expected an equi-join:\n${p.take(800)}")
  }

  test("decontaminate broadcasts the eval-set side") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = planStr(graft.ops.Decontaminate.contaminated(
      docs, docs.filter(col("doc_id") < 20), "doc_id", "text", 8))
    assert(p.contains("BroadcastHashJoin"), s"eval side should broadcast:\n${p.take(800)}")
  }

  test("incremental dedup: bloom prefilter evaluates scan-side, before any exchange") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.ops.Dedup.incrementalDedup(
      docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0),
      "doc_id",
      xxhash64(graft.functions.TextFunctions.contentFingerprint(col("text"))))
    val p = plan(out)
    // AQE wraps finished stages in leaf QueryStageExec nodes — flatten
    // through them so the traversal sees the whole physical tree
    def flatten(n: SparkPlan): Seq[SparkPlan] =
      n +: (n.children.flatMap(flatten) ++ (n match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => flatten(q.plan)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          flatten(a.executedPlan)
        case _ => Nil
      }))
    val nodes = flatten(p)
    // the bloom test must sit in a Filter whose subtree has NO shuffle —
    // i.e. the definitely-new routing happens before any exchange
    val bloomFilters = nodes.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("bloom_might_contain") => f
    }
    assert(bloomFilters.nonEmpty, s"no scan-side bloom filter in:\n${p.toString.take(1500)}")
    for (f <- bloomFilters) {
      val shuffleBelow = flatten(f).drop(1).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s
      }
      assert(shuffleBelow.isEmpty, "bloom prefilter must run before any shuffle")
    }
  }

  test("q_incremental_dedup runs the production broadcast-handle bloom path") {
    // the driver query must exercise build-once/extend/broadcast, i.e. the
    // plan carries BloomMightContain (which holds a Broadcast handle, not
    // filter bytes) — not some ad-hoc shape
    val out = SparkEntry.queries("q_incremental_dedup")(spark, sf)
    assert(planStr(out).contains("bloom_might_contain"),
      "q_incremental_dedup plan must contain the broadcast-handle bloom expression")
  }

  test("q_dpp: the fact scan carries a dynamic partition pruning subquery") {
    val (fact, dim) = SparkEntry.dppInput(spark, sf)
    val out = fact.join(dim.filter(org.apache.spark.sql.functions.col("wgt") <= 2), "event_type")
      .groupBy("event_type").count()
    val p = out.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected dynamicpruning in fact scan:\n${p.take(1500)}")
  }

  test("q_meta_count: COUNT/MIN/MAX are answered from parquet footers (PushedAggregation)") {
    val tuned = Map(
      "spark.sql.sources.useV1SourceList" -> "",
      "spark.sql.parquet.aggregatePushdown" -> "true")
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val p = SparkEntry.metaCountFrame(spark, sf)
        .queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [COUNT(*)"),
        s"expected footer-stat aggregation pushdown in:\n${p.take(1500)}")
      assert(p.contains("MIN(l_orderkey)") && p.contains("MAX(l_partkey)"),
        "min/max must ride the pushed aggregation too")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q_streaks: the per-user best-island rank filter gets WindowGroupLimit pushdown") {
    val p = planStr(SparkEntry.queries("q_streaks")(spark, sf))
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n${p.take(1500)}")
  }

  test("q_skew_report: global top-5 plans as TakeOrdered partial top-k, not a global sort") {
    val p = planStr(SparkEntry.queries("q_skew_report")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n${p.take(1500)}")
  }

  test("q_array_funcs: collect_list runs as ObjectHashAggregate, not a sort-based fallback") {
    val p = planStr(SparkEntry.queries("q_array_funcs")(spark, sf))
    assert(p.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate for collect_list in:\n${p.take(1500)}")
  }

  test("q_group_sample: exact-k rank filter gets WindowGroupLimit pushdown") {
    val p = planStr(SparkEntry.queries("q_group_sample")(spark, sf))
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n${p.take(1500)}")
  }

  test("q_domain_cap: per-source rank filter gets WindowGroupLimit pushdown") {
    val p = planStr(SparkEntry.queries("q_domain_cap")(spark, sf))
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n${p.take(1500)}")
  }

  test("bm25: per-query top-k gets WindowGroupLimit; query side broadcasts") {
    import graft.ops.Bm25
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val queries = docs.limit(2)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val (out, release) = Bm25.bm25TopK(docs, "doc_id", "text",
      queries, "qid", "qtext", 5)
    val p = planStr(out)
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin"), "query-term side should broadcast")
    release()
  }

  test("q_seq_pack: no single-partition exchange anywhere in the plan") {
    // the whole point of the two-pass prefix sum — a global Window would
    // plan Exchange SinglePartition and funnel the dataset into one task
    val p = planStr(SparkEntry.queries("q_seq_pack")(spark, sf))
    assert(!p.contains("SinglePartition"), s"single-partition exchange in:\n${p.take(2000)}")
  }

  test("fuzzy blocking: pair generation is an equi-join on the block key, never all-pairs") {
    // the entity-resolution discipline as plan shape — the Levenshtein
    // verify must run as a post-join filter on block-equal pairs, not as
    // a join condition that degrades to a nested loop
    for (q <- Seq("q_fuzzy_match", "q_entity_clusters")) {
      val p = planStr(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
        s"$q pairing must stay a hash/equi-join plan:\n${p.take(1500)}")
    }
  }

  test("q_itemsets: A-priori dims broadcast; basket self-join never a cartesian") {
    // the 1-row n_baskets scalar rides a broadcast nested loop by design;
    // the row-producing joins (frequent-item prune, support readback,
    // within-basket pairing) must all be hash equi-joins
    val p = planStr(SparkEntry.queries("q_itemsets")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"frequent-item prune should broadcast:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n${p.take(2000)}")
  }

  test("q_winsorize: clip bounds broadcast back to the fact side") {
    val p = planStr(SparkEntry.queries("q_winsorize")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"per-language bounds should broadcast:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_semantic_keepbest: never a nested loop or cartesian") {
    val p = planStr(SparkEntry.queries("q_semantic_keepbest")(spark, sf))
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"q_semantic_keepbest must stay a hash/equi-join plan:\n${p.take(1500)}")
  }

  test("paragraph-dedup composition: first-occurrence join is a hash equi-join on the window hash") {
    // the driver query eagerly localCheckpoints (to release its persisted
    // chunk pass), which cuts the inspectable lineage — assert on the same
    // chunk -> first-occurrence -> join composition qParagraphDedup builds
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val chunks = graft.ops.Chunking.chunkTokens(docs, "text", 32, 32)
      .select(col("lang"),
        (col("doc_id") * 1000000L + col("chunk_idx")).as("__ik"),
        xxhash64(col("chunk_text")).as("__h"),
        size(col("chunk_tokens")).cast("long").as("__nt"))
    val first = chunks.groupBy("__h").agg(org.apache.spark.sql.functions.min("__ik").as("__fk"))
    val joined = chunks.join(first, Seq("__h")).groupBy("lang").count()
    val p = planStr(joined)
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"first-occurrence join must be an equi-join:\n${p.take(1500)}")
    assert(p.contains("__h"), "join must key on the window hash")
  }

  test("cross-corpus candidate stage: band join is an equi-join, never a nested loop") {
    // the blocking stage is public (crossCorpusCandidatePairs) precisely so
    // its plan is inspectable before the lineage-cutting checkpoint in
    // crossCorpusNearDedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (cand, release) = graft.ops.Dedup.crossCorpusCandidatePairs(
      docs.filter(col("doc_id") % 3 =!= 0), docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text")
    val p = planStr(cand)
    release()
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"cross-corpus banding must never plan a nested loop:\n${p.take(1500)}")
    assert(p.contains("__bkey"), "candidates must join on (band, bucket)")
  }

  test("q_chunk_split: chunk explosion stays inside whole-stage codegen") {
    val p = planStr(SparkEntry.queries("q_chunk_split")(spark, sf))
    assert(p.contains("Generate"), "expected a Generate (posexplode) node")
    assert(!p.contains("BatchEvalPython") && !p.contains("mapPartitions"),
      "chunking must be pure codegen builtins")
  }

  test("q_tpch_q21: quantifier pair plans as semi/anti hash joins, never a nested loop") {
    val p = planStr(SparkEntry.queries("q_tpch_q21")(spark, sf))
    assert(p.contains("LeftSemi"), s"EXISTS should plan LeftSemi:\n${p.take(1500)}")
    assert(p.contains("LeftAnti"), s"NOT EXISTS should plan LeftAnti:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "correlated quantifiers must hash-join on the orderkey")
  }

  test("q_tpch_q2: correlated MIN decorrelates — no cartesian, offer min as aggregate+join") {
    val p = planStr(SparkEntry.queries("q_tpch_q2")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"Q2's correlated subquery must decorrelate to joins:\n${p.take(1500)}")
  }

  test("q_tpch_q19: disjunctive predicate stays a single broadcast join pass") {
    val p = planStr(SparkEntry.queries("q_tpch_q19")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "part side should broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_pipeline_pretrain: one visible plan — broadcast decontamination, no nested loop") {
    val p = planStr(SparkEntry.queries("q_pipeline_pretrain")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "eval side must broadcast into the anti-join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"chain must stay equi-joins:\n${p.take(1500)}")
    assert(p.contains("TakeOrderedAndProject"), "schedule head must be TakeOrdered, not a global sort")
  }

  test("q_posexplode: generator runs scan-side as a Generate node, no UDF") {
    val p = planStr(SparkEntry.queries("q_posexplode")(spark, sf))
    assert(p.contains("Generate"), "expected Generate (posexplode)")
    assert(!p.contains("BatchEvalPython"))
  }

  test("q_centroid_classify: centroid table broadcasts; never a cartesian") {
    val p = planStr(SparkEntry.queries("q_centroid_classify")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"bounded (labels x dim) centroid table should broadcast:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_link_predict: wedge/degree/anti joins are all hash equi-joins") {
    val p = planStr(SparkEntry.queries("q_link_predict")(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"adjacency self-join must key on the center node:\n${p.take(1500)}")
    assert(p.contains("LeftAnti"), "existing edges must anti-join out")
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 must be TakeOrdered, not a global sort")
  }

  test("q_rake_keywords: tokenize runs once (materialized), top-k TakeOrdered") {
    val p = planStr(SparkEntry.queries("q_rake_keywords")(spark, sf))
    // r16: the tokenize + per-doc window pass is collapsed to per-phrase
    // token arrays and materialized ONCE (Rake.keywords `runs`); the
    // returned plan must consume the materialized RDD and never re-run
    // the regexp tokenizer (it used to run 3x, once per consumer)
    assert(p.contains("ExistingRDD"),
      s"phrase runs must be materialized once:\n${p.take(1500)}")
    assert(!p.toLowerCase.contains("regexp_extract_all"),
      s"tokenize must not re-run in the final plan:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 must be TakeOrdered, not a global sort")
  }

  test("q_attribution / q_click_paths: one window pass, no joins at all") {
    for (q <- Seq("q_attribution", "q_click_paths")) {
      val p = planStr(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("Join"), s"$q must stay join-free:\n${p.take(1500)}")
      assert(p.contains("Window"), s"$q should carry the window pass")
    }
  }

  test("q_acf / q_mann_whitney: moment/histogram frames broadcast back") {
    for (q <- Seq("q_acf", "q_mann_whitney")) {
      val p = planStr(SparkEntry.queries(q)(spark, sf))
      assert(p.contains("BroadcastHashJoin"),
        s"$q bounded side should broadcast:\n${p.take(1500)}")
      assert(!p.contains("CartesianProduct"))
    }
  }
}
