package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.ops.{Boilerplate, Chunking, Packing}

/** Specs for the round-5 pipeline operators: distributed prefix-sum
  * packing, overlapping chunking, corpus boilerplate n-grams, and int8
  * embedding quantization.
  */
class PipelineOpsSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------------- packing

  test("prefix sum matches a driver-side scan regardless of partitioning") {
    val rows = (0L until 1000L).map(i => (i, (i * 7 + 3) % 50))
    val df = rows.toDF("id", "v").repartition(7) // scrambled input layout
    val (summed, release) = Packing.withExclusivePrefixSum(df, "id", "v")
    val got = summed
      .select("id", "cum_excl").as[(Long, Long)].collect().sortBy(_._1)
    release()
    val want = rows.map(_._2).scanLeft(0L)(_ + _).init
    assert(got.map(_._1).toSeq == (0L until 1000L))
    assert(got.map(_._2).toSeq == want)
  }

  test("prefix sum handles nulls (as 0), empty partitions, and empty input") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("id", "v").repartition(16) // more partitions than rows
    val (summed, release) = Packing.withExclusivePrefixSum(df, "id", "v")
    val got = summed
      .select("id", "cum_excl").as[(Long, Long)].collect().sortBy(_._1)
    release()
    assert(got.toSeq == Seq((1L, 0L), (2L, 5L), (3L, 5L)))
    val (empty, releaseEmpty) = Packing.withExclusivePrefixSum(
      Seq.empty[(Long, Long)].toDF("id", "v"), "id", "v")
    assert(empty.count() == 0)
    releaseEmpty()
  }

  test("packBins: bins partition the token axis; crosses flags boundary docs") {
    val df = Seq((1L, 60L), (2L, 50L), (3L, 100L), (4L, 10L))
      .toDF("id", "tokens")
    // offsets: 0, 60, 110, 210; budget 100 ->
    //   doc1 bin0 (0..59, inside), doc2 bin0 (60..109, crosses),
    //   doc3 bin1 (110..209, crosses), doc4 bin2 (210..219, inside)
    val (packed, release) = Packing.packBins(df, "id", "tokens", 100L)
    val got = packed
      .select("id", "bin", "crosses").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    release()
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 1L), (3L, 1L, 1L), (4L, 2L, 0L)))
  }

  test("scale probe: 1M-row prefix sum verified against the closed form, no collect") {
    // v = id  =>  cum_excl = id*(id-1)/2; verified by a distributed filter,
    // never materializing the result on the driver
    val df = spark.range(0, 1000000).toDF("id")
      .withColumn("v", col("id")).repartition(13)
    val (summed, release) = Packing.withExclusivePrefixSum(df, "id", "v")
    val wrong = summed
      .filter(col("cum_excl") =!= col("id") * (col("id") - 1) / 2)
      .count()
    release()
    assert(wrong == 0L)
  }

  test("packing quality: length-sorted order never crosses more boundaries than arbitrary order") {
    // the reason the op parameterizes orderCol: sorting by length packs
    // similar-size docs together, reducing windows split across documents
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("tokens"))
      // length-desc order encoded as a sortable key (tokens bounded << 1e6)
      .withColumn("by_len", -col("tokens") * 1000000L + col("doc_id"))
    def crossings(orderCol: String): Long = {
      val (packed, release) = Packing.packBins(docs, orderCol, "tokens", 256L)
      val n = packed.agg(sum("crosses")).head().getLong(0)
      release(); n
    }
    val (byId, byLen) = (crossings("doc_id"), crossings("by_len"))
    assert(byLen <= byId, s"length-sorted packing crossed more: $byLen > $byId")
  }

  test("no single-partition global window in the packing plan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), length(col("text")).cast("long").as("tokens"))
    val (packed, releasePlan) = Packing.packBins(docs, "doc_id", "tokens", 512L)
    val plan = packed.queryExecution.executedPlan.toString
    releasePlan()
    assert(!plan.contains("Window"), s"plan funnels through a global window:\n$plan")
    assert(plan.contains("rangepartitioning"), s"expected a range repartition:\n$plan")
  }

  // ------------------------------------------------------------ chunking

  test("chunkTokens: covering windows with the declared size and stride") {
    val df = Seq((1L, (1 to 80).map(i => s"t$i").mkString(" ")), (2L, "a b"), (3L, ""))
      .toDF("id", "text")
    val chunks = Chunking.chunkTokens(df, "text", 32, 24)
      .select("id", "chunk_idx", "chunk_tokens").collect()
    val byId = chunks.groupBy(_.getLong(0))
    // 80 tokens -> ceil((80-32)/24)+1 = 3 chunks at offsets 0/24/48
    val c1 = byId(1L).sortBy(_.getInt(1))
    assert(c1.length == 3)
    assert(c1.map(_.getSeq[String](2).length).toSeq == Seq(32, 32, 32))
    assert(c1(1).getSeq[String](2).head == "t25") // offset 24, 1-based token 25
    assert(c1(2).getSeq[String](2).last == "t80") // final window reaches the end
    assert(byId(2L).length == 1 && byId(2L).head.getSeq[String](2) == Seq("a", "b"))
    assert(!byId.contains(3L)) // zero tokens -> zero chunks
  }

  test("chunkTokens covers every token: union of windows == token stream") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val chunked = Chunking.chunkTokens(docs, "text", 32, 24)
    // consecutive windows overlap by exactly chunkSize - stride = 8 tokens,
    // so dropping the first 8 of every non-first chunk is an exact cover
    // (the covering rule guarantees the last chunk is >= 9 tokens long)
    val reassembled = chunked
      .select(col("doc_id"), col("chunk_idx"),
        when(col("chunk_idx") === 0, col("chunk_tokens"))
          .otherwise(slice(col("chunk_tokens"), 9, 32)).as("novel"))
      .groupBy("doc_id")
      .agg(sum(size(col("novel"))).as("n"))
    val expected = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("n0"))
    val joined = reassembled.join(expected, "doc_id")
      .filter(col("n") =!= col("n0")).count()
    assert(joined == 0, "chunk windows must cover each token exactly once after overlap removal")
  }

  // ------------------------------------------------------- boilerplate

  test("commonNgrams finds the planted boilerplate and nothing else") {
    val footer = "all rights reserved worldwide"
    val docs = (1 to 40).map { i =>
      val unique = s"alpha$i beta$i gamma$i delta$i epsilon$i"
      (i.toLong, if (i <= 30) s"$unique $footer" else unique)
    }.toDF("doc_id", "text")
    val common = Boilerplate.commonNgrams(docs, "text", 3, 0.5)
      .as[(String, Long)].collect().toMap
    // 3-grams fully inside the footer appear in 30/40 = 75% of docs; the
    // bridge grams (unique suffix + footer prefix) are each unique.
    assert(common.keySet == Set(
      "all rights reserved", "rights reserved worldwide"))
    assert(common.values.toSet == Set(30L))
    val shares = Boilerplate
      .withBoilerplateShare(docs, "doc_id", "text", 3,
        Boilerplate.commonNgrams(docs, "text", 3, 0.5))
      .select("doc_id", "boilerplate_share").as[(Long, Double)].collect().toMap
    assert(shares(40L) == 0.0)
    assert(shares(1L) > 0.2 && shares(1L) < 0.5) // 2 common of 7 grams
  }

  test("hashed boilerplate path agrees with the string-gram path") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val common = Boilerplate.commonNgrams(docs, "text", 3, 0.02)
    val slow = Boilerplate.withBoilerplateShare(docs, "doc_id", "text", 3, common)
      .filter(col("n_grams") > 0)
      .select("doc_id", "n_grams", "n_common")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val (fastDf, release) = Boilerplate.hashedBoilerplateShares(
      docs, "doc_id", "text", 3, 0.02)
    val fast = fastDf.select("doc_id", "n_grams", "n_common")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    release()
    assert(fast == slow)
  }

  test("hashed boilerplate guard: oversized common set falls back to an unpinned join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // pathological threshold: minDocFraction tiny -> every gram in >= 2
    // docs is "common" (a huge set at web scale); with the guard forced
    // (maxBroadcastGrams = 0) the join must NOT pin a broadcast hint...
    val (guarded, releaseG) = Boilerplate.hashedBoilerplateShares(
      docs, "doc_id", "text", 3, 1e-9, maxBroadcastGrams = 0L)
    assert(!guarded.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "guard must drop the broadcast pin above the threshold")
    // ...and the result must be identical to the default pinned path
    val got = guarded.select("doc_id", "n_grams", "n_common")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    releaseG()
    val (pinned, releaseP) = Boilerplate.hashedBoilerplateShares(
      docs, "doc_id", "text", 3, 1e-9)
    assert(pinned.queryExecution.analyzed.toString.contains("ResolvedHint"))
    val want = pinned.select("doc_id", "n_grams", "n_common")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    releaseP()
    assert(got == want)
  }

  test("prefix-sum debug mode rejects a non-unique order column") {
    val df = Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Packing.withExclusivePrefixSum(df, "id", "v", assertUniqueOrder = true)
    }
    assert(e.getMessage.contains("not a total order"))
    // without the flag the misuse is the caller's documented responsibility
    val (summed, release) = Packing.withExclusivePrefixSum(df, "id", "v")
    assert(summed.count() == 3)
    release()
    // and a unique key passes the assertion
    val ok = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    val (okSummed, okRelease) =
      Packing.withExclusivePrefixSum(ok, "id", "v", assertUniqueOrder = true)
    assert(okSummed.select("cum_excl").as[Long].collect().sorted.toSeq == Seq(0L, 10L))
    okRelease()
  }

  test("boilerplate share join broadcasts the common-gram side") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val common = Boilerplate.commonNgrams(docs, "text", 3, 0.01)
    val plan = Boilerplate.withBoilerplateShare(docs, "doc_id", "text", 3, common)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"common-gram join should broadcast:\n$plan")
  }

  // ------------------------------------------------------- unigram LM

  test("tokenEntropy: exact integer arithmetic matches the closed form") {
    import graft.ops.NgramLm
    val df = Seq(
      (1L, "a a a a"),      // H = 0: one repeated token
      (2L, "a b c d"),      // H = ln(4): all distinct
      (3L, "a a b b"),      // H = ln(2)
      (4L, "")              // zero tokens: absent
    ).toDF("doc_id", "text")
    val out = NgramLm.tokenEntropy(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    def s(x: Double) = math.floor(math.log(x) * 1e6 + 0.5).toLong
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((4L, 4 * s(4) - 4 * s(4))))           // = 0
    assert(out(2L) == ((4L, 4 * s(4) - 0L)))                 // c=1 terms: s(1)=0
    assert(out(3L) == ((4L, 4 * s(4) - 2 * (2 * s(2)))))     // two tokens, c=2 each
    // recovered H values land where theory says
    assert(math.abs(out(1L)._2 / (4 * 1e6) - 0.0) < 1e-5)
    assert(math.abs(out(2L)._2 / (4 * 1e6) - math.log(4)) < 1e-5)
    assert(math.abs(out(3L)._2 / (4 * 1e6) - math.log(2)) < 1e-5)
  }

  test("unigram scores match the closed form on a known corpus") {
    import graft.ops.NgramLm
    // corpus tokens: a:3, b:2, c:1 -> total 6
    val docs = Seq((1L, "a a b"), (2L, "a b c"), (3L, "...")).toDF("doc_id", "text")
    val (scores, release) = NgramLm.unigramScores(docs, "doc_id", "text")
    val got = scores.select("doc_id", "n_tokens", "scaled_logprob")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    release()
    def s(x: Double) = math.floor(math.log(x) * 1e6 + 0.5).toLong
    val lnT = s(6)
    assert(got == Seq(
      (1L, 3L, 2 * s(3) + s(2) - 3 * lnT),
      (2L, 3L, s(3) + s(2) + s(1) - 3 * lnT)))
    // doc 3 has zero tokens -> excluded entirely, not scored as empty-string
  }

  test("unigram scores are partition-order invariant") {
    import graft.ops.NgramLm
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def run(d: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val (scores, release) = NgramLm.unigramScores(d, "doc_id", "text")
      val m = scores.select("doc_id", "scaled_logprob")
        .as[(Long, Long)].collect().toMap
      release(); m
    }
    assert(run(docs) == run(docs.repartition(17).sortWithinPartitions("lang")))
  }

  test("snapshot diff classifies added/removed/changed/unchanged") {
    import graft.ops.SnapshotDiff
    import graft.functions.TextFunctions
    val oldDf = Seq((1L, "aa"), (2L, "bb"), (3L, "cc")).toDF("id", "text")
    val newDf = Seq((2L, "bb"), (3L, "cc changed"), (4L, "dd")).toDF("id", "text")
    def fp(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), TextFunctions.contentFingerprint(col("text")).as("fp"))
    val got = SnapshotDiff.diff(fp(oldDf), fp(newDf), "id", "fp")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added"))
    // the classifying join is a plain equi-join, never a nested loop
    val plan = SnapshotDiff.diff(fp(oldDf), fp(newDf), "id", "fp")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("pplBuckets exact: tiers split per language, best scores land in bucket 1") {
    import graft.ops.NgramLm
    val scores = Seq(
      // lang en: per-token keys -1.0, -2.0, -3.0, -4.0 -> ntile(3) = 1,1,2,3
      (1L, "en", 10L, -10000000L), (2L, "en", 10L, -20000000L),
      (3L, "en", 10L, -30000000L), (4L, "en", 10L, -40000000L),
      // lang de: one doc -> bucket 1
      (5L, "de", 4L, -8000000L))
      .toDF("doc_id", "lang", "n_tokens", "scaled_logprob")
    val got = NgramLm.pplBuckets(scores, Seq("lang"), "doc_id", buckets = 3,
        exact = true)
      .select("doc_id", "ppl_bucket").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 1))
  }

  test("pplBuckets approx: ordering invariant holds and tiers roughly balance") {
    import graft.ops.NgramLm
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (scores, release) = NgramLm.unigramScores(
      docs, "doc_id", "text", carryCols = Seq("lang"))
    val b = NgramLm.pplBuckets(scores, Seq("lang"), "doc_id", buckets = 3)
      .select(col("lang"), col("ppl_bucket"),
        (col("scaled_logprob").cast("double") / col("n_tokens")).as("key"))
      .as[(String, Int, Double)].collect()
    release()
    assert(b.map(_._2).forall(x => x >= 1 && x <= 3))
    // higher key (better quality) never lands in a LATER bucket than a
    // lower key of the same language
    b.groupBy(_._1).foreach { case (_, rows) =>
      rows.sortBy(-_._3).foldLeft(0) { (prev, r) =>
        assert(r._2 >= prev); math.max(prev, r._2)
      }
      // with >= 30 docs each tier holds between 15% and 55% (sketch slack)
      if (rows.length >= 30) (1 to 3).foreach { t =>
        val share = rows.count(_._2 == t).toDouble / rows.length
        assert(share > 0.15 && share < 0.55, s"tier $t share $share")
      }
    }
  }

  test("bigram scores match the closed form; per-history probabilities sum to 1") {
    import graft.ops.NgramLm
    // bigrams: "a b":2 (docs 1,2), "b a":1; prefixes: a:3, b:1... counted
    // over HISTORIES: a->b twice, b->a once => cu(a)=2+? doc1 "a b a b":
    // bigrams (a b),(b a),(a b); doc2 "a b": (a b). cu(a)=3, cu(b)=1,
    // cb("a b")=3, cb("b a")=1
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val (scores, release) = NgramLm.bigramScores(docs, "doc_id", "text")
    val got = scores.select("doc_id", "n_bigrams", "scaled_logprob")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    release()
    def s(x: Double) = math.floor(math.log(x) * 1e6 + 0.5).toLong
    assert(got == Seq(
      (1L, 3L, (s(3) - s(3)) + (s(1) - s(1)) + (s(3) - s(3))),
      (2L, 1L, s(3) - s(3))))
    // single-token doc 3 excluded; P(b|a)=3/3=1, P(a|b)=1/1=1 -> logprob 0
    assert(got.forall(_._3 == 0L))
  }

  // ---------------------------------------------- property round-trips

  test("property: chunk texts rebuild the token stream for random inputs (10 seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // includes punctuation/unicode noise the tokenizer must strip, plus
    // random sizes around the chunk boundary cases
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
    val noise = Gen.oneOf("", "!", "—", "3", "µ", "  ")
    val textGen = Gen.listOfN(60, Gen.zip(word, noise)).map(
      _.map { case (w, n) => s"$w$n" }.mkString(" "))
    def sample[T](g: Gen[T], seed: Long): T =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    for (seed <- 1L to 10L) {
      val texts = sample(Gen.listOfN(20, textGen), seed)
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      // collect_list order is arbitrary: sort the (idx, piece) structs
      val rebuilt = graft.ops.Chunking.chunkTokens(df, "text", 16, 11)
        .groupBy("id")
        .agg(concat_ws(" ", flatten(transform(
          array_sort(collect_list(struct(col("chunk_idx"),
            when(col("chunk_idx") === 0, col("chunk_tokens"))
              .otherwise(slice(col("chunk_tokens"), 6, 16)).as("piece")))),
          s => s.getField("piece")))).as("joined"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = df.select(col("id"),
          concat_ws(" ", graft.functions.TextFunctions.tokens(col("text"))).as("t"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      expected.foreach { case (id, t) =>
        assert(rebuilt.getOrElse(id, "") == t, s"seed=$seed id=$id")
      }
    }
  }

  test("property: prefix sum equals the sequential scan for random values (10 seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    for (seed <- 1L to 10L) {
      val vals = sample(Gen.listOfN(500, Gen.chooseNum(-1000L, 1000L)), seed)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v").repartition(11)
      val (summed, release) = Packing.withExclusivePrefixSum(df, "id", "v")
      val got = summed
        .select("id", "cum_excl").as[(Long, Long)].collect().sortBy(_._1).map(_._2)
      release()
      assert(got.toSeq == vals.scanLeft(0L)(_ + _).init, s"seed=$seed")
    }
  }

  // ---------------------------------------------------------- profiling

  test("profile: nulls, distincts, min/max per column in one pass") {
    import graft.ops.Profile
    val df = Seq(
      (Some(1L), Some("b")), (Some(2L), None), (None, Some("a")), (Some(2L), Some("a")))
      .toDF("id", "s")
    val rows = Profile.profile(df, Seq("id", "s"), exact = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(rows("id") == ((4L, 3L, 2L, "1", "2")))
    assert(rows("s") == ((4L, 3L, 2L, "a", "b")))
    // approx mode runs and is within HLL tolerance on the same data
    val approx = Profile.profile(df, Seq("id"))
      .collect().head.getLong(3)
    assert(approx >= 1L && approx <= 3L)
  }

  test("profile survives arbitrary column names (spaces, quotes, dots)") {
    import graft.ops.Profile
    val df = Seq((1L, "x"), (2L, "y"))
      .toDF("my col", "it's.weird")
    val rows = Profile.profile(df, Seq("my col", "it's.weird"), exact = true)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows == Map("my col" -> 2L, "it's.weird" -> 2L))
  }

  // ------------------------------------------------------- quantization

  test("int8 quantization: codes in range, zero vector safe, error bounded by scale/2") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val out = df.select(col("id"),
        VectorFunctions.toDoubleArray(col("v")).as("d"))
      .withColumn("scale", VectorFunctions.int8Scale(col("d")))
      .withColumn("q", VectorFunctions.quantizeInt8(col("d"), col("scale")))
      .withColumn("err", VectorFunctions.int8SqError(col("d"), col("q"), col("scale")))
      .select("id", "scale", "q", "err").collect()
    val r1 = out.find(_.getLong(0) == 1L).get
    val scale = r1.getDouble(1)
    assert(math.abs(scale - 1.0 / 127) < 1e-12)
    assert(r1.getSeq[Long](2) == Seq(64L, -127L, 32L, 0L))
    // each element reconstructs within scale/2 => sqerr <= dim*(scale/2)^2
    assert(r1.getDouble(3) <= 4 * math.pow(scale / 2, 2) + 1e-15)
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(r2.getDouble(1) == 0.0 && r2.getSeq[Long](2) == Seq(0L, 0L, 0L, 0L)
      && r2.getDouble(3) == 0.0)
  }

  test("quantization on real embeddings: every nonzero vector saturates at |q|=127") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val bad = emb.select(VectorFunctions.toDoubleArray(col("embedding")).as("d"))
      .withColumn("scale", VectorFunctions.int8Scale(col("d")))
      .withColumn("q", VectorFunctions.quantizeInt8(col("d"), col("scale")))
      .withColumn("maxq", aggregate(col("q"), lit(0L), (a, x) => greatest(a, abs(x))))
      .filter(col("scale") > 0 && col("maxq") =!= 127L)
      .count()
    assert(bad == 0)
  }
}
