package graft

import org.apache.spark.sql.functions._

import graft.functions.{SimHash64, TextFunctions}
import graft.ops.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark query engines and columnar execution"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (5L, "spark sql optimizes declarative plans with catalyst and tungsten codegen")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per identical normalized text") {
    val out = Dedup.exact(docs, "doc_id", TextFunctions.contentFingerprint($"text"))
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getAs[Long]("dup_count") == 2) // docs 1 and 4
  }

  test("HashedShingles equals xxhash64 over TextFunctions.shingles (paths can't drift)") {
    import org.apache.spark.sql.functions.{col, transform, xxhash64}
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val fused = real.select(graft.functions.HashedShingles(col("text"), 3).as("h"))
      .collect().map(_.getSeq[Long](0))
    val composed = real.select(
      transform(TextFunctions.shingles(col("text"), 3), s => xxhash64(s)).as("h"))
      .collect().map(_.getSeq[Long](0))
    assert(fused.toSeq == composed.toSeq)
  }

  test("minhash signature is deterministic and identical for identical docs") {
    val sigs = docs.select($"doc_id",
      Dedup.minhashSignature($"text", 3, 64).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(4L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == 64)
  }

  test("minhash LSH finds the near-dup pair and not unrelated pairs") {
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup always collides
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near-dup
    assert(!pairs.contains((3L, 5L))) // unrelated
  }

  test("verifyJaccard computes exact shingle jaccard on candidates") {
    val cands = Seq((1L, 4L), (1L, 3L)).toDF("idA", "idB")
    val verified = Dedup.verifyJaccard(cands, docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("idA"), r.getAs[Long]("idB")) -> r.getAs[Double]("jaccard")).toMap
    assert(verified((1L, 4L)) == 1.0)
    assert(verified((1L, 3L)) < 0.1)
  }

  test("tokenJaccardPairs exact inverted-index jaccard with blocking") {
    val blocked = docs.withColumn("blk", lit(1))
    val pairs = Dedup.tokenJaccardPairs(blocked, "doc_id", "text", "blk", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 4L)) == 1.0)
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) > 0.8)
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b) == Set(3L, 5L) })
  }

  test("shingleJaccardPairs: exact inverted-index pairs agree with verifyJaccard") {
    val pairs = Dedup.shingleJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L))) // the dup cluster
    assert(pairs((1L, 4L)) == 1.0) // exact dup
    // values equal the shingle-set verify computation used elsewhere
    val via = Dedup.verifyJaccard(
      Seq((1L, 2L)).toDF("idA", "idB"), docs, "doc_id", "text")
      .collect().head.getDouble(2)
    assert(pairs((1L, 2L)) == via)
  }

  test("shingleContainmentPairs: a truncated copy scores 1.0 where Jaccard misses") {
    // doc 6 = the first 8 tokens of doc 1 (14 tokens): its 6 shingles are
    // all shingles of 1 -> containment 1.0; Jaccard = 6/12 = 0.5 < 0.8
    val withCopy = docs.unionByName(Seq(
      (6L, "the quick brown fox jumps over the lazy")).toDF("doc_id", "text"))
    val (pairs, posts) = Dedup.shingleContainmentPairsWithPostings(
      withCopy, "doc_id", "text", 3, threshold = 0.95)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    posts.unpersist(blocking = false)
    // containment catches the truncation against 1, its exact dup 4, AND
    // near-dup 2 (which shares the identical 8-token prefix)
    assert(got.keySet == Set((1L, 4L), (1L, 6L), (2L, 6L), (4L, 6L)))
    assert(got((1L, 6L))._2 == 1.0 && got((1L, 6L))._1 < 0.8,
      s"truncated copy must be containment-1.0 but sub-threshold Jaccard: $got")
    assert(got((1L, 4L)) == ((1.0, 1.0))) // exact dup: both metrics 1.0
    // the near-dup pair (1,2) differs in a trailing token: its last shingles
    // diverge, so containment < 0.95 keeps it out at this threshold
    assert(!got.contains((1L, 2L)))
  }

  test("tokenJaccardPairs maxDf cap drops hot tokens from the vocabulary") {
    // 'common' appears in every doc — the quadratic hot key a stopword
    // becomes at corpus scale; the cap excludes it from the vocabulary on
    // both the intersection AND size sides (still a true Jaccard).
    val heavy = Seq(
      (1L, "common alpha beta gamma"),
      (2L, "common alpha beta delta"),
      (3L, "common zeta eta theta"),
      (4L, "common zeta eta theta")
    ).toDF("doc_id", "text").withColumn("blk", lit(1))
    val un = Dedup.tokenJaccardPairs(heavy, "doc_id", "text", "blk", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(un((1L, 2L)) == 0.6 && un((3L, 4L)) == 1.0)
    val capped = Dedup.tokenJaccardPairs(heavy, "doc_id", "text", "blk", 0.5, maxDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // 'common' (df=4) gone: (1,2) = |{alpha,beta}| / |{alpha,beta,gamma,delta}|
    assert(capped((1L, 2L)) == 0.5 && capped((3L, 4L)) == 1.0)
    // identical docs stay 1.0 because the cap removes the token from BOTH sides
  }

  test("simhash: identical docs equal, near-dups within few bits, unrelated far") {
    val fp = docs.select($"doc_id", SimHash64(TextFunctions.tokens($"text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fp(1L) == fp(4L))
    assert(ham(fp(1L), fp(2L)) <= 12)
    assert(ham(fp(1L), fp(3L)) > 12)
  }

  test("simhash codegen and interpreted agree") {
    val viaExpr = docs.select(SimHash64(TextFunctions.tokens($"text")).as("fp"))
      .collect().map(_.getLong(0)).toSeq
    val direct = docs.collect().map { r =>
      val toks = r.getString(1).toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .trim.split("\\s+").filter(_.nonEmpty)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString): Array[Any])
      SimHash64.compute(arr)
    }.toSeq
    assert(viaExpr == direct)
  }

  test("simhash128: identical docs equal, near-dups close, word0 extends simhash64") {
    val fp = docs.select($"doc_id",
      graft.functions.SimHash128(TextFunctions.tokens($"text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def ham(a: Seq[Long], b: Seq[Long]) =
      java.lang.Long.bitCount(a(0) ^ b(0)) + java.lang.Long.bitCount(a(1) ^ b(1))
    assert(fp.values.forall(_.length == 2))
    assert(fp(1L) == fp(4L)) // identical text, identical 128-bit code
    assert(ham(fp(1L), fp(2L)) <= 24) // near-dup: ~2x the 64-bit distance band
    assert(ham(fp(1L), fp(3L)) > 24) // unrelated: far
    // extension property: word 0 reuses SimHash64's seed, so it IS the
    // 64-bit code — a stored 64-bit corpus upgrades by adding word 1 only
    val fp64 = docs.select($"doc_id", SimHash64(TextFunctions.tokens($"text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp.forall { case (id, w) => w(0) == fp64(id) })
  }

  test("simhash128 codegen and interpreted agree") {
    val viaExpr = docs.select(
      graft.functions.SimHash128(TextFunctions.tokens($"text")).as("fp"))
      .collect().map(_.getSeq[Long](0)).toSeq
    val direct = docs.collect().map { r =>
      val toks = r.getString(1).toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .trim.split("\\s+").filter(_.nonEmpty)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString): Array[Any])
      graft.functions.SimHash128.compute(arr).toSeq[Long](
        org.apache.spark.sql.types.LongType)
    }.toSeq
    assert(viaExpr == direct)
  }

  test("simhash recall gate: default params recover >=0.95 of exact near-dup pairs") {
    // The q_simhash invariant, pinned at spec level so a parameter change
    // that kills recall (the round-4 regression: 64-bit maxHamming=8 kept
    // on the 128-bit code) can never ship silently again.
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val truth = Dedup.shingleJaccardPairs(real, "doc_id", "text", 3, 0.8)
      .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.simhashCandidatePairs(real, "doc_id", "text")
      .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture must contain true near-dup pairs")
    val recall = truth.count(cand.contains).toDouble / truth.size
    assert(recall >= 0.95, s"simhash recall $recall < 0.95 (${truth.size} true pairs)")
  }

  test("simhashCandidatePairs finds the dup cluster with correct hamming") {
    val pairs = Dedup.simhashCandidatePairs(docs, "doc_id", "text", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 4L)) == 0) // identical text, identical fingerprint
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) <= 12) // near-dup
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b) == Set(3L, 5L) })
  }

  test("simhashCandidatePairs bucket cap bounds a duplicate-flooded corpus") {
    // 400 identical docs: every band bucket holds all 400 → without the cap
    // the self-join materializes ~80k pairs per band; with maxBucketSize=100
    // every bucket is dropped and the operator completes with zero pairs
    // (the documented coverage bound — a flood IS the degenerate case).
    val flood = spark.range(400)
      .select($"id".as("doc_id"),
        lit("identical duplicate text repeated across the whole corpus").as("text"))
    val capped = Dedup.simhashCandidatePairs(flood, "doc_id", "text",
      maxBucketSize = 100)
    assert(capped.count() == 0)
    // and the cap leaves normal-sized buckets untouched
    val uncapped = Dedup.simhashCandidatePairs(docs, "doc_id", "text",
      maxHamming = 12, maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 4L)))
  }

  test("bucket audits surface the exact buckets the maxBucketSize cap drops") {
    // duplicate flood (every bucket holds all 50 rows) + the 5 normal docs:
    // audit rows must mark precisely the flooded buckets as dropped, and
    // dropped-bucket rows must account for the flood's population.
    val flood = spark.range(50)
      .select(($"id" + 100L).as("doc_id"),
        lit("identical duplicate text repeated across the whole corpus").as("text"))
    val mixed = docs.unionByName(flood)
    for (audit <- Seq(
        Dedup.minhashBucketAudit(mixed, "doc_id", "text", maxBucketSize = 10),
        Dedup.simhashBucketAudit(mixed, "doc_id", "text", maxBucketSize = 10))) {
      val rows = audit.collect()
      assert(rows.forall(r => r.getAs[Boolean]("dropped") == (r.getAs[Long]("size") > 10)))
      val droppedRows = rows.filter(_.getAs[Boolean]("dropped"))
      // the 50-row flood exceeds the cap in every band it lands in
      assert(droppedRows.nonEmpty && droppedRows.forall(_.getAs[Long]("size") >= 50))
      // per-band bucket populations sum back to rows-per-band (no row lost)
      val n = mixed.count()
      val perBand = rows.groupBy(_.getAs[Int]("band"))
        .map { case (_, rs) => rs.map(_.getAs[Long]("size")).sum }
      assert(perBand.forall(_ == n))
    }
    // and the cap decision matches candidate generation: with the flood
    // dropped, minhash pairs over `mixed` still find the (1,2)/(1,4) dups
    val pairs = Dedup.minhashCandidatePairs(mixed, "doc_id", "text", maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(pairs.forall { case (a, b) => a < 100L && b < 100L })
  }

  test("nearDedup keeps the min id of each duplicate cluster, drops the rest") {
    val out = Dedup.nearDedup(docs, "doc_id", "text", threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.contains(1L) && !out.contains(4L)) // exact dup pair (1,4): keep 1
    assert(!out.contains(2L)) // near-dup of 1 above 0.8
    assert(out.contains(3L) && out.contains(5L)) // unrelated docs survive
  }

  test("BloomMightContain: no false negatives over inserted keys, codegen path") {
    val keys = (0L until 5000L).map(_ * 2654435761L % 1000003L)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(5000, 0.01)
    keys.foreach(bloom.putLong)
    val hits = keys.toDF("k")
      .select(graft.functions.BloomMightContain($"k", bloom).as("h"))
      .collect().map(_.getBoolean(0))
    assert(hits.forall(identity), "a bloom filter must never miss an inserted key")
    // false-positive rate on disjoint probes stays near fpp
    val probes = (1000000L until 1020000L).toDF("k")
      .select(graft.functions.BloomMightContain($"k", bloom).as("h"))
      .collect().count(_.getBoolean(0))
    assert(probes < 20000 * 0.05, s"fp count $probes way above fpp")
  }

  test("incrementalDedup equals plain anti-join + within-batch dedup") {
    import org.apache.spark.sql.functions.xxhash64
    val history = Seq(
      (100L, "history doc one about spark engines"),
      (101L, "history doc two about columnar formats")).toDF("doc_id", "text")
    val batch = Seq(
      (200L, "history doc one about spark engines"),    // dup of history 100
      (201L, "a genuinely new document in this batch"),
      (202L, "a genuinely new document in this batch"), // within-batch dup of 201
      (203L, "another brand new document right here")).toDF("doc_id", "text")
    val key = xxhash64(TextFunctions.contentFingerprint($"text"))
    val got = Dedup.incrementalDedup(batch, history, "doc_id", key)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(201L, 203L))
    // reference: plain anti-join then min-id per key
    val ref = batch.withColumn("__k", key)
      .join(history.select(key.as("__k")), Seq("__k"), "left_anti")
      .groupBy("__k").agg(org.apache.spark.sql.functions.min($"doc_id").as("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == ref)
  }

  test("buildKeyBloom: two batches reuse ONE filter, results equal plain anti-join") {
    import org.apache.spark.sql.functions.xxhash64
    val history = Seq(
      (100L, "history doc one about spark engines"),
      (101L, "history doc two about columnar formats")).toDF("doc_id", "text")
    val key = xxhash64(TextFunctions.contentFingerprint($"text"))
    // built once, broadcast once — both batches reference the same handle
    val kb = Dedup.buildKeyBloom(history, key, expectedKeys = 1000L)
    val bc = kb.broadcastVia(spark)
    val batches = Seq(
      Seq((200L, "history doc one about spark engines"), // dup of 100
        (201L, "first batch fresh document")).toDF("doc_id", "text"),
      Seq((300L, "history doc two about columnar formats"), // dup of 101
        (301L, "second batch fresh document"),
        (302L, "second batch fresh document")).toDF("doc_id", "text")) // in-batch dup
    val got = batches.map { b =>
      Dedup.incrementalDedup(b, history, "doc_id", key, bc)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(got == Seq(Set(201L), Set(301L)))
    // identical to the ad-hoc-build overload (which is the plain anti-join shape)
    val ref = batches.map { b =>
      Dedup.incrementalDedup(b, history, "doc_id", key)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(got == ref)
  }

  test("KeyBloom.extend: extended filter has no false negatives on the new batch") {
    import org.apache.spark.sql.functions.xxhash64
    val history = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val accepted = Seq((3L, "gamma"), (4L, "delta")).toDF("doc_id", "text")
    val key = xxhash64($"text")
    val kb = Dedup.buildKeyBloom(history, key, expectedKeys = 100L).extend(accepted, key)
    // every key from history AND the accepted batch must now hit
    val allKeys = history.unionByName(accepted).select(key.as("k"))
    val hits = allKeys
      .select(graft.functions.BloomMightContain($"k", kb.filter).as("h"))
      .collect().map(_.getBoolean(0))
    assert(hits.forall(identity), "extend lost a key (false negative)")
  }

  test("KeyBloom save/load round-trips: same hits, parameters, and extendability") {
    import org.apache.spark.sql.functions.xxhash64
    val history = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val key = xxhash64($"text")
    val kb = Dedup.buildKeyBloom(history, key, expectedKeys = 100L, fpp = 0.02)
    val path = java.nio.file.Files.createTempDirectory("kb").toString + "/bloom.bin"
    kb.save(spark, path)
    val loaded = graft.ops.KeyBloom.load(spark, path)
    assert(loaded.expectedKeys == 100L && loaded.fpp == 0.02)
    val probes = (-500L to 500L).map(i => i * 2654435761L)
    probes.foreach(k =>
      assert(loaded.filter.mightContainLong(k) == kb.filter.mightContainLong(k)))
    // the cross-job maintenance step: a LOADED filter keeps extending
    val batch = Seq((3L, "gamma")).toDF("doc_id", "text")
    loaded.extend(batch, key)
    val gammaKey = batch.select(key.as("k")).head().getLong(0)
    assert(loaded.filter.mightContainLong(gammaKey))
    // save-over-previous (the nightly-job shape): the atomic
    // rename-with-overwrite must replace the old file, and no hidden tmp
    // file may be left behind in the parent directory
    loaded.save(spark, path)
    val reread = graft.ops.KeyBloom.load(spark, path)
    assert(reread.filter.mightContainLong(gammaKey))
    val leftovers = new java.io.File(path).getParentFile
      .listFiles().map(_.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"tmp files left behind: ${leftovers.mkString(",")}")
  }

  test("crossCorpusNearDedup: batch-vs-history only, exact-verified, batch pairs untouched") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val history = Seq(
      (100L, base),
      (101L, "completely different reference material nothing shared here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, base),                                           // exact copy of history: dropped
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"), // J = 7/8 vs 100: dropped
      (3L, "unrelated fresh content with plenty of new words inside"),
      (4L, "unrelated fresh content with plenty of new words inside")  // dup of 3 WITHIN batch: kept (not this op's job)
    ).toDF("doc_id", "text")
    val kept = Dedup.crossCorpusNearDedup(batch, history, "doc_id", "text", 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
    // threshold is honored by the EXACT verification: at 0.9 the 7/8
    // truncated copy survives, the exact copy still dies
    val strict = Dedup.crossCorpusNearDedup(batch, history, "doc_id", "text", 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(strict == Set(2L, 3L, 4L))
  }

  test("crossCorpusNearDedup: overlapping id spaces and the history bucket cap") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // id 1 exists in BOTH frames with DIFFERENT texts: the batch row must
    // be verified against history texts only, never against itself
    val history = Seq(
      (1L, "history version completely different words nothing like the batch text"),
      (2L, shared)
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, shared),  // near-dups history doc 2 (not its own id-1 history row)
      (3L, "fresh material with entirely new vocabulary throughout the line")
    ).toDF("doc_id", "text")
    val kept = Dedup.crossCorpusNearDedup(batch, history, "doc_id", "text", 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
    // bucket cap: a history flooded with near-identical copies drops its
    // oversized buckets, so the batch copy is never CANDIDATED against it
    // (explicit coverage bound, mirroring minhash maxBucketSize)
    val flood = (100L to 120L).map(i => (i, shared)).toDF("doc_id", "text")
    val keptFlood = Dedup.crossCorpusNearDedup(
        batch, flood, "doc_id", "text", 0.8, maxBucketSize = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(keptFlood == Set(1L, 3L))
    // with a roomy cap the same flood kills the copy again
    val keptRoomy = Dedup.crossCorpusNearDedup(
        batch, flood, "doc_id", "text", 0.8, maxBucketSize = 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(keptRoomy == Set(3L))
  }

  test("band postings: precomputed-postings path equals the re-banding path") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val history = Seq(
      (100L, base),
      (101L, "completely different reference material nothing shared here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, base),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (3L, "unrelated fresh content with plenty of new words inside")
    ).toDF("doc_id", "text")
    val postings = Dedup.bandPostings(history, "doc_id", "text")
    val viaPostings = Dedup.crossCorpusNearDedupWithPostings(
        batch, history, postings, "doc_id", "text", 0.8)
      .select("doc_id").as[Long].collect().toSet
    val viaRebanding = Dedup.crossCorpusNearDedup(
        batch, history, "doc_id", "text", 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(viaPostings == viaRebanding && viaPostings == Set(3L))
  }

  test("band postings: save/load round-trip and union extension") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val h1 = Seq((100L, base)).toDF("doc_id", "text")
    val h2 = Seq((200L, "second wave reference rows with their own vocabulary set"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_bp").toString + "/posts"
    // nightly maintenance: build on h1, save, load, EXTEND by unioning
    // h2's postings (band keys are per-row pure), save back IN PLACE —
    // the extended lineage still reads `dir`, which the temp-write+swap
    // in save() must tolerate
    Dedup.bandPostings(h1, "doc_id", "text").save(dir)
    val loaded = graft.ops.BandPostings.load(spark, dir)
    assert((loaded.shingleN, loaded.numHashes, loaded.bands) == ((3, 64, 16)))
    val extended = loaded.copy(
      posts = loaded.posts.unionByName(Dedup.bandPostings(h2, "doc_id", "text").posts))
    extended.save(dir)
    val reloaded = graft.ops.BandPostings.load(spark, dir)
    val history = h1.unionByName(h2)
    val batch = Seq(
      (1L, base),                                                  // dups h1
      (2L, "second wave reference rows with their own vocabulary"), // near-dups h2
      (3L, "fresh material with entirely new words throughout")
    ).toDF("doc_id", "text")
    val kept = Dedup.crossCorpusNearDedupWithPostings(
        batch, history, reloaded, "doc_id", "text", 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("keepBest keeps the highest-score copy per key, min id on ties") {
    import org.apache.spark.sql.functions.{col, length}
    val df = Seq(
      (1L, "k1", 10),  // lower score: dropped
      (2L, "k1", 30),  // best of k1
      (3L, "k2", 20),  // tie with 4 on score: min id 3 wins
      (4L, "k2", 20),
      (5L, "k3", 0)    // singleton survives
    ).toDF("id", "key", "score")
    val got = Dedup.keepBest(df, "id", col("key"), col("score").cast("double"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L, 5L))
    // full rows come back, not just ids
    val cols = Dedup.keepBest(df, "id", col("key"), col("score").cast("double")).columns.toSeq
    assert(cols == Seq("id", "key", "score"))
  }

  test("incrementalDedup: null-key rows pass through, never merged or dropped") {
    val history = Seq((1L, "h")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, Some("h")),   // dup of history
      (11L, None),        // null key
      (12L, None),        // another null key — must NOT merge with 11
      (13L, Some("new"))).toDF("doc_id", "text")
    // xxhash64 folds nulls into the seed, so build an explicitly null key
    val key = org.apache.spark.sql.functions.when($"text".isNotNull,
      org.apache.spark.sql.functions.xxhash64($"text"))
    val got = Dedup.incrementalDedup(batch, history, "doc_id", key)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(11L, 12L, 13L))
  }

  test("minhash LSH on documents table: recall vs exact jaccard >= 0.9 at t=0.7") {
    val real = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val exact = Dedup.tokenJaccardPairs(
      real.withColumn("blk", lit(1)), "doc_id", "text", "blk", 0.0)
    // ground truth: shingle-3 jaccard >= 0.7 via verify on all pairs
    val allPairs = exact.select("idA", "idB")
    val truth = Dedup.verifyJaccard(allPairs, real, "doc_id", "text")
      .filter($"jaccard" >= 0.7).select("idA", "idB")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (truth.nonEmpty) {
      val cand = Dedup.minhashCandidatePairs(real, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = truth.count(cand.contains).toDouble / truth.size
      assert(recall >= 0.9, s"recall=$recall over ${truth.size} true pairs")
    }
  }
}
