package graft

import org.apache.spark.sql.functions._

import graft.functions.{RollingHashFingerprint, TextFunctions}
import graft.ops.{AsOfJoin, Multimodal}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens / shingles / counts") {
    val df = Seq("The quick, brown fox!  Jumps.").toDF("text")
    val r = df.select(
      TextFunctions.tokens($"text").as("t"),
      TextFunctions.shingles($"text", 2).as("s"),
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.bpeishTokenCount($"text").as("b")).collect().head
    assert(r.getSeq[String](0) == Seq("the", "quick", "brown", "fox", "jumps"))
    assert(r.getSeq[String](1) == Seq("the quick", "quick brown", "brown fox", "fox jumps"))
    assert(r.getInt(2) == 5)
    assert(r.getInt(3) == 8) // 5 words + 3 punctuation marks
  }

  test("bpe pairCounts: frequency-weighted char pairs, multi-position words") {
    import graft.ops.Bpe
    // vocab: aa x2, ab x1, aaa x1, z x1 (dropped: single char)
    val docs = Seq("aa ab aa", "aaa z").toDF("text")
    val got = Bpe.pairCounts(docs, "text", k = 10)
      .as[(String, Long, Long)].collect().toSeq
    // "aa" appears in word aa (1 position, cnt 2) and word aaa (2
    // positions, cnt 1) -> n_types 2, n_occurrences 2*1 + 1*2 = 4
    assert(got == Seq(("aa", 2L, 4L), ("ab", 1L, 1L)))
  }

  test("bpe trainMerges: hand-computed 3-round merge sequence") {
    import graft.ops.Bpe
    // vocab: cat x2 [c,a,t], hat x1 [h,a,t]
    // r1 pairs: (c,a):2 (a,t):3 (h,a):1 -> merge (a,t) n=3
    // r2 over [c,at] x2, [h,at]: (c,at):2 (h,at):1 -> merge (c,at) n=2
    // r3 over [cat] x2, [h,at]: (h,at):1 -> merge (h,at) n=1
    val docs = Seq("cat cat hat").toDF("text")
    val got = Bpe.trainMerges(docs, "text", rounds = 3)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, "a", "t", 3L), (2, "c", "at", 2L), (3, "h", "at", 1L)))
  }

  test("bpe trainMerges: greedy fold = simultaneous replace; a=b pairs never merge") {
    import graft.ops.Bpe
    // vocab: zxy x1, xyxy x1. r1: (x,y):3 wins; xyxy rewrites to [xy,xy]
    // in ONE round (non-overlapping, both occurrences). r2: the only
    // adjacent pair (xy,xy) has a = b -> excluded; (z,xy):1 wins. r3:
    // nothing left with a != b -> training exhausts at 2 rows.
    val docs = Seq("zxy xyxy").toDF("text")
    val got = Bpe.trainMerges(docs, "text", rounds = 3)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, "x", "y", 3L), (2, "z", "xy", 1L)))
  }

  test("bpe trainMerges: fewer rounds yield a strict prefix of more rounds") {
    import graft.ops.Bpe
    // the merge table must be history-independent per round count — a
    // round accidentally leaking state (stale persist, wrong vocab frame)
    // would break prefix stability on a real corpus
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val m2 = Bpe.trainMerges(docs, "text", rounds = 2)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val m3 = Bpe.trainMerges(docs, "text", rounds = 3)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(m3.take(2) == m2 && m3.size == 3)
  }

  test("bpe trainMerges: frequency ties break on the pair, deterministically") {
    import graft.ops.Bpe
    val docs = Seq("ab cd").toDF("text")
    val got = Bpe.trainMerges(docs, "text", rounds = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 1L)))
  }

  test("topPmi: integer PMI matches the closed form, min support filters") {
    import graft.ops.Collocations
    // pairs: (a,b)x2, (b,a)x1, (c,d)x1 -> N=4; prefixes a:2,b:1,c:1;
    // suffixes b:2,a:1,d:1
    val docs = Seq("a b a b", "c d").toDF("text")
    def s(x: Long) = graft.functions.ScaledLn.long(x)
    val got = Collocations.topPmi(docs, "text", minCount = 1, k = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    val want = Seq(
      ("c", "d", 1L, s(1) + s(4) - s(1) - s(1)), // pmi ln(4)
      ("b", "a", 1L, s(1) + s(4) - s(1) - s(1)), // pmi ln(4)
      ("a", "b", 2L, s(2) + s(4) - s(2) - s(2))) // pmi ln(2)
      .sortBy(r => (-r._4, r._1, r._2))
    assert(got == want)
    // min support 2 keeps only the repeated pair
    val top = Collocations.topPmi(docs, "text", minCount = 2, k = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(top == want.filter(_._3 >= 2))
  }

  test("topPmi: candidate cap covers the corpus; no cartesian join-back") {
    import graft.ops.Collocations
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Collocations.topPmi(docs, "text", minCount = 5, k = 20,
      candidateCap = 100000)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    val rows = out.as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // the q_collocations cap must dominate the qualifying-pair population
    // (exact-top-k precondition; re-checked here so corpus growth trips it)
    val uni = graft.functions.HashedShingles(col("text"), 1)
    val qualifying = docs
      .filter(size(graft.functions.TokenizeWords(col("text"))) >= 2)
      .select(explode(zip_with(
        slice(uni, lit(1), size(uni) - 1),
        slice(uni, lit(2), size(uni) - 1),
        (a, b) => struct(a, b))).as("p"))
      .groupBy("p").count().filter(col("count") >= 5).count()
    assert(qualifying < 100000)
  }

  test("short doc yields single whole-text shingle") {
    val r = Seq("one two").toDF("text")
      .select(TextFunctions.shingles($"text", 3)).collect().head
    assert(r.getSeq[String](0) == Seq("one two"))
  }

  test("repetitionRatio: duplicate-token fraction, 0 for empty") {
    val df = Seq("a b a b a", "all distinct words here", "").toDF("text")
    val out = df.select(TextFunctions.repetitionRatio($"text")).collect().map(_.getDouble(0))
    assert(out(0) == 3.0 / 5.0) // 5 tokens, 2 distinct
    assert(out(1) == 0.0)
    assert(out(2) == 0.0)
  }

  test("redactPii replaces emails and phone-shaped runs with fixed tags") {
    val df = Seq(
      "write to jane.doe+x@mail.example.org today",
      "call +1 555 123 4567 now",
      "nothing sensitive at all").toDF("text")
    val out = df.select(TextFunctions.redactPii($"text")).collect().map(_.getString(0))
    assert(out(0) == "write to <EMAIL> today")
    assert(out(1) == "call <PHONE> now")
    assert(out(2) == "nothing sensitive at all")
  }

  test("decontaminate flags corpus docs sharing an n-token shingle with the eval set") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"), // contains eval 8-gram
      (2L, "totally unrelated text about columnar execution engines here now"),
      (10L, "alpha beta gamma delta epsilon zeta eta theta")      // the eval doc itself
    ).toDF("doc_id", "text")
    val eval = corpus.filter($"doc_id" === 10L)
    val out = graft.ops.Decontaminate.contaminated(corpus, eval, "doc_id", "text", 8)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L)) // doc 2 clean; doc 10 does not contaminate itself
  }

  test("contaminationCoverage: fraction of eval shingles found, threshold, no self-pairs") {
    // eval doc: 10 tokens -> 3 distinct 8-gram shingles (windows 1..3)
    val evalDoc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, evalDoc),                                               // full copy: coverage 1.0
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"),  // 9 tokens: windows 1..2 -> 2/3
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),       // 8 tokens: window 1 -> 1/3
      (4L, "totally unrelated text with nothing shared here at all ok"),
      (10L, evalDoc)                                               // the eval doc itself
    ).toDF("doc_id", "text")
    val eval = corpus.filter($"doc_id" === 10L)
    val out = graft.ops.Decontaminate.contaminationCoverage(
        corpus, eval, "doc_id", "text", 8, minCoverage = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(4))).toMap
    assert(out.keySet == Set(1L, 2L)) // 1/3 below threshold; no self-pair for 10
    assert(out(1L) == 1.0 && math.abs(out(2L) - 2.0 / 3) < 1e-12)
    // full output shape: n_shared / n_eval_shingles back the fraction
    val row = graft.ops.Decontaminate.contaminationCoverage(
        corpus, eval, "doc_id", "text", 8, minCoverage = 0.5)
      .filter($"doc_id" === 2L).head()
    assert(row.getLong(1) == 10L && row.getLong(2) == 2L && row.getLong(3) == 3L)
  }

  test("unigramScoresWithVocab: external vocab, OOV floor, matches the closed form") {
    import graft.ops.NgramLm
    // reference slice: "a a b" -> vocab {a:2, b:1}, total 3
    val ref = Seq((1L, "a a b")).toDF("doc_id", "text")
    val vocab = NgramLm.tokenVocabulary(ref, "text")
    assert(vocab.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
    // target: "a b c" -> c is OOV (priced ln(1) = 0)
    val target = Seq((7L, "a b c"), (8L, "")).toDF("doc_id", "text")
    val (scored, releaseV) = NgramLm.unigramScoresWithVocab(target, "doc_id", "text", vocab)
    val out = scored
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    releaseV()
    assert(out.keySet == Set(7L)) // zero-token docs are absent
    val (nTok, nOov, lp) = out(7L)
    val s = (x: Double) => math.floor(math.log(x) * 1e6 + 0.5).toLong
    assert(nTok == 3L && nOov == 1L)
    assert(lp == s(2) + s(1) + 0L - 3L * s(3))
    // self-scoring through the external API == the in-corpus path's scores
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (own, release) = NgramLm.unigramScores(docs, "doc_id", "text")
    val ownRows = own.select("doc_id", "scaled_logprob")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    release()
    val (extScored, releaseExt) = NgramLm.unigramScoresWithVocab(
      docs, "doc_id", "text", NgramLm.tokenVocabulary(docs, "text"))
    val ext = extScored
      .select("doc_id", "scaled_logprob")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    releaseExt()
    assert(ext == ownRows)
  }

  test("langId picks the language with most marker stopwords; und when none") {
    val df = Seq(
      "the cat and the dog of the house is big",
      "el perro de la casa que ladra",
      "xyzzy plugh qwertz").toDF("text")
    val out = df.select(TextFunctions.langId($"text")).collect().map(_.getString(0)).toSeq
    assert(out == Seq("en", "es", "und"))
  }

  test("quality score components and composite are deterministic") {
    val good = "the quick brown fox jumps over a lazy dog and it is fine today"
    val bad = "!!! ??? ### $$$ %%%"
    val out = Seq(good, bad).toDF("text")
      .select(TextFunctions.qualityScore($"text")).collect().map(_.getDouble(0))
    assert(out(0) > 0.9)
    assert(out(1) < 0.5)
  }

  test("rolling-hash fingerprint: equal for equal text, shared for shared windows") {
    val df = Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      (2L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      (3L, "completely different payload here")).toDF("id", "text")
    val fp = df.select($"id", RollingHashFingerprint($"text", 8).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    // matches the direct computation (codegen path == scala path)
    assert(fp(1L) == RollingHashFingerprint.compute("abcdefghijklmnopqrstuvwxyz0123456789", 8))
  }

  test("as-of join backward: latest right row at-or-before each left time") {
    val trades = Seq((1, 10, "t1"), (1, 20, "t2"), (2, 15, "t3"))
      .toDF("k", "t", "trade")
    val quotes = Seq((1, 5, 100.0), (1, 10, 101.0), (1, 18, 102.0), (2, 99, 999.0))
      .toDF("k", "qt", "px")
    val out = AsOfJoin.backward(trades, quotes, "k", "k", "t", "qt", Seq("px"))
      .orderBy("t").collect().map(r => (r.getAs[String]("trade"), r.getAs[Any]("px")))
    assert(out.toSeq == Seq(("t1", 101.0), ("t3", null), ("t2", 102.0)))
  }

  test("as-of join forward: earliest right row at-or-after each left time") {
    val trades = Seq((1, 10, "t1"), (1, 20, "t2"), (2, 15, "t3"))
      .toDF("k", "t", "trade")
    val quotes = Seq((1, 5, 100.0), (1, 10, 101.0), (1, 18, 102.0), (2, 9, 999.0))
      .toDF("k", "qt", "px")
    val out = AsOfJoin.forward(trades, quotes, "k", "k", "t", "qt", Seq("px"))
      .orderBy("t").collect().map(r => (r.getAs[String]("trade"), r.getAs[Any]("px")))
    // t1@10 -> quote@10 (>=, equal time matches); t2@20 -> none after; t3@15 -> none for k=2
    assert(out.toSeq == Seq(("t1", 101.0), ("t3", null), ("t2", null)))
  }

  test("as-of backward agrees with a naive join+window implementation on random data") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(13)
    val left = (1 to 200).map(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000)))
      .toDF("lid", "lk", "lt")
    // unique (key, time) pairs on the right so the as-of pick is well-defined
    val right = (0L until 5L).flatMap { k =>
      rnd.shuffle((0 to 999).toList).take(40).map(t => (k, t, k * 10000 + t))
    }.toDF("rk", "rt", "pay")
    val fast = AsOfJoin.backward(left, right, "lk", "rk", "lt", "rt", Seq("pay"))
      .select("lid", "pay").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val w = Window.partitionBy("lid").orderBy(col("rt").desc)
    val naive = left
      .join(right, col("lk") === col("rk") && col("rt") <= col("lt"), "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("lid", "pay").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(fast.size == 200 && fast == naive)
    assert(fast.values.exists(_.isDefined) && fast.values.exists(_.isEmpty))
  }

  test("as-of join: null timestamps match nothing on either side, both directions") {
    val trades = Seq((1, Some(10), "t1"), (1, None: Option[Int], "tnull"))
      .toDF("k", "t", "trade")
    val quotes = Seq((1, Some(5), 100.0), (1, None: Option[Int], 666.0))
      .toDF("k", "qt", "px")
    val back = AsOfJoin.backward(trades, quotes, "k", "k", "t", "qt", Seq("px"))
      .collect().map(r => r.getAs[String]("trade") -> r.getAs[Any]("px")).toMap
    // t1 matches the real quote@5, never the null-time quote; the null-time
    // trade matches nothing
    assert(back == Map("t1" -> 100.0, "tnull" -> null))
    val fwd = AsOfJoin.forward(trades, quotes, "k", "k", "t", "qt", Seq("px"))
      .collect().map(r => r.getAs[String]("trade") -> r.getAs[Any]("px")).toMap
    // no real quote at/after t=10; null-time rows on either side never match
    assert(fwd == Map("t1" -> null, "tnull" -> null))
  }

  test("as-of tolerance: a too-far nearest match nulls, never reaches past") {
    val trades = Seq((1, 100, "t1"), (1, 200, "t2")).toDF("k", "t", "trade")
    // t1@100 -> quote@90 (gap 10), t2@200 -> quote@150 (gap 50)
    val quotes = Seq((1, 90, 1.0), (1, 150, 2.0)).toDF("k", "qt", "px")
    val got = AsOfJoin.backward(trades, quotes, "k", "k", "t", "qt", Seq("px"),
        tolerance = Some(lit(30)))
      .collect().map(r => r.getAs[String]("trade") -> r.getAs[Any]("px")).toMap
    assert(got == Map("t1" -> 1.0, "t2" -> null)) // gap 10 in, gap 50 out
    // boundary is inclusive, matching the <=/>= join bound
    val edge = AsOfJoin.backward(trades, quotes, "k", "k", "t", "qt", Seq("px"),
        tolerance = Some(lit(10)))
      .collect().map(r => r.getAs[String]("trade") -> r.getAs[Any]("px")).toMap
    assert(edge == Map("t1" -> 1.0, "t2" -> null))
    val fwd = AsOfJoin.forward(trades, quotes, "k", "k", "t", "qt", Seq("px"),
        tolerance = Some(lit(40)))
      .collect().map(r => r.getAs[String]("trade") -> r.getAs[Any]("px")).toMap
    // t1@100 -> quote@150 gap 50 > 40: null; t2@200 -> nothing after
    assert(fwd == Map("t1" -> null, "t2" -> null))
  }

  test("as-of join does not stitch value columns from different right rows") {
    val left = Seq((1, 30)).toDF("k", "t")
    val right = Seq((1, 10, Some(5.0), None: Option[Double]), (1, 20, None, Some(7.0)))
      .toDF("k", "rt", "x", "y")
    val out = AsOfJoin.backward(left, right, "k", "k", "t", "rt", Seq("x", "y"))
      .collect().head
    // most recent right row is (t=20, x=null, y=7.0): take it atomically,
    // not x=5.0 resurrected from the older row
    assert(out.getAs[Any]("x") == null && out.getAs[Double]("y") == 7.0)
  }

  test("multimodal: resize and frame-sample plumbing (deterministic, shuffle-free)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").filter($"doc_id" < 50)
    val media = graft.ops.Multimodal.attachBinary(docs, "text")
      .select(col("doc_id").as("id"), col("content"))
    // real image path: synthetic PNGs resize with status=ok
    val imgs = spark.range(50).select(col("id")).as[Long]
      .map(id => graft.ops.Multimodal.MediaRow(id,
        graft.ops.Multimodal.syntheticPng(id, 16, 16))).toDF()
    val resized = graft.ops.Multimodal.resizeAll(spark, imgs, 8, 8).collect()
    assert(resized.length == 50)
    assert(resized.forall(r => r.status == "ok" && r.pixels.length == 64))
    // non-image payloads (raw text bytes) take the row-error path
    val bad = graft.ops.Multimodal.resizeAll(spark, media, 8, 8).collect()
    assert(bad.length == 50)
    assert(bad.forall(r => r.status.startsWith("error:") && r.pixels.isEmpty))
    val frames = graft.ops.Multimodal.sampleFrames(spark, media, 4)
    val rows = frames.collect()
    assert(rows.groupBy(_.id).forall(_._2.length == 4))
    assert(rows.forall(f => f.offset >= 0 && f.length >= 0 && f.sha8.length == 8))
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
    // deterministic across runs
    assert(rows.map(f => (f.id, f.frameIdx, f.sha8)).toSet ==
      graft.ops.Multimodal.sampleFrames(spark, media, 4).collect()
        .map(f => (f.id, f.frameIdx, f.sha8)).toSet)
  }

  test("tf-idf weights and top terms per group") {
    val df = Seq(
      (1L, "en", "apple banana apple"),
      (2L, "en", "banana cherry"),
      (3L, "fr", "pomme banana")).toDF("doc_id", "lang", "text")
    val w = graft.ops.TfIdf.weights(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(w((1L, "apple")) == ((2L, 1L)))  // tf=2, df=1
    assert(w((1L, "banana")) == ((1L, 3L))) // banana in all 3 docs
    val top = graft.ops.TfIdf.topTermsPerGroup(df, "doc_id", "text", "lang", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // en: apple (2 occ, df 1 -> 6.0) beats banana (2 occ, df 3 -> 2.0) and cherry (1 occ, df 1 -> 3.0)
    assert(top.toSeq.filter(_._1 == "en") == Seq(("en", 1L, "apple"), ("en", 2L, "cherry")))
    assert(top.toSeq.filter(_._1 == "fr").map(_._3) == Seq("pomme", "banana"))
  }

  test("HLL sketch accuracy: approx_count_distinct within 5% of exact") {
    val q = SparkEntry.queries("q_hll")(spark, sf).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      assert(r.getAs[Long]("exact_orders") > 0)
      assert(r.getAs[Boolean]("within_5pct"), r.toString)
    }
  }

  test("multimodal: binary attach + batch audio-stub decode keeps partitioning and determinism") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").filter($"doc_id" < 100)
    val media = Multimodal.attachBinary(docs, "text")
      .select(col("doc_id").as("id"), col("content"), col("media_meta"))
    assert(media.schema("media_meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("n_bytes", "mime", "sha256"))
    val feats = Multimodal.extractAudioFeatures(spark, media, dim = 8)
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.feature.length == 8))
    assert(rows.forall(r => r.loudness >= 0.0 && r.loudness <= 1.0))
    // determinism
    val again = Multimodal.extractAudioFeatures(spark, media, dim = 8).collect()
    assert(rows.map(r => (r.id, r.feature.toSeq)).toSet ==
      again.map(r => (r.id, r.feature.toSeq)).toSet)
    // no shuffle introduced by extractAudioFeatures
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("unicode_normalize: NFC composition, casefold, whitespace collapse") {
    import graft.functions.UnicodeNormalize
    val rows = Seq(
      "Café  DELUXE",          // decomposed é + double space
      "Café deluxe",            // precomposed, already canonical
      "  tabs\tand\nnewlines  ",     // mixed ASCII whitespace + trim
      "nbsp and　ideographic", // non-ASCII spaces
      "").toDF("text")
    val got = rows.select(UnicodeNormalize($"text").as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "café deluxe",
      "café deluxe",
      "tabs and newlines",
      "nbsp and ideographic",
      ""))
  }

  test("unicode_normalize is idempotent and null-safe") {
    import graft.functions.UnicodeNormalize
    val df = Seq(Some("Á  b"), None).toDF("text")
    val once = df.select(UnicodeNormalize($"text").as("n"))
    val twice = once.select(UnicodeNormalize($"n").as("n2"), $"n")
    val rows = twice.collect()
    assert(rows.forall(r => r.isNullAt(0) == r.isNullAt(1)))
    assert(rows.filter(!_.isNullAt(0)).forall(r => r.getString(0) == r.getString(1)))
  }

  test("unicode_normalize is SQL-registered via GraftExtensions") {
    assert(spark.sql("SELECT unicode_normalize('\u00c9cole  Nationale') AS n")
      .collect().head.getString(0) == "\u00e9cole nationale")
  }
}
