package graft

import org.apache.spark.sql.DataFrame

import graft.ops.Bpe

/** [[graft.ops.Bpe.trainMergesBatched]] — the amortized trainer (K
  * non-interacting merges per driver round). Pinned here:
  *   - differential vs an in-memory literal replay of the SAME batched
  *     semantics (count, scan in (n desc, a, b) order, admit under the
  *     symbol+concatenation guard, rewrite left-to-right), fuzzed over
  *     random corpora and (merges, K) configs — the distributed plan
  *     can't drift from the documented algorithm;
  *   - K=1 == the sequential [[Bpe.trainMerges]], unconditionally;
  *   - batch == sequential on fixtures whose count gaps make the
  *     divergence window empty (the object-doc contract);
  *   - the concatenation guard: a candidate whose symbol equals an
  *     earlier admit's concatenation is deferred to the next round.
  */
class BpeBatchSpec extends SparkSpec {

  private def corpus(words: (String, Int)*): DataFrame = {
    import spark.implicits._
    words.flatMap { case (w, n) => Seq.fill(n)(w) }
      .grouped(7).map(_.mkString(" ")).toSeq.toDF("text")
  }

  private def run(df: DataFrame, merges: Int, k: Int): Seq[(Int, String, String, Long)] =
    Bpe.trainMergesBatched(df, "text", merges, k).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)

  private def runSeq(df: DataFrame, rounds: Int): Seq[(Int, String, String, Long)] =
    Bpe.trainMerges(df, "text", rounds).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)

  /** Literal in-memory replay of the batched algorithm over (word, cnt)
    * pairs — the differential oracle. */
  private def oracle(words: Seq[(String, Int)], merges: Int, k: Int)
      : Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words
      .groupBy(_._1).map { case (w, g) =>
        w.split("").toVector -> g.map(_._2.toLong).sum
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    while (out.size < merges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- vocab; i <- 0 until syms.size - 1
           if syms(i) != syms(i + 1))
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + cnt
      if (counts.isEmpty) exhausted = true
      else {
        val ordered = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }
        val guard = scala.collection.mutable.Set.empty[String]
        val picked = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        for (((a, b), n) <- ordered if picked.size < math.min(k, merges - out.size))
          if (!guard(a) && !guard(b) && !guard(a + b)) {
            picked += ((a, b, n)); guard ++= Seq(a, b, a + b)
          }
        picked.foreach { case (a, b, n) => out += ((out.size + 1, a, b, n)) }
        val rules = picked.map { case (a, b, _) => (a, b) -> (a + b) }.toMap
        vocab = vocab.toSeq.map { case (syms, cnt) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          for (x <- syms) {
            if (acc.nonEmpty && rules.contains((acc.last, x)))
              acc(acc.size - 1) = rules((acc.last, x))
            else acc += x
          }
          acc.toVector -> cnt
        }.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      }
    }
    out.toSeq
  }

  test("K=1 equals the sequential trainer") {
    val df = corpus("banana" -> 9, "bandana" -> 5, "analog" -> 3, "loan" -> 7)
    for (m <- Seq(1, 3, 6))
      assert(run(df, m, 1) === runSeq(df, m), s"merges=$m")
  }

  test("batch == sequential when count gaps dominate (object-doc contract)") {
    // pair counts: (a,b)=100 via "ab", (c,d)=60, (e,f)=30 — all 2-symbol
    // words, so no merge creates any new pair; disjoint symbols
    val df = corpus("ab" -> 100, "cd" -> 60, "ef" -> 30)
    assert(run(df, 3, 3) === runSeq(df, 3))
    // chain "xyz": (x,y) and (y,z) overlap on y — batch defers (y,z);
    // sequential round 2 sees (xy,z) instead. Both end at the same table.
    val chain = corpus("xyz" -> 50)
    assert(run(chain, 2, 2) === runSeq(chain, 2))
  }

  test("concatenation guard defers (ab, x) in the batch that admits (a, b)") {
    // "ab" exists as a symbol pair AND as the concat of the top admit:
    // words "qab" give pair (q,a)... construct directly: "ab"x40 makes
    // (a,b)=40 the top admit; "abz" (split a,b,z) contributes (a,b)+6 and
    // (b,z)=6 — no symbol "ab" yet. After round 1, "abz" is (ab,z).
    // A K=3 batch at round 1 must NOT admit any pair with symbol "a","b"
    // or "ab"; (c,d)=10 IS admitted.
    val df = corpus("ab" -> 40, "abz" -> 6, "cd" -> 10)
    val got = run(df, 3, 3)
    assert(got.take(2).map(t => (t._2, t._3, t._4)) ===
      Seq(("a", "b", 46L), ("c", "d", 10L)))
    // (ab,z) lands in the NEXT round with its re-counted value
    assert(got(2) === ((3, "ab", "z", 6L)))
    assert(got === oracle(Seq("ab" -> 40, "abz" -> 6, "cd" -> 10), 3, 3))
  }

  test("fuzz: distributed batched trainer equals the in-memory replay") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abcdef"
    for (round <- 0 until 12) {
      val nWords = 3 + rnd.nextInt(10)
      val words = (0 until nWords).map { _ =>
        val len = 2 + rnd.nextInt(5)
        val w = (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        w -> (1 + rnd.nextInt(20))
      }
      val merges = 1 + rnd.nextInt(6)
      val k = 1 + rnd.nextInt(4)
      val got = run(corpus(words: _*), merges, k)
      val want = oracle(words, merges, k)
      assert(got === want, s"round=$round words=$words merges=$merges k=$k")
    }
  }

  test("hot shared symbol past the default horizon: batch still fills via re-collect") {
    // 70 candidates all containing 'e' (counts 166..300) rank ABOVE the
    // only disjoint pair (p,q)=10 at position 71 — past the default
    // horizon max(8*want, 64)=64 for K=2. Full-order admission must admit
    // (a,e) then skip every other e-pair and still reach (p,q) WITH ITS
    // ROUND-START COUNT; a truncated horizon would silently shrink the
    // batch and emit (b,e) from round 2 instead.
    val others = "abcdfghijklmnopqrstuvwxyz0123456789".toSeq // 35 chars, no 'e'
    val words =
      others.zipWithIndex.map { case (c, i) => s"${c}e" -> (300 - i) } ++
        others.zipWithIndex.map { case (c, i) => s"e$c" -> (200 - i) } ++
        Seq("pq" -> 10)
    val df = corpus(words: _*)
    val got = run(df, 2, 2)
    assert(got === Seq((1, "a", "e", 300L), (2, "p", "q", 10L)))
    assert(got === oracle(words, 2, 2))
  }

  test("fuzz at wide alphabet / larger K: distributed == in-memory replay") {
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    for (round <- 0 until 6) {
      val nWords = 20 + rnd.nextInt(40)
      // bias toward a few hot symbols so admission skips are frequent
      val hot = alphabet(rnd.nextInt(alphabet.length))
      val words = (0 until nWords).map { _ =>
        val len = 2 + rnd.nextInt(5)
        val w = (0 until len).map(i =>
          if (rnd.nextInt(3) == 0) hot
          else alphabet(rnd.nextInt(alphabet.length))).mkString
        w -> (1 + rnd.nextInt(50))
      }
      val merges = 4 + rnd.nextInt(20)
      val k = 2 + rnd.nextInt(7)
      val got = run(corpus(words: _*), merges, k)
      val want = oracle(words, merges, k)
      assert(got === want, s"round=$round merges=$merges k=$k hot=$hot")
    }
  }

  test("argument validation") {
    val df = corpus("ab" -> 1)
    intercept[IllegalArgumentException](Bpe.trainMergesBatched(df, "text", 0, 1))
    intercept[IllegalArgumentException](Bpe.trainMergesBatched(df, "text", 32769, 1))
    intercept[IllegalArgumentException](Bpe.trainMergesBatched(df, "text", 1, 0))
    intercept[IllegalArgumentException](Bpe.trainMergesBatched(df, "text", 1, 513))
    // the r14 caps (4096 / 64) are now inside the allowed range
    assert(Bpe.trainMergesBatched(df, "text", 1, 512).count() >= 0)
  }
}
