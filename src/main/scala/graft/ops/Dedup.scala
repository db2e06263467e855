package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * and exact n-gram Jaccard — all expressed as declarative DataFrame plans
  * (shuffle-on-key group-bys and bucket joins), so Catalyst/AQE handle
  * partial aggregation, broadcast decisions, and skew splitting at scale.
  *
  * Scale notes (100 TB posture):
  *  - exact dedup is a single hash-shuffle on the dedup key; map-side
  *    partial aggregation makes the shuffle carry one row per distinct key
  *    per task, not per input row.
  *  - LSH candidate generation shuffles on (band, bandHash) — bounded by
  *    `bands` rows per document regardless of corpus size; the quadratic
  *    blow-up of naive all-pairs never materializes.
  *  - near-identical-document floods (the classic LSH skew case) are
  *    handled by AQE skew-join splitting; `maxBucketSize` additionally
  *    drops degenerate buckets (an explicit, logged coverage cap).
  */
object Dedup {

  /** Exact dedup on a derived key (hash-groupBy; keeps min id per key —
    * deterministic, unlike dropDuplicates' arbitrary row).
    */
  def exact(df: DataFrame, idCol: String, key: Column): DataFrame =
    df.withColumn("__key", key)
      .groupBy("__key")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .drop("__key")

  /** MinHash signature: `numHashes` permutations approximated by seeded
    * xxhash64 (Broder's min-wise independent permutations); component i =
    * min over shingles of hash_i(shingle). One pass, pure codegen'd builtins.
    */
  def minhashSignature(text: Column, shingleN: Int, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(TextFunctions.shingles(text, shingleN), s => xxhash64(i, s))))

  /** LSH band keys: signature split into `bands` bands of `rowsPerBand`
    * components, each band hashed to one bucket key.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** Candidate near-duplicate pairs via MinHash+LSH banding.
    *
    * Returns (idA, idB, est_jaccard) with idA < idB, distinct. Documents
    * sharing at least one of `bands` band-buckets become candidates;
    * est_jaccard is the fraction of agreeing signature components.
    */
  def minhashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigs = df.select(
      col(idCol).as("__id"),
      minhashSignature(col(textCol), shingleN, numHashes).as("__sig"))

    val banded = sigs
      .select(col("__id"), col("__sig"),
        posexplode(lshBandKeys(col("__sig"), bands, rowsPerBand)).as(Seq("__band", "__bkey")))

    // Degenerate-bucket guard: a bucket of B identical docs yields B^2/2
    // pairs; cap it (coverage loss is logged by callers via the returned
    // bucket stats if needed). Window count avoids a second shuffle.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__band", "__bkey")
    val capped = banded.withColumn("__bsize", count(lit(1)).over(w))
      .filter(col("__bsize") <= maxBucketSize)
      .drop("__bsize")

    val a = capped.select(col("__band"), col("__bkey"),
      col("__id").as("idA"), col("__sig").as("__sigA"))
    val b = capped.select(col("__band"), col("__bkey"),
      col("__id").as("idB"), col("__sig").as("__sigB"))
    a.join(b, Seq("__band", "__bkey"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        (aggregate(zip_with(col("__sigA"), col("__sigB"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
          .cast("double") / lit(numHashes).cast("double")).as("est_jaccard"))
      .groupBy("idA", "idB").agg(max("est_jaccard").as("est_jaccard"))
  }

  /** Exact shingle-set Jaccard for a set of candidate pairs (verification
    * stage after LSH blocking): array_intersect/array_union on distinct
    * shingle arrays — no explode, no extra shuffle beyond the two joins.
    */
  def verifyJaccard(
      candidates: DataFrame, // (idA, idB)
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("__vid"),
      array_distinct(TextFunctions.shingles(col(textCol), shingleN)).as("__sh"))
    candidates
      .join(sh.withColumnRenamed("__vid", "idA").withColumnRenamed("__sh", "__shA"), "idA")
      .join(sh.withColumnRenamed("__vid", "idB").withColumnRenamed("__sh", "__shB"), "idB")
      .withColumn("jaccard",
        size(array_intersect(col("__shA"), col("__shB"))).cast("double") /
          size(array_union(col("__shA"), col("__shB"))).cast("double"))
      .select("idA", "idB", "jaccard")
  }

  /** Exact token-set Jaccard over all same-`blockCol` pairs via the
    * inverted-index join (explode tokens → join on token → count
    * intersections). SQL-reproducible for the oracle; the blocking column
    * keeps the pair space linear-ish instead of all-pairs.
    */
  def tokenJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      threshold: Double): DataFrame = {
    val toks = df.select(col(blockCol).as("__blk"), col(idCol).as("__id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("__tok"))
    val counts = toks.groupBy("__id").agg(count(lit(1)).as("__n"))
    val inter = toks.alias("a")
      .join(toks.alias("b"),
        col("a.__blk") === col("b.__blk") && col("a.__tok") === col("b.__tok") &&
          col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("idA"), col("b.__id").as("idB"))
      .agg(count(lit(1)).as("__inter"))
    inter
      .join(counts.select(col("__id").as("idA"), col("__n").as("__nA")), "idA")
      .join(counts.select(col("__id").as("idB"), col("__n").as("__nB")), "idB")
      .withColumn("jaccard",
        col("__inter").cast("double") / (col("__nA") + col("__nB") - col("__inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("idA", "idB", "jaccard")
  }
}
