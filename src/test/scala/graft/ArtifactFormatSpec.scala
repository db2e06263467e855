package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._

import graft.ops.{ArtifactFormat, BandPostings, Dedup, IvfIndex, Pq}

/** Every persisted artifact carries a magic+kind+version stamp
  * ([[graft.ops.ArtifactFormat]]); loaders must reject — loudly and
  * specifically — foreign files, truncated stamps, OTHER artifact kinds,
  * and unknown format versions, instead of decoding garbage. Round-trip
  * happy paths live with each artifact's own spec (DedupSpec, IvfSpec,
  * SemDedupSpec); this spec owns the rejection matrix.
  */
class ArtifactFormatSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("text")).limit(50)

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"artifact_$tag").toString

  /** Overwrite `p` with `bytes` and drop Hadoop LocalFileSystem's stale
    * `.name.crc` checksum sidecar — otherwise the checksum layer rejects
    * the tampered file before the stamp check under test ever runs. */
  private def tamper(p: java.nio.file.Path, bytes: Array[Byte]): Unit = {
    Files.write(p, bytes, StandardOpenOption.TRUNCATE_EXISTING)
    Files.deleteIfExists(p.resolveSibling("." + p.getFileName.toString + ".crc"))
  }

  private def msgOf(t: Throwable): String = {
    var c: Throwable = t
    while (c.getCause != null && (c.getMessage == null || c.getMessage.isEmpty))
      c = c.getCause
    Option(c.getMessage).getOrElse("")
  }

  // ---- KeyBloom (binary stream) ----

  test("KeyBloom.load rejects foreign, truncated, wrong-kind and wrong-version files") {
    val dir = tmpDir("bloom")
    val good = s"$dir/filter.bloom"
    val kb = Dedup.buildKeyBloom(docs, col("doc_id"), expectedKeys = 1000L)
    kb.save(spark, good)
    // round-trip still fine with the stamp in front
    assert(graft.ops.KeyBloom.load(spark, good).expectedKeys == 1000L)

    // foreign bytes (pre-versioning files look the same: no magic)
    val foreign = s"$dir/foreign.bin"
    Files.write(Paths.get(foreign), Array.fill[Byte](64)(7))
    val e1 = intercept[java.io.IOException](graft.ops.KeyBloom.load(spark, foreign))
    assert(msgOf(e1).contains("not a graft KeyBloom artifact"), msgOf(e1))

    // truncated inside the stamp
    val torn = s"$dir/torn.bloom"
    Files.write(Paths.get(torn), Files.readAllBytes(Paths.get(good)).take(6))
    val e2 = intercept[java.io.IOException](graft.ops.KeyBloom.load(spark, torn))
    assert(msgOf(e2).contains("truncated inside the format stamp"), msgOf(e2))

    // truncated after the stamp (body): loud failure from the filter codec
    val tornBody = s"$dir/torn_body.bloom"
    Files.write(Paths.get(tornBody), Files.readAllBytes(Paths.get(good)).take(24))
    intercept[Exception](graft.ops.KeyBloom.load(spark, tornBody))

    // wrong kind: a stamp for another artifact type
    val wrongKind = s"$dir/kind.bloom"
    val out1 = new java.io.DataOutputStream(Files.newOutputStream(Paths.get(wrongKind)))
    try ArtifactFormat.writeStamp(out1, ArtifactFormat.KindPqModel) finally out1.close()
    val e3 = intercept[java.io.IOException](graft.ops.KeyBloom.load(spark, wrongKind))
    assert(msgOf(e3).contains("holds a Pq model artifact"), msgOf(e3))

    // wrong version
    val wrongVer = s"$dir/ver.bloom"
    val out2 = new java.io.DataOutputStream(Files.newOutputStream(Paths.get(wrongVer)))
    try {
      out2.writeInt(ArtifactFormat.Magic)
      out2.writeInt(ArtifactFormat.KindKeyBloom)
      out2.writeInt(99)
    } finally out2.close()
    val e4 = intercept[java.io.IOException](graft.ops.KeyBloom.load(spark, wrongVer))
    assert(msgOf(e4).contains("format version 99"), msgOf(e4))
  }

  // ---- BandPostings (parquet dir + stamped params sidecar) ----

  test("BandPostings.load rejects tampered params sidecars, round-trips stamped ones") {
    val dir = tmpDir("postings") + "/posts"
    Dedup.bandPostings(docs, "doc_id", "text").save(dir)
    val loaded = BandPostings.load(spark, dir)
    assert(loaded.posts.count() > 0)

    // truncate the params sidecar mid-stamp
    val params = Paths.get(dir, "_graft_band_params")
    val full = Files.readAllBytes(params)
    tamper(params, full.take(5))
    val e1 = intercept[java.io.IOException](BandPostings.load(spark, dir))
    assert(msgOf(e1).contains("truncated inside the format stamp"), msgOf(e1))

    // pre-versioning layout (three raw ints, no magic) is rejected, not misread
    val raw = java.nio.ByteBuffer.allocate(12).putInt(5).putInt(64).putInt(16).array()
    tamper(params, raw)
    val e2 = intercept[java.io.IOException](BandPostings.load(spark, dir))
    assert(msgOf(e2).contains("not a graft BandPostings artifact"), msgOf(e2))

    // restore and confirm it loads again (the parquet half was untouched)
    tamper(params, full)
    assert(BandPostings.load(spark, dir).bands == loaded.bands)

    // missing sidecar entirely: the existing FileNotFound contract
    Files.delete(params)
    intercept[java.io.FileNotFoundException](BandPostings.load(spark, dir))
  }

  // ---- Pq / IvfIndex models (parquet dir + _graft_format sidecar) ----

  test("Pq.load and IvfIndex.load reject unstamped dirs and each other's artifacts") {
    val pqDir = tmpDir("pq") + "/model"
    val ivfDir = tmpDir("ivf") + "/model"
    val pq = Pq.train(emb, "vec_id", "embedding", blocks = 4, codebookSize = 8)
    val ivf = IvfIndex.train(emb, "vec_id", "embedding", nLists = 8, iterations = 0)
    Pq.save(pq, spark, pqDir)
    IvfIndex.save(ivf, spark, ivfDir)
    assert(Pq.load(spark, pqDir).blocks == 4)
    assert(IvfIndex.load(spark, ivfDir).centroids.length == 8)

    // kind crossover: each loader names what it found
    val e1 = intercept[java.io.IOException](IvfIndex.load(spark, pqDir))
    assert(msgOf(e1).contains("holds a Pq model artifact"), msgOf(e1))
    val e2 = intercept[java.io.IOException](Pq.load(spark, ivfDir))
    assert(msgOf(e2).contains("holds a IvfIndex model artifact"), msgOf(e2))

    // unstamped dir (pre-versioning save): FileNotFound with re-save hint
    val sidecar = Paths.get(pqDir, "_graft_format")
    Files.delete(sidecar)
    val e3 = intercept[java.io.FileNotFoundException](Pq.load(spark, pqDir))
    assert(msgOf(e3).contains("pre-versioning"), msgOf(e3))

    // truncated sidecar
    val ivfSidecar = Paths.get(ivfDir, "_graft_format")
    tamper(ivfSidecar, Files.readAllBytes(ivfSidecar).take(7))
    val e4 = intercept[java.io.IOException](IvfIndex.load(spark, ivfDir))
    assert(msgOf(e4).contains("truncated inside the format stamp"), msgOf(e4))
  }
}
