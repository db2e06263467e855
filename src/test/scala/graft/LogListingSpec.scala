package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath}

import org.apache.hadoop.fs.{FileStatus, Path}

import graft.log.{LogOptions, LogScan}

/** Parallel driver-side file listing (VERDICT r9 item 1) and the
  * 100x-file-count scan-scale probe (item 5): the parallel BFS lister
  * must produce the exact serial listing (and therefore the identical
  * chunk set), and the split/bin-pack layer must keep task count
  * decoupled from file count — 10k tiny files collapse into few
  * partitions, one multi-GB file fans OUT into many.
  */
class LogListingSpec extends SparkSpec {

  private def conf = spark.sparkContext.hadoopConfiguration

  /** The pre-round-10 serial recursive walk, kept here as the reference
    * semantics the parallel lister must reproduce. */
  private def listSerial(root: Path): Seq[FileStatus] = {
    val fs = root.getFileSystem(conf)
    def walk(st: FileStatus): Seq[FileStatus] =
      if (st.isFile) Seq(st)
      else fs.listStatus(st.getPath).toSeq.flatMap(walk)
    walk(fs.getFileStatus(root))
  }

  /** Nested tree: depth 3, fan-out 5 dirs per level at the top, a mix of
    * .log files, non-matching extensions, and empty directories. */
  private def buildTree(): JPath = {
    val root = Files.createTempDirectory("graft_listing")
    var n = 0
    for (a <- 0 until 5; b <- 0 until 4) {
      val dir = root.resolve(f"dir_$a%02d/sub_$b%02d")
      Files.createDirectories(dir)
      for (c <- 0 until 6) {
        n += 1
        Files.write(dir.resolve(f"part_$c%02d.log"),
          s"line one of file $n\nline two of file $n\n".getBytes(StandardCharsets.UTF_8))
      }
      Files.write(dir.resolve("skip.txt"), "not a log\n".getBytes(StandardCharsets.UTF_8))
      Files.createDirectories(dir.resolve("empty_leaf"))
    }
    root
  }

  test("parallel listing == serial listing (same files, all threads counts)") {
    val root = buildTree()
    try {
      val rootPath = new Path(root.toUri)
      val serial = listSerial(rootPath).map(f => (f.getPath.toString, f.getLen)).sorted
      for (threads <- Seq(1, 2, 8, 64)) {
        val par = LogScan.listRecursiveParallel(conf, Seq(rootPath), threads)
          .map(f => (f.getPath.toString, f.getLen)).sorted
        assert(par == serial, s"threads=$threads")
      }
      assert(serial.count(_._1.endsWith(".log")) == 5 * 4 * 6)
      assert(serial.count(_._1.endsWith(".txt")) == 5 * 4)
    } finally deleteTree(root)
  }

  test("chunk set from parallel listing is identical to the serial one") {
    val root = buildTree()
    try {
      val rootPath = new Path(root.toUri)
      val opts = LogOptions.fromMap(Map.empty[String, String])
      def chunksOf(files: Seq[FileStatus]) =
        LogScan.chunkFiles(
          files.filter(f => LogScan.matchesExtension(f.getPath.getName, opts.extensions))
            .sortBy(_.getPath.toString),
          opts, conf, maxSplit = 1 << 20)
      // hosts are listing-API-dependent (located vs plain statuses) and
      // advisory-only; the chunk GEOMETRY is the contract
      def geom(cs: Seq[graft.log.LogChunk]) = cs.map(c => (c.path, c.start, c.length, c.fileLen))
      val serialChunks = geom(chunksOf(listSerial(rootPath)))
      val parChunks = geom(chunksOf(LogScan.listRecursiveParallel(conf, Seq(rootPath), 16)))
      assert(parChunks == serialChunks)
      assert(serialChunks.nonEmpty)
    } finally deleteTree(root)
  }

  test("log source reads every line through the parallel lister") {
    val root = buildTree()
    try {
      val df = spark.read.format("log").load(root.toUri.toString)
      // 120 .log files x 2 lines; .txt files and empty dirs excluded
      assert(df.count() == 240)
    } finally deleteTree(root)
  }

  test("scale probe: 10k tiny files bin-pack down, one 4 GiB file fans out") {
    // synthetic FileStatus only — the split/pack layer never opens files
    val tiny = (0 until 10000).map { i =>
      new FileStatus(10 * 1024L, false, 1, 128L << 20, 0L,
        new Path(f"file:/synthetic/logs/tiny_$i%05d.log"))
    }
    val big = new FileStatus(4L << 30, false, 1, 128L << 20, 0L,
      new Path("file:/synthetic/logs/big.log"))
    val files = (tiny :+ big).sortBy(_.getPath.toString)
    val opts = LogOptions.fromMap(Map.empty[String, String])
    val maxSplit = LogScan.splitSize(spark, files)
    val openCost = org.apache.spark.sql.GraftSql.sqlConf(spark).filesOpenCostInBytes
    val chunks = LogScan.chunkFiles(files, opts, conf, maxSplit)
    val parts = LogScan.pack(chunks, maxSplit, openCost)

    // the big file fans out across the cluster instead of being 1 task
    val bigChunks = chunks.filter(_.path.endsWith("big.log"))
    assert(bigChunks.length == math.ceil((4L << 30).toDouble / maxSplit).toLong)
    assert(bigChunks.length > 1)
    assert(bigChunks.map(_.length).sum == 4L << 30)
    // 10_001 files must NOT become 10_001 tasks: openCost-padded greedy
    // packing bounds partitions by ~totalCost/maxSplit, far under #files
    val expectedCeiling =
      (chunks.map(c => c.length + openCost).sum / maxSplit + chunks.length / 100 + 2).toInt
    assert(parts.length <= expectedCeiling,
      s"parts=${parts.length} ceiling=$expectedCeiling maxSplit=$maxSplit")
    assert(parts.length < 1000, s"parts=${parts.length}")
    assert(parts.length >= bigChunks.length) // big chunks land in distinct slots
  }

  private def deleteTree(root: JPath): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(root).iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
  }
}
