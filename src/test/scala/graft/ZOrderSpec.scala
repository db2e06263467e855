package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder64
import graft.ops.ZOrderLayout

class ZOrderSpec extends SparkSpec {

  test("closed-form interleave") {
    // a occupies even bits, b odd bits
    assert(ZOrder64.compute(0L, 0L) == 0L)
    assert(ZOrder64.compute(3L, 0L) == 5L) // 0b11 -> 0b0101
    assert(ZOrder64.compute(0L, 3L) == 10L) // 0b11 -> 0b1010
    assert(ZOrder64.compute(3L, 3L) == 15L)
    assert(ZOrder64.compute(4L, 1L) == 18L) // 0b100 -> 16, 0b1 -> 2
    // low-32-bit mask: bit 32 and up of the input is ignored
    assert(ZOrder64.compute((1L << 32) | 5L, 7L) == ZOrder64.compute(5L, 7L))
    // full 32-bit inputs round-trip without collision on distinct pairs
    assert(ZOrder64.compute(0xFFFFFFFFL, 0L) == 0x5555555555555555L)
    assert(ZOrder64.compute(0L, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
  }

  test("codegen and interpreted paths agree; SQL registration works") {
    import spark.implicits._
    val df = Seq((3L, 5L), (0L, 0L), (123456789L, 987654321L)).toDF("a", "b")
    val viaColumn = df.select(ZOrder64(col("a"), col("b")).as("z")).collect().map(_.getLong(0))
    df.createOrReplaceTempView("zt")
    val viaSql = spark.sql("SELECT zorder64(a, b) FROM zt").collect().map(_.getLong(0))
    val expected = Seq((3L, 5L), (0L, 0L), (123456789L, 987654321L))
      .map { case (a, b) => ZOrder64.compute(a, b) }
    assert(viaColumn.toSeq == expected && viaSql.toSeq == expected)
  }

  test("type check rejects non-long inputs") {
    import spark.implicits._
    val df = Seq(("x", 1L)).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(ZOrder64(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("zorder64") || e.getMessage.contains("DATATYPE"))
  }

  test("z-layout bounds per-file spans on BOTH dimensions; a time sort does not") {
    import spark.implicits._
    // 64x64 grid: ids 0..63 x hours 0..63
    val grid = (0 until 64).flatMap(u => (0 until 64).map(t => (u.toLong, t.toLong)))
      .toDF("uid", "hr")
    val out = java.nio.file.Files.createTempDirectory("graft_zorder").toFile.getAbsolutePath
    ZOrderLayout.write(grid, "uid", "hr", nFiles = 16, out)
    val spans = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg((max("uid") - min("uid")).as("uspan"), (max("hr") - min("hr")).as("hspan"))
      .collect()
    assert(spans.length == 16, s"expected 16 files, got ${spans.length}")
    // 4096 rows / 16 files = 256 consecutive z codes each; a run of 256
    // codes touches at most 2 aligned 16x16 tiles per dimension
    val maxU = spans.map(_.getLong(1)).max
    val maxH = spans.map(_.getLong(2)).max
    assert(maxU <= 47 && maxH <= 47,
      s"z-order files should cover compact rectangles, got uspan=$maxU hspan=$maxH")
    // contrast: hour-sorted layout gives every file the FULL uid span
    val linOut = java.nio.file.Files.createTempDirectory("graft_linear").toFile.getAbsolutePath
    grid.repartitionByRange(16, col("hr")).sortWithinPartitions("hr")
      .write.mode("overwrite").parquet(linOut)
    val linMinU = spark.read.parquet(linOut)
      .groupBy(input_file_name().as("f"))
      .agg((max("uid") - min("uid")).as("uspan"))
      .collect().map(_.getLong(1)).min
    assert(linMinU == 63L, s"time-sorted layout should span all uids per file, got $linMinU")
    assert(maxU < linMinU)
  }

  test("layout is lossless and schema-stable") {
    import spark.implicits._
    val df = Seq((1L, 2L, "a"), (3L, 4L, "b"), (5L, 6L, "c")).toDF("x", "y", "s")
    val out = java.nio.file.Files.createTempDirectory("graft_zorder_rt").toFile.getAbsolutePath
    ZOrderLayout.write(df, "x", "y", nFiles = 2, out)
    val back = spark.read.parquet(out)
    assert(back.columns.sorted.toSeq == Seq("s", "x", "y"))
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("reserved column clash is rejected") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "__graft_z")
    intercept[IllegalArgumentException] {
      ZOrderLayout.clusteredFrame(df, "a", "__graft_z", 2)
    }
  }
}
