package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Charset / line-separator / BOM handling on the `log` source (round-12;
  * the reference hardcodes UTF-8 at LogRecordReader.java:127): a Latin-1
  * syslog must decode byte-exactly under `encoding`, a UTF-8 BOM must not
  * corrupt the first field of the first row, CRLF must frame cleanly, and
  * a custom `lineSep` must drive the framing bytes.
  */
class LogEncodingSpec extends SparkSpec {

  private def writeBytes(bytes: Array[Byte]): File = {
    val dir = Files.createTempDirectory("logenc").toFile
    Files.write(new File(dir, "a.log").toPath, bytes)
    dir
  }

  private def readLog(dir: File, extra: (String, String)*) = {
    val base = spark.read.format("log")
      .option("pattern", "(\\d+) (.+)")
      .option("schema", "id INT, msg VARCHAR")
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
      .load(dir.getAbsolutePath)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Int, String)] =
    df.select("id", "msg").collect().filter(!_.isNullAt(0))
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq

  test("ISO-8859-1 bytes decode byte-exactly under encoding=ISO-8859-1") {
    // 0xE9 = 'é' in Latin-1; as UTF-8 it is an invalid sequence and would
    // decode to the replacement char
    val dir = writeBytes("1 café\n2 naïve\n".getBytes(StandardCharsets.ISO_8859_1))
    assert(rows(readLog(dir, "encoding" -> "ISO-8859-1")) ==
      Seq((1, "café"), (2, "naïve")))
    // and the default UTF-8 read really does mangle it (the silent failure
    // the option exists to prevent)
    val mangled = rows(readLog(dir))
    assert(mangled.head._2 != "café", mangled)
  }

  test("UTF-8 BOM on the first line is stripped; later lines untouched") {
    val dir = writeBytes(("\uFEFF" + "1 first\n2 second\n").getBytes(StandardCharsets.UTF_8))
    val got = rows(readLog(dir))
    assert(got == Seq((1, "first"), (2, "second")), got)
    // pattern anchored at line start would miss a BOM-corrupted first line
    val anchored = spark.read.format("log")
      .option("pattern", "^(\\d+) (.+)")
      .option("schema", "id INT, msg VARCHAR")
      .load(dir.getAbsolutePath)
    assert(rows(anchored) == Seq((1, "first"), (2, "second")))
  }

  test("CRLF line endings frame cleanly (no trailing \\r in the last field)") {
    val dir = writeBytes("1 alpha\r\n2 beta\r\n".getBytes(StandardCharsets.UTF_8))
    assert(rows(readLog(dir)) == Seq((1, "alpha"), (2, "beta")))
  }

  test("custom lineSep drives the framing bytes") {
    val dir = writeBytes("1 alpha|2 beta|3 gamma".getBytes(StandardCharsets.UTF_8))
    assert(rows(readLog(dir, "lineSep" -> "|")) ==
      Seq((1, "alpha"), (2, "beta"), (3, "gamma")))
  }

  test("UTF-16LE with explicit lineSep, BOM-headed") {
    val bom = Array[Byte](0xFF.toByte, 0xFE.toByte)
    val body = "1 wide\n2 chars\n".getBytes(StandardCharsets.UTF_16LE)
    val dir = writeBytes(bom ++ body)
    val got = rows(readLog(dir, "encoding" -> "UTF-16LE", "lineSep" -> "\n"))
    assert(got == Seq((1, "wide"), (2, "chars")), got)
  }

  test("multi-byte charsets are never byte-split (delimiter-straddle safety)") {
    import graft.log.LogOptions
    // ASCII-transparent charsets split; UTF-16 families must not: a lineSep
    // byte pair can straddle two characters (U+xx0A then U+00yy in LE), so
    // a mid-file split can false-match and mis-frame its first/last record
    def o(enc: String, sep: Option[String] = None) = LogOptions.fromMap(
      Map("pattern" -> "(\\d+)", "schema" -> "id INT", "encoding" -> enc) ++
        sep.map("linesep" -> _))
    assert(o("UTF-8").splitSafeEncoding)
    assert(o("ISO-8859-1").splitSafeEncoding)
    assert(o("windows-1252").splitSafeEncoding)
    assert(o("US-ASCII").splitSafeEncoding)
    assert(!o("UTF-16LE", Some("\n")).splitSafeEncoding)
    assert(!o("UTF-16BE", Some("\n")).splitSafeEncoding)
    // ASCII round-trip alone is NOT enough (review finding): Shift_JIS/GBK
    // trail bytes cover 0x40-0x7E, ISO-2022-JP is stateful — all must be
    // char-framed even though pure-ASCII text encodes to ASCII bytes
    for (enc <- Seq("Shift_JIS", "windows-31j", "GBK", "Big5", "ISO-2022-JP", "EUC-JP"))
      if (java.nio.charset.Charset.isSupported(enc))
        assert(!o(enc).splitSafeEncoding, s"$enc must not byte-split")
    // end-to-end: chunkFiles yields one whole-file chunk regardless of a
    // tiny maxSplit, and the poison payload — a character whose LE bytes
    // end with 0x0A followed by one starting 0x00 — parses identically to
    // the unsplit read (under UTF-8 + same maxSplit the file WOULD split)
    val poison = "1 aੁ䄀b\n2 tail\n" // U+0A41 = 41 0A LE, U+4100 = 00 41 LE
    val bytes = poison.getBytes(StandardCharsets.UTF_16LE)
    val dir = writeBytes(bytes)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
    val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(new File(dir, "a.log").getAbsolutePath))
    val chunks16 = graft.log.LogScan.chunkFiles(Seq(st), o("UTF-16LE", Some("\n")),
      fs.getConf, maxSplit = 8)
    assert(chunks16.size == 1 && chunks16.head.length == st.getLen, chunks16)
    val chunks8 = graft.log.LogScan.chunkFiles(Seq(st), o("UTF-8"), fs.getConf, maxSplit = 8)
    assert(chunks8.size > 1, "UTF-8 control: the same file should split")
    val got = rows(readLog(dir, "encoding" -> "UTF-16LE", "lineSep" -> "\n"))
    assert(got == Seq((1, "aੁ䄀b"), (2, "tail")), got)
  }

  test("multi-line records assemble under a char-framed (UTF-16LE) read") {
    // recordStartPattern + non-split-safe charset: the char-space framing
    // path must feed the multi-line assembler exactly like the byte path
    val text = "1 START alpha\n  cont-a\n2 START beta\n  cont-b\n"
    val dir = writeBytes(text.getBytes(StandardCharsets.UTF_16LE))
    val got = spark.read.format("log")
      .option("pattern", "(?s)(\\d+) START (\\w+)\\n  (\\S+)")
      .option("schema", "id INT, name VARCHAR, cont VARCHAR")
      .option("recordStartPattern", "^\\d+ START")
      .option("encoding", "UTF-16LE").option("lineSep", "\n")
      .load(dir.getAbsolutePath)
      .select("id", "name", "cont").collect()
      .filter(!_.isNullAt(0)).map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1, "alpha", "cont-a"), (2, "beta", "cont-b")), got)
  }

  test("char-framing differential fuzz: UTF-16LE round-trips adversarial payloads") {
    import org.scalacheck.{Gen, Prop}
    // alphabet stacked with chars whose UTF-16LE bytes contain 0x0A/0x0D
    // (U+0A41, U+4100, U+0D22, U+2200) plus plain ASCII — the byte-aligned
    // scan false-matched exactly these straddles
    val genCh: Gen[Char] = Gen.oneOf('a', 'z', '1', ' ', '.', 2625.toChar,
      16640.toChar, 3362.toChar, 8704.toChar)
    val genLine: Gen[String] = for {
      n <- Gen.choose(1, 12)
      cs <- Gen.listOfN(n, genCh)
      // at least one non-whitespace char or the reader's blank-line skip
      // drops it (by design)
      anchor <- Gen.oneOf('a', 'x', '7')
    } yield (anchor :: cs).mkString
    val prop = Prop.forAllNoShrink(Gen.listOfN(12, genLine)) { lines =>
      val dir = writeBytes((lines.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_16LE))
      val got = spark.read.format("log")
        .option("encoding", "UTF-16LE").option("lineSep", "\n")
        .load(dir.getAbsolutePath)
        .select("line").collect().map(_.getString(0)).toSeq
      val want = lines.filter(_.trim.nonEmpty)
      got.sorted == want.sorted
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(30)
      .withInitialSeed(org.scalacheck.rng.Seed(20260815L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("Shift_JIS trail byte equal to the lineSep byte does not mis-frame") {
    // katakana PO (U+30DD) is 0x83 0x7C in Shift_JIS — its TRAIL byte is
    // '|'. With lineSep="|", byte framing would split mid-character; the
    // char-framing path scans the separator after decode
    assume(java.nio.charset.Charset.isSupported("Shift_JIS"))
    val cs = java.nio.charset.Charset.forName("Shift_JIS")
    val po = 12509.toChar // U+30DD
    val text = s"1 a${po}b|2 tail|"
    val dir = writeBytes(text.getBytes(cs))
    val got = rows(readLog(dir, "encoding" -> "Shift_JIS", "lineSep" -> "|"))
    assert(got == Seq((1, s"a${po}b"), (2, "tail")), got)
  }

  test("EBCDIC (IBM1047): char-space framing makes lineSep charset-independent") {
    // IBM1047 maps '\n' to 0x15, so byte framing could never work; the
    // char-framing path scans the SEPARATOR STRING after decode, so
    // lineSep="\n" works for any charset
    assume(java.nio.charset.Charset.isSupported("IBM1047"))
    val cs = java.nio.charset.Charset.forName("IBM1047")
    val dir = writeBytes("1 mainframe\n2 cobol\n".getBytes(cs))
    import graft.log.LogOptions
    assert(!LogOptions.fromMap(Map("pattern" -> "(\\d+)", "schema" -> "id INT",
      "encoding" -> "IBM1047", "linesep" -> "\n")).splitSafeEncoding)
    val got = rows(readLog(dir, "encoding" -> "IBM1047", "lineSep" -> "\n"))
    assert(got == Seq((1, "mainframe"), (2, "cobol")), got)
  }

  test("expression path rejects encoding/lineSep it cannot honor") {
    val e = intercept[IllegalArgumentException] {
      graft.log.LogFrame.stream(spark, "/tmp/nonexistent", Map(
        "pattern" -> "(\\d+)", "schema" -> "id INT", "encoding" -> "ISO-8859-1"))
    }
    assert(e.getMessage.contains("encoding"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.log.LogFrame.stream(spark, "/tmp/nonexistent", Map(
        "pattern" -> "(\\d+)", "schema" -> "id INT", "linesep" -> "|"))
    }
    assert(e2.getMessage.contains("lineSep"), e2.getMessage)
    // charset ALIASES of UTF-8 are honored, not string-compared away
    val okDir = Files.createTempDirectory("logenc_alias").toFile
    val ok = graft.log.LogFrame.stream(spark, okDir.getAbsolutePath, Map(
      "pattern" -> "(\\d+)", "schema" -> "id INT", "encoding" -> "utf8"))
    assert(ok.isStreaming)
  }

  test("option validation: unknown charset, ambiguous UTF-16, missing lineSep") {
    def opts(kv: (String, String)*) = graft.log.LogOptions.fromMap(
      Map("pattern" -> "(\\d+)", "schema" -> "id INT") ++ kv.toMap)
    intercept[IllegalArgumentException] { opts("encoding" -> "no-such-charset") }
    // byte-order-ambiguous charsets are rejected with a pointer to LE/BE
    intercept[IllegalArgumentException] { opts("encoding" -> "UTF-16") }
    // non-0x0A-newline charsets need explicit framing bytes
    intercept[IllegalArgumentException] { opts("encoding" -> "UTF-16LE") }
    intercept[IllegalArgumentException] { opts("linesep" -> "") }
    // supported combination parses
    assert(opts("encoding" -> "UTF-16LE", "linesep" -> "\n").encoding == "UTF-16LE")
  }
}
