package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.log.{LogFrame, LogOptions}

/** SURVEY.md §5.3: property-based round-trip — generate random typed rows,
  * format them into log lines with a known pattern, parse back and compare
  * field-by-field. (Raw ScalaCheck generators with fixed seeds — the
  * scalatestplus bridge isn't on the offline classpath.)
  */
class RoundTripPropertySpec extends SparkSpec {
  import spark.implicits._

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(12).mkString)

  case class Rec(id: Int, level: String, score: Double, msg: String)
  private val recGen: Gen[Rec] = for {
    id <- Gen.chooseNum(0, Int.MaxValue)
    level <- Gen.oneOf("INFO", "WARN", "ERROR", "DEBUG")
    score <- Gen.chooseNum(-1000000, 1000000).map(_ / 100.0)
    msg <- Gen.nonEmptyListOf(word).map(_.take(8).mkString(" "))
  } yield Rec(id, level, score, msg)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val opts = LogOptions.fromMap(Map(
    "pattern" -> "^(\\d+)\\|(\\w+)\\|(-?[0-9.]+)\\|(.*)$",
    "fieldNames" -> "id, level, score, msg",
    "dataTypes" -> "INT, VARCHAR, DOUBLE, VARCHAR"))

  test("random typed rows survive format -> parse round-trip (10 seeds x 50 rows)") {
    for (seed <- 1L to 10L) {
      val recs = sample(Gen.listOfN(50, recGen), seed)
      val lines = recs.map(r => s"${r.id}|${r.level}|${r.score}|${r.msg}")
      val parsed = LogFrame.parse(lines.toDF("value"), opts)
        .collect().map(r => Rec(r.getInt(0), r.getString(1), r.getDouble(2), r.getString(3)))
      assert(parsed.toSet == recs.toSet, s"seed=$seed")
    }
  }

  test("random non-matching lines all land in unmatched_lines") {
    val junkGen = Gen.nonEmptyListOf(word).map("! " + _.take(6).mkString(" "))
    for (seed <- 1L to 10L) {
      val lines = sample(Gen.listOfN(30, junkGen), seed)
      val out = LogFrame.parse(lines.toDF("value"), opts).collect()
      assert(out.length == lines.count(_.trim.nonEmpty))
      assert(out.forall(r => r.getAs[String]("unmatched_lines") != null))
      assert(out.forall(r => r.isNullAt(r.fieldIndex("id"))))
    }
  }

  test("row count = non-blank line count regardless of content (mixed corpus)") {
    val lineGen = Gen.oneOf(
      recGen.map(r => s"${r.id}|${r.level}|${r.score}|${r.msg}"),
      word.map("junk " + _),
      Gen.const(""),
      Gen.const("   "))
    for (seed <- 1L to 10L) {
      val lines = sample(Gen.listOfN(100, lineGen), seed)
      val out = LogFrame.parse(lines.toDF("value"), opts)
      assert(out.count() == lines.count(_.trim.nonEmpty), s"seed=$seed")
    }
  }

  test("DSV2 source and LogFrame agree on a generated mixed corpus") {
    val lineGen = Gen.oneOf(
      recGen.map(r => s"${r.id}|${r.level}|${r.score}|${r.msg}"),
      word.map("junk " + _))
    val lines = sample(Gen.listOfN(200, lineGen), 7L)
    val dir = java.nio.file.Files.createTempDirectory("rtprop").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "gen.log").toPath, lines.mkString("\n"))
    val viaSource = spark.read.format("log")
      .option("pattern", opts.pattern)
      .option("fieldNames", opts.fieldNames.mkString(","))
      .option("dataTypes", opts.dataTypes.mkString(","))
      .load(dir.getAbsolutePath)
      .orderBy("id", "unmatched_lines").collect().toSeq
    val viaFrame = LogFrame.parse(lines.toDF("value"), opts)
      .orderBy("id", "unmatched_lines").collect().toSeq
    assert(viaSource == viaFrame)
  }
}
