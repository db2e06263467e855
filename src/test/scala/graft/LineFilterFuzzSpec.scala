package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}

import graft.log.{LineParser, LogOptions}

/** Differential fuzz for the reader's claimed DATA-filter evaluation
  * ([[LineParser.compile]]): claiming removes Catalyst's Filter, so the
  * in-reader predicate must reproduce Spark SQL semantics exactly —
  * including the floating-point corners the scaladoc promises (NaN
  * greatest and equal to itself, -0.0 == 0.0) and null three-valued
  * logic. Oracle = Spark evaluating the same predicate over a one-row
  * DataFrame carrying the value.
  */
class LineFilterFuzzSpec extends SparkSpec {

  private val opts = LogOptions.fromMap(Map(
    "pattern" -> "(\\d+) (\\S+) (\\S+) (\\S+)",
    "schema" -> "i INT, dbl DOUBLE, flt FLOAT, s VARCHAR"))

  private val slotOf = Map("i" -> 0, "dbl" -> 1, "flt" -> 2, "s" -> 3)

  private val genI: Gen[java.lang.Integer] =
    Gen.oneOf(-2, -1, 0, 1, 7).map(java.lang.Integer.valueOf)
  private val genDbl: Gen[java.lang.Double] =
    Gen.oneOf(Double.NaN, 0.0, -0.0, -1.5, 1.5, Double.PositiveInfinity,
      Double.NegativeInfinity).map(java.lang.Double.valueOf)
  private val genFlt: Gen[java.lang.Float] =
    Gen.oneOf(Float.NaN, 0.0f, -0.0f, -1.5f, 1.5f, Float.PositiveInfinity)
      .map(java.lang.Float.valueOf)
  private val genS: Gen[String] = Gen.oneOf("", "a", "ab", "b")

  private def genFilterValue(c: String): Gen[Any] = c match {
    case "i"   => genI
    case "dbl" => genDbl
    case "flt" => genFlt
    case "s"   => genS
  }

  private def genLeaf: Gen[Filter] = Gen.oneOf("i", "dbl", "flt", "s").flatMap { c =>
    val v = genFilterValue(c)
    val cmp = Gen.oneOf[Any => Filter](
      EqualTo(c, _), GreaterThan(c, _), GreaterThanOrEqual(c, _),
      LessThan(c, _), LessThanOrEqual(c, _))
    Gen.frequency(
      6 -> (for (mk <- cmp; x <- v) yield mk(x)),
      2 -> Gen.listOfN(2, v).map(vs => In(c, vs.toArray[Any])),
      1 -> Gen.const(IsNull(c)),
      1 -> Gen.const(IsNotNull(c)),
      2 -> (if (c == "s")
        for (p <- Gen.oneOf("a", "b", ""); mk <- Gen.oneOf[String => Filter](
          StringStartsWith(c, _), StringEndsWith(c, _), StringContains(c, _)))
          yield mk(p)
      else for (mk <- cmp; x <- v) yield mk(x)))
  }

  // row values: each column null ~1/4 of the time
  private def genRow: Gen[(Option[java.lang.Integer], Option[java.lang.Double],
      Option[java.lang.Float], Option[String])] = for {
    i <- Gen.option(genI); d <- Gen.option(genDbl)
    f <- Gen.option(genFlt); s <- Gen.option(genS)
  } yield (i, d, f, s)

  private def toColumn(f: Filter): Column = f match {
    case EqualTo(a, v)            => col(a) === lit(v)
    case GreaterThan(a, v)        => col(a) > lit(v)
    case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
    case LessThan(a, v)           => col(a) < lit(v)
    case LessThanOrEqual(a, v)    => col(a) <= lit(v)
    case In(a, vs)                => col(a).isin(vs.toIndexedSeq: _*)
    case IsNull(a)                => col(a).isNull
    case IsNotNull(a)             => col(a).isNotNull
    case StringStartsWith(a, p)   => col(a).startsWith(p)
    case StringEndsWith(a, p)     => col(a).endsWith(p)
    case StringContains(a, p)     => col(a).contains(p)
    case other => throw new IllegalStateException(s"unexpected filter $other")
  }

  test("compile() matches Catalyst on NaN, signed zero, nulls, strings (forAll)") {
    import scala.jdk.CollectionConverters._
    val session = spark
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "i INT, dbl DOUBLE, flt FLOAT, s STRING")
    val prop = Prop.forAllNoShrink(genLeaf, genRow) { (f, row) =>
      assert(LineParser.supportedFilter(f, opts),
        s"generator produced an unclaimable filter: $f")
      val (i, d, fl, s) = row
      val sparkRow = org.apache.spark.sql.Row(i.orNull, d.orNull, fl.orNull, s.orNull)
      val df = session.createDataFrame(List(sparkRow).asJava, schema)
      val sparkKeeps = df.filter(toColumn(f)).count() == 1L
      val fvals: Array[Any] = Array(
        i.orNull, d.orNull, fl.orNull,
        s.map(UTF8String.fromString).orNull)
      val readerKeeps = LineParser.compile(f, slotOf)(fvals)
      if (readerKeeps != sparkKeeps) {
        println(s"[fuzz] MISMATCH filter=$f row=$row spark=$sparkKeeps reader=$readerKeeps")
      }
      readerKeeps == sparkKeeps
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(250)
      .withInitialSeed(org.scalacheck.rng.Seed(20260816L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
