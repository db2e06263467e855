package graft

import java.time.LocalDate

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}

import graft.log.{LogOptions, PartitionValues}

/** Differential fuzz for [[PartitionValues.eval]]: claiming a partition
  * filter means Catalyst REMOVES its own copy, so the file-level
  * evaluation must reproduce Catalyst's three-valued semantics exactly —
  * a file survives pruning iff Catalyst's `Filter` would keep its rows.
  * The oracle is Spark itself: the same predicate over a one-row
  * DataFrame carrying the partition values; `eval == Some(true)` must
  * equal "the row survives".
  *
  * Shapes covered: every leaf [[PartitionValues.supportedFilter]] claims
  * (comparisons, In, IsNull/IsNotNull, EqualNullSafe incl. null value,
  * string prefix/suffix/contains) composed under And/Or/Not to depth 3,
  * over STRING/INT/LONG/DATE columns with null values in play.
  */
class PartitionFilterFuzzSpec extends SparkSpec {

  private val opts = LogOptions.fromMap(Map(
    "pattern" -> "(\\d+)",
    "schema" -> "id INT",
    "partitionschema" -> "s STRING, i INT, l LONG, d DATE"))

  // small value pools make collisions (equality hits) likely
  private val genS: Gen[String] = Gen.oneOf("a", "ab", "b", "ba", "")
  private val genI: Gen[java.lang.Integer] =
    Gen.oneOf(-1, 0, 1, 7).map(java.lang.Integer.valueOf)
  private val genL: Gen[java.lang.Long] =
    Gen.oneOf(-1L, 0L, 1L, 7L).map(java.lang.Long.valueOf)
  private val genD: Gen[java.sql.Date] =
    Gen.oneOf("2024-01-01", "2024-01-02", "2024-06-30").map(java.sql.Date.valueOf)

  private def genValueFor(c: String): Gen[Any] = c match {
    case "s" => genS
    case "i" => genI
    case "l" => genL
    case "d" => genD
  }

  private val genCol: Gen[String] = Gen.oneOf("s", "i", "l", "d")

  private def genLeaf: Gen[Filter] = genCol.flatMap { c =>
    val v = genValueFor(c)
    val cmp = Gen.oneOf[Any => Filter](
      EqualTo(c, _), GreaterThan(c, _), GreaterThanOrEqual(c, _),
      LessThan(c, _), LessThanOrEqual(c, _), EqualNullSafe(c, _))
    Gen.frequency(
      6 -> (for (mk <- cmp; x <- v) yield mk(x)),
      2 -> Gen.listOfN(2, v).map(vs => In(c, vs.toArray[Any])),
      1 -> Gen.const(IsNull(c)),
      1 -> Gen.const(IsNotNull(c)),
      1 -> Gen.const(EqualNullSafe(c, null)),
      2 -> (if (c == "s")
        for (p <- Gen.oneOf("a", "b", ""); mk <- Gen.oneOf[String => Filter](
          StringStartsWith(c, _), StringEndsWith(c, _), StringContains(c, _)))
          yield mk(p)
      else for (mk <- cmp; x <- v) yield mk(x)))
  }

  private def genFilter(depth: Int): Gen[Filter] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      4 -> genLeaf,
      2 -> (for (l <- genFilter(depth - 1); r <- genFilter(depth - 1)) yield And(l, r)),
      2 -> (for (l <- genFilter(depth - 1); r <- genFilter(depth - 1)) yield Or(l, r)),
      1 -> genFilter(depth - 1).map(Not))

  // partition values: each column null ~1/3 of the time
  private def genValues: Gen[Map[String, Option[Any]]] = for {
    s <- Gen.option(genS); i <- Gen.option(genI)
    l <- Gen.option(genL); d <- Gen.option(genD)
  } yield Map("s" -> s, "i" -> i, "l" -> l, "d" -> d)

  /** sources.Filter → Column, for the Spark-side oracle evaluation. */
  private def toColumn(f: Filter): Column = f match {
    case EqualTo(a, v)            => col(a) === lit(v)
    case EqualNullSafe(a, v)      => col(a) <=> lit(v)
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
    case And(l, r)                => toColumn(l) && toColumn(r)
    case Or(l, r)                 => toColumn(l) || toColumn(r)
    case Not(c)                   => !toColumn(c)
    case other => throw new IllegalStateException(s"unexpected filter $other")
  }

  private def internal(v: Option[Any]): Any = v match {
    case None => null
    case Some(s: String) => UTF8String.fromString(s)
    case Some(i: java.lang.Integer) => i
    case Some(l: java.lang.Long) => l
    case Some(d: java.sql.Date) =>
      Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
    case Some(other) => throw new IllegalStateException(s"unexpected value $other")
  }

  test("eval matches Catalyst's three-valued filter semantics (forAll)") {
    import scala.jdk.CollectionConverters._
    val session = spark
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "s STRING, i INT, l LONG, d DATE")
    val prop = Prop.forAllNoShrink(genFilter(3), genValues) {
      (f: Filter, vals: Map[String, Option[Any]]) =>
        assert(PartitionValues.supportedFilter(f, opts),
          s"generator produced an unclaimable filter: $f")
        val row = org.apache.spark.sql.Row(
          vals("s").orNull, vals("i").orNull, vals("l").orNull, vals("d").orNull)
        val df = session.createDataFrame(List(row).asJava, schema)
        val sparkKeeps = df.filter(toColumn(f)).count() == 1L
        val values = vals.map { case (c, v) => c -> internal(v) }
        val evalKeeps = PartitionValues.eval(f, values).contains(true)
        if (evalKeeps != sparkKeeps) {
          println(s"[fuzz] MISMATCH filter=$f values=$vals " +
            s"spark=$sparkKeeps eval=${PartitionValues.eval(f, values)}")
        }
        evalKeeps == sparkKeeps
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(250)
      .withInitialSeed(org.scalacheck.rng.Seed(20260815L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("LocalDate filter values compare identically to java.sql.Date") {
    val values = Map[String, Any](
      "s" -> null, "i" -> null, "l" -> null,
      "d" -> Integer.valueOf(LocalDate.parse("2024-01-02").toEpochDay.toInt))
    for (probe <- Seq("2024-01-01", "2024-01-02", "2024-06-30")) {
      val viaSql = PartitionValues.eval(
        GreaterThanOrEqual("d", java.sql.Date.valueOf(probe)), values)
      val viaLocal = PartitionValues.eval(
        GreaterThanOrEqual("d", LocalDate.parse(probe)), values)
      assert(viaSql == viaLocal, s"probe=$probe sql=$viaSql local=$viaLocal")
    }
  }
}
