package graft.log

import java.time.{LocalDate, LocalDateTime, LocalTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.time.temporal.TemporalQueries
import java.util.Locale

import org.scalatest.funsuite.AnyFunSuite

/** Differential equivalence of the compiled numeric date/time fast path
  * against the DateTimeFormatter reference semantics it replaces
  * (LineParser's DATE/TIMESTAMP/TIME conversions): for every (pattern,
  * input) pair, either both succeed with the same value or both throw —
  * including the formatter's SMART quirks (day-of-month clamping,
  * Apr 31 → Apr 30; reduced `yy` base 2000; inferred-zero time fields;
  * rejected year-of-era 0000).
  */
class FastDateTimeSpec extends AnyFunSuite {

  // the formatter paths exactly as LineParser's fallback branch runs them
  private def refEpochDay(fmt: DateTimeFormatter, s: String): Int =
    LocalDate.from(fmt.parse(s)).toEpochDay.toInt
  private def refMicros(fmt: DateTimeFormatter, s: String): Long = {
    val ta = fmt.parse(s)
    val d = ta.query(TemporalQueries.localDate)
    if (d == null) throw new IllegalArgumentException(s"no date fields in '$s'")
    val t = Option(ta.query(TemporalQueries.localTime)).getOrElse(LocalTime.MIDNIGHT)
    val inst = LocalDateTime.of(d, t).toInstant(ZoneOffset.UTC)
    inst.getEpochSecond * 1000000L + inst.getNano / 1000
  }
  private def refMillisOfDay(fmt: DateTimeFormatter, s: String): Int = {
    val t = LocalTime.from(fmt.parse(s))
    t.toSecondOfDay * 1000 + t.getNano / 1000000
  }

  private def agree[A](fast: => A, ref: => A, ctx: String): Unit = {
    val f = try Right(fast) catch { case e: Exception => Left(e.getClass.getSimpleName) }
    val r = try Right(ref) catch { case e: Exception => Left(e.getClass.getSimpleName) }
    (f, r) match {
      case (Right(a), Right(b)) => assert(a == b, s"$ctx: fast=$a ref=$b")
      case (Left(_), Left(_)) => () // both reject — exception type may differ
      case other => fail(s"$ctx: fast/ref disagree on validity: $other")
    }
  }

  private def check(pattern: String, inputs: Seq[String]): Unit = {
    val fastOpt = FastDateTime.compile(pattern)
    assert(fastOpt.isDefined, s"pattern '$pattern' should compile")
    val fast = fastOpt.get
    val fmt = DateTimeFormatter.ofPattern(pattern, Locale.US)
    inputs.foreach { s =>
      agree(fast.parseEpochDay(s), refEpochDay(fmt, s), s"DATE '$pattern' <- '$s'")
      agree(fast.parseMicros(s), refMicros(fmt, s), s"TIMESTAMP '$pattern' <- '$s'")
      agree(fast.parseMillisOfDay(s), refMillisOfDay(fmt, s), s"TIME '$pattern' <- '$s'")
    }
  }

  test("canonical timestamp pattern, valid + adversarial inputs") {
    check("yyyy-MM-dd HH:mm:ss", Seq(
      "2024-02-29 23:59:59", "2023-02-28 00:00:00", "1970-01-01 00:00:00",
      "2007-08-23 21:00:32", "2099-12-31 12:34:56",
      // SMART clamping: day past the month's end
      "2024-04-31 10:00:00", "2024-02-30 10:00:00", "2023-02-29 10:00:00",
      // invalid fields
      "2024-13-01 10:00:00", "2024-00-10 10:00:00", "2024-01-00 10:00:00",
      "2024-01-32 10:00:00", "2024-01-01 24:00:00", "2024-01-01 10:60:00",
      "2024-01-01 10:00:60", "0000-01-01 10:00:00",
      // structural
      "2024-01-01T10:00:00", "2024-01-01 10:00", "2024-01-01 10:00:00x",
      "2024-1-01 10:00:00", "24-01-01 10:00:00", "", "garbage"))
  }

  test("date-only patterns") {
    check("yyyy-MM-dd", Seq(
      "2024-06-15", "2024-02-29", "2023-02-29", "2024-04-31",
      "2024-06-15 ", "2024/06/15", "9999-12-31", "0001-01-01", "0000-12-31"))
    check("yyMMdd", Seq( // reference README's MySQL format
      "070823", "000101", "991231", "070230", "071301", "0708", "07082a"))
    check("dd/MM/yyyy", Seq("23/08/2007", "31/04/2024", "29/02/2024", "30/02/2001"))
  }

  test("time-only patterns") {
    check("HH:mm:ss", Seq(
      "00:00:00", "23:59:59", "21:00:32", "24:00:00", "24:30:00",
      "24:00:01", "25:00:00", "10:60:00",
      "10:00:60", "1:00:00", "10:00", "10:00:00.5"))
    check("HH:mm", Seq("23:59", "00:00", "24:00", "09:60", "0900"))
  }

  test("partial-time timestamp pattern: missing fields resolve to zero") {
    check("yyyy-MM-dd HH:mm", Seq(
      "2024-06-15 10:30", "2024-06-15 00:00", "2024-06-15 24:00",
      "2024-12-31 24:00", "2024-06-15 24:01"))
    check("yyyyMMddHHmmss", Seq("20240615103045", "20240229235959", "20241301000000"))
  }

  test("round-trip sweep: every day of a leap year and every second shape") {
    val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss", Locale.US)
    val fast = FastDateTime.compile("yyyy-MM-dd HH:mm:ss").get
    var d = LocalDate.of(2024, 1, 1)
    var i = 0
    while (d.getYear == 2024) {
      val t = LocalTime.of(i % 24, (i * 7) % 60, (i * 13) % 60)
      val s = LocalDateTime.of(d, t).format(fmt)
      assert(fast.parseMicros(s) == refMicros(fmt, s), s)
      d = d.plusDays(1)
      i += 1
    }
  }

  test("unsupported patterns fall back (compile returns None)") {
    for (p <- Seq("yyyy-MM-dd'T'HH:mm:ss", "yyyy-M-d", "MMM dd yyyy",
        "yyyy-MM-dd HH:mm:ss.SSS", "HH:mm:ss z", "yyyy-MM", "mm:ss")) {
      assert(FastDateTime.compile(p).isEmpty, p)
    }
  }
}
