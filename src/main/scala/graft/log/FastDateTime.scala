package graft.log

import java.time.LocalDate

/** Compiled fast path for the all-numeric subset of date/time patterns —
  * the formats log files actually use (`yyyy-MM-dd HH:mm:ss`, `yyMMdd`,
  * `HH:mm:ss`, …). The scan profile (dev/SCAN_PROFILE.md) showed type
  * coercion at ~50% of per-line parse cost, nearly all of it
  * `DateTimeFormatter.parse`'s generic machinery (CharSequence walk,
  * `Parsed` object, temporal queries); this class precompiles the
  * pattern into a fixed-width digit program and parses by position —
  * no allocation, ~10x cheaper per value.
  *
  * Supported tokens: `yyyy`, `yy` (reduced, 2000-2099 — matches
  * `DateTimeFormatter`'s default base), `MM`, `dd`, `HH`, `mm`, `ss`,
  * plus non-letter literal separators. Anything else (variable-width
  * fields, fractions, zones, month names, quoted text) →
  * [[FastDateTime.compile]] returns None and the caller keeps the
  * formatter path. Semantics replicate the formatter under its default
  * SMART resolver, pinned by a differential property spec:
  *   - whole input must be consumed; exact field widths
  *   - month/hour/minute/second validated to their ranges
  *   - day-of-month 1..31 then CLAMPED to the month's last day (SMART:
  *     April 31 → April 30, Feb 30 → Feb 28/29)
  *   - missing time fields resolve to 0 (SMART infers zeroes);
  *     time-of-day requires at least the hour field
  *   - hour 24 with zero minutes/seconds is next-day midnight (the
  *     carry lands in the date; a bare time drops it), else invalid
  * Invalid input throws (any exception — the reader's error routing
  * catches all), matching the formatter's throw-on-invalid contract.
  *
  * DOCUMENTED DEVIATION (pinned in FastDateTimeSpec): the formatter's
  * `yyyy` is `appendValue(YEAR_OF_ERA, 4, 19, SignStyle.EXCEEDS_PAD)`,
  * which also accepts explicitly-signed wide years (`+12345-01-01`).
  * The fast path is fixed-width: such inputs throw and the line
  * error-routes. Log timestamps with five-digit signed years do not
  * occur in practice; a user who needs them configures a pattern
  * outside the compiled subset (e.g. with a zone or text token), which
  * keeps the formatter path.
  */
private[log] final class FastDateTime private (
    ops: Array[Int], // packed (kind << 16 | arg): LIT arg=char, field arg unused
    val hasDate: Boolean,
    val hasTime: Boolean) {
  import FastDateTime._

  // parse scratch (one instance per partition reader, single-threaded —
  // the LineParser matcher-reuse discipline)
  private var y = 0
  private var mo = 1
  private var d = 1
  private var h = 0
  private var mi = 0
  private var sec = 0
  private var carry = 0 // 1 when hour 24 rolled into the next day

  private def fail(s: String): Nothing =
    throw new IllegalArgumentException(s"cannot parse '$s'")

  private def digits(s: String, at: Int, len: Int): Int = {
    if (at + len > s.length) fail(s)
    var v = 0
    var i = at
    val end = at + len
    while (i < end) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') fail(s)
      v = v * 10 + (c - '0')
      i += 1
    }
    v
  }

  /** Run the program over the whole string (must consume it exactly). */
  private def run(s: String): Unit = {
    y = 0; mo = 1; d = 1; h = 0; mi = 0; sec = 0
    var pos = 0
    var i = 0
    while (i < ops.length) {
      val op = ops(i)
      val kind = op >>> 16
      kind match {
        case Lit =>
          if (pos >= s.length || s.charAt(pos) != (op & 0xffff).toChar) fail(s)
          pos += 1
        case Year4 =>
          y = digits(s, pos, 4); pos += 4
          if (y == 0) fail(s) // 'y' is year-of-era: 0000 is out of range
        case Year2 => y = 2000 + digits(s, pos, 2); pos += 2
        case Month =>
          mo = digits(s, pos, 2); pos += 2
          if (mo < 1 || mo > 12) fail(s)
        case Day =>
          d = digits(s, pos, 2); pos += 2
          if (d < 1 || d > 31) fail(s)
        case Hour =>
          h = digits(s, pos, 2); pos += 2
          if (h > 24) fail(s) // 24 allowed iff :00:00 — checked post-run
        case Minute =>
          mi = digits(s, pos, 2); pos += 2
          if (mi > 59) fail(s)
        case Second =>
          sec = digits(s, pos, 2); pos += 2
          if (sec > 59) fail(s)
      }
      i += 1
    }
    if (pos != s.length) fail(s) // formatter rejects unparsed trailing text
    // SMART end-of-day: hour 24 with zero minutes/seconds resolves to
    // midnight of the NEXT day (carried into the date); any other 24:xx
    // is invalid
    if (h == 24) {
      if (mi != 0 || sec != 0) fail(s)
      h = 0
      carry = 1
    } else carry = 0
  }

  /** SMART day-of-month resolution: clamp to the month's last valid day. */
  private def epochDay: Long = {
    val last = lastDayOfMonth(y, mo)
    LocalDate.of(y, mo, if (d > last) last else d).toEpochDay + carry
  }

  /** DATE → days since epoch (requires date fields in the pattern). */
  def parseEpochDay(s: String): Int = {
    if (!hasDate) fail(s)
    run(s)
    epochDay.toInt
  }

  /** TIMESTAMP → epoch micros, UTC; absent time fields are midnight. */
  def parseMicros(s: String): Long = {
    if (!hasDate) fail(s)
    run(s)
    (epochDay * 86400L + h * 3600L + mi * 60L + sec) * 1000000L
  }

  /** TIME → millis of day (requires at least the hour field). */
  def parseMillisOfDay(s: String): Int = {
    if (!hasTime) fail(s)
    run(s)
    (h * 3600 + mi * 60 + sec) * 1000
  }
}

private[log] object FastDateTime {
  private final val Lit = 0
  private final val Year4 = 1
  private final val Year2 = 2
  private final val Month = 3
  private final val Day = 4
  private final val Hour = 5
  private final val Minute = 6
  private final val Second = 7

  private def lastDayOfMonth(y: Int, mo: Int): Int = mo match {
    case 2 => if (java.time.Year.isLeap(y.toLong)) 29 else 28
    case 4 | 6 | 9 | 11 => 30
    case _ => 31
  }

  /** Compile `pattern`, or None when any construct falls outside the
    * fixed-width numeric subset (caller keeps the formatter). */
  def compile(pattern: String): Option[FastDateTime] = {
    val ops = scala.collection.mutable.ArrayBuffer.empty[Int]
    var hasDate = false
    var hasTime = false
    var hasHour = false
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c.isLetter) {
        var j = i
        while (j < pattern.length && pattern.charAt(j) == c) j += 1
        val len = j - i
        val op = (c, len) match {
          case ('y', 4) => hasDate = true; Year4 << 16
          case ('y', 2) => hasDate = true; Year2 << 16
          case ('M', 2) => Month << 16
          case ('d', 2) => Day << 16
          case ('H', 2) => hasHour = true; hasTime = true; Hour << 16
          case ('m', 2) => hasTime = true; Minute << 16
          case ('s', 2) => hasTime = true; Second << 16
          case _ => return None // variable width / unsupported letter
        }
        ops += op
        i = j
      } else if (c == '\'') {
        return None // quoted literals: keep the formatter
      } else {
        ops += (Lit << 16) | c.toInt
        i += 1
      }
    }
    // a date needs all of y/M/d; time fields without an hour can't
    // resolve a LocalTime — both fall back rather than guess
    val months = ops.count(o => (o >>> 16) == Month)
    val days = ops.count(o => (o >>> 16) == Day)
    val years = ops.count(o => (o >>> 16) == Year4 || (o >>> 16) == Year2)
    val dateComplete = years == 1 && months == 1 && days == 1
    val dateAbsent = years == 0 && months == 0 && days == 0
    if (!dateComplete && !dateAbsent) return None
    if (hasTime && !hasHour) return None
    // duplicate time fields (e.g. "HHHH" split) can't happen per-run above;
    // but reject duplicated fields across the pattern for safety
    val dups = Seq(Hour, Minute, Second).exists(k => ops.count(o => (o >>> 16) == k) > 1)
    if (dups) return None
    Some(new FastDateTime(ops.toArray, dateComplete, hasTime))
  }
}
