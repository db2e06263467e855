package graft.log

import java.time.{LocalDate, LocalDateTime, LocalTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.time.temporal.TemporalQueries
import java.util.Locale

import org.apache.spark.SparkException
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure `(line: String) => InternalRow` implementing the reference scan's
  * per-row pipeline (SURVEY.md §2A #3-#13): regex match (one `find()` per
  * line, unanchored — `LogRecordReader.java:224-225`), per-group typed
  * coercion, and matched/unmatched routing into `unmatched_lines`
  * (`LogRecordReader.java:283-292`).
  *
  * Only the columns in `required` are extracted and converted — real
  * projection pruning, unlike the reference which converts every group and
  * lets the host trim downstream (`LogFormatPlugin.java:76-79`,
  * SURVEY.md §2A #16).
  */
final class LineParser(opts: LogOptions, required: StructType) extends Serializable {

  // (requiredRowOrdinal, captureGroupIndex(1-based), dataTypeName)
  private val fieldSlots: Array[(Int, Int, String)] =
    required.fields.iterator.zipWithIndex.collect {
      case (f, ord) if f.name != LogOptions.UnmatchedCol =>
        val gi = opts.fieldNames.indexOf(f.name)
        require(gi >= 0, s"[log] required column '${f.name}' not in fieldNames")
        (ord, gi + 1, opts.dataTypes(gi))
    }.toArray

  private val unmatchedOrdinal: Int =
    required.fields.indexWhere(_.name == LogOptions.UnmatchedCol)

  private val numFields = required.length

  // A count(*)-style scan in PERMISSIVE mode needs no regex work at all:
  // every non-blank line is exactly one row regardless of match.
  private val needsMatch = fieldSlots.nonEmpty || unmatchedOrdinal >= 0 || opts.failFast

  @transient private lazy val matcher = opts.compiledPattern.matcher("")
  @transient private lazy val dateFmt: DateTimeFormatter =
    DateTimeFormatter.ofPattern(opts.dateFormat, Locale.US)
  @transient private lazy val timeFmt: DateTimeFormatter =
    DateTimeFormatter.ofPattern(opts.timeFormat, Locale.US)

  /** Parse one non-blank line into the required row. Throws in FAILFAST mode
    * on unmatched lines or unconvertible values; never throws in PERMISSIVE.
    */
  def parse(line: String): InternalRow = {
    val row = new GenericInternalRow(numFields)
    if (!needsMatch) return row
    matcher.reset(line)
    if (matcher.find()) { // unanchored find(), LRR:225 — do not anchor
      var i = 0
      while (i < fieldSlots.length) {
        val (ord, group, dt) = fieldSlots(i)
        val raw = matcher.group(group)
        // Divergence (SURVEY.md §7.4): unparticipating optional group → NULL,
        // not "" (reference: LRR:234-236 coerces to "" which crashes numeric
        // parsing fatally even in tolerant mode).
        if (raw != null) {
          try row.update(ord, convert(raw, dt))
          catch {
            case e: Exception if !opts.failFast => row.update(ord, null) // tolerant: LRR:249-255 semantics
            case e: Exception =>
              throw new SparkException(
                s"[log] FAILFAST: cannot convert '$raw' to $dt in line: $line", e)
          }
        }
        i += 1
      }
    } else if (opts.failFast) {
      throw new SparkException(s"[log] FAILFAST: line does not match pattern '${opts.pattern}': $line") // LRR:284-285
    } else if (unmatchedOrdinal >= 0) {
      row.update(unmatchedOrdinal, UTF8String.fromString(line)) // LRR:287-290
    }
    row
  }

  /** String → Spark internal value for one capture group (SURVEY.md §1.3). */
  private def convert(raw: String, dt: String): Any = dt match {
    case "INT" | "INTEGER" => java.lang.Integer.valueOf(raw) // LRR:238-239
    case "DOUBLE" | "FLOAT8" => java.lang.Double.valueOf(raw) // LRR:240-241
    case "FLOAT" | "FLOAT4" => java.lang.Float.valueOf(raw) // LRR:242-243
    case "DATE" => // LRR:244-255; UTC pinned (reference: JVM-default tz)
      java.lang.Integer.valueOf(LocalDate.from(dateFmt.parse(raw)).toEpochDay.toInt)
    case "TIMESTAMP" => // LRR:256-267 — same formatter as DATE (no separate timestamp format)
      val ta = dateFmt.parse(raw)
      val d = ta.query(TemporalQueries.localDate)
      if (d == null) throw new IllegalArgumentException(s"no date fields in '$raw'")
      val t = Option(ta.query(TemporalQueries.localTime)).getOrElse(LocalTime.MIDNIGHT)
      val inst = LocalDateTime.of(d, t).toInstant(ZoneOffset.UTC)
      java.lang.Long.valueOf(inst.getEpochSecond * 1000000L + inst.getNano / 1000)
    case "TIME" => // LRR:268-275: millis-of-day; honors timeFormat (reference bug LRR:324 not replicated)
      val t = LocalTime.from(timeFmt.parse(raw))
      java.lang.Integer.valueOf(t.toSecondOfDay * 1000 + t.getNano / 1000000)
    case _ => UTF8String.fromString(raw) // VARCHAR / unknown: LRR:276-281, no 4 KB limit
  }
}
