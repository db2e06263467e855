package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.log.ParseLogLine

/** SQL builders for expressions whose constructors take Scala literals. */
object ParseLogLineSql {

  def build(args: Seq[Expression]): ParseLogLine = args match {
    case Seq(line, Literal(p: UTF8String, _)) => ParseLogLine(line, p.toString)
    case _ =>
      throw new IllegalArgumentException(
        "parse_log_line(line, pattern) requires a string-literal pattern")
  }

  def intArg(args: Seq[Expression], i: Int): Int = args(i) match {
    case Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(s"argument $i must be an integer literal, got $other")
  }
}
