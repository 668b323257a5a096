package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Field-string and order-by-string parsers mirroring the reference's
  * mini-DSLs:
  *   - select field strings with `*` expansion and `-name` suppression
  *     (littletable.py:3917-3950 `_parse_fields_string`);
  *   - orderby key strings `"a,b desc"` (littletable.py:2192-2246) where a
  *     trailing `desc` inverts that key.
  */
object FieldSpec {

  /** Expand a select spec like `"*, -l_comment"` or `"a b c"` against the
    * actual columns of `df`. Accepts comma- or whitespace-separated tokens;
    * `*` expands to all (remaining) columns; `-name` removes a column. */
  def parseFields(df: DataFrame, spec: String): Seq[String] = {
    val raw = spec.split("[,\\s]+").map(_.trim).filter(_.nonEmpty).toSeq
    // A suppression-only spec ("-l_comment") means "all columns except" —
    // the reference defaults to '*' when no positive fields are named
    // (littletable.py:3925-3940).
    val tokens = if (raw.forall(_.startsWith("-"))) "*" +: raw else raw
    val all = df.columns.toSeq
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    val suppressed = tokens.collect { case t if t.startsWith("-") => t.drop(1) }.toSet
    tokens.foreach {
      case "*" => all.filterNot(suppressed).foreach(out += _)
      case t if t.startsWith("-") => // handled via suppressed set
      case t => if (!suppressed(t)) out += t
    }
    out.toSeq
  }

  /** Parse `"a, b desc, c asc"` into sort keys. Default direction is
    * ascending, like the reference's `orderby`. */
  def parseOrderBy(spec: String): Seq[SortKey] =
    spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { token =>
      token.split("\\s+").toList match {
        case name :: dir :: Nil if dir.equalsIgnoreCase("desc") => SortKey(col(name), asc = false)
        case name :: dir :: Nil if dir.equalsIgnoreCase("asc")  => SortKey(col(name), asc = true)
        case name :: Nil => SortKey(col(name), asc = true)
        case other => throw new IllegalArgumentException(
          s"bad orderby token: '$token' (${other.mkString(" ")})")
      }
    }
}

/** A sort key with an explicit direction flag, so it can be inverted
  * (for `tail`) without reaching into Catalyst expression internals. */
final case class SortKey(c: Column, asc: Boolean = true) {
  def order: Column = if (asc) c.asc else c.desc
  def inverted: Column = if (asc) c.desc else c.asc
}
object SortKey {
  def asc(name: String): SortKey = SortKey(col(name), asc = true)
  def desc(name: String): SortKey = SortKey(col(name), asc = false)
}
