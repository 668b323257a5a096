package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference `table.pivot(attrs)` → `_PivotTable` tree (littletable.py:
  * 2724-2742, 4295-4508), rebuilt Spark-first for 1-3 pivot attributes.
  *
  * Key-lattice semantics (pinned against the reference implementation, not
  * its docstring): the reference builds each node's children from its
  * PARENT's index of the child attribute. So
  *   - level-1 keys = global distinct values of attr1,
  *   - level-2 keys = global distinct values of attr2 (every level-1
  *     branch gets the full set — a 2-D pivot is the full cross product),
  *   - level-3 keys = distinct values of attr3 WITHIN the level-1 branch.
  * Branch×key combinations with no rows surface as zero-count cells
  * (`as_table`, littletable.py:4457-4505). [[summary]] reproduces exactly
  * this lattice with one aggregation pass plus broadcast-size key joins —
  * the base table is scanned once; everything after operates on the
  * (tiny) aggregated cells.
  *
  * The tree form ([[PivotTree]]) is a driver-side reshape of the same
  * cells for rendering (`dump`, `dump_counts`, `summarize`) — collect-at-
  * edge like the other renderers, never part of a distributed plan.
  */
final class PivotTable(val table: GTable, val attrs: Seq[String]) {
  require(attrs.nonEmpty && attrs.size <= 3,
    s"pivot supports 1-3 attributes, got ${attrs.size}")

  private def df: DataFrame = table.df

  /** Observed cells: one groupBy over the pivot attrs (single shuffle;
    * map-side partial aggregation applies). */
  private def observed(agg: Column, label: String): DataFrame =
    df.groupBy(attrs.map(col): _*).agg(agg.as(label))

  /** Reference `as_table` / `summary_counts` (littletable.py:4457-4505):
    * the flat key-lattice table with one row per lattice cell, zero for
    * empty cells, ordered by the pivot attrs. Default aggregate is the
    * cell count (`fn=len`); pass e.g. `sum(col("qty"))` for
    * `as_table(fn=sum, col="qty")`.
    *
    * Scale shape: the lattice is assembled FROM the aggregated cells
    * (distinct-key sets of an already-aggregated frame), so the base
    * table contributes one scan + one shuffle regardless of lattice
    * size; the key joins are broadcast-size. */
  def summary(agg: Column = count(lit(1)), label: String = "count"): GTable = {
    val flat = observed(agg, label)
    // The key-set product plans as a BroadcastNestedLoopJoin — expected
    // and safe here: both sides are DISTINCT KEY SETS of the already-
    // aggregated cells (bounded by the pivot-key cardinality, broadcast-
    // size by construction), never the data. Documented in AuditPlans'
    // expected-BNLJ list.
    def keySet(cols: String*): DataFrame =
      broadcast(flat.select(cols.map(col): _*).distinct())
    val out = attrs match {
      case Seq(_) =>
        // 1-D: keys are the observed values — every cell non-empty
        flat.withColumn(label, coalesce(col(label), lit(0)))
      case Seq(a, b) =>
        // full cross product of the two global key sets
        val grid = keySet(a).crossJoin(keySet(b))
        grid.join(flat, Seq(a, b), "left")
          .withColumn(label, coalesce(col(label), lit(0)))
      case Seq(a, b, c) =>
        // (global a) × (global b) ⋈ (per-a-branch c keys)
        val grid = keySet(a).crossJoin(keySet(b))
          .join(broadcast(flat.select(a, c).distinct()), Seq(a), "inner")
        grid.join(flat, Seq(a, b, c), "left")
          .withColumn(label, coalesce(col(label), lit(0)))
    }
    GTable(out.orderBy(attrs.map(col): _*), s"${table.name}_pivot",
      attrs.map(a => SortKey(col(a))))
  }

  /** Alias matching the reference name. */
  def summaryCounts(agg: Column = count(lit(1)), label: String = "count"): GTable =
    summary(agg, label)

  /** Driver-side tree of the same lattice (reference `_PivotTable`
    * subtables). Cell values are counts. */
  def tree: PivotNode = {
    val cells = summary().df.collect().map { r =>
      (attrs.indices.map(i => Option(r.get(i)).map(_.toString).getOrElse("")).toList,
        r.getLong(attrs.size))
    }
    PivotNode.build("", "", attrs.toList, cells.toList)
  }

  /** Reference `dump_counts` (littletable.py:4395-4454): tabular text
    * summary for 1- and 2-attribute pivots, byte-compatible with the
    * reference's format. */
  def dumpCounts(colwidth: Int = 10): String = {
    val sb = new StringBuilder
    sb ++= s"Pivot: ${attrs.mkString(",")}\n"
    attrs match {
      case _ if table.df.isEmpty =>
        // empty source: header only (the reference's max() over keys
        // would throw on an empty table too — we choose graceful)
      case Seq(_) =>
        val cells = summary().df.collect().map(r => (r.get(0).toString, r.getLong(1)))
        val keyW = cells.map(_._1.length).max
        val valW = math.max(colwidth, cells.map(_._2.toString.length).max)
        cells.foreach { case (k, v) =>
          sb ++= k.padTo(keyW, ' ').take(keyW) + " " + s"%${valW}d".format(v) + "\n"
        }
      case Seq(_, _) =>
        val cells = summary().df.collect()
          .map(r => (r.get(0).toString, r.get(1).toString, r.getLong(2)))
        val rowKeys = cells.map(_._1).distinct.sorted
        val colKeys = cells.map(_._2).distinct.sorted
        val byCell = cells.map { case (a, b, n) => (a, b) -> n }.toMap
        val keyW = math.max(rowKeys.map(_.length).max, 5)
        val valW = math.max(colwidth, colKeys.map(_.length).max)
        def num(v: Long) = s"%${valW}d".format(v)
        def pad(s: String, w: Int) = s.padTo(w, ' ').take(w)
        sb ++= " " * keyW + " " +
          colKeys.map(k => s"%${valW}s".format(k.takeRight(valW))).mkString(" ") +
          " " + s"%${valW}s".format("Total") + "\n"
        rowKeys.foreach { rk =>
          val vals = colKeys.map(ck => byCell.getOrElse((rk, ck), 0L))
          sb ++= pad(rk, keyW) + " " + vals.map(v => num(v) + " ").mkString + num(vals.sum) + "\n"
        }
        val colTotals = colKeys.map(ck => rowKeys.map(rk => byCell.getOrElse((rk, ck), 0L)).sum)
        sb ++= pad("Total", keyW) + " " + colTotals.map(num).mkString(" ") +
          " " + num(colTotals.sum) + "\n"
      case _ =>
        throw new IllegalArgumentException(
          "can only dump summary counts for 1 or 2-attribute pivots")
    }
    sb.toString
  }

  /** Reference `dump` (littletable.py:4363-4393): nested listing of the
    * pivot tree with up to `limit` leaf rows per deepest cell (-1 = all).
    * Leaf rows render via `rowFn` over the row's values. Edge rendering:
    * the per-cell limit is applied distributedly (window row_number per
    * cell) before the single collect. */
  def dump(rowFn: org.apache.spark.sql.Row => String = _.toString,
      limit: Int = -1): String = {
    import org.apache.spark.sql.expressions.Window
    val limited =
      if (limit < 0) df
      else df.withColumn("__rn", row_number().over(
          Window.partitionBy(attrs.map(col): _*).orderBy(attrs.map(col): _*)))
        .filter(col("__rn") <= limit).drop("__rn")
    val rows = limited.collect()
    val byPath = rows.groupBy(r => attrs.map(a =>
      Option(r.get(r.fieldIndex(a))).map(_.toString).getOrElse("")).toList)
    val sb = new StringBuilder
    sb ++= s"Pivot: ${attrs.mkString(",")}\n"
    def pathStr(path: List[(String, String)]): String =
      path.map { case (a, k) => s"$a:$k" }.mkString("/")
    def walk(prefix: List[(String, String)], depth: Int): Unit = {
      if (depth == attrs.size) {
        byPath.get(prefix.map(_._2)).foreach(_.foreach(r =>
          sb ++= "  " * (depth + 1) + rowFn(r) + "\n"))
      } else {
        val keys = byPath.keys.filter(_.startsWith(prefix.map(_._2)))
          .map(_(depth)).toSeq.distinct.sorted
        keys.foreach { k =>
          val p = prefix :+ (attrs(depth) -> k)
          sb ++= "  " * (depth + 1) + pathStr(p) + "\n"
          walk(p, depth + 1)
        }
      }
    }
    walk(Nil, 0)
    sb.toString
  }

  /** Reference `summarize()` → `_PivotTableSummary` (littletable.py:
    * 4508-4599). */
  def summarize(label: Option[String] = None): PivotSummary = {
    val colLabel = label.getOrElse(if (attrs.size == 1) attrs.head else "value")
    new PivotSummary(this, colLabel)
  }
}

/** HTML summary of a pivot (reference `_PivotTableSummary.as_html`,
  * littletable.py:4536-4599).
  *
  * DEVIATION (documented, like the outer-join naming in SURVEY.md §2.3):
  * the reference's 2-D `as_html` zips each data row against the
  * column-key list, truncating every row to [row-key, first-cell] and
  * omitting the row-attr/Total headers — a data-losing bug. This emits
  * the evidently-intended shape: full header (row attr, each column key,
  * Total), every cell, a Total column, and a Total row, in the
  * reference's cell markup (`<td><div align="...">`). */
final class PivotSummary(pt: PivotTable, colLabel: String) {

  def asHtml: String = {
    def td(v: String, right: Boolean) =
      s"""<td><div align="${if (right) "right" else "left"}">$v</div></td>"""
    def th(v: String) = s"""<th><div align="center">$v</div></th>"""
    pt.attrs match {
      case Seq(a) =>
        val cells = pt.summary().df.collect().map(r => (r.get(0).toString, r.getLong(1)))
        val head = s"<tr>${th(a)}${th(colLabel)}</tr>\n"
        val body = cells.map { case (k, v) =>
          s"<tr>${td(k, right = false)}${td(v.toString, right = true)}</tr>\n"
        }.mkString
        s"<table>\n<thead>\n$head</thead>\n<tbody>\n$body</tbody>\n</table>\n"
      case Seq(a, _) =>
        val cells = pt.summary().df.collect()
          .map(r => (r.get(0).toString, r.get(1).toString, r.getLong(2)))
        val rowKeys = cells.map(_._1).distinct.sorted
        val colKeys = cells.map(_._2).distinct.sorted
        val byCell = cells.map { case (x, y, n) => (x, y) -> n }.toMap
        val head = s"<tr>${th(a)}${colKeys.map(th).mkString}${th("Total")}</tr>\n"
        val body = rowKeys.map { rk =>
          val vals = colKeys.map(ck => byCell.getOrElse((rk, ck), 0L))
          s"<tr>${td(rk, right = false)}" +
            vals.map(v => td(v.toString, right = true)).mkString +
            td(vals.sum.toString, right = true) + "</tr>\n"
        }.mkString
        val colTotals = colKeys.map(ck => rowKeys.map(rk => byCell.getOrElse((rk, ck), 0L)).sum)
        val totalRow = s"<tr>${td("Total", right = false)}" +
          colTotals.map(v => td(v.toString, right = true)).mkString +
          td(colTotals.sum.toString, right = true) + "</tr>\n"
        s"<table>\n<thead>\n$head</thead>\n<tbody>\n$body$totalRow</tbody>\n</table>\n"
      case _ =>
        throw new IllegalArgumentException(
          "no HTML output format for 3-attribute pivot tables")
    }
  }
}

/** One node of the driver-side pivot tree: `attr:key` path segment, the
  * subtree's cell-count total, and child nodes in sorted key order. */
final case class PivotNode(attr: String, key: String, count: Long,
    children: Seq[PivotNode]) {
  def apply(k: String): PivotNode = children.find(_.key == k)
    .getOrElse(throw new NoSuchElementException(s"$attr:$k"))
  def keys: Seq[String] = children.map(_.key)
}

object PivotNode {
  private[core] def build(attr: String, key: String, rest: List[String],
      cells: List[(List[String], Long)]): PivotNode = rest match {
    case Nil => PivotNode(attr, key, cells.map(_._2).sum, Nil)
    case next :: tail =>
      val kids = cells.groupBy(_._1.head).toSeq.sortBy(_._1).map { case (k, sub) =>
        build(next, k, tail, sub.map { case (p, n) => (p.tail, n) })
      }
      PivotNode(attr, key, kids.map(_.count).sum, kids)
  }
}
