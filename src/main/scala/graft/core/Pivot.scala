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
    // NULL pivot values are ordinary keys (the reference indexes None
    // like any value) — lattice joins must be null-safe (<=>), or a
    // null-key group's count silently vanishes into a zero cell.
    def nullSafeLeft(grid: DataFrame, on: Seq[String]): DataFrame = {
      val g = grid.alias("g"); val f = flat.alias("f")
      val cond = on.map(c => col(s"g.$c") <=> col(s"f.$c")).reduce(_ && _)
      g.join(f, cond, "left")
        .select(on.map(c => col(s"g.$c")) :+ col(s"f.$label"): _*)
    }
    val out = attrs match {
      case Seq(_) =>
        // 1-D: keys are the observed values — every cell non-empty
        flat.withColumn(label, coalesce(col(label), lit(0)))
      case Seq(a, b) =>
        // full cross product of the two global key sets
        val grid = keySet(a).crossJoin(keySet(b))
        nullSafeLeft(grid, Seq(a, b))
          .withColumn(label, coalesce(col(label), lit(0)))
      case Seq(a, b, c) =>
        // (global a) × (global b) ⋈ (per-a-branch c keys)
        val branch = broadcast(flat.select(a, c).distinct()).alias("br")
        val grid = keySet(a).alias("ks").crossJoin(keySet(b))
          .join(branch, col(s"ks.$a") <=> col(s"br.$a"), "inner")
          .select(col(s"ks.$a"), col(b), col(s"br.$c"))
        nullSafeLeft(grid, Seq(a, b, c))
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
    // keys stay Option[String] so a NULL key and a real "" key remain
    // DISTINCT nodes (the reference indexes None and '' separately);
    // rendering maps None -> "None" only at the display edge
    val cells = summary().df.collect().map { r =>
      (attrs.indices.map(i => Option(r.get(i)).map(_.toString)).toList,
        r.getLong(attrs.size))
    }
    PivotNode.build("", None, attrs.toList, cells.toList)
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
        // a NULL pivot value is an ordinary key (renders "None", Python
        // str() style — distinct from a real empty string); ordering
        // comes from summary()'s native orderBy, NOT string sorting
        val cells = summary().df.collect()
          .map(r => (PivotNode.showKey(Option(r.get(0)).map(_.toString)), r.getLong(1)))
        val keyW = math.max(1, cells.map(_._1.length).max)
        val valW = math.max(colwidth, cells.map(_._2.toString.length).max)
        cells.foreach { case (k, v) =>
          sb ++= k.padTo(keyW, ' ').take(keyW) + " " + s"%${valW}d".format(v) + "\n"
        }
      case Seq(_, _) =>
        // cells keyed on Option[String]: a NULL key and a real "" (or
        // real "None") key stay DISTINCT cells; None renders "None" only
        // at the display edge
        val cells = summary().df.collect()
          .map(r => (Option(r.get(0)).map(_.toString),
            Option(r.get(1)).map(_.toString), r.getLong(2)))
        // appearance order == summary()'s native key order (the lattice
        // is a full cross product, so every row group lists every col)
        val rowKeys = cells.map(_._1).distinct
        val colKeys = cells.map(_._2).distinct
        val byCell = cells.map { case (a, b, n) => (a, b) -> n }.toMap
        import PivotNode.showKey
        val keyW = math.max(rowKeys.map(showKey(_).length).max max 1, 5)
        val valW = math.max(colwidth, colKeys.map(showKey(_).length).max)
        def num(v: Long) = s"%${valW}d".format(v)
        def pad(s: String, w: Int) = s.padTo(w, ' ').take(w)
        sb ++= " " * keyW + " " +
          colKeys.map(k => s"%${valW}s".format(showKey(k).takeRight(valW))).mkString(" ") +
          " " + s"%${valW}s".format("Total") + "\n"
        rowKeys.foreach { rk =>
          val vals = colKeys.map(ck => byCell.getOrElse((rk, ck), 0L))
          sb ++= pad(showKey(rk), keyW) + " " + vals.map(v => num(v) + " ").mkString + num(vals.sum) + "\n"
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
    // order within a cell by the NON-pivot columns — ordering by the
    // partition keys alone would tie every row and pick survivors
    // nondeterministically
    val cellOrder = {
      val rest = df.columns.filterNot(attrs.contains).map(col).toSeq
      if (rest.nonEmpty) rest else attrs.map(col)
    }
    val limited =
      if (limit < 0) df
      else df.withColumn("__rn", row_number().over(
          Window.partitionBy(attrs.map(col): _*).orderBy(cellOrder: _*)))
        .filter(col("__rn") <= limit).drop("__rn")
    // native key sort BEFORE collect (string-sorting keys would put
    // "10" before "2" on numeric attrs), with the non-pivot columns as
    // tiebreakers so within-cell row order is deterministic too
    val rows = limited.orderBy(attrs.map(col) ++ cellOrder: _*).collect()
    // path keys are Option[String]: a NULL key and a real ""/"None" key
    // are distinct tree nodes (reference indexes None separately); None
    // renders "None" only in pathStr
    def pathOf(r: org.apache.spark.sql.Row): List[Option[String]] = attrs.map(a =>
      Option(r.get(r.fieldIndex(a))).map(_.toString)).toList
    val byPath = rows.groupBy(pathOf)
    val sb = new StringBuilder
    sb ++= s"Pivot: ${attrs.mkString(",")}\n"
    def pathStr(path: List[(String, Option[String])]): String =
      path.map { case (a, k) => s"$a:${PivotNode.showKey(k)}" }.mkString("/")
    def walk(prefix: List[(String, Option[String])], depth: Int): Unit = {
      if (depth == attrs.size) {
        byPath.get(prefix.map(_._2)).foreach(_.foreach(r =>
          sb ++= "  " * (depth + 1) + rowFn(r) + "\n"))
      } else {
        // appearance order over the natively-sorted rows
        val keys = rows.iterator.map(pathOf)
          .filter(_.startsWith(prefix.map(_._2)))
          .map(_(depth)).toSeq.distinct
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
    // escape cell/attribute text (deviation: the reference interpolates
    // raw — unescaped <, & or " would corrupt the markup)
    def esc(s: String) = Html.escape(s)
    def td(v: String, right: Boolean) =
      s"""<td><div align="${if (right) "right" else "left"}">${esc(v)}</div></td>"""
    def th(v: String) = s"""<th><div align="center">${esc(v)}</div></th>"""
    // structural keys stay Option[String] (NULL ≠ "" ≠ literal "None");
    // showKey maps None -> "None" only at the markup edge
    def key(r: org.apache.spark.sql.Row, i: Int): Option[String] =
      Option(r.get(i)).map(_.toString)
    import PivotNode.showKey
    pt.attrs match {
      case Seq(a) =>
        val cells = pt.summary().df.collect().map(r => (key(r, 0), r.getLong(1)))
        val head = s"<tr>${th(a)}${th(colLabel)}</tr>\n"
        val body = cells.map { case (k, v) =>
          s"<tr>${td(showKey(k), right = false)}${td(v.toString, right = true)}</tr>\n"
        }.mkString
        s"<table>\n<thead>\n$head</thead>\n<tbody>\n$body</tbody>\n</table>\n"
      case Seq(a, _) =>
        val cells = pt.summary().df.collect()
          .map(r => (key(r, 0), key(r, 1), r.getLong(2)))
        // appearance order == summary()'s native key order
        val rowKeys = cells.map(_._1).distinct
        val colKeys = cells.map(_._2).distinct
        val byCell = cells.map { case (x, y, n) => (x, y) -> n }.toMap
        val head = s"<tr>${th(a)}${colKeys.map(k => th(showKey(k))).mkString}${th("Total")}</tr>\n"
        val body = rowKeys.map { rk =>
          val vals = colKeys.map(ck => byCell.getOrElse((rk, ck), 0L))
          s"<tr>${td(showKey(rk), right = false)}" +
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
  * subtree's cell-count total, and child nodes in the summary's native
  * key order (NOT string order — "10" must not sort before "2").
  *
  * `keyOpt` is the structural key: `None` is a NULL pivot value, kept
  * distinct from a real empty-string (or literal "None") key exactly as
  * the reference indexes Python `None` separately from `''`. `key`/`keys`
  * are display forms (`None` → "None", Python str() style). */
final case class PivotNode(attr: String, keyOpt: Option[String], count: Long,
    children: Seq[PivotNode]) {
  def key: String = PivotNode.showKey(keyOpt)
  /** Child lookup by DISPLAY key; prefers a non-null structural match, so
    * `apply("None")` only falls back to the null-key child when no real
    * "None" string key exists. */
  def apply(k: String): PivotNode = children.find(_.keyOpt.contains(k))
    .orElse(children.find(_.key == k))
    .getOrElse(throw new NoSuchElementException(s"$attr:$k"))
  /** Structural child lookup (None = the NULL-key child). */
  def get(k: Option[String]): Option[PivotNode] = children.find(_.keyOpt == k)
  def keys: Seq[String] = children.map(_.key)
}

object PivotNode {
  /** Display form of a structural key: NULL renders "None" (Python
    * str() style — the reference's visible rendering of a None key). */
  def showKey(k: Option[String]): String = k.getOrElse("None")

  private[core] def build(attr: String, key: Option[String], rest: List[String],
      cells: List[(List[Option[String]], Long)]): PivotNode = rest match {
    case Nil => PivotNode(attr, key, cells.map(_._2).sum, Nil)
    case next :: tail =>
      // preserve the cells' appearance order (summary() native orderBy)
      val order = cells.map(_._1.head).distinct
      val grouped = cells.groupBy(_._1.head)
      val kids = order.map { k =>
        build(next, k, tail, grouped(k).map { case (p, n) => (p.tail, n) })
      }
      PivotNode(attr, key, kids.map(_.count).sum, kids)
  }
}
