package graft

import org.apache.spark.sql.functions._
import graft.core.{Cmp, GTable, SortKey}

case class KV(k: Int, v: String)

/** Core operator semantics over the reference's abc-grid workhorse
  * (FIXTURES.md A.1: product(range(n), repeat=3)). */
class GTableSpec extends SparkSpec {
  import spark.implicits._

  val n = 4
  lazy val abc = GTable(
    (for { a <- 0 until n; b <- 0 until n; c <- 0 until n } yield (a, b, c))
      .toDF("a", "b", "c"), "abc").df.cache() // 64 rows
  lazy val t = GTable(abc, "abc")

  test("where comparators: eq/within/inRange/isIn boundary semantics") {
    assert(t.whereEq("a" -> 1).size == 16)
    assert(t.where("a" -> Cmp.within(1, 2)).size == 32)   // closed: 1,2
    assert(t.where("a" -> Cmp.between(0, 3)).size == 32)  // open: 1,2
    assert(t.where("a" -> Cmp.inRange(1, 3)).size == 32)  // half-open: 1,2
    assert(t.where("a" -> Cmp.isIn(0, 3)).size == 32)
    assert(t.where("a" -> Cmp.eq(1), "b" -> Cmp.eq(2), "c" -> Cmp.gt(1)).size == 2)
  }

  test("orderby string DSL + head/tail/slice/rank") {
    val ordered = t.orderby("a desc, b, c")
    val top = ordered.head(3).df.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(top.toSeq == Seq((3, 0, 0), (3, 0, 1), (3, 0, 2)))
    val bottom = ordered.tail(2).df.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(bottom.toSeq == Seq((0, 3, 2), (0, 3, 3)))
    val ranked = ordered.rank("rnk").df.filter(col("rnk") <= 2)
      .orderBy("rnk").collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(ranked.toSeq == Seq((3, 0, 0), (3, 0, 1)))
    val sliced = t.orderby("a, b, c").slice(1, 3).df.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(sliced.toSeq == Seq((0, 0, 1), (0, 0, 2))) // python tbl[1:3]
  }

  test("unique keeps first occurrence in stated order (littletable.py:3773)") {
    val u = t.unique(Seq("a"), Seq(col("b").asc, col("c").asc))
    val got = u.df.orderBy("a").collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == (0 until n).map(a => (a, 0, 0)))
    assert(t.unique().size == 64) // whole-row dedup, all distinct
  }

  test("union null-fills heterogeneous columns (reference bag semantics)") {
    val t1 = GTable(Seq((1, "x")).toDF("a", "s"), "t1")
    val t2 = GTable(Seq((2, 9.5)).toDF("a", "d"), "t2")
    val u = t1 + t2
    assert(u.columns == Seq("a", "s", "d"))
    assert(u.size == 2)
    val rows = u.df.orderBy("a").collect()
    assert(rows(0).getString(1) == "x" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == 9.5)
  }

  test("batched assigns fixed-size pages in order (littletable.py:3616)") {
    val b = t.orderby("a, b, c").batched(10)
    val sizes = b.df.groupBy("batch").count().orderBy("batch")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sizes.toSeq == Seq((0L, 10L), (1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 10L), (6L, 4L)))
  }

  test("groupbyRuns: one group per consecutive run (unit_tests.py:1950-1954)") {
    val seqT = GTable(Seq(
      (1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "a"), (6, "c"), (7, "c"))
      .toDF("i", "k"), "runs").orderby(SortKey.asc("i"))
    val runs = seqT.groupbyRuns("k").df.orderBy("i")
      .select("__run").collect().map(_.getLong(0)).toSeq
    assert(runs == Seq(1L, 1L, 2L, 2L, 3L, 4L, 4L))
  }

  test("splitby routes by predicate incl. nulls to the false side") {
    val withNull = GTable(Seq[(Integer, String)]((1, "x"), (null, "y"), (5, "z"))
      .toDF("v", "s"), "t")
    val (no, yes) = withNull.splitby(col("v") > 2)
    assert(yes.size == 1 && no.size == 2)
  }

  test("null semantics: delete keeps NULL-predicate rows; whereEq matches null; checkUnique flags null keys") {
    val withNull = GTable(Seq[(Integer, String)]((1, "x"), (null, "y"), (5, "z"))
      .toDF("v", "s"), "t")
    // delete: NULL predicate = not matched = kept
    assert(withNull.delete(col("v") > 2).size == 2) // keeps 1 and null
    // whereEq(null) matches null values (reference where(attr=None))
    assert(withNull.whereEq("v" -> null).size == 1)
    // splitbyWithErrors: NULL-pred non-error rows land in the false table
    val (no, yes, err) = withNull.splitbyWithErrors(col("v") > 2, lit(false))
    assert(no.size == 2 && yes.size == 1 && err.size == 0)
    // checkUnique(acceptNone=false) reports even a single null key
    assert(withNull.checkUnique("v").count() == 1)
    assert(withNull.checkUnique("v", acceptNone = true).count() == 0)
  }

  test("stats: exact per-field statistics (littletable.py:3832)") {
    val row = t.stats(Seq("a")).df.collect()(0)
    val idx = t.stats(Seq("a")).df.columns.zipWithIndex.toMap
    assert(row.getDouble(idx("a_mean")) == 1.5)
    assert(row.getDouble(idx("a_median")) == 1.5)
    assert(row.getInt(idx("a_min")) == 0)
    assert(row.getInt(idx("a_max")) == 3)
    assert(row.getLong(idx("a_count")) == 64)
    assert(row.getLong(idx("a_missing")) == 0)
  }

  test("keyed access: byUnique / byAll / checkUnique (littletable.py:424-602)") {
    val kt = GTable(Seq((1, "x"), (2, "y"), (2, "z")).toDF("k", "v"), "kt")
    assert(kt.byUnique("k", 1).getString(1) == "x")
    intercept[NoSuchElementException](kt.byUnique("k", 9))
    intercept[IllegalStateException](kt.byUnique("k", 2))
    assert(kt.byAll("k", 2).size == 2)
    val viol = kt.checkUnique("k").collect()
    assert(viol.length == 1 && viol(0).getInt(0) == 2 && viol(0).getLong(1) == 2L)
  }

  test("typed Dataset view (Table[T] → Dataset[T])") {
    val ds = GTable(Seq((1, "x")).toDF("k", "v"), "kt").typed[KV]
    assert(ds.collect().toSeq == Seq(KV(1, "x")))
  }

  test("field/orderby string parsers (littletable.py:3917-3950, 2192-2246)") {
    import graft.core.FieldSpec
    val df = Seq((1, 2, 3)).toDF("a", "b", "c")
    assert(FieldSpec.parseFields(df, "*") == Seq("a", "b", "c"))
    assert(FieldSpec.parseFields(df, "*, -b") == Seq("a", "c"))
    assert(FieldSpec.parseFields(df, "c a") == Seq("c", "a"))      // order kept
    assert(FieldSpec.parseFields(df, "a, -a, *") == Seq("b", "c")) // suppression wins
    // suppression-only spec defaults to '*' minus the suppressed
    // (littletable.py:3925-3940)
    assert(FieldSpec.parseFields(df, "-b") == Seq("a", "c"))
    assert(FieldSpec.parseFields(df, "-b, -c") == Seq("a"))
    val keys = FieldSpec.parseOrderBy("a, b desc, c asc")
    assert(keys.map(k => (k.c.toString, k.asc)) ==
      Seq(("a", true), ("b", false), ("c", true)))
  }

  test("renderers: markdown alignment + html escaping") {
    val tiny = GTable(Seq((1, "a<b")).toDF("n", "s"), "tiny")
    val md = tiny.asMarkdown()
    assert(md ==
      """#| n | s |
        #| ---: | --- |
        #| 1 | a<b |""".stripMargin('#'))
    val html = tiny.asHtml()
    assert(html.contains("a&lt;b") && html.contains("text-align:right"))
  }

  test("present: boxed grid with title, title-cased headers, justification (littletable.py:3952-4036)") {
    val tbl = GTable(Seq(
      ("north", "a", 10, "widget"),
      ("north", "b", 5, "gizmo x"),
      ("south", "c", 125, "doodad")
    ).toDF("region_name", "code", "qty", "item"), "stock")
    val txt = tbl.orderby("region_name, code").presentText(groupby = Seq("region_name"))
    val expected =
      """#                stock
        #+-------------+------+-----+---------+
        #| Region Name | Code | Qty | Item    |
        #+-------------+------+-----+---------+
        #| north       |  a   |  10 | widget  |
        #|             |  b   |   5 | gizmo x |
        #| south       |  c   | 125 | doodad  |
        #+-------------+------+-----+---------+""".stripMargin('#')
    assert(txt == expected, s"got:\n$txt")
  }

  test("renderers: formats + table_properties (littletable.py:4071-4157, 1221-1254)") {
    val tiny = GTable(Seq((1, 3.14159), (2, 2.71828)).toDF("n", "x"), "tiny")
      .orderby("n")
    val fmts: Map[String, Any => String] = Map(
      "x" -> (v => f"${v.asInstanceOf[Double]}%.2f"),
      "n" -> (v => f"${v.asInstanceOf[Int]}%03d"))
    val html = tiny.asHtml(formats = fmts, tableProperties = Map("border" -> "2"))
    assert(html.startsWith("<table border=\"2\">"))
    assert(html.contains(">3.14</td>") && html.contains(">001</td>"))
    val md = tiny.asMarkdown(formats = fmts)
    assert(md.contains("| 001 | 3.14 |") && md.contains("| 002 | 2.72 |"))
    // a quote in a property value must not break out of the attribute
    val quoted = tiny.asHtml(tableProperties = Map("title" -> "a\"b"))
    assert(quoted.startsWith("<table title=\"a&quot;b\">"))
  }

  test("slicePy: Python slice semantics incl. negatives and step") {
    val seq10 = GTable((0 until 10).map(i => Tuple1(i)).toDF("i"), "s10")
      .orderby(SortKey.asc("i"))
    def got(start: Option[Long], stop: Option[Long], step: Long): Seq[Int] = {
      val s = seq10.slicePy(start, stop, step)
      s.df.orderBy(s.sortKeys.map(_.order): _*).collect().map(_.getInt(0)).toSeq
    }
    assert(got(Some(2), Some(5), 1) == Seq(2, 3, 4))          // [2:5]
    assert(got(Some(-3), None, 1) == Seq(7, 8, 9))            // [-3:]
    assert(got(None, None, 2) == Seq(0, 2, 4, 6, 8))          // [::2]
    assert(got(None, None, -1) == (9 to 0 by -1))             // [::-1]
    assert(got(Some(5), Some(1), -2) == Seq(5, 3))            // [5:1:-2]
    assert(got(Some(20), None, 1) == Seq())                   // clamped empty
  }

  test("sampleStratified: deterministic, per-stratum fractions honored") {
    val docs = GTable(spark.read.parquet("/root/testdata/sf0.01/documents.parquet"), "docs")
    val fr: Map[Any, Double] = Map("en" -> 0.5, "de" -> 0.1)
    val s1 = docs.sampleStratified("lang", fr).df.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = docs.sampleStratified("lang", fr).df.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2, "seeded sampling must be deterministic")
    assert(s1.keySet == Set("en", "de"), "absent strata dropped")
    val totals = docs.df.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(s1("en").toDouble / totals("en") - 0.5) < 0.1)
    assert(math.abs(s1("de").toDouble / totals("de") - 0.1) < 0.05)
  }

  test("approxQuantiles: single-pass sketch close to exact") {
    val q = t.approxQuantiles(Seq("a"), Seq(0.5), relErr = 0.001)
    assert(q("a").head == 1.0 || q("a").head == 2.0) // median of 0,1,2,3 grid
  }

  test("renderers: group-suppressed columns (littletable.py:1085-1089)") {
    val tg = GTable(Seq(("x", 1, 10), ("x", 1, 11), ("x", 2, 12), ("y", 2, 13))
      .toDF("g1", "g2", "v"), "tg").orderby("g1, g2, v")
    val md = tg.asMarkdown(groupby = Seq("g1", "g2"))
    assert(md ==
      """#| g1 | g2 | v |
        #| --- | ---: | ---: |
        #| x | 1 | 10 |
        #|  |  | 11 |
        #|  | 2 | 12 |
        #| y | 2 | 13 |""".stripMargin('#'))
  }

  test("statsTable: reference shapes (by_field=True and transposed)") {
    val byField = t.statsTable(Seq("a", "b")).df.collect()
    assert(byField.length == 2)
    val aRow = byField.find(_.getString(0) == "a").get
    assert(aRow.getDouble(1) == 1.5 && aRow.getLong(7) == 64L && aRow.getLong(8) == 0L)
    val transposed = t.statsTable(Seq("a", "b"), byField = false).df.collect()
    assert(transposed.length == 8)
    val meanRow = transposed.find(_.getString(0) == "mean").get
    assert(meanRow.getDouble(1) == 1.5 && meanRow.getDouble(2) == 1.5)
  }

  test("lifecycle: clone/clear/copy_template/insert/unique-index (immutable flavors)") {
    val src = GTable(Seq((1, "x"), (2, "y")).toDF("k", "v"), "src")
    assert(src.cloneTable("c2").name == "c2" && src.cloneTable().size == 2)
    assert(src.clear.size == 0 && src.clear.columns == Seq("k", "v"))
    assert(src.copyTemplate("t2").name == "t2" && src.copyTemplate().size == 0)
    val inserted = src.insert(Seq((3, "z")).toDF("k", "v"))
    assert(inserted.size == 3)
    // heterogeneous insert null-fills like the reference's dynamic rows
    val hetero = src.insert(Seq((4, true)).toDF("k", "extra"))
    assert(hetero.columns == Seq("k", "v", "extra") && hetero.size == 3)
    // unique-index constraint semantics
    assert(src.withUniqueIndex("k").size == 2)
    val dup = GTable(Seq((1, "x"), (1, "y")).toDF("k", "v"), "dup")
    intercept[IllegalStateException](dup.withUniqueIndex("k"))
    val withNull = GTable(Seq((Some(1), "x"), (None, "y")).toDF("k", "v"), "n")
    intercept[IllegalStateException](withNull.withUniqueIndex("k"))
    assert(withNull.withUniqueIndex("k", acceptNone = true).size == 2)
  }

  test("shuffle: seeded permutation is deterministic and bag-preserving") {
    val src = GTable((1 to 100).map(Tuple1(_)).toDF("i"), "s")
    val p1 = src.shuffle(7L).df.collect().map(_.getInt(0)).toSeq
    val p2 = src.shuffle(7L).df.collect().map(_.getInt(0)).toSeq
    val p3 = src.shuffle(8L).df.collect().map(_.getInt(0)).toSeq
    assert(p1 == p2, "same seed → same permutation")
    assert(p1 != p3, "different seed → different permutation")
    assert(p1.sorted == (1 to 100), "permutation preserves the bag")
  }

  test("info: import provenance + creation time (littletable.py:3797-3814)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_info").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(s"$dir/i.csv"), "a,b\n1,2\n")
    val imported = graft.sources.Sources.csvImport(spark, s"$dir/i.csv")
    val inf = imported.info
    assert(inf("source_type") == "path")
    assert(inf("source").toString.endsWith("i.csv"))
    assert(inf("last_import").asInstanceOf[Option[java.time.Instant]].isDefined)
    assert(inf("created") == inf("modified")) // immutable tables
    // provenance survives transformations
    assert(imported.where(col("a") === "1").info("source_type") == "path")
    // relabeling a shim-fetched source
    assert(imported.withMeta("url", "http://x/y.csv").info("source") == "http://x/y.csv")
  }

  test("profile: per-field counts/nulls/distinct/min-max in one pass") {
    val src = GTable(Seq(
      (Some(3), "b"), (Some(1), "a"), (None, "a"), (Some(10), "c"))
      .toDF("num", "s"), "p")
    val rows = src.profile().df.orderBy("field").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(rows(0) == ("num", 4L, 1L, 3L, "1", "10")) // native min/max, not lexicographic
    assert(rows(1) == ("s", 4L, 0L, 3L, "a", "c"))
    // single aggregate pass — no per-field unions rescanning the source
    val plan = src.profile().df.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"per-field rescans:\n$plan")
  }

  test("statsTable: non-numeric fields skipped like the reference") {
    val mixed = GTable(Seq((1.0, "x"), (3.0, "y")).toDF("num", "str"), "mixed")
    // string field silently skipped — reference stats() only accumulates numbers
    val rows = mixed.statsTable(Seq("num", "str")).df.collect()
    assert(rows.length == 1 && rows(0).getString(0) == "num" && rows(0).getDouble(1) == 2.0)
    intercept[IllegalArgumentException](mixed.statsTable(Seq("str")))
  }

  test("statsTable: magnitude-aware display rounding (littletable.py:3881-3890)") {
    val vals = GTable(Seq(1234.5678, 1234.5678, 1234.5678).map(Tuple1(_)).toDF("v"), "r")
    val exact = vals.statsTable(Seq("v")).df.head()
    assert(exact.getDouble(1) == 1234.5678)
    val rounded = vals.statsTable(Seq("v"), rounded = true).df.head()
    // |v| > 1, mag = 4 → max(4-4, 0) = 0 decimals, HALF_EVEN
    assert(rounded.getDouble(1) == 1235.0 && rounded.getDouble(2) == 1235.0)
    // |v| <= 1 stays exact
    val small = GTable(Seq(0.0012345, 0.0012345).map(Tuple1(_)).toDF("v"), "s")
    assert(small.statsTable(Seq("v"), rounded = true).df.head().getDouble(1) == 0.0012345)
  }
}
