package graft

import org.apache.spark.sql.functions._
import graft.core.GTable

/** Join-semantics goldens (reference unit_tests.py:1626-1795, FIXTURES.md
  * A.2/A.3). We assert SQL semantics; the reference's inverted
  * LEFT/RIGHT naming and the FULL-join per-column key-product anomaly
  * (12 rows, littletable.py:2647-2658) are documented deviations — the
  * sane SQL FULL answer here is 7. */
class JoinSpec extends SparkSpec {
  import spark.implicits._

  lazy val catalog = GTable(Seq(
    ("001", "red", "XL", "cotton"),
    ("002", "blue", "XL", "cotton/poly"),
    ("003", "blue", "L", "linen"),
    ("004", "red", "M", "cotton"))
    .toDF("sku", "color", "size", "material"), "catalog")

  lazy val prices = GTable(Seq(
    ("001", 10, Some("L")),
    ("001", 12, Some("XL")),
    ("002", 11, None),
    ("004", 9, None))
    .toDF("p_sku", "unit_price", "p_size"), "prices")

  test("inner join on sku → 4 rows (unit_tests.py:1706)") {
    assert(catalog.join(prices, "sku" -> "p_sku").size == 4)
  }

  test("inner join on sku+size → 1 row (unit_tests.py:1713)") {
    assert(catalog.join(prices, "sku" -> "p_sku", "size" -> "p_size").size == 1)
  }

  test("SQL outer joins on sku+size: left=4, right=4, full=7") {
    assert(catalog.joinTyped(prices, "left", "sku" -> "p_sku", "size" -> "p_size").size == 4)
    assert(catalog.joinTyped(prices, "right", "sku" -> "p_sku", "size" -> "p_size").size == 4)
    assert(catalog.joinTyped(prices, "full", "sku" -> "p_sku", "size" -> "p_size").size == 7)
  }

  test("outerJoinCompat: reference naming maps to SQL-correct semantics") {
    // reference RIGHT_OUTER preserves SELF (littletable.py:2631-2646)
    // → must equal SQL LEFT; its LEFT_OUTER preserves OTHER → SQL RIGHT
    def rows(t: GTable) = t.df.orderBy(t.columns.map(col): _*).collect().toSeq
    assert(rows(catalog.outerJoinCompat("right_outer_join", prices,
        "sku" -> "p_sku", "size" -> "p_size")) ==
      rows(catalog.joinTyped(prices, "left", "sku" -> "p_sku", "size" -> "p_size")))
    assert(rows(catalog.outerJoinCompat("left_outer", prices,
        "sku" -> "p_sku", "size" -> "p_size")) ==
      rows(catalog.joinTyped(prices, "right", "sku" -> "p_sku", "size" -> "p_size")))
    assert(catalog.outerJoinCompat("full_outer", prices,
      "sku" -> "p_sku", "size" -> "p_size").size == 7)
    intercept[IllegalArgumentException](
      catalog.outerJoinCompat("sideways", prices, "sku" -> "p_sku"))
  }

  lazy val students = GTable(Seq(
    ("0001", "Alice"), ("0002", "Bob"), ("0003", "Charlie"),
    ("0004", "Dave"), ("0005", "Enid")).toDF("student_id", "name"), "students")
  lazy val registrations = GTable(Seq(
    ("0001", "PSYCH101"), ("0001", "CALC1"), ("0003", "BIO200"),
    ("0005", "CHEM101"), ("0006", "PHY101")).toDF("r_student_id", "course"), "registrations")
  lazy val courses = GTable(Seq("BIO200", "CALC1", "CHEM101", "PSYCH101", "PE101")
    .toDF("c_course"), "courses")

  test("students with no registration → Bob, Dave (unit_tests.py:1760)") {
    val got = students.joinTyped(registrations, "left_anti", "student_id" -> "r_student_id")
      .df.select("name").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("Bob", "Dave"))
  }

  test("courses with no students → PE101 (unit_tests.py:1770)") {
    val got = courses.joinTyped(registrations, "left_anti", "c_course" -> "course")
      .df.select("c_course").collect().map(_.getString(0)).toSeq
    assert(got == Seq("PE101"))
  }

  test("full-outer unmatched ids → 0002, 0004, 0006 (unit_tests.py:1781)") {
    val got = students.joinTyped(registrations, "full", "student_id" -> "r_student_id")
      .where(col("course").isNull || col("name").isNull)
      .df.select(coalesce(col("student_id"), col("r_student_id")))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("0002", "0004", "0006"))
  }

  test("join_on + chain sugar (unit_tests.py:1639)") {
    val t1 = GTable((1 to 3).map(i => (i, i * 10)).toDF("a", "b"), "t1")
    val t2 = GTable(Seq((1, 100)).toDF("a", "d"), "t2")
    assert((t1.joinOn("a") + t2.joinOn("a")).apply().size == 1)
  }

  test("as-of join: latest right <= left time, inclusive ties, null if none") {
    val trades = GTable(Seq(
      (1, 10L, "t10"), (1, 25L, "t25"), (1, 5L, "t5"), (2, 50L, "t50"))
      .toDF("k", "t", "trade"), "trades")
    val quotes = GTable(Seq(
      (1, 10L, 1.0), (1, 20L, 2.0), (1, 30L, 3.0), (2, 60L, 9.9))
      .toDF("k", "qt", "px"), "quotes")
    val out = trades.joinAsOf(quotes, "k", "k", "t", "qt").df
      .select("k", "t", "trade", "asof_qt", "asof_px")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1, 5L, "t5", None, None),                  // before any quote
      (1, 10L, "t10", Some(10L), Some(1.0)),      // tie matches (inclusive)
      (1, 25L, "t25", Some(20L), Some(2.0)),      // latest prior quote
      (2, 50L, "t50", None, None)))               // key-isolated, quote is later
  }

  test("same-name key survives right/full outer joins (coalesced, not nulled)") {
    val l = GTable(Seq((1, "l1"), (2, "l2")).toDF("id", "lv"), "l")
    val r = GTable(Seq((2, "r2"), (3, "r3")).toDF("id", "rv"), "r")
    val full = l.joinTyped(r, "full", "id" -> "id").df
      .select("id", "lv", "rv").collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2))).sortBy(_._1).toSeq
    assert(full == Seq((1, "l1", null), (2, "l2", "r2"), (3, null, "r3")),
      "right-only row must keep its key via coalesce")
    val right = l.joinTyped(r, "right", "id" -> "id").df
      .select("id").collect().map(_.getInt(0)).sorted.toSeq
    assert(right == Seq(2, 3))
  }

  test("joinOn chain is associative (right-grouped chain keeps every table)") {
    val t1 = GTable(Seq((1, 10)).toDF("a", "x"), "t1")
    val t2 = GTable(Seq((1, 20)).toDF("a", "y"), "t2")
    val t3 = GTable(Seq((1, 30)).toDF("a", "z"), "t3")
    val leftAssoc = ((t1.joinOn("a") + t2.joinOn("a")) + t3.joinOn("a")).apply()
    val rightAssoc = (t1.joinOn("a") + (t2.joinOn("a") + t3.joinOn("a"))).apply()
    assert(leftAssoc.columns.toSet == Set("a", "x", "y", "z"))
    assert(rightAssoc.columns.toSet == Set("a", "x", "y", "z"),
      "right-grouped chain must not drop the middle table")
    assert(rightAssoc.size == 1 && leftAssoc.size == 1)
  }

  test("range join: inclusive bounds, band boundaries, no duplicate pairs") {
    def ts(us: Long) = new java.sql.Timestamp(us / 1000) // whole-ms micros
    val l = GTable(Seq((1, ts(10000000L), "L10")).toDF("k", "t", "tag"), "l")
    val r = GTable(Seq(
      (1, ts(7000000L), "r7"),    // == t - lookback (inclusive)
      (1, ts(13000000L), "r13"),  // == t + lookahead (inclusive)
      (1, ts(6999000L), "r6.999"), // just outside
      (1, ts(13001000L), "r13.001"), // just outside
      (2, ts(10000000L), "rk2"))  // other key
      .toDF("k", "t", "tag"), "r")
    val out = l.joinRange(r, "k", "k", "t", "t", 3000000L, 3000000L).df
      .select("r_tag").collect().map(_.getString(0)).sorted.toSeq
    assert(out == Seq("r13", "r7"))
    // no duplicates even when windows span multiple bands
    val wide = l.joinRange(r, "k", "k", "t", "t", 10000000L, 10000000L).df
      .select("r_tag").collect().map(_.getString(0)).sorted.toSeq
    assert(wide == Seq("r13", "r13.001", "r6.999", "r7"))
  }
}
