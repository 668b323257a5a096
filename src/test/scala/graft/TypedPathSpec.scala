package graft

import org.apache.spark.sql.functions._
import graft.core.{Cmp, GTable, SortKey}

case class Abc(a: Int, b: Int, c: Int)
case class CatRow(sku: String, color: String, size: String, material: String)
case class PriceRow(p_sku: String, unit_price: Int, p_size: Option[String])

/** The reference cross-multiplies every test class over ~13 row types
  * (unit_tests.py:220-246 make_test_classes). The Spark analog is two
  * storage paths — dynamic DataFrame and typed Dataset[T] — so the core
  * operator semantics are asserted through BOTH here, on the same
  * abc-grid fixture as GTableSpec. */
class TypedPathSpec extends SparkSpec {
  import spark.implicits._

  val n = 4
  lazy val typedDs = (for { a <- 0 until n; b <- 0 until n; c <- 0 until n }
    yield Abc(a, b, c)).toDS().cache()
  lazy val asTable = GTable(typedDs.toDF(), "abc_typed")

  test("typed filter == comparator DSL filter (same 64-row grid)") {
    val viaDsl = asTable.where("a" -> Cmp.within(1, 2)).size
    val viaTyped = typedDs.filter((r: Abc) => r.a >= 1 && r.a <= 2).count()
    assert(viaDsl == 32 && viaTyped == 32)
  }

  test("typed groupByKey agg == groupbyWithSummaries") {
    val typed = typedDs.groupByKey(_.a).mapGroups { (a, rows) =>
      val bs = rows.map(_.b).toSeq
      (a, bs.size.toLong, bs.sum.toLong)
    }.collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val dfSide = asTable
      .groupbyWithSummaries(Seq("a"), "n" -> count(lit(1)), "sum_b" -> sum(col("b")))
      .df.collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(typed == dfSide)
    assert(typed(0) == ((16L, 24L))) // 16 rows, sum b = 4*(0+1+2+3)
  }

  test("GTable round-trips through the typed view losslessly") {
    val back = asTable.typed[Abc].map(r => r.copy(a = r.a + 10)).toDF()
    val t2 = GTable(back, "shifted").orderby(SortKey.asc("a"),
      SortKey.asc("b"), SortKey.asc("c"))
    assert(t2.size == 64)
    assert(t2.head(1).df.head().getInt(0) == 10)
  }

  test("typed joinWith cardinalities match the outer-join golden (unit_tests.py:1681-1736)") {
    // The reference's catalog/prices fixture: inner-on-sku 4, inner-on-
    // sku+size 1 (a NULL size never equi-matches). Outer counts follow
    // SQL semantics (the documented correction of the reference's
    // inverted naming): left 4, right 4, full 7. Both the typed
    // Dataset.joinWith path and GTable.joinTyped must agree — this pins
    // Encoder behavior (Option[String] ↔ nullable column) on the join path.
    val cats = Seq(
      CatRow("001", "red", "XL", "cotton"),
      CatRow("002", "blue", "XL", "cotton/poly"),
      CatRow("003", "blue", "L", "linen"),
      CatRow("004", "red", "M", "cotton")).toDS()
    val ps = Seq(
      PriceRow("001", 10, Some("L")),
      PriceRow("001", 12, Some("XL")),
      PriceRow("002", 11, None),
      PriceRow("004", 9, None)).toDS()
    def cnt(tpe: String): Long = cats.joinWith(ps,
      cats("sku") === ps("p_sku") && cats("size") === ps("p_size"), tpe).count()
    assert(cats.joinWith(ps, cats("sku") === ps("p_sku"), "inner").count() == 4)
    assert(cnt("inner") == 1)
    assert(cnt("left") == 4)
    assert(cnt("right") == 4)
    assert(cnt("full") == 7)
    // typed path and GTable path agree join type by join type
    val gc = GTable(cats.toDF(), "catalog")
    val gp = GTable(ps.toDF(), "prices")
    for (tpe <- Seq("left", "right", "full"))
      assert(gc.joinTyped(gp, tpe, "sku" -> "p_sku", "size" -> "p_size").size == cnt(tpe),
        s"GTable/$tpe disagrees with Dataset.joinWith")
  }

  test("groupbyRuns on the typed grid matches the run-count golden (unit_tests.py:1950-1954)") {
    // itertools.groupby semantics: ordered by (b,a,c) the grid has n*n
    // runs of equal `a`, each n rows; ordered by (a,b,c) it has n runs
    // of n*n rows. Verified against a driver-side fold over the typed
    // collect (an engine-free oracle).
    val byB = GTable(typedDs.toDF(), "abc").orderby("b, a, c").groupbyRuns("a")
    val sizesB = byB.df.groupBy("__run").count().collect().map(_.getLong(1))
    assert(sizesB.length == n * n && sizesB.forall(_ == n))
    val byA = GTable(typedDs.toDF(), "abc").orderby("a, b, c").groupbyRuns("a")
    val sizesA = byA.df.groupBy("__run").count().collect().map(_.getLong(1))
    assert(sizesA.length == n && sizesA.forall(_ == n.toLong * n))
    // oracle: count key-change boundaries in the typed row order
    val ordered = typedDs.orderBy(col("b"), col("a"), col("c")).collect()
    val oracleRuns = 1 + ordered.sliding(2).count {
      case scala.Array(x, y) => x.a != y.a
      case _ => false
    }
    assert(oracleRuns == n * n)
  }

  test("typed ordering + rank matches the DataFrame path") {
    val typedTop = typedDs.orderBy(col("a").desc, col("b").asc, col("c").asc)
      .limit(2).collect().map(r => (r.a, r.b, r.c)).toSeq
    val dfTop = asTable.orderby("a desc, b, c").head(2).df
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(typedTop == dfTop && typedTop == Seq((3, 0, 0), (3, 0, 1)))
  }
}
