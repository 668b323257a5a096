package graft

import org.apache.spark.sql.functions._
import graft.core.{Cmp, GTable, SortKey}

case class Abc(a: Int, b: Int, c: Int)

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

  test("typed ordering + rank matches the DataFrame path") {
    val typedTop = typedDs.orderBy(col("a").desc, col("b").asc, col("c").asc)
      .limit(2).collect().map(r => (r.a, r.b, r.c)).toSeq
    val dfTop = asTable.orderby("a desc, b, c").head(2).df
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(typedTop == dfTop && typedTop == Seq((3, 0, 0), (3, 0, 1)))
  }
}
