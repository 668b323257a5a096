package graft

import org.apache.spark.sql.functions._
import graft.core.{Cmp, GTable, SortKey}

case class Abc(a: Int, b: Int, c: Int)
case class CatRow(sku: String, color: String, size: String, material: String)
case class PriceRow(p_sku: String, unit_price: Int, p_size: Option[String])
case class SaleRow(region: String, status: String, prio: String, qty: Int)
case class Recipe(id: Int, title: String, ingredients: String)
case class VRow(v: Option[Int], s: String)

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

  test("pivot over a Dataset[T] source matches the PivotSpec lattice golden") {
    // same fixture as PivotSpec, but born as a typed Dataset and passed
    // through a typed map (encoder round-trip) before pivoting — pins
    // that the pivot key lattice is unchanged by the Dataset[T] path
    val sales = Seq(
      SaleRow("east", "A", "hi", 1), SaleRow("east", "A", "lo", 2),
      SaleRow("east", "B", "hi", 3), SaleRow("west", "A", "hi", 4),
      SaleRow("west", "B", "lo", 5), SaleRow("west", "B", "hi", 6),
      SaleRow("west", "A", "hi", 7)).toDS()
      .map(r => r.copy(qty = r.qty)) // typed identity: forces the encoder path
    val got = GTable(sales.toDF(), "t").pivot("region status prio").summary().df
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("east", "A", "hi", 1L), ("east", "A", "lo", 1L),
      ("east", "B", "hi", 1L), ("east", "B", "lo", 0L),
      ("west", "A", "hi", 2L), ("west", "A", "lo", 0L),
      ("west", "B", "hi", 1L), ("west", "B", "lo", 1L)))
  }

  test("scored search over a Dataset[T] corpus matches the SearchSpec goldens") {
    import graft.operators.Search
    // the reference recipes fixture as typed rows (unit_tests.py:3330-3420)
    val recipes = Seq(
      Recipe(1, "Tuna casserole", "tuna, noodles, Cream of Mushroom Soup"),
      Recipe(2, "Hawaiian pizza", "pizza dough pineapple ham tomato sauce"),
      Recipe(3, "Margherita pizza", "pizza dough cheese pesto artichoke hearts"),
      Recipe(4, "Pepperoni pizza", "pizza dough cheese tomato sauce pepperoni"),
      Recipe(5, "Grilled cheese sandwich", "bread cheese butter"),
      Recipe(6, "Tuna melt", "tuna mayonnaise tomato bread cheese"),
      Recipe(7, "Chili dog", "hot dog chili onion bun"),
      Recipe(8, "French toast", "egg milk vanilla bread maple syrup"),
      Recipe(9, "BLT", "bread bacon lettuce tomato mayonnaise"),
      Recipe(10, "Reuben sandwich", "rye bread sauerkraut corned beef swiss cheese russian dressing thousand island"),
      Recipe(11, "Hamburger", "ground beef bun lettuce ketchup mustard pickle"),
      Recipe(12, "Cheeseburger", "ground beef bun lettuce ketchup mustard pickle cheese"),
      Recipe(13, "Bacon cheeseburger", "ground beef bun lettuce ketchup mustard pickle cheese bacon")
    ).toDS().filter((r: Recipe) => r.id > 0) // typed predicate: forces the encoder path
    val df = recipes.toDF()
    val index = Search.buildIndex(df, "id", "ingredients")
    def ids(q: String): Seq[Int] =
      Search.search(df, index, "id", "ingredients", q, minScore = -10000)
        .select(col("id")).collect().map(_.getInt(0)).toSeq
    assert(ids("tuna +cheese") == Seq(6, 3, 4, 5, 10, 12, 13, 1))
    assert(ids("bread ++bacon") == Seq(9, 13))
    assert(ids("pizza dough --pineapple") == Seq(3, 4))
  }

  test("splitby on a Dataset[T] source: null routing matches, sides round-trip typed") {
    val rows = Seq(VRow(Some(1), "x"), VRow(None, "y"), VRow(Some(5), "z")).toDS()
    val (no, yes) = GTable(rows.toDF(), "t").splitby(col("v") > 2)
    assert(yes.size == 1 && no.size == 2, "NULL predicate routes to the false side")
    // both sides re-enter the typed world losslessly (Option ↔ nullable)
    assert(yes.typed[VRow].collect().toSeq == Seq(VRow(Some(5), "z")))
    assert(no.typed[VRow].collect().map(_.s).sorted.toSeq == Seq("x", "y"))
  }

  test("typed ordering + rank matches the DataFrame path") {
    val typedTop = typedDs.orderBy(col("a").desc, col("b").asc, col("c").asc)
      .limit(2).collect().map(r => (r.a, r.b, r.c)).toSeq
    val dfTop = asTable.orderby("a desc, b, c").head(2).df
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(typedTop == dfTop && typedTop == Seq((3, 0, 0), (3, 0, 1)))
  }

  test("row-shape matrix: case class / tuple / nested+Option encoders " +
      "agree operator-for-operator (the reference's 13-class grid, " +
      "unit_tests.py:220-371, collapsed to Spark's encoder shapes)") {
    // the reference cross-multiplies tests over slots/dataclass/
    // namedtuple/pydantic row classes; Spark's analog axis is the
    // Encoder: flat product, tuple product, and nested product with
    // Option fields. Same 64-row grid through all three, same answers.
    val grid = for { a <- 0 until n; b <- 0 until n; c <- 0 until n }
      yield (a, b, c)
    val tupleDs = grid.toDS() // tuple encoder: columns _1/_2/_3
    val nestedDs = grid.map { case (a, b, c) =>
      NestedAbc(Inner(a, Some(b)), if (c % 2 == 0) Some(c) else None, c)
    }.toDS() // nested struct + Option encoder
    // (1) filter parity on a ∈ [1,2]
    val viaCase = asTable.where("a" -> Cmp.within(1, 2)).size
    val viaTuple = GTable(tupleDs.toDF("a", "b", "c"), "tup")
      .where("a" -> Cmp.within(1, 2)).size
    val viaNested = GTable(nestedDs.toDF(), "nest")
      .where(col("inner.a").between(1, 2)).size
    assert(viaCase == 32 && viaTuple == 32L && viaNested == 32L)
    // (2) aggregate parity: group by a, count + sum(b) — nested path
    //     reads b through the struct + Option (None never occurs for b)
    def agg(t: GTable, aCol: String, bCol: String) = t
      .groupbyWithSummaries(Seq(aCol),
        "n" -> count(lit(1)), "sum_b" -> sum(col(bCol)))
      .df.select(col(aCol).cast("int"), col("n"), col("sum_b"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val viaT = agg(GTable(tupleDs.toDF("a", "b", "c"), "tup"), "a", "b")
    val viaN = nestedDs.toDF()
      .select(col("inner.a").as("a"), col("inner.b").as("b"))
      .groupBy(col("a")).agg(count(lit(1)).as("n"), sum(col("b")).as("sum_b"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(viaT == viaN && viaT(0) == ((16L, 24L)))
    // (3) Option round-trip: half the grid's copt is None; the encoder
    //     must surface exactly those as nulls and restore them typed
    val nulls = nestedDs.toDF().filter(col("copt").isNull).count()
    assert(nulls == 32, "odd c values must encode as NULL")
    val back = nestedDs.toDF().as[NestedAbc].collect()
    assert(back.count(_.copt.isEmpty) == 32 &&
      back.forall(r => r.copt.forall(_ == r.craw)))
  }
}

case class Inner(a: Int, b: Option[Int])
case class NestedAbc(inner: Inner, copt: Option[Int], craw: Int)
