package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.TextHashUtil

/** Property-based invariants (SURVEY.md §5: ScalaCheck alongside the
  * golden-value suites). Pure-JVM properties run at full case counts;
  * Spark-backed ones (run-id stitching, comparators) use few cases of
  * meaningful size. */
object TextHashProperties extends Properties("TextHash") {

  private val word: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val wordsGen: Gen[List[String]] = Gen.choose(0, 60)
    .flatMap(n => Gen.listOfN(n, word))

  private def arr(ws: List[String]) =
    new GenericArrayData(ws.map(w => UTF8String.fromString(w)).toArray[Any])

  /** Naive reference: distinct string shingles, first-occurrence order. */
  private def naiveShingles(ws: List[String], n: Int): List[List[String]] =
    if (ws.length < n) Nil else ws.sliding(n).toList.distinct

  property("shingleHashSet size == distinct string shingles") =
    Prop.forAll(wordsGen, Gen.choose(1, 4)) { (ws, n) =>
      TextHashUtil.shingleHashSet(arr(ws), n).numElements() ==
        naiveShingles(ws, n).length
    }

  property("shingleHashSet is order-deterministic and input-pure") =
    Prop.forAll(wordsGen, Gen.choose(1, 4)) { (ws, n) =>
      val a = TextHashUtil.shingleHashSet(arr(ws), n).toLongArray().toSeq
      val b = TextHashUtil.shingleHashSet(arr(ws), n).toLongArray().toSeq
      a == b
    }

  property("equal word multisets give equal simhash (order-invariant)") =
    Prop.forAll(wordsGen) { ws =>
      val shuffled = scala.util.Random.shuffle(ws)
      TextHashUtil.simhash64(arr(ws)) == TextHashUtil.simhash64(arr(shuffled))
    }

  property("single-word docs: simhash == that word's bit-majority hash") =
    Prop.forAll(word) { w =>
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(UTF8String.fromString(w), TextHashUtil.Seed)
      TextHashUtil.simhash64(arr(List(w))) == h
    }

  property("Excel column refs round-trip (A..ZZZ)") =
    Prop.forAll(Gen.choose(0, 18277)) { i => // A..ZZZ
      val ref = graft.sources.ExcelRefs.colRef(i)
      graft.sources.ExcelRefs.colIndex(ref + "1") == i
    }

  property("minhashSig: superset never raises any permutation min") =
    Prop.forAll(wordsGen.suchThat(_.nonEmpty), wordsGen) { (base, extra) =>
      val ab = Array.tabulate(16)(i => (2L * i + 1, 3L * i + 7)).flatMap(t => Array(t._1, t._2))
      val hs1 = TextHashUtil.shingleHashSet(arr(base), 1)
      val hs2 = TextHashUtil.shingleHashSet(arr(base ++ extra), 1)
      val s1 = TextHashUtil.minhashSig(hs1, ab).toLongArray()
      val s2 = TextHashUtil.minhashSig(hs2, ab).toLongArray()
      s1.zip(s2).forall { case (a, b) => b <= a }
    }
}

/** Morton/z-order kernel invariants — the properties parquet skipping
  * rests on: per-axis monotonicity (a range predicate on ONE dimension
  * maps to bounded z-ranges) and the bit-frame bound. */
object MortonProperties extends Properties("Morton") {

  private def z(vals: Seq[Int], bits: Int): Long =
    graft.functions.BitUtil.interleave(
      new GenericArrayData(vals.toArray), bits)

  private val frame: Gen[(Int, Int)] = for {
    d <- Gen.choose(1, 4)
    bits <- Gen.choose(2, math.min(15, 63 / d))
  } yield (d, bits)

  private def coords(d: Int, bits: Int): Gen[List[Int]] =
    Gen.listOfN(d, Gen.choose(0, (1 << bits) - 1))

  property("strictly monotone in each axis with the others fixed") =
    Prop.forAll(frame) { case (d, bits) =>
      Prop.forAll(coords(d, bits), Gen.choose(0, d - 1)) { (cs, axis) =>
        val hi = (1 << bits) - 1
        // saturated axis: nothing to bump (vacuously true)
        cs(axis) == hi || {
          val bumped = cs.updated(axis, cs(axis) + 1)
          z(bumped, bits) > z(cs, bits)
        }
      }
    }

  property("bounded by the d*bits bit frame") =
    Prop.forAll(frame) { case (d, bits) =>
      Prop.forAll(coords(d, bits)) { cs =>
        val v = z(cs, bits)
        v >= 0L && v < (1L << (d * bits))
      }
    }

  property("zero is the origin and the all-ones frame is the maximum") =
    Prop.forAll(frame) { case (d, bits) =>
      val hi = (1 << bits) - 1
      z(List.fill(d)(0), bits) == 0L &&
        z(List.fill(d)(hi), bits) == (1L << (d * bits)) - 1
    }
}

/** Spark-backed properties: few cases, real plans. */
class RunIdPropertySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.core.{GTable, SortKey}

  /** Sequential oracle for run ids over an ordered key sequence. */
  private def naiveRuns(keys: Seq[String]): Seq[Long] = {
    var run = 0L; var last: Option[String] = None
    keys.map { k =>
      if (!last.contains(k)) { run += 1; last = Some(k) }
      run
    }
  }

  test("withRunId matches a sequential scan for random key sequences " +
      "across many partitions (boundary stitch property)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val n = 50 + rnd.nextInt(400)
      val alphabet = 1 + rnd.nextInt(4)
      val keys = Seq.fill(n)(('a' + rnd.nextInt(alphabet)).toChar.toString)
      val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("i", "k").repartition(7) // scatter, then let withRunId re-sort
      val got = GTable(df, s"t$trial").orderby(SortKey.asc("i"))
        .groupbyRuns("k").df
        .orderBy("i").select("__run").collect().map(_.getLong(0)).toSeq
      assert(got == naiveRuns(keys), s"trial $trial (n=$n, alphabet=$alphabet)")
    }
  }

  test("withOrdinal: consecutive 1..n matching the Scala sort, any partitioning") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val n = 20 + rnd.nextInt(300)
      val data = Seq.fill(n)((rnd.nextInt(50), rnd.nextLong()))
        .zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
      val df = data.toDF("id", "k", "v").repartition(1 + rnd.nextInt(9))
      val got = graft.core.Ordinals
        .withOrdinal(df, Seq(SortKey(col("k")), SortKey(col("id"))), "__ord")
        .select("id", "__ord").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val want = data.sortBy(t => (t._2, t._1)).zipWithIndex
        .map { case (t, i) => t._1 -> (i + 1L) }.toMap
      assert(got == want, s"trial $trial n=$n")
    }
  }

  test("keyedRunningTotal matches the sequential prefix sum: numeric and " +
      "shared-prefix string keys, any partitioning, any bucket count") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val n = 30 + rnd.nextInt(300)
      // long-keyed rows with values incl. nulls (null counts as 0)
      val data = rnd.shuffle((0 until n).toList).map { i =>
        (i.toLong, if (rnd.nextInt(10) == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(1000).toLong))
      }
      val df = data.toDF("id", "v").repartition(1 + rnd.nextInt(8))
      for (buckets <- Seq(1, 3, 64)) {
        val got = graft.core.Ordinals
          .keyedRunningTotal(df, "id", "v", "cum", buckets)
          .select("id", "cum").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
        val sorted = data.sortBy(_._1)
        var acc = 0L
        val want = sorted.map { case (id, v) =>
          val r = id -> acc; acc += (if (v == null) 0L else v.longValue); r
        }.toMap
        assert(got == want, s"trial $trial buckets=$buckets n=$n")
      }
      // string keys sharing a LONG common prefix (defeats a naive
      // first-bytes proxy; exercises the prefix-stripping path)
      val sdata = rnd.shuffle((0 until n).toList)
        .map(i => (f"corpus/shard/document_$i%06d", (i % 17).toLong))
      val sdf = sdata.toDF("key", "v").repartition(1 + rnd.nextInt(8))
      val got = graft.core.Ordinals
        .keyedRunningTotal(sdf, "key", "v", "cum", 16)
        .select("key", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      var acc = 0L
      val want = sdata.sortBy(_._1).map { case (k, v) =>
        val r = k -> acc; acc += v; r
      }.toMap
      assert(got == want, s"string trial $trial n=$n")
    }
    // date keys (proxy = unix_date): one deterministic trial suffices —
    // the bucketing math is shared with the numeric path
    val days = new scala.util.Random(3).shuffle((0 until 200).toList)
    val ddata = days.map(i => (java.sql.Date.valueOf(
      java.time.LocalDate.of(2020, 1, 1).plusDays(i).toString), (i % 13).toLong))
    val ddf = ddata.toDF("d", "v").repartition(5)
    val got = graft.core.Ordinals.keyedRunningTotal(ddf, "d", "v", "cum", 16)
      .select("d", "cum").collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    var acc2 = 0L
    val want = ddata.sortBy(_._1.toString).map { case (d, v) =>
      val r = d.toString -> acc2; acc2 += v; r
    }.toMap
    assert(got == want, "date-keyed running total")
  }

  test("runningTotal with a DESC leading key + tie-break matches the " +
      "sequential prefix sum; selectByBudget admits exactly the ordered " +
      "prefix that starts inside the budget") {
    import graft.core.SortKey
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 40 + rnd.nextInt(200)
      // non-unique scores force the doc_id tie-break; desc leading key
      // exercises the reversed bucket visit order
      val data = rnd.shuffle((0 until n).toList)
        .map(i => (i.toLong, (rnd.nextInt(12) + 1).toLong))
      val df = data.toDF("id", "tok").repartition(1 + rnd.nextInt(6))
      val keys = Seq(SortKey(col("tok"), asc = false), SortKey(col("id")))
      for (buckets <- Seq(1, 4, 32)) {
        val got = graft.core.Ordinals.runningTotal(df, keys, "tok", "cum", buckets)
          .select("id", "cum").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
        var acc = 0L
        val want = data.sortBy { case (id, tok) => (-tok, id) }.map { case (id, tok) =>
          val r = id -> acc; acc += tok; r
        }.toMap
        assert(got == want, s"trial $trial buckets=$buckets n=$n")
      }
      val budget = 1L + rnd.nextInt(data.map(_._2).sum.toInt)
      val kept = graft.operators.Curate
        .selectByBudget(df, keys, "tok", budget)
        .select("id").collect().map(_.getLong(0)).toSet
      var acc = 0L
      val wantKept = data.sortBy { case (id, tok) => (-tok, id) }
        .filter { case (_, tok) => val in = acc < budget; acc += tok; in }
        .map(_._1).toSet
      assert(kept == wantKept, s"trial $trial budget=$budget")
    }
  }

  test("runningTotal: an all-null leading key falls back to the " +
      "tie-break order instead of silent zeros; scratch-name collision " +
      "fails fast") {
    import graft.core.SortKey
    val d = Seq((3L, null.asInstanceOf[java.lang.Long], 10L),
      (1L, null.asInstanceOf[java.lang.Long], 20L),
      (2L, null.asInstanceOf[java.lang.Long], 30L))
      .toDF("id", "score", "tok").repartition(3)
    val got = graft.core.Ordinals.runningTotal(d,
        Seq(SortKey(col("score"), asc = false), SortKey(col("id"))),
        "tok", "cum")
      .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // order under an all-null score is the id tie-break: 1, 2, 3
    assert(got == Map(1L -> 0L, 2L -> 20L, 3L -> 50L), s"got $got")
    val clash = Seq((1L, 2L)).toDF("id", "__bkt")
    val e = intercept[IllegalArgumentException] {
      graft.core.Ordinals.runningTotal(clash, Seq(SortKey(col("id"))), "id")
    }
    assert(e.getMessage.contains("__bkt"))
  }

  test("slicePy matches Python slice semantics on random slices") {
    // Scala oracle: Python's slice.indices() algorithm applied to a Range
    def pySlice(n: Int, start: Option[Long], stop: Option[Long], step: Long): Seq[Int] = {
      val s = step.toInt
      def clamp(i: Long, lo: Long, hi: Long) = math.max(lo, math.min(hi, i)).toInt
      val (defStart, defStop) = if (s > 0) (0L, n.toLong) else (n - 1L, -n - 1L)
      def norm(i: Long, default: Long) = {
        val v = if (i < 0) i + n else i
        if (s > 0) clamp(v, 0, n) else clamp(v, -1, n - 1)
      }
      val st = start.map(norm(_, defStart)).getOrElse(defStart.toInt)
      val en = stop.map(norm(_, defStop)).getOrElse(if (s > 0) n else -1)
      (st.until(en.toInt, s)).filter(i => i >= 0 && i < n)
    }
    val n = 37
    val base = GTable((0 until n).map(Tuple1(_)).toDF("i"), "s")
      .orderby(SortKey.asc("i"))
    val rnd = new scala.util.Random(5)
    for (trial <- 1 to 25) {
      val start = if (rnd.nextBoolean()) Some(rnd.nextLong(2L * n + 10) - n - 5) else None
      val stop = if (rnd.nextBoolean()) Some(rnd.nextLong(2L * n + 10) - n - 5) else None
      val step = { val v = rnd.nextLong(7) - 3; if (v == 0) 1L else v }
      val sliced = base.slicePy(start, stop, step)
      val got = sliced.df.orderBy(sliced.sortKeys.map(_.order): _*)
        .collect().map(_.getInt(0)).toSeq
      val want = pySlice(n, start, stop, step)
      assert(got == want, s"trial $trial [$start:$stop:$step] got=$got want=$want")
    }
  }

  test("pivot summary lattice matches the reference semantics on random data") {
    // naive oracle of the reference's key-lattice (_PivotTable subtable
    // construction): level-1/2 keys global, level-3 keys within the
    // level-1 branch, zero-filled cells
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      val n = 20 + rnd.nextInt(150)
      val ka = 1 + rnd.nextInt(4); val kb = 1 + rnd.nextInt(4); val kc = 1 + rnd.nextInt(4)
      val rows = Seq.fill(n)((s"a${rnd.nextInt(ka)}", s"b${rnd.nextInt(kb)}", s"c${rnd.nextInt(kc)}"))
      val observed = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val k1 = rows.map(_._1).distinct.sorted
      val k2 = rows.map(_._2).distinct.sorted
      val k3 = rows.groupBy(_._1).view.mapValues(_.map(_._3).distinct.sorted).toMap
      val want3 = for (a <- k1; b <- k2; c <- k3(a))
        yield (a, b, c, observed.getOrElse((a, b, c), 0L))
      val df = rows.toDF("a", "b", "c")
      val got3 = GTable(df, "p").pivot("a", "b", "c").summary().df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(got3 == want3, s"trial $trial 3-attr (n=$n)")
      val want2 = for (a <- k1; b <- k2)
        yield (a, b, rows.count(r => r._1 == a && r._2 == b).toLong)
      val got2 = GTable(df, "p").pivot("a", "b").summary().df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      assert(got2 == want2, s"trial $trial 2-attr")
      // tree rollup consistency: root count == n, child sums == parent
      val tree = GTable(df, "p").pivot("a", "b", "c").tree
      assert(tree.count == n)
      assert(tree.children.map(_.count).sum == n)
      tree.children.foreach(ch => assert(ch.children.map(_.count).sum == ch.count))
    }
  }

  test("comparator DSL matches Scala semantics on random data incl. nulls") {
    val rnd = new scala.util.Random(7)
    val vs: Seq[Integer] = Seq.fill(300)(
      if (rnd.nextInt(10) == 0) null else Integer.valueOf(rnd.nextInt(20) - 10))
    val df = vs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
    import graft.core.Cmp
    val cases: Seq[(String, Integer => Boolean)] = Seq(
      "between" -> (v => v != null && v > -3 && v < 4),
      "within" -> (v => v != null && v >= -3 && v <= 4),
      "inRange" -> (v => v != null && v >= -3 && v < 4))
    val preds = Map(
      "between" -> Cmp.between(-3, 4), "within" -> Cmp.within(-3, 4),
      "inRange" -> Cmp.inRange(-3, 4))
    for ((name, oracle) <- cases) {
      val got = df.filter(preds(name)(col("v"))).select("i")
        .collect().map(_.getInt(0)).toSet
      val want = vs.zipWithIndex.collect { case (v, i) if oracle(v) => i }.toSet
      assert(got == want, name)
    }
  }
}
