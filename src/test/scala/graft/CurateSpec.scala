package graft

import org.apache.spark.sql.functions._
import graft.core.GTable
import graft.operators.Curate
import graft.operators.Curate.Stage

/** Curation funnel: one-pass survivor report + pushed-down filter. */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  private val t = GTable(Seq(
    ("a", "en", 300), ("b", "en", 100), ("c", "de", 300),
    ("d", "en", 250), ("e", "fr", 50)).toDF("id", "lang", "len"), "docs")

  private val stages = Seq(
    Stage("lang_en", col("lang") === "en"),
    Stage("min_len", col("len") >= 200))

  test("report: cumulative conjunctive survivor counts, input first") {
    val rows = Curate.report(t, stages).orderBy("stage").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((0, "input", 5L), (1, "lang_en", 3L), (2, "min_len", 2L)))
  }

  test("filtered == last funnel stage; funnel is monotone non-increasing") {
    val kept = Curate.filtered(t, stages).df.select("id")
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("a", "d"))
    val counts = Curate.report(t, stages).orderBy("stage")
      .collect().map(_.getLong(2)).toSeq
    assert(counts == counts.sorted.reverse, s"not monotone: $counts")
    assert(counts.last == kept.size)
  }

  test("report is a single aggregate pass (no per-stage scans)") {
    val plan = Curate.report(t, stages).queryExecution.executedPlan.toString
    // one aggregation over one scan: no union of N subqueries
    assert(!plan.contains("Union"), s"per-stage unions would rescan:\n$plan")
  }

  test("filteredObserved: survivors match filtered(), per-stage counts " +
      "arrive as a side effect of the one materializing action") {
    val (survivors, obs) = Curate.filteredObserved(t, stages, "funnel_spec")
    // ONE action materializes both the survivors and the telemetry
    val ids = survivors.df.select("id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("a", "d"))
    val m = obs.get
    assert(m("n_0") == 5L && m("n_1") == 3L && m("n_2") == 2L, s"got $m")
    // same numbers report() computes with its own aggregate scan
    val rep = Curate.report(t, stages).orderBy("stage")
      .collect().map(_.getLong(2)).toSeq
    assert(rep == Seq(5L, 3L, 2L))
  }

  test("capPerGroup: keeps at most k per group by the given total order") {
    val capped = Curate.capPerGroup(t, Seq("lang"),
        Seq(col("len").desc, col("id")), k = 2)
      .df.select("id").collect().map(_.getString(0)).toSet
    // en: a(300), d(250) beat b(100); de: c alone; fr: e alone
    assert(capped == Set("a", "d", "c", "e"))
  }

  test("capPerGroup: deterministic under ties (tie-break column decides)") {
    val tied = GTable(Seq(("x", "en", 5), ("y", "en", 5), ("z", "en", 5))
      .toDF("id", "lang", "len"), "tied")
    val kept = Curate.capPerGroup(tied, Seq("lang"),
        Seq(col("len").desc, col("id")), k = 2)
      .df.select("id").collect().map(_.getString(0)).toSet
    assert(kept == Set("x", "y"))
  }

  test("quantileBand: exact percentile band keeps the middle, drops tails") {
    val vals = GTable((1 to 100).map(i => ("r" + i, i))
      .toDF("id", "v"), "vals")
    val kept = Curate.quantileBand(vals, col("v"), 0.10, 0.90)
      .df.select("v").collect().map(_.getInt(0)).sorted
    // p10 of 1..100 (type-7) = 10.9, p90 = 90.1 → keep 11..90
    assert(kept.head == 11 && kept.last == 90 && kept.length == 80)
  }

  test("quantileBand: approx path matches exact to within one boundary rank") {
    // approx_percentile returns a MEMBER of the column (25 for p25 of
    // 1..100) where exact interpolates (25.75) — so the approx band may
    // include one extra element at each edge, never more at this accuracy
    val vals = GTable((1 to 100).map(i => ("r" + i, i))
      .toDF("id", "v"), "vals")
    val exact = Curate.quantileBand(vals, col("v"), 0.25, 0.75)
      .df.select("v").collect().map(_.getInt(0)).toSet
    val approx = Curate.quantileBand(vals, col("v"), 0.25, 0.75,
        exact = false, accuracy = 10000)
      .df.select("v").collect().map(_.getInt(0)).toSet
    assert(math.abs(approx.min - exact.min) <= 1 &&
      math.abs(approx.max - exact.max) <= 1 &&
      approx.size == approx.max - approx.min + 1, // still one contiguous band
      s"approx=$approx exact=$exact")
  }

  test("dsirScores: integer micro-nat scores match the formula exactly; " +
      "target-looking docs outrank off-target docs; layout-invariant") {
    val raw = Seq(
      (1L, "apple pie apple tart"),      // target-flavored vocabulary
      (2L, "gcc linker segfault core"),  // off-target vocabulary
      (3L, "apple core")                 // mixed
    ).toDF("doc_id", "text")
    val target = Seq(
      (10L, "apple pie recipe"),
      (11L, "apple tart recipe")).toDF("doc_id", "text")
    val out = Curate.dsirScores(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // driver-side mirror of the exact quantized formula
    def bkt(w: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.substring(0, 2)
    }
    val rawWords = Seq("apple", "pie", "apple", "tart", "gcc", "linker",
      "segfault", "core", "apple", "core")
    val tgtWords = Seq("apple", "pie", "recipe", "apple", "tart", "recipe")
    val cr = rawWords.groupBy(bkt).view.mapValues(_.size.toLong).toMap
    val ct = tgtWords.groupBy(bkt).view.mapValues(_.size.toLong).toMap
    def w(b: String): Long = math.floor(1e6 *
      (math.log((ct.getOrElse(b, 0L) + 1) / (tgtWords.size + 256.0)) -
       math.log((cr.getOrElse(b, 0L) + 1) / (rawWords.size + 256.0)))).toLong
    def score(ws: Seq[String]): Long = ws.map(x => w(bkt(x))).sum
    assert(out(1L) == ((4L, score(Seq("apple", "pie", "apple", "tart")))))
    assert(out(2L) == ((4L, score(Seq("gcc", "linker", "segfault", "core")))))
    assert(out(3L) == ((2L, score(Seq("apple", "core")))))
    // the semantic point of DSIR: target-flavored > mixed > off-target
    assert(out(1L)._2 > out(3L)._2 && out(3L)._2 > out(2L)._2, s"$out")
    val again = Curate.dsirScores(raw.repartition(5), target.repartition(3),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == out)
  }

  test("lmScores: integer micro-nat bigram log-probs match a driver " +
      "mirror; seen transitions outscore unseen; short docs omitted; " +
      "layout-invariant") {
    val train = Seq((10L, "the cat sat"), (11L, "the cat ran"),
      (12L, "the cat sat")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "the cat sat"),   // all common transitions
      (2L, "sat the cat"),   // includes an unseen transition (sat->the)
      (3L, "word"),          // 1 token: no bigrams, omitted
      (4L, ""),              // empty: omitted
      (5L, "zq9 vw7 kx3")    // words absent from training: unseen-x path
    ).toDF("doc_id", "text")
    val out = Curate.lmScores(score, train, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 2L, 5L))
    // driver-side mirror of the exact quantized model
    def bkt(w: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.substring(0, 2)
    }
    def bigrams(s: String): Seq[(String, String)] = {
      val b = s.trim.split("\\s+").filter(_.nonEmpty).map(bkt).toSeq
      b.zip(b.drop(1))
    }
    val c2 = Seq("the cat sat", "the cat ran", "the cat sat")
      .flatMap(bigrams).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    def wm(x: String, y: String): Long = math.floor(1e6 * math.log(
      (c2.getOrElse((x, y), 0L) + 1) / (c1.getOrElse(x, 0L) + 256.0))).toLong
    def expect(s: String): (Long, Long) = {
      val bs = bigrams(s)
      (bs.size.toLong, bs.map { case (x, y) => wm(x, y) }.sum)
    }
    assert(out(1L) == expect("the cat sat"), s"got ${out(1L)}")
    assert(out(2L) == expect("sat the cat"), s"got ${out(2L)}")
    // the fully-unseen doc exercises the c1-miss fallback: both of its
    // bigrams' x buckets must be absent from the train model (guard the
    // fixture against md5-bucket collisions), and the score must equal
    // the mirror's smoothed floor ln(1/256) per bigram
    val unseenBs = bigrams("zq9 vw7 kx3")
    assert(unseenBs.forall { case (x, _) => !c1.contains(x) },
      "fixture words must hash outside the train buckets")
    assert(out(5L) == expect("zq9 vw7 kx3"), s"got ${out(5L)}")
    assert(out(5L)._2 == 2L * math.floor(1e6 * math.log(1 / 256.0)).toLong)
    // fluency ordering: the all-seen doc beats the unseen-transition doc
    assert(out(1L)._2 > out(2L)._2)
    val again = Curate.lmScores(score.repartition(5), train.repartition(3),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == out)
  }

  test("topFractionPerGroup: exactly ceil(f*n) best rows per group, " +
      "tie-break by id, equals the rank law, layout-invariant") {
    import graft.operators.Curate
    val rnd = new scala.util.Random(5)
    // scores drawn from a SMALL value set so threshold ties are common
    val data = (1L to 300L).map(i =>
      (i, s"g${i % 3}", (rnd.nextInt(8) + 1).toLong))
    val df = data.toDF("id", "grp", "score")
    for (f <- Seq(0.1, 0.25, 0.5, 1.0)) {
      val got = Curate.topFractionPerGroup(df, Seq("grp"), "score", "id", f)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      val want = data.groupBy(_._2).values.flatMap { rows =>
        val k = math.ceil(f * rows.size).toLong
        rows.sortBy { case (id, _, s) => (-s, id) }.take(k.toInt)
      }.toSet
      assert(got == want, s"f=$f")
      val again = Curate.topFractionPerGroup(df.repartition(7), Seq("grp"),
        "score", "id", f).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(again == got, s"layout f=$f")
    }
  }

  test("budgetPerGroup: per-group concat-and-cut admission equals the " +
      "windowed cumsum law, straddler included, layout-invariant") {
    import graft.operators.Curate
    val rnd = new scala.util.Random(13)
    // small score set -> straddling cells with several docs are common
    val data = (1L to 240L).map(i =>
      (i, s"g${i % 4}", (rnd.nextInt(6) + 1).toLong, (rnd.nextInt(9) + 1).toLong))
    val df = data.toDF("id", "grp", "score", "tok")
    for (budget <- Seq(25L, 80L, 100000L)) {
      val got = Curate.budgetPerGroup(df, Seq("grp"), "score", "id", "tok",
          budget).select("id").collect().map(_.getLong(0)).toSet
      val want = data.groupBy(_._2).values.flatMap { rows =>
        var acc = 0L
        rows.sortBy { case (id, _, s, _) => (-s, id) }
          .filter { case (_, _, _, t) => val in = acc < budget; acc += t; in }
          .map(_._1)
      }.toSet
      assert(got == want, s"budget=$budget")
      val again = Curate.budgetPerGroup(df.repartition(9), Seq("grp"),
        "score", "id", "tok", budget)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(again == got, s"layout budget=$budget")
    }
  }

  test("selection edge contracts: null scores are excluded from rank AND " +
      "quota; a zero-token doc sitting exactly at the budget is cut") {
    import graft.operators.Curate
    // 10 rows, 2 null scores: fraction=1.0 must return the 8 scored rows
    // (quota over scored rows only), never silently fewer or more
    val withNulls = ((1L to 8L).map(i => (i, "g", java.lang.Long.valueOf(i))) ++
      Seq((9L, "g", null.asInstanceOf[java.lang.Long]),
        (10L, "g", null.asInstanceOf[java.lang.Long])))
      .toDF("id", "grp", "score")
    val frac = Curate.topFractionPerGroup(withNulls, Seq("grp"), "score",
      "id", 1.0).select("id").collect().map(_.getLong(0)).toSet
    assert(frac == (1L to 8L).toSet, s"got $frac")
    // budget law is strictly exclusive: doc 2 (tok=0, id AFTER the
    // 3-token doc in the same score cell) sits at offset == budget=3
    val boundary = Seq((1L, "g", 5L, 3L), (2L, "g", 5L, 0L))
      .toDF("id", "grp", "score", "tok")
    val cut = Curate.budgetPerGroup(boundary, Seq("grp"), "score", "id",
      "tok", budget = 3L).select("id").collect().map(_.getLong(0)).toSet
    assert(cut == Set(1L), s"zero-token doc at offset==budget must drop: $cut")
    // but a zero-token doc strictly inside the budget is kept
    val inside = Curate.budgetPerGroup(boundary, Seq("grp"), "score", "id",
      "tok", budget = 4L).select("id").collect().map(_.getLong(0)).toSet
    assert(inside == Set(1L, 2L))
  }

  test("classifierScore/Filter: exact w·x+b; probability threshold folds " +
      "to the logit constant; float promotion matches driver math") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, -0.5f)),
      (2L, Array(0.1f, -0.2f, 0.3f)),
      (3L, Array(-3.0f, 0.0f, 1.5f))).toDF("id", "v")
    val w = Array(0.5, -1.0, 2.0)
    val out = Curate.classifierScore(vecs, "v", w, bias = 0.25, "logit")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def mirror(x: Array[Float]): Double =
      x.zip(w).foldLeft(0.0) { case (s, (a, b)) => s + a.toDouble * b } + 0.25
    assert(out(1L) == mirror(Array(1.0f, 2.0f, -0.5f)))
    assert(out(2L) == mirror(Array(0.1f, -0.2f, 0.3f)))
    assert(out(3L) == mirror(Array(-3.0f, 0.0f, 1.5f)))
    // sigmoid(logit) >= p  <=>  logit >= ln(p/(1-p)) — same kept set
    val kept = Curate.classifierFilter(vecs, "v", w, 0.25, minProb = 0.8)
      .select("id").collect().map(_.getLong(0)).toSet
    val cut = math.log(0.8 / 0.2)
    assert(kept == out.filter(_._2 >= cut).keys.toSet)
    assert(kept == Set(3L), s"got $kept")  // -1.5+0+3+0.25 = 1.75 >= 1.386
  }

  test("gopherRules: each rule fires on its crafted violator only") {
    val long = ("the quick fox " * 20).trim                    // 60 words, stopword-rich
    val docs = Seq(
      ("good", long),
      ("short", "the of brief"),                               // < minWords
      ("nostop", ("lorem ipsum dolor " * 20).trim),            // 0 stopword hits
      ("symbols", (("##### " * 60).trim + " the of")),         // symbol chars, few letters
      ("longwords", (("the of " + "pneumonoultramicroscopic " * 58).trim))) // mwl > 10
      .toDF("id", "text")
    val got = Curate.gopherRules(docs, "text", minWords = 50, minStopwords = 2,
        stopwords = Seq("the", "of"))
      .select("id", "ok_words", "ok_mwl", "ok_symbols", "ok_alpha", "ok_stopwords", "keep")
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5), r.getBoolean(6))).toMap
    assert(got("good") == ((true, true, true, true, true, true)), s"good: ${got("good")}")
    assert(!got("short")._1 && !got("short")._6)
    assert(!got("nostop")._5 && !got("nostop")._6)
    assert(!got("symbols")._3 && !got("symbols")._4 && !got("symbols")._6)
    assert(!got("longwords")._2 && !got("longwords")._6)
  }
}
