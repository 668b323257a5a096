package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunk, Contamination, Split}
import graft.functions.VectorExpressions._

/** Training-pipeline operators: deterministic splits/samples, benchmark
  * decontamination, token-window chunking, embedding normalize/quantize. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 1000L)
    .map(i => (i, (s"word$i " * (i % 7 + 1).toInt).trim))
    .toDF("id", "text")

  test("hashSplit: partition of the input, deterministic, ~fractions") {
    val out = Split.hashSplit(docs, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 1000L, "every row assigned exactly once")
    // 3σ for n=1000: train ±38, val/test ±28
    assert(math.abs(counts("train") - 800L) < 60, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 100L) < 45, s"val=${counts("val")}")
    // repartitioned input → identical assignment (content hash, no rand)
    val again = Split.hashSplit(docs.repartition(7), col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = out.select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first == again)
    // leakage safety: equal keys always co-locate
    val dup = Split.hashSplit(docs.union(docs), col("id"),
      Seq("a" -> 0.5, "b" -> 0.5))
    assert(dup.groupBy("id").agg(countDistinct("split").as("n"))
      .filter(col("n") > 1).count() == 0)
  }

  test("hashSample: subset of hashSplit semantics, stable under salt") {
    val s1 = Split.hashSample(docs, col("id"), 0.3).count()
    assert(math.abs(s1 - 300L) < 50, s"got $s1")
    assert(Split.hashSample(docs, col("id"), 0.3, salt = "other").select("id").collect().toSet !=
      Split.hashSample(docs, col("id"), 0.3).select("id").collect().toSet)
  }

  test("weightedSample: exact A-Res order vs a driver-side mirror; " +
      "∝-weight preference; nonpositive weights excluded; layout-invariant") {
    val d = Seq((1L, 10L), (2L, 1000L), (3L, 50L), (4L, 0L), (5L, -3L),
      (6L, 500L), (7L, 7L)).toDF("id", "w")
    val out = Split.weightedSample(d, col("id"), col("w"), k = 3, salt = "t")
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    // driver-side mirror of the exact scoring formula
    def score(id: Long, w: Long): Double = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(("t" + id).getBytes("UTF-8"))
      val hex = dig.map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      math.log(u) / w
    }
    val expect = Seq((1L, 10L), (2L, 1000L), (3L, 50L), (6L, 500L), (7L, 7L))
      .sortBy { case (id, w) => (-score(id, w), id) }.take(3)
      .zipWithIndex.map { case ((id, _), i) => (id, i + 1) }
    assert(out.toSeq == expect, s"got ${out.toSeq}, want $expect")
    // nonpositive/null weights can never be sampled
    assert(!out.map(_._1).contains(4L) && !out.map(_._1).contains(5L))
    // ∝-weight preference: w=9999 vs w=1, k=1 — the heavy row wins
    // P=0.9999 per independent salt; ≥28/30 is a 1-in-10¹² bound
    val pair = Seq((100L, 9999L), (200L, 1L)).toDF("id", "w")
    val heavyWins = (0 until 30).count { i =>
      Split.weightedSample(pair, col("id"), col("w"), k = 1, salt = s"s$i")
        .head().getLong(0) == 100L
    }
    assert(heavyWins >= 28, s"heavy row won only $heavyWins/30")
    // layout invariance
    val again = Split.weightedSample(d.repartition(5), col("id"), col("w"),
      k = 3, salt = "t").collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(again.toSeq == out.toSeq)
  }

  test("stratifiedSample: exact n per stratum, deterministic pick") {
    val strat = docs.withColumn("g", (col("id") % 3).cast("int"))
    val out = Split.stratifiedSample(strat, Seq("g"), col("id"), 25)
    val per = out.groupBy("g").count().collect().map(_.getLong(1))
    assert(per.length == 3 && per.forall(_ == 25L))
    // small stratum → all of it
    val tiny = strat.filter(col("id") < 5)
    assert(Split.stratifiedSample(tiny, Seq("g"), col("id"), 25).count() == 5)
    // stable under repartition
    val a = out.select("id").collect().map(_.getLong(0)).toSet
    val b = Split.stratifiedSample(strat.repartition(11), Seq("g"), col("id"), 25)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("contamination: flags exactly the docs sharing an n-gram; decontaminate drops them") {
    val bench = Seq((900L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val corpus = Seq(
      (1L, "a document with quick brown fox inside it"),   // shares "quick brown fox"
      (2L, "completely unrelated words here today"),
      (3L, "the lazy dog sleeps all day long")             // shares "the lazy dog"
    ).toDF("id", "text")
    val flagged = Contamination.sharedNgrams(corpus, "id", "text", bench, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(1L, 3L), s"got $flagged")
    assert(flagged(1L) == 1L && flagged(3L) == 1L)
    val kept = Contamination.decontaminate(corpus, "id", "text", bench, "text", n = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  test("fuzzy decontamination drops paraphrased copies a 1-gram-overlap guard over-flags") {
    val bench = Seq((900L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val corpus = Seq(
      // near-copy of the benchmark item (one word changed): Jaccard high
      (1L, "the quick brown fox leaps over the lazy dog"),
      // quotes one benchmark 3-gram inside unrelated text: Jaccard low
      (2L, "my essay mentions the lazy dog once among many other original words"),
      (3L, "completely unrelated words here today")
    ).toDF("id", "text")
    val pairs = Contamination.fuzzyContaminationPairs(corpus, "id", "text",
        bench, "id", "text", n = 3, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(_._1).toSet == Set(1L), s"got ${pairs.toSeq}")
    // one word changed mid-sentence: 4 shared of 10 union shingles = 0.4
    assert(pairs.head._2 == 900L && pairs.head._3 == 0.4)
    val kept = Contamination.decontaminateFuzzy(corpus, "id", "text",
        bench, "id", "text", n = 3, minJaccard = 0.4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), "only the paraphrased near-copy drops")
    // the exact-overlap guard at minShared=1 would also drop doc 2 — the
    // quote — which fuzzy correctly keeps
    val exactKept = Contamination.decontaminate(corpus, "id", "text",
        bench, "text", n = 3).select("id").collect().map(_.getLong(0)).toSet
    assert(exactKept == Set(3L))
  }

  test("decontaminateBloom == decontaminate, even with a saturated bloom") {
    val bench = Seq((900L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val corpus = Seq(
      (1L, "a document with quick brown fox inside it"),
      (2L, "completely unrelated words here today"),
      (3L, "the lazy dog sleeps all day long"),
      (4L, "more innocuous text that shares nothing at all")
    ).toDF("id", "text")
    val exact = Contamination.decontaminate(corpus, "id", "text", bench, "text", n = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    val bloom = Contamination.decontaminateBloom(corpus, "id", "text", bench, "text", n = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(bloom == exact)
    // a deliberately tiny, saturated bloom (false positives everywhere)
    // must still be EXACT — the confirm join removes every false positive
    val saturated = Contamination.decontaminateBloom(corpus, "id", "text",
        bench, "text", n = 3, expectedItems = 2, fpp = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(saturated == exact, "bloom false positives leaked into the result")
  }

  test("bloomCandidate never misses a truly contaminated doc (no false negatives)") {
    val bench = Seq((900L, "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
    val corpus = Seq(
      (1L, "prefix alpha beta gamma suffix"),
      (2L, "beta gamma delta inside here"),
      (3L, "nothing shared with that set")
    ).toDF("id", "text")
    val bloom = Contamination.benchNgramBloom(bench, "text", n = 3)
    val cands = corpus
      .filter(Contamination.bloomCandidate(col("text"), bloom, n = 3))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(Set(1L, 2L).subsetOf(cands), s"bloom missed a true hit: $cands")
  }

  test("tokenWindows: coverage, overlap, short tail, empty-doc exclusion") {
    val d = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "only three tokens"),
      (3L, "   ")                                      // whitespace-only: no rows
    ).toDF("id", "text")
    val out = Chunk.tokenWindows(d, "id", "text", windowTokens = 4, stride = 3)
      .orderBy("id", "chunk_id").collect()
    val byId = out.groupBy(_.getLong(0))
    // 10 tokens, win 4 stride 3 → ceil((10-4)/3)=2 extra → starts 0,3,6:
    // the minimal covering set (a start at 9 would add only covered tokens)
    val w1 = byId(1L).map(r => (r.getInt(1), r.getString(2), r.getLong(3)))
    assert(w1.length == 3, s"got ${w1.toSeq}")
    assert(w1(0) == ((0, "t1 t2 t3 t4", 4L)))
    assert(w1(1) == ((1, "t4 t5 t6 t7", 4L)))
    assert(w1(2) == ((2, "t7 t8 t9 t10", 4L)))
    // tokens 1..10 all covered
    assert(w1.flatMap(_._2.split(" ")).toSet == (1 to 10).map(i => s"t$i").toSet)
    // short doc → one short window with the true token count
    assert(byId(2L).map(r => (r.getString(2), r.getLong(3))).toSeq ==
      Seq(("only three tokens", 3L)))
    assert(!byId.contains(3L))
  }

  test("packIndex: contiguous offsets, correct sequence spans, no global window") {
    val d = Seq(
      (1L, (1 to 5).map(i => s"a$i").mkString(" ")),   // 5 tokens, offset 0
      (2L, (1 to 9).map(i => s"b$i").mkString(" ")),   // 9 tokens, offset 5
      (3L, " "),                                        // excluded
      (4L, (1 to 3).map(i => s"c$i").mkString(" "))    // 3 tokens, offset 14
    ).toDF("id", "text")
    val out = Chunk.packIndex(d, "id", "text", contextLen = 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 5L, 0L, 0L, 0L),    // tokens [0,5) → seq 0
      (2L, 9L, 5L, 0L, 1L),    // tokens [5,14) → straddles seqs 0-1
      (4L, 3L, 14L, 1L, 2L))   // tokens [14,17) → straddles seqs 1-2
    )
    // offsets are contiguous: each offset = previous offset + n
    val offs = out.map(t => (t._3, t._2))
    assert(offs.scanLeft(0L)(_ + _._2).init.toSeq == offs.map(_._1).toSeq)
    // partition-layout invariance (two-pass partial sums, not rand/order luck)
    val again = Chunk.packIndex(d.repartition(5), "id", "text", contextLen = 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSeq == out.toSeq)
  }

  test("packSequences: full sequences except the tail, token conservation, " +
      "doc ranges consistent with the index") {
    val d = Seq(
      (1L, (1 to 5).map(i => s"a$i").mkString(" ")),   // 5 tokens, offset 0
      (2L, (1 to 9).map(i => s"b$i").mkString(" ")),   // 9 tokens, offset 5
      (3L, " "),                                        // excluded
      (4L, (1 to 3).map(i => s"c$i").mkString(" "))    // 3 tokens, offset 14
    ).toDF("id", "text")
    val out = Chunk.packSequences(d, "id", "text", contextLen = 8)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // 17 tokens at context 8 → seqs 0..2; seq 0: docs 1+2 fill it,
    // seq 1: docs 2+4, seq 2: the 1-token tail of doc 4
    assert(out.toSeq == Seq(
      (0L, 2L, 8L, 1L, 2L),
      (1L, 2L, 8L, 2L, 4L),
      (2L, 1L, 1L, 4L, 4L)))
    // invariants that hold for ANY corpus: every sequence except the last
    // is exactly full, and sequence tokens sum to the corpus token count
    assert(out.init.forall(_._3 == 8L))
    assert(out.map(_._3).sum == 17L)
    // layout invariance
    val again = Chunk.packSequences(d.repartition(5), "id", "text", contextLen = 8)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSeq == out.toSeq)
  }

  test("removeFrequentLines: every copy of an over-frequency line drops, " +
      "survivors reassemble in order, custom separator honored") {
    val d = Seq(
      (1L, "dup line\nunique one"),
      (2L, "dup line\nunique two"),
      (3L, "dup line"),          // entirely boilerplate → empty survivor
      (4L, "   ")                 // blank doc → no output row
    ).toDF("id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // maxFreq = 1: "dup line" (freq 3) drops from ALL docs, firsts included
    val strict = rows(Chunk.removeFrequentLines(d, "id", "text", maxFreq = 1))
    assert(strict.toSeq == Seq(
      (1L, 2L, 1L, "unique one"),
      (2L, 2L, 1L, "unique two"),
      (3L, 1L, 0L, "")))
    // maxFreq = 3: within budget, everything survives verbatim
    val lax = rows(Chunk.removeFrequentLines(d, "id", "text", maxFreq = 3))
    assert(lax.toSeq == Seq(
      (1L, 2L, 2L, "dup line\nunique one"),
      (2L, 2L, 2L, "dup line\nunique two"),
      (3L, 1L, 1L, "dup line")))
    // layout invariance + a non-default (regex-meta) literal separator
    assert(rows(Chunk.removeFrequentLines(d.repartition(5), "id", "text",
      maxFreq = 1)).toSeq == strict.toSeq)
    val pipe = Seq((1L, "x|y"), (2L, "x|z")).toDF("id", "text")
    assert(rows(Chunk.removeFrequentLines(pipe, "id", "text", maxFreq = 1,
      lineSep = "|")).toSeq == Seq((1L, 2L, 1L, "y"), (2L, 2L, 1L, "z")))
  }

  test("pinSlot: an in-place regenerated source is recomputed, never " +
      "served from the previous generation's cache slot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-regen")
      .toFile.getAbsolutePath
    def gen(a: String, b: String, c: String, d: String): Unit =
      Seq((1L, s"$a\n$b"), (2L, s"$a\n$c"), (3L, s"$d"))
        .toDF("id", "text").coalesce(1)
        .write.mode("overwrite").parquet(dir)
    def kept(): Map[Long, String] =
      Chunk.removeFrequentLines(spark.read.parquet(dir), "id", "text",
          maxFreq = 1)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    gen("dup", "one", "two", "solo")
    assert(kept() == Map(1L -> "one", 2L -> "two", 3L -> "solo"))
    // regenerate the SAME directory: fresh reads of it sameResult the
    // pinned plan (InMemoryFileIndex equality is by root path), so only
    // the slot's source fingerprint stands between this read and the
    // pre-regeneration cache blocks
    gen("boiler", "uno", "dos", "tres")
    assert(kept() == Map(1L -> "uno", 2L -> "dos", 3L -> "tres"),
      "slot served the pre-regeneration generation")
  }

  test("shardBySize: longest-first round-robin matches the value-sorted " +
      "rank exactly and is layout-invariant") {
    val d = (0L until 200L).map(i => (i, i % 13)).toDF("id", "sz")
    val out = Split.shardBySize(d, "id", "sz", nShards = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // reference assignment: rank over (sz desc, id asc), shard = (rank-1)%4
    val expect = (0L until 200L).map(i => (i, i % 13))
      .sortBy { case (id, sz) => (-sz, id) }.zipWithIndex
      .map { case ((id, _), rk) => id -> (rk % 4) }.toMap
    assert(out == expect)
    // balanced by construction: per-shard counts exactly equal here
    val sizes = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.values.toSet == Set(50))
    val again = Split.shardBySize(d.repartition(7), "id", "sz", nShards = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(again == out)
  }

  test("dedupSpans: first occurrence survives, later copies drop, docs reassemble in order") {
    import graft.operators.Chunk
    // doc 1: spans A B; doc 2: spans B C (B repeats doc 1's); doc 3: all
    // spans already seen (A and C) -> empty text_kept
    val A = (1 to 4).map(i => s"a$i").mkString(" ")
    val B = (1 to 4).map(i => s"b$i").mkString(" ")
    val C = (1 to 4).map(i => s"c$i").mkString(" ")
    val docs = Seq((1L, s"$A $B"), (2L, s"$B $C"), (3L, s"$A $C"))
      .toDF("doc_id", "text")
    val out = Chunk.dedupSpans(docs, "doc_id", "text", spanTokens = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((2L, 2L, s"$A $B")))
    assert(out(2L) == ((2L, 1L, C)), "B was taken by doc 1; C survives")
    assert(out(3L) == ((2L, 0L, "")), "every span seen earlier elsewhere")
  }

  test("dedupSubstrings: non-first copies of a duplicated k-run lose the " +
      "window union, first and short docs untouched, layout-invariant") {
    import graft.operators.Chunk
    // P = a 5-token passage shared by docs 1 and 2 (k=4: its two
    // overlapping windows both flag in doc 2, removal = their union =
    // all 5 tokens); doc 3 shorter than k; doc 4 = P alone -> fully
    // removed (doc 2 outranks it? no — (2,_) < (4,_), so doc 4 is
    // non-first everywhere); doc 5 repeats a window WITHIN itself.
    val P = (1 to 5).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"$P u1 u2"),            // first owner of P's windows
      (2L, s"v1 $P"),               // later copy: all 5 P-tokens drop
      (3L, "s1 s2 s3"),             // < k tokens: no windows, untouched
      (4L, P),                      // nothing but P: text_kept = ''
      (5L, "x1 x2 x3 x4 y x1 x2 x3 x4") // in-doc repeat: 2nd run drops
    ).toDF("doc_id", "text")
    val out = Chunk.dedupSubstrings(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((7L, 0L, s"$P u1 u2")), "first occurrence survives")
    assert(out(2L) == ((6L, 5L, "v1")), "window union removes whole passage")
    assert(out(3L) == ((3L, 0L, "s1 s2 s3")), "below k: untouched")
    assert(out(4L) == ((5L, 5L, "")), "fully duplicated doc empties")
    assert(out(5L) == ((9L, 4L, "x1 x2 x3 x4 y")), "in-doc repeat drops")
    val again = Chunk.dedupSubstrings(docs.repartition(7), "doc_id", "text",
      k = 4).collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(again == out)
  }

  test("contentDefinedChunks: chunks tile the doc exactly; boundaries " +
      "are content-local (an inserted prefix realigns downstream chunks)") {
    import graft.operators.Chunk
    val toks = (1 to 200).map(i => s"tok$i")
    val a = toks.mkString(" ")
    val b = "ins1 ins2 ins3 " + a
    val docs = Seq((1L, a), (2L, b), (3L, "one two")).toDF("doc_id", "text")
    val out = Chunk.contentDefinedChunks(docs, "doc_id", "text",
        windowTokens = 4, modulus = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getString(4)))
    // tiling: starts contiguous, lengths sum to the doc, concat == doc
    for ((id, doc) <- Seq(1L -> a, 2L -> b, 3L -> "one two")) {
      val cs = out.filter(_._1 == id).sortBy(_._2)
      assert(cs.head._3 == 1 && cs.map(_._2).toSeq == cs.indices.toSeq)
      assert(cs.sliding(2).forall { case Array(p, q) => q._3 == p._3 + p._4
        case _ => true })
      assert(cs.map(_._5).mkString(" ") == doc)
    }
    // below-expected-size doc: a single chunk
    assert(out.count(_._1 == 3L) == 1)
    // CDC locality: every chunk of A except possibly the first reappears
    // verbatim in B (fixed-span chunking would shift every boundary)
    val ca = out.filter(_._1 == 1L).sortBy(_._2).map(_._5)
    val cb = out.filter(_._1 == 2L).map(_._5).toSet
    assert(ca.length > 5, s"expected several chunks, got ${ca.length}")
    assert(ca.drop(1).forall(cb.contains),
      "tail chunks must survive the prefix edit")
  }

  test("pageRankMicro: integer recurrence matches a driver mirror; the " +
      "hub outranks leaves; layout-invariant") {
    import graft.operators.LinkGraph
    val es = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 0L),
      (0L, 1L), (2L, 1L))
    val edges = es.toDF("src", "dst")
    val out = LinkGraph.pageRankMicro(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val outdeg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = 15L * 1000000L / (100L * n)
    var r = nodes.map(_ -> 1000000L / n).toMap
    for (_ <- 1 to 3) {
      val mass = es.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / outdeg(s) }.sum).toMap
      r = nodes.map(v => v -> (base + 85L * mass.getOrElse(v, 0L) / 100L)).toMap
    }
    assert(out == r, s"got $out, want $r")
    assert(out(0L) > out(3L), "the hub must outrank a leaf")
    val again = LinkGraph.pageRankMicro(edges.repartition(7), "src", "dst",
      iters = 3).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(again == out)
  }

  test("pageRankMicro: lineage pinning and convergence stop change " +
      "execution, never values; iters=50 stays bounded") {
    import graft.operators.LinkGraph
    // star + back-edge: leaves fix at base mass after round 1, the hub one
    // round later — an exact integer fixed point well before 50 rounds
    val edges = ((1L to 6L).map(_ -> 0L) :+ (0L -> 1L)).toDF("src", "dst")
    def ranks(pinEvery: Int, iters: Int, converge: Boolean = false) =
      LinkGraph.pageRankMicro(edges, "src", "dst", iters = iters,
          pinEvery = pinEvery, stopOnConverge = converge)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pinned = ranks(pinEvery = 1, iters = 5)
    assert(ranks(pinEvery = 0, iters = 5) == pinned,
      "pinning must not change ranks")
    assert(ranks(pinEvery = 2, iters = 5) == pinned)
    // 50 pinned rounds complete promptly (unpinned lineage would deepen
    // the plan 50×); early convergence stop returns the identical fixed
    // point the full run lands on
    val full50 = ranks(pinEvery = 1, iters = 50)
    assert(ranks(pinEvery = 1, iters = 50, converge = true) == full50)
    assert(full50(0L) > full50(2L))
  }

  test("pageRankMicro: adaptive scale admits corpora past 10k nodes " +
      "where the fixed default would hard-fail (q_pagerank guard)") {
    import graft.operators.LinkGraph
    // the q_pagerank edge construction at n = 12k docs
    val m = 12000L
    val ids = spark.range(m).select(col("id").as("doc_id"))
    val edges = ids.select(col("doc_id").as("src"),
        ((col("doc_id") * 7 + 3) % m).as("dst"))
      .unionByName(ids.select(col("doc_id").as("src"),
        ((col("doc_id") * 13 + 5) % m).as("dst")))
      .filter(col("src") =!= col("dst"))
    // old fixed default: require(scale >= 100*n) trips
    val e = intercept[IllegalArgumentException](
      LinkGraph.pageRankMicro(edges, "src", "dst", iters = 1))
    assert(e.getMessage.contains("pass scale >="))
    // the call-site formula: scale grows with the corpus and passes
    val out = LinkGraph.pageRankMicro(edges, "src", "dst", iters = 1,
      scale = math.max(1000000L, 100L * m))
    assert(out.count() == m)
    assert(out.filter(col("rank_micro") <= 0).count() == 0,
      "every node keeps positive integer mass at 100 micro-units/node")
  }

  test("lengthBuckets: boundary edges and pad-waste arithmetic") {
    import graft.operators.Chunk
    // token counts: 2, 3 (edge: < 3 -> bucket 0 excludes 3), 5, 9
    val docs = Seq((1L, "w w"), (2L, "w w w"), (3L, "w w w w w"),
      (4L, "w w w w w w w w w")).toDF("doc_id", "text")
    val out = Chunk.lengthBuckets(docs, "doc_id", "text", Seq(3, 6))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    assert(out(0) == ((1L, 2L, 2L, 0L)))
    assert(out(1) == ((2L, 3L, 5L, 2L)), "docs of 3 and 5 tokens; pad 5-3=2")
    assert(out(2) == ((1L, 9L, 9L, 0L)), "at-or-above last boundary")
  }

  test("Scrub: rule independence (ssn vs phone), counts, idempotent tags") {
    import graft.operators.Scrub
    val txt = "mail a.b+c@x-y.io call +1 212-555-0199 or 212.555.0199 " +
      "ssn 123-45-6789 host 192.168.0.1 clean 12-34"
    val df = Seq((1L, txt)).toDF("id", "text")
    val r = Scrub.redactTable(df, "text").collect().head
    val red = r.getString(1)
    assert(red.contains("<EMAIL>") && red.contains("<SSN>") && red.contains("<IP>"))
    assert(red.contains("<PHONE>") && !red.matches(".*\\d{3}[-.]\\d{3}[-.]\\d{4}.*"))
    assert(red.contains("clean 12-34"), "non-PII digit runs untouched")
    assert(r.getInt(2) == 5, s"email + 2 phones + ssn + ip = 5, got ${r.getInt(2)}")
    // a second pass over redacted text finds nothing
    val again = Scrub.redactTable(df.select(col("id"), lit(red).as("text")), "text")
      .collect().head
    assert(again.getInt(2) == 0, "redaction is a fixpoint")
  }

  test("encodingArtifacts: mojibake, control chars and special tokens " +
      "count independently; clean text is clean; filter is map-side") {
    import graft.operators.Scrub
    val docs = Seq(
      (1L, "perfectly ordinary text"),
      (2L, "double-decoded cafÃ© and â€™quotesâ€¦ here"),
      (3L, "binary\u0001junk\u0007here"),
      (4L, "leaked <|endoftext|> and [SEP] and </s> markers"),
      (5L, "tab\tand\nnewline are fine")
    ).toDF("doc_id", "text")
    val out = Scrub.encodingArtifacts(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((0, 0, 0, true)))
    assert(out(2L) == ((3, 0, 0, false)), "Ã©, â€™, â€¦")
    assert(out(3L) == ((0, 2, 0, false)), "\\x01 and \\x07")
    assert(out(4L) == ((0, 0, 3, false)), "<|endoftext|>, [SEP], </s>")
    assert(out(5L) == ((0, 0, 0, true)), "tab/newline are not artifacts")
  }

  test("dedupAgainst: exact re-crawls drop (normalized), fresh docs " +
      "survive, byte-exact mode distinguishes whitespace variants") {
    import graft.operators.Dedup
    val existing = Seq((1L, "The Quick  Brown Fox"), (2L, "other doc"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "the quick brown fox"),   // normalized match -> drops
      (11L, "THE QUICK\tBROWN FOX"),  // ws+case variant -> drops
      (12L, "a genuinely new doc")    // survives
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainst(incoming, existing, "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L))
    val keptExact = Dedup.dedupAgainst(incoming, existing, "text",
      normalize = false).collect().map(_.getLong(0)).toSet
    assert(keptExact == Set(10L, 11L, 12L), "no byte-exact copies")
  }

  test("vec_l2_normalize: unit norm, zero vector passes through; quantize round-trips") {
    val vecs = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(-1.5f, 2.5f, 0.5f))
    ).toDF("id", "v")
    val n = vecs.select(col("id"), vec_l2_normalize(col("v")).as("nv"),
        sqrt(vec_dot(vec_l2_normalize(col("v")), vec_l2_normalize(col("v")))).as("nrm"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toList
    val m = n.map(t => t._1 -> t).toMap
    assert(m(1L)._2 == Seq(0.6, 0.8))
    assert(m(2L)._2 == Seq(0.0, 0.0), "zero vector: zeros, not NaN")
    assert(math.abs(m(3L)._3 - 1.0) < 1e-12, "unit norm after normalize")
    // quantize: max-abs element maps to ±127 or 126 (floor), clamp holds
    val q = vecs.filter(col("id") =!= 2L)
      .select(col("id"), vec_quantize_int8(col("v")).as("q"),
        vec_quantize_scale(col("v")).as("s"))
      .collect().map(r => (r.getLong(0), r.getSeq[Byte](1), r.getDouble(2))).toList
    val qm = q.map(t => t._1 -> t).toMap
    assert(qm(1L)._2 == Seq[Byte](95, 127), s"got ${qm(1L)._2}") // floor(3*127/4)=95
    assert(qm(1L)._3 == 127.0 / 4.0)
    assert(qm(3L)._2.max <= 127 && qm(3L)._2.min >= -128)
    // dequantized values within one quantization step
    qm(3L)._2.zip(Seq(-1.5, 2.5, 0.5)).foreach { case (qv, x) =>
      assert(math.abs(qv / qm(3L)._3 - x) <= 1.0 / qm(3L)._3 + 1e-12)
    }
  }
}
