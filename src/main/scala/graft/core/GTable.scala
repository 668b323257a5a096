package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GTable — the engine's core table abstraction: an immutable, lazy,
  * named wrapper over a Spark `DataFrame` providing the reference's full
  * query surface (ptmcg/littletable `Table`, littletable.py:1095) rebuilt
  * Spark-first.
  *
  * Design stance (SURVEY.md §7): every operator declares a Catalyst plan;
  * nothing materializes until an action at the edges (`present`, exports,
  * `count`). The reference's in-place mutations (`insert`, `remove`,
  * `compute_field`) become pure transformations returning a new GTable —
  * which matches the reference's own "every query result is a new Table"
  * chaining style (littletable.py:52).
  *
  * Ordering: the reference is an ordered list; here order is carried
  * explicitly — `orderby` records sort keys so `rank`/`head`/`tail`/
  * `slice`/`batched` are deterministic AND scale-safe (see [[Ordinals]]:
  * no global single-partition window at 100 TB).
  */
/** Import provenance carried by a GTable (reference import metadata,
  * littletable.py:2851-2868: `import_source_type`, `import_source`,
  * `import_time`). Set by the importers in [[graft.sources.Sources]];
  * query transformations preserve it via `copy`. */
final case class ImportMeta(
    sourceType: String = "",
    source: String = "",
    importTime: Option[java.time.Instant] = None)

object ImportMeta {
  val none: ImportMeta = ImportMeta()
  def now(sourceType: String, source: String): ImportMeta =
    ImportMeta(sourceType, source, Some(java.time.Instant.now()))
}

final case class GTable(
    df: DataFrame,
    name: String = "",
    /** Total-order keys established by the last orderby (if any). */
    sortKeys: Seq[SortKey] = Nil,
    /** Import provenance (reference import_source/type/time). */
    meta: ImportMeta = ImportMeta.none,
    /** Construction time (reference create_time; immutable tables have no
      * separate modify_time). */
    createdAt: java.time.Instant = java.time.Instant.now()) {

  /** Attach import provenance (used by importers; also lets a caller
    * re-label a shim-fetched source, e.g. url → temp file). */
  def withMeta(sourceType: String, source: String): GTable =
    copy(meta = ImportMeta.now(sourceType, source))

  def spark: SparkSession = df.sparkSession
  def columns: Seq[String] = df.columns.toSeq

  /** Number of rows — an action (reference `len(tbl)`). */
  def size: Long = df.count()

  private def sorted: DataFrame =
    if (sortKeys.isEmpty) df else df.orderBy(sortKeys.map(_.order): _*)

  // ------------------------------------------------------------------
  // Filters (reference `where`, littletable.py:2100-2165)
  // ------------------------------------------------------------------

  /** `where` with a raw Column predicate (the reference's lambda form;
    * prefer this — fully codegen'd + pushed down by Catalyst). */
  def where(cond: Column): GTable = copy(df = df.filter(cond))

  /** `where` with attribute→comparator pairs (conjunctive), the
    * reference's kwargs form: `where("qty" -> Cmp.gt(45), "flag" -> Cmp.eq("R"))`.
    * Catalyst reorders/pushes the conjuncts — the reference's manual
    * selectivity ordering (littletable.py:2121-2127) is subsumed. */
  def where(pairs: (String, Cmp.Pred)*): GTable =
    copy(df = df.filter(pairs.map { case (c, p) => p(col(c)) }.reduce(_ && _)))

  /** Equality-kwargs form: `whereEq("state" -> "CA", "zip" -> 12345)`.
    * Null-safe (`<=>`): `whereEq("state" -> null)` matches null values,
    * like the reference's `where(state=None)` (Python None == None). */
  def whereEq(pairs: (String, Any)*): GTable =
    copy(df = df.filter(pairs.map { case (c, v) => col(c) <=> lit(v) }.reduce(_ && _)))

  /** Reference `delete(**kwargs)` (littletable.py:2167-2182) — immutable
    * flavor: returns the table without the matching rows. Rows where the
    * predicate is NULL did not match, so they are kept (same as
    * splitby's non-matching half). */
  def delete(cond: Column): GTable = copy(df = df.filter(!cond || cond.isNull))

  /** Reference `splitby` (littletable.py:3630-3771): one predicate →
    * (non-matching, matching). Both halves share the lazy parent plan;
    * cache the parent if both sides are consumed. */
  def splitby(pred: Column): (GTable, GTable) =
    (copy(df = df.filter(!pred || pred.isNull)), copy(df = df.filter(pred)))

  /** `splitby` with an error policy: rows where evaluating `pred` errors
    * (reference: predicate raises) are routed to a third table. Uses
    * `try_`-style null-detection rather than task failure: `errExpr`
    * should be the `try_*` form of the predicate's input. */
  def splitbyWithErrors(pred: Column, isError: Column): (GTable, GTable, GTable) =
    (copy(df = df.filter(!isError && (!pred || pred.isNull))),
     copy(df = df.filter(!isError && pred)),
     copy(df = df.filter(isError)))

  // ------------------------------------------------------------------
  // Projection (reference `select`, littletable.py:2259-2315)
  // ------------------------------------------------------------------

  /** Field-string select with `*` / `-name` (littletable.py:3917-3950). */
  def select(spec: String): GTable =
    copy(df = df.select(FieldSpec.parseFields(df, spec).map(col): _*))

  def select(cols: Column*): GTable = copy(df = df.select(cols: _*))

  /** Computed columns — the reference's `select(name=fn)` /
    * `compute_field` (littletable.py:3494-3544). Exceptions→default is the
    * caller's job via `try_*` expressions + `coalesce` (no failing tasks). */
  def computeField(name: String, expr: Column, default: Option[Column] = None): GTable = {
    val e = default.map(d => coalesce(expr, d)).getOrElse(expr)
    copy(df = df.withColumn(name, e))
  }
  def addField(name: String, expr: Column): GTable = computeField(name, expr)

  /** Per-row string templating (reference `format`, littletable.py:2345-2351):
    * `formatted("{}: {}", col("a"), col("b"))` → single string column. */
  def formatted(template: String, cols: Column*): GTable =
    copy(df = df.select(format_string(
      template.replace("%", "%%").replace("{}", "%s"), cols: _*).as("formatted")))

  // ------------------------------------------------------------------
  // Ordering / limits (littletable.py:2192-2257, 3816-3830)
  // ------------------------------------------------------------------

  /** `orderby("a, b desc")` — records the total order and sorts. */
  def orderby(spec: String): GTable = orderby(FieldSpec.parseOrderBy(spec): _*)

  def orderby(keys: SortKey*): GTable =
    copy(df = df.orderBy(keys.map(_.order): _*), sortKeys = keys)

  /** Random permutation (reference `shuffle`, littletable.py:2184-2190). */
  def shuffle(seed: Long = 42L): GTable =
    copy(df = df.orderBy(rand(seed).asc), sortKeys = Nil)

  def head(n: Int): GTable = copy(df = sorted.limit(n))

  /** Last n in the established order — re-sorts descending, limits,
    * restores order. Scale-safe: TakeOrdered physical op, no global window. */
  def tail(n: Int): GTable = {
    require(sortKeys.nonEmpty, "tail requires orderby first (ordered-table semantics)")
    copy(df = df.orderBy(sortKeys.map(_.inverted): _*).limit(n)
      .orderBy(sortKeys.map(_.order): _*))
  }

  /** Append a 1-based ordinal in the current order (reference `rank`,
    * littletable.py:2248-2257). Scale-safe two-pass ordinal (no global
    * window) — see [[Ordinals]]. */
  def rank(name: String = "rank"): GTable = {
    require(sortKeys.nonEmpty, "rank requires orderby first")
    copy(df = Ordinals.withOrdinal(df, sortKeys, name))
  }

  /** Python-style positive slice over the established order. */
  def slice(start: Long, end: Long): GTable = {
    require(sortKeys.nonEmpty, "slice requires orderby first")
    val withOrd = Ordinals.withOrdinal(df, sortKeys, "__ord")
    copy(df = withOrd.filter(col("__ord") > start && col("__ord") <= end).drop("__ord"))
  }

  /** Full Python slice semantics (reference `tbl[start:stop:step]`,
    * littletable.py:1393-1400): negative indices, arbitrary step,
    * negative step reverses the order. Selection is an ordinal
    * predicate + modulus (scale-safe); a table count is taken only when
    * negative indices / negative step require it. */
  def slicePy(start: Option[Long] = None, stop: Option[Long] = None,
      step: Long = 1): GTable = {
    require(step != 0, "slice step cannot be zero")
    require(sortKeys.nonEmpty, "slice requires orderby first")
    val withOrd = Ordinals.withOrdinal(df, sortKeys, "__ord")
    val needN = step < 0 || start.exists(_ < 0) || stop.exists(_ < 0)
    val n: Long = if (needN) df.count() else 0L // plain scan-count; no sort needed
    def norm(i: Long): Long = if (i < 0) i + n else i
    val ord0 = col("__ord") - 1
    val (pred, outKeys) =
      if (step > 0) {
        val s = math.max(0L, start.map(norm).getOrElse(0L))
        val base = ord0 >= s && ((ord0 - s) % step === 0)
        val p = stop.map(norm).map(e => base && ord0 < e).getOrElse(base)
        (p, sortKeys)
      } else {
        val s = math.min(start.map(norm).getOrElse(n - 1), n - 1)
        val e = stop.map(norm).getOrElse(-1L)
        val p = ord0 <= s && ord0 > e && ((lit(s) - ord0) % (-step) === 0)
        (p, sortKeys.map(k => k.copy(asc = !k.asc)))
      }
    copy(df = withOrd.filter(pred).drop("__ord"), sortKeys = outKeys)
  }

  /** Paginate into fixed-size batches (reference `batched`,
    * littletable.py:3616-3628): adds a `batch` column; callers group or
    * iterate per batch id. */
  def batched(batchSize: Int, batchCol: String = "batch"): GTable = {
    require(batchSize > 0, "batchSize must be positive")
    require(sortKeys.nonEmpty, "batched requires orderby first")
    val withOrd = Ordinals.withOrdinal(df, sortKeys, "__ord")
    // integer `div`, not double `/`: exact for any long ordinal
    copy(df = withOrd
      .withColumn(batchCol, expr(s"(__ord - 1) div $batchSize"))
      .drop("__ord"))
  }

  // ------------------------------------------------------------------
  // Set ops (littletable.py:1445-1462, 3773-3795)
  // ------------------------------------------------------------------

  /** Bag union / concatenation (reference `t1 + t2`). Null-fills columns
    * missing on either side (reference rows are heterogeneous). */
  def +(other: GTable): GTable = union(other)
  def union(other: GTable): GTable = {
    val allCols = (df.columns ++ other.df.columns.filterNot(df.columns.contains)).toSeq
    def conform(d: DataFrame): DataFrame =
      d.select(allCols.map(c => if (d.columns.contains(c)) col(c) else lit(null).as(c)): _*)
    copy(df = conform(df).unionByName(conform(other.df)))
  }

  def intersect(other: GTable): GTable = copy(df = df.intersect(other.df))
  def except(other: GTable): GTable = copy(df = df.except(other.df))

  /** Dedup keeping the first occurrence in `order` (reference `unique`,
    * littletable.py:3773-3795). Deterministic — unlike raw dropDuplicates —
    * via per-key min-ordinal; one shuffle on the key. */
  def unique(keyCols: Seq[String], order: Seq[Column]): GTable = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    copy(df = df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn"))
  }

  /** Whole-row dedup (reference key = sorted attr tuple). */
  def unique(): GTable = copy(df = df.dropDuplicates())

  // ------------------------------------------------------------------
  // Joins (littletable.py:2353-2722)
  // ------------------------------------------------------------------

  /** Multi-attribute equi-join. `pairs` maps this table's columns to the
    * other's. The reference builds hash indexes on both sides
    * (littletable.py:2448-2452) — Catalyst's broadcast/sort-merge hash
    * strategies subsume that; pass `broadcastOther=true` for small dims. */
  def join(other: GTable, pairs: (String, String)*): GTable =
    joinTyped(other, "inner", pairs: _*)

  /** Outer joins with SQL semantics. NOTE the reference's naming is
    * inverted vs SQL (its RIGHT_OUTER preserves self — littletable.py:
    * 2631-2646); we use SQL naming and document the deviation
    * (SURVEY.md §2.3). joinType: inner|left|right|full|left_semi|left_anti. */
  def joinTyped(other: GTable, joinType: String, pairs: (String, String)*): GTable = {
    // NON-key shared column names would emit duplicate output columns
    // (ambiguous downstream); the reference's join raises on duplicate
    // attributes too — fail fast with the fix in the message.
    val keyDups = pairs.collect { case (a, b) if a == b => b }.toSet
    val collisions = df.columns.toSet.intersect(other.df.columns.toSet) -- keyDups
    require(collisions.isEmpty || joinType == "left_semi" || joinType == "left_anti",
      s"join would duplicate non-key columns ${collisions.mkString(", ")} — " +
        "rename or project them away first (reference join raises on duplicate attributes)")
    val l = df.alias("l"); val r = other.df.alias("r")
    val cond = pairs.map { case (a, b) => col(s"l.$a") === col(s"r.$b") }.reduce(_ && _)
    val joined = l.join(r, cond, joinType)
    // For semi/anti only the left columns survive; otherwise drop the
    // duplicate right-side key columns like the reference (2481-2486).
    val out = joinType match {
      case "left_semi" | "left_anti" => joined
      case _ =>
        // Same-name join keys collapse to ONE column via coalesce(l, r),
        // so right/full-outer rows that exist only on the right keep
        // their key (dropping only r.key would null it out).
        val dupSet = pairs.collect { case (a, b) if a == b => b }.toSet
        val lCols = df.columns.toSeq.map { c =>
          if (dupSet(c)) coalesce(col(s"l.$c"), col(s"r.$c")).as(c)
          else col(s"l.$c")
        }
        val rCols = other.df.columns.toSeq.filterNot(dupSet).map(c => col(s"r.$c"))
        joined.select(lCols ++ rCols: _*)
    }
    GTable(out, s"$name+${other.name}")
  }

  /** Reference-compat outer-join naming (littletable.py:2631-2646): the
    * reference's RIGHT_OUTER_JOIN preserves SELF (= SQL LEFT), its
    * LEFT_OUTER_JOIN preserves OTHER (= SQL RIGHT). This alias accepts
    * the reference's names and runs the SQL-correct equivalent, so
    * migrating code keeps its semantics without adopting the inverted
    * vocabulary. */
  def outerJoinCompat(refJoinType: String, other: GTable,
      pairs: (String, String)*): GTable = {
    val sqlType = refJoinType.toLowerCase.stripSuffix("_join") match {
      case "right_outer" | "right" => "left"
      case "left_outer" | "left" => "right"
      case "full_outer" | "full" | "outer" => "full"
      case t => throw new IllegalArgumentException(
        s"unknown reference join type: $t")
    }
    joinTyped(other, sqlType, pairs: _*)
  }

  /** Broadcast-hint flavor for small dimension tables. */
  def joinBroadcast(other: GTable, pairs: (String, String)*): GTable = {
    val l = df.alias("l"); val r = broadcast(other.df.alias("r"))
    val cond = pairs.map { case (a, b) => col(s"l.$a") === col(s"r.$b") }.reduce(_ && _)
    val dupRight = pairs.collect { case (a, b) if a == b => b }
    GTable(dupRight.foldLeft(l.join(r, cond))((d, c) => d.drop(col(s"r.$c"))),
      s"$name+${other.name}")
  }

  /** Backward as-of join (beyond the reference — SURVEY.md §2.3 lists
    * temporal joins as absent there): for each left row, the single right
    * row with the greatest `rightTime` <= `leftTime` within the same key;
    * unmatched left rows keep nulls (LEFT semantics). Right columns are
    * prefixed with `rightPrefix`.
    *
    * Implementation is the union-window pattern: tag and interleave both
    * sides, sort by (time, tag) within each key partition, and carry the
    * last non-null right struct forward. One shuffle on the key, no
    * range-explosion join — at scale this is the plan you want for
    * "latest quote at or before each trade". Ties on time match the
    * right row (inclusive), like DuckDB/pandas ASOF. */
  def joinAsOf(other: GTable, leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, rightPrefix: String = "asof_"): GTable = {
    val lSchema = df.schema
    val rSchema = other.df.schema
    val l = df.select(col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__tag"),
      struct(lSchema.fieldNames.map(col).toIndexedSeq: _*).as("__l"),
      lit(null).cast(rSchema).as("__r"))
    // SQL semantics: a NULL key never matches (NULL = NULL is not a
    // match) and a NULL right time never satisfies leftTime >= rightTime
    // — drop such right rows instead of letting the NULLS-FIRST sort
    // carry them forward as spurious "earliest" matches.
    val r = other.df
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__tag"),
        lit(null).cast(lSchema).as("__l"),
        struct(rSchema.fieldNames.map(col).toIndexedSeq: _*).as("__r"))
    // __r as the final sort key: multiple right rows with EQUAL
    // (key, time) would otherwise tie arbitrarily and the carried match
    // could differ between runs — the greatest right struct wins ties,
    // deterministically.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__tag").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val out = matched.select(
      lSchema.fieldNames.map(f => col(s"__l.$f").as(f)).toIndexedSeq ++
        rSchema.fieldNames.map(f => col(s"__m.$f").as(s"$rightPrefix$f")).toIndexedSeq: _*)
    GTable(out, s"$name asof ${other.name}")
  }

  /** Banded range join (beyond the reference): all (left, right) pairs
    * with equal keys and `rightTime` within
    * [`leftTime` − lookback, `leftTime` + lookahead].
    *
    * Scale shape: both sides are bucketed into time bands of width
    * lookback+lookahead; the left side explodes into the (≤2) candidate
    * bands its window can touch, the join is EQUI on (key, band), and the
    * exact range predicate filters after. This keeps the pair generation
    * shuffle-friendly — the naive formulation (non-equi condition only)
    * degenerates to a broadcast-nested-loop/cartesian at scale. Times are
    * compared at microsecond precision. */
  def joinRange(other: GTable, leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      lookbackMicros: Long, lookaheadMicros: Long,
      rightPrefix: String = "r_"): GTable = {
    require(lookbackMicros >= 0 && lookaheadMicros >= 0 &&
      lookbackMicros + lookaheadMicros > 0, "window must be non-empty")
    val band = lookbackMicros + lookaheadMicros
    // exact long floor-division (pmod keeps negatives on the floor side;
    // Column `/` is double division — inexact past 2^53)
    def bandOf(us: Column): Column =
      ((us - pmod(us, lit(band))) / band).cast("long")
    val lUs = unix_micros(col(leftTime))
    val rUs = unix_micros(col(rightTime))
    val l = df.withColumn("__band", explode(sequence(
      bandOf(lUs - lookbackMicros), bandOf(lUs + lookaheadMicros)))).alias("l")
    val r = other.df
      .withColumn("__band", bandOf(rUs)).alias("r")
    val joined = l.join(r,
      col(s"l.$leftKey") === col(s"r.$rightKey") &&
        col("l.__band") === col("r.__band") &&
        unix_micros(col(s"r.$rightTime"))
          .between(unix_micros(col(s"l.$leftTime")) - lookbackMicros,
            unix_micros(col(s"l.$leftTime")) + lookaheadMicros))
    val out = joined.select(
      df.columns.map(f => col(s"l.$f").as(f)).toIndexedSeq ++
        other.df.columns.map(f => col(s"r.$f").as(s"$rightPrefix$f")).toIndexedSeq: _*)
    GTable(out, s"$name range ${other.name}")
  }

  /** Skew-safe equi-join: the big (this) side gets a deterministic per-row
    * salt, the small side is replicated `salt` ways, and the join key
    * becomes (keys, salt) — a hot key's rows spread over `salt` reducers
    * instead of one straggler. Use when a key's row count ≫ the average
    * and the small side is too big to broadcast outright; AQE skew-join
    * handles moderate skew, salting handles the pathological tail.
    * Row-identical duplicates share a salt (hash of the whole row), which
    * preserves bag semantics and determinism. */
  def joinSalted(other: GTable, salt: Int, pairs: (String, String)*): GTable = {
    require(salt > 1, "salt must be > 1")
    val l = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salt)))
      .alias("l")
    val r = other.df.withColumn("__salt",
        explode(sequence(lit(0L), lit(salt - 1L))))
      .alias("r")
    val cond = (pairs.map { case (a, b) => col(s"l.$a") === col(s"r.$b") } :+
      (col("l.__salt") === col("r.__salt"))).reduce(_ && _)
    val dupRight = pairs.collect { case (a, b) if a == b => b }
    val joined = dupRight.foldLeft(l.join(r, cond))((d, c) => d.drop(col(s"r.$c")))
    GTable(joined.drop(col("l.__salt")).drop(col("r.__salt")),
      s"$name+${other.name}")
  }

  /** Reference `join_on` + `+` composition sugar (littletable.py:2711-2722). */
  def joinOn(attr: String): JoinTerm = JoinTerm(this, attr)

  // ------------------------------------------------------------------
  // Grouping / aggregation (littletable.py:3546-3614)
  // ------------------------------------------------------------------

  /** Hash-group with named summary expressions (reference
    * `groupby_with_summaries`, littletable.py:3546-3580). Spark's partial
    * (map-side) aggregation applies automatically. */
  def groupbyWithSummaries(keys: Seq[String], summaries: (String, Column)*): GTable =
    copy(df = df.groupBy(keys.map(col): _*)
      .agg(summaries.head._2.as(summaries.head._1),
           summaries.tail.map { case (n, e) => e.as(n) }: _*)
      .orderBy(keys.map(col): _*),
      sortKeys = keys.map(k => SortKey(col(k))))

  /** Reference `groupby` has itertools.groupby CONSECUTIVE-RUN semantics
    * (one group per run of equal keys in table order —
    * unit_tests.py:1950-1954). Faithful distributed version: run-id =
    * cumulative count of key changes in the established order, then group
    * by (runId, key). Returns the table with a `__run` id column appended;
    * aggregate over it as needed. Requires orderby first. */
  def groupbyRuns(keyCol: String): GTable = {
    require(sortKeys.nonEmpty, "groupbyRuns requires orderby first (run semantics are order-defined)")
    // Scale shape: runs are a sequential notion, but they stitch across
    // partitions from per-partition stats alone — see Ordinals.withRunId
    // (range-partition sort + tiny stats job + emit pass; no window, no
    // single-partition exchange).
    copy(df = Ordinals.withRunId(df, sortKeys, keyCol))
  }

  /** Reference `table.pivot(attrs)` → pivot-table tree (littletable.py:
    * 2724-2742): 1-3 attributes, space-delimited string or varargs. See
    * [[PivotTable]] for the key-lattice semantics, `summary` (flat
    * `as_table` shape), `dumpCounts`, `dump`, and `summarize().asHtml`. */
  def pivot(attrs: String*): PivotTable =
    new PivotTable(this, attrs.flatMap(_.split("\\s+")).filter(_.nonEmpty))

  /** Pivot / cross-tab (reference `pivot().dump_counts` etc.,
    * littletable.py:4395-4508). Explicit pivot values keep the plan to one
    * pass and make output columns deterministic. */
  def pivotCounts(rowKey: String, colKey: String, colValues: Seq[Any]): GTable =
    copy(df = df.groupBy(col(rowKey)).pivot(colKey, colValues).count()
      // fill only the pivot cells — a NULL row-key group must not be
      // rewritten to 0 (it would conflate with a real 0 group)
      .na.fill(0, colValues.map(_.toString))
      .orderBy(col(rowKey)), sortKeys = Seq(SortKey(col(rowKey))))

  def pivotAgg(rowKey: String, colKey: String, colValues: Seq[Any], agg: Column): GTable =
    copy(df = df.groupBy(col(rowKey)).pivot(colKey, colValues).agg(agg)
      .orderBy(col(rowKey)), sortKeys = Seq(SortKey(col(rowKey))))

  /** Cross-tab with row and column totals (reference
    * `pivot().dump_counts` margins, littletable.py:4395-4454): one
    * `cube(rowKey)` pass — the ALL row arrives from the same shuffle as
    * the groups, no second aggregation over the data. */
  def pivotCountsWithTotals(rowKey: String, colKey: String,
      colValues: Seq[Any], totalLabel: String = "ALL"): GTable = {
    // cube().pivot() is unsupported; conditional counts are the same
    // one-pass plan (partial aggregation per (rowKey, grouping) pair).
    // grouping() (not null-coalescing) labels the total row, so a real
    // NULL-valued group is never conflated with the grand total.
    val cells = colValues.map(v =>
      count(when(col(colKey) === lit(v), 1)).as(v.toString))
    val cubed = df.cube(col(rowKey))
      .agg(grouping(col(rowKey)).as("__is_total"), cells: _*)
      .withColumn(rowKey,
        when(col("__is_total") === 1, lit(totalLabel)).otherwise(col(rowKey).cast("string")))
      .withColumn("row_total", colValues.map(v => col(s"`${v.toString}`")).reduce(_ + _))
    copy(df = cubed.orderBy(col("__is_total"), col(rowKey)).drop("__is_total"),
      sortKeys = Nil)
  }

  /** Per-numeric-field statistics (reference `stats`,
    * littletable.py:3832-3915): mean, median (exact), min, max, variance,
    * stdev, count, missing. One wide aggregate — single pass. */
  def stats(fields: Seq[String]): GTable = {
    val aggs = fields.flatMap { f =>
      val c = col(f)
      Seq(
        avg(c).as(s"${f}_mean"),
        median(c).as(s"${f}_median"),
        min(c).as(s"${f}_min"),
        max(c).as(s"${f}_max"),
        var_samp(c).as(s"${f}_variance"),
        stddev_samp(c).as(s"${f}_stdev"),
        count(c).as(s"${f}_count"),
        (count(lit(1)) - count(c)).as(s"${f}_missing"))
    }
    copy(df = df.agg(aggs.head, aggs.tail: _*))
  }

  /** Reference-shaped `stats` (littletable.py:3832-3915): by default one
    * row per field with stat columns (`by_field=True`); `byField=false`
    * transposes to one row per stat with a column per field. Same single
    * distributed aggregate as [[stats]]; the reshape is a constant-size
    * driver step (8 × |fields| values). */
  def statsTable(fields: Seq[String], byField: Boolean = true,
      rounded: Boolean = false): GTable = {
    val statNames = Seq("mean", "median", "min", "max", "variance", "stdev", "count", "missing")
    // Tolerate non-numeric fields like the reference's stats(), which only
    // accumulates values that are numbers (littletable.py:3832-3915):
    // string/timestamp fields are skipped, not errors.
    val numFields = {
      val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
      fields.filter(f => types.get(f).exists {
        case _: org.apache.spark.sql.types.NumericType => true
        case _ => false
      })
    }
    require(numFields.nonEmpty, s"stats: no numeric fields among ${fields.mkString(",")}")
    val row = stats(numFields).df.head()
    val spark = df.sparkSession
    import spark.implicits._
    def asDouble(v: Any): Double = v match {
      case null => Double.NaN
      case n: java.lang.Number => n.doubleValue()
      case other => other.toString.toDouble
    }
    // Reference display rounding (littletable.py:3881-3890): mean/median/
    // variance/stdev with |v| > 1 round to max(4 − digits-left-of-point, 0)
    // decimals (1234.5678 → 1235.0, 12.34567 → 12.35); |v| ≤ 1 stays
    // exact. Python round is banker's — HALF_EVEN. Opt-in: exact values
    // are the default.
    def magRound(v: Double): Double =
      if (!rounded || v.isNaN || v.isInfinite || v == 0.0 || math.abs(v) <= 1) v
      else {
        val mag = math.log10(math.abs(v)).toInt + 1
        val decimals = math.max(4 - mag, 0)
        BigDecimal(v).setScale(decimals, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      }
    val roundedStats = Set("mean", "median", "variance", "stdev")
    val values: Map[(String, String), Double] = (for {
      (f, fi) <- numFields.zipWithIndex
      (s, si) <- statNames.zipWithIndex
    } yield {
      val v = asDouble(row.get(fi * statNames.length + si))
      (f, s) -> (if (roundedStats(s)) magRound(v) else v)
    }).toMap
    // count/missing are exact longs straight from the row (no double trip)
    val longs: Map[(String, String), Long] = (for {
      (f, fi) <- numFields.zipWithIndex
      (s, si) <- statNames.zipWithIndex if s == "count" || s == "missing"
    } yield (f, s) -> row.getLong(fi * statNames.length + si)).toMap
    if (byField) {
      val out = numFields.map(f => (f, values(f -> "mean"), values(f -> "median"),
        values(f -> "min"), values(f -> "max"), values(f -> "variance"),
        values(f -> "stdev"), longs(f -> "count"), longs(f -> "missing")))
        .toDF("name" +: statNames: _*)
      copy(df = out, sortKeys = Nil)
    } else {
      val rows = statNames.map(s => org.apache.spark.sql.Row.fromSeq(
        s +: numFields.map(f => values(f -> s))))
      val schema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("stat",
          org.apache.spark.sql.types.StringType, nullable = false) +:
          numFields.map(f => org.apache.spark.sql.types.StructField(f,
            org.apache.spark.sql.types.DoubleType)))
      copy(df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema), sortKeys = Nil)
    }
  }

  /** Data-profiling report (beyond the reference; the `info()`-adjacent
    * operational need): one row per field with row/null/distinct counts
    * and min/max (rendered as strings, aggregated natively first so
    * numeric ordering is preserved). ONE wide aggregate over the table —
    * per-field work shares the single pass, and the one-row result
    * reshapes to rows in-plan (same shape as the curation funnel). Note
    * `count_distinct` is exact (a shuffle per field under the hood at
    * scale); use [[approxQuantiles]]/`approx_count_distinct` flavors for
    * profiling 100 TB interactively. */
  def profile(fields: Seq[String] = columns): GTable = {
    require(fields.nonEmpty, "profile needs at least one field")
    val aggs = count(lit(1)).cast("long").as("__total") +: fields.flatMap { f =>
      Seq(count(col(f)).cast("long").as(s"${f}__n"),
        count_distinct(col(f)).cast("long").as(s"${f}__distinct"),
        min(col(f)).cast("string").as(s"${f}__min"),
        max(col(f)).cast("string").as(s"${f}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val structs = fields.map(f => struct(lit(f).as("field"),
      col("__total").as("n_rows"),
      (col("__total") - col(s"${f}__n")).as("n_null"),
      col(s"${f}__distinct").as("n_distinct"),
      col(s"${f}__min").as("min_value"),
      col(s"${f}__max").as("max_value")))
    copy(df = one.select(explode(array(structs: _*)).as("p")).select(col("p.*")),
      name = s"${name}_profile", sortKeys = Nil)
  }

  /** Stratified sample (beyond the reference — training-data pipelines
    * rebalance classes/languages/sources this way): per-stratum keep
    * fractions, seeded and deterministic, one scan, no shuffle
    * (Bernoulli per row). Absent keys are dropped. */
  def sampleStratified(stratumCol: String, fractions: Map[Any, Double],
      seed: Long = 42L): GTable =
    copy(df = df.stat.sampleBy(col(stratumCol), fractions, seed))

  /** Approximate quantiles per numeric field (Greenwald-Khanna sketch —
    * single pass, mergeable, the profiling companion to [[stats]]). */
  def approxQuantiles(fields: Seq[String], probs: Seq[Double],
      relErr: Double = 0.01): Map[String, Seq[Double]] =
    fields.zip(df.stat.approxQuantile(fields.toArray, probs.toArray, relErr)
      .map(_.toSeq)).toMap

  /** Column-as-values accessor (reference `tbl.all.attr`,
    * littletable.py:605-634). */
  def all(attr: String): DataFrame = df.select(col(attr))
  def allUnique(attr: String): DataFrame = df.select(col(attr)).distinct()

  // ------------------------------------------------------------------
  // Keyed access & constraints (reference indexes, littletable.py:424-602)
  // ------------------------------------------------------------------

  /** Unique-keyed access `tbl.by.attr[key]` → exactly one row;
    * NoSuchElementException if absent, IllegalStateException if duplicated
    * (reference unique-index semantics, littletable.py:590-597). The
    * equality predicate pushes to the scan (min-max/dictionary pruning
    * play the index role distributedly). */
  def byUnique(attr: String, key: Any): Row = {
    // null-safe (<=>) like whereEq: a None key is an ordinary key in the
    // reference's indexes
    val rows = df.filter(col(attr) <=> lit(key)).limit(2).collect()
    if (rows.isEmpty) throw new NoSuchElementException(s"$name.$attr = $key: no row")
    if (rows.length > 1) throw new IllegalStateException(s"$name.$attr = $key: not unique")
    rows.head
  }

  /** Non-unique keyed access `tbl.by.attr[key]` → sub-table, possibly
    * empty (littletable.py:565-572). Null-safe like [[whereEq]]. */
  def byAll(attr: String, key: Any): GTable =
    copy(df = df.filter(col(attr) <=> lit(key)))

  /** Unique-key constraint validation (the semantic core of the
    * reference's unique indexes, littletable.py:1981-2009): returns the
    * violating keys with their multiplicities — empty means the constraint
    * holds. `acceptNone=false` also reports null keys (reference
    * accept_none). */
  def checkUnique(attr: String, acceptNone: Boolean = false): DataFrame = {
    val grouped = df.groupBy(col(attr)).agg(count(lit(1)).as("n"))
    if (acceptNone) grouped.filter(col("n") > 1 && col(attr).isNotNull)
    // accept_none=False: ANY null key violates, even a single one
    else grouped.filter(col("n") > 1 || col(attr).isNull)
  }

  // ------------------------------------------------------------------
  // Lifecycle (reference clone/clear/copy_template/insert,
  // littletable.py:1445-1520 — immutable flavors)
  // ------------------------------------------------------------------

  /** Reference `clone()` — with immutable plans this is the same table,
    * optionally re-named. */
  def cloneTable(newName: String = name): GTable = copy(name = newName)

  /** Reference `clear()`: empty table, same schema. */
  def clear: GTable = copy(df = df.limit(0), sortKeys = Nil)

  /** Reference `copy_template()`: empty table with this table's schema. */
  def copyTemplate(newName: String = name): GTable =
    copy(df = df.limit(0), name = newName, sortKeys = Nil)

  /** Reference `insert`/`insert_many` — immutable flavor: bag-union the
    * new rows (heterogeneous columns null-fill, like `union`). */
  def insert(rows: DataFrame): GTable = union(GTable(rows))

  /** Reference `create_index(attr, unique=True)` constraint semantics:
    * eagerly validates uniqueness (and non-nullness unless `acceptNone`)
    * and returns this table, or throws like the reference's KeyError on
    * a duplicate. The lookup-acceleration role of the reference's
    * indexes is played by Catalyst pushdown + min-max/dictionary pruning
    * — see [[byUnique]]/[[byAll]]. */
  def withUniqueIndex(attr: String, acceptNone: Boolean = false): GTable = {
    val bad = checkUnique(attr, acceptNone).limit(1).collect()
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"unique index on $name.$attr violated: key=${bad.head.get(0)}")
    this
  }

  /** Typed view (reference `Table[T]`/row_class → `Dataset[T]`,
    * SURVEY.md §1.2). */
  def typed[T: org.apache.spark.sql.Encoder]: org.apache.spark.sql.Dataset[T] = df.as[T]

  /** Reference `info()` (littletable.py:3797-3814): name/fields/len plus
    * import provenance (source type, source, last_import) and creation
    * time. `modified` equals `created` — tables are immutable here, every
    * mutation returns a new table. */
  def info: Map[String, Any] = Map(
    "name" -> name,
    "fields" -> columns,
    "len" -> size,
    "source_type" -> meta.sourceType,
    "source" -> meta.source,
    "last_import" -> meta.importTime,
    "created" -> createdAt,
    "modified" -> createdAt)

  // ------------------------------------------------------------------
  // Rendering (reference present/as_markdown/as_html; collect-at-edge only)
  // ------------------------------------------------------------------

  /** Console presentation (reference `present` → rich table,
    * littletable.py:3952-4036): boxed ASCII grid titled with the table
    * name, lowercase field names title-cased for headers, numeric
    * columns right-justified, all-single-char columns centered, and
    * `groupby` value suppression. Collect-at-edge: renders `n` rows. */
  def present(n: Int = 20, groupby: Seq[String] = Nil): Unit =
    println(presentText(n, groupby))

  /** The string [[present]] prints. */
  def presentText(n: Int = 1000, groupby: Seq[String] = Nil,
      formats: Map[String, Any => String] = Map.empty): String =
    Render.text(sorted, n, name, groupby, formats)

  /** Markdown table with numeric right-alignment (reference `as_markdown`,
    * littletable.py:4159-4271). Edge rendering: collects `n` rows only.
    * `formats` maps field names to value formatters (the reference's
    * per-field format strings/callables). */
  def asMarkdown(n: Int = 1000, groupby: Seq[String] = Nil,
      formats: Map[String, Any => String] = Map.empty): String =
    Render.markdown(sorted, n, groupby, formats)

  /** HTML table (reference `as_html`, littletable.py:4071-4157).
    * `formats` = per-field value formatters; `tableProperties` = extra
    * attributes on the `<table>` tag (reference table_properties). */
  def asHtml(n: Int = 1000, groupby: Seq[String] = Nil,
      formats: Map[String, Any => String] = Map.empty,
      tableProperties: Map[String, String] = Map.empty): String =
    Render.html(sorted, n, groupby, formats, tableProperties)
}

/** Reference `join_on`/`+` chain builder (littletable.py:4602-4683):
  * `t1.joinOn("a") + t2.joinOn("b") + t3.joinOn("c")` then `.apply()`. */
final case class JoinTerm(table: GTable, attr: String, prev: Option[JoinTerm] = None) {
  /** Chain composition. Attaches this chain at the ROOT of `other`'s
    * prev-chain (not at its head), so right-associated groupings like
    * `t1.joinOn(a) + (t2.joinOn(b) + t3.joinOn(c))` keep every table. */
  def +(other: JoinTerm): JoinTerm = other.prev match {
    case None => other.copy(prev = Some(this))
    case Some(p) => other.copy(prev = Some(this + p))
  }
  def apply(): GTable = prev match {
    case None => table
    case Some(p) =>
      val left = p.apply()
      left.join(table, p.attr -> attr)
  }
}

/** Shared HTML text/attribute escaping — single definition so escaping
  * fixes apply to every renderer at once (used by [[Render]] and
  * [[PivotSummary]]; Excel's XML writer has its own XML-context rules). */
object Html {
  def escape(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
    .replace(">", "&gt;").replace("\"", "&quot;")
}

private[core] object Render {
  import org.apache.spark.sql.types._

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Blank out repeated values in the `groupby` leading columns — the
    * reference's group-suppressed display columns
    * (littletable.py:1085-1089, 4024-4034, 4141-4148, 4256-4263): a cell
    * is suppressed when every groupby cell to its left (inclusive) equals
    * the previous row's. Display-layer only. */
  private def suppress(schema: org.apache.spark.sql.types.StructType,
      rows: Array[org.apache.spark.sql.Row], groupby: Seq[String]): Array[Array[Option[Any]]] = {
    val gIdx = groupby.map(schema.fieldIndex)
    var prev: Option[org.apache.spark.sql.Row] = None
    rows.map { r =>
      val cells = Array.tabulate[Option[Any]](schema.length)(i => Option(r.get(i)))
      prev.foreach { p =>
        var i = 0
        var stillEqual = true
        while (i < gIdx.length && stillEqual) {
          val gi = gIdx(i)
          if (p.get(gi) == r.get(gi)) cells(gi) = None else stillEqual = false
          i += 1
        }
      }
      prev = Some(r)
      cells
    }
  }

  private def fmt(formats: Map[String, Any => String], field: String, v: Any): String =
    formats.get(field).map(_(v)).getOrElse(v.toString)

  /** Boxed ASCII console table — the reference's rich-table presentation
    * rules (littletable.py:3965-4036): header = title-cased field name
    * when the name is all-lowercase (verbatim otherwise), numeric columns
    * right-justified, columns whose every non-null value is a single
    * character centered, group-suppressed `groupby` columns, table name
    * centered above the box. */
  def text(df: DataFrame, n: Int, title: String, groupby: Seq[String] = Nil,
      formats: Map[String, Any => String] = Map.empty): String = {
    val schema = df.schema
    val cells = suppress(schema, df.limit(n).collect(), groupby)
    val headers: Array[String] = schema.fields.map { f =>
      val nm = f.name
      if (nm.exists(_.isLetter) && !nm.exists(_.isUpper))
        nm.split('_').map(w => if (w.isEmpty) w else w.head.toUpper +: w.tail).mkString(" ")
      else nm
    }
    val body: Array[Array[String]] = cells.map(r => Array.tabulate(schema.length)(i =>
      r(i).map(fmt(formats, schema.fields(i).name, _)).getOrElse("")))
    val just: Array[Char] = Array.tabulate(schema.length) { i =>
      if (isNumeric(schema.fields(i).dataType)) 'r'
      else {
        val vs = body.map(_(i)).filter(_.nonEmpty)
        if (vs.nonEmpty && vs.forall(_.length <= 1)) 'c' else 'l'
      }
    }
    val widths = Array.tabulate(schema.length)(i =>
      body.foldLeft(headers(i).length)((m, r) => math.max(m, r(i).length)))
    def pad(s: String, w: Int, j: Char): String = j match {
      case 'r' => " " * (w - s.length) + s
      case 'c' =>
        val left = (w - s.length) / 2
        " " * left + s + " " * (w - s.length - left)
      case _ => s + " " * (w - s.length)
    }
    val border = widths.map(w => "-" * (w + 2)).mkString("+", "+", "+")
    def row(vals: Array[String]): String =
      vals.indices.map(i => " " + pad(vals(i), widths(i), just(i)) + " ")
        .mkString("|", "|", "|")
    val titleLines =
      if (title == null || title.isEmpty) Nil
      else Seq(" " * math.max(0, (border.length - title.length) / 2) + title)
    (titleLines ++ Seq(border, row(headers), border) ++
      body.map(row) ++ Seq(border)).mkString("\n")
  }

  def markdown(df: DataFrame, n: Int, groupby: Seq[String] = Nil,
      formats: Map[String, Any => String] = Map.empty): String = {
    val schema = df.schema
    val cells = suppress(schema, df.limit(n).collect(), groupby)
    val header = schema.fields.map(_.name).mkString("| ", " | ", " |")
    val aligns = schema.fields.map(f =>
      if (isNumeric(f.dataType)) "---:" else if (f.dataType == BooleanType) ":---:" else "---")
      .mkString("| ", " | ", " |")
    val body = cells.map(r => schema.fields.indices.map(i =>
      r(i).map(fmt(formats, schema.fields(i).name, _)).getOrElse(""))
      .mkString("| ", " | ", " |"))
    (Seq(header, aligns) ++ body).mkString("\n")
  }

  def html(df: DataFrame, n: Int, groupby: Seq[String] = Nil,
      formats: Map[String, Any => String] = Map.empty,
      tableProperties: Map[String, String] = Map.empty): String = {
    val schema = df.schema
    val cells = suppress(schema, df.limit(n).collect(), groupby)
    def esc(s: String) = Html.escape(s)
    val props = tableProperties.map { case (k, v) => s""" $k="${esc(v)}"""" }.mkString
    val head = schema.fields.map(f => s"<th>${esc(f.name)}</th>").mkString
    val body = cells.map { r =>
      schema.fields.indices.map { i =>
        val v = r(i).map(x => esc(fmt(formats, schema.fields(i).name, x))).getOrElse("")
        val align = if (isNumeric(schema.fields(i).dataType)) " style=\"text-align:right\"" else ""
        s"<td$align>$v</td>"
      }.mkString("<tr>", "", "</tr>")
    }.mkString
    s"<table$props><thead><tr>$head</tr></thead><tbody>$body</tbody></table>"
  }
}
