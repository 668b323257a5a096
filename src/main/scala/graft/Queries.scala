package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Cmp, GTable, SortKey}

/** The correctness-gate query inventory: one entry per operator from
  * SURVEY.md §2, each paired with ANSI SQL that DuckDB runs on the same
  * parquet tables (driver gate — see BASELINE.md).
  *
  * Parity conventions (Spark vs DuckDB):
  *   - every computed column aliased identically on both sides;
  *   - every query deterministically ordered (total order incl. tiebreaker);
  *   - double aggregates rounded identically on both sides (sum→2, avg→4);
  *   - timestamps rendered as strings when they appear in output;
  *   - ORDER BY on nullable keys carries explicit NULLS FIRST (Spark ASC
  *     default) since DuckDB defaults to NULLS LAST;
  *   - no sum() over INTEGER in DuckDB without an OUTER CAST on the sum
  *     itself — including window sums (DuckDB sum(BIGINT) → HUGEINT →
  *     Arrow decimal128(38,0), which the driver's type-sensitive hash
  *     rejects against Spark's int64 even when values are equal; this was
  *     q_pack_index's three-round hash-red). Enforced by OracleHygieneSpec
  *     and tools/check.py's TYPE-MISMATCH gate.
  */
/** Typed row for the `Dataset[T]` query path (reference `Table[T]` with a
  * row_class, littletable.py:1480-1493 → case-class Encoder). */
case class LineitemSlim(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

object Queries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): GTable =
    GTable(s.read.parquet(s"$dir/$name.parquet"), name)

  /** Warehouse table name for a persisted serving artifact built from
    * `$dir/$source.parquet`: the source file's mtime is folded in, so a
    * driver-regenerated corpus (the r7 events precedent — same path, new
    * bytes) can never serve a stale index against an oracle computed on
    * the CURRENT data. The warehouse survives JVMs AND testdata
    * regenerations; path-only keying is a delayed-action hash mismatch.
    *
    * SUPERSEDED generations are pruned on naming: any warehouse entry
    * sharing this artifact's `<prefix><dir>_m` base but carrying a
    * different mtime (including its `_meta`/`_stats`/`_t<k>`/… side
    * tables, which embed the same base) is dropped from the catalog and
    * deleted — without this, every regeneration would orphan a full
    * index generation on disk forever. */
  private def artifactTable(s: SparkSession, prefix: String, dir: String,
      source: String): String = {
    val mtime = new java.io.File(s"$dir/$source.parquet").lastModified
    val base = (prefix + dir).replaceAll("[^A-Za-z0-9]+", "_")
    val name = base + "_m" + mtime
    // boundary-anchored membership: `n` belongs to a family iff it IS
    // the family name or extends it across a `_` boundary. A bare
    // startsWith would (a) let a sibling data dir whose sanitized name
    // extends this one (sf0_1 vs sf0_1b) get its LIVE artifacts pruned
    // by runs at the shorter dir, and (b) protect a stale generation
    // whose mtime digit-extends the current one (_m123 vs _m1234)
    def inFamily(n: String, fam: String): Boolean =
      n == fam || n.startsWith(fam + "_")
    // Hadoop FS, not java.io.File: a non-local warehouse (hdfs://,
    // s3a://) would make File.listFiles() return null and silently
    // skip pruning forever (Sources.replaceTable uses the same API)
    val warehouse = s.conf.get("spark.sql.warehouse.dir")
    val wPath = new org.apache.hadoop.fs.Path(warehouse)
    val fs = wPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val entries =
      if (fs.exists(wPath)) fs.listStatus(wPath).map(_.getPath.getName)
      else Array.empty[String]
    entries
      .filter(n => inFamily(n, base) && !inFamily(n, name))
      .foreach(n => graft.sources.Sources.replaceTable(s, n))
    name
  }

  /** Fixed (per-SF-dir) warehouse name + source fingerprint for the
    * `*IndexFor` build-once gates — the LIBRARY-level staleness
    * mechanism (round 12): the helper itself rebuilds when the stamped
    * fingerprint of `$dir/$source.parquet` changes, so these gates no
    * longer need mtime-keyed NAMES, and a driver-regenerated corpus
    * rebuilds IN PLACE instead of orphaning a generation per mtime.
    * One-time hygiene: this family's pre-round-12 mtime-keyed
    * `<base>_m<digits>…` generations (and their side tables) are pruned
    * from the warehouse. The `onceUpserted` gates stay on
    * [[artifactTable]]: their build is a multi-step admission sequence
    * the marker table keys by generation name. */
  private def fingerprintedArtifact(s: SparkSession, prefix: String,
      dir: String, source: String): (String, String) = {
    val base = (prefix + dir).replaceAll("[^A-Za-z0-9]+", "_")
    // the legacy-generation prune is one-time hygiene — run it once per
    // (session, family), not on every serving call (a warehouse listing
    // per gate per bench run is measurable)
    if (prunedFamilies.add(base)) {
      val warehouse = s.conf.get("spark.sql.warehouse.dir")
      val wPath = new org.apache.hadoop.fs.Path(warehouse)
      val fs = wPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      val mkeyed = ("^" + java.util.regex.Pattern.quote(base) + "_m\\d+(_.*)?$").r
      if (fs.exists(wPath))
        fs.listStatus(wPath).map(_.getPath.getName)
          .filter(n => mkeyed.matches(n))
          .foreach(n => graft.sources.Sources.replaceTable(s, n))
    }
    (base, graft.sources.Sources.pathFingerprint(s, s"$dir/$source.parquet"))
  }
  private val prunedFamilies =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The events table's `ts` encoding varies by writer — TIMESTAMP(NANOS)
    * (readable only as long under the legacy conf), timestamp[us]
    * (TIMESTAMP_NTZ), or TIMESTAMP. Normalize whatever arrives to a
    * canonical µs TimestampType; see [[graft.sources.EventTime]]. */
  private def events(s: SparkSession, dir: String): GTable = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    GTable(graft.sources.EventTime.normalizeTs(raw), "events")
  }

  // ==================================================================
  // §2.5 Aggregations / grouping / pivot / stats
  // ==================================================================

  /** TPC-H-Q1-style pricing summary — groupbyWithSummaries (reference
    * groupby_with_summaries, littletable.py:3546-3580). */
  val q1_agg: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupbyWithSummaries(
        Seq("l_returnflag", "l_linestatus"),
        "sum_qty" -> round(sum(col("l_quantity")), 2),
        "sum_base_price" -> round(sum(col("l_extendedprice")), 2),
        "sum_disc_price" -> round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2),
        "sum_charge" -> round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2),
        "avg_qty" -> round(avg(col("l_quantity")), 4),
        "avg_price" -> round(avg(col("l_extendedprice")), 4),
        "avg_disc" -> round(avg(col("l_discount")), 4),
        "count_order" -> count(lit(1))).df

  /** Per-group named summaries over a join key (groupby_with_summaries). */
  val q_groupby_summaries: Q = (s, dir) =>
    t(s, dir, "customer")
      .groupbyWithSummaries(
        Seq("c_nationkey"),
        "n_customers" -> count(lit(1)),
        "avg_acctbal" -> round(avg(col("c_acctbal")), 4),
        "max_acctbal" -> round(max(col("c_acctbal")), 2),
        "first_name" -> min(col("c_name"))).df

  /** Pivot cross-tab with explicit values (reference pivot().dump_counts,
    * littletable.py:4395-4454): one shuffle, deterministic columns. */
  val q_pivot_counts: Q = (s, dir) =>
    t(s, dir, "orders")
      .pivotCounts("o_orderpriority", "o_orderstatus", Seq("F", "O", "P")).df

  /** Cross-tab with row/column totals (pivot().dump_counts margins,
    * littletable.py:4395-4454) — one cube pass. */
  val q_pivot_totals: Q = (s, dir) =>
    t(s, dir, "orders")
      .pivotCountsWithTotals("o_orderpriority", "o_orderstatus", Seq("F", "O", "P")).df

  /** Pivot with a value aggregate per cell (pivot().as_table(sum, col)). */
  val q_pivot_sum: Q = (s, dir) =>
    t(s, dir, "orders")
      .pivotAgg("o_orderpriority", "o_orderstatus", Seq("F", "O", "P"),
        round(sum(col("o_totalprice")), 2))
      .df.na.fill(0.0)

  /** 3-attribute pivot tree, flat `as_table` shape (reference
    * littletable.py:2724-2742 + 4457-4505): key-lattice rows — level-1/2
    * keys global, level-3 keys per level-1 branch — with zero-filled
    * empty cells. One aggregation pass + broadcast key joins. */
  val q_pivot_3level: Q = (s, dir) =>
    t(s, dir, "orders")
      .computeField("o_year", year(col("o_orderdate")).cast("long"))
      .pivot("o_orderstatus", "o_orderpriority", "o_year")
      .summary().df

  /** Data-profiling report: per-field row/null/distinct counts and
    * native-ordered min/max, all from ONE wide aggregate. */
  val q_profile: Q = (s, dir) =>
    t(s, dir, "customer")
      .profile(Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"))
      .df.orderBy(col("field"))

  /** Reference stats(): mean/median/min/max/variance/stdev/count/missing
    * (littletable.py:3832-3915) — one single-pass wide aggregate. */
  val q_stats: Q = (s, dir) =>
    t(s, dir, "lineitem").stats(Seq("l_quantity", "l_extendedprice", "l_discount"))
      .select(
        round(col("l_quantity_mean"), 4).as("q_mean"),
        round(col("l_quantity_median"), 4).as("q_median"),
        round(col("l_quantity_min"), 2).as("q_min"),
        round(col("l_quantity_max"), 2).as("q_max"),
        round(col("l_quantity_variance"), 4).as("q_var"),
        round(col("l_quantity_stdev"), 4).as("q_std"),
        col("l_quantity_count").as("q_count"),
        col("l_quantity_missing").as("q_missing"),
        round(col("l_extendedprice_mean"), 4).as("p_mean"),
        round(col("l_extendedprice_median"), 4).as("p_median"),
        round(col("l_discount_mean"), 6).as("d_mean"),
        round(col("l_discount_stdev"), 6).as("d_std")).df

  /** Beyond-reference: ROLLUP with grouping id (free on Spark; SURVEY §2.5
    * notes the reference lacks grouping sets). */
  val q_rollup: Q = (s, dir) =>
    t(s, dir, "orders").df
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"),
           count(lit(1)).as("n"),
           grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
               col("o_orderstatus").asc_nulls_first)

  /** Beyond-reference: CUBE over lineitem flags. */
  val q_cube: Q = (s, dir) =>
    t(s, dir, "lineitem").df
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
           count(lit(1)).as("n"),
           grouping_id().cast("int").as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)

  /** Reference groupby() run-semantics (consecutive runs of equal keys in
    * table order — unit_tests.py:1950-1954): run-id via ordered window,
    * then per-flag run statistics. */
  val q_groupby_runs: Q = (s, dir) => {
    val runs = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      .orderby("l_orderkey, l_linenumber, l_returnflag")
      .groupbyRuns("l_returnflag").df
    runs.groupBy(col("__run").as("run_id"))
      .agg(min(col("l_returnflag")).as("flag"), count(lit(1)).as("run_len"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n_runs"),
           sum(col("run_len")).as("total_rows"),
           max(col("run_len")).as("max_run"))
      .orderBy(col("flag"))
  }

  // ==================================================================
  // §2.2 Projections / filters / predicates
  // ==================================================================

  /** Comparator DSL conjunction (reference where(**kwargs) with
    * lt/within/in_range/is_in/startswith — littletable.py:998-1139). */
  val q_where_comparators: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .where(
        "l_quantity" -> Cmp.within(10, 20),
        "l_discount" -> Cmp.inRange(0.02, 0.08),
        "l_returnflag" -> Cmp.isIn("A", "R"),
        "l_shipdate" -> Cmp.ge(lit("1996-01-01").cast("timestamp")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
              col("l_discount"), col("l_returnflag"))
      .orderby("l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag")
      .df

  /** select with computed columns (reference select(name=template) /
    * compute_field — string template + arithmetic). */
  val q_select_computed: Q = (s, dir) =>
    t(s, dir, "orders")
      .computeField("pri_status", format_string("%s/%s", col("o_orderpriority"), col("o_orderstatus")))
      .computeField("fee", col("o_totalprice") * 0.1)
      .select(col("o_orderkey"), col("pri_status"), col("fee"))
      .orderby(SortKey.asc("o_orderkey"))
      .df

  /** delete(**kwargs) → anti-filter (littletable.py:2167-2182). */
  val q_delete: Q = (s, dir) =>
    t(s, dir, "orders")
      .delete(col("o_orderstatus") === "F")
      .groupbyWithSummaries(Seq("o_orderpriority"),
        "n" -> count(lit(1)),
        "total" -> round(sum(col("o_totalprice")), 2)).df

  /** splitby (littletable.py:3630-3771) — matching half, aggregated. */
  val q_splitby: Q = (s, dir) => {
    val (_, hi) = t(s, dir, "lineitem").splitby(col("l_discount") > 0.05)
    hi.groupbyWithSummaries(Seq("l_returnflag"),
      "n" -> count(lit(1)),
      "sum_qty" -> round(sum(col("l_quantity")), 2)).df
  }

  /** compute_field with exception→default (littletable.py:3494-3544):
    * try_cast + coalesce — errors become the default, tasks never fail. */
  val q_compute_field: Q = (s, dir) =>
    events(s, dir)
      .computeField("k_val",
        expr("try_cast(get_json_object(props, '$.k') AS INT)"),
        default = Some(lit(-1)))
      .select(col("event_id"), col("event_type"), col("k_val"))
      .orderby(SortKey.asc("event_id"))
      .df

  /** format() row templating (littletable.py:2345-2351). */
  val q_format: Q = (s, dir) =>
    t(s, dir, "nation")
      .formatted("{}: region {}", col("n_name"), col("n_regionkey"))
      .orderby(SortKey.asc("formatted"))
      .df

  // ==================================================================
  // §2.7 Sorts / limits / slices / batching
  // ==================================================================

  /** orderby string-DSL + head (top-k → TakeOrdered physical op). */
  val q_orderby_limit: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderby("l_extendedprice desc, l_orderkey, l_linenumber")
      .head(100)
      .df

  /** tail(n) in established order (littletable.py:3816-3830): inverted
    * TakeOrdered, then restore — no global window. */
  val q_tail: Q = (s, dir) =>
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderby(SortKey.asc("o_orderkey"))
      .tail(50)
      .df

  /** Python-style slice rows [100,200) via scale-safe ordinal. */
  val q_slice: Q = (s, dir) =>
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderby(SortKey.asc("o_orderkey"))
      .slice(100, 200)
      .df

  /** batched(n) pagination (littletable.py:3616-3628) — batch stats. */
  val q_batched: Q = (s, dir) =>
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderby(SortKey.asc("o_orderkey"))
      .batched(1000)
      .groupbyWithSummaries(Seq("batch"),
        "n" -> count(lit(1)),
        "total" -> round(sum(col("o_totalprice")), 2)).df

  /** rank() ordinal in current order (littletable.py:2248-2257) —
    * two-pass zipWithIndex ordinal, not a one-partition window. */
  val q_rank: Q = (s, dir) =>
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
      .orderby("c_acctbal desc, c_custkey")
      .rank("rnk")
      .head(100)
      .df

  // ==================================================================
  // §2.4 Set operations / unique
  // ==================================================================

  /** Bag union `t1 + t2` (littletable.py:1445-1462). */
  val q_union_all: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val urgent = o.whereEq("o_orderpriority" -> "1-URGENT")
    val low = o.whereEq("o_orderpriority" -> "5-LOW")
    (urgent + low)
      .groupbyWithSummaries(Seq("o_orderpriority"),
        "n" -> count(lit(1)),
        "total" -> round(sum(col("o_totalprice")), 2)).df
  }

  /** Beyond-reference: INTERSECT (distinct semantics, both engines). */
  val q_intersect: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    o.whereEq("o_orderstatus" -> "O").select(col("o_custkey"))
      .intersect(o.whereEq("o_orderstatus" -> "F").select(col("o_custkey")))
      .orderby(SortKey.asc("o_custkey")).df
  }

  /** Beyond-reference: EXCEPT (distinct semantics, both engines). */
  val q_except: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    o.whereEq("o_orderstatus" -> "O").select(col("o_custkey"))
      .except(o.whereEq("o_orderstatus" -> "P").select(col("o_custkey")))
      .orderby(SortKey.asc("o_custkey")).df
  }

  /** unique(key) keeping FIRST occurrence in a stated order — the
    * reference's dedup-preserving-order (littletable.py:3773-3795), made
    * deterministic distributedly (per-key row_number, one shuffle). */
  val q_unique_first: Q = (s, dir) =>
    t(s, dir, "orders")
      .unique(Seq("o_custkey"), Seq(col("o_orderkey").asc))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderby(SortKey.asc("o_custkey"))
      .df

  // ==================================================================
  // §2.3 Joins
  // ==================================================================

  /** Inner equi-join with small-side broadcast (reference join with
    * auto-created hash indexes, littletable.py:2353-2507). */
  val q_join_inner: Q = (s, dir) =>
    t(s, dir, "orders")
      .joinBroadcast(t(s, dir, "customer"), "o_custkey" -> "c_custkey")
      .groupbyWithSummaries(Seq("c_custkey", "c_name"),
        "n_orders" -> count(lit(1)),
        "revenue" -> round(sum(col("o_totalprice")), 2)).df

  /** Typed Dataset[T] path (reference typed Table[T] with row_class →
    * `as[T]` with a case-class Encoder): typed filter + typed groupByKey/
    * mapGroups, result re-joined to SQL semantics for the oracle. */
  val q_typed_dataset: Q = (s, dir) => {
    import s.implicits._
    val ds = t(s, dir, "lineitem").df
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .as[LineitemSlim]
    ds.filter((r: LineitemSlim) => r.l_quantity > 30.0)
      .groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        var n = 0L; var q = 0.0
        rows.foreach { r => n += 1; q += r.l_quantity }
        (flag, n, math.round(q * 100) / 100.0)
      }
      .toDF("l_returnflag", "n", "sum_qty")
      .orderBy(col("l_returnflag"))
  }

  /** Backward as-of join: each purchase event matched to the same user's
    * most recent view at or before it (union-window plan, one shuffle on
    * the key). DuckDB's native ASOF LEFT JOIN is the oracle. */
  val q_join_asof: Q = (s, dir) => {
    val ev = events(s, dir)
    val purchases = GTable(ev.df.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "value"), "purchases")
    val views = GTable(ev.df.filter(col("event_type") === "view")
      .select("user_id", "ts", "value"), "views")
    purchases.joinAsOf(views, "user_id", "user_id", "ts", "ts").df
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"), col("value").as("p_value"),
        unix_micros(col("asof_ts")).as("v_us"), col("asof_value").as("v_value"))
      .orderBy(col("user_id"), col("p_us"), col("p_value"))
  }

  /** Banded range join: purchase↔view pairs of the same user within ±5
    * minutes (equi-join on (key, time-band) + exact filter — no
    * nested-loop degeneration). */
  val q_join_range: Q = (s, dir) => {
    val ev = events(s, dir)
    val fiveMinUs = 5L * 60 * 1000 * 1000
    val purchases = GTable(ev.df.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "value"), "purchases")
    val views = GTable(ev.df.filter(col("event_type") === "view")
      .select("user_id", "ts", "value"), "views")
    purchases.joinRange(views, "user_id", "user_id", "ts", "ts",
        fiveMinUs, fiveMinUs, rightPrefix = "v_").df
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"),
        unix_micros(col("v_ts")).as("v_us"), col("v_value"))
      .orderBy(col("user_id"), col("p_us"), col("v_us"), col("v_value"))
  }

  /** Custom Aggregator[IN,BUF,OUT] summaries (the reference's arbitrary
    * per-group callables, littletable.py:3546-3580) — typed UDAFs with
    * map-side partial aggregation; both SQL-expressible, so fully
    * oracle-checked. */
  val q_udaf_summaries: Q = (s, dir) => {
    import graft.functions.Aggregators.{geometric_mean, weighted_mean}
    t(s, dir, "lineitem").df
      .groupBy(col("l_returnflag"))
      .agg(
        round(weighted_mean(col("l_extendedprice"), col("l_quantity")), 4).as("wavg_price"),
        round(geometric_mean(col("l_quantity")), 4).as("gmean_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Skew-salted fact-fact join (GTable.joinSalted): hot keys spread over
    * 8 salted reducers; same answer as the plain equi-join, so the oracle
    * is ordinary SQL. */
  val q_join_salted: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .joinSalted(t(s, dir, "orders"), 4, "l_orderkey" -> "o_orderkey").df
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("o_orderpriority"))

  /** 3-way join, TPC-H-Q3 style: filter → join → join → agg → top-k.
    * Dim side broadcast; fact-fact join shuffles on the key. */
  val q_join3_revenue: Q = (s, dir) => {
    val cust = t(s, dir, "customer").whereEq("c_mktsegment" -> "BUILDING")
    val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    ord.joinBroadcast(cust, "o_custkey" -> "c_custkey")
      .join(li, "o_orderkey" -> "l_orderkey")
      .computeField("o_odate", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .groupbyWithSummaries(Seq("o_orderkey", "o_odate"),
        "revenue" -> round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2))
      .orderby("revenue desc, o_orderkey")
      .head(10).df
  }

  /** Multi-attribute equi-join (reference multi-key join,
    * littletable.py:2466-2478): lineitem ⋈ (partkey,suppkey) summary. */
  val q_join_multikey: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val ps = li.df.groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
      .agg(round(avg(col("l_quantity")), 4).as("avg_qty"))
    GTable(ps, "ps")
      .joinTyped(t(s, dir, "lineitem"), "inner",
        "partkey" -> "l_partkey", "suppkey" -> "l_suppkey")
      .where(col("l_quantity") > col("avg_qty") * 1.5)
      .groupbyWithSummaries(Seq("partkey"),
        "n_above" -> count(lit(1)))
      .where(col("n_above") >= 3)
      .orderby(SortKey.asc("partkey"))
      .df.select(col("partkey"), col("n_above"))
  }

  /** LEFT OUTER (SQL semantics; the reference's inverted naming is
    * documented, not replicated — littletable.py:2631-2646, SURVEY §2.3). */
  val q_join_left: Q = (s, dir) =>
    t(s, dir, "nation")
      .joinTyped(t(s, dir, "customer").where(col("c_acctbal") > 9000), "left",
        "n_nationkey" -> "c_nationkey")
      .groupbyWithSummaries(Seq("n_nationkey", "n_name"),
        "n_rich" -> count(col("c_custkey"))).df

  /** RIGHT OUTER. */
  val q_join_right: Q = (s, dir) =>
    t(s, dir, "orders").where(col("o_totalprice") > 400000)
      .joinTyped(t(s, dir, "customer"), "right", "o_custkey" -> "c_custkey")
      .groupbyWithSummaries(Seq("c_custkey"),
        "n_big" -> count(col("o_orderkey"))).df

  /** FULL OUTER with genuinely disjoint key sets (nulls on both sides). */
  val q_join_full: Q = (s, dir) => {
    val n = t(s, dir, "nation")
    val a = n.whereEq("n_regionkey" -> 0).select(col("n_nationkey"), col("n_name").as("name_a"))
    val b = n.whereEq("n_regionkey" -> 1).select(col("n_nationkey").as("nk_b"), col("n_name").as("name_b"))
    a.joinTyped(b, "full", "n_nationkey" -> "nk_b")
      .select(coalesce(col("n_nationkey"), col("nk_b")).as("nk"),
              col("name_a"), col("name_b"))
      .orderby(SortKey.asc("nk"))
      .df
  }

  /** LEFT SEMI (EXISTS) — reference recipe via outer join + filter
    * (unit_tests.py:1765-1771); native semi join here. */
  val q_join_semi: Q = (s, dir) =>
    t(s, dir, "customer")
      .joinTyped(t(s, dir, "orders").where(col("o_totalprice") > 450000),
        "left_semi", "c_custkey" -> "o_custkey")
      .select(col("c_custkey"), col("c_name"))
      .orderby(SortKey.asc("c_custkey"))
      .df

  /** LEFT ANTI (NOT EXISTS). */
  val q_join_anti: Q = (s, dir) =>
    t(s, dir, "customer")
      .joinTyped(t(s, dir, "orders").whereEq("o_orderstatus" -> "P"),
        "left_anti", "c_custkey" -> "o_custkey")
      .select(col("c_custkey"), col("c_name"))
      .orderby(SortKey.asc("c_custkey"))
      .df

  /** join_on / `+` chain builder (littletable.py:2711-2722, 4602-4683):
    * region ⋈ nation ⋈ customer via the fluent composition sugar. */
  val q_join_chain: Q = (s, dir) => {
    val chained = (t(s, dir, "region").joinOn("r_regionkey") +
      t(s, dir, "nation").joinOn("n_regionkey")).apply()
    chained
      .joinTyped(t(s, dir, "customer"), "inner", "n_nationkey" -> "c_nationkey")
      .groupbyWithSummaries(Seq("r_name", "n_name"),
        "n_cust" -> count(lit(1)),
        "avg_bal" -> round(avg(col("c_acctbal")), 4)).df
  }

  // ==================================================================
  // §2.6 Window-function analogues
  // ==================================================================

  /** Top-k per group (reference recipe orderby+slice per pivot subtable). */
  val q_topk_per_group: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders").df
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** Running sum per partition (beyond-reference analytic frame). */
  val q_window_running: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders").df
      .withColumn("running", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("running"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // ==================================================================
  // §2.9 Full-text search (littletable's signature extra)
  // ==================================================================

  /** Scored search with required / excluded / optional terms
    * (littletable.py:1781-1917): "++merge +join --slow fast" →
    * must contain merge, must not contain slow; merge/join score 1000,
    * fast scores 100. Runs the real pipeline: normalizer → inverted-index
    * DataFrame → broadcast word-score join → semi/anti joins → rank. */
  val q_search_scored: Q = (s, dir) => {
    val docs = t(s, dir, "documents").df
    val index = graft.operators.Search.buildIndex(docs, "doc_id", "text")
    graft.operators.Search
      .search(docs, index, "doc_id", "text", "++merge +join --slow fast",
        limit = 50, minScore = 0)
      .select(col("doc_id"), col("text_search_score"))
      .orderBy(col("text_search_score").desc, col("doc_id"))
  }

  /** Search with min_score thresholding and negative terms. */
  val q_search_minscore: Q = (s, dir) => {
    val docs = t(s, dir, "documents").df
    val index = graft.operators.Search.buildIndex(docs, "doc_id", "text")
    graft.operators.Search
      .search(docs, index, "doc_id", "text", "+merge +join -small fast",
        minScore = 1000)
      .select(col("doc_id"), col("text_search_score"))
      .orderBy(col("text_search_score").desc, col("doc_id"))
  }

  // ==================================================================
  // Text analysis (training-data pipeline operators, BASELINE.json)
  // ==================================================================

  import graft.functions.TextAnalysis

  /** Token counting: whitespace tokens + chars/4 subword estimate. */
  val q_token_count: Q = (s, dir) =>
    t(s, dir, "documents").df.select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextAnalysis.tokenEstimate(col("text")).as("n_tok_est"),
      length(col("text")).cast("long").as("len"))
      .orderBy(col("doc_id"))

  /** Quality scoring: length / punctuation / stopword-ratio heuristics. */
  val q_quality_score: Q = (s, dir) =>
    t(s, dir, "documents").df.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_c"),
      TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
      TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
      TextAnalysis.meanWordLen(col("text")).as("mean_word_len"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** Gopher-style quality rules (Rae et al. 2021 §A1.1) as per-doc
    * boolean flags + conjunctive keep: word-count band, mean-word-length
    * band, symbol-char ratio, alphabetic-word fraction, minimum stopword
    * hits. One codegen'd map pass, no shuffle. */
  val q_gopher_rules: Q = (s, dir) => {
    import graft.operators.Curate
    Curate.gopherRules(t(s, dir, "documents").df, "text",
        minWords = 30, maxWords = 100000, mwlLo = 3.0, mwlHi = 10.0,
        maxSymbolRatio = 0.1, minAlphaFrac = 0.8, minStopwords = 2,
        stopwords = Seq("the", "a", "of", "and", "to"))
      .select(col("doc_id"), col("n_words"), col("ok_words"), col("ok_mwl"),
        col("ok_symbols"), col("ok_alpha"), col("ok_stopwords"), col("keep"))
      .orderBy(col("doc_id"))
  }

  /** Language ID: argmax of per-language marker-word hits. */
  val q_lang_id: Q = (s, dir) => {
    val base = t(s, dir, "documents").df
    val scored = TextAnalysis.langMarkers.foldLeft(base) { case (d, (lang, ms)) =>
      d.withColumn(s"s_$lang", TextAnalysis.langScore(col("text"), ms).cast("long"))
    }
    scored.withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .select(col("doc_id"), col("lang"), col("s_en"), col("s_de"), col("s_es"),
        col("s_fr"), col("s_zh"), col("lang_pred"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprinting (md5 over normalized text). */
  val q_fingerprint: Q = (s, dir) =>
    t(s, dir, "documents").df.select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** Curation funnel: conjunctive filter chain with a one-pass
    * per-stage survivor report (stage 0 = input). Stages use table
    * columns + the repetition signal so the oracle can mirror them. */
  val q_curation_funnel: Q = (s, dir) => {
    import graft.operators.Curate
    import graft.operators.Curate.Stage
    val docs = t(s, dir, "documents")
    Curate.report(docs, Seq(
      Stage("lang_en", col("lang") === "en"),
      Stage("min_len", col("n_chars") >= 200),
      Stage("low_repetition", TextAnalysis.dupNgramFraction(col("text"), 3) < 0.5)))
      .orderBy(col("stage"))
  }

  // ==================================================================
  // Training-data pipeline: split / sample / decontaminate / chunk /
  // embed (all deterministic, all engine-portable — md5/IEEE parity)
  // ==================================================================

  /** Deterministic 80/10/10 train/val/test split keyed on doc_id
    * (md5-threshold assignment — bit-identical in any engine, stable
    * under repartition/backfill). */
  val q_split_hash: Q = (s, dir) => {
    import graft.operators.Split
    Split.hashSplit(t(s, dir, "documents").df, col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic stratified sample: exactly 20 docs per language,
    * ranked by (md5 hash, doc_id) within the stratum. */
  val q_sample_stratified: Q = (s, dir) => {
    import graft.operators.Split
    Split.stratifiedSample(t(s, dir, "documents").df, Seq("lang"),
        col("doc_id"), nPerStratum = 20, salt = "s")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** A-Res weighted sampling without replacement: 200 docs drawn with
    * probability ∝ n_chars — deterministic md5 uniforms, so the sampled
    * set and its ranks are engine-exact (the double `ln(u)/w` only
    * orders; doc_id breaks ties). */
  val q_weighted_sample: Q = (s, dir) => {
    import graft.operators.Split
    Split.weightedSample(t(s, dir, "documents").df, col("doc_id"),
        col("n_chars"), k = 200, salt = "ws")
      .select(col("doc_id"), col("n_chars"), col("sample_rank"))
  }

  /** Benchmark-contamination flags: every 20th doc plays the eval set;
    * output = corpus docs sharing ≥1 word-3-gram with it, with the
    * count of distinct shared shingles. */
  val q_contamination: Q = (s, dir) => {
    import graft.operators.Contamination
    val docs = t(s, dir, "documents").df
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    Contamination.sharedNgrams(corpus, "doc_id", "text", bench, "text", n = 3)
      .orderBy(col("doc_id"))
  }

  /** FUZZY decontamination: corpus docs whose word-3-gram Jaccard with
    * any benchmark doc reaches 0.5 are dropped — the near-duplicate
    * leakage guard (catches paraphrased benchmark items a raw
    * shared-n-gram count over-/under-flags). Benchmark side broadcast;
    * single shuffle on the (corpus, bench) pair intersection. Oracle:
    * the same exact Jaccard in DuckDB string 3-grams. */
  val q_decontam_fuzzy: Q = (s, dir) => {
    import graft.operators.Contamination
    val docs = t(s, dir, "documents").df
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    Contamination.decontaminateFuzzy(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 3, minJaccard = 0.5)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Bloom-prefiltered EXACT decontamination: same output as the exact
    * path (the bloom only prunes candidates map-side; survivors confirm
    * via the shared-n-gram join), gated against the plain exact oracle —
    * proving the 100 TB prefilter shape loses nothing. */
  val q_decontam_bloom: Q = (s, dir) => {
    import graft.operators.Contamination
    val docs = t(s, dir, "documents").df
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    Contamination.decontaminateBloom(corpus, "doc_id", "text", bench, "text",
        n = 3, expectedItems = 1L << 17, fpp = 0.03)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Per-source cap (corpus balancing): keep the 40 longest docs per
    * source, ties by doc_id — one ranking window per group key. */
  val q_cap_per_source: Q = (s, dir) => {
    import graft.operators.Curate
    Curate.capPerGroup(t(s, dir, "documents"), Seq("source"),
        Seq(col("n_chars").desc, col("doc_id")), k = 40).df
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Quantile-band outlier trim: keep docs whose length lies within the
    * exact [p05, p95] band (thresholds broadcast as a one-row join). */
  val q_quantile_band: Q = (s, dir) => {
    import graft.operators.Curate
    Curate.quantileBand(t(s, dir, "documents"), col("n_chars"), 0.05, 0.95).df
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Corpus vocabulary: top-50 whitespace tokens with occurrence and
    * document frequencies in one exploded aggregate. */
  val q_vocab_top: Q = (s, dir) => {
    import graft.operators.Lexicon
    Lexicon.vocab(t(s, dir, "documents").df, "doc_id", "text", 50)
  }

  /** Top-5 TF-IDF terms per document (sklearn-smoothed idf); the gate
    * compares the integer tf/df/rank columns — the double tfidf score
    * only orders the window in both engines. */
  val q_tfidf_top: Q = (s, dir) => {
    import graft.operators.Lexicon
    Lexicon.topTermsPerDoc(t(s, dir, "documents").df, "doc_id", "text", 5)
      .select(col("id"), col("token"), col("tf"), col("df"), col("term_rank"))
      .orderBy(col("id"), col("term_rank"))
  }

  /** BM25 top-k retrieval (beyond the reference's +/-/± tally): Okapi-
    * ranked top-25 docs for a three-term query. The gate compares
    * (doc_id, bm25_rank) — the double score only orders, in both
    * engines, with id tie-breaks. */
  val q_search_bm25: Q = (s, dir) => {
    import graft.operators.Search
    val docs = t(s, dir, "documents").df
    val idx = Search.buildBm25Index(docs, "doc_id", "text")
    Search.searchBm25(docs, idx, "doc_id", "hash join filter", k = 25)
      .select(col("doc_id"), col("bm25_rank"))
      .orderBy(col("bm25_rank"))
  }

  /** BM25 SERVING gate: identical retrieval to q_search_bm25 but against
    * the PERSISTED word-bucketed postings table — the index is built and
    * saved at most once per session per SF (the reference's
    * create_search_index build/query split); the serving path is the
    * bucket-pruned df lookup + broadcast term join + one id-keyed
    * shuffle. Same oracle as q_search_bm25. */
  val q_search_bm25_serve: Q = (s, dir) => {
    import graft.operators.Search
    val docs = t(s, dir, "documents").df
    val (table, fp) = fingerprintedArtifact(s, "bm25_idx", dir, "documents")
    val idx = Search.bm25IndexFor(docs, "doc_id", "text", table,
      fingerprint = fp)
    Search.searchBm25(docs, idx, "doc_id", "hash join filter", k = 25)
      .select(col("doc_id"), col("bm25_rank"))
      .orderBy(col("bm25_rank"))
  }

  /** BM25 INCREMENTAL-UPSERT gate — the SEARCH artifact family joins the
    * ANN families' append story, and like LSH the upsert is EXACT: the
    * base index is built over 80% of the corpus (doc_id % 5 != 0), the
    * delta is admitted through [[graft.operators.Search.upsertBm25Index]]
    * (per-doc postings computed over the delta only, appended under the
    * pinned word-bucket spec; (n_docs, total_len) merged in long
    * arithmetic so avg_len is bit-identical to a rebuild's), and the
    * served full-corpus ranking must equal the full-build ranking —
    * the SAME oracle as q_search_bm25, not a relaxed recall contract.
    * Built-and-upserted once per mtime-keyed generation (upsert is
    * append-only; re-admitting would double-count postings). Per-term
    * df/idf need no maintenance: they are computed in-plan from the
    * postings at serve time. */
  val q_search_bm25_upsert: Q = (s, dir) => {
    import graft.operators.Search
    val docs = t(s, dir, "documents").df
    val table = artifactTable(s, "bm25_ups", dir, "documents")
    onceUpserted(s, table) {
      Search.saveBm25Index(
        Search.buildBm25Index(docs.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text"), table)
      Search.upsertBm25Index(docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", table)
    }
    val idx = Search.loadBm25Index(s, table)
    Search.searchBm25(docs, idx, "doc_id", "hash join filter", k = 25)
      .select(col("doc_id"), col("bm25_rank"))
      .orderBy(col("bm25_rank"))
  }

  /** BM25 MAINTENANCE-LOOP gate — the full upsert-then-compact cadence
    * on the driver-checked correctness path: base build over 80% of the
    * corpus, delta admitted via [[graft.operators.Search
    * .upsertBm25Index]], then [[graft.operators.Search
    * .compactBm25Index]] rewrites the accumulated layout as a staged
    * next generation promoted by catalog rename
    * ([[graft.sources.Sources.promoteTable]]). The served top-25 must
    * equal the full-build ranking — the SAME q_search_bm25 oracle — so
    * any content drift through the append, the staged rewrite, or the
    * promote is a hash mismatch, not a spec-only regression. Runs once
    * per mtime-keyed generation (the real cadence: compact nightly,
    * serve all day). */
  val q_search_bm25_compact: Q = (s, dir) => {
    import graft.operators.Search
    val docs = t(s, dir, "documents").df
    val table = artifactTable(s, "bm25_cpt", dir, "documents")
    onceUpserted(s, table) {
      Search.saveBm25Index(
        Search.buildBm25Index(docs.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text"), table)
      Search.upsertBm25Index(docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", table)
      Search.compactBm25Index(s, table)
    }
    val idx = Search.loadBm25Index(s, table)
    Search.searchBm25(docs, idx, "doc_id", "hash join filter", k = 25)
      .select(col("doc_id"), col("bm25_rank"))
      .orderBy(col("bm25_rank"))
  }

  /** BM25 CONCURRENT-MAINTENANCE gate — the lost-delta window on the
    * oracle path: [[graft.operators.Search.buildNextBm25Layout]]
    * snapshots its basis file set, THEN a delta is upserted into the
    * live artifact — exactly the admission a nightly layout rewrite
    * races against in a multi-writer deployment — and
    * [[graft.operators.Search.promoteBm25Layout]]'s catch-up copies the
    * mid-build postings into the staged generation before the swap.
    * The served top-25 must equal the full-build ranking (q_search_bm25's
    * own oracle): without the catch-up, the delta's postings would
    * vanish at the swap while their already-merged stats survive — a
    * silent n_docs/avg_len/idf skew plus missing documents, which this
    * hash-checked gate turns into a driver failure. Runs once per
    * mtime-keyed generation. */
  val q_search_bm25_catchup: Q = (s, dir) => {
    import graft.operators.Search
    val docs = t(s, dir, "documents").df
    val table = artifactTable(s, "bm25_cu", dir, "documents")
    onceUpserted(s, table) {
      Search.saveBm25Index(
        Search.buildBm25Index(docs.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text"), table)
      Search.buildNextBm25Layout(s, table)
      Search.upsertBm25Index(docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", table)
      Search.promoteBm25Layout(s, table)
    }
    val idx = Search.loadBm25Index(s, table)
    Search.searchBm25(docs, idx, "doc_id", "hash join filter", k = 25)
      .select(col("doc_id"), col("bm25_rank"))
      .orderBy(col("bm25_rank"))
  }

  /** BM25 TAKEDOWN gate — the delete tier on the oracle path: the
    * artifact is built over the FULL corpus, then every doc_id % 7 == 3
    * is deleted via [[graft.operators.Search.deleteBm25Docs]] — an
    * O(small-commit) tombstone append, no base-file rewrite — and the
    * served top-25 must equal a DuckDB BM25 computed over the corpus
    * WITHOUT those documents. That equality is only possible if the
    * masking is content-exact end to end: rows anti-joined out AND the
    * corpus constants (n_docs/avg_len, and through them every idf)
    * corrected by exactly the deleted documents' (count, Σlen) — a
    * rank-sensitive contract, since avg_len skew reorders mid-ranks.
    * Build + delete run once per mtime-keyed generation; every later
    * run serves through the tombstone mask. */
  val q_search_bm25_delete: Q = (s, dir) => {
    import graft.operators.Search
    val docs = t(s, dir, "documents").df
    val table = artifactTable(s, "bm25_del", dir, "documents")
    onceUpserted(s, table) {
      Search.saveBm25Index(
        Search.buildBm25Index(docs, "doc_id", "text"), table)
      Search.deleteBm25Docs(s, table, docs.filter(col("doc_id") % 7 === 3)
        .select(col("doc_id")))
    }
    val idx = Search.loadBm25Index(s, table)
    Search.searchBm25(docs.filter(col("doc_id") % 7 =!= 3), idx,
        "doc_id", "hash join filter", k = 25)
      .select(col("doc_id"), col("bm25_rank"))
      .orderBy(col("bm25_rank"))
  }

  /** BM25 RECLAIM gate — physical erasure on the oracle path: build
    * over the full corpus, tombstone doc_id % 7 == 3, then run the full
    * [[graft.operators.Search.compactBm25Index]] cadence — the staged
    * rewrite FILTERS the tombstoned documents (the promoted
    * generation's files no longer contain them — the GDPR requirement
    * masking alone never meets; DeleteSpec reads the raw parquet to pin
    * it), the promote subtracts exactly their (count, Σlen) from the
    * live stats under the build-token idempotence guard, and the
    * consumed tombstones leave the sibling. The served ranking must
    * STILL equal the corpus-without-them BM25 — same oracle as
    * q_search_bm25_delete, now from erased files + corrected stats with
    * no mask left in the plan. Runs once per mtime-keyed generation. */
  val q_search_bm25_reclaim: Q = (s, dir) => {
    import graft.operators.Search
    val docs = t(s, dir, "documents").df
    val table = artifactTable(s, "bm25_rcl", dir, "documents")
    onceUpserted(s, table) {
      Search.saveBm25Index(
        Search.buildBm25Index(docs, "doc_id", "text"), table)
      Search.deleteBm25Docs(s, table, docs.filter(col("doc_id") % 7 === 3)
        .select(col("doc_id")))
      Search.compactBm25Index(s, table)
    }
    val idx = Search.loadBm25Index(s, table)
    Search.searchBm25(docs.filter(col("doc_id") % 7 =!= 3), idx,
        "doc_id", "hash join filter", k = 25)
      .select(col("doc_id"), col("bm25_rank"))
      .orderBy(col("bm25_rank"))
  }

  /** STREAMING BM25 ingest gate — the live-admission analogue of
    * q_search_bm25_upsert, and the one streaming-ingest tier whose
    * serve path IS oracle-expressible (the IVF ingest's centroids are
    * engine artifacts; postings are not): the base artifact is built
    * over 80% of the corpus, the remaining docs STREAM in through
    * [[graft.streaming.Streaming.bm25IngestSink]] (per-batch postings
    * landing as idempotent `batch=<id>` segments with their stats
    * marker), and the served top-25 over base ∪ admitted segments must
    * equal the full-corpus build's ranking — the SAME q_search_bm25
    * oracle, because postings are per-document and stats long-merge
    * (content identity survives any micro-batch slicing). Admitted once
    * per mtime-keyed generation; the segments persist in the warehouse
    * beside the artifact and are SERVED here (folding is pinned in
    * StreamingSpec). */
  val q_stream_bm25_ingest: Q = (s, dir) => {
    import graft.operators.Search
    val docs = t(s, dir, "documents").df
    val table = artifactTable(s, "bm25_ing", dir, "documents")
    val segDir = s"${s.conf.get("spark.sql.warehouse.dir")}/${table}_segs"
    onceUpserted(s, table) {
      Search.saveBm25Index(
        Search.buildBm25Index(docs.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text"), table)
      // clear segments from a crashed prior attempt: a rerun may slice
      // fewer batches, and per-batch overwrite only replaces its own id
      val hp = new org.apache.hadoop.fs.Path(segDir)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val stream = graft.streaming.Streaming.documentsStream(s, dir)
        .filter(col("doc_id") % 5 === 0)
      val q = graft.streaming.Streaming.bm25IngestSink(stream, table,
        "doc_id", "text", segDir)
      try q.processAllAvailable() finally q.stop()
    }
    val idx = Search.loadBm25IndexWithSegments(s, table, segDir)
    Search.searchBm25(docs, idx, "doc_id", "hash join filter", k = 25)
      .select(col("doc_id"), col("bm25_rank"))
      .orderBy(col("bm25_rank"))
  }

  /** BM25 SEGMENT-RESIDENT takedown gate — the delete tier's exactness
    * hole closed on the oracle path: the artifact is built over 80% of
    * the corpus, the remaining docs STREAM in as un-folded
    * `batch=<id>` segments ([[graft.streaming.Streaming
    * .bm25IngestSink]]), and THEN every doc_id % 7 == 3 is deleted —
    * BEFORE any fold, so part of the takedown set lives only in
    * segments. [[graft.operators.Search.deleteBm25Docs]] is called
    * with `segDir`, so the capture scans base ∪ complete segments and
    * records each segment-resident target's EXACT doclen (a base-only
    * capture records 0 and leaves total_len over-counted once the fold
    * merges the segment's stats — the residual this gate exists to
    * keep closed). The served top-25 over base ∪ segments must equal a
    * DuckDB BM25 over the corpus WITHOUT the deleted docs — the same
    * rank-sensitive constants contract as q_search_bm25_delete, now
    * with the takedown racing the fold cadence instead of waiting for
    * it. Build + ingest + delete run once per mtime-keyed generation. */
  val q_search_bm25_delete_seg: Q = (s, dir) => {
    import graft.operators.Search
    val docs = t(s, dir, "documents").df
    val table = artifactTable(s, "bm25_dsg", dir, "documents")
    val segDir = s"${s.conf.get("spark.sql.warehouse.dir")}/${table}_segs"
    onceUpserted(s, table) {
      Search.saveBm25Index(
        Search.buildBm25Index(docs.filter(col("doc_id") % 5 =!= 0),
          "doc_id", "text"), table)
      // clear segments from a crashed prior attempt (the
      // q_stream_bm25_ingest discipline)
      val hp = new org.apache.hadoop.fs.Path(segDir)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val stream = graft.streaming.Streaming.documentsStream(s, dir)
        .filter(col("doc_id") % 5 === 0)
      val q = graft.streaming.Streaming.bm25IngestSink(stream, table,
        "doc_id", "text", segDir)
      try q.processAllAvailable() finally q.stop()
      // takedown BEFORE the fold: ids ≡ 0 (mod 5) ∧ ≡ 3 (mod 7) are
      // segment-resident at this moment — segDir makes their doclen
      // capture exact
      Search.deleteBm25Docs(s, table,
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")),
        segDir = segDir)
    }
    val idx = Search.loadBm25IndexWithSegments(s, table, segDir)
    Search.searchBm25(docs.filter(col("doc_id") % 7 =!= 3), idx,
        "doc_id", "hash join filter", k = 25)
      .select(col("doc_id"), col("bm25_rank"))
      .orderBy(col("bm25_rank"))
  }

  /** HLL approximate-distinct accuracy gate: per source, the exact
    * distinct doc-length count next to a within-tolerance flag for the
    * HLL estimate (both aggregates share one shuffle). The oracle emits
    * `true` unconditionally — rows only hash-match if every estimate
    * landed inside 15% relative error. HLL is hash-deterministic and
    * merge-order-independent, so the flag is partition-layout-free. */
  val q_approx_distinct: Q = (s, dir) => {
    import graft.operators.Sketch
    Sketch.distinctReport(t(s, dir, "documents").df, Seq("source"), "n_chars",
        rsd = 0.05, tol = 0.15)
      .orderBy(col("source"))
  }

  /** Mergeable-sketch ROLLUP gate (the pre-aggregated reporting cube a
    * 100 TB deployment serves reports from): per-(source, lang, shard)
    * HLL sketches are built once and PERSISTED (mtime-keyed artifact),
    * then per-source answers come from MERGING the persisted sketches —
    * no corpus access on the serve path. Two guarantees folded into the
    * gate filter, so a violation drops rows and breaks the hash match
    * vs the unconditional exact oracle:
    *  - ROW CONSERVATION (bit-exact): the cube's `n_rows` rolls up to
    *    the corpus's per-source row counts — the cube covers every row
    *    exactly once;
    *  - ACCURACY: every rolled-up estimate — both the one-hop rollup
    *    and the two-hop rollup through an intermediate (source, lang)
    *    sketch tier — lands within 15% of the exact distinct count
    *    (lgK=12 ⇒ rse ≈ 1.6%; wide margin for tiny groups).
    * Rolled estimates are deliberately NOT compared bit-exact across
    * paths or against a fresh single sketch: intermediate union
    * serialization and the HIP-vs-composite estimator split both move
    * estimates within the error band — see [[graft.operators.Sketch
    * .buildDistinctSketches]]. */
  val q_sketch_rollup: Q = (s, dir) => {
    import graft.operators.Sketch
    val docs = t(s, dir, "documents").df
    val table = artifactTable(s, "hll_cube", dir, "documents")
    if (!s.catalog.tableExists(table)) {
      graft.sources.Sources.replaceTable(s, table)
      Sketch.buildDistinctSketches(
          docs.withColumn("shard", col("doc_id") % 4),
          Seq("source", "lang", "shard"), "n_chars")
        .write.mode("overwrite").format("parquet").saveAsTable(table)
    }
    val cube = s.table(table)
    val oneHop = Sketch.rollupDistinct(cube, Seq("source"))
    val twoHop = Sketch.rollupDistinct(
        Sketch.rollupSketches(cube, Seq("source", "lang")), Seq("source"))
      .select(col("source"), col("est_distinct").as("__est2"),
        col("n_rows").as("__n2"))
    val exact = docs.groupBy(col("source"))
      .agg(count_distinct(col("n_chars")).as("n_exact"),
        count(lit(1)).as("__n_rows_corpus"))
    def withinTol(est: Column) =
      abs(est - col("n_exact")).cast("double") <= lit(0.15) * col("n_exact")
    oneHop.join(twoHop, "source").join(exact, "source")
      .filter(col("n_rows") === col("__n_rows_corpus") &&
        col("__n2") === col("__n_rows_corpus") &&
        withinTol(col("est_distinct")) && withinTol(col("__est2")))
      .select(col("source"), col("n_exact"))
      .orderBy(col("source"))
  }

  /** HLL cube MAINTENANCE-LOOP gate — the sketch family joins the
    * upsert/compact story, and mergeability IS the mechanism: the cube
    * is built over 80% of the corpus, the remaining docs' finest-group
    * sketch rows are APPENDED via [[graft.operators.Sketch
    * .upsertDistinctSketches]] (one aggregate over the delta, no corpus
    * access), then [[graft.operators.Sketch.compactDistinctCube]]
    * re-merges the accumulated rows as a staged generation promoted by
    * catalog rename. The served per-source report must STILL satisfy
    * q_sketch_rollup's full contract against the FULL corpus — row
    * conservation bit-exact (the appended delta covered exactly the
    * missing rows; the compaction lost none) and both rollup paths
    * within 15% of exact. Same oracle as q_sketch_rollup. */
  val q_sketch_compact: Q = (s, dir) => {
    import graft.operators.Sketch
    val docs = t(s, dir, "documents").df
    val keys = Seq("source", "lang", "shard")
    val table = artifactTable(s, "hll_cube_cpt", dir, "documents")
    onceUpserted(s, table) {
      graft.sources.Sources.replaceTable(s, table)
      Sketch.buildDistinctSketches(
          docs.filter(col("doc_id") % 5 =!= 0)
            .withColumn("shard", col("doc_id") % 4),
          keys, "n_chars")
        .write.mode("overwrite").format("parquet").saveAsTable(table)
      Sketch.upsertDistinctSketches(
        docs.filter(col("doc_id") % 5 === 0)
          .withColumn("shard", col("doc_id") % 4),
        keys, "n_chars", table)
      Sketch.compactDistinctCube(s, table, keys)
    }
    val cube = s.table(table)
    val oneHop = Sketch.rollupDistinct(cube, Seq("source"))
    val twoHop = Sketch.rollupDistinct(
        Sketch.rollupSketches(cube, Seq("source", "lang")), Seq("source"))
      .select(col("source"), col("est_distinct").as("__est2"),
        col("n_rows").as("__n2"))
    val exact = docs.groupBy(col("source"))
      .agg(count_distinct(col("n_chars")).as("n_exact"),
        count(lit(1)).as("__n_rows_corpus"))
    def withinTol(est: Column) =
      abs(est - col("n_exact")).cast("double") <= lit(0.15) * col("n_exact")
    oneHop.join(twoHop, "source").join(exact, "source")
      .filter(col("n_rows") === col("__n_rows_corpus") &&
        col("__n2") === col("__n_rows_corpus") &&
        withinTol(col("est_distinct")) && withinTol(col("__est2")))
      .select(col("source"), col("n_exact"))
      .orderBy(col("source"))
  }

  /** Sketch-cube TAKEDOWN gate — the sixth family's delete tier on the
    * oracle path, via the family's documented (and deliberately
    * different) mechanism: HLL registers are not invertible, so
    * [[graft.operators.Sketch.rebuildDistinctExcluding]] REBUILDS the
    * cube over corpus-minus-tombstones — one aggregate, staged beside
    * the live cube and promoted by catalog rename; the promoted files
    * never contained the deleted rows' contributions (physical erasure
    * in one step, no residual tombstones). The served per-source report
    * must satisfy q_sketch_rollup's full contract against the REDUCED
    * corpus: row conservation bit-exact (rebuild covered exactly the
    * surviving rows) and both rollup paths' estimates within 15% of the
    * reduced corpus's exact distinct counts. Build + takedown run once
    * per mtime-keyed generation. */
  val q_sketch_delete: Q = (s, dir) => {
    import graft.operators.Sketch
    val docs = t(s, dir, "documents").df
    val keys = Seq("source", "lang", "shard")
    val table = artifactTable(s, "hll_cube_del", dir, "documents")
    val sharded = docs.withColumn("shard", col("doc_id") % 4)
    onceUpserted(s, table) {
      graft.sources.Sources.replaceTable(s, table)
      Sketch.buildDistinctSketches(sharded, keys, "n_chars")
        .write.mode("overwrite").format("parquet").saveAsTable(table)
      Sketch.rebuildDistinctExcluding(sharded, keys, "n_chars",
        docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")), table)
    }
    val reduced = docs.filter(col("doc_id") % 7 =!= 3)
    val cube = s.table(table)
    val oneHop = Sketch.rollupDistinct(cube, Seq("source"))
    val twoHop = Sketch.rollupDistinct(
        Sketch.rollupSketches(cube, Seq("source", "lang")), Seq("source"))
      .select(col("source"), col("est_distinct").as("__est2"),
        col("n_rows").as("__n2"))
    val exact = reduced.groupBy(col("source"))
      .agg(count_distinct(col("n_chars")).as("n_exact"),
        count(lit(1)).as("__n_rows_corpus"))
    def withinTol(est: Column) =
      abs(est - col("n_exact")).cast("double") <= lit(0.15) * col("n_exact")
    oneHop.join(twoHop, "source").join(exact, "source")
      .filter(col("n_rows") === col("__n_rows_corpus") &&
        col("__n2") === col("__n_rows_corpus") &&
        withinTol(col("est_distinct")) && withinTol(col("__est2")))
      .select(col("source"), col("n_exact"))
      .orderBy(col("source"))
  }

  /** STREAMING sketch-cube ingest gate — the sixth family's live
    * admission on the oracle path: the cube is built over 80% of the
    * corpus, the remaining docs STREAM through
    * [[graft.streaming.Streaming.sketchCubeIngestSink]] (each
    * micro-batch aggregates to its finest-group HLL rows and lands as
    * an idempotent `batch=<id>` segment), and the served per-source
    * report over base ∪ admitted segments must satisfy
    * q_sketch_rollup's FULL-corpus contract — row conservation
    * bit-exact (mergeability makes admission exact for counts) and the
    * rollup estimate within 15% of exact. Same oracle as
    * q_sketch_rollup. */
  val q_stream_sketch_ingest: Q = (s, dir) => {
    import graft.operators.Sketch
    val docs = t(s, dir, "documents").df
    val keys = Seq("source", "lang", "shard")
    val table = artifactTable(s, "hll_cube_ing", dir, "documents")
    val segDir = s"${s.conf.get("spark.sql.warehouse.dir")}/${table}_segs"
    onceUpserted(s, table) {
      graft.sources.Sources.replaceTable(s, table)
      graft.sources.Sources.replaceTable(s, s"${table}_folded")
      Sketch.buildDistinctSketches(
          docs.filter(col("doc_id") % 5 =!= 0)
            .withColumn("shard", col("doc_id") % 4),
          keys, "n_chars")
        .write.mode("overwrite").format("parquet").saveAsTable(table)
      val hp = new org.apache.hadoop.fs.Path(segDir)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val stream = graft.streaming.Streaming.fileStream(s, dir,
          "documents.parquet").filter(col("doc_id") % 5 === 0)
        .withColumn("shard", col("doc_id") % 4)
      val q = graft.streaming.Streaming.sketchCubeIngestSink(stream, table,
        keys, "n_chars", segDir)
      try q.processAllAvailable() finally q.stop()
    }
    val cube = Sketch.loadCubeWithSegments(s, table, segDir)
    val served = Sketch.rollupDistinct(cube, Seq("source"))
    val exact = docs.groupBy(col("source"))
      .agg(count_distinct(col("n_chars")).as("n_exact"),
        count(lit(1)).as("__n_rows_corpus"))
    served.join(exact, "source")
      .filter(col("n_rows") === col("__n_rows_corpus") &&
        abs(col("est_distinct") - col("n_exact")).cast("double") <=
          lit(0.15) * col("n_exact"))
      .select(col("source"), col("n_exact"))
      .orderBy(col("source"))
  }

  /** KLL quantile-rollup gate — the QUANTILE face of the persisted
    * sketch cube: per-(source, lang, shard) KLL sketches of n_chars are
    * built once (mtime-keyed artifact, sharing `q_sketch_rollup`'s
    * build discipline), then per-source p50/p90 are served by MERGE
    * with no corpus access. The gated contract is KLL's actual
    * guarantee — the RANK of the served quantile (see [[kllRankGate]]:
    * rank error ≤ max(0.05·n, 1 rank); KLL's guarantee is normalized
    * rank error, ~1.65% at k = 200/99% conf, so 5% is wide margin) —
    * and the cube's row counts must roll up exactly. Rows failing
    * either drop and break the hash match vs the unconditional exact
    * per-source row-count oracle. */
  val q_quantile_rollup: Q = (s, dir) => {
    import graft.operators.Sketch
    val docs = t(s, dir, "documents").df
    val table = artifactTable(s, "kll_cube", dir, "documents")
    if (!s.catalog.tableExists(table)) {
      graft.sources.Sources.replaceTable(s, table)
      Sketch.buildQuantileSketches(
          docs.withColumn("shard", col("doc_id") % 4),
          Seq("source", "lang", "shard"), "n_chars")
        .write.mode("overwrite").format("parquet").saveAsTable(table)
    }
    val served = Sketch.rollupQuantiles(s.table(table), Seq("source"),
        Seq(0.5, 0.9))
      .select(col("source"), col("q_50").as("__q50"),
        col("q_90").as("__q90"), col("n_rows"))
    kllRankGate(docs, col("n_chars"), served, Seq("source"))
  }

  /** Shared KLL rank gate (q_quantile_rollup / q_stream_quantiles): for
    * each group, the served p50/p90's rank error — |count(value ≤ q̂) −
    * q·n| — must be ≤ max(0.05·n, 1 rank) and the sketch's `n_rows`
    * must equal the data-side count; survivors emit (keys..., n_rows).
    * The absolute one-rank floor is integer granularity, not slack: a
    * 5-row group's attainable p90 ranks are 4/5 and 5/5, both ≥ 0.1
    * from 0.9 — no estimator can beat the nearest attainable rank.
    * `served` carries (keys..., __q50, __q90, n_rows). The denominator
    * is `count(value)` — NON-NULL values — matching the build side's
    * n_rows discipline (the sketch skips NULLs; counting NULL rows
    * would both fail row conservation and skew every q·n target). */
  private def kllRankGate(data: DataFrame, value: Column,
      served: DataFrame, keys: Seq[String]): DataFrame = {
    val checked = data.join(broadcast(served), keys)
      .groupBy(keys.map(col) :+ col("n_rows"): _*)
      .agg(count(value).as("__n"),
        sum(when(value <= col("__q50"), 1L).otherwise(0L)).as("__r50"),
        sum(when(value <= col("__q90"), 1L).otherwise(0L)).as("__r90"))
    def rankOk(r: Column, q: Double): Column =
      abs(r.cast("double") - lit(q) * col("__n")) <=
        greatest(lit(0.05) * col("__n"), lit(1.0))
    checked
      .filter(col("n_rows") === col("__n") &&
        rankOk(col("__r50"), 0.5) && rankOk(col("__r90"), 0.9))
      .select(keys.map(col) :+ col("__n").as("n_rows"): _*)
      .orderBy(keys.map(col): _*)
  }

  /** Count-min-sketch frequency gate: per event type, the exact count,
    * emitted only if the CMS estimate respects both CMS guarantees
    * (never under-counts; over-counts by at most eps·N). A dropped row
    * breaks the hash match against the unconditional exact oracle. */
  val q_cms_counts: Q = (s, dir) => {
    import graft.operators.Sketch
    val ev = events(s, dir).df.select(col("event_type"))
    // one exact aggregate (type-count-sized, bytes) yields the type list,
    // the stream length, AND the gate's exact side — the corpus scans
    // twice (exact + sketch) instead of four times, and only the tiny
    // aggregate is pinned in the cache manager
    val exact = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exactRows = exact.orderBy(col("event_type")).collect()
    val types = exactRows.map(_.getString(0)).toSeq
    val total = exactRows.map(_.getLong(1)).sum
    val est = Sketch.cmsEstimates(ev, "event_type", types, eps = 0.0001)
    est.join(exact, "event_type")
      .filter(col("est_count") >= col("n") &&
        col("est_count") <= col("n") + lit(math.ceil(0.0001 * total).toLong))
      .select(col("event_type"), col("n"))
      .orderBy(col("event_type"))
  }

  /** PQ SERVING gate: identical recall contract to q_sim_pq but the ADC
    * scan reads the PERSISTED encoded table — codes computed once at
    * build time, codebooks loaded from the sibling table and cached.
    * Deterministic per-subspace k-means makes loaded and freshly-built
    * indexes identical. Same oracle as q_sim_pq. */
  val q_sim_pq_serve: Q = (s, dir) => {
    import graft.operators.Similarity
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val (table, fp) = fingerprintedArtifact(s, "pq_idx", dir, "embeddings")
    val idx = Similarity.pqIndexFor(emb, "vec_id", "embedding", dims = 64,
      table, m = 16, nCodes = 32, iters = 8, sampleN = 2048,
      fingerprint = fp)
    val ann = Similarity.pqTopK(idx, "vec_id", "embedding", qvec, 20,
      candidates = 500)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** Misra-Gries HEAVY-HITTER GATE: 28 counters over the ~31-distinct-
    * token corpus stream — real eviction pressure, not a trivially-exact
    * run. Emits the exact count of every token whose frequency clears
    * the MG threshold (n·29 > N), but only when the sketch honored its
    * contract for that token: present among the candidates with
    * exact − N/29 ≤ est ≤ exact (integer-exact inequalities, no float
    * thresholds). A violated bound drops the row and breaks the hash
    * match against the unconditional exact oracle. est_count itself is
    * merge-order-dependent inside the guarantee band, so it is gated,
    * never emitted. */
  val q_heavy_hitters: Q = (s, dir) => {
    import graft.operators.Sketch
    val k = 28
    // pin the TINY exact-count frame (vocab-sized, KBs) and derive the
    // stream length from it — the corpus tokenizes twice (counts +
    // sketch) instead of three times, and nothing corpus-sized stays in
    // the cache manager for the rest of the session
    val toks = t(s, dir, "documents").df
      .select(explode(TextAnalysis.words(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTotal = counts.agg(sum(col("n"))).head().getLong(0)
    val hh = Sketch.heavyHitters(toks, "token", k)
    counts
      .filter(col("n") * (k + 1) > lit(nTotal))
      .join(hh, col("token") === col("item"), "left")
      .filter(col("item").isNotNull &&
        col("est_count") <= col("n") &&
        col("est_count") * (k + 1) >= col("n") * (k + 1) - lit(nTotal))
      .select(col("token"), col("n"))
      .orderBy(col("token"))
  }

  /** Near-dup clusters keeping the BEST doc per cluster (longest, then
    * lowest id) instead of the lowest-id anchor. */
  val q_cluster_best: Q = (s, dir) => {
    import graft.operators.Dedup
    Dedup.dedupClustersKeepBest(t(s, dir, "documents").df, "doc_id", "text",
        best = Seq(col("n_chars").desc, col("doc_id")), n = 3, minJaccard = 0.5)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Token-window chunking: 64-token windows every 48 tokens (16-token
    * overlap), tail window kept short. */
  val q_chunk_windows: Q = (s, dir) => {
    import graft.operators.Chunk
    Chunk.tokenWindows(t(s, dir, "documents").df, "doc_id", "text",
        windowTokens = 64, stride = 48)
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Concat-and-cut sequence-packing index at context 512: per doc, its
    * global token offset and first/last packed sequence. The corpus-wide
    * cumulative sum runs via Ordinals.keyedRunningTotal (pure-Catalyst
    * value-keyed two-level prefix sum), not a single-partition window. */
  val q_pack_index: Q = (s, dir) => {
    import graft.operators.Chunk
    Chunk.packIndex(t(s, dir, "documents").df, "doc_id", "text", contextLen = 512)
      .orderBy(col("doc_id"))
  }

  /** Sequence-side packing view at context 512: per packed sequence, its
    * document count, token fill, and contributing doc-id range — the
    * attention-boundary map for a packed-pretraining loader. One explode
    * + one groupBy(seq) on top of the pack index. */
  val q_pack_sequences: Q = (s, dir) => {
    import graft.operators.Chunk
    Chunk.packSequences(t(s, dir, "documents").df, "doc_id", "text",
        contextLen = 512)
      .orderBy(col("seq_id"))
  }

  /** Content-defined chunking (LBFS/rsync boundaries at token
    * granularity): 4-token boundary windows, expected chunk ≈ 16
    * tokens; every chunk's position, length and text byte-matched. */
  val q_cdc_chunks: Q = (s, dir) => {
    import graft.operators.Chunk
    Chunk.contentDefinedChunks(t(s, dir, "documents").df, "doc_id", "text",
        windowTokens = 4, modulus = 16)
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** PII redaction over the corpus: deterministic PII-shaped strings
    * (email / phone / SSN / IPv4, derived from doc_id) are appended to
    * each doc, then scrubbed by the Scrub rule chain — one codegen'd map
    * pass of regexp_count + regexp_replace, no shuffle. The oracle
    * re-runs the identical RE2-safe patterns in DuckDB. */
  val q_pii_redact: Q = (s, dir) => {
    import graft.operators.Scrub
    val docs = t(s, dir, "documents").df
    val withPii = docs.select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com call +1 "),
        (col("doc_id") % 900 + 100).cast("string"), lit("-"),
        (col("doc_id") % 800 + 101).cast("string"), lit("-"),
        (col("doc_id") % 9000 + 1000).cast("string"),
        lit(" ssn "),
        (col("doc_id") % 900 + 100).cast("string"), lit("-"),
        (col("doc_id") % 89 + 10).cast("string"), lit("-"),
        (col("doc_id") % 9000 + 1000).cast("string"),
        lit(" from 10."),
        (col("doc_id") % 256).cast("string"), lit(".0."),
        (col("doc_id") % 100).cast("string")).as("text"))
    Scrub.redactTable(withPii, "text")
      .select(col("doc_id"), col("text").as("redacted"), col("n_pii"))
      .orderBy(col("doc_id"))
  }

  /** Span-level exact dedup (paragraph-dedup analogue): disjoint 20-word
    * spans, global keep-first by span text, docs reassembled from their
    * surviving spans. */
  val q_span_dedup: Q = (s, dir) => {
    import graft.operators.Chunk
    Chunk.dedupSpans(t(s, dir, "documents").df, "doc_id", "text", spanTokens = 20)
      .orderBy(col("doc_id"))
  }

  /** Shared artifact snippets for q_encoding_scan: defined ONCE and used
    * by both the Spark construction and the interpolated oracle SQL, so
    * the scanned byte sequences are identical by construction. */
  private val mojiSnippet = " cafÃ© â€™"
  private val specialSnippet = " <|endoftext|> [SEP]"

  /** Encoding/tokenization hygiene scan: deterministic artifacts
    * (mojibake, a C0 control char, leaked tokenizer special tokens) are
    * appended to id-selected docs — the q_pii_redact idiom for structure
    * the synthetic corpus lacks — then counted per doc by the Scrub
    * patterns; one codegen'd map pass, no shuffle. */
  val q_encoding_scan: Q = (s, dir) => {
    import graft.operators.Scrub
    val withArt = t(s, dir, "documents").df.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 5 === 0, lit(mojiSnippet)).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(specialSnippet)).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit("\u0007")).otherwise(lit("")))
        .as("text"))
    Scrub.encodingArtifacts(withArt, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Incremental ingest dedup: a synthesized "today's crawl" — exact
    * re-crawls of every doc_id%3==0 doc (shifted ids) plus genuinely
    * fresh docs — anti-joined against the existing corpus by normalized
    * content digest. Every re-crawl must drop, every fresh doc must
    * survive. */
  val q_dedup_incremental: Q = (s, dir) => {
    import graft.operators.Dedup
    val docs = t(s, dir, "documents").df
    val recrawl = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val fresh = docs.filter(col("doc_id") % 3 === 1)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" fresh "), col("doc_id").cast("string"))
          .as("text"))
    Dedup.dedupAgainst(recrawl.unionByName(fresh), docs, "text")
      .select(col("doc_id"), length(col("text")).as("n_chars_in"))
      .orderBy(col("doc_id"))
  }

  /** Sliding-window exact substring dedup (Lee et al. ExactSubstr,
    * 8-token windows): every non-first occurrence of a duplicated
    * 8-gram loses its token span; full reassembled text byte-matched
    * for ALL docs, untouched ones included. */
  val q_substr_dedup: Q = (s, dir) => {
    import graft.operators.Chunk
    Chunk.dedupSubstrings(t(s, dir, "documents").df, "doc_id", "text", k = 8)
      .orderBy(col("doc_id"))
  }

  /** Line-level duplicate removal at strict maxFreq=1 (drop every copy of
    * any line repeated anywhere in the corpus — the CCNet/RefinedWeb
    * boilerplate guard). The synthetic documents carry no newlines, so a
    * lined view is synthesized map-side first (3-word lines — the house
    * idiom for structure the synthetic tables lack, as q_pii_redact does
    * for PII). */
  val q_line_dedup: Q = (s, dir) => {
    import graft.operators.Chunk
    val lined = t(s, dir, "documents").df
      .filter(length(trim(col("text"))) > 0)
      .withColumn("__ws", graft.functions.TextAnalysis.words(col("text")))
      .withColumn("text_lined", array_join(transform(
        sequence(lit(0), expr("(size(__ws) + 2) div 3") - 1),
        i => array_join(slice(col("__ws"), (i * 3 + 1).cast("int"), lit(3)),
          " ")), "\n"))
      .select(col("doc_id"), col("text_lined"))
    Chunk.removeFrequentLines(lined, "doc_id", "text_lined", maxFreq = 1)
      .orderBy(col("doc_id"))
  }

  /** First-iteration BPE merge statistics: top-25 adjacent character
    * pairs, counted over the vocab weighted by word frequency. */
  val q_bpe_pairs: Q = (s, dir) => {
    import graft.operators.Lexicon
    Lexicon.bpePairStats(t(s, dir, "documents").df, "text", k = 25)
      .orderBy(col("n_occurrences").desc, col("lhs"), col("rhs"))
  }

  /** Full BPE tokenizer training, 4 merge rounds: the learned merge
    * table (step, lhs, rhs, count-before-merge) bit-matched against a
    * generated DuckDB mirror that unrolls each round as
    * pair-count → top-1 → delimiter-replace CTEs. */
  val q_bpe_train: Q = (s, dir) => {
    import graft.operators.Lexicon
    Lexicon.bpeTrain(t(s, dir, "documents").df, "text", merges = 4)
      .orderBy(col("step"))
  }

  /** BPE encode via the PERSISTED merge artifact (the train/serve split:
    * merges are learned and saved at most once per session per SF, the
    * serving path loads the KB-sized merge list and runs one codegen'd
    * map pass): per-doc raw and post-merge token counts — the
    * compression the tokenizer buys, and the counts a token-budget
    * planner uses. */
  val q_bpe_apply: Q = (s, dir) => {
    import graft.operators.Lexicon
    val docs = t(s, dir, "documents").df
    val table = artifactTable(s, "bpe_merges", dir, "documents")
    val merges = Lexicon.bpeMergesFor(docs, "text", table, merges = 4)
    Lexicon.bpeApply(docs, "doc_id", "text", merges)
      .orderBy(col("doc_id"))
  }

  /** DEEP BPE training gate — drain-to-exhaustion: request 256 merges
    * over the documents corpus (the synthetic vocab drains far earlier —
    * every adjacent pair merged away), proving the trainer's round cost
    * is independent of merge depth (driver-local loop; the former
    * distributed shape paid 2 Spark jobs per merge and capped at 64).
    * Oracle: the same MATERIALIZED CTE chain at the full 256 rounds —
    * rounds after exhaustion contribute zero rows on both sides. */
  val q_bpe_train_deep: Q = (s, dir) => {
    import graft.operators.Lexicon
    Lexicon.bpeTrain(t(s, dir, "documents").df, "text", merges = 256)
      .orderBy(col("step"))
  }

  /** BPE at TRUE VOCABULARY DEPTH, oracle-pinned — the round-10 close of
    * the one remaining depth gap: the corpus is widened IN-ENGINE by
    * `copies` word-suffixed copies (every word in copy k gets `qk`
    * appended — the [[graft.tools.BpeDepthProbe]] idiom: copies share
    * no words, so the sustainable merge count multiplies), and the
    * trainer runs 1100 rounds WITHOUT draining (round 1100 still merges
    * at frequency ~888 on the sf0.01 corpus). Every one of the 1100
    * (step, lhs, rhs, n) rows must bit-match the independent DuckDB
    * mirror — ending the question the ScalaTest-only 1500-merge
    * artifact left open (our own Sennrich mirror agreeing with our own
    * trainer). The widening is ONE scan + an explode, not `copies`
    * scans; the per-row regexp_replace appends the copy suffix to every
    * word. */
  /** q_bpe_train_vocab_depth's cap-guard distinct-word counts, keyed by
    * (sfDir, documents mtime) — plain longs, no session references. */
  private val bpeVocabGuardCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), Long]

  val q_bpe_train_vocab_depth: Q = (s, dir) => {
    import graft.operators.Lexicon
    val copies = 48
    val docs = t(s, dir, "documents").df
    // The DuckDB oracle is UNCAPPED; the engine caps its vocab, so the
    // two only agree while the widened vocab fits under the cap. Guard
    // that explicitly: widened distinct words = base distinct × copies
    // EXACTLY (the appended suffix is 'q'+digits — a suffix mismatch in
    // length would need its longer form to start with two 'q's, which
    // 'q'+digits cannot, so no two (word, copy) pairs collide). A
    // scale-up that overflows the cap fails HERE with a clear message
    // instead of as a confusing downstream hash mismatch.
    val vocabCap = 1000000
    // cached per (dir, mtime): the guard protects against a NEW data
    // scale, so re-scanning the same static corpus on every bench
    // iteration of the heaviest tracked query buys nothing — a
    // regenerated corpus (fresh mtime) re-counts
    val mtime = new java.io.File(s"$dir/documents.parquet").lastModified
    val baseDistinct = bpeVocabGuardCache.getOrElseUpdate((dir, mtime),
      docs.select(explode(graft.functions.TextAnalysis.words(col("text"))).as("w"))
        .filter(col("w") =!= "").distinct().count())
    require(baseDistinct * copies < vocabCap,
      s"widened vocab ${baseDistinct * copies} would overflow vocabCap " +
        s"$vocabCap — the capped engine would diverge from the uncapped " +
        "DuckDB oracle; raise the cap (and keep the oracle uncapped) or " +
        "lower the widening")
    // Parallelize BEFORE the 48× widening: the raw corpus scan is one
    // unsplittable partition, so without this the explode + per-copy
    // regexp ran on ONE core and the round-robin repartition inside the
    // trainer then shuffled the widened bytes (measured: a 2.7 s
    // single-task stage writing 47.7 MB). Repartitioning the raw docs
    // first moves 0.6 MB and spreads the widening across the cluster —
    // shuffle the proxy, not the payload (guide §2.3/§3.3).
    val wide = graft.core.Partitions.ensureParallelism(docs)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(copies - 1))).as("k"))
      .select((col("doc_id") * copies + col("k")).as("doc_id"),
        expr("regexp_replace(text, '(\\\\S+)', concat('$1q', k))").as("text"))
    Lexicon.bpeTrain(wide, "text", merges = 1100, vocabCap = vocabCap)
      .orderBy(col("step"))
  }

  /** UNCAPPED BPE inference gate — the codegen rank-loop encoder
    * ([[graft.operators.Lexicon.bpeApplyDeep]], merge-depth-independent
    * per-word cost) answers the SAME DuckDB oracle as q_bpe_apply's
    * replace-chain path: two independent Spark implementations and one
    * SQL mirror must all agree bit-for-bit. Depth itself (5k-merge
    * lists the replace-chain refuses) is pinned in LexiconSpec, where a
    * sequential-semantics driver mirror is cheap. */
  val q_bpe_apply_deep: Q = (s, dir) => {
    import graft.operators.Lexicon
    val docs = t(s, dir, "documents").df
    val table = artifactTable(s, "bpe_merges", dir, "documents")
    val merges = Lexicon.bpeMergesFor(docs, "text", table, merges = 4)
    Lexicon.bpeApplyDeep(docs, "doc_id", "text", merges)
      .orderBy(col("doc_id"))
  }

  /** Tokenizer INVERTIBILITY gate — encode every document into the
    * actual subword token stream (not just counts) with the PERSISTED
    * merge artifact, then DECODE it back (per-word token concatenation,
    * single-space word joins). The oracle recomputes the token stream
    * via the merge-CTE chain AND asserts `decoded` against the raw
    * whitespace-split words computed independently of any BPE machinery
    * — a lossy encoder is a hash mismatch, never a silent token-count
    * coincidence. BPE is concatenative, so the law is exact. */
  val q_bpe_roundtrip: Q = (s, dir) => {
    import graft.operators.Lexicon
    val docs = t(s, dir, "documents").df
    val table = artifactTable(s, "bpe_merges", dir, "documents")
    val merges = Lexicon.bpeMergesFor(docs, "text", table, merges = 4)
    Lexicon.bpeTokenize(docs, "doc_id", "text", merges)
      .orderBy(col("doc_id"))
  }

  /** The tokenizer's FINAL VOCABULARY artifact (the second file a BPE
    * tokenizer ships, next to the merge list): every surviving subword
    * symbol after 4 merges over the frequency-weighted corpus vocab,
    * with weighted occurrence counts and rank-stable 0-based token ids. */
  val q_bpe_vocab: Q = (s, dir) => {
    import graft.operators.Lexicon
    Lexicon.bpeVocab(t(s, dir, "documents").df, "text", merges = 4)
      .orderBy(col("token_id"))
  }

  /** Shared CTE chain for the BPE oracles: the same delimiter-prefixed
    * greedy-replace construction as `Lexicon.bpeTrain`, one CTE triple
    * (pair counts → deterministic top-1 → vocab after merge) per round.
    * Generated rather than hand-unrolled so the round template is
    * written once. */
  private def bpeCtes(rounds: Int): String = {
    val head =
      """WITH words AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents
        |), v0 AS MATERIALIZED (
        |  SELECT regexp_replace(w, '(.)', chr(1) || '\1' || chr(1), 'g') AS t, count(*) AS freq
        |  FROM words WHERE w <> '' GROUP BY 1
        |)""".stripMargin
    val body = (1 to rounds).map { k =>
      s""", p$k AS MATERIALIZED (
         |  SELECT a[i] AS lhs, a[i+1] AS rhs, CAST(sum(freq) AS BIGINT) AS n
         |  FROM (SELECT freq, list_filter(string_split(t, chr(1)), x -> x <> '') AS a
         |    FROM v${k - 1}) AS s$k,
         |  LATERAL unnest(generate_series(1, len(a) - 1)) AS u(i)
         |  GROUP BY 1, 2
         |), t$k AS (SELECT lhs, rhs, n FROM p$k ORDER BY n DESC, lhs, rhs LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT replace(t,
         |    chr(1) || (SELECT lhs FROM t$k) || chr(1) || chr(1) ||
         |      (SELECT rhs FROM t$k) || chr(1),
         |    chr(1) || (SELECT lhs FROM t$k) || (SELECT rhs FROM t$k) || chr(1)) AS t, freq
         |  FROM v${k - 1}
         |)""".stripMargin
    }.mkString("\n")
    s"$head\n$body"
  }

  private def bpeOracleSql(rounds: Int): String = {
    val sel = (1 to rounds)
      .map(k => s"SELECT $k AS step, lhs, rhs, n AS n_occurrences FROM t$k")
      .mkString("\nUNION ALL ")
    s"${bpeCtes(rounds)}\n$sel\nORDER BY step"
  }

  /** [[q_bpe_train_vocab_depth]] oracle: the SAME per-round semantics as
    * [[bpeOracleSql]] (pair count → deterministic top-1 → delimiter
    * replace) over the `copies`-widened vocabulary, emitted as a flat
    * STATEMENT SEQUENCE (`CREATE OR REPLACE TEMP TABLE` triple per
    * round, `SELECT` last — DuckDB's Python `sql()` runs the sequence
    * and returns the final relation) instead of one chained
    * MATERIALIZED-CTE statement: at 1100 rounds the chain exceeds
    * DuckDB's binder recursion limit and its single-statement bind time
    * grows super-linearly, while the flat sequence binds each round
    * independently (measured: 28 s total at 1100 rounds, sf0.01).
    * Widening happens at the WORD level (`w || 'qk'`) — identical to
    * the engine's text-level suffix since words are whitespace-split.
    * The drained-round guard keeps post-drain rounds inert (empty top-1
    * would otherwise NULL the vocab via scalar subqueries). */
  private def bpeDeepWideOracleSql(rounds: Int, copies: Int): String = {
    val sb = new StringBuilder
    sb ++=
      s"""CREATE OR REPLACE TEMP TABLE bpe_dw_v AS
         |SELECT regexp_replace(w || 'q' || CAST(k AS VARCHAR), '(.)', chr(1) || '\\1' || chr(1), 'g') AS t,
         |       count(*) AS freq
         |FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents),
         |     LATERAL unnest(generate_series(0, ${copies - 1})) AS g(k)
         |WHERE w <> ''
         |GROUP BY 1;
         |CREATE OR REPLACE TEMP TABLE bpe_dw_m (step INTEGER, lhs VARCHAR, rhs VARCHAR, n BIGINT);
         |""".stripMargin
    (1 to rounds).foreach { k =>
      sb ++=
        s"""CREATE OR REPLACE TEMP TABLE bpe_dw_t AS
           |SELECT lhs, rhs, n FROM (
           |  SELECT a[i] AS lhs, a[i+1] AS rhs, CAST(sum(freq) AS BIGINT) AS n
           |  FROM (SELECT freq, list_filter(string_split(t, chr(1)), x -> x <> '') AS a
           |    FROM bpe_dw_v) AS s,
           |  LATERAL unnest(generate_series(1, len(a) - 1)) AS u(i)
           |  GROUP BY 1, 2)
           |ORDER BY n DESC, lhs, rhs LIMIT 1;
           |INSERT INTO bpe_dw_m SELECT $k, lhs, rhs, n FROM bpe_dw_t;
           |CREATE OR REPLACE TEMP TABLE bpe_dw_v AS
           |SELECT CASE WHEN (SELECT count(*) FROM bpe_dw_t) = 0 THEN t
           |  ELSE replace(t,
           |    chr(1) || (SELECT lhs FROM bpe_dw_t) || chr(1) || chr(1) ||
           |      (SELECT rhs FROM bpe_dw_t) || chr(1),
           |    chr(1) || (SELECT lhs FROM bpe_dw_t) || (SELECT rhs FROM bpe_dw_t) || chr(1))
           |  END AS t, freq
           |FROM bpe_dw_v;
           |""".stripMargin
    }
    sb ++= "SELECT step, lhs, rhs, n AS n_occurrences FROM bpe_dw_m ORDER BY step"
    sb.toString
  }

  /** [[q_bpe_apply]] oracle: recompute the learned merges via the same
    * CTE chain, expose them as one cross-joined scalar row, and encode
    * every doc's words with the nested-replace chain inside a list
    * lambda — token count = delimiter count of the encoded word. */
  private def bpeApplyOracleSql(rounds: Int): String = {
    val mCols = (1 to rounds).map(k =>
      s"(SELECT lhs FROM t$k) AS l$k, (SELECT rhs FROM t$k) AS r$k")
      .mkString(", ")
    val enc = (1 to rounds).foldLeft(
      """regexp_replace(w, '(.)', chr(1) || '\1' || chr(1), 'g')""") { (acc, k) =>
      s"replace($acc, chr(1) || l$k || chr(1) || chr(1) || r$k || chr(1), " +
      s"chr(1) || l$k || r$k || chr(1))"
    }
    s"""${bpeCtes(rounds)}
       |, m AS (SELECT $mCols)
       |, tl AS (
       |  SELECT doc_id, coalesce(list_filter(string_split_regex(trim(text), '\\s+'),
       |    x -> x <> ''), CAST([] AS VARCHAR[])) AS ws
       |  FROM documents)
       |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens_raw,
       |  CAST(coalesce(list_sum(list_transform(ws, w ->
       |    (length($enc) - length(replace($enc, chr(1), ''))) // 2)), 0) AS BIGINT)
       |    AS n_tokens_bpe
       |FROM tl, m
       |ORDER BY doc_id""".stripMargin
  }

  /** [[q_bpe_roundtrip]] oracle: the same merge-CTE chain, the token
    * stream per word via the nested-replace encode + split, flattened
    * and chr(1)-joined — and `decoded` computed INDEPENDENTLY of the
    * encoder as the raw word list re-joined by spaces, which is what
    * pins losslessness. */
  private def bpeRoundtripOracleSql(rounds: Int): String = {
    val mCols = (1 to rounds).map(k =>
      s"(SELECT lhs FROM t$k) AS l$k, (SELECT rhs FROM t$k) AS r$k")
      .mkString(", ")
    val enc = (1 to rounds).foldLeft(
      """regexp_replace(w, '(.)', chr(1) || '\1' || chr(1), 'g')""") { (acc, k) =>
      s"replace($acc, chr(1) || l$k || chr(1) || chr(1) || r$k || chr(1), " +
      s"chr(1) || l$k || r$k || chr(1))"
    }
    val toks = s"list_filter(string_split($enc, chr(1)), x -> x <> '')"
    s"""${bpeCtes(rounds)}
       |, m AS (SELECT $mCols)
       |, tl AS (
       |  SELECT doc_id, coalesce(list_filter(string_split_regex(trim(text), '\\s+'),
       |    x -> x <> ''), CAST([] AS VARCHAR[])) AS ws
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(coalesce(list_sum(list_transform(ws, w -> len($toks))), 0)
       |    AS BIGINT) AS n_tokens_bpe,
       |  array_to_string(flatten(list_transform(ws, w -> $toks)), chr(1))
       |    AS tokens_joined,
       |  array_to_string(ws, ' ') AS decoded
       |FROM tl, m
       |ORDER BY doc_id""".stripMargin
  }

  /** [[q_bpe_vocab]] oracle: the final vocab CTE (v`rounds`) re-split
    * into symbols, tallied weighted by word frequency, ranked
    * (count desc, token asc) into 0-based token ids. */
  private def bpeVocabOracleSql(rounds: Int): String =
    s"""${bpeCtes(rounds)}
       |, sym AS (
       |  SELECT x AS token, CAST(sum(freq) AS BIGINT) AS n_occurrences
       |  FROM (SELECT freq, list_filter(string_split(t, chr(1)), x -> x <> '') AS a
       |    FROM v$rounds) AS s,
       |  LATERAL unnest(a) AS u(x)
       |  GROUP BY 1)
       |SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, token) - 1
       |    AS BIGINT) AS token_id,
       |  token, n_occurrences
       |FROM sym
       |ORDER BY token_id""".stripMargin

  /** Balanced training-shard assignment (longest-first round-robin over
    * the value-keyed global rank) at 16 shards: per-shard doc count,
    * char sum, and smallest doc id — all three pin the assignment. */
  val q_shard_assign: Q = (s, dir) => {
    import graft.operators.Split
    Split.shardBySize(
        t(s, dir, "documents").df.select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", nShards = 16)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"))
      .orderBy(col("shard"))
  }

  /** DSIR importance scores against the English slice as target: every
    * doc's exact integer micro-nat log-likelihood-ratio score (md5-prefix
    * buckets, add-1 smoothing, floor-quantized weights — the whole
    * reduction is integer arithmetic, so the oracle matches bit-for-bit
    * despite the ln in the weight formula). */
  val q_dsir_scores: Q = (s, dir) => {
    import graft.operators.Curate
    val docs = t(s, dir, "documents").df
    Curate.dsirScores(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Perplexity-proxy fluency scores: hashed-bigram LM trained on the
    * corpus itself, every doc's exact integer micro-nat log-probability
    * (add-1 smoothing over 256 buckets; floor-quantized weights make the
    * per-doc reduction integer-exact despite the ln). */
  val q_lm_score: Q = (s, dir) => {
    import graft.operators.Curate
    val docs = t(s, dir, "documents").df
    Curate.lmScores(docs, docs, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** CROSS-CORPUS perplexity gate — train on the English slice, score
    * EVERY document: non-English docs carry hashed-bigram transitions
    * (and at least one leading bucket) absent from the model, so BOTH
    * smoothed-floor fallbacks (`coalesce(__c2, 0)`, `coalesce(__c1, 0)`)
    * are exercised under the DuckDB oracle — the same-corpus q_lm_score
    * can never reach them (verified: 9 unseen pairs, 1 unseen x at
    * sf0.01). */
  val q_lm_score_cross: Q = (s, dir) => {
    import graft.operators.Curate
    val docs = t(s, dir, "documents").df
    Curate.lmScores(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** END-TO-END curation pipeline in ONE declarative plan — the
    * integration gate: quality filter → exact content dedup (keep
    * first) → per-source cap (100 longest) → token-budget cut (best
    * 10k tokens, longest-first) → sequence-packing index at context
    * 512. Every stage is an existing oracle-gated operator; the point
    * is that the WHOLE funnel composes into one Catalyst plan (the
    * quality filter reaches the scan, dedup/cap windows key on distinct
    * columns, the budget + pack cumsums share the bucketed-window
    * idiom) and the end result still bit-matches a five-CTE oracle. */
  val q_pipeline_e2e: Q = (s, dir) => {
    import graft.core.SortKey
    import graft.operators.{Chunk, Curate, Dedup}
    val docs = t(s, dir, "documents").df
      .filter(col("n_chars").between(20, 2000) &&
        length(trim(col("text"))) > 0)
    val deduped = Dedup.exact(docs, Dedup.contentKey(col("text")),
        Seq(col("doc_id")), keyName = "__fp").drop("__fp")
    val capped = Curate.capPerGroup(GTable(deduped, "d"), Seq("source"),
        Seq(col("n_chars").desc, col("doc_id")), k = 100).df
    val sized = capped.select(col("doc_id"), col("source"), col("text"),
      graft.functions.TextAnalysis.tokenCount(col("text")).cast("long")
        .as("n_tokens"))
    val budgeted = Curate.selectByBudget(sized,
        Seq(SortKey(col("n_tokens"), asc = false), SortKey(col("doc_id"))),
        "n_tokens", budget = 10000L)
      .drop("n_tokens", "tok_before")
    Chunk.packIndex(budgeted, "doc_id", "text", contextLen = 512)
      .orderBy(col("doc_id"))
  }

  /** Link-graph authority scoring: a deterministic synthetic citation
    * graph over the corpus (two modular out-links per doc, the house
    * idiom for structure the synthetic tables lack), ranked by 3
    * iterations of integer-exact damped PageRank — every rank a BIGINT
    * micro-mass, bit-identical across engines. */
  val q_pagerank: Q = (s, dir) => {
    import graft.operators.LinkGraph
    val ids = t(s, dir, "documents").df.select(col("doc_id"))
    val mRow = ids.agg(max(col("doc_id"))).head()
    require(!mRow.isNullAt(0), "documents table is empty (or doc_id " +
      "all-null) — no citation graph to rank")
    val m = mRow.getLong(0) + 1
    val e0 = ids.select(col("doc_id").as("src"),
        ((col("doc_id") * 7 + 3) % m).as("dst"))
      .unionByName(ids.select(col("doc_id").as("src"),
        ((col("doc_id") * 13 + 5) % m).as("dst")))
      .filter(col("src") =!= col("dst"))
    val edges = e0.join(ids.select(col("doc_id").as("dst")), "dst")
    // scale grows with the corpus: the operator requires >= 100 micro-units
    // of initial mass per node, and m (max doc_id + 1) bounds the node
    // count — a fixed 1e6 would hard-fail the first SF over 10k docs
    LinkGraph.pageRankMicro(edges, "src", "dst", iters = 3,
        scale = math.max(1000000L, 100L * m))
      .orderBy(col("node"))
  }

  /** Per-domain top-fraction quality cut: best 20% of each source by
    * n_chars (doc_id tie-break) — row-for-row equal to the per-group
    * rank law, computed via the histogram idiom (no per-group
    * row-count window). */
  val q_top_fraction: Q = (s, dir) => {
    import graft.operators.Curate
    Curate.topFractionPerGroup(
        t(s, dir, "documents").df.select(col("doc_id"), col("source"),
          col("n_chars")),
        Seq("source"), "n_chars", "doc_id", fraction = 0.2)
      .orderBy(col("doc_id"))
  }

  /** Per-source token-budget cut: every source gets 3000 tokens, filled
    * best-n_chars-first (doc_id tie-break), concat-and-cut admission —
    * the domain-mixing primitive, via the histogram idiom (no per-group
    * cumsum window over rows). */
  val q_budget_per_group: Q = (s, dir) => {
    import graft.operators.Curate
    val d = t(s, dir, "documents").df
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("source"), col("n_chars"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    Curate.budgetPerGroup(d, Seq("source"), "n_chars", "doc_id",
        "n_tokens", budget = 3000L)
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Token-budget selection: documents ranked longest-first (n_tokens
    * desc, doc_id tie-break), admitted while their exclusive token
    * offset starts inside a 15k-token budget — the fixed-compute
    * "best N tokens" cut, exact at every SF (the cut point moves, the
    * semantics don't). */
  val q_token_budget: Q = (s, dir) => {
    import graft.core.SortKey
    import graft.operators.Curate
    val d = t(s, dir, "documents").df
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    Curate.selectByBudget(d,
        Seq(SortKey(col("n_tokens"), asc = false), SortKey(col("doc_id"))),
        "n_tokens", budget = 15000L, offsetName = "tok_before")
      .orderBy(col("doc_id"))
  }

  /** Classifier quality filtering (inference side): every vector's exact
    * integer micro-logit under a fixed linear probe `w·x + b` plus its
    * keep decision at p ≥ 0.5 (logit ≥ 0). The dot product promotes
    * floats to double and sums sequentially on both engines, and the
    * floor-quantized micro-logit makes the gate integer-exact. */
  val q_classifier_score: Q = (s, dir) => {
    import graft.operators.Curate
    val w = Array.tabulate(64)(i => ((7 * i + 3) % 11 - 5) / 10.0)
    Curate.classifierScore(t(s, dir, "embeddings").df, "embedding",
        w, bias = 0.1, outCol = "__logit")
      .select(col("vec_id"),
        floor(lit(1e6) * col("__logit")).cast("long").as("logit_micro"),
        (col("__logit") >= 0).as("kept"))
      .orderBy(col("vec_id"))
  }

  /** Token-length bucketing at boundaries 30/45/60: per-bucket doc count,
    * token range, and pad-to-bucket-max waste. */
  val q_length_buckets: Q = (s, dir) => {
    import graft.operators.Chunk
    Chunk.lengthBuckets(t(s, dir, "documents").df, "doc_id", "text",
        boundaries = Seq(30, 45, 60))
      .orderBy(col("bucket"))
  }

  /** L2-normalized embeddings, exploded to (vec_id, i, x) rows — pins
    * every element bit-exactly without array-typed gate output. */
  val q_embed_normalize: Q = (s, dir) => {
    import graft.functions.VectorExpressions.vec_l2_normalize
    t(s, dir, "embeddings").df
      .select(col("vec_id"),
        posexplode(vec_l2_normalize(col("embedding"))))
      .select(col("vec_id"), col("pos").as("i"), col("col").as("x"))
      .orderBy(col("vec_id"), col("i"))
  }

  /** Symmetric int8 quantization (floor, clamp ±128/127) at per-vector
    * 127/maxAbs scale, exploded to (vec_id, i, q). */
  val q_embed_quantize: Q = (s, dir) => {
    import graft.functions.VectorExpressions.vec_quantize_int8
    t(s, dir, "embeddings").df
      .select(col("vec_id"),
        posexplode(vec_quantize_int8(col("embedding"))))
      .select(col("vec_id"), col("pos").as("i"), col("col").cast("int").as("q"))
      .orderBy(col("vec_id"), col("i"))
  }

  /** Weighted corpus mixing (training-data assembly): two sources at
    * weights 3:1 toward 4n target rows → exactly 3 and 1 whole epochs
    * per source (0.75/0.25 are exact binary fractions, so the rate
    * arithmetic has no Bernoulli remainder and the mix is fully
    * deterministic — the seeded fractional path is MixSpec's job). */
  val q_mix_weighted: Q = (s, dir) => {
    import graft.operators.Mix
    val docs = t(s, dir, "documents")
    val n = docs.df.count()
    Mix.weightedMix(Seq(
        docs.cloneTable("corpus_a") -> 3.0,
        docs.cloneTable("corpus_b") -> 1.0),
      targetRows = 4 * n)
      .df.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_copies"))
      .orderBy(col("doc_id"), col("source"))
  }

  /** TEMPERATURE mixing gate (alpha = 0.5 over a full corpus and a
    * 5x-smaller slice): the deterministic mixture footprint — per source,
    * the distinct docs mixed in and their total chars (epochs >= 1 for
    * both sources by construction, so every doc appears) — is emitted;
    * the Bernoulli remainder realization is checked IN-PLAN against the
    * plan's expected rate·n within 5 sd (the house idiom for
    * approximate-realization operators: statistics gated, never
    * emitted). */
  val q_mix_temperature: Q = (s, dir) => {
    import graft.operators.Mix
    val docs = t(s, dir, "documents")
    val big = docs.cloneTable("corpus_big")
    val small = GTable(docs.df.filter(col("doc_id") % 5 === 0), "corpus_small")
    // count each source ONCE and hand the sizes to the mixer — the gate
    // otherwise pays a redundant full-corpus count job
    val n = docs.df.count()
    val nSmall = small.df.count()
    val (mixed, plan) = Mix.temperatureMix(Seq(big, small), alpha = 0.5,
      targetRows = 2 * n, knownCounts = Some(Seq(n, nSmall)))
    val bounds = plan.map { case (name, ni, _, rate) =>
      (name, rate * ni, 2.5 * math.sqrt(ni.toDouble) + 1.0)
    }
    val boundDf = s.createDataFrame(bounds).toDF("source", "__exp", "__tol")
    val gate = mixed.df.groupBy(col("source"))
      .agg(count(lit(1)).cast("double").as("__realized"))
      .join(broadcast(boundDf), "source")
      .agg(((sum(when(abs(col("__realized") - col("__exp")) <= col("__tol"), 1)
          .otherwise(0)) === count(lit(1))) &&
        (count(lit(1)) === lit(bounds.size))).as("__ok"))
    mixed.df.groupBy(col("source"), col("doc_id"))
      .agg(min(col("n_chars")).as("__nc"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nc")).as("total_chars"))
      .crossJoin(broadcast(gate)).filter(col("__ok"))
      .select(col("source"), col("n_docs"), col("total_chars"))
      .orderBy(col("source"))
  }

  /** Gopher/RefinedWeb repetition signal: intra-document duplicate
    * word/2-gram/3-gram fractions (raw doubles — integer-derived
    * division is bit-exact vs the oracle). */
  val q_repetition: Q = (s, dir) =>
    t(s, dir, "documents").df.select(
      col("doc_id"),
      TextAnalysis.dupNgramFraction(col("text"), 1).as("dup_word_frac"),
      TextAnalysis.dupNgramFraction(col("text"), 2).as("dup_2gram_frac"),
      TextAnalysis.dupNgramFraction(col("text"), 3).as("dup_3gram_frac"))
      .orderBy(col("doc_id"))

  // ==================================================================
  // Deduplication (training-data pipeline operators)
  // ==================================================================

  import graft.operators.{Dedup, Similarity}

  /** Exact dedup by content fingerprint, first doc_id survives. */
  val q_dedup_exact: Q = (s, dir) =>
    Dedup.exact(t(s, dir, "documents").df,
        TextAnalysis.fingerprint(col("text")), Seq(col("doc_id").asc))
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))

  /** Exact 3-gram Jaccard near-dup pairs (inverted-index join, no
    * cartesian product) — the verification oracle for MinHash. */
  val q_dedup_ngram: Q = (s, dir) =>
    Dedup.ngramJaccardPairs(t(s, dir, "documents").df, "doc_id", "text",
        n = 3, minJaccard = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  /** MinHash-LSH RECALL GATE (oracle-checked): every exact 3-gram-Jaccard
    * pair at ≥ 0.8 must surface as an LSH band-collision candidate. The
    * output is the exact pairs semi-joined with the candidate set, so the
    * DuckDB exact-Jaccard oracle hash-matches iff LSH candidate recall is
    * 100% at this threshold (16 bands × 4 rows: per-pair miss probability
    * (1−0.8⁴)¹⁶ ≈ 2×10⁻⁴, deterministic hashes — verified at gate SF). */
  val q_dedup_minhash: Q = (s, dir) => {
    val docs = t(s, dir, "documents").df
    // The gate output is exact ∩ candidates, and banding membership is a
    // PER-PAIR property (signatures are per-doc, a pair collides iff one
    // of ITS bands hashes equal), so the candidate join runs over only
    // the docs that participate in an exact pair — a semi-join
    // pre-filter (guide §3.2) that shrinks the bucket self-join
    // quadratically with zero change to which pairs it emits. The exact
    // side is materialized once (it feeds both the filter and the
    // output), the q_dedup_semantic idiom.
    val exact = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", n = 3, minJaccard = 0.8)
      .localCheckpoint(true)
    val pairIds = exact.select(col("id_a").as("doc_id"))
      .unionByName(exact.select(col("id_b").as("doc_id"))).distinct()
    val cands = Dedup.minhashCandidates(
      docs.join(pairIds, Seq("doc_id"), "left_semi"), "doc_id", "text")
    exact.join(cands, Seq("id_a", "id_b"), "left_semi")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash RECALL GATE (oracle-checked): every ESSENTIALLY-IDENTICAL
    * pair (3-gram Jaccard ≥ 0.98 — SimHash's honest contract is
    * near-identical detection) must be flagged by chunk banding within
    * Hamming ≤ 7 (8×8-bit chunks: pigeonhole guarantees candidate recall
    * exactly to distance 7). Measured across sf0.001/0.01/0.1: j ≥ 0.98
    * pairs sit at distance ≤ 5 — margin 2 under the guarantee. (At
    * j ≥ 0.9 word-level SimHash reaches distance 11 on the larger
    * corpus; detecting those is MinHash's regime, gated above.) */
  val q_dedup_simhash: Q = (s, dir) => {
    val docs = t(s, dir, "documents").df
    // exact ∩ candidates with chunk-banding membership a PER-PAIR
    // property (codes are per-doc; a pair is a candidate iff ITS two
    // codes share a chunk and sit within the distance) — so the
    // 8-band×8-bit candidate join, whose 2^8-sized band value space is
    // the documented volume trade, runs over only the docs that
    // participate in an exact pair: the q_dedup_minhash semi-join
    // pre-filter (guide §3.2), output-identical by the per-pair
    // argument.
    val exact = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", n = 3, minJaccard = 0.98)
      .localCheckpoint(true)
    val pairIds = exact.select(col("id_a").as("doc_id"))
      .unionByName(exact.select(col("id_b").as("doc_id"))).distinct()
    val cands = Dedup.simhashPairs(
        docs.join(pairIds, Seq("doc_id"), "left_semi"),
        "doc_id", "text", maxDist = 7, chunkBits = 8)
      .select("id_a", "id_b")
    exact.join(cands, Seq("id_a", "id_b"), "left_semi")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** End-to-end near-dup removal (greedy keep-lowest-id over exact
    * n-gram-Jaccard pairs) — the corpus after dedup, not just the pairs. */
  val q_dedup_remove: Q = (s, dir) =>
    Dedup.removeNearDuplicates(t(s, dir, "documents").df, "doc_id", "text", 3, 0.5)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Near-dup CLUSTER ids via connected components over the exact
    * 3-gram-Jaccard pair graph: every doc gets the min doc_id reachable
    * through near-dup pairs (singletons = own id). Distributed min-label
    * propagation over the edge list; the DuckDB oracle recomputes it as
    * a recursive transitive closure. */
  val q_dedup_cluster: Q = (s, dir) =>
    Dedup.clusterNearDuplicates(t(s, dir, "documents").df, "doc_id", "text",
        n = 3, minJaccard = 0.5)
      .select(col("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id"))

  /** Embedding-cosine near-dup pairs above 0.35 (exact all-pairs at test
    * scale; LSH banding is the 100 TB path). */
  val q_dedup_embedding: Q = (s, dir) =>
    Dedup.embeddingCosinePairs(t(s, dir, "embeddings").df,
        "vec_id", "embedding", threshold = 0.35)
      .orderBy(col("id_a"), col("id_b"))

  /** SemDeDup RECALL-FLOOR GATE (oracle-checked, sketch-gate idiom):
    * cluster-scoped candidate generation ([[Dedup.semanticPairs]], k=8
    * spherical cells, top-3 multi-assignment) must recover ≥ 90% of the
    * exact cosine pairs at 0.35, or the in-plan gate empties the output
    * and the row count breaks against the unconditional exact oracle.
    * The floor is a floor, not 100%: this synthetic corpus is
    * near-uniform (no semantic cluster structure — ProbeSemantic
    * measures 0.95/0.97/0.96 recall at sf0.001/0.01/0.1), so
    * cluster-scoped pruning genuinely loses the tail, exactly the
    * recall-for-volume trade SemDeDup makes; on a corpus with real
    * duplicate structure the same parameters sit at 1.0. The gate
    * decision is IN-PLAN (a one-row broadcast join, no driver-side
    * counting); the exact side is materialized once up front so the
    * verification-grade all-pairs join doesn't run twice. */
  val q_dedup_semantic: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    // the exact side feeds BOTH the gate aggregate and the output —
    // materialize the (tiny: pairs above threshold) frame once so the
    // verification-grade all-pairs join runs once, not twice
    val exact = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", threshold = 0.35)
      .localCheckpoint(true)
    val cands = Dedup.semanticPairs(emb, "vec_id", "embedding", threshold = 0.35,
      nCentroids = 8, probes = 3).select(col("id_a"), col("id_b"), lit(1).as("__c"))
    val gate = exact.join(cands, Seq("id_a", "id_b"), "left")
      .agg((sum(coalesce(col("__c"), lit(0))) >= count(lit(1)) * 0.9).as("__ok"))
    exact.crossJoin(broadcast(gate)).filter(col("__ok"))
      .select(col("id_a"), col("id_b"), col("cosine"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // ==================================================================
  // Similarity search
  // ==================================================================

  /** Brute-force cosine top-20 against the vec_id=0 embedding. */
  val q_sim_topk: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 20)
  }

  /** HYBRID RETRIEVAL, reciprocal-rank fusion: the lexical retriever's
    * BM25 top-50 over documents.text and the vector retriever's exact
    * cosine top-50 over the aligned embeddings table (vec_id ≡ doc_id in
    * the fixture) fused with RRF (k0=60) into one top-25. Output is
    * (doc_id, n_lists, rrf_rank) — n_lists pins which documents both
    * retrievers agreed on; the fused double only orders, identically in
    * both engines because RRF scores are exact functions of integer
    * ranks. The oracle recomputes both rankings and the fusion in SQL. */
  val q_hybrid_rrf: Q = (s, dir) => {
    import graft.operators.{Fusion, Search}
    val docs = t(s, dir, "documents").df
    val emb = t(s, dir, "embeddings").df
    val idx = Search.buildBm25Index(docs, "doc_id", "text")
    val lex = Search.searchBm25(docs, idx, "doc_id", "hash join filter", k = 50)
      .select(col("doc_id"), col("bm25_rank").as("rank"))
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val vec = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 50)
      .select(col("vec_id").as("doc_id"), row_number().over(w).as("rank"))
    Fusion.rrf(Seq(lex, vec), "doc_id", "rank", topK = 25)
      .orderBy(col("rrf_rank"))
  }

  /** HYBRID RETRIEVAL, weighted Borda fusion over the SAME two top-50
    * rankings as [[q_hybrid_rrf]], lexical weighted 2× the vector side —
    * the linear-decay, weight-taking alternative to RRF. Rank-exact
    * doubles again, so the DuckDB re-derivation hash-matches. */
  val q_hybrid_borda: Q = (s, dir) => {
    import graft.operators.{Fusion, Search}
    val docs = t(s, dir, "documents").df
    val emb = t(s, dir, "embeddings").df
    val idx = Search.buildBm25Index(docs, "doc_id", "text")
    val lex = Search.searchBm25(docs, idx, "doc_id", "hash join filter", k = 50)
      .select(col("doc_id"), col("bm25_rank").as("rank"))
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val vec = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 50)
      .select(col("vec_id").as("doc_id"), row_number().over(w).as("rank"))
    Fusion.borda(Seq(lex -> 2.0, vec -> 1.0), "doc_id", "rank", topK = 25)
      .orderBy(col("borda_rank"))
  }

  /** BATCH RETRIEVAL gate: three queries scored against the BM25 index
    * in ONE distributed plan (corpus scanned once for the whole
    * workload; ranking windowed PER QUERY, never a global sort) — the
    * offline evaluation-sweep / hard-negative-mining shape. Top-10 per
    * query; corpus-global df/idf identical to the single-query path. */
  val q_search_bm25_batch: Q = (s, dir) => {
    import s.implicits._
    import graft.operators.Search
    val docs = t(s, dir, "documents").df
    val idx = Search.buildBm25Index(docs, "doc_id", "text")
    val queries = Seq((1, "hash join filter"), (2, "sort merge batch"),
      (3, "stream window agg")).toDF("qid", "qtext")
    Search.searchBm25Batch(idx, queries, "qid", "qtext", "doc_id", k = 10)
  }

  /** BATCH HYBRID RETRIEVAL gate: the 3-query lexical batch
    * (searchBm25Batch) and the 3-query vector batch
    * (bruteForceTopKBatch: one corpus scan scores the broadcast
    * workload; query vectors = the vec_id 0-2 embeddings) fused PER
    * QUERY with RRF — every stage windows/aggregates by query, the
    * shape that holds at a 10k-query workload. Both batch rankings and
    * the per-query fusion re-derived in SQL. */
  val q_hybrid_rrf_batch: Q = (s, dir) => {
    import s.implicits._
    import graft.operators.{Fusion, Search}
    val docs = t(s, dir, "documents").df
    val emb = t(s, dir, "embeddings").df
    val idx = Search.buildBm25Index(docs, "doc_id", "text")
    val queries = Seq((1, "hash join filter"), (2, "sort merge batch"),
      (3, "stream window agg")).toDF("qid", "qtext")
    val lex = Search.searchBm25Batch(idx, queries, "qid", "qtext",
        "doc_id", k = 50)
      .select(col("qid"), col("doc_id"), col("bm25_rank").as("rank"))
    val qvecs = emb.filter(col("vec_id") <= 2)
      .select((col("vec_id") + 1).cast("int").as("qid"), col("embedding"))
    val vec = Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding",
        qvecs, "qid", "embedding", k = 50)
      .select(col("qid"), col("vec_id").as("doc_id"),
        col("cos_rank").as("rank"))
    Fusion.rrfByQuery(Seq(lex, vec), "qid", "doc_id", "rank", topK = 25)
  }

  /** HARD-NEGATIVE MINING gate — the training-pair assembly batch
    * retrieval exists for: the 3-query BM25 batch top-50, anti-joined
    * per (query, id) against each query's positives (doc_id % 10 ==
    * qid), re-ranked per query — the 10 documents per query the
    * retriever itself confuses with the positives. Every stage is
    * query-keyed on top-k-bounded frames (the batch shape that holds at
    * a 10k-query workload); ranking, anti-join, and re-rank are all
    * re-derived in SQL by the oracle. */
  val q_hard_negatives: Q = (s, dir) => {
    import s.implicits._
    import graft.operators.{RankEval, Search}
    val docs = t(s, dir, "documents").df
    val idx = Search.buildBm25Index(docs, "doc_id", "text")
    val queries = Seq((1, "hash join filter"), (2, "sort merge batch"),
      (3, "stream window agg")).toDF("qid", "qtext")
    val ranking = Search.searchBm25Batch(idx, queries, "qid", "qtext",
      "doc_id", k = 50)
    val positives = docs.withColumn("qid", (col("doc_id") % 10).cast("int"))
      .join(queries.select("qid"), Seq("qid"))
      .select(col("qid"), col("doc_id"))
    RankEval.hardNegatives(ranking, positives, "qid", "doc_id",
      "bm25_rank", n = 10)
  }

  /** BATCH EVALUATION gate — the full offline loop: the 3-query batch
    * retrieval scored per query against per-query graded qrels
    * (relevant = doc_id % 10 == qid, grade 1 + doc_id % 3) in one plan;
    * every aggregate keys by query and the ideal-DCG window partitions
    * by query — the shape that holds at a 10k-query workload. */
  val q_rank_eval_batch: Q = (s, dir) => {
    import s.implicits._
    import graft.operators.{RankEval, Search}
    val docs = t(s, dir, "documents").df
    val idx = Search.buildBm25Index(docs, "doc_id", "text")
    val queries = Seq((1, "hash join filter"), (2, "sort merge batch"),
      (3, "stream window agg")).toDF("qid", "qtext")
    val ranking = Search.searchBm25Batch(idx, queries, "qid", "qtext",
      "doc_id", k = 10)
    val qrels = docs.withColumn("qid", (col("doc_id") % 10).cast("int"))
      .join(queries.select("qid"), Seq("qid"))
      .select(col("qid"), col("doc_id"),
        (lit(1) + col("doc_id") % 3).cast("double").as("grade"))
    RankEval.evaluateByQuery(ranking, qrels, "qid", "doc_id", "bm25_rank",
      10, Some("grade"))
  }

  /** RETRIEVAL EVALUATION gate: the two retrievers' rankings and their
    * RRF fusion each scored at k=25 against the same graded qrels
    * (doc_id % 10 == 3, grade 1 + doc_id % 3) — recall@25, MRR@25,
    * nDCG@25, MAP@25 per system, all four re-derived in SQL by the
    * oracle.
    * Metrics are aggregates, rounded to 4 (the house oracle rule). The
    * retriever lists are pinned once (top-50-sized) so the three eval
    * branches and the fusion read them without re-running retrieval. */
  val q_rank_eval: Q = (s, dir) => {
    import graft.operators.{Fusion, RankEval, Search}
    val docs = t(s, dir, "documents").df
    val emb = t(s, dir, "embeddings").df
    val idx = Search.buildBm25Index(docs, "doc_id", "text")
    val lex = Search.searchBm25(docs, idx, "doc_id", "hash join filter", k = 50)
      .select(col("doc_id"), col("bm25_rank").as("rank"))
      .localCheckpoint(true)
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val vec = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 50)
      .select(col("vec_id").as("doc_id"), row_number().over(w).as("rank"))
      .localCheckpoint(true)
    val rrf = Fusion.rrf(Seq(lex, vec), "doc_id", "rank", topK = 25)
    val qrels = docs.filter(col("doc_id") % 10 === 3)
      .select(col("doc_id"),
        (lit(1) + col("doc_id") % 3).cast("double").as("grade"))
    RankEval.evaluate(lex, qrels, "doc_id", "rank", 25,
        Some("grade"), "bm25")
      .unionByName(RankEval.evaluate(vec, qrels, "doc_id", "rank", 25,
        Some("grade"), "cosine"))
      .unionByName(RankEval.evaluate(rrf, qrels, "doc_id", "rrf_rank", 25,
        Some("grade"), "hybrid_rrf"))
      .orderBy(col("system"))
  }

  /** TAKEDOWN-VISIBLE-IN-THE-QUALITY-REPORT gate — retrieval-eval
    * composed with the delete tier the way q_corpus_erase_e2e composed
    * erase with rebuild: the BM25 artifact is built over the FULL
    * corpus, every doc_id % 30 == 3 (a strict subset of the qrels) is
    * taken down via the tombstone path, and BOTH rankings — the
    * pre-takedown in-memory build and the post-takedown SERVED index
    * (mask + corrected stats, q_search_bm25_delete's contract) — are
    * evaluated against the SAME unchanged qrels (ground truth does not
    * move when a document is taken down; the retriever just can't
    * return it). The oracle re-derives both BM25 rankings (full corpus
    * and survivors-with-corrected-stats) and all four metrics in SQL,
    * so the metric MOVEMENT is exactly the reduced-corpus prediction —
    * a takedown that silently failed (mask not applied, stats not
    * corrected) would leave the post row equal to the pre row or move
    * it off-oracle. */
  val q_rank_eval_takedown: Q = (s, dir) => {
    import graft.operators.{RankEval, Search}
    val docs = t(s, dir, "documents").df
    val pre = Search.searchBm25(docs,
        Search.buildBm25Index(docs, "doc_id", "text"),
        "doc_id", "hash join filter", k = 25)
      .select(col("doc_id"), col("bm25_rank").as("rank"))
      .localCheckpoint(true)
    val table = artifactTable(s, "bm25_ev_del", dir, "documents")
    onceUpserted(s, table) {
      Search.saveBm25Index(
        Search.buildBm25Index(docs, "doc_id", "text"), table)
      Search.deleteBm25Docs(s, table, docs.filter(col("doc_id") % 30 === 3)
        .select(col("doc_id")))
    }
    val idx = Search.loadBm25Index(s, table)
    val post = Search.searchBm25(docs.filter(col("doc_id") % 30 =!= 3), idx,
        "doc_id", "hash join filter", k = 25)
      .select(col("doc_id"), col("bm25_rank").as("rank"))
      .localCheckpoint(true)
    val qrels = docs.filter(col("doc_id") % 10 === 3)
      .select(col("doc_id"),
        (lit(1) + col("doc_id") % 3).cast("double").as("grade"))
    RankEval.evaluate(pre, qrels, "doc_id", "rank", 25,
        Some("grade"), "bm25_pre_takedown")
      .unionByName(RankEval.evaluate(post, qrels, "doc_id", "rank", 25,
        Some("grade"), "bm25_post_takedown"))
      .orderBy(col("system"))
  }

  /** LSH-ANN RECALL GATE (oracle-checked): the multi-table ANN top-20
    * (3 independent 8-bit tables, probe Hamming ≤ 4 each — per-table
    * miss probabilities multiply) must contain the entire exact cosine
    * top-10; output is the exact top-10 (id + exact cosine) semi-joined
    * with the ANN result, so the brute-force DuckDB oracle hash-matches
    * iff recall@10 = 100%. Like IVF, the probe fraction is high on this
    * near-uniform synthetic corpus — the gate pins the recall contract,
    * not the pruning ratio. */
  val q_sim_lsh: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val bucketed = Similarity.lshBucketsMulti(emb, "vec_id", "embedding",
      dims = 64, bits = 8, tables = 3)
    val ann = Similarity.lshTopKMulti(bucketed, "vec_id", "embedding", qvec, 20,
      bits = 8, probeDist = 4, tables = 3)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** LSH SERVING gate: identical recall contract to q_sim_lsh but the
    * probes run against the PERSISTED layout — one bucket-partitioned
    * projection per hash table; each probe set is enumerated and pushed
    * as an IN partition filter, so the scan reads only the probed
    * bucket directories. Hash planes are deterministic (splitmix64), so
    * the served and in-memory indexes are identical by construction.
    * Same oracle as q_sim_lsh. */
  val q_sim_lsh_serve: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val (table, fp) = fingerprintedArtifact(s, "lsh_idx", dir, "embeddings")
    Similarity.lshIndexFor(emb, "embedding", dims = 64, table,
      bits = 8, tables = 3, fingerprint = fp)
    val ann = Similarity.lshTopKServed(s, table, "vec_id", "embedding", qvec, 20,
      probeDist = 4)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** BATCH LSH recall gate: the 3-query workload served from the SAME
    * persisted bucket-partitioned projections as q_sim_lsh_serve in
    * ONE plan per hash table — each projection is scanned once with
    * the UNION of every query's probe set pushed as its IN partition
    * filter, candidates attach to probing queries via a broadcast
    * equi-join on the bucket id, and ranking windows per query.
    * Per-query probe sets are the single-query path's by construction
    * (shared codesWithin/queryCode), extending q_sim_lsh_serve's
    * recall contract to the whole workload: batch top-30 ⊇ each
    * query's exact cosine top-10. */
  val q_sim_lsh_batch: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val (table, fp) = fingerprintedArtifact(s, "lsh_idx", dir, "embeddings")
    Similarity.lshIndexFor(emb, "embedding", dims = 64, table,
      bits = 8, tables = 3, fingerprint = fp)
    val qvecs = emb.filter(col("vec_id") <= 2)
      .select((col("vec_id") + 1).cast("int").as("qid"), col("embedding"))
    val ann = Similarity.lshTopKServedBatch(s, table, "vec_id", "embedding",
      qvecs, "qid", "embedding", k = 30, probeDist = 4)
    annBatchContainment(emb, ann)
  }

  /** IVF-ANN RECALL GATE (oracle-checked): spherical k-means index
    * (cosine assignment — L2 cells on unnormalized embeddings split
    * cosine-near vectors by magnitude), probe the 12 of 16
    * cosine-nearest cells; the ANN top-20 must contain the entire exact
    * cosine top-10 (same semi-join shape as q_sim_lsh). The high probe
    * fraction is a property of this near-uniform synthetic corpus (top
    * cosine ≈ 0.37): cell pruning buys little when neighbors aren't
    * clustered — the gate pins the recall contract, not the speedup. */
  val q_sim_ivf: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", nCentroids = 16, iters = 3)
    val ann = Similarity.ivfTopK(idx, "vec_id", "embedding", qvec, 20, nProbe = 12)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** IVF SERVING gate: identical recall contract to q_sim_ivf but
    * against the PERSISTED index — assignments written partitioned by
    * cluster (probe filters prune partition directories at the source),
    * centroids loaded from the sibling table and cached. Built at most
    * once per session per SF; deterministic k-means makes the loaded
    * and freshly-built indexes identical. Same oracle as q_sim_ivf. */
  val q_sim_ivf_serve: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val (table, fp) = fingerprintedArtifact(s, "ivf_idx", dir, "embeddings")
    val idx = Similarity.ivfIndexFor(emb, "vec_id", "embedding", table,
      nCentroids = 16, iters = 3, fingerprint = fp)
    val ann = Similarity.ivfTopK(idx, "vec_id", "embedding", qvec, 20, nProbe = 12)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** Shared shape of the three BATCH ANN recall gates: the per-query
    * exact cosine top-10 (computed with the SAME hash-proven
    * [[graft.operators.Similarity.bruteForceTopK]] formula the
    * single-query gates anchor to DuckDB) semi-joined against the
    * batch ANN candidates per (query, id) — the output equals the
    * per-query exact top-10 iff batch recall@10 = 100% for EVERY query
    * in the workload. Queries are the vec_id 0-2 embeddings, keyed
    * qid = vec_id + 1 (the hybrid-batch convention). */
  private def annBatchContainment(emb: DataFrame,
      ann: DataFrame): DataFrame = {
    // the exact side is ONE batch plan (corpus scanned once for the
    // whole workload, per-query top-10 windows by qid) instead of a
    // per-query bruteForceTopK union — 3 corpus scans and a driver-side
    // query-vector collect job collapse into the single scan the ANN
    // side already uses (guide §1.2). bruteForceTopKBatch computes the
    // SAME sequential-double cosine (vec_dot / vec_norm·vec_norm, the
    // query norm now in-plan over the identical float→double values),
    // so the selected rows and their cosines bit-match the per-query
    // path the single-query gates anchor to DuckDB.
    val qvecs = emb.filter(col("vec_id") <= 2)
      .select((col("vec_id") + 1).cast("int").as("qid"), col("embedding"))
    val exact = Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding",
        qvecs, "qid", "embedding", k = 10)
      .select(col("qid"), col("vec_id"), col("cosine"))
    exact.join(ann.select(col("qid"), col("vec_id")),
        Seq("qid", "vec_id"), "left_semi")
      .orderBy(col("qid"), col("cosine").desc, col("vec_id"))
  }

  /** BATCH IVF recall gate: a 3-query workload served from the SAME
    * persisted cluster-partitioned artifact as q_sim_ivf_serve in ONE
    * plan — the scan reads the UNION of the workload's probed cells
    * (an IN partition filter, directory-pruned at the source), each
    * row scores only against the queries that probed its cell (a
    * broadcast equi-join on cluster, never a cross product), ranking
    * windows per query. Per-query probe sets are the single-query
    * path's by construction (shared probeCells), so this gate extends
    * the q_sim_ivf recall contract to every query in the workload:
    * the batch top-30 must contain each query's exact cosine top-10.
    * nProbe 15 of 16: queries 2-3 each keep one exact-top-10 neighbor
    * in a far cell of this near-uniform synthetic corpus (q_sim_ivf's
    * caveat, worse for arbitrary workload vectors than for vec_id 0) —
    * the gate pins the batch recall contract, not the pruning ratio. */
  val q_sim_ivf_batch: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val (table, fp) = fingerprintedArtifact(s, "ivf_idx", dir, "embeddings")
    val idx = Similarity.ivfIndexFor(emb, "vec_id", "embedding", table,
      nCentroids = 16, iters = 3, fingerprint = fp)
    val qvecs = emb.filter(col("vec_id") <= 2)
      .select((col("vec_id") + 1).cast("int").as("qid"), col("embedding"))
    val ann = Similarity.ivfTopKBatch(idx, "vec_id", "embedding",
      qvecs, "qid", "embedding", k = 30, nProbe = 15)
    annBatchContainment(emb, ann)
  }

  /** IVF INCREMENTAL-UPSERT gate: the serving artifact is built over the
    * BASE corpus only (vec_id % 5 != 0), then the delta (vec_id % 5 == 0
    * — including the query vector itself) is admitted through
    * [[graft.operators.Similarity.upsertIvfIndex]]: assigned with the
    * FROZEN base-trained centroids in one map-side pass and APPENDED
    * into the cluster-partitioned store — the base corpus is never
    * re-scanned, re-encoded, or rewritten (DedupSpec pins base-file
    * immutability at the filesystem level). The served top-20 over the
    * upserted index must still contain the exact cosine top-10 over the
    * FULL corpus — the recall contract survives the append even though
    * the centroids never saw the delta (the top hit, the query vector,
    * arrives VIA the upsert). Built-and-upserted ONCE per mtime-keyed
    * generation (the `onceUpserted` marker): upsert is append-only by
    * contract, so a repeated gate serves the admitted generation
    * instead of re-appending into it. Same oracle as q_sim_ivf. */
  val q_sim_ivf_upsert: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val table = artifactTable(s, "ivf_ups", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.saveIvfIndex(
        Similarity.ivfIndex(emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding", nCentroids = 16, iters = 3), table)
      Similarity.upsertIvfIndex(emb.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", table)
    }
    val idx = Similarity.loadIvfIndex(s, table)
    // nProbe 14 (vs q_sim_ivf's 12): centroids trained on 80% of a
    // near-uniform corpus rank the query's neighbors' cells slightly
    // worse than full-corpus training — measured: one top-10 vector
    // lands in cell rank 13-14 at sf0.001/sf0.01. The gate pins the
    // post-upsert recall CONTRACT; cell pruning on this synthetic
    // corpus was never the speedup story (see q_sim_ivf's scaladoc).
    val ann = Similarity.ivfTopK(idx, "vec_id", "embedding", qvec, 20, nProbe = 14)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** IVF MAINTENANCE-LOOP gate — the upsert-then-compact cadence for
    * the cluster-PARTITIONED artifact on the oracle path: base trained
    * on 80% of the corpus, delta admitted with frozen centroids via
    * [[graft.operators.Similarity.upsertIvfIndex]], then
    * [[graft.operators.Similarity.compactIvfIndex]] retrains spherical
    * k-means over the full corpus as a staged next generation and
    * promotes it by catalog rename + partition re-discovery
    * ([[graft.sources.Sources.promoteTable]]). The retrained geometry
    * equals a direct full-corpus build (deterministic k-means), so the
    * served top-20 must contain the exact cosine top-10 at q_sim_ivf's
    * own nProbe=12 — the recall contract this family always carries,
    * now asserted THROUGH the promote. Runs once per mtime-keyed
    * generation. Same oracle as q_sim_ivf. */
  val q_sim_ivf_compact: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val table = artifactTable(s, "ivf_cpt", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.saveIvfIndex(
        Similarity.ivfIndex(emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding", nCentroids = 16, iters = 3), table)
      Similarity.upsertIvfIndex(emb.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", table)
      Similarity.compactIvfIndex(s, table, "vec_id", "embedding", iters = 3)
    }
    val idx = Similarity.loadIvfIndex(s, table)
    val ann = Similarity.ivfTopK(idx, "vec_id", "embedding", qvec, 20, nProbe = 12)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** IVF CONCURRENT-MAINTENANCE gate — the lost-delta window for the
    * retrained family: [[graft.operators.Similarity
    * .buildNextIvfGeneration]] pins its input to the basis file set,
    * THEN the delta (including the query vector) is upserted into the
    * LIVE artifact with the old frozen centroids — the admission a
    * nightly retrain races against — and [[graft.operators.Similarity
    * .promoteIvfGeneration]]'s catch-up re-ASSIGNS the mid-build delta
    * with the NEW generation's centroids before the swap. Served top-20
    * must contain the exact cosine top-10 at nProbe=14 — the
    * q_sim_ivf_upsert geometry (centroids trained on 80% of the
    * corpus), because the promoted generation was retrained over the
    * basis snapshot, not the full corpus. Without the catch-up the
    * query's own neighborhood would be MISSING from the promoted
    * artifact, a hash mismatch, not a recall nuance. Same oracle as
    * q_sim_ivf. */
  val q_sim_ivf_catchup: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val table = artifactTable(s, "ivf_cu", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.saveIvfIndex(
        Similarity.ivfIndex(emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding", nCentroids = 16, iters = 3), table)
      Similarity.buildNextIvfGeneration(s, table, "vec_id", "embedding",
        iters = 3)
      Similarity.upsertIvfIndex(emb.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", table)
      Similarity.promoteIvfGeneration(s, table)
    }
    val idx = Similarity.loadIvfIndex(s, table)
    val ann = Similarity.ivfTopK(idx, "vec_id", "embedding", qvec, 20,
      nProbe = 14)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** IVF TAKEDOWN gate — the delete tier for the trained family: the
    * index is built over the FULL corpus, every vec_id % 7 == 3 (≈14%
    * of it, including members of the original top-10 neighborhood) is
    * deleted via [[graft.operators.Similarity.deleteVectors]] — one
    * tombstone commit, no file rewrite, nothing retrained — and the
    * served top-20 must (a) contain the exact cosine top-10 over the
    * REMAINING corpus (the DuckDB oracle) and (b) leak no deleted id:
    * an in-plan one-row broadcast gate empties the output if any
    * tombstoned vector survives the mask, turning a leak into a
    * driver-visible row-count break, not a recall nuance. nProbe=14 of
    * 16: the post-delete top-10 pulls in previously-rank-11+ neighbors
    * whose cells the tighter q_sim_ivf probe set may miss. */
  val q_sim_ivf_delete: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val remaining = emb.filter(col("vec_id") % 7 =!= 3)
    val exact = Similarity.bruteForceTopK(remaining, "vec_id", "embedding",
      qvec, 10)
    val table = artifactTable(s, "ivf_del", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.saveIvfIndex(
        Similarity.ivfIndex(emb, "vec_id", "embedding",
          nCentroids = 16, iters = 3), table)
      Similarity.deleteVectors(s, table,
        emb.filter(col("vec_id") % 7 === 3).select(col("vec_id")))
    }
    val idx = Similarity.loadIvfIndex(s, table)
    val ann = Similarity.ivfTopK(idx, "vec_id", "embedding", qvec, 20,
      nProbe = 14).select(col("vec_id")).localCheckpoint(true)
    val leakFree = ann.agg(
      (sum(when(col("vec_id") % 7 === 3, 1).otherwise(0)) === 0).as("__ok"))
    exact.join(ann, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(leakFree)).filter(col("__ok"))
      .select(col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** IVF RECLAIM gate — physical erasure AND geometry forgetting for
    * the trained family: after the takedown, the full
    * [[graft.operators.Similarity.compactIvfIndex]] cadence runs — the
    * staged retrain excludes the tombstoned vectors (the new centroids
    * are trained WITHOUT them — the deleted data stops shaping the
    * index, not just appearing in it), the promoted generation's files
    * no longer contain them (DeleteSpec reads the raw parquet), and the
    * consumed tombstones leave the sibling — then the same
    * recall-plus-no-leak contract must hold against the retrained
    * geometry with NO mask left in the plan. Same oracle as
    * q_sim_ivf_delete. */
  val q_sim_ivf_reclaim: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val remaining = emb.filter(col("vec_id") % 7 =!= 3)
    val exact = Similarity.bruteForceTopK(remaining, "vec_id", "embedding",
      qvec, 10)
    val table = artifactTable(s, "ivf_rcl", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.saveIvfIndex(
        Similarity.ivfIndex(emb, "vec_id", "embedding",
          nCentroids = 16, iters = 3), table)
      Similarity.deleteVectors(s, table,
        emb.filter(col("vec_id") % 7 === 3).select(col("vec_id")))
      Similarity.compactIvfIndex(s, table, "vec_id", "embedding", iters = 3)
    }
    val idx = Similarity.loadIvfIndex(s, table)
    val ann = Similarity.ivfTopK(idx, "vec_id", "embedding", qvec, 20,
      nProbe = 14).select(col("vec_id")).localCheckpoint(true)
    val leakFree = ann.agg(
      (sum(when(col("vec_id") % 7 === 3, 1).otherwise(0)) === 0).as("__ok"))
    exact.join(ann, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(leakFree)).filter(col("__ok"))
      .select(col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** Build-and-upsert ONCE per artifact generation for the `_upsert`
    * gates: the `<table>_upserted` marker records a completed
    * base-build + delta-append for the mtime-keyed generation, so later
    * runs serve directly — the real cadence (a delta is admitted once,
    * then served many times), and the reason re-appending on every
    * query would be wrong anyway (upsert is append-only: a second
    * admission double-counts). Crash-safe: the marker is written LAST,
    * and every builder starts with replaceTable, so a half-applied
    * generation can never serve — the next run rebuilds it whole. */
  private def onceUpserted(s: SparkSession, table: String)(
      buildAndUpsert: => Unit): Unit = {
    import s.implicits._
    val marker = s"${table}_upserted"
    if (!s.catalog.tableExists(marker)) {
      buildAndUpsert
      graft.sources.Sources.replaceTable(s, marker)
      Seq(1).toDF("done").write.mode("overwrite").saveAsTable(marker)
    }
  }

  /** LSH INCREMENTAL-UPSERT gate — the second artifact family's append
    * path: the bucket-partitioned per-table layouts are built over the
    * BASE corpus (vec_id % 5 != 0), then the delta (including the query
    * vector) is hashed with the artifact's pinned (bits, tables, dims)
    * and appended via [[graft.operators.Similarity.upsertLshIndex]].
    * Unlike IVF/PQ there is NOTHING trained to drift: the hyperplanes
    * are deterministic splitmix64 functions, so the upserted layout is
    * content-identical to a full rebuild (DedupSpec asserts served
    * top-k equality) and q_sim_lsh_serve's recall contract transfers
    * unchanged. Same oracle as q_sim_lsh. */
  val q_sim_lsh_upsert: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val table = artifactTable(s, "lsh_ups", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.saveLshIndex(emb.filter(col("vec_id") % 5 =!= 0),
        "embedding", dims = 64, table, bits = 8, tables = 3)
      Similarity.upsertLshIndex(emb.filter(col("vec_id") % 5 === 0),
        "embedding", table)
    }
    val ann = Similarity.lshTopKServed(s, table, "vec_id", "embedding",
      qvec, 20, probeDist = 4)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** LSH MAINTENANCE-LOOP gate — completes the quartet with
    * q_search_bm25_compact / q_sim_ivf_compact / q_sim_pq_compact: the
    * bucket-partitioned projections are built over the BASE corpus,
    * the delta (including the query vector) appended via
    * [[graft.operators.Similarity.upsertLshIndex]], then
    * [[graft.operators.Similarity.compactLshIndex]] rewrites every
    * projection FROM ITS OWN CONTENT (hyperplanes are deterministic —
    * nothing retrains; compaction heals the per-bucket file
    * accumulation) as staged generations promoted by catalog rename
    * ([[graft.sources.Sources.promoteTable]]). The served top-20 over
    * the compacted layout must contain the exact cosine top-10 —
    * q_sim_lsh's own recall contract, asserted THROUGH the promote.
    * Runs once per mtime-keyed generation. Same oracle as q_sim_lsh. */
  val q_sim_lsh_compact: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val table = artifactTable(s, "lsh_cpt", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.saveLshIndex(emb.filter(col("vec_id") % 5 =!= 0),
        "embedding", dims = 64, table, bits = 8, tables = 3)
      Similarity.upsertLshIndex(emb.filter(col("vec_id") % 5 === 0),
        "embedding", table)
      Similarity.compactLshIndex(s, table)
    }
    val ann = Similarity.lshTopKServed(s, table, "vec_id", "embedding",
      qvec, 20, probeDist = 4)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** LSH CONCURRENT-MAINTENANCE gate — the lost-delta window for the
    * deterministic family: [[graft.operators.Similarity
    * .buildNextLshLayout]] pins every projection's rewrite to its basis
    * file set, THEN the delta (including the query vector) is upserted
    * into the LIVE projections, and [[graft.operators.Similarity
    * .promoteLshLayout]]'s catch-up COPIES the mid-build files into
    * each staged projection before the swaps (hyperplanes are
    * deterministic — the copied bucket codes are exactly what a rebuild
    * would assign; nothing re-hashes). Served top-20 must contain the
    * exact cosine top-10 at q_sim_lsh's own probeDist=4: without the
    * catch-up, the promoted projections would be missing the query's
    * neighborhood entirely. Same oracle as q_sim_lsh. */
  val q_sim_lsh_catchup: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val table = artifactTable(s, "lsh_cu", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.saveLshIndex(emb.filter(col("vec_id") % 5 =!= 0),
        "embedding", dims = 64, table, bits = 8, tables = 3)
      Similarity.buildNextLshLayout(s, table)
      Similarity.upsertLshIndex(emb.filter(col("vec_id") % 5 === 0),
        "embedding", table)
      Similarity.promoteLshLayout(s, table)
    }
    val ann = Similarity.lshTopKServed(s, table, "vec_id", "embedding",
      qvec, 20, probeDist = 4)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** LSH TAKEDOWN gate — the delete tier for the deterministic family:
    * the bucket-partitioned projections are built over the FULL corpus,
    * vec_id % 7 == 3 deleted (one tombstone commit covers every
    * projection — the sibling keys on the artifact prefix), and the
    * served top-20 must contain the exact cosine top-10 over the
    * remaining corpus with no deleted id leaking (the in-plan gate of
    * q_sim_ivf_delete). Masking happens once, after the cross-
    * projection candidate dedup — one broadcast anti-join per query,
    * not one per projection. q_sim_lsh's own probeDist=4. */
  val q_sim_lsh_delete: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val remaining = emb.filter(col("vec_id") % 7 =!= 3)
    val exact = Similarity.bruteForceTopK(remaining, "vec_id", "embedding",
      qvec, 10)
    val table = artifactTable(s, "lsh_del", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.saveLshIndex(emb, "embedding", dims = 64, table,
        bits = 8, tables = 3)
      Similarity.deleteVectors(s, table,
        emb.filter(col("vec_id") % 7 === 3).select(col("vec_id")))
    }
    val ann = Similarity.lshTopKServed(s, table, "vec_id", "embedding",
      qvec, 20, probeDist = 4).select(col("vec_id")).localCheckpoint(true)
    val leakFree = ann.agg(
      (sum(when(col("vec_id") % 7 === 3, 1).otherwise(0)) === 0).as("__ok"))
    exact.join(ann, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(leakFree)).filter(col("__ok"))
      .select(col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** LSH RECLAIM gate — physical erasure for the deterministic family:
    * after the takedown, [[graft.operators.Similarity.compactLshIndex]]
    * rewrites every projection WITHOUT the tombstoned ids (nothing
    * retrains — hyperplanes are deterministic, so the reclaimed layout
    * is content-identical to a direct build over the survivors, pinned
    * in DeleteSpec) and the consumed tombstones leave the sibling; the
    * recall-plus-no-leak contract must hold with NO mask left in the
    * plan. Same oracle as q_sim_lsh_delete. */
  val q_sim_lsh_reclaim: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val remaining = emb.filter(col("vec_id") % 7 =!= 3)
    val exact = Similarity.bruteForceTopK(remaining, "vec_id", "embedding",
      qvec, 10)
    val table = artifactTable(s, "lsh_rcl", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.saveLshIndex(emb, "embedding", dims = 64, table,
        bits = 8, tables = 3)
      Similarity.deleteVectors(s, table,
        emb.filter(col("vec_id") % 7 === 3).select(col("vec_id")))
      Similarity.compactLshIndex(s, table)
    }
    val ann = Similarity.lshTopKServed(s, table, "vec_id", "embedding",
      qvec, 20, probeDist = 4).select(col("vec_id")).localCheckpoint(true)
    val leakFree = ann.agg(
      (sum(when(col("vec_id") % 7 === 3, 1).otherwise(0)) === 0).as("__ok"))
    exact.join(ann, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(leakFree)).filter(col("__ok"))
      .select(col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** PQ INCREMENTAL-UPSERT gate — the third artifact family's append
    * path: codebooks are trained over the BASE corpus only, the delta
    * (including the query vector) is encoded with those FROZEN codebooks
    * in one map-side `pq_encode` pass and appended
    * ([[graft.operators.Similarity.upsertPqIndex]]) — the corpus is
    * never re-encoded, the PQ-at-scale invariant. The reranked top-20
    * over the upserted store must contain the exact full-corpus cosine
    * top-10: the ADC candidate generation survives encoding today's
    * delta with yesterday's codebooks (drift resets on
    * `compactPqIndex`'s cadence, pinned in DedupSpec). Same oracle as
    * q_sim_pq. */
  val q_sim_pq_upsert: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val table = artifactTable(s, "pq_ups", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.savePqIndex(
        Similarity.pqIndex(emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding", dims = 64, m = 16, nCodes = 32, iters = 8,
          sampleN = 2048), table)
      Similarity.upsertPqIndex(emb.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", table)
    }
    val idx = Similarity.loadPqIndex(s, table)
    val ann = Similarity.pqTopK(idx, "vec_id", "embedding", qvec, 20,
      candidates = 500)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** PQ MAINTENANCE-LOOP gate — completes the trio with
    * q_search_bm25_compact and q_sim_ivf_compact: base codebooks trained
    * on 80% of the corpus, delta encoded with the FROZEN codebooks via
    * [[graft.operators.Similarity.upsertPqIndex]], then
    * [[graft.operators.Similarity.compactPqIndex]] retrains per-subspace
    * k-means over the full corpus and re-encodes into a staged next
    * generation promoted by catalog rename. The reranked top-20 over the
    * promoted generation must contain the exact cosine top-10 —
    * q_sim_pq's own contract, asserted THROUGH the promote. Runs once
    * per mtime-keyed generation. Same oracle as q_sim_pq. */
  val q_sim_pq_compact: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val table = artifactTable(s, "pq_cpt", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.savePqIndex(
        Similarity.pqIndex(emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding", dims = 64, m = 16, nCodes = 32, iters = 8,
          sampleN = 2048), table)
      Similarity.upsertPqIndex(emb.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", table)
      Similarity.compactPqIndex(s, table, "vec_id", "embedding", iters = 8,
        sampleN = 2048)
    }
    val idx = Similarity.loadPqIndex(s, table)
    val ann = Similarity.pqTopK(idx, "vec_id", "embedding", qvec, 20,
      candidates = 500)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** PQ CONCURRENT-MAINTENANCE gate — the lost-delta window for the
    * encoded family, and the sharpest of the four: a delta upserted
    * during a PQ retrain carries codes from the OLD codebooks, which
    * the retrain invalidates — so [[graft.operators.Similarity
    * .promotePqGeneration]]'s catch-up must not just carry the rows
    * over but re-ENCODE them with the NEW generation's codebooks
    * (CatchUpSpec pins the code equality). Base codebooks train on 80%
    * of the corpus, the staged retrain snapshots that basis, the delta
    * (including the query vector) lands mid-build via
    * [[graft.operators.Similarity.upsertPqIndex]], and the promoted
    * generation's reranked top-20 must contain the exact cosine
    * top-10 — q_sim_pq_upsert's contract. Same oracle as q_sim_pq. */
  val q_sim_pq_catchup: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val table = artifactTable(s, "pq_cu", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.savePqIndex(
        Similarity.pqIndex(emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding", dims = 64, m = 16, nCodes = 32, iters = 8,
          sampleN = 2048), table)
      Similarity.buildNextPqGeneration(s, table, "vec_id", "embedding",
        iters = 8, sampleN = 2048)
      Similarity.upsertPqIndex(emb.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", table)
      Similarity.promotePqGeneration(s, table)
    }
    val idx = Similarity.loadPqIndex(s, table)
    val ann = Similarity.pqTopK(idx, "vec_id", "embedding", qvec, 20,
      candidates = 500)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** STREAMING LSH ingest gate — completes the streaming-admission
    * symmetry across the serving families on the ORACLE path: the
    * bucket-partitioned projections are built over 80% of the corpus,
    * the remaining vectors (including the query vector) STREAM in
    * through [[graft.streaming.Streaming.lshIngestSink]] (per-batch
    * deterministic-hyperplane hashing into idempotent
    * `batch=<id>/t<k>/bucket=<b>` segments, last projection as the
    * completeness marker), and the served top-20 over base ∪ admitted
    * segments must contain the exact cosine top-10 — q_sim_lsh's own
    * recall contract; hyperplanes are deterministic, so base ∪ segments
    * is content-identical to a rebuild and the contract transfers
    * unchanged. Admitted once per mtime-keyed generation; the segments
    * persist beside the artifact and are SERVED here (folding is pinned
    * in StreamingSpec). Same oracle as q_sim_lsh. */
  val q_stream_lsh_ingest: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val table = artifactTable(s, "lsh_ing", dir, "embeddings")
    val segDir = s"${s.conf.get("spark.sql.warehouse.dir")}/${table}_segs"
    onceUpserted(s, table) {
      Similarity.saveLshIndex(emb.filter(col("vec_id") % 5 =!= 0),
        "embedding", dims = 64, table, bits = 8, tables = 3)
      // clear segments from a crashed prior attempt: a rerun may slice
      // fewer batches, and per-batch overwrite only replaces its own id
      val hp = new org.apache.hadoop.fs.Path(segDir)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val stream = graft.streaming.Streaming.fileStream(s, dir,
        "embeddings.parquet").filter(col("vec_id") % 5 === 0)
      val q = graft.streaming.Streaming.lshIngestSink(stream, table,
        "embedding", segDir)
      try q.processAllAvailable() finally q.stop()
    }
    val ann = Similarity.lshTopKServedWithSegments(s, table, "vec_id",
      "embedding", qvec, 20, probeDist = 4, segDir)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** STREAMING IVF ingest gate — the last ingest family joins the
    * hash-checked path (r11 ran it under ScalaTest only, reasoning that
    * centroids aren't oracle-expressible; the SERVE-path recall
    * contract is, exactly as in q_sim_ivf_upsert): centroids trained on
    * 80% of the corpus, the remaining vectors (including the query
    * vector) STREAM in through
    * [[graft.streaming.Streaming.ivfIngestSink]] (per-batch map-side
    * frozen-centroid assignment into idempotent
    * `batch=<id>/cluster=<c>` segments), and the served top-20 over
    * base ∪ admitted segments — probe pruning spanning base and segment
    * partitions alike — must contain the exact full-corpus cosine
    * top-10 at q_sim_ivf_upsert's nProbe=14 (same split, same
    * frozen-centroid contract, so the measured recall transfers).
    * Admitted once per mtime-keyed generation; segments persist and are
    * SERVED here (folding pinned in StreamingSpec). Same oracle as
    * q_sim_ivf. */
  val q_stream_ivf_ingest: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val table = artifactTable(s, "ivf_ing", dir, "embeddings")
    val segDir = s"${s.conf.get("spark.sql.warehouse.dir")}/${table}_segs"
    onceUpserted(s, table) {
      Similarity.saveIvfIndex(
        Similarity.ivfIndex(emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding", nCentroids = 16, iters = 3), table)
      val hp = new org.apache.hadoop.fs.Path(segDir)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val stream = graft.streaming.Streaming.fileStream(s, dir,
        "embeddings.parquet").filter(col("vec_id") % 5 === 0)
      val q = graft.streaming.Streaming.ivfIngestSink(stream, table,
        "embedding", segDir)
      try q.processAllAvailable() finally q.stop()
    }
    val idx = Similarity.loadIvfIndexWithSegments(s, table, segDir)
    val ann = Similarity.ivfTopK(idx, "vec_id", "embedding", qvec, 20,
      nProbe = 14)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** STREAMING PQ ingest gate — the compressed-scan tier's live
    * admission on the oracle path: codebooks are trained over 80% of
    * the corpus, the remaining vectors (including the query vector)
    * STREAM in through [[graft.streaming.Streaming.pqIngestSink]]
    * (per-batch FROZEN-codebook map-side encode into idempotent plain
    * `batch=<id>` segments, `_SUCCESS` as the completeness marker), and
    * the reranked top-20 over base ∪ admitted segments must contain the
    * exact full-corpus cosine top-10 — q_sim_pq_upsert's contract,
    * asserted through the streamed admission (base ∪ segments is
    * content-identical to upserting every batch). Admitted once per
    * mtime-keyed generation; segments persist and are SERVED here
    * (folding pinned in StreamingSpec). Same oracle as q_sim_pq. */
  val q_stream_pq_ingest: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val table = artifactTable(s, "pq_ing", dir, "embeddings")
    val segDir = s"${s.conf.get("spark.sql.warehouse.dir")}/${table}_segs"
    onceUpserted(s, table) {
      Similarity.savePqIndex(
        Similarity.pqIndex(emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding", dims = 64, m = 16, nCodes = 32, iters = 8,
          sampleN = 2048), table)
      val hp = new org.apache.hadoop.fs.Path(segDir)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val stream = graft.streaming.Streaming.fileStream(s, dir,
        "embeddings.parquet").filter(col("vec_id") % 5 === 0)
      val q = graft.streaming.Streaming.pqIngestSink(stream, table,
        "embedding", segDir)
      try q.processAllAvailable() finally q.stop()
    }
    val idx = Similarity.loadPqIndexWithSegments(s, table, segDir)
    val ann = Similarity.pqTopK(idx, "vec_id", "embedding", qvec, 20,
      candidates = 500)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** PQ-ANN RECALL GATE (oracle-checked): product-quantize to 16
    * subspaces × 32 codes (16 bytes of codes standing in for 256 bytes
    * of floats during candidate generation), ADC-score the corpus
    * against the query's lookup table, exact-rerank the best 500
    * candidates with the full vectors; the reranked top-20 must contain
    * the entire exact cosine top-10 (same semi-join shape as
    * q_sim_lsh/q_sim_ivf). The generous candidate pool is a property of
    * this near-uniform synthetic corpus (top cosine ≈ 0.37 — tiny gaps
    * between ranks); the gate pins the recall contract of the
    * compressed-scan path. */
  val q_sim_pq: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qvec, 10)
    val idx = Similarity.pqIndex(emb, "vec_id", "embedding", dims = 64,
      m = 16, nCodes = 32, iters = 8, sampleN = 2048)
    val ann = Similarity.pqTopK(idx, "vec_id", "embedding", qvec, 20,
      candidates = 500)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** BATCH PQ recall gate: the 3-query workload scored against the
    * encoded corpus in TWO scans total (vs one per query): scan one
    * evaluates every query's ADC lookup table per code row inside one
    * codegen'd expression (pq_adc_score_multi — the LUT stack is a
    * KB-sized reference object) and window-ranks candidates per
    * query; scan two fetches exactly the candidate vectors (broadcast
    * request-sized candidate set) for the exact cosine rerank.
    * Candidate selection order matches pqTopK's (__adc desc, id), so
    * per-query candidate sets are the single-query path's by
    * construction. Batch top-30 ⊇ each query's exact top-10, at
    * q_sim_pq's own candidates=500. */
  val q_sim_pq_batch: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val idx = Similarity.pqIndex(emb, "vec_id", "embedding", dims = 64,
      m = 16, nCodes = 32, iters = 8, sampleN = 2048)
    val qvecs = emb.filter(col("vec_id") <= 2)
      .select((col("vec_id") + 1).cast("int").as("qid"), col("embedding"))
    val ann = Similarity.pqTopKBatch(idx, "vec_id", "embedding",
      qvecs, "qid", "embedding", k = 30, candidates = 500)
    annBatchContainment(emb, ann)
  }

  /** FILTERED exact vector search: cosine top-10 among rows passing a
    * metadata predicate (label < 5, ~half the corpus) — the
    * "nearest English docs" shape. Pre-filtering: the predicate rides
    * the scan (PushedFilters at the parquet source, pinned in
    * PushdownSpec), so exactness within the filtered corpus holds by
    * construction. Oracle is the same ranking with a WHERE clause. */
  val q_sim_filtered: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    Similarity.bruteForceTopKFiltered(emb, "vec_id", "embedding",
      col("label") < 5, qvec, 10)
  }

  /** FILTERED IVF recall gate: the bucketed serve path with the same
    * label < 5 predicate composed INSIDE the probed-cell scan (cluster
    * IN prunes partition directories, the predicate prunes row groups
    * within them) — served from the SAME persisted artifact as
    * q_sim_ivf_serve, whose assigned frame carries the label column
    * precisely so filtered serves cost no join. The filtered top-30 at
    * nProbe 14/16 must contain the exact FILTERED top-10: a filter
    * thins every cell, so the filtered top-k reaches deeper into the
    * corpus than the unfiltered one — the wider probe is the
    * documented filtered-ANN trade, and the gate pins that the recall
    * contract survives it. Oracle: exact filtered top-10. */
  val q_sim_ivf_filtered: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val pred = col("label") < 5
    val exact = Similarity.bruteForceTopKFiltered(emb, "vec_id",
      "embedding", pred, qvec, 10)
    val (table, fp) = fingerprintedArtifact(s, "ivf_idx", dir, "embeddings")
    val idx = Similarity.ivfIndexFor(emb, "vec_id", "embedding", table,
      nCentroids = 16, iters = 3, fingerprint = fp)
    val ann = Similarity.ivfTopKFiltered(idx, "vec_id", "embedding", pred,
      qvec, 30, nProbe = 14)
    exact.join(ann.select("vec_id"), Seq("vec_id"), "left_semi")
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** LATE-INTERACTION retrieval (MaxSim, ColBERT scoring): documents
    * and the query are bags of 4 token vectors (the deterministic
    * sliceTokens adapter over the 64-dim fixture embeddings — 16 dims
    * per token), score = Σ per-query-token max-cosine over doc tokens.
    * One token-table scan, literal query tokens (no join), per-doc
    * hash-aggregate of order-insensitive maxes, fixed-order Σ — the
    * oracle recomputes the full scoring surface with list_slice +
    * conditional-max pivots and must match the double bit-for-bit. */
  val q_sim_maxsim: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val sub = qvec.length / 4
    val qtoks = (0 until 4).map(i => qvec.slice(i * sub, (i + 1) * sub))
    val docTokens = Similarity.sliceTokens(emb, "vec_id", "embedding",
      qvec.length, 4)
    Similarity.maxSimTopK(docTokens, "vec_id", "tok_vec", qtoks, 10)
  }

  /** BATCH MaxSim: the 3-query workload (qid = vec_id + 1) served in
    * ONE token-table scan — query vectors sliced in-plan and broadcast,
    * per-(query, doc) maxes in one hash-aggregate, ranking windowed per
    * query. The late-interaction member of the batch family
    * (q_search_bm25_batch / q_sim_ivf_batch / q_hybrid_rrf_batch);
    * unlike the recall-containment ANN gates this one is EXACT, so the
    * oracle pins ids, ranks, and the maxsim double itself per query. */
  val q_sim_maxsim_batch: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val docTokens = Similarity.sliceTokens(emb, "vec_id", "embedding", 64, 4)
    val qvecs = emb.filter(col("vec_id") <= 2)
      .select((col("vec_id") + 1).cast("int").as("qid"), col("embedding"))
    Similarity.maxSimTopKBatch(docTokens, "vec_id", "tok_vec",
      qvecs, "qid", "embedding", dim = 64, tokens = 4, k = 10)
  }

  /** MMR DIVERSIFICATION gate: each query's exact cosine top-30 (the
    * batch brute-force retriever) greedily re-ranked to a top-10 that
    * balances relevance against redundancy (λ = 0.5) — the diversify
    * stage of the retrieval stack, run per query on the top-N-bounded
    * candidate frame (request-scale; the corpus-scale work happened in
    * the retriever). The oracle replays the ENTIRE greedy trajectory in
    * SQL — 10 chained argmax CTEs per query, penalty as a correlated
    * max-cosine over the picked set — so a single divergent pick at any
    * step fails the gate; both engines compute every cosine with the
    * same sequential-dot arithmetic, and ties break (score desc, rel
    * desc, id asc) identically by construction. */
  val q_mmr_rerank: Q = (s, dir) => {
    import graft.operators.Diversify
    val emb = t(s, dir, "embeddings").df
    val qvecs = emb.filter(col("vec_id") <= 2)
      .select((col("vec_id") + 1).cast("int").as("qid"), col("embedding"))
    val cands = Similarity.bruteForceTopKBatch(emb, "vec_id", "embedding",
        qvecs, "qid", "embedding", 30)
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    Diversify.mmrRerank(cands, "qid", "vec_id", "cosine", "embedding",
      k = 10, lambda = 0.5)
  }

  /** PQ TAKEDOWN gate — the delete tier for the encoded family: codes
    * are trained and stored over the FULL corpus, vec_id % 7 == 3
    * deleted via the one-commit tombstone path (no re-encode — codes of
    * masked rows simply stop being ADC candidates), and the reranked
    * top-20 must contain the exact cosine top-10 over the remaining
    * corpus with no deleted id leaking (q_sim_ivf_delete's in-plan
    * gate). q_sim_pq's own candidates=500. */
  val q_sim_pq_delete: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val remaining = emb.filter(col("vec_id") % 7 =!= 3)
    val exact = Similarity.bruteForceTopK(remaining, "vec_id", "embedding",
      qvec, 10)
    val table = artifactTable(s, "pq_del", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.savePqIndex(
        Similarity.pqIndex(emb, "vec_id", "embedding", dims = 64,
          m = 16, nCodes = 32, iters = 8, sampleN = 2048), table)
      Similarity.deleteVectors(s, table,
        emb.filter(col("vec_id") % 7 === 3).select(col("vec_id")))
    }
    val idx = Similarity.loadPqIndex(s, table)
    val ann = Similarity.pqTopK(idx, "vec_id", "embedding", qvec, 20,
      candidates = 500).select(col("vec_id")).localCheckpoint(true)
    val leakFree = ann.agg(
      (sum(when(col("vec_id") % 7 === 3, 1).otherwise(0)) === 0).as("__ok"))
    exact.join(ann, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(leakFree)).filter(col("__ok"))
      .select(col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  /** PQ RECLAIM gate — physical erasure AND codebook forgetting for the
    * encoded family: after the takedown,
    * [[graft.operators.Similarity.compactPqIndex]] retrains the
    * per-subspace codebooks WITHOUT the tombstoned vectors and
    * re-encodes only the survivors (deterministic k-means over the
    * masked sample ⇒ the reclaimed artifact equals a direct build over
    * the survivors, pinned in DeleteSpec); consumed tombstones leave
    * the sibling, and the recall-plus-no-leak contract must hold
    * against the retrained codes with no mask in the plan. Same oracle
    * as q_sim_pq_delete. */
  val q_sim_pq_reclaim: Q = (s, dir) => {
    val emb = t(s, dir, "embeddings").df
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val remaining = emb.filter(col("vec_id") % 7 =!= 3)
    val exact = Similarity.bruteForceTopK(remaining, "vec_id", "embedding",
      qvec, 10)
    val table = artifactTable(s, "pq_rcl", dir, "embeddings")
    onceUpserted(s, table) {
      Similarity.savePqIndex(
        Similarity.pqIndex(emb, "vec_id", "embedding", dims = 64,
          m = 16, nCodes = 32, iters = 8, sampleN = 2048), table)
      Similarity.deleteVectors(s, table,
        emb.filter(col("vec_id") % 7 === 3).select(col("vec_id")))
      Similarity.compactPqIndex(s, table, "vec_id", "embedding",
        iters = 8, sampleN = 2048)
    }
    val idx = Similarity.loadPqIndex(s, table)
    val ann = Similarity.pqTopK(idx, "vec_id", "embedding", qvec, 20,
      candidates = 500).select(col("vec_id")).localCheckpoint(true)
    val leakFree = ann.agg(
      (sum(when(col("vec_id") % 7 === 3, 1).otherwise(0)) === 0).as("__ok"))
    exact.join(ann, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(leakFree)).filter(col("__ok"))
      .select(col("vec_id"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  // ==================================================================
  // Data layout (write-time clustering for scan-time skipping)
  // ==================================================================

  /** Z-ORDER LAYOUT GATE: rewrite lineitem's key columns as a z-ordered
    * parquet layout ([[graft.operators.Layout.writeZOrdered]], 16-bit
    * Morton interleave of l_orderkey × l_partkey, 32 files), then prove
    * BOTH properties in one output:
    *  - layout: a ~5% band filter on EACH interleaved dimension must
    *    touch ≤ 60% of the files (per-file min/max ranges — what a
    *    parquet scan's file pruning sees; a one-dimensional sort would
    *    put the SECOND dimension at 100%). If either bound fails, the
    *    in-plan gate empties the output and the row count breaks.
    *  - content: the rows inside the l_partkey band, read BACK from the
    *    rewritten layout, must hash-match the DuckDB oracle over the
    *    ORIGINAL table — the rewrite is a layout change, not a data
    *    change. Band bounds use integer min/max + floor arithmetic so
    *    both engines compute identical cutoffs. */
  val q_zorder_layout: Q = (s, dir) => {
    import graft.operators.Layout
    val li = t(s, dir, "lineitem").df
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val out = s"${ioDir(dir)}/lineitem_zorder"
    Layout.writeZOrdered(li, out, Seq("l_orderkey", "l_partkey"), nFiles = 32)
    val back = s.read.parquet(out)
    // ONE verification scan of the rewritten data: the per-file min/max
    // stats frame (32 rows) is pinned once and serves BOTH the band
    // cutoffs (global min/max = min-of-file-mins / max-of-file-maxes,
    // exactly the former whole-table agg's longs) and the in-plan skip
    // gate — previously the cutoff agg and the gate's fileRangeStats
    // each re-scanned the full rewrite (guide §1.2: fewer passes).
    val stats = Layout.fileRangeStats(s, out, Seq("l_orderkey", "l_partkey"))
      .localCheckpoint(true)
    val r = stats.agg(min(col("l_orderkey_min")), max(col("l_orderkey_max")),
      min(col("l_partkey_min")), max(col("l_partkey_max"))).head()
    def band(mn: Long, mx: Long): (Long, Long) =
      (mn + math.floor((mx - mn) * 0.45).toLong, mn + math.floor((mx - mn) * 0.50).toLong)
    val (okLo, okHi) = band(r.getLong(0), r.getLong(1))
    val (pkLo, pkHi) = band(r.getLong(2), r.getLong(3))
    // the skip-bound gate stays IN-PLAN (one broadcast gate row, the
    // q_dedup_semantic idiom): re-executing the returned frame
    // re-validates the layout, and the audited plan shows the gate
    def overlaps(c: String, lo: Long, hi: Long) =
      col(s"${c}_min") <= hi && col(s"${c}_max") >= lo
    val gate = stats
      .agg(
        ((sum(when(overlaps("l_orderkey", okLo, okHi), 1L).otherwise(0L))
          <= count(lit(1)) * 0.6) &&
          (sum(when(overlaps("l_partkey", pkLo, pkHi), 1L).otherwise(0L))
            <= count(lit(1)) * 0.6)).as("__ok"))
    back.filter(col("l_partkey").between(pkLo, pkHi))
      .crossJoin(broadcast(gate)).filter(col("__ok"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
  }

  /** STATIC partition pruning over the Hive-partitioned corpus layout
    * (build-once artifact, `source` directory per value): the `isin`
    * filter on the partition column must reach the scan as a partition
    * filter and select exactly the 2 named directories of 20 — the
    * planner never lists the other 18 at any corpus size. The prune is
    * asserted fail-fast at plan time ([[Layout.requireStaticPrune]]);
    * values are oracle-checked against the unpartitioned parquet. */
  val q_partition_prune: Q = (s, dir) => {
    import graft.operators.Layout
    val table = artifactTable(s, "docs_part", dir, "documents")
    val part = Layout.partitionedTableFor(
      t(s, dir, "documents").df, table, "source")
    val picked = Seq("src3", "src7")
    Layout.requireStaticPrune(
      part.filter(col("source").isin(picked: _*))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"), col("lang")),
      maxPartitions = picked.size)
  }

  /** DYNAMIC partition pruning (DPP) — the 100 TB star-join access
    * pattern: the partitioned corpus joins a dimension whose filter is
    * NOT statically inferable onto the fact side (it sits on an
    * AGGREGATE of the dim — "sources with above-average total volume"),
    * so pruning must happen at RUNTIME via the DPP subquery reusing the
    * dim's broadcast. [[Layout.requireDynamicPrune]] asserts the
    * DynamicPruningExpression actually reached the scan's partition
    * filters; the runtime partition count is pinned in LayoutSpec. */
  val q_partition_prune_dynamic: Q = (s, dir) => {
    import graft.operators.Layout
    val table = artifactTable(s, "docs_part", dir, "documents")
    val docs = t(s, dir, "documents").df
    val part = Layout.partitionedTableFor(docs, table, "source")
    val perSrc = docs.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("__tot"))
    // threshold as a LITERAL from one tiny aggregate (driver-side KBs,
    // the zorder-gate idiom) — deliberately: DPP's isLikelySelective
    // only recognizes literal comparisons, so an in-plan attribute
    // threshold (crossJoin with the avg row) would never trigger the
    // runtime prune this gate exists to demonstrate
    val avgTot = perSrc.agg(avg(col("__tot"))).head().getDouble(0)
    val dim = perSrc.filter(col("__tot") > lit(avgTot)).select(col("source"))
    // broadcast(dim) pins the BUILD side: size estimation would happily
    // broadcast the column-pruned FACT instead (it read fewer columns),
    // and DPP can only prune the PROBE side — the hint is what makes
    // the scan eligible for the runtime filter at every SF
    Layout.requireDynamicPrune(
      part.join(broadcast(dim), "source")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang")))
  }

  /** TWO-LEVEL static pruning over the canonical date+type layout
    * (`event_type=.../day=...`, 150 directories): a filter on both
    * levels must select exactly types × days directories — the daily
    * incremental-processing access pattern ("this week's clicks") that
    * reads 14 directories of a 100 TB corpus without listing the rest.
    * Day bounds derive from one tiny min aggregate and enter the plan
    * as LITERALS (the DPP-gate idiom), so the gate survives a
    * regenerated corpus with different dates. */
  val q_partition_prune_multi: Q = (s, dir) => {
    import graft.operators.Layout
    val table = artifactTable(s, "events_part", dir, "events")
    val ev = events(s, dir).df.withColumn("day",
      date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
    val part = Layout.partitionedTableFor(ev, table, Seq("event_type", "day"))
    val d0 = ev.agg(min(to_date(col("day")))).head().getDate(0).toLocalDate
    val (lo, hi) = (d0.plusDays(7).toString, d0.plusDays(13).toString)
    Layout.requireStaticPrune(
      part.filter(col("event_type").isin("click", "purchase") &&
          col("day").between(lo, hi))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("event_type"), col("day")),
      maxPartitions = 14)
  }

  /** PARTITION-PRUNED STREAMING SOURCE — the incremental-ingest analogue
    * of [[q_partition_prune_multi]]: subscribe a file stream to ONE
    * subtree (`event_type=click`) of the two-level Hive layout, so the
    * per-trigger directory LISTING never touches the other four types'
    * 120 directories, and filter the week's days in-stream (the `day=`
    * partition column is directory-inferred below the subtree, so the
    * filter prunes file scans within it). Week bounds enter as literals
    * from one tiny min aggregate (the [[q_partition_prune_multi]]
    * idiom). The listing-containment assertion (every file the source
    * processed lives under the subtree) is pinned in StreamingSpec,
    * where the checkpoint's source log is inspectable. */
  val q_stream_partition_prune: Q = (s, dir) => {
    import graft.operators.Layout
    import graft.streaming.Streaming
    val table = artifactTable(s, "events_part", dir, "events")
    val ev = events(s, dir).df.withColumn("day",
      date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
    Layout.partitionedTableFor(ev, table, Seq("event_type", "day"))
    val d0 = ev.agg(min(to_date(col("day")))).head().getDate(0).toLocalDate
    val (lo, hi) = (d0.plusDays(7).toString, d0.plusDays(13).toString)
    val stream = Streaming.partitionSubtreeStream(
      s, Layout.tableLocation(s, table), "event_type=click")
    // directory inference types the day= partition column as DATE —
    // normalize to the yyyy-MM-dd string the layout (and oracle) uses
    val agg = stream.filter(col("day").between(lo, hi))
      .groupBy(col("day").cast("string").as("day"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    Streaming.runToBatch(agg, "stream_week_clicks")
      .orderBy(col("day"))
  }

  // ==================================================================
  // §2.1 Sources / sinks (round-trips against parquet ground truth)
  // ==================================================================

  import graft.sources.Sources
  import graft.sources.Sources.{Transform, FixedWidthSpec}

  private def ioDir(dir: String): String =
    s"/tmp/graft_io/${dir.replaceAll("[^a-zA-Z0-9]", "_")}"

  /** CSV export → import round-trip with per-column transforms (casts)
    * and scan-time filters (reference csv_import/csv_export,
    * littletable.py:2872-2940, 3117-3188). */
  val q_csv_roundtrip: Q = (s, dir) => {
    val out = s"${ioDir(dir)}/nation_csv"
    Sources.csvExport(t(s, dir, "nation"), out)
    Sources.csvImport(s, out,
        transforms = Map("n_nationkey" -> Transform("int"), "n_regionkey" -> Transform("int")),
        filters = Seq(col("n_regionkey") < 3))
      .orderby(SortKey.asc("n_nationkey")).df
  }

  /** Excel export → import round-trip (reference excel_import/excel_export,
    * littletable.py:3019-3115/3415-3459; self-contained OOXML, no deps).
    * xlsx numbers are doubles, so the oracle casts to match. */
  val q_excel_roundtrip: Q = (s, dir) => {
    val out = s"${ioDir(dir)}/nation.xlsx"
    new java.io.File(ioDir(dir)).mkdirs()
    graft.sources.Excel.excelExport(
      GTable(t(s, dir, "nation").df.select(
        col("n_nationkey").cast("double").as("n_nationkey"), col("n_name")), "nation"), out)
    graft.sources.Excel.excelImport(s, out)
      .orderby(SortKey.asc("n_nationkey")).df
  }

  /** Excel DATE/DATETIME round-trip (reference excel_import via openpyxl
    * yields typed datetime cells, littletable.py:3019-3115): order dates
    * export as date-styled serial cells and re-import as DateType; a
    * synthetic seconds offset exercises the time-of-day fraction, which
    * re-imports as wall-clock TimestampNTZ. */
  val q_excel_dates: Q = (s, dir) => {
    val out = s"${ioDir(dir)}/orders_dates.xlsx"
    new java.io.File(ioDir(dir)).mkdirs()
    val src = t(s, dir, "orders").df
      .filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey").cast("double").as("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"),
        expr("timestampadd(SECOND, CAST(o_orderkey % 86400 AS INT), CAST(o_orderdate AS TIMESTAMP_NTZ))").as("o_ts"))
    graft.sources.Excel.excelExport(GTable(src, "orders_dates"), out)
    graft.sources.Excel.excelImport(s, out)
      .orderby(SortKey.asc("o_orderkey")).df
  }

  /** Headerless TSV with explicit fieldnames (littletable.py:2976-3017). */
  val q_tsv_roundtrip: Q = (s, dir) => {
    val out = s"${ioDir(dir)}/cust_tsv"
    t(s, dir, "customer").df
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .write.mode("overwrite").option("header", false).option("sep", "\t").csv(out)
    Sources.tsvImport(s, out,
        fieldnames = Seq("c_custkey", "c_name", "c_acctbal"),
        transforms = Map("c_custkey" -> Transform("bigint"), "c_acctbal" -> Transform("double")))
      .orderby(SortKey.asc("c_custkey")).df
  }

  /** JSONL export → import round-trip (littletable.py:3204-3312 /
    * 3370-3384). */
  val q_json_roundtrip: Q = (s, dir) => {
    val out = s"${ioDir(dir)}/orders_jsonl"
    val sub = t(s, dir, "orders").df.select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_odate"))
    Sources.jsonlExport(GTable(sub, "orders_sub"), out)
    Sources.jsonImport(s, out)
      .orderby(SortKey.asc("o_orderkey")).df
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), col("o_odate"))
  }

  /** Fixed-width file import by column-slice spec
    * (reference FixedWidthReader, littletable.py:937-995). */
  val q_fixedwidth: Q = (s, dir) => {
    val out = s"${ioDir(dir)}/region_fw"
    t(s, dir, "region").df
      .select(concat(rpad(col("r_name"), 15, " "),
        lpad(col("r_regionkey").cast("string"), 4, " ")).as("value"))
      .write.mode("overwrite").text(out)
    Sources.fixedWidthImport(s, out, Seq(
        FixedWidthSpec("r_name", 0, 15),
        FixedWidthSpec("r_regionkey", 15, 19, Some(Transform("int")))))
      .orderby(SortKey.asc("r_regionkey")).df
      .select(col("r_regionkey"), col("r_name"))
  }

  /** Data-string import with on-error transform default
    * (reference multi-line data-string source littletable.py:774-796;
    * transforms littletable.py:2763-2808): "bad" fails the int cast and
    * takes the default -1 — no task failure. */
  val q_csv_string: Q = (s, dir) => {
    val data = "x,y\n1,foo\n2,bar\nbad,baz"
    Sources.csvImportString(s, data,
        transforms = Map("x" -> Transform("int", default = Some(-1))))
      .orderby(SortKey.asc("x")).df
  }

  /** Zip-archive import via the driver shim (littletable.py:872-903). */
  val q_zip_import: Q = (s, dir) => {
    val out = s"${ioDir(dir)}/nation_zip"
    Sources.csvExport(t(s, dir, "nation"), out)
    // zip the part file, then import through the unzip shim
    val csvFile = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".csv")).head
    val zipPath = s"${ioDir(dir)}/nation.zip"
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("nation.csv"))
    java.nio.file.Files.copy(csvFile.toPath, zos)
    zos.closeEntry(); zos.close()
    Sources.csvImport(s, Sources.unzipToTemp(zipPath, "nation.csv"),
        transforms = Map("n_nationkey" -> Transform("int"), "n_regionkey" -> Transform("int")))
      .orderby(SortKey.asc("n_nationkey")).df
  }

  // ==================================================================
  // §2.10 Structured Streaming (new capability; events table)
  // ==================================================================

  import graft.streaming.Streaming

  /** Real streaming query: readStream → watermark → tumbling window →
    * memory sink run to completion; oracle is the batch equivalent. */
  val q_stream_tumbling: Q = (s, dir) => {
    val agg = Streaming.tumblingCounts(Streaming.eventsStream(s, dir), "1 hour")
    Streaming.runToBatch(agg, "stream_tumbling_out")
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** Streaming approximate distinct (HLL++) per (hour, event_type): the
    * sketch whose point IS streaming — exact count_distinct is an
    * unsupported streaming plan (unbounded per-group value-set state),
    * while HLL state is KB registers. ACCURACY GATE in the
    * q_approx_distinct mold: the streamed estimate rides next to the
    * batch-exact per-window distinct, rows emit only within tolerance —
    * 15% relative error with a ±3 absolute floor for handful-sized
    * windows (HLL++'s small-range bias correction can wobble a count or
    * two; measured across all 3 SFs, daily/rsd=0.02 worst-case is 4.1%
    * relative / abs 2 at the small end, a 3.7× margin) — and the oracle
    * is the unconditional exact, so a violation breaks the hash match.
    * HLL++ is hash-deterministic: the streamed estimate equals what the
    * batch plan computes, independent of arrival order. */
  val q_stream_approx_distinct: Q = (s, dir) => {
    // DAILY windows at rsd=0.02 — both knobs measured, not guessed:
    // rsd sizes the per-group buffer (0.01 ⇒ ~22 KB, and the streaming
    // run reads 2.7–3.5 s; 0.02/0.05 ⇒ ~1.1 s, at plain-count cost),
    // and the window sizes the group count (hourly = 3600 groups
    // through the state store, daily = ~120) while pushing every
    // window's count up into the safe relative-tolerance regime.
    val agg = Streaming.approxDistinctStream(Streaming.eventsStream(s, dir),
      itemCol = "user_id", groupCols = Seq("event_type"),
      window = "1 day", delay = "1 hour", rsd = 0.02)
    val streamed = Streaming.runToBatch(agg, "stream_apxnd_out")
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("approx_nd"))
    val exact = events(s, dir).df
      .groupBy(date_format(date_trunc("day", col("ts")),
          "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_exact"))
    val absDiff = abs(col("approx_nd") - col("n_exact")).cast("double")
    streamed.join(exact, Seq("day", "event_type"))
      .filter(absDiff <= lit(0.15) * col("n_exact") || absDiff <= lit(3.0))
      .select(col("day"), col("event_type"), col("n_exact"))
      .orderBy(col("day"), col("event_type"))
  }

  /** Streaming per-window QUANTILES via KLL sketches (daily p50/p90 of
    * the event value per type): the stream emits SKETCHES — any
    * quantile extracts downstream, and windows/keys stay mergeable —
    * while exact streaming percentiles would hold every value in state.
    * RANK GATE in the q_quantile_rollup mold: for each (day, type) the
    * rank error of the served p50/p90 — |count(value ≤ q̂) − q·n| —
    * must be ≤ max(0.05·n, 1) AND the sketch's row count must equal
    * the batch count; rows failing either drop and break the hash match
    * vs the unconditional exact per-(day, type) row-count oracle. The
    * one-rank absolute floor is integer granularity, not slack: a
    * 5-row window's achievable p90 ranks are 4/5 and 5/5, both ≥ 0.1
    * from 0.9 — no estimator can beat the nearest attainable rank. */
  val q_stream_quantiles: Q = (s, dir) => {
    val agg = Streaming.quantilesStream(Streaming.eventsStream(s, dir),
      valueCol = "value", groupCols = Seq("event_type"), window = "1 day")
    val streamed = Streaming.runToBatch(agg, "stream_kll_out")
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"),
        // empty-sketch guard (all-NULL value window): getQuantile throws
        // on an empty sketch; serve NULL instead (same discipline as
        // Sketch.rollupQuantiles)
        when(col("n_rows") > 0,
          kll_sketch_get_quantile_double(col("qsketch"), lit(0.5)))
          .otherwise(lit(null)).as("__q50"),
        when(col("n_rows") > 0,
          kll_sketch_get_quantile_double(col("qsketch"), lit(0.9)))
          .otherwise(lit(null)).as("__q90"),
        col("n_rows"))
    val data = events(s, dir).df
      .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
    kllRankGate(data, col("value"), streamed, Seq("day", "event_type"))
  }

  /** Sliding windows (2h size / 1h slide) under streaming — each event
    * contributes to two windows. */
  val q_stream_sliding: Q = (s, dir) => {
    val agg = Streaming.slidingCounts(Streaming.eventsStream(s, dir), "2 hours", "1 hour")
    Streaming.runToBatch(agg, "stream_sliding_out")
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))
  }

  /** Custom keyed streaming state (flatMapGroupsWithState): per-user
    * running totals; the single-source-batch final answer equals the
    * batch groupBy, giving a DuckDB oracle for the stateful path. */
  val q_stream_stateful: Q = (s, dir) => {
    import s.implicits._
    import graft.streaming.UserEvent
    val ev = Streaming.eventsStream(s, dir)
      .select(col("user_id"), col("value")).as[UserEvent]
    Streaming.runToBatch(Streaming.runningUserTotals(ev).toDF(), "stream_stateful_out",
        mode = "update")
      // The memory sink append-logs update-mode emissions, so a key that
      // appears in several micro-batches leaves one row per batch; keep the
      // LAST emission per key (totals are monotone in n_events).
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        max_by(col("sum_value"), col("n_events")).as("sum_value"))
      .select(col("user_id"), col("n_events"), round(col("sum_value"), 2).as("sum_value"))
      .orderBy(col("user_id"))
  }

  /** Streaming exact dedup (dropDuplicatesWithinWatermark): first
    * arrival per (user_id, event_type) survives; output restricted to
    * the key columns so the kept-row choice within a batch cannot leak
    * nondeterminism. Oracle: batch DISTINCT. */
  val q_stream_dedup: Q = (s, dir) => {
    val deduped = Streaming.dedupStream(Streaming.eventsStream(s, dir),
      Seq("user_id", "event_type"), "ts", "1 hour")
      .select(col("user_id"), col("event_type"))
    Streaming.runToBatch(deduped, "stream_dedup_out", mode = "append")
      .distinct() // state re-init across runs could re-emit; distinct is the contract
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Stream-static enrichment join: the events stream decorated with
    * customer dimension attributes via a per-micro-batch broadcast join
    * (no stream-side shuffle, no state store), then aggregated per
    * (market segment, event type). Oracle: the batch join + groupBy. */
  val q_stream_enrich: Q = (s, dir) => {
    val enriched = Streaming.enrichWithStatic(
      Streaming.eventsStream(s, dir), t(s, dir, "customer").df,
      joinKeys = Seq("user_id" -> "c_custkey"),
      dimCols = Seq("c_mktsegment"),
      // inner to match the oracle's INNER JOIN by construction — the
      // default left would differ if an event user_id ever lacked a
      // customer row (full key coverage in the test data hides that)
      joinType = "inner")
    val agg = enriched.groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    Streaming.runToBatch(agg, "stream_enrich_out")
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** END-TO-END streaming funnel in ONE query — the streaming analogue
    * of q_pipeline_e2e: watermarked in-stream dedup (one arrival per
    * (user, event_type, hour)) → stream-static broadcast enrichment →
    * tumbling per-(window, segment) counts; two CHAINED stateful
    * operators in append mode with a watermark flush. Emits exactly the
    * windows whose end ≤ final watermark (max ts − 1 h); the oracle
    * applies the same cut. Dedup keys include the event-time hour so
    * the surviving row's window is deterministic (see
    * [[graft.streaming.Streaming.funnelCounts]]). */
  val q_stream_funnel: Q = (s, dir) => {
    val agg = Streaming.funnelCounts(Streaming.eventsStream(s, dir),
      t(s, dir, "customer").df, joinKeys = Seq("user_id" -> "c_custkey"),
      segmentCol = "c_mktsegment")
    Streaming.runToBatch(agg, "stream_funnel_out", mode = "append",
        watermarkFlush = true)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("hour"),
        col("c_mktsegment"), col("n"))
      .distinct() // state re-init across runs could re-emit (q_stream_dedup contract)
      .orderBy(col("hour"), col("c_mktsegment"))
  }

  /** COMPOSED STREAMING INGEST gate — the END-TO-END live pipeline,
    * wiring four individually-gated pieces into ONE streaming query
    * whose chained watermark/state/filter interactions are exactly where
    * silent drops hide: partition-pruned subtree source
    * ([[graft.streaming.Streaming.partitionSubtreeStream]], only the
    * subscribed `source=src3` subtree of the 20-source layout is ever
    * listed) → watermarked digest dedup within the stream AND against
    * yesterday's corpus ([[graft.streaming.Streaming.dedupStreamAgainst]])
    * → codegen'd quality + encoding curation → idempotent per-batch
    * segment sink. Planted fixtures make every stage non-vacuous at
    * every SF: doc_id % 13 → a degenerate low-quality text (quality
    * filter), % 11 → a stray control char (encoding scan), % 3 → a
    * 90-minutes-later re-emission in the subscribed source (in-stream
    * dedup state; src3 doc_ids are ≡ 3 mod 20, so a %5 fixture would
    * never fire there), % 7 → already in the corpus (anti-join). Output is
    * SURVIVOR-INVARIANT by construction — raw-byte digests mean every
    * kept row's text is byte-identical to its dropped duplicates', so
    * (fp, n_tokens, quality) cannot depend on which arrival the dedup
    * state kept or on micro-batch boundaries. Oracle: the equivalent
    * batch funnel (dedup = GROUP BY digest under the full-horizon
    * watermark cut, then the same corpus anti-join and curation
    * predicates). Multi-batch equivalence is pinned in StreamingSpec. */
  val q_stream_ingest_e2e: Q = (s, dir) => {
    import graft.operators.Layout
    val docs = t(s, dir, "documents").df
    val degenerate = Seq.fill(20)("zzzzzzzzzzzzzz").mkString(" ")
    val fixed = docs.select(col("doc_id"), col("source"),
      when(col("doc_id") % 13 === 0, lit(degenerate))
        .when(col("doc_id") % 11 === 0, concat(col("text"), lit("\u0007")))
        .otherwise(col("text")).as("text"))
    val t0 = to_timestamp(lit("2024-03-01 00:00:00"))
    def at(minutes: org.apache.spark.sql.Column) =
      t0 + make_dt_interval(lit(0), lit(0), minutes.cast("int"), lit(0.0))
    val base = fixed.select(col("doc_id"), col("text"), col("source"),
      at(col("doc_id")).as("ts"))
    val reemit = fixed.filter(col("source") === "src3" && col("doc_id") % 3 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"),
        col("source"), at(col("doc_id") + 90).as("ts"))
    val table = artifactTable(s, "ingest_feed", dir, "documents")
    Layout.partitionedTableFor(base.unionByName(reemit), table, Seq("source"))
    val corpus = docs.filter(col("doc_id") % 7 === 0)
    val out = s"${ioDir(dir)}/ingest_e2e"
    val hp = new org.apache.hadoop.fs.Path(out)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(hp, true)
    val stream = Streaming.partitionSubtreeStream(
      s, Layout.tableLocation(s, table), "source=src3")
    val q = Streaming.ingestCurationSink(stream, corpus, "text", "ts", out,
      delay = "30 days")
    try q.processAllAvailable() finally q.stop()
    val back =
      if (fs.exists(hp)) s.read.parquet(out)
      else docs.limit(0).select(col("text"), lit(0L).as("n_tokens"),
        lit(0.0).as("quality"))
    back.select(
        graft.operators.Dedup.contentKey(col("text"), normalize = false).as("fp"),
        col("n_tokens"), col("quality"))
      .orderBy(col("fp"))
  }

  /** Streaming ingest BLOCKLIST gate — the do-not-ingest closure of the
    * takedown loop on the oracle path: after a takedown's physical
    * erasure the corpus digest set no longer contains the document, so
    * a RE-CRAWL of the same bytes would sail through
    * [[graft.streaming.Streaming.dedupStreamAgainst]]'s corpus
    * anti-join and re-admit exactly what was removed. The composed
    * curation pipeline runs with a content-digest blocklist (the
    * q_stream_ingest_e2e fixture, plus every src3 doc with
    * doc_id % 9 == 0 blocklisted by raw-byte digest): survivors must
    * equal the funnel's DuckDB oracle MINUS the blocklisted content —
    * keyed on bytes, not ids, because a re-crawl arrives under a fresh
    * id. The blocklist side is re-resolved per micro-batch, so digests
    * appended mid-stream suppress from the next trigger. */
  val q_stream_ingest_blocklist: Q = (s, dir) => {
    import graft.operators.Layout
    val docs = t(s, dir, "documents").df
    val degenerate = Seq.fill(20)("zzzzzzzzzzzzzz").mkString(" ")
    val fixed = docs.select(col("doc_id"), col("source"),
      when(col("doc_id") % 13 === 0, lit(degenerate))
        .when(col("doc_id") % 11 === 0, concat(col("text"), lit("\u0007")))
        .otherwise(col("text")).as("text"))
    val t0 = to_timestamp(lit("2024-03-01 00:00:00"))
    def at(minutes: org.apache.spark.sql.Column) =
      t0 + make_dt_interval(lit(0), lit(0), minutes.cast("int"), lit(0.0))
    val base = fixed.select(col("doc_id"), col("text"), col("source"),
      at(col("doc_id")).as("ts"))
    val reemit = fixed.filter(col("source") === "src3" && col("doc_id") % 3 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"),
        col("source"), at(col("doc_id") + 90).as("ts"))
    val table = artifactTable(s, "ingest_feed", dir, "documents")
    Layout.partitionedTableFor(base.unionByName(reemit), table, Seq("source"))
    val corpus = docs.filter(col("doc_id") % 7 === 0)
    // the takedown's retained digests: content identity, never the text
    val blocklist = fixed
      .filter(col("source") === "src3" && col("doc_id") % 9 === 0)
      .select(graft.operators.Dedup.contentKey(col("text"),
        normalize = false).as("fp")).distinct()
    val out = s"${ioDir(dir)}/ingest_blocklist"
    val hp = new org.apache.hadoop.fs.Path(out)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(hp, true)
    val stream = Streaming.partitionSubtreeStream(
      s, Layout.tableLocation(s, table), "source=src3")
    val q = Streaming.ingestCurationSink(stream, corpus, "text", "ts", out,
      delay = "30 days", blocklist = Some(blocklist))
    try q.processAllAvailable() finally q.stop()
    val back =
      if (fs.exists(hp)) s.read.parquet(out)
      else docs.limit(0).select(col("text"), lit(0L).as("n_tokens"),
        lit(0.0).as("quality"))
    back.select(
        graft.operators.Dedup.contentKey(col("text"), normalize = false).as("fp"),
        col("n_tokens"), col("quality"))
      .orderBy(col("fp"))
  }

  /** TAKEDOWN lifecycle END-TO-END gate — the compliance composition a
    * real operator audits, wired as ONE oracle-checked pipeline (the
    * q_pipeline_e2e / q_stream_ingest_e2e argument: the pieces are
    * individually gated; the composition is where sequencing bugs
    * hide):
    *  1. the BM25 serving artifact exists over the full corpus;
    *  2. TAKEDOWN — every doc_id % 9 == 3 is tombstoned
    *     ([[graft.operators.Search.deleteBm25Docs]]; masking is
    *     immediate) and its content DIGEST goes on the do-not-ingest
    *     blocklist (content identity, never ids — a re-crawl arrives
    *     under a fresh id);
    *  3. RE-CRAWL — the removed bytes return under fresh ids through
    *     the streaming curation pipeline, beside a control slice of
    *     genuinely-new bytes: the blocklist must suppress every removed
    *     byte stream while the control slice is admitted (an in-plan
    *     one-row gate — zero blocked digests among the admitted rows
    *     AND a non-empty admitted set);
    *  4. RECLAIM — the compaction cadence physically erases the
    *     tombstoned rows: the served generation's raw parquet carries
    *     ZERO deleted ids (in-plan gate over the actual files) and the
    *     tombstone sibling is gone (the mask left the plan).
    * The final frame is the served top-25 over the reduced corpus — the
    * DuckDB BM25-without-them oracle, rank-sensitive to every constant
    * correction — with the suppression/erasure gates folded in as
    * row-dropping filters, so ANY violated step is a hash mismatch.
    * Build/delete/reclaim run once per mtime-keyed generation; the
    * re-crawl streams on every invocation (suppression must HOLD, not
    * just have held once). */
  val q_takedown_e2e: Q = (s, dir) => {
    import graft.operators.{Dedup, Search}
    val docs = t(s, dir, "documents").df
    val dead = docs.filter(col("doc_id") % 9 === 3)
    val live = docs.filter(col("doc_id") % 9 =!= 3)
    val table = artifactTable(s, "takedown_e2e", dir, "documents")
    onceUpserted(s, table) {
      Search.saveBm25Index(
        Search.buildBm25Index(docs, "doc_id", "text"), table)
      Search.deleteBm25Docs(s, table, dead.select(col("doc_id")))
      Search.compactBm25Index(s, table)
    }
    // the takedown's retained blocklist: digests of the removed bytes
    val blockDigests = dead.select(Dedup.contentKey(col("text"),
      normalize = false).as("fp")).distinct()
    // the re-crawl: removed bytes under fresh ids (must be suppressed)
    // + a control slice of new bytes (must be admitted — proves the
    // pipeline isn't vacuously dropping everything)
    val out = s"${ioDir(dir)}/takedown_e2e"
    val hp = new org.apache.hadoop.fs.Path(out)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(hp, true)
    val recrawl = Streaming.documentsStream(s, dir)
      .filter(col("doc_id") % 9 === 3 || col("doc_id") % 9 === 4)
      .select((col("doc_id") + 30000000L).as("doc_id"),
        when(col("doc_id") % 9 === 4, concat(col("text"), lit(" recrawl")))
          .otherwise(col("text")).as("text"),
        to_timestamp(lit("2024-03-01 00:00:00")).as("ts"))
    val q = Streaming.ingestCurationSink(recrawl, live, "text", "ts", out,
      delay = "30 days", blocklist = Some(blockDigests))
    try q.processAllAvailable() finally q.stop()
    val admitted =
      (if (fs.exists(hp)) s.read.parquet(out)
       else docs.limit(0).select(col("text")))
        .select(Dedup.contentKey(col("text"), normalize = false).as("fp"))
    // gate A: continued suppression — no admitted row carries a
    // blocked digest — and non-vacuousness (the control slice landed)
    val suppressed = admitted
      .join(broadcast(blockDigests.withColumn("__b", lit(1))), Seq("fp"), "left")
      .agg((sum(coalesce(col("__b"), lit(0))) === 0 &&
        count(lit(1)) > 0).as("__ok"))
    // gate B: physical erasure — the served generation's RAW files
    // (not the masked view) carry zero deleted ids
    val erased = s.read
      .parquet(graft.sources.Sources.tableDataFiles(s, table): _*)
      .agg((sum(when(col("doc_id") % 9 === 3, 1).otherwise(0)) === 0)
        .as("__er"))
    // gate C: the reclaim consumed every tombstone — the sibling is
    // gone and the serve plan is mask-free again
    val tombGone = !s.catalog.tableExists(s"${table}_deleted")
    val idx = Search.loadBm25Index(s, table)
    Search.searchBm25(live, idx, "doc_id", "hash join filter", k = 25)
      .select(col("doc_id"), col("bm25_rank"))
      .crossJoin(broadcast(suppressed)).filter(col("__ok"))
      .crossJoin(broadcast(erased)).filter(col("__er"))
      .filter(lit(tombGone))
      .select(col("doc_id"), col("bm25_rank"))
      .orderBy(col("bm25_rank"))
  }

  /** CORPUS-side takedown gate — the source-of-truth half of the
    * compliance story ([[graft.operators.Layout.erasePartitionedRows]]):
    * a serving artifact can mask and reclaim on its cadence, but the
    * partitioned corpus table the pipeline re-derives everything from
    * must ALSO stop containing the bytes, and at 100 TB the answer is
    * "rewrite the 2 of 20 source partitions the request touches", never
    * the corpus. Docs from src3/src7 with doc_id % 7 == 3 are erased;
    * the served per-source report must equal DuckDB over the reduced
    * corpus, with an in-plan one-row gate asserting the affected
    * partitions' RAW files carry none of the doomed ids (physical
    * erasure, not filtering). Untouched-partition file preservation —
    * the partition-pruning claim — is pinned byte-level in LayoutSpec.
    * Build + erase run once per mtime-keyed generation. */
  val q_corpus_erase: Q = (s, dir) => {
    import graft.operators.Layout
    val docs = t(s, dir, "documents").df
    val table = artifactTable(s, "corpus_erase", dir, "documents")
    onceUpserted(s, table) {
      Layout.partitionedTableFor(
        docs.select(col("doc_id"), col("text"), col("lang"),
          col("n_chars"), col("source")), table, "source")
      Layout.erasePartitionedRows(s, table,
        docs.filter(col("source").isin("src3", "src7") &&
          col("doc_id") % 7 === 3).select(col("doc_id")))
    }
    // affected partitions' raw files resolved through the CATALOG (the
    // erase's own basis discipline), never a constructed loc/source=v
    // path that a relocated partition would silently turn into an
    // empty (vacuously-passing) read
    val affectedFiles = graft.sources.Sources.partitionDataFiles(s, table,
      spec => spec.get("source").exists(Set("src3", "src7")))
    val erased = s.read
      .parquet(affectedFiles: _*)
      .agg((sum(when(col("doc_id") % 7 === 3, 1).otherwise(0)) === 0 &&
        count(lit(1)) > 0)
        .as("__er"))
    s.table(table).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .crossJoin(broadcast(erased)).filter(col("__er"))
      .select(col("source"), col("n_docs"), col("sum_chars"))
      .orderBy(col("source"))
  }

  /** CORPUS-erase END-TO-END composition gate — the two compliance
    * halves composed on the oracle path, closing the re-admission
    * vector the erase scaladoc warns about: a rebuild FROM the corpus
    * is exactly how erased bytes would come back if the corpus had
    * been masked instead of physically rewritten. The takedown set is
    * erased from the PARTITIONED source-of-truth corpus
    * ([[graft.operators.Layout.erasePartitionedRows]]), then a serving
    * artifact (BM25) is REBUILT FROM THE ERASED CORPUS — the
    * derivation path every downstream artifact runs after an erase —
    * and must serve the reduced-corpus oracle ranking exactly. In-plan
    * row-dropping gates: (A) the affected partitions' raw corpus files
    * carry zero doomed ids (erasure was physical, not a view filter);
    * (B) the rebuilt index's raw postings files carry zero doomed ids
    * (the rebuild cannot re-admit what the corpus no longer contains);
    * (C) a blocklisted re-crawl of the removed bytes under fresh ids
    * is suppressed while a control slice of new bytes admits (the
    * retained-digest blocklist guards the FUTURE ingest edge,
    * non-vacuously). Build + erase + rebuild run once per mtime-keyed
    * generation. */
  val q_corpus_erase_e2e: Q = (s, dir) => {
    import graft.operators.{Dedup, Layout, Search}
    val docs = t(s, dir, "documents").df
    val doomedPred =
      col("source").isin("src3", "src7") && col("doc_id") % 7 === 3
    val corpus = artifactTable(s, "corpus_erase_e2e", dir, "documents")
    val index = s"${corpus}_bm"
    onceUpserted(s, corpus) {
      Layout.partitionedTableFor(
        docs.select(col("doc_id"), col("text"), col("source")),
        corpus, "source")
      Layout.erasePartitionedRows(s, corpus,
        docs.filter(doomedPred).select(col("doc_id")))
      Search.saveBm25Index(
        Search.buildBm25Index(s.table(corpus), "doc_id", "text"), index)
    }
    val doomedIds = docs.filter(doomedPred).select(col("doc_id"))
    // gate A: physical erasure in the affected partitions' raw files —
    // resolved through the catalog's partition locations (gate B's
    // discipline, and the erase's own), not constructed paths
    val corpusErased = s.read
      .parquet(graft.sources.Sources.partitionDataFiles(s, corpus,
        spec => spec.get("source").exists(Set("src3", "src7"))): _*)
      .join(broadcast(doomedIds), Seq("doc_id"), "left_semi")
      .agg((count(lit(1)) === 0).as("__ca"))
    // gate B: the artifact REBUILT from the erased corpus never
    // contained the ids — its raw postings files are checked, not a view
    val indexErased = s.read
      .parquet(graft.sources.Sources.tableDataFiles(s, index): _*)
      .join(broadcast(doomedIds), Seq("doc_id"), "left_semi")
      .agg((count(lit(1)) === 0).as("__cb"))
    // gate C: the retained blocklist suppresses a re-crawl of the
    // removed bytes under fresh ids; a control slice of NEW bytes
    // admits (proves the pipeline isn't vacuously dropping everything)
    val blockDigests = docs.filter(doomedPred)
      .select(Dedup.contentKey(col("text"), normalize = false).as("fp"))
      .distinct()
    val out = s"${ioDir(dir)}/corpus_erase_e2e"
    val hp = new org.apache.hadoop.fs.Path(out)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(hp, true)
    val live = docs.filter(!doomedPred)
    val recrawl = Streaming.documentsStream(s, dir)
      .filter(col("doc_id") % 7 === 3 &&
        col("source").isin("src3", "src5", "src7"))
      .select((col("doc_id") + 40000000L).as("doc_id"),
        when(col("source") === "src5",
          concat(col("text"), lit(" recrawl")))
          .otherwise(col("text")).as("text"),
        to_timestamp(lit("2024-03-01 00:00:00")).as("ts"))
    val q = Streaming.ingestCurationSink(recrawl, live, "text", "ts", out,
      delay = "30 days", blocklist = Some(blockDigests))
    try q.processAllAvailable() finally q.stop()
    val admitted =
      (if (fs.exists(hp)) s.read.parquet(out)
       else docs.limit(0).select(col("text")))
        .select(Dedup.contentKey(col("text"), normalize = false).as("fp"))
    val suppressed = admitted
      .join(broadcast(blockDigests.withColumn("__b", lit(1))), Seq("fp"), "left")
      .agg((sum(coalesce(col("__b"), lit(0))) === 0 &&
        count(lit(1)) > 0).as("__cc"))
    // the served ranking comes from the index DERIVED FROM the erased
    // corpus — reduced-corpus exactness proves the whole composition
    val idx = Search.loadBm25Index(s, index)
    Search.searchBm25(s.table(corpus), idx, "doc_id", "hash join filter",
        k = 25)
      .select(col("doc_id"), col("bm25_rank"))
      .crossJoin(broadcast(corpusErased)).filter(col("__ca"))
      .crossJoin(broadcast(indexErased)).filter(col("__cb"))
      .crossJoin(broadcast(suppressed)).filter(col("__cc"))
      .select(col("doc_id"), col("bm25_rank"))
      .orderBy(col("bm25_rank"))
  }

  /** Streaming NEAR-duplicate ingest dedup against a static corpus: the
    * documents "crawl" stream (doc_id % 3 == 0) is deduped per
    * micro-batch against the fixed corpus (doc_id % 3 != 0) at 3-gram
    * Jaccard ≥ 0.5 — shared-shingle inverted-index join (complete
    * candidate generation), exact Jaccard verify, survivors landing as
    * idempotent per-batch parquet segments
    * ([[graft.streaming.Streaming.nearDedupAgainstSink]]). Oracle: the
    * batch anti-join formulation of the same exact-Jaccard predicate —
    * deterministic regardless of micro-batch boundaries because dedup is
    * against the FIXED corpus only (see the operator's determinism
    * contract). */
  /** Shared scaffolding for the two streaming near-dup gates: clear
    * stale segments (a rerun may produce fewer batches, and per-batch
    * overwrite only replaces its own id), run the sink query to
    * completion, read the segments back. Reads the sink ROOT
    * (batch=<id> resolves as a partition column, dropped by the select)
    * rather than a `batch=*` glob — the glob path trips FileStreamSink's
    * metadata probe into WARN-logging a spurious FileNotFoundException
    * stack trace on every run. An empty stream slice never creates the
    * sink dir; that reads back as the empty survivor set, not a
    * PATH_NOT_FOUND crash. */
  private def runNearDedupGate(s: SparkSession, dir: String, out: String)(
      start: => org.apache.spark.sql.streaming.StreamingQuery): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(out)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(hp, true)
    val q = start
    try q.processAllAvailable() finally q.stop()
    val back =
      if (fs.exists(hp)) s.read.parquet(out)
      else t(s, dir, "documents").df.limit(0) // empty slice → empty set
    back.select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val q_stream_neardedup: Q = (s, dir) => {
    val docs = t(s, dir, "documents").df
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val stream = Streaming.documentsStream(s, dir)
      .filter(col("doc_id") % 3 === 0)
    val out = s"${ioDir(dir)}/stream_neardedup"
    runNearDedupGate(s, dir, out)(Streaming.nearDedupAgainstSink(stream,
      corpus, "doc_id", "text", out, n = 3, minJaccard = 0.5))
  }

  /** Streaming near-dup SERVING gate: identical semantics and oracle to
    * q_stream_neardedup, but each micro-batch joins the PERSISTED
    * shingle-bucketed corpus index
    * ([[graft.operators.Contamination.shingleIndexFor]], built at most
    * once per (session, corpus mtime)) instead of re-deriving the corpus
    * shingle explode inside every batch plan — the build/serve split a
    * live-crawl deployment runs, and the shape that survives a 100 TB
    * corpus (the index never moves; the micro-batch shuffles into its
    * bucket layout, or broadcasts). */
  val q_stream_neardedup_serve: Q = (s, dir) => {
    import graft.operators.Contamination
    val docs = t(s, dir, "documents").df
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val (table, fp) = fingerprintedArtifact(s, "shingle_idx", dir, "documents")
    val idx = Contamination.shingleIndexFor(corpus, "doc_id", "text", table,
      n = 3, fingerprint = fp)
    val stream = Streaming.documentsStream(s, dir)
      .filter(col("doc_id") % 3 === 0)
    val out = s"${ioDir(dir)}/stream_neardedup_serve"
    runNearDedupGate(s, dir, out)(Streaming.nearDedupAgainstIndexSink(stream,
      idx, "doc_id", "text", out, n = 3, minJaccard = 0.5))
  }

  /** Streaming near-dup TAKEDOWN gate — the fifth serving family's
    * delete tier on the oracle path: the corpus shingle index is built,
    * then every corpus doc with doc_id % 7 == 3 is deleted
    * ([[graft.operators.Contamination.deleteDocs]] — one tombstone
    * commit, bucketed index files untouched), and the stream runs
    * against the MASKED index. Survivors must equal the DuckDB
    * anti-join against the corpus WITHOUT the deleted documents: a
    * stream doc whose only near-neighbor was a deleted corpus doc must
    * now be ADMITTED — a revoked document stops shaping admission
    * decisions the moment its delete commits (the near-dup analogue of
    * the ANN "geometry forgets" contract; physical erasure rides
    * [[graft.streaming.Streaming.compactNearDedupIndex]], pinned in
    * DeleteSpec). */
  val q_stream_neardedup_delete: Q = (s, dir) => {
    import graft.operators.Contamination
    val docs = t(s, dir, "documents").df
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val table = artifactTable(s, "shingle_del", dir, "documents")
    // build-if-missing (the returned frame is re-loaded after the delete)
    Contamination.shingleIndexFor(corpus, "doc_id", "text", table, n = 3)
    Contamination.deleteDocs(s, table,
      corpus.filter(col("doc_id") % 7 === 3).select(col("doc_id")))
    // re-load AFTER the delete: the mask resolves at load time
    val masked = Contamination.shingleIndexFor(corpus, "doc_id", "text",
      table, n = 3)
    val stream = Streaming.documentsStream(s, dir)
      .filter(col("doc_id") % 3 === 0)
    val out = s"${ioDir(dir)}/stream_neardedup_delete"
    runNearDedupGate(s, dir, out)(Streaming.nearDedupAgainstIndexSink(stream,
      masked, "doc_id", "text", out, n = 3, minJaccard = 0.5))
  }

  /** Stream-stream interval join (click→purchase attribution): each
    * click pairs with the same user's purchases within 10 minutes after
    * it; both sides are watermarked streams, matches emit in append
    * mode, and the per-user attribution rollup runs as a batch aggregate
    * over the joined output. Oracle: the equivalent batch interval
    * self-join. */
  val q_stream_join: Q = (s, dir) => {
    val ev = Streaming.eventsStream(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    val pairs = Streaming.intervalJoin(clicks, buys,
      keys = "c_user" -> "p_user", tsCols = "c_ts" -> "p_ts",
      lower = "0 seconds", upper = "10 minutes")
    Streaming.runToBatch(pairs, "stream_join_out", mode = "append")
      .groupBy(col("c_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"), round(sum(col("p_value")), 2).as("sum_value"))
      .orderBy(col("user_id"))
  }

  /** Gap-based session windows per user (session_window operator). */
  val q_session_window: Q = (s, dir) => {
    Streaming.sessionWindows(events(s, dir).df, "10 minutes")
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** parse_timedelta (littletable.py:1262-1284): duration strings →
    * DayTimeIntervalType via try_to_timestamp minus a reference time;
    * the gate outputs the interval's total seconds (extracted FROM the
    * parsed interval) against DuckDB's direct time-of-day arithmetic. */
  val q_parse_timedelta: Q = (s, dir) => {
    val strs = events(s, dir).df
      .select(date_format(col("ts"), "HH:mm:ss").as("s"))
    val delta = graft.sources.Sources.parseTimedelta("HH:mm:ss")(col("s"))
    strs.withColumn("__d", delta)
      .select(col("s"),
        (expr("extract(HOUR FROM __d)") * 3600 +
          expr("extract(MINUTE FROM __d)") * 60 +
          expr("extract(SECOND FROM __d)").cast("long")).as("delta_secs"))
      .groupBy(col("s"), col("delta_secs"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("s"))
  }

  /** shuffle(seed) (littletable.py:2184-2190): seeded deterministic
    * permutation. The oracle-checkable property is bag preservation —
    * shuffling then re-sorting equals the source (no row lost, duplicated
    * or mutated); permutation determinism is pinned in GTableSpec. */
  val q_shuffle: Q = (s, dir) =>
    t(s, dir, "nation").shuffle(seed = 7L)
      .orderby("n_nationkey")
      .df.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))

  // ==================================================================
  // Multimodal columns (binary payload + metadata + batched decode stub)
  // ==================================================================

  import graft.operators.Multimodal

  /** Binary payload + typed metadata struct. */
  val q_multimodal_meta: Q = (s, dir) =>
    Multimodal.attachBinary(t(s, dir, "documents").df, "doc_id", "text")
      .select(col("doc_id"), col("media_meta.n_bytes").as("n_bytes"),
        col("media_meta.checksum").as("checksum"))
      .orderBy(col("doc_id"))

  /** Batched decode via mapPartitions (the mapInPandas shape) — decoder
    * stubbed deterministically, plumbing real. */
  val q_multimodal_features: Q = (s, dir) => {
    val bin = Multimodal.attachBinary(t(s, dir, "documents").df, "doc_id", "text")
    Multimodal.extractFeatures(bin, "doc_id")
      .orderBy(col("doc_id"))
  }

  /** Frame-sampling stub: one row per (media, frame). */
  val q_frame_sample: Q = (s, dir) => {
    val bin = Multimodal.attachBinary(t(s, dir, "documents").df, "doc_id", "text")
    Multimodal.frameSample(bin, "doc_id", everyNBytes = 256)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"), sum(col("frame_offset")).as("sum_off"))
      .orderBy(col("doc_id"))
  }

  // ==================================================================
  // Registry
  // ==================================================================

  val all: Map[String, Q] = Map(
    "q1_agg" -> q1_agg,
    "q_groupby_summaries" -> q_groupby_summaries,
    "q_pivot_counts" -> q_pivot_counts,
    "q_pivot_totals" -> q_pivot_totals,
    "q_pivot_sum" -> q_pivot_sum,
    "q_pivot_3level" -> q_pivot_3level,
    "q_profile" -> q_profile,
    "q_stats" -> q_stats,
    "q_rollup" -> q_rollup,
    "q_cube" -> q_cube,
    "q_groupby_runs" -> q_groupby_runs,
    "q_where_comparators" -> q_where_comparators,
    "q_select_computed" -> q_select_computed,
    "q_delete" -> q_delete,
    "q_splitby" -> q_splitby,
    "q_compute_field" -> q_compute_field,
    "q_format" -> q_format,
    "q_orderby_limit" -> q_orderby_limit,
    "q_tail" -> q_tail,
    "q_slice" -> q_slice,
    "q_batched" -> q_batched,
    "q_rank" -> q_rank,
    "q_union_all" -> q_union_all,
    "q_intersect" -> q_intersect,
    "q_except" -> q_except,
    "q_unique_first" -> q_unique_first,
    "q_join_inner" -> q_join_inner,
    "q_join_salted" -> q_join_salted,
    "q_udaf_summaries" -> q_udaf_summaries,
    "q_join_asof" -> q_join_asof,
    "q_join_range" -> q_join_range,
    "q_typed_dataset" -> q_typed_dataset,
    "q_join3_revenue" -> q_join3_revenue,
    "q_join_multikey" -> q_join_multikey,
    "q_join_left" -> q_join_left,
    "q_join_right" -> q_join_right,
    "q_join_full" -> q_join_full,
    "q_join_semi" -> q_join_semi,
    "q_join_anti" -> q_join_anti,
    "q_join_chain" -> q_join_chain,
    "q_topk_per_group" -> q_topk_per_group,
    "q_window_running" -> q_window_running,
    "q_search_scored" -> q_search_scored,
    "q_search_minscore" -> q_search_minscore,
    "q_token_count" -> q_token_count,
    "q_quality_score" -> q_quality_score,
    "q_lang_id" -> q_lang_id,
    "q_fingerprint" -> q_fingerprint,
    "q_repetition" -> q_repetition,
    "q_mix_weighted" -> q_mix_weighted,
    "q_mix_temperature" -> q_mix_temperature,
    "q_curation_funnel" -> q_curation_funnel,
    "q_split_hash" -> q_split_hash,
    "q_sample_stratified" -> q_sample_stratified,
    "q_weighted_sample" -> q_weighted_sample,
    "q_contamination" -> q_contamination,
    "q_decontam_bloom" -> q_decontam_bloom,
    "q_decontam_fuzzy" -> q_decontam_fuzzy,
    "q_cap_per_source" -> q_cap_per_source,
    "q_quantile_band" -> q_quantile_band,
    "q_vocab_top" -> q_vocab_top,
    "q_tfidf_top" -> q_tfidf_top,
    "q_search_bm25" -> q_search_bm25,
    "q_search_bm25_serve" -> q_search_bm25_serve,
    "q_search_bm25_upsert" -> q_search_bm25_upsert,
    "q_search_bm25_compact" -> q_search_bm25_compact,
    "q_search_bm25_catchup" -> q_search_bm25_catchup,
    "q_search_bm25_delete" -> q_search_bm25_delete,
    "q_search_bm25_delete_seg" -> q_search_bm25_delete_seg,
    "q_search_bm25_reclaim" -> q_search_bm25_reclaim,
    "q_stream_bm25_ingest" -> q_stream_bm25_ingest,
    "q_approx_distinct" -> q_approx_distinct,
    "q_sketch_rollup" -> q_sketch_rollup,
    "q_sketch_compact" -> q_sketch_compact,
    "q_sketch_delete" -> q_sketch_delete,
    "q_stream_sketch_ingest" -> q_stream_sketch_ingest,
    "q_quantile_rollup" -> q_quantile_rollup,
    "q_cms_counts" -> q_cms_counts,
    "q_heavy_hitters" -> q_heavy_hitters,
    "q_gopher_rules" -> q_gopher_rules,
    "q_sim_pq" -> q_sim_pq,
    "q_sim_pq_serve" -> q_sim_pq_serve,
    "q_stream_enrich" -> q_stream_enrich,
    "q_cluster_best" -> q_cluster_best,
    "q_chunk_windows" -> q_chunk_windows,
    "q_pack_index" -> q_pack_index,
    "q_pack_sequences" -> q_pack_sequences,
    "q_pii_redact" -> q_pii_redact,
    "q_span_dedup" -> q_span_dedup,
    "q_substr_dedup" -> q_substr_dedup,
    "q_encoding_scan" -> q_encoding_scan,
    "q_dedup_incremental" -> q_dedup_incremental,
    "q_cdc_chunks" -> q_cdc_chunks,
    "q_line_dedup" -> q_line_dedup,
    "q_bpe_pairs" -> q_bpe_pairs,
    "q_bpe_train" -> q_bpe_train,
    "q_bpe_train_deep" -> q_bpe_train_deep,
    "q_bpe_train_vocab_depth" -> q_bpe_train_vocab_depth,
    "q_bpe_apply" -> q_bpe_apply,
    "q_bpe_roundtrip" -> q_bpe_roundtrip,
    "q_bpe_vocab" -> q_bpe_vocab,
    "q_bpe_apply_deep" -> q_bpe_apply_deep,
    "q_shard_assign" -> q_shard_assign,
    "q_dsir_scores" -> q_dsir_scores,
    "q_classifier_score" -> q_classifier_score,
    "q_lm_score" -> q_lm_score,
    "q_lm_score_cross" -> q_lm_score_cross,
    "q_token_budget" -> q_token_budget,
    "q_top_fraction" -> q_top_fraction,
    "q_budget_per_group" -> q_budget_per_group,
    "q_pagerank" -> q_pagerank,
    "q_pipeline_e2e" -> q_pipeline_e2e,
    "q_length_buckets" -> q_length_buckets,
    "q_embed_normalize" -> q_embed_normalize,
    "q_embed_quantize" -> q_embed_quantize,
    "q_dedup_exact" -> q_dedup_exact,
    "q_dedup_ngram" -> q_dedup_ngram,
    "q_dedup_remove" -> q_dedup_remove,
    "q_dedup_cluster" -> q_dedup_cluster,
    "q_dedup_minhash" -> q_dedup_minhash,
    "q_dedup_simhash" -> q_dedup_simhash,
    "q_dedup_embedding" -> q_dedup_embedding,
    "q_dedup_semantic" -> q_dedup_semantic,
    "q_zorder_layout" -> q_zorder_layout,
    "q_partition_prune" -> q_partition_prune,
    "q_partition_prune_dynamic" -> q_partition_prune_dynamic,
    "q_partition_prune_multi" -> q_partition_prune_multi,
    "q_stream_partition_prune" -> q_stream_partition_prune,
    "q_sim_topk" -> q_sim_topk,
    "q_hybrid_rrf" -> q_hybrid_rrf,
    "q_hybrid_borda" -> q_hybrid_borda,
    "q_rank_eval" -> q_rank_eval,
    "q_rank_eval_batch" -> q_rank_eval_batch,
    "q_rank_eval_takedown" -> q_rank_eval_takedown,
    "q_hard_negatives" -> q_hard_negatives,
    "q_search_bm25_batch" -> q_search_bm25_batch,
    "q_hybrid_rrf_batch" -> q_hybrid_rrf_batch,
    "q_sim_ivf_batch" -> q_sim_ivf_batch,
    "q_sim_lsh_batch" -> q_sim_lsh_batch,
    "q_sim_pq_batch" -> q_sim_pq_batch,
    "q_sim_filtered" -> q_sim_filtered,
    "q_sim_ivf_filtered" -> q_sim_ivf_filtered,
    "q_sim_maxsim" -> q_sim_maxsim,
    "q_sim_maxsim_batch" -> q_sim_maxsim_batch,
    "q_mmr_rerank" -> q_mmr_rerank,
    "q_sim_lsh" -> q_sim_lsh,
    "q_sim_lsh_serve" -> q_sim_lsh_serve,
    "q_sim_ivf" -> q_sim_ivf,
    "q_sim_ivf_serve" -> q_sim_ivf_serve,
    "q_sim_ivf_upsert" -> q_sim_ivf_upsert,
    "q_sim_ivf_compact" -> q_sim_ivf_compact,
    "q_sim_ivf_catchup" -> q_sim_ivf_catchup,
    "q_sim_ivf_delete" -> q_sim_ivf_delete,
    "q_sim_ivf_reclaim" -> q_sim_ivf_reclaim,
    "q_sim_lsh_upsert" -> q_sim_lsh_upsert,
    "q_sim_lsh_compact" -> q_sim_lsh_compact,
    "q_sim_lsh_catchup" -> q_sim_lsh_catchup,
    "q_sim_lsh_delete" -> q_sim_lsh_delete,
    "q_sim_lsh_reclaim" -> q_sim_lsh_reclaim,
    "q_stream_lsh_ingest" -> q_stream_lsh_ingest,
    "q_stream_pq_ingest" -> q_stream_pq_ingest,
    "q_stream_ivf_ingest" -> q_stream_ivf_ingest,
    "q_sim_pq_upsert" -> q_sim_pq_upsert,
    "q_sim_pq_compact" -> q_sim_pq_compact,
    "q_sim_pq_catchup" -> q_sim_pq_catchup,
    "q_sim_pq_delete" -> q_sim_pq_delete,
    "q_sim_pq_reclaim" -> q_sim_pq_reclaim,
    "q_csv_roundtrip" -> q_csv_roundtrip,
    "q_excel_roundtrip" -> q_excel_roundtrip,
    "q_excel_dates" -> q_excel_dates,
    "q_tsv_roundtrip" -> q_tsv_roundtrip,
    "q_json_roundtrip" -> q_json_roundtrip,
    "q_fixedwidth" -> q_fixedwidth,
    "q_csv_string" -> q_csv_string,
    "q_zip_import" -> q_zip_import,
    "q_stream_tumbling" -> q_stream_tumbling,
    "q_stream_approx_distinct" -> q_stream_approx_distinct,
    "q_stream_quantiles" -> q_stream_quantiles,
    "q_stream_join" -> q_stream_join,
    "q_stream_sliding" -> q_stream_sliding,
    "q_stream_stateful" -> q_stream_stateful,
    "q_session_window" -> q_session_window,
    "q_stream_dedup" -> q_stream_dedup,
    "q_stream_funnel" -> q_stream_funnel,
    "q_stream_ingest_e2e" -> q_stream_ingest_e2e,
    "q_stream_ingest_blocklist" -> q_stream_ingest_blocklist,
    "q_takedown_e2e" -> q_takedown_e2e,
    "q_corpus_erase" -> q_corpus_erase,
    "q_corpus_erase_e2e" -> q_corpus_erase_e2e,
    "q_stream_neardedup" -> q_stream_neardedup,
    "q_stream_neardedup_serve" -> q_stream_neardedup_serve,
    "q_stream_neardedup_delete" -> q_stream_neardedup_delete,
    "q_parse_timedelta" -> q_parse_timedelta,
    "q_shuffle" -> q_shuffle,
    "q_multimodal_meta" -> q_multimodal_meta,
    "q_multimodal_features" -> q_multimodal_features,
    "q_frame_sample" -> q_frame_sample
  )

  /** Shared by q_search_bm25 (build+query in one plan),
    * q_search_bm25_serve (query over the persisted postings table),
    * q_search_bm25_upsert (query over a base+delta-appended artifact),
    * and q_stream_bm25_ingest (query over base ∪ streaming-admitted
    * segments) — append and admission are content-identical to a full
    * build, so all four must produce exactly this ranking. */
  private val bm25OracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
      |  FROM documents
      |), tok2 AS (SELECT doc_id, word FROM toks WHERE word <> ''),
      |lens AS (SELECT doc_id, count(*) AS doclen FROM tok2 GROUP BY doc_id),
      |stats AS (
      |  SELECT (SELECT count(*) FROM documents) AS n,
      |    (SELECT count(*) FROM tok2)::DOUBLE
      |      / (SELECT count(*) FROM documents) AS avglen),
      |terms(word) AS (VALUES ('hash'), ('join'), ('filter')),
      |tf AS (
      |  SELECT doc_id, word, count(*) AS tf FROM tok2
      |  WHERE word IN (SELECT word FROM terms) GROUP BY doc_id, word),
      |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
      |scored AS (
      |  SELECT tf.doc_id,
      |    sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
      |        * (tf.tf * 2.2)
      |        / (tf.tf + 1.2 * (0.25 + 0.75 * l.doclen / s.avglen))) AS bm25
      |  FROM tf JOIN dfreq d USING (word)
      |    JOIN lens l ON l.doc_id = tf.doc_id CROSS JOIN stats s
      |  GROUP BY tf.doc_id)
      |SELECT doc_id, bm25_rank FROM (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS bm25_rank
      |  FROM scored)
      |WHERE bm25_rank <= 25 ORDER BY bm25_rank""".stripMargin

  /** Shared by the BM25 takedown pair (q_search_bm25_delete masks at
    * serve; q_search_bm25_reclaim physically erases at compaction):
    * the SAME ranking computation as [[bm25OracleSql]] but over the
    * corpus WITHOUT the deleted documents (doc_id % 7 == 3) — n,
    * avg_len, df, every idf recomputed from the survivors, so a
    * masking path that forgot any constant correction ranks
    * differently and hash-mismatches. */
  private val bm25DeletedOracleSql: String =
    bm25WithoutOracleSql("doc_id % 7 <> 3")

  /** The BM25-over-a-reduced-corpus oracle, parameterized by the
    * survivor predicate — shared by every takedown-tier gate (delete,
    * reclaim, segment-resident delete, the e2e composition), each of
    * which must serve EXACTLY this ranking from its masked/erased
    * artifact. (Plain-template substitution, not s-interpolation: the
    * SQL body carries regex escapes an interpolator would mangle.) */
  private def bm25WithoutOracleSql(survivors: String): String =
    bm25WithoutTemplate.replace("__SURVIVORS__", survivors)

  /** Shared by the two hybrid-retrieval gates: both retrievers' top-50
    * rankings re-derived in SQL — the [[bm25OracleSql]] CTE chain for
    * the lexical side, the q_sim_topk cosine ranking for the vector
    * side — then fused per the parameterized per-list contribution.
    * All contributions are exact functions of integer ranks (and the
    * two list sizes), so the fused doubles are bit-identical to the
    * Spark side's. */
  /** The two retrievers' top-50 rankings as a reusable CTE chain
    * (`lex(doc_id, r)` / `vecr(doc_id, r)`) — shared by the hybrid
    * fusion oracles and the rank-eval oracle. */
  private val hybridRankingsCtes: String =
    """toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
      |  FROM documents
      |), tok2 AS (SELECT doc_id, word FROM toks WHERE word <> ''),
      |lens AS (SELECT doc_id, count(*) AS doclen FROM tok2 GROUP BY doc_id),
      |stats AS (
      |  SELECT (SELECT count(*) FROM documents) AS n,
      |    (SELECT count(*) FROM tok2)::DOUBLE
      |      / (SELECT count(*) FROM documents) AS avglen),
      |terms(word) AS (VALUES ('hash'), ('join'), ('filter')),
      |tf AS (
      |  SELECT doc_id, word, count(*) AS tf FROM tok2
      |  WHERE word IN (SELECT word FROM terms) GROUP BY doc_id, word),
      |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
      |bscored AS (
      |  SELECT tf.doc_id,
      |    sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
      |        * (tf.tf * 2.2)
      |        / (tf.tf + 1.2 * (0.25 + 0.75 * l.doclen / s.avglen))) AS bm25
      |  FROM tf JOIN dfreq d USING (word)
      |    JOIN lens l ON l.doc_id = tf.doc_id CROSS JOIN stats s
      |  GROUP BY tf.doc_id),
      |lex AS (
      |  SELECT doc_id, r FROM (
      |    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
      |    FROM bscored)
      |  WHERE r <= 50),
      |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
      |vecr AS (
      |  SELECT doc_id, r FROM (
      |    SELECT vec_id AS doc_id, row_number() OVER (
      |      ORDER BY list_dot_product(embedding::DOUBLE[], qv)
      |        / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
      |           * sqrt(list_dot_product(qv, qv))) DESC, vec_id) AS r
      |    FROM embeddings, q)
      |  WHERE r <= 50)""".stripMargin

  private def hybridOracleSql(fusedCte: String, rankName: String): String =
    s"""WITH $hybridRankingsCtes,
      |fused AS (
      |$fusedCte),
      |agg AS (SELECT doc_id, sum(fs) AS score, count(*) AS n_lists
      |  FROM fused GROUP BY doc_id)
      |SELECT doc_id, n_lists, $rankName FROM (
      |  SELECT doc_id, n_lists,
      |    row_number() OVER (ORDER BY score DESC, doc_id) AS $rankName
      |  FROM agg)
      |WHERE $rankName <= 25 ORDER BY $rankName""".stripMargin

  private val hybridRrfOracleSql: String = hybridOracleSql(
    """  SELECT doc_id, 1::DOUBLE / (60 + r) AS fs FROM lex
      |  UNION ALL
      |  SELECT doc_id, 1::DOUBLE / (60 + r) AS fs FROM vecr""".stripMargin,
    "rrf_rank")

  private val hybridBordaOracleSql: String = hybridOracleSql(
    """  SELECT doc_id,
      |    ((SELECT count(*) FROM lex) + 1 - r)::DOUBLE * 2::DOUBLE
      |      / (SELECT count(*) FROM lex)::DOUBLE AS fs FROM lex
      |  UNION ALL
      |  SELECT doc_id,
      |    ((SELECT count(*) FROM vecr) + 1 - r)::DOUBLE * 1::DOUBLE
      |      / (SELECT count(*) FROM vecr)::DOUBLE AS fs FROM vecr""".stripMargin,
    "borda_rank")

  /** The rank-eval gate's oracle: the three rankings (lex / vecr / the
    * RRF fusion) each evaluated at k=25 against the same graded qrels —
    * recall@k, MRR@k, nDCG@k re-derived entirely in SQL. One eval CTE
    * per system keeps the metric arithmetic identical across rows. */
  /** One DuckDB eval CTE (recall/MRR/nDCG/MAP at 25 over a `(doc_id,
    * r)` ranking CTE named `ranking`, against CTEs `qrels` and `idcg`)
    * — shared by the q_rank_eval and q_rank_eval_takedown oracles so
    * the metric re-derivation is literally the same SQL in both. */
  private def rankEvalCte(name: String, ranking: String): String =
    s"""eval_$name AS (
      |  SELECT '$name' AS system,
      |    (SELECT count(*) FROM qrels)::BIGINT AS n_relevant,
      |    round(count(g)::DOUBLE / (SELECT count(*) FROM qrels), 4)
      |      AS recall_at_k,
      |    round(coalesce(1::DOUBLE
      |      / min(CASE WHEN g IS NOT NULL THEN r END), 0), 4) AS mrr_at_k,
      |    round(coalesce(sum((pow(2, g) - 1) / log2(r + 1))
      |      / (SELECT v FROM idcg), 0), 4) AS ndcg_at_k,
      |    round(coalesce(
      |        sum(CASE WHEN g IS NOT NULL THEN hidx::DOUBLE / r END), 0)
      |      / least(25, (SELECT count(*) FROM qrels)), 4) AS map_at_k
      |  FROM (SELECT rk.r AS r, q.g AS g,
      |          count(q.g) OVER (ORDER BY rk.r
      |            ROWS UNBOUNDED PRECEDING) AS hidx
      |        FROM $ranking rk
      |        LEFT JOIN qrels q ON rk.doc_id = q.doc_id
      |        WHERE rk.r <= 25))""".stripMargin

  private val rankEvalOracleSql: String = {
    def evalCte(name: String, ranking: String): String =
      rankEvalCte(name, ranking)
    s"""WITH $hybridRankingsCtes,
      |fused AS (
      |  SELECT doc_id, 1::DOUBLE / (60 + r) AS fs FROM lex
      |  UNION ALL
      |  SELECT doc_id, 1::DOUBLE / (60 + r) AS fs FROM vecr),
      |agg AS (SELECT doc_id, sum(fs) AS score FROM fused GROUP BY doc_id),
      |rrfr AS (
      |  SELECT doc_id, r FROM (
      |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
      |    FROM agg)
      |  WHERE r <= 25),
      |qrels AS (
      |  SELECT doc_id, (1 + doc_id % 3)::DOUBLE AS g FROM documents
      |  WHERE doc_id % 10 = 3),
      |idcg AS (
      |  SELECT sum((pow(2, g) - 1) / log2(i + 1)) AS v FROM (
      |    SELECT g, row_number() OVER (ORDER BY g DESC, doc_id) AS i
      |    FROM qrels)
      |  WHERE i <= 25),
      |${evalCte("bm25", "lex")},
      |${evalCte("cosine", "vecr")},
      |${evalCte("hybrid_rrf", "rrfr")}
      |SELECT * FROM eval_bm25
      |UNION ALL SELECT * FROM eval_cosine
      |UNION ALL SELECT * FROM eval_hybrid_rrf
      |ORDER BY system""".stripMargin
  }

  /** Oracle for q_rank_eval_takedown: BOTH BM25 rankings re-derived
    * from scratch — `pre` over the full corpus, `post` over the
    * survivors with survivor-recomputed df/n/avglen (the
    * q_search_bm25_delete stats contract) — then both evaluated with
    * the SAME [[rankEvalCte]] metric SQL against the unchanged qrels. */
  private val rankEvalTakedownOracleSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
      |  FROM documents
      |), tok2 AS (SELECT doc_id, word FROM toks WHERE word <> ''),
      |terms(word) AS (VALUES ('hash'), ('join'), ('filter')),
      |lens AS (SELECT doc_id, count(*) AS doclen FROM tok2 GROUP BY doc_id),
      |stats AS (
      |  SELECT (SELECT count(*) FROM documents) AS n,
      |    (SELECT count(*) FROM tok2)::DOUBLE
      |      / (SELECT count(*) FROM documents) AS avglen),
      |tf AS (
      |  SELECT doc_id, word, count(*) AS tf FROM tok2
      |  WHERE word IN (SELECT word FROM terms) GROUP BY doc_id, word),
      |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
      |scored AS (
      |  SELECT tf.doc_id,
      |    sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
      |        * (tf.tf * 2.2)
      |        / (tf.tf + 1.2 * (0.25 + 0.75 * l.doclen / s.avglen))) AS bm25
      |  FROM tf JOIN dfreq d USING (word)
      |    JOIN lens l ON l.doc_id = tf.doc_id CROSS JOIN stats s
      |  GROUP BY tf.doc_id),
      |pre AS (
      |  SELECT doc_id, r FROM (
      |    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
      |    FROM scored) WHERE r <= 25),
      |stok2 AS (SELECT doc_id, word FROM tok2 WHERE doc_id % 30 <> 3),
      |slens AS (SELECT doc_id, count(*) AS doclen FROM stok2 GROUP BY doc_id),
      |sstats AS (
      |  SELECT (SELECT count(*) FROM documents WHERE doc_id % 30 <> 3) AS n,
      |    (SELECT count(*) FROM stok2)::DOUBLE
      |      / (SELECT count(*) FROM documents WHERE doc_id % 30 <> 3)
      |      AS avglen),
      |stf AS (
      |  SELECT doc_id, word, count(*) AS tf FROM stok2
      |  WHERE word IN (SELECT word FROM terms) GROUP BY doc_id, word),
      |sdfreq AS (SELECT word, count(*) AS df FROM stf GROUP BY word),
      |sscored AS (
      |  SELECT stf.doc_id,
      |    sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
      |        * (stf.tf * 2.2)
      |        / (stf.tf + 1.2 * (0.25 + 0.75 * l.doclen / s.avglen))) AS bm25
      |  FROM stf JOIN sdfreq d USING (word)
      |    JOIN slens l ON l.doc_id = stf.doc_id CROSS JOIN sstats s
      |  GROUP BY stf.doc_id),
      |post AS (
      |  SELECT doc_id, r FROM (
      |    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r
      |    FROM sscored) WHERE r <= 25),
      |qrels AS (
      |  SELECT doc_id, (1 + doc_id % 3)::DOUBLE AS g FROM documents
      |  WHERE doc_id % 10 = 3),
      |idcg AS (
      |  SELECT sum((pow(2, g) - 1) / log2(i + 1)) AS v FROM (
      |    SELECT g, row_number() OVER (ORDER BY g DESC, doc_id) AS i
      |    FROM qrels)
      |  WHERE i <= 25),
      |${rankEvalCte("bm25_pre_takedown", "pre")},
      |${rankEvalCte("bm25_post_takedown", "post")}
      |SELECT * FROM eval_bm25_pre_takedown
      |UNION ALL SELECT * FROM eval_bm25_post_takedown
      |ORDER BY system""".stripMargin

  /** Shared by the three BATCH ANN recall gates (q_sim_ivf_batch /
    * q_sim_lsh_batch / q_sim_pq_batch): the per-query exact cosine
    * top-10 for the 3-query workload — each gate's batch ANN top-30
    * must contain it, per query. */
  private val annBatchExactTop10Sql: String =
    """WITH qv AS (
      |  SELECT (vec_id + 1)::INT AS qid, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id <= 2
      |), scored AS (
      |  SELECT q.qid, e.vec_id,
      |    list_dot_product(e.embedding::DOUBLE[], q.qv)
      |     / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
      |        * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
      |  FROM embeddings e CROSS JOIN qv q
      |), ranked AS (
      |  SELECT qid, vec_id, cosine,
      |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS r
      |  FROM scored)
      |SELECT qid, vec_id, cosine FROM ranked
      |WHERE r <= 10 ORDER BY qid, cosine DESC, vec_id""".stripMargin

  // lazy: referenced by bm25DeletedOracleSql's initializer above it
  private lazy val bm25WithoutTemplate: String =
    """WITH docs AS (
      |  SELECT doc_id, text FROM documents WHERE __SURVIVORS__
      |), toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
      |  FROM docs
      |), tok2 AS (SELECT doc_id, word FROM toks WHERE word <> ''),
      |lens AS (SELECT doc_id, count(*) AS doclen FROM tok2 GROUP BY doc_id),
      |stats AS (
      |  SELECT (SELECT count(*) FROM docs) AS n,
      |    (SELECT count(*) FROM tok2)::DOUBLE
      |      / (SELECT count(*) FROM docs) AS avglen),
      |terms(word) AS (VALUES ('hash'), ('join'), ('filter')),
      |tf AS (
      |  SELECT doc_id, word, count(*) AS tf FROM tok2
      |  WHERE word IN (SELECT word FROM terms) GROUP BY doc_id, word),
      |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
      |scored AS (
      |  SELECT tf.doc_id,
      |    sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
      |        * (tf.tf * 2.2)
      |        / (tf.tf + 1.2 * (0.25 + 0.75 * l.doclen / s.avglen))) AS bm25
      |  FROM tf JOIN dfreq d USING (word)
      |    JOIN lens l ON l.doc_id = tf.doc_id CROSS JOIN stats s
      |  GROUP BY tf.doc_id)
      |SELECT doc_id, bm25_rank FROM (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS bm25_rank
      |  FROM scored)
      |WHERE bm25_rank <= 25 ORDER BY bm25_rank""".stripMargin

  /** Shared by the nine ANN recall gates (q_sim_lsh / q_sim_ivf /
    * q_sim_pq, their `_serve` variants over persisted indexes, and the
    * incremental `_upsert` gates over delta-appended artifacts) — each
    * gate must contain exactly this exact cosine top-10 inside its ANN
    * top-20. */
  private val annExactTop10Sql: String =
    """WITH q AS (
      |  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
      |)
      |SELECT vec_id,
      |  list_dot_product(embedding::DOUBLE[], qv)
      |   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
      |      * sqrt(list_dot_product(qv, qv))) AS cosine
      |FROM embeddings, q
      |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin

  /** Shared by the four ANN takedown/reclaim gates: the exact cosine
    * top-10 over the corpus WITHOUT the deleted vectors
    * (vec_id % 7 == 3) — the post-takedown neighborhood the masked (or
    * physically erased) artifact must still recover. */
  private val annExactTop10DeletedSql: String =
    """WITH q AS (
      |  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
      |)
      |SELECT vec_id,
      |  list_dot_product(embedding::DOUBLE[], qv)
      |   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
      |      * sqrt(list_dot_product(qv, qv))) AS cosine
      |FROM embeddings, q
      |WHERE vec_id % 7 <> 3
      |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin

  /** Shared by q_sim_filtered and the q_sim_ivf_filtered recall gate:
    * the exact cosine top-10 over the label < 5 survivors. */
  private val annExactTop10FilteredSql: String =
    """WITH q AS (
      |  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
      |)
      |SELECT vec_id,
      |  list_dot_product(embedding::DOUBLE[], qv)
      |   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
      |      * sqrt(list_dot_product(qv, qv))) AS cosine
      |FROM embeddings, q
      |WHERE label < 5
      |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin

  /** MaxSim oracle: recompute the late-interaction scoring surface —
    * 4 query-token × 4 doc-token slices (16 dims each via list_slice),
    * per-(doc, query-token) max cosine, then the SAME fixed-order
    * m1+m2+m3+m4 sum the Spark plan computes (conditional-max pivot:
    * SQL sum() over rows would add in engine order and could differ in
    * the last ulp). */
  private val maxSimOracleSql: String =
    """WITH q AS (
      |  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
      |),
      |toks AS (SELECT unnest(generate_series(1, 4)) AS tok),
      |dt AS (
      |  SELECT vec_id, t.tok,
      |    list_slice(embedding::DOUBLE[], (t.tok-1)*16+1, t.tok*16) AS dv
      |  FROM embeddings, toks t
      |),
      |qt AS (
      |  SELECT t.tok AS qtok, list_slice(qv, (t.tok-1)*16+1, t.tok*16) AS qvs
      |  FROM q, toks t
      |),
      |pm AS (
      |  SELECT dt.vec_id, qt.qtok,
      |    max(list_dot_product(dt.dv, qt.qvs)
      |      / (sqrt(list_dot_product(dt.dv, dt.dv))
      |         * sqrt(list_dot_product(qt.qvs, qt.qvs)))) AS m
      |  FROM dt, qt GROUP BY 1, 2
      |)
      |SELECT vec_id,
      |  max(CASE WHEN qtok = 1 THEN m END) + max(CASE WHEN qtok = 2 THEN m END)
      |  + max(CASE WHEN qtok = 3 THEN m END) + max(CASE WHEN qtok = 4 THEN m END)
      |  AS maxsim
      |FROM pm GROUP BY vec_id
      |ORDER BY maxsim DESC, vec_id LIMIT 10""".stripMargin

  /** Batch MaxSim oracle: the 3-query workload version — same slicing
    * and fixed-order sum, ranking windowed per query. */
  private val maxSimBatchOracleSql: String =
    """WITH toks AS (SELECT unnest(generate_series(1, 4)) AS tok),
      |qs AS (
      |  SELECT CAST(vec_id + 1 AS INT) AS qid, embedding::DOUBLE[] AS qv
      |  FROM embeddings WHERE vec_id <= 2
      |),
      |qt AS (
      |  SELECT qs.qid, t.tok AS qtok,
      |    list_slice(qs.qv, (t.tok-1)*16+1, t.tok*16) AS qvs
      |  FROM qs, toks t
      |),
      |dt AS (
      |  SELECT vec_id, t.tok,
      |    list_slice(embedding::DOUBLE[], (t.tok-1)*16+1, t.tok*16) AS dv
      |  FROM embeddings, toks t
      |),
      |pm AS (
      |  SELECT qt.qid, dt.vec_id, qt.qtok,
      |    max(list_dot_product(dt.dv, qt.qvs)
      |      / (sqrt(list_dot_product(dt.dv, dt.dv))
      |         * sqrt(list_dot_product(qt.qvs, qt.qvs)))) AS m
      |  FROM dt, qt GROUP BY 1, 2, 3
      |),
      |sc AS (
      |  SELECT qid, vec_id,
      |    max(CASE WHEN qtok = 1 THEN m END) + max(CASE WHEN qtok = 2 THEN m END)
      |    + max(CASE WHEN qtok = 3 THEN m END) + max(CASE WHEN qtok = 4 THEN m END)
      |    AS maxsim
      |  FROM pm GROUP BY 1, 2
      |),
      |rk AS (
      |  SELECT qid, vec_id, maxsim,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY maxsim DESC, vec_id)
      |      AS maxsim_rank
      |  FROM sc
      |)
      |SELECT qid, vec_id, maxsim, maxsim_rank FROM rk
      |WHERE maxsim_rank <= 10
      |ORDER BY qid, maxsim_rank""".stripMargin

  /** MMR oracle: replay the greedy trajectory in SQL — per query, 10
    * chained argmax steps over the exact cosine top-30 candidates. Step
    * 1 is pure relevance; step i orders by 0.5·rel − 0.5·(correlated
    * max cosine to the picked set), tie-broken (rel desc, vec_id asc)
    * exactly like the Spark greedy loop's keep-first-strict-max scan
    * over its (rel desc, id asc)-sorted group. Generated, not
    * hand-written: k×|queries| CTEs of three mechanical shapes. */
  private def mmrOracleSql(queryVecIds: Seq[Int], k: Int): String = {
    val perQuery = queryVecIds.map { qv =>
      val base =
        s"""cand_$qv AS MATERIALIZED (
           |  SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
           |    list_dot_product(e.embedding::DOUBLE[], q.qv)
           |     / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
           |        * sqrt(list_dot_product(q.qv, q.qv))) AS rel
           |  FROM embeddings e,
           |    (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = $qv) q
           |  ORDER BY rel DESC, e.vec_id LIMIT 30
           |),
           |s_${qv}_1 AS MATERIALIZED (
           |  SELECT vec_id, v, rel, 1 AS mmr_rank FROM cand_$qv
           |  ORDER BY rel DESC, vec_id LIMIT 1
           |),
           |sel_${qv}_1 AS MATERIALIZED (SELECT * FROM s_${qv}_1)""".stripMargin
      val steps = (2 to k).map { i =>
        s"""s_${qv}_$i AS MATERIALIZED (
           |  SELECT c.vec_id, c.v, c.rel, $i AS mmr_rank
           |  FROM cand_$qv c
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel_${qv}_${i - 1})
           |  ORDER BY 0.5 * c.rel - 0.5 * (
           |      SELECT max(list_dot_product(c.v, s.v)
           |        / (sqrt(list_dot_product(c.v, c.v))
           |           * sqrt(list_dot_product(s.v, s.v))))
           |      FROM sel_${qv}_${i - 1} s) DESC,
           |    c.rel DESC, c.vec_id ASC
           |  LIMIT 1
           |),
           |sel_${qv}_$i AS MATERIALIZED (
           |  SELECT * FROM sel_${qv}_${i - 1} UNION ALL SELECT * FROM s_${qv}_$i
           |)""".stripMargin
      }
      (base +: steps).mkString(",\n")
    }
    val finals = queryVecIds.map(qv =>
      s"SELECT CAST($qv + 1 AS INT) AS qid, vec_id, mmr_rank FROM sel_${qv}_$k")
    s"""WITH ${perQuery.mkString(",\n")}
       |${finals.mkString("\nUNION ALL\n")}
       |ORDER BY qid, mmr_rank""".stripMargin
  }

  /** Shared by q_stream_neardedup and q_stream_neardedup_serve: the
    * batch anti-join formulation of "stream docs (doc_id%3==0) with no
    * corpus (doc_id%3!=0) neighbor at 3-gram Jaccard ≥ 0.5". */
  private val streamNearDedupSql: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS ws FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
      |  FROM docs
      |), sizes AS (
      |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT s.doc_id AS sid, c.doc_id AS cid, count(*) AS i
      |  FROM sh s JOIN sh c ON s.shingle = c.shingle
      |  WHERE s.doc_id % 3 = 0 AND c.doc_id % 3 <> 0
      |  GROUP BY 1, 2
      |), flagged AS (
      |  SELECT DISTINCT sid FROM inter
      |  JOIN sizes ss ON ss.doc_id = sid
      |  JOIN sizes sc ON sc.doc_id = cid
      |  WHERE CAST(i AS DOUBLE) / CAST(ss.n_sh + sc.n_sh - i AS DOUBLE) >= 0.5
      |)
      |SELECT doc_id, source, n_chars FROM documents
      |WHERE doc_id % 3 = 0 AND doc_id NOT IN (SELECT sid FROM flagged)
      |ORDER BY doc_id""".stripMargin

  /** q_stream_neardedup_delete's oracle: the same anti-join with the
    * corpus side REDUCED to the undeleted documents (doc_id % 7 <> 3) —
    * a stream doc whose only neighbor was deleted must now survive. */
  private val streamNearDedupDeleteSql: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS ws FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
      |  FROM docs
      |), sizes AS (
      |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
      |), inter AS (
      |  SELECT s.doc_id AS sid, c.doc_id AS cid, count(*) AS i
      |  FROM sh s JOIN sh c ON s.shingle = c.shingle
      |  WHERE s.doc_id % 3 = 0 AND c.doc_id % 3 <> 0 AND c.doc_id % 7 <> 3
      |  GROUP BY 1, 2
      |), flagged AS (
      |  SELECT DISTINCT sid FROM inter
      |  JOIN sizes ss ON ss.doc_id = sid
      |  JOIN sizes sc ON sc.doc_id = cid
      |  WHERE CAST(i AS DOUBLE) / CAST(ss.n_sh + sc.n_sh - i AS DOUBLE) >= 0.5
      |)
      |SELECT doc_id, source, n_chars FROM documents
      |WHERE doc_id % 3 = 0 AND doc_id NOT IN (SELECT sid FROM flagged)
      |ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_groupby_summaries" ->
      """SELECT c_nationkey, count(*) AS n_customers,
        | round(avg(c_acctbal),4) AS avg_acctbal,
        | round(max(c_acctbal),2) AS max_acctbal,
        | min(c_name) AS first_name
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_pivot_counts" ->
      """SELECT o_orderpriority,
        | count(*) FILTER (WHERE o_orderstatus='F') AS "F",
        | count(*) FILTER (WHERE o_orderstatus='O') AS "O",
        | count(*) FILTER (WHERE o_orderstatus='P') AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_pivot_totals" ->
      """SELECT
        | CASE WHEN GROUPING(o_orderpriority)=1 THEN 'ALL' ELSE o_orderpriority END
        |   AS o_orderpriority,
        | count(*) FILTER (WHERE o_orderstatus='F') AS "F",
        | count(*) FILTER (WHERE o_orderstatus='O') AS "O",
        | count(*) FILTER (WHERE o_orderstatus='P') AS "P",
        | count(*) FILTER (WHERE o_orderstatus='F')
        |   + count(*) FILTER (WHERE o_orderstatus='O')
        |   + count(*) FILTER (WHERE o_orderstatus='P') AS row_total
        |FROM orders GROUP BY GROUPING SETS ((o_orderpriority), ())
        |ORDER BY (CASE WHEN GROUPING(o_orderpriority)=1 THEN 1 ELSE 0 END),
        | o_orderpriority""".stripMargin,

    "q_pivot_sum" ->
      """SELECT o_orderpriority,
        | coalesce(round(sum(o_totalprice) FILTER (WHERE o_orderstatus='F'),2),0.0) AS "F",
        | coalesce(round(sum(o_totalprice) FILTER (WHERE o_orderstatus='O'),2),0.0) AS "O",
        | coalesce(round(sum(o_totalprice) FILTER (WHERE o_orderstatus='P'),2),0.0) AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "q_stream_neardedup" -> streamNearDedupSql,

    // identical semantics — the serve gate only changes WHERE the corpus
    // shingle index comes from (persisted bucketed table vs in-plan)
    "q_stream_neardedup_serve" -> streamNearDedupSql,
    "q_stream_neardedup_delete" -> streamNearDedupDeleteSql,

    "q_parse_timedelta" ->
      """SELECT strftime(ts, '%H:%M:%S') AS s,
        | CAST(hour(ts)*3600 + minute(ts)*60
        |   + CAST(floor(second(ts)) AS BIGINT) AS BIGINT) AS delta_secs,
        | count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY s""".stripMargin,

    "q_shuffle" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,

    "q_pivot_3level" ->
      """WITH base AS (
        |  SELECT o_orderstatus, o_orderpriority, year(o_orderdate) AS o_year
        |  FROM orders),
        |flat AS (
        |  SELECT o_orderstatus, o_orderpriority, o_year, count(*) AS n
        |  FROM base GROUP BY 1, 2, 3),
        |k1 AS (SELECT DISTINCT o_orderstatus FROM base),
        |k2 AS (SELECT DISTINCT o_orderpriority FROM base),
        |k3 AS (SELECT DISTINCT o_orderstatus, o_year FROM base)
        |SELECT k1.o_orderstatus, k2.o_orderpriority, k3.o_year,
        | coalesce(f.n, 0) AS "count"
        |FROM k1 CROSS JOIN k2
        |JOIN k3 ON k3.o_orderstatus = k1.o_orderstatus
        |LEFT JOIN flat f ON f.o_orderstatus = k1.o_orderstatus
        | AND f.o_orderpriority = k2.o_orderpriority AND f.o_year = k3.o_year
        |ORDER BY 1, 2, 3""".stripMargin,

    "q_stats" ->
      """SELECT
        | round(avg(l_quantity),4) AS q_mean,
        | round(median(l_quantity),4) AS q_median,
        | round(min(l_quantity),2) AS q_min,
        | round(max(l_quantity),2) AS q_max,
        | round(var_samp(l_quantity),4) AS q_var,
        | round(stddev_samp(l_quantity),4) AS q_std,
        | count(l_quantity) AS q_count,
        | count(*) - count(l_quantity) AS q_missing,
        | round(avg(l_extendedprice),4) AS p_mean,
        | round(median(l_extendedprice),4) AS p_median,
        | round(avg(l_discount),6) AS d_mean,
        | round(stddev_samp(l_discount),6) AS d_std
        |FROM lineitem""".stripMargin,

    "q_rollup" ->
      """SELECT o_orderpriority, o_orderstatus,
        | round(sum(o_totalprice),2) AS total, count(*) AS n,
        | CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER) AS gid
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty, count(*) AS n,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_where_comparators" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_quantity >= 10 AND l_quantity <= 20
        |  AND l_discount >= 0.02 AND l_discount < 0.08
        |  AND l_returnflag IN ('A','R')
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag""".stripMargin,

    "q_select_computed" ->
      """SELECT o_orderkey,
        | o_orderpriority || '/' || o_orderstatus AS pri_status,
        | o_totalprice * 0.1 AS fee
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_delete" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders WHERE NOT (o_orderstatus = 'F')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_splitby" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem WHERE l_discount > 0.05
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_compute_field" ->
      """SELECT event_id, event_type,
        | coalesce(try_cast(json_extract_string(props, '$.k') AS INTEGER), -1) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q_format" ->
      """SELECT n_name || ': region ' || CAST(n_regionkey AS VARCHAR) AS formatted
        |FROM nation ORDER BY formatted""".stripMargin,

    "q_orderby_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,

    "q_tail" ->
      """SELECT o_orderkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  ORDER BY o_orderkey DESC LIMIT 50
        |) ORDER BY o_orderkey""".stripMargin,

    "q_slice" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |ORDER BY o_orderkey LIMIT 100 OFFSET 100""".stripMargin,

    "q_batched" ->
      """SELECT batch, count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM (
        |  SELECT o_totalprice,
        |    CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 1000) AS BIGINT) AS batch
        |  FROM orders
        |) GROUP BY batch ORDER BY batch""".stripMargin,

    "q_rank" ->
      """SELECT c_custkey, c_acctbal,
        | row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |FROM customer ORDER BY rnk LIMIT 100""".stripMargin,

    "q_union_all" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM (
        |  SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT * FROM orders WHERE o_orderpriority = '5-LOW'
        |) GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus='O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus='F'
        |ORDER BY o_custkey""".stripMargin,

    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus='O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus='P'
        |ORDER BY o_custkey""".stripMargin,

    "q_unique_first" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q_join_inner" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
        | round(sum(o_totalprice),2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey, c_name""".stripMargin,

    "q_join_asof" ->
      """SELECT p.user_id, epoch_us(p.ts) AS p_us, p.value AS p_value,
        | epoch_us(v.ts) AS v_us, v.value AS v_value
        |FROM (SELECT user_id, ts, value FROM events WHERE event_type='purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type='view') v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.user_id, p_us, p_value""".stripMargin,

    "q_typed_dataset" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(CAST(sum(l_quantity) AS DOUBLE),2) AS sum_qty
        |FROM lineitem WHERE l_quantity > 30
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_join_range" ->
      """SELECT p.user_id, epoch_us(p.ts) AS p_us, epoch_us(v.ts) AS v_us,
        | v.value AS v_value
        |FROM (SELECT user_id, ts, value FROM events WHERE event_type='purchase') p
        |JOIN (SELECT user_id, ts, value FROM events WHERE event_type='view') v
        |  ON p.user_id = v.user_id
        | AND v.ts BETWEEN p.ts - INTERVAL 5 MINUTE AND p.ts + INTERVAL 5 MINUTE
        |ORDER BY p.user_id, p_us, v_us, v_value""".stripMargin,

    "q_udaf_summaries" ->
      """SELECT l_returnflag,
        | round(sum(l_extendedprice*l_quantity)/sum(l_quantity),4) AS wavg_price,
        | round(exp(avg(ln(l_quantity))),4) AS gmean_qty,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_join_salted" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        | round(sum(l_extendedprice),2) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join3_revenue" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_odate,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_odate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_join_multikey" ->
      """WITH ps AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |    round(avg(l_quantity),4) AS avg_qty
        |  FROM lineitem GROUP BY 1, 2
        |)
        |SELECT partkey, count(*) AS n_above
        |FROM ps JOIN lineitem ON partkey = l_partkey AND suppkey = l_suppkey
        |WHERE l_quantity > avg_qty * 1.5
        |GROUP BY partkey HAVING count(*) >= 3
        |ORDER BY partkey""".stripMargin,

    "q_join_left" ->
      """SELECT n_nationkey, n_name, count(c_custkey) AS n_rich
        |FROM nation LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 9000) c
        |  ON n_nationkey = c_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey, n_name""".stripMargin,

    "q_join_right" ->
      """SELECT c_custkey, count(o_orderkey) AS n_big
        |FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
        | RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_join_full" ->
      """SELECT coalesce(a.n_nationkey, b.nk_b) AS nk, a.name_a, b.name_b
        |FROM (SELECT n_nationkey, n_name AS name_a FROM nation WHERE n_regionkey=0) a
        |FULL OUTER JOIN (SELECT n_nationkey AS nk_b, n_name AS name_b FROM nation WHERE n_regionkey=1) b
        |  ON a.n_nationkey = b.nk_b
        |ORDER BY nk""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_chain" ->
      """SELECT r_name, n_name, count(*) AS n_cust, round(avg(c_acctbal),4) AS avg_bal
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        | JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin
  ) ++ Map(
    "q_search_scored" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN list_contains(ws,'merge') THEN 1000 ELSE 0 END
        |     + CASE WHEN list_contains(ws,'join') THEN 1000 ELSE 0 END
        |     + CASE WHEN list_contains(ws,'fast') THEN 100 ELSE 0 END AS BIGINT)
        |    AS text_search_score
        |FROM w
        |WHERE list_contains(ws,'merge') AND NOT list_contains(ws,'slow')
        |ORDER BY text_search_score DESC, doc_id LIMIT 50""".stripMargin,

    "q_search_minscore" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN list_contains(ws,'merge') THEN 1000 ELSE 0 END
        |       + CASE WHEN list_contains(ws,'join') THEN 1000 ELSE 0 END
        |       + CASE WHEN list_contains(ws,'small') THEN -1000 ELSE 0 END
        |       + CASE WHEN list_contains(ws,'fast') THEN 100 ELSE 0 END AS BIGINT)
        |      AS text_search_score,
        |    (list_contains(ws,'merge') OR list_contains(ws,'join')
        |     OR list_contains(ws,'small') OR list_contains(ws,'fast')) AS matched
        |  FROM w)
        |SELECT doc_id, text_search_score FROM scored
        |WHERE matched AND text_search_score >= 1000
        |ORDER BY text_search_score DESC, doc_id""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text),'\s+')) AS BIGINT) AS n_tokens,
        |  CAST(ceil(length(regexp_replace(text,'\s+','','g'))/4.0) AS BIGINT) AS n_tok_est,
        |  length(text) AS len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_quality_score" ->
      """WITH q AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text),'\s+') AS ws,
        |    length(text) AS n_chars_c
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, n_chars_c,
        |    CAST(n_chars_c - length(regexp_replace(text,'[.!?,;:]','','g')) AS DOUBLE)
        |      / CAST(greatest(n_chars_c, 1) AS DOUBLE) AS punct_ratio,
        |    CAST(len(list_filter(ws, x -> x='the')) + len(list_filter(ws, x -> x='a'))
        |       + len(list_filter(ws, x -> x='of')) + len(list_filter(ws, x -> x='and'))
        |       + len(list_filter(ws, x -> x='to')) AS DOUBLE)
        |      / CAST(greatest(len(ws), 1) AS DOUBLE) AS stopword_ratio,
        |    CAST(length(regexp_replace(text,'\s+','','g')) AS DOUBLE)
        |      / CAST(greatest(len(ws), 1) AS DOUBLE) AS mean_word_len
        |  FROM q)
        |SELECT doc_id, n_chars_c, punct_ratio, stopword_ratio, mean_word_len,
        |  ((CASE WHEN n_chars_c BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)
        | + (CASE WHEN stopword_ratio > 0.01 AND stopword_ratio < 0.5 THEN 1.0 ELSE 0.0 END)
        | + (CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 3.0
        |   AS quality
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH w AS (
        |  SELECT doc_id, lang, string_split_regex(trim(text),'\s+') AS ws FROM documents
        |), s AS (
        |  SELECT doc_id, lang,
        |    CAST(len(list_filter(ws, x->x='the')) + len(list_filter(ws, x->x='and'))
        |       + len(list_filter(ws, x->x='of')) + len(list_filter(ws, x->x='to'))
        |       + len(list_filter(ws, x->x='a')) AS BIGINT) AS s_en,
        |    CAST(len(list_filter(ws, x->x='der')) + len(list_filter(ws, x->x='die'))
        |       + len(list_filter(ws, x->x='und')) + len(list_filter(ws, x->x='das'))
        |       + len(list_filter(ws, x->x='ist')) AS BIGINT) AS s_de,
        |    CAST(len(list_filter(ws, x->x='el')) + len(list_filter(ws, x->x='la'))
        |       + len(list_filter(ws, x->x='de')) + len(list_filter(ws, x->x='que'))
        |       + len(list_filter(ws, x->x='los')) AS BIGINT) AS s_es,
        |    CAST(len(list_filter(ws, x->x='le')) + len(list_filter(ws, x->x='la'))
        |       + len(list_filter(ws, x->x='les')) + len(list_filter(ws, x->x='des'))
        |       + len(list_filter(ws, x->x='est')) AS BIGINT) AS s_fr,
        |    CAST(len(list_filter(ws, x->x='的')) + len(list_filter(ws, x->x='是'))
        |       + len(list_filter(ws, x->x='了')) + len(list_filter(ws, x->x='在'))
        |       + len(list_filter(ws, x->x='我')) AS BIGINT) AS s_zh
        |  FROM w)
        |SELECT doc_id, lang, s_en, s_de, s_es, s_fr, s_zh,
        |  CASE WHEN s_en = greatest(s_en,s_de,s_es,s_fr,s_zh) AND s_en > 0 THEN 'en'
        |       WHEN s_de = greatest(s_en,s_de,s_es,s_fr,s_zh) AND s_de > 0 THEN 'de'
        |       WHEN s_es = greatest(s_en,s_de,s_es,s_fr,s_zh) AND s_es > 0 THEN 'es'
        |       WHEN s_fr = greatest(s_en,s_de,s_es,s_fr,s_zh) AND s_fr > 0 THEN 'fr'
        |       WHEN s_zh = greatest(s_en,s_de,s_es,s_fr,s_zh) AND s_zh > 0 THEN 'zh'
        |       ELSE 'und' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        |  md5(lower(regexp_replace(trim(text),'\s+',' ','g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_profile" ->
      """WITH t AS (SELECT count(*) AS total FROM customer)
        |SELECT * FROM (
        |  SELECT 'c_acctbal' AS field, total AS n_rows,
        |    total - count(c_acctbal) AS n_null,
        |    count(DISTINCT c_acctbal) AS n_distinct,
        |    CAST(min(c_acctbal) AS VARCHAR) AS min_value,
        |    CAST(max(c_acctbal) AS VARCHAR) AS max_value
        |  FROM customer, t GROUP BY total
        |  UNION ALL
        |  SELECT 'c_custkey', total, total - count(c_custkey),
        |    count(DISTINCT c_custkey),
        |    CAST(min(c_custkey) AS VARCHAR), CAST(max(c_custkey) AS VARCHAR)
        |  FROM customer, t GROUP BY total
        |  UNION ALL
        |  SELECT 'c_name', total, total - count(c_name),
        |    count(DISTINCT c_name),
        |    CAST(min(c_name) AS VARCHAR), CAST(max(c_name) AS VARCHAR)
        |  FROM customer, t GROUP BY total
        |  UNION ALL
        |  SELECT 'c_nationkey', total, total - count(c_nationkey),
        |    count(DISTINCT c_nationkey),
        |    CAST(min(c_nationkey) AS VARCHAR), CAST(max(c_nationkey) AS VARCHAR)
        |  FROM customer, t GROUP BY total)
        |ORDER BY field""".stripMargin,

    "q_curation_funnel" ->
      """WITH docs AS (
        |  SELECT lang, n_chars,
        |    string_split_regex(trim(text), '\s+') AS ws FROM documents
        |), g AS (
        |  SELECT lang, n_chars,
        |    list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3
        |  FROM docs
        |), p AS (
        |  SELECT lang = 'en' AS p1, n_chars >= 200 AS p2,
        |    (CASE WHEN len(g3) > 0
        |      THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
        |      ELSE 0.0 END) < 0.5 AS p3
        |  FROM g)
        |SELECT * FROM (
        |  SELECT 0 AS stage, 'input' AS name, count(*) AS survivors FROM p
        |  UNION ALL
        |  SELECT 1, 'lang_en', count(*) FILTER (WHERE p1) FROM p
        |  UNION ALL
        |  SELECT 2, 'min_len', count(*) FILTER (WHERE p1 AND p2) FROM p
        |  UNION ALL
        |  SELECT 3, 'low_repetition', count(*) FILTER (WHERE p1 AND p2 AND p3) FROM p)
        |ORDER BY stage""".stripMargin,

    "q_mix_weighted" ->
      """SELECT doc_id, source, n_copies FROM (
        |  SELECT doc_id, 'corpus_a' AS source, CAST(3 AS BIGINT) AS n_copies
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'corpus_b', CAST(1 AS BIGINT) FROM documents)
        |ORDER BY doc_id, source""".stripMargin,

    "q_split_hash" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         < 'cccccccc' THEN 'train'
        |       WHEN substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         < 'e6666666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY substr(md5('s' || CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin,

    "q_weighted_sample" ->
      """WITH s AS (
        |  SELECT doc_id, n_chars,
        |    ln((('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        + 0.5) / 4294967296.0)
        |      / CAST(n_chars AS DOUBLE) AS wkey
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
        |)
        |SELECT doc_id, n_chars, sample_rank FROM (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY wkey DESC, doc_id) AS sample_rank
        |  FROM s)
        |WHERE sample_rank <= 200 ORDER BY sample_rank""".stripMargin,

    "q_contamination" ->
      """WITH bsh AS (
        |  SELECT DISTINCT
        |    unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        |  FROM (SELECT string_split_regex(trim(text), '\s+') AS ws
        |        FROM documents WHERE doc_id % 20 = 0)
        |), csh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |        FROM documents WHERE doc_id % 20 <> 0)
        |)
        |SELECT doc_id, count(*) AS n_shared
        |FROM csh JOIN bsh USING (shingle)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // The bloom variant must yield the same corpus as exact
    // decontamination — the oracle IS the exact computation.
    "q_decontam_bloom" ->
      """WITH bsh AS (
        |  SELECT DISTINCT
        |    unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        |  FROM (SELECT string_split_regex(trim(text), '\s+') AS ws
        |        FROM documents WHERE doc_id % 20 = 0)
        |), csh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |        FROM documents WHERE doc_id % 20 <> 0)
        |), contaminated AS (
        |  SELECT DISTINCT doc_id FROM csh JOIN bsh USING (shingle)
        |)
        |SELECT doc_id, n_chars FROM documents
        |WHERE doc_id % 20 <> 0
        |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
        |ORDER BY doc_id""".stripMargin,

    "q_decontam_fuzzy" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        |  FROM docs
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT c.doc_id AS cid, b.doc_id AS bid, count(*) AS i
        |  FROM sh c JOIN sh b ON c.shingle = b.shingle
        |  WHERE c.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
        |  GROUP BY 1, 2
        |), flagged AS (
        |  SELECT DISTINCT cid FROM inter
        |  JOIN sizes sc ON sc.doc_id = cid
        |  JOIN sizes sb ON sb.doc_id = bid
        |  WHERE CAST(i AS DOUBLE) / CAST(sc.n_sh + sb.n_sh - i AS DOUBLE) >= 0.5
        |)
        |SELECT doc_id, n_chars FROM documents
        |WHERE doc_id % 20 <> 0 AND doc_id NOT IN (SELECT cid FROM flagged)
        |ORDER BY doc_id""".stripMargin,

    "q_cap_per_source" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 40 ORDER BY doc_id""".stripMargin,

    "q_quantile_band" ->
      """WITH q AS (
        |  SELECT quantile_cont(n_chars, 0.05) AS lo,
        |         quantile_cont(n_chars, 0.95) AS hi
        |  FROM documents)
        |SELECT doc_id, n_chars FROM documents, q
        |WHERE n_chars >= lo AND n_chars <= hi
        |ORDER BY doc_id""".stripMargin,

    "q_vocab_top" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents)
        |SELECT token, count(*) AS n_occurrences,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM toks WHERE token <> ''
        |GROUP BY token
        |ORDER BY n_occurrences DESC, token
        |LIMIT 50""".stripMargin,

    "q_tfidf_top" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents
        |), tf AS (
        |  SELECT id, token, count(*) AS tf FROM toks
        |  WHERE token <> '' GROUP BY id, token
        |), dfreq AS (
        |  SELECT token, count(*) AS df FROM tf GROUP BY token
        |), nn AS (SELECT count(*) AS n FROM documents)
        |SELECT id, token, tf, df, term_rank FROM (
        |  SELECT id, token, tf, df,
        |    row_number() OVER (PARTITION BY id
        |      ORDER BY tf * (ln((nn.n + 1)::DOUBLE / (df + 1)::DOUBLE) + 1.0) DESC,
        |               tf DESC, df ASC, token) AS term_rank
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN nn)
        |WHERE term_rank <= 5
        |ORDER BY id, term_rank""".stripMargin,

    "q_approx_distinct" ->
      """SELECT source, count(DISTINCT n_chars) AS exact_nd,
        |  true AS within_tol
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_cms_counts" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // unconditional exact per-source distinct counts: the Spark side
    // only emits a row when the cube's row counts roll up EXACTLY and
    // BOTH rollup paths' estimates land within tolerance of the exact
    // count (bit-equality across paths is a documented non-guarantee)
    "q_sketch_rollup" ->
      """SELECT source, count(DISTINCT n_chars) AS n_exact
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // the upsert+compact loop serves the SAME full-corpus contract
    "q_sketch_compact" ->
      """SELECT source, count(DISTINCT n_chars) AS n_exact
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // the takedown rebuild serves the REDUCED-corpus contract: exact
    // row conservation + both rollup paths in tolerance, minus the
    // tombstoned docs' contributions
    "q_sketch_delete" ->
      """SELECT source, count(DISTINCT n_chars) AS n_exact
        |FROM documents WHERE doc_id % 7 <> 3
        |GROUP BY source ORDER BY source""".stripMargin,

    // streaming admission serves the same full-corpus contract
    "q_stream_sketch_ingest" ->
      """SELECT source, count(DISTINCT n_chars) AS n_exact
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // unconditional exact per-source row counts: the Spark side only
    // emits a row when the merged KLL p50/p90's true ranks are within
    // 5% of target and the cube's row counts conserve exactly
    "q_quantile_rollup" ->
      """SELECT source, count(n_chars) AS n_rows
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents
        |), t2 AS (SELECT token FROM toks WHERE token <> ''),
        |tot AS (SELECT count(*) AS n_total FROM t2)
        |SELECT token, count(*) AS n FROM t2
        |GROUP BY token
        |HAVING count(*) * 29 > (SELECT n_total FROM tot)
        |ORDER BY token""".stripMargin,

    "q_gopher_rules" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
        |    string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, n_words,
        |    length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
        |      / greatest(n_words, 1) AS mwl,
        |    (length(text) - length(regexp_replace(text, '#|…|\.\.\.', '', 'g')))::DOUBLE
        |      / greatest(n_words, 1) AS sym_ratio,
        |    len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
        |      / greatest(n_words, 1) AS alpha_frac,
        |    len(list_filter(ws, w -> w = 'the')) + len(list_filter(ws, w -> w = 'a'))
        |      + len(list_filter(ws, w -> w = 'of')) + len(list_filter(ws, w -> w = 'and'))
        |      + len(list_filter(ws, w -> w = 'to')) AS stop_hits
        |  FROM base
        |)
        |SELECT doc_id, n_words,
        |  n_words BETWEEN 30 AND 100000 AS ok_words,
        |  mwl BETWEEN 3.0 AND 10.0 AS ok_mwl,
        |  sym_ratio <= 0.1 AS ok_symbols,
        |  alpha_frac >= 0.8 AS ok_alpha,
        |  stop_hits >= 2 AS ok_stopwords,
        |  (n_words BETWEEN 30 AND 100000) AND (mwl BETWEEN 3.0 AND 10.0)
        |    AND sym_ratio <= 0.1 AND alpha_frac >= 0.8 AND stop_hits >= 2 AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_sim_pq" -> annExactTop10Sql,
    "q_sim_pq_serve" -> annExactTop10Sql,

    "q_stream_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_search_bm25" -> bm25OracleSql,
    // the serving gate answers the same question from the persisted index
    "q_search_bm25_serve" -> bm25OracleSql,
    "q_search_bm25_upsert" -> bm25OracleSql,
    "q_search_bm25_compact" -> bm25OracleSql,
    "q_search_bm25_catchup" -> bm25OracleSql,
    "q_search_bm25_delete" -> bm25DeletedOracleSql,
    // the segment-resident takedown serves the SAME reduced-corpus
    // ranking — exactness must not depend on whether the fold ran
    "q_search_bm25_delete_seg" -> bm25DeletedOracleSql,
    "q_search_bm25_reclaim" -> bm25DeletedOracleSql,
    // the e2e composition's survivors: the % 9 == 3 takedown set gone,
    // constants corrected, erasure + suppression gates folded in-plan
    "q_takedown_e2e" -> bm25WithoutOracleSql("doc_id % 9 <> 3"),
    // the corpus-side erasure: per-source report over the reduced
    // corpus (CAST: DuckDB sum(INTEGER) is HUGEINT)
    "q_corpus_erase" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE NOT (source IN ('src3','src7') AND doc_id % 7 = 3)
        |GROUP BY source ORDER BY source""".stripMargin,
    // the e2e composition: the same reduced corpus, served through a
    // BM25 index REBUILT from the erased partitioned table
    "q_corpus_erase_e2e" -> bm25WithoutOracleSql(
      "NOT (source IN ('src3','src7') AND doc_id % 7 = 3)"),
    "q_stream_bm25_ingest" -> bm25OracleSql,

    "q_cluster_best" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        |  FROM docs
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id_a, id_b FROM inter
        |    JOIN sizes sa ON sa.doc_id = id_a
        |    JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.5
        |), edges AS (
        |  SELECT id_a AS u, id_b AS v FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |), reach(u, v) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
        |)
        |SELECT doc_id, n_chars FROM (
        |  SELECT d.doc_id, d.n_chars,
        |    row_number() OVER (
        |      PARTITION BY least(coalesce(m.mn, d.doc_id), d.doc_id)
        |      ORDER BY d.n_chars DESC, d.doc_id) AS rn
        |  FROM documents d
        |  LEFT JOIN (SELECT u, min(v) AS mn FROM reach GROUP BY u) m
        |    ON m.u = d.doc_id)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_chunk_windows" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents WHERE length(trim(text)) > 0
        |), w AS (
        |  SELECT doc_id, ws, len(ws) AS nw,
        |    1 + greatest(0, (len(ws) - 64 + 47) // 48) AS n_win
        |  FROM docs)
        |SELECT doc_id,
        |  unnest(generate_series(0, n_win - 1)) AS chunk_id,
        |  unnest(list_transform(generate_series(0, n_win - 1),
        |    s -> array_to_string(list_slice(ws, s*48 + 1, least(s*48 + 64, nw)), ' ')))
        |    AS chunk_text,
        |  unnest(list_transform(generate_series(0, n_win - 1),
        |    s -> CAST(least(64, nw - s*48) AS BIGINT))) AS n_tokens
        |FROM w ORDER BY doc_id, chunk_id""".stripMargin,

    "q_pack_index" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE length(trim(text)) > 0
        |), c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        |  FROM d)
        |SELECT doc_id, n_tokens, tok_offset,
        |  tok_offset // 512 AS first_seq,
        |  (tok_offset + n_tokens - 1) // 512 AS last_seq
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE length(trim(text)) > 0
        |), c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        |  FROM d
        |), p AS (
        |  SELECT doc_id, n_tokens, tok_offset,
        |    tok_offset // 512 AS first_seq,
        |    (tok_offset + n_tokens - 1) // 512 AS last_seq
        |  FROM c
        |), x AS (
        |  SELECT doc_id, n_tokens, tok_offset,
        |    unnest(generate_series(first_seq, last_seq)) AS seq_id
        |  FROM p)
        |SELECT seq_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(least(tok_offset + n_tokens, (seq_id + 1) * 512)
        |    - greatest(tok_offset, seq_id * 512)) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM x GROUP BY seq_id ORDER BY seq_id""".stripMargin,

    "q_mix_temperature" ->
      """SELECT source, n_docs, total_chars FROM (
        |  SELECT 'corpus_big' AS source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars
        |  FROM documents
        |  UNION ALL
        |  SELECT 'corpus_small', CAST(count(*) AS BIGINT),
        |    CAST(sum(n_chars) AS BIGINT)
        |  FROM documents WHERE doc_id % 5 = 0)
        |ORDER BY source""".stripMargin,

    "q_embed_normalize" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), n AS (
        |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
        |SELECT vec_id,
        |  unnest(generate_series(0, len(v) - 1)) AS i,
        |  unnest(list_transform(v, x -> x / nrm)) AS x
        |FROM n ORDER BY vec_id, i""".stripMargin,

    "q_embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), s AS (
        |  SELECT vec_id, v,
        |    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 0.0
        |         ELSE 127.0 / list_max(list_transform(v, x -> abs(x))) END AS scale
        |  FROM e)
        |SELECT vec_id,
        |  unnest(generate_series(0, len(v) - 1)) AS i,
        |  unnest(list_transform(v,
        |    x -> CAST(greatest(-128.0, least(127.0, floor(x * scale))) AS INTEGER))) AS q
        |FROM s ORDER BY vec_id, i""".stripMargin,

    "q_repetition" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
        |), g AS (
        |  SELECT doc_id, ws,
        |    list_transform(generate_series(1, greatest(len(ws)-1, 0)),
        |      i -> ws[i] || ' ' || ws[i+1]) AS g2,
        |    list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3
        |  FROM docs)
        |SELECT doc_id,
        |  CASE WHEN len(ws) > 0
        |    THEN CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws)
        |    ELSE 0.0 END AS dup_word_frac,
        |  CASE WHEN len(g2) > 0
        |    THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
        |    ELSE 0.0 END AS dup_2gram_frac,
        |  CASE WHEN len(g3) > 0
        |    THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
        |    ELSE 0.0 END AS dup_3gram_frac
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT doc_id, fp FROM (
        |  SELECT doc_id, md5(lower(regexp_replace(trim(text),'\s+',' ','g'))) AS fp,
        |    row_number() OVER (
        |      PARTITION BY md5(lower(regexp_replace(trim(text),'\s+',' ','g')))
        |      ORDER BY doc_id) AS rn
        |  FROM documents
        |) WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_dedup_ngram" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        |  FROM docs
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b,
        |  CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) AS jaccard
        |FROM inter
        | JOIN sizes sa ON sa.doc_id = id_a
        | JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "q_pii_redact" ->
      """WITH withpii AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com call +1 ' ||
        |    (doc_id % 900 + 100) || '-' || (doc_id % 800 + 101) || '-' || (doc_id % 9000 + 1000) ||
        |    ' ssn ' || (doc_id % 900 + 100) || '-' || (doc_id % 89 + 10) || '-' || (doc_id % 9000 + 1000) ||
        |    ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) AS text
        |  FROM documents
        |)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
        |    '(\+\d{1,2}[ ])?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
        |    '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |     + len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b'))
        |     + len(regexp_extract_all(text, '(\+\d{1,2}[ ])?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))
        |     + len(regexp_extract_all(text, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS INTEGER) AS n_pii
        |FROM withpii ORDER BY doc_id""".stripMargin,

    "q_span_dedup" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents WHERE length(trim(text)) > 0
        |), w AS (
        |  SELECT doc_id, ws, len(ws) AS nw,
        |    1 + greatest(0, (len(ws) - 20 + 19) // 20) AS n_win
        |  FROM docs
        |), spans AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, n_win - 1)) AS chunk_id,
        |    unnest(list_transform(generate_series(0, n_win - 1),
        |      s -> array_to_string(list_slice(ws, s*20 + 1, least(s*20 + 20, nw)), ' '))) AS chunk_text
        |  FROM w
        |), rn AS (
        |  SELECT doc_id, chunk_id, chunk_text,
        |    row_number() OVER (PARTITION BY chunk_text ORDER BY doc_id, chunk_id) AS rn
        |  FROM spans
        |)
        |SELECT doc_id,
        |  count(*) AS n_spans,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_spans_kept,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN chunk_text END, ' ' ORDER BY chunk_id), '') AS text_kept
        |FROM rn GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_cdc_chunks" ->
      """WITH tl AS (
        |  SELECT doc_id,
        |    coalesce(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x <> ''), CAST([] AS VARCHAR[])) AS ws
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, ws, len(ws) AS n,
        |    list_filter(generate_series(4, len(ws) - 1), j ->
        |      (('0x' || substr(md5(array_to_string(ws[j-3:j], ' ')), 1, 8))::BIGINT
        |        % 16 = 0)) AS bpos
        |  FROM tl WHERE len(ws) > 0
        |), c AS (
        |  SELECT doc_id, ws,
        |    list_prepend(1, list_transform(bpos, j -> j + 1)) AS starts,
        |    list_append(bpos, n) AS ends
        |  FROM b
        |)
        |SELECT doc_id, CAST(i - 1 AS INTEGER) AS chunk_id,
        |  CAST(starts[i] AS INTEGER) AS start_tok,
        |  CAST(ends[i] - starts[i] + 1 AS INTEGER) AS n_tokens,
        |  array_to_string(ws[starts[i]:ends[i]], ' ') AS chunk_text
        |FROM c, LATERAL unnest(generate_series(1, len(starts))) AS t(i)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // the batch-funnel mirror of the composed streaming ingest: the same
    // fixture CASE (13 before 11 — precedence matters), the same feed
    // (subscribed source + its %3 re-emissions), dedup = GROUP BY raw
    // md5 digest (the full-horizon watermark admits every duplicate
    // pair), corpus anti-join on the digest, then the q_quality_score
    // quality formula and the q_encoding_scan hygiene predicate
    "q_stream_ingest_e2e" ->
      s"""WITH fixed AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 13 = 0 THEN trim(repeat('zzzzzzzzzzzzzz ', 20))
        |         WHEN doc_id % 11 = 0 THEN text || chr(7)
        |         ELSE text END AS text
        |  FROM documents
        |), feed AS (
        |  SELECT text FROM fixed WHERE source = 'src3'
        |  UNION ALL
        |  SELECT text FROM fixed WHERE source = 'src3' AND doc_id % 3 = 0
        |), dedup AS (
        |  SELECT md5(text) AS fp, min(text) AS text FROM feed GROUP BY md5(text)
        |), corpus AS (
        |  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 7 = 0
        |), fresh AS (
        |  SELECT d.fp, d.text FROM dedup d
        |  WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = d.fp)
        |), q AS (
        |  SELECT fp, text, string_split_regex(trim(text),'\\s+') AS ws,
        |    length(text) AS n_chars_c
        |  FROM fresh
        |), r AS (
        |  SELECT fp, text, n_chars_c, CAST(len(ws) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(ws, x -> x='the')) + len(list_filter(ws, x -> x='a'))
        |       + len(list_filter(ws, x -> x='of')) + len(list_filter(ws, x -> x='and'))
        |       + len(list_filter(ws, x -> x='to')) AS DOUBLE)
        |      / CAST(greatest(len(ws), 1) AS DOUBLE) AS stopword_ratio,
        |    CAST(length(regexp_replace(text,'\\s+','','g')) AS DOUBLE)
        |      / CAST(greatest(len(ws), 1) AS DOUBLE) AS mean_word_len
        |  FROM q
        |), sc AS (
        |  SELECT fp, text, n_tokens,
        |    ((CASE WHEN n_chars_c BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)
        |   + (CASE WHEN stopword_ratio > 0.01 AND stopword_ratio < 0.5 THEN 1.0 ELSE 0.0 END)
        |   + (CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 3.0
        |      AS quality
        |  FROM r
        |)
        |SELECT fp, n_tokens, quality FROM sc
        |WHERE quality > 0.5
        |  AND len(regexp_extract_all(text, '${graft.operators.Scrub.mojibake}'))
        |    + len(regexp_extract_all(text, '${graft.operators.Scrub.controlChars}'))
        |    + len(regexp_extract_all(text, '${graft.operators.Scrub.specialTokens}')) = 0
        |ORDER BY fp""".stripMargin,

    // the e2e funnel with a content-digest blocklist: survivors
    // additionally exclude any text whose digest matches a blocklisted
    // src3 doc (doc_id % 9 = 0) — suppression keys on bytes, not ids
    "q_stream_ingest_blocklist" ->
      s"""WITH fixed AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 13 = 0 THEN trim(repeat('zzzzzzzzzzzzzz ', 20))
        |         WHEN doc_id % 11 = 0 THEN text || chr(7)
        |         ELSE text END AS text
        |  FROM documents
        |), feed AS (
        |  SELECT text FROM fixed WHERE source = 'src3'
        |  UNION ALL
        |  SELECT text FROM fixed WHERE source = 'src3' AND doc_id % 3 = 0
        |), blocked AS (
        |  SELECT DISTINCT md5(text) AS fp FROM fixed
        |  WHERE source = 'src3' AND doc_id % 9 = 0
        |), dedup AS (
        |  SELECT md5(text) AS fp, min(text) AS text FROM feed GROUP BY md5(text)
        |), corpus AS (
        |  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 7 = 0
        |), fresh AS (
        |  SELECT d.fp, d.text FROM dedup d
        |  WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = d.fp)
        |    AND NOT EXISTS (SELECT 1 FROM blocked b WHERE b.fp = d.fp)
        |), q AS (
        |  SELECT fp, text, string_split_regex(trim(text),'\\s+') AS ws,
        |    length(text) AS n_chars_c
        |  FROM fresh
        |), r AS (
        |  SELECT fp, text, n_chars_c, CAST(len(ws) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(ws, x -> x='the')) + len(list_filter(ws, x -> x='a'))
        |       + len(list_filter(ws, x -> x='of')) + len(list_filter(ws, x -> x='and'))
        |       + len(list_filter(ws, x -> x='to')) AS DOUBLE)
        |      / CAST(greatest(len(ws), 1) AS DOUBLE) AS stopword_ratio,
        |    CAST(length(regexp_replace(text,'\\s+','','g')) AS DOUBLE)
        |      / CAST(greatest(len(ws), 1) AS DOUBLE) AS mean_word_len
        |  FROM q
        |), sc AS (
        |  SELECT fp, text, n_tokens,
        |    ((CASE WHEN n_chars_c BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)
        |   + (CASE WHEN stopword_ratio > 0.01 AND stopword_ratio < 0.5 THEN 1.0 ELSE 0.0 END)
        |   + (CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)) / 3.0
        |      AS quality
        |  FROM r
        |)
        |SELECT fp, n_tokens, quality FROM sc
        |WHERE quality > 0.5
        |  AND len(regexp_extract_all(text, '${graft.operators.Scrub.mojibake}'))
        |    + len(regexp_extract_all(text, '${graft.operators.Scrub.controlChars}'))
        |    + len(regexp_extract_all(text, '${graft.operators.Scrub.specialTokens}')) = 0
        |ORDER BY fp""".stripMargin,

    "q_encoding_scan" ->
      s"""WITH w AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 5 = 0 THEN '$mojiSnippet' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN '$specialSnippet' ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0 THEN chr(7) ELSE '' END AS text
        |  FROM documents
        |), c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '${graft.operators.Scrub.mojibake}')) AS INTEGER) AS n_mojibake,
        |    CAST(len(regexp_extract_all(text, '${graft.operators.Scrub.controlChars}')) AS INTEGER) AS n_ctrl,
        |    CAST(len(regexp_extract_all(text, '${graft.operators.Scrub.specialTokens}')) AS INTEGER) AS n_special
        |  FROM w)
        |SELECT doc_id, n_mojibake, n_ctrl, n_special,
        |  (n_mojibake + n_ctrl + n_special = 0) AS is_clean
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_dedup_incremental" ->
      """WITH inc AS (
        |  SELECT doc_id + 1000000 AS doc_id, text
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text || ' fresh ' || doc_id AS text
        |  FROM documents WHERE doc_id % 3 = 1
        |), n AS (
        |  SELECT doc_id, text,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |  FROM inc
        |), ex AS (
        |  SELECT DISTINCT regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |  FROM documents
        |)
        |SELECT n.doc_id, CAST(length(n.text) AS INTEGER) AS n_chars_in
        |FROM n WHERE NOT EXISTS (SELECT 1 FROM ex WHERE ex.t = n.t)
        |ORDER BY n.doc_id""".stripMargin,

    "q_substr_dedup" ->
      """WITH tl AS (
        |  SELECT doc_id,
        |    coalesce(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> x <> ''), CAST([] AS VARCHAR[])) AS ws
        |  FROM documents
        |), w AS (
        |  SELECT doc_id, j, md5(array_to_string(ws[j:j+7], ' ')) AS key
        |  FROM tl, LATERAL unnest(generate_series(1, len(ws) - 7)) AS t(j)
        |), rk AS (
        |  SELECT doc_id, j,
        |    row_number() OVER (PARTITION BY key ORDER BY doc_id, j) AS rn
        |  FROM w
        |), pos AS (
        |  SELECT DISTINCT doc_id, p
        |  FROM rk, LATERAL unnest(generate_series(j, j + 7)) AS t(p)
        |  WHERE rn >= 2
        |), rem AS (
        |  SELECT doc_id, list(p) AS rem, count(*) AS nr FROM pos GROUP BY doc_id
        |)
        |SELECT tl.doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(rem.nr, 0) AS BIGINT) AS n_removed,
        |  coalesce(array_to_string(list_filter(ws, (x, i) ->
        |    NOT list_contains(coalesce(rem.rem, CAST([] AS BIGINT[])), i)),
        |    ' '), '') AS text_kept
        |FROM tl LEFT JOIN rem ON tl.doc_id = rem.doc_id
        |ORDER BY tl.doc_id""".stripMargin,

    "q_line_dedup" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents WHERE length(trim(text)) > 0
        |), lines AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, (len(ws) + 2) // 3 - 1)) AS line_no,
        |    unnest(list_transform(generate_series(0, (len(ws) + 2) // 3 - 1),
        |      i -> array_to_string(
        |        list_slice(ws, i*3 + 1, least(i*3 + 3, len(ws))), ' '))) AS line
        |  FROM docs
        |), f AS (
        |  SELECT doc_id, line_no, line,
        |    count(*) OVER (PARTITION BY line) AS freq
        |  FROM lines
        |)
        |SELECT doc_id,
        |  count(*) AS n_lines,
        |  CAST(sum(CASE WHEN freq <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept,
        |  coalesce(string_agg(CASE WHEN freq <= 1 THEN line END, chr(10) ORDER BY line_no), '') AS text_kept
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_bpe_train" -> bpeOracleSql(4),
    // oracle rounds == the Spark side's requested 256 — NOT a pad tuned
    // to the currently-observed ~89-merge drain, so a richer future
    // corpus can never out-run the oracle; post-drain rounds are
    // near-free on both engines (measured: 256 MATERIALIZED rounds
    // 18.1 s vs 120 rounds 17.1 s in DuckDB at sf0.01)
    "q_bpe_train_deep" -> bpeOracleSql(256),
    "q_bpe_train_vocab_depth" -> bpeDeepWideOracleSql(1100, 48),
    "q_bpe_apply" -> bpeApplyOracleSql(4),
    "q_bpe_roundtrip" -> bpeRoundtripOracleSql(4),
    "q_bpe_vocab" -> bpeVocabOracleSql(4),
    "q_bpe_apply_deep" -> bpeApplyOracleSql(4),

    "q_bpe_pairs" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents
        |), v AS (
        |  SELECT w, count(*) AS freq FROM t WHERE w <> '' GROUP BY w
        |), i AS (
        |  SELECT w, freq, unnest(generate_series(1, length(w) - 1)) AS i
        |  FROM v WHERE length(w) >= 2
        |)
        |SELECT substr(w, i, 1) AS lhs, substr(w, i + 1, 1) AS rhs,
        |  CAST(sum(freq) AS BIGINT) AS n_occurrences
        |FROM i GROUP BY 1, 2
        |ORDER BY n_occurrences DESC, lhs, rhs LIMIT 25""".stripMargin,

    "q_shard_assign" ->
      """WITH r AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents
        |)
        |SELECT CAST((rn - 1) % 16 AS INT) AS shard,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_doc
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dsir_scores" ->
      """WITH rw AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents
        |), pairs AS (
        |  SELECT doc_id, substr(md5(w), 1, 2) AS b FROM rw WHERE w <> ''
        |), tw AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents WHERE lang = 'en'
        |), tpairs AS (
        |  SELECT substr(md5(w), 1, 2) AS b FROM tw WHERE w <> ''
        |), ht AS (SELECT b, count(*) AS ct FROM tpairs GROUP BY b),
        |hr AS (SELECT b, count(*) AS cr FROM pairs GROUP BY b),
        |w AS (
        |  SELECT coalesce(ht.b, hr.b) AS b,
        |    CAST(floor(1000000.0 *
        |      (ln((coalesce(ct, 0) + 1) / ((SELECT count(*) FROM tpairs) + 256.0))
        |     - ln((coalesce(cr, 0) + 1) / ((SELECT count(*) FROM pairs) + 256.0))))
        |      AS BIGINT) AS w_micro
        |  FROM ht FULL JOIN hr ON ht.b = hr.b
        |)
        |SELECT p.doc_id,
        |  count(*) AS n_tokens,
        |  CAST(sum(w.w_micro) AS BIGINT) AS score_micro
        |FROM pairs p JOIN w ON p.b = w.b
        |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin,

    "q_lm_score" ->
      """WITH tl AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, substr(md5(unnest(ws)), 1, 2) AS b,
        |    generate_subscripts(ws, 1) AS i
        |  FROM tl
        |), bg AS (
        |  SELECT a.doc_id, a.b AS x, c.b AS y
        |  FROM toks a JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 1
        |), c2 AS (SELECT x, y, count(*) AS c2 FROM bg GROUP BY x, y),
        |c1 AS (SELECT x, sum(c2) AS c1 FROM c2 GROUP BY x),
        |w AS (
        |  SELECT x, y,
        |    CAST(floor(1000000.0 * ln((c2 + 1) / (c1 + 256.0))) AS BIGINT) AS wm
        |  FROM c2 JOIN c1 USING (x))
        |SELECT bg.doc_id, count(*) AS n_bigrams,
        |  CAST(sum(w.wm) AS BIGINT) AS logprob_micro
        |FROM bg JOIN w ON bg.x = w.x AND bg.y = w.y
        |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin,

    "q_lm_score_cross" ->
      """WITH tl AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, lang, substr(md5(unnest(ws)), 1, 2) AS b,
        |    generate_subscripts(ws, 1) AS i
        |  FROM tl
        |), bg AS (
        |  SELECT a.doc_id, a.lang, a.b AS x, c.b AS y
        |  FROM toks a JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 1
        |), c2 AS (
        |  SELECT x, y, count(*) AS c2 FROM bg WHERE lang = 'en' GROUP BY x, y
        |), c1 AS (SELECT x, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY x)
        |SELECT bg.doc_id, count(*) AS n_bigrams,
        |  CAST(sum(CAST(floor(1000000.0 * ln((coalesce(c2.c2, 0) + 1) /
        |    (coalesce(c1.c1, 0) + 256.0))) AS BIGINT)) AS BIGINT)
        |    AS logprob_micro
        |FROM bg
        |LEFT JOIN c2 ON bg.x = c2.x AND bg.y = c2.y
        |LEFT JOIN c1 ON bg.x = c1.x
        |GROUP BY bg.doc_id ORDER BY bg.doc_id""".stripMargin,

    "q_pipeline_e2e" ->
      """WITH f AS (
        |  SELECT doc_id, source, n_chars, text FROM documents
        |  WHERE n_chars BETWEEN 20 AND 2000 AND length(trim(text)) > 0
        |), dd AS (
        |  SELECT doc_id, source, n_chars, text FROM (
        |    SELECT f.*, row_number() OVER (
        |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |      ORDER BY doc_id) AS rn FROM f)
        |  WHERE rn = 1
        |), cap AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text, row_number() OVER (
        |      PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn FROM dd)
        |  WHERE rn <= 100
        |), sized AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM cap
        |), bud AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY n_tokens DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tb
        |  FROM sized
        |), sel AS (
        |  SELECT doc_id, n_tokens FROM bud WHERE tb < 10000
        |), c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        |  FROM sel)
        |SELECT doc_id, n_tokens, tok_offset,
        |  tok_offset // 512 AS first_seq,
        |  (tok_offset + n_tokens - 1) // 512 AS last_seq
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_top_fraction" ->
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT doc_id, source, n_chars FROM r
        |WHERE rn <= CAST(ceil(0.2 * n) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,

    "q_pagerank" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |mx AS (SELECT max(doc_id) + 1 AS m FROM ids),
        |sc AS (SELECT greatest(1000000, 100 * m) AS s FROM mx),
        |e0 AS (
        |  SELECT doc_id AS src, (doc_id*7 + 3) % (SELECT m FROM mx) AS dst FROM ids
        |  UNION ALL
        |  SELECT doc_id, (doc_id*13 + 5) % (SELECT m FROM mx) FROM ids),
        |edges AS (
        |  SELECT src, dst FROM e0 JOIN ids ON e0.dst = ids.doc_id
        |  WHERE src <> dst),
        |nodes AS (SELECT DISTINCT node FROM (
        |  SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |od AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        |r0 AS (SELECT node, (SELECT s FROM sc) // (SELECT n FROM nn) AS r FROM nodes),
        |i1 AS (
        |  SELECT nodes.node,
        |    (15 * (SELECT s FROM sc)) // (100 * (SELECT n FROM nn)) +
        |    (85 * coalesce(s.mass, 0)) // 100 AS r
        |  FROM nodes LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.r // od.outdeg) AS BIGINT) AS mass
        |    FROM edges e JOIN r0 p ON e.src = p.node JOIN od ON od.src = e.src
        |    GROUP BY e.dst) s USING (node)),
        |i2 AS (
        |  SELECT nodes.node,
        |    (15 * (SELECT s FROM sc)) // (100 * (SELECT n FROM nn)) +
        |    (85 * coalesce(s.mass, 0)) // 100 AS r
        |  FROM nodes LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.r // od.outdeg) AS BIGINT) AS mass
        |    FROM edges e JOIN i1 p ON e.src = p.node JOIN od ON od.src = e.src
        |    GROUP BY e.dst) s USING (node)),
        |i3 AS (
        |  SELECT nodes.node,
        |    (15 * (SELECT s FROM sc)) // (100 * (SELECT n FROM nn)) +
        |    (85 * coalesce(s.mass, 0)) // 100 AS r
        |  FROM nodes LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.r // od.outdeg) AS BIGINT) AS mass
        |    FROM edges e JOIN i2 p ON e.src = p.node JOIN od ON od.src = e.src
        |    GROUP BY e.dst) s USING (node))
        |SELECT node, CAST(r AS BIGINT) AS rank_micro
        |FROM i3 ORDER BY node""".stripMargin,

    "q_budget_per_group" ->
      """WITH d AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE length(trim(text)) > 0
        |), c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tb
        |  FROM d)
        |SELECT doc_id, source, n_tokens FROM c
        |WHERE tb < 3000 ORDER BY doc_id""".stripMargin,

    "q_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE length(trim(text)) > 0
        |), c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY n_tokens DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_before
        |  FROM d)
        |SELECT doc_id, n_tokens, tok_before
        |FROM c WHERE tok_before < 15000 ORDER BY doc_id""".stripMargin,

    "q_classifier_score" ->
      """WITH w AS (
        |  SELECT list(((7*i+3)%11 - 5)/10.0 ORDER BY i) AS wv
        |  FROM generate_series(0,63) t(i))
        |SELECT vec_id,
        |  CAST(floor(1000000.0 *
        |    (list_dot_product(embedding::DOUBLE[], w.wv) + 0.1)) AS BIGINT)
        |    AS logit_micro,
        |  (list_dot_product(embedding::DOUBLE[], w.wv) + 0.1) >= 0 AS kept
        |FROM embeddings CROSS JOIN w
        |ORDER BY vec_id""".stripMargin,

    "q_length_buckets" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text),'\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, n_tokens,
        |    CASE WHEN n_tokens < 30 THEN 0 WHEN n_tokens < 45 THEN 1
        |         WHEN n_tokens < 60 THEN 2 ELSE 3 END AS bucket
        |  FROM n
        |)
        |SELECT bucket, count(*) AS n_docs,
        |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS pad_waste
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_dedup_cluster" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        |  FROM docs
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT id_a, id_b FROM inter
        |    JOIN sizes sa ON sa.doc_id = id_a
        |    JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.5
        |), edges AS (
        |  SELECT id_a AS u, id_b AS v FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |), reach(u, v) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
        |)
        |SELECT d.doc_id,
        |  least(coalesce(m.mn, d.doc_id), d.doc_id) AS cluster_id
        |FROM documents d
        |LEFT JOIN (SELECT u, min(v) AS mn FROM reach GROUP BY u) m ON m.u = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // RECALL GATES: the oracle computes the EXACT answer only; the Spark
    // side semi-joins it with the approximate path's candidates, so the
    // row hash-matches iff approximate recall is 100% at the gate SF.
    "q_dedup_minhash" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        |  FROM docs
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b,
        |  CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) AS jaccard
        |FROM inter
        | JOIN sizes sa ON sa.doc_id = id_a
        | JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_simhash" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        |  FROM docs
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b,
        |  CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) AS jaccard
        |FROM inter
        | JOIN sizes sa ON sa.doc_id = id_a
        | JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.98
        |ORDER BY id_a, id_b""".stripMargin,

    "q_sim_lsh" -> annExactTop10Sql,
    "q_sim_lsh_serve" -> annExactTop10Sql,
    "q_sim_ivf" -> annExactTop10Sql,
    "q_sim_filtered" -> annExactTop10FilteredSql,
    "q_sim_ivf_filtered" -> annExactTop10FilteredSql,
    "q_sim_maxsim" -> maxSimOracleSql,
    "q_sim_maxsim_batch" -> maxSimBatchOracleSql,
    "q_mmr_rerank" -> mmrOracleSql(Seq(0, 1, 2), 10),
    // the batch gates answer the same recall contract for a 3-query
    // workload served in one plan
    "q_sim_ivf_batch" -> annBatchExactTop10Sql,
    "q_sim_lsh_batch" -> annBatchExactTop10Sql,
    "q_sim_pq_batch" -> annBatchExactTop10Sql,
    "q_rank_eval_takedown" -> rankEvalTakedownOracleSql,
    // the serving gates answer the same recall contract from the
    // persisted indexes
    "q_sim_ivf_serve" -> annExactTop10Sql,
    "q_sim_ivf_upsert" -> annExactTop10Sql,
    "q_sim_ivf_compact" -> annExactTop10Sql,
    "q_sim_ivf_catchup" -> annExactTop10Sql,
    "q_sim_ivf_delete" -> annExactTop10DeletedSql,
    "q_sim_ivf_reclaim" -> annExactTop10DeletedSql,
    "q_sim_lsh_upsert" -> annExactTop10Sql,
    "q_sim_lsh_compact" -> annExactTop10Sql,
    "q_sim_lsh_catchup" -> annExactTop10Sql,
    "q_sim_lsh_delete" -> annExactTop10DeletedSql,
    "q_sim_lsh_reclaim" -> annExactTop10DeletedSql,
    "q_stream_lsh_ingest" -> annExactTop10Sql,
    "q_stream_pq_ingest" -> annExactTop10Sql,
    "q_stream_ivf_ingest" -> annExactTop10Sql,
    "q_sim_pq_upsert" -> annExactTop10Sql,
    "q_sim_pq_compact" -> annExactTop10Sql,
    "q_sim_pq_catchup" -> annExactTop10Sql,
    "q_sim_pq_delete" -> annExactTop10DeletedSql,
    "q_sim_pq_reclaim" -> annExactTop10DeletedSql,

    "q_dedup_remove" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS ws FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(ws)-2, 0)),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle
        |  FROM docs
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), dropped AS (
        |  SELECT DISTINCT id_b FROM inter
        |   JOIN sizes sa ON sa.doc_id = id_a
        |   JOIN sizes sb ON sb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.5
        |)
        |SELECT doc_id, lang, n_chars FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM dropped WHERE dropped.id_b = d.doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        |   / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
        |      * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
        |  AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        |   / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
        |      * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) > 0.35
        |ORDER BY id_a, id_b""".stripMargin,

    // same exact-pair oracle as q_dedup_embedding: the semantic gate must
    // reproduce the UNCONDITIONAL exact answer, and only does so when the
    // cluster-scoped candidate recall clears its in-plan 0.9 floor
    "q_dedup_semantic" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        |   / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
        |      * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
        |  AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        |   / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
        |      * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) > 0.35
        |ORDER BY id_a, id_b""".stripMargin,

    // the oracle reads the ORIGINAL lineitem; the query reads the rows
    // back from the z-ordered rewrite — hash-match proves the layout
    // rewrite preserved content, and the in-plan skip-bound gate proves
    // it actually clusters both dimensions
    "q_zorder_layout" ->
      """WITH b AS (
        |  SELECT min(l_partkey) + CAST(FLOOR((max(l_partkey) - min(l_partkey)) * 0.45) AS BIGINT) AS lo,
        |         min(l_partkey) + CAST(FLOOR((max(l_partkey) - min(l_partkey)) * 0.50) AS BIGINT) AS hi
        |  FROM lineitem)
        |SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem, b
        |WHERE l_partkey BETWEEN b.lo AND b.hi
        |ORDER BY l_orderkey, l_partkey, l_quantity, l_extendedprice""".stripMargin,

    // both prune gates read the PARTITIONED rewrite; the oracle reads
    // the original parquet — hash-match proves the layout preserved
    // content, and the in-plan requireStaticPrune/requireDynamicPrune
    // asserts prove the directories were actually skipped
    "q_partition_prune" ->
      """SELECT source, lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE source IN ('src3', 'src7')
        |GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,

    "q_partition_prune_dynamic" ->
      """SELECT d.lang, count(*) AS n_docs
        |FROM documents d
        |JOIN (SELECT source FROM documents GROUP BY source
        |      HAVING CAST(sum(n_chars) AS DOUBLE) >
        |        (SELECT avg(tot) FROM (SELECT CAST(sum(n_chars) AS DOUBLE) AS tot
        |                               FROM documents GROUP BY source))) s
        |  ON d.source = s.source
        |GROUP BY d.lang
        |ORDER BY d.lang""".stripMargin,

    "q_partition_prune_multi" ->
      """WITH b AS (SELECT date_trunc('day', min(ts)) AS d0 FROM events)
        |SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  count(*) AS n, round(sum("value"), 2) AS sum_value
        |FROM events, b
        |WHERE event_type IN ('click', 'purchase')
        |  AND date_trunc('day', ts) BETWEEN b.d0 + INTERVAL 7 DAY
        |                               AND b.d0 + INTERVAL 13 DAY
        |GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,

    "q_stream_partition_prune" ->
      """WITH b AS (SELECT date_trunc('day', min(ts)) AS d0 FROM events)
        |SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  count(*) AS n, round(sum("value"), 2) AS sum_value
        |FROM events, b
        |WHERE event_type = 'click'
        |  AND date_trunc('day', ts) BETWEEN b.d0 + INTERVAL 7 DAY
        |                               AND b.d0 + INTERVAL 13 DAY
        |GROUP BY day
        |ORDER BY day""".stripMargin,

    "q_sim_topk" ->
      """WITH q AS (
        |  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
        |)
        |SELECT vec_id,
        |  list_dot_product(embedding::DOUBLE[], qv)
        |   / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
        |      * sqrt(list_dot_product(qv, qv))) AS cosine
        |FROM embeddings, q
        |ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin,

    "q_hybrid_rrf" -> hybridRrfOracleSql,
    "q_hybrid_borda" -> hybridBordaOracleSql,
    "q_rank_eval" -> rankEvalOracleSql,

    "q_search_bm25_batch" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
        |  FROM documents
        |), tok2 AS (SELECT doc_id, word FROM toks WHERE word <> ''),
        |lens AS (SELECT doc_id, count(*) AS doclen FROM tok2 GROUP BY doc_id),
        |stats AS (
        |  SELECT (SELECT count(*) FROM documents) AS n,
        |    (SELECT count(*) FROM tok2)::DOUBLE
        |      / (SELECT count(*) FROM documents) AS avglen),
        |qterms(qid, word) AS (VALUES
        |  (1,'hash'),(1,'join'),(1,'filter'),
        |  (2,'sort'),(2,'merge'),(2,'batch'),
        |  (3,'stream'),(3,'window'),(3,'agg')),
        |tf AS (
        |  SELECT doc_id, word, count(*) AS tf FROM tok2
        |  WHERE word IN (SELECT DISTINCT word FROM qterms)
        |  GROUP BY doc_id, word),
        |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |scored AS (
        |  SELECT q.qid, tf.doc_id,
        |    sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
        |        * (tf.tf * 2.2)
        |        / (tf.tf + 1.2 * (0.25 + 0.75 * l.doclen / s.avglen))) AS bm25
        |  FROM tf JOIN dfreq d USING (word)
        |    JOIN lens l ON l.doc_id = tf.doc_id
        |    JOIN qterms q ON q.word = tf.word
        |    CROSS JOIN stats s
        |  GROUP BY q.qid, tf.doc_id)
        |SELECT qid, doc_id, bm25_rank FROM (
        |  SELECT qid, doc_id, row_number() OVER (
        |    PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS bm25_rank
        |  FROM scored)
        |WHERE bm25_rank <= 10 ORDER BY qid, bm25_rank""".stripMargin,

    "q_hard_negatives" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
        |  FROM documents
        |), tok2 AS (SELECT doc_id, word FROM toks WHERE word <> ''),
        |lens AS (SELECT doc_id, count(*) AS doclen FROM tok2 GROUP BY doc_id),
        |stats AS (
        |  SELECT (SELECT count(*) FROM documents) AS n,
        |    (SELECT count(*) FROM tok2)::DOUBLE
        |      / (SELECT count(*) FROM documents) AS avglen),
        |qterms(qid, word) AS (VALUES
        |  (1,'hash'),(1,'join'),(1,'filter'),
        |  (2,'sort'),(2,'merge'),(2,'batch'),
        |  (3,'stream'),(3,'window'),(3,'agg')),
        |tf AS (
        |  SELECT doc_id, word, count(*) AS tf FROM tok2
        |  WHERE word IN (SELECT DISTINCT word FROM qterms)
        |  GROUP BY doc_id, word),
        |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |scored AS (
        |  SELECT q.qid, tf.doc_id,
        |    sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
        |        * (tf.tf * 2.2)
        |        / (tf.tf + 1.2 * (0.25 + 0.75 * l.doclen / s.avglen))) AS bm25
        |  FROM tf JOIN dfreq d USING (word)
        |    JOIN lens l ON l.doc_id = tf.doc_id
        |    JOIN qterms q ON q.word = tf.word
        |    CROSS JOIN stats s
        |  GROUP BY q.qid, tf.doc_id),
        |ranked AS (
        |  SELECT qid, doc_id, r FROM (
        |    SELECT qid, doc_id, row_number() OVER (
        |      PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS r
        |    FROM scored)
        |  WHERE r <= 50),
        |negs AS (
        |  SELECT qid, doc_id, r FROM ranked rk
        |  WHERE NOT EXISTS (SELECT 1 FROM documents d
        |    WHERE d.doc_id = rk.doc_id AND d.doc_id % 10 = rk.qid))
        |SELECT qid, doc_id, neg_rank FROM (
        |  SELECT qid, doc_id, row_number() OVER (
        |    PARTITION BY qid ORDER BY r) AS neg_rank
        |  FROM negs)
        |WHERE neg_rank <= 10 ORDER BY qid, neg_rank""".stripMargin,

    "q_hybrid_rrf_batch" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
        |  FROM documents
        |), tok2 AS (SELECT doc_id, word FROM toks WHERE word <> ''),
        |lens AS (SELECT doc_id, count(*) AS doclen FROM tok2 GROUP BY doc_id),
        |stats AS (
        |  SELECT (SELECT count(*) FROM documents) AS n,
        |    (SELECT count(*) FROM tok2)::DOUBLE
        |      / (SELECT count(*) FROM documents) AS avglen),
        |qterms(qid, word) AS (VALUES
        |  (1,'hash'),(1,'join'),(1,'filter'),
        |  (2,'sort'),(2,'merge'),(2,'batch'),
        |  (3,'stream'),(3,'window'),(3,'agg')),
        |tf AS (
        |  SELECT doc_id, word, count(*) AS tf FROM tok2
        |  WHERE word IN (SELECT DISTINCT word FROM qterms)
        |  GROUP BY doc_id, word),
        |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |scored AS (
        |  SELECT q.qid, tf.doc_id,
        |    sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
        |        * (tf.tf * 2.2)
        |        / (tf.tf + 1.2 * (0.25 + 0.75 * l.doclen / s.avglen))) AS bm25
        |  FROM tf JOIN dfreq d USING (word)
        |    JOIN lens l ON l.doc_id = tf.doc_id
        |    JOIN qterms q ON q.word = tf.word
        |    CROSS JOIN stats s
        |  GROUP BY q.qid, tf.doc_id),
        |lex AS (
        |  SELECT qid, doc_id, r FROM (
        |    SELECT qid, doc_id, row_number() OVER (
        |      PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS r
        |    FROM scored)
        |  WHERE r <= 50),
        |qv AS (
        |  SELECT (vec_id + 1)::INT AS qid, embedding::DOUBLE[] AS qv
        |  FROM embeddings WHERE vec_id <= 2),
        |vecr AS (
        |  SELECT qid, doc_id, r FROM (
        |    SELECT q.qid, e.vec_id AS doc_id, row_number() OVER (
        |      PARTITION BY q.qid
        |      ORDER BY list_dot_product(e.embedding::DOUBLE[], q.qv)
        |        / (sqrt(list_dot_product(e.embedding::DOUBLE[],
        |                                 e.embedding::DOUBLE[]))
        |           * sqrt(list_dot_product(q.qv, q.qv))) DESC,
        |        e.vec_id) AS r
        |    FROM embeddings e CROSS JOIN qv q)
        |  WHERE r <= 50),
        |fused AS (
        |  SELECT qid, doc_id, 1::DOUBLE / (60 + r) AS fs FROM lex
        |  UNION ALL
        |  SELECT qid, doc_id, 1::DOUBLE / (60 + r) AS fs FROM vecr),
        |agg AS (SELECT qid, doc_id, sum(fs) AS score, count(*) AS n_lists
        |  FROM fused GROUP BY qid, doc_id)
        |SELECT qid, doc_id, n_lists, rrf_rank FROM (
        |  SELECT qid, doc_id, n_lists, row_number() OVER (
        |    PARTITION BY qid ORDER BY score DESC, doc_id) AS rrf_rank
        |  FROM agg)
        |WHERE rrf_rank <= 25 ORDER BY qid, rrf_rank""".stripMargin,

    "q_rank_eval_batch" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS word
        |  FROM documents
        |), tok2 AS (SELECT doc_id, word FROM toks WHERE word <> ''),
        |lens AS (SELECT doc_id, count(*) AS doclen FROM tok2 GROUP BY doc_id),
        |stats AS (
        |  SELECT (SELECT count(*) FROM documents) AS n,
        |    (SELECT count(*) FROM tok2)::DOUBLE
        |      / (SELECT count(*) FROM documents) AS avglen),
        |qterms(qid, word) AS (VALUES
        |  (1,'hash'),(1,'join'),(1,'filter'),
        |  (2,'sort'),(2,'merge'),(2,'batch'),
        |  (3,'stream'),(3,'window'),(3,'agg')),
        |tf AS (
        |  SELECT doc_id, word, count(*) AS tf FROM tok2
        |  WHERE word IN (SELECT DISTINCT word FROM qterms)
        |  GROUP BY doc_id, word),
        |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |scored AS (
        |  SELECT q.qid, tf.doc_id,
        |    sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
        |        * (tf.tf * 2.2)
        |        / (tf.tf + 1.2 * (0.25 + 0.75 * l.doclen / s.avglen))) AS bm25
        |  FROM tf JOIN dfreq d USING (word)
        |    JOIN lens l ON l.doc_id = tf.doc_id
        |    JOIN qterms q ON q.word = tf.word
        |    CROSS JOIN stats s
        |  GROUP BY q.qid, tf.doc_id),
        |ranked AS (
        |  SELECT qid, doc_id, r FROM (
        |    SELECT qid, doc_id, row_number() OVER (
        |      PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS r
        |    FROM scored)
        |  WHERE r <= 10),
        |qrels AS (
        |  SELECT q.qid, d.doc_id, (1 + d.doc_id % 3)::DOUBLE AS g
        |  FROM (SELECT DISTINCT qid FROM qterms) q
        |  JOIN documents d ON d.doc_id % 10 = q.qid),
        |idcg AS (
        |  SELECT qid, sum((pow(2, g) - 1) / log2(i + 1)) AS v FROM (
        |    SELECT qid, g, row_number() OVER (
        |      PARTITION BY qid ORDER BY g DESC, doc_id) AS i
        |    FROM qrels)
        |  WHERE i <= 10 GROUP BY qid),
        |totals AS (SELECT qid, count(*) AS n_relevant FROM qrels GROUP BY qid),
        |hits AS (
        |  SELECT qid, sum((pow(2, g) - 1) / log2(r + 1)) AS dcg,
        |    count(*) AS nhit, min(r) AS minr,
        |    sum(hidx::DOUBLE / r) AS apsum
        |  FROM (
        |    SELECT r.qid, r.r, q.g, row_number() OVER (
        |      PARTITION BY r.qid ORDER BY r.r) AS hidx
        |    FROM ranked r JOIN qrels q
        |      ON q.qid = r.qid AND q.doc_id = r.doc_id)
        |  GROUP BY qid)
        |SELECT t.qid, t.n_relevant,
        |  round(coalesce(h.nhit, 0)::DOUBLE / t.n_relevant, 4) AS recall_at_k,
        |  round(coalesce(1::DOUBLE / h.minr, 0), 4) AS mrr_at_k,
        |  round(coalesce(h.dcg / i.v, 0), 4) AS ndcg_at_k,
        |  round(coalesce(h.apsum, 0) / least(10, t.n_relevant), 4) AS map_at_k
        |FROM totals t JOIN idcg i USING (qid) LEFT JOIN hits h USING (qid)
        |ORDER BY t.qid""".stripMargin,

    "q_csv_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_regionkey < 3 ORDER BY n_nationkey""".stripMargin,

    "q_excel_roundtrip" ->
      """SELECT CAST(n_nationkey AS DOUBLE) AS n_nationkey, n_name
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_excel_dates" ->
      """SELECT CAST(o_orderkey AS DOUBLE) AS o_orderkey,
        |  CAST(o_orderdate AS DATE) AS o_date,
        |  o_orderdate + (o_orderkey % 86400) * INTERVAL 1 SECOND AS o_ts
        |FROM orders WHERE o_orderkey <= 2000
        |ORDER BY o_orderkey""".stripMargin,

    "q_tsv_roundtrip" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q_json_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_odate
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_fixedwidth" ->
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""".stripMargin,

    "q_csv_string" ->
      """SELECT * FROM (VALUES (1,'foo'),(2,'bar'),(-1,'baz')) AS t(x,y)
        |ORDER BY x""".stripMargin,

    "q_zip_import" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,

    "q_stream_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    // unconditional exact per-window distincts: the streamed HLL
    // estimate only lets a row through when it is within tolerance
    "q_stream_approx_distinct" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  event_type, count(DISTINCT user_id) AS n_exact
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    // unconditional exact per-(day, type) row counts: the streamed KLL
    // p50/p90's true ranks must sit within 0.05·n of target and the
    // sketch row counts must equal the batch counts, or rows drop
    "q_stream_quantiles" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  event_type, count("value") AS n_rows
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    // the funnel's append-mode cut: only windows whose end has passed
    // the final watermark (max ts - 1 h) are emitted by the stream
    "q_stream_funnel" ->
      """WITH m AS (SELECT max(ts) AS mx FROM events),
        |d AS (SELECT DISTINCT user_id, event_type,
        |        date_trunc('hour', ts) AS h FROM events)
        |SELECT strftime(d.h, '%Y-%m-%d %H:%M:%S') AS hour,
        |  c.c_mktsegment, CAST(count(*) AS BIGINT) AS n
        |FROM d JOIN customer c ON d.user_id = c.c_custkey CROSS JOIN m
        |WHERE d.h + INTERVAL 1 HOUR <= m.mx - INTERVAL 1 HOUR
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_stream_sliding" ->
      """WITH assigned AS (
        |  SELECT date_trunc('hour', ts) AS w_start, event_type, value FROM events
        |  UNION ALL
        |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type, value FROM events)
        |SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, count(*) AS n, round(sum(value),2) AS sum_value
        |FROM assigned GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,

    "q_stream_stateful" ->
      """SELECT user_id, count(*) AS n_events,
        |  round(sum(value),2) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_stream_join" ->
      """WITH c AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, count(*) AS n_pairs,
        |  round(sum(p.value), 2) AS sum_value
        |FROM c JOIN p ON p.user_id = c.user_id
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,

    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |), sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_multimodal_features" ->
      """SELECT doc_id,
        |  CAST(64 + (octet_length(encode(text)) % 576) AS INTEGER) AS width,
        |  CAST(64 + ((octet_length(encode(text)) * 7) % 416) AS INTEGER) AS height,
        |  CAST(list_sum(list_transform(string_split(text,''), x -> unicode(x))) AS DOUBLE)
        |    / CAST(octet_length(encode(text)) AS DOUBLE) AS mean_intensity
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    greatest(CAST(floor(octet_length(encode(text))/256.0) AS BIGINT), 1)
        |      AS n_frames
        |  FROM documents)
        |SELECT doc_id, n_frames,
        |  CAST(256 * (n_frames * (n_frames - 1) / 2) AS BIGINT) AS sum_off
        |FROM f ORDER BY doc_id""".stripMargin,

    // run-semantics oracle (kept separate for readability)
    "q_groupby_runs" ->
      """WITH tagged AS (
        |  SELECT l_returnflag,
        |    row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_returnflag) AS rn,
        |    CASE WHEN lag(l_returnflag) OVER (ORDER BY l_orderkey, l_linenumber, l_returnflag) IS NULL
        |           OR lag(l_returnflag) OVER (ORDER BY l_orderkey, l_linenumber, l_returnflag) <> l_returnflag
        |         THEN 1 ELSE 0 END AS chg
        |  FROM lineitem
        |), runs AS (
        |  SELECT l_returnflag,
        |    sum(chg) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM tagged
        |), per_run AS (
        |  SELECT run_id, min(l_returnflag) AS flag, count(*) AS run_len
        |  FROM runs GROUP BY run_id
        |)
        |SELECT flag, count(*) AS n_runs, CAST(sum(run_len) AS BIGINT) AS total_rows,
        |  max(run_len) AS max_run
        |FROM per_run GROUP BY flag ORDER BY flag""".stripMargin
  )
}
