package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered-table discipline for a distributed engine.
  *
  * The reference is an ordered in-memory list, so `rank`/`head`/`tail`/
  * slices are trivial (littletable.py:2248-2257, 3816-3830). On Spark a
  * global `row_number()` window collapses the whole table into ONE
  * partition — fine at 60k rows, fatal at 100 TB. Every helper here is a
  * PURE Catalyst plan built on one idiom, the VALUE-KEYED two-level
  * prefix:
  *
  *  1. one tiny aggregate for min/max of the leading sort key (defines
  *     bucket boundaries — boundaries affect only balance, never
  *     values);
  *  2. rows map to order-aligned buckets via `width_bucket` over a
  *     monotone double proxy of the key ([[KeyProxy]]; equal keys share
  *     a bucket, bucket id is monotone in the key);
  *  3. one tiny per-bucket aggregate, exclusive-prefixed on the driver
  *     in bucket visit order (ascending ids for an asc leading key,
  *     descending for desc), broadcast-joined back on the bucket id
  *     (O(1) hash probe per row — not a per-row literal-map scan);
  *  4. per-row result = bucket offset + an intra-bucket window
  *     partitioned by bucket and ordered by the full sort keys.
  *
  * No single-partition exchange (the only window is bucket-partitioned),
  * no RDD zip, no persist, no dependence on physical layout: every
  * output value is a function of row VALUES, so stage retries, shuffle
  * re-computation, and executor loss cannot corrupt results — the
  * property the previous RDD zipWithIndex implementation had to buy
  * with a pinned MEMORY_AND_DISK cache.
  *
  * EXECUTION CONTRACT — the input plan is evaluated MORE THAN ONCE
  * (a min/max/null-count pass over the key, a per-bucket count pass,
  * and the emit pass; 2–3 jobs total by design: the aggregates are
  * narrow single-column scans, far cheaper than pinning the full frame).
  * The input must therefore be VALUE-DETERMINISTIC: a plan containing
  * `rand()`, an unseeded shuffle, `monotonically_increasing_id`, or a
  * non-idempotent source can disagree with itself between passes —
  * bucket counts taken in pass 2 would not describe the rows emitted in
  * pass 3, corrupting ordinals silently. ENFORCED for the detectable
  * case ([[requireDeterministicPlan]]): a plan carrying a
  * nondeterministic expression fails fast. Callers with such a source
  * must materialize first (`df.localCheckpoint(true)` — persist alone
  * is insufficient, eviction recomputes) and hand this module the
  * checkpointed frame; everything in this repo feeds deterministic
  * parquet-derived plans.
  *
  * The sort keys MUST be a total order (include a unique tiebreaker) for
  * results to be deterministic. Bucket granularity is bounded by the
  * LEADING key's cardinality — equal keys share a bucket, so order by a
  * selective column first (a constant leading key degrades to one
  * bucket, i.e. the single-partition window this module exists to
  * avoid). At cluster scale pick `buckets` so one bucket's rows fit an
  * executor's window buffer (the default scales with
  * `spark.sql.shuffle.partitions`).
  */
object Ordinals {

  private def defaultBuckets(df: DataFrame): Int =
    math.max(64, df.sparkSession.sessionState.conf.numShufflePartitions * 16)

  /** Order-aligned bucket id (LongType) for `key`: 1..nBuckets+1 for
    * non-null keys (monotone in the key), 0 for nulls (Spark sorts
    * nulls first on asc, last on desc — the VISIT order places bucket 0
    * accordingly). None when the frame is empty or the key is all-null
    * (callers fall back to a single constant bucket). Also returns the
    * null-key count so callers can enforce non-null contracts without a
    * second pass. */
  private def orderedBucket(df: DataFrame, key: Column,
      nBuckets: Int): (Option[Column], Long) = {
    val dt = df.select(key).schema.head.dataType
    val (proxy, mnMx) = dt match {
      case StringType =>
        val r = df.agg(min(key), max(key),
          count(when(key.isNull, 1)).as("__nn")).head()
        if (r.isNullAt(0)) (None, r.getLong(2))
        else {
          val sp = KeyProxy.string(key, r.getString(0), r.getString(1))
          (Some((sp.expr, sp.mn, sp.mx)), r.getLong(2))
        }
      case _ =>
        val p = KeyProxy.numeric(key, dt, "Ordinals").get
        val r = df.agg(min(p), max(p), count(when(key.isNull, 1)).as("__nn")).head()
        if (r.isNullAt(0)) (None, r.getLong(2))
        else (Some((p, r.getDouble(0), r.getDouble(1))), r.getLong(2))
    }
    val expr = proxy.map { case (p, mn, mx) =>
      val b = if (mx > mn) width_bucket(p, lit(mn), lit(mx), lit(nBuckets))
              else lit(1L)
      coalesce(b, lit(0L)) // null key → bucket 0
    }
    (expr, mnMx)
  }

  /** Driver-side exclusive prefix of per-bucket values in visit order,
    * returned as a broadcastable (bucket, offset) frame. */
  private def prefixFrame(df: DataFrame, perBucket: Array[(Long, Long)],
      ascending: Boolean): DataFrame = {
    val visit = if (ascending) perBucket.sortBy(_._1) else perBucket.sortBy(-_._1)
    val pairs = visit.map(_._1).zip(visit.map(_._2).scanLeft(0L)(_ + _)).toSeq
    df.sparkSession.createDataFrame(pairs).toDF("__bkt", "__pfx")
  }

  /** Scratch names these helpers inject mid-plan. User frames are
    * arbitrary schemas (this is a generic engine), and `withColumn`
    * silently REPLACES an existing column — so a collision would
    * corrupt user data or throw an ambiguous-column error deep in the
    * plan. Fail fast with the actual contract instead. */
  private val scratchNames = Set("__bkt", "__pfx", "__rn", "__chg", "__off")
  private def requireNoScratchClash(df: DataFrame, outName: String): Unit = {
    val clash = df.columns.toSet.intersect(scratchNames + outName)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with Ordinals " +
        "scratch/output names — rename them (or pick another output " +
        "name) before ordinal/run-id/cumsum ops")
  }

  /** The EXECUTION CONTRACT above (multi-pass evaluation needs a
    * value-deterministic input), ENFORCED for the detectable case: any
    * nondeterministic expression in the analyzed plan — `rand()`,
    * `shuffle()`, `monotonically_increasing_id()`, `uuid()` — would let
    * the passes disagree, corrupting ordinals SILENTLY. Fail fast with
    * the remedy instead. (A non-idempotent SOURCE — a re-read table
    * mutated mid-query — is not statically detectable; that half of the
    * contract stays documentation.) */
  private def requireDeterministicPlan(df: DataFrame, op: String): Unit = {
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    // descend into SUBQUERY plans too: plan.collectFirst/Expression.exists
    // stop at a SubqueryExpression's expression node and never walk its
    // nested plan, so a rand()/uuid() inside a scalar/EXISTS/IN subquery
    // would escape the gate while still corrupting multi-pass ordinals
    def nondet(plan: LogicalPlan): Option[LogicalPlan] =
      plan.collectFirst {
        case p if p.expressions.exists(e => e.exists {
            case s: SubqueryExpression => nondet(s.plan).isDefined
            case other => !other.deterministic
          }) => p
      }
    val bad = nondet(df.queryExecution.analyzed)
    require(bad.isEmpty,
      s"$op evaluates its input MORE THAN ONCE, but the plan contains a " +
        "nondeterministic expression (e.g. rand/shuffle/" +
        "monotonically_increasing_id) in:\n" + bad.get.toString.take(500) +
        "\nMaterialize first — df.localCheckpoint(true), which severs " +
        "lineage and pins values — and pass the checkpointed frame. " +
        "(persist()+count() is NOT sufficient: eviction silently " +
        "recomputes, and the plan still carries the expression.)")
  }

  /** Append a consecutive 1-based ordinal in the order of `keys`. */
  def withOrdinal(df: DataFrame, keys: Seq[SortKey], name: String = "__ord"): DataFrame = {
    require(keys.nonEmpty, "ordinals are order-defined — orderby first")
    requireNoScratchClash(df, name)
    requireDeterministicPlan(df, "withOrdinal")
    val first = keys.head
    val (bucketOpt, _) = orderedBucket(df, first.c, defaultBuckets(df))
    val data = df.withColumn("__bkt", bucketOpt.getOrElse(lit(0L)))
    val counts = data.groupBy(col("__bkt")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val w = Window.partitionBy(col("__bkt")).orderBy(keys.map(_.order): _*)
    data.join(broadcast(prefixFrame(df, counts, first.asc)), "__bkt")
      .withColumn(name, col("__pfx") + row_number().over(w).cast(LongType))
      .select(df.columns.map(col) :+ col(name): _*)
  }

  /** EXCLUSIVE running total of `valueCol` in `idCol` order: each row
    * gets the sum of all rows with a strictly smaller key (0 for the
    * smallest). `idCol` must be unique and non-null — the total order
    * that defines the sum. */
  def keyedRunningTotal(df: DataFrame, idCol: String, valueCol: String,
      name: String = "__cum", buckets: Int = 0): DataFrame =
    runningTotalImpl(df, Seq(SortKey(col(idCol))), valueCol, name, buckets,
      requireNonNullFirst = Some(idCol))

  /** EXCLUSIVE running total of `valueCol` in the TOTAL order defined by
    * `keys` (tie-break with a unique trailing key — equal-key rows would
    * otherwise get a window-order-dependent split of their shared
    * prefix). Same two-level shape as [[keyedRunningTotal]]: buckets are
    * aligned to the LEADING key (asc or desc), the per-bucket sums are
    * exclusive-prefixed on the driver in visit order, and the intra-bucket
    * window orders by the full key list — no single-partition exchange
    * at any size, values independent of physical layout. */
  def runningTotal(df: DataFrame, keys: Seq[SortKey], valueCol: String,
      name: String = "__cum", buckets: Int = 0): DataFrame =
    runningTotalImpl(df, keys, valueCol, name, buckets,
      requireNonNullFirst = None)

  private def runningTotalImpl(df: DataFrame, keys: Seq[SortKey],
      valueCol: String, name: String, buckets: Int,
      requireNonNullFirst: Option[String]): DataFrame = {
    require(keys.nonEmpty, "running totals are order-defined")
    requireNoScratchClash(df, name)
    requireDeterministicPlan(df, "runningTotal")
    val nBuckets = if (buckets > 0) buckets else defaultBuckets(df)
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"$valueCol must be integral (byte/short/int/long), got $other — " +
          "a fractional type would silently truncate per-row before summing")
    }
    val v = coalesce(col(valueCol).cast(LongType), lit(0L))
    val first = keys.head
    val (bucketOpt, nNull) = orderedBucket(df, first.c, nBuckets)
    requireNonNullFirst.foreach(k => require(nNull == 0, s"$k must be non-null"))
    // bucketOpt is None for an empty frame AND for an all-null leading
    // key; both fall back to the single constant bucket (the same
    // fallback withOrdinal uses) so an all-null-scored frame still gets
    // a correct tie-break-ordered prefix sum instead of silent zeros —
    // degenerate single-partition, but correct
    val data = df.withColumn("__bkt", bucketOpt.getOrElse(lit(0L)))
    val perBucket = data.groupBy(col("__bkt")).agg(sum(v).as("__bsum"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val wIn = Window.partitionBy(col("__bkt")).orderBy(keys.map(_.order): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    data.join(broadcast(prefixFrame(df, perBucket, first.asc)), "__bkt")
      .withColumn(name, col("__pfx") + coalesce(sum(v).over(wIn), lit(0L)))
      .select(df.columns.map(col) :+ col(name): _*)
  }

  /** Consecutive 1-based run id over the established order: a new id
    * starts whenever `keyCol` differs from the previous row's value
    * (null-safe equality — null == null continues a run). Intra-bucket
    * boundaries come from `lag` over the bucket window; the per-bucket
    * stitch (merging runs that span a bucket boundary) compares each
    * bucket's first key against the previous bucket's last key on the
    * driver, over one tiny per-bucket aggregate. */
  def withRunId(df: DataFrame, keys: Seq[SortKey], keyCol: String,
      name: String = "__run"): DataFrame = {
    require(keys.nonEmpty, "run ids are order-defined")
    requireNoScratchClash(df, name)
    requireDeterministicPlan(df, "withRunId")
    val spark = df.sparkSession
    val first = keys.head
    val (bucketOpt, _) = orderedBucket(df, first.c, defaultBuckets(df))
    val w = Window.partitionBy(col("__bkt")).orderBy(keys.map(_.order): _*)
    val rn = row_number().over(w).cast(LongType)
    // first row of a bucket is provisionally a boundary; the stitch
    // cancels it when the run continues across the bucket edge
    val boundary = when(rn === 1L, lit(1L)).otherwise(
      when(not(col(keyCol) <=> lag(col(keyCol), 1).over(w)), lit(1L))
        .otherwise(lit(0L)))
    // PERFORMANCE cache only (unlike the old RDD design, correctness
    // never depends on it): the bucket sort + window runs once and both
    // the stats pass and the emit read it; without the cache the emit
    // would re-sort. Dropped by ContextCleaner with the result frame; a
    // caller that cannot afford the cache at its scale may strip it —
    // results are identical either way, just computed twice.
    val tagged = df.withColumn("__bkt", bucketOpt.getOrElse(lit(0L)))
      .withColumn("__rn", rn).withColumn("__chg", boundary)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-bucket: run count + first/last key in sort order (min/max of
    // (rn, key) structs — rn is unique per bucket, so the key field never
    // drives the comparison and may be null)
    val stats = tagged.groupBy(col("__bkt")).agg(
        sum(col("__chg")).as("__runs"),
        min(struct(col("__rn"), col(keyCol).as("__k"))).as("__first"),
        max(struct(col("__rn"), col(keyCol).as("__k"))).as("__last"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getStruct(2).get(1), r.getStruct(3).get(1)))
    val visit = if (first.asc) stats.sortBy(_._1) else stats.sortBy(-_._1)
    var global = 0L
    var prevLast: Any = null
    var prevSeen = false
    val offsets = visit.map { case (b, runs, firstK, lastK) =>
      // deepEquals, not ==: binary keys surface as Array[Byte], where
      // JVM == is reference equality and a run spanning a bucket edge
      // would never merge (making run ids bucket-layout-dependent)
      val merged = prevSeen && java.util.Objects.deepEquals(firstK, prevLast)
      val off = if (merged) global - 1 else global
      global = off + runs
      prevLast = lastK; prevSeen = true
      (b, off)
    }
    val prefixDf = spark.createDataFrame(offsets.toSeq).toDF("__bkt", "__off")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.join(broadcast(prefixDf), "__bkt")
      .withColumn(name, col("__off") + sum(col("__chg")).over(wRun))
      .select(df.columns.map(col) :+ col(name): _*)
  }
}
