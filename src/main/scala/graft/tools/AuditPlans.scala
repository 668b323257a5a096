package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Plan red-flag sweep across every registered query: counts exchanges
  * and flags cartesian products / nested-loop joins / non-codegen spans
  * so scale regressions surface as a diff, not a bench surprise.
  * PlanAuditSpec runs [[sweep]] in `sbt test` and fails on any
  * unexplained flag, so the tripwire cannot silently rot.
  *
  * Usage: runMain graft.tools.AuditPlans [sfDir]
  */
object AuditPlans {

  final case class AuditRow(name: String, shuffles: Int, flags: Seq[String],
      error: Option[String]) {
    /** A flag the whitelist does not explain (CARTESIAN, bare BNLJ,
      * NO-CODEGEN) or a planning failure. */
    def unexplained: Boolean =
      error.nonEmpty || flags.exists(f => !f.startsWith("BNLJ[expected"))
  }

  /** Streaming queries need a streaming sink to plan; audited via their
    * batch-equivalent plans and the streaming specs instead. */
  val skipExec: Set[String] = Set("q_stream_tumbling", "q_stream_sliding",
    "q_stream_stateful", "q_stream_dedup")

  /** BNLJs that are part of the design, with why they are scale-safe. */
  val expectedBnlj: Map[String, String] = Map(
    "q_dedup_embedding" ->
      "verification-grade exact all-pairs; LSH banding is the scale path",
    "q_pivot_3level" ->
      "pivot key-lattice grid: product of two broadcast DISTINCT-KEY sets, bounded by pivot-key cardinality",
    "q_quantile_band" ->
      "quantile thresholds: build side is exactly ONE broadcast row (the [lo,hi] aggregate), so the 'nested loop' is a map over the stream side")

  /** Count DISTINCT shuffle-exchange instances (by object identity),
    * descending into InMemoryRelation cached plans: a pinned subtree
    * prints twice in toString but its exchanges run once; a
    * ReusedExchange's child is the original node and dedupes itself. */
  def countShuffles(root: SparkPlan): Int = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Unit = p.foreach {
      case s: ShuffleExchangeExec => seen.add(s)
      case im: InMemoryTableScanExec => walk(im.relation.cachedPlan)
      case _ => ()
    }
    walk(root)
    seen.size
  }

  /** Audit every registered batch query's static physical plan. Run with
    * AQE OFF — AQE wraps plans in AdaptiveSparkPlan(isFinalPlan=false),
    * hiding codegen spans from the string check. */
  def sweep(spark: SparkSession, sfDir: String): Seq[AuditRow] =
    graft.Queries.all.toSeq.sortBy(_._1).collect {
      case (name, fn) if !skipExec.contains(name) =>
        try {
          val exec = fn(spark, sfDir).queryExecution.executedPlan
          val plan = exec.toString
          val bnljFlag =
            if (!plan.contains("BroadcastNestedLoopJoin")) None
            else expectedBnlj.get(name) match {
              case Some(why) => Some(s"BNLJ[expected: $why]")
              case None => Some("BNLJ")
            }
          val flags = Seq(
            if (plan.contains("CartesianProduct")) Some("CARTESIAN") else None,
            bnljFlag,
            // codegen stages print as `*(n) Operator` in simpleString
            if (!plan.contains("*(")) Some("NO-CODEGEN") else None
          ).flatten
          AuditRow(name, countShuffles(exec), flags, None)
        } catch {
          case e: Throwable => AuditRow(name, -1, Nil, Some(e.getMessage))
        }
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sweep(spark, sfDir).foreach { r =>
      r.error match {
        case Some(msg) => println(f"${r.name}%-26s ERROR ${msg.take(60)}")
        case None =>
          println(f"${r.name}%-26s shuffles=${r.shuffles}%-3d ${r.flags.mkString(",")}")
      }
    }
    spark.stop()
  }
}
