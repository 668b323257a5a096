package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan red-flag sweep across every registered query: counts exchanges
  * and flags cartesian products / nested-loop joins / non-codegen spans
  * so scale regressions surface as a diff, not a bench surprise.
  *
  * Usage: runMain graft.tools.AuditPlans [sfDir]
  */
object AuditPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // Static plans for inspection: AQE wraps everything in
      // AdaptiveSparkPlan(isFinalPlan=false), hiding codegen spans.
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val skipExec = Set("q_stream_tumbling", "q_stream_sliding", "q_stream_stateful",
      "q_stream_dedup")
    // BNLJs that are part of the design, with why they are scale-safe:
    val expectedBnlj = Map(
      "q_dedup_embedding" ->
        "verification-grade exact all-pairs; LSH banding is the scale path",
      "q_pivot_3level" ->
        "pivot key-lattice grid: product of two broadcast DISTINCT-KEY sets, bounded by pivot-key cardinality")
    graft.Queries.all.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skipExec.contains(name)) {
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val exchanges = "Exchange".r.findAllIn(plan).length -
            "BroadcastExchange".r.findAllIn(plan).length -
            "ReusedExchange".r.findAllIn(plan).length
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
          println(f"$name%-26s shuffles=$exchanges%-3d ${flags.mkString(",")}")
        } catch {
          case e: Throwable => println(f"$name%-26s ERROR ${e.getMessage.take(60)}")
        }
      }
    }
    spark.stop()
  }
}
