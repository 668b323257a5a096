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
}
