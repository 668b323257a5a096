package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.GTable

/** Corpus curation funnel (beyond the reference — the standard shape of
  * a production training-data filter chain): an ordered list of named
  * keep-predicates applied conjunctively, yielding the filtered corpus
  * AND a per-stage survivor report.
  *
  * Scale shape: the report is ONE aggregate over the source — stage i's
  * survivor count is `count(WHERE p₁ ∧ … ∧ pᵢ)`, all computed in a
  * single pass as conditional counts (no per-stage scans, no driver
  * loop; the one-row aggregate reshapes to rows inside the plan via
  * explode). The filtered corpus is a plain conjunctive filter —
  * Catalyst pushes it into the scan. */
object Curate {

  final case class Stage(name: String, keep: Column)

  /** The filtered corpus: all stage predicates, pushed down as one
    * conjunction. */
  def filtered(t: GTable, stages: Seq[Stage]): GTable = {
    require(stages.nonEmpty, "need at least one stage")
    t.copy(df = t.df.filter(stages.map(_.keep).reduce(_ && _)))
  }

  /** Per-stage survivor report: rows (stage, name, survivors), stage 0
    * being the unfiltered input. One aggregate pass. */
  def report(t: GTable, stages: Seq[Stage]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val cumulative = stages.scanLeft(lit(true))((acc, s) => acc && s.keep).tail
    val aggs = count(lit(1)).cast("long").as("n_0") +:
      cumulative.zipWithIndex.map { case (pred, i) =>
        count(when(pred, 1)).cast("long").as(s"n_${i + 1}")
      }
    val one = t.df.agg(aggs.head, aggs.tail: _*)
    val stageStructs = struct(lit(0).as("stage"), lit("input").as("name"),
      col("n_0").as("survivors")) +:
      stages.zipWithIndex.map { case (s, i) =>
        struct(lit(i + 1).as("stage"), lit(s.name).as("name"),
          col(s"n_${i + 1}").as("survivors"))
      }
    one.select(explode(array(stageStructs: _*)).as("s"))
      .select(col("s.stage"), col("s.name"), col("s.survivors"))
  }
}
