package graft

import org.apache.spark.sql.functions._
import graft.core.{Ordinals, SortKey}

/** The Ordinals determinism contract is ENFORCED, not just documented:
  * a nondeterministic input plan fails fast with the remedy, and the
  * checkpointed remedy itself passes. */
class OrdinalsSpec extends SparkSpec {
  import spark.implicits._

  private def base = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")

  test("rand()-bearing input plan is rejected immediately, for every " +
      "multi-pass entry point") {
    val nondet = base.withColumn("score", rand(42))
    val keys = Seq(SortKey(col("id")))
    for ((name, call) <- Seq[(String, () => Any)](
        "withOrdinal" -> (() => Ordinals.withOrdinal(nondet, keys)),
        "runningTotal" -> (() => Ordinals.runningTotal(nondet, keys, "id")),
        "keyedRunningTotal" ->
          (() => Ordinals.keyedRunningTotal(nondet, "id", "id")),
        "withRunId" -> (() => Ordinals.withRunId(nondet, keys, "v")))) {
      val e = intercept[IllegalArgumentException](call())
      assert(e.getMessage.contains("nondeterministic"), s"$name: $e")
      assert(e.getMessage.contains("localCheckpoint"), s"$name: $e")
    }
  }

  test("a nondeterministic expression INSIDE a subquery plan is rejected " +
      "too — the gate descends into scalar/EXISTS subqueries") {
    base.createOrReplaceTempView("ord_subq_t")
    // rand()*0 keeps the values deterministic in fact, but the PLAN
    // carries a nondeterministic expression inside the scalar subquery —
    // exactly what a top-level-only walk misses
    val q = spark.sql(
      "select id, v from ord_subq_t " +
        "where id > (select min(id) + rand() * 0 from ord_subq_t)")
    val e = intercept[IllegalArgumentException](
      Ordinals.withOrdinal(q, Seq(SortKey(col("id")))))
    assert(e.getMessage.contains("nondeterministic"), e.getMessage)
    // the same shape WITHOUT rand() passes
    val ok = spark.sql(
      "select id, v from ord_subq_t " +
        "where id > (select min(id) from ord_subq_t)")
    assert(Ordinals.withOrdinal(ok, Seq(SortKey(col("id")))).count() == 99)
  }

  test("the documented remedy passes: localCheckpoint severs the " +
      "nondeterministic lineage and ordinals come out consistent") {
    val pinned = base.withColumn("score", rand(42)).localCheckpoint(true)
    val out = Ordinals.withOrdinal(pinned, Seq(SortKey(col("id"))), "ord")
    val rows = out.select("id", "ord").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == (1 to 100).map(i => i.toLong -> i.toLong).toMap)
  }

  test("deterministic expressions are NOT rejected (seeded hash, " +
      "arithmetic, string ops)") {
    val det = base.withColumn("h", hash(col("v")))
      .withColumn("d", col("id") * 2 + length(col("v")))
    val out = Ordinals.withOrdinal(det, Seq(SortKey(col("id"))), "ord")
    assert(out.count() == 100)
  }
}
