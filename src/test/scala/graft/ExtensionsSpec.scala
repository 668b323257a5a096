package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** SQL surface: graft's native expressions registered as SQL functions. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot / vec_norm / vec_cosine usable from SQL") {
    GraftExtensions.install(spark)
    Seq((1L, Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 0.0f)))
      .toDF("id", "a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT vec_dot(a, b) AS d, vec_norm(a) AS n, vec_cosine(a, b) AS c FROM vecs")
      .head()
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 2.0 / (3.0 * 2.0)) < 1e-12)
  }

  test("text pipeline usable from SQL: simhash64 / shingle_hash_set / normalize_words") {
    GraftExtensions.install(spark)
    Seq((1L, "The Quick brown Foxes jumped over i.b.m. systems"))
      .toDF("id", "text").createOrReplaceTempView("docs_sql")
    val r = spark.sql("""
      SELECT simhash64(split(text, '\\s+')) AS sh,
             size(shingle_hash_set(split(text, '\\s+'), 3)) AS n_sh,
             normalize_words(text) AS words,
             normalize_words(text, true) AS sorted_words
      FROM docs_sql""").head()
    // agrees with the fluent API
    import graft.functions.TextHashExpressions.{simhash64 => sh64, normalize_words => nw}
    val api = spark.table("docs_sql").select(
      sh64(split(col("text"), "\\s+")).as("sh"),
      nw(col("text"), graft.functions.TextNormalize.stopwords).as("w")).head()
    assert(r.getLong(0) == api.getLong(0))
    assert(r.getInt(1) == 6) // 8 words -> 6 trigram shingles
    assert(r.getSeq[String](2) == api.getSeq[String](1))
    assert(r.getSeq[String](2).contains("fox"), "plural singularized")
    assert(r.getSeq[String](2).contains("ibm"), "acronym collapsed")
    assert(r.getSeq[String](3) == r.getSeq[String](3).sorted, "sorted-set shape")
    // literal-argument validation
    intercept[Exception](spark.sql("SELECT shingle_hash_set(array('a'), id) FROM docs_sql").collect())
  }

  test("GraftSession.configure applies the recommended scale configs") {
    // getOrCreate on the running test session: runtime confs apply; the
    // withExtensions injection path only takes effect on a FRESH session
    // (GraftSession.local) — its registration list is the same one
    // install() uses, which the other tests here exercise end-to-end.
    savingConf("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions", "spark.sql.files.maxPartitionBytes") {
      val s = graft.GraftSession.configure(
        org.apache.spark.sql.SparkSession.builder(), shufflePartitions = 8)
        .getOrCreate()
      assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(s.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    }
  }

  test("SQL vec_dot agrees bit-exactly with the fluent API on real embeddings") {
    GraftExtensions.install(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.createOrReplaceTempView("emb")
    import graft.functions.VectorExpressions.vec_dot
    val api = emb.select(col("vec_id"), vec_dot(col("embedding"), col("embedding")).as("d"))
      .orderBy("vec_id").limit(50).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val sql = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS d FROM emb ORDER BY vec_id LIMIT 50")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(api.sameElements(sql))
  }

  test("interleave_bits usable from SQL and matches the Scala surface") {
    GraftExtensions.install(spark)
    val sql = spark.sql(
      "SELECT interleave_bits(array(x, y), 16) AS z FROM VALUES (1, 0), (0, 1), (3, 3) AS t(x, y)")
      .collect().map(_.getLong(0)).toSeq
    assert(sql == Seq(1L, 2L, 15L))
  }
}
