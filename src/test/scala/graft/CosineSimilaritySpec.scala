package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CosineSimilarity
import graft.operators.Similarity

/** Native codegen expression vs the interpreted HOF formulation: value
  * equality on real embeddings, null/zero handling, SQL registration,
  * codegen participation.
  */
class CosineSimilaritySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("matches the aggregate/zip_with formulation on real embeddings") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
    val l = e.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val r = e.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val pairs = l.crossJoin(r).filter(col("ida") < col("idb"))
    val diff = pairs.select(
      abs(Similarity.cosine(col("va"), col("vb")) -
        Similarity.cosineHof(col("va"), col("vb"))).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(diff == 0.0, s"native vs HOF max diff $diff") // identical fold order
  }

  test("null propagation and zero-norm guard") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b")).as("c")).collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).getDouble(0) == 0.0) // zero-norm guard
    val withNull = df.select(Similarity.cosine(lit(null).cast("array<float>"), col("b")).as("c"))
    assert(withNull.collect().forall(_.isNullAt(0)))
  }

  test("SQL registration: cosine_similarity(a, b)") {
    CosineSimilarity.register(spark)
    spark.read.parquet(s"$sf/embeddings.parquet").limit(5)
      .createOrReplaceTempView("emb_cs")
    val r = spark.sql(
      """SELECT a.vec_id, cosine_similarity(a.embedding, b.embedding) AS c
        |FROM emb_cs a JOIN emb_cs b ON a.vec_id < b.vec_id""".stripMargin)
    assert(r.collect().forall(row => math.abs(row.getDouble(1)) <= 1.0000001))
  }

  test("participates in whole-stage codegen (no fallback)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").limit(20)
    val df = e.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen stage:\n$plan")
    assert(df.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }
}
