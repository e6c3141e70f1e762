package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis

/** Compiled-vs-interpreted parity for the text-analysis hot paths. */
class TextAnalysisSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("compiled fingerprint is bit-identical to the aggregate/HOF formulation") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox", "a", "", "double  space", " leading",
      "trailing ", "unicode ü ß 漢字 mix", "the the the the"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val both = docs.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.fingerprintHof(col("text")).as("fp_hof"))
    assert(both.filter(col("fp") =!= col("fp_hof")).count() == 0)
    // and on real corpus rows
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.fingerprintHof(col("text")).as("fp_hof"))
    assert(real.filter(col("fp") =!= col("fp_hof")).count() == 0)
    // null parity (ADVICE r02): both formulations yield NULL on null text
    val withNull = Seq((0L, Option("x y")), (1L, None))
      .toDF("doc_id", "text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.fingerprintHof(col("text")).as("fp_hof"))
      .collect()
    assert(withNull.forall(r => r.isNullAt(0) == r.isNullAt(1)))
    assert(withNull.exists(_.isNullAt(0)), "null text must map to null fingerprint")
  }

  test("langIdFeatures guess is the (score, lang)-max — ties break to the later lang") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x the x and x"),            // en wins
      (2L, "x der x und x le x et x")   // de and fr tie at 2 -> 'fr' (max string)
    ).toDF("doc_id", "text")
    val g = TextAnalysis.langIdFeatures(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_guess")).toMap
    assert(g(1L) == "en")
    assert(g(2L) == "fr")
  }
}
