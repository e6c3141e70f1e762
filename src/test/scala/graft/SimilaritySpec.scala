package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Semantic fixtures for the near-dup/ANN suite: a constructed near-identical
  * pair MUST be found (round 1's m3 matched its oracle on 0 rows — the
  * synthetic embeddings never reach production thresholds, so nothing
  * exercised the match path), and the SimHash 4-band recall fix is proven on
  * a pair whose differing bits land in the top 16 (the round-1 single-bucket
  * blind spot).
  */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  // deterministic pseudo-random unit-ish vectors
  private def vec(seed: Int, dims: Int = 64): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dims)((r.nextDouble() * 2 - 1).toFloat)
  }

  private def vecsDf = {
    import spark.implicits._
    val base = (0 until 10).map(i => (i.toLong, vec(i), s"lab${i % 3}"))
    // 100 = vector 0 plus tiny noise: cosine(v0, v100) ≈ 1
    val dup = (100L, vec(0).zipWithIndex.map { case (x, i) =>
      x + (if (i % 7 == 0) 1e-4f else -1e-4f) }, "lab0")
    (base :+ dup).toDF("vec_id", "embedding", "label")
  }

  test("cosineNearDup finds a constructed near-identical pair at threshold 0.95") {
    val pairs = Similarity.cosineNearDup(vecsDf, 0.95).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("id_a") == 0L && pairs.head.getAs[Long]("id_b") == 100L)
    assert(pairs.head.getAs[Double]("cos") >= 0.99)
  }

  test("cosineNearDupLsh (label-free scale path) finds the same pair") {
    val pairs = Similarity.cosineNearDupLsh(vecsDf, 0.95).collect()
    assert(pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      .contains((0L, 100L)))
  }

  test("annTopK ranks the near-dup first, agreeing with brute force") {
    val queries = vecsDf.filter(col("vec_id") === 0L)
    val corpus = vecsDf.filter(col("vec_id") > 0L)
    val bf = Similarity.bruteForceTopK(queries, corpus, 1).collect().head
    assert(bf.getAs[Long]("neighbor_id") == 100L)
    val ann = Similarity.annTopK(queries, corpus, 1).collect().head
    assert(ann.getAs[Long]("neighbor_id") == 100L)
    assert(ann.getAs[Double]("cos") == bf.getAs[Double]("cos"))
  }

  test("ivfTopK ranks the near-dup first (coarse-quantizer scale path)") {
    val queries = vecsDf.filter(col("vec_id") === 0L)
    val corpus = vecsDf.filter(col("vec_id") > 0L)
    // the near-identical vector lands in (or near) the query's cell; with
    // nProbe covering the cell neighborhood, rank 1 must match brute force
    val ivf = Similarity.ivfTopK(queries, corpus, 1, nCells = 8, nProbe = 4)
      .collect().head
    assert(ivf.getAs[Long]("neighbor_id") == 100L)
    assert(ivf.getAs[Double]("cos") >= 0.99)
  }

  test("lshBucket is deterministic across evaluations") {
    val b1 = vecsDf.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 0, 8, 64).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = vecsDf.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 0, 8, 64).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
  }

  test("ngramJaccard finds near-identical docs straddling a 64-char length band") {
    import spark.implicits._
    // lengths 59 and 64: ⌊len/64⌋ = 0 vs 1 (round 1's single band missed
    // this pair); the +32-offset band is 1 for both
    val docA = (0 until 15).map(i => f"a$i%02d").mkString(" ") // 59 chars
    val docB = docA + " zzzz" // 64 chars
    assert(docA.length == 59 && docB.length == 64)
    val df = Seq((1L, docA, "s"), (2L, docB, "s"), (3L, "unrelated text", "s"))
      .toDF("doc_id", "text", "source")
    val pairs = Dedup.ngramJaccard(df, threshold = 0.6).collect()
    assert(pairs.length == 1, s"expected exactly the straddling pair, got ${pairs.toSeq}")
    assert(pairs.head.getAs[Long]("id_a") == 1L && pairs.head.getAs[Long]("id_b") == 2L)
  }

  // --- SimHash 4-band recall -------------------------------------------------

  private def simCorpus = {
    import spark.implicits._
    val r = new scala.util.Random(7)
    val baseTokens = Array.fill(60)(s"tok${r.nextInt(5000)}")
    val docs = (0L, baseTokens.mkString(" ")) +:
      (1 to 80).map { i =>
        val t = baseTokens.clone()
        t((i * 3) % t.length) = s"swap$i"
        (i.toLong, t.mkString(" "))
      }
    docs.toDF("doc_id", "text")
  }

  test("simhashPairs: exact precision, exact recall for hamming<=3, and the " +
       "top-16-bit blind spot of a single-bucket scheme is closed") {
    val df = simCorpus
    val sigs = Dedup.simhash(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    val ids = sigs.keys.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      h = java.lang.Long.bitCount(sigs(i) ^ sigs(j)) if h <= 6
    } yield (i, j) -> h).toMap

    val found = Dedup.simhashPairs(df, maxHamming = 6).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Number]("hamming").intValue())
      .toMap

    // precision: everything returned is a true hamming<=6 pair
    found.foreach { case (pair, h) =>
      assert(brute.get(pair).contains(h), s"false pair $pair") }
    // pigeonhole recall: every hamming<=3 pair must be found
    brute.filter(_._2 <= 3).keys.foreach { p =>
      assert(found.contains(p), s"missed guaranteed pair $p") }
    // the round-1 blind spot: pairs whose differing bits include the top 16
    // (single top-band bucketing can never emit these)
    val topBitPairs = found.keys.filter { case (a, b) =>
      ((sigs(a) ^ sigs(b)) >>> 48) != 0L }
    assert(topBitPairs.nonEmpty,
      "corpus produced no found pair differing in the top 16 bits — " +
        "strengthen the fixture")
  }
}
