package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.util.CuckooFilter

/** SURVEY §5.2 item 4: cuckoo no-false-negatives, serialization round-trip,
  * merge, insert idempotence. (scalacheck used directly — scalatestplus
  * bridge is not in the offline cache.)
  */
class CuckooFilterSpec extends AnyFunSuite {

  test("no false negatives at 90% load") {
    val n = 10000
    val f = CuckooFilter.create(n)
    val keys = (0 until n).map(i => graft.sources.PagesGen.mix(i.toLong * 7919L))
    keys.foreach(k => assert(f.insert(k), s"insert failed at load"))
    keys.foreach(k => assert(f.contains(k), "false negative"))
  }

  test("false positive rate is small") {
    val n = 50000
    val f = CuckooFilter.create(n)
    (0 until n).foreach(i => f.insert(graft.sources.PagesGen.mix(i.toLong)))
    val probes = 100000
    val fps = (0 until probes).count(i =>
      f.contains(graft.sources.PagesGen.mix(1000000L + i)))
    assert(fps.toDouble / probes < 0.01, s"fp rate ${fps.toDouble / probes}")
  }

  test("insert is idempotent (insert∘insert = insert)") {
    val f = CuckooFilter.create(1000)
    val k = 0xdeadbeefL
    assert(f.insert(k))
    val before = f.count
    assert(f.insert(k))
    assert(f.count == before)
  }

  test("serialize/deserialize round-trip") {
    val f = CuckooFilter.create(5000)
    val keys = (0 until 4000).map(i => graft.sources.PagesGen.mix(i * 31L))
    keys.foreach(f.insert)
    val g = CuckooFilter.deserialize(f.serialize())
    keys.foreach(k => assert(g.contains(k)))
    assert(g.count == f.count)
  }

  test("mergeFrom preserves membership of both sides") {
    val a = CuckooFilter.create(8000)
    val b = CuckooFilter.create(8000)
    val ka = (0 until 3000).map(i => graft.sources.PagesGen.mix(i * 13L))
    val kb = (0 until 3000).map(i => graft.sources.PagesGen.mix(900000L + i * 17L))
    ka.foreach(a.insert)
    kb.foreach(b.insert)
    assert(a.mergeFrom(b))
    (ka ++ kb).foreach(k => assert(a.contains(k)))
  }

  test("property: any inserted long is contained") {
    val prop = Prop.forAll(Gen.listOfN(500, Gen.long)) { keys =>
      val f = CuckooFilter.create(2000)
      keys.foreach(f.insert)
      keys.forall(f.contains)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }
}
