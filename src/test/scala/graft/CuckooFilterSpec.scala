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

  test("failed insert rolls back its evictions — filter bit-identical, no " +
       "stranded fingerprints (the chain-growth prerequisite)") {
    val f = CuckooFilter.create(16)
    var i = 0
    var sawFailure = false
    while (!sawFailure && i < 10000) {
      val k = graft.sources.PagesGen.mix(555L + i)
      val snap = f.buckets.clone()
      val cnt = f.count
      if (!f.insert(k)) {
        sawFailure = true
        assert(f.buckets.sameElements(snap), "failure mutated the filter")
        assert(f.count == cnt)
      }
      i += 1
    }
    assert(sawFailure, "a 16-capacity filter must eventually refuse an insert")
  }

  test("chain: grows past perShardCapacity with no false negatives (VERDICT r03 #4)") {
    import graft.util.CuckooChain
    val c = CuckooChain.create(16) // deliberately 100× under-sized
    val keys = (0 until 2000).map(i => graft.sources.PagesGen.mix(i * 101L))
    val growths = keys.map(c.insert).sum
    assert(growths > 0, "expected at least one growth event at 125× overflow")
    assert(c.length >= 2 && c.length <= 12,
      s"geometric growth should keep the chain short, got ${c.length}")
    keys.foreach(k => assert(c.contains(k), "false negative after growth"))
  }

  test("chain: serialize/deserialize round-trip preserves membership and shape") {
    import graft.util.CuckooChain
    val c = CuckooChain.create(64)
    val keys = (0 until 800).map(i => graft.sources.PagesGen.mix(7L + i * 37L))
    keys.foreach(c.insert)
    val d = CuckooChain.deserialize(c.serialize())
    assert(d.length == c.length && d.count == c.count)
    keys.foreach(k => assert(d.contains(k)))
  }

  test("chain: insert is idempotent across links") {
    import graft.util.CuckooChain
    val c = CuckooChain.create(8)
    val keys = (0 until 200).map(i => graft.sources.PagesGen.mix(i * 11L))
    keys.foreach(c.insert) // forces growth; early keys live in older links
    val before = c.count
    keys.foreach(k => assert(c.insert(k) == 0, "re-insert must not grow"))
    assert(c.count == before)
  }

  test("chain: pre-chain blob (raw filter bytes) is a clean error, not a misparse") {
    import graft.util.CuckooChain
    val legacy = CuckooFilter.create(1000)
    (0 until 500).foreach(i => legacy.insert(i.toLong))
    val e = intercept[IllegalStateException] {
      CuckooChain.deserialize(legacy.serialize())
    }
    assert(e.getMessage.contains("incompatible"))
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

  test("property: any inserted long is contained by a growing chain " +
       "(arbitrary keys, forced growth, duplicates)") {
    import graft.util.CuckooChain
    val prop = Prop.forAll(Gen.listOfN(800, Gen.long)) { keys =>
      val c = CuckooChain.create(32) // forces growth on every non-tiny sample
      keys.foreach(c.insert)
      keys.forall(c.contains)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
