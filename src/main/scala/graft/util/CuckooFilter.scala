package graft.util

/** Cuckoo filter over 64-bit url hashes (SURVEY §2.9, north rule's
  * 10^10-scale URL-seen set).
  *
  * Layout: `nBuckets` buckets × 4 slots × 16-bit fingerprints, one bucket per
  * Long. ~2.3 bytes/key at 95% load; false-positive rate ≈ 2·4/2^16 ≈ 1.2e-4;
  * zero false negatives (the property the dedup gate relies on: a "not seen"
  * verdict is always safe to fetch).
  *
  * The engine partitions the seen set into P shards keyed by
  * `pmod(urlHash, P)`; each shard owns one filter sized for its share, so a
  * 10^10 frontier is ~23 GB across the cluster but only ~2.3 GB/100 shards
  * per executor probe — never broadcast, never collected.
  */
final class CuckooFilter private (val buckets: Array[Long], var count: Long) {

  private def nBuckets: Int = buckets.length
  private def mask: Int = nBuckets - 1

  @inline private def fingerprint(h: Long): Int = {
    val f = ((h >>> 48) ^ (h >>> 32)).toInt & 0xffff
    if (f == 0) 1 else f
  }
  @inline private def index1(h: Long): Int = (h & mask).toInt
  @inline private def altIndex(i: Int, fp: Int): Int =
    (i ^ (CuckooFilter.fpHash(fp) & mask)) & mask

  @inline private def slot(b: Long, s: Int): Int =
    ((b >>> (s * 16)) & 0xffff).toInt
  @inline private def setSlot(b: Long, s: Int, fp: Int): Long =
    (b & ~(0xffffL << (s * 16))) | (fp.toLong << (s * 16))

  private def bucketContains(i: Int, fp: Int): Boolean = {
    val b = buckets(i)
    slot(b, 0) == fp || slot(b, 1) == fp || slot(b, 2) == fp || slot(b, 3) == fp
  }

  private def tryInsertAt(i: Int, fp: Int): Boolean = {
    val b = buckets(i)
    var s = 0
    while (s < 4) {
      if (slot(b, s) == 0) { buckets(i) = setSlot(b, s, fp); return true }
      s += 1
    }
    false
  }

  def contains(h: Long): Boolean = {
    val fp = fingerprint(h)
    val i1 = index1(h)
    bucketContains(i1, fp) || bucketContains(altIndex(i1, fp), fp)
  }

  /** Insert; returns false only if the filter is saturated (kick budget
    * exhausted) — callers size for 95% load so this is a hard error.
    */
  def insert(h: Long): Boolean = {
    val fp0 = fingerprint(h)
    val i1 = index1(h)
    if (bucketContains(i1, fp0) || bucketContains(altIndex(i1, fp0), fp0)) return true
    insertFp(i1, fp0)
  }

  /** Raw fingerprint insert at a known index — used for same-geometry shard
    * merges (fingerprint/index pair is location-stable across equal sizes).
    *
    * FAILURE IS NON-DESTRUCTIVE: the kick loop journals every eviction and
    * rolls them back before returning false, so the filter is bit-identical
    * to its pre-call state. Without the rollback a failed insert strands the
    * last evicted fingerprint — a FALSE NEGATIVE for whichever key owned it,
    * which [[CuckooChain]]'s saturate-and-grow path would otherwise turn
    * into a silently re-fetchable "never seen" url.
    */
  def insertFp(i0: Int, fp0: Int): Boolean = {
    var i = i0
    var fp = fp0
    if (tryInsertAt(i, fp) || tryInsertAt(altIndex(i, fp), fp)) { count += 1; return true }
    // kick loop, journaled for rollback
    val MaxKicks = 500
    val jIdx = new Array[Int](MaxKicks)
    val jSlot = new Array[Int](MaxKicks)
    val jVictim = new Array[Int](MaxKicks)
    var n = 0
    var seed = (i * 0x9e3779b9) ^ fp
    while (n < MaxKicks) {
      val s = (seed >>> 7) & 3
      seed = seed * 0x5deece66dL.toInt + 11
      val b = buckets(i)
      val victim = slot(b, s)
      jIdx(n) = i; jSlot(n) = s; jVictim(n) = victim
      buckets(i) = setSlot(b, s, fp)
      fp = victim
      i = altIndex(i, fp)
      n += 1
      if (tryInsertAt(i, fp)) { count += 1; return true }
    }
    // saturated: undo every eviction in reverse (restore the victim each
    // step displaced), leaving the filter exactly as found
    var k = n - 1
    while (k >= 0) {
      buckets(jIdx(k)) = setSlot(buckets(jIdx(k)), jSlot(k), jVictim(k))
      k -= 1
    }
    false
  }

  /** Merge another filter with identical geometry. */
  def mergeFrom(other: CuckooFilter): Boolean = {
    require(other.nBuckets == nBuckets, "geometry mismatch")
    var i = 0
    var ok = true
    while (i < other.buckets.length) {
      val b = other.buckets(i)
      var s = 0
      while (s < 4) {
        val fp = slot(b, s)
        if (fp != 0 && !bucketContains(i, fp) && !bucketContains(altIndex(i, fp), fp))
          ok &= insertFp(i, fp)
        s += 1
      }
      i += 1
    }
    ok
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + buckets.length * 8)
    bb.putInt(buckets.length)
    bb.putLong(count)
    buckets.foreach(bb.putLong)
    bb.array()
  }
}

object CuckooFilter {
  @inline private[util] def fpHash(fp: Int): Int = {
    var x = fp * 0x45d9f3b
    x = (x ^ (x >>> 16)) * 0x45d9f3b
    x ^ (x >>> 16)
  }

  /** Sized for `expected` keys at ≤95% load, power-of-two buckets. */
  def create(expected: Long): CuckooFilter = {
    val needed = math.max(4L, math.ceil(expected / (4 * 0.95)).toLong)
    var n = 4
    while (n < needed && n < (1 << 28)) n <<= 1
    new CuckooFilter(new Array[Long](n), 0L)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val count = bb.getLong
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { arr(i) = bb.getLong; i += 1 }
    new CuckooFilter(arr, count)
  }
}
