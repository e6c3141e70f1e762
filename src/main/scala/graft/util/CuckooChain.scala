package graft.util

/** Growable chain of [[CuckooFilter]]s — the shard-blob state of the engine's
  * cuckoo seen-set tier.
  *
  * A plain cuckoo filter cannot grow in place: it stores 16-bit fingerprints,
  * not keys, so rehashing into a bigger table is impossible once the keys are
  * gone. Growth is instead CHAINED: inserts go to the newest filter; when its
  * kick budget exhausts, a fresh filter of ~2× the previous capacity is
  * appended (the shard blob is being rewritten by the insert cogroup anyway,
  * so growth costs nothing extra). Probes check every link. The
  * false-positive rate is ~1.2e-4 × chain length, and geometric growth keeps
  * chains O(log overflow) short — a shard under-sized by 1000× still tops out
  * around 10 links. Zero false negatives ever (the property the dedup gate
  * relies on: a "not seen" verdict is always safe to fetch).
  *
  * This replaces the round-3 behavior where an under-sized shard was a
  * mid-wave executor exception ("cuckoo shard N saturated"), mirroring the
  * bloom tier's graceful saturate-and-bypass policy.
  */
final class CuckooChain private (private var filters: List[CuckooFilter]) {

  /** Newest filter first — the only one inserts target. */
  def contains(h: Long): Boolean = filters.exists(_.contains(h))

  def length: Int = filters.size

  def count: Long = filters.map(_.count).sum

  /** Insert (idempotent across the chain). Returns the number of growth
    * events this call caused — 0 on the sized path; callers log non-zero
    * totals so under-provisioned `perShardCapacity` is visible, not silent.
    */
  def insert(h: Long): Int = {
    if (contains(h)) return 0
    var grown = 0
    while (!filters.head.insert(h)) {
      // 2× the saturated filter's bucket count: create() sizes buckets as
      // next-pow2(ceil(expected / 3.8)), so expected = 4·buckets lands just
      // past the current size and rounds to exactly double. (ADVICE r04:
      // 8·buckets overshot to 4× per link, doubling the memory story.)
      filters = CuckooFilter.create(filters.head.buckets.length.toLong * 4L) :: filters
      grown += 1
    }
    grown
  }

  def serialize(): Array[Byte] = {
    val blobs = filters.map(_.serialize())
    val bb = java.nio.ByteBuffer.allocate(8 + blobs.map(4 + _.length).sum)
    bb.putInt(CuckooChain.Magic)
    bb.putInt(blobs.size)
    blobs.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }
}

object CuckooChain {
  /** Blob magic ("GCC1"): guards against misreading a pre-chain (round-3)
    * raw-filter blob as a chain — those start with a power-of-two bucket
    * count, never this value.
    */
  val Magic = 0x47434331

  def create(perShardCapacity: Long): CuckooChain =
    new CuckooChain(List(CuckooFilter.create(perShardCapacity)))

  def deserialize(bytes: Array[Byte]): CuckooChain = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    if (bb.getInt != Magic) throw new IllegalStateException(
      "incompatible cuckoo shard blob (pre-chain layout or foreign bytes) — " +
        "this seen_cuckoo store was written by an older engine version; " +
        "start a fresh crawl store")
    val n = bb.getInt
    val fs = List.fill(n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      CuckooFilter.deserialize(arr)
    }
    new CuckooChain(fs)
  }
}
