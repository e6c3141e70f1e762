package graft.util

/** Blob codec for one cuckoo seen-set shard — the LSM-style two-form state
  * that makes insert I/O O(wave) instead of O(seen set):
  *
  *  - [[ShardState.Delta]] — one wave's inserts for this shard as a SORTED
  *    hash array (8 B/url, keys retained, membership EXACT via binary
  *    search). Writing a delta needs no read of prior state at all.
  *  - [[ShardState.Base]] — the compacted history as a [[CuckooChain]]
  *    (~2.3 B/url, ~1.2e-4 FP per link, no false negatives).
  *
  * A shard accumulates deltas wave over wave; once its blob count reaches
  * the compaction threshold the deltas' KEYS (which a cuckoo filter alone
  * could never recover — fingerprints drop index bits) are folded into the
  * base chain and the deltas dropped. Probe cost per suspect is one chain
  * check + ≤threshold binary searches; FP stays at the base chain's rate
  * because deltas are exact.
  */
object ShardState {

  /** "GDL1" — distinguishes a delta blob from a chain blob
    * ([[CuckooChain.Magic]]); a pre-round-4 raw-filter blob matches neither
    * and fails with the chain's explicit incompatibility error.
    */
  val DeltaMagic = 0x47444C31

  sealed trait Blob {
    def contains(h: Long): Boolean
  }

  final case class Base(chain: CuckooChain) extends Blob {
    def contains(h: Long): Boolean = chain.contains(h)
  }

  final case class Delta(sorted: Array[Long]) extends Blob {
    def contains(h: Long): Boolean =
      java.util.Arrays.binarySearch(sorted, h) >= 0
  }

  /** One JVM byte-array caps a blob at ~2^31 bytes ⇒ ~268M keys. A shard
    * that large means the store is under-sharded (the engine's sizing rule:
    * shards ≥ frontier / perShardCapacity); fail with the remedy instead of
    * the Int-overflow negative-allocation crash (ADVICE r04).
    */
  private def requireBlobFits(n: Int): Unit = {
    val bytes = 8L + n.toLong * 8L // Long math: n*8 alone overflows past ~268M
    require(bytes <= Int.MaxValue - 16,
      s"seen-set shard blob would hold $n keys (${bytes / (1L << 20)} MiB) — " +
        "over the single-blob limit; raise cuckooShards so each shard's " +
        "compacted base stays under ~256M keys")
  }

  def serializeDelta(hashes: Array[Long]): Array[Byte] = {
    val sorted = hashes.clone()
    java.util.Arrays.sort(sorted)
    serializeDeltaPresorted(sorted)
  }

  /** Serialize an ALREADY-SORTED hash array (the k-way-merge compaction path
    * — no clone, no re-sort).
    */
  def serializeDeltaPresorted(sorted: Array[Long]): Array[Byte] = {
    requireBlobFits(sorted.length)
    val bb = java.nio.ByteBuffer.allocate(8 + sorted.length * 8)
    bb.putInt(DeltaMagic)
    bb.putInt(sorted.length)
    sorted.foreach(bb.putLong)
    bb.array()
  }

  /** K-way merge of SORTED long arrays into one sorted, duplicate-free
    * primitive array — the exact-base compaction merge (VERDICT r04 wrong
    * #2: the boxed ArrayBuffer++distinct version churned GC on big shards).
    * k is tiny (≤ compactThreshold + 1), so a linear min-scan per output
    * element beats a heap.
    */
  def mergeSortedDedup(arrays: Array[Array[Long]]): Array[Long] = {
    val k = arrays.length
    if (k == 0) return Array.emptyLongArray
    var total = 0L
    var a = 0
    while (a < k) { total += arrays(a).length; a += 1 }
    require(total <= Int.MaxValue - 16, s"merged shard would hold $total keys")
    val out = new Array[Long](total.toInt)
    val pos = new Array[Int](k)
    var n = 0
    var first = true
    var last = 0L
    while (true) {
      var minIdx = -1
      var minVal = 0L
      var i = 0
      while (i < k) {
        if (pos(i) < arrays(i).length) {
          val v = arrays(i)(pos(i))
          if (minIdx < 0 || v < minVal) { minIdx = i; minVal = v }
        }
        i += 1
      }
      if (minIdx < 0) {
        requireBlobFits(n)
        return java.util.Arrays.copyOf(out, n)
      }
      pos(minIdx) += 1
      if (first || minVal != last) { out(n) = minVal; n += 1; last = minVal; first = false }
    }
    throw new IllegalStateException("unreachable")
  }

  def deserialize(bytes: Array[Byte]): Blob = {
    val magic = java.nio.ByteBuffer.wrap(bytes, 0, 4).getInt
    if (magic == DeltaMagic) {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.getInt
      val n = bb.getInt
      val arr = new Array[Long](n)
      var i = 0
      while (i < n) { arr(i) = bb.getLong; i += 1 }
      Delta(arr)
    } else Base(CuckooChain.deserialize(bytes)) // chain magic or clean error
  }
}
