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

  def serializeDelta(hashes: Array[Long]): Array[Byte] = {
    val sorted = hashes.clone()
    java.util.Arrays.sort(sorted)
    val bb = java.nio.ByteBuffer.allocate(8 + sorted.length * 8)
    bb.putInt(DeltaMagic)
    bb.putInt(sorted.length)
    sorted.foreach(bb.putLong)
    bb.array()
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
