package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.plans.SnapshotTable
import graft.util.CuckooChain

/** URL-seen set (SURVEY §2.3 J4, §2.9; north rule's bloom/cuckoo pipeline).
  *
  * Three tiers, composable per wave over candidate urls:
  *
  *  1. **Broadcast Bloom pre-filter** — maintained incrementally (union of
  *     per-wave inserts, `BloomFilter.mergeInPlace`), persisted per wave for
  *     resume. `mightContain == false` proves NOT-seen: those candidates skip
  *     the confirm shuffle entirely. At 1% fpp only ~1% of genuinely-new urls
  *     pay the confirm cost.
  *  2. **Exact confirm** — left-anti join of the (already bloom-thinned)
  *     suspects against the seen log on `url_hash`. Exact semantics: the
  *     final seen set equals the reference run's (dedup-on-request,
  *     first-wins). This is the default confirm tier.
  *  3. **Cuckoo confirm** — P partitioned cuckoo shards
  *     (`pmod(url_hash, P)`), each merged per wave via a cogroup (shard blob
  *     meets its wave inserts on the same reducer — never broadcast, never
  *     driver-collected). O(1) memory probes instead of scanning the seen
  *     log; ~1.2e-4 false-positive rate per chain link (a false positive
  *     skips a fetch — see CrawlEngine.Config.strategy for the loss bound),
  *     no false negatives. The explicit opt-in tier for the 10^10-scale
  *     path, and Bench's primary measured tier.
  *
  * Cuckoo state I/O is O(touched shards), not O(seen set), per wave: inserts
  * commit only the shards that received hashes ([[SnapshotTable.commitSharded]]
  * carries untouched shards' files forward at the manifest level), and once
  * the state is big enough to matter both probe and insert prune their blob
  * read to the shards the wave can touch (an extra tiny distinct-shards job,
  * paid only past `probePruneBytes` — below it, reading everything is cheaper
  * than planning the pruned scan). A shard that outgrows `perShardCapacity`
  * grows gracefully by chaining a larger filter ([[graft.util.CuckooChain]])
  * instead of the round-3 mid-wave executor exception.
  *
  * Dedup analogs in the reference: Scrapy's request dupefilter (implicit),
  * diagram seen-set `/root/reference/core/main.py:344-351`, theory number
  * seen-set `core/main.py:409-415`.
  */
object SeenSet {

  sealed trait Strategy
  case object ExactAnti extends Strategy          // plain left-anti (baseline)
  case object BloomExact extends Strategy         // bloom pre-filter + exact confirm
  case object BloomCuckoo extends Strategy        // bloom pre-filter + cuckoo confirm

  final case class ShardBlob(shard: Int, blob: Array[Byte])

  /** Deterministic url hash used across the engine (no sign issues in pmod). */
  def urlHashCol(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    xxhash64(url)

  // --- bloom tier -----------------------------------------------------------

  /** Sizing policy (VERDICT r02): `expected` must be ≥ the projected insert
    * count — past it the FP rate climbs toward 1 and the pre-filter
    * degenerates into "everything is a suspect". The filter therefore TRACKS
    * its insert count: once `inserted > expected` it reports [[saturated]],
    * further merges are skipped (the bits are already useless), and the
    * engine bypasses the pre-filter entirely — every candidate goes straight
    * to the (exact/cuckoo) confirm tier, which stays correct at any scale
    * (CrawlEngineSpec proves digest equality across the boundary). Both
    * counters persist with the bits, so a resumed run keeps the policy.
    */
  final class Bloom(var expected: Long, fpp: Double) extends Serializable {
    /** null until the first wave merges — the filter is ADOPTED from the
      * first distributed (`stat.bloomFilter`) build rather than pre-created:
      * Spark 4's driver-side `BloomFilter.create` and the aggregate-built
      * filter can disagree on hash-function count for non-power-of-two
      * `expected` (`BloomFilterImplV2.checkCompatibilityForMerge` throws),
      * so the engine only ever merges stat-built filters of identical
      * (expected, fpp) into each other.
      */
    var filter: BloomFilter = null
    var inserted: Long = 0L
    def saturated: Boolean = inserted > expected
    def isUnbuilt: Boolean = filter == null
    /** Merge a distributed-built wave filter of `n` inserts (must share
      * (expected, fpp) so the bit arrays are compatible). Skipped once
      * saturated — the engine no longer probes a saturated filter, so
      * merging would be pure cost; the count still advances so saturation
      * is monotone across resume.
      */
    def merge(other: BloomFilter, n: Long): Unit = {
      if (!saturated) {
        if (filter == null) filter = other else filter.mergeInPlace(other)
      }
      inserted += n
    }
    def save(spark: SparkSession, dir: String, wave: Int): Unit = {
      val p = new Path(dir, f"bloom_v$wave%05d.bin")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      try {
        out.writeLong(Bloom.Magic); out.writeInt(Bloom.Version)
        out.writeLong(inserted); out.writeLong(expected)
        out.writeBoolean(filter != null)
        if (filter != null) filter.writeTo(out)
      } finally out.close()
    }
  }

  object Bloom {
    /** "GRAFTBLM" — disambiguates the header from both legacy layouts
      * (ADVICE r03): the round-3 header began with a raw `inserted` count
      * and the round-2 file was a bare Spark BloomFilter stream; neither can
      * start with this value, so a non-magic first word is a reliable
      * incompatibility signal instead of a silent misparse.
      */
    val Magic: Long = 0x4752414654424C4DL
    val Version: Int = 1

    /** Load the newest persisted filter below `maxWaveExclusive` (replay
      * safety: a filter saved by a crashed attempt of the wave being replayed
      * is skipped — it would only add false positives, but the pre-crash
      * state is the exact one).
      */
    def load(spark: SparkSession, dir: String,
             maxWaveExclusive: Int = Int.MaxValue): Option[(Int, Bloom)] = {
      val d = new Path(dir)
      val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(d)) return None
      val vs = fs.listStatus(d).map(_.getPath.getName)
        .filter(n => n.startsWith("bloom_v") && n.endsWith(".bin"))
        .map(_.stripPrefix("bloom_v").stripSuffix(".bin").toInt)
        .filter(_ < maxWaveExclusive)
      if (vs.isEmpty) None
      else {
        val v = vs.max
        val p = new Path(d, f"bloom_v$v%05d.bin")
        val in = fs.open(p)
        val b = new Bloom(1, 0.5)
        try {
          if (in.readLong() != Magic) throw new IllegalStateException(
            s"incompatible bloom snapshot $p (pre-v1 layout or foreign " +
              "bytes) — the pre-filter's bits are load-bearing for dedup " +
              "(a lost filter re-fetches seen urls); resume requires a " +
              "compatible store, start a fresh crawl store")
          val ver = in.readInt()
          if (ver != Version) throw new IllegalStateException(
            s"bloom snapshot $p has version $ver, this engine reads $Version")
          b.inserted = in.readLong()
          b.expected = in.readLong()
          if (in.readBoolean()) b.filter = BloomFilter.readFrom(in)
        } finally in.close()
        Some((v, b))
      }
    }
  }

  // --- probe: candidates → fresh (not seen) ----------------------------------
  // `candidates` must carry `url_hash: Long`. Returns candidates minus seen.

  /** Tier 2/baseline: exact anti-join against the seen log. */
  def exactFresh(candidates: DataFrame, seenLog: DataFrame): DataFrame =
    candidates.join(seenLog.select(col("url_hash").as("seen_hash")),
      candidates("url_hash") === col("seen_hash"), "left_anti")

  /** Bloom split: (definitely-new, suspects). No shuffle — a broadcast-udf
    * filter that prunes the confirm join's build side. An unbuilt filter
    * (no wave merged yet) represents the empty set: everything is
    * definitely-new, no broadcast at all.
    */
  def bloomSplit(spark: SparkSession, candidates: DataFrame, bloom: Bloom)
      : (DataFrame, DataFrame) = {
    if (bloom.isUnbuilt) return (candidates, candidates.limit(0))
    val bc = spark.sparkContext.broadcast(bloom.filter)
    val mightContain = udf((h: Long) => bc.value.mightContainLong(h))
    (candidates.filter(!mightContain(col("url_hash"))),
      candidates.filter(mightContain(col("url_hash"))))
  }

  /** Tier 3: cuckoo-shard confirm via cogroup (shard-aligned, distributed). */
  def cuckooFresh(spark: SparkSession, candidates: DataFrame,
                  shardTable: SnapshotTable, shards: Int,
                  asOfWaveExclusive: Int = Int.MaxValue): DataFrame =
    cuckooFlagged(spark, candidates, shardTable, shards, asOfWaveExclusive)
      .filter(!col("is_seen")).drop("is_seen")

  /** Shard blobs read by the last probe/insert on this JVM — test and
    * diagnostic instrumentation for the pruned-read path (the per-wave
    * figure the 10^10 I/O story rests on); -1 until a cuckoo op runs.
    */
  @volatile var lastBlobDirsRead: Int = -1

  /** I/O threshold below which blob reads skip shard pruning: pruning costs
    * an extra tiny distinct-shards job per wave, worth it only once the
    * state's bytes dwarf that job (at 10^10 urls the state is ~25 GB and a
    * bloom-thinned wave touches few shards; at bench scale it is ~10 MB and
    * every wave touches all shards).
    */
  val DefaultPruneBytes: Long = 256L << 20

  /** Shard state strictly before `waveExclusive` (on a mid-wave crash replay
    * this skips the crashed attempt's insert, so the replay flags exactly
    * what the original attempt flagged), restricted to the shards in
    * `wanted` when the state is big enough that the pruned read pays for its
    * planning job. Pruning is exact: a shard outside `wanted` has no
    * candidate to flag and no insert to merge.
    */
  private def blobsBefore(spark: SparkSession, shardTable: SnapshotTable,
                          waveExclusive: Int, wanted: () => Set[Int],
                          pruneBytes: Long): Dataset[ShardBlob] = {
    import spark.implicits._
    val v = shardTable.latestVersionBefore(waveExclusive)
    if (shardTable.isEmptyAt(v)) {
      lastBlobDirsRead = 0
      spark.emptyDataset[ShardBlob]
    } else {
      val dirs =
        if (shardTable.versionBytes(v.get) < pruneBytes) shardTable.versionDirs(v.get)
        else shardTable.versionDirs(v.get, Some(wanted()))
      lastBlobDirsRead = dirs.size
      if (dirs.isEmpty) spark.emptyDataset[ShardBlob]
      else spark.read.parquet(dirs: _*).as[ShardBlob]
    }
  }

  /** Tier 3, flag form: every candidate row returned with `is_seen`. */
  def cuckooFlagged(spark: SparkSession, candidates: DataFrame,
                    shardTable: SnapshotTable, shards: Int,
                    asOfWaveExclusive: Int = Int.MaxValue,
                    pruneBytes: Long = DefaultPruneBytes): DataFrame = {
    import spark.implicits._
    val cands = candidates.withColumn("shard",
      pmod(col("url_hash"), lit(shards)).cast("int"))
    val withFlag = cands.withColumn("is_seen", lit(false))
    val enc = org.apache.spark.sql.Encoders.row(withFlag.schema)
    val shardIdx = withFlag.schema.fieldIndex("shard")
    val hashIdx = withFlag.schema.fieldIndex("url_hash")
    val flagIdx = withFlag.schema.fieldIndex("is_seen")
    val blobs = blobsBefore(spark, shardTable, asOfWaveExclusive,
      () => cands.select("shard").distinct().collect().map(_.getInt(0)).toSet,
      pruneBytes)
    withFlag
      .groupByKey(_.getInt(shardIdx))
      .cogroup(blobs.groupByKey(_.shard)) { (_, rows, blobIt) =>
        blobIt.toSeq.headOption.map(b => CuckooChain.deserialize(b.blob)) match {
          case None => rows
          case Some(f) => rows.map { r =>
            val vals = r.toSeq.toArray
            vals(flagIdx) = f.contains(r.getLong(hashIdx))
            org.apache.spark.sql.Row.fromSeq(vals.toSeq)
          }
        }
      }(enc)
      .drop("shard")
  }

  /** Merge this wave's inserts into the cuckoo shard table (cogroup: each
    * shard blob meets its inserts on one reducer). Shards with no insert are
    * neither read (past the prune threshold) nor written: the commit's
    * manifest carries their existing files forward untouched
    * ([[SnapshotTable.commitSharded]]), so per-wave state I/O is O(touched),
    * not O(seen set). A shard outgrowing `perShardCapacity` chains a larger
    * filter (logged) instead of failing the wave.
    */
  def cuckooInsert(spark: SparkSession, newHashes: Dataset[Long],
                   shardTable: SnapshotTable, shards: Int, perShardCapacity: Long,
                   wave: Int, pruneBytes: Long = DefaultPruneBytes): Unit = {
    import spark.implicits._
    val byShard = newHashes.map(h => (((h % shards) + shards) % shards, h))
      .toDF("shard", "h").as[(Long, Long)]
    // base = state strictly before this wave: a replayed insert after a
    // mid-wave crash merges into the same pre-crash base (idempotent commit)
    // instead of double-inserting into the crashed attempt's blobs
    val blobs = blobsBefore(spark, shardTable, wave,
      () => byShard.select("shard").distinct().collect().map(_.getLong(0).toInt).toSet,
      pruneBytes)
    val merged = byShard.groupByKey(_._1.toInt)
      .cogroup(blobs.groupByKey(_.shard)) { (shard, ins, blobIt) =>
        if (!ins.hasNext) Iterator.empty // untouched: carried at manifest level
        else {
          val f = blobIt.toSeq.headOption
            .map(b => CuckooChain.deserialize(b.blob))
            .getOrElse(CuckooChain.create(perShardCapacity))
          var grown = 0
          ins.foreach { case (_, h) => grown += f.insert(h) }
          if (grown > 0) System.err.println(
            s"[graft] WARN cuckoo shard $shard grew $grown time(s) to chain " +
              s"length ${f.length} (count=${f.count}) — perShardCapacity " +
              s"$perShardCapacity is under-sized for this frontier; " +
              "correctness unaffected, probe FP rate scales with chain length")
          Iterator.single(ShardBlob(shard, f.serialize()))
        }
      }
    shardTable.commitSharded(merged.toDF(), "shard", wave)
  }

  /** Order-insensitive digest of a url set (SURVEY A9 / FIXTURES §4):
    * (count, bit_xor(xxhash64(url))) — equality proof vs the reference run.
    * XOR instead of sum: overflow-free under ANSI mode, commutative, and the
    * set is duplicate-free so pair-cancellation can't occur.
    */
  def digest(df: DataFrame, urlCol: String = "url"): (Long, Long) = {
    val r = df.select(xxhash64(col(urlCol)).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
