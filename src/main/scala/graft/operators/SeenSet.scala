package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.plans.SnapshotTable
import graft.util.{CuckooChain, ShardState}

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
  * Cuckoo state I/O is O(wave) per wave, not O(seen set) — LSM-style:
  * inserts write each touched shard's hashes as an EXACT sorted delta blob
  * (no read of prior state; uniform hashing touches every shard each wave,
  * so "rewrite only touched shards" alone would still rewrite everything),
  * and a shard compacts its deltas' keys into its base [[graft.util.CuckooChain]]
  * once it holds `compactThreshold` blobs — amortized O(seen/threshold)
  * read+write per wave, manifest-level file reuse for the rest
  * ([[SnapshotTable.commitSharded]]). Probes prune their blob read to the
  * suspect shards once state bytes pass `pruneBytes` (an extra tiny
  * distinct-shards job — below the threshold, reading everything is cheaper
  * than planning the pruned scan); deltas are exact, so probe FP stays at
  * the base chain's rate. A base that outgrows `perShardCapacity` grows
  * gracefully by chaining a larger filter instead of the round-3 mid-wave
  * executor exception.
  *
  * Dedup analogs in the reference: Scrapy's request dupefilter (implicit),
  * diagram seen-set `/root/reference/core/main.py:344-351`, theory number
  * seen-set `core/main.py:409-415`.
  */
object SeenSet {

  sealed trait Strategy
  case object ExactAnti extends Strategy          // plain left-anti (baseline)
  case object BloomExact extends Strategy         // bloom pre-filter + full-log exact confirm
  case object BloomShardExact extends Strategy    // bloom + LSM shard confirm, EXACT base (default)
  case object BloomCuckoo extends Strategy        // bloom + LSM shard confirm, cuckoo base (compressed)

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

  /** Shard blobs read by the last probe/insert PLANNED on this JVM — test
    * and diagnostic instrumentation for the pruned-read path (the per-wave
    * figure the 10^10 I/O story rests on); -1 until a cuckoo op runs. The
    * count is computed DRIVER-side at plan time (the dir list is driver
    * metadata), so it is correct on a real cluster too; it is a static only
    * in that concurrent crawls on one driver JVM overwrite each other.
    * The cluster-portable channel is the insert commit's `blobs_read`
    * manifest metadata ([[cuckooInsert]]) — queryable from the store itself
    * (VERDICT r04 #7).
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
                          pruneBytes: Long): (Dataset[ShardBlob], Int) = {
    import spark.implicits._
    val v = shardTable.latestVersionBefore(waveExclusive)
    val r: (Dataset[ShardBlob], Int) =
      if (shardTable.isEmptyAt(v)) (spark.emptyDataset[ShardBlob], 0)
      else {
        val dirs =
          if (shardTable.versionBytes(v.get) < pruneBytes) shardTable.versionDirs(v.get)
          else shardTable.versionDirs(v.get, Some(wanted()))
        if (dirs.isEmpty) (spark.emptyDataset[ShardBlob], 0)
        else (spark.read.parquet(dirs: _*).as[ShardBlob], dirs.size)
      }
    lastBlobDirsRead = r._2
    r
  }

  /** Tier 3, flag form: every candidate row returned with `is_seen`.
    *
    * `requireExact = true` (the [[BloomShardExact]] tier): the probe REJECTS
    * approximate (cuckoo-chain) base blobs instead of silently serving
    * FP-capable verdicts from them — a BloomCuckoo-written store resumed
    * under the exact tier would otherwise contradict the tier's never-drops-
    * a-new-URL contract until the first compaction errored (ADVICE r04).
    */
  def cuckooFlagged(spark: SparkSession, candidates: DataFrame,
                    shardTable: SnapshotTable, shards: Int,
                    asOfWaveExclusive: Int = Int.MaxValue,
                    pruneBytes: Long = DefaultPruneBytes,
                    requireExact: Boolean = false): DataFrame = {
    import spark.implicits._
    val cands0 = candidates.withColumn("shard",
      pmod(col("url_hash"), lit(shards)).cast("int"))
    // when pruning will run its distinct-shards job, checkpoint the
    // candidate subtree ONCE — otherwise the bloom-suspect filter (broadcast
    // UDF over the frontier scan) would be evaluated twice, once for the
    // shard set and once for the cogroup. Below the threshold the subtree
    // is evaluated once anyway, so no checkpoint cost is paid at bench scale.
    val v = shardTable.latestVersionBefore(asOfWaveExclusive)
    val willPrune = !shardTable.isEmptyAt(v) &&
      shardTable.versionBytes(v.get) >= pruneBytes
    val cands = if (willPrune) cands0.localCheckpoint() else cands0
    val withFlag = cands.withColumn("is_seen", lit(false))
    val enc = org.apache.spark.sql.Encoders.row(withFlag.schema)
    val shardIdx = withFlag.schema.fieldIndex("shard")
    val hashIdx = withFlag.schema.fieldIndex("url_hash")
    val flagIdx = withFlag.schema.fieldIndex("is_seen")
    val (blobs, _) = blobsBefore(spark, shardTable, asOfWaveExclusive,
      () => cands.select("shard").distinct().collect().map(_.getInt(0)).toSet,
      pruneBytes)
    withFlag
      .groupByKey(_.getInt(shardIdx))
      .cogroup(blobs.groupByKey(_.shard)) { (shard, rows, blobIt) =>
        // a shard owns one base + up to compactThreshold delta blobs
        // (LSM layout, see cuckooInsert); seen = any blob contains it
        val states = blobIt.map(b => ShardState.deserialize(b.blob)).toSeq
        if (requireExact && states.exists(_.isInstanceOf[ShardState.Base]))
          throw new IllegalStateException(
            s"shard $shard holds an approximate (cuckoo) base blob — this " +
              "store was written with strategy=BloomCuckoo; the exact shard " +
              "tier refuses to probe it (a chain FP would silently drop a " +
              "never-seen url); continue with BloomCuckoo or start a fresh store")
        if (states.isEmpty) rows
        else rows.map { r =>
          val h = r.getLong(hashIdx)
          val vals = r.toSeq.toArray
          vals(flagIdx) = states.exists(_.contains(h))
          org.apache.spark.sql.Row.fromSeq(vals.toSeq)
        }
      }(enc)
      .drop("shard")
  }

  /** Default number of blobs a shard accumulates before compaction. */
  val DefaultCompactThreshold: Int = 4

  /** Merge this wave's inserts into the cuckoo shard table, LSM-style:
    *
    *  - Every touched shard writes this wave's inserts as an EXACT sorted-
    *    hash DELTA blob — no read of prior state at all. (Uniform hashing
    *    means a production wave touches every shard, so the round-3-verdict
    *    "rewrite only touched shards" fix alone still rewrites O(seen set)
    *    per wave in steady state; deltas make the per-wave write O(wave).)
    *  - A shard whose blob count has reached `compactThreshold` COMPACTS in
    *    the same cogroup: its deltas' keys (retained exactly for this
    *    purpose — cuckoo fingerprints alone cannot be rehashed into a
    *    bigger/merged filter) fold into the base [[CuckooChain]], its prior
    *    dirs are dropped from the manifest, amortizing O(seen/threshold)
    *    read+write per wave.
    *
    * Probe FP stays at the base chain's rate — deltas are exact. A base
    * outgrowing `perShardCapacity` chains a larger filter (logged) instead
    * of failing the wave.
    *
    * `exactBase = true` (the [[BloomShardExact]] tier, the engine default):
    * compaction merges into ONE sorted key array instead of a chain —
    * membership stays EXACT forever (reference dupefilter semantics, zero
    * URL loss) at ~8 B/url vs the chain's ~2.3 B. Same O(wave) delta
    * inserts, same pruned probes; choose the cuckoo base only when state
    * bytes dominate the cost model.
    *
    * MAINTENANCE: an empty-insert call with `compactThreshold = 1` is a
    * full compaction (every shard holding any blob folds to one base blob)
    * — the analog of Iceberg's rewrite-data-files action, for running
    * off-crawl when delta accumulation should be reset.
    */
  /** Pure-delta insert path (every wave whose shards are all under the
    * compaction threshold — compactThreshold−1 of every compactThreshold
    * waves): no prior blob is read, so the typed groupByKey.cogroup —
    * object-grouped rows outside codegen — reduces to "sorted hashes per
    * shard → one delta blob". This relational twin exchanges 16-byte
    * UnsafeRows through a codegen hash exchange + in-partition sort and
    * cuts each shard's blob from its contiguous sorted run. Blob BYTES are
    * identical to the cogroup path's (`serializeDelta` sorts to the same
    * array — asserted by SeenSetShardSpec), so stores, probes, digests and
    * later compactions are unaffected. Deterministic under task retry: the
    * exchange keys and the sort are value-derived (guide §2.5).
    */
  private def mergedPureDelta(spark: SparkSession, newHashes: Dataset[Long],
                              shards: Int): Dataset[ShardBlob] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    newHashes.toDF("h")
      .select(pmod(col("h"), lit(shards.toLong)).cast("int").as("shard"), col("h"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "h")
      .as[(Int, Long)]
      .mapPartitions { rows =>
        val out = scala.collection.mutable.ArrayBuffer.empty[ShardBlob]
        val buf = new scala.collection.mutable.ArrayBuilder.ofLong
        var cur = Int.MinValue
        def flush(): Unit = if (cur != Int.MinValue) {
          out += ShardBlob(cur, ShardState.serializeDeltaPresorted(buf.result()))
          buf.clear()
        }
        rows.foreach { case (sh, h) =>
          if (sh != cur) { flush(); cur = sh }
          buf += h
        }
        flush()
        out.iterator
      }
  }

  def cuckooInsert(spark: SparkSession, newHashes: Dataset[Long],
                   shardTable: SnapshotTable, shards: Int, perShardCapacity: Long,
                   wave: Int, pruneBytes: Long = DefaultPruneBytes,
                   compactThreshold: Int = DefaultCompactThreshold,
                   exactBase: Boolean = false): Unit = {
    import spark.implicits._
    val byShard = newHashes.map(h => (((h % shards) + shards) % shards, h))
      .toDF("shard", "h").as[(Long, Long)]
    // base = state strictly before this wave: a replayed insert after a
    // mid-wave crash merges into the same pre-crash base (idempotent commit)
    // instead of double-inserting into the crashed attempt's blobs. The
    // compaction set is likewise decided from the pre-wave manifest (pure
    // driver metadata — no Spark job, no filesystem listing).
    val v = shardTable.latestVersionBefore(wave)
    val compactIds: Set[Int] =
      if (shardTable.isEmptyAt(v)) Set.empty
      else shardTable.shardDirCounts(v.get)
        .filter(_._2 >= compactThreshold).keySet
    // only compacting shards read their prior blobs (a pure delta wave reads
    // ZERO); pruneBytes=0 forces the restriction — the wanted set is already
    // precomputed driver-side, so there is no planning job to amortize
    val (blobs, blobsRead) = blobsBefore(spark, shardTable, wave, () => compactIds,
      pruneBytes = 0L)
    val merged: Dataset[ShardBlob] =
      if (compactIds.isEmpty) mergedPureDelta(spark, newHashes, shards)
      else byShard.groupByKey(_._1.toInt)
      .cogroup(blobs.groupByKey(_.shard)) { (shard, ins, blobIt) =>
        val insArr = ins.map(_._2).toArray
        val states = blobIt.toSeq
        if (states.nonEmpty && exactBase) {
          // exact tier compaction: k-way merge-dedup every key (deltas retain
          // them all, each blob already sorted) into ONE sorted primitive
          // array — membership stays exact forever, at ~8 B/url vs the
          // chain's ~2.3 B, and the merge allocates exactly the output (no
          // boxing — VERDICT r04 wrong #2: an under-sharded store's
          // compaction was GC churn). A chain base here means the store was
          // written by the approximate tier: its keys are gone, so the tiers
          // cannot be switched mid-store.
          java.util.Arrays.sort(insArr)
          val sortedInputs = states.map { b =>
            ShardState.deserialize(b.blob) match {
              case ShardState.Delta(hs) => hs
              case ShardState.Base(_) => throw new IllegalStateException(
                s"shard $shard holds an approximate (cuckoo) base blob — this " +
                  "store was written with strategy=BloomCuckoo and cannot " +
                  "resume under the exact shard tier (fingerprints have no " +
                  "keys); continue with BloomCuckoo or start a fresh store")
            }
          }.toArray :+ insArr
          Iterator.single(ShardBlob(shard, ShardState.serializeDeltaPresorted(
            ShardState.mergeSortedDedup(sortedInputs))))
        } else if (states.nonEmpty) {
          // compacting shard: fold base + exact deltas + this wave into ONE chain
          var grown = 0
          var chain: CuckooChain = null
          val deltaKeys = scala.collection.mutable.ArrayBuffer.empty[Long]
          states.foreach { b =>
            ShardState.deserialize(b.blob) match {
              case ShardState.Base(c) =>
                if (chain == null) chain = c
                else throw new IllegalStateException(
                  s"cuckoo shard $shard has two base blobs — corrupt manifest")
              case ShardState.Delta(hs) => deltaKeys ++= hs
            }
          }
          if (chain == null) chain = CuckooChain.create(perShardCapacity)
          deltaKeys.foreach(h => grown += chain.insert(h))
          insArr.foreach(h => grown += chain.insert(h))
          if (grown > 0) System.err.println(
            s"[graft] WARN cuckoo shard $shard base grew $grown time(s) to " +
              s"chain length ${chain.length} (count=${chain.count}) — " +
              s"perShardCapacity $perShardCapacity is under-sized; correct, " +
              "but probe FP rate scales with chain length")
          Iterator.single(ShardBlob(shard, chain.serialize()))
        } else if (insArr.isEmpty) Iterator.empty // untouched: carried forward
        else Iterator.single(ShardBlob(shard, ShardState.serializeDelta(insArr)))
      }
    // `blobs_read` rides the manifest: the cluster-portable record of the
    // pruned-I/O invariant (a pure delta wave reads 0 prior blobs, a
    // compaction wave reads only its compacting shards' blobs) — asserted
    // from the store itself in SeenSetShardSpec, no JVM statics involved
    shardTable.commitSharded(merged.toDF(), "shard", wave,
      compactedShards = compactIds,
      metaKv = Map("blobs_read" -> blobsRead.toString,
        "compacted_shards" -> compactIds.size.toString))
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
