package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.SnapshotTable

/** Frontier-as-priority-queue storage planning (north rule: "a priority
  * queue realized as an Iceberg-backed frontier table"; VERDICT r04 wrong #1
  * + next #1/#6 — the last O(state)-per-wave I/O in the engine).
  *
  * The frontier is a dir-granular LSM over [[SnapshotTable]]:
  *
  *   data/wave=<w>/shard_p=<s>                             (cold, VETTED)
  *       s = ((band·S + tsSlice)·C + rankChunk)·F + hostBucket — S
  *       order-aligned ts-slices per band plus C geometric rank tiers
  *       (both engaged with the sidecar gate; S=C=1 below it), so the
  *       ACTIVE band is not one indivisible slab: its early slice's
  *       budget+1 rows prove its late slices deferred, and — when a
  *       backlog shares one discovery_ts (the 10^10 seed-list case, where
  *       slicing is inert) — the exact-rank tiers do the same for the
  *       band's own equal-key mass, LSM-leveled so a backlog row is
  *       rewritten O(log backlog) times while it drains
  *       (CrawlEngine.Config.frontierRankChunks)
  *   data/wave=<w>/shard_p=-1                              (fresh, UNVETTED)
  *
  * **Fresh dirs** hold a wave's discovered links. They are ALWAYS read the
  * next wave (and then dropped): a discovery may duplicate an
  * already-fetched url, and consuming those 'seen' rows at first probe is
  * what keeps per-wave dedup counts identical to the always-read-everything
  * engine. **Cold dirs** hold deferred survivors — rows that were probed
  * (not seen, host allowed) and lost the politeness rank. They are keyed by
  * priority band × host bucket, so the manifest itself is the priority
  * queue's index.
  *
  * **Read pruning (the O(touched) wave):** each cold dir carries per-host
  * stats (row count + min/max of the full politeness sort key
  * `(priority, depth, discovery_ts, url)`) in a sidecar table. A cold dir
  * is skipped for host h iff h has ≥ budget(h)+1 rows in dirs whose
  * per-host max key is STRICTLY below this dir's min key; a dir is read iff
  * some host still needs it. Soundness: a skipped row has ≥ budget+1
  * proven-open strictly-better rows, so in the full run it ranks ≥ budget+2
  * — disposition 'deferred', host_rank 0 — and, because ≥ budget+1 read
  * rows exist per host that skipped anything, the over-budget rank path
  * runs in both runs and every assigned host_rank counts only read rows.
  * Fetch sets, ranks, dispositions and digests are therefore IDENTICAL to
  * the unpruned run (exact seen-tiers; the approximate BloomCuckoo tier may
  * flag a cold row 'seen' at a different wave than the unpruned run would —
  * the same documented FP divergence that tier already carries). Skipped
  * rows' deferred/candidate counts are patched from the stats (exact), so
  * lineage matches row-for-row.
  *
  * Vetted-only stats are what make the rule sound: a cold row's url is
  * never fetched while the row sits in the frontier (the frontier is
  * duplicate-free by construction), so its open-ness cannot change. A
  * discovery that would duplicate a row in an UNREAD cold dir is caught at
  * commit time by a per-dir bloom sidecar: hit dirs are read then and their
  * rows fold into the same min-tuple dedup the always-read engine applies,
  * so the duplicate-free invariant holds without reading the cold tail.
  * A bloom false positive costs one unnecessary dir read — never
  * correctness.
  *
  * At 10^10: a wave reads fresh dirs (O(discoveries)) plus the winnable
  * priority bands, and rewrites exactly what it read — the cold tail (the
  * ~99% of a deep frontier that cannot win a politeness slot) is carried
  * forward at the manifest level, costing zero I/O to defer. Sidecars and
  * pruning engage only once the frontier's bytes exceed
  * `frontierPruneBytes` (dirs without stats are always read, so the gate
  * is self-bootstrapping); below it the engine reads everything and
  * behaves exactly like the round-4 full-rewrite frontier.
  */
object Frontier {

  /** Sentinel shard for unvetted (fresh-discovery) dirs. */
  val FreshShard: Int = -1

  /** A cold shard accumulating this many live dirs gets them all force-read
    * (= folded into one) on the next planned wave — bounds live dirs at
    * threshold × bands × tsSlices × rankChunks × buckets instead of
    * O(waves). The frontier analog of the seen-set's blob-count compaction.
    */
  val CompactDirsPerShard: Int = 8

  /** Pack a live dir's (wave, shard) into one long key (shard ≥ 0 < 2^31,
    * so the 32-bit field never sign-extends).
    */
  def dirKey(wave: Int, shard: Int): Long = (wave.toLong << 32) | shard.toLong

  /** The full politeness sort key, flattened for stats rows; `ts` is epoch
    * MICROSECONDS (Spark's timestamp resolution, decoded via `unix_micros`
    * so the driver-side ordering matches the rank's exactly). URLs are
    * compared as Java strings driver/executor-side — identical to Spark's
    * UTF8 binary min/max for the ASCII urls the engine generates (noted:
    * supplementary-plane characters would order differently).
    */
  private[graft] final case class K(pri: Int, depth: Int, ts: Long, url: String)
  private[graft] implicit val kOrd: Ordering[K] =
    Ordering.by((k: K) => (k.pri, k.depth, k.ts, k.url))

  /** The per-host skip rule, pure (property-tested in FrontierSpec): dir i
    * (given its host-local stats (minK, maxK, n)) stays NEEDED until
    * budget+1 strictly-better vetted rows exist in strictly-better dirs —
    * rows counted only from dirs whose maxK sorts strictly below this dir's
    * minK, so every counted row outranks every row of dir i. budget+1 (not
    * budget) because the politeness rank is over a total order with this
    * key: budget rows strictly better still leaves rank budget+1 reachable,
    * and the engine's fast-path/rank equality needs rank ≤ budget+1 rows
    * readable. A disallowed host never skips (its rows must surface as
    * 'blocked' dispositions).
    */
  private[graft] def neededForHost(dirs: IndexedSeq[(K, K, Long)],
                                   budget: Long,
                                   allowed: Boolean): IndexedSeq[Boolean] =
    dirs.map { case (mn, _, _) =>
      !allowed || dirs.iterator.filter(o => kOrd.lt(o._2, mn)).map(_._3).sum <
        budget + 1L
    }

  private final case class StatRow(fwave: Int, fshard: Int, host: String,
                                   n: Long, minK: K, maxK: K)

  final case class Plan(readDirs: Seq[String], skippedDirs: Seq[String],
                        skippedRows: Long) {
    def readSet: Set[String] = readDirs.toSet
  }

  /** Read-plan for one wave. `liveDirs` = the pre-wave frontier manifest's
    * (path, bytes); pruning engages only when total bytes ≥ pruneBytes AND
    * stats exist — fresh dirs, stat-less dirs, and (for safety)
    * robots-disallowed hosts' dirs are always read.
    *
    * Planning-scan cost, named: the stats table is read distributed each
    * planned wave. Its size is one row per (live dir, host) — a host's
    * deferred mass typically concentrates in a handful of band/slice dirs
    * of its bucket, so live stats ≈ a few rows × hosts (~1% of frontier
    * bytes at 10^10); the worst case (every host spread over every
    * band × slice) is bands × slices rows per host, still ≪ one row per
    * frontier URL. Only the per-dir verdicts (≤ live dirs, compaction-
    * bounded) are ever collected.
    */
  def plan(spark: SparkSession, liveDirs: Seq[(String, Option[Long])],
           statsT: SnapshotTable, robots: DataFrame, waveDurationMs: Long,
           pruneBytes: Long): Plan = {
    val paths = liveDirs.map(_._1)
    val totalBytes = liveDirs.flatMap(_._2).sum
    val cold = paths.filter(p => SnapshotTable.shardIdOf(p).exists(_ >= 0))
    if (totalBytes < pruneBytes || cold.isEmpty || statsT.isEmpty)
      return Plan(paths, Nil, 0L)

    val liveKey: Map[Long, String] = cold.map { p =>
      dirKey(SnapshotTable.waveOf(p).get, SnapshotTable.shardIdOf(p).get) -> p
    }.toMap
    import spark.implicits._
    // live-key restriction via broadcast join, not isin: at 10^5+ live dirs
    // an isin literal list is a pathological expression tree
    val liveKeysDf = liveKey.keys.toSeq.toDF("k")
    val stats = statsT.read()
      .withColumn("k", (col("fwave").cast("long") * (1L << 32)) + col("fshard"))
      .join(broadcast(liveKeysDf), Seq("k"))
      .join(broadcast(robots.select(col("host"), col("allowed"),
        col("crawl_delay_ms"))), Seq("host"), "left")
      .withColumn("allowed", coalesce(col("allowed"), lit(true)))
      .withColumn("budget", greatest(lit(1L), lit(waveDurationMs) /
        coalesce(col("crawl_delay_ms"), lit(2000L))).cast("long"))
      .select(col("k"), col("host"), col("allowed"), col("budget"), col("n"),
        // ts decoded at MICROSECOND precision — Spark's own timestamp
        // resolution — so the driver-side K ordering is exactly the
        // ordering the politeness rank sorts by. (Timestamp.getTime would
        // truncate to millis: two keys equal to the ms but not the µs
        // would fall through to the url tiebreak, which can disagree with
        // the real ts order — an unsound skip for external pages tables
        // whose warc_ts carries sub-ms precision.)
        col("min_pri"), col("min_depth"), unix_micros(col("min_ts")).as("min_ts"),
        col("min_url"), col("max_pri"), col("max_depth"),
        unix_micros(col("max_ts")).as("max_ts"), col("max_url"))
      .as[(Long, String, Boolean, Long, Long, Int, Int, Long,
        String, Int, Int, Long, String)]

    // per host: a dir stays needed until budget+1 strictly-better vetted
    // rows exist in strictly-better dirs (see soundness note above). The
    // per-host dir count is small (≤ live bands + stragglers), so the O(k²)
    // scan is noise next to the frontier I/O it saves.
    val perDir: Array[(Long, Boolean, Long)] = stats
      .groupByKey(_._2)
      .flatMapGroups { (_, it) =>
        val ds = it.toArray
        val allowed = ds.head._3
        val budget = ds.head._4
        val triples: IndexedSeq[(K, K, Long)] = ds.toIndexedSeq.map(d =>
          (K(d._6, d._7, d._8, d._9),
            K(d._10, d._11, d._12, d._13), d._5))
        val needed = neededForHost(triples, budget, allowed)
        ds.iterator.zipWithIndex.map { case (d, i) => (d._1, needed(i), d._5) }
      }
      .groupByKey(_._1)
      .mapGroups { (k, it) =>
        val ds = it.toArray
        (k, ds.exists(_._2), ds.map(_._3).sum)
      }
      .collect()

    val decided = perDir.map(_._1).toSet
    val needed = perDir.filter(_._2).map(r => liveKey(r._1)).toSet
    // stat-less cold dirs (written before the sidecar gate engaged) and
    // fresh dirs are always read
    val forced = paths.filterNot(p =>
      SnapshotTable.shardIdOf(p).exists(_ >= 0) &&
        decided.contains(dirKey(SnapshotTable.waveOf(p).get,
          SnapshotTable.shardIdOf(p).get)))
    // dir-count compaction: a shard holding ≥ CompactDirsPerShard live dirs
    // has ALL of them force-read — the normal wave flow then folds their
    // survivors into one new dir. Reading extra dirs never changes
    // dispositions (their non-winning rows rank past the budget and defer
    // as they would have unread), so this is pure manifest hygiene: live
    // dirs stay ≤ threshold × bands × tsSlices × buckets instead of O(waves).
    val compactForced = cold.groupBy(p => SnapshotTable.shardIdOf(p).get)
      .valuesIterator.filter(_.size >= CompactDirsPerShard).flatten.toSeq
    val read = (forced ++ compactForced ++ paths.filter(needed.contains)).distinct
    val skipped = paths.filterNot(read.contains)
    val skippedKeys = skipped.map(p =>
      dirKey(SnapshotTable.waveOf(p).get, SnapshotTable.shardIdOf(p).get)).toSet
    val skippedRows = perDir.filter(r => skippedKeys.contains(r._1)).map(_._3).sum
    if (read.isEmpty && paths.nonEmpty) Plan(paths, Nil, 0L) // fail-safe
    else Plan(read, skipped, skippedRows)
  }

  /** Per-(dir, host) stats rows for this wave's NEW cold dirs. `vetted`
    * must carry `fshard` plus the frontier columns.
    */
  def statsFor(vetted: DataFrame, wave: Int): DataFrame = {
    val key = struct(col("priority").as("pri"), col("depth"),
      col("discovery_ts").as("ts"), col("url"))
    vetted.groupBy(col("fshard"), col("host"))
      .agg(count(lit(1)).as("n"), min(key).as("mn"), max(key).as("mx"))
      .select(lit(wave).as("fwave"), col("fshard"), col("host"), col("n"),
        col("mn.pri").as("min_pri"), col("mn.depth").as("min_depth"),
        col("mn.ts").as("min_ts"), col("mn.url").as("min_url"),
        col("mx.pri").as("max_pri"), col("mx.depth").as("max_depth"),
        col("mx.ts").as("max_ts"), col("mx.url").as("max_url"))
  }

  /** Per-dir url_hash bloom sidecars for this wave's NEW cold dirs (the
    * duplicate-vs-unread-dir probe). 1% fpp: a false positive costs one
    * unnecessary dir read at some future commit, never correctness.
    */
  def bloomsFor(spark: SparkSession, vetted: DataFrame, wave: Int): DataFrame = {
    import spark.implicits._
    vetted.select(col("fshard"), col("url_hash")).as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val hs = it.map(_._2).toArray
        val bf = org.apache.spark.util.sketch.BloomFilter.create(
          math.max(hs.length.toLong, 64L), 0.01)
        hs.foreach(bf.putLong)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (wave, shard, bos.toByteArray)
      }
      .toDF("fwave", "fshard", "blob")
  }

  /** Blob-table bytes above which [[dupHitDirs]] probes DISTRIBUTED
    * (bucket-aligned cogroup) instead of collect+broadcast. At the 10^10
    * north-rule scale the cold tail's blooms are ~1.2 B/url ≈ 12 GB — an
    * all-blobs driver collect would be O(frontier) driver memory, the
    * disease this round removed from the frontier data path. Below the
    * gate (bench scale: a few MB) the broadcast path costs one tiny job
    * and zero shuffles, so it stays the fast path.
    */
  val DupProbeBroadcastBytes: Long = 64L << 20

  /** Dirs among `unreadCold` whose bloom hits any discovered url — those
    * may hold a row the discovery duplicates, so the commit must read them
    * and fold their rows through the min-tuple dedup. A url collides only
    * within its own host bucket, so each discovery probes just its bucket's
    * dirs. Missing blobs (version skew) count as hits — reading is always
    * sound.
    *
    * Three physical plans, same result (FrontierSpec asserts equality),
    * chosen by which side is small:
    *  - blob state < `broadcastBytes` (bench scale): collect+broadcast the
    *    FILTERS, probe map-side over the discoveries — one tiny job, zero
    *    shuffles.
    *  - blob state big but the wave ≤ `discBroadcastRows` (the 10^10
    *    steady state: cold-tail blooms ~12 GB, a wave ~10^7 urls):
    *    collect+broadcast the DISCOVERY (bucket, hash) pairs — the same
    *    wave-bounded driver-memory contract as the fetch join's wave
    *    broadcast — and stream the blobs map-side: zero blob shuffle (a
    *    bucket-cogroup here would exchange the ENTIRE cold bloom state
    *    every probing wave), per-task memory one deserialized filter at a
    *    time, and no blob byte ever reaches the driver.
    *  - both sides huge: cogroup blobs with discoveries on the host bucket
    *    so each task deserializes only its bucket's filters (per-task
    *    memory = cold-bloom-bytes / hostBuckets); pays the blob exchange,
    *    the price of assuming nothing about wave size.
    *
    * Floor cost common to the big-state plans, named: the bloom table is
    * SCANNED in full each probing wave (the live-key join restricts rows
    * logically, not row-groups physically, and unread cold dirs span most
    * commit waves anyway) — ~12 GB distributed at 10^10, ~12 MB per
    * executor on a 1000-executor cluster, with no shuffle on the map-side
    * plan. Bounding the scan below O(cold blooms) would need key-organized
    * blob files; at ~1.2 B/url (one row-count-sized blob per dir) the
    * table is ~1% of frontier bytes, so the scan is not the wave's
    * critical path.
    */
  def dupHitDirs(spark: SparkSession, discovered: DataFrame,
                 unreadCold: Seq[String], bloomsT: SnapshotTable,
                 hostBuckets: Int,
                 broadcastBytes: Long = DupProbeBroadcastBytes,
                 waveRowBound: Long = Long.MaxValue,
                 discBroadcastRows: Long = 4000000L): Seq[String] = {
    if (unreadCold.isEmpty) return Nil
    val keyOf: Map[Long, String] = unreadCold.map(p =>
      dirKey(SnapshotTable.waveOf(p).get, SnapshotTable.shardIdOf(p).get) -> p).toMap
    import spark.implicits._
    if (bloomsT.isEmpty) return keyOf.values.toSeq // no blobs: all conservative hits
    val restricted = bloomsT.read()
      .withColumn("k", (col("fwave").cast("long") * (1L << 32)) + col("fshard"))
      .join(broadcast(keyOf.keys.toSeq.toDF("k")), Seq("k"))
    if (bloomsT.latestVersion.map(bloomsT.versionBytes).getOrElse(0L) < broadcastBytes) {
      // small state: collect + broadcast, probe map-side (no shuffle)
      val blobs: Map[Long, Array[Byte]] = restricted.select(col("k"), col("blob"))
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
      val missing = keyOf.keys.filterNot(blobs.contains).map(keyOf).toSeq
      if (blobs.isEmpty) return missing
      // bucket → (dirKey, filter); probe with a broadcast map like bloomSplit
      val byBucket: Map[Int, Seq[(Long, org.apache.spark.util.sketch.BloomFilter)]] =
        blobs.toSeq.map { case (k, b) =>
          ((k & ((1L << 32) - 1)).toInt % hostBuckets,
            (k, org.apache.spark.util.sketch.BloomFilter.readFrom(
              new java.io.ByteArrayInputStream(b))))
        }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val bc = spark.sparkContext.broadcast(byBucket)
      val hitsUdf = udf((bucket: Int, h: Long) =>
        bc.value.getOrElse(bucket, Nil).collect {
          case (k, f) if f.mightContainLong(h) => k
        })
      (missing ++ discovered
        .select(pmod(xxhash64(col("host")), lit(hostBuckets)).cast("int").as("b"),
          col("url_hash"))
        .select(explode(hitsUdf(col("b"), col("url_hash"))).as("k"))
        .distinct().collect().map(r => keyOf(r.getLong(0)))).distinct
    } else if (waveRowBound <= discBroadcastRows) {
      // big blobs, wave-bounded discoveries: broadcast the wave's
      // (bucket, hash) pairs and stream the blobs map-side — zero blob
      // shuffle, one deserialized filter in memory per row. Presence probe
      // first (column-prunes to `k`) so missing blobs stay conservative
      // hits. The distinct() bounds the collect at the wave's unique
      // discoveries (≤ waveRowBound by the caller's contract).
      val present = restricted.select(col("k")).as[Long].collect().toSet
      val missing = keyOf.keys.filterNot(present.contains).map(keyOf).toSeq
      val disc: Map[Int, Array[Long]] = discovered
        .select(pmod(xxhash64(col("host")), lit(hostBuckets)).cast("int").as("b"),
          col("url_hash")).distinct()
        .as[(Int, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      if (disc.isEmpty) return missing
      val bc = spark.sparkContext.broadcast(disc)
      val hits = restricted
        .select(col("k"), col("blob"),
          (col("fshard") % hostBuckets).cast("int").as("b"))
        .as[(Long, Array[Byte], Int)]
        .mapPartitions { it =>
          it.flatMap { case (k, blob, b) =>
            bc.value.get(b) match {
              case None => Iterator.empty
              case Some(hs) =>
                val f = org.apache.spark.util.sketch.BloomFilter.readFrom(
                  new java.io.ByteArrayInputStream(blob))
                var i = 0
                var hit = false
                while (!hit && i < hs.length) {
                  hit = f.mightContainLong(hs(i)); i += 1
                }
                if (hit) Iterator.single(k) else Iterator.empty
            }
          }
        }.collect()
      (missing ++ hits.map(keyOf)).distinct
    } else {
      // both sides huge: bucket-aligned cogroup — only the (tiny) hit-key
      // set is ever collected. Presence probe first (parquet column-prunes
      // to `k`, no blob bytes read) so missing blobs stay conservative hits.
      val present = restricted.select(col("k")).as[Long].collect().toSet
      val missing = keyOf.keys.filterNot(present.contains).map(keyOf).toSeq
      val blobsByBucket = restricted
        .select(col("k"), col("blob"),
          (col("fshard") % hostBuckets).cast("int").as("b"))
        .as[(Long, Array[Byte], Int)].groupByKey(_._3)
      val discByBucket = discovered
        .select(pmod(xxhash64(col("host")), lit(hostBuckets)).cast("int").as("b"),
          col("url_hash")).as[(Int, Long)].groupByKey(_._1)
      val hits = blobsByBucket.cogroup(discByBucket) { (_, bs, ds) =>
        val filters = bs.map(t => (t._1,
          org.apache.spark.util.sketch.BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(t._2)))).toArray
        if (filters.isEmpty) Iterator.empty
        else {
          val hit = new Array[Boolean](filters.length)
          var remaining = filters.length
          while (remaining > 0 && ds.hasNext) {
            val h = ds.next()._2
            var i = 0
            while (i < filters.length) {
              if (!hit(i) && filters(i)._2.mightContainLong(h)) {
                hit(i) = true; remaining -= 1
              }
              i += 1
            }
          }
          filters.iterator.zipWithIndex.collect { case ((k, _), i) if hit(i) => k }
        }
      }.distinct().collect()
      (missing ++ hits.map(keyOf)).distinct
    }
  }

  /** Exact per-host politeness rank (1-based, appended as `rnk`), skew-safe.
    *
    * `Window.partitionBy(host)` puts a host's every row in ONE task: a
    * mega-host's backlog (the Common-Crawl reality — one domain can carry
    * 10^8 frontier rows) becomes a single-task sort, the exact disease the
    * politeness rank's salted shield cures (`Politeness.rank`). That shield
    * doesn't transfer here — chunking needs a rank for EVERY row, not a
    * top-k — so this uses the other classic exact shape:
    *
    *  1. `repartitionByRange` over (host, key): a mega-host spreads across
    *     many partitions, each task sorting ~rows/partitions regardless of
    *     host skew; hosts stay contiguous across the partition sequence.
    *  2. One tiny pass collects per-partition boundary stats — (first host,
    *     its leading-run length, last host, its trailing-run length) — ONE
    *     row per partition (never per host: O(partitions) driver memory).
    *  3. The driver walks partitions in order computing, for each
    *     partition whose first host continues from the previous one, that
    *     host's carried-in row count; the broadcast of these offsets is
    *     O(partitions).
    *  4. A final 1-1 pass assigns rank = carried offset (first host only)
    *     + running count within the partition.
    *
    * The rank is a pure function of the row set — the key is unique per
    * row (urls are frontier-unique), so ranks don't depend on partition
    * boundaries — which keeps chunk assignment replay-deterministic. The
    * range-sorted input IS persisted for the duration (returned cleanup
    * releases it): the offsets are only valid for the boundary layout they
    * were measured on, so the two passes must read the same shuffle output,
    * not a re-sampled recomputation.
    */
  private[graft] def exactHostRank(df: DataFrame,
                                   numPartitions: Option[Int] = None)
      : (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    import spark.implicits._
    val ord = Seq(col("host"), col("priority"), col("depth"),
      col("discovery_ts"), col("url"))
    // default (None) leaves the exchange AQE-coalescible — right for the
    // engine, where small read-sets shrink to few partitions and 10^10-
    // scale ones stay wide; an explicit count pins the layout (tests use
    // it to force multi-partition boundary stitching on tiny data)
    val ranged = numPartitions match {
      case Some(n) => df.repartitionByRange(n, ord: _*)
      case None    => df.repartitionByRange(ord: _*)
    }
    val sorted = ranged.sortWithinPartitions(ord: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hIdx = sorted.schema.fieldIndex("host")
    // (pid, firstHost, leadingRun, lastHost, trailingRun) per non-empty
    // partition; range partitioning keeps a host contiguous, so firstHost ==
    // lastHost iff the partition holds exactly one host
    val stats = sorted.toDF().mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.get.partitionId()
        var first: String = null; var firstN = 0L
        var last: String = null; var lastN = 0L
        var inLeading = true
        while (it.hasNext) {
          val h = it.next().getString(hIdx)
          if (first == null) { first = h; last = h }
          if (h != last) { last = h; lastN = 0L; inLeading = false }
          lastN += 1
          if (inLeading) firstN += 1
        }
        Iterator.single((pid, first, firstN, last, lastN))
      }
    }.collect().sortBy(_._1)
    var carryHost: String = null
    var carry = 0L
    val offsets = Map.newBuilder[Int, Long]
    stats.foreach { case (pid, first, firstN, last, lastN) =>
      if (first == carryHost && carry > 0L) offsets += pid -> carry
      if (first == last) { // single-host partition: the run continues
        if (first == carryHost) carry += lastN
        else { carryHost = first; carry = lastN }
      } else { carryHost = last; carry = lastN }
    }
    val bc = spark.sparkContext.broadcast(offsets.result())
    val outSchema = sorted.schema.add("rnk", org.apache.spark.sql.types.LongType)
    val ranked = sorted.toDF().mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.get.partitionId()
      val base = bc.value.getOrElse(pid, 0L)
      var firstHost: String = null
      var cur: String = null
      var n = 0L
      it.map { r =>
        val h = r.getString(hIdx)
        if (firstHost == null) firstHost = h
        if (h == cur) n += 1 else { cur = h; n = 1L }
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq :+ (if (h == firstHost) base + n else n))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    (ranked, () => { sorted.unpersist(); () })
  }

  /** Geometric rank-tier assignment (appended as `chunk`): tier k covers
    * per-host politeness ranks [cw·(2^k−1), cw·(2^(k+1)−1)) where cw =
    * budget · chunkWaves, capped at nChunks−1 — so a draining backlog row
    * is rewritten O(log backlog) times, LSM-style, and the stats planner
    * prunes whole tail tiers (tier keys sort strictly below the next tier's
    * for every host: the rank order IS the key order, url tiebreak
    * included). Ranks come from [[exactHostRank]] (skew-safe); the tier
    * formula is integer-exact — `floor(log2((rnk−1) div cw + 1))` via
    * binary-string length, with the same tier boundaries as real-division
    * `floor(log2((rnk−1)/cw + 1))` (no power of two lies strictly between
    * q+1 and q+2) but none of `LOG`'s float-at-the-boundary risk.
    */
  def rankChunks(deduped: DataFrame, robots: DataFrame, waveDurationMs: Long,
                 chunkWaves: Int, nChunks: Int): (DataFrame, () => Unit) = {
    val withCw = deduped
      .join(broadcast(robots.select(col("host"), col("crawl_delay_ms"))),
        Seq("host"), "left")
      .withColumn("cw", greatest(lit(1L), lit(waveDurationMs) /
        coalesce(col("crawl_delay_ms"), lit(2000L))).cast("long")
        * chunkWaves)
      .drop("crawl_delay_ms")
    val (ranked, cleanup) = exactHostRank(withCw)
    (ranked
      .withColumn("chunk", least(
        length(bin(expr("((rnk - 1) div cw) + 1"))) - 1,
        lit(nChunks - 1)).cast("int"))
      .drop("cw", "rnk"), cleanup)
  }

  /** Sidecar retention: stats/bloom tables are append-per-wave; fold them
    * to live-dirs-only once they hold `threshold` dirs (the same
    * rewrite-data-files analog as the seen-set). `livePairs` must be the
    * PRE-wave live set — dead rows of the CURRENT wave survive one cycle —
    * so a crash replay re-plans from identical sidecars.
    *
    * `keepWave` (the wave just committed, not yet in any live set) keeps
    * its rows through its own DATA DIR, carried VERBATIM in the fold
    * manifest — never copied into the fold dir. A mid-wave crash replay
    * re-commits that wave's sidecar rows by overwriting the same
    * `data/wave=<keepWave>` dir; a fold-held copy would then DUPLICATE
    * every (dir, host) stats row, and the planner's budget+1 rule would
    * double-count `n` — an unsound skip (wrong dispositions, wrong
    * digests). Carrying the dir instead makes the replay's overwrite
    * supersede the crashed attempt's rows exactly like every other
    * same-wave commit in the engine.
    *
    * Cost, named: the fold rewrites the WHOLE sidecar (live rows + ≤
    * threshold waves of appends), so its amortized per-wave cost is
    * O(live sidecar / threshold) — at the 10^10 shape, ~12 GB of cold-dir
    * blooms folded every 16 waves ≈ 750 MB/wave, the same order as the
    * wave's own frontier writes and fully distributed. The threshold
    * trades this against per-wave scan bloat: every planned wave reads the
    * stats table (and a probing wave the bloom table) in full before the
    * live-key join restricts rows, so unfolded dead appends are paid on
    * EVERY wave while the fold is paid once.
    */
  def compactSidecar(t: SnapshotTable, livePairs: Set[Long], keepWave: Int,
                     threshold: Int = 16): Unit = {
    val v = t.latestVersion
    if (v.isEmpty || t.versionDirs(v.get).size < threshold) return
    // fold dirs carry negative wave tags, so the suffix match is exact
    val (keepDirs, foldable) = t.dirsWithSizes(v.get)
      .partition(_._1.endsWith(s"/wave=$keepWave"))
    if (foldable.isEmpty) return
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.active
    import spark.implicits._
    val liveDf = livePairs.toSeq.toDF("k").withColumn("live", lit(true))
    val kept = spark.read.parquet(foldable.map(_._1): _*)
      .withColumn("k", (col("fwave").cast("long") * (1L << 32)) + col("fshard"))
      .join(broadcast(liveDf), Seq("k"), "left")
      .filter(col("live"))
      .drop("k", "live")
    // stage under a version-unique NEGATIVE wave path: the fold reads the
    // very dirs a same-wave overwrite would delete mid-read
    val dir = t.stage(kept, -(v.get + 2))
    t.publishExact((dir -> (None: Option[Long])) +: keepDirs, keepWave)
  }
}
