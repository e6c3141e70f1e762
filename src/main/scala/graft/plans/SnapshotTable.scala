package graft.plans

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Iceberg-style snapshot table emulation (SURVEY §7.3).
  *
  * No Iceberg runtime ships in the offline jar set, so this provides the
  * subset the north rule needs — snapshot isolation, atomic commit,
  * partition layout, resumable reads, manifest-level file reuse — over
  * plain Parquet:
  *
  * ```
  * <root>/<name>/data/wave=<n>/part-*.parquet          (plain wave commit)
  * <root>/<name>/data/wave=<n>/shard_p=<s>/...         (sharded commit)
  * <root>/<name>/_snapshots/v<k>.manifest              (atomic rename commit)
  * ```
  *
  * A manifest lists the data directories visible in that snapshot (each
  * optionally annotated with its byte size, the way Iceberg manifests carry
  * file stats — so planning decisions like shard-prune-vs-scan never touch
  * the filesystem) plus key=value metadata. Commit protocol: write data,
  * write manifest to a tmp path, `FileSystem.rename` (atomic on HDFS/local)
  * to `v<k>.manifest`. Readers resolve `latest` then read only listed
  * directories — writers never mutate committed files, so a reader
  * mid-commit sees the previous snapshot. Manifests are write-once, so reads
  * memoize per instance (a 10^5-wave crawl would otherwise pay O(waves)
  * manifest re-reads per wave in [[latestVersionBefore]]'s descending scan).
  * Swapping in a real `iceberg-spark-runtime` catalog replaces this class
  * verbatim behind the same few methods.
  */
final class SnapshotTable(spark: SparkSession, root: String, name: String) {

  private val base = new Path(root, name)
  private val snapsDir = new Path(base, "_snapshots")
  private def fs: FileSystem = base.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(v: Int) = new Path(snapsDir, f"v$v%06d.manifest")

  private final case class Manifest(dirs: Seq[(String, Option[Long])],
                                    meta: Map[String, String]) {
    def paths: Seq[String] = dirs.map(_._1)
  }

  // write-once manifests + immutable published dirs ⇒ safe per-instance
  // memoization (a crash-replay overwrite of an unpublished wave dir happens
  // in a fresh run, hence a fresh instance and cache)
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Manifest]()
  private val bytesCache =
    new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()

  def latestVersion: Option[Int] = {
    if (!fs.exists(snapsDir)) return None
    val vs = fs.listStatus(snapsDir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toInt)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** `dir=<path>` or `dir=<path>\t<bytes>` (size annotation optional for
    * compatibility with dirs staged outside sharded commits).
    */
  private def manifest(v: Int): Manifest =
    manifestCache.computeIfAbsent(v, _ => {
      val in = fs.open(manifestPath(v))
      val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val lines = content.split("\n").filter(_.nonEmpty)
      val dirs = lines.filter(_.startsWith("dir=")).map { l =>
        val parts = l.stripPrefix("dir=").split("\t", 2)
        (parts(0), parts.lift(1).flatMap(_.toLongOption))
      }.toSeq
      val meta = lines.filter(_.startsWith("meta."))
        .map { l => val Array(k, v2) = l.stripPrefix("meta.").split("=", 2); k -> v2 }.toMap
      Manifest(dirs, meta)
    })

  def meta: Map[String, String] =
    latestVersion.map(manifest(_).meta).getOrElse(Map.empty)

  /** Metadata of a specific snapshot version (e.g. a commit's `blobs_read`
    * instrumentation — the cluster-portable pruned-I/O record).
    */
  def metaAt(v: Int): Map[String, String] = manifest(v).meta

  /** Latest version whose committed wave is strictly below `waveExclusive` —
    * the snapshot a mid-wave crash replay must read: state tables committed
    * by the crashed attempt of the replayed wave are skipped, so the replay
    * sees exactly what the original attempt saw (ADVICE r01: replay
    * idempotency).
    */
  def latestVersionBefore(waveExclusive: Int): Option[Int] = {
    if (!fs.exists(snapsDir)) return None
    val vs = fs.listStatus(snapsDir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toInt)
      .sorted.reverse
    vs.find(v => manifest(v).meta.get("wave").exists(_.toInt < waveExclusive))
  }

  def isEmptyAt(version: Option[Int]): Boolean =
    version.isEmpty || manifest(version.get).dirs.isEmpty

  def readVersion(v: Int): DataFrame =
    spark.read.parquet(manifest(v).paths: _*)

  /** Stage this wave's data files WITHOUT publishing them: writes the
    * parquet but no manifest, so readers cannot see it and a crash leaves
    * only an orphan dir (overwritten on replay). Lets the expensive write
    * job overlap other work while the cheap, ordering-sensitive manifest
    * publish ([[publishStaged]]) happens at the right barrier.
    */
  def stage(df: DataFrame, wave: Int): String = {
    val dataDir = new Path(base, s"data/wave=$wave").toString
    df.write.mode(SaveMode.Overwrite).parquet(dataDir)
    dataDir
  }

  /** Publish a [[stage]]d dir as the next snapshot — manifest-only (a file
    * write + atomic rename, milliseconds; no Spark job). Prior dirs keep
    * their size annotations when appending.
    */
  def publishStaged(dataDir: String, wave: Int,
                    metaKv: Map[String, String] = Map.empty,
                    append: Boolean = true): Unit = {
    val prev: Seq[(String, Option[Long])] =
      if (append) latestVersion.map(manifest(_).dirs).getOrElse(Nil) else Nil
    publishDirs(prev.filterNot(_._1 == dataDir) :+ (dataDir -> None), wave, metaKv)
  }

  private def publishDirs(dirs: Seq[(String, Option[Long])], wave: Int,
                          metaKv: Map[String, String]): Unit = {
    val v = latestVersion.getOrElse(-1) + 1
    val body = (dirs.map { case (d, sz) =>
      "dir=" + d + sz.map("\t" + _).getOrElse("")
    } ++ (metaKv + ("wave" -> wave.toString)).map { case (k, v2) => s"meta.$k=$v2" })
      .mkString("", "\n", "\n")
    fs.mkdirs(snapsDir)
    val tmp = new Path(snapsDir, s".v$v.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, manifestPath(v)))
      throw new IllegalStateException(s"snapshot commit race on $name v$v")
  }

  /** Dirs of version `v` with their recorded byte sizes (None when the dir
    * was staged without annotation) — the planning input for pruned reads.
    */
  def dirsWithSizes(v: Int): Seq[(String, Option[Long])] = manifest(v).dirs

  /** Publish an EXPLICIT dir list as the next snapshot — no carry-forward,
    * no append semantics; the caller owns the full visibility decision
    * (sidecar folds, which replace dead dirs with one folded dir while
    * carrying a just-committed wave's dir verbatim).
    */
  def publishExact(dirs: Seq[(String, Option[Long])], wave: Int,
                   metaKv: Map[String, String] = Map.empty): Unit =
    publishDirs(dirs, wave, metaKv)

  /** Dirs visible in version `v`, optionally restricted to the given shard
    * ids (sharded layout, see [[commitSharded]]).
    */
  def versionDirs(v: Int, shards: Option[Set[Int]] = None): Seq[String] = {
    val all = manifest(v).paths
    shards match {
      case None => all
      case Some(s) => all.filter(d => SnapshotTable.shardIdOf(d).exists(s.contains))
    }
  }

  /** Total bytes under version `v`'s data dirs, used to decide whether
    * shard-pruned reads are worth an extra planning job. Free when the
    * manifest carries size annotations (every sharded commit); falls back
    * to a driver-side listing per un-annotated dir, memoized either way.
    */
  def versionBytes(v: Int): Long =
    bytesCache.computeIfAbsent(v, _ =>
      manifest(v).dirs.map {
        case (_, Some(sz)) => sz
        case (d, None) =>
          val p = new Path(d)
          if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
      }.sum).longValue()

  /** Per-shard dir counts in version `v` (sharded layout) — drives the
    * LSM-style compaction decision without any filesystem access.
    */
  def shardDirCounts(v: Int): Map[Int, Int] =
    manifest(v).paths.flatMap(SnapshotTable.shardIdOf)
      .groupBy(identity).view.mapValues(_.size).toMap

  /** Stage a sharded wave WITHOUT publishing: writes each shard's rows to
    * its own `data/wave=<w>/shard_p=<s>/` dir and returns the touched dirs
    * with their byte sizes (the manifest annotations). No manifest is
    * written, so readers cannot see it and a crash leaves only orphan dirs
    * (overwritten on replay). `shard_p` duplicates `shardCol` so the value
    * survives in the file data (partitionBy strips its column) — readers
    * need it without relying on partition-path inference over hand-listed
    * leaf dirs.
    */
  def stageSharded(df: DataFrame, shardCol: String,
                   wave: Int): Seq[(String, Option[Long])] = {
    import org.apache.spark.sql.functions.col
    val dataDir = new Path(base, s"data/wave=$wave")
    df.withColumn("shard_p", col(shardCol))
      .write.partitionBy("shard_p").mode(SaveMode.Overwrite)
      .parquet(dataDir.toString)
    if (!fs.exists(dataDir)) Seq.empty
    else fs.listStatus(dataDir).filter(_.getPath.getName.startsWith("shard_p="))
      .map(st => (st.getPath.toString,
        Some(fs.getContentSummary(st.getPath).getLength): Option[Long]))
      .toSeq.sortBy(_._1)
  }

  /** Publish [[stageSharded]]d dirs as the next snapshot: the new manifest =
    * pre-wave dirs minus `dropDirPaths` (dirs this wave consumed/replaced)
    * plus `touched` — manifest-level file reuse for everything else.
    *
    * Carry-forward base = the PRE-WAVE manifest (the same snapshot the
    * wave's reads used), NOT latestVersion: on a mid-wave crash replay
    * latestVersion is the crashed attempt's same-wave manifest, and if the
    * drop set differs between the attempts (e.g. a compaction threshold
    * changed across the restart) a shard the crashed attempt compacted
    * would lose its pre-wave history silently (ADVICE r04). Identical to
    * latestVersion in the normal strictly-increasing-wave path. Prior dirs
    * of THIS wave (a crashed attempt's, overwritten by the data write) are
    * always superseded by the fresh listing, keeping replay idempotent.
    */
  def publishSharded(touched: Seq[(String, Option[Long])], wave: Int,
                     dropDirPaths: Set[String] = Set.empty,
                     metaKv: Map[String, String] = Map.empty): Unit = {
    val prev = latestVersionBefore(wave).map(manifest(_).dirs).getOrElse(Nil)
    prev.find(d => SnapshotTable.shardIdOf(d._1).isEmpty).foreach { d =>
      throw new IllegalStateException(
        s"$name: non-sharded dir ${d._1} in the prior snapshot — this store " +
          "was written by an older (whole-table-commit) engine version; " +
          "start a fresh crawl store")
    }
    val carried = prev.filter { case (d, _) =>
      !dropDirPaths.contains(d) && !SnapshotTable.waveOf(d).contains(wave)
    }
    publishDirs(carried ++ touched, wave, metaKv)
  }

  /** Iceberg-style sharded DELTA commit: `df` holds ONLY the shards this
    * wave touched (`shardCol: int`); each touched shard's rows are written
    * to their own `data/wave=<w>/shard_p=<s>/` dir, which the new manifest
    * APPENDS to that shard's existing dirs (a shard owns base + delta dirs,
    * LSM-style) — except shards in `compactedShards`, whose prior dirs are
    * DROPPED because this wave's dir is their compacted replacement.
    * Untouched shards' dirs carry forward unchanged with their recorded
    * sizes. A wave therefore commits only its own bytes plus the shards it
    * compacts — the manifest-reuse behavior a real Iceberg table provides —
    * never a full-table rewrite.
    */
  def commitSharded(df: DataFrame, shardCol: String, wave: Int,
                    compactedShards: Set[Int] = Set.empty,
                    metaKv: Map[String, String] = Map.empty): Unit = {
    val touched = stageSharded(df, shardCol, wave)
    val dropped = latestVersionBefore(wave).map(manifest(_).paths).getOrElse(Nil)
      .filter(d => SnapshotTable.shardIdOf(d).exists(compactedShards.contains))
      .toSet
    publishSharded(touched, wave, dropped, metaKv)
  }

  /** Commit `df` as partition `wave=<wave>`. `append=false` → the new
    * snapshot sees ONLY this wave (frontier semantics: full replace);
    * `append=true` → previous dirs + this one (seen/lineage/questions logs).
    */
  def commit(df: DataFrame, wave: Int, metaKv: Map[String, String] = Map.empty,
             append: Boolean = true): Unit =
    publishStaged(stage(df, wave), wave, metaKv, append)

  def isEmpty: Boolean = latestVersion.isEmpty ||
    manifest(latestVersion.get).dirs.isEmpty

  /** Read the latest snapshot (empty DataFrame with no snapshot is the
    * caller's job to handle via isEmpty).
    */
  def read(): DataFrame =
    spark.read.parquet(manifest(latestVersion.getOrElse(
      throw new IllegalStateException(s"no snapshot for $name"))).paths: _*)

  /** Truncate: next snapshot sees nothing (used to mark frontier-exhausted). */
  def commitEmpty(wave: Int, metaKv: Map[String, String] = Map.empty): Unit =
    publishDirs(Seq.empty, wave, metaKv)
}

object SnapshotTable {
  /** Shard id of a sharded-layout dir (`…/shard_p=<n>`); None for a plain
    * wave dir. Tagging lives in the path so a commit can carry forward
    * untouched shards without reading their data.
    */
  def shardIdOf(dir: String): Option[Int] = {
    val leaf = dir.substring(dir.lastIndexOf('/') + 1)
    if (leaf.startsWith("shard_p=")) leaf.stripPrefix("shard_p=").toIntOption
    else None
  }

  /** Wave of a sharded-layout dir (`…/wave=<n>/shard_p=<s>`) — lets a
    * replayed commit supersede a crashed attempt's same-wave dirs.
    */
  def waveOf(dir: String): Option[Int] = {
    val segs = dir.split('/')
    if (segs.length < 2) None
    else Some(segs(segs.length - 2)).filter(_.startsWith("wave="))
      .flatMap(_.stripPrefix("wave=").toIntOption)
  }
}
