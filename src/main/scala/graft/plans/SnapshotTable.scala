package graft.plans

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Iceberg-style snapshot table emulation (SURVEY §7.3).
  *
  * No Iceberg runtime ships in the offline jar set, so this provides the
  * subset the north rule needs — snapshot isolation, atomic commit,
  * partition layout, resumable reads — over plain Parquet:
  *
  * ```
  * <root>/<name>/data/wave=<n>/part-*.parquet      (data, partition layout)
  * <root>/<name>/_snapshots/v<k>.manifest          (atomic rename commit)
  * ```
  *
  * A manifest lists the data directories visible in that snapshot plus
  * key=value metadata. Commit protocol: write data, write manifest to a tmp
  * path, `FileSystem.rename` (atomic on HDFS/local) to `v<k>.manifest`.
  * Readers resolve `latest` then read only listed directories — writers never
  * mutate committed files, so a reader mid-commit sees the previous snapshot.
  * Swapping in a real `iceberg-spark-runtime` catalog replaces this class
  * verbatim behind the same five methods.
  */
final class SnapshotTable(spark: SparkSession, root: String, name: String) {

  private val base = new Path(root, name)
  private val snapsDir = new Path(base, "_snapshots")
  private def fs: FileSystem = base.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(v: Int) = new Path(snapsDir, f"v$v%06d.manifest")

  def latestVersion: Option[Int] = {
    if (!fs.exists(snapsDir)) return None
    val vs = fs.listStatus(snapsDir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toInt)
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def readManifest(v: Int): (Seq[String], Map[String, String]) = {
    val in = fs.open(manifestPath(v))
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val lines = content.split("\n").filter(_.nonEmpty)
    val dirs = lines.filter(_.startsWith("dir=")).map(_.stripPrefix("dir=")).toSeq
    val meta = lines.filter(_.startsWith("meta."))
      .map { l => val Array(k, v2) = l.stripPrefix("meta.").split("=", 2); k -> v2 }.toMap
    (dirs, meta)
  }

  def meta: Map[String, String] =
    latestVersion.map(readManifest(_)._2).getOrElse(Map.empty)

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
    vs.find(v => readManifest(v)._2.get("wave").exists(_.toInt < waveExclusive))
  }

  def isEmptyAt(version: Option[Int]): Boolean =
    version.isEmpty || readManifest(version.get)._1.isEmpty

  def readVersion(v: Int): DataFrame = {
    val (dirs, _) = readManifest(v)
    spark.read.parquet(dirs: _*)
  }

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
    * write + atomic rename, milliseconds; no Spark job).
    */
  def publishStaged(dataDir: String, wave: Int,
                    metaKv: Map[String, String] = Map.empty,
                    append: Boolean = true): Unit = {
    val prevDirs: Seq[String] =
      if (append) latestVersion.map(readManifest(_)._1).getOrElse(Nil) else Nil
    publishDirs(prevDirs.filterNot(_ == dataDir) :+ dataDir, wave, metaKv)
  }

  private def publishDirs(dirs: Seq[String], wave: Int,
                          metaKv: Map[String, String]): Unit = {
    val v = latestVersion.getOrElse(-1) + 1
    val body = (dirs.map("dir=" + _) ++
      (metaKv + ("wave" -> wave.toString)).map { case (k, v2) => s"meta.$k=$v2" })
      .mkString("", "\n", "\n")
    fs.mkdirs(snapsDir)
    val tmp = new Path(snapsDir, s".v$v.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, manifestPath(v)))
      throw new IllegalStateException(s"snapshot commit race on $name v$v")
  }

  /** Dirs visible in version `v`, optionally restricted to the given shard
    * ids (sharded layout, see [[commitSharded]]).
    */
  def versionDirs(v: Int, shards: Option[Set[Int]] = None): Seq[String] = {
    val all = readManifest(v)._1
    shards match {
      case None => all
      case Some(s) => all.filter(d => SnapshotTable.shardIdOf(d).exists(s.contains))
    }
  }

  /** Total bytes under version `v`'s data dirs — a driver-side listing, used
    * to decide whether shard-pruned reads are worth an extra planning job.
    */
  def versionBytes(v: Int): Long =
    readManifest(v)._1.map { d =>
      val p = new Path(d)
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }.sum

  /** Iceberg-style sharded commit: `df` holds ONLY the shards this wave
    * touched (one or more rows each, `shardCol: int`); each touched shard is
    * written to its own `data/wave=<w>/shard_p=<s>/` dir and the new manifest
    * references the UNTOUCHED shards' existing dirs from the previous
    * snapshot unchanged. A wave therefore commits only touched-shard bytes —
    * the reuse behavior a real Iceberg manifest provides — instead of
    * rewriting the full table. Readers see each shard exactly once per
    * version ([[versionDirs]] prunes by shard id for partial reads).
    */
  def commitSharded(df: DataFrame, shardCol: String, wave: Int,
                    metaKv: Map[String, String] = Map.empty): Unit = {
    import org.apache.spark.sql.functions.col
    val dataDir = new Path(base, s"data/wave=$wave")
    // shard_p duplicates shardCol so the value survives in the file data
    // (partitionBy strips its column) — readers need it without relying on
    // partition-path inference over hand-listed leaf dirs
    df.withColumn("shard_p", col(shardCol))
      .write.partitionBy("shard_p").mode(SaveMode.Overwrite)
      .parquet(dataDir.toString)
    val touchedDirs =
      if (!fs.exists(dataDir)) Seq.empty[String]
      else fs.listStatus(dataDir).map(_.getPath)
        .filter(_.getName.startsWith("shard_p=")).map(_.toString).toSeq.sorted
    val touchedIds = touchedDirs.flatMap(SnapshotTable.shardIdOf).toSet
    val prevDirs = latestVersion.map(readManifest(_)._1).getOrElse(Nil)
    prevDirs.find(d => SnapshotTable.shardIdOf(d).isEmpty).foreach { d =>
      throw new IllegalStateException(
        s"$name: non-sharded dir $d in the prior snapshot — this store was " +
          "written by an older (whole-table-commit) engine version; start a " +
          "fresh crawl store")
    }
    val carried = prevDirs.filter(d =>
      !touchedIds.contains(SnapshotTable.shardIdOf(d).get))
    publishDirs(carried ++ touchedDirs, wave, metaKv)
  }

  /** Commit `df` as partition `wave=<wave>`. `append=false` → the new
    * snapshot sees ONLY this wave (frontier semantics: full replace);
    * `append=true` → previous dirs + this one (seen/lineage/questions logs).
    */
  def commit(df: DataFrame, wave: Int, metaKv: Map[String, String] = Map.empty,
             append: Boolean = true): Unit =
    publishStaged(stage(df, wave), wave, metaKv, append)

  def isEmpty: Boolean = latestVersion.isEmpty ||
    readManifest(latestVersion.get)._1.isEmpty

  /** Read the latest snapshot (empty DataFrame with no snapshot is the
    * caller's job to handle via isEmpty).
    */
  def read(): DataFrame = {
    val (dirs, _) = readManifest(latestVersion.getOrElse(
      throw new IllegalStateException(s"no snapshot for $name")))
    spark.read.parquet(dirs: _*)
  }

  /** Truncate: next snapshot sees nothing (used to mark frontier-exhausted). */
  def commitEmpty(wave: Int, metaKv: Map[String, String] = Map.empty): Unit = {
    val v = latestVersion.getOrElse(-1) + 1
    val body = (metaKv + ("wave" -> wave.toString))
      .map { case (k, v2) => s"meta.$k=$v2" }.mkString("", "\n", "\n")
    fs.mkdirs(snapsDir)
    val tmp = new Path(snapsDir, s".v$v.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    fs.rename(tmp, manifestPath(v))
  }
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
}
