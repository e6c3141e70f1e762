package graft.tools

import graft.CrawlEngine
import graft.operators.SeenSet
import graft.plans.SnapshotTable

/** Deep-frontier I/O probe (VERDICT r04 next #1 'Done' evidence): run a
  * budget-starved crawl — the shape of a 10^10 frontier where the deferred
  * mass dwarfs the per-wave slice — with frontier pruning forced on, then
  * print per-wave frontier-commit metadata straight from the manifests:
  * dirs read vs skipped, provably-deferred rows skipped, bytes staged vs
  * bytes live. The claim under test: staged bytes track the WAVE SLICE
  * (read dirs + discoveries), not the frontier.
  *
  * Usage: FrontierProbe <sfDir> <amplify> <maxWaves> [budgetMs=1000]
  *                      [gateBytes=0 — pass a huge value for the
  *                       unpruned (always-read) comparison run]
  *                      [tsSlices=4 — pass 1 for the unsliced layout]
  *                      [tsSliceSecs=21600]
  *                      [rankChunks=16 — pass 1 for the unchunked layout]
  */
object FrontierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val amplify = args(1).toInt
    val maxWaves = args(2).toInt
    val budgetMs = if (args.length > 3) args(3).toLong else 1000L
    val gateBytes = if (args.length > 4) args(4).toLong else 0L
    val tsSlices = if (args.length > 5) args(5).toInt else 4
    val tsSliceSecs = if (args.length > 6) args(6).toLong else 21600L
    val rankChunks = if (args.length > 7) args(7).toInt else 16
    val spark = ToolSession.build("graft-frontier-probe", "32")
    val store = java.nio.file.Files.createTempDirectory("graft-fprobe").toString
    val t0 = System.nanoTime()
    val r = CrawlEngine.run(spark, sfDir, store, CrawlEngine.Config(
      waveDurationMs = budgetMs, maxWaves = maxWaves, amplify = amplify,
      strategy = SeenSet.BloomShardExact,
      frontierPruneBytes = gateBytes, // 0 = sidecars + pruning from wave 0
      frontierTsSlices = tsSlices, frontierTsSliceSecs = tsSliceSecs,
      frontierRankChunks = rankChunks))
    val sec = (System.nanoTime() - t0) / 1e9
    val ft = new SnapshotTable(spark, store, "frontier")
    println("wave | live_dirs | read | skipped | skipped_rows | staged_bytes | live_bytes | staged/live")
    for (v <- 1 to ft.latestVersion.get) {
      val m = ft.metaAt(v)
      val staged = m.getOrElse("staged_bytes", "0").toLong
      val live = ft.versionBytes(v)
      val read = m.getOrElse("read_dirs", "?")
      val skipped = m.getOrElse("skipped_dirs", "0")
      val skippedRows = m.getOrElse("skipped_rows", "0")
      val dirs = ft.versionDirs(v).size
      println(f"${m("wave")}%4s | $dirs%9d | $read%4s | $skipped%7s | $skippedRows%12s | $staged%12d | $live%10d | ${if (live > 0) staged.toDouble / live else 0.0}%.3f")
    }
    println(f"""{"waves":${r.waves},"fetched":${r.fetched},"deduped":${r.deduped},"seen_digest":${r.seenDigest},"sec":$sec%.1f}""")
    spark.stop()
    java.nio.file.Files.walk(java.nio.file.Paths.get(store))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(x => java.nio.file.Files.deleteIfExists(x))
  }
}
