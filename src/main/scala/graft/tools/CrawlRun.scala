package graft.tools

import graft.CrawlEngine
import graft.operators.SeenSet

/** CLI entry: run the wave-loop crawl end-to-end on a scale dir.
  *
  * Usage: CrawlRun [sfDir] [storeDir] [strategy: exact|bloomexact|bloomcuckoo]
  *                 [cpus]
  *
  * `GRAFT_MASTER` overrides the Spark master. The value that matters is
  * `local-cluster[W,C,MB]`: unlike `local[N]` (one JVM, executor ==
  * driver), it launches W REAL executor JVMs via the standalone-deploy
  * code path — every broadcast, shuffle block, task closure and
  * accumulator crosses a process boundary exactly as on a multi-executor
  * cluster, so a digest-equal crawl here is direct evidence the engine
  * has no hidden shared-JVM dependency (the north rule's spark-submit
  * criterion, minus only the network). Requires SPARK_HOME (executor
  * launcher) — the compiled classes dir is forwarded to executors via
  * `spark.executor.extraClassPath` automatically.
  */
object CrawlRun {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val store = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-crawl").toString
    val strategy = (if (args.length > 2) args(2) else "bloomexact") match {
      case "exact" => SeenSet.ExactAnti
      case "bloomcuckoo" => SeenSet.BloomCuckoo
      case "shardexact" => SeenSet.BloomShardExact
      case _ => SeenSet.BloomExact
    }
    val cpus = if (args.length > 3) args(3) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val amplify = if (args.length > 4) args(4).toInt else 1
    val waveMs = if (args.length > 5) args(5).toLong else 60000L
    val spark = ToolSession.build("graft-crawl", cpus)

    val t0 = System.nanoTime()
    val r = CrawlEngine.run(spark, sfDir, store,
      CrawlEngine.Config(strategy = strategy, amplify = amplify, waveDurationMs = waveMs))
    val sec = (System.nanoTime() - t0) / 1e9
    val rate = (r.fetched + r.deduped) / sec
    println(f"""{"waves":${r.waves},"fetched":${r.fetched},"deduped":${r.deduped},"errors":${r.errors},"seen_count":${r.seenCount},"seen_digest":${r.seenDigest},"trace_digest":${CrawlEngine.traceDigest(spark, store)},"sec":$sec%.2f,"urls_per_sec":$rate%.1f,"store":"$store"}""")
    spark.stop()
  }
}
