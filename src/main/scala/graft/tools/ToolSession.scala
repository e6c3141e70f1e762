package graft.tools

import org.apache.spark.sql.SparkSession

/** Session builder shared by the CLI tools: honors `GRAFT_MASTER`, wiring
  * the extra configs `local-cluster[W,C,MB]` needs (executor heap from the
  * master string's MB field; the project classes dir forwarded via
  * `spark.executor.extraClassPath`, since executor JVMs are spawned from
  * SPARK_HOME and know nothing of the sbt classpath). `local-cluster` is
  * the multi-executor evidence mode: W separate executor JVMs through the
  * standalone-deploy path, so every broadcast, shuffle block, task closure
  * and accumulator crosses a real process boundary — run with
  * `SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13` (the launcher needs
  * both to build executor commands from a release layout).
  */
object ToolSession {

  /** Master resolution shared by every tool main. Precedence: explicit
    * GRAFT_MASTER > a master already supplied by spark-submit (arrives as
    * the spark.master system property — without this the tools silently
    * override `spark-submit --master ...` back to local[cpus], defeating
    * the submit) > single-JVM default.
    */
  def resolveMaster(cpus: String): String =
    sys.env.get("GRAFT_MASTER")
      .orElse(sys.props.get("spark.master"))
      .getOrElse(s"local[$cpus]")

  /** The extra configs `local-cluster[W,C,MB]` needs: executor heap from
    * the master string's MB field, and the compiled classes dir forwarded
    * to the executor JVMs (they are spawned from SPARK_HOME and know
    * nothing of the sbt classpath; harmless when the code arrives via a
    * spark-submit jar instead).
    */
  def configureCluster(b: SparkSession.Builder, master: String): SparkSession.Builder = {
    if (master.startsWith("local-cluster")) {
      val mb = master.stripPrefix("local-cluster[").stripSuffix("]")
        .split(",")(2).trim
      b.config("spark.executor.memory", s"${mb}m")
        .config("spark.executor.extraClassPath",
          sys.props.getOrElse("graft.classes",
            new java.io.File("target/scala-2.13/classes").getAbsolutePath))
    } else b
  }

  def build(app: String, cpus: String): SparkSession = {
    val master = resolveMaster(cpus)
    val b = SparkSession.builder()
      .master(master)
      .appName(app)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val s = configureCluster(b, master).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
