package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ToolSession

/** Master-resolution contract for the CLI tool mains: a spark-submit-supplied
  * master (the `spark.master` system property) must win over the single-JVM
  * default, otherwise the tools silently override `spark-submit --master ...`
  * back to `local[cpus]` and the multi-executor evidence mode never engages.
  * (The GRAFT_MASTER env override outranks both; env vars are immutable
  * in-JVM, so that leg is exercised by the local-cluster drives documented
  * in BASELINE.md rather than here.)
  */
class ToolSessionSpec extends AnyFunSuite {

  test("resolveMaster defaults to local[cpus] with no override") {
    assume(sys.env.get("GRAFT_MASTER").isEmpty)
    val prev = sys.props.remove("spark.master")
    try assert(ToolSession.resolveMaster("7") == "local[7]")
    finally prev.foreach(sys.props.put("spark.master", _))
  }

  test("resolveMaster honors a spark-submit-supplied spark.master property") {
    assume(sys.env.get("GRAFT_MASTER").isEmpty)
    val prev = sys.props.put("spark.master", "local-cluster[2,4,2048]")
    try assert(ToolSession.resolveMaster("32") == "local-cluster[2,4,2048]")
    finally prev match {
      case Some(v) => sys.props.put("spark.master", v)
      case None    => sys.props.remove("spark.master")
    }
  }
}
