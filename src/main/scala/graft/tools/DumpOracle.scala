package graft.tools

import java.nio.file.{Files, Paths}

/** Dump a registered DuckDB oracle's generated SQL to a file, for ad-hoc
  * debugging of the generator-arithmetic oracles against DuckDB directly
  * (the layered-CTE SQL in QueriesGenOracles is assembled in Scala, so
  * inspecting/running it standalone needs this extraction step).
  *
  * Usage: DumpOracle <queryName> <outPath>
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val Array(name, out) = args
    val sql = graft.SparkEntry.oracleSql.getOrElse(
      name, sys.error(s"no oracle registered for '$name'"))
    Files.writeString(Paths.get(out), sql)
    println(s"wrote ${sql.length} chars to $out")
  }
}
