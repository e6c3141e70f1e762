package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of operator queries (SURVEY.md §2) + DuckDB oracle SQL.
  * Populated incrementally; names are stable across rounds.
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame

  def all: Map[String, Q] = Map.empty

  def oracles: Map[String, String] = Map.empty
}
