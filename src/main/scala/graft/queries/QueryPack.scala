package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A family of named operators: the Spark-first implementation plus an
  * equivalent DuckDB SQL oracle (omitted for ops SQL can't express —
  * those get rows-only checks + ScalaTest specs).
  */
trait QueryPack {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
