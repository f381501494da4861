package org.apache.spark.sql.graftvec

import org.apache.spark.sql.SparkSession

/** `SparkSession.sessionUUID` is `private[sql]`, so the one accessor
  * graft's per-(session, artifact) caches need lives in this
  * sql-subpackage seam (the same placement reason as the codegen
  * kernels here). A UUID key cannot collide the way
  * `System.identityHashCode` can between a stopped and a live
  * session. */
object SessionIds {
  def uuid(s: SparkSession): String = s match {
    case c: org.apache.spark.sql.classic.SparkSession => c.sessionUUID
    case other => s"idhash-${System.identityHashCode(other)}"
  }
}
