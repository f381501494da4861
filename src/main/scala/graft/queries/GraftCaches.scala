package graft.queries

import org.apache.spark.sql.SparkSession

/** Session identity for per-(session, artifact) caches
  * ([[Pipeline.publishedCard]], Similarity's served-index cache).
  * `System.identityHashCode` is NOT unique — a stopped session and a
  * live one can collide and serve a frame bound to a dead session —
  * so the key is the session's UUID (via the graftvec sql-subpackage
  * seam; the member is private[sql]). */
private[graft] object GraftCaches {
  def sessionKey(s: SparkSession): String =
    org.apache.spark.sql.graftvec.SessionIds.uuid(s)
}
