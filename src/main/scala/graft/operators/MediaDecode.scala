package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Batch media-decode seam (SURVEY.md §2.F).
  *
  * In a production pipeline this is where an image/audio/video codec
  * decodes the opaque `binary` payload per partition (the JVM analog
  * of a Pandas-UDF/mapInPandas batch). The container has no media
  * libraries, so `decode` is a clearly-marked deterministic STUB —
  * but the batch shape (mapPartitions over (id, payload) → typed
  * Dataset, codec instantiated once per partition, never per row) is
  * the real contract a codec drops into.
  */
object MediaDecode {

  case class Media(docId: Long, payload: Array[Byte])
  case class DecodedMeta(docId: Long, nBytes: Long, width: Int, height: Int, ok: Boolean)

  /** STUB decoder: byte-length-derived "dimensions". A real
    * implementation replaces only this function. */
  private def decode(payload: Array[Byte]): (Int, Int, Boolean) = {
    if (payload == null || payload.isEmpty) (0, 0, false)
    else ((payload.length * 31) % 1920, (payload.length * 17) % 1080, true)
  }

  /** Per-partition batch decode: expensive per-partition setup happens
    * once (here trivially; a codec would allocate decoders/buffers). */
  def decodeBatch(media: Dataset[Media]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec setup would go here
      rows.map { m =>
        val (w, h, ok) = decode(m.payload)
        DecodedMeta(m.docId, if (m.payload == null) 0L else m.payload.length.toLong, w, h, ok)
      }
    }
  }
}
