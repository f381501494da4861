package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Batch media-decode seam (SURVEY.md §2.F).
  *
  * In a production pipeline this is where an image/audio/video codec
  * decodes the opaque `binary` payload per partition (the JVM analog
  * of a Pandas-UDF/mapInPandas batch). Since round 10 the CONTAINER
  * HEADER layer is real: [[parseHeader]] reads genuine BMP/WAV byte
  * layouts (magic tags, little-endian dimension/rate fields) and
  * mm11 is its oracle-checked columnar twin. Only the pixel/PCM DATA
  * decode — which needs a codec library this container lacks — stays
  * a clearly-marked deterministic STUB (`decode`). The batch shape
  * (mapPartitions over (id, payload) → typed Dataset, codec
  * instantiated once per partition, never per row) is the real
  * contract a codec drops into.
  */
object MediaDecode {

  case class Media(docId: Long, payload: Array[Byte])
  case class DecodedMeta(docId: Long, nBytes: Long, width: Int, height: Int, ok: Boolean)
  case class MediaHeader(docId: Long, container: String, width: Long, height: Long,
                         sampleRate: Long, nChannels: Long, ok: Boolean)

  /** STUB decoder: byte-length-derived "dimensions". A real
    * implementation replaces only this function. */
  private def decode(payload: Array[Byte]): (Int, Int, Boolean) = {
    if (payload == null || payload.isEmpty) (0, 0, false)
    else ((payload.length * 31) % 1920, (payload.length * 17) % 1080, true)
  }

  private def u16le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8)
  private def u32le(b: Array[Byte], off: Int): Long =
    u16le(b, off) | (u16le(b, off + 2) << 16)

  /** REAL container-header parse over genuine binary files (round 10
    * — mm11's JVM-bytes twin): BMP ('BM', u32-LE DIB size 40 @14,
    * width @18, height @22) and WAV ('RIFF' @0 + 'WAVE' @8 +
    * 'fmt ' @12, u16-LE channels @22, u32-LE sample rate @24). This
    * is no longer a stub — only pixel/PCM DATA decode (which needs a
    * codec library this container lacks) remains behind [[decode]].
    * Unknown or truncated payloads come back container="unknown",
    * ok=false — the quarantine row, never an exception. */
  def parseHeader(payload: Array[Byte]): (String, Long, Long, Long, Long, Boolean) = {
    def tag(off: Int, t: String): Boolean =
      payload.length >= off + t.length &&
        t.zipWithIndex.forall { case (c, i) => (payload(off + i) & 0xff) == c.toInt }
    if (payload == null || payload.length < 26) ("unknown", 0L, 0L, 0L, 0L, false)
    else if (tag(0, "BM"))
      ("bmp", u32le(payload, 18), u32le(payload, 22), 0L, 0L, u32le(payload, 14) == 40L)
    else if (payload.length >= 28 && tag(0, "RIFF") && tag(8, "WAVE"))
      ("wav", 0L, 0L, u32le(payload, 24), u16le(payload, 22),
        tag(12, "fmt ") && u16le(payload, 20) == 1L)
    else ("unknown", 0L, 0L, 0L, 0L, false)
  }

  /** Per-partition batch header parse — same mapPartitions contract
    * as [[decodeBatch]], real parser inside. */
  def parseHeaderBatch(media: Dataset[Media]): Dataset[MediaHeader] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val (c, w, h, r, ch, ok) = parseHeader(m.payload)
        MediaHeader(m.docId, c, w, h, r, ch, ok)
      }
    }
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
