package graft.operators

import org.apache.spark.sql.Dataset

/** WARC ingestion (round 13, mm19) — the wire format 100 TB crawl
  * corpora actually arrive in: a `.warc.gz` file is a concatenation
  * of independently-gzipped WARC/1.0 records (ISO 28500), and the
  * ingestion step every training-data pipeline starts with is
  * "decompress the member, parse the record grammar, pull the HTTP
  * response body out, fold text stats". Both sides of that step are
  * real here: the member is compressed with genuine DEFLATE
  * (java.util.zip.GZIPOutputStream) and decoded by a reader that
  * trusts ONLY the bytes — gzip magic sniff, streaming inflate with
  * the format's own CRC-32 + ISIZE verification (GZIPInputStream
  * enforces both at member end), the WARC version line, header
  * grammar (CRLF-terminated `Name: value` pairs), the declared
  * Content-Length against the actual block, and the embedded HTTP
  * response framing. A flipped byte anywhere in the compressed
  * member fails the inflate or the CRC; a tampered Content-Length
  * fails the length check; truncation fails the EOF check — all
  * quarantine as ok=false, never an exception.
  *
  * Reference behavior context: watermill-kinesis ships opaque binary
  * payloads (marshaller.go:28-71); this is the engine-side decode of
  * the commonest real payload wire a crawl pipeline puts in them.
  *
  * Scale shape: one record per row, decode inside the partition
  * iterator (mapPartitions), payload bytes never shuffle — the
  * output row carries counts and a 32-char digest only. On a real
  * `.warc.gz` the gzip-member boundary IS the record boundary, so
  * the same per-member decode parallelizes by file split.
  */
object Warc {

  /** One parsed WARC response record's ingestion row. */
  final case class WarcRow(docId: Long, warcType: String, contentLength: Long,
                           nWords: Long, nChars: Long, bodyMd5: String,
                           ok: Boolean)

  private val CRLF = "\r\n"

  /** The planted body text: (24 + id%9) fixed-width tokens
    * `w<2-digit>` joined by single spaces — a closed form both
    * engines rebuild exactly, so the gzip round trip is verified by
    * the body's md5, not by trusting the wire. */
  def plantedBody(docId: Long): String =
    (0 until (24 + java.lang.Math.floorMod(docId, 9L)).toInt).map { j =>
      val num = java.lang.Math.floorMod(docId * 7 + j * 13, 50L)
      f"w$num%02d"
    }.mkString(" ")

  /** A complete WARC/1.0 response record, individually gzipped —
    * exactly one member of a standard `.warc.gz`. */
  def plantedWarcBytes(docId: Long): Array[Byte] =
    warcBytes(docId, plantedBody(docId), "text/plain")

  /** The general member builder: any body, any declared MIME type —
    * mm19 plants text/plain, p13's crawl members carry text/html.
    * `targetUri` defaults to the historical per-doc URI; p13's crawl
    * members pass [[crawlUri]]'s spelling variants. */
  def warcBytes(docId: Long, body: String, contentType: String,
                targetUri: String = null): Array[Byte] = {
    val uri =
      if (targetUri == null) s"https://example.com/doc/$docId" else targetUri
    val http = "HTTP/1.1 200 OK" + CRLF +
      s"Content-Type: $contentType" + CRLF + CRLF + body
    val record = "WARC/1.0" + CRLF +
      "WARC-Type: response" + CRLF +
      s"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-${"%012d".format(docId)}>" + CRLF +
      s"WARC-Target-URI: $uri" + CRLF +
      "Content-Type: application/http; msgtype=response" + CRLF +
      s"Content-Length: ${http.getBytes("UTF-8").length}" + CRLF +
      CRLF + http + CRLF + CRLF
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record.getBytes("UTF-8")); gz.close()
    bos.toByteArray
  }

  /** One decoded WARC member: record type, declared length, the
    * WARC-Target-URI header (the url-dedup key a crawl pipeline
    * canonicalizes FIRST), the HTTP response body — or ok=false with
    * a best-effort type on any wire failure (bad gzip CRC, grammar,
    * length lie, framing). */
  final case class WarcDoc(warcType: String, contentLength: Long,
                           body: String, ok: Boolean,
                           targetUri: String = "")

  /** Decode one gzipped WARC member to its HTTP body, trusting only
    * the bytes. The grammar/integrity core shared by mm19's stats
    * ingest and p13's crawl-curate pipeline. */
  def parseWarcDoc(payload: Array[Byte]): WarcDoc = {
    val none = WarcDoc("unknown", 0L, "", false)
    if (payload == null || payload.length < 3 ||
        (payload(0) & 0xff) != 0x1f || (payload(1) & 0xff) != 0x8b) return none
    val inflated = {
      // readAllBytes drains to EOF, which triggers GZIP's own CRC-32
      // + ISIZE trailer verification. close() in finally matters at
      // corpus scale: it end()s the native zlib inflater immediately
      // — leaking it to the GC cleaner accumulates ~10s of KB of
      // native state per record across a long-lived executor.
      var in: java.util.zip.GZIPInputStream = null
      try {
        in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(payload))
        in.readAllBytes()
      } catch { case _: java.io.IOException => return none.copy(warcType = "warc") }
      finally if (in != null) in.close()
    }
    val text = new String(inflated, "UTF-8")
    val headEnd = text.indexOf(CRLF + CRLF)
    if (headEnd < 0) return none.copy(warcType = "warc")
    val headLines = text.substring(0, headEnd).split(CRLF)
    if (headLines.isEmpty || headLines(0) != "WARC/1.0")
      return none.copy(warcType = "warc")
    val headers = headLines.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.substring(0, i).trim -> l.substring(i + 1).trim)
    }.toMap
    val warcType = headers.getOrElse("WARC-Type", "")
    val declaredLen = headers.get("Content-Length").flatMap(_.toLongOption)
      .getOrElse(-1L)
    val blockStart = headEnd + 4
    // the record block must be exactly Content-Length bytes followed
    // by the record separator CRLF CRLF
    val blockBytes = inflated.length - blockStart - 4
    if (declaredLen < 0 || blockBytes != declaredLen ||
        !text.endsWith(CRLF + CRLF))
      return none.copy(warcType = if (warcType.nonEmpty) warcType else "warc")
    val block = text.substring(blockStart, blockStart + declaredLen.toInt)
    // HTTP response framing inside the block
    val httpEnd = block.indexOf(CRLF + CRLF)
    if (!block.startsWith("HTTP/1.1") || httpEnd < 0)
      return none.copy(warcType = warcType)
    WarcDoc(warcType, declaredLen, block.substring(httpEnd + 4), true,
      headers.getOrElse("WARC-Target-URI", ""))
  }

  /** Decode one gzipped WARC member to mm19's ingestion-stats row. */
  def parseWarc(payload: Array[Byte]): WarcRow = {
    val doc = parseWarcDoc(payload)
    if (!doc.ok)
      return WarcRow(0L, doc.warcType, 0L, 0L, 0L, "", false)
    val words = if (doc.body.trim.isEmpty) Array.empty[String]
      else doc.body.trim.split("\\s+")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(doc.body.getBytes("UTF-8")).map("%02x".format(_)).mkString
    WarcRow(0L, doc.warcType, doc.contentLength, words.length.toLong,
      words.map(_.length.toLong).sum, md5, true)
  }

  /** Per-partition batch WARC ingest — the same mapPartitions
    * contract as the media decoders, inflate + grammar inside. */
  def parseWarcBatch(media: Dataset[MediaDecode.Media]): Dataset[WarcRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => parseWarc(m.payload).copy(docId = m.docId)))
  }

  /** The raw WARC-Target-URI spelling for crawl doc `id` (round 14):
    * every page's canonical identity is
    * `site<pageKey%5>.example.com/page/<pageKey>`, but the header
    * carries it in one of four spellings (scheme case, www, query
    * string, fragment, trailing slash) by id, and a class-2 re-crawl
    * spells its partner's URL in yet another variant — so only REAL
    * canonicalization (d7's kernel), never raw string equality,
    * collapses the url-duplicate groups. */
  def crawlUri(id: Long): String = {
    val pageKey = Html.crawlPageKey(id)
    val host = s"site${java.lang.Math.floorMod(pageKey, 5L)}.example.com"
    val path = s"/page/$pageKey"
    if (java.lang.Math.floorMod(id, 11L) == 2L)
      "HTTP://WWW." + (host + path).toUpperCase + "/?b=2&a=1"
    else java.lang.Math.floorMod(id, 4L) match {
      case 0L => "https://www." + host + path
      case 1L => "http://" + host + path + "/"
      case 2L => "HTTPS://" + (host + path).toUpperCase + "?utm_source=feed"
      case _  => "https://" + host + path + "#frag"
    }
  }

  /** The crawl-curate corpus plant (p13): one .warc.gz member whose
    * HTTP body is [[Html.crawlHtml]]'s class-engineered page, whose
    * WARC-Target-URI is [[crawlUri]]'s spelling variant — and for
    * id ≡ 7 (mod 11) a bit flipped mid-member, so the DEFLATE stream
    * or its CRC-32 trailer breaks and the decode gate fires. ONE
    * definition shared by the batch query, the live crawlCurateStream
    * spec, and the bench throughput leg. */
  def plantedCrawlBytes(id: Long): Array[Byte] = {
    val wire = warcBytes(id, Html.crawlHtml(id), "text/html", crawlUri(id))
    if (java.lang.Math.floorMod(id, 11L) == 7L)
      wire(wire.length - 5) = (wire(wire.length - 5) ^ 0x41).toByte
    wire
  }
}
