package graft.operators

import scala.collection.mutable.ArrayBuffer

/** HTML → text extraction (round 13, t31) — the step between WARC
  * ingestion (mm19) and every text operator in §2.E: crawl corpora
  * arrive as HTML, and the pipeline's first text transform is "strip
  * the markup, keep the prose". This is a real single-pass state
  * machine over the wire, not a regex: tags are parsed with
  * quote-aware attribute scanning (a `>` inside `href="a>b"` does
  * not close the tag), `<script>`/`<style>` bodies are raw text (a
  * `<div>` inside a JS string literal must not leak into the
  * extraction), `<!-- comments -->` are skipped wholesale, character
  * entities are decoded (named, `&#NN;` decimal, `&#xHH;` hex —
  * unknown entities pass through literally, as browsers do), and
  * block-level elements break the text into blocks whose inner
  * whitespace collapses to single spaces. The extracted document is
  * the non-empty blocks joined by `\n` — a deterministic closed form
  * the DuckDB oracle rebuilds without touching any HTML.
  *
  * Reference behavior context: watermill-kinesis treats payloads as
  * opaque bytes end-to-end (marshaller.go:28-44); this is the
  * engine-side decode of the commonest text payload those bytes
  * carry in a crawl pipeline.
  *
  * Scale shape: one char walk per document inside the partition
  * iterator (mapPartitions), no shuffle sees markup — the output row
  * carries the title, counts, and a 32-char digest. The extractor is
  * O(length) with no backtracking (the raw-text scan indexes a
  * precomputed lowercase copy once per doc).
  */
object Html {

  /** One extracted document. */
  final case class HtmlDoc(title: String, text: String, nBlocks: Long)

  /** Tags that break text flow (HTML's block-level / table / list /
    * sectioning elements, plus head-only elements whose text stands
    * alone). Inline elements (`a`, `b`, `span`, …) keep the flow. */
  private val BlockTags = Set(
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
    "ol", "tr", "td", "th", "table", "title", "head", "body", "html",
    "header", "footer", "section", "article", "blockquote", "pre",
    "hr", "nav", "aside", "form", "figure", "figcaption")

  private def decodeEntity(e: String): String = e match {
    case "amp"  => "&"
    case "lt"   => "<"
    case "gt"   => ">"
    case "quot" => "\""
    case "apos" => "'"
    case "nbsp" => " "
    case _ if (e.startsWith("#x") || e.startsWith("#X")) && e.length > 2 =>
      try new String(Character.toChars(Integer.parseInt(e.substring(2), 16)))
      catch { case _: RuntimeException => null }
    case _ if e.startsWith("#") && e.length > 1 =>
      try new String(Character.toChars(Integer.parseInt(e.substring(1))))
      catch { case _: RuntimeException => null }
    case _ => null
  }

  /** Extract (title, text, block count) from an HTML string. Never
    * throws: malformed markup (unclosed tags/comments/scripts,
    * bogus entities) degrades exactly the way a browser degrades. */
  def extract(html: String): HtmlDoc = {
    val n = html.length
    val lower = html.toLowerCase(java.util.Locale.ROOT)
    val blocks = ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var title: String = ""
    // block count at `<title>` open, -1 when not inside a title: the
    // close-tag assignment must only fire when the title element
    // actually flushed a new block (an empty `<title></title>` must
    // not steal the preceding block's text)
    var titleBlocksAt = -1
    var i = 0

    def flush(): Unit = {
      // collapse intra-block whitespace runs, trim
      val parts = cur.toString.split("\\s+").filter(_.nonEmpty)
      if (parts.nonEmpty) blocks += parts.mkString(" ")
      cur.setLength(0)
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && (html.charAt(j).isLetter || html.charAt(j).isDigit)) j += 1
          val name = lower.substring(nameStart, j)
          // scan to the tag's real end: '>' outside attribute quotes
          var quote: Char = 0
          var k = j
          var end = -1
          while (k < n && end < 0) {
            val ch = html.charAt(k)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '>') end = k
            k += 1
          }
          i = if (end < 0) n else end + 1
          if (name.nonEmpty && BlockTags.contains(name)) flush()
          if (name == "title") {
            if (closing) {
              if (titleBlocksAt >= 0 && blocks.length > titleBlocksAt)
                title = blocks.last
              titleBlocksAt = -1
            } else titleBlocksAt = blocks.length
          }
          if (!closing && (name == "script" || name == "style")) {
            // raw-text element: nothing inside is markup until the
            // matching close tag (or EOF for a truncated page). The
            // close tag's name must be FOLLOWED by '>', '/', or
            // whitespace (HTML spec) — `</scripty>` inside a script
            // body must not end raw-text mode early
            var close = lower.indexOf("</" + name, i)
            while (close >= 0 && {
              val after = close + 2 + name.length
              after < n && {
                val ch = html.charAt(after)
                ch != '>' && ch != '/' && !ch.isWhitespace
              }
            }) close = lower.indexOf("</" + name, close + 1)
            i = if (close < 0) n else close // tag parser consumes the close
          }
        }
      } else if (c == '&') {
        // bounded lookahead: only entities within 10 chars of the '&'
        // are decodable, so never scan past that window — an unbounded
        // indexOf would make an '&'-dense, semicolon-free adversarial
        // page O(n^2)
        var semi = -1
        var k = i + 1
        val lim = math.min(n, i + 11)
        while (semi < 0 && k < lim) {
          if (html.charAt(k) == ';') semi = k
          k += 1
        }
        val dec =
          if (semi > i) decodeEntity(html.substring(i + 1, semi))
          else null
        if (dec != null) { cur.append(dec); i = semi + 1 }
        else { cur.append(c); i += 1 }
      } else {
        cur.append(c)
        i += 1
      }
    }
    flush()
    HtmlDoc(title, blocks.mkString("\n"), blocks.length.toLong)
  }

  // ---------------------------------------------------------------
  // Planted wires (t31): a genuine page exercising every extractor
  // path — entities in the title, raw-text style/script bodies
  // containing decoy markup, a comment containing a decoy block, a
  // quoted '>' inside an attribute, an inline element mid-sentence,
  // and numeric entities. The extraction has a closed form both
  // engines rebuild exactly.
  // ---------------------------------------------------------------

  /** md5 of a UTF-8 string as 32 lowercase hex chars — the digest the
    * DuckDB oracle's `md5()` computes over the same closed form. */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The planted paragraph: (20 + id%11) fixed-width tokens
    * `v<2-digit>` joined by single spaces. */
  def plantedPara(docId: Long): String =
    (0 until (20 + java.lang.Math.floorMod(docId, 11L)).toInt).map { j =>
      val num = java.lang.Math.floorMod(docId * 5 + j * 17, 60L)
      f"v$num%02d"
    }.mkString(" ")

  // ---------------------------------------------------------------
  // Crawl-curate plants (p13): one page per doc, paragraph content
  // engineered per class so every curate disposition fires — the
  // page chrome (title, heading, script decoy, comment) is constant
  // so content dedup keys on the PARAGRAPH, as a boilerplate-aware
  // pipeline would after template removal.
  // ---------------------------------------------------------------

  /** The crawl paragraph for doc `docId` (class by id mod 11):
    *  - 3  → 24 German function words (language gate)
    *  - 5  → 2 words (length gate)
    *  - 9  → 24 punctuation-heavy tokens (quality gate)
    *  - 1  → normal tokens keyed on the PAIR leader ((id-1)/22*22+1),
    *         so consecutive residue-1 ids share a body (dedup gate)
    *  - else normal tokens keyed on the id (keep)
    * Residue 7 never reaches this: its gzip member is tampered
    * upstream (decode gate). */
  def crawlPara(docId: Long): String = {
    val de = Seq("der", "die", "das", "und", "nicht")
    java.lang.Math.floorMod(docId, 11L) match {
      case 3L => (0 until 24).map(j => de(j % 5)).mkString(" ")
      case 5L => "tiny page"
      case 9L => (0 until 24).map { j =>
        s"x${java.lang.Math.floorMod(docId * 3 + j, 10L)}!!!"
      }.mkString(" ")
      case 1L => crawlTokens((docId - 1L) / 22L * 22L + 1L)
      // the THIN class (round 14): 15 content words — too short on
      // its own, but the 10-word site banner inflates the raw count
      // past the 20-word floor. Only template removal before the
      // length gate catches it: keep without the strip, too_short
      // with it — the disposition shift that proves the strip stage
      // is load-bearing, not decorative.
      case 4L => (s"u$docId" +: (1 until 15).map { j =>
        val num = java.lang.Math.floorMod(docId * 3 + j * 7, 40L)
        f"c$num%02d"
      }).mkString(" ")
      // the LEAKY LONG class (round 15): a 52-word page that embeds
      // the 11-word eval excerpt of doc 13 (the first nonzero eval
      // id — 13 % 11 = 2, wire-ok, standard page shape) between
      // doc-unique filler. 11 of 53 post-strip words ≈ 0.21 coverage:
      // UNDER t26's 0.3 drop bar, so the decontam stage must REDACT,
      // not drop — the class that proves the redact path fires. An
      // id ≡ 8 (mod 11) doc that is ALSO an eval doc (≡ 0 mod 13)
      // self-leaks its own excerpt too: two merged spans, 22/53 ≈
      // 0.42 coverage → drop — the multi-span merge case.
      case 8L =>
        ((s"u$docId" +: (1 until 15).map { j =>
          val num = java.lang.Math.floorMod(docId * 3 + j * 7, 40L)
          f"c$num%02d"
        }) ++ Seq("Page", "u13") ++ (1 until 10).map { j =>
          val num = java.lang.Math.floorMod(13L * 3 + j * 7, 40L)
          f"c$num%02d"
        } ++ (15 until 41).map { j =>
          val num = java.lang.Math.floorMod(docId * 3 + j * 7, 40L)
          f"c$num%02d"
        }).mkString(" ")
      case _  => crawlTokens(docId)
    }
  }

  /** A key-unique leading token + 23 filler tokens: bodies are equal
    * exactly when keys are equal (the filler alone would collide for
    * keys congruent mod 40 and fabricate duplicates). */
  private def crawlTokens(key: Long): String =
    (s"u$key" +: (1 until 24).map { j =>
      val num = java.lang.Math.floorMod(key * 3 + j * 7, 40L)
      f"c$num%02d"
    }).mkString(" ")

  /** The page's URL-group key: class-2 docs (id ≡ 2 mod 11) are
    * re-crawls of doc id-2's page (always class 0) under a different
    * URL spelling — same canonical URL, so the url-dedup gate must
    * collapse them. Everyone else owns their page. */
  def crawlPageKey(id: Long): Long =
    if (java.lang.Math.floorMod(id, 11L) == 2L) id - 2L else id

  /** The per-HOST site banner (round 14): exactly 10 words — one
    * aligned t21 segment — stamped on every page a host serves, the
    * chrome a per-source template miner must name and the strip stage
    * must remove before the language/length gates (it carries an
    * English stopword and inflates word counts). The host index is
    * the page key's, so a re-crawl carries its canonical host's
    * banner. */
  def crawlBanner(docId: Long): String =
    s"all pages on site${java.lang.Math.floorMod(crawlPageKey(docId), 5L)} " +
      "are served with cookies and tracking"

  /** The crawl page: per-host banner chrome (so dedup must key on
    * template-STRIPPED content), the class paragraph, plus a script
    * decoy and comment to keep the extraction honest. Extracted
    * closed form: `<banner>\nPage\n<para>` — the banner is words
    * 0..9, segment-aligned. */
  def crawlHtml(docId: Long): String =
    "<html><head>" +
      "<script>var t = \"<p>decoy</p>\";</script></head>\n" +
      "<body><!-- chrome <div>skip</div> -->\n" +
      s"<div>${crawlBanner(docId)}</div>\n" +
      "<h1>Page</h1>\n" +
      s"<p>${crawlPara(docId)}</p>\n" +
      "</body></html>\n"

  /** A complete planted page for doc `docId`. Extracted closed form:
    * `Doc <id> & friends\nHeading <id>\n<para>\nTail <<id%7>> end
    * link<id> AB` (4 blocks). */
  def plantedHtml(docId: Long): String = {
    val para = plantedPara(docId)
    val m = java.lang.Math.floorMod(docId, 7L)
    "<!DOCTYPE html>\n<html>\n<head>\n" +
      s"<title>Doc $docId &amp; friends</title>\n" +
      "<style>\np > a { color: #fff; }\n.nav { content: \"<p>css</p>\"; }\n</style>\n" +
      "<script>\nif (a<b && c > d) { s = \"<div>js</div>\"; }\n</script>\n" +
      "</head>\n<body>\n" +
      "<!-- nav <p>skip me</p> -->\n" +
      s"<h1>Heading $docId</h1>\n" +
      s"<p>$para</p>\n" +
      s"""<p>Tail &lt;$m&gt; end <a href="/x?a=1>2" class="k">link$docId</a> &#65;&#x42;</p>\n""" +
      "</body>\n</html>\n"
  }
}
