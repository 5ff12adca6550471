package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JDK-native PDF / DOCX text extraction (SURVEY §2.1 S7/S8; reference:
  * worker/app/services/parse_pdf.py, parse_docx.py).
  *
  * This environment resolves no external artifacts (no pdfbox/POI), but
  * the JDK suffices for the dominant real-world cases:
  *  - DOCX is a ZIP (java.util.zip) holding `word/document.xml`; the
  *    reference's python-docx joins paragraph texts with newlines — we
  *    concatenate `<w:t>` runs per `<w:p>` paragraph identically.
  *  - PDF text lives in content streams, usually FlateDecode-compressed —
  *    java.util.zip.Inflater decompresses them; text-showing operators
  *    (`(…) Tj`, `TJ` arrays) yield the visible text, with PDF string
  *    escapes and octal codes handled. Covers unencrypted PDFs with
  *    standard one-byte encodings (the pypdf happy path); exotic CMaps
  *    degrade to empty text, never to garbage bytes.
  *
  * Both run as codegen'd expressions over the `binary` content column —
  * a narrow map at any scale, like every other parser branch.
  */
object BinaryDocs {

  // ------------------------------------------------------------------ DOCX

  private val WtRe = java.util.regex.Pattern.compile(
    "<w:t(?: [^>]*)?>(.*?)</w:t>|<w:br/>|<w:tab/>|<w:cr/>", java.util.regex.Pattern.DOTALL)

  private def xmlUnescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")

  /** Spans of the top-level `<tag …>…</tag>` / `<tag/>` blocks in `xml`
    * (nested same-tag blocks stay inside their parent's span — the scan
    * resumes after each block). Boundary-checked so `<w:p` never matches
    * `<w:pPr`.
    */
  private def topBlocks(xml: String, tag: String): Seq[(Int, Int)] = {
    val open = "<" + tag
    val close = "</" + tag + ">"
    def nextOpen(from: Int): Int = {
      var i = xml.indexOf(open, from)
      while (i >= 0) {
        val b = i + open.length
        if (b < xml.length) {
          val c = xml.charAt(b)
          if (c == ' ' || c == '>' || c == '/' || c == '\t' || c == '\n' || c == '\r')
            return i
        }
        i = xml.indexOf(open, i + 1)
      }
      -1
    }
    val out = ArrayBuffer.empty[(Int, Int)]
    var pos = 0
    var s = nextOpen(pos)
    while (s >= 0) {
      val gt0 = xml.indexOf('>', s)
      if (gt0 < 0) return out.toSeq // malformed: stop
      if (xml.charAt(gt0 - 1) == '/') { // self-closing, e.g. <w:p/>
        out += ((s, gt0 + 1)); pos = gt0 + 1
      } else {
        var depth = 1
        var p = gt0 + 1
        var endPos = -1
        while (endPos < 0) {
          val no = nextOpen(p)
          val nc = xml.indexOf(close, p)
          if (nc < 0) { endPos = xml.length } // malformed: to end
          else if (no >= 0 && no < nc) {
            val gt = xml.indexOf('>', no)
            if (gt < 0) { endPos = xml.length }
            else { if (xml.charAt(gt - 1) != '/') depth += 1; p = gt + 1 }
          } else {
            depth -= 1
            p = nc + close.length
            if (depth == 0) endPos = p
          }
        }
        out += ((s, endPos)); pos = endPos
      }
      s = nextOpen(pos)
    }
    out.toSeq
  }

  /** python-docx `Paragraph.text` over one `<w:p>` block: `<w:t>` runs
    * concatenated, `<w:tab/>` → TAB, `<w:br/>`/`<w:cr/>` → newline.
    */
  private def paraText(pXml: String): String = {
    val sb = new java.lang.StringBuilder
    val tm = WtRe.matcher(pXml)
    while (tm.find()) {
      if (tm.group().startsWith("<w:br") || tm.group().startsWith("<w:cr")) sb.append('\n')
      else if (tm.group().startsWith("<w:tab")) sb.append('\t')
      else sb.append(xmlUnescape(tm.group(1)))
    }
    sb.toString
  }

  private def stripSpans(xml: String, spans: Seq[(Int, Int)]): String =
    if (spans.isEmpty) xml
    else {
      val sb = new java.lang.StringBuilder
      var last = 0
      spans.foreach { case (s, e) => sb.append(xml, last, s); last = e }
      sb.append(xml, last, xml.length)
      sb.toString
    }

  /** `extract_text_from_docx` parity (parse_docx.py:9-14): body-level
    * paragraph texts (stripped, empties skipped — table-cell paragraphs
    * excluded exactly like `Document.paragraphs`, which walks only direct
    * `<w:body>` children), then every top-level table's rows appended as
    * `" | ".join(cell.text.strip())` where `cell.text` joins the cell's
    * own paragraphs with newlines (nested tables contribute nothing, as
    * in python-docx). Merged-cell repetition (gridSpan/vMerge row.cells
    * padding) is not replicated — a documented fence; python-docx is not
    * installable here, so the table semantics are pinned by constructed
    * goldens derived from its public behavior.
    */
  def docxText(bytes: Array[Byte]): String = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (entry.getName == "word/document.xml") {
          val xml = new String(zin.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          val lines = ArrayBuffer.empty[String]
          val tables = topBlocks(xml, "w:tbl")
          // doc.paragraphs: body-level only — skip spans inside any table
          topBlocks(xml, "w:p").foreach { case (s, e) =>
            if (!tables.exists(t => s >= t._1 && s < t._2)) {
              val t = CsvText.pyStrip(paraText(xml.substring(s, e)))
              if (t.nonEmpty) lines += t
            }
          }
          // doc.tables: top-level tables, direct rows, direct cells
          tables.foreach { case (ts, te) =>
            val tXml = xml.substring(ts, te)
            topBlocks(tXml, "w:tr").foreach { case (rs, re) =>
              val rXml = tXml.substring(rs, re)
              val cells = topBlocks(rXml, "w:tc").map { case (cs, ce) =>
                val cXml0 = rXml.substring(cs, ce)
                val cXml = stripSpans(cXml0, topBlocks(cXml0, "w:tbl"))
                CsvText.pyStrip(
                  topBlocks(cXml, "w:p")
                    .map(p => paraText(cXml.substring(p._1, p._2)))
                    .mkString("\n"))
              }
              lines += cells.mkString(" | ")
            }
          }
          return lines.mkString("\n")
        }
        entry = zin.getNextEntry
      }
      ""
    } catch { case _: Exception => "" } finally zin.close()
  }

  // ------------------------------------------------------------------- PDF

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return Some(out.toByteArray) // truncated
        out.write(buf, 0, n)
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** PDF LZWDecode (PDF 32000-1 §7.4.4): MSB-first variable-width codes
    * 9→12 bits, 256 = clear-table, 257 = EOD, EarlyChange=1 (the default:
    * code width grows one code early, at table size 2^w − 1). Self-
    * contained ~40 lines — the filter older PDF writers used before
    * Flate became universal.
    */
  private def lzwDecode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      val dict = new java.util.ArrayList[Array[Byte]](4096)
      def reset(): Unit = {
        dict.clear()
        var i = 0
        while (i < 256) { dict.add(Array(i.toByte)); i += 1 }
        dict.add(null); dict.add(null) // 256 = clear, 257 = EOD
      }
      reset()
      var width = 9
      var prev: Array[Byte] = null
      var acc = 0L
      var nbits = 0
      var bi = 0
      var eod = false
      while (bi < data.length && !eod) {
        acc = (acc << 8) | (data(bi) & 0xffL); nbits += 8; bi += 1
        while (nbits >= width && !eod) {
          val code = ((acc >>> (nbits - width)) & ((1L << width) - 1)).toInt
          nbits -= width
          if (code == 256) { reset(); width = 9; prev = null }
          else if (code == 257) eod = true
          else {
            val entry =
              if (code < dict.size && dict.get(code) != null) dict.get(code)
              else if (code == dict.size && prev != null) prev :+ prev(0) // KwKwK
              else return None
            out.write(entry)
            if (prev != null) dict.add(prev :+ entry(0))
            prev = entry
            // EarlyChange=1 decoder: the table lags the encoder's by one
            // entry (the KwKwK deferral), so widen at 2^w − 2 where the
            // encoder widens at 2^w − 1
            if (dict.size >= (1 << width) - 2 && width < 12) width += 1
          }
        }
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** ASCII85Decode (PDF 32000-1 §7.4.3): 5 chars `!`..`u` → 4 bytes,
    * `z` = four zero bytes (only between groups), whitespace skipped,
    * `~>` terminates, partial final group pads with `u` and yields
    * count−1 bytes.
    */
  private def a85Decode(s: String): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      var tuple = 0L
      var count = 0
      var i = 0
      var done = false
      while (i < s.length && !done) {
        val c = s.charAt(i)
        if (c == '~') done = true
        else if (c == 'z' && count == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
        else if (c >= '!' && c <= 'u') {
          tuple = tuple * 85 + (c - '!'); count += 1
          if (count == 5) {
            out.write(((tuple >>> 24) & 0xff).toInt); out.write(((tuple >>> 16) & 0xff).toInt)
            out.write(((tuple >>> 8) & 0xff).toInt); out.write((tuple & 0xff).toInt)
            tuple = 0; count = 0
          }
        } else if (c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0) ()
        else return None
        i += 1
      }
      if (count > 0) {
        if (count == 1) return None // a lone digit cannot encode a byte
        var t = tuple
        var j = count
        while (j < 5) { t = t * 85 + 84; j += 1 }
        val bs = Array(((t >>> 24) & 0xff).toByte, ((t >>> 16) & 0xff).toByte,
          ((t >>> 8) & 0xff).toByte)
        out.write(bs, 0, count - 1)
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** ASCIIHexDecode (PDF 32000-1 §7.4.2): hex pairs, whitespace skipped,
    * `>` terminates, odd trailing digit pads with 0.
    */
  private def ahxDecode(s: String): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var i = 0
      var done = false
      while (i < s.length && !done) {
        val c = s.charAt(i)
        if (c == '>') done = true
        else if (Character.digit(c, 16) >= 0) {
          val v = Character.digit(c, 16)
          if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
        } else if (Character.isWhitespace(c)) ()
        else return None
        i += 1
      }
      if (hi >= 0) out.write(hi << 4)
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** Decode a PDF literal string body: escapes \n \r \t \b \f \( \) \\,
    * octal \ddd, and line continuations (PDF 32000-1 §7.3.4.2).
    */
  private[sources] def pdfStringBody(s: String): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        val n = s.charAt(i + 1)
        n match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' | ')' | '\\' => sb.append(n); i += 2
          case '\n' => i += 2 // continuation
          case d if d >= '0' && d <= '7' =>
            var j = i + 1
            var v = 0
            while (j < s.length && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1
            }
            sb.append(v.toChar); i = j
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------- ToUnicode CMaps (S7)

  /** A parsed ToUnicode CMap: fixed code byte-length + code → Unicode
    * string (multi-char dst allowed). Identity-H composite fonts (the
    * output of every modern word processor — reference happy path:
    * parse_pdf.py via pypdf) show TWO-BYTE glyph ids; without the CMap
    * they decode to garbage, which round-2 degraded to empty text.
    */
  final private class ToUnicodeCMap(
      val codeLen: Int, val map: java.util.HashMap[Int, String]) {
    /** Decode a code string (chars are raw bytes 0-255) through the map;
      * unmapped codes are dropped (pypdf emits nothing for them).
      */
    def decode(codeBytes: String): String = {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + codeLen <= codeBytes.length) {
        var code = 0
        var j = 0
        while (j < codeLen) { code = (code << 8) | (codeBytes.charAt(i + j) & 0xff); j += 1 }
        val dst = map.get(code)
        if (dst != null) sb.append(dst)
        i += codeLen
      }
      sb.toString
    }
  }

  private def hexToString(hex: String): String = {
    // dst hex is UTF-16BE; group into 4-hex-digit code units
    val h = hex.replaceAll("\\s", "")
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + 4 <= h.length) {
      sb.append(Integer.parseInt(h.substring(i, i + 4), 16).toChar)
      i += 4
    }
    // a trailing 2-digit byte (1-byte dst) maps as latin-1
    if (i + 2 <= h.length) sb.append(Integer.parseInt(h.substring(i, i + 2), 16).toChar)
    sb.toString
  }

  private val BfCharRe = java.util.regex.Pattern.compile(
    "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f\\s]+)>")
  private val BfRangeRe = java.util.regex.Pattern.compile(
    "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*(<([0-9A-Fa-f\\s]+)>|\\[((?:\\s*<[0-9A-Fa-f\\s]+>)+)\\s*\\])")
  private val HexItemRe = java.util.regex.Pattern.compile("<([0-9A-Fa-f\\s]+)>")
  private val CodeSpaceRe = java.util.regex.Pattern.compile(
    "begincodespacerange\\s*<([0-9A-Fa-f]+)>", java.util.regex.Pattern.DOTALL)

  /** Parse bfchar/bfrange sections of a ToUnicode CMap stream
    * (PDF 32000-1 §9.10.3). Returns None when the text has no mappings.
    */
  private def parseCMap(text: String): Option[ToUnicodeCMap] = {
    val map = new java.util.HashMap[Int, String]()
    var codeLen = 0
    val cs = CodeSpaceRe.matcher(text)
    if (cs.find()) codeLen = cs.group(1).length / 2

    def section(begin: String, end: String): Iterator[String] = {
      val out = ArrayBuffer.empty[String]
      var from = 0
      while ({ val b = text.indexOf(begin, from); b >= 0 } ) {
        val b = text.indexOf(begin, from)
        val e = text.indexOf(end, b)
        if (e < 0) { from = text.length }
        else { out += text.substring(b + begin.length, e); from = e + end.length }
      }
      out.iterator
    }

    section("beginbfchar", "endbfchar").foreach { body =>
      val m = BfCharRe.matcher(body)
      while (m.find()) {
        if (codeLen == 0) codeLen = m.group(1).length / 2
        map.put(Integer.parseInt(m.group(1), 16), hexToString(m.group(2)))
      }
    }
    section("beginbfrange", "endbfrange").foreach { body =>
      val m = BfRangeRe.matcher(body)
      while (m.find()) {
        if (codeLen == 0) codeLen = m.group(1).length / 2
        val lo = Integer.parseInt(m.group(1), 16)
        val hi = Integer.parseInt(m.group(2), 16)
        if (m.group(5) != null) {
          // [ <d1> <d2> … ] — explicit dst per code
          val items = HexItemRe.matcher(m.group(5))
          var code = lo
          while (items.find() && code <= hi) {
            map.put(code, hexToString(items.group(1)))
            code += 1
          }
        } else {
          // <dstStart> — consecutive dsts from a base (increment last char)
          val base = hexToString(m.group(4))
          var code = lo
          while (code <= hi && code - lo < 65536) {
            val off = code - lo
            val dst =
              if (base.isEmpty) ""
              else base.substring(0, base.length - 1) +
                (base.charAt(base.length - 1) + off).toChar
            map.put(code, dst)
            code += 1
          }
        }
      }
    }
    if (map.isEmpty) None
    else Some(new ToUnicodeCMap(if (codeLen == 0) 2 else codeLen, map))
  }

  // ---- no-ToUnicode fallback: /Encoding /Differences glyph names ------

  private val EncodingRefRe = java.util.regex.Pattern.compile(
    "/Encoding\\s+(\\d+)\\s+\\d+\\s+R")
  private val DifferencesRe = java.util.regex.Pattern.compile(
    "/Differences\\s*\\[(.*?)\\]", java.util.regex.Pattern.DOTALL)
  private val DiffTokenRe = java.util.regex.Pattern.compile(
    "(\\d+)|/([A-Za-z0-9.]+)")

  /** Adobe Glyph List subset covering the printable-ASCII names subset
    * fonts actually emit, plus `uniXXXX` direct code points.
    */
  private val GlyphNames: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    for (c <- 'A' to 'Z') m.put(c.toString, c.toString)
    for (c <- 'a' to 'z') m.put(c.toString, c.toString)
    val named = Seq(
      "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3",
      "four" -> "4", "five" -> "5", "six" -> "6", "seven" -> "7",
      "eight" -> "8", "nine" -> "9",
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
      "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
      "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
      "parenright" -> ")", "asterisk" -> "*", "plus" -> "+", "comma" -> ",",
      "hyphen" -> "-", "period" -> ".", "slash" -> "/", "colon" -> ":",
      "semicolon" -> ";", "less" -> "<", "equal" -> "=", "greater" -> ">",
      "question" -> "?", "at" -> "@", "bracketleft" -> "[",
      "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
      "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
      "braceright" -> "}", "asciitilde" -> "~",
      "quoteleft" -> "‘", "quoteright" -> "’",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
      "fi" -> "ﬁ", "fl" -> "ﬂ")
    named.foreach { case (k, v) => m.put(k, v) }
    m
  }

  private def glyphChar(name: String): Option[String] = {
    val hit = GlyphNames.get(name)
    if (hit != null) Some(hit)
    else if (name.startsWith("uni") && name.length >= 7)
      try Some(Integer.parseInt(name.substring(3, 7), 16).toChar.toString)
      catch { case _: NumberFormatException => None }
    else None
  }

  /** Single-byte code table from an /Encoding dict with /Differences:
    * Latin-1 identity base (≈ Standard/WinAnsi on printable ASCII, the
    * dominant case), remapped entries overlaid from glyph names; names
    * outside the AGL subset DROP their code (pypdf emits nothing for
    * unmappable glyphs). Fonts without /Differences keep byte-wise
    * Latin-1 via the no-CMap path, same as before.
    */
  private def encodingCMap(encBody: String): Option[ToUnicodeCMap] = {
    val dm = DifferencesRe.matcher(encBody)
    if (!dm.find()) return None
    val map = new java.util.HashMap[Int, String]()
    var c = 0
    while (c < 256) { map.put(c, c.toChar.toString); c += 1 }
    val tm = DiffTokenRe.matcher(dm.group(1))
    var code = 0
    while (tm.find()) {
      if (tm.group(1) != null) code = tm.group(1).toInt
      else {
        glyphChar(tm.group(2)) match {
          case Some(ch) => map.put(code, ch)
          case None => map.remove(code)
        }
        code += 1
      }
    }
    Some(new ToUnicodeCMap(1, map))
  }

  private val ObjRe = java.util.regex.Pattern.compile(
    "(\\d+)\\s+\\d+\\s+obj\\b(.*?)endobj", java.util.regex.Pattern.DOTALL)
  private val ObjHeaderRe = java.util.regex.Pattern.compile(
    "(\\d+)\\s+(\\d+)\\s+obj\\b")
  private val ToUnicodeRefRe = java.util.regex.Pattern.compile(
    "/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R")
  private val FontDictRe = java.util.regex.Pattern.compile(
    "/Font\\s*<<(.*?)>>", java.util.regex.Pattern.DOTALL)
  private val FontEntryRe = java.util.regex.Pattern.compile(
    "/([A-Za-z0-9.]+)\\s+(\\d+)\\s+\\d+\\s+R")
  private val StreamRe = java.util.regex.Pattern.compile(
    "stream\r?\n(.*?)endstream", java.util.regex.Pattern.DOTALL)

  private val ObjStmNRe = java.util.regex.Pattern.compile("/N\\s+(\\d+)")
  private val ObjStmFirstRe = java.util.regex.Pattern.compile("/First\\s+(\\d+)")
  private val PredictorRe = java.util.regex.Pattern.compile("/Predictor\\s+(\\d+)")
  private val ColumnsRe = java.util.regex.Pattern.compile("/Columns\\s+(\\d+)")
  private val ColorsRe = java.util.regex.Pattern.compile("/Colors\\s+(\\d+)")
  private val BpcRe = java.util.regex.Pattern.compile("/BitsPerComponent\\s+(\\d+)")

  /** Reverse PNG row predictors (PDF 32000-1 §7.4.4.4: /Predictor ≥ 10 —
    * each row is a filter-type byte then `columns·bpp` filtered bytes;
    * filters None/Sub/Up/Average/Paeth). Some writers predictor-code
    * their object streams the way they do xref streams; without this the
    * inflated header parses as garbage and the container is skipped.
    */
  private def unpredictPng(data: Array[Byte], columns: Int,
      colors: Int, bpc: Int): Array[Byte] = {
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = columns * bpp
    if (rowLen <= 0 || data.length < rowLen + 1) return data
    val nRows = data.length / (rowLen + 1)
    val out = new Array[Byte](nRows * rowLen)
    var r = 0
    while (r < nRows) {
      val ft = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val raw = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = if (r > 0) out(dst - rowLen + i) & 0xff else 0
        val ul = if (r > 0 && i >= bpp) out(dst - rowLen + i - bpp) & 0xff else 0
        val v = ft match {
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) / 2)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left)
            val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => raw // 0 = None; unknown types pass through
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  private val FilterRe = java.util.regex.Pattern.compile(
    "/Filter\\s*(?:\\[([^\\]]*)\\]|/([A-Za-z0-9]+))", java.util.regex.Pattern.DOTALL)
  private val FilterNameRe = java.util.regex.Pattern.compile("/([A-Za-z0-9]+)")

  /** The /Filter chain declared by a stream dict, in application order
    * (name or array form); empty when undeclared.
    */
  private def filterNames(dict: String): Seq[String] = {
    val m = FilterRe.matcher(dict)
    if (!m.find()) return Seq.empty
    if (m.group(2) != null) Seq(m.group(2))
    else {
      val out = ArrayBuffer.empty[String]
      val nm = FilterNameRe.matcher(m.group(1))
      while (nm.find()) out += nm.group(1)
      out.toSeq
    }
  }

  private def unpredictIfDeclared(dict: String, b: Array[Byte]): Array[Byte] = {
    val pm = PredictorRe.matcher(dict)
    if (pm.find() && pm.group(1).toInt >= 10) {
      val cm = ColumnsRe.matcher(dict)
      val colm = ColorsRe.matcher(dict)
      val bm = BpcRe.matcher(dict)
      unpredictPng(b,
        if (cm.find()) cm.group(1).toInt else 1,
        if (colm.find()) colm.group(1).toInt else 1,
        if (bm.find()) bm.group(1).toInt else 8)
    } else b
  }

  /** Decode a stream per its declared /Filter chain: Flate, LZW (both
    * with PNG-predictor reversal when /DecodeParms declares one), ASCII85
    * and ASCIIHex (plus the 1.2 abbreviations /Fl /LZW /A85 /AHx) are
    * decoded; anything else (DCT/JPX images, CCITT, Crypt) degrades to
    * empty — never to garbage bytes. Streams with NO declared filter keep
    * the historical lenient behavior: try Flate (many fixtures and some
    * writers omit the dict), fall back to the raw bytes.
    */
  private def decodeStream(dict: String, data: String): String = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val names = filterNames(dict)
    if (names.isEmpty) {
      val b = inflate(data.getBytes(iso)).filter(_.nonEmpty)
      return b.map(x => new String(unpredictIfDeclared(dict, x), iso)).getOrElse(data)
    }
    var bytes = data.getBytes(iso)
    names.foreach { n =>
      val step: Option[Array[Byte]] = n match {
        case "FlateDecode" | "Fl" =>
          inflate(bytes).filter(_.nonEmpty).map(unpredictIfDeclared(dict, _))
        case "LZWDecode" | "LZW" =>
          lzwDecode(bytes).map(unpredictIfDeclared(dict, _))
        case "ASCII85Decode" | "A85" => a85Decode(new String(bytes, iso))
        case "ASCIIHexDecode" | "AHx" => ahxDecode(new String(bytes, iso))
        case _ => None // unsupported filter: degrade to empty
      }
      step match {
        case Some(b) => bytes = b
        case None => return ""
      }
    }
    new String(bytes, iso)
  }

  /** The dictionary part of an object body (text before the `stream`
    * keyword; the whole body when the object has no stream).
    */
  private def dictPart(body: String): String = {
    val sm = StreamRe.matcher(body)
    if (sm.find()) body.substring(0, sm.start()) else body
  }

  /** Raw (possibly compressed) stream payload of an object body. */
  private def streamData(body: String): Option[String] = {
    val sm = StreamRe.matcher(body)
    if (sm.find()) Some(sm.group(1)) else None
  }

  private def inflateOrRaw(data: String): String =
    inflate(data.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      .filter(_.nonEmpty)
      .map(b => new String(b, java.nio.charset.StandardCharsets.ISO_8859_1))
      .getOrElse(data)

  /** All objects of the document, INCLUDING the ones packed inside
    * `/Type /ObjStm` object streams (PDF 32000-1 §7.5.7 — the default
    * layout modern writers emit with compressed cross-references; round-3
    * these degraded to empty text because their font/resource dicts were
    * invisible). An object stream's payload is `N` pairs of
    * `objnum offset` followed at `/First` by the concatenated object
    * bodies (objects in object streams cannot themselves hold streams, so
    * one expansion level is complete by construction). Insertion order =
    * file order, so content-stream assembly stays document-ordered.
    */
  private def objectBodies(raw: String,
      dec: (Int, String) => String = (_, s) => s)
      : java.util.LinkedHashMap[Int, String] = {
    val bodies = new java.util.LinkedHashMap[Int, String]()
    val om = ObjRe.matcher(raw)
    while (om.find()) bodies.put(om.group(1).toInt, om.group(2))

    val containers = new java.util.ArrayList[(Int, String)]()
    bodies.forEach { (num, body) =>
      if (dictPart(body).contains("/ObjStm")) containers.add((num, body))
    }
    containers.forEach { case (num, body) =>
      try {
        val dict = dictPart(body)
        val nm = ObjStmNRe.matcher(dict)
        val fm = ObjStmFirstRe.matcher(dict)
        // encrypted files encrypt the CONTAINER stream; the packed
        // objects inside are stored in the clear once it is decrypted
        if (nm.find() && fm.find()) streamData(body).foreach { data =>
          val text = decodeStream(dict, dec(num, data))
          val n = nm.group(1).toInt
          val first = fm.group(1).toInt
          if (first <= text.length) {
            val header = text.substring(0, first).trim
              .split("\\s+").filter(_.nonEmpty).map(_.toInt)
            val pairs = (0 until math.min(n, header.length / 2))
              .map(i => (header(2 * i), header(2 * i + 1)))
            pairs.zipWithIndex.foreach { case ((num, off), i) =>
              val start = first + off
              val end =
                if (i + 1 < pairs.length) math.min(first + pairs(i + 1)._2, text.length)
                else text.length
              if (start >= 0 && start <= end && !bodies.containsKey(num))
                bodies.put(num, text.substring(start, end))
            }
          }
        }
      } catch { case _: Exception => () } // malformed container: skip it only
    }
    bodies
  }

  /** Per-font-name ToUnicode maps of the whole document: object graph
    * walked by regex (objects → /ToUnicode refs; /Font resource dicts →
    * name → font object) over [[objectBodies]] — object-stream-packed
    * font and resource dicts included.
    */
  private def documentCMaps(
      bodies: java.util.LinkedHashMap[Int, String],
      dec: (Int, String) => String = (_, s) => s)
      : java.util.HashMap[String, ToUnicodeCMap] = {

    def cmapOfObject(num: Int): Option[ToUnicodeCMap] = {
      val body = bodies.get(num)
      if (body == null) return None
      val sm = StreamRe.matcher(body)
      if (!sm.find()) return None
      // ToUnicode CMap streams are encrypted like any other stream
      parseCMap(decodeStream(dictPart(body), dec(num, sm.group(1))))
    }

    // font object number → its CMap; fonts WITHOUT a ToUnicode CMap fall
    // back to the /Encoding /Differences glyph-name heuristic (pypdf's
    // charmap fallback): subset fonts remap codes arbitrarily, so raw
    // byte-wise extraction would be wrong exactly there
    val byFontObj = new java.util.HashMap[Int, ToUnicodeCMap]()
    bodies.forEach { (num, body) =>
      val tm = ToUnicodeRefRe.matcher(body)
      if (tm.find())
        cmapOfObject(tm.group(1).toInt).foreach(byFontObj.put(num, _))
      else if (body.contains("/Font")) {
        // /Encoding may be inline or an indirect object
        val encBody = {
          val er = EncodingRefRe.matcher(body)
          if (er.find()) Option(bodies.get(er.group(1).toInt)).getOrElse(body)
          else body
        }
        encodingCMap(encBody).foreach(byFontObj.put(num, _))
      }
    }
    // resource font name → font object → CMap
    val byName = new java.util.HashMap[String, ToUnicodeCMap]()
    bodies.forEach { (_, body) =>
      val fd = FontDictRe.matcher(body)
      while (fd.find()) {
        val fe = FontEntryRe.matcher(fd.group(1))
        while (fe.find()) {
          val cm = byFontObj.get(fe.group(2).toInt)
          if (cm != null) byName.put(fe.group(1), cm)
        }
      }
    }
    // Resources that could not be resolved by name (split dicts, inline
    // fonts): when the document has exactly ONE CMap, any font switch
    // selects it — the single-font-family case that dominates real PDFs.
    if (byName.isEmpty && byFontObj.size() == 1)
      byName.put("*", byFontObj.values().iterator().next())
    byName
  }

  /** Text-showing ops of one (decompressed) content stream. Newlines on
    * T* / Td / TD / ' line moves, like pypdf's extract_text layout-lite.
    * `/Fx … Tf` switches the active font: strings shown under a font with
    * a ToUnicode CMap decode as fixed-width codes through it (Identity-H
    * two-byte glyph ids); simple fonts keep byte-wise latin-1.
    */
  private def streamText(
      content: String, out: java.lang.StringBuilder,
      fonts: java.util.HashMap[String, ToUnicodeCMap]): Unit = {
    // possessive [^()\\]++ inside the literal-string loop: java.util.regex
    // runs (?:a|b)* via Pattern$Loop RECURSION, one frame per iteration — a
    // few-KB escape-free literal string overflows the stack; the possessive
    // run collapses each escape-free span into one iteration (same language:
    // the class can match neither '\' nor ')', so no backtracking is lost)
    val op = java.util.regex.Pattern.compile(
      """/([A-Za-z0-9.]+)\s+[\d.]+\s+Tf|\(((?:[^()\\]++|\\.)*)\)\s*(Tj|')|<([0-9A-Fa-f\s]*)>\s*(Tj|')|\]\s*TJ|T\*|\d[\d.\s-]*T[dD]""")
    val m = op.matcher(content)
    // strings inside TJ arrays: literal or hex
    val str = java.util.regex.Pattern.compile(
      """\(((?:[^()\\]++|\\.)*)\)|<([0-9A-Fa-f\s]+)>""")
    var cmap: ToUnicodeCMap = null
    def show(literal: String, hex: String): Unit = {
      val bytes =
        if (literal != null) pdfStringBody(literal)
        else {
          val h = hex.replaceAll("\\s", "")
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i + 2 <= h.length) {
            sb.append(Integer.parseInt(h.substring(i, i + 2), 16).toChar)
            i += 2
          }
          sb.toString
        }
      out.append(if (cmap != null) cmap.decode(bytes) else bytes)
    }
    var last = 0
    while (m.find()) {
      val g = m.group()
      if (g.endsWith("Tf")) {
        val byName = fonts.get(m.group(1))
        cmap = if (byName != null) byName else fonts.get("*")
      } else if (g.endsWith("Tj") || g.endsWith("'")) {
        show(m.group(2), m.group(4))
      } else if (g.endsWith("TJ")) {
        // everything between `[` and `] TJ` since the previous op
        val start = content.lastIndexOf('[', m.start())
        if (start >= 0 && start >= last) {
          val sm = str.matcher(content.substring(start, m.start() + 1))
          while (sm.find()) show(sm.group(1), sm.group(2))
        }
        out.append('\n')
      } else out.append('\n') // T*, Td, TD line moves
      last = m.end()
    }
  }

  private def looksLikeContent(text: String): Boolean =
    (text.contains("BT") || text.contains("Tj") || text.contains("TJ")) &&
      !text.contains("begincmap") && !text.contains("beginbfchar")

  /** Best-effort visible text of a PDF: objects indexed (object streams
    * expanded — PDF 1.5 compressed-xref layouts included), ToUnicode CMaps
    * resolved from the graph, content streams inflated (or taken raw) and
    * their text operators concatenated in file order — two-byte CMap fonts
    * included — collapsed blank lines. `/ObjStm` and `/Type /XRef` stream
    * payloads are structure, not page content, and are excluded from the
    * text walk; documents with no parseable object wrappers fall back to a
    * blunt every-stream scan (tolerates malformed files).
    */
  def pdfText(bytes: Array[Byte]): String = pdfText(bytes, PdfPasswords)

  /** Session-level PDF password keyring (`GRAFT_PDF_PASSWORDS`,
    * colon-separated): a dropzone whose documents share known passwords
    * provisions them once; each encrypted file tries the empty password
    * first, then every keyring entry as user then owner password (pypdf
    * `password=` parity). On a cluster the env must reach the executors
    * (spark.executorEnv.*) — same contract as any credential env var.
    */
  private lazy val PdfPasswords: Seq[String] =
    sys.env.get("GRAFT_PDF_PASSWORDS").toSeq
      .flatMap(_.split(":", -1)).filter(_.nonEmpty)

  def pdfText(bytes: Array[Byte], passwords: Seq[String]): String = {
    try {
      val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      // standard security handler: empty-user-password files (owner-only
      // restrictions) and provisioned-password files decrypt
      // transparently; anything else -> "" (degrade like the reference's
      // unreadable-input skip)
      val dec: (Int, String) => String = PdfCrypt.access(raw, passwords) match {
        case PdfCrypt.Denied => return ""
        case PdfCrypt.Granted(f) =>
          // Algorithm 1 mixes the object's GENERATION into the per-object
          // key, so capture each top-level "num gen obj" header (last
          // occurrence wins, matching objectBodies' put order); objects
          // packed in /ObjStm are generation 0 by spec — the map default
          val gens = new java.util.HashMap[Int, Int]()
          val gm = ObjHeaderRe.matcher(raw)
          while (gm.find()) gens.put(gm.group(1).toInt, gm.group(2).toInt)
          (n, s) => f(n, gens.getOrDefault(n, 0), s)
        case _ => (_, s) => s
      }
      val bodies = objectBodies(raw, dec)
      val fonts = documentCMaps(bodies, dec)
      val out = new java.lang.StringBuilder
      var sawStream = false
      bodies.forEach { (num, body) =>
        val dict = dictPart(body)
        if (!dict.contains("/ObjStm") && !dict.contains("/XRef"))
          streamData(body).foreach { data =>
            sawStream = true
            val text = decodeStream(dict, dec(num, data)) // decrypt, then filters
            if (looksLikeContent(text)) streamText(text, out, fonts)
          }
      }
      if (!sawStream) {
        // no obj-wrapped streams at all: blunt scan for stray streams
        val sm = StreamRe.matcher(raw)
        while (sm.find()) {
          val text = inflateOrRaw(sm.group(1))
          if (looksLikeContent(text)) streamText(text, out, fonts)
        }
      }
      out.toString.split("\n", -1).map(_.trim).filter(_.nonEmpty).mkString("\n")
    } catch { case _: Exception => "" }
  }

  def docxTextCol(content: Column): Column =
    GraftSql.column(DocxText(GraftSql.expression(content)))
  def pdfTextCol(content: Column): Column =
    GraftSql.column(PdfText(GraftSql.expression(content)))

  /** Deterministic minimal DOCX container (a ZIP holding only
    * `word/document.xml`) for in-query fixture assembly — q65 builds one
    * per document and round-trips it through the real [[docxText]]
    * walker. Fixed entry timestamp via `setTimeLocal` (timezone-free DOS
    * time) keeps the bytes reproducible across executors.
    */
  def packDocx(xml: UTF8String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream
    val z = new java.util.zip.ZipOutputStream(bos)
    val e = new java.util.zip.ZipEntry("word/document.xml")
    e.setTimeLocal(java.time.LocalDateTime.of(2020, 1, 1, 0, 0))
    z.putNextEntry(e)
    z.write(xml.getBytes)
    z.closeEntry()
    z.close()
    bos.toByteArray
  }

  def docxPackCol(xml: Column): Column =
    GraftSql.column(DocxPack(GraftSql.expression(xml)))

  /** Deterministic zlib-deflate of an (ASCII) string — q66 assembles
    * Flate-compressed PDF content streams in-query with it. Fixed level,
    * default strategy: same input → same bytes within a JVM, which is all
    * the oracle round-trip needs (it checks decoded TEXT, not bytes).
    */
  def flateCompress(s: UTF8String): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(s.getBytes)
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  def flateCompressCol(c: Column): Column =
    GraftSql.column(FlateRaw(GraftSql.expression(c)))
}

/** String → deflated bytes, codegen'd (fixture assembly only). */
case class FlateRaw(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "flate_compress"
  override protected def nullSafeEval(input: Any): Any =
    BinaryDocs.flateCompress(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sources.BinaryDocs$$.MODULE$$.flateCompress($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** String (document.xml) → binary DOCX container, codegen'd. */
case class DocxPack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "docx_pack"
  override protected def nullSafeEval(input: Any): Any =
    BinaryDocs.packDocx(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sources.BinaryDocs$$.MODULE$$.packDocx($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class DocxText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "docx_text"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(BinaryDocs.docxText(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.sources.BinaryDocs$$.MODULE$$.docxText($c))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class PdfText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "pdf_text"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(BinaryDocs.pdfText(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.sources.BinaryDocs$$.MODULE$$.pdfText($c))")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
