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

  private val WpRe = java.util.regex.Pattern.compile(
    "<w:p[ >].*?</w:p>|<w:p/>", java.util.regex.Pattern.DOTALL)
  private val WtRe = java.util.regex.Pattern.compile(
    "<w:t(?: [^>]*)?>(.*?)</w:t>|<w:br/>|<w:tab/>", java.util.regex.Pattern.DOTALL)

  private def xmlUnescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")

  /** Paragraph texts of word/document.xml, joined with newlines — the
    * reference's `"\n".join(p.text for p in doc.paragraphs)`.
    */
  def docxText(bytes: Array[Byte]): String = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (entry.getName == "word/document.xml") {
          val xml = new String(zin.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          val paras = ArrayBuffer.empty[String]
          val pm = WpRe.matcher(xml)
          while (pm.find()) {
            val sb = new java.lang.StringBuilder
            val tm = WtRe.matcher(pm.group())
            while (tm.find()) {
              if (tm.group().startsWith("<w:br")) sb.append('\n')
              else if (tm.group().startsWith("<w:tab")) sb.append('\t')
              else sb.append(xmlUnescape(tm.group(1)))
            }
            paras += sb.toString
          }
          return paras.mkString("\n")
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

  /** Decode a PDF literal string body: escapes \n \r \t \b \f \( \) \\,
    * octal \ddd, and line continuations (PDF 32000-1 §7.3.4.2).
    */
  private def pdfString(s: String): String = {
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

  /** Text-showing ops of one (decompressed) content stream. Newlines on
    * T* / Td / TD / ' line moves, like pypdf's extract_text layout-lite.
    */
  private def streamText(content: String, out: java.lang.StringBuilder): Unit = {
    // (…) Tj / (…) '  — single strings;  [ (…) -n (…) ] TJ — arrays
    val op = java.util.regex.Pattern.compile(
      """\(((?:[^()\\]|\\.)*)\)\s*(Tj|')|\]\s*TJ|T\*|\d[\d.\s-]*T[dD]""")
    val m = op.matcher(content)
    // capture strings inside TJ arrays separately
    val str = java.util.regex.Pattern.compile("""\(((?:[^()\\]|\\.)*)\)""")
    var last = 0
    while (m.find()) {
      val g = m.group()
      if (g.endsWith("Tj") || g.endsWith("'")) out.append(pdfString(m.group(1)))
      else if (g.endsWith("TJ")) {
        // everything between `[` and `] TJ` since the previous op
        val start = content.lastIndexOf('[', m.start())
        if (start >= 0 && start >= last) {
          val sm = str.matcher(content.substring(start, m.start() + 1))
          while (sm.find()) out.append(pdfString(sm.group(1)))
        }
        out.append('\n')
      } else out.append('\n') // T*, Td, TD line moves
      last = m.end()
    }
  }

  /** Best-effort visible text of a PDF: every content stream inflated (or
    * taken raw), text operators concatenated, collapsed blank lines.
    */
  def pdfText(bytes: Array[Byte]): String = {
    try {
      val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      val out = new java.lang.StringBuilder
      val sm = java.util.regex.Pattern
        .compile("stream\r?\n(.*?)endstream", java.util.regex.Pattern.DOTALL)
        .matcher(raw)
      while (sm.find()) {
        val body = sm.group(1)
        val bodyBytes = body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        val text = inflate(bodyBytes)
          .map(b => new String(b, java.nio.charset.StandardCharsets.ISO_8859_1))
          .getOrElse(body)
        if (text.contains("BT") || text.contains("Tj") || text.contains("TJ"))
          streamText(text, out)
      }
      out.toString.split("\n", -1).map(_.trim).filter(_.nonEmpty).mkString("\n")
    } catch { case _: Exception => "" }
  }

  def docxTextCol(content: Column): Column =
    GraftSql.column(DocxText(GraftSql.expression(content)))
  def pdfTextCol(content: Column): Column =
    GraftSql.column(PdfText(GraftSql.expression(content)))
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
