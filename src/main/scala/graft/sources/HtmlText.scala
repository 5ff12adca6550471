package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → visible text with BeautifulSoup `get_text(separator="\n")`
  * semantics (reference: worker/app/services/parsers_html.py:6-25):
  * comments and script/style/noscript subtrees dropped, every tag boundary
  * becomes a newline separator, character entities decoded, lines
  * stripped, blank lines removed, result joined with newlines. The
  * reference's downstream chunker re-chunks this, so visible-TEXT parity
  * is the contract, not DOM fidelity.
  *
  * Entities: the HTML named set that survives plain prose (amp/lt/gt/
  * quot/apos/nbsp + common typography) plus full numeric `&#NNN;` /
  * `&#xHHH;` forms, astral-safe.
  */
case class HtmlToText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_to_text"

  override protected def nullSafeEval(input: Any): Any =
    HtmlText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sources.HtmlText$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlText {

  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> "\u00a0", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "hellip" -> "…", "mdash" -> "—", "ndash" -> "–",
    "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”",
    "middot" -> "·", "bull" -> "•", "deg" -> "°", "times" -> "×",
    "laquo" -> "«", "raquo" -> "»", "sect" -> "§", "para" -> "¶",
    "eacute" -> "é", "egrave" -> "è", "agrave" -> "à", "uuml" -> "ü",
    "ouml" -> "ö", "auml" -> "ä", "ccedil" -> "ç", "ntilde" -> "ñ")

  private val EntityRe = "&(#[xX]?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);".r

  def decodeEntities(s: String): String =
    EntityRe.replaceAllIn(s, m => {
      val body = m.group(1)
      val out =
        if (body.startsWith("#x") || body.startsWith("#X"))
          try new String(Character.toChars(Integer.parseInt(body.drop(2), 16)))
          catch { case _: Exception => m.matched }
        else if (body.startsWith("#"))
          try new String(Character.toChars(Integer.parseInt(body.drop(1))))
          catch { case _: Exception => m.matched }
        else Named.getOrElse(body, m.matched)
      java.util.regex.Matcher.quoteReplacement(out)
    })

  /** Strip like Python `str.strip()`: unicode whitespace INCLUDING
    * non-breaking space (Java's isWhitespace excludes U+00A0).
    */
  private def pyStrip(s: String): String = {
    def ws(c: Char) = Character.isWhitespace(c) || c == '\u00a0'
    var a = 0
    var b = s.length
    while (a < b && ws(s.charAt(a))) a += 1
    while (b > a && ws(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  def extract(html: String): String = {
    if (html == null || html.isEmpty) return ""
    var s = html.replaceAll("(?s)<!--.*?-->", "")
    s = s.replaceAll("(?is)<(script|style|noscript)\\b[^>]*>.*?</\\1\\s*>", "")
    s = s.replaceAll("(?s)<[^>]+>", "\n")
    s = decodeEntities(s)
    s.split("\n", -1).iterator.map(pyStrip).filter(_.nonEmpty).mkString("\n")
  }

  def compute(html: UTF8String): UTF8String =
    UTF8String.fromString(extract(html.toString))

  def htmlToText(html: Column): Column =
    GraftSql.column(HtmlToText(GraftSql.expression(html)))
}
