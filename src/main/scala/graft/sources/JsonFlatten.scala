package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Flatten arbitrary JSON into `"a.b[0]: value"` lines, matching the
  * reference's recursive flattener (reference:
  * worker/app/services/parse_json.py:5-22 for whole-document JSON,
  * :25-39 for JSONL with `$[i]` line prefixes and bad-line skipping).
  *
  * Scalars render Python-style (`True`/`False`/`None`) for parity with the
  * reference goldens. Malformed whole-document JSON yields null (the
  * ingest's empty-content guard then drops the file, mirroring the
  * reference's skip ledger); malformed JSONL lines are skipped but still
  * counted in the `$[i]` index (enumerate semantics).
  */
case class JsonFlatten(child: Expression, jsonl: Boolean) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "json_flatten"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    JsonFlatten.compute(input.asInstanceOf[UTF8String], jsonl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = graft.sources.JsonFlatten$$.MODULE$$.compute($c, $jsonl);
        ${ev.isNull} = ${ev.value} == null;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonFlatten {
  private val mapper = new ObjectMapper()

  private def scalarText(n: JsonNode): String =
    if (n.isBoolean) { if (n.asBoolean) "True" else "False" }
    else if (n.isNull) "None"
    else n.asText()

  private def flatten(n: JsonNode, prefix: String, out: java.lang.StringBuilder): Unit = {
    if (n.isObject) {
      val it = n.properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        val p = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
        flatten(e.getValue, p, out)
      }
    } else if (n.isArray) {
      var i = 0
      val it = n.elements()
      while (it.hasNext) {
        flatten(it.next(), s"$prefix[$i]", out)
        i += 1
      }
    } else {
      if (out.length() > 0) out.append('\n')
      out.append(prefix).append(": ").append(scalarText(n))
    }
  }

  def compute(text: UTF8String, jsonl: Boolean): UTF8String = {
    val out = new java.lang.StringBuilder
    if (jsonl) {
      val lines = text.toString.split("\n", -1)
      var i = 0
      while (i < lines.length && i <= 10000) {
        val s = lines(i).trim
        if (s.nonEmpty) {
          try flatten(mapper.readTree(s), s"$$[$i]", out)
          catch { case _: Exception => () } // skip bad lines (parse_json.py:34-35)
        }
        i += 1
      }
      UTF8String.fromString(out.toString)
    } else {
      try {
        flatten(mapper.readTree(text.toString), "", out)
        UTF8String.fromString(out.toString)
      } catch { case _: Exception => null } // fail-soft: caller's guard drops it
    }
  }

  /** Whole-document flatten (`.json`); auto-detects JSONL is the caller's
    * job (extension router).
    */
  def jsonFlatten(raw: Column): Column =
    GraftSql.column(JsonFlatten(GraftSql.expression(raw), jsonl = false))

  def jsonlFlatten(raw: Column): Column =
    GraftSql.column(JsonFlatten(GraftSql.expression(raw), jsonl = true))
}
