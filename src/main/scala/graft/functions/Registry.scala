package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{ChunkChat, ChunkText, DevEmbed, WordShingles}
import graft.sources.{ChatExportExplode, JsonFlatten, Note2JsonParse, TranscriptParse}

/** SQL-facing registration of every custom expression, so `spark.sql`
  * users get the full operator surface:
  *
  *   SELECT uuid5(ns, name), cosine_similarity(a, b), chunk_text(text, 800, 100), ...
  *
  * Call `Registry.install(spark)` once per session.
  */
object Registry {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int, got $other")
  }

  private def stringArg(e: Expression, sig: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$sig expects a literal string, got $other")
  }

  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry

    reg.createOrReplaceTempFunction("uuid5",
      es => Uuid5(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_similarity",
      es => CosineSimilarity(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProduct(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("l2_normalize",
      es => L2Normalize(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("chunk_text",
      es => ChunkText(es(0), intArg(es(1), "size"), intArg(es(2), "overlap")), "scala_udf")
    reg.createOrReplaceTempFunction("chunk_chat",
      es => ChunkChat(es(0), intArg(es(1), "size")), "scala_udf")
    reg.createOrReplaceTempFunction("dev_embed",
      es => DevEmbed(es(0), intArg(es(1), "dim")), "scala_udf")
    reg.createOrReplaceTempFunction("word_shingles",
      es => WordShingles(es(0), intArg(es(1), "n")), "scala_udf")
    reg.createOrReplaceTempFunction("band_minhash",
      es => BandMinhash(es(0), intArg(es(1), "numHashes"), intArg(es(2), "bands")), "scala_udf")
    reg.createOrReplaceTempFunction("decode_text",
      es => DecodeText(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("html_to_text",
      es => graft.sources.HtmlToText(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash60",
      es => SimHash60(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash_text",
      es => SimHashText(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("pdf_text",
      es => graft.sources.PdfText(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("csv_lines",
      es => graft.sources.CsvLines(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("csv_row_chunks",
      es => graft.sources.CsvRowChunks(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("canonical_relpath",
      es => CanonicalRelpath(es(0), stringArg(es(1), "canonical_relpath(path, root)")), "scala_udf")
    reg.createOrReplaceTempFunction("path_ext",
      es => PathExt(es(0), withDot = false), "scala_udf")
    reg.createOrReplaceTempFunction("docx_text",
      es => graft.sources.DocxText(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("sum_char_lengths",
      es => SumCharLengths(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("json_flatten",
      es => JsonFlatten(es(0), jsonl = false), "scala_udf")
    reg.createOrReplaceTempFunction("jsonl_flatten",
      es => JsonFlatten(es(0), jsonl = true), "scala_udf")
    reg.createOrReplaceTempFunction("chat_conversations",
      es => ChatExportExplode(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("parse_transcript",
      es => TranscriptParse(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("note2json",
      es => Note2JsonParse(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("nearest_cell",
      es => {
        val cs = matrixArg(es(1),
          "nearest_cell(vec, centroids) expects centroids: array<array<double>>")
        NearestCell(es(0), cs, VectorFunctions.centroidNorm2(cs))
      }, "scala_udf")
    reg.createOrReplaceTempFunction("i8_scale",
      es => I8Scale(es(0)), "scala_udf")
    reg.createOrReplaceTempFunction("i8_quantize",
      es => I8Quantize(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("i8_dequant",
      es => I8Dequant(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("i8_dot",
      es => I8Dot(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("pq_encode",
      es => {
        val cbs = cubeArg(es(1),
          "pq_encode(vec, codebooks) expects codebooks: array<array<array<double>>>")
        PqEncode(es(0), cbs, VectorFunctions.codebookNorm2(cbs))
      }, "scala_udf")
    reg.createOrReplaceTempFunction("pq_adc",
      es => {
        val lut = matrixArg(es(1),
          "pq_adc(codes, lut) expects lut: array<array<double>>")
        PqAdc(es(0), lut)
      }, "scala_udf")
  }

  /** Literal (foldable) numeric-array argument cast to `target`, with the
    * function's signature in the error instead of a raw ClassCastException
    * (SQL literals type as array<array<int>> etc.).
    */
  private def foldableCast(e: Expression,
      target: org.apache.spark.sql.types.DataType, sig: String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    require(e.foldable, sig + " as a LITERAL")
    def numericShapeOf(t: org.apache.spark.sql.types.DataType,
        tgt: org.apache.spark.sql.types.DataType): Boolean = (t, tgt) match {
      case (org.apache.spark.sql.types.ArrayType(et, _),
            org.apache.spark.sql.types.ArrayType(tt, _)) => numericShapeOf(et, tt)
      // both sides must bottom out together: a numeric leaf against an
      // array target is a DEPTH mismatch (e.g. array<int> passed where
      // array<array<array<double>>> is expected) and must take the
      // friendly signature error, not build an invalid Cast
      case (_: org.apache.spark.sql.types.NumericType,
            _: org.apache.spark.sql.types.NumericType) => true
      case _ => false
    }
    val cast =
      if (e.dataType == target) e
      else if (numericShapeOf(e.dataType, target))
        org.apache.spark.sql.catalyst.expressions.Cast(e, target)
      else throw new IllegalArgumentException(
        s"$sig, got ${e.dataType.catalogString}")
    cast.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
  }

  /** Literal array<array<double>> argument → matrix
    * (`nearest_cell(vec, array(array(...), ...))`).
    */
  private def matrixArg(e: Expression, sig: String): Array[Array[Double]] = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val ad = foldableCast(e, ArrayType(ArrayType(DoubleType)), sig)
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  /** Literal array<array<array<double>>> argument → PQ codebooks. */
  private def cubeArg(e: Expression, sig: String): Array[Array[Array[Double]]] = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val ad = foldableCast(e, ArrayType(ArrayType(ArrayType(DoubleType))), sig)
    Array.tabulate(ad.numElements()) { i =>
      val m = ad.getArray(i)
      Array.tabulate(m.numElements())(j => m.getArray(j).toDoubleArray())
    }
  }
}
