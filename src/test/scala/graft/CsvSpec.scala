package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CsvText

/** S4 parity: CsvText.csvToLines vs goldens produced by EXECUTING the
  * reference's `extract_text_from_csv` (worker/app/services/parse_csv.py)
  * on identical bytes — see tools/gen_csv_goldens.py. 197 fixtures: every
  * dialect the Sniffer can elect (comma/tab/semicolon/pipe/space/colon and
  * its quirk modes), quoted commas/doubled quotes/embedded newlines, CRLF
  * and lone-CR records, blank lines, ragged rows, the 5001-row cap, and
  * 170 seeded-random dialect/quoting mixes.
  */
class CsvSpec extends AnyFunSuite {

  private val goldens: Seq[(String, String, String)] = {
    val in = getClass.getResourceAsStream("/csv_goldens.json")
    require(in != null, "csv_goldens.json missing from test resources")
    val raw = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(raw)
    (0 until root.size()).map { i =>
      val n = root.get(i)
      (n.get("name").asText(), n.get("content").asText(), n.get("expected").asText())
    }
  }

  test("all reference-executed goldens match byte-for-byte") {
    assert(goldens.size >= 190)
    val bad = goldens.flatMap { case (name, content, expected) =>
      val got = CsvText.csvToLines(content)
      if (got != expected) Some((name, expected, got)) else None
    }
    withClue(bad.take(5).map { case (n, e, g) =>
      s"$n:\n  expected ${e.take(200).replace("\n", "\\n")}\n  got      ${g.take(200).replace("\n", "\\n")}"
    }.mkString("\n")) {
      assert(bad.isEmpty, s"${bad.size}/${goldens.size} goldens diverge: ${bad.map(_._1).mkString(", ")}")
    }
  }

  test("parsers_csv.py variant: all reference-executed row-chunk goldens match") {
    // The worker HTTP path's SECOND parser (no sniffing, 50-col/2000-char
    // caps, per-row chunks) — goldens from tools/gen_csv_rowchunk_goldens.py
    val in = getClass.getResourceAsStream("/csv_rowchunk_goldens.json")
    require(in != null, "csv_rowchunk_goldens.json missing from test resources")
    val raw = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(raw)
    assert(root.size() >= 70)
    val bad = (0 until root.size()).flatMap { i =>
      val n = root.get(i)
      val expected = (0 until n.get("expected").size())
        .map(j => n.get("expected").get(j).asText())
      val got = CsvText.csvRowChunks(n.get("content").asText()).toSeq
      if (got != expected) Some((n.get("name").asText(), expected, got)) else None
    }
    withClue(bad.take(3).map { case (n, e, g) =>
      s"$n:\n  expected ${e.mkString("⏎").take(200)}\n  got      ${g.mkString("⏎").take(200)}"
    }.mkString("\n")) {
      assert(bad.isEmpty, s"${bad.size} goldens diverge: ${bad.map(_._1).mkString(", ")}")
    }
  }

  test("row cap matches the reference off-by-one (5001 rows)") {
    val (_, _, expected) = goldens.find(_._1 == "many_rows").get
    assert(expected.linesIterator.size == 5001)
  }
}
