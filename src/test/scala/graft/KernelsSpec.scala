package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.functions.{Uuid5, VectorKernels}
import graft.operators.DevEmbed

/** Goldens for the deterministic kernels, generated from the reference
  * formulas (worker/app/utils/docids.py, worker/app/services/
  * embed_ollama.py:45-51) via CPython's uuid/hashlib.
  */
class KernelsSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  test("uuid5 matches RFC-4122 known vector (DNS, python.org)") {
    assert(Uuid5.compute(u("6ba7b810-9dad-11d1-80b4-00c04fd430c8"), u("python.org")).toString
      == "886313e1-3b8a-5372-9b90-0c9aee199e5d")
  }

  test("uuid5 document id matches reference scheme") {
    assert(Uuid5.compute(u(Uuid5.DefaultNamespace), u("notes/a.md")).toString
      == "6d64ace0-3d62-5690-995e-4e90e20c9aef")
  }

  test("uuid5 chunk id = uuid5(document_id, chunk:idx)") {
    assert(Uuid5.compute(u("6d64ace0-3d62-5690-995e-4e90e20c9aef"), u("chunk:0")).toString
      == "d964240d-733a-5662-883a-36c95ce7fb9a")
  }

  test("dev embed reproduces reference dev-mode vectors bit-for-bit") {
    val v = DevEmbed.compute(u("hello"), 64).toDoubleArray()
    assert(v.take(6).toSeq ==
      Seq(0.171875, 0.9453125, 0.30078125, 0.7265625, 0.37109375, 0.6875))
    assert(v(33) == 0.9453125) // h[i % 32] wrap-around
    assert(v.forall(x => x >= 0.0 && x < 1.0))
  }

  test("simhash60 kernel matches the vote formula") {
    import graft.functions.SimHash60
    def fp(hs: Long*): Long = SimHash60.compute(new GenericArrayData(hs.toArray))
    // empty: every bit's vote is 0 >= 0 -> all 60 bits set
    assert(fp() == (1L << 60) - 1)
    // single hash: bits of h vote +1, absent bits vote -1 -> fingerprint == h (low 60 bits)
    assert(fp(0x5L) == 0x5L)
    assert(fp(0x7ffffffffffffffL) == 0x7ffffffffffffffL)
    // two hashes: ties (vote 0) set the bit -> union of bits
    assert(fp(0x5L, 0x3L) == 0x7L)
    // three: majority wins where votes disagree; bit0 {1,1,0}->+1 set,
    // bit1 {0,1,0}->-1 clear, bit2 {0,0,1}->-1 clear, rest vote -3 clear
    assert(fp(0x1L, 0x3L, 0x4L) == 0x1L)
  }

  test("path kernels match the regex-chain semantics they replaced") {
    import graft.functions.PathKernels
    // canonical_relpath = sequential anchored prefix strips
    // (file: → root → ./ → data/dropzone/), exactly the old
    // regexp_replace chain including its strip ORDER
    def rel(p: String) = PathKernels.canonicalRelpath(u(p), "dz/").toString
    assert(rel("file:dz/docs/a.txt") == "docs/a.txt")
    assert(rel("./x/y.md") == "x/y.md")
    assert(rel("data/dropzone/k.csv") == "k.csv")
    assert(rel("dz/data/dropzone/k.csv") == "k.csv")
    assert(rel("docs/a.txt") == "docs/a.txt")
    // basename = element_at(split(p, "/"), -1), trailing slash → empty
    assert(PathKernels.basename(u("a/b/c.txt")).toString == "c.txt")
    assert(PathKernels.basename(u("c.txt")).toString == "c.txt")
    assert(PathKernels.basename(u("a/b/")).toString == "")
    // ext = lower(regexp_extract(basename, "\.([^.]+)$" / "(\.[^.]+)$", 1)):
    // empty on no dot / trailing dot, lowercased, last dot wins
    def e(p: String) = PathKernels.ext(u(p), withDot = false).toString
    assert(e("a/b/C.TXT") == "txt")
    assert(e("a/b.tar.gz") == "gz")
    assert(e("noext") == "")
    assert(e("a/name.") == "")
    assert(e(".hidden") == "hidden")
    assert(e("dir.v2/file") == "") // dot in a DIRECTORY must not count
    assert(PathKernels.ext(u("a/b/Q.JSON"), withDot = true).toString == ".json")
    assert(PathKernels.ext(u("a/plain"), withDot = true).toString == "")
  }

  test("band_minhash portable family is frozen (drift golden)") {
    // The q19 DuckDB oracle replays this family bit-for-bit from the
    // published constants — any change to the hash derivation silently
    // breaks cross-engine dedup reproducibility. These values pin the
    // family between driver runs.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(Array[Any](
      UTF8String.fromString("alpha beta gamma"),
      UTF8String.fromString("beta gamma delta")))
    val out = graft.functions.BandMinhash.compute(arr, 8, 4)
    assert((0 until 4).map(out.getLong) == Seq(
      19551264411556175L, 1043594958751881966L,
      15341877949385535L, 97046368363271812L))
    // hash60 must equal CAST('0x'||substr(sha256(x),1,15) AS BIGINT)
    assert(graft.functions.Sha256.hash60("x".getBytes("UTF-8"))
      == 204651429991967492L)
  }

  test("band_fold over raw_minhash equals band_minhash at every 32-hash config") {
    // q130's shared-signature design holds ONLY if re-folding the raw
    // minhashes reproduces the fused expression band-for-band — this is
    // the identity that lets one minhash pass serve six banding configs
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(Array[Any](
      UTF8String.fromString("alpha beta gamma"),
      UTF8String.fromString("beta gamma delta"),
      UTF8String.fromString("delta epsilon zeta")))
    val mins = graft.functions.BandMinhash.rawMins(arr, 32)
    for ((b, _) <- Seq((1, 32), (2, 16), (4, 8), (8, 4), (16, 2), (32, 1))) {
      val refolded = graft.functions.BandMinhash.foldBands(mins, b)
      val fused = graft.functions.BandMinhash.compute(arr, 32, b)
      assert((0 until b).forall(j => refolded.getLong(j) == fused.getLong(j)),
        s"fold identity broke at bands=$b")
    }
    // empty shingle input: raw mins sit at Long.MaxValue, fold still total
    val empty = graft.functions.BandMinhash.rawMins(
      new GenericArrayData(Array.empty[Any]), 32)
    assert((0 until 32).forall(k => empty.getLong(k) == Long.MaxValue))
  }

  test("word_shingles trim/split matches the oracle's string_split semantics") {
    // Space-only trim, empties kept — DuckDB trim + string_split parity, so
    // the q19 cross-engine LSH replay is data-independent (tabs/newlines/
    // double spaces included). Java String.trim/split(' ') would diverge.
    def sh(s: String, n: Int): Seq[String] = {
      val a = graft.operators.WordShingles.compute(UTF8String.fromString(s), n)
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    assert(sh(" a b c ", 2) == Seq("a b", "b c"))
    assert(sh("a  b c", 2) == Seq("a ", " b", "b c"))   // interior empty token kept
    assert(sh("a\nb c d", 2) == Seq("a\nb c", "c d"))   // \n not trimmed, not a separator
    assert(sh("\ta b c", 2) == Seq("\ta b", "b c"))     // \t not trimmed
    assert(sh("a b ", 2) == Seq("a b"))                  // trailing space IS trimmed
  }

  test("BPE-ish pre-tokenizer regex counts word gaps correctly") {
    // The q51 token-budget estimator counts matches of BpeTokenRe directly
    // (no whitespace subtraction — single-space word gaps ride the ` ?`
    // prefixes, as in real BPE). Spark's regexp_count is Java regex, so
    // pinning via java.util.regex pins the Column semantics.
    def n(s: String): Int = {
      val m = java.util.regex.Pattern.compile(graft.operators.TextAnalytics.BpeTokenRe).matcher(s)
      var c = 0; while (m.find()) c += 1; c
    }
    assert(n("hello world foo") == 3) // the round-3 bug yielded 1
    assert(n("it's a test") == 4)     // "it" "'s" " a" " test"
    assert(n("foo  bar\nbaz") == 3)   // extra whitespace skipped between matches
    assert(n("price: $12.50") == 6)   // "price" ":" " $" "12" "." "50"
    assert(n("") == 0 && n("   ") == 0)
  }

  test("sum_char_lengths / word_list_hits kernels") {
    import graft.functions.{SumCharLengths, WordListHits}
    def arr(ws: String*) = new GenericArrayData(ws.toArray.map(UTF8String.fromString))
    assert(SumCharLengths.compute(arr("ab", "c", "")) == 3L)
    assert(SumCharLengths.compute(arr()) == 0L)
    // numChars counts codepoints, matching Spark's length()
    assert(SumCharLengths.compute(arr("héllo", "💡")) == 6L)
    val set = WordListHits.toSet(Seq("the", "a"))
    assert(WordListHits.compute(arr("the", "cat", "the", "a"), set) == 3)
    assert(WordListHits.compute(arr(), set) == 0)
  }

  test("decode_text: BOM strip + UTF-16 sniff (decode_bytes waterfall)") {
    import graft.functions.DecodeText.decodeBytes
    import java.nio.charset.StandardCharsets._
    val content = "# Test Title\nUTF content with émojis 🎉"
    // plain UTF-8 and UTF-8 with BOM → identical, BOM stripped
    assert(decodeBytes(content.getBytes(UTF_8)) == content)
    assert(decodeBytes(("﻿" + content).getBytes(UTF_8)) == content)
    // UTF-16 LE/BE with BOM (Java "UTF-16" honours it)
    assert(decodeBytes(("﻿" + content).getBytes(UTF_16LE)) == content)
    assert(decodeBytes(("﻿" + content).getBytes(UTF_16BE)) == content)
    // UTF-16LE without BOM: ASCII bytes are valid UTF-8 but >10% NULs → sniffed
    assert(decodeBytes("hello world plain ascii".getBytes(UTF_16LE))
      == "hello world plain ascii")
    // cp1252 fallback for non-UTF bytes (é = 0xE9)
    assert(decodeBytes(Array[Byte](0x63, 0x61, 0x66, 0xE9.toByte)) == "café")
    assert(decodeBytes(Array.emptyByteArray) == "")
  }

  test("int8 quantization kernels: round-trip, clamp, zero vector") {
    def arr(xs: Double*) = new GenericArrayData(xs.toArray)
    val v = arr(1.27, -1.27, 0.5, 0.0, 0.01)
    val s = VectorKernels.i8Scale(v)
    assert(s == 1.27 / 127.0) // = 0.01
    val q = VectorKernels.i8Quantize(v, s)
    assert((0 until q.numElements()).map(q.getByte) == Seq(127, -127, 50, 0, 1))
    val dq = VectorKernels.i8Dequant(q, s).toDoubleArray()
    assert(math.abs(dq(0) - 1.27) < 1e-12 && dq(3) == 0.0)
    // max-magnitude element always lands exactly on ±127 (no overflow)
    val w = arr(-3.0, 2.9)
    val qw = VectorKernels.i8Quantize(w, VectorKernels.i8Scale(w))
    assert(qw.getByte(0) == -127)
    // zero vector: scale 0, all-zero codes
    assert(VectorKernels.i8Scale(arr(0.0, 0.0)) == 0.0)
    val qz = VectorKernels.i8Quantize(arr(0.0, 0.0), 0.0)
    assert((0 until 2).forall(qz.getByte(_) == 0))
    // quantized cosine stays close for a random-ish vector
    val x = arr(0.3, -0.7, 0.11, 0.95, -0.02, 0.44)
    val sx = VectorKernels.i8Scale(x)
    val rt = VectorKernels.i8Dequant(VectorKernels.i8Quantize(x, sx), sx)
    assert(VectorKernels.cosine(rt, x) > 0.9999)
  }

  test("pq_encode: portable per-subspace argmin, first-min ties, dim check") {
    import graft.functions.VectorFunctions
    val cbs = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)), // subspace 0: distinct
      Array(Array(0.5, 0.5), Array(0.5, 0.5))) // subspace 1: exact tie
    val n2 = VectorFunctions.codebookNorm2(cbs)
    val codes = VectorKernels.pqEncode(
      new GenericArrayData(Array(0.9, 0.1, 0.3, 0.3)), cbs, n2)
    assert(codes.getByte(0) == 0) // nearest sub-centroid
    assert(codes.getByte(1) == 0) // tie keeps the FIRST code (oracle list_position)
    // dim drift between vector and m*dsub fails loudly, not truncates
    intercept[IllegalArgumentException](
      VectorKernels.pqEncode(new GenericArrayData(Array(0.9, 0.1, 0.3)), cbs, n2))
  }

  test("pq_adc: ascending-subspace LUT sum; bad codes fail loudly") {
    val lut = Array(Array(0.25, 0.5), Array(0.125, 0.0625))
    def codes(bs: Byte*) = new GenericArrayData(bs.map(b => b: Any).toArray)
    assert(VectorKernels.pqAdc(codes(1, 0), lut) == 0.5 + 0.125)
    // code outside the trained codebook = layout drift, must throw
    intercept[IllegalArgumentException](VectorKernels.pqAdc(codes(3, 0), lut))
    // wrong subspace count = codes from a different layout, must throw
    intercept[IllegalArgumentException](VectorKernels.pqAdc(codes(1), lut))
  }

  test("i8_dot: exact integer accumulation, length-min guard") {
    def codes(bs: Int*) = new GenericArrayData(bs.map(b => b.toByte: Any).toArray)
    assert(VectorKernels.i8Dot(codes(127, -127, 1), codes(127, 127, 2)) ==
      127L * 127 - 127L * 127 + 2)
    assert(VectorKernels.i8Dot(codes(5), codes(3, 9)) == 15L) // min length
    assert(VectorKernels.i8Dot(codes(), codes()) == 0L)
  }

  test("cosine kernel") {
    def arr(xs: Double*) = new GenericArrayData(xs.toArray)
    assert(VectorKernels.cosine(arr(1, 0), arr(1, 0)) == 1.0)
    assert(VectorKernels.cosine(arr(1, 0), arr(0, 1)) == 0.0)
    assert(VectorKernels.cosine(arr(1, 0), arr(-1, 0)) == -1.0)
    assert(VectorKernels.cosine(arr(0, 0), arr(1, 1)) == 0.0) // zero-norm guard
    assert(math.abs(VectorKernels.cosine(arr(1, 2, 3), arr(4, 5, 6)) - 0.9746318461970762) < 1e-12)
    assert(VectorKernels.dot(arr(1, 2, 3), arr(4, 5, 6)) == 32.0)
  }
}
