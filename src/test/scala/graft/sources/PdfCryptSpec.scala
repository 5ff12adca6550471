package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Standard-security-handler goldens: fixtures are ENCRYPTED here by
  * running the published spec algorithms forward (O/U entries, per-object
  * keys, AES stream layout computed independently of the decrypt path),
  * then pushed through the real `BinaryDocs.pdfText`. Empty-user-password
  * files (owner-only restrictions) must decrypt transparently; a real
  * user password must degrade to empty — pypdf-parity behavior.
  */
class PdfCryptSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = PdfCrypt.bytesOf(s)
  private def hex(a: Array[Byte]): String = a.map(x => f"${x & 0xff}%02X").mkString
  private val id0 = Array.tabulate(16)(i => (i * 7 + 3).toByte)
  private val P = -44 // print allowed, modify/copy denied — the common case

  private def pdfBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) { out(i) = s.charAt(i).toByte; i += 1 }
    out
  }

  private def assemble(encDict: String, cipherStream: Array[Byte],
      objGen: Int = 0): Array[Byte] = {
    val head = s"%PDF-1.6\n1 $objGen obj\n<< /Length " + cipherStream.length +
      " >>\nstream\n"
    val tail = "\nendstream\nendobj\n9 0 obj\n" + encDict + "\nendobj\n" +
      s"trailer << /Root 2 0 R /Encrypt 9 0 R /ID [<${hex(id0)}> <${hex(id0)}>] >>\n%%EOF"
    pdfBytes(head) ++ cipherStream ++ pdfBytes(tail)
  }

  private def rc4Pdf(text: String, userPwd: String, ownerPwd: String,
      r: Int, lengthBits: Int): Array[Byte] = {
    val o = PdfCrypt.ownerEntry(b(ownerPwd), b(userPwd), r, lengthBits)
    val key = PdfCrypt.rc4FileKey(b(userPwd), o, P, id0, r, lengthBits,
      encryptMetadata = true)
    val u = PdfCrypt.userEntry(key, id0, r)
    val v = if (r == 2) 1 else 2
    val cipher = PdfCrypt.rc4(
      PdfCrypt.objectKey(key, 1, 0, aes = false), b(s"BT ($text) Tj ET"))
    assemble(
      s"<< /Filter /Standard /V $v /R $r /Length $lengthBits /P $P " +
        s"/O <${hex(o)}> /U <${hex(u)}> >>", cipher)
  }

  private def aesV2Pdf(text: String, userPwd: String, ownerPwd: String): Array[Byte] = {
    val o = PdfCrypt.ownerEntry(b(ownerPwd), b(userPwd), r = 4, 128)
    val key = PdfCrypt.rc4FileKey(b(userPwd), o, P, id0, r = 4, 128,
      encryptMetadata = true)
    val u = PdfCrypt.userEntry(key, id0, r = 4)
    val iv = Array.tabulate(16)(i => (i * 13 + 1).toByte)
    val cipher = PdfCrypt.aesEncryptStream(
      PdfCrypt.objectKey(key, 1, 0, aes = true), iv, b(s"BT ($text) Tj ET"))
    assemble(
      "<< /Filter /Standard /V 4 /R 4 /Length 128 /P " + P +
        " /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >>" +
        s" /StmF /StdCF /StrF /StdCF /O <${hex(o)}> /U <${hex(u)}> >>", cipher)
  }

  private def aesV3Pdf(text: String, userPwd: String, ownerPwd: String,
      r: Int): Array[Byte] = {
    val none = Array.emptyByteArray
    val valSalt = Array.tabulate(8)(i => (i + 1).toByte)
    val keySalt = Array.tabulate(8)(i => (i + 101).toByte)
    val fileKey = Array.tabulate(32)(i => (i * 11 + 5).toByte)
    val u = PdfCrypt.hash2b(b(userPwd), valSalt, none, r) ++ valSalt ++ keySalt
    val ue = PdfCrypt.aesWrapKey(PdfCrypt.hash2b(b(userPwd), keySalt, none, r), fileKey)
    val oValSalt = Array.tabulate(8)(i => (i + 51).toByte)
    val oKeySalt = Array.tabulate(8)(i => (i + 151).toByte)
    val o = PdfCrypt.hash2b(b(ownerPwd), oValSalt, u, r) ++ oValSalt ++ oKeySalt
    val oe = PdfCrypt.aesWrapKey(PdfCrypt.hash2b(b(ownerPwd), oKeySalt, u, r), fileKey)
    val iv = Array.tabulate(16)(i => (i * 17 + 9).toByte)
    val cipher = PdfCrypt.aesEncryptStream(fileKey, iv, b(s"BT ($text) Tj ET"))
    assemble(
      s"<< /Filter /Standard /V 5 /R $r /Length 256 /P $P" +
        " /CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF" +
        s" /O <${hex(o)}> /U <${hex(u)}> /OE <${hex(oe)}> /UE <${hex(ue)}> >>",
      cipher)
  }

  test("RC4 object at NONZERO generation mixes the generation into its key") {
    // Algorithm 1 appends the low 2 generation bytes to the MD5 input; a
    // decrypt path that hard-codes generation 0 turns this into garbage
    val gen = 2
    val o = PdfCrypt.ownerEntry(b("owner"), b(""), r = 3, 128)
    val key = PdfCrypt.rc4FileKey(b(""), o, P, id0, r = 3, 128,
      encryptMetadata = true)
    val u = PdfCrypt.userEntry(key, id0, r = 3)
    val cipher = PdfCrypt.rc4(
      PdfCrypt.objectKey(key, 1, gen, aes = false), b("BT (Updated revision) Tj ET"))
    val bytes = assemble(
      s"<< /Filter /Standard /V 2 /R 3 /Length 128 /P $P " +
        s"/O <${hex(o)}> /U <${hex(u)}> >>", cipher, objGen = gen)
    assert(BinaryDocs.pdfText(bytes) == "Updated revision")
  }

  test("RC4 40-bit (V1/R2) empty user password decrypts transparently") {
    assert(BinaryDocs.pdfText(rc4Pdf("Forty bit secret", "", "owner", 2, 40))
      == "Forty bit secret")
  }

  test("RC4 128-bit (V2/R3) owner-restricted file decrypts with empty user password") {
    assert(BinaryDocs.pdfText(rc4Pdf("Print-restricted text", "", "hunter2", 3, 128))
      == "Print-restricted text")
  }

  test("AES-128 (V4/AESV2) empty user password decrypts transparently") {
    assert(BinaryDocs.pdfText(aesV2Pdf("AESV2 body", "", "owner-pass"))
      == "AESV2 body")
  }

  test("AES-256 (V5/R6) hard-hash validation + UE key unwrap") {
    assert(BinaryDocs.pdfText(aesV3Pdf("Modern AES256 text", "", "owner!", 6))
      == "Modern AES256 text")
  }

  test("AES-256 (V5/R5) simple-hash variant") {
    assert(BinaryDocs.pdfText(aesV3Pdf("Legacy R5 text", "", "owner!", 5))
      == "Legacy R5 text")
  }

  test("real user password degrades to empty, never garbage") {
    assert(BinaryDocs.pdfText(rc4Pdf("hidden", "secret", "owner", 3, 128)) == "")
    assert(BinaryDocs.pdfText(aesV2Pdf("hidden", "secret", "owner")) == "")
    assert(BinaryDocs.pdfText(aesV3Pdf("hidden", "secret", "owner", 6)) == "")
  }

  test("provisioned USER password decrypts across RC4/AESV2/AESV3") {
    val pw = Seq("s3cret pw")
    assert(BinaryDocs.pdfText(rc4Pdf("forty user", "s3cret pw", "own", 2, 40), pw)
      == "forty user")
    assert(BinaryDocs.pdfText(rc4Pdf("rc4 user body", "s3cret pw", "own", 3, 128), pw)
      == "rc4 user body")
    assert(BinaryDocs.pdfText(aesV2Pdf("aesv2 user body", "s3cret pw", "own"), pw)
      == "aesv2 user body")
    assert(BinaryDocs.pdfText(aesV3Pdf("aesv3 r6 user body", "s3cret pw", "own", 6), pw)
      == "aesv3 r6 user body")
    assert(BinaryDocs.pdfText(aesV3Pdf("aesv3 r5 user body", "s3cret pw", "own", 5), pw)
      == "aesv3 r5 user body")
  }

  test("provisioned OWNER password recovers the user key (Algorithm 7 / OE unwrap)") {
    val pw = Seq("owner-master")
    assert(BinaryDocs.pdfText(rc4Pdf("rc4 owner route", "userpw", "owner-master", 3, 128), pw)
      == "rc4 owner route")
    assert(BinaryDocs.pdfText(aesV2Pdf("aesv2 owner route", "userpw", "owner-master"), pw)
      == "aesv2 owner route")
    assert(BinaryDocs.pdfText(aesV3Pdf("aesv3 owner route", "userpw", "owner-master", 6), pw)
      == "aesv3 owner route")
  }

  test("a keyring tries every password; all-wrong still degrades to empty") {
    val ring = Seq("nope", "also wrong", "s3cret pw")
    assert(BinaryDocs.pdfText(aesV2Pdf("ring hit", "s3cret pw", "own"), ring)
      == "ring hit")
    assert(BinaryDocs.pdfText(aesV2Pdf("ring miss", "other", "own"),
      Seq("nope", "wrong")) == "")
    assert(BinaryDocs.pdfText(aesV3Pdf("ring miss", "other", "own", 6),
      Seq("nope", "wrong")) == "")
    assert(BinaryDocs.pdfText(rc4Pdf("ring miss", "other", "own", 3, 128),
      Seq("nope", "wrong")) == "")
  }

  test("property: random content and owner passwords round-trip; any user password denies") {
    val rng = new scala.util.Random(20260813L)
    def word(): String = {
      val chars = "abcdefghijklmnopqrstuvwxyz0123456789 .,:-!?"
      (0 until (3 + rng.nextInt(40))).map(_ => chars(rng.nextInt(chars.length))).mkString
    }
    for (i <- 0 until 25) {
      // the walker trims each output line; no parens/backslashes in the
      // alphabet, so no literal-string escaping is needed
      val text = word().trim
      val owner = s"own${rng.nextInt(1000000)}"
      val (builder, tag) = (i % 4: @unchecked) match {
        case 0 => ((t: String, u: String) => rc4Pdf(t, u, owner, 2, 40), "rc4-40")
        case 1 => ((t: String, u: String) => rc4Pdf(t, u, owner, 3, 128), "rc4-128")
        case 2 => ((t: String, u: String) => aesV2Pdf(t, u, owner), "aesv2")
        case 3 => ((t: String, u: String) => aesV3Pdf(t, u, owner, 6), "aesv3")
      }
      assert(BinaryDocs.pdfText(builder(text, "")) == text,
        s"[$tag] empty-user round-trip failed for ${text.take(40)}")
      assert(BinaryDocs.pdfText(builder(text, s"pw${rng.nextInt(1000000)}")) == "",
        s"[$tag] a real user password must deny")
    }
  }

  test("unsupported security handler degrades to empty") {
    val weird = assemble(
      "<< /Filter /AcmeSecure /V 2 /R 3 /Length 128 /P -44 /O <00> /U <00> >>",
      b("BT (x) Tj ET"))
    assert(BinaryDocs.pdfText(weird) == "")
  }
}
