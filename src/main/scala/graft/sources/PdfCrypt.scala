package graft.sources

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** PDF standard security handler — EMPTY-user-password decryption
  * (ISO 32000 §7.6; the pypdf behavior the reference inherits: files
  * encrypted with only an owner password — print/copy-restricted PDFs —
  * decrypt transparently on read, while a real user password cannot be
  * guessed and the file degrades to empty, matching the reference's
  * skip-ledger for unreadable input).
  *
  * Implemented from the published spec algorithms:
  *  - Algorithm 2 RC4/MD5 key derivation (R2/R3/R4, 40-128 bit)
  *  - Algorithm 4/5 user-password validation against /U
  *  - Algorithm 1 per-object keys (+ the AESV2 "sAlT" suffix)
  *  - Algorithm 2.A/2.B SHA-2 hard hash (R5/R6, AESV3 256-bit) with the
  *    /UE-wrapped file key
  * Streams are RC4 or AES-CBC (leading 16-byte IV, PKCS#5 padding); all
  * crypto is JDK-native (MessageDigest + javax.crypto).
  *
  * Byte⇄String convention follows BinaryDocs: ISO-8859-1 chars ARE bytes.
  */
object PdfCrypt {

  sealed trait Access
  /** No /Encrypt dictionary — passthrough. */
  case object NotEncrypted extends Access
  /** Encrypted and the empty user password does not validate (or the
    * handler/filter is unsupported) — callers degrade to empty text.
    */
  case object Denied extends Access
  /** Empty user password validated: `decrypt(objNum, gen, rawStreamData)`.
    * Algorithm 1 mixes the low 2 generation bytes into the per-object MD5,
    * so R<=4 objects at nonzero generations need the real generation —
    * hard-coding 0 decrypts them to garbage.
    */
  final case class Granted(decrypt: (Int, Int, String) => String) extends Access

  // 32-byte password pad, ISO 32000 table Algorithm 2
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private[sources] def bytesOf(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) { out(i) = s.charAt(i).toByte; i += 1 }
    out
  }

  private[sources] def strOf(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length)
    b.foreach(x => sb.append((x & 0xff).toChar))
    sb.toString
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    parts.foreach(md.update)
    md.digest()
  }

  private[sources] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var k = 0
    while (k < data.length) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def aesCbc(mode: Int, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** Stream layout: 16-byte IV ‖ ciphertext; PKCS#5 pad stripped. */
  private def aesDecryptStream(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32) return Array.emptyByteArray
    val body = data.drop(16).take((data.length - 16) / 16 * 16)
    val out = aesCbc(Cipher.DECRYPT_MODE, key, data.take(16), body)
    val pad = out.last & 0xff
    if (pad >= 1 && pad <= 16 && pad <= out.length) out.dropRight(pad) else out
  }

  /** Algorithm 2: RC4-generation encryption key (R ≤ 4). */
  private[sources] def rc4FileKey(password: Array[Byte], o: Array[Byte], p: Int,
      id0: Array[Byte], r: Int, lengthBits: Int,
      encryptMetadata: Boolean): Array[Byte] = {
    val pBytes = Array[Byte]((p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)
    val extra =
      if (r >= 4 && !encryptMetadata) Array[Byte](-1, -1, -1, -1)
      else Array.emptyByteArray
    var h = md5((password ++ Pad).take(32), o.take(32), pBytes, id0, extra)
    val n = if (r == 2) 5 else lengthBits / 8
    if (r >= 3) for (_ <- 0 until 50) h = md5(h.take(n))
    h.take(n)
  }

  /** Algorithm 4 (R2) / 5 (R ≥ 3): does this key's /U entry match? */
  private[sources] def userValidates(key: Array[Byte], id0: Array[Byte], r: Int,
      u: Array[Byte]): Boolean =
    if (r == 2) java.util.Arrays.equals(rc4(key, Pad), u.take(32))
    else {
      var x = rc4(key, md5(Pad, id0))
      for (i <- 1 to 19) x = rc4(key.map(b => (b ^ i).toByte), x)
      java.util.Arrays.equals(x.take(16), u.take(16))
    }

  /** Algorithm 3's owner-key RC4 steps — used by the FIXTURE builder in
    * tests (encryption side of the same spec).
    */
  private[sources] def ownerEntry(ownerPwd: Array[Byte], userPwd: Array[Byte],
      r: Int, lengthBits: Int): Array[Byte] = {
    var h = md5((ownerPwd ++ Pad).take(32))
    val n = if (r == 2) 5 else lengthBits / 8
    if (r >= 3) for (_ <- 0 until 50) h = md5(h.take(n))
    val rk = h.take(n)
    var x = rc4(rk, (userPwd ++ Pad).take(32))
    if (r >= 3) for (i <- 1 to 19) x = rc4(rk.map(b => (b ^ i).toByte), x)
    x
  }

  /** Algorithm 1: per-object key for RC4/AESV2. */
  private[sources] def objectKey(fileKey: Array[Byte], objNum: Int,
      gen: Int, aes: Boolean): Array[Byte] = {
    val tail = Array[Byte]((objNum & 0xff).toByte, ((objNum >> 8) & 0xff).toByte,
      ((objNum >> 16) & 0xff).toByte, (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.emptyByteArray
    md5(fileKey, tail, salt).take(math.min(fileKey.length + 5, 16))
  }

  /** Algorithm 2.B hard hash (R6); R5 is the plain SHA-256 first step. */
  private[sources] def hash2b(password: Array[Byte], salt: Array[Byte],
      udata: Array[Byte], r: Int): Array[Byte] = {
    var k = MessageDigest.getInstance("SHA-256").digest(password ++ salt ++ udata)
    if (r == 5) return k
    var count = 0
    var done = false
    while (!done) {
      count += 1
      val k1 = password ++ k ++ udata
      val rep = new Array[Byte](k1.length * 64)
      for (i <- 0 until 64) System.arraycopy(k1, 0, rep, i * k1.length, k1.length)
      val e = aesCbc(Cipher.ENCRYPT_MODE, k.take(16), k.slice(16, 32), rep)
      val mod = e.take(16).map(_ & 0xff).sum % 3
      k = MessageDigest.getInstance(
        mod match { case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512" })
        .digest(e)
      done = count >= 64 && (e.last & 0xff) <= count - 32
    }
    k.take(32)
  }

  // --- encryption-side primitives (fixture building in tests: the spec
  // algorithms run forward to CONSTRUCT valid encrypted documents, so the
  // decrypt path is validated against independently-computed O/U entries,
  // not against its own output) ------------------------------------------

  /** Algorithm 4/5 forward: the /U entry for a derived file key. */
  private[sources] def userEntry(key: Array[Byte], id0: Array[Byte],
      r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var x = rc4(key, md5(Pad, id0))
      for (i <- 1 to 19) x = rc4(key.map(b => (b ^ i).toByte), x)
      x ++ new Array[Byte](16) // spec: 16 arbitrary padding bytes
    }

  /** PKCS#5-pad, AES-CBC-encrypt, prepend the IV — the stream layout
    * [[aesDecryptStream]] consumes.
    */
  private[sources] def aesEncryptStream(key: Array[Byte], iv: Array[Byte],
      plain: Array[Byte]): Array[Byte] = {
    val pad = 16 - (plain.length % 16)
    iv ++ aesCbc(Cipher.ENCRYPT_MODE, key, iv,
      plain ++ Array.fill(pad)(pad.toByte))
  }

  /** Raw zero-IV AES-CBC encryption (V5 /UE //OE key wrapping). */
  private[sources] def aesWrapKey(key: Array[Byte], data: Array[Byte]): Array[Byte] =
    aesCbc(Cipher.ENCRYPT_MODE, key, new Array[Byte](16), data)

  // --- /Encrypt dictionary parsing --------------------------------------

  private val EncRefRe = java.util.regex.Pattern.compile(
    "/Encrypt\\s+(\\d+)\\s+\\d+\\s+R")
  private val IdRe = java.util.regex.Pattern.compile(
    "/ID\\s*\\[\\s*(?:<([0-9A-Fa-f\\s]*)>|\\(((?:[^()\\\\]|\\\\.)*)\\))")

  private def objBody(raw: String, num: Int): Option[String] = {
    val m = java.util.regex.Pattern.compile(
      "(?s)(?<![0-9])" + num + "\\s+\\d+\\s+obj\\b(.*?)endobj").matcher(raw)
    if (m.find()) Some(m.group(1)) else None
  }

  private def intField(dict: String, name: String, default: Int): Int = {
    val m = java.util.regex.Pattern.compile(
      "/" + name + "(?![A-Za-z])\\s+(-?\\d+)").matcher(dict)
    if (m.find()) m.group(1).toInt else default
  }

  /** A /Name-keyed string value, literal or hex form; name-boundary-safe
    * (`/O` must not match `/OE`).
    */
  private def strField(dict: String, name: String): Option[Array[Byte]] = {
    val m = java.util.regex.Pattern.compile(
      "/" + name + "(?![A-Za-z])\\s*(?:\\(((?:[^()\\\\]|\\\\.)*)\\)|<([0-9A-Fa-f\\s]*)>)",
      java.util.regex.Pattern.DOTALL).matcher(dict)
    if (!m.find()) None
    else if (m.group(1) != null)
      Some(bytesOf(BinaryDocs.pdfStringBody(m.group(1))))
    else Some(hexBytes(m.group(2)))
  }

  private def hexBytes(h0: String): Array[Byte] = {
    val h = h0.replaceAll("\\s", "")
    val out = new Array[Byte](h.length / 2)
    for (i <- out.indices)
      out(i) = Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16).toByte
    out
  }

  /** Algorithm 7's owner-side step: decrypt /O with the owner-password RC4
    * key to recover the PADDED user password (32 bytes), from which the
    * file key derives exactly as for a typed user password.
    */
  private def ownerToUserPadded(ownerPwd: Array[Byte], o: Array[Byte], r: Int,
      lengthBits: Int): Array[Byte] = {
    var h = md5((ownerPwd ++ Pad).take(32))
    val n = if (r == 2) 5 else lengthBits / 8
    if (r >= 3) for (_ <- 0 until 50) h = md5(h.take(n))
    val rk = h.take(n)
    if (r == 2) rc4(rk, o.take(32))
    else {
      var x = o.take(32)
      for (i <- 19 to 0 by -1) x = rc4(rk.map(b => (b ^ i).toByte), x)
      x
    }
  }

  /** Classify the document: unencrypted, decryptable (with the EMPTY user
    * password, or one of the provisioned `passwords` validating as USER or
    * OWNER password — pypdf's `PdfReader(password=...)` parity), or
    * denied. Unsupported filters/handlers → Denied (callers degrade to
    * empty — never garbage).
    */
  def access(raw: String, passwords: Seq[String] = Nil): Access = try {
    val em = EncRefRe.matcher(raw)
    if (!em.find()) return NotEncrypted
    val dict = objBody(raw, em.group(1).toInt).getOrElse(return Denied)
    val filterOk = java.util.regex.Pattern.compile("/Filter\\s*/Standard")
      .matcher(dict).find()
    if (!filterOk) return Denied // custom security handlers: out of scope
    val v = intField(dict, "V", 0)
    val r = intField(dict, "R", 2)
    val o = strField(dict, "O").getOrElse(return Denied)
    val u = strField(dict, "U").getOrElse(return Denied)
    val empty = Array.emptyByteArray
    // UTF-8 per ISO 32000-2 for R6 (SASLprep omitted — ASCII passwords);
    // the R<=4 pad algorithm consumes the same byte form
    val candidates = empty +: passwords.map(_.getBytes("UTF-8"))

    // stream crypt filter: V4/V5 name it via /CF + /StmF (default
    // Identity); V1/V2 are implicitly RC4 on everything
    val cfm = {
      val m = java.util.regex.Pattern.compile("/CFM\\s*/(\\w+)").matcher(dict)
      if (m.find()) m.group(1) else if (v <= 2) "V2" else "Identity"
    }
    val stmfIdentity = v >= 4 && {
      val m = java.util.regex.Pattern.compile("/StmF\\s*/(\\w+)").matcher(dict)
      !m.find() || m.group(1) == "Identity"
    }

    if (v == 5 || r >= 5) {
      // AESV3: Algorithm 11 user / Algorithm 12 owner validation, then
      // unwrap the file key from /UE (user) or /OE (owner)
      if (u.length < 48 || o.length < 48) return Denied
      def viaUser(pwd: Array[Byte]): Option[Array[Byte]] =
        if (!java.util.Arrays.equals(hash2b(pwd, u.slice(32, 40), empty, r), u.take(32)))
          None
        else strField(dict, "UE").map { ue =>
          val ik = hash2b(pwd, u.slice(40, 48), empty, r)
          aesCbc(Cipher.DECRYPT_MODE, ik, new Array[Byte](16), ue.take(32))
        }
      def viaOwner(pwd: Array[Byte]): Option[Array[Byte]] = {
        val udata = u.take(48)
        if (!java.util.Arrays.equals(hash2b(pwd, o.slice(32, 40), udata, r), o.take(32)))
          None
        else strField(dict, "OE").map { oe =>
          val ik = hash2b(pwd, o.slice(40, 48), udata, r)
          aesCbc(Cipher.DECRYPT_MODE, ik, new Array[Byte](16), oe.take(32))
        }
      }
      val fileKey = candidates.iterator
        .flatMap(pwd => viaUser(pwd).orElse(viaOwner(pwd)))
        .nextOption().getOrElse(return Denied)
      // AESV3 uses the file key directly — no per-object derivation, the
      // generation number does not participate (ISO 32000-2 §7.6.3.3)
      if (stmfIdentity) Granted((_, _, s) => s)
      else Granted((_, _, s) => strOf(aesDecryptStream(fileKey, bytesOf(s))))
    } else {
      val p = intField(dict, "P", -1)
      val lengthBits = intField(dict, "Length", 40)
      val encryptMetadata = !dict.contains("/EncryptMetadata false")
      val id0 = {
        val m = IdRe.matcher(raw)
        if (m.find())
          if (m.group(1) != null) hexBytes(m.group(1))
          else bytesOf(BinaryDocs.pdfStringBody(m.group(2)))
        else empty
      }
      // Algorithm 4/5 as user password; Algorithm 7 as owner password (the
      // recovered padded user password re-enters the user derivation)
      def userKey(pwd: Array[Byte]): Option[Array[Byte]] = {
        val key = rc4FileKey(pwd, o, p, id0, r, lengthBits, encryptMetadata)
        if (userValidates(key, id0, r, u)) Some(key) else None
      }
      val key = candidates.iterator
        .flatMap(pwd => userKey(pwd).orElse(
          userKey(ownerToUserPadded(pwd, o, r, lengthBits))))
        .nextOption().getOrElse(return Denied)
      if (stmfIdentity) Granted((_, _, s) => s)
      else if (cfm == "AESV2")
        Granted((n, g, s) =>
          strOf(aesDecryptStream(objectKey(key, n, g, aes = true), bytesOf(s))))
      else
        Granted((n, g, s) => strOf(rc4(objectKey(key, n, g, aes = false), bytesOf(s))))
    }
  } catch { case _: Exception => Denied }
}
