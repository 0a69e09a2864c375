package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** Password-protected OOXML workbooks (ECMA-376 / MS-OFFCRYPTO "agile"
  * encryption), on JDK-only pieces: a minimal CFB (Compound File Binary)
  * container reader/writer + `javax.crypto` AES-CBC with SHA-family spin-
  * count key derivation. Closes the reference's `workbookPassword` path
  * (etl_collect_to_cleanse.py:171-185, spark-excel option) without a POI
  * jar.
  *
  * Scope: AGILE encryption only (the default since Office 2010 — version
  * 4.4 EncryptionInfo with an XML descriptor). The legacy formats
  * ("standard" v3.2 AES-ECB and v2 RC4) are rejected with a loud,
  * documented error: RC4 is cryptographically obsolete and the JDK ships
  * no RC4 provider in default policy; files saved by any modern Excel are
  * agile.
  *
  * Scale contract: like [[ExcelSource]], decryption is DRIVER-side (a CFB
  * container is one opaque blob — not splittable); for config-sized
  * workbooks, which is the only Excel the reference ingests.
  */
object OoxmlCrypto {

  private val CfbMagic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  /** CFB magic sniff — encrypted OOXML is a CFB container, plain OOXML is a
    * ZIP (PK). */
  def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && CfbMagic.indices.forall(i => bytes(i) == CfbMagic(i))

  def isCfbFile(path: String): Boolean = {
    val in = new java.io.FileInputStream(path)
    try { val head = in.readNBytes(8); isCfb(head) } finally in.close()
  }

  class WrongPasswordException(msg: String) extends IllegalArgumentException(msg)

  // ---------------------------------------------------------------- CFB read

  private val ENDOFCHAIN = 0xFFFFFFFE
  private val FREESECT = 0xFFFFFFFF

  /** Minimal CFB reader: header -> DIFAT -> FAT -> directory; streams come
    * back by name, from the regular chain or (below the mini cutoff) the
    * mini-stream chain. Linear directory scan — no red-black traversal
    * needed to FIND entries, only to balance writes. */
  private[sources] final class Cfb(bytes: Array[Byte]) {
    require(isCfb(bytes), "not a CFB container")
    private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    private val sectorShift = bb.getShort(0x1E).toInt
    private val sectorSize = 1 << sectorShift
    private val miniShift = bb.getShort(0x20).toInt
    private val miniSize = 1 << miniShift
    private val numFatSectors = bb.getInt(0x2C)
    private val firstDirSector = bb.getInt(0x30)
    private val miniCutoff = bb.getInt(0x38)
    private val firstMiniFat = bb.getInt(0x3C)
    private val firstDifat = bb.getInt(0x44)
    private val numDifat = bb.getInt(0x48)

    // MS-CFB §2.1: sector n sits at (n+1) << sectorShift — the header
    // occupies the whole of "sector -1", which is 512 bytes in a v3 file
    // but a full 4096 in a v4 file (512 of header + 3584 zero padding).
    // `512 + n*sectorSize` would agree for v3 and misread every v4 offset.
    private def sectorAt(n: Int): Int = (n + 1) * sectorSize

    private val fat: Array[Int] = {
      val fatSectors = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < 109 && fatSectors.length < numFatSectors) {
        val v = bb.getInt(0x4C + i * 4)
        if (v != FREESECT) fatSectors += v
        i += 1
      }
      // DIFAT overflow chain (files > ~6.8 MB at 512-byte sectors)
      var difat = firstDifat; var guard = 0
      while (difat != ENDOFCHAIN && difat != FREESECT && guard <= numDifat) {
        val base = sectorAt(difat)
        val perSector = sectorSize / 4 - 1
        (0 until perSector).foreach { j =>
          val v = bb.getInt(base + j * 4)
          if (v != FREESECT && fatSectors.length < numFatSectors) fatSectors += v
        }
        difat = bb.getInt(base + perSector * 4); guard += 1
      }
      val out = new Array[Int](fatSectors.length * (sectorSize / 4))
      fatSectors.zipWithIndex.foreach { case (s, k) =>
        val base = sectorAt(s)
        (0 until sectorSize / 4).foreach(j => out(k * (sectorSize / 4) + j) = bb.getInt(base + j * 4))
      }
      out
    }

    private def chain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start; var guard = 0
      while (s != ENDOFCHAIN && s != FREESECT && guard < fat.length + 2) {
        out.write(bytes, sectorAt(s), math.min(sectorSize, bytes.length - sectorAt(s)))
        s = fat(s); guard += 1
      }
      out.toByteArray
    }

    private case class DirEntry(name: String, objType: Int, start: Int, size: Long)

    private val dir: Seq[DirEntry] = {
      val raw = chain(firstDirSector)
      (0 until raw.length / 128).map { i =>
        val e = ByteBuffer.wrap(raw, i * 128, 128).order(ByteOrder.LITTLE_ENDIAN)
        val nameLen = e.getShort(i * 128 + 0x40).toInt
        val name = if (nameLen >= 2)
          new String(raw, i * 128, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        else ""
        // v3 files may leave garbage in the high 4 size bytes — use low 4
        DirEntry(name, raw(i * 128 + 0x42) & 0xFF, e.getInt(i * 128 + 0x74),
          e.getInt(i * 128 + 0x78).toLong & 0xFFFFFFFFL)
      }
    }

    private lazy val miniStream: Array[Byte] = {
      val root = dir.find(_.objType == 5).getOrElse(
        throw new IllegalArgumentException("CFB has no root entry"))
      chain(root.start).take(root.size.toInt)
    }
    private lazy val miniFat: Array[Int] = {
      val raw = chain(firstMiniFat)
      Array.tabulate(raw.length / 4)(i =>
        ByteBuffer.wrap(raw, i * 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt)
    }

    def stream(name: String): Option[Array[Byte]] =
      dir.find(e => e.objType == 2 && e.name == name).map { e =>
        if (e.size >= miniCutoff) chain(e.start).take(e.size.toInt)
        else {
          val out = new java.io.ByteArrayOutputStream()
          var s = e.start; var guard = 0
          while (s != ENDOFCHAIN && s != FREESECT && guard < miniFat.length + 2) {
            out.write(miniStream, s * miniSize,
              math.min(miniSize, miniStream.length - s * miniSize))
            s = miniFat(s); guard += 1
          }
          out.toByteArray.take(e.size.toInt)
        }
      }
  }

  // --------------------------------------------------------------- CFB write

  /** Minimal CFB writer for the encryptor: regular-FAT streams plus a
    * spec-correct mini-stream for entries under the 4096-byte cutoff (the
    * EncryptionInfo descriptor always is). Capacity bounded by the header's
    * 109 DIFAT slots (~6.8 MB) — config-workbook scale, enforced loudly. */
  private[graft] def writeCfb(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val sectorSize = 512; val miniSize = 64; val cutoff = 4096
    val (small, big) = streams.partition(_._2.length < cutoff)

    def pad(b: Array[Byte], unit: Int): Array[Byte] =
      if (b.length % unit == 0) b else b ++ new Array[Byte](unit - b.length % unit)

    // mini stream: concatenated mini-sector-padded small streams
    val miniChunks = small.map { case (n, b) => (n, b, pad(b, miniSize)) }
    val miniStream = miniChunks.flatMap(_._3).toArray
    val miniStarts = miniChunks.scanLeft(0)((acc, c) => acc + c._3.length / miniSize).init
    val nMini = miniStream.length / miniSize
    val miniFatEntries: Array[Int] = {
      val mf = Array.fill(nMini)(0)
      var pos = 0
      miniChunks.foreach { case (_, _, padded) =>
        val n = padded.length / miniSize
        (0 until n).foreach(j => mf(pos + j) = if (j == n - 1) ENDOFCHAIN else pos + j + 1)
        pos += n
      }
      mf
    }

    // regular sectors, in order: [big streams][mini stream][miniFAT][dir][FAT]
    val bigPadded = big.map { case (n, b) => (n, b, pad(b, sectorSize)) }
    val miniStreamPadded = pad(miniStream, sectorSize)
    val miniFatBytes = pad(miniFatEntries.flatMap { v =>
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v); b.array()
    }, sectorSize)

    // directory: root + one entry per stream (big first, then small)
    val entries = ("Root Entry", 5) +: (big.map(s => (s._1, 2)) ++ small.map(s => (s._1, 2)))
    val dirBytes = pad(new Array[Byte](entries.length * 128), sectorSize)

    val nBig = bigPadded.map(_._3.length / sectorSize)
    val nMiniStreamSectors = miniStreamPadded.length / sectorSize
    val nMiniFatSectors = if (nMini == 0) 0 else miniFatBytes.length / sectorSize
    val nDirSectors = dirBytes.length / sectorSize
    val nDataSectors = nBig.sum + nMiniStreamSectors + nMiniFatSectors + nDirSectors
    // FAT sizing: FAT covers data + FAT sectors themselves
    var nFat = 1
    while ((nDataSectors + nFat) > nFat * (sectorSize / 4)) nFat += 1
    val total = nDataSectors + nFat
    require(nFat <= 109, s"CFB writer capacity exceeded: $total sectors")

    val fat = Array.fill(total)(FREESECT)
    var cursor = 0
    def allocChain(n: Int): Int = {
      val start = cursor
      (0 until n).foreach(j => fat(cursor + j) = if (j == n - 1) ENDOFCHAIN else cursor + j + 1)
      cursor += n; start
    }
    val bigStarts = nBig.map(allocChain)
    val miniStreamStart = if (nMiniStreamSectors > 0) allocChain(nMiniStreamSectors) else ENDOFCHAIN
    val miniFatStart = if (nMiniFatSectors > 0) allocChain(nMiniFatSectors) else ENDOFCHAIN
    val dirStart = allocChain(nDirSectors)
    val fatStart = cursor
    (0 until nFat).foreach(j => fat(fatStart + j) = 0xFFFFFFFD) // FATSECT

    // directory entries
    val dirBuf = ByteBuffer.wrap(dirBytes).order(ByteOrder.LITTLE_ENDIAN)
    def writeEntry(idx: Int, name: String, objType: Int, start: Int, size: Long,
                   left: Int = -1, right: Int = -1, child: Int = -1): Unit = {
      val base = idx * 128
      val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      require(nameBytes.length <= 62, s"CFB name too long: $name")
      System.arraycopy(nameBytes, 0, dirBytes, base, nameBytes.length)
      dirBuf.putShort(base + 0x40, (nameBytes.length + 2).toShort)
      dirBytes(base + 0x42) = objType.toByte
      dirBytes(base + 0x43) = 1 // black
      dirBuf.putInt(base + 0x44, left)
      dirBuf.putInt(base + 0x48, right)
      dirBuf.putInt(base + 0x4C, child)
      dirBuf.putInt(base + 0x74, start)
      dirBuf.putLong(base + 0x78, size)
    }
    // root: child -> entry 1; flat right-sibling chain (our reader scans
    // linearly; conforming readers tolerate a degenerate tree)
    writeEntry(0, "Root Entry", 5, miniStreamStart, miniStream.length.toLong,
      child = if (entries.length > 1) 1 else -1)
    val streamMeta = big.zip(bigStarts).map { case ((n, b), st) => (n, st, b.length.toLong) } ++
      small.zip(miniStarts).map { case ((n, b), st) => (n, st, b.length.toLong) }
    streamMeta.zipWithIndex.foreach { case ((name, start, size), i) =>
      val idx = i + 1
      writeEntry(idx, name, 2, start, size,
        right = if (idx + 1 < entries.length) idx + 1 else -1)
    }

    // header
    val header = new Array[Byte](512)
    val hb = ByteBuffer.wrap(header).order(ByteOrder.LITTLE_ENDIAN)
    System.arraycopy(CfbMagic, 0, header, 0, 8)
    hb.putShort(0x18, 0x003E.toShort); hb.putShort(0x1A, 0x0003.toShort) // v3
    hb.putShort(0x1C, 0xFFFE.toShort) // byte order
    hb.putShort(0x1E, 9.toShort); hb.putShort(0x20, 6.toShort)
    hb.putInt(0x2C, nFat)
    hb.putInt(0x30, dirStart)
    hb.putInt(0x38, cutoff)
    hb.putInt(0x3C, miniFatStart); hb.putInt(0x40, nMiniFatSectors)
    hb.putInt(0x44, ENDOFCHAIN); hb.putInt(0x48, 0)
    (0 until 109).foreach(i => hb.putInt(0x4C + i * 4, if (i < nFat) fatStart + i else FREESECT))

    val fatBytes = pad(fat.flatMap { v =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    }, sectorSize)

    val out = new java.io.ByteArrayOutputStream()
    out.write(header)
    bigPadded.foreach(b => out.write(b._3))
    out.write(miniStreamPadded)
    if (nMiniFatSectors > 0) out.write(miniFatBytes)
    out.write(dirBytes)
    out.write(fatBytes)
    out.toByteArray
  }

  // ------------------------------------------------------------ agile crypto

  private val BlkVerifierInput = Array(0xFE, 0xA7, 0xD2, 0x76, 0x3B, 0x4B, 0x9E, 0x79).map(_.toByte)
  private val BlkVerifierValue = Array(0xD7, 0xAA, 0x0F, 0x6D, 0x30, 0x61, 0x34, 0x4E).map(_.toByte)
  private val BlkKeyValue = Array(0x14, 0x6E, 0x0B, 0xE7, 0xAB, 0xAC, 0xD0, 0xD6).map(_.toByte)
  private val BlkHmacKey = Array(0x5F, 0xB2, 0xAD, 0x01, 0x0C, 0xB9, 0xE1, 0xF6).map(_.toByte)
  private val BlkHmacValue = Array(0xA0, 0x67, 0x7F, 0x02, 0xB2, 0x2C, 0x84, 0x33).map(_.toByte)

  private def digest(alg: String): MessageDigest = MessageDigest.getInstance(alg match {
    case "SHA512" | "SHA-512" => "SHA-512"
    case "SHA384" | "SHA-384" => "SHA-384"
    case "SHA256" | "SHA-256" => "SHA-256"
    case "SHA1" | "SHA-1" => "SHA-1"
    case other => throw new IllegalArgumentException(s"unsupported hashAlgorithm '$other'")
  })

  private def le32(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()

  /** Truncate-or-0x36-pad to `n` bytes (MS-OFFCRYPTO 2.3.4.11/12). */
  private def fit(b: Array[Byte], n: Int): Array[Byte] =
    if (b.length == n) b
    else if (b.length > n) b.take(n)
    else b ++ Array.fill(n - b.length)(0x36.toByte)

  /** Spin-count password hash: H0 = H(salt ‖ UTF-16LE(pwd));
    * Hi = H(LE32(i) ‖ Hi−1), i in [0, spin). */
  private def pwdHash(alg: String, salt: Array[Byte], password: String, spin: Int): Array[Byte] = {
    val md = digest(alg)
    md.update(salt); md.update(password.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
    var h = md.digest()
    var i = 0
    while (i < spin) { md.reset(); md.update(le32(i)); md.update(h); h = md.digest(); i += 1 }
    h
  }

  private def blockKey(alg: String, pwdH: Array[Byte], blk: Array[Byte], keyBytes: Int): Array[Byte] = {
    val md = digest(alg); md.update(pwdH); md.update(blk)
    fit(md.digest(), keyBytes)
  }

  private def aesCbc(mode: Int, key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  private case class AgileInfo(
    kdSalt: Array[Byte], kdBlockSize: Int, kdKeyBits: Int, kdHash: String,
    encSalt: Array[Byte], encBlockSize: Int, encKeyBits: Int, encHash: String,
    spinCount: Int, hashSize: Int,
    encVerifierInput: Array[Byte], encVerifierValue: Array[Byte], encKeyValue: Array[Byte],
    encHmacKey: Option[Array[Byte]], encHmacValue: Option[Array[Byte]])

  private def parseInfo(info: Array[Byte]): AgileInfo = {
    val major = ByteBuffer.wrap(info).order(ByteOrder.LITTLE_ENDIAN).getShort(0).toInt
    val minor = ByteBuffer.wrap(info).order(ByteOrder.LITTLE_ENDIAN).getShort(2).toInt
    if (!(major == 4 && minor == 4))
      throw new UnsupportedOperationException(
        s"workbook uses legacy 'standard'/RC4 encryption (EncryptionInfo v$major.$minor) — " +
          "only ECMA-376 agile encryption (v4.4, Office 2010+) is supported; re-save with modern Excel")
    val xml = new String(info, 8, info.length - 8, java.nio.charset.StandardCharsets.UTF_8)
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    def first(tag: String): Option[org.w3c.dom.Element] = {
      val nl = doc.getElementsByTagName(tag)
      val nl2 = if (nl.getLength == 0) doc.getElementsByTagName("p:" + tag) else nl
      if (nl2.getLength == 0) None else Some(nl2.item(0).asInstanceOf[org.w3c.dom.Element])
    }
    def b64(s: String): Array[Byte] = java.util.Base64.getDecoder.decode(s)
    val kd = first("keyData").getOrElse(throw new IllegalArgumentException("EncryptionInfo: no keyData"))
    val ek = first("encryptedKey").getOrElse(throw new IllegalArgumentException("EncryptionInfo: no encryptedKey"))
    if (kd.getAttribute("cipherAlgorithm") != "AES" || kd.getAttribute("cipherChaining") != "ChainingModeCBC")
      throw new UnsupportedOperationException(
        s"unsupported cipher ${kd.getAttribute("cipherAlgorithm")}/${kd.getAttribute("cipherChaining")} — AES-CBC only")
    val di = first("dataIntegrity")
    AgileInfo(
      kdSalt = b64(kd.getAttribute("saltValue")),
      kdBlockSize = kd.getAttribute("blockSize").toInt,
      kdKeyBits = kd.getAttribute("keyBits").toInt,
      kdHash = kd.getAttribute("hashAlgorithm"),
      encSalt = b64(ek.getAttribute("saltValue")),
      encBlockSize = ek.getAttribute("blockSize").toInt,
      encKeyBits = ek.getAttribute("keyBits").toInt,
      encHash = ek.getAttribute("hashAlgorithm"),
      spinCount = ek.getAttribute("spinCount").toInt,
      hashSize = ek.getAttribute("hashSize").toInt,
      encVerifierInput = b64(ek.getAttribute("encryptedVerifierHashInput")),
      encVerifierValue = b64(ek.getAttribute("encryptedVerifierHashValue")),
      encKeyValue = b64(ek.getAttribute("encryptedKeyValue")),
      encHmacKey = di.map(e => b64(e.getAttribute("encryptedHmacKey"))),
      encHmacValue = di.map(e => b64(e.getAttribute("encryptedHmacValue"))))
  }

  /** Decrypt an agile-encrypted OOXML container to the inner ZIP package.
    * Wrong password → [[WrongPasswordException]] (verifier mismatch);
    * tampered package → IllegalArgumentException (HMAC mismatch). */
  def decrypt(cfbBytes: Array[Byte], password: String): Array[Byte] = {
    val cfb = new Cfb(cfbBytes)
    val info = cfb.stream("EncryptionInfo").getOrElse(
      throw new IllegalArgumentException("CFB container has no EncryptionInfo stream"))
    val pkg = cfb.stream("EncryptedPackage").getOrElse(
      throw new IllegalArgumentException("CFB container has no EncryptedPackage stream"))
    val a = parseInfo(info)

    val pwdH = pwdHash(a.encHash, a.encSalt, password, a.spinCount)
    val encKeyBytes = a.encKeyBits / 8
    val iv0 = fit(a.encSalt, a.encBlockSize)
    // password check: H(decrypted verifier input) must equal decrypted value
    val verifierInput = aesCbc(Cipher.DECRYPT_MODE,
      blockKey(a.encHash, pwdH, BlkVerifierInput, encKeyBytes), iv0, a.encVerifierInput)
    val verifierHash = digest(a.encHash).digest(verifierInput)
    val verifierValue = aesCbc(Cipher.DECRYPT_MODE,
      blockKey(a.encHash, pwdH, BlkVerifierValue, encKeyBytes), iv0, a.encVerifierValue)
    if (!java.util.Arrays.equals(verifierHash.take(a.hashSize),
        verifierValue.take(a.hashSize)))
      throw new WrongPasswordException("wrong workbook password (verifier mismatch)")

    val pkgKey = aesCbc(Cipher.DECRYPT_MODE,
      blockKey(a.encHash, pwdH, BlkKeyValue, encKeyBytes), iv0, a.encKeyValue)
      .take(a.kdKeyBits / 8)

    // integrity: HMAC over the whole EncryptedPackage stream
    (a.encHmacKey, a.encHmacValue) match {
      case (Some(ek), Some(ev)) =>
        val md = digest(a.kdHash)
        def kdIv(blk: Array[Byte]): Array[Byte] = {
          md.reset(); md.update(a.kdSalt); md.update(blk)
          fit(md.digest(), a.kdBlockSize)
        }
        val hmacKey = aesCbc(Cipher.DECRYPT_MODE, pkgKey, kdIv(BlkHmacKey), ek)
        val hmacVal = aesCbc(Cipher.DECRYPT_MODE, pkgKey, kdIv(BlkHmacValue), ev)
        val mac = javax.crypto.Mac.getInstance("Hmac" + digest(a.kdHash).getAlgorithm.replace("-", ""))
        val macLen = mac.getMacLength
        mac.init(new javax.crypto.spec.SecretKeySpec(hmacKey.take(macLen), mac.getAlgorithm))
        val expect = mac.doFinal(pkg)
        if (!java.util.Arrays.equals(expect, hmacVal.take(expect.length)))
          throw new IllegalArgumentException("EncryptedPackage HMAC mismatch — file corrupt or tampered")
      case _ => // dataIntegrity is optional in the spec
    }

    // package: LE64 plain size, then 4096-byte segments, IV_i = H(salt ‖ LE32(i))
    val plainSize = ByteBuffer.wrap(pkg).order(ByteOrder.LITTLE_ENDIAN).getLong(0)
    require(plainSize >= 0 && plainSize <= pkg.length.toLong * 2, s"implausible package size $plainSize")
    val md = digest(a.kdHash)
    val out = new java.io.ByteArrayOutputStream()
    var off = 8; var seg = 0
    while (off < pkg.length) {
      val n = math.min(4096, pkg.length - off)
      md.reset(); md.update(a.kdSalt); md.update(le32(seg))
      val iv = fit(md.digest(), a.kdBlockSize)
      out.write(aesCbc(Cipher.DECRYPT_MODE, pkgKey, iv, java.util.Arrays.copyOfRange(pkg, off, off + n)))
      off += n; seg += 1
    }
    out.toByteArray.take(plainSize.toInt)
  }

  /** Encrypt a ZIP package (e.g. an .xlsx) into an agile-encrypted CFB
    * container. SHA-512 / AES-256-CBC, the Office 2013+ default profile.
    * `spinCount` is honored by any conforming reader (it rides in the XML);
    * tests use a small value to keep fixture generation fast. `seed` makes
    * fixtures reproducible — this writer exists for fixtures and round-trip
    * tests, not for protecting secrets (java.util.Random is not a CSPRNG). */
  def encrypt(zipBytes: Array[Byte], password: String, spinCount: Int = 100000,
              seed: Long = java.lang.Double.doubleToLongBits(math.random())): Array[Byte] = {
    val rnd = new java.util.Random(seed)
    def rand(n: Int): Array[Byte] = { val b = new Array[Byte](n); rnd.nextBytes(b); b }
    val hashAlg = "SHA512"; val keyBits = 256; val blockSize = 16; val hashSize = 64
    val kdSalt = rand(16); val encSalt = rand(16)
    val pkgKey = rand(keyBits / 8); val verifierInput = rand(16)

    val md = digest(hashAlg)
    val pwdH = pwdHash(hashAlg, encSalt, password, spinCount)
    val iv0 = fit(encSalt, blockSize)
    def pad16(b: Array[Byte]): Array[Byte] =
      if (b.length % 16 == 0) b else b ++ new Array[Byte](16 - b.length % 16)
    val encVerifierInput = aesCbc(Cipher.ENCRYPT_MODE,
      blockKey(hashAlg, pwdH, BlkVerifierInput, keyBits / 8), iv0, pad16(verifierInput))
    md.reset()
    val encVerifierValue = aesCbc(Cipher.ENCRYPT_MODE,
      blockKey(hashAlg, pwdH, BlkVerifierValue, keyBits / 8), iv0, pad16(md.digest(verifierInput)))
    val encKeyValue = aesCbc(Cipher.ENCRYPT_MODE,
      blockKey(hashAlg, pwdH, BlkKeyValue, keyBits / 8), iv0, pad16(pkgKey))

    // EncryptedPackage: LE64 size + AES-CBC per 4096-byte segment
    val pkgOut = new java.io.ByteArrayOutputStream()
    pkgOut.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(zipBytes.length.toLong).array())
    var off = 0; var seg = 0
    while (off < zipBytes.length) {
      val n = math.min(4096, zipBytes.length - off)
      md.reset(); md.update(kdSalt); md.update(le32(seg))
      val iv = fit(md.digest(), blockSize)
      pkgOut.write(aesCbc(Cipher.ENCRYPT_MODE, pkgKey, iv,
        pad16(java.util.Arrays.copyOfRange(zipBytes, off, off + n))))
      off += n; seg += 1
    }
    val pkg = pkgOut.toByteArray

    // dataIntegrity
    def kdIv(blk: Array[Byte]): Array[Byte] = {
      md.reset(); md.update(kdSalt); md.update(blk); fit(md.digest(), blockSize)
    }
    val hmacKey = rand(hashSize)
    val mac = javax.crypto.Mac.getInstance("HmacSHA512")
    mac.init(new javax.crypto.spec.SecretKeySpec(hmacKey, "HmacSHA512"))
    val hmacVal = mac.doFinal(pkg)
    val encHmacKey = aesCbc(Cipher.ENCRYPT_MODE, pkgKey, kdIv(BlkHmacKey), pad16(hmacKey))
    val encHmacValue = aesCbc(Cipher.ENCRYPT_MODE, pkgKey, kdIv(BlkHmacValue), pad16(hmacVal))

    def b64(b: Array[Byte]): String = java.util.Base64.getEncoder.encodeToString(b)
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<encryption xmlns="http://schemas.microsoft.com/office/2006/encryption" xmlns:p="http://schemas.microsoft.com/office/2006/keyEncryptor/password"><keyData saltSize="16" blockSize="$blockSize" keyBits="$keyBits" hashSize="$hashSize" cipherAlgorithm="AES" cipherChaining="ChainingModeCBC" hashAlgorithm="$hashAlg" saltValue="${b64(kdSalt)}"/><dataIntegrity encryptedHmacKey="${b64(encHmacKey)}" encryptedHmacValue="${b64(encHmacValue)}"/><keyEncryptors><keyEncryptor uri="http://schemas.microsoft.com/office/2006/keyEncryptor/password"><p:encryptedKey spinCount="$spinCount" saltSize="16" blockSize="$blockSize" keyBits="$keyBits" hashSize="$hashSize" cipherAlgorithm="AES" cipherChaining="ChainingModeCBC" hashAlgorithm="$hashAlg" saltValue="${b64(encSalt)}" encryptedVerifierHashInput="${b64(encVerifierInput)}" encryptedVerifierHashValue="${b64(encVerifierValue)}" encryptedKeyValue="${b64(encKeyValue)}"/></keyEncryptor></keyEncryptors></encryption>"""
    val infoStream = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(4.toShort).putShort(4.toShort).putInt(0x40).array() ++
      xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)

    writeCfb(Seq("EncryptedPackage" -> pkg, "EncryptionInfo" -> infoStream))
  }

  /** File-level convenience: decrypt `path` (CFB) to a temp .xlsx and return
    * its path. Caller deletes when done. */
  def decryptToTempFile(path: String, password: String): java.nio.file.Path = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val zip = decrypt(bytes, password)
    require(zip.length >= 2 && zip(0) == 'P' && zip(1) == 'K',
      "decrypted payload is not a ZIP — corrupt container?")
    val tmp = java.nio.file.Files.createTempFile("graft_xlsx_dec", ".xlsx")
    java.nio.file.Files.write(tmp, zip)
    tmp
  }
}
