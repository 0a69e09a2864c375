package graft

import graft.sources.{ExcelSource, OoxmlCrypto, Sources}
import graft.config.Specs

import java.nio.file.{Files, Paths}

/** Agile-encrypted workbook support: CFB container round-trip (including the
  * mini-stream path — EncryptionInfo always sits under the 4096-byte
  * cutoff), wrong-password and tamper detection, legacy-format rejection,
  * and the spec-driven dispatcher path end-to-end. */
class OoxmlCryptoSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir = {
    val d = Files.createTempDirectory("graft_ooxml_spec")
    d.toFile.deleteOnExit(); d
  }

  private def writePlain(dir: java.nio.file.Path): java.nio.file.Path = {
    val p = dir.resolve("book.xlsx")
    ExcelSource.write(p.toString, Seq(
      Seq("id", "name"), Seq("1", "alpha"), Seq("2", "beta"), Seq("3", "gamma, delta")))
    p
  }

  test("encrypt/decrypt round-trip preserves the package byte-for-byte") {
    val d = tmpDir
    val plain = Files.readAllBytes(writePlain(d))
    val enc = OoxmlCrypto.encrypt(plain, "pw123", spinCount = 1000, seed = 7L)
    assert(OoxmlCrypto.isCfb(enc))
    assert(!OoxmlCrypto.isCfb(plain)) // a zip is not a CFB
    val dec = OoxmlCrypto.decrypt(enc, "pw123")
    assert(java.util.Arrays.equals(dec, plain))
  }

  test("package larger than one 4096-byte segment round-trips (multi-segment CBC)") {
    val d = tmpDir
    // ~300 rows -> a zip comfortably over 4096 bytes
    val rows = Seq(Seq("k", "v")) ++ (1 to 300).map(i => Seq(i.toString, s"value_$i" * 3))
    val p = d.resolve("big.xlsx")
    ExcelSource.write(p.toString, rows)
    val plain = Files.readAllBytes(p)
    assert(plain.length > 4096)
    val dec = OoxmlCrypto.decrypt(OoxmlCrypto.encrypt(plain, "pw", spinCount = 100, seed = 1L), "pw")
    assert(java.util.Arrays.equals(dec, plain))
  }

  test("wrong password fails the verifier, loudly") {
    val enc = OoxmlCrypto.encrypt(Files.readAllBytes(writePlain(tmpDir)), "right", spinCount = 100, seed = 2L)
    val e = intercept[OoxmlCrypto.WrongPasswordException](OoxmlCrypto.decrypt(enc, "wrong"))
    assert(e.getMessage.contains("password"))
  }

  test("tampered EncryptedPackage fails the HMAC integrity check") {
    val enc = OoxmlCrypto.encrypt(Files.readAllBytes(writePlain(tmpDir)), "pw", spinCount = 100, seed = 3L)
    // flip one byte in the second half of the file (inside package sectors;
    // the container layout puts the big EncryptedPackage stream first)
    val bad = enc.clone()
    bad(520) = (bad(520) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](OoxmlCrypto.decrypt(bad, "pw"))
    assert(e.getMessage.toLowerCase.contains("hmac"))
  }

  test("legacy 'standard' encryption versions reject with a documented error") {
    val enc = OoxmlCrypto.encrypt(Files.readAllBytes(writePlain(tmpDir)), "pw", spinCount = 100, seed = 4L)
    // rebuild the container with a v3.2 (standard/RC4-era) EncryptionInfo header
    val legacyInfo = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(3.toShort).putShort(2.toShort).putInt(0x24).array()
    val cfb = OoxmlCrypto.writeCfb(Seq(
      "EncryptedPackage" -> new Array[Byte](4104),
      "EncryptionInfo" -> legacyInfo))
    val e = intercept[UnsupportedOperationException](OoxmlCrypto.decrypt(cfb, "pw"))
    assert(e.getMessage.contains("legacy"))
    assert(enc.nonEmpty)
  }

  test("ExcelSource.read decrypts with password; missing password is a loud error") {
    val d = tmpDir
    val plain = writePlain(d)
    val encPath = d.resolve("enc.xlsx")
    Files.write(encPath, OoxmlCrypto.encrypt(Files.readAllBytes(plain), "s3cret", spinCount = 500, seed = 5L))
    val got = ExcelSource.read(spark, encPath.toString, password = Some("s3cret"))
      .orderBy("id").as[(String, String)].collect().toSeq
    assert(got == Seq(("1", "alpha"), ("2", "beta"), ("3", "gamma, delta")))
    val e = intercept[IllegalArgumentException](ExcelSource.read(spark, encPath.toString))
    assert(e.getMessage.contains("encrypted"))
  }

  test("Sources dispatcher honors the excel.password spec field") {
    val d = tmpDir
    val plain = writePlain(d)
    val encPath = d.resolve("spec_enc.xlsx")
    Files.write(encPath, OoxmlCrypto.encrypt(Files.readAllBytes(plain), "pw!", spinCount = 500, seed = 6L))
    val got = Sources.read(spark, encPath.toString,
        Some(Specs.parseJson("""{"excel": {"password": "pw!"}}""")))
      .orderBy("id").as[(String, String)].collect().toSeq
    assert(got.map(_._1) == Seq("1", "2", "3"))
  }
}
