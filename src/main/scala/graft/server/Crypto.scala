package graft.server

/** String encryption for `ENC:`-prefixed `/db/query` SQL and the server
  * cypher config (reference: mods/util/crypto.go). AES or 3DES in CBC
  * mode with an all-zero IV, PKCS#7 (or PKCS#5) padding, base64-armored.
  * Error strings mirror the reference exactly — the query door surfaces
  * them as "decrypt sql fail, <msg>" with a 400 status
  * (mods/server/http_query.go:65-74, http_query_test.go
  * TestHttpQueryEncrypted).
  *
  * The cipher work itself rides JCE (`AES/CBC/NoPadding`,
  * `DESede/CBC/NoPadding`); padding is applied/stripped manually so the
  * failure messages ("invalid padding", "invalid padding size") match the
  * reference byte for byte.
  */
object Crypto {
  import javax.crypto.Cipher
  import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

  /** mods/util/crypto.go ValidateCypherKey. */
  def validateKey(alg: String, key: String): Unit = alg.toUpperCase match {
    case "3-DES" | "3DES" | "DES3" =>
      if (key.getBytes("UTF-8").length != 24)
        throw new IllegalArgumentException("3DES key must be 24 bytes")
    case "AES" =>
      val n = key.getBytes("UTF-8").length
      if (n != 16 && n != 24 && n != 32)
        throw new IllegalArgumentException("AES key must be 16, 24, or 32 bytes")
    case other =>
      throw new IllegalArgumentException(s"unsupported algorithm: $other")
  }

  private def cipherFor(alg: String, key: String, mode: Int): Cipher = {
    validateKey(alg, key)
    val (jceAlg, jceName) = alg.toUpperCase match {
      case "AES" => ("AES", "AES/CBC/NoPadding")
      case _ => ("DESede", "DESede/CBC/NoPadding")
    }
    val c = Cipher.getInstance(jceName)
    c.init(mode, new SecretKeySpec(key.getBytes("UTF-8"), jceAlg),
      new IvParameterSpec(new Array[Byte](c.getBlockSize)))
    c
  }

  /** mods/util/crypto.go EncryptString: PKCS7-pad, CBC-encrypt with a
    * zero IV, base64. Golden: crypto_test.go:146 pins
    * EncryptString("SELECT * FROM TAG LIMIT 3", "AES", "1234567890abcdef")
    * == "SkEWZMD0vnvoKYZWDtFo2alFuMVjkvdEug7JQexO5C8=". */
  def encrypt(plain: String, alg: String, key: String): String = {
    val c = cipherFor(alg, key, Cipher.ENCRYPT_MODE)
    val padded = pkcs7Pad(plain.getBytes("UTF-8"), c.getBlockSize)
    java.util.Base64.getEncoder.encodeToString(c.doFinal(padded))
  }

  /** mods/util/crypto.go DecryptString: base64 → CBC-decrypt → unpad
    * (PKCS5 when `pad` says so, PKCS7 otherwise — they are byte-identical
    * here, both kept for the config surface). Throws
    * IllegalArgumentException with the reference's message on bad input. */
  def decrypt(b64: String, alg: String, key: String, pad: String = ""): String = {
    val data =
      try java.util.Base64.getDecoder.decode(b64)
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(s"illegal base64 data: ${e.getMessage}") }
    val c = cipherFor(alg, key, Cipher.DECRYPT_MODE)
    if (data.isEmpty || data.length % c.getBlockSize != 0)
      throw new IllegalArgumentException(
        if (alg.toUpperCase == "AES") "AES: input not full blocks"
        else "3DES: input not full blocks")
    new String(pkcs7Unpad(c.doFinal(data), c.getBlockSize), "UTF-8")
  }

  /** PKCS#7 padding (crypto.go:163-167). */
  def pkcs7Pad(data: Array[Byte], blockSize: Int): Array[Byte] = {
    val padding = blockSize - data.length % blockSize
    data ++ Array.fill(padding)(padding.toByte)
  }

  /** PKCS#7 unpadding with the reference's exact failure strings
    * (crypto.go:146-160). */
  def pkcs7Unpad(data: Array[Byte], blockSize: Int): Array[Byte] = {
    if (data.isEmpty || data.length % blockSize != 0)
      throw new IllegalArgumentException("invalid padding size")
    val padLen = data(data.length - 1) & 0xFF
    if (padLen == 0 || padLen > blockSize)
      throw new IllegalArgumentException("invalid padding")
    var i = 0
    while (i < padLen) {
      if (data(data.length - 1 - i) != padLen.toByte)
        throw new IllegalArgumentException("invalid padding")
      i += 1
    }
    data.take(data.length - padLen)
  }
}
