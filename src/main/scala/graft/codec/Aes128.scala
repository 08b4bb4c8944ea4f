package graft.codec

/** Pure-JVM AES-128 block cipher (FIPS-197), encrypt + decrypt, no JCE.
  *
  * Why not `javax.crypto`: the key-search kernels (q28/q48) run one CMAC
  * session per CANDIDATE key — ~200k sessions per query. Per-session JCE
  * cost (`Cipher.getInstance` provider lookup + `init` SecretKeySpec
  * churn + per-`doFinal` buffer allocation and state checks) dominates
  * the actual AES arithmetic on 16-byte blocks by an order of magnitude.
  * This implementation does the key schedule as 44 ints and each block
  * as 16 table lookups + XORs per round into a caller-provided buffer —
  * zero allocation on the hot path, fully JIT-friendly.
  *
  * Encryption uses the standard T-table formulation (each table fuses
  * SubBytes + ShiftRows + MixColumns for one byte lane). Decryption —
  * used only in the JoinAccept "encrypt = AES-decrypt" spec quirk
  * (LoRaWAN 1.0.x §6.2.5), never in a search loop — uses the plain
  * inverse cipher, no tables.
  *
  * Verified against `javax.crypto` AES/ECB on random keys/blocks and
  * against the FIPS-197 appendix vectors in Aes128Spec; the CMAC built
  * on top re-passes the RFC 4493 vectors in LorawanCryptoSpec.
  */
object Aes128 {

  private val Sbox: Array[Int] = {
    // generate the S-box: multiplicative inverse in GF(2^8) + affine map
    val inv = new Array[Int](256)
    // discrete log tables over generator 3
    val log = new Array[Int](256)
    val alog = new Array[Int](256)
    var x = 1
    var i = 0
    while (i < 255) {
      alog(i) = x
      log(x) = i
      // multiply by generator 0x03 = x * 2 ^ x
      x = x ^ (if ((x & 0x80) != 0) (x << 1) ^ 0x11b else x << 1)
      i += 1
    }
    var j = 1
    while (j < 256) { inv(j) = alog((255 - log(j)) % 255); j += 1 }
    inv(0) = 0
    val s = new Array[Int](256)
    var k = 0
    while (k < 256) {
      val v = inv(k)
      var r = v
      var rot = v
      var n = 0
      while (n < 4) { rot = ((rot << 1) | (rot >>> 7)) & 0xff; r ^= rot; n += 1 }
      s(k) = (r ^ 0x63) & 0xff
      k += 1
    }
    s
  }

  private val InvSbox: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) { t(Sbox(i)) = i; i += 1 }
    t
  }

  @inline private def xtime(a: Int): Int =
    ((a << 1) ^ (if ((a & 0x80) != 0) 0x11b else 0)) & 0xff

  @inline private def mul(a: Int, b: Int): Int = {
    var r = 0
    var aa = a
    var bb = b
    while (bb != 0) {
      if ((bb & 1) != 0) r ^= aa
      aa = xtime(aa)
      bb >>>= 1
    }
    r
  }

  // T-tables: Te0(x) = [2·S(x), S(x), S(x), 3·S(x)] packed big-endian;
  // Te1..Te3 are byte rotations of Te0.
  private val Te0, Te1, Te2, Te3 = new Array[Int](256)
  locally {
    var i = 0
    while (i < 256) {
      val s = Sbox(i)
      val t = (mul(2, s) << 24) | (s << 16) | (s << 8) | mul(3, s)
      Te0(i) = t
      Te1(i) = (t >>> 8) | (t << 24)
      Te2(i) = (t >>> 16) | (t << 16)
      Te3(i) = (t >>> 24) | (t << 8)
      i += 1
    }
  }

  private val Rcon = Array(0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80,
    0x1b, 0x36)

  /** Expand a 16-byte key into 44 round-key words (big-endian packing). */
  def expandKey(key: Array[Byte]): Array[Int] = {
    require(key.length == 16, "AES-128 key must be 16 bytes")
    val w = new Array[Int](44)
    var i = 0
    while (i < 4) {
      w(i) = ((key(4 * i) & 0xff) << 24) | ((key(4 * i + 1) & 0xff) << 16) |
        ((key(4 * i + 2) & 0xff) << 8) | (key(4 * i + 3) & 0xff)
      i += 1
    }
    i = 4
    while (i < 44) {
      var t = w(i - 1)
      if (i % 4 == 0) {
        // RotWord + SubWord + Rcon
        t = ((t << 8) | (t >>> 24))
        t = (Sbox((t >>> 24) & 0xff) << 24) | (Sbox((t >>> 16) & 0xff) << 16) |
          (Sbox((t >>> 8) & 0xff) << 8) | Sbox(t & 0xff)
        t ^= Rcon(i / 4 - 1) << 24
      }
      w(i) = w(i - 4) ^ t
      i += 1
    }
    w
  }

  /** Encrypt one 16-byte block `in(inOff..)` into `out(outOff..)` under
    * the expanded key. `in` and `out` may alias. Zero allocation. */
  def encryptBlock(w: Array[Int], in: Array[Byte], inOff: Int,
                   out: Array[Byte], outOff: Int): Unit = {
    var s0 = (((in(inOff) & 0xff) << 24) | ((in(inOff + 1) & 0xff) << 16) |
      ((in(inOff + 2) & 0xff) << 8) | (in(inOff + 3) & 0xff)) ^ w(0)
    var s1 = (((in(inOff + 4) & 0xff) << 24) | ((in(inOff + 5) & 0xff) << 16) |
      ((in(inOff + 6) & 0xff) << 8) | (in(inOff + 7) & 0xff)) ^ w(1)
    var s2 = (((in(inOff + 8) & 0xff) << 24) | ((in(inOff + 9) & 0xff) << 16) |
      ((in(inOff + 10) & 0xff) << 8) | (in(inOff + 11) & 0xff)) ^ w(2)
    var s3 = (((in(inOff + 12) & 0xff) << 24) | ((in(inOff + 13) & 0xff) << 16) |
      ((in(inOff + 14) & 0xff) << 8) | (in(inOff + 15) & 0xff)) ^ w(3)
    var r = 1
    while (r < 10) {
      val t0 = Te0((s0 >>> 24) & 0xff) ^ Te1((s1 >>> 16) & 0xff) ^
        Te2((s2 >>> 8) & 0xff) ^ Te3(s3 & 0xff) ^ w(4 * r)
      val t1 = Te0((s1 >>> 24) & 0xff) ^ Te1((s2 >>> 16) & 0xff) ^
        Te2((s3 >>> 8) & 0xff) ^ Te3(s0 & 0xff) ^ w(4 * r + 1)
      val t2 = Te0((s2 >>> 24) & 0xff) ^ Te1((s3 >>> 16) & 0xff) ^
        Te2((s0 >>> 8) & 0xff) ^ Te3(s1 & 0xff) ^ w(4 * r + 2)
      val t3 = Te0((s3 >>> 24) & 0xff) ^ Te1((s0 >>> 16) & 0xff) ^
        Te2((s1 >>> 8) & 0xff) ^ Te3(s2 & 0xff) ^ w(4 * r + 3)
      s0 = t0; s1 = t1; s2 = t2; s3 = t3
      r += 1
    }
    // final round: SubBytes + ShiftRows + AddRoundKey, no MixColumns
    val o0 = ((Sbox((s0 >>> 24) & 0xff) << 24) | (Sbox((s1 >>> 16) & 0xff) << 16) |
      (Sbox((s2 >>> 8) & 0xff) << 8) | Sbox(s3 & 0xff)) ^ w(40)
    val o1 = ((Sbox((s1 >>> 24) & 0xff) << 24) | (Sbox((s2 >>> 16) & 0xff) << 16) |
      (Sbox((s3 >>> 8) & 0xff) << 8) | Sbox(s0 & 0xff)) ^ w(41)
    val o2 = ((Sbox((s2 >>> 24) & 0xff) << 24) | (Sbox((s3 >>> 16) & 0xff) << 16) |
      (Sbox((s0 >>> 8) & 0xff) << 8) | Sbox(s1 & 0xff)) ^ w(42)
    val o3 = ((Sbox((s3 >>> 24) & 0xff) << 24) | (Sbox((s0 >>> 16) & 0xff) << 16) |
      (Sbox((s1 >>> 8) & 0xff) << 8) | Sbox(s2 & 0xff)) ^ w(43)
    out(outOff) = (o0 >>> 24).toByte; out(outOff + 1) = (o0 >>> 16).toByte
    out(outOff + 2) = (o0 >>> 8).toByte; out(outOff + 3) = o0.toByte
    out(outOff + 4) = (o1 >>> 24).toByte; out(outOff + 5) = (o1 >>> 16).toByte
    out(outOff + 6) = (o1 >>> 8).toByte; out(outOff + 7) = o1.toByte
    out(outOff + 8) = (o2 >>> 24).toByte; out(outOff + 9) = (o2 >>> 16).toByte
    out(outOff + 10) = (o2 >>> 8).toByte; out(outOff + 11) = o2.toByte
    out(outOff + 12) = (o3 >>> 24).toByte; out(outOff + 13) = (o3 >>> 16).toByte
    out(outOff + 14) = (o3 >>> 8).toByte; out(outOff + 15) = o3.toByte
  }

  /** Convenience: encrypt one block, allocating the output. */
  def encrypt(key: Array[Byte], block: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16)
    encryptBlock(expandKey(key), block, 0, out, 0)
    out
  }

  /** Decrypt one 16-byte block — plain inverse cipher (state as a 16-byte
    * column-major array, per-step InvShiftRows/InvSubBytes/InvMixColumns).
    * Only the JoinAccept path uses this; clarity over speed. */
  def decrypt(key: Array[Byte], block: Array[Byte]): Array[Byte] = {
    require(block.length == 16, "AES block must be 16 bytes")
    val w = expandKey(key)
    val st = new Array[Int](16)
    var i = 0
    while (i < 16) { st(i) = block(i) & 0xff; i += 1 }
    addRoundKey(st, w, 10)
    var r = 9
    while (r >= 1) {
      invShiftRows(st)
      invSubBytes(st)
      addRoundKey(st, w, r)
      invMixColumns(st)
      r -= 1
    }
    invShiftRows(st)
    invSubBytes(st)
    addRoundKey(st, w, 0)
    val out = new Array[Byte](16)
    i = 0
    while (i < 16) { out(i) = st(i).toByte; i += 1 }
    out
  }

  @inline private def addRoundKey(st: Array[Int], w: Array[Int], round: Int): Unit = {
    var c = 0
    while (c < 4) {
      val k = w(4 * round + c)
      st(4 * c) ^= (k >>> 24) & 0xff
      st(4 * c + 1) ^= (k >>> 16) & 0xff
      st(4 * c + 2) ^= (k >>> 8) & 0xff
      st(4 * c + 3) ^= k & 0xff
      c += 1
    }
  }

  @inline private def invSubBytes(st: Array[Int]): Unit = {
    var i = 0
    while (i < 16) { st(i) = InvSbox(st(i)); i += 1 }
  }

  // state layout: st(4c + r) = byte at row r, column c
  private def invShiftRows(st: Array[Int]): Unit = {
    var r = 1
    while (r < 4) {
      val t = new Array[Int](4)
      var c = 0
      while (c < 4) { t((c + r) % 4) = st(4 * c + r); c += 1 }
      c = 0
      while (c < 4) { st(4 * c + r) = t(c); c += 1 }
      r += 1
    }
  }

  private def invMixColumns(st: Array[Int]): Unit = {
    var c = 0
    while (c < 4) {
      val a0 = st(4 * c); val a1 = st(4 * c + 1)
      val a2 = st(4 * c + 2); val a3 = st(4 * c + 3)
      st(4 * c) = mul(14, a0) ^ mul(11, a1) ^ mul(13, a2) ^ mul(9, a3)
      st(4 * c + 1) = mul(9, a0) ^ mul(14, a1) ^ mul(11, a2) ^ mul(13, a3)
      st(4 * c + 2) = mul(13, a0) ^ mul(9, a1) ^ mul(14, a2) ^ mul(11, a3)
      st(4 * c + 3) = mul(11, a0) ^ mul(13, a1) ^ mul(9, a2) ^ mul(14, a3)
      c += 1
    }
  }
}
