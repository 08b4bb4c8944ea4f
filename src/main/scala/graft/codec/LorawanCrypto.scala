package graft.codec

/** LoRaWAN 1.0.x crypto, pure JVM ([[Aes128]] T-table AES + hand-rolled
  * AES-CMAC per RFC 4493 — the JDK ships no CMAC).
  *
  * Re-implements, from the public spec, the reference's Go surface:
  * MIC compute/validate (`lorawanwrapper/utils/micGenerator.go:9-67`),
  * JoinAccept payload crypt (`lorawanWrapper.go:134,197,510`),
  * session-key derivation (`sessionKeysGenerator.go:45-113`), and FRMPayload
  * crypt (`lorawanWrapper.go:548`). All key/EUI hex strings use the
  * big-endian display convention of [[Lorawan]].
  */
object LorawanCrypto {

  // ------------------------------------------------------------- AES core

  // [[Aes128]] replaces javax.crypto here: JCE's per-call cost
  // (getInstance provider lookup + SecretKeySpec init + doFinal buffer
  // churn) dominated 16-byte block work in the hot paths (CMAC = 3+
  // block ops per MIC, key search = one session per candidate key).
  // Aes128Spec pins bit-equality with javax.crypto on random inputs.
  private def aesEncryptBlock(key: Array[Byte], block: Array[Byte]): Array[Byte] =
    Aes128.encrypt(key, block)

  private def aesDecryptBlock(key: Array[Byte], block: Array[Byte]): Array[Byte] =
    Aes128.decrypt(key, block)

  // ------------------------------------------------------------- AES-CMAC

  private val Rb: Byte = 0x87.toByte

  private def leftShiftOne(in: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](in.length)
    var overflow = 0
    var i = in.length - 1
    while (i >= 0) {
      val v = in(i) & 0xff
      out(i) = (((v << 1) & 0xff) | overflow).toByte
      overflow = (v >> 7) & 1
      i -= 1
    }
    out
  }

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) { out(i) = (a(i) ^ b(i)).toByte; i += 1 }
    out
  }

  /** Reusable AES-CMAC context for one key: the key schedule and the
    * RFC 4493 subkeys K1/K2 are derived ONCE and amortized over many
    * messages. This is the kernel the key-search queries (q28/q48) run
    * candidate-major: one session per candidate key, then every signed
    * packet is checked against it — versus a per-(key, packet) session,
    * that is 8-200× fewer key schedules, which dominate small-message
    * CMAC cost. Pure [[Aes128]]: a session is just 44 expanded-key ints
    * plus the two subkey blocks — no JCE objects at all. */
  final class CmacSession(key: Array[Byte]) {
    private val ks = Aes128.expandKey(key)
    private def e(block: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](16)
      Aes128.encryptBlock(ks, block, 0, out, 0)
      out
    }
    private val k1 = {
      val l = e(new Array[Byte](16))
      val s = leftShiftOne(l)
      if ((l(0) & 0x80) != 0) { s(15) = (s(15) ^ Rb).toByte }; s
    }
    private val k2 = {
      val s = leftShiftOne(k1)
      if ((k1(0) & 0x80) != 0) { s(15) = (s(15) ^ Rb).toByte }; s
    }

    /** AES-CMAC of msg under this session's key (RFC 4493). */
    def cmac(msg: Array[Byte]): Array[Byte] = {
      val n = if (msg.length == 0) 1 else (msg.length + 15) / 16
      val lastComplete = msg.length > 0 && msg.length % 16 == 0
      var x = new Array[Byte](16)
      var i = 0
      while (i < n - 1) {
        x = e(xor(x, java.util.Arrays.copyOfRange(msg, i * 16, i * 16 + 16)))
        i += 1
      }
      val lastBlock =
        if (lastComplete)
          xor(java.util.Arrays.copyOfRange(msg, (n - 1) * 16, n * 16), k1)
        else {
          val padded = new Array[Byte](16)
          val rem = msg.length - (n - 1) * 16
          System.arraycopy(msg, (n - 1) * 16, padded, 0, rem)
          padded(rem) = 0x80.toByte
          xor(padded, k2)
        }
      e(xor(x, lastBlock))
    }

    /** JoinRequest MIC check under this session's key (spec §6.2.4). */
    def joinRequestMicValid(phyBytes: Array[Byte]): Boolean = {
      if (phyBytes == null || phyBytes.length < 5) return false
      val mic = cmac(java.util.Arrays.copyOfRange(phyBytes, 0, phyBytes.length - 4))
      var i = 0
      var ok = true
      while (i < 4) {
        ok &= mic(i) == phyBytes(phyBytes.length - 4 + i); i += 1
      }
      ok
    }

    /** JoinAccept validation under this session's key (reference C9's
      * other half, lorawanWrapper.go:508-531 testAppKeyWithJoinAccept):
      * decrypt the payload+MIC (ECB AES-ENCRYPT blocks — the spec's
      * network-decrypts-on-encrypt quirk), then check the LoRaWAN 1.0
      * downlink-join MIC = CMAC(MHDR | decrypted payload). One session
      * per candidate key amortizes the key schedule over every packet
      * AND over both the decrypt and the CMAC. */
    def joinAcceptMicValid(phyBytes: Array[Byte]): Boolean = {
      if (phyBytes == null ||
        (phyBytes.length != 17 && phyBytes.length != 33)) return false
      val n = phyBytes.length - 1 // payload + MIC
      val dec = new Array[Byte](n)
      var off = 0
      while (off < n) { Aes128.encryptBlock(ks, phyBytes, 1 + off, dec, off); off += 16 }
      val msg = new Array[Byte](1 + n - 4) // MHDR | decrypted payload
      msg(0) = phyBytes(0)
      System.arraycopy(dec, 0, msg, 1, n - 4)
      val mic = cmac(msg)
      var i = 0
      var ok = true
      while (i < 4) { ok &= mic(i) == dec(n - 4 + i); i += 1 }
      ok
    }
  }

  /** AES-CMAC (RFC 4493). Verified against the RFC's test vectors in
    * LorawanCryptoSpec. One-shot convenience over [[CmacSession]] —
    * the session IS the implementation (subkeys + block loop live
    * there once; a second copy here had already started to drift in
    * shape before it was folded away). */
  def aesCmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] =
    new CmacSession(key).cmac(msg)

  // ------------------------------------------------------------------ MIC

  /** JoinRequest MIC (spec §6.2.4): first 4 of CMAC(key, MHDR|JoinEUI|DevEUI|DevNonce). */
  def joinRequestMic(appKey: Array[Byte], phyBytes: Array[Byte]): Array[Byte] =
    aesCmac(appKey, java.util.Arrays.copyOfRange(phyBytes, 0, phyBytes.length - 4)).take(4)

  /** Data MIC, LoRaWAN 1.0 (spec §4.4): first 4 of CMAC(key, B0|msg) with
    * B0 = 0x49 |0x00×4| dir | DevAddr LE | FCnt32 LE | 0x00 | len(msg).
    * Matches the reference's SetUplinkDataMIC/SetDownlinkDataMIC calls with
    * confFCnt=0 (micGenerator.go:51,55). */
  def dataMic(key: Array[Byte], phyBytes: Array[Byte], uplink: Boolean,
              fCnt32: Long): Array[Byte] = {
    val msg = java.util.Arrays.copyOfRange(phyBytes, 0, phyBytes.length - 4)
    val b0 = new Array[Byte](16)
    b0(0) = 0x49
    b0(5) = if (uplink) 0 else 1
    System.arraycopy(phyBytes, 1, b0, 6, 4) // DevAddr already LE on the wire
    b0(10) = (fCnt32 & 0xff).toByte
    b0(11) = ((fCnt32 >> 8) & 0xff).toByte
    b0(12) = ((fCnt32 >> 16) & 0xff).toByte
    b0(13) = ((fCnt32 >> 24) & 0xff).toByte
    b0(15) = msg.length.toByte
    aesCmac(key, b0 ++ msg).take(4)
  }

  /** JoinAccept MIC, LoRaWAN 1.0: first 4 of CMAC(key, MHDR|decrypted payload). */
  def joinAcceptMic(key: Array[Byte], mhdr: Byte, decryptedPayload: Array[Byte]): Array[Byte] =
    aesCmac(key, Array(mhdr) ++ decryptedPayload).take(4)

  /** Compute-and-set a valid MIC for any parsed packet (reference C8,
    * micGenerator.go signPacket). Input/output are wire bytes. For
    * JoinAccept pass `jaKey` = the key the payload is currently encrypted
    * with (the re-encrypt dance of micGenerator.go:33-49). */
  def signPacket(phyBytes: Array[Byte], key: Array[Byte],
                 jaKey: Option[Array[Byte]] = None): Array[Byte] = {
    val phy = Lorawan.parse(phyBytes)
    if (phy.error.isDefined) return phyBytes
    val out = phyBytes.clone()
    phy.mType match {
      case "JoinRequest" =>
        val mic = joinRequestMic(key, phyBytes)
        System.arraycopy(mic, 0, out, out.length - 4, 4)
        out
      case "JoinAccept" =>
        val prevKey = jaKey.getOrElse(key)
        val dec = decryptJoinAccept(prevKey, phyBytes)
        val payload = java.util.Arrays.copyOfRange(dec, 1, dec.length - 4)
        val mic = joinAcceptMic(key, dec(0), payload)
        System.arraycopy(mic, 0, dec, dec.length - 4, 4)
        encryptJoinAccept(key, dec)
      case t if Lorawan.isData(t) =>
        val fCnt = phy.mac.get.fhdr.fCnt.toLong // 16-bit window, high bits 0
        val mic = dataMic(key, phyBytes, Lorawan.isUplink(t), fCnt)
        System.arraycopy(mic, 0, out, out.length - 4, 4)
        out
      case _ => out
    }
  }

  /** Validate a JoinRequest MIC against a candidate AppKey (reference C9
    * single-key check, lorawanWrapper.go:367-385). */
  def validateJoinRequestMic(appKey: Array[Byte], phyBytes: Array[Byte]): Boolean =
    java.util.Arrays.equals(joinRequestMic(appKey, phyBytes),
      java.util.Arrays.copyOfRange(phyBytes, phyBytes.length - 4, phyBytes.length))

  // ----------------------------------------------------------- JoinAccept

  /** Decrypt a JoinAccept PHYPayload (wire → wire with plaintext payload+MIC).
    * Spec quirk: the network *aes128_decrypt*s on encrypt so devices only
    * need the encrypt primitive — so decrypting here means ENCRYPT blocks
    * (brocaar DecryptJoinAcceptPayload). */
  def decryptJoinAccept(key: Array[Byte], phyBytes: Array[Byte]): Array[Byte] = {
    val body = java.util.Arrays.copyOfRange(phyBytes, 1, phyBytes.length) // payload+MIC
    require(body.length == 16 || body.length == 32,
      s"JoinAccept payload+MIC must be 16 or 32 bytes, got ${body.length}")
    Array(phyBytes(0)) ++ ecb(body, aesEncryptBlock(key, _))
  }

  /** Encrypt a (plaintext) JoinAccept back to wire form — AES decrypt op. */
  def encryptJoinAccept(key: Array[Byte], phyBytes: Array[Byte]): Array[Byte] = {
    val body = java.util.Arrays.copyOfRange(phyBytes, 1, phyBytes.length)
    require(body.length == 16 || body.length == 32,
      s"JoinAccept payload+MIC must be 16 or 32 bytes, got ${body.length}")
    Array(phyBytes(0)) ++ ecb(body, aesDecryptBlock(key, _))
  }

  // per-16-byte-block ECB (the 32-byte case is a JoinAccept with CFList;
  // a single-block call would silently truncate it)
  private def ecb(body: Array[Byte], f: Array[Byte] => Array[Byte]): Array[Byte] =
    body.grouped(16).flatMap(b => f(b): Iterable[Byte]).toArray

  /** Fields of a decrypted JoinAccept payload (reference C6 getDevAddr). */
  final case class JoinAcceptFields(joinNonce: Int, homeNetId: String,
                                    devAddr: String, dlSettings: Int, rxDelay: Int)

  def joinAcceptFields(decrypted: Array[Byte]): JoinAcceptFields = {
    // decrypted = MHDR | JoinNonce(3 LE) | NetID(3 LE) | DevAddr(4 LE) |
    //             DLSettings | RXDelay | [CFList] | MIC
    val b = decrypted
    JoinAcceptFields(
      joinNonce = (b(1) & 0xff) | ((b(2) & 0xff) << 8) | ((b(3) & 0xff) << 16),
      homeNetId = Lorawan.leHex(b, 4, 3),
      devAddr = Lorawan.leHex(b, 7, 4),
      dlSettings = b(11) & 0xff,
      rxDelay = b(12) & 0xff)
  }

  // ----------------------------------------------------------- FRMPayload

  /** FRMPayload encryption/decryption (spec §4.3.3) — XOR with the AES-CTR
    * keystream S_i = AES(key, A_i); symmetric, so one function. */
  def cryptFrmPayload(key: Array[Byte], devAddrLe: Array[Byte], fCnt32: Long,
                      uplink: Boolean, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](payload.length)
    val nBlocks = (payload.length + 15) / 16
    var i = 0
    while (i < nBlocks) {
      val a = new Array[Byte](16)
      a(0) = 0x01
      a(5) = if (uplink) 0 else 1
      System.arraycopy(devAddrLe, 0, a, 6, 4)
      a(10) = (fCnt32 & 0xff).toByte
      a(11) = ((fCnt32 >> 8) & 0xff).toByte
      a(12) = ((fCnt32 >> 16) & 0xff).toByte
      a(13) = ((fCnt32 >> 24) & 0xff).toByte
      a(15) = (i + 1).toByte
      val s = aesEncryptBlock(key, a)
      var j = 0
      while (j < 16 && i * 16 + j < payload.length) {
        out(i * 16 + j) = (payload(i * 16 + j) ^ s(j)).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  // --------------------------------------------------- session derivation

  /** LoRaWAN 1.0 session-key derivation (reference C7,
    * sessionKeysGenerator.go:45-90, optNeg=false path):
    * key = AES(appKey, typ | JoinNonce LE | NetID LE | DevNonce LE | 0…).
    * typ: 0x01 = NwkSKey, 0x02 = AppSKey. */
  def deriveSessionKey(typ: Byte, appKey: Array[Byte], joinNonce: Int,
                       netIdLe: Array[Byte], devNonce: Int): Array[Byte] = {
    val b = new Array[Byte](16)
    b(0) = typ
    b(1) = (joinNonce & 0xff).toByte
    b(2) = ((joinNonce >> 8) & 0xff).toByte
    b(3) = ((joinNonce >> 16) & 0xff).toByte
    System.arraycopy(netIdLe, 0, b, 4, 3)
    b(7) = (devNonce & 0xff).toByte
    b(8) = ((devNonce >> 8) & 0xff).toByte
    aesEncryptBlock(appKey, b)
  }

  final case class SessionKeys(nwkSKey: String, appSKey: String)

  /** Derive NwkSKey/AppSKey from a JoinRequest/JoinAccept pair + AppKey
    * (reference generateSessionKeysFromJoins, lorawanWrapper.go:111-159). */
  def sessionKeysFromJoins(joinRequest: Array[Byte], joinAccept: Array[Byte],
                           appKeyHex: String): Option[SessionKeys] = {
    val appKey = Lorawan.hexToBytes(appKeyHex)
    val jr = Lorawan.parse(joinRequest)
    if (jr.error.isDefined || jr.joinRequest.isEmpty) return None
    val devNonce = jr.joinRequest.get.devNonce
    val dec =
      try decryptJoinAccept(appKey, joinAccept)
      catch { case _: Exception => return None }
    val ja = joinAcceptFields(dec)
    val netIdLe = Lorawan.hexToLe(ja.homeNetId)
    val nwk = deriveSessionKey(0x01, appKey, ja.joinNonce, netIdLe, devNonce)
    val app = deriveSessionKey(0x02, appKey, ja.joinNonce, netIdLe, devNonce)
    Some(SessionKeys(Lorawan.hex(nwk, 0, 16), Lorawan.hex(app, 0, 16)))
  }
}
