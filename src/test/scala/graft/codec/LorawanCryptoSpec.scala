package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import Lorawan.{hex, hexToBytes}

class LorawanCryptoSpec extends AnyFunSuite {

  // RFC 4493 §4 test vectors (public)
  private val rfcKey = hexToBytes("2b7e151628aed2a6abf7158809cf4f3c")
  private val rfcMsg = hexToBytes(
    "6bc1bee22e409f96e93d7e117393172a" +
    "ae2d8a571e03ac9c9eb76fac45af8e51" +
    "30c81c46a35ce411e5fbc1191a0a52ef" +
    "f69f2445df4f9b17ad2b417be66c3710")

  test("AES-CMAC matches RFC 4493 vectors") {
    assert(hex(LorawanCrypto.aesCmac(rfcKey, Array.emptyByteArray), 0, 16)
      == "bb1d6929e95937287fa37d129b756746")
    assert(hex(LorawanCrypto.aesCmac(rfcKey, rfcMsg.take(16)), 0, 16)
      == "070a16b46b4d4144f79bdd9dd04a287c")
    assert(hex(LorawanCrypto.aesCmac(rfcKey, rfcMsg.take(40)), 0, 16)
      == "dfa66747de9ae63030ca32611497c827")
    assert(hex(LorawanCrypto.aesCmac(rfcKey, rfcMsg), 0, 16)
      == "51f0bebf7e3b9d92fc49741779363cfe")
  }

  test("CmacSession equals aesCmac on RFC vectors and random messages") {
    val session = new LorawanCrypto.CmacSession(rfcKey)
    for (len <- Seq(0, 16, 40, 64))
      assert(session.cmac(rfcMsg.take(len))
        .sameElements(LorawanCrypto.aesCmac(rfcKey, rfcMsg.take(len))))
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val key = Array.fill[Byte](16)(rnd.nextInt().toByte)
      val msg = Array.fill[Byte](rnd.nextInt(60))(rnd.nextInt().toByte)
      val s2 = new LorawanCrypto.CmacSession(key)
      assert(s2.cmac(msg).sameElements(LorawanCrypto.aesCmac(key, msg)))
      // session is reusable: a second message under the same session
      // still matches the one-shot path
      assert(s2.cmac(msg.reverse).sameElements(LorawanCrypto.aesCmac(key, msg.reverse)))
    }
  }

  test("CmacSession.joinRequestMicValid equals validateJoinRequestMic") {
    val key = hexToBytes("000102030405060708090a0b0c0d0e0f")
    val jr = Array(0x00.toByte) ++
      Lorawan.hexToLe("55d239ac716f234d") ++ Lorawan.hexToLe("b827eb891cf50003") ++
      Array(0xb7.toByte, 0xc9.toByte) ++ hexToBytes("00000000")
    val signed = LorawanCrypto.signPacket(jr, key)
    assert(new LorawanCrypto.CmacSession(key).joinRequestMicValid(signed))
    val wrong = hexToBytes("ffffffffffffffffffffffffffffffff")
    assert(!new LorawanCrypto.CmacSession(wrong).joinRequestMicValid(signed))
    assert(!new LorawanCrypto.CmacSession(key).joinRequestMicValid(null))
    assert(!new LorawanCrypto.CmacSession(key).joinRequestMicValid(Array[Byte](1, 2)))
  }

  private val appKey = hexToBytes("000102030405060708090a0b0c0d0e0f")

  test("sign + validate JoinRequest MIC") {
    val jr = Array(0x00.toByte) ++
      Lorawan.hexToLe("55d239ac716f234d") ++ Lorawan.hexToLe("b827eb891cf50003") ++
      Array(0xb7.toByte, 0xc9.toByte) ++ hexToBytes("00000000")
    val signed = LorawanCrypto.signPacket(jr, appKey)
    assert(LorawanCrypto.validateJoinRequestMic(appKey, signed))
    assert(!LorawanCrypto.validateJoinRequestMic(
      hexToBytes("ffffffffffffffffffffffffffffffff"), signed))
    // deterministic: same input, same mic
    assert(signed.sameElements(LorawanCrypto.signPacket(jr, appKey)))
  }

  test("sign data packet: mic over B0 block is stable and direction-aware") {
    val up = Array(0x40.toByte) ++ Lorawan.hexToLe("017fc1c4") ++
      Array(0x80.toByte) ++ Array(17.toByte, 0.toByte) ++ Array(93.toByte) ++
      Array(1.toByte, 2.toByte, 3.toByte) ++ hexToBytes("00000000")
    val down = up.clone(); down(0) = 0x60.toByte
    val sUp = LorawanCrypto.signPacket(up, appKey)
    val sDown = LorawanCrypto.signPacket(down, appKey)
    val micUp = sUp.takeRight(4); val micDown = sDown.takeRight(4)
    assert(!micUp.sameElements(micDown), "uplink/downlink MICs must differ (dir byte)")
    // body unchanged, only mic rewritten
    assert(sUp.dropRight(4).sameElements(up.dropRight(4)))
  }

  test("JoinAccept encrypt/decrypt round-trip; crypt is the swapped AES op") {
    // plaintext JoinAccept: MHDR | JoinNonce | NetID | DevAddr | DL | RXD | MIC
    val plain = Array(0x20.toByte) ++
      Array(0x01, 0x02, 0x03).map(_.toByte) ++     // JoinNonce LE = 0x030201
      Array(0xaa, 0xbb, 0xcc).map(_.toByte) ++     // NetID LE
      Lorawan.hexToLe("017fc1c4") ++
      Array(0x00.toByte, 0x01.toByte) ++
      hexToBytes("deadbeef")
    val wire = LorawanCrypto.encryptJoinAccept(appKey, plain)
    assert(!wire.drop(1).sameElements(plain.drop(1)))
    val back = LorawanCrypto.decryptJoinAccept(appKey, wire)
    assert(back.sameElements(plain))
    val f = LorawanCrypto.joinAcceptFields(plain)
    assert(f.joinNonce == 0x030201)
    assert(f.homeNetId == "ccbbaa")
    assert(f.devAddr == "017fc1c4")
    assert(f.dlSettings == 0 && f.rxDelay == 1)
  }

  test("CmacSession.joinAcceptMicValid: accepts only the signing key, incl. CFList") {
    def signedJa(key: Array[Byte], cfList: Option[Array[Byte]]): Array[Byte] = {
      val plain = Array(0x20.toByte) ++
        Array(0x01, 0x02, 0x03).map(_.toByte) ++
        Array(0xaa, 0xbb, 0xcc).map(_.toByte) ++
        Lorawan.hexToLe("017fc1c4") ++
        Array(0x00.toByte, 0x01.toByte) ++
        cfList.getOrElse(Array.emptyByteArray) ++
        Array.fill[Byte](4)(0)
      val payload = java.util.Arrays.copyOfRange(plain, 1, plain.length - 4)
      val mic = LorawanCrypto.joinAcceptMic(key, plain(0), payload)
      System.arraycopy(mic, 0, plain, plain.length - 4, 4)
      LorawanCrypto.encryptJoinAccept(key, plain)
    }
    val wrongKey = hexToBytes("000102030405060708090a0b0c0d0eff")
    for (cf <- Seq(None, Some((1 to 16).map(_.toByte).toArray))) {
      val wire = signedJa(appKey, cf)
      assert(wire.length == (if (cf.isEmpty) 17 else 33))
      assert(new LorawanCrypto.CmacSession(appKey).joinAcceptMicValid(wire))
      assert(!new LorawanCrypto.CmacSession(wrongKey).joinAcceptMicValid(wire))
      // multi-block ECB round-trip stays lossless (CFList spans block 2)
      val back = LorawanCrypto.decryptJoinAccept(appKey, wire)
      assert(back.length == wire.length)
      assert(LorawanCrypto.encryptJoinAccept(appKey, back).sameElements(wire))
    }
    assert(!new LorawanCrypto.CmacSession(appKey).joinAcceptMicValid(null))
    assert(!new LorawanCrypto.CmacSession(appKey).joinAcceptMicValid(Array[Byte](0x20, 1, 2)))
  }

  test("FRMPayload crypt is symmetric and keystream-correct across blocks") {
    val devAddrLe = Lorawan.hexToLe("017fc1c4")
    val payload = (0 until 37).map(_.toByte).toArray // spans 3 AES blocks
    val enc = LorawanCrypto.cryptFrmPayload(appKey, devAddrLe, 17L, uplink = true, payload)
    assert(!enc.sameElements(payload))
    val dec = LorawanCrypto.cryptFrmPayload(appKey, devAddrLe, 17L, uplink = true, enc)
    assert(dec.sameElements(payload))
    // fCnt participates in the keystream
    val enc2 = LorawanCrypto.cryptFrmPayload(appKey, devAddrLe, 18L, uplink = true, payload)
    assert(!enc2.sameElements(enc))
  }

  test("session keys from join pair (C7): deterministic, distinct, derivable") {
    // Build a JoinRequest and a JoinAccept encrypted under appKey
    val jr = LorawanCrypto.signPacket(
      Array(0x00.toByte) ++ Lorawan.hexToLe("55d239ac716f234d") ++
        Lorawan.hexToLe("b827eb891cf50003") ++ Array(0xb7.toByte, 0xc9.toByte) ++
        hexToBytes("00000000"),
      appKey)
    val plainJa = Array(0x20.toByte) ++
      Array(0x01, 0x02, 0x03).map(_.toByte) ++
      Array(0xaa, 0xbb, 0xcc).map(_.toByte) ++
      Lorawan.hexToLe("017fc1c4") ++
      Array(0x00.toByte, 0x01.toByte) ++ hexToBytes("00000000")
    val ja = LorawanCrypto.encryptJoinAccept(appKey, plainJa)

    val keys = LorawanCrypto.sessionKeysFromJoins(jr, ja, hex(appKey, 0, 16)).get
    assert(keys.nwkSKey.length == 32 && keys.appSKey.length == 32)
    assert(keys.nwkSKey != keys.appSKey)
    // cross-check against direct derivation (sessionKeysGenerator.go:45-90)
    val direct = LorawanCrypto.deriveSessionKey(0x01, appKey, 0x030201,
      Array(0xaa, 0xbb, 0xcc).map(_.toByte), 51639)
    assert(keys.nwkSKey == hex(direct, 0, 16))
  }

  test("key brute-force shape (C9): correct key found among candidates") {
    val jr = LorawanCrypto.signPacket(
      Array(0x00.toByte) ++ Lorawan.hexToLe("55d239ac716f234d") ++
        Lorawan.hexToLe("b827eb891cf50003") ++ Array(0xb7.toByte, 0xc9.toByte) ++
        hexToBytes("00000000"),
      appKey)
    val candidates = (0 until 256).map { i =>
      val k = appKey.clone(); k(15) = i.toByte; k
    }
    val found = candidates.filter(LorawanCrypto.validateJoinRequestMic(_, jr))
    assert(found.length == 1)
    assert(found.head.sameElements(appKey))
  }
}
