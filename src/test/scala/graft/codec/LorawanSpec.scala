package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import Lorawan._

/** Golden-vector tests for the PHY codec. Vectors are the reference's own
  * embedded examples (jsonUnmarshaler.go:12-19, reproduced in FIXTURES.md §1).
  * Wire bytes are derived independently from the LoRaWAN 1.0.2 spec layout;
  * parsing them must reproduce the reference's parse output exactly.
  */
class LorawanSpec extends AnyFunSuite {

  // Golden #1: JoinRequest
  // {"mhdr":{"mType":"JoinRequest","major":"LoRaWANR1"},"macPayload":
  //  {"joinEUI":"55d239ac716f234d","devEUI":"b827eb891cf50003","devNonce":51639},
  //  "mic":"7005c4a5"}
  private val jrBytes: Array[Byte] =
    Array(0x00.toByte) ++                     // MHDR: JoinRequest, major 0
      hexToLe("55d239ac716f234d") ++          // JoinEUI wire-LE
      hexToLe("b827eb891cf50003") ++          // DevEUI wire-LE
      Array(0xb7.toByte, 0xc9.toByte) ++      // DevNonce 51639 = 0xC9B7 LE
      hexToBytes("7005c4a5")

  test("golden JoinRequest parses") {
    val phy = parse(jrBytes)
    assert(phy.error.isEmpty)
    assert(phy.mType == "JoinRequest")
    assert(phy.major == "LoRaWANR1")
    assert(phy.mic == "7005c4a5")
    val jr = phy.joinRequest.get
    assert(jr.joinEui == "55d239ac716f234d")
    assert(jr.devEui == "b827eb891cf50003")
    assert(jr.devNonce == 51639)
  }

  // Golden #2: JoinAccept (encrypted payload "HWxw2bAlEDfZF8xu", mic fc1ede82)
  private val jaBytes: Array[Byte] =
    Array(0x20.toByte) ++ b64decode("HWxw2bAlEDfZF8xu") ++ hexToBytes("fc1ede82")

  test("golden JoinAccept parses") {
    val phy = parse(jaBytes)
    assert(phy.error.isEmpty)
    assert(phy.mType == "JoinAccept")
    assert(phy.mic == "fc1ede82")
    assert(b64encode(phy.joinAcceptBytes.get) == "HWxw2bAlEDfZF8xu")
  }

  // Golden #3: UnconfirmedDataUp devAddr 017fc1c4, adr, fCnt 17,
  // fOpts [LinkADRAns: channelMaskAck+powerAck], fPort 93, 26-byte FRM.
  private val frmB64 = "/2EyELe4m4F5txMSp93Gi+Od7uT0wI/xFFPlKA=="
  private val upBytes: Array[Byte] =
    Array(0x40.toByte) ++                       // MHDR: UnconfirmedDataUp
      hexToLe("017fc1c4") ++                    // DevAddr LE
      Array(0x82.toByte) ++                     // FCtrl: ADR | fOptsLen 2
      Array(17.toByte, 0.toByte) ++             // FCnt 17 LE
      Array(0x03.toByte, 0x05.toByte) ++        // LinkADRAns, mask|_|power
      Array(93.toByte) ++                       // FPort
      b64decode(frmB64) ++
      hexToBytes("7934d552")

  test("golden UnconfirmedDataUp parses") {
    val phy = parse(upBytes)
    assert(phy.error.isEmpty, phy.error)
    assert(phy.mType == "UnconfirmedDataUp")
    assert(phy.mic == "7934d552")
    val mac = phy.mac.get
    assert(mac.fhdr.devAddr == "017fc1c4")
    assert(mac.fhdr.fCtrl.adr)
    assert(!mac.fhdr.fCtrl.adrAckReq && !mac.fhdr.fCtrl.ack)
    assert(!mac.fhdr.fCtrl.fPending && !mac.fhdr.fCtrl.classB)
    assert(mac.fhdr.fCnt == 17)
    assert(mac.fPort.contains(93))
    assert(b64encode(mac.frmPayload.get) == frmB64)
    assert(mac.fhdr.fOpts.size == 1)
    val cmd = mac.fhdr.fOpts.head
    assert(cmd.cid == "LinkADRReq") // shared-CID display name (golden #3)
    assert(cmd.payload.contains(
      """{"channelMaskAck":true,"dataRateAck":false,"powerAck":true}"""))
  }

  // Golden #4: UnconfirmedDataDown devAddr 017fc1c4, adr, fCnt 55,
  // fOpts [LinkADRReq dataRate 2 txPower 4 chMask ×16 true nbRep 1],
  // no fPort / FRM.
  private val downBytes: Array[Byte] =
    Array(0x60.toByte) ++
      hexToLe("017fc1c4") ++
      Array(0x85.toByte) ++                     // FCtrl: ADR | fOptsLen 5
      Array(55.toByte, 0.toByte) ++
      Array(0x03.toByte, 0x24.toByte, 0xff.toByte, 0xff.toByte, 0x01.toByte) ++
      hexToBytes("be4d8cbf")

  test("golden UnconfirmedDataDown parses") {
    val phy = parse(downBytes)
    assert(phy.error.isEmpty, phy.error)
    assert(phy.mType == "UnconfirmedDataDown")
    assert(phy.mic == "be4d8cbf")
    val mac = phy.mac.get
    assert(mac.fhdr.fCnt == 55)
    assert(mac.fPort.isEmpty && mac.frmPayload.isEmpty)
    val cmd = mac.fhdr.fOpts.head
    assert(cmd.cid == "LinkADRReq")
    val chMask = List.fill(16)("true").mkString(",")
    assert(cmd.payload.contains(
      s"""{"dataRate":2,"txPower":4,"chMask":[$chMask],""" +
      """"redundancy":{"chMaskCntl":0,"nbRep":1}}"""))
  }

  test("golden vectors round-trip encode(parse(x)) == x") {
    for (bytes <- Seq(jrBytes, jaBytes, upBytes, downBytes)) {
      val phy = parse(bytes)
      assert(phy.error.isEmpty)
      assert(encode(phy).sameElements(bytes),
        s"round-trip failed for ${phy.mType}")
    }
  }

  test("error rows: truncated, bad major, unknown cid") {
    assert(parse(Array[Byte](1, 2, 3)).error.isDefined)
    assert(parse(Array.fill[Byte](23)(0x01)).error.exists(_.contains("major")))
    // unknown CID 0x42 inside fOpts poisons the packet (PhyParser.py:10-12)
    val badFopts = Array(0x40.toByte) ++ hexToLe("017fc1c4") ++
      Array(0x01.toByte) ++ Array(0.toByte, 0.toByte) ++
      Array(0x42.toByte) ++ hexToBytes("00000000")
    assert(parse(badFopts).error.exists(_.contains("Error decoding FOpts")))
  }

  test("b64pad pads to multiple of 4 (GenericMqttCollector.py:128)") {
    assert(b64pad("") == "")
    assert(b64pad("QQ") == "QQ==")
    assert(b64pad("QUJD") == "QUJD")
    assert(b64pad("QUJDRQ") == "QUJDRQ==")
  }

  test("hex display conventions") {
    assert(leHex(Array(0x4d, 0x23, 0x6f, 0x71, 0xac, 0x39, 0xd2, 0x55).map(_.toByte), 0, 8)
      == "55d239ac716f234d")
    assert(hex(hexToBytes("7005c4a5"), 0, 4) == "7005c4a5")
    assert(hexToLe("017fc1c4").sameElements(Array(0xc4, 0xc1, 0x7f, 0x01).map(_.toByte)))
  }

  test("hexToBytes is strict; key-hex UDFs yield NULL on malformed keys") {
    // the old lenient parse read 'abc' as [0xab, 0x0c] — a silently
    // WRONG key and a false-negative MIC check
    intercept[IllegalArgumentException](hexToBytes("abc"))
    intercept[IllegalArgumentException](hexToBytes("zz"))
    assert(!isHex(null) && !isHex("abc") && !isHex("zz") && isHex("ab0c") && isHex(""))
  }

  test("DeviceTimeAns carries full u32 seconds + fraction and round-trips") {
    // GPS epoch passed 2^24 seconds in 1980+194 days: a u24 read
    // decoded every realistic timestamp mod 2^24
    val secs = 0x50000001L
    val fopts = Array(0x0d.toByte) ++ Array(
      (secs & 0xff).toByte, ((secs >> 8) & 0xff).toByte,
      ((secs >> 16) & 0xff).toByte, ((secs >> 24) & 0xff).toByte,
      0x80.toByte) // fraction = 128/256 s
    val bytes = Array(0x60.toByte) ++ hexToLe("017fc1c4") ++
      Array(fopts.length.toByte) ++ Array(0.toByte, 0.toByte) ++ fopts ++
      hexToBytes("00000000")
    val p = parse(bytes)
    assert(p.error.isEmpty, p.error.toString)
    val payloads = p.mac.toSeq.flatMap(_.fhdr.fOpts).flatMap(_.payload)
    assert(payloads.exists(_.contains(s""""timeSinceGPSEpoch":$secs""")), payloads)
    assert(payloads.exists(_.contains(""""fractionalSecond":128""")), payloads)
    assert(encode(p).sameElements(bytes), "round-trip")
  }
}
