package graft.codec

import org.scalacheck.{Gen, Properties, Prop}
import org.scalacheck.Prop.forAll
import Lorawan._

/** Property tests mirroring the reference's C1↔C10 inverse pair
  * (SURVEY §5.2 item 2): parse(encode(x)) == x over generated PHY trees,
  * and b64pad totality. */
object LorawanPropSpec extends Properties("Lorawan") {

  private val genDevAddr: Gen[String] =
    Gen.listOfN(8, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)

  private val genFrm: Gen[Option[Array[Byte]]] =
    Gen.option(Gen.choose(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)).map(_.toArray)))

  private val genDataPhy: Gen[Phy] = for {
    mType <- Gen.oneOf("UnconfirmedDataUp", "UnconfirmedDataDown",
      "ConfirmedDataUp", "ConfirmedDataDown")
    devAddr <- genDevAddr
    adr <- Gen.oneOf(true, false)
    adrAckReq <- Gen.oneOf(true, false)
    ack <- Gen.oneOf(true, false)
    bit4 <- Gen.oneOf(true, false)
    fCnt <- Gen.choose(0, 65535)
    pf <- Gen.oneOf(
      Gen.const((None: Option[Int], None: Option[Array[Byte]])),
      for { p <- Gen.choose(0, 255); f <- genFrm }
        yield (Some(p): Option[Int], f.orElse(Some(Array.emptyByteArray))))
  } yield Phy(mType, "LoRaWANR1", "00000000", None, None,
    Some(MacPayload(
      Fhdr(devAddr, FCtrl(adr, adrAckReq, ack, bit4, bit4, 0), fCnt, Nil),
      pf._1, pf._2)), None)

  property("data-frame round trip parse∘encode = id") = forAll(genDataPhy) { phy =>
    val bytes = encode(phy)
    val back = parse(bytes)
    back.error.isEmpty &&
      back.mType == phy.mType &&
      back.mac.get.fhdr.devAddr == phy.mac.get.fhdr.devAddr &&
      back.mac.get.fhdr.fCnt == phy.mac.get.fhdr.fCnt &&
      back.mac.get.fhdr.fCtrl == phy.mac.get.fhdr.fCtrl.copy(
        fOptsLen = back.mac.get.fhdr.fCtrl.fOptsLen) &&
      back.mac.get.fPort == phy.mac.get.fPort &&
      back.mac.get.frmPayload.map(_.toSeq) == phy.mac.get.frmPayload.map(_.toSeq)
  }

  property("JoinRequest round trip") = forAll(
    for {
      je <- Gen.listOfN(16, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
      de <- Gen.listOfN(16, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
      dn <- Gen.choose(0, 65535)
    } yield (je, de, dn)) { case (je, de, dn) =>
    val phy = Phy("JoinRequest", "LoRaWANR1", "aabbccdd",
      Some(JoinRequest(je, de, dn)), None, None, None)
    val back = parse(encode(phy))
    back.joinRequest.contains(JoinRequest(je, de, dn)) && back.mic == "aabbccdd"
  }

  property("b64pad total and length % 4 == 0") = forAll { (s: String) =>
    val padded = b64pad(s)
    padded.length % 4 == 0 && padded.startsWith(s)
  }

  property("signPacket never corrupts the body") = forAll(genDataPhy) { phy =>
    val bytes = encode(phy)
    val key = Array.tabulate[Byte](16)(_.toByte)
    val signed = LorawanCrypto.signPacket(bytes, key)
    signed.length == bytes.length &&
      signed.dropRight(4).sameElements(bytes.dropRight(4))
  }
}
