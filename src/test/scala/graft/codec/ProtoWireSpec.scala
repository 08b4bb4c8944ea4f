package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** Wire-format fuzz for the gw.UplinkFrame reader: randomized field
  * subsets, negative varints, unknown fields of every wire type, and
  * garbage — decode must be total (null, never throw) and render
  * exactly the MessageToJson subset for well-formed frames. */
class ProtoWireSpec extends AnyFunSuite {

  // independent little wire writer (mirrors proto3, not ProtoWire's code)
  private def vint(v: Long): Array[Byte] = {
    val b = scala.collection.mutable.ArrayBuffer[Byte]()
    var x = v; var more = true
    while (more) {
      val lo = (x & 0x7f).toInt; x = x >>> 7; more = x != 0
      b += (if (more) lo | 0x80 else lo).toByte
    }
    b.toArray
  }
  private def tag(f: Int, w: Int) = vint((f << 3) | w)
  private def ld(f: Int, c: Array[Byte]) = tag(f, 2) ++ vint(c.length) ++ c
  private def vf(f: Int, v: Long) = tag(f, 0) ++ vint(v)
  private def df(f: Int, v: Double) = {
    val bits = java.lang.Double.doubleToLongBits(v)
    tag(f, 1) ++ (0 to 7).map(i => ((bits >>> (8 * i)) & 0xff).toByte)
  }

  private case class Fx(phy: Option[Array[Byte]], freq: Option[Long],
                        bw: Option[Long], sf: Option[Long], cr: Option[String],
                        gwId: Option[Array[Byte]], rssi: Option[Int],
                        snr: Option[Double], chan: Option[Long],
                        rfch: Option[Long], crc: Option[Int])

  private def b64(a: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(a)

  private def expectedJson(fx: Fx): String = {
    def obj(fields: Seq[Option[String]]): Option[String] = {
      val fs = fields.flatten
      if (fs.isEmpty) None else Some(fs.mkString("{", ",", "}"))
    }
    val lmi = obj(Seq(
      fx.bw.map(v => s""""bandwidth":$v"""),
      fx.sf.map(v => s""""spreadingFactor":$v"""),
      fx.cr.map(v => s""""codeRate":"$v"""")))
    val tx =
      if (fx.freq.isEmpty && lmi.isEmpty) None
      else obj(Seq(
        fx.freq.map(v => s""""frequency":$v"""),
        lmi.map(v => s""""loRaModulationInfo":$v""")))
    val rx =
      if (Seq(fx.gwId, fx.rssi, fx.snr, fx.chan, fx.rfch, fx.crc).forall(_.isEmpty)) None
      else obj(Seq(
        fx.gwId.map(v => s""""gatewayID":"${b64(v)}""""),
        fx.rssi.map(v => s""""rssi":$v"""),
        fx.snr.map(v => s""""loRaSNR":$v"""),
        fx.chan.map(v => s""""channel":$v"""),
        fx.rfch.map(v => s""""rfChain":$v"""),
        fx.crc.map(v => s""""crcStatus":"${Seq("NO_CRC", "BAD_CRC", "CRC_OK")(v)}"""")))
    obj(Seq(
      fx.phy.map(v => s""""phyPayload":"${b64(v)}""""),
      tx.map(v => s""""txInfo":$v"""),
      rx.map(v => s""""rxInfo":$v"""))).orNull
  }

  private def encode(fx: Fx, junk: Boolean, rnd: scala.util.Random): Array[Byte] = {
    def junkField(): Array[Byte] = rnd.nextInt(3) match {
      case 0 => vf(rnd.nextInt(10) + 20, rnd.nextLong() & Long.MaxValue)
      case 1 => ld(rnd.nextInt(10) + 20, Array.fill(rnd.nextInt(8))(rnd.nextInt().toByte))
      case _ => df(rnd.nextInt(10) + 20, rnd.nextDouble())
    }
    def maybeJunk = if (junk && rnd.nextBoolean()) junkField() else Array.empty[Byte]
    val lmi = fx.bw.map(vf(1, _)).getOrElse(Array.empty[Byte]) ++
      fx.sf.map(vf(2, _)).getOrElse(Array.empty[Byte]) ++
      fx.cr.map(c => ld(3, c.getBytes("UTF-8"))).getOrElse(Array.empty[Byte])
    // inner junk only when the submessage exists anyway — a junk-only
    // submessage is legitimately rendered "{}" (present but default),
    // which the simple expected-builder doesn't model
    val tx0 = fx.freq.map(vf(1, _)).getOrElse(Array.empty[Byte]) ++
      (if (lmi.nonEmpty) ld(3, lmi) else Array.empty[Byte])
    val tx = if (tx0.nonEmpty) fx.freq.map(vf(1, _)).getOrElse(Array.empty[Byte]) ++
      maybeJunk ++ (if (lmi.nonEmpty) ld(3, lmi) else Array.empty[Byte])
    else Array.empty[Byte]
    val rx0 = Seq(fx.gwId, fx.rssi, fx.snr, fx.chan, fx.rfch, fx.crc).exists(_.nonEmpty)
    val rx = if (!rx0) Array.empty[Byte] else
      fx.gwId.map(ld(1, _)).getOrElse(Array.empty[Byte]) ++ maybeJunk ++
        fx.rssi.map(v => vf(5, v.toLong)).getOrElse(Array.empty[Byte]) ++
        fx.snr.map(df(6, _)).getOrElse(Array.empty[Byte]) ++
        fx.chan.map(vf(7, _)).getOrElse(Array.empty[Byte]) ++
        fx.rfch.map(vf(8, _)).getOrElse(Array.empty[Byte]) ++
        fx.crc.map(v => vf(17, v.toLong)).getOrElse(Array.empty[Byte]) ++ maybeJunk
    maybeJunk ++
      fx.phy.map(ld(1, _)).getOrElse(Array.empty[Byte]) ++ maybeJunk ++
      (if (tx.nonEmpty) ld(2, tx) else Array.empty[Byte]) ++
      (if (rx.nonEmpty) ld(3, rx) else Array.empty[Byte]) ++ maybeJunk
  }

  test("randomized frames round-trip to the MessageToJson subset; junk fields skipped") {
    val rnd = new scala.util.Random(4242)
    (1 to 300).foreach { i =>
      def opt[A](v: => A): Option[A] = if (rnd.nextBoolean()) Some(v) else None
      val fx = Fx(
        phy = opt(Array.fill(rnd.nextInt(24) + 1)(rnd.nextInt().toByte)),
        freq = opt(rnd.nextInt(1000000000).toLong + 1),
        bw = opt(rnd.nextInt(500).toLong + 1),
        sf = opt(rnd.nextInt(12).toLong + 1),
        cr = opt("4/" + (rnd.nextInt(4) + 5)),
        gwId = opt(Array.fill(8)(rnd.nextInt().toByte)),
        rssi = opt(-(rnd.nextInt(120) + 1)),
        snr = opt((rnd.nextInt(400) - 200) / 10.0).filter(_ != 0.0),
        chan = opt(rnd.nextInt(8).toLong + 1),
        rfch = opt(rnd.nextInt(2).toLong + 1),
        crc = opt(rnd.nextInt(2) + 1))
      val bytes = encode(fx, junk = i % 2 == 0, rnd)
      val got = ProtoWire.uplinkFrameToJson(bytes)
      assert(got == expectedJson(fx), s"case $i fx=$fx")
    }
  }

  test("garbage is null, never an exception") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val garbage = Array.fill(rnd.nextInt(40))(rnd.nextInt().toByte)
      ProtoWire.uplinkFrameToJson(garbage) // must not throw
    }
    assert(ProtoWire.uplinkFrameToJson(null) == null)
    assert(ProtoWire.uplinkFrameToJson(Array.empty[Byte]) == null)
    assert(ProtoWire.uplinkFrameB64ToJson("!!! not base64 !!!") == null)
    assert(ProtoWire.uplinkFrameB64ToJson(null) == null)
    // crafted length near Long.MaxValue: `pos + n` overflows, so the
    // bounds check must be subtraction-form or this escapes Malformed
    // as an uncaught IllegalArgumentException (review-confirmed repro)
    val overflow = Array(0x0a.toByte) ++ Array.fill(8)(0xff.toByte) :+ 0x7f.toByte
    assert(ProtoWire.uplinkFrameToJson(overflow) == null)
  }

  test("a sub-message split across repeated field occurrences is MERGED") {
    // proto spec: parsers must merge repeated embedded-message fields —
    // frequency in the first tx_info chunk, loraModulationInfo in the
    // second; a last-wins decoder drops frequency
    val lmi = vf(1, 125) ++ vf(2, 9) ++ ld(3, "4/5".getBytes("UTF-8"))
    val txA = vf(1, 867500000L)
    val txB = ld(3, lmi)
    val whole = ld(2, txA ++ txB)
    val split = ld(2, txA) ++ ld(2, txB)
    val a = ProtoWire.uplinkFrameToJson(whole)
    val b = ProtoWire.uplinkFrameToJson(split)
    assert(a != null && a == b, s"$a vs $b")
    assert(a.contains("\"frequency\":867500000") && a.contains("spreadingFactor"))
  }
}
