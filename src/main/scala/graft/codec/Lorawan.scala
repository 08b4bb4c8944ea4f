package graft.codec

import java.util.Base64

/** Pure-Scala LoRaWAN 1.0.x PHYPayload codec.
  *
  * Re-implements, from the public LoRaWAN 1.0.2 specification, the parse /
  * encode surface the reference exposes through its Go wrapper
  * (`lorawanwrapper/utils/lorawanWrapper.go:533-567` printPHYPayload and
  * `jsonUnmarshaler.go:21-209` parseJSONtoPHY). No FFI: this is plain JVM
  * code that Spark can call per-row inside codegen'd stages.
  *
  * Wire format (spec §4):
  * {{{
  *   PHYPayload = MHDR(1) | MACPayload | MIC(4)
  *   MHDR: bits 7..5 = MType, bits 1..0 = Major
  *   JoinRequest  = JoinEUI(8 LE) | DevEUI(8 LE) | DevNonce(2 LE)
  *   JoinAccept   = encrypted( JoinNonce(3) NetID(3) DevAddr(4)
  *                             DLSettings(1) RXDelay(1) [CFList(16)] MIC(4) )
  *   Data         = FHDR | [FPort(1) | FRMPayload]
  *   FHDR         = DevAddr(4 LE) | FCtrl(1) | FCnt(2 LE) | FOpts(0..15)
  * }}}
  *
  * Display conventions follow the reference's output (EUIs/DevAddr wire
  * little-endian, rendered big-endian lowercase hex; MIC rendered in wire
  * order lowercase hex) — see the golden vectors in FIXTURES.md §1
  * (reference `jsonUnmarshaler.go:12-19`).
  *
  * Reference quirks preserved deliberately:
  *   - `fPending` and `classB` are BOTH set from FCtrl bit 4 regardless of
  *     direction (the Go library sets both fields from the same bit; the
  *     reference's PhyParser.py:33,55 then reads classB for downlink and
  *     fPending for uplink — values are identical either way).
  *   - A MAC-command decode failure poisons the whole packet (the reference
  *     greps the wrapper output for "Error": PhyParser.py:10-12).
  */
object Lorawan {

  // ---------------------------------------------------------------- model

  final case class MacCommand(cid: String, payload: Option[String]) // payload = JSON
  final case class FCtrl(adr: Boolean, adrAckReq: Boolean, ack: Boolean,
                         fPending: Boolean, classB: Boolean, fOptsLen: Int)
  final case class Fhdr(devAddr: String, fCtrl: FCtrl, fCnt: Int,
                        fOpts: Seq[MacCommand])
  final case class MacPayload(fhdr: Fhdr, fPort: Option[Int],
                              frmPayload: Option[Array[Byte]])
  final case class JoinRequest(joinEui: String, devEui: String, devNonce: Int)

  /** Parse result — a tagged union exactly one branch of which is set,
    * mirroring the reference's per-mType dict shape (PhyParser.py:21-71). */
  final case class Phy(
      mType: String,
      major: String,
      mic: String,
      joinRequest: Option[JoinRequest],
      joinAcceptBytes: Option[Array[Byte]], // encrypted payload, MIC excluded
      mac: Option[MacPayload],
      error: Option[String])

  object Phy {
    def err(msg: String): Phy = Phy(null, null, null, None, None, None, Some(msg))
  }

  val MTypes: Array[String] = Array(
    "JoinRequest", "JoinAccept", "UnconfirmedDataUp", "UnconfirmedDataDown",
    "ConfirmedDataUp", "ConfirmedDataDown", "RejoinRequest", "Proprietary")

  def isUplink(mType: String): Boolean = mType match {
    case "JoinRequest" | "UnconfirmedDataUp" | "ConfirmedDataUp" => true
    case _ => false
  }
  def isData(mType: String): Boolean = mType != null && mType.endsWith("Up") ||
    mType != null && mType.endsWith("Down")

  // --------------------------------------------------------------- helpers

  def b64decode(s: String): Array[Byte] = Base64.getDecoder.decode(s)
  def b64encode(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)

  /** Right-pad a base64 string to a multiple of 4 with '=' — reference
    * `GenericMqttCollector.py:128`. */
  def b64pad(s: String): String =
    s + ("=" * ((4 - s.length % 4) % 4))

  /** Little-endian wire bytes → big-endian lowercase hex (EUI/DevAddr
    * display convention). */
  def leHex(b: Array[Byte], from: Int, len: Int): String = {
    val sb = new StringBuilder(len * 2)
    var i = from + len - 1
    while (i >= from) { sb.append(f"${b(i) & 0xff}%02x"); i -= 1 }
    sb.toString
  }

  /** Wire-order lowercase hex (MIC display convention). */
  def hex(b: Array[Byte], from: Int, len: Int): String = {
    val sb = new StringBuilder(len * 2)
    var i = from
    while (i < from + len) { sb.append(f"${b(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }

  /** True iff `s` is non-null, even-length, all hex digits — the
    * precondition [[hexToBytes]] enforces. UDFs taking user key hex
    * check this first and return SQL NULL instead of failing a task. */
  def isHex(s: String): Boolean =
    s != null && s.length % 2 == 0 && s.forall(c => Character.digit(c, 16) >= 0)

  def hexToBytes(s: String): Array[Byte] = {
    // strict: the old grouped(2) parse silently read an odd trailing
    // digit as a lone nibble ("abc" → [0xab, 0x0c]) — for a KEY that is
    // a silently wrong key and a false-negative MIC check, worse than
    // any crash
    require(isHex(s), s"malformed hex string: '$s'")
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  }

  /** Big-endian hex string → little-endian wire bytes. */
  def hexToLe(s: String): Array[Byte] = hexToBytes(s).reverse

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u24le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  // ----------------------------------------------------------------- parse

  /** Parse a raw PHYPayload. Never throws: malformed input yields
    * `Phy.err`, matching the reference's error-row behavior
    * (PhyParser.py:10-12). */
  def parse(bytes: Array[Byte]): Phy = {
    if (bytes == null || bytes.length < 5)
      return Phy.err("Unmarshal Error: lorawan: at least 5 bytes needed")
    val mhdr = bytes(0) & 0xff
    val mTypeN = (mhdr >> 5) & 0x7
    val majorN = mhdr & 0x3
    if (majorN != 0)
      return Phy.err(s"Unmarshal Error: lorawan: unsupported major version $majorN")
    val mType = MTypes(mTypeN)
    val major = "LoRaWANR1"
    val mic = hex(bytes, bytes.length - 4, 4)

    mType match {
      case "JoinRequest" =>
        if (bytes.length != 23)
          return Phy.err("Unmarshal Error: lorawan: 18 bytes of data expected for JoinRequest")
        Phy(mType, major, mic,
          Some(JoinRequest(leHex(bytes, 1, 8), leHex(bytes, 9, 8), u16le(bytes, 17))),
          None, None, None)

      case "JoinAccept" =>
        // Encrypted at rest: keep the opaque payload (MIC excluded), like
        // the reference's {"bytes": ...} output (FIXTURES.md golden #2).
        val plLen = bytes.length - 5
        if (plLen != 12 && plLen != 28)
          return Phy.err("Unmarshal Error: lorawan: 12 or 28 bytes of data expected for JoinAccept")
        Phy(mType, major, mic, None,
          Some(java.util.Arrays.copyOfRange(bytes, 1, bytes.length - 4)), None, None)

      case "UnconfirmedDataUp" | "UnconfirmedDataDown" |
           "ConfirmedDataUp" | "ConfirmedDataDown" =>
        parseData(mType, major, mic, bytes)

      case other =>
        Phy.err(s"Unmarshal Error: lorawan: unsupported MType $other")
    }
  }

  private def parseData(mType: String, major: String, mic: String,
                        bytes: Array[Byte]): Phy = {
    // MHDR(1) + DevAddr(4) + FCtrl(1) + FCnt(2) + MIC(4) minimum
    if (bytes.length < 12)
      return Phy.err("Unmarshal Error: lorawan: at least 7 bytes expected for FHDR")
    val devAddr = leHex(bytes, 1, 4)
    val fc = bytes(5) & 0xff
    val fOptsLen = fc & 0x0f
    // bit 4 feeds BOTH fPending and classB (see object scaladoc)
    val fCtrl = FCtrl(
      adr = (fc & 0x80) != 0, adrAckReq = (fc & 0x40) != 0,
      ack = (fc & 0x20) != 0, fPending = (fc & 0x10) != 0,
      classB = (fc & 0x10) != 0, fOptsLen = fOptsLen)
    val fCnt = u16le(bytes, 6)
    val fOptsEnd = 8 + fOptsLen
    if (fOptsEnd + 4 > bytes.length)
      return Phy.err("Unmarshal Error: lorawan: not enough bytes for FOpts")
    val up = isUplink(mType)
    val fOpts =
      if (fOptsLen == 0) Nil
      else decodeMacCommands(bytes, 8, fOptsEnd, up) match {
        case Right(cmds) => cmds
        case Left(e)     => return Phy.err(s"Error decoding FOpts: $e")
      }
    val rest = bytes.length - 4 - fOptsEnd // bytes between FOpts and MIC
    val (fPort, frm) =
      if (rest <= 0) (None, None)
      else (Some(bytes(fOptsEnd) & 0xff),
        Some(java.util.Arrays.copyOfRange(bytes, fOptsEnd + 1, bytes.length - 4)))
    Phy(mType, major, mic, None, None,
      Some(MacPayload(Fhdr(devAddr, fCtrl, fCnt, fOpts), fPort, frm)), None)
  }

  // --------------------------------------------------- MAC command decode

  /** CID display names — the Go library prints the shared Req/Ind-flavored
    * name for each CID value regardless of direction (golden vector #3:
    * an uplink LinkADRAns payload is labeled cid "LinkADRReq"). */
  private val cidNames: Map[Int, String] = Map(
    0x01 -> "ResetInd", 0x02 -> "LinkCheckReq", 0x03 -> "LinkADRReq",
    0x04 -> "DutyCycleReq", 0x05 -> "RXParamSetupReq", 0x06 -> "DevStatusReq",
    0x07 -> "NewChannelReq", 0x08 -> "RXTimingSetupReq", 0x09 -> "TXParamSetupReq",
    0x0a -> "DLChannelReq", 0x0b -> "RekeyInd", 0x0c -> "ADRParamSetupReq",
    0x0d -> "DeviceTimeReq", 0x0e -> "ForceRejoinReq", 0x0f -> "RejoinParamSetupReq")

  /** Payload byte length per (cid, direction). Direction: true = uplink
    * (device→network). From LoRaWAN 1.0.2 §5 / 1.1 §5. */
  private def cmdLen(cid: Int, up: Boolean): Option[Int] = (cid, up) match {
    case (0x01, _)     => Some(1) // ResetInd / ResetConf (1.1)
    case (0x02, true)  => Some(0) // LinkCheckReq
    case (0x02, false) => Some(2) // LinkCheckAns
    case (0x03, true)  => Some(1) // LinkADRAns
    case (0x03, false) => Some(4) // LinkADRReq
    case (0x04, true)  => Some(0) // DutyCycleAns
    case (0x04, false) => Some(1) // DutyCycleReq
    case (0x05, true)  => Some(1) // RXParamSetupAns
    case (0x05, false) => Some(4) // RXParamSetupReq
    case (0x06, true)  => Some(2) // DevStatusAns
    case (0x06, false) => Some(0) // DevStatusReq
    case (0x07, true)  => Some(1) // NewChannelAns
    case (0x07, false) => Some(5) // NewChannelReq
    case (0x08, true)  => Some(0) // RXTimingSetupAns
    case (0x08, false) => Some(1) // RXTimingSetupReq
    case (0x09, true)  => Some(0) // TXParamSetupAns
    case (0x09, false) => Some(1) // TXParamSetupReq
    case (0x0a, true)  => Some(1) // DLChannelAns
    case (0x0a, false) => Some(4) // DLChannelReq
    case (0x0b, _)     => Some(1) // RekeyInd / RekeyConf (1.1)
    case (0x0c, _)     => Some(1) // ADRParamSetupReq/Ans (1.1)
    case (0x0d, true)  => Some(0) // DeviceTimeReq
    case (0x0d, false) => Some(5) // DeviceTimeAns
    case (0x0e, false) => Some(2) // ForceRejoinReq
    case (0x0f, true)  => Some(1) // RejoinParamSetupAns
    case (0x0f, false) => Some(1) // RejoinParamSetupReq
    case _             => None
  }

  private def bool(b: Boolean) = if (b) "true" else "false"

  /** Decode one MAC-command payload to the JSON the Go library's
    * MarshalJSON would emit (field names per golden vectors; others per
    * the library's public struct tags). */
  private def cmdJson(cid: Int, up: Boolean, p: Array[Byte]): Option[String] = {
    def b(i: Int) = p(i) & 0xff
    (cid, up) match {
      case (0x01, true)  => Some(s"""{"devLoRaWANVersion":{"minor":${b(0) & 0x0f}}}""")
      case (0x01, false) => Some(s"""{"servLoRaWANVersion":{"minor":${b(0) & 0x0f}}}""")
      case (0x02, true)  => None
      case (0x02, false) => Some(s"""{"margin":${b(0)},"gwCnt":${b(1)}}""")
      case (0x03, true) => Some(
        s"""{"channelMaskAck":${bool((b(0) & 1) != 0)},""" +
        s""""dataRateAck":${bool((b(0) & 2) != 0)},""" +
        s""""powerAck":${bool((b(0) & 4) != 0)}}""")
      case (0x03, false) =>
        val chMask = (0 until 16).map(i => bool((u16le(p, 1) & (1 << i)) != 0))
        Some(s"""{"dataRate":${(b(0) >> 4) & 0xf},"txPower":${b(0) & 0xf},""" +
          s""""chMask":[${chMask.mkString(",")}],""" +
          s""""redundancy":{"chMaskCntl":${(b(3) >> 4) & 0x7},"nbRep":${b(3) & 0xf}}}""")
      case (0x04, true)  => None
      case (0x04, false) => Some(s"""{"maxDCCycle":${b(0)}}""")
      case (0x05, true) => Some(
        s"""{"channelAck":${bool((b(0) & 1) != 0)},""" +
        s""""rx2DataRateAck":${bool((b(0) & 2) != 0)},""" +
        s""""rx1DROffsetAck":${bool((b(0) & 4) != 0)}}""")
      case (0x05, false) => Some(
        s"""{"dlSettings":{"rx1DROffset":${(b(0) >> 4) & 0x7},"rx2DataRate":${b(0) & 0xf}},""" +
        s""""frequency":${u24le(p, 1).toLong * 100}}""")
      case (0x06, true) =>
        val m6 = b(1) & 0x3f
        val margin = if (m6 >= 32) m6 - 64 else m6 // 6-bit two's complement
        Some(s"""{"battery":${b(0)},"margin":$margin}""")
      case (0x06, false) => None
      case (0x07, true) => Some(
        s"""{"channelFrequencyOK":${bool((b(0) & 1) != 0)},""" +
        s""""dataRateRangeOK":${bool((b(0) & 2) != 0)}}""")
      case (0x07, false) => Some(
        s"""{"chIndex":${b(0)},"freq":${u24le(p, 1).toLong * 100},""" +
        s""""maxDR":${(b(4) >> 4) & 0xf},"minDR":${b(4) & 0xf}}""")
      case (0x08, true)  => None
      case (0x08, false) => Some(s"""{"delay":${b(0) & 0xf}}""")
      case (0x09, true)  => None
      case (0x09, false) => Some(
        s"""{"downlinkDwellTime":${(b(0) >> 5) & 1},"uplinkDwellTime":${(b(0) >> 4) & 1},""" +
        s""""maxEIRP":${b(0) & 0xf}}""")
      case (0x0a, true) => Some(
        s"""{"channelFrequencyOK":${bool((b(0) & 1) != 0)},""" +
        s""""uplinkFrequencyExists":${bool((b(0) & 2) != 0)}}""")
      case (0x0a, false) => Some(s"""{"chIndex":${b(0)},"freq":${u24le(p, 1).toLong * 100}}""")
      case (0x0b, true)  => Some(s"""{"devLoRaWANVersion":{"minor":${b(0) & 0x0f}}}""")
      case (0x0b, false) => Some(s"""{"servLoRaWANVersion":{"minor":${b(0) & 0x0f}}}""")
      case (0x0c, _)     => Some(s"""{"adrParam":{"limitExp":${(b(0) >> 4) & 0xf},"delayExp":${b(0) & 0xf}}}""")
      case (0x0d, true)  => None
      // full wire format: u32le GPS-epoch seconds + 1/256-s fraction
      // byte — a u24 read decoded any realistic timestamp mod 2^24
      // (GPS epoch passed 2^24 s in 1980 + ~194 days)
      case (0x0d, false) => Some(
        s"""{"timeSinceGPSEpoch":${u32le(p, 0)},"fractionalSecond":${b(4) & 0xff}}""")
      case (0x0e, false) => Some(s"""{"period":${(b(0) >> 3) & 0x7},"maxRetries":${b(0) & 0x7}}""")
      case (0x0f, true)  => Some(s"""{"timeOK":${bool((b(0) & 1) != 0)}}""")
      case (0x0f, false) => Some(s"""{"maxTimeN":${(b(0) >> 4) & 0xf},"maxCountN":${b(0) & 0xf}}""")
      case _ => None
    }
  }

  private def decodeMacCommands(bytes: Array[Byte], from: Int, until: Int,
                                up: Boolean): Either[String, List[MacCommand]] = {
    var i = from
    val out = List.newBuilder[MacCommand]
    while (i < until) {
      val cid = bytes(i) & 0xff
      cmdLen(cid, up) match {
        case None => return Left(f"lorawan: unknown CID 0x$cid%02x")
        case Some(len) =>
          if (i + 1 + len > until)
            return Left(f"lorawan: not enough remaining bytes for CID 0x$cid%02x")
          val payload = java.util.Arrays.copyOfRange(bytes, i + 1, i + 1 + len)
          out += MacCommand(cidNames(cid), cmdJson(cid, up, payload))
          i += 1 + len
      }
    }
    Right(out.result())
  }

  // --------------------------------------------------- MAC command encode

  /** Encode one MAC command (inverse of [[cmdJson]]) — used by
    * [[encodeData]] for round-trip testing (reference C10,
    * jsonUnmarshaler.go:21-209). Takes the cid name + already-decoded
    * payload JSON; returns cid byte + payload bytes. */
  private def encodeCmd(cid: Int, up: Boolean, json: Option[String]): Array[Byte] = {
    def field(name: String): Option[String] =
      json.flatMap { j =>
        val m = ("\"" + name + "\"\\s*:\\s*(\\[[^\\]]*\\]|[^,}\\]]+)").r.findFirstMatchIn(j)
        m.map(_.group(1))
      }
    def num(name: String): Int = field(name).map(_.trim.toInt).getOrElse(0)
    def lng(name: String): Long = field(name).map(_.trim.toLong).getOrElse(0L)
    def bit(name: String, b: Int): Int =
      if (field(name).exists(_.trim == "true")) 1 << b else 0
    def u24(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)

    val payload: Array[Byte] = (cid, up) match {
      case (0x01, _) => Array((json.fold(0)(j =>
        ("\"minor\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(j).map(_.group(1).toInt).getOrElse(0))) & 0xf).toByte)
      case (0x02, true)  => Array.emptyByteArray
      case (0x02, false) => Array(num("margin").toByte, num("gwCnt").toByte)
      case (0x03, true) =>
        Array((bit("channelMaskAck", 0) | bit("dataRateAck", 1) | bit("powerAck", 2)).toByte)
      case (0x03, false) =>
        val mask = field("chMask").map { arr =>
          arr.stripPrefix("[").stripSuffix("]").split(",").map(_.trim == "true")
        }.getOrElse(Array.fill(16)(false))
        val m = mask.zipWithIndex.foldLeft(0) { case (acc, (on, i)) => if (on) acc | (1 << i) else acc }
        val cm = field("chMaskCntl").map(_.trim.toInt).getOrElse(0)
        val nb = field("nbRep").map(_.trim.toInt).getOrElse(0)
        Array((((num("dataRate") & 0xf) << 4) | (num("txPower") & 0xf)).toByte,
          (m & 0xff).toByte, ((m >> 8) & 0xff).toByte,
          (((cm & 0x7) << 4) | (nb & 0xf)).toByte)
      case (0x04, true)  => Array.emptyByteArray
      case (0x04, false) => Array(num("maxDCCycle").toByte)
      case (0x05, true) =>
        Array((bit("channelAck", 0) | bit("rx2DataRateAck", 1) | bit("rx1DROffsetAck", 2)).toByte)
      case (0x05, false) =>
        Array((((num("rx1DROffset") & 0x7) << 4) | (num("rx2DataRate") & 0xf)).toByte) ++
          u24(lng("frequency") / 100)
      case (0x06, true) =>
        val margin = num("margin"); val m6 = if (margin < 0) margin + 64 else margin
        Array(num("battery").toByte, (m6 & 0x3f).toByte)
      case (0x06, false) => Array.emptyByteArray
      case (0x07, true) =>
        Array((bit("channelFrequencyOK", 0) | bit("dataRateRangeOK", 1)).toByte)
      case (0x07, false) =>
        Array(num("chIndex").toByte) ++ u24(lng("freq") / 100) ++
          Array((((num("maxDR") & 0xf) << 4) | (num("minDR") & 0xf)).toByte)
      case (0x08, true)  => Array.emptyByteArray
      case (0x08, false) => Array((num("delay") & 0xf).toByte)
      case (0x09, true)  => Array.emptyByteArray
      case (0x09, false) =>
        Array((((num("downlinkDwellTime") & 1) << 5) | ((num("uplinkDwellTime") & 1) << 4) |
          (num("maxEIRP") & 0xf)).toByte)
      case (0x0a, true) =>
        Array((bit("channelFrequencyOK", 0) | bit("uplinkFrequencyExists", 1)).toByte)
      case (0x0a, false) => Array(num("chIndex").toByte) ++ u24(lng("freq") / 100)
      case (0x0b, _) => Array((num("minor") & 0xf).toByte)
      case (0x0c, _) => Array((((num("limitExp") & 0xf) << 4) | (num("delayExp") & 0xf)).toByte)
      case (0x0d, true)  => Array.emptyByteArray
      case (0x0d, false) =>
        val secs = lng("timeSinceGPSEpoch")
        u24(secs) ++ Array(((secs >> 24) & 0xff).toByte,
          (num("fractionalSecond") & 0xff).toByte)
      case (0x0e, false) => Array((((num("period") & 0x7) << 3) | (num("maxRetries") & 0x7)).toByte)
      case (0x0f, true)  => Array((bit("timeOK", 0)).toByte)
      case (0x0f, false) => Array((((num("maxTimeN") & 0xf) << 4) | (num("maxCountN") & 0xf)).toByte)
      case _ => Array.emptyByteArray
    }
    Array(cid.toByte) ++ payload
  }

  private val cidByName: Map[String, Int] =
    cidNames.map(_.swap) ++ Map(
      "ResetConf" -> 0x01, "LinkCheckAns" -> 0x02, "LinkADRAns" -> 0x03,
      "DutyCycleAns" -> 0x04, "RXParamSetupAns" -> 0x05, "DevStatusAns" -> 0x06,
      "NewChannelAns" -> 0x07, "RXTimingSetupAns" -> 0x08, "TXParamSetupAns" -> 0x09,
      "DLChannelAns" -> 0x0a, "RekeyConf" -> 0x0b, "ADRParamSetupAns" -> 0x0c,
      "DeviceTimeAns" -> 0x0d, "RejoinParamSetupAns" -> 0x0f)

  // ---------------------------------------------------------------- encode

  /** Inverse codec (reference C10): Phy → wire bytes. The `mic` field is
    * written verbatim (use [[LorawanCrypto]] to compute a valid one). */
  def encode(phy: Phy): Array[Byte] = {
    val mTypeN = MTypes.indexOf(phy.mType)
    require(mTypeN >= 0, s"unknown mType ${phy.mType}")
    val mhdr = ((mTypeN & 0x7) << 5).toByte // major = 0 (LoRaWANR1)
    val micB = hexToBytes(phy.mic)
    require(micB.length == 4, "MIC must be 4 bytes")

    val body: Array[Byte] = phy.mType match {
      case "JoinRequest" =>
        val jr = phy.joinRequest.get
        hexToLe(jr.joinEui) ++ hexToLe(jr.devEui) ++
          Array((jr.devNonce & 0xff).toByte, ((jr.devNonce >> 8) & 0xff).toByte)
      case "JoinAccept" =>
        phy.joinAcceptBytes.get
      case _ =>
        // parse() never produces RejoinRequest/Proprietary, so a Phy
        // built by hand with mac=None must fail with the same labeled
        // error style as every other malformed-input path — not None.get
        require(phy.mac.isDefined,
          s"unsupported mType for encode: ${phy.mType} (no MAC payload)")
        val mac = phy.mac.get
        val up = isUplink(phy.mType)
        val fOptsB = mac.fhdr.fOpts.toArray.flatMap { c =>
          encodeCmd(cidByName(c.cid), up, c.payload)
        }
        require(fOptsB.length <= 15, "FOpts must be at most 15 bytes")
        val fc = (if (mac.fhdr.fCtrl.adr) 0x80 else 0) |
          (if (mac.fhdr.fCtrl.adrAckReq) 0x40 else 0) |
          (if (mac.fhdr.fCtrl.ack) 0x20 else 0) |
          (if (mac.fhdr.fCtrl.fPending || mac.fhdr.fCtrl.classB) 0x10 else 0) |
          (fOptsB.length & 0x0f)
        hexToLe(mac.fhdr.devAddr) ++ Array(fc.toByte,
          (mac.fhdr.fCnt & 0xff).toByte, ((mac.fhdr.fCnt >> 8) & 0xff).toByte) ++
          fOptsB ++
          mac.fPort.map(p => Array(p.toByte)).getOrElse(Array.emptyByteArray) ++
          mac.frmPayload.getOrElse(Array.emptyByteArray)
    }
    Array(mhdr) ++ body ++ micB
  }
}
