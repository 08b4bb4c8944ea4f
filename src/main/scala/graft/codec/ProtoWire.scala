package graft.codec

/** Minimal protobuf wire-format reader for the ChirpStack
  * `gw.UplinkFrame` message (F0h raw-protobuf dialect).
  *
  * The reference parses raw protobuf bytes when JSON decode fails on a
  * `gateway/.../up` topic (`LoraServerIOCollector.py:254-261`:
  * `UplinkFrame.ParseFromString` → `MessageToJson` → `json.loads`) and
  * then runs the SAME proto-dialect normalization it runs on
  * MessageToJson text. This decoder reproduces exactly that: bytes →
  * the MessageToJson JSON rendering (json_name keys, base64 bytes, enum
  * names, proto3 default-valued fields omitted) — so the existing
  * proto-dialect column program consumes either transport unchanged.
  *
  * Field numbers follow the public chirpstack-api v3 `gw.proto`
  * (github.com/brocaar/chirpstack-api), restricted to the subset the
  * normalizer reads (`LoraServerIOCollector.py:320-338`); unknown fields
  * are wire-skipped:
  *
  * {{{
  * UplinkFrame        { bytes phy_payload = 1; UplinkTXInfo tx_info = 2;
  *                      UplinkRXInfo rx_info = 3; }
  * UplinkTXInfo       { uint32 frequency = 1; Modulation modulation = 2;
  *                      LoRaModulationInfo lora_modulation_info = 3; }
  * LoRaModulationInfo { uint32 bandwidth = 1; uint32 spreading_factor = 2;
  *                      string code_rate = 3; bool polarization_inversion = 4; }
  * UplinkRXInfo       { bytes gateway_id = 1 [json_name="gatewayID"];
  *                      int32 rssi = 5; double lora_snr = 6 [json_name="loRaSNR"];
  *                      uint32 channel = 7; uint32 rf_chain = 8;
  *                      CRCStatus crc_status = 17; }
  * enum CRCStatus     { NO_CRC = 0; BAD_CRC = 1; CRC_OK = 2; }
  * }}}
  */
object ProtoWire {

  private final class Malformed extends RuntimeException

  private final class Reader(buf: Array[Byte], val limit: Int, var pos: Int) {
    def this(buf: Array[Byte]) = this(buf, buf.length, 0)
    def hasMore: Boolean = pos < limit
    private def fail(): Nothing = throw new Malformed
    def varint(): Long = {
      var shift = 0; var r = 0L
      while (shift <= 63) {
        if (pos >= limit) fail()
        val b = buf(pos); pos += 1
        r |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return r
        shift += 7
      }
      fail()
    }
    def fixed64(): Long = {
      if (pos + 8 > limit) fail()
      var r = 0L; var i = 7
      while (i >= 0) { r = (r << 8) | (buf(pos + i) & 0xffL); i -= 1 }
      pos += 8; r
    }
    def lengthDelimited(): Reader = {
      val n = varint()
      // `n > limit - pos`, never `pos + n > limit`: a crafted length
      // near Long.MaxValue overflows the addition, escapes this check,
      // and surfaces as an uncaught IllegalArgumentException from
      // copyOfRange instead of the Malformed → null contract
      if (n < 0 || n > limit - pos) fail()
      val r = new Reader(buf, pos + n.toInt, pos); pos += n.toInt; r
    }
    def bytes(): Array[Byte] = {
      val r = lengthDelimited()
      java.util.Arrays.copyOfRange(buf, r.pos, r.limit)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => if (pos + 8 > limit) fail() else pos += 8
      case 2 => lengthDelimited()
      case 5 => if (pos + 4 > limit) fail() else pos += 4
      case _ => fail()
    }
  }

  private val CrcNames = Array("NO_CRC", "BAD_CRC", "CRC_OK")

  /** JSON object builder that mirrors MessageToJson's proto3 rendering:
    * default-valued fields (0, false, empty) are never added. */
  private final class Obj {
    private val sb = new StringBuilder("{")
    private var n = 0
    private def key(k: String): StringBuilder = {
      if (n > 0) sb.append(','); n += 1
      sb.append('"').append(k).append("\":")
    }
    def num(k: String, v: Long): Unit = if (v != 0) key(k).append(v)
    // non-finite doubles (a corrupt fixed64 decoding to NaN/Infinity)
    // would render as bare NaN/Infinity — invalid JSON that downstream
    // from_json nulls wholesale; treat them like proto3 defaults and
    // omit the field, keeping the rest of the frame routable
    def dbl(k: String, v: Double): Unit =
      if (v != 0.0 && !v.isNaN && !v.isInfinite) key(k).append(v)
    def str(k: String, v: String): Unit =
      if (v != null && v.nonEmpty) {
        key(k).append('"')
        v.foreach {
          case '"'  => sb.append("\\\"")
          case '\\' => sb.append("\\\\")
          case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
          case c    => sb.append(c)
        }
        sb.append('"')
      }
    def b64(k: String, v: Array[Byte]): Unit =
      if (v != null && v.nonEmpty)
        str(k, java.util.Base64.getEncoder.encodeToString(v))
    def obj(k: String, v: String): Unit = if (v != null) key(k).append(v)
    def result: String = { sb.append('}'); sb.toString }
    def isEmpty: Boolean = n == 0
  }

  // Mutable per-message accumulators, shared across REPEATED occurrences
  // of the same embedded-message field: the proto spec requires parsers
  // to MERGE split sub-messages (scalars last-wins, nested messages
  // recursively merged) — ParseFromString does, so a legal encoding
  // that ships UplinkTXInfo in two field-2 chunks must not lose the
  // first chunk's fields.
  private final class LmiState {
    var bandwidth = 0L; var sf = 0L; var codeRate: String = null
    var present = false
    def render: String = {
      val o = new Obj
      o.num("bandwidth", bandwidth)
      o.num("spreadingFactor", sf)
      o.str("codeRate", codeRate)
      o.result
    }
  }

  private def readLoraModulationInfo(r: Reader, st: LmiState): Unit = {
    st.present = true
    while (r.hasMore) {
      val tag = r.varint()
      (tag >> 3, (tag & 7).toInt) match {
        case (1, 0) => st.bandwidth = r.varint()
        case (2, 0) => st.sf = r.varint()
        case (3, 2) => st.codeRate = new String(r.bytes(), "UTF-8")
        case (_, w) => r.skip(w)
      }
    }
  }

  private final class TxState {
    var freq = 0L; val lmi = new LmiState
    var present = false
    def render: String = {
      val o = new Obj
      o.num("frequency", freq)
      o.obj("loRaModulationInfo", if (lmi.present) lmi.render else null)
      o.result
    }
  }

  private def readTxInfo(r: Reader, st: TxState): Unit = {
    st.present = true
    while (r.hasMore) {
      val tag = r.varint()
      (tag >> 3, (tag & 7).toInt) match {
        case (1, 0) => st.freq = r.varint()
        case (3, 2) => readLoraModulationInfo(r.lengthDelimited(), st.lmi)
        case (_, w) => r.skip(w)
      }
    }
  }

  private final class RxState {
    var gatewayId: Array[Byte] = null
    var rssi = 0L; var snr = 0.0; var channel = 0L; var rfChain = 0L
    var crc = 0L
    var present = false
    def render: String = {
      val o = new Obj
      o.b64("gatewayID", gatewayId)
      o.num("rssi", rssi.toInt)
      o.dbl("loRaSNR", snr)
      o.num("channel", channel)
      o.num("rfChain", rfChain)
      // known enum numbers render as names, unknown ones as their integer
      // (MessageToJson's unknown-enum rendering); 0 = proto3 default, omitted
      if (crc > 0 && crc < CrcNames.length) o.str("crcStatus", CrcNames(crc.toInt))
      else o.num("crcStatus", crc.toInt)
      o.result
    }
  }

  private def readRxInfo(r: Reader, st: RxState): Unit = {
    st.present = true
    while (r.hasMore) {
      val tag = r.varint()
      (tag >> 3, (tag & 7).toInt) match {
        case (1, 2)  => st.gatewayId = r.bytes()
        case (5, 0)  => st.rssi = r.varint()
        case (6, 1)  => st.snr = java.lang.Double.longBitsToDouble(r.fixed64())
        case (7, 0)  => st.channel = r.varint()
        case (8, 0)  => st.rfChain = r.varint()
        case (17, 0) => st.crc = r.varint()
        case (_, w)  => r.skip(w)
      }
    }
  }

  /** Raw UplinkFrame bytes → MessageToJson-equivalent JSON text, or null
    * if the bytes are not a well-formed frame. */
  def uplinkFrameToJson(payload: Array[Byte]): String = {
    if (payload == null || payload.isEmpty) return null
    try {
      val r = new Reader(payload)
      var phy: Array[Byte] = null // scalar bytes: last occurrence wins
      val tx = new TxState
      val rx = new RxState
      while (r.hasMore) {
        val tag = r.varint()
        (tag >> 3, (tag & 7).toInt) match {
          case (1, 2) => phy = r.bytes()
          case (2, 2) => readTxInfo(r.lengthDelimited(), tx)
          case (3, 2) => readRxInfo(r.lengthDelimited(), rx)
          case (_, w) => r.skip(w)
        }
      }
      val o = new Obj
      o.b64("phyPayload", phy)
      o.obj("txInfo", if (tx.present) tx.render else null)
      o.obj("rxInfo", if (rx.present) rx.render else null)
      // an empty frame is indistinguishable from garbage that happened to
      // skip cleanly — treat as undecodable, like ParseFromString failing
      if (o.isEmpty) null else o.result
    } catch { case _: Malformed => null }
  }

  /** The transport contract for binary frames in a text message log:
    * base64. Strict decode — any non-base64 text means "this was never a
    * protobuf frame" and yields null. */
  def uplinkFrameB64ToJson(b64: String): String = {
    if (b64 == null) return null
    val bytes =
      try java.util.Base64.getDecoder.decode(b64.trim)
      catch { case _: IllegalArgumentException => return null }
    uplinkFrameToJson(bytes)
  }
}
