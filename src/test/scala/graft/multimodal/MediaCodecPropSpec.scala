package graft.multimodal

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure-JVM media container codecs: encode→decode
  * must round-trip EXACTLY for arbitrary payloads (the parsers back
  * oracle-gated queries, so lossiness anywhere would surface as a hash
  * mismatch at some corpus), and decode must be total — arbitrary junk
  * bytes yield an error row, never a throw. */
object MediaCodecPropSpec extends Properties("MediaCodecs") {

  private val genSamples: Gen[Array[Int]] =
    Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
        .map(_.toArray))

  private val genGray: Gen[Array[Int]] =
    Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 255)).map(_.toArray))

  private val genJunk: Gen[Array[Byte]] =
    Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  property("WAV round-trips any int16 payload") = forAll(genSamples) { s =>
    val d = WavCodec.decode(WavCodec.encode(s))
    d.error == null && d.samples.toSeq == s.toSeq
  }

  property("WAV decode is total on junk") = forAll(genJunk) { b =>
    val d = WavCodec.decode(b)
    (d.error == null) != (d.samples == null) // exactly one of data/error
  }

  property("BMP round-trips any gray grid (every divisor width)") =
    forAll(genGray) { g =>
      // single-row always; plus a multi-row width when one divides evenly
      val widths = g.length +: (2 to 8).filter(w => g.length % w == 0)
      widths.forall { w =>
        val d = BmpCodec.decode(BmpCodec.encode(g, w))
        d.error == null && d.pixels.toSeq == g.toSeq &&
          d.width == w && d.height == (if (w == 0) 0 else g.length / w)
      }
    }

  property("BMP decode is total on junk") = forAll(genJunk) { b =>
    val d = BmpCodec.decode(b)
    (d.error == null) != (d.pixels == null)
  }

  private val genGeom: Gen[(Int, Int)] =
    for {
      w <- Gen.oneOf(2, 4, 6, 8)
      h <- Gen.oneOf(2, 4, 6)
    } yield (w, h)

  property("Y4M round-trips frame count and luma sums at any even geometry") =
    forAll(genGray, genGeom) { case (g, (w, h)) =>
      val d = Y4mCodec.decode(Y4mCodec.encode(g, w, h))
      val expect = g.grouped(w * h).map(_.map(_.toLong).sum).toSeq
      d.error == null && d.width == w && d.height == h &&
        d.nFrames == (g.length + w * h - 1) / (w * h) &&
        d.lumaSums.toSeq == expect
    }

  property("Y4M decode is total on junk") = forAll(genJunk) { b =>
    val d = Y4mCodec.decode(b)
    (d.error == null) != (d.lumaSums == null)
  }

  // Structured fuzz: pure-random bytes almost never survive the magic
  // checks, so they exercise little of the header math. Corrupting a
  // 4-byte window of a VALID blob with an extreme int is exactly the
  // class that found the 2^31 overflow bugs — keep hammering it.
  private val genExtreme: Gen[Int] = Gen.oneOf(
    Gen.oneOf(Int.MinValue, Int.MinValue + 1, -1, 0, 1,
      Int.MaxValue, Int.MaxValue - 15, 0x7ffffff0, 1431655766),
    Gen.choose(Int.MinValue, Int.MaxValue))

  private def corrupt(blob: Array[Byte], off: Int, v: Int): Array[Byte] = {
    val b = blob.clone()
    var i = 0
    while (i < 4 && off + i < b.length) {
      b(off + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1
    }
    b
  }

  property("WAV decode is total under 4-byte header corruption") =
    forAll(genSamples, Gen.choose(0, 60), genExtreme) { (s, off, v) =>
      val d = WavCodec.decode(corrupt(WavCodec.encode(s), off, v))
      (d.error == null) != (d.samples == null)
    }

  property("BMP decode is total under 4-byte header corruption") =
    forAll(genGray, Gen.choose(0, 60), genExtreme) { (g, off, v) =>
      val w = if (g.isEmpty) 0 else g.length
      val d = BmpCodec.decode(corrupt(BmpCodec.encode(g, w), off, v))
      (d.error == null) != (d.pixels == null)
    }

  property("Y4M decode is total under header-text corruption") =
    forAll(genGray, Gen.choose(0, 40), genExtreme) { (g, off, v) =>
      val d = Y4mCodec.decode(corrupt(Y4mCodec.encode(g, 4, 2), off, v))
      (d.error == null) != (d.lumaSums == null)
    }
}
