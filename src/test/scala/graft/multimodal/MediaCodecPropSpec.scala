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
}
