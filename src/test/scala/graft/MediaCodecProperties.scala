package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.sources.MediaCodec

/** Property tests for the byte-layout codecs: encode→decode must be the
  * identity over the whole supported input space (any dimensions incl.
  * odd widths that exercise row padding, full-range pixels; any
  * channel/rate layout, full-range i16 samples) — fixed golden fixtures
  * in MultimodalSpec check absolute byte offsets, these check the
  * algebra. */
object MediaCodecProperties extends Properties("MediaCodec") {

  private val bmpGen = for {
    w <- Gen.choose(1, 17)
    h <- Gen.choose(1, 9)
    px <- Gen.containerOfN[Array, Int](w * h, Gen.choose(0, 0xffffff))
  } yield (w, h, px)

  property("BMP encode→decode is identity (any dims, any pixels)") =
    forAll(bmpGen) { case (w, h, px) =>
      val out = MediaCodec.decodeBmp(MediaCodec.encodeBmp(w, h, px))
      out.width == w && out.height == h && out.pixels.toSeq == px.toSeq
    }

  private val wavGen = for {
    rate <- Gen.oneOf(8000, 16000, 44100, 48000)
    ch <- Gen.choose(1, 8)
    n <- Gen.choose(0, 200)
    samples <- Gen.containerOfN[Array, Short](n,
      Gen.choose(Short.MinValue, Short.MaxValue))
  } yield (rate, ch, samples)

  property("WAV encode→decode is identity (any layout, full i16 range)") =
    forAll(wavGen) { case (rate, ch, samples) =>
      val out = MediaCodec.decodeWav(MediaCodec.encodeWav(rate, ch, samples))
      out.sampleRate == rate && out.channels == ch &&
        out.samples.toSeq == samples.toSeq
    }

  property("decode rejects (not mis-parses) truncated BMPs") =
    forAll(bmpGen) { case (w, h, px) =>
      val full = MediaCodec.encodeBmp(w, h, px)
      val cut = full.take(full.length - 1)
      try { MediaCodec.decodeBmp(cut); false }
      catch { case _: IllegalArgumentException => true }
    }
}
