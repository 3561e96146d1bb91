package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Round-13 item (r12 VERDICT #6): REAL WAV/PCM16 decode — RIFF chunk
  * walk, fmt parse, sample read, exact mono mixdown — against
  * known-waveform fixtures, with malformed-stream degradation. */
class WavDecodeSpec extends AnyFunSuite {

  test("known tone round-trips exactly: mono, stereo, and junk-chunk layouts") {
    // square wave, half-period 5, amplitude 1000, 128 samples
    val tone = Array.tabulate(128)(i => if ((i / 5) % 2 == 0) 1000 else -1000)
    val mono = Multimodal.wavPcm16(8000, 1, tone.map(_.toShort))
    assert(Multimodal.wavSamples(mono).map {
      case (r, c, s) => (r, c, s.toSeq)
    }.contains((8000, 1, tone.toSeq)))
    // stereo with ch2 = ch1/2: mixdown (s + s/2)/2, truncation toward zero
    val pcm2 = Array.tabulate(256) { j =>
      val v = tone(j / 2); (if (j % 2 == 0) v else v / 2).toShort
    }
    val want2 = tone.map(v => (v + v / 2) / 2).toSeq
    for (junk <- Seq(false, true)) {
      val wav = Multimodal.wavPcm16(44100, 2, pcm2, junkChunk = junk)
      assert(Multimodal.wavSamples(wav).map {
        case (r, c, s) => (r, c, s.toSeq)
      }.contains((44100, 2, want2)), s"junk=$junk")
    }
  }

  test("band energy of a pure tone lands where the waveform says") {
    // amplitude a everywhere → every full 8-sample band has energy 8a²
    val a = 300
    val const = Array.fill(130)(a) // 2 full frames + 2-sample residue
    val be = Multimodal.sampleBandEnergy(const, frameSize = 64, nBands = 8)
    assert(be.length == 3)
    assert(be(0).toSeq == Seq.fill(8)(8L * a * a))
    assert(be(1).toSeq == Seq.fill(8)(8L * a * a))
    // short final frame: 2 samples in band 0, rest empty
    assert(be(2).toSeq == (2L * a * a) +: Seq.fill(7)(0L))
  }

  test("negative samples decode with sign extension") {
    val s = Array[Short](-32768, 32767, -1, 1, 0, -12345, 100, -100)
    val got = Multimodal.wavSamples(Multimodal.wavPcm16(16000, 1, s)).get._3
    assert(got.toSeq == s.map(_.toInt).toSeq)
  }

  test("malformed streams degrade to None, never throw") {
    val ok = Multimodal.wavPcm16(8000, 1, Array.tabulate(64)(_.toShort))
    def mut(off: Int, v: Byte) = { val b = ok.clone(); b(off) = v; b }
    assert(Multimodal.wavSamples("RIFFnope".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.wavSamples(ok.take(30)).isEmpty, "truncated header")
    assert(Multimodal.wavSamples(ok.take(60)).isEmpty, "truncated data chunk")
    assert(Multimodal.wavSamples(mut(20, 2)).isEmpty, "non-PCM format")
    assert(Multimodal.wavSamples(mut(34, 8)).isEmpty, "8-bit samples")
    assert(Multimodal.wavSamples(mut(22, 0)).isEmpty, "zero channels")
    assert(Multimodal.wavSamples(Array[Byte](1, 2, 3)).isEmpty)
    // data before fmt: chunk walk must refuse, not guess a layout
    val noFmt = ok.clone()
    noFmt(12) = 'd'; noFmt(13) = 'a'; noFmt(14) = 't'; noFmt(15) = 'a'
    assert(Multimodal.wavSamples(noFmt).isEmpty)
  }
}
