package graft.media

import org.scalatest.funsuite.AnyFunSuite

/** Real-decoder tests for the WAV compansion/ADPCM formats: mu-law and
  * A-law ground truth is authored by the JDK's own G.711 converters
  * (independent implementation), IMA ADPCM by a test-side encoder that
  * tracks the published decoder state machine. */
class AudioCodecSpec extends AnyFunSuite {
  private val sr = 8000
  private val n = 4040
  private val freq = 440.0
  private def sine(i: Int): Double = math.sin(2 * math.Pi * freq * i / sr) * 30000

  private def pcmBytes: Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = sine(i).toShort
      pcm(2 * i) = (v & 0xFF).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    pcm
  }

  private def snrDb(decoded: Array[Float]): Double = {
    var sig = 0.0; var err = 0.0
    for (i <- 0 until n) {
      val s = sine(i) / 32768.0
      sig += s * s
      val e = s - decoded(i)
      err += e * e
    }
    10 * math.log10(sig / err)
  }

  private def companded(enc: javax.sound.sampled.AudioFormat.Encoding): Array[Byte] = {
    import javax.sound.sampled._
    val srcFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sr.toFloat, 16, 1, 2, sr.toFloat, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcmBytes), srcFmt, n.toLong)
    val dstFmt = new AudioFormat(enc, sr.toFloat, 8, 1, 1, sr.toFloat, false)
    val conv = AudioSystem.getAudioInputStream(dstFmt, ais)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(conv, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("mu-law WAV (JDK-encoded) decodes to the source sine at G.711 fidelity") {
    val dec = Media.decodeAudio("mu", companded(javax.sound.sampled.AudioFormat.Encoding.ULAW), 0, 0)
    assert(dec.sampleRate == sr && dec.samples.length == n)
    val snr = snrDb(dec.samples)
    assert(snr > 25, s"mu-law SNR $snr dB")
  }

  test("A-law WAV (JDK-encoded) decodes to the source sine at G.711 fidelity") {
    val dec = Media.decodeAudio("al", companded(javax.sound.sampled.AudioFormat.Encoding.ALAW), 0, 0)
    assert(dec.sampleRate == sr && dec.samples.length == n)
    val snr = snrDb(dec.samples)
    assert(snr > 25, s"A-law SNR $snr dB")
  }

  test("IMA ADPCM WAV decodes blocks to the source sine (>20 dB)") {
    val blockAlign = 256
    val samplesPerBlock = (blockAlign - 4) * 2 + 1 // mono: 505
    assert(n % samplesPerBlock == 0)
    // test-side encoder: mirrors the published quantizer, stepping the
    // DECODER state (Media.imaStep) so predictor drift is impossible
    val data = new java.io.ByteArrayOutputStream()
    var idx = 0
    pcmShorts.grouped(samplesPerBlock).foreach { block =>
      var pred: Int = block(0)
      data.write(pred & 0xFF); data.write((pred >> 8) & 0xFF)
      data.write(idx); data.write(0)
      var lowNib = -1
      block.tail.foreach { s =>
        val step = Media.ImaStepTable(idx)
        var diff = s - pred
        var nib = 0
        if (diff < 0) { nib = 8; diff = -diff }
        if (diff >= step) { nib |= 4; diff -= step }
        if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
        if (diff >= (step >> 2)) nib |= 1
        val (p, i) = Media.imaStep(nib, pred, idx)
        pred = p; idx = i
        if (lowNib < 0) lowNib = nib
        else { data.write(lowNib | (nib << 4)); lowNib = -1 }
      }
      assert(lowNib < 0) // even nibble count per block
    }
    val wav = wavContainer(0x11, channels = 1, rate = sr, blockAlign = blockAlign,
      bits = 4, data.toByteArray)
    val dec = Media.decodeAudio("adpcm", wav, 0, 0)
    assert(dec.sampleRate == sr && dec.samples.length == n, s"got ${dec.samples.length}")
    val snr = snrDb(dec.samples)
    assert(snr > 20, s"ADPCM SNR $snr dB")

    // a TRUNCATED final block yields only its encoded samples — no
    // zero padding spliced into the stream (1 header sample + 20 data
    // bytes = 40 nibbles)
    val cut = data.toByteArray.take(6 * blockAlign + 4 + 20)
    val decCut = Media.decodeAudio("adpcmcut",
      wavContainer(0x11, channels = 1, rate = sr, blockAlign = blockAlign, bits = 4, cut), 0, 0)
    assert(decCut.samples.length == 6 * samplesPerBlock + 41,
      s"truncated block decoded ${decCut.samples.length}")
  }

  test("corrupt RIFF chunk length terminates the WAV walk (no hang)") {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
      bos.write((v >> 16) & 0xFF); bos.write((v >> 24) & 0xFF) }
    bos.write("RIFF".getBytes("US-ASCII")); le32(100); bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("junk".getBytes("US-ASCII")); le32(0xFFFFFFF8) // claims 4 GiB
    bos.write(new Array[Byte](32))
    // the clamped walk reaches EOF without fmt/data and reports
    // malformed — instead of spinning forever on the bogus length
    intercept[IllegalArgumentException] {
      Media.decodeAudio("c1", bos.toByteArray, 8000, 10)
    }
  }

  private def pcmShorts: Array[Short] = Array.tabulate(n)(i => sine(i).toShort)

  private def wavContainer(fmtTag: Int, channels: Int, rate: Int, blockAlign: Int,
                           bits: Int, data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >> 16) & 0xFFFF) }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val fmtLen = 18
    tag("RIFF"); le32(4 + 8 + fmtLen + 8 + data.length); tag("WAVE")
    tag("fmt "); le32(fmtLen)
    le16(fmtTag); le16(channels); le32(rate); le32(rate * blockAlign / 505)
    le16(blockAlign); le16(bits); le16(0)
    tag("data"); le32(data.length); bos.write(data)
    bos.toByteArray
  }
}
