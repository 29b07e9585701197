package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.AudioCodec
import graft.ext.AudioCodec.Clip

/** The PCM WAV codec contract: byte-exact round trips for both channel
  * layouts, chunk-walking past non-data chunks, and the hostile/dirty
  * payload arms the 100 TB permissive path relies on. */
class AudioCodecSpec extends AnyFunSuite {

  private val mono = Clip(1, 16000,
    Array[Short](0, 100, -100, 32767, -32768, 7, -7, 12345))
  private val stereo = Clip(2, 44100,
    Array[Short](10, -10, 200, -200, 32767, -32768, 0, 1))

  test("mono round trip is byte-exact") {
    val back = AudioCodec.decodeWav(AudioCodec.encodeWav(mono))
    assert(back.channels == 1 && back.sampleRate == 16000)
    assert(back.samples.toSeq == mono.samples.toSeq)
  }

  test("stereo round trip preserves interleaving exactly") {
    val back = AudioCodec.decodeWav(AudioCodec.encodeWav(stereo))
    assert(back.channels == 2 && back.sampleRate == 44100)
    assert(back.samples.toSeq == stereo.samples.toSeq)
  }

  test("wire format: canonical header fields and little-endian samples") {
    val b = AudioCodec.encodeWav(Clip(1, 8000, Array[Short](0x1234, -2)))
    assert(new String(b, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(b, 8, 4, "US-ASCII") == "WAVE")
    assert(new String(b, 36, 4, "US-ASCII") == "data")
    // 0x1234 little-endian: 0x34 then 0x12; -2 = 0xFFFE: 0xFE 0xFF
    assert((b(44) & 0xff) == 0x34 && (b(45) & 0xff) == 0x12)
    assert((b(46) & 0xff) == 0xfe && (b(47) & 0xff) == 0xff)
  }

  test("chunk walk: a LIST chunk between fmt and data is skipped") {
    val base = AudioCodec.encodeWav(mono)
    // splice an 11-byte (odd — exercises word-alignment padding) LIST
    // chunk between fmt (ends at 36) and data
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](11, 0, 0, 0) ++ Array.fill[Byte](11)(42) ++
      Array[Byte](0) // pad to even
    val spliced = base.take(36) ++ listChunk ++ base.drop(36)
    // fix the RIFF size field
    val total = spliced.length - 8
    spliced(4) = total.toByte; spliced(5) = (total >> 8).toByte
    spliced(6) = (total >> 16).toByte; spliced(7) = (total >> 24).toByte
    val back = AudioCodec.decodeWav(spliced)
    assert(back.samples.toSeq == mono.samples.toSeq,
      "a naive offset-44 reader would mis-slice here")
  }

  test("dirty payloads quarantine as None; hostile sizes fail cleanly") {
    val good = AudioCodec.encodeWav(mono)
    assert(AudioCodec.decodeOpt(null).isEmpty)
    assert(AudioCodec.decodeOpt(Array[Byte]('X', 1, 2)).isEmpty)
    // truncation at half always cuts the data chunk
    assert(AudioCodec.decodeOpt(
      java.util.Arrays.copyOf(good, good.length / 2)).isEmpty)
    // corrupted magic
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(AudioCodec.decodeOpt(bad).isEmpty)
    // hostile chunk size: declared data length far beyond the buffer
    val lying = good.clone()
    lying(40) = -1; lying(41) = -1; lying(42) = -1; lying(43) = 0x7f
    assert(AudioCodec.decodeOpt(lying).isEmpty)
    // unsupported variant: 8-bit samples rejected, not mis-decoded
    val eightBit = good.clone(); eightBit(34) = 8
    assert(AudioCodec.decodeOpt(eightBit).isEmpty)
    // valid payload still decodes after all that
    assert(AudioCodec.decodeOpt(good).map(_.samples.toSeq)
      .contains(mono.samples.toSeq))
  }
}
