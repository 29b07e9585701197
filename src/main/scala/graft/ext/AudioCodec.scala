package graft.ext

/** Real, jar-free audio codec for the multimodal tier: PCM WAV
  * (RIFF/WAVE, fmt chunk audio-format 1, 16-bit signed little-endian
  * samples, mono or interleaved stereo). Like `ImageCodec`, this is a
  * genuine container — chunk walking, little-endian arithmetic,
  * block-align/byte-rate consistency and interleaving all have to be
  * RIGHT — while every byte stays deterministic, so the DuckDB gate
  * re-derives decoded sample statistics from first principles and
  * hash-compares them (reference behavior: the reference pipeline
  * stores posts as opaque media references — REF README:18 "image or
  * video" — so the audio tier is an extension, designed
  * oracle-checkable).
  *
  * Scale note: payloads decode inside a narrow typed map — one decoded
  * clip in memory per task at a time, no shuffle; a 100 TB audio
  * corpus streams through on scan parallelism. */
object AudioCodec {

  /** Decoded clip: interleaved samples (frame-major, channel-minor —
    * exactly the wire order). */
  final case class Clip(channels: Int, sampleRate: Int,
    samples: Array[Short]) {
    require(channels > 0 && samples.length % channels == 0,
      s"${samples.length} samples do not tile $channels channels")
  }

  private def le32(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le16(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >> 8).toByte)
  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def rdLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode as canonical 44-byte-header PCM WAV. */
  def encodeWav(clip: Clip): Array[Byte] = {
    val dataBytes = 2 * clip.samples.length
    val blockAlign = 2 * clip.channels
    val byteRate = clip.sampleRate * blockAlign
    val out = new Array[Byte](44 + dataBytes)
    def put(off: Int, bs: Array[Byte]): Unit =
      System.arraycopy(bs, 0, out, off, bs.length)
    put(0, "RIFF".getBytes("US-ASCII"))
    put(4, le32(36 + dataBytes))
    put(8, "WAVE".getBytes("US-ASCII"))
    put(12, "fmt ".getBytes("US-ASCII"))
    put(16, le32(16))                  // fmt chunk size
    put(20, le16(1))                   // PCM
    put(22, le16(clip.channels))
    put(24, le32(clip.sampleRate))
    put(28, le32(byteRate))
    put(32, le16(blockAlign))
    put(34, le16(16))                  // bits per sample
    put(36, "data".getBytes("US-ASCII"))
    put(40, le32(dataBytes))
    var i = 0
    while (i < clip.samples.length) {
      val s = clip.samples(i)
      out(44 + 2 * i) = s.toByte
      out(44 + 2 * i + 1) = (s >> 8).toByte
      i += 1
    }
    out
  }

  /** Decode PCM WAV: walks the RIFF chunk list (fmt may be followed by
    * LIST/fact or other chunks before data — skipping by declared
    * size, the part a naive offset-44 reader gets wrong), validates
    * the PCM/16-bit variant, and checks every size in Long arithmetic
    * so hostile headers fail loudly instead of mis-slicing. */
  def decodeWav(bytes: Array[Byte]): Clip = {
    require(bytes.length >= 44 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "not a RIFF/WAVE payload")
    var pos = 12
    var channels = -1; var sampleRate = -1; var bits = -1; var fmtCode = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (dataOff < 0 || channels < 0)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = rdLe32(bytes, pos + 4)
      require(size >= 0 && pos + 8L + size <= bytes.length.toLong,
        s"truncated RIFF chunk '$id'")
      if (id == "fmt ") {
        require(size >= 16, s"fmt chunk too small: $size")
        fmtCode = rdLe16(bytes, pos + 8)
        channels = rdLe16(bytes, pos + 10)
        sampleRate = rdLe32(bytes, pos + 12)
        bits = rdLe16(bytes, pos + 22)
      } else if (id == "data") {
        dataOff = pos + 8; dataLen = size
      }
      // chunks are word-aligned: odd sizes carry one pad byte
      pos += 8 + size + (size & 1)
    }
    require(fmtCode == 1 && bits == 16,
      s"unsupported WAV variant: format=$fmtCode bits=$bits (PCM 16-bit only)")
    require(channels > 0 && sampleRate > 0,
      s"invalid WAV format: channels=$channels rate=$sampleRate")
    require(dataOff >= 0, "WAV has no data chunk")
    require(dataLen % (2 * channels) == 0,
      s"data length $dataLen does not tile ${channels}ch 16-bit frames")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = ((bytes(dataOff + 2 * i) & 0xff) |
        (bytes(dataOff + 2 * i + 1) << 8)).toShort
      i += 1
    }
    Clip(channels, sampleRate, samples)
  }

  /** Permissive decode for dirty corpora — same contract as
    * `ImageCodec.decodeOpt`: decode-shaped failures (bad magic,
    * truncated chunks, unsupported variants, hostile sizes) quarantine
    * as None; anything else propagates. */
  def decodeOpt(bytes: Array[Byte]): Option[Clip] =
    if (bytes == null) None
    else try Some(decodeWav(bytes)) catch {
      case _: IllegalArgumentException => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
}
