package graft

/** Dev scratchpad (optimization rounds): ad-hoc microbenchmarks run
  * via `runMain graft.Scratch`. Contents change per investigation and
  * are not part of any runtime path. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val img0 = graft.ext.Multimodal.synthImage("hello world this is doc two" * 12)
    for (fmt <- Seq("png", "jpeg", "gif")) {
      val enc = graft.ext.ImageCodec.encodeImageIo(img0, fmt)
      val dec = try {
        val img = graft.ext.ImageCodec.decodeImageIo(enc)
        s"ok ${img.width}x${img.height}"
      } catch { case e: Throwable => s"FAIL ${e.getMessage}" }
      println(s"[scratch] $fmt enc=${enc.length}B dec=$dec")
    }
  }
}
