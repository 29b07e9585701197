package graft.tools

import java.nio.file.{Files, Paths}

/** Cross-process race harness for the TxLog version claim: a separate
  * JVM that waits on a barrier file, then lands `n` append commits as
  * fast as it can. Two of these racing against one table is the real
  * multi-writer deployment the in-JVM 8-thread race test cannot
  * exercise — `Files.createLink`'s EEXIST claim is POSIX-atomic
  * ACROSS processes, and TxLogXProcSpec asserts every commit from
  * both writers lands exactly once at a distinct version (the
  * rename-based claim this replaced would silently drop the loser's
  * commit). Commits reference synthetic file names: the claim path
  * never reads data bytes, so none are needed.
  *
  * args: <tableDir> <writerId> <nCommits> <barrierFile> */
object RaceWriter {
  def main(args: Array[String]): Unit = {
    val Array(table, id, nStr, barrier) = args
    val n = nStr.toInt
    val b = Paths.get(barrier)
    val deadline = System.currentTimeMillis() + 60000
    while (!Files.exists(b)) {
      if (System.currentTimeMillis() > deadline)
        sys.error(s"barrier $barrier never appeared")
      Thread.sleep(2)
    }
    var i = 0
    while (i < n) {
      graft.ingest.TxLog.writeCommit(table, "append", -1L,
        Seq(s"$id-$i.parquet"), "id BIGINT")
      i += 1
    }
    println(s"[racewriter] $id landed $n commits")
  }
}
