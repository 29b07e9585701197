package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.TxLog

/** The version claim across PROCESS boundaries: the in-JVM 8-thread
  * race test (TxLogSpec) exercises thread interleaving, but the real
  * multi-writer deployment is two drivers on one table — this spec
  * forks two actual JVMs (graft.tools.RaceWriter), releases them on a
  * shared barrier file, and asserts every commit landed exactly once
  * at a distinct version. `Files.createLink` EEXIST is the
  * POSIX-atomic cross-process claim; a rename-based claim would
  * silently drop one writer's commit under exactly this test. */
class TxLogXProcSpec extends AnyFunSuite {

  test("two separate JVMs racing one table: all commits land exactly once") {
    val t = Files.createTempDirectory("txlog_xproc").toString
    val barrier = Paths.get(t, ".go")
    val perWriter = 120
    val classes = Paths.get("target/scala-2.13/classes")
      .toAbsolutePath.toString
    val cp = s"$classes:/opt/spark/jars/*"
    def spawn(id: String): Process =
      new ProcessBuilder("java", "-cp", cp, "graft.tools.RaceWriter",
        t, id, perWriter.toString, barrier.toString)
        .redirectErrorStream(true).start()
    val a = spawn("a")
    val b = spawn("b")
    Thread.sleep(500) // both reach the barrier poll before the gun
    Files.write(barrier, Array.empty[Byte])
    def drain(p: Process): String =
      new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(a.waitFor(180, TimeUnit.SECONDS), "writer a timed out")
    assert(b.waitFor(180, TimeUnit.SECONDS), "writer b timed out")
    val (outA, outB) = (drain(a), drain(b))
    assert(a.exitValue() == 0, s"writer a failed:\n$outA")
    assert(b.exitValue() == 0, s"writer b failed:\n$outB")
    val commits = TxLog.commits(t)
    // exactly 2N commits at consecutive distinct versions — no lost
    // update (a silently-replaced version file would shrink the count)
    assert(commits.size == 2 * perWriter)
    assert(commits.map(_.version) == (0L until 2L * perWriter))
    val adds = commits.flatMap(_.adds)
    assert(adds.size == 2 * perWriter && adds.toSet.size == adds.size,
      "every commit's add survives exactly once")
    assert(adds.count(_.startsWith("a-")) == perWriter)
    assert(adds.count(_.startsWith("b-")) == perWriter)
  }
}
