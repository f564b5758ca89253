package graft

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.apache.hadoop.fs.{Path => HPath}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{ConcurrentEpochCommitException, EpochClaim}

/** The CROSS-PROCESS half of the epoch-claim protocol, with a REAL
  * second JVM (`graft.tools.ClaimHolder`) — the in-process specs
  * simulate a foreign owner with a thread; this one proves the
  * on-disk protocol (O_EXCL claim create, heartbeat refresh,
  * stale-break) across process boundaries, including the `kill -9`
  * crash recovery a thread cannot model.
  */
class ClaimProcessSpec extends AnyFunSuite {

  /** Classpath for the child JVM: the graft classes dir + every jar
    * next to Spark's (scala-library, hadoop — the same unmanaged set
    * build.sbt compiles against), derived from loaded classes so the
    * spec works wherever the build lives.
    */
  private def childClasspath: String = {
    def locOf(c: Class[_]): java.nio.file.Path =
      java.nio.file.Paths.get(
        c.getProtectionDomain.getCodeSource.getLocation.toURI)
    val graftClasses = locOf(graft.streaming.SinkFs.getClass)
    val sparkJarsDir = locOf(classOf[org.apache.spark.sql.SparkSession])
      .getParent
    s"$graftClasses${java.io.File.pathSeparator}$sparkJarsDir/*"
  }

  private def spawnHolder(claim: java.nio.file.Path, holdMs: Long,
                          staleMs: Long): Process = {
    val javaBin = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "java").toString
    val p = new ProcessBuilder(
      javaBin, s"-Dgraft.sink.claim.stale.ms=$staleMs", "-cp", childClasspath,
      "graft.tools.ClaimHolder", claim.toString, holdMs.toString)
      .redirectErrorStream(true)
      .start()
    // wait for the child to report the claim held (heartbeat running)
    val r = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val deadline = System.currentTimeMillis() + 60000
    var line = r.readLine()
    while (line != null && line != "HELD" &&
        System.currentTimeMillis() < deadline)
      line = r.readLine()
    assert(line == "HELD",
      s"child JVM failed to acquire the claim (last output: $line)")
    p
  }

  test("a second JVM's fresh claim blocks; its heartbeat keeps it " +
      "blocking past the stale window; kill -9 makes it breakable " +
      "after the window (the crashed-writer recovery, cross-process)") {
    val dir = Files.createTempDirectory("xproc-claim")
    val claimNio = dir.resolve("epoch0.claim")
    val claim = new HPath(claimNio.toString)
    val staleMs = 2000L
    val old = sys.props.get("graft.sink.claim.stale.ms")
    sys.props("graft.sink.claim.stale.ms") = staleMs.toString
    val holder = spawnHolder(claimNio, holdMs = 120000, staleMs = staleMs)
    try {
      // (1) fresh foreign claim: loud conflict
      val e1 = intercept[ConcurrentEpochCommitException] {
        EpochClaim.acquire(claim, "spec", 0L)
      }
      assert(e1.getMessage.contains("cross-process"), e1.getMessage)
      // (2) the child's HEARTBEAT keeps the claim fresh: well past the
      // stale window it must STILL conflict (pre-heartbeat this broke)
      Thread.sleep(3 * staleMs)
      val e2 = intercept[ConcurrentEpochCommitException] {
        EpochClaim.acquire(claim, "spec", 0L)
      }
      assert(e2.getMessage.contains("cross-process"), e2.getMessage)
      // (3) kill -9: beats stop, the claim ages out, recovery breaks it
      holder.destroyForcibly()
      assert(holder.waitFor(30, TimeUnit.SECONDS), "child did not die")
      Thread.sleep(staleMs + 1000)
      EpochClaim.acquire(claim, "spec", 0L) // stale break succeeds
      EpochClaim.release(claim)
    } finally {
      holder.destroyForcibly(): Unit
      old match {
        case Some(v) => sys.props("graft.sink.claim.stale.ms") = v
        case None => sys.props -= "graft.sink.claim.stale.ms"
      }
    }
  }

  test("two JVMs racing createNew on the same claim path: exactly one " +
      "wins (O_EXCL across processes, the r14 check-then-create fix)") {
    val dir = Files.createTempDirectory("xproc-excl")
    val claim = dir.resolve("epoch1.claim")
    // both children try to hold for 5s; exactly one should print HELD,
    // the loser exits nonzero with a conflict
    val javaBin = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "java").toString
    def spawn(): Process = new ProcessBuilder(
      javaBin, "-Dgraft.sink.claim.stale.ms=60000", "-cp", childClasspath,
      "graft.tools.ClaimHolder", claim.toString, "5000")
      .redirectErrorStream(true).start()
    val a = spawn(); val b = spawn()
    assert(a.waitFor(60, TimeUnit.SECONDS) && b.waitFor(60, TimeUnit.SECONDS))
    val wins = Seq(a, b).count(_.exitValue() == 0)
    assert(wins == 1,
      s"exactly one JVM must win the claim (exits: ${a.exitValue()}, " +
        s"${b.exitValue()})")
  }
}
