package graft.tools

import org.apache.hadoop.fs.{Path => HPath}

import graft.streaming.EpochClaim

/** Second-JVM test harness for the CROSS-PROCESS epoch-claim protocol:
  * acquires the claim at `args(0)` (with the live heartbeat
  * `EpochClaim.acquire` always starts), prints `HELD`, and holds it
  * until `args(1)` ms elapse or the process is killed. A clean
  * shutdown releases and prints `RELEASED`; a `kill -9` leaves the
  * claim file behind with its heartbeat stopped — exactly the
  * crashed-writer state the stale-break recovery exists for.
  *
  * Driven by `ClaimProcessSpec`, which asserts from ANOTHER process
  * that (1) a fresh foreign claim blocks, (2) the heartbeat keeps it
  * blocking PAST the stale window while this process lives, and (3) a
  * kill -9 makes it breakable after the window — the multi-JVM story
  * the in-process specs could only simulate. Reference analog: the
  * reference serializes cross-process writers through Kafka Connect
  * task ownership + DB transactions (`JdbcChangeEventSink.java`);
  * lakehouse analog: Delta/Iceberg commit locks across drivers.
  *
  * Tune the window with `-Dgraft.sink.claim.stale.ms=...` (read live
  * by both acquire and the heartbeat period).
  */
object ClaimHolder {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ClaimHolder <claimPath> <holdMs>")
    val claim = new HPath(args(0))
    val holdMs = args(1).toLong
    EpochClaim.acquire(claim, "ClaimHolder", epoch = 0L)
    // the spec waits for this line before racing the claim
    println("HELD")
    Console.out.flush()
    try Thread.sleep(holdMs)
    finally {
      EpochClaim.release(claim)
      println("RELEASED")
      Console.out.flush()
    }
  }
}
