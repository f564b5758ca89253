package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Path, StandardOpenOption}
import scala.util.control.NonFatal

/** An epoch commit lost the optimistic-concurrency race: another writer
  * holds the claim on the same epoch, or committed a different epoch
  * between this writer's state read and its CURRENT swap. The losing
  * statement was NOT applied — nothing was silently dropped; callers
  * either surface this loudly or rebase on the new tip and retry
  * ([[graft.sinks.v2.GraftSinkCatalog.commitWithRetry]]).
  *
  * Reference analog: the JDBC sink serializes flushes inside one Connect
  * task + DB transaction (`JdbcChangeEventSink.java:89-186`); lakehouse
  * analog: Delta/Iceberg optimistic-concurrency commit, where the loser
  * of the commit-file race re-reads the table state and retries.
  */
class ConcurrentEpochCommitException(msg: String)
    extends java.util.ConcurrentModificationException(msg)

/** Exclusive per-epoch commit claims for the MERGE sinks.
  *
  * A writer must hold the claim on `epoch` before writing ANY of the
  * epoch's artifacts (`v<epoch>/`, `d<epoch>/`, `m<epoch>.manifest`):
  * two concurrent default-epoch writers both resolve committedEpoch+1,
  * and without the claim both would scribble into the SAME version
  * directory and the last CURRENT swap would silently hide the other's
  * epoch — the lost-epoch-under-concurrent-commit defect class.
  *
  * Two layers:
  *   - an in-process registry (putIfAbsent), authoritative for the
  *     user-reachable race — a streaming foreachBatch merge racing an
  *     ad-hoc SQL UPDATE in the same session;
  *   - an on-disk claim file created atomically (CREATE_NEW), which
  *     extends the exclusion across processes. A claim file with no
  *     in-process owner is another process's in-flight commit OR a
  *     crashed writer's leftover; it is broken only once it is older
  *     than `graft.sink.claim.stale.ms` (default 60 s — longer than any
  *     local epoch merge, short enough that crash recovery is not
  *     wedged). Cross-process writers whose single epoch commit exceeds
  *     the stale window must raise the property.
  *
  * The claim is released in the committing code's `finally` (failure)
  * and immediately after a successful swap — so a claim file on disk
  * marks exactly an in-flight or crashed commit, never a completed one.
  */
private[graft] object EpochClaim {
  /** claim-file path -> owner token, for claims held by THIS process. */
  private val live = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def staleMs: Long = sys.props.get("graft.sink.claim.stale.ms")
    .flatMap(_.toLongOption).getOrElse(60000L)

  def acquire(claim: Path, sinkDesc: String, epoch: Long): Unit = {
    val key = claim.toAbsolutePath.toString
    val token = java.util.UUID.randomUUID().toString
    def conflict(holder: String): Nothing =
      throw new ConcurrentEpochCommitException(
        s"$sinkDesc: epoch $epoch is being committed by a concurrent " +
          s"writer ($holder claim at $claim). Two writers resolved the " +
          "same epoch — this statement was NOT applied; it can be " +
          "retried once the rival's commit lands (the catalog DML paths " +
          "rebase and retry automatically).")
    if (live.putIfAbsent(key, token) != null) conflict("in-process")
    var ok = false
    try {
      val payload = s"$token ${System.currentTimeMillis()}".getBytes(UTF_8)
      try {
        Files.write(claim, payload, StandardOpenOption.CREATE_NEW)
        ok = true
      } catch {
        case _: FileAlreadyExistsException =>
          // no in-process owner -> another process's claim or a crashed
          // writer's leftover; break only past the stale window
          val age =
            try System.currentTimeMillis() -
              Files.readString(claim).trim.split("\\s+").last.toLong
            catch { case NonFatal(_) => Long.MaxValue } // unreadable = junk
          if (age < staleMs) conflict("cross-process")
          Console.err.println(
            s"[graft] $sinkDesc: breaking abandoned epoch-$epoch claim " +
              s"(age ${age / 1000}s > ${staleMs / 1000}s; a writer crashed " +
              "mid-commit, or a cross-process commit exceeded " +
              "graft.sink.claim.stale.ms)")
          Files.deleteIfExists(claim)
          try {
            Files.write(claim, payload, StandardOpenOption.CREATE_NEW)
            ok = true
          } catch { // lost the break race to another claimer
            case _: FileAlreadyExistsException => conflict("cross-process")
          }
      }
    } finally if (!ok) live.remove(key, token)
  }

  def release(claim: Path): Unit = {
    try Files.deleteIfExists(claim)
    catch { case NonFatal(_) => () }
    live.remove(claim.toAbsolutePath.toString): Unit
  }
}
