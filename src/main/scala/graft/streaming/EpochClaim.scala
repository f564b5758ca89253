package graft.streaming

import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileAlreadyExistsException, Path => HPath}

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
  *     than `graft.sink.claim.stale.ms` (default 60 s).
  *
  * A LIVE owner's claim never goes stale: a daemon HEARTBEAT refreshes
  * the claim file's timestamp every staleMs/3 while the claim is held,
  * so a commit that legitimately outlasts the stale window (slow remote
  * storage, a large epoch) cannot have its claim broken by an eager
  * rival — only a genuinely crashed writer's claim ages out. Belt and
  * braces for the pathological remainder (a GC pause longer than the
  * window): [[verifyHeld]] re-reads the claim at the commit swap and
  * fails the OWNER loudly when its token was replaced — the breaker may
  * have scribbled the epoch's artifacts, so exactly one of the two
  * (the breaker) commits, never both and never silently.
  *
  * The claim is released in the committing code's `finally` (failure)
  * and immediately after a successful swap — so a claim file on disk
  * marks exactly an in-flight or crashed commit, never a completed one.
  */
private[graft] object EpochClaim {
  /** claim-file path -> owner token, for claims held by THIS process. */
  private val live = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** claim-file path -> the heartbeat task refreshing it. */
  private val heartbeats =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.ScheduledFuture[_]]()

  /** Per-claim monitor serializing beat I/O with [[release]]: without
    * it, a cancelled-but-IN-FLIGHT beat can recreate claim/tmp files
    * AFTER release returned — measured as a `Files.walk` cleanup crash
    * (the walk listed the beat's `.hb.crc` tmp, the beat's rename
    * removed it mid-walk). Holding the monitor across release means no
    * beat I/O for that claim can happen once release returns.
    */
  private val beatLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def beatLock(key: String): Object =
    beatLocks.computeIfAbsent(key, _ => new Object)

  private lazy val scheduler = {
    val t = new java.util.concurrent.ScheduledThreadPoolExecutor(1,
      (r: Runnable) => {
        val th = new Thread(r, "graft-claim-heartbeat")
        th.setDaemon(true)
        th
      })
    t.setRemoveOnCancelPolicy(true)
    t
  }

  def staleMs: Long = sys.props.get("graft.sink.claim.stale.ms")
    .flatMap(_.toLongOption).getOrElse(60000L)

  def acquire(claim: HPath, sinkDesc: String, epoch: Long): Unit = {
    val key = SinkFs.qualified(claim).toString
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
      val payload = s"$token ${System.currentTimeMillis()}"
      try {
        SinkFs.createNew(claim, payload)
        ok = true
      } catch {
        case _: FileAlreadyExistsException =>
          // no in-process owner -> another process's claim or a crashed
          // writer's leftover; break only past the stale window. A
          // FAILED READ (mid-refresh rename, transient I/O, owner just
          // released) is NOT evidence of staleness — treat it as live
          // and conflict; only content that READS fine but parses as
          // garbage is junk worth aging out.
          val age =
            try {
              val txt = SinkFs.readString(claim)
              try System.currentTimeMillis() -
                txt.trim.split("\\s+").last.toLong
              catch { case NonFatal(_) => Long.MaxValue } // garbage = junk
            } catch { case NonFatal(_) => -1L } // torn/transient = live
          if (age < staleMs) conflict("cross-process")
          Console.err.println(
            s"[graft] $sinkDesc: breaking abandoned epoch-$epoch claim " +
              s"(age ${age / 1000}s > ${staleMs / 1000}s; a writer crashed " +
              "mid-commit, or a cross-process commit exceeded " +
              "graft.sink.claim.stale.ms)")
          SinkFs.deleteIfExists(claim)
          try {
            SinkFs.createNew(claim, payload)
            ok = true
          } catch { // lost the break race to another claimer
            case _: FileAlreadyExistsException => conflict("cross-process")
          }
      }
    } finally {
      if (!ok) live.remove(key, token)
      else startHeartbeat(key, claim, token)
    }
  }

  /** Refresh the held claim's timestamp every staleMs/3 so a LIVE
    * owner's claim never ages past the stale window. The refresh is a
    * temp-write + atomic rename (checksum-free via [[SinkFs]], so the
    * swap is ONE atomic step — a rival reading mid-refresh sees the
    * old or new content; and should a read still fail transiently,
    * [[acquire]] treats the failure as a LIVE claim, not junk). The
    * task re-checks
    * ownership before each beat; a beat racing `release` can at worst
    * leave a fresh claim file behind, which delays the NEXT claimer of
    * the same epoch by one stale window (an epoch that already
    * committed — replay-guard territory), never blocks a commit.
    */
  private def startHeartbeat(key: String, claim: HPath,
                             token: String): Unit = {
    val period = math.max(50L, staleMs / 3)
    val task: Runnable = () =>
      beatLock(key).synchronized {
        if (token == live.get(key)) {
          try {
            val tmp = new HPath(claim.getParent, claim.getName + ".hb")
            SinkFs.writeString(tmp, s"$token ${System.currentTimeMillis()}")
            SinkFs.rename(tmp, claim)
          } catch { case NonFatal(_) => () } // missed beat: next retries
        }
      }
    heartbeats.put(key, scheduler.scheduleAtFixedRate(task, period, period,
      java.util.concurrent.TimeUnit.MILLISECONDS)): Unit
  }

  /** Verify at the commit swap that THIS process still owns `claim` —
    * the file exists and carries our token. A replaced token means an
    * eager rival broke the claim mid-commit (its staleMs was shorter
    * than this commit; with the heartbeat that takes a scheduler pause
    * longer than the stale window): the rival may have overwritten the
    * epoch's artifacts, so the OWNER fails loudly and the breaker's
    * commit stands — exactly one writer publishes the epoch.
    */
  def verifyHeld(claim: HPath, sinkDesc: String, epoch: Long): Unit = {
    val key = SinkFs.qualified(claim).toString
    val token = live.get(key)
    // a genuinely missing file is a broken claim; a TRANSIENT read
    // failure must not fail the legitimate owner — bounded retry
    var fileToken: String = null
    var attempt = 0
    var done = false
    while (!done && attempt < 5) {
      attempt += 1
      try { fileToken = SinkFs.readString(claim).trim.split("\\s+").head; done = true }
      catch {
        case _: java.io.FileNotFoundException => done = true
        case NonFatal(_) if attempt < 5 => Thread.sleep(10L * attempt)
        case NonFatal(_) => done = true
      }
    }
    if (token == null || fileToken != token)
      throw new ConcurrentEpochCommitException(
        s"$sinkDesc: the claim on epoch $epoch was broken by another " +
          "writer while this commit was writing (claim file " +
          (if (fileToken == null) "missing" else "re-owned") + s" at " +
          s"$claim) — refusing the pointer swap; the breaker's commit " +
          "stands. If this recurs, raise graft.sink.claim.stale.ms on " +
          "the breaking side or investigate scheduler pauses here.")
  }

  def release(claim: HPath): Unit = {
    val key = SinkFs.qualified(claim).toString
    beatLock(key).synchronized {
      // under the beat monitor: ownership drops, the task cancels, and
      // the files delete with NO beat I/O possible in between or after
      live.remove(key)
      Option(heartbeats.remove(key)).foreach(_.cancel(false))
      SinkFs.deleteIfExists(new HPath(claim.getParent,
        claim.getName + ".hb"))
      SinkFs.deleteIfExists(claim)
    }
    beatLocks.remove(key): Unit
  }
}
