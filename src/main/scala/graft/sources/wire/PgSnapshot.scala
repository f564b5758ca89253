package graft.sources.wire

/** Postgres transaction snapshot — the `xmin:xmax:xip1,xip2,…` value of
  * `pg_current_snapshot()` (PostgreSQL ≥ 13) that the read-only
  * incremental snapshot uses as its low/high watermarks (reference
  * `debezium-connector-postgres/.../PgSnapshot.java` and
  * `PostgresReadOnlyIncrementalSnapshotContext.java`):
  *  - `xMin` — every txid below it is committed or aborted (visible);
  *  - `xMax` — the next txid to be assigned; txids ≥ it had not started;
  *  - `xip`  — txids in [xMin, xMax) still in progress at capture.
  *
  * The dedup bracket for a chunk captured between snapshots `lo` and
  * `hi` follows `PostgresReadOnlyIncrementalSnapshotContext
  * .updateWindowState`: the window opens at the first streamed event
  * with `txid ≥ lo.xMin` and closes at the first with
  * `txid > max(hi.xMax, lo.xMax)` — so an event dedups the chunk's rows
  * iff its txid lies in `[lo.xMin, max(hi.xMax, lo.xMax)]` (inclusive:
  * the close fires on the first event PAST the bracket).
  */
final case class PgSnapshot(xMin: Long, xMax: Long, xip: Set[Long]) {

  /** Was `txId` committed-and-visible at capture time? Standard PG
    * snapshot visibility: below `xMin` always; in `[xMin, xMax)` unless
    * still in progress; at/after `xMax` never. (The reference's
    * `isTransactionVisible` uses the `xMin` bound alone for its
    * pre-window fast path; the full rule is needed when `xip` matters.)
    */
  def visible(txId: Long): Boolean =
    txId < xMin || (txId < xMax && !xip.contains(txId))

  /** Canonical text form (the `pg_current_snapshot()` rendering). */
  def text: String = s"$xMin:$xMax:${xip.toSeq.sorted.mkString(",")}"
}

object PgSnapshot {

  private val Pattern = """(\d+):(\d+):((\d+,?)*)""".r

  /** Parse the `pg_current_snapshot()` text form (reference
    * `PgSnapshot.valueOf` — same grammar, empty xip list allowed).
    */
  def parse(s: String): PgSnapshot = s.trim match {
    case Pattern(xmin, xmax, xips, _) =>
      val xip =
        if (xips == null || xips.isEmpty) Set.empty[Long]
        else xips.split(",").iterator.filter(_.nonEmpty).map(_.toLong).toSet
      PgSnapshot(xmin.toLong, xmax.toLong, xip)
    case other =>
      throw new IllegalArgumentException(
        s"unparseable pg_current_snapshot value: $other")
  }

  /** The inclusive txid dedup bracket for a chunk captured between `lo`
    * and `hi` (see class doc). A chunk with `lo == hi` — no transaction
    * activity during the SELECT — still yields a valid (single-point)
    * bracket; the reference inserts such a chunk immediately and dedups
    * nothing from it.
    */
  def window(lo: PgSnapshot, hi: PgSnapshot): (Long, Long) =
    (lo.xMin, math.max(hi.xMax, lo.xMax))
}
