package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Incremental snapshot (SURVEY S3/S4): chunked keyset-paginated backfill
  * that can interleave with the live change stream, deduplicated by
  * position precedence (reference
  * `pipeline/source/snapshot/incremental/AbstractIncrementalSnapshotChangeEventSource.java:88,198-204`
  * and the chunk query builder `AbstractChunkQueryBuilder.java:49,107`).
  */
object IncrementalSnapshot {

  /** Exact global ordinal without a single-partition sort: range-partition
    * by the key, sort within partitions, then zipWithIndex (which only
    * drives per-partition counts + prefix sums through the driver — O(P)
    * driver state, never the data). This is the scalable form of
    * `row_number() OVER (ORDER BY k)`.
    *
    * Why the RDD hop, not `monotonically_increasing_id` + a prefix-offset
    * join (which would stay in Tungsten): that shape needs TWO jobs over
    * the range-partitioned plan (one to count partitions, one to index),
    * and `repartitionByRange` draws its sampling seed from the RDD id —
    * each job can pick slightly different range boundaries, so the
    * offsets of job 1 mis-assign the rows of job 2 (observed: chunks
    * snapped to partition edges). `zipWithIndex` runs its count pass and
    * its map pass on the SAME RDD instance, so the boundaries are pinned
    * by construction; the InternalRow→Row conversion it pays is the
    * price of that consistency without caching the whole snapshot.
    */
  def withGlobalIndex(df: DataFrame, order: Seq[Column], partitions: Int = 32,
                      idxCol: String = "_idx"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(partitions, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(idxCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Chunk assignment over the (composite-safe) surrogate key order: chunk
    * i covers rows [i*chunkSize, (i+1)*chunkSize) of the key order — the
    * keyset-pagination windows the reference brackets with low/high
    * watermarks.
    */
  def chunked(df: DataFrame, order: Seq[Column], chunkSize: Int): DataFrame =
    withGlobalIndex(df, order)
      .withColumn("chunk", (col("_idx") / chunkSize).cast("long"))
      .drop("_idx")

  /** Per-chunk statistics (the chunk boundary probe the reference issues as
    * `SELECT min/max ... LIMIT chunkSize`).
    */
  def chunkStats(df: DataFrame, key: Column, chunkSize: Int): DataFrame =
    chunked(df, Seq(key), chunkSize)
      .groupBy(col("chunk"))
      .agg(count(lit(1)).as("n"), min(key).as("min_k"), max(key).as("max_k"))

  /** The S3 dedup invariant: chunked snapshot rows (op=r, snapshot
    * position) merged with concurrent stream events — the stream event wins
    * whenever its position is newer. Both inputs are envelope frames;
    * result is the materialized table state.
    */
  def mergeWithStream(chunkRows: DataFrame, stream: DataFrame): DataFrame =
    Materialize.latestState(chunkRows.unionAll(stream))

  /** S3 watermark windows from OBSERVED signal-table events — the DBLog
    * form the reference uses when writes are allowed: the connector
    * WRITES `snapshot-window-open` / `snapshot-window-close` markers
    * into the signal collection around each chunk SELECT and then
    * OBSERVES them back in its own change log; the pair's observed
    * positions bracket the chunk's dedup window (reference
    * `signal/actions/snapshotting/{Open,Close}IncrementalSnapshotWindow.java`,
    * consumed in
    * `AbstractIncrementalSnapshotChangeEventSource.processMessage`).
    *
    * `signals`: the signal-collection change events — `(pos, id, type)`
    * rows, where `id` correlates open to close (the reference's window
    * uuid). Returns one row per COMPLETED window:
    * `(signal_id, lo_pos, hi_pos)`. A window whose close has not been
    * observed yet is still pending — it dedups nothing, so it is
    * dropped here (the reference buffers the chunk until the close
    * arrives). One tiny aggregation: cardinality = windows, not events.
    */
  def watermarkWindows(signals: DataFrame): DataFrame =
    signals
      .filter(col("type").isin("snapshot-window-open",
        "snapshot-window-close"))
      .groupBy(col("id").as("signal_id"))
      .agg(
        min(when(col("type") === "snapshot-window-open", col("pos")))
          .as("lo_pos"),
        min(when(col("type") === "snapshot-window-close", col("pos")))
          .as("hi_pos"))
      .filter(col("lo_pos").isNotNull && col("hi_pos").isNotNull)

  /** S5: READ-ONLY incremental snapshot — the DBLog watermark-window
    * algorithm (reference
    * `mysql/.../MySqlReadOnlyIncrementalSnapshotChangeEventSource.java`:
    * GTID-set watermarks captured around each chunk SELECT instead of
    * signal-table writes). Chunk rows cannot carry comparable log
    * positions, so precedence is decided by the WINDOW: a chunk row whose
    * key saw ANY stream event inside its chunk's [lo, hi) bracket is
    * discarded (the stream already reflects that row); survivors union
    * with the stream and materialize.
    *
    * `windows`: one row per chunk — (chunk, lo_pos, hi_pos). Shuffles:
    * one keyed anti-join + the materialize aggregation; the windows side
    * is broadcast-size (one row per chunk).
    */
  def readOnlyChunkMerge(chunkRows: DataFrame, windows: DataFrame,
                         stream: DataFrame): DataFrame = {
    val wc = chunkRows.join(broadcast(windows), "chunk")
    val streamKeys = stream.select(col("key").as("_sk"),
      col("source.pos").as("_spos"))
    val survivors = wc.join(streamKeys,
      wc("key") === col("_sk") &&
        col("_spos") >= col("lo_pos") && col("_spos") < col("hi_pos"),
      "left_anti")
      .drop("chunk", "lo_pos", "hi_pos")
    Materialize.latestState(survivors.unionByName(stream))
  }

  /** S5 with the reference's ACTUAL watermark representation: the low and
    * high watermarks are executed-GTID-SET snapshots captured around the
    * chunk SELECT (`SHOW MASTER STATUS`, ref
    * `MySqlReadOnlyIncrementalSnapshotContext.updateWindowState`:53-71 —
    * the window opens when the stream's current gtid leaves the low set
    * and closes when it leaves the high set), so an event is inside
    * chunk c's dedup window iff its gtid ∈ hi_c \ lo_c.
    *
    * `windows` is driver-side — one (chunk, lo, hi) per chunk, the same
    * bounded cardinality the pos-variant broadcasts. The set difference
    * runs ONCE on the driver (`GtidSet.subtract`), explodes to
    * (chunk, sid, gno-interval) rows, and broadcasts; membership is then
    * a pure Column predicate (sid equality + gno range) over the
    * stream's `gtid` column — no UDF, one broadcast join + the keyed
    * anti-join, identical plan shape to `readOnlyChunkMerge`.
    */
  def readOnlyChunkMergeGtid(chunkRows: DataFrame,
                             windows: Seq[(Long, graft.sources.wire.GtidSet,
                               graft.sources.wire.GtidSet)],
                             stream: DataFrame): DataFrame = {
    val spark = chunkRows.sparkSession
    import spark.implicits._
    val ivs = windows.flatMap { case (c, lo, hi) =>
      hi.subtract(lo).sets.toSeq.flatMap { case (sid, ranges) =>
        ranges.map { case (a, b) => (c, sid, a, b) }
      }
    }
    val ivDf = ivs.toDF("_wc", "_sid", "_glo", "_ghi")
    val inWindow = stream.select(col("key").as("_sk"),
      substring_index(col("gtid"), ":", 1).as("_esid"),
      substring_index(col("gtid"), ":", -1).cast("long").as("_gno"))
      .join(broadcast(ivDf),
        col("_esid") === col("_sid") &&
          col("_gno") >= col("_glo") && col("_gno") <= col("_ghi"))
      .select(col("_sk"), col("_wc"))
    val survivors = chunkRows.join(inWindow,
      chunkRows("key") === col("_sk") && chunkRows("chunk") === col("_wc"),
      "left_anti")
      .drop("chunk")
    Materialize.latestState(survivors.unionByName(stream.drop("gtid")))
  }

  /** S5, the POSTGRES read-only form (reference
    * `PostgresReadOnlyIncrementalSnapshotChangeEventSource.java` +
    * `PgSnapshot.java`): the low/high watermarks around each chunk
    * SELECT are `pg_current_snapshot()` captures — xmin/xmax/xip-list
    * transaction snapshots, not log positions — and a streamed WAL
    * event dedups a chunk row iff its TRANSACTION id lies in the
    * chunk's bracket `[lo.xMin, max(hi.xMax, lo.xMax)]`
    * ([[graft.sources.wire.PgSnapshot.window]], mirroring the
    * reference's `updateWindowState` open/close rule; on an idle WAL
    * the reference closes windows from heartbeat txids — see
    * [[Heartbeat.actionBeats]]).
    *
    * `windows` is driver-side — one `(chunk, lo, hi)` per chunk, the
    * same bounded cardinality every watermark variant broadcasts. The
    * brackets resolve ONCE on the driver to `(chunk, tx_lo, tx_hi)`
    * rows; the plan is then identical to [[readOnlyChunkMerge]]: one
    * broadcast hash join on `chunk` attaches each chunk row's bracket,
    * and one keyed anti-join (txid range as the join's secondary
    * predicate) discards chunk rows whose key saw an in-window stream
    * event. `stream` must carry a `txid` column (the WAL event's
    * transaction id).
    */
  def readOnlyChunkMergePg(chunkRows: DataFrame,
                           windows: Seq[(Long, graft.sources.wire.PgSnapshot,
                             graft.sources.wire.PgSnapshot)],
                           stream: DataFrame): DataFrame = {
    val spark = chunkRows.sparkSession
    import spark.implicits._
    val win = windows.map { case (c, lo, hi) =>
      val (txLo, txHi) = graft.sources.wire.PgSnapshot.window(lo, hi)
      (c, txLo, txHi)
    }.toDF("chunk", "tx_lo", "tx_hi")
    val wc = chunkRows.join(broadcast(win), "chunk")
    val streamTx = stream.select(col("key").as("_sk"),
      col("txid").as("_stx"))
    val survivors = wc.join(streamTx,
      wc("key") === col("_sk") &&
        col("_stx") >= col("tx_lo") && col("_stx") <= col("tx_hi"),
      "left_anti")
      .drop("chunk", "tx_lo", "tx_hi")
    Materialize.latestState(survivors.unionByName(stream.drop("txid")))
  }
}
