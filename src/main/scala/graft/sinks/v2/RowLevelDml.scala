package graft.sinks.v2

import java.util.{Optional, UUID}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.CdcSink

/** SQL `UPDATE` / `MERGE INTO` / row-level `DELETE` on the sink-catalog
  * tables, via Spark's row-level-operation contract
  * (`SupportsRowLevelOperations` + `SupportsDelta`).
  *
  * The CDC-native reading of DML: a row-level statement against a
  * change-event table is itself a CHANGE FEED — so instead of rewriting
  * state in place (the copy-on-write `ReplaceData` shape), the delta
  * plan's touched rows commit as ONE NEW EPOCH of envelopes through the
  * sink's existing merge protocol. `VERSION AS OF` the prior epoch
  * still reads the pre-statement state, the `$changes` changefeed
  * streams the statement's effect as ordinary change rows, and the
  * atomic CURRENT swap stays the single commit point.
  *
  * Dataflow (the Iceberg/Delta write shape — no rows via the driver):
  *
  *  1. Spark's analyzer rewrites UPDATE/MERGE/DELETE into a `WriteDelta`
  *     over this operation's scan (the table's own scan, plus the
  *     non-nullable `_row_key` metadata column as the row id — Spark's
  *     row-id contract rejects nullable attrs, and `key` reads
  *     deep-nullable like every envelope column).
  *  2. Executors receive per-row insert/update/delete callbacks and
  *     stage them as ordinary parquet data files next to the table
  *     ([[InternalRowParquet]]); only file paths ride the commit
  *     messages.
  *  3. The driver-side commit reads the staged files back as a
  *     DataFrame, synthesizes the envelope bookkeeping — `op` from the
  *     operation kind, `source.pos` past the table tip so latest-by-pos
  *     precedence applies the statement: tombstones at tip+1, data rows
  *     at tip+2, so a key-swapping UPDATE's same-key tombstone+create
  *     pair resolves deterministically to the create (`before` stays
  *     null: the sinks' reduced state drops it) — and commits
  *     `committedEpoch + 1` via
  *     [[graft.streaming.CdcSink.merge]].
  *
  * A key-changing `UPDATE`/`MERGE ... UPDATE SET key.* = ...` is a
  * re-key: it commits as a tombstone for the old key plus an `op='c'`
  * for the new one, exactly what a CDC feed emits when a primary key
  * changes (reference: the MySQL connector's PK-update handling emits
  * delete+create pairs, `MySqlStreamingChangeEventSource`).
  *
  * User-set values for `key` and `after` (and passthrough columns like
  * `ts_ms`) are honored; `op`, `before` and `source` are ALWAYS
  * synthesized — they are feed bookkeeping, not user data.
  */
private[v2] object RowLevelDml {
  /** The DML row-id metadata column: the envelope key, re-declared
    * non-nullable (Spark's row-id contract). Rows with a null key —
    * possible only from a null-key feed — are not addressable by
    * row-level DML; the scan filters them when this column is read.
    */
  val RowKeyCol = "_row_key"

  val OpDelete = 1
  val OpUpdate = 2
  val OpInsert = 3
  val OpReinsert = 4

  /** A pure DELETE's delta carries no data rows (empty `info.schema()`)
    * and parquet forbids empty groups — the `_row` column exists only
    * when the statement produces data rows.
    */
  def stagedSchema(rowIdSchema: StructType, dataSchema: StructType)
      : StructType = {
    val base = Seq(
      StructField("_op", IntegerType, nullable = false),
      StructField("_id", rowIdSchema, nullable = true))
    StructType(
      if (dataSchema.fields.isEmpty) base
      else base :+ StructField("_row", dataSchema, nullable = true))
  }
}

/** One SQL statement's row-level operation over a sink table. */
private[v2] class SinkRowLevelOperation(
    cmd: RowLevelOperation.Command,
    kind: String, path: String, ident: String,
    props: Map[String, String], envelope: StructType,
    scanTable: SinkReadTable)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String = s"GraftSinkDml($cmd, $ident)"

  // the table's own scan: same latest-envelope frame, same pruning and
  // filter pushdown (an UPDATE's WHERE reaches the parquet leaves),
  // plus the _row_key metadata column when projected
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    scanTable.newScanBuilder(options)

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(RowLevelDml.RowKeyCol))

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new SinkDeltaWrite(kind, path, ident, props, envelope, info)
    }
}

/** Commit message: one staged data file (or none, for an empty task). */
private[v2] case class StagedDmlFile(path: String, rows: Long)
    extends WriterCommitMessage

private[v2] class SinkDeltaWrite(
    kind: String, path: String, ident: String, props: Map[String, String],
    envelope: StructType, info: LogicalWriteInfo)
    extends DeltaWrite {

  override def description(): String = s"GraftSinkDeltaWrite($ident)"

  override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
    private val rowIdSchema: StructType =
      info.rowIdSchema.orElseThrow(() => new IllegalStateException(
        s"delta write on $ident carries no row-id schema"))
    private val dataSchema: StructType = info.schema()
    private val staged = RowLevelDml.stagedSchema(rowIdSchema, dataSchema)
    private val stagingDir =
      s"$path/_dml_staging/${UUID.randomUUID().toString.take(12)}"

    override def createBatchWriterFactory(pinfo: PhysicalWriteInfo)
        : DeltaWriterFactory = {
      val conf = InternalRowParquet.shippableConf(
        SparkSession.active.sessionState.newHadoopConf())
      new SinkDeltaWriterFactory(stagingDir, staged, conf)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val spark = SparkSession.active
      try {
        val files = messages.collect {
          case StagedDmlFile(p, n) if n > 0 => p
        }
        if (files.isEmpty) return // statement touched no rows: no epoch
        // default-epoch writer: on losing the epoch race to a concurrent
        // commit (stream merge, another statement), rebase on the new
        // tip and retry — epochFrame recomputes the tip-dependent merge
        // positions from the staged files, which stay on disk until the
        // final cleanup
        GraftSinkCatalog.commitWithRetry(kind, path, props,
          s"DML on $ident") { (sink, epoch) =>
          val delta = SinkDmlCommit.epochFrame(
            spark.read.schema(staged).parquet(files.toIndexedSeq: _*),
            spark, kind, path, props, envelope)
          sink.merge(delta, epoch)
        }
      } finally cleanup(spark)
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      cleanup(SparkSession.active)

    private def cleanup(spark: SparkSession): Unit = {
      val p = new HPath(stagingDir)
      try { p.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(p, true); () }
      catch { case _: Throwable => () }
    }
  }
}

private[v2] class SinkDeltaWriterFactory(
    stagingDir: String, staged: StructType, conf: Map[String, String])
    extends DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private var w: GroupFileWriter = _
      private val buf = new GenericInternalRow(3)

      private def emit(op: Int, id: InternalRow, row: InternalRow): Unit = {
        if (w == null)
          w = InternalRowParquet.open(
            s"$stagingDir/part-$partitionId-$taskId-" +
              s"${UUID.randomUUID().toString.take(8)}.parquet",
            staged, conf)
        buf.update(0, op)
        buf.update(1, id)
        buf.update(2, row)
        w.write(buf)
      }

      override def delete(meta: InternalRow, id: InternalRow): Unit =
        emit(RowLevelDml.OpDelete, id, null)
      override def update(meta: InternalRow, id: InternalRow,
                          row: InternalRow): Unit =
        emit(RowLevelDml.OpUpdate, id, row)
      override def insert(row: InternalRow): Unit =
        emit(RowLevelDml.OpInsert, null, row)
      override def reinsert(meta: InternalRow, row: InternalRow): Unit =
        emit(RowLevelDml.OpReinsert, null, row)

      override def commit(): WriterCommitMessage =
        if (w == null) StagedDmlFile(null, 0L)
        else { val n = w.rows; w.close(); StagedDmlFile(w.path, n) }

      override def abort(): Unit = if (w != null) w.abort()
      override def close(): Unit = ()
    }
}

/** Driver-side epoch synthesis from the staged delta rows — all
  * declarative; the only driver-materialized value is the table's tip
  * position (one scalar agg, same as the metadata-only DELETE path).
  */
private[v2] object SinkDmlCommit {
  import RowLevelDml._

  def epochFrame(staged: DataFrame, spark: SparkSession, kind: String,
                 path: String, props: Map[String, String],
                 envelope: StructType): DataFrame = {
    // bounded: ONE scalar for the epoch's merge positions — DML rows must
    // outrank every position the table has SEEN (sink.tipPos, which on
    // scd2 includes closing positions the reduced state doesn't carry).
    // Tombstones land at tip+1 and data rows (update/insert/reinsert) at
    // tip+2: one statement touches each key at most once PER SIDE, but a
    // key-swapping UPDATE (X<->Y) emits a tombstone AND an op='c' for
    // the SAME key — identical positions would make latest-by-pos
    // precedence ambiguous; the split makes the create win
    // deterministically (the statement's final image).
    val tip =
      GraftSinkCatalog.sinkFor(kind, path, props).tipPos(spark)
        .getOrElse(0L)
    val delPos = tip + 1L
    val dataPos = tip + 2L

    def field(name: String): Option[StructField] =
      envelope.fields.find(_.name.equalsIgnoreCase(name))
    def rowCol(name: String): Column = col(s"`_row`.`$name`")

    /** Envelope projection in the stored-DDL shape. `op`, `before` and
      * `source` are synthesized; `key`/`after`/the rest pass through
      * from `src` via `pass` (deletes pass nulls).
      */
    def envelope2(src: DataFrame, keyC: Column, opV: String,
                  pass: String => Column, pos: Long): DataFrame =
      src.select(envelope.fields.toIndexedSeq.map { f =>
        f.name.toLowerCase(java.util.Locale.ROOT) match {
          case "key" => keyC.as(f.name)
          case "op" => lit(opV).cast(f.dataType).as(f.name)
          case "before" => lit(null).cast(f.dataType).as(f.name)
          case "source" => (f.dataType match {
            case st: StructType =>
              struct(st.fields.toIndexedSeq.map { sf =>
                (if (sf.name.equalsIgnoreCase("pos"))
                   lit(pos).cast(sf.dataType)
                 else lit(null).cast(sf.dataType)).as(sf.name)
              }: _*)
            case dt => lit(null).cast(dt)
          }).as(f.name)
          case _ => pass(f.name).as(f.name)
        }
      }: _*)

    val oldKey = col("`_id`.`" + RowKeyCol + "`")
    val passRow: String => Column = rowCol
    val passNull: String => Column =
      n => lit(null).cast(field(n).get.dataType)

    // DELETE → tombstones for the old keys (before stays null, matching
    // the metadata-only DELETE path's envelopes)
    val dels = envelope2(staged.filter(col("_op") === OpDelete),
      oldKey, graft.model.Envelope.OpDelete, passNull, delPos)

    // a pure DELETE's staging has no `_row` column — and no data rows
    if (!staged.schema.fieldNames.exists(_.equalsIgnoreCase("_row")))
      return dels

    // UPDATE → op='u' envelopes (before stays null: the sinks' reduced
    // state is (key, after, op, pos) — synthesizing a pre-image would
    // cost a key-join only for the merge to drop it); a key CHANGE
    // splits into tombstone(old key) + op='c'(new key)
    val ups = staged.filter(col("_op") === OpUpdate)
    val keyKept = ups.filter(rowCol("key") <=> oldKey)
    val upSame = envelope2(keyKept, rowCol("key"),
      graft.model.Envelope.OpUpdate, passRow, dataPos)
    val reKeyed = ups.filter(!(rowCol("key") <=> oldKey))
    val reDel = envelope2(reKeyed, oldKey,
      graft.model.Envelope.OpDelete, passNull, delPos)
    val reIns = envelope2(reKeyed, rowCol("key"),
      graft.model.Envelope.OpCreate, passRow, dataPos)

    // INSERT (and split-update reinserts) → op='c'
    val ins = envelope2(
      staged.filter(col("_op") === OpInsert || col("_op") === OpReinsert),
      rowCol("key"), graft.model.Envelope.OpCreate, passRow, dataPos)

    Seq(upSame, reDel, reIns, ins)
      .foldLeft(dels)((a, b) => a.unionByName(b))
  }
}
