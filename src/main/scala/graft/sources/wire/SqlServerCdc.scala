package graft.sources.wire

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Decoder for SQL Server CDC change tables (`cdc.<capture>_CT`), the
  * poll-based wire format of `cdc.fn_cdc_get_all_changes_<capture>` —
  * SURVEY S11. The "wire" here IS a table: each captured DML lands as
  * rows keyed by `__$start_lsn` (commit LSN of the transaction),
  * `__$seqval` (row LSN within the transaction), `__$operation`
  * (1=delete, 2=insert, 3=update-before, 4=update-after) and
  * `__$update_mask` (varbinary bitmask of changed column ordinals),
  * followed by the captured data columns.
  *
  * Reference semantics:
  *  - operation codes + before/after pairing: reference
  *    `debezium-connector-sqlserver/.../SqlServerChangeRecordEmitter.java:23-50`,
  *    pairing of OP_UPDATE_BEFORE with the immediately-following
  *    OP_UPDATE_AFTER row in `SqlServerStreamingChangeEventSource.java:338-345`;
  *  - LSN text form (8:8:2 bytes, lowercase hex) `Lsn.java:66-90`;
  *  - update-mask bit addressing (byte `i/8`, bit `i%8`, absent/short
  *    mask ⇒ changed) and the max-type unavailable-value rule — an
  *    unmodified `varchar(max)`-style column arrives NULL in UPDATE
  *    images and must surface as the configured placeholder, detected
  *    via the mask — `SqlServerChangeTablePointer.java:120-217`.
  *
  * Spark-first shape: the change table is a DataFrame (here a recorded
  * fixture; in production a JDBC/parquet snapshot of the CT table), and
  * one map-side-combinable `groupBy(commit_lsn, seqval)` both pairs
  * update images and passes inserts/deletes through — a single shuffle
  * keyed by the event identity, no ordering assumptions beyond the pair
  * sharing its (lsn, seqval), which the capture process guarantees. At
  * 100 TB of change rows the group cardinality equals event count and
  * partial aggregation keeps the pair-merge local to each mapper.
  */
object SqlServerCdc {

  val StartLsn = "__$start_lsn"
  val SeqVal = "__$seqval"
  val Operation = "__$operation"
  val UpdateMask = "__$update_mask"

  val MetaColumns: Seq[String] = Seq(StartLsn, SeqVal, Operation, UpdateMask)

  /** Placeholder for unavailable max-type column values (matches
    * `Transforms.reselectColumns`' placeholder convention).
    */
  val UnavailableValue = "__unavailable"

  /** 10-byte binary LSN → canonical "xxxxxxxx:xxxxxxxx:xxxx" lowercase
    * hex (ref `Lsn.java:66-90`).
    */
  def lsnString(c: Column): Column =
    lower(concat_ws(":",
      substring(hex(c), 1, 8), substring(hex(c), 9, 8), substring(hex(c), 17, 4)))

  /** Bit `ordinal` (0-based captured-column index) of the varbinary
    * update mask. The mask is RIGHT-aligned: ordinal 0 is the least-
    * significant bit of the LAST byte (`data.length - i/8 - 1`, ref
    * `SqlServerChangeTablePointer.java:199-217` and
    * `sys.fn_cdc_is_bit_set`) — left-indexed reads go wrong the moment
    * a table captures more than 8 columns. NULL or too-short masks
    * count as changed.
    */
  def maskBitSet(mask: Column, ordinal: Int): Column = {
    val byteFromEnd = ordinal / 8 // 0 = last byte
    val bit = 1 << (ordinal % 8)
    val byteVal = conv(hex(
      mask.substr(length(mask) - byteFromEnd, lit(1))), 16, 10).cast("int")
    mask.isNull || (length(mask) <= byteFromEnd) ||
      (byteVal.bitwiseAND(lit(bit)) =!= lit(0))
  }

  /** LSN-window poll: rows with `fromLsn < __$start_lsn <= toLsn` —
    * the `fn_cdc_get_all_changes` contract (exclusive lower bound =
    * last processed commit). BinaryType comparison in Spark is unsigned
    * lexicographic, exactly the SQL Server LSN order, and the predicate
    * pushes down to the scan.
    */
  def pollWindow(ct: DataFrame, fromLsn: Array[Byte], toLsn: Array[Byte]): DataFrame =
    ct.filter(col(StartLsn) > lit(fromLsn) && col(StartLsn) <= lit(toLsn))

  /** Decode a change table into change events: one row per DML with
    * `op` in (c,u,d), before/after images as JSON (explicit nulls, so
    * the image schema is self-describing), the commit/row LSN strings,
    * and for updates the mask-derived changed-column list.
    *
    * @param keyCols      primary-key columns of the captured table
    * @param maxTypeCols  columns of max-types (varchar(max)/varbinary(max)):
    *                     NULL + mask-bit-clear in an UPDATE image means
    *                     "not captured", surfaced as [[UnavailableValue]]
    */
  def decode(ct: DataFrame, tableName: String, keyCols: Seq[String],
             maxTypeCols: Seq[String] = Nil): DataFrame = {
    val dataCols = ct.columns.filterNot(MetaColumns.contains).toSeq
    require(keyCols.forall(dataCols.contains), s"key not in $dataCols")
    val ordinal = dataCols.zipWithIndex.toMap

    val img = struct(dataCols.map(col): _*)
    val grouped = ct
      .groupBy(col(StartLsn).as("commit_lsn_bin"), col(SeqVal).as("seqval_bin"))
      .agg(
        max(col(Operation)).as("opcode"),
        max(when(col(Operation).isin(1, 3), img)).as("before_img"),
        max(when(col(Operation).isin(2, 4), img)).as("after_img"),
        max(when(col(Operation).isin(3, 4), col(UpdateMask))).as("mask"))

    val isUpdate = col("opcode") === 4
    // max-type unavailable substitution on BOTH update images (ref rule:
    // applies to OP_UPDATE_BEFORE and OP_UPDATE_AFTER alike)
    def fixImage(image: Column): Column = {
      if (maxTypeCols.isEmpty) image
      else when(image.isNotNull, struct(dataCols.map { c =>
        val base = image.getField(c)
        if (maxTypeCols.contains(c))
          when(isUpdate && base.isNull && !maskBitSet(col("mask"), ordinal(c)),
            lit(UnavailableValue)).otherwise(base).as(c)
        else base.as(c)
      }: _*))
    }

    val changed = array_compact(array(dataCols.map { c =>
      when(maskBitSet(col("mask"), ordinal(c)), lit(c))
    }: _*))

    val keyFrom = coalesce(col("after_fixed"), col("before_fixed"))
    grouped
      .withColumn("before_fixed", fixImage(col("before_img")))
      .withColumn("after_fixed", fixImage(col("after_img")))
      .select(
        lit(tableName).as("table"),
        when(col("opcode") === 2, "c").when(col("opcode") === 1, "d")
          .otherwise("u").as("op"),
        lsnString(col("commit_lsn_bin")).as("commit_lsn"),
        lsnString(col("seqval_bin")).as("seqval"),
        to_json(struct(keyCols.map(k => keyFrom.getField(k).as(k)): _*))
          .as("key_json"),
        to_json(col("before_fixed"), Map("ignoreNullFields" -> "false"))
          .as("before_json"),
        to_json(col("after_fixed"), Map("ignoreNullFields" -> "false"))
          .as("after_json"),
        when(isUpdate, changed).as("changed_cols"))
  }
}
