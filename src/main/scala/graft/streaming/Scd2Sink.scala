package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Envelope
import graft.operators.Scd2

/** Streaming SCD-2 maintenance: the history table kept current under
  * micro-batch change feeds. Closed versions are immutable — they append
  * once and are never rewritten; only the OPEN version of a key can
  * change (the next event closes it). Each epoch:
  *
  *  1. routes batch events by key hash into `buckets`;
  *  2. reads ONLY the touched buckets' stored rows; closed rows pass
  *     through untouched;
  *  3. re-enters each stored open version as a synthetic read event and
  *     runs the same interval algebra ([[Scd2.intervals]]) over
  *     (synthetic ∪ batch) — a key with no batch events reproduces its
  *     open row bit-for-bit, a key with events closes it and appends the
  *     new versions;
  *  4. commits by manifest + atomic CURRENT swap (the
  *     [[BucketedMergeSink]] idempotent-epoch contract: replaying a
  *     committed epoch is a no-op).
  *
  * 100 TB shape: per-epoch work is O(touched buckets), not O(history);
  * the unbounded closed-version history is append-only cold data while
  * the rewrite set is bounded by the batch's key spread.
  */
class Scd2Sink(dir: String, buckets: Int = 16) extends CdcSink {
  private val root = Paths.get(dir)
  private val pointer = root.resolve("CURRENT")

  private def bucketCol = pmod(xxhash64(col("key")), lit(buckets))

  private def manifest: Map[Int, String] =
    if (!Files.exists(pointer)) Map.empty
    else Files.readAllLines(root.resolve(Files.readString(pointer).trim))
      .asScala.filter(_.nonEmpty).map { l =>
        val Array(b, p) = l.split("\t", 2); b.toInt -> p
      }.toMap

  /** The bucket count is part of the on-disk layout (same hazard as
    * BucketedMergeSink.checkBucketCount): reopening with a different
    * count would route keys away from their stored open versions —
    * silent duplicate/contradictory history rows. Persisted at first
    * commit, asserted on every later one.
    */
  private def checkBucketCount(): Unit = {
    val f = root.resolve("_buckets")
    if (Files.exists(f)) {
      val stored = Files.readString(f).trim.toInt
      require(stored == buckets,
        s"history $dir was written with buckets=$stored, opened with $buckets")
    } else {
      Files.createDirectories(root)
      Files.writeString(f, buckets.toString): Unit
    }
  }

  /** Read the CURRENT pointer, not manifest existence — the commit point
    * is the atomic swap (see BucketedMergeSink.committedEpoch).
    */
  override def committedEpoch: Option[Long] =
    if (!Files.exists(pointer)) None
    else """m(\d+)\.manifest""".r
      .findFirstMatchIn(Files.readString(pointer).trim)
      .map(_.group(1).toLong)

  private def readBuckets(spark: SparkSession,
                          dirs: Seq[String]): Option[DataFrame] = {
    val existing = dirs.distinct.filter(d => Files.exists(Paths.get(d)))
    if (existing.isEmpty) None
    // versions written under different (evolved) schemas must surface
    // every column
    else Some(spark.read.option("mergeSchema", "true").parquet(existing: _*))
  }

  /** The full history table (user-facing shape). */
  def history(spark: SparkSession): DataFrame =
    Scd2.present(readBuckets(spark, manifest.values.toSeq).getOrElse(
      throw new IllegalStateException(s"no committed history in $dir"))
      .drop("_bucket"))

  /** CdcSink view = current rows (open versions' payloads). */
  override def view(spark: SparkSession): DataFrame = {
    val h = history(spark)
    h.filter(col("is_current"))
      .drop("valid_from_pos", "valid_to_pos", "is_current")
  }

  /** Delete version directories no longer referenced by the current
    * manifest (VACUUM; same erosion contract as BucketedMergeSink).
    */
  def vacuum(): Int = {
    val live = manifest.values
      .map(p => Paths.get(p).getParent.getFileName.toString).toSet
    val versionDirs = Using.resource(Files.list(root)) { st =>
      st.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("v"))
        .toSeq
    }
    val dead = versionDirs.filterNot(p => live(p.getFileName.toString))
    dead.foreach { d =>
      Using.resource(Files.walk(d)) { st =>
        st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(Files.delete(_))
      }
    }
    dead.size
  }

  def merge(batch: DataFrame, epochId: Long): Unit = {
    val committed = committedEpoch
    if (committed.exists(_ >= epochId)) {
      CdcSink.warnReplay(s"Scd2Sink($dir)", epochId, committed.get)
      return
    }
    checkBucketCount()
    val spark = batch.sparkSession
    val events = batch
      .filter(col("op") =!= Envelope.OpTombstone)
      .select(col("key"), col("op"), col("after"),
        col("source.pos").as("pos"))
      .withColumn("_bucket", bucketCol)
      .persist()
    try {
      val touched = events.select(col("_bucket")).distinct()
        .collect().map(_.getLong(0).toInt).toSet
      if (touched.isEmpty) return
      val prevManifest = manifest
      val prev = readBuckets(spark,
        prevManifest.filter(kv => touched(kv._1)).values.toSeq)
        .map(_.withColumn("_bucket", bucketCol)
          .filter(col("_bucket").isin(touched.toSeq.map(_.toLong): _*)))
      val merged = prev match {
        case None => Scd2.intervals(events).withColumn("_bucket", bucketCol)
        case Some(p) =>
          val closed = p.filter(col("valid_to_pos").isNotNull)
          // stored open versions re-enter as synthetic reads; the
          // interval algebra closes them iff the batch has later events
          val reopened = p.filter(col("valid_to_pos").isNull)
            .select(col("key"), lit(Envelope.OpRead).as("op"),
              col("after"), col("valid_from_pos").as("pos"),
              col("_bucket"))
          // allowMissingColumns: a batch under an EVOLVED after-schema
          // must merge into history written before the evolution
          closed.unionByName(
            Scd2.intervals(reopened.unionByName(events,
              allowMissingColumns = true))
              .withColumn("_bucket", bucketCol),
            allowMissingColumns = true)
      }
      val vdir = root.resolve(s"v$epochId").toString
      val writeTasks = math.min(touched.size.max(1),
        spark.sparkContext.defaultParallelism * 2)
      merged.repartition(writeTasks, col("_bucket"))
        .sortWithinPartitions(col("_bucket"), col("key"), col("valid_from_pos"))
        .write.mode("overwrite").partitionBy("_bucket").parquet(vdir)
      val newManifest = prevManifest ++
        touched.map(b => b -> s"$vdir/_bucket=$b").toMap
      val mfName = s"m$epochId.manifest"
      Files.createDirectories(root)
      Files.writeString(root.resolve(mfName),
        newManifest.toSeq.sortBy(_._1)
          .map { case (b, p) => s"$b\t$p" }.mkString("", "\n", "\n"))
      val tmp = root.resolve(s"CURRENT.tmp$epochId")
      Files.writeString(tmp, mfName)
      Files.move(tmp, pointer, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE): Unit
    } finally { events.unpersist(); () }
  }
}
