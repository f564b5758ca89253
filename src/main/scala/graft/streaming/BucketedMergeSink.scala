package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Envelope
import graft.operators.Materialize

/** Bucket-partitioned MERGE sink: state is hash-partitioned into `buckets`
  * by PK, and a merge rewrites ONLY the buckets its batch touches — the
  * file-pruning behavior Delta/Iceberg `MERGE INTO` gets from data
  * skipping, built on a manifest: each committed version is a manifest
  * file mapping bucket → the parquet directory that last wrote it, swapped
  * in atomically. Untouched buckets keep their old files byte-for-byte.
  *
  * At 100 TB this is the difference between a MERGE that rewrites the
  * table and one that rewrites ~|batch keys| / |table keys| of it; bucket
  * count scales with table size (here small for tests).
  */
class BucketedMergeSink(dir: String, buckets: Int = 16) extends CdcSink {
  private val root = Paths.get(dir)
  private val pointer = root.resolve("CURRENT")

  private def bucketCol = pmod(xxhash64(col("key")), lit(buckets))

  /** bucket -> data directory of its current version */
  def manifest: Map[Int, String] =
    if (!Files.exists(pointer)) Map.empty
    else {
      val mf = root.resolve(Files.readString(pointer).trim)
      Files.readAllLines(mf).asScala.filter(_.nonEmpty).map { l =>
        val Array(b, p) = l.split("\t", 2)
        b.toInt -> p
      }.toMap
    }

  private def readBuckets(spark: SparkSession, paths: Seq[String]): Option[DataFrame] = {
    val existing = paths.filter(p => Files.exists(Paths.get(p)))
    if (existing.isEmpty) None
    // mergeSchema: buckets written under different payload-schema versions
    // (K4 evolution) must union, older files reading new columns as null
    else Some(spark.read.option("mergeSchema", "true").parquet(existing: _*))
  }

  def state(spark: SparkSession): Option[DataFrame] =
    readBuckets(spark, manifest.values.toSeq.distinct)

  def view(spark: SparkSession): DataFrame = {
    val s = state(spark).getOrElse(
      throw new IllegalStateException(s"no committed state in $dir"))
    s.filter(col("op") =!= Envelope.OpDelete).select(col("after.*"))
  }

  /** Delete version directories no longer referenced by the current
    * manifest (the sink's VACUUM). Bucket dirs live under `v<epoch>/`;
    * a version dir is live while ANY bucket still points into it.
    */
  def vacuum(): Int = {
    val live = manifest.values
      .map(p => Paths.get(p).getParent.getFileName.toString).toSet
    val versionDirs = Files.list(root).iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("v"))
      .toSeq
    val dead = versionDirs.filterNot(p => live(p.getFileName.toString))
    dead.foreach { d =>
      Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .forEach(Files.delete(_))
    }
    dead.size
  }

  def merge(batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    graft.expressions.GraftFunctions.register(spark)
    val reduced = Materialize.reduceByKey(batch)
      .select(col("key"), col("after"), col("op"), col("source.pos").as("pos"))
      .withColumn("_bucket", bucketCol)
    // driver learns WHICH buckets are touched (tiny: ≤ `buckets` rows)
    // from the RAW batch — a cheap partial-aggregated distinct, no need
    // to materialize the reduced form twice
    val touched = batch.select(bucketCol.as("_bucket")).distinct()
      .collect().map(_.getLong(0).toInt).toSet
    val prevManifest = manifest
    val prevTouched = readBuckets(spark,
      prevManifest.filter(kv => touched(kv._1)).values.toSeq.distinct)
      // older versions may hold rows of untouched buckets in shared dirs;
      // keep only touched buckets' rows
      .map(_.withColumn("_bucket", bucketCol)
        .filter(col("_bucket").isin(touched.toSeq.map(_.toLong): _*)))
    val merged = prevTouched match {
      case None => reduced
      case Some(prev) =>
        // by-name union with missing columns allowed: same evolution
        // semantics as MergeSink (a batch under an evolved schema merges
        // into older state)
        prev.unionByName(reduced, allowMissingColumns = true)
          .groupBy(col("key"))
          .agg(graft.expressions.GraftFunctions.latestByPos(
            struct(col("after"), col("op"), col("pos"), col("_bucket")),
            col("pos")).as("e"))
          .select(col("key"), col("e.after").as("after"), col("e.op").as("op"),
            col("e.pos").as("pos"), col("e._bucket").as("_bucket"))
    }
    val vdir = root.resolve(s"v$epochId").toString
    // cluster by bucket before the partitioned write: without it every agg
    // task opens a writer per bucket (tasks × buckets small files); with it
    // each bucket is one file
    merged.repartition(touched.size.max(1), col("_bucket"))
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
      StandardCopyOption.ATOMIC_MOVE)
  }
}

