package graft.streaming

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8

import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileContext, FileSystem, Options, Path => HPath}

import org.apache.spark.sql.SparkSession

/** Metadata I/O of the MERGE-sink family through the Hadoop FileSystem
  * API, so a sink root can live wherever the cluster's tables do —
  * `file:`, `hdfs://`, or an object store with a Hadoop connector —
  * instead of being wired to the driver's local disk through
  * `java.nio.file`. The DATA files (parquet state, deltas, sidecars)
  * always went through Spark's own Hadoop-based readers/writers; this
  * moves the COMMIT machinery — manifests, version listings, the
  * atomic CURRENT swap, `.committs`/`.ddl`/`_floor` sidecars, and the
  * `EpochClaim` claim files — onto the same abstraction, the way the
  * lakehouse formats commit (Delta's LogStore, Iceberg's
  * HadoopTableOperations; reference sinks are JDBC/Kafka and have no
  * filesystem commit at all, `JdbcChangeEventSink.java`).
  *
  * Atomicity contract (same as the lakehouse analogs):
  *   - [[swapPointer]] (the commit point) is write-temp + atomic
  *     rename-with-overwrite via `FileContext.rename(OVERWRITE)` —
  *     atomic on HDFS and on local filesystems. Schemes with no
  *     `AbstractFileSystem` binding (plain `s3a://`) fall back to
  *     delete+rename, which is NOT atomic there — S3 needs a
  *     rename-atomic layer (S3Guard-era committers, a consistent
  *     HCFS implementation, or an external commit service), exactly
  *     the documented constraint Delta's S3SingleDriverLogStore and
  *     Iceberg's lock-manager catalogs exist to solve.
  *   - [[createNew]] (claim files) is `create(overwrite=false)` —
  *     atomic create-if-absent on HDFS; on local filesystems it is
  *     check-then-create inside the Hadoop layer, and the in-process
  *     claim registry ([[EpochClaim]]) covers the intra-JVM race that
  *     actually occurs there (local[n] writers share the JVM).
  *
  * FileSystem instances come from Hadoop's own cache (keyed by
  * scheme+authority), configured from the active SparkSession when one
  * exists — so `fs.*` settings (credentials, endpoints) flow to the
  * sinks exactly as they do to Spark's scans.
  */
private[graft] object SinkFs {

  def conf: Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  def fs(p: HPath): FileSystem = p.getFileSystem(conf)

  /** Fully-qualified form (scheme + authority made explicit) — the
    * stable identity used as the in-process claim-registry key.
    */
  def qualified(p: HPath): HPath = fs(p).makeQualified(p)

  def exists(p: HPath): Boolean = fs(p).exists(p)

  def isDirectory(p: HPath): Boolean = {
    val f = fs(p)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }

  def mkdirs(p: HPath): Unit = fs(p).mkdirs(p): Unit

  def readString(p: HPath): String =
    new String(readBytes(p), UTF_8)

  private def readBytes(p: HPath): Array[Byte] = {
    val in = fs(p).open(p)
    try in.readAllBytes() finally in.close()
  }

  def readLines(p: HPath): Seq[String] = {
    val r = new BufferedReader(new InputStreamReader(fs(p).open(p), UTF_8))
    try Iterator.continually(r.readLine()).takeWhile(_ != null).toSeq
    finally r.close()
  }

  /** Overwrite `p` with `s`. NOT atomic against concurrent readers —
    * use [[swapPointer]] for anything a reader may race (the sinks'
    * non-pointer writes are all epoch-claimed or immutable-once-named).
    */
  def writeString(p: HPath, s: String): Unit = {
    val out = fs(p).create(p, true)
    try out.write(s.getBytes(UTF_8)) finally out.close()
  }

  /** Create `p` with content `s` iff it does not exist. Throws Hadoop's
    * `FileAlreadyExistsException` (or the Java one, scheme-dependent)
    * when it does — the claim-file primitive.
    */
  def createNew(p: HPath, s: String): Unit = {
    val f = fs(p)
    // local filesystems surface an existing file as a generic
    // IOException from create(overwrite=false) on some Hadoop builds;
    // normalize to FileAlreadyExistsException so callers catch ONE type
    if (f.exists(p)) throw new FileAlreadyExistsException(p.toString)
    val out =
      try f.create(p, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.nio.file.FileAlreadyExistsException =>
          throw new FileAlreadyExistsException(p.toString)
        case e: java.io.IOException if f.exists(p) =>
          throw new FileAlreadyExistsException(p.toString + s" ($e)")
      }
    try out.write(s.getBytes(UTF_8)) finally out.close()
  }

  def deleteIfExists(p: HPath): Unit = {
    try fs(p).delete(p, false)
    catch { case NonFatal(_) => () }
    ()
  }

  def deleteRecursive(p: HPath): Unit = fs(p).delete(p, true): Unit

  /** Child names of a directory (files and dirs), empty when absent. */
  def listNames(p: HPath): Seq[String] = {
    val f = fs(p)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.map(_.getPath.getName)
  }

  /** Child names that are directories, empty when absent. */
  def listDirNames(p: HPath): Seq[String] = {
    val f = fs(p)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  def mtime(p: HPath): Long = fs(p).getFileStatus(p).getModificationTime

  /** Max of an INT64 column across the parquet files under `dirs`,
    * from FOOTER STATISTICS alone — zero row I/O, the way Iceberg/Delta
    * answer min/max questions from file-level stats instead of scans.
    * The sinks use it for `tipPos` (the merge position every DML
    * statement must outrank): a column scan is O(table bytes) where
    * this is O(#files) driver-side metadata reads. None when any
    * row-bearing file lacks the stat (caller falls back to the scan) or
    * no rows exist at all; all-null columns in a file (e.g. open scd2
    * rows' valid_to_pos) simply don't contribute.
    */
  def parquetMaxLong(dirs: Seq[HPath], column: String): Option[Long] = {
    import scala.jdk.CollectionConverters._
    val c = conf
    var best = Long.MinValue
    var any = false
    dirs.foreach { d =>
      val f = fs(d)
      if (f.exists(d)) {
        val files = f.listStatus(d).toSeq.filter(st =>
          st.isFile && st.getPath.getName.endsWith(".parquet") &&
            st.getLen > 0)
        files.foreach { st =>
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile
              .fromStatus(st, c))
          try {
            reader.getFooter.getBlocks.asScala
              .filter(_.getRowCount > 0).foreach { block =>
                block.getColumns.asScala
                  .find(_.getPath.toDotString == column) match {
                  case Some(col) =>
                    val stats = col.getStatistics
                    if (stats == null || stats.isEmpty)
                      return None // stat missing where rows exist: scan
                    if (stats.hasNonNullValue) {
                      stats.genericGetMax match {
                        case l: java.lang.Long =>
                          if (l.longValue() > best) best = l.longValue()
                          any = true
                        case _ => return None // not INT64: scan
                      }
                    } // all-null block: contributes nothing
                  case None => return None // column absent: scan
                }
              }
          } finally reader.close()
        }
      }
    }
    if (any) Some(best) else None
  }

  /** Atomically publish `content` at `pointer`: write a sibling temp
    * file, then rename-with-overwrite. See the class doc for the
    * per-scheme atomicity contract.
    */
  def swapPointer(pointer: HPath, tmpName: String, content: String): Unit = {
    val tmp = new HPath(pointer.getParent, tmpName)
    writeString(tmp, content)
    rename(tmp, pointer)
  }

  /** Rename `src` over `dst` (replacing it): `FileContext` OVERWRITE
    * rename where the scheme has an AbstractFileSystem binding (file,
    * hdfs, viewfs — atomic there), delete+rename elsewhere (loudly
    * non-atomic; see class doc).
    */
  def rename(src: HPath, dst: HPath): Unit = {
    val f = fs(dst)
    val qSrc = f.makeQualified(src)
    val qDst = f.makeQualified(dst)
    try {
      FileContext.getFileContext(qDst.toUri, conf)
        .rename(qSrc, qDst, Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // no AbstractFileSystem for this scheme (e.g. s3a): fall back
        // to delete+rename — a reader can observe the gap, and a crash
        // in it loses the pointer; such stores need a rename-atomic
        // layer for production commit safety (class doc)
        f.delete(qDst, false)
        if (!f.rename(qSrc, qDst))
          throw new java.io.IOException(s"rename $qSrc -> $qDst failed")
    }
  }
}
