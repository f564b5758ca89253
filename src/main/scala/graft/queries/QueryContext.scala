package graft.queries

/** Run-scoped context for the query registry: the data directory of the
  * CURRENT Verify/Bench run, set by the drivers before queries (and
  * oracle SQL) are evaluated.
  *
  * Why it exists: auto-scaled operators derive blocking parameters from
  * CORPUS SIZE (IVF cell count k ≈ √N, LSH banding from N — the r7 10×
  * findings promoted to code). Their DuckDB oracles must inline the SAME
  * derived parameters (e.g. the k pretrained-centroid literals), and the
  * oracle generator has no SparkSession — so it sizes the corpus from
  * parquet FOOTER metadata (row counts only, no data read) under this
  * directory. Falls back to the caller-supplied default when unset
  * (e.g. a bare unit test enumerating oracle SQL).
  */
object QueryContext {

  @volatile var dataDir: Option[String] = None

  /** Total row count of `<dataDir>/<table>.parquet` from parquet footers
    * (O(files) metadata reads, no data pages), or `fallback` when the
    * directory is unset/unreadable.
    */
  def parquetRowCount(table: String, fallback: Long): Long =
    dataDir.flatMap { dir =>
      try {
        val root = new java.io.File(s"$dir/$table.parquet")
        val files =
          if (root.isDirectory)
            root.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
          else Seq(root)
        val conf = new org.apache.hadoop.conf.Configuration()
        Some(files.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum)
      } catch { case _: Exception => None }
    }.getOrElse(fallback)
}
