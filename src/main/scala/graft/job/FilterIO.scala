package graft.job

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Raw wire-format filter files — the reference's own persistence shape
  * (`tests/test_serialization.py` round-trips `bf.to_bytes()` through
  * plain files). A `.ablm` file written here loads in the reference
  * Python library unchanged, and vice versa; the same calls serve the
  * ABCM (counting) and ABSF (scalable) formats since all three validate
  * on parse.
  *
  * Paths go through the Hadoop FileSystem API, so `hdfs://`, `s3a://`
  * etc. work on a cluster exactly like local paths do here. Writes are
  * atomic-ish (temp file + rename) so a concurrent reader never sees a
  * torn filter.
  */
object FilterIO {

  /** Write filter bytes to `path`: temp file + OVERWRITE rename (via
    * FileContext, which supports atomic replace on HDFS/local — no
    * delete-then-rename window where a reader sees the file missing).
    * The temp file is cleaned up on any failure. Note the usual S3A
    * caveat: its "rename" is a non-atomic copy; prefer a versioned path
    * per write there.
    */
  def write(spark: SparkSession, path: String, bytes: Array[Byte]): Unit = {
    val p = new Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
    var renamed = false
    try {
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      renamed = true
    } finally {
      if (!renamed && fs.exists(tmp)) fs.delete(tmp, false)
    }
  }

  /** Read raw filter bytes from `path`. */
  def read(spark: SparkSession, path: String): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"filter file too large: $len bytes")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    buf
  }

  /** Read and validate as an SBBF (throws SbbfFormatException if not). */
  def readSbbf(spark: SparkSession, path: String): graft.core.Sbbf =
    graft.core.Sbbf.fromBytes(read(spark, path))
}
