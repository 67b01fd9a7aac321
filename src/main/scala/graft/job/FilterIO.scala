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

  /** Write filter bytes to `path` (temp + rename). */
  def write(spark: SparkSession, path: String, bytes: Array[Byte]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"rename $tmp -> $p failed")
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
