package graft.job

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.{Cbf, Sbbf, Sbf}
import graft.functions._

class FilterIOSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private def tmpFile(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-fio").toString + "/" + name

  test("ablm file round trip: build -> write -> read -> probe, byte-exact") {
    val bytes = (0 until 5000).map(i => s"key$i").toDF("k")
      .agg(bloom_agg(col("k"), 5000, 0.01)).head.getAs[Array[Byte]](0)
    val path = tmpFile("filter.ablm")
    FilterIO.write(spark, path, bytes)
    val back = FilterIO.read(spark, path)
    assert(back.toSeq === bytes.toSeq)
    val f = FilterIO.readSbbf(spark, path)
    (0 until 5000).foreach(i => assert(f.contains(s"key$i")))
    // overwrite is atomic-ish and replaces content
    val bytes2 = Seq("other").toDF("k").agg(bloom_agg(col("k"), 100, 0.01))
      .head.getAs[Array[Byte]](0)
    FilterIO.write(spark, path, bytes2)
    assert(FilterIO.read(spark, path).toSeq === bytes2.toSeq)
  }

  test("counting and scalable filter files round trip through the same calls") {
    val cbf = Cbf.empty(100, 0.01)
    (0L until 80L).foreach(cbf.add(_, 1))
    val p1 = tmpFile("filter.abcm")
    FilterIO.write(spark, p1, cbf.toBytes)
    assert(Cbf.fromBytes(FilterIO.read(spark, p1)) === cbf)

    val sbf = Sbf.empty(64, 0.01)
    (0L until 500L).foreach(sbf.add)
    val p2 = tmpFile("filter.absf")
    FilterIO.write(spark, p2, sbf.toBytes)
    assert(Sbf.fromBytes(FilterIO.read(spark, p2)) === sbf)
  }

  test("corrupt file content is rejected by the typed parser") {
    val path = tmpFile("bad.ablm")
    FilterIO.write(spark, path, Array[Byte](1, 2, 3))
    intercept[graft.core.SbbfFormatException](FilterIO.readSbbf(spark, path))
  }
}
