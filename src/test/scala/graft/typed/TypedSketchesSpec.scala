package graft.typed

import graft.SparkTestBase
import graft.core.{Hll, Sbbf}

// top-level: Dataset encoders for inner case classes need an outer scope
case class File(repo: String, sha: String, size: Long)

class TypedSketchesSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private def files = (0 until 3000).map { i =>
    File(s"repo${i % 4}", f"sha$i%05d", i.toLong)
  }

  test("typed bloom aggregator per group: bit-identical to the expression build") {
    val ds = files.toDS()
    val perRepo = ds.groupByKey(_.repo)
      .agg(TypedSketches.bloomOfString[File](_.sha, 1000, 0.01).toColumn.name("filter"))
      .collect().toMap
    assert(perRepo.size === 4)
    // same keys through the untyped expression path -> same bytes
    import org.apache.spark.sql.functions._
    import graft.functions._
    val viaExpr = files.toDF()
      .groupBy(col("repo")).agg(bloom_agg(col("sha"), 1000, 0.01).as("f"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    perRepo.foreach { case (repo, bytes) =>
      assert(bytes.toSeq === viaExpr(repo).toSeq, s"repo=$repo")
      // and the filter behaves: contains every sha of the group
      val f = Sbbf.fromBytes(bytes)
      files.filter(_.repo == repo).foreach(x => assert(f.contains(x.sha)))
    }
  }

  test("null string keys are skipped, matching the expression aggregates") {
    val withNulls = (files.take(100) :+ File("repo0", null, -1L)).toDS()
    // must not NPE; result identical to the null-free build
    val bytes = withNulls.select(
      TypedSketches.bloomOfString[File](_.sha, 1000, 0.01).toColumn).head()
    val clean = files.take(100).toDS().select(
      TypedSketches.bloomOfString[File](_.sha, 1000, 0.01).toColumn).head()
    assert(bytes.toSeq === clean.toSeq)
    val hllBytes = withNulls.select(
      TypedSketches.hllOfString[File](_.sha).toColumn).head()
    val hllClean = files.take(100).toDS().select(
      TypedSketches.hllOfString[File](_.sha).toColumn).head()
    assert(hllBytes.toSeq === hllClean.toSeq)
  }

  test("typed long-key bloom and HLL aggregators") {
    val ds = files.toDS()
    val global = ds.select(TypedSketches.bloomOfLong[File](_.size, 3000, 0.01).toColumn)
      .head()
    val f = Sbbf.fromBytes(global)
    (0L until 3000L).foreach(k => assert(f.contains(k)))

    val est = Hll.fromBytes(
      ds.select(TypedSketches.hllOfString[File](_.sha).toColumn).head()).estimate
    assert(math.abs(est - 3000).toDouble / 3000 <= 3 * 0.0082 + 0.01, s"est=$est")
  }

  test("typed t-digest, KLL, and Misra-Gries aggregators within bounds") {
    val ds = files.toDS()
    val td = graft.core.TDigest.fromBytes(
      ds.select(TypedSketches.tdigestOf[File](_.size.toDouble).toColumn).head())
    assert(td.count === 3000.0)
    assert(math.abs(td.quantile(0.5) - 1500.0) <= 60.0)

    val kll = graft.core.Kll.fromBytes(
      ds.select(TypedSketches.kllOf[File](_.size.toDouble).toColumn).head())
    assert(kll.count === 3000L)
    assert(math.abs(kll.rank(kll.quantile(0.5)) - 0.5) <= kll.epsilon + 1e-9)

    // repo0..repo3 each appear 750x; k=8 > 4 distinct -> counts EXACT
    val mg = graft.core.MisraGries.fromBytes(
      ds.select(TypedSketches.misraGriesOf[File](_.repo, 8).toColumn).head())
    (0 until 4).foreach { r =>
      val (lo, hi) = mg.bounds(s"repo$r")
      assert(lo === 750L && hi === 750L, s"repo$r ($lo,$hi)")
    }
    // null keys skipped
    val withNull = (files.take(50) :+ File(null, "x", 0L)).toDS()
    val mgN = graft.core.MisraGries.fromBytes(
      withNull.select(TypedSketches.misraGriesOf[File](_.repo, 8).toColumn).head())
    assert(mgN.itemCount === 50L)
  }
}
