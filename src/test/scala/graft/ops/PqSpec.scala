package graft.ops

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.expr.VectorKernels

/** Product quantization: kernels (assign/encode/LUT/ADC), distributed
  * training, the persisted IVF-PQ index, and batch-vs-single serving
  * equivalence.
  */
class PqSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def arr(xs: Double*): GenericArrayData = new GenericArrayData(xs.toArray)

  // two subspaces of 2 dims, 2 codewords each — hand-checkable
  private val tinyCb: Array[Array[Array[Double]]] = Array(
    Array(Array(0.0, 0.0), Array(1.0, 1.0)),
    Array(Array(-1.0, 0.0), Array(1.0, 0.0)))

  test("pqAssign picks the nearest codeword per subspace, ties to the lower index") {
    val codes = VectorKernels.pqAssign(arr(0.9, 0.8, 0.9, 0.1), tinyCb, isFloat = false)
    assert((0 until 2).map(codes.getInt) == Seq(1, 1))
    val codes2 = VectorKernels.pqAssign(arr(0.1, -0.2, -0.7, 0.0), tinyCb, isFloat = false)
    assert((0 until 2).map(codes2.getInt) == Seq(0, 0))
    // (0,0) is equidistant from both codewords of subspace 2 -> lower index
    val tie = VectorKernels.pqAssign(arr(0.0, 0.0, 0.0, 0.0), tinyCb, isFloat = false)
    assert(tie.getInt(1) == 0)
    // dimension mismatch is loud
    val e = intercept[IllegalArgumentException] {
      VectorKernels.pqAssign(arr(1.0, 2.0, 3.0), tinyCb, isFloat = false)
    }
    assert(e.getMessage.contains("dimension"))
  }

  test("pqEncode packs assign codes as unsigned bytes; ADC equals reconstructed dot") {
    val rnd = new scala.util.Random(11)
    val cb: Array[Array[Array[Double]]] = Array.tabulate(4) { _ =>
      Array.tabulate(16)(_ => Array.fill(3)(rnd.nextDouble() * 2 - 1))
    }
    (0 until 50).foreach { _ =>
      val v = Array.fill(12)(rnd.nextDouble() * 2 - 1)
      val q = Array.fill(12)(rnd.nextDouble() * 2 - 1)
      val vArr = new GenericArrayData(v)
      val codes = VectorKernels.pqEncode(vArr, cb, isFloat = false)
      val assign = VectorKernels.pqAssign(vArr, cb, isFloat = false)
      assert(codes.toSeq.map(_ & 0xff) == (0 until 4).map(assign.getInt))
      // ADC == sum of dot(query slice, selected codeword), same order
      val lut = VectorKernels.pqLut(new GenericArrayData(q), cb, isFloat = false)
      val adc = VectorKernels.pqAdc(codes, lut, 16)
      var expect = 0.0
      (0 until 4).foreach { s =>
        val cw = cb(s)(assign.getInt(s))
        var acc = 0.0
        (0 until 3).foreach(i => acc += q(s * 3 + i) * cw(i))
        expect += acc
      }
      assert(adc == expect)
    }
  }

  test("pqAdc rejects a LUT whose length disagrees with the code width") {
    val lut = new GenericArrayData(Array.fill(8)(0.0))
    val e = intercept[IllegalArgumentException] {
      VectorKernels.pqAdc(Array[Byte](0, 1, 2), lut, 16)
    }
    assert(e.getMessage.contains("LUT length"))
  }

  test("pqTrain converges: codes quantize a clustered corpus with low distortion") {
    // 4 well-separated cluster centers in 8 dims; PQ with 2 subspaces x
    // 4 codes must reduce quantization error far below the initial
    // codebook's (training actually moves codewords)
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(4)(Array.fill(8)(rnd.nextDouble() * 10 - 5))
    val rows = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(_ + rnd.nextDouble() * 0.1).toSeq)
    }
    val df = rows.toDF("id", "v").repartition(5)
    val cb = Similarity.pqTrain(df, "v", "id", m = 2, ncodes = 4, iters = 4)
    assert(cb.length == 2 && cb.forall(_.length == 4) && cb.forall(_.forall(_.length == 4)))
    // reconstruction error per vector well under the inter-center spacing
    val errs = rows.map { case (_, v) =>
      val codes = VectorKernels.pqAssign(
        new GenericArrayData(v.toArray), cb, isFloat = false)
      var err = 0.0
      (0 until 2).foreach { s =>
        val cw = cb(s)(codes.getInt(s))
        (0 until 4).foreach { i =>
          val d = v(s * 4 + i) - cw(i); err += d * d
        }
      }
      err
    }
    assert(errs.max < 1.0, s"max reconstruction error ${errs.max}")
  }

  test("IVF-PQ round-trip: write/read index, batch == single per query, footprint") {
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextDouble() * 4 - 2))
    val corpus = (0 until 300).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(_ + rnd.nextDouble() * 0.2).toSeq)
    }
    val df = corpus.toDF("id", "v").repartition(7)
    val path = java.nio.file.Files.createTempDirectory("graft-pq").toString
    val (cents, cb) = Similarity.writeIvfPqIndex(
      df, "v", "id", kLists = 4, m = 4, path, ncodes = 8, kmIters = 3, pqIters = 3)
    val (index, rCents, rCb) = Similarity.readIvfPqIndex(spark, path)
    assert(rCents.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    assert(rCb.map(_.map(_.toSeq).toSeq).toSeq == cb.map(_.map(_.toSeq).toSeq).toSeq)
    // the lists table stores m bytes per vector
    val codeLens = index.select(length(col("pqcode"))).distinct().collect()
    assert(codeLens.map(_.getInt(0)).toSeq == Seq(4))

    val queries = corpus.filter(_._1 % 60 == 1).toDF("id", "v")
    val batch = Similarity.ivfTopKPqBatch(
      index, queries, "id", "v", cents, cb, k = 5, nprobe = 2)
    val got = batch.collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSet).toMap
    assert(got.keySet == corpus.filter(_._1 % 60 == 1).map(_._1).toSet)
    corpus.filter(_._1 % 60 == 1).foreach { case (qid, qv) =>
      val single = Similarity.ivfTopKPq(index, qv, cents, cb, k = 5, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got(qid) == single, s"query $qid")
      assert(single.size == 5)
    }
  }

  test("ivfTopKPqBatch plan: no window sort, no cartesian, partial top-k aggregate") {
    val rnd = new scala.util.Random(41)
    val corpus = (0 until 200).map(i => (i.toLong, Seq.fill(8)(rnd.nextDouble() * 2 - 1)))
    val df = corpus.toDF("id", "v").repartition(4)
    val cents = Similarity.kmeansCentroids(df, "v", "id", k = 4, iters = 2)
    val cb = Similarity.pqTrain(df, "v", "id", m = 2, ncodes = 8, iters = 2)
    val index = df.select(col("id"),
      graft.functions.vec_nearest_centroid(col("v"), cents).as("list"),
      graft.functions.pq_encode(col("v"), cb).as("pqcode"))
    val queries = corpus.filter(_._1 < 5).toDF("id", "v")
    val res = Similarity.ivfTopKPqBatch(index, queries, "id", "v", cents, cb, k = 3)
    res.collect()
    def offending(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        offending(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => offending(q.plan)
      case _: org.apache.spark.sql.execution.window.WindowExec => true
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec => true
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
      case other => other.children.exists(offending)
    }
    assert(!offending(res.queryExecution.executedPlan),
      "PQ batch serving must not plan a window sort or a cartesian")
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SketchPartialAgg"),
      s"expected a partial-capable top-k aggregate, got:\n$plan")
  }

  test("IVF-PQ recall on clustered data beats chance and ADC ranks within-cluster first") {
    val rnd = new scala.util.Random(31)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextDouble() * 6 - 3))
    val corpus = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(_ + rnd.nextDouble() * 0.15).toSeq)
    }
    val df = corpus.toDF("id", "v").repartition(5)
    val cents = Similarity.kmeansCentroids(df, "v", "id", k = 8, iters = 3)
    val cb = Similarity.pqTrain(df, "v", "id", m = 4, ncodes = 32, iters = 3)
    val index = df.select(col("id"),
      graft.functions.vec_nearest_centroid(col("v"), cents).as("list"),
      graft.functions.pq_encode(col("v"), cb).as("pqcode"))
    // recall is asserted at k = 40 ~ cluster size: there the exact-top-k
    // margins are INTER-cluster (large vs the 0.15 noise), which is what
    // PQ codes resolve. At k << cluster size the exact ranking is decided
    // by intra-cluster noise far below quantization error — no quantizer
    // can (or should claim to) recover it.
    val query = corpus(17)._2
    val k = 40
    val ann = Similarity.ivfTopKPq(index, query, cents, cb, k = k, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    val exact = corpus.map { case (id, v) =>
      (id, v.zip(query).map { case (a, b) => a * b }.sum)
    }.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    val recall = ann.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }
}
