package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.{Dedup, Similarity}

/** The ANN vector kernels as native codegen expressions: must match the
  * driver-side Seq kernels bit-for-bit (driver-computed probe buckets
  * join against executor-computed signatures), keep ScalaUDF out of the
  * ANN plans, and survive nulls loudly.
  */
class VectorExpressionsSpec extends SparkTestBase {

  import SparkTestBase.spark.implicits._

  private def randVecs(n: Int, dim: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
  }

  test("lsh_signature matches the driver Seq kernel bit-for-bit") {
    val data = randVecs(200, 24)
    val rows = data.toDF("id", "v").repartition(3)
      .select(col("id"), graft.functions.lsh_signature(col("v"), 12).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    data.foreach { case (id, v) =>
      assert(rows(id) === Similarity.signatureKernel(v, 12), s"id=$id")
    }
  }

  test("lsh_table_signatures matches tableSignature per table") {
    val data = randVecs(100, 16)
    val rows = data.toDF("id", "v").repartition(2)
      .select(col("id"),
        graft.functions.lsh_table_signatures(col("v"), 8, 10).as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    data.foreach { case (id, v) =>
      (0 until 8).foreach { t =>
        assert(rows(id)(t) === Similarity.tableSignature(v, t, 10), s"id=$id t=$t")
      }
    }
  }

  test("vec_nearest_centroid matches the driver kernel, ties to lowest index") {
    val cents = Array(
      Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0), Array(-1.0, 0.5, 0.0))
    val data = randVecs(150, 3)
    val rows = data.toDF("id", "v").repartition(2)
      .select(col("id"),
        graft.functions.vec_nearest_centroid(col("v"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    data.foreach { case (id, v) =>
      assert(rows(id) === Similarity.nearestCentroid(v, cents)._1, s"id=$id")
    }
    // exact tie between centroid 0 and a duplicate of it -> lowest index
    val tieCents = Array(Array(1.0, 2.0), Array(1.0, 2.0))
    val tie = Seq((0L, Seq(5.0, 5.0))).toDF("id", "v")
      .select(graft.functions.vec_nearest_centroid(col("v"), tieCents)).head().getInt(0)
    assert(tie === 0)
  }

  test("mix64 expression matches Hashing.mix64, incl. SQL name") {
    val xs = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 123456789L)
    val rows = xs.toDF("x").repartition(2)
      .select(col("x"), graft.functions.mix64(col("x")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach(x => assert(rows(x) === graft.core.Hashing.mix64(x)))
    xs.toDF("x").createOrReplaceTempView("mix64_t")
    val sqlRows = spark.sql("SELECT x, mix64(x) AS m FROM mix64_t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach(x => assert(sqlRows(x) === graft.core.Hashing.mix64(x)))
  }

  test("SQL names: lsh_signature / lsh_table_signatures") {
    randVecs(20, 8).toDF("id", "v").createOrReplaceTempView("vec_t")
    val r = spark.sql(
      """SELECT lsh_signature(v, 6) AS s, lsh_table_signatures(v, 4, 6) AS ts
        |FROM vec_t""".stripMargin).collect()
    assert(r.length === 20)
    r.foreach(row => assert(row.getSeq[Long](1).length === 4))
  }

  test("vec8 quantization: scale/codes reproducible, error bound, dot/scale round-trip") {
    val data = randVecs(100, 16)
    val blobs = data.toDF("id", "v").repartition(3)
      .select(col("id"), graft.functions.vec8_quantize(col("v")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    data.foreach { case (id, v) =>
      val b = blobs(id)
      val maxAbs = v.map(math.abs).max
      val scale = maxAbs / 127.0
      assert(VectorKernels.scale8(b) === scale, s"id=$id")
      assert(b.length === 8 + v.length)
      // per-element quantization error <= scale/2 (no clamp engages here)
      v.zipWithIndex.foreach { case (x, i) =>
        val code = b(8 + i).toInt
        assert(code >= -127 && code <= 127)
        assert(math.abs(code * scale - x) <= scale / 2 + 1e-12, s"id=$id i=$i")
      }
    }
    // dot8 equals the driver-side integer dot
    val (idA, vA) = data(3); val (idB, vB) = data(17)
    def codesOf(v: Seq[Double]): Seq[Long] = {
      val s = v.map(math.abs).max / 127.0
      v.map(x => math.max(-127L, math.min(127L, math.floor(x / s + 0.5).toLong)))
    }
    val expectedDot = codesOf(vA).zip(codesOf(vB)).map { case (a, b) => a * b }.sum
    assert(VectorKernels.dot8(blobs(idA), blobs(idB)) === expectedDot)
    // zero vector: scale 0, zero codes, dot 0
    val z = Seq((0L, Seq.fill(16)(0.0))).toDF("id", "v")
      .select(graft.functions.vec8_quantize(col("v"))).head().getAs[Array[Byte]](0)
    assert(VectorKernels.scale8(z) === 0.0 && z.drop(8).forall(_ == 0))
    assert(VectorKernels.dot8(z, blobs(idA)) === 0L)
    // dimension mismatch is loud
    val short = Seq((0L, Seq.fill(8)(1.0))).toDF("id", "v")
      .select(graft.functions.vec8_quantize(col("v"))).head().getAs[Array[Byte]](0)
    intercept[IllegalArgumentException](VectorKernels.dot8(short, blobs(idA)))
    // non-finite elements are rejected loudly (not silently coded as 0)
    val nan = intercept[Exception] {
      Seq((0L, Seq(1.0, Double.NaN))).toDF("id", "v")
        .select(graft.functions.vec8_quantize(col("v"))).collect()
    }
    assert(nan.getMessage.contains("non-finite") ||
      (nan.getCause != null && nan.getCause.getMessage.contains("non-finite")))
    // subnormal magnitude (scale underflows to 0) is rejected loudly
    val tiny = intercept[Exception] {
      Seq((0L, Seq(java.lang.Double.MIN_VALUE))).toDF("id", "v")
        .select(graft.functions.vec8_quantize(col("v"))).collect()
    }
    assert(tiny.getMessage.contains("underflow") ||
      (tiny.getCause != null && tiny.getCause.getMessage.contains("underflow")))
  }

  test("vec8 top-k: recall >= 0.7 vs float brute force on clustered data; SQL names work") {
    // clustered data so quantized ranking closely tracks the float ranking
    val rnd = new scala.util.Random(11)
    val centers = Seq.fill(5)(Seq.fill(16)(rnd.nextDouble() * 2 - 1))
    val data = (0 until 200).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.map(x => x + rnd.nextGaussian() * 0.05))
    }
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 3)
    val got = Similarity.quantizedTopK(df, "vec_id", "embedding", queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    data.take(3).foreach { case (qid, qv) =>
      // float dot-product top-10 (excluding self), driver-side
      val truth = data.filter(_._1 != qid)
        .map { case (id, v) => id -> v.zip(qv).map { case (a, b) => a * b }.sum }
        .sortBy { case (id, d) => (-d, id) }.take(10).map(_._1).toSet
      val overlap = got(qid).intersect(truth).size / 10.0
      assert(overlap >= 0.7, s"query $qid recall $overlap")
    }
    // SQL surface
    graft.sql.Registry.register(SparkTestBase.spark)
    df.createOrReplaceTempView("v8t")
    val sqlDot = SparkTestBase.spark.sql(
      """SELECT vec8_dot(vec8_quantize(a.embedding), vec8_quantize(b.embedding)) AS d,
        |       vec8_scale(vec8_quantize(a.embedding)) AS s
        |FROM v8t a JOIN v8t b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin).head()
    assert(sqlDot.getLong(0) != 0L && sqlDot.getDouble(1) > 0.0)
  }

  test("vec_cosine == the HOF formulation bit-for-bit, incl. edge cases") {
    // the exact zip_with/transform/aggregate chain vec_cosine replaced
    def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))
      val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, v) => acc + v))
      when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot / (na * nb))
    }
    val rnd = new scala.util.Random(11)
    val pairs: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] =
      (0 until 300).map { i =>
        val dim = 1 + rnd.nextInt(8)
        def vec(d: Int): Seq[java.lang.Double] = (0 until d).map { _ =>
          java.lang.Double.valueOf(rnd.nextDouble() * 2 - 1) }
        i % 10 match {
          case 7 => (Seq.fill(3)(java.lang.Double.valueOf(0.0)), vec(3)) // zero norm
          case 8 => (vec(dim), vec(dim + 1)) // length mismatch
          case 9 => // null element
            val v = vec(dim).updated(0, null.asInstanceOf[java.lang.Double])
            (v, vec(dim))
          case _ => (vec(dim), vec(dim))
        }
      }
    val df = pairs.toDF("a", "b").repartition(3)
      .select(
        graft.functions.vec_cosine(col("a"), col("b")).as("k"),
        hofCosine(col("a"), col("b")).as("h"))
    val rows = df.collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null mismatch at row $i: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)), s"value at row $i: $r")
    }
    // float inputs widen exactly: kernel on floats == HOF on the cast copy
    val fpairs = (0 until 100).map { _ =>
      (Seq.fill(6)(rnd.nextFloat()), Seq.fill(6)(rnd.nextDouble() * 2 - 1)) }
    val fr = fpairs.toDF("af", "b").repartition(2)
      .select(
        graft.functions.vec_cosine(col("af"), col("b")).as("k"),
        hofCosine(transform(col("af"), x => x.cast("double")), col("b")).as("h"))
      .collect()
    fr.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // SQL name
    graft.sql.Registry.register(SparkTestBase.spark)
    val sqlV = SparkTestBase.spark.sql(
      "SELECT vec_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d))").head().getDouble(0)
    assert(sqlV === 1.0)
  }

  test("null array elements are rejected loudly, null vectors yield null") {
    val err = intercept[Exception] {
      Seq(Seq[java.lang.Double](1.0, null, 3.0)).toDF("v")
        .repartition(1)
        .select(graft.functions.lsh_signature(col("v"), 8)).collect()
    }
    assert(err.getMessage.contains("NULL") || err.getCause != null)
    val r = Seq[Seq[Double]](null).toDF("v")
      .select(graft.functions.lsh_signature(col("v"), 8)).head()
    assert(r.isNullAt(0))
  }

  test("ANN plans contain no ScalaUDF and stay inside whole-stage codegen") {
    val df = randVecs(300, 16).toDF("vec_id", "embedding").repartition(2)
    val plans = Seq(
      "lshBuckets" -> Similarity.lshBuckets(df, "embedding", "vec_id", 10),
      "ivfIndex" -> Similarity.ivfIndex(df, "embedding", "vec_id",
        Array(Array.fill(16)(0.1), Array.fill(16)(-0.1))),
      "embeddingPairs" -> Dedup.embeddingPairs(df, "embedding", "vec_id", 0.9))
    plans.foreach { case (name, d) =>
      val optimized = d.queryExecution.optimizedPlan
      val hasUdf = optimized.exists(_.expressions.exists(_.exists {
        case _: org.apache.spark.sql.catalyst.expressions.ScalaUDF => true
        case _ => false
      }))
      assert(!hasUdf, s"$name optimized plan contains a ScalaUDF")
    }
    // the signature projection sits in a codegen stage (materialize so
    // AQE finalizes; recurse into the query stages)
    val buckets = Similarity.lshBuckets(df, "embedding", "vec_id", 10)
    buckets.collect()
    def render(p: org.apache.spark.sql.execution.SparkPlan): String = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        render(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q.toString + "\n" + render(q.plan)
      case other => other.toString + other.children.map(render).mkString
    }
    val planStr = render(buckets.queryExecution.executedPlan)
    assert(planStr.contains("*(") && !planStr.contains("ScalaUDF"),
      s"expected codegen stage without UDF in:\n$planStr")
  }

  test("kmeans + IVF recall path still works end-to-end on clustered data") {
    // clustered vectors (3 centers) — the expression-based assignment must
    // reproduce the full IVF flow
    val rnd = new scala.util.Random(11)
    val data = (0 until 300).map { i =>
      val c = i % 3
      val center = Seq.tabulate(8)(d => (c * 37 + d).toDouble / 10.0)
      (i.toLong, center.map(_ + rnd.nextGaussian() * 0.05))
    }
    val df = data.toDF("vec_id", "embedding").repartition(3)
    val cents = Similarity.kmeansCentroids(df, "embedding", "vec_id", k = 3, iters = 3)
    assert(cents.length === 3)
    val index = Similarity.ivfIndex(df, "embedding", "vec_id", cents)
    val query = data(1)._2
    val ann = Similarity.ivfTopK(index, "embedding", query, cents, 10, nprobe = 1)
    val exact = Similarity.bruteForceTopK(df, "embedding", "vec_id", query, 10)
    assert(Similarity.recallAtK(ann, exact) >= 0.9)
  }
}
