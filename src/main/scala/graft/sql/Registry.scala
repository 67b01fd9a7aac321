package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType

import graft.expr._

/** SQL-name registration for the sketch functions, so `spark.sql("SELECT
  * bloom_agg(key, 1000, 0.01) FROM t")` works.
  *
  * Two entry points:
  *   - [[GraftExtensions]] for `spark.sql.extensions=graft.sql.GraftExtensions`
  *     (config-time injection, the spark-submit path);
  *   - [[Registry.register]] for an already-built session (tests, notebooks).
  */
object Registry {

  /** (name, builder) for every SQL-exposed function. Aggregates are
    * returned unwrapped — the analyzer wraps AggregateFunction in
    * AggregateExpression during resolution.
    */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "abloom_key_hash" -> { args => AbloomKeyHash(args.head) },
    "bloom_agg" -> { args =>
      require(args.size == 2 || args.size == 3, "bloom_agg(key, capacity[, fp_rate])")
      val fp = if (args.size == 3) args(2)
        else org.apache.spark.sql.catalyst.expressions.Literal(0.01) // reference default
      BloomFilterAgg(AbloomKeyHash(args(0)), args(1), fp)
    },
    "bloom_contains" -> { args =>
      require(args.size == 2, "bloom_contains(filter, key)")
      BloomMightContain(args(0), AbloomKeyHash(args(1)))
    },
    "bloom_union" -> { args =>
      require(args.size == 2, "bloom_union(a, b)")
      BloomUnion(args(0), args(1))
    },
    "bloom_union_agg" -> { args => BloomUnionAgg(args.head) },
    "bloom_describe" -> { args => BloomDescribe(args.head) },
    "bloom_is_empty" -> { args => BloomIsEmpty(args.head) },
    "bloom_cardinality_estimate" -> { args => BloomCardinalityEstimate(args.head) },
    "bloom_intersect_estimate" -> { args =>
      require(args.size == 2, "bloom_intersect_estimate(a, b)")
      BloomIntersectEstimate(args(0), args(1))
    },
    // cbf_agg(key, capacity[, fp_rate]) = insert-only, MATCHING the Scala
    // API's argument order; the weighted form has its own name so the SQL
    // 3-arg call can never silently bind capacity as a per-row weight.
    "cbf_agg" -> { args =>
      require(args.size == 2 || args.size == 3, "cbf_agg(key, capacity[, fp_rate])")
      val fp = if (args.size == 3) args(2)
        else org.apache.spark.sql.catalyst.expressions.Literal(0.01)
      CbfAgg(AbloomKeyHash(args(0)),
        org.apache.spark.sql.catalyst.expressions.Literal(1), args(1), fp)
    },
    "cbf_agg_weighted" -> { args =>
      require(args.size == 3 || args.size == 4,
        "cbf_agg_weighted(key, weight, capacity[, fp_rate])")
      val fp = if (args.size == 4) args(3)
        else org.apache.spark.sql.catalyst.expressions.Literal(0.01)
      CbfAgg(AbloomKeyHash(args(0)),
        Cast(args(1), org.apache.spark.sql.types.IntegerType), args(2), fp)
    },
    "cbf_union_agg" -> { args => CbfUnionAgg(args.head) },
    "cbf_contains" -> { args =>
      require(args.size == 2, "cbf_contains(filter, key)")
      CbfContains(args(0), AbloomKeyHash(args(1)))
    },
    "cbf_count" -> { args =>
      require(args.size == 2, "cbf_count(filter, key)")
      CbfCount(args(0), AbloomKeyHash(args(1)))
    },
    "sbf_agg" -> { args =>
      require(args.size == 1 || args.size == 3, "sbf_agg(key[, initial_capacity, fp_rate])")
      val cap = if (args.size == 3) args(1)
        else org.apache.spark.sql.catalyst.expressions.Literal(4096L)
      val fp = if (args.size == 3) args(2)
        else org.apache.spark.sql.catalyst.expressions.Literal(0.001)
      SbfAgg(AbloomKeyHash(args(0)), cap, fp)
    },
    "sbf_union_agg" -> { args => SbfUnionAgg(args.head) },
    "sbf_contains" -> { args =>
      require(args.size == 2, "sbf_contains(filter, key)")
      SbfContains(args(0), AbloomKeyHash(args(1)))
    },
    "sbf_describe" -> { args => SbfDescribe(args.head) },
    "hll_agg" -> { args =>
      val p = if (args.size > 1) args(1)
        else org.apache.spark.sql.catalyst.expressions.Literal(graft.core.Hll.DefaultP)
      HllAgg(AbloomKeyHash(args(0)), p)
    },
    "hll_union_agg" -> { args => HllUnionAgg(args.head) },
    "kmv_agg" -> { args =>
      val k = if (args.size > 1) args(1)
        else org.apache.spark.sql.catalyst.expressions.Literal(graft.core.Kmv.DefaultK)
      KmvAgg(AbloomKeyHash(args(0)), k)
    },
    "kmv_union_agg" -> { args => KmvUnionAgg(args.head) },
    "kmv_estimate" -> { args => KmvEstimate(args.head) },
    "kmv_sample_agg" -> { args =>
      require(args.size >= 2, "kmv_sample_agg(key, payload[, k])")
      val k = if (args.size > 2) args(2)
        else org.apache.spark.sql.catalyst.expressions.Literal(graft.core.Kmv.DefaultK)
      KmvSampleAgg(AbloomKeyHash(args(0)), args(1), k)
    },
    "kmv_sample_union_agg" -> { args => KmvSampleUnionAgg(args.head) },
    "kmv_sample_estimate" -> { args => KmvSampleEstimate(args.head) },
    "kmv_sample_values" -> { args => KmvSampleValues(args.head) },
    "kmv_sample_describe" -> { args => KmvSampleDescribe(args.head) },
    "weighted_sample_agg" -> { args =>
      require(args.size >= 3, "weighted_sample_agg(key, weight, payload[, k])")
      val k = if (args.size > 3) args(3)
        else org.apache.spark.sql.catalyst.expressions.Literal(graft.core.Kmv.DefaultK)
      WeightedSampleAgg(AbloomKeyHash(args(0)),
        Cast(args(1), org.apache.spark.sql.types.DoubleType), args(2), k)
    },
    "weighted_sample_union_agg" -> { args => WeightedSampleUnionAgg(args.head) },
    "weighted_sample_entries" -> { args => WeightedSampleEntries(args.head) },
    "weighted_sample_describe" -> { args => WeightedSampleDescribe(args.head) },
    "kmv_intersect_estimate" -> { args =>
      require(args.size == 2, "kmv_intersect_estimate(a, b)")
      KmvIntersectEstimate(args(0), args(1))
    },
    "kmv_describe" -> { args => KmvDescribe(args.head) },
    "hll_estimate" -> { args => HllEstimate(args.head) },
    "hll_intersect_estimate" -> { args =>
      require(args.size == 2, "hll_intersect_estimate(a, b)")
      HllIntersectEstimate(args(0), args(1))
    },
    "cms_agg" -> { args =>
      require(args.size == 3, "cms_agg(key, eps, delta)")
      CmsAgg(AbloomKeyHash(args(0)), args(1), args(2))
    },
    "cms_union_agg" -> { args => CmsUnionAgg(args.head) },
    "cms_query" -> { args =>
      require(args.size == 2, "cms_query(sketch, key)")
      CmsQuery(args(0), AbloomKeyHash(args(1)))
    },
    "cms_inner_product" -> { args =>
      require(args.size == 2, "cms_inner_product(a, b)")
      CmsInnerProduct(args(0), args(1))
    },
    "tdigest_agg" -> { args =>
      val c = if (args.size > 1) args(1)
        else org.apache.spark.sql.catalyst.expressions.Literal(graft.core.TDigest.DefaultCompression)
      TDigestAgg(Cast(args(0), DoubleType), c)
    },
    "tdigest_union_agg" -> { args => TDigestUnionAgg(args.head) },
    "tdigest_quantile" -> { args => TDigestQuantile(args(0), Cast(args(1), DoubleType)) },
    "tdigest_cdf" -> { args => TDigestCdf(args(0), Cast(args(1), DoubleType)) },
    "kll_agg" -> { args =>
      val k = if (args.size > 1) args(1)
        else org.apache.spark.sql.catalyst.expressions.Literal(graft.core.Kll.DefaultK)
      KllAgg(Cast(args(0), DoubleType), k)
    },
    "kll_union_agg" -> { args => KllUnionAgg(args.head) },
    "mg_agg" -> { args =>
      require(args.size == 2, "mg_agg(key, k)")
      MgAgg(args(0), args(1))
    },
    "mg_union_agg" -> { args => MgUnionAgg(args.head) },
    "mg_topk" -> { args =>
      require(args.size == 2, "mg_topk(sketch, m)")
      MgTopK(args(0), Cast(args(1), org.apache.spark.sql.types.IntegerType))
    },
    "kll_quantile" -> { args => KllQuantile(args(0), Cast(args(1), DoubleType)) },
    "kll_rank" -> { args => KllRank(args(0), Cast(args(1), DoubleType)) },
    "doc_fingerprint" -> { args =>
      require(args.size == 1, "doc_fingerprint(text)")
      DocFingerprint(args.head)
    },
    "lang_id" -> { args =>
      require(args.size == 1, "lang_id(text)")
      LangId(args.head)
    },
    "text_repetition" -> { args =>
      require(args.size == 1, "text_repetition(text)")
      TextRepetition(args.head)
    },
    "gopher_signals" -> { args =>
      require(args.size == 1, "gopher_signals(text)")
      GopherSignals(args.head)
    },
    "shingle_hashes" -> { args =>
      require(args.size == 2, "shingle_hashes(text, n)")
      ShingleHashes(args(0), foldableInt(args(1), "n"))
    },
    "window_hashes" -> { args =>
      require(args.size == 2, "window_hashes(text, w)")
      WindowHashes(args(0), foldableInt(args(1), "w"))
    },
    "mask_spans" -> { args =>
      require(args.size == 3, "mask_spans(text, positions, w)")
      MaskSpans(args(0), args(1), foldableInt(args(2), "w"))
    },
    "minhash_signature" -> { args =>
      require(args.size == 2, "minhash_signature(hashes, k)")
      MinhashSignature(args(0), foldableInt(args(1), "k"))
    },
    "simhash64" -> { args =>
      require(args.size == 1, "simhash64(text)")
      SimhashText(args.head)
    },
    "jaccard_sorted" -> { args =>
      require(args.size == 2, "jaccard_sorted(a, b)")
      JaccardSorted(args(0), args(1))
    },
    "intersect_count_sorted" -> { args =>
      require(args.size == 2, "intersect_count_sorted(a, b)")
      IntersectCountSorted(args(0), args(1))
    },
    "lsh_signature" -> { args =>
      require(args.size == 2, "lsh_signature(vec, n_planes)")
      LshSignature(args(0), foldableInt(args(1), "n_planes"))
    },
    "lsh_table_signatures" -> { args =>
      require(args.size == 3, "lsh_table_signatures(vec, tables, bits)")
      LshTableSignatures(args(0),
        foldableInt(args(1), "tables"), foldableInt(args(2), "bits"))
    },
    "mix64" -> { args =>
      require(args.size == 1, "mix64(x)")
      Mix64(Cast(args.head, org.apache.spark.sql.types.LongType))
    },
    "vec8_quantize" -> { args =>
      require(args.size == 1, "vec8_quantize(vec)")
      Vec8Quantize(args.head)
    },
    "vec8_dot" -> { args =>
      require(args.size == 2, "vec8_dot(a, b)")
      Vec8Dot(args(0), args(1))
    },
    "vec_cosine" -> { args =>
      require(args.size == 2, "vec_cosine(a, b)")
      VecCosine(args(0), args(1))
    },
    "vec8_scale" -> { args =>
      require(args.size == 1, "vec8_scale(a)")
      Vec8Scale(args.head)
    },
    "media_meta" -> { args =>
      require(args.size == 1, "media_meta(payload)")
      MediaMetaExpr(args.head)
    },
    "media_content_stats" -> { args =>
      require(args.size == 1, "media_content_stats(payload)")
      MediaContentStats(args.head)
    },
    "media_frame_stats" -> { args =>
      require(args.size == 1, "media_frame_stats(payload)")
      MediaFrameStats(args.head)
    },
    "media_encode" -> { args =>
      require(args.size == 5, "media_encode(kind, variant, width, height, duration_ms)")
      import org.apache.spark.sql.types.{IntegerType, LongType}
      MediaEncode(args(0), Cast(args(1), LongType), Cast(args(2), IntegerType),
        Cast(args(3), IntegerType), Cast(args(4), LongType))
    },
    "topk_agg" -> { args =>
      require(args.size == 4, "topk_agg(score, id, payload, k)")
      import org.apache.spark.sql.types.{DoubleType, LongType}
      // payload is NOT cast: any Catalyst type rides opaquely
      TopKAgg(Cast(args(0), DoubleType), Cast(args(1), LongType),
        args(2), foldableInt(args(3), "k"))
        .toAggregateExpression()
    })

  private def foldableInt(e: Expression, name: String): Int = {
    require(e.foldable, s"$name must be a constant")
    e.eval() match {
      case n: Number => n.intValue()
      case d: org.apache.spark.sql.types.Decimal => d.toInt
      case other => throw new IllegalArgumentException(s"$name must be integral, got $other")
    }
  }

  /** Register all sketch functions on an existing session, plus the
    * automatic bloom join pre-filter rule (via experimental optimizations
    * — config-time sessions get it through [[GraftExtensions]] instead).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
    val rules = Seq(graft.plans.InjectBloomPreFilter, graft.plans.HoistSketchKeyHash)
    val extra = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = extra ++ rules.filterNot(extra.contains)
    val strategy = graft.plans.SketchAggStrategy(spark)
    val extraS = spark.experimental.extraStrategies
    if (!extraS.exists(_.isInstanceOf[graft.plans.SketchAggStrategy]))
      spark.experimental.extraStrategies = extraS :+ strategy
  }
}

/** `--conf spark.sql.extensions=graft.sql.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Registry.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // Pre-CBO batch: runs ONCE after the operator-optimization fixpoint
    // (stats available, no ping-pong with PushDownPredicates) — the same
    // slot Spark's own InjectRuntimeFilter effectively occupies.
    ext.injectPreCBORule(_ => graft.plans.InjectBloomPreFilter)
    ext.injectPlannerStrategy(graft.plans.SketchAggStrategy(_))
  }
}
