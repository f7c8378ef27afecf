package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Domain-mixture sampling — the data-mixing step of pre-training corpus
  * construction (DoReMi-style domain weights, RefinedWeb language mixes):
  * downsample a corpus so its domain proportions hit a target mixture,
  * without upsampling any domain.
  *
  * Waterfilling: with target micro-weights w_u(l) (int64 micro-units,
  * summing to ≤ 1_000_000) and per-domain counts n_l, the largest corpus
  * achievable without upsampling is C = min_l (n_l · 1e6 DIV w_u_l) rows;
  * each domain then keeps rate_u(l) = C · w_u_l DIV n_l ∈ [0, 1e6]
  * micro-units of its rows (the binding domain keeps exactly 1e6 — all of
  * it). Selection is a deterministic hash threshold
  * (hash32(id:domain) % 1e6 < rate_u): map-only, no RNG state, the SAME
  * rows on every run and every engine. Kept counts are binomial around
  * C·w_l (relative error ~1/√n_l — at pre-training corpus sizes, ~1e-4);
  * the alternative (exact counts via per-domain rank) needs a per-domain
  * sort whose partitions scale with domain size, a hot-partition shape
  * this operator exists to avoid. Domains absent from the mixture drop.
  *
  * Scale shape: one groupBy(domain) count (map-side partials, key
  * cardinality = |domains|), a 1-row global min broadcast, a broadcast
  * join of per-domain rates, then ONE map-only scan-level filter — no
  * window, no per-domain sort, arbitrary domain skew tolerated. All
  * arithmetic is int64 integer division (C·w_u_l ≤ n_l·1e6 by minimality
  * of C, so products stay under 2^63 below ~9e12 rows per domain).
  */
object Mixture {
  def waterfill(df: DataFrame, idCol: String, domainCol: String,
                microWeights: Seq[(String, Long)]): DataFrame = {
    require(microWeights.nonEmpty &&
      microWeights.forall { case (_, w) => w > 0 && w <= 1000000L } &&
      microWeights.map(_._2).sum <= 1000000L,
      "micro-weights must be in (0, 1e6] and sum to at most 1e6")
    val wMap = map(microWeights.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val inMix = df
      .withColumn("__w", element_at(wMap, col(domainCol)))
      .filter(col("__w").isNotNull)
    val counts = inMix.groupBy(col(domainCol), col("__w"))
      .agg(count(lit(1)).as("__n"))
    val cap = counts.agg(min(expr("__n * 1000000 DIV __w")).as("__cap"))
    val rates = counts.crossJoin(broadcast(cap))
      .select(col(domainCol), expr("__cap * __w DIV __n").as("rate_u"))
    inMix.join(broadcast(rates), Seq(domainCol))
      .filter(TextFunctions.expr_hash32(
        concat(col(idCol).cast("string"), lit(":"), col(domainCol)))
        % lit(1000000L) < col("rate_u"))
      .select(col(idCol), col(domainCol), col("rate_u"))
  }

  /** Per-domain quality-floor filtering (the CCNet-style "keep each
    * domain's top slice by classifier score" step): keep every document
    * whose integer score reaches its domain's `frac`-quantile cutoff —
    * cutoff = the smallest score whose cumulative count reaches
    * frac·n(domain), i.e. the DISCRETE quantile, always an actual score
    * value. Ties at the cutoff are all kept, so membership never hinges
    * on float interpolation — with integer scores the whole decision is
    * integer-exact and replays identically in any engine (the one
    * double, frac·n, is the same product of the same literals on both
    * sides).
    *
    * Scale shape: NO per-document sort. The quantile comes from the
    * per-domain score HISTOGRAM — one groupBy(domain, score) with
    * map-side partials (key cardinality = domains × distinct scores),
    * a window over those histogram rows (per-domain group size =
    * distinct scores, not documents), and a broadcast join of the
    * per-domain cutoffs back onto the scan — the same
    * hot-partition-free posture as [[waterfill]]. */
  def qualityFloor(docs: DataFrame, idCol: String, domainCol: String,
                   score: org.apache.spark.sql.Column, frac: Double): DataFrame = {
    require(frac > 0.0 && frac < 1.0, s"frac=$frac must be in (0, 1)")
    import org.apache.spark.sql.expressions.Window
    // scored feeds the histogram AND the final join — materialize it
    // once or the (possibly expensive) score derivation runs per
    // consumer; the checkpoint holds only (id, domain, score)
    val scored = docs.select(col(idCol), col(domainCol).as("domain"),
      score.cast("long").as("score")).localCheckpoint(true)
    val hist = scored.groupBy("domain", "score").agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy("domain").orderBy("score")
    val wAll = Window.partitionBy("domain")
    val thr = hist
      .withColumn("__cum", sum("__c").over(wCum))
      .withColumn("__n", sum("__c").over(wAll))
      .filter(col("__cum").cast("double") >= lit(frac) * col("__n").cast("double"))
      .groupBy("domain").agg(min("score").as("__cutoff"))
    scored.join(broadcast(thr), "domain")
      .filter(col("score") >= col("__cutoff"))
      .select(col(idCol), col("domain"), col("score"))
  }
}
