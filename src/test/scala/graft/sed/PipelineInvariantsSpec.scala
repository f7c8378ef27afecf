package graft.sed

import graft.{SparkEntry, SparkSpecBase}
import org.apache.spark.sql.functions._

/** Structural invariants of the round-5 pipeline queries — properties the
  * DuckDB hash-match cannot express (it proves Spark == oracle, not that
  * both compute the *intended* thing). */
class PipelineInvariantsSpec extends SparkSpecBase {

  test("q_stream_index_ingest: the stream-built IVF index searches identically to the batch entry") {
    import spark.implicits._
    val viaStream = SparkEntry.queries("q_stream_index_ingest")(spark, Sf)
      .as[(Long, Long, Double, Long)].collect().toSet
    val viaBatch = SparkEntry.queries("q_ann_ivf")(spark, Sf)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaStream.nonEmpty && viaStream == viaBatch)
  }

  test("q_source_kl: Gibbs bound holds (KL >= 0 up to per-bucket quantization)") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_source_kl")(spark, Sf)
      .select("source", "n_tokens", "kl_u").as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    // each of the 512 floored micro-unit terms loses < 1 micro, so a
    // true-zero KL can dip no lower than -512 micro
    rows.foreach { case (src, n, klU) =>
      assert(klU >= -512L, s"$src: kl_u $klU below the quantization floor")
      assert(n > 0L)
    }
    // sources are genuinely distinguishable on this corpus: at least one
    // diverges measurably
    assert(rows.map(_._3).max > 1000L)
  }

  test("q_pack_sequences: slices tile each document exactly and respect the pack budget") {
    import graft.functions.TextFunctions.tokens
    val packs = SparkEntry.queries("q_pack_sequences")(spark, Sf).cache()
    val w = 128L

    // each slice is non-empty and no longer than the pack budget
    assert(packs.filter(col("tok_end") <= col("tok_start")).count() == 0)
    assert(packs.filter(col("tok_end") - col("tok_start") > w).count() == 0)

    // per document: slices are disjoint, contiguous from 0, and sum to n_tok
    val docTok = documents
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
      .filter(col("n_tok") >= 1)
    val tiled = packs.groupBy("doc_id").agg(
      sum(col("tok_end") - col("tok_start")).as("covered"),
      min("tok_start").as("first_start"),
      max("tok_end").as("last_end"),
      count(lit(1)).as("n_slices"))
      .join(docTok, "doc_id")
    assert(tiled.filter(col("covered") =!= col("n_tok")).count() == 0,
      "slice lengths must sum to the doc's token count")
    assert(tiled.filter(col("first_start") =!= 0 || col("last_end") =!= col("n_tok")).count() == 0)
    // every tokenized document appears
    assert(tiled.count() == docTok.count())

    // per (source, pack): assigned token mass never exceeds the budget
    val packLoad = packs.groupBy("source", "pack_id")
      .agg(sum(col("tok_end") - col("tok_start")).as("load"))
    assert(packLoad.filter(col("load") > w).count() == 0)
    // and every pack except the last of each source is exactly full
    val lastPack = packs.groupBy("source").agg(max("pack_id").as("last"))
    val full = packLoad.join(lastPack, "source")
      .filter(col("pack_id") < col("last"))
    assert(full.filter(col("load") =!= w).count() == 0,
      "interior packs must be exactly full")
    packs.unpersist()
  }

  test("q_decontaminate: eval docs excluded, verbatim copies of eval docs flagged") {
    val out = SparkEntry.queries("q_decontaminate")(spark, Sf).cache()
    // no eval (doc_id % 97 == 0) rows in the output
    assert(out.filter(col("doc_id") % 97 === 0).count() == 0)
    assert(out.filter(col("n_contam") < 0).count() == 0)

    // ground truth: a train doc sharing its full text with an eval doc
    // (the documents fixture is near-duplicate-heavy) must be flagged
    val ev = documents.filter(col("doc_id") % 97 === 0).select(col("text").as("et"))
    val copies = documents.filter(col("doc_id") % 97 =!= 0)
      .join(ev, col("text") === col("et"))
      .select("doc_id").distinct()
    val missed = copies.join(out.filter(col("n_contam") > 0), Seq("doc_id"), "left_anti")
    if (copies.count() > 0)
      assert(missed.count() == 0, "verbatim eval copies must have n_contam > 0")
    out.unpersist()
  }

  test("q_cluster_assign: clusters partition the corpus, cohesion bounded by membership") {
    val out = SparkEntry.queries("q_cluster_assign")(spark, Sf).cache()
    val total = out.agg(sum("n_members")).head().getLong(0)
    assert(total == embeddings.count(), "every vector must land in exactly one cluster")
    // cohesion is a sum of per-member cosines in micro-units: |cos| <= 1
    assert(out.filter(abs(col("cohesion_u")) > col("n_members") * 1000000L).count() == 0)
    // the exemplar is a member id, so it can't precede the smallest vec_id
    val minId = embeddings.agg(min("vec_id")).head().getLong(0)
    assert(out.filter(col("exemplar") < minId).count() == 0)
    out.unpersist()
  }

  test("q_distinct_users_approx: HLL estimate within 5x rsd of the exact count") {
    val approx = SparkEntry.queries("q_distinct_users_approx")(spark, Sf)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_users_approx")).toMap
    val exact = SparkEntry.queries("q_distinct_users")(spark, Sf)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_users")).toMap
    assert(approx.keySet === exact.keySet && approx.nonEmpty)
    approx.foreach { case (k, a) =>
      val e = exact(k).toDouble
      assert(math.abs(a - e) <= math.max(e * 0.10, 2.0),
        s"$k: approx $a vs exact $e drifts past 5x the 2% rsd")
    }
  }

  test("q_heavy_hitters_approx: CMS never under-estimates, over-estimate eps-bounded") {
    import graft.functions.TextFunctions.tokens
    val est = SparkEntry.queries("q_heavy_hitters_approx")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.nonEmpty)
    val toks = documents.select(explode(tokens(col("text"))).as("tok"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    est.foreach { case (t, e) =>
      val c = exact(t)
      assert(e >= c, s"CMS under-estimated '$t': $e < $c")
      val bound = math.max((0.0001 * total).ceil.toLong, 1L)
      assert(e - c <= bound, s"'$t' over-estimate ${e - c} exceeds eps*N")
    }
  }

  test("Lm.knScore matches the hand-computed Kneser-Ney probabilities on a planted corpus") {
    import spark.implicits._
    // corpus: doc1 = "a b a b" -> bigrams (a b) x2, (b a); doc2 = "a c"
    // bigram types T = 3; c(a)=3, N1+(a.)=2; c(b)=1, N1+(b.)=1;
    // continuation counts N1+(.b)=N1+(.a)=N1+(.c)=1
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val d = 0.75
    def lpU(p: Double): Long =
      math.floor(BigDecimal(math.log(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 1000000 + 0.5).toLong
    val pBgivenA = (2 - d) / 3 + (d * 2 / 3) * (1.0 / 3) // 0.58333...
    val pAgivenB = (1 - d) / 1 + (d * 1 / 1) * (1.0 / 3) // 0.5
    val pCgivenA = (1 - d) / 3 + (d * 2 / 3) * (1.0 / 3) // 0.25
    // KN redistributes mass: per-context probability over OBSERVED
    // successors stays below 1 (the held-back mass goes to unseen words)
    assert(pBgivenA + pCgivenA < 1.0 && pAgivenB < 1.0)
    val byDoc = graft.operators.Lm.knScore(docs, "doc_id", "text", d)
      .select("doc_id", "n_bigrams", "lp_u").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byDoc(1L) == ((3L, 2 * lpU(pBgivenA) + lpU(pAgivenB))))
    assert(byDoc(2L) == ((1L, lpU(pCgivenA))))
  }

  test("q_lm_kn: negative scores, duplicate texts identical, discount shifts scores vs MLE") {
    val kn = SparkEntry.queries("q_lm_kn")(spark, Sf).cache()
    assert(kn.count() > 0)
    assert(kn.filter(col("avg_lp") >= 0).count() == 0)
    val dups = documents.select(col("doc_id"), md5(col("text")).as("h"))
      .join(kn, "doc_id")
      .groupBy("h").agg(countDistinct("lp_u", "n_bigrams").as("nd"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(dups.filter(col("nd") =!= 1).count() == 0,
      "duplicate texts must score identically under KN")
    // smoothing is real: KN and MLE disagree on the bulk of the corpus
    val mle = SparkEntry.queries("q_lm_score")(spark, Sf)
      .select(col("doc_id"), col("lp_u").as("lp_mle"))
    val differing = kn.join(mle, "doc_id").filter(col("lp_u") =!= col("lp_mle")).count()
    assert(differing > kn.count() / 2, s"KN should shift scores, only $differing docs differ")
    kn.unpersist()
  }

  test("q_lm_score: log-probs negative, duplicate texts score identically") {
    val out = SparkEntry.queries("q_lm_score")(spark, Sf).cache()
    assert(out.count() > 0)
    // MLE log-probabilities are strictly negative unless a bigram owns
    // the whole corpus
    assert(out.filter(col("avg_lp") > 0).count() == 0)
    // identical text => identical bigram stream => identical score
    val dups = documents.select(col("doc_id"), md5(col("text")).as("h"))
      .join(out, "doc_id")
      .groupBy("h").agg(countDistinct("lp_u", "n_bigrams").as("nd"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(dups.filter(col("nd") =!= 1).count() == 0,
      "duplicate texts must score identically")
    out.unpersist()
  }

  test("q_pca_project: deterministic across runs and variance-ordered") {
    val p1 = SparkEntry.queries("q_pca_project")(spark, Sf)
    val p2 = SparkEntry.queries("q_pca_project")(spark, Sf)
    assert(p1.collect().toSet == p2.collect().toSet, "projection must be reproducible")
    val stats = p1.agg(var_samp("p1"), var_samp("p2")).head()
    assert(stats.getDouble(0) >= stats.getDouble(1))
  }

  test("q_percentiles_approx: sketch quantiles stay within rank-error of exact") {
    val approx = SparkEntry.queries("q_percentiles_approx")(spark, Sf)
      .collect().map(r => r.getAs[Any]("event_type") ->
        (r.getAs[Double]("p50_approx"), r.getAs[Double]("p95_approx"))).toMap
    val exact = SparkEntry.queries("q_percentiles")(spark, Sf)
      .collect().map(r => r.getAs[Any]("event_type") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    assert(approx.keySet === exact.keySet && approx.nonEmpty)
    // per-group value spread normalizes the error bound: at accuracy
    // 10000 the rank error is ~1/10000, far under 1% of the spread on
    // this data; 5% is a loose, stable ceiling
    import org.apache.spark.sql.functions._
    val spreads = graft.sed.Tables.events(spark, Sf)
      .groupBy("event_type").agg((max("value") - min("value")).as("spread"))
      .collect().map(r => r.getAs[Any]("event_type") -> r.getAs[Double]("spread")).toMap
    approx.foreach { case (k, (a50, a95)) =>
      val (e50, e95) = exact(k)
      val tol = spreads(k) * 0.05
      assert(math.abs(a50 - e50) <= tol, s"$k p50: $a50 vs $e50 (tol $tol)")
      assert(math.abs(a95 - e95) <= tol, s"$k p95: $a95 vs $e95 (tol $tol)")
    }
  }
}
