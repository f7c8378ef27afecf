package graft.sed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}

import graft.SparkSpecBase

/** Engine-wide plan-shape regression net: no driver-contract query may
  * plan a quadratic join. BroadcastNestedLoopJoin / CartesianProduct are
  * what Catalyst silently falls back to when a join loses its equality
  * key (e.g. a refactor breaks the bucketized range-join or LSH pair
  * rewrites) — correct on test data, dead at 100 TB.
  *
  * Round 9 adds the builds-gate up front: EVERY contract entry must at
  * least BUILD (analysis included — streaming entries execute their
  * feed at build time, so they are covered too). Round 8 ended with six
  * entries failing ANALYSIS on a testdata type drift, discovered as six
  * scattered exceptions across the driver artifacts; this test turns
  * the same class of break into one failure that lists the broken
  * entries by name. The shape audits then reuse the built plans.
  *
  * Exception: the mean-offset queries cross-join a broadcast 1-row
  * global aggregate (DfOps.offsetByOtherColumns) — a BNLJ whose build
  * side is a single row is linear, not quadratic. Those queries are
  * allowed a nested-loop join ONLY while every condition-free join in
  * their optimized plan provably has a grouping-key-free Aggregate on
  * one side, so the allowance cannot mask a real lost-key regression. */
class PlanAuditSpec extends SparkSpecBase {

  /** Streaming entries: they run their full (already-executed) feed at
    * build time and return a sink read-back whose plan is a plain scan —
    * the interesting plans are asserted in SedStreamingSpec. They still
    * participate in the builds-gate below. */
  private val streamEntries =
    Set("q_stream_sessionize", "q_stream_enrich", "q_stream_hist",
      "q_stream_dedup", "q_stream_neardup", "q_stream_decontam",
      "q_stream_ffill", "q_stream_funnel", "q_stream_transitions",
      "q_stream_retention", "q_stream_zscore", "q_stream_winsorize",
      "q_stream_quality")

  /** Queries whose only non-equi join is the broadcast 1-row mean. */
  private val oneRowBroadcastOk =
    Set("q_energy_offsets", "q_offset_mean", "q_tfidf", "q_lm_score",
      "q_lm_kn", "q_domain_mix", "q_bm25", "q_dsir_weight", "q_pmi_bigrams",
      "q_source_kl", "q_unigram_seed", "q_rank_fusion", "q_temperature_mix",
      // nests q_lm_kn's chain, inheriting its broadcast 1-row N1+(··) agg
      "q_ppl_buckets")

  /** Every contract entry built exactly once, failures captured. */
  private lazy val built: Seq[(String, Either[Throwable, DataFrame])] =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> (try Right(fn(spark, Sf)) catch { case e: Throwable => Left(e) })
    }

  private def builtOk: Seq[(String, DataFrame)] =
    built.collect { case (n, Right(df)) => (n, df) }

  test("every contract entry builds (analysis-clean) against the testdata") {
    val broken = built.collect { case (n, Left(e)) =>
      s"$n: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" / ")}"
    }
    assert(broken.isEmpty,
      s"${broken.size} entries fail to build:\n  ${broken.mkString("\n  ")}")
  }

  private def crossJoinsAreOneRowAggregates(df: DataFrame): Boolean = {
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    joins.filter(_.condition.isEmpty).forall { j =>
      Seq(j.left, j.right).exists {
        case a: Aggregate => a.groupingExpressions.isEmpty
        case _            => false
      }
    }
  }

  test("no driver query plans BroadcastNestedLoopJoin or CartesianProduct") {
    val offenders = builtOk.flatMap {
      case (name, _) if streamEntries(name) => None
      case (name, df) =>
        val plan = df.queryExecution.executedPlan.toString
        val quadratic =
          plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct")
        if (!quadratic) None
        else if (oneRowBroadcastOk(name) && crossJoinsAreOneRowAggregates(df)) None
        else Some(name)
    }
    assert(offenders.isEmpty, s"quadratic join in: ${offenders.mkString(", ")}")
  }

  /** A ScalaUDF boxes its inputs and breaks whole-stage codegen at the
    * exact spot it runs — the library's answer to "needs custom logic"
    * is a native Expression (FloatVecDot, Bilinear2D, SimHash32,
    * BloomMightContainLong), never a UDF. Gate every contract plan so a
    * convenience UDF can't creep back into a hot path. */
  /** Plan-stability gate (round 12): every entry's canonical physical
    * fingerprint (operator-class tree + join strategies/types + exchange
    * count — PlanFingerprint) must match the committed snapshot, so an
    * accidental BHJ→SMJ flip or an added shuffle fails LOUDLY here even
    * when wall-clock medians hide it. Fingerprints come from the
    * pre-AQE sparkPlan at the spec's fixed SF, so they are deterministic.
    * Intentional plan changes are blessed explicitly:
    * `SPARK_GRAFT_BLESS_PLANS=1 sbt "testOnly graft.sed.PlanAuditSpec"`
    * rewrites the snapshot (review the git diff — the tree text IS the
    * change record). */
  private val snapshotPath =
    java.nio.file.Paths.get("src/test/resources/plan_fingerprints.tsv")

  test("plan fingerprints match the committed snapshot (bless: SPARK_GRAFT_BLESS_PLANS=1)") {
    val current = builtOk
      .filterNot { case (n, _) => n.startsWith("q_stream_") }
      .map { case (n, df) => n -> PlanFingerprint.of(df) }
    if (sys.env.get("SPARK_GRAFT_BLESS_PLANS").contains("1")) {
      java.nio.file.Files.createDirectories(snapshotPath.getParent)
      val body = current.map { case (n, fp) => s"$n\t$fp" }.mkString("", "\n", "\n")
      java.nio.file.Files.write(snapshotPath,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      info(s"blessed ${current.size} fingerprints into $snapshotPath")
    } else {
      assert(java.nio.file.Files.exists(snapshotPath),
        s"no committed snapshot at $snapshotPath — bless once with SPARK_GRAFT_BLESS_PLANS=1")
      val want = scala.io.Source.fromFile(snapshotPath.toFile).getLines()
        .filter(_.nonEmpty).map { l =>
          val Array(n, fp) = l.split("\t", 2); n -> fp
        }.toMap
      val missing = current.collect { case (n, _) if !want.contains(n) => n }
      val drifted = current.collect {
        case (n, fp) if want.contains(n) && want(n) != fp =>
          s"$n:\n  committed: ${want(n)}\n  current:   $fp"
      }
      val removed = want.keySet -- current.map(_._1).toSet
      assert(missing.isEmpty && drifted.isEmpty && removed.isEmpty,
        s"plan drift — bless intentional changes with SPARK_GRAFT_BLESS_PLANS=1\n" +
          s"new entries without snapshot: ${missing.mkString(", ")}\n" +
          s"removed entries still in snapshot: ${removed.mkString(", ")}\n" +
          s"drifted:\n${drifted.mkString("\n")}")
    }
  }

  test("no driver query plans a ScalaUDF") {
    val offenders = builtOk.flatMap {
      case (name, _) if streamEntries(name) => None
      case (name, df) =>
        val plan = df.queryExecution.executedPlan
        val hasUdf = plan.exists(_.expressions.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF])))
        if (hasUdf) Some(name) else None
    }
    assert(offenders.isEmpty, s"ScalaUDF in: ${offenders.mkString(", ")}")
  }
}
