package graft.streaming

import graft.SparkSpecBase

/** Plan-stability gate for the STREAMING entries (round 12) — the
  * counterpart of PlanAuditSpec's snapshot gate: a streaming chain's
  * physical plan exists only per micro-batch inside StreamExecution, so
  * each contract entry records its last executed micro-batch plan's
  * fingerprint while it runs (StreamingQueries.lastPlans) and this spec
  * gates the map against a committed snapshot. A silent state-store
  * re-shape, join-strategy flip, or added exchange in an ingest chain
  * fails loudly here. Bless intentional changes with
  * SPARK_GRAFT_BLESS_PLANS=1. */
class StreamPlanAuditSpec extends SparkSpecBase {

  private val snapshotPath =
    java.nio.file.Paths.get("src/test/resources/stream_plan_fingerprints.tsv")

  test("streaming micro-batch plan fingerprints match the committed snapshot") {
    val names = graft.SparkEntry.queries.keys
      .filter(_.startsWith("q_stream_")).toSeq.sorted
    names.foreach(n => graft.SparkEntry.queries(n)(spark, Sf))
    val current = names.map(n => n -> StreamingQueries.lastPlans.get(n))
    val silent = current.collect { case (n, None) => n }
    assert(silent.isEmpty, s"entries that recorded no plan: ${silent.mkString(", ")}")
    val cur = current.collect { case (n, Some(fp)) => n -> fp }
    if (sys.env.get("SPARK_GRAFT_BLESS_PLANS").contains("1")) {
      java.nio.file.Files.createDirectories(snapshotPath.getParent)
      val body = cur.map { case (n, fp) => s"$n\t$fp" }.mkString("", "\n", "\n")
      java.nio.file.Files.write(snapshotPath,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      info(s"blessed ${cur.size} streaming fingerprints into $snapshotPath")
    } else {
      assert(java.nio.file.Files.exists(snapshotPath),
        s"no committed snapshot at $snapshotPath — bless once with SPARK_GRAFT_BLESS_PLANS=1")
      val want = scala.io.Source.fromFile(snapshotPath.toFile).getLines()
        .filter(_.nonEmpty).map { l =>
          val Array(n, fp) = l.split("\t", 2); n -> fp
        }.toMap
      val missing = cur.collect { case (n, _) if !want.contains(n) => n }
      val drifted = cur.collect {
        case (n, fp) if want.contains(n) && want(n) != fp =>
          s"$n:\n  committed: ${want(n)}\n  current:   $fp"
      }
      val removed = want.keySet -- cur.map(_._1).toSet
      assert(missing.isEmpty && drifted.isEmpty && removed.isEmpty,
        s"streaming plan drift — bless intentional changes with SPARK_GRAFT_BLESS_PLANS=1\n" +
          s"new entries without snapshot: ${missing.mkString(", ")}\n" +
          s"removed entries still in snapshot: ${removed.mkString(", ")}\n" +
          s"drifted:\n${drifted.mkString("\n")}")
    }
  }
}
