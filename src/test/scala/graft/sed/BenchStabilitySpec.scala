package graft.sed

import org.scalatest.funsuite.AnyFunSuite

/** Wall-clock STABILITY gate over the committed bench artifact (round 14,
  * verdict item 1): q_image_clusters_wide shipped with a bimodal runtime —
  * 5.4 s builder median vs 27.7 s driver median, max/median spread 4.91 —
  * because AQE coalesced the pre-explode relation to one partition and the
  * whole candidate expansion ran single-threaded in the slow mode. The
  * bench has always REPORTED per-query spread (max sample / median) in
  * BENCH_LOCAL.json; this spec makes it a gate, so the next bimodal entry
  * fails the builder's own `sbt test` instead of surfacing in the driver's
  * re-run a round later.
  *
  * Threshold 2.5: box-noise spreads on sub-second entries have historically
  * reached ~2.0 even on a quiet box (the interleaved-sampling protocol
  * bounds but cannot eliminate them), while true plan-level bimodality
  * measured 4.4-4.9. An entry between 2.5 and that is worth a rerun either
  * way. The gate reads the COMMITTED artifact: rerun the bench
  * (`sbt "runMain graft.Bench"`) on a quiet box and re-commit
  * BENCH_LOCAL.json if a flagged spread was environmental. */
class BenchStabilitySpec extends AnyFunSuite {

  private val MaxSpread = 2.5

  test("no committed bench entry has a bimodal wall-clock (spread > 2.5)") {
    val path = java.nio.file.Paths.get("BENCH_LOCAL.json")
    assert(java.nio.file.Files.exists(path),
      "BENCH_LOCAL.json missing — run `sbt \"runMain graft.Bench\"` and commit it")
    val body = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    // the artifact is one flat JSON line; the spread map is
    // "spread":{"name":num,...} with no nested objects inside it
    val spreadBlock = """"spread"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(body).map(_.group(1))
      .getOrElse(fail("no spread map in BENCH_LOCAL.json"))
    val entry = """"([^"]+)"\s*:\s*([0-9.]+)""".r
    val offenders = entry.findAllMatchIn(spreadBlock)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filter(_._2 > MaxSpread)
      .toSeq.sortBy(-_._2)
    assert(offenders.isEmpty,
      s"bimodal bench entries (max/median > $MaxSpread): " +
        offenders.map { case (n, s) => f"$n=$s%.2f" }.mkString(", ") +
        " — reproduce with graft.RepeatDiag, fix or rerun on a quiet box")
  }
}
