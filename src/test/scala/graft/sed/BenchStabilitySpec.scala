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
  * Two-part threshold — ratio AND absolute excursion: box/JIT noise on
  * sub-second entries routinely throws one ~2-3 s sample in a 184-query
  * 32-thread suite (q_minhash_calibration hit spread 4.15 on a 0.72 s
  * median while converging monotonically to 1.1 s in isolation — warm-up,
  * not bimodality), while the real q_image_clusters_wide pathology was
  * median 5.4 s with a 26.5 s max. So an offender must have BOTH
  * max/median > 2.5 AND max exceeding the median by > 3 s — the class
  * where a rerun genuinely lands on either side of a plan/runtime mode.
  * The gate reads the COMMITTED artifact: rerun the bench
  * (`sbt "runMain graft.Bench"`) on a quiet box and re-commit
  * BENCH_LOCAL.json if a flagged spread was environmental. */
class BenchStabilitySpec extends AnyFunSuite {

  private val MaxSpread = 2.5
  private val MaxExcessSec = 3.0

  test("no committed bench entry has a bimodal wall-clock (spread > 2.5 and excess > 3 s)") {
    val path = java.nio.file.Paths.get("BENCH_LOCAL.json")
    assert(java.nio.file.Files.exists(path),
      "BENCH_LOCAL.json missing — run `sbt \"runMain graft.Bench\"` and commit it")
    val body = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    // the artifact is one flat JSON line; spread and queries are flat
    // name:number maps with no nested objects inside them
    def flatMap(key: String): Map[String, Double] = {
      val block = (""""""" + key + """"\s*:\s*\{([^}]*)\}""").r
        .findFirstMatchIn(body).map(_.group(1))
        .getOrElse(fail(s"no $key map in BENCH_LOCAL.json"))
      """"([^"]+)"\s*:\s*(-?[0-9.]+)""".r.findAllMatchIn(block)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
    val spread = flatMap("spread")
    val median = flatMap("queries")
    val offenders = spread.toSeq
      .filter { case (n, sp) =>
        sp > MaxSpread && median.getOrElse(n, 0.0) * (sp - 1) > MaxExcessSec
      }
      .sortBy(-_._2)
    assert(offenders.isEmpty,
      s"bimodal bench entries (max/median > $MaxSpread with > $MaxExcessSec s excess): " +
        offenders.map { case (n, s) => f"$n=$s%.2f" }.mkString(", ") +
        " — reproduce with graft.RepeatDiag, fix or rerun on a quiet box")
  }

  // A deterministic 1-in-5 slow mode is invisible to second-largest/median
  // (spread 1.0): this gate reads the round-15 per-entry (min, median, max)
  // triples and fails any SINGLE sample extreme enough that load noise is
  // implausible even once in an interleaved suite — max/median > 4 with
  // > 8 s of excess (the q_image_clusters_wide pathology was 26.5 s max on
  // a 5.4 s median; the worst observed pure-noise excursion was ~3 s).
  private val MaxSingleSpread = 4.0
  private val MaxSingleExcessSec = 8.0

  test("no committed bench entry hides an extreme single-sample excursion in its triple") {
    val path = java.nio.file.Paths.get("BENCH_LOCAL.json")
    assert(java.nio.file.Files.exists(path), "BENCH_LOCAL.json missing")
    val body = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    val block = """"triples"\s*:\s*\{(.*?)\},"plans"""".r
      .findFirstMatchIn(body).map(_.group(1))
    assert(block.isDefined,
      "no triples map in BENCH_LOCAL.json — rerun `sbt \"runMain graft.Bench\"` " +
        "(the round-15 artifact schema carries [min, median, max] per entry)")
    val triples = """"([^"]+)"\s*:\s*\[(-?[0-9.]+),(-?[0-9.]+),(-?[0-9.]+)\]""".r
      .findAllMatchIn(block.get)
      .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble, m.group(4).toDouble))
      .toMap
    assert(triples.nonEmpty, "triples map empty")
    val offenders = triples.toSeq
      .filter { case (_, (_, med, max)) =>
        med > 0 && max / med > MaxSingleSpread && max - med > MaxSingleExcessSec
      }
      .sortBy { case (_, (_, med, max)) => -(max / med) }
    assert(offenders.isEmpty,
      s"extreme single-sample excursions (max/median > $MaxSingleSpread with > " +
        s"$MaxSingleExcessSec s excess): " +
        offenders.map { case (n, (_, med, max)) => f"$n med=$med%.2f max=$max%.2f" }
          .mkString(", ") +
        " — a recurring 1-in-5 mode, reproduce with graft.RepeatDiag")
  }
}
