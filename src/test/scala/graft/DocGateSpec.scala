package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-close documentation gate (VERDICT r15 what's-wrong #1): the
  * round-15 snapshot shipped with unfilled `*_PLACEHOLDER` slots in
  * SURVEY §5 — the gate numbers existed but the committed record had
  * holes. This spec fails the build whenever SURVEY.md still carries an
  * unfilled template slot, so `sbt test` green implies the snapshot is
  * complete. VERDICT/ADVICE are judge-written (and legitimately QUOTE
  * the r15 blemish), so only the builder-owned SURVEY.md is gated. */
class DocGateSpec extends AnyFunSuite {

  /** An unfilled template slot: the bare word or an UPPER_SNAKE token
    * ending in it (TESTS_..., BENCHTOTAL_...). Lowercase prose mentions
    * ("placeholder") stay legal so the gate can be described without
    * tripping itself. */
  private[graft] def placeholderSlots(text: String): Seq[String] =
    "(?:\\b[A-Z][A-Z0-9]*_)?PLACEHOLDER\\b".r.findAllIn(text).toSeq

  test("the checker demonstrably fires on a fixture with unfilled slots") {
    val fixture =
      """Final gates: sbt test TESTS_PLACEHOLDER, bench
        |BENCHTOTAL_PLACEHOLDER / 187, and a bare PLACEHOLDER too;
        |a lowercase placeholder mention is fine.""".stripMargin
    assert(placeholderSlots(fixture) ==
      Seq("TESTS_PLACEHOLDER", "BENCHTOTAL_PLACEHOLDER", "PLACEHOLDER"))
    assert(placeholderSlots("all real numbers here, placeholder prose ok").isEmpty)
  }

  /** Round-label staleness (VERDICT r16 what's-wrong #2): §5 shipped as
    * round-15 text under a "(round 15)" header for a full round. The
    * snapshot round is VERDICT.md's round + 1 (the judge's verdict
    * always lags the working round by one, including during the judge's
    * own re-run), so §5's header must carry at least that number. */
  private[graft] def surveyRound(text: String): Option[Int] =
    "## §5 Status \\(round (\\d+)\\)".r.findFirstMatchIn(text)
      .map(_.group(1).toInt)

  private[graft] def verdictRound(text: String): Option[Int] =
    "# VERDICT — round (\\d+)".r.findFirstMatchIn(text)
      .map(_.group(1).toInt)

  test("the round-label checker demonstrably fires on a stale-header fixture") {
    val staleSurvey = "## §5 Status (round 15)\nold text"
    val verdict = "# VERDICT — round 16\n..."
    assert(surveyRound(staleSurvey).contains(15))
    assert(verdictRound(verdict).contains(16))
    // stale: 15 < 16 + 1
    assert(surveyRound(staleSurvey).get < verdictRound(verdict).get + 1)
    // current: 17 >= 16 + 1
    assert(surveyRound("## §5 Status (round 17)\n").get >=
      verdictRound(verdict).get + 1)
  }

  test("SURVEY §5's round header does not lag the snapshot round") {
    val sp = java.nio.file.Paths.get("SURVEY.md")
    val vp = java.nio.file.Paths.get("VERDICT.md")
    assume(java.nio.file.Files.exists(sp) && java.nio.file.Files.exists(vp),
      "SURVEY.md / VERDICT.md not present in cwd")
    val survey = new String(java.nio.file.Files.readAllBytes(sp),
      java.nio.charset.StandardCharsets.UTF_8)
    val verdict = new String(java.nio.file.Files.readAllBytes(vp),
      java.nio.charset.StandardCharsets.UTF_8)
    val sr = surveyRound(survey)
    val vr = verdictRound(verdict)
    assert(sr.isDefined, "SURVEY.md has no '## §5 Status (round N)' header")
    assume(vr.isDefined, "VERDICT.md carries no round number")
    assert(sr.get >= vr.get + 1,
      s"SURVEY §5 is stale: header says round ${sr.get} but the working " +
        s"round is ${vr.get + 1} (VERDICT is round ${vr.get}) — rewrite §5 " +
        "as the current round's status before the round-close commit")
  }

  test("committed SURVEY.md carries no unfilled placeholder slots") {
    val p = java.nio.file.Paths.get("SURVEY.md")
    assume(java.nio.file.Files.exists(p), "SURVEY.md not present in cwd")
    val text = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val hits = placeholderSlots(text)
    assert(hits.isEmpty,
      s"SURVEY.md still contains unfilled template slots: ${hits.mkString(", ")} — " +
        "paste the real gate numbers before the round-close commit")
  }
}
