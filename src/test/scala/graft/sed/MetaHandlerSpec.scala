package graft.sed

import org.scalatest.funsuite.AnyFunSuite

/** MetaHandler duplicate policies + dictionary completion (reference
  * core/metadata.py:95 add, core/config.py:226 complete_dictionary). */
class MetaHandlerSpec extends AnyFunSuite {

  private val loader: Map[String, Any] =
    Map("kind" -> "flash", "runs" -> Seq(43878.0, 43879.0),
      "daq" -> Map("prefix" -> "fl1user3", "ubid_offset" -> 5L))

  test("raise policy refuses duplicate names; overwrite replaces") {
    val m = MetaHandler().add(loader, "loader")
    intercept[MetaHandler.DuplicateEntryError] { m.add(loader, "loader") }
    val m2 = m.add(Map("kind" -> "mpes"), "loader", "overwrite")
    assert(m2("loader") === Map("kind" -> "mpes"))
  }

  test("append policy keeps both entries under numbered names") {
    val m = MetaHandler().add("a", "note").add("b", "note", "append")
      .add("c", "note", "append")
    assert(m("note") === "a" && m("note_1") === "b" && m("note_2") === "c")
  }

  test("merge policy completes recursively with existing entries winning") {
    val m = MetaHandler().add(loader, "loader")
      .add(Map("kind" -> "CHANGED", "beamline" -> "pg2",
        "daq" -> Map("prefix" -> "CHANGED", "stream" -> 2L)), "loader", "merge")
    val got = m("loader").asInstanceOf[Map[String, Any]]
    assert(got("kind") === "flash")       // existing scalar wins
    assert(got("beamline") === "pg2")     // new key added
    val daq = got("daq").asInstanceOf[Map[String, Any]]
    assert(daq("prefix") === "fl1user3" && daq("stream") === 2L)
    // dict/non-dict mismatch raises
    intercept[IllegalArgumentException] {
      MetaHandler().add(loader, "loader").add("scalar", "loader", "merge")
    }
  }

  test("json rendering is deterministic with sorted keys") {
    val j = MetaHandler().add(loader, "loader").toJson
    assert(j ===
      """{"loader":{"daq":{"prefix":"fl1user3","ubid_offset":5},""" +
        """"kind":"flash","runs":[43878,43879]}}""")
  }
}
