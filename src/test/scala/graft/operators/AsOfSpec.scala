package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpecBase {
  import spark.implicits._

  test("asofJoin attaches the latest reading at or before each event") {
    val events = Seq((1L, 5L), (2L, 10L), (3L, 15L), (4L, 20L), (5L, 10L))
      .toDF("event_id", "ts")
    val readings = Seq((100L, 10L, 1.5), (200L, 18L, 2.5)).toDF("rid", "rts", "reading")
    val out = AsOf.asofJoin(events, readings, "ts", "rts", Seq("rid", "reading"))
      .select("event_id", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(
      1L -> None,        // before any reading
      2L -> Some(100L),  // reading at the SAME time is included (>=)
      5L -> Some(100L),  // every event at that time gets it
      3L -> Some(100L),
      4L -> Some(200L))) // superseded by the later reading
  }

  test("asofJoin matches a brute-force argmax on random data") {
    val rnd = new scala.util.Random(11)
    val ev = Seq.fill(500)((rnd.nextInt(10000).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((t, _), i) => (i.toLong, t) }
    val rd = Seq.tabulate(40)(i => (i.toLong, rnd.nextInt(10000).toLong, rnd.nextDouble()))
      .groupBy(_._2).map(_._2.maxBy(_._1)).toSeq // unique ts, max id wins
    val got = AsOf.asofJoin(ev.toDF("event_id", "ts"),
        rd.toDF("rid", "rts", "reading"), "ts", "rts", Seq("rid"))
      .select("event_id", "rid").as[(Long, Option[Long])].collect().toMap
    val expected = ev.map { case (id, t) =>
      id -> rd.filter(_._2 <= t).sortBy(r => (r._2, r._1)).lastOption.map(_._1)
    }.toMap
    assert(got == expected)
  }

  test("asofNearest picks the closer side, ties backward, edges one-sided") {
    val events = Seq((1L, 5L), (2L, 12L), (3L, 14L), (4L, 30L), (5L, 13L))
      .toDF("event_id", "ts")
    val readings = Seq((100L, 10L, 1.0), (200L, 16L, 2.0)).toDF("rid", "rts", "reading")
    val out = AsOf.asofNearest(events, readings, "ts", "rts", Seq("rid", "reading"))
      .select("event_id", "rid", "matched_ts")
      .as[(Long, Option[Long], Option[Long])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(100L), Some(10L)))) // only forward? no: 10 is after 5 -> nearest forward... backward empty
    assert(out(2L) == ((Some(100L), Some(10L)))) // |12-10|=2 < |16-12|=4
    assert(out(3L) == ((Some(200L), Some(16L)))) // |14-10|=4 > |16-14|=2
    assert(out(5L) == ((Some(100L), Some(10L)))) // tie |13-10|=|16-13| -> backward
    assert(out(4L) == ((Some(200L), Some(16L)))) // past the last reading
  }

  test("asofNearest matches a brute-force nearest on random data") {
    val rnd = new scala.util.Random(23)
    val ev = Seq.tabulate(300)(i => (i.toLong, rnd.nextInt(5000).toLong))
    val rd = Seq.tabulate(25)(i => (i.toLong, rnd.nextInt(5000).toLong, rnd.nextDouble()))
      .groupBy(_._2).map(_._2.maxBy(_._1)).toSeq
    val got = AsOf.asofNearest(ev.toDF("event_id", "ts"),
        rd.toDF("rid", "rts", "reading"), "ts", "rts", Seq("rid"))
      .select("event_id", "rid").as[(Long, Option[Long])].collect().toMap
    val expected = ev.map { case (id, t) =>
      val prev = rd.filter(_._2 <= t).sortBy(r => (r._2, r._1)).lastOption
      val next = rd.filter(_._2 >= t).sortBy(r => (r._2, -r._1)).headOption
      val pick = (prev, next) match {
        case (Some(p), Some(n)) => if (t - p._2 <= n._2 - t) Some(p) else Some(n)
        case (p, n) => p.orElse(n)
      }
      id -> pick.map(_._1)
    }.toMap
    assert(got == expected)
  }

  test("payload column collisions are rejected loudly") {
    val e = Seq((1L, 2L)).toDF("event_id", "ts")
    val r = Seq((3L, 4L)).toDF("ts", "event_id")
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(e, r, "ts", "ts", Seq("event_id"))
    }
  }
}
