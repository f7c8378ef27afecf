package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level profile of ONE streaming contract entry (r17): records every
  * Spark job's (duration, description, stage count, task count) across the
  * entry's whole run — staging, per-micro-batch index work, compactions,
  * final read-back — and prints the jobs sorted by cost plus the
  * serial-vs-wall occupancy summary. The per-batch index loops issue many
  * small jobs whose SERIAL sum, not any single job, is the entry's cost;
  * this makes that visible (guide §1: decide empirically whether the time
  * is scheduling gaps, job work, or stream machinery). Usage:
  *   runMain graft.StreamJobProfile <sfDir> <query>
  */
object StreamJobProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
    // A/B hook (moved here from streamSession in r18 — profiling only,
    // NEVER read by the contract entries): semicolon-separated k=v confs.
    // Applied at BUILDER time so they land in the SparkConf and are
    // inherited by the cloned stream sessions (newSession() does not see
    // runtime conf.set on the parent); each is echoed loudly so a profile
    // run can never be mistaken for the shipped configuration. Keys the
    // entries pin in code (state partitions, provider) stay pinned.
    sys.env.get("SPARK_GRAFT_STREAM_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty =>
          System.err.println(s"[profile] conf override: $k=$v")
          builder = builder.config(k, v)
        case _ => sys.error(
          s"SPARK_GRAFT_STREAM_CONF entry '$kv' is not of the form key=value")
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0); val name = args(1)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (js.time,
          js.stageInfos.map { si =>
              val ls = si.details.split("\n").map(_.trim)
              ls.find(l => l.contains("graft.operators") || l.contains("graft.functions"))
                .orElse(ls.find(l => l.contains("graft") && !l.contains("StreamJobProfile")))
                .map(_.take(90)).getOrElse("")
            }.filter(_.nonEmpty).lastOption.getOrElse("(stream machinery)"),
          js.stageInfos.size))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) done.add((je.jobId, je.time - s._1, s._2, s._3))
      }
    })
    // warm pass then measured pass — mirrors the bench protocol
    val fn = SparkEntry.queries(name)
    fn(spark, dir).queryExecution.toRdd.count()
    done.clear()
    val t0 = System.nanoTime()
    fn(spark, dir).queryExecution.toRdd.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let trailing job-end events drain
    import scala.jdk.CollectionConverters._
    val jobs = done.asScala.toSeq
    val serial = jobs.map(_._2).sum / 1e3
    println(f"PROFILE $name wall=$wall%.2f s jobs=${jobs.size} serialJobSum=$serial%.2f s gap=${wall - serial}%.2f s")
    println("-- by final-stage call site --")
    jobs.groupBy(_._3).map { case (site, js) =>
      (js.map(_._2).sum / 1e3, js.size, site)
    }.toSeq.sortBy(-_._1).take(25).foreach { case (s, n, site) =>
      println(f"  $s%6.2f s  n=$n%3d  $site")
    }
    spark.stop()
  }
}
