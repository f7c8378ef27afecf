package graft
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Stability diagnostic: run one contract query N times back-to-back in a
  * single JVM and print per-run wall-clock alongside the JVM counters that
  * distinguish the bimodal-wall-clock suspects (GC debt vs storage-block
  * accumulation vs codegen-cache eviction): GC time delta, storage memory
  * used, and the CodeGenerator cache hit/miss deltas. Usage:
  *   runMain graft.RepeatDiag <sfDir> <query> <n>
  */
object RepeatDiag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
    // extra confs for A/B hypothesis tests: SPARK_GRAFT_DIAG_CONF="k=v;k=v"
    val b = sys.env.get("SPARK_GRAFT_DIAG_CONF").map(_.split(";").toSeq)
      .getOrElse(Seq.empty)
      .foldLeft(b0)((acc, kv) => {
        val Array(k, v) = kv.split("=", 2); acc.config(k, v)
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0); val name = args(1); val n = args(2).toInt
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def storageMb: Long = {
      val s = spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum
      s / (1024 * 1024)
    }
    import org.apache.spark.metrics.source.CodegenMetrics
    def compCount: Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    def compMs: Long = {
      val s = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot
      (s.getMean * compCount / 1e0).toLong
    }
    // job-level breakdown: record every job's wall-clock so a slow run
    // can be attributed to a specific job (CC round, distinct, bucket count)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val slowJobs = scala.collection.mutable.ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("?")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = jobs.remove(je.jobId)
        if (st != null) {
          val dt = (System.nanoTime() - st._1) / 1e9
          if (dt > 1.5) slowJobs.synchronized {
            slowJobs += f"    job=${je.jobId} t=$dt%.2f desc=${st._2.take(120)}"
          }
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s)
          .getOrElse(0L) / 1e3
        if (wall > 1.5) {
          val m = si.taskMetrics
          slowJobs.synchronized {
            slowJobs += f"      stage=${si.stageId} wall=$wall%.2f tasks=${si.numTasks} " +
              f"runSum=${m.executorRunTime / 1e3}%.1f cpuSum=${m.executorCpuTime / 1e9}%.1f " +
              f"spillMB=${m.memoryBytesSpilled / 1048576} shufR=${m.shuffleReadMetrics.totalBytesRead / 1048576}MB " +
              f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1048576}MB name=${si.name.take(60)}"
            slowJobs += "      site| " + si.details.linesIterator
              .filter(_.contains("graft")).take(4).mkString(" <- ")
          }
        }
      }
    })
    // sampler: every 2 s dump any Executor task thread that is RUNNABLE,
    // so a long single-task stage names its operator in the output
    val sampler = new Thread(() => {
      while (true) {
        Thread.sleep(4000)
        // count executor threads by state and by top-of-stack signature:
        // a contended lock / memory-pool wait shows up as many threads
        // sharing one WAITING/BLOCKED frame, far more readable than
        // per-thread dumps
        val sigs = new scala.collection.mutable.HashMap[String, Int]()
        Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
          if (t.getName.startsWith("Executor task launch") && st.nonEmpty) {
            val top = st.iterator
              .find(f => !f.getClassName.startsWith("java.lang.Object") &&
                !f.getClassName.startsWith("jdk.internal.misc.Unsafe"))
              .getOrElse(st.head)
            val key = s"${t.getState} ${top.getClassName.split('.').last}.${top.getMethodName}:${top.getLineNumber}"
            sigs(key) = sigs.getOrElse(key, 0) + 1
          }
        }
        if (sigs.nonEmpty)
          println("      SAMP " + sigs.toSeq.sortBy(-_._2).take(6)
            .map { case (k, n) => s"$n x $k" }.mkString(" | "))
      }
    })
    sampler.setDaemon(true)
    if (sys.env.contains("SPARK_GRAFT_DIAG_TRACE")) sampler.start()
    var lastGc = gcMs
    var lastComp = compCount
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val rows = df.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      if (sys.env.contains("SPARK_GRAFT_DIAG_PLAN")) {
        val ep = df.queryExecution.executedPlan.toString
        ep.linesIterator.filter(l =>
          l.contains("Join") || l.contains("Exchange") || l.contains("AQE"))
          .foreach(l => println(s"      plan| ${l.take(150)}"))
      }
      val g = gcMs; val c = compCount
      println(f"run=$i t=$dt%.2f rows=$rows gc_ms=${g - lastGc} " +
        f"storage_mb=$storageMb codegen_compiles=${c - lastComp}")
      slowJobs.synchronized { slowJobs.foreach(println); slowJobs.clear() }
      lastGc = g; lastComp = c
    }
    spark.stop()
  }
}
