package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scale receipt for the NN-Descent k-NN graph (one full build on a
  * MakeBig embeddings table), plus the per-job profile the r18
  * optimization is judged by (guide §1): every Spark job's wall-clock
  * and its stages' shuffle read/write bytes. knnGraph runs one eager
  * localCheckpoint per phase (vecs, init edges, each iteration), so the
  * job sequence maps 1:1 onto the algorithm's phases and the shuffle
  * totals attribute the cost — the vector-payload shuffles the r18
  * broadcast rewrite removes are visible here as GB-scale rows. */
object KnnBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfbig")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-job wall + per-stage shuffle bytes, keyed back to jobs
    val stageShuffle = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    val jobStages = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStages.put(js.jobId, js.stageIds)
        jobStart.put(js.jobId, js.time)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.remove(je.jobId)
        jobs.add((je.jobId, je.time - t0))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) stageShuffle.put(sc.stageInfo.stageId,
          (m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten))
      }
    })
    // box-speed calibration probe (same pinned kernel as Bench.scala):
    // cross-run comparisons divide by this to separate code wins from
    // box drift — measured drift on this sandbox within one hour was
    // ~1.8× on identical code
    val calib = (0 until 3).map { _ =>
      val c0 = System.nanoTime()
      spark.range(0L, 400000000L, 1L, 32)
        .selectExpr("sum(pmod(xxhash64(id), 1000000))").collect()
      (System.nanoTime() - c0) / 1e9
    }.min
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val t0 = System.nanoTime()
    val n = graft.operators.Ann.knnGraph(emb, "vec_id", "embedding", k, iters)
      .queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain
    import scala.jdk.CollectionConverters._
    var totR = 0L; var totW = 0L
    println(f"${"job"}%5s ${"sec"}%8s ${"shufRead"}%12s ${"shufWrite"}%12s")
    jobs.asScala.toSeq.sortBy(_._1).foreach { case (jid, ms) =>
      val (r, w) = jobStages.getOrDefault(jid, Seq.empty)
        .flatMap(s => Option(stageShuffle.get(s)))
        .foldLeft((0L, 0L)) { case ((ar, aw), (br, bw)) => (ar + br, aw + bw) }
      totR += r; totW += w
      println(f"$jid%5d ${ms / 1000.0}%8.2f ${r / 1e9}%10.3f GB ${w / 1e9}%10.3f GB")
    }
    println(f"TOTAL shufRead=${totR / 1e9}%.3f GB shufWrite=${totW / 1e9}%.3f GB peakRss=${Bench.peakRssGb}%.1f GB")
    println(f"KNN rows=$n sec=$sec%.1f k=$k iters=$iters calib=$calib%.3f")
    spark.stop()
  }
}
