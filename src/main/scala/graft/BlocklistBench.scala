package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** AcMatchCounts receipt: one automaton walk for the whole pattern set
  * vs the natural baseline of one regexp_extract_all pass per pattern,
  * on the MakeBig corpus, at blocklist sizes 7, 107, and 407 (~the real
  * C4 list's size), in BOTH count modes. The point to measure is the
  * SHAPE: AC stays ~flat in |patterns| (O(text + matches) per doc) and
  * the boundary check adds only per-EMIT byte tests, the regex chain
  * grows linearly. */
object BlocklistBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("text")
    val small = Seq("value", "hash value", "slow", "fast merge", "scan group",
      "drop table", "blocklisted")
    val rng = new scala.util.Random(1110)
    val big = small ++ (0 until 100).map(_ =>
      (0 until 5 + rng.nextInt(5)).map(_ => ('a' + rng.nextInt(26)).toChar).mkString)
    val c4sz = big ++ (0 until 300).map(_ =>
      (0 until 5 + rng.nextInt(5)).map(_ => ('a' + rng.nextInt(26)).toChar).mkString)
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count() // warm
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def ac(pats: Seq[String], bound: Boolean) = docs.select(
      aggregate(org.apache.spark.sql.graft.AcMatchCounts(lower(col("text")), pats, bound),
        lit(0L), (a, x) => a + x).as("n"))
    def rx(pats: Seq[String]) = {
      // balanced sum — a linear reduce of 400+ columns overflows the
      // analyzer's recursion before the query even plans
      def bal(cs: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
        if (cs.size == 1) cs.head
        else { val (l, r) = cs.splitAt(cs.size / 2); bal(l) + bal(r) }
      docs.select(bal(pats.map(p => size(regexp_extract_all(lower(col("text")),
        lit(java.util.regex.Pattern.quote(p)), lit(0))).cast("long"))).as("n"))
    }
    for (pats <- Seq(small, big, c4sz)) {
      t(s"ac-${pats.size}")(ac(pats, bound = false))
      t(s"ac-boundary-${pats.size}")(ac(pats, bound = true))
      t(s"regex-${pats.size}")(rx(pats))
    }
    spark.stop()
  }
}
