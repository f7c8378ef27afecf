package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over pair lists — the PageRank companion to
  * [[Dedup.connectedComponents]] (Page et al. 1999, the classic random-
  * surfer recurrence). Rank mass identifies HUB documents in a near-dup
  * graph: a template that hundreds of near-copies link to accumulates
  * rank, where component size alone can't rank members of one clique.
  *
  * Determinism at cross-engine precision: ranks live in integer MICRO-
  * UNITS and every update is integer arithmetic — contribution
  * (pr·d_num) div (d_den·degree), teleport (1e6·(d_den−d_num)) div
  * (d_den·N) — so each iteration is exactly reproducible in any engine
  * with 64-bit integer division (the oracle unrolls the same recurrence
  * as k chained CTEs; long sums are reduction-order free). The div
  * quantization loses < 1 micro per edge per round — noise for a
  * RANKING signal, and the price of a result that hash-matches.
  *
  * Scale shape: one (src → rank) equi-join + one groupBy(dst) sum per
  * iteration, both shuffling on node id; state per round is |V| rows,
  * localCheckpointed so the iterative lineage never re-executes.
  */
object Graph {

  /** PageRank in integer micro-units over an undirected pair list
    * (a_id, b_id). Returns (id, pr_u) after `iters` rounds from a
    * uniform start; isolated nodes don't appear (no edges → no rank
    * flow, callers union them at teleport mass if needed). */
  def pagerank(pairs: DataFrame, iters: Int,
               dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampNum < dampDen)
    val fwd = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("od")).localCheckpoint(true)
    val n = deg.count() // scalar driver aggregate, never row data
    if (n == 0) // empty graph: no nodes, no rank — not a division by zero
      return deg.select(col("src").as("id"), col("od").as("pr_u"))
    val base = (1000000L * (dampDen - dampNum)) / (dampDen * n)
    var ranks = deg.select(col("src").as("id"), lit(1000000L / n).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst"),
          // integer div (not double /): mirrors DuckDB's // exactly
          expr(s"(pr * $dampNum) div ($dampDen * od)").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      ranks = deg.select(col("src").as("id"))
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"), (lit(base) + coalesce(col("s"), lit(0L))).as("pr"))
        .localCheckpoint(true)
    }
    ranks.select(col("id"), col("pr").as("pr_u"))
  }

  /** DuckDB oracle for [[pagerank]]: the same integer recurrence
    * unrolled as `iters` chained CTEs over an `edges`(src, dst)
    * relation already in scope (callers prepend their graph CTEs). */
  def pagerankSqlTail(iters: Int, dampNum: Long = 85, dampDen: Long = 100): String = {
    val teleport = s"(1000000 * ${dampDen - dampNum}) // ($dampDen * nn.n)"
    val rounds = (1 to iters).map { k =>
      s"""r$k AS (SELECT d0.src AS id, $teleport + COALESCE(c.s, 0) AS pr
          FROM deg d0 CROSS JOIN nn
          LEFT JOIN (SELECT e.dst, CAST(SUM((r.pr * $dampNum) // ($dampDen * d.od)) AS BIGINT) AS s
            FROM edges e JOIN r${k - 1} r ON r.id = e.src JOIN deg d ON d.src = e.src
            GROUP BY e.dst) c ON c.dst = d0.src)"""
    }.mkString(", ")
    s"""deg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
       nn AS (SELECT COUNT(*) AS n FROM deg),
       r0 AS (SELECT src AS id, 1000000 // nn.n AS pr FROM deg CROSS JOIN nn),
       $rounds
       SELECT id, CAST(pr AS BIGINT) AS pr_u FROM r$iters"""
  }
}
