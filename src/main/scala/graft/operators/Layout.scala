package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout keys (Z-order / Morton interleaving).
  *
  * At 100 TB the dominant cost of a selective multi-dimensional query is
  * the scan, and parquet min/max zone pruning only skips a file when the
  * rows inside it are clustered on the filtered column. A lexicographic
  * sort clusters the FIRST sort column only; interleaving the bits of all
  * bin indices gives every dimension locality at once, so
  *
  * {{{
  * df.withColumn("z", Layout.zorderKey(Seq(binX, binY), bits = 10))
  *   .repartitionByRange(col("z")).sortWithinPartitions("z")
  *   .write.parquet(...)
  * }}}
  *
  * produces files whose min/max statistics are selective on EVERY
  * interleaved column — the layout step of a write-once/scan-forever
  * event store (the same role the reference's per-run parquet buffers
  * play for repeated binning passes over one acquisition,
  * reference: src/sed/loader/flash/buffer_handler.py:1).
  *
  * The key is pure column algebra (shift/mask/add) — whole-stage
  * codegen'd, no UDF, and no shuffle of its own.
  */
object Layout {

  /** Morton/Z-order key interleaving the low `bits` bits of the given
    * non-negative integral columns: bit `i` of `cols(c)` lands at output
    * position `i * cols.size + c`, so the total key width is
    * `cols.size * bits` bits (must fit a signed long).
    *
    * Callers bin continuous coordinates first (e.g. `floor(x / width)`),
    * clamp to `[0, 2^bits)`, and interleave the bin indices. Values with
    * bits above `bits` would alias across tiles, so they are masked off
    * explicitly — garbage-in stays local instead of scattering. */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"interleaved width ${cols.size}*$bits must be in [1, 63]")
    val n = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      bit <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), bit).bitwiseAND(lit(1L)), bit * n + ci)
    terms.reduce(_ + _)
  }

  /** The layout step itself: cluster `df` on the interleaved key of the
    * given (already-binned, non-negative) columns — range-partition into
    * `files` output partitions and sort within each, so a subsequent
    * write produces files whose min/max stats are selective on every
    * interleaved dimension. Returns the clustered frame (key dropped);
    * compose with any sink: `Layout.zOrdered(df, Seq(bx, by), 10, 256)
    * .write.parquet(...)`. One shuffle (the range exchange) — the sort
    * is partition-local. */
  def zOrdered(df: org.apache.spark.sql.DataFrame, binCols: Seq[Column],
               bits: Int, files: Int): org.apache.spark.sql.DataFrame = {
    require(files >= 1, "files must be positive")
    df.withColumn("__zkey", zorderKey(binCols, bits))
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }

  /** Deterministic training-order shuffle + sharding: every row gets a
    * pseudo-random but SEED-REPRODUCIBLE position — `key = md5(seed:id)`,
    * `shard = first32(key) mod numShards`, `pos` = rank of the key within
    * its shard. Re-running with the same seed reproduces the exact epoch
    * order (resumable training); a new seed is a fresh global shuffle
    * with no RNG state to checkpoint.
    *
    * Scale shape: this is a distributed shuffle WRITE, not a global
    * sort — one hash exchange on `shard` (numShards ≈ output file
    * count), then each shard sorts only its own rows for the in-shard
    * rank. No stage ever sees a global ordering, so the plan is flat in
    * cluster width; the skew bound is |corpus| / numShards by the
    * uniformity of md5. */
  def trainOrder(df: org.apache.spark.sql.DataFrame, idCol: String,
                 seed: String, numShards: Int): org.apache.spark.sql.DataFrame = {
    require(numShards >= 1, "numShards must be positive")
    require(!seed.contains("'"), "seed must not contain quotes")
    val key = md5(concat(lit(seed + ":"), col(idCol).cast("string")))
    val shard = conv(substring(key, 1, 8), 16, 10).cast("long") % numShards
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("shuffle_key"), col(idCol))
    df.select(col(idCol), key.as("shuffle_key"), shard.as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** DuckDB twin of [[trainOrder]] over a table with `idCol`. Enforces
    * the same quote guard as the Spark side: the seed is interpolated
    * into a SQL string literal, so an embedded quote would produce
    * broken (or silently divergent) oracle SQL. */
  def trainOrderSql(table: String, idCol: String, seed: String,
                    numShards: Int): String = {
    require(numShards >= 1, "numShards must be positive")
    require(!seed.contains("'"), "seed must not contain quotes")
    s"""SELECT $idCol, k AS shuffle_key,
        (('0x' || substr(k, 1, 8))::BIGINT % $numShards) AS shard,
        CAST(row_number() OVER (PARTITION BY ('0x' || substr(k, 1, 8))::BIGINT % $numShards
          ORDER BY k, $idCol) AS BIGINT) AS pos
        FROM (SELECT $idCol, md5('$seed:' || ($idCol)::VARCHAR) AS k FROM $table)"""
      .replaceAll("\\s+", " ")
  }

  /** DuckDB twin of [[zorderKey]] — emitted from the same loop so the
    * oracle replays the identical bit placement. */
  def zorderKeySql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      bit <- 0 until bits
    } yield s"(((CAST($c AS BIGINT) >> $bit) & 1) << ${bit * n + ci})"
    terms.mkString("(", " + ", ")")
  }
}
