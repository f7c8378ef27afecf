package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.VectorFunctions

/** Document deduplication for large-scale training-data pipelines: exact
  * (content hash), MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Scale posture (the part that must survive 100 TB):
  *  - signatures/fingerprints are map-only column algebra over the in-row
  *    token array — no explode, no shuffle, whole-stage codegen;
  *  - the only shuffles are the band-bucket exchange (keys are (band,
  *    bandKey), bucket sizes bounded by the banding parameters) and the
  *    final pair `distinct`;
  *  - giant buckets (degenerate content, e.g. boilerplate) would make the
  *    in-bucket self-join quadratic, so buckets above `maxBucket` are
  *    dropped — the standard LSH skew guard: such content is better handled
  *    by the exact-hash pass that precedes it.
  */
object Dedup {

  /** Exact dedup: group identical content by md5, keep the smallest id.
    * One shuffle keyed by the 128-bit hash; partial agg collapses
    * duplicates map-side. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** The corpus restricted to one minimum-id representative per distinct
    * `key` value — the exact-dedup pre-pass every near-dup stage should
    * run behind. Pass `md5(text)` for documents (the shuffle then carries
    * a 16-byte key, not the payload) or the vector column itself for
    * embeddings. One groupBy shuffle + one semi-join; partial agg
    * collapses copies map-side, so the shuffle carries ~one row per
    * distinct value, not per copy. */
  def exactRepresentatives(docs: DataFrame, idCol: String, key: Column): DataFrame =
    docs.join(
      docs.groupBy(key).agg(min(col(idCol)).as(idCol)).select(idCol),
      Seq(idCol), "left_semi")

  /** MinHash signatures: doc id + `numHashes` signature columns s0..s{k-1}
    * over word `shingleN`-gram shingles. Map-only. The shingle hashes are
    * materialized once in their own projection (CollapseProject keeps a
    * non-cheap alias referenced k times un-inlined), so md5 runs once per
    * shingle, not once per shingle per permutation. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int, shingleN: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val sigs = (0 until numHashes).map(j =>
      element_at(col("__sigs"), j + 1).as(s"s$j"))
    // __toks is materialized as its own column: expressions inside
    // higher-order-function lambdas get no common-subexpression
    // elimination, so an inline `split` would re-run per element_at —
    // 3 regex splits per shingle instead of 1 per row.
    docs.filter(size(toks) >= shingleN)
      .withColumn("__toks", toks)
      .withColumn("__sh_hashes",
        org.apache.spark.sql.graft.ShingleHashes(col("__toks"), shingleN))
      .withColumn("__sigs",
        org.apache.spark.sql.graft.MinHashSigs(col("__sh_hashes"), numHashes))
      .select(col(idCol) +: sigs: _*)
  }

  /** LSH band keys b0..b{numBands-1}: each combines `rowsPerBand`
    * consecutive signature values. */
  def withBandKeys(sigDf: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bands = (0 until numBands).map { b =>
      TextFunctions.bandKey((0 until rowsPerBand).map(r => col(s"s${b * rowsPerBand + r}")))
        .as(s"b$b")
    }
    sigDf.select(col(sigDf.columns.head) +: bands: _*)
  }

  /** All (a < b) pairs inside each bucket, generated bucket-locally: one
    * shuffle to group, then pairs are expanded map-side from the sorted id
    * array — no self-join, and the upstream (possibly expensive) key
    * computation runs exactly once. Buckets larger than `maxBucket` are
    * dropped (LSH skew guard: degenerate boilerplate content belongs to the
    * exact-hash pass, and an unbounded bucket is a quadratic blowup). */
  private def bucketPairs(buckets: DataFrame, idCol: String,
                          keyCols: Seq[String], maxBucket: Int): DataFrame = {
    val ids = col("ids")
    buckets.groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(ids) >= 2 && size(ids) <= maxBucket)
      // two-step expansion: first one row per left element, then its
      // partners from the tail slice. Peak memory is O(bucket) per row —
      // a single flatten(transform(...)) would materialize the whole
      // O(bucket²) pair array in one value and OOM on skewed buckets.
      .select(ids, posexplode(ids).as(Seq("i", "a_id")))
      .select(col("a_id"),
        explode(slice(ids, col("i") + lit(2), size(ids) - col("i") - lit(1))).as("b_id"))
      .distinct()
  }

  /** Candidate near-dup pairs (a < b) that collide in at least one LSH
    * band. Shuffles: the (band, key) bucket exchange + the final pair
    * distinct — both bounded by the banding parameters. */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 12, rowsPerBand: Int = 3,
                        shingleN: Int = 3, maxBucket: Int = 10000): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val banded = withBandKeys(
      minhashSignatures(docs, idCol, textCol, numHashes, shingleN),
      numHashes, rowsPerBand)
    val buckets = banded.select(col(idCol),
      explode(array((0 until numBands).map(b =>
        struct(lit(b).as("band"), col(s"b$b").as("key"))): _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
    bucketPairs(buckets, idCol, Seq("band", "key"), maxBucket)
  }

  /** 32-bit SimHash fingerprint per document — map-only. Token hashes are
    * materialized once (see minhashSignatures on lambda CSE), then the
    * per-bit vote loop is the native codegen SimHash32 expression. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .withColumn("__th", org.apache.spark.sql.graft.ShingleHashes(col("__toks"), 1))
      .select(col(idCol),
        org.apache.spark.sql.graft.SimHash32(col("__th")).as("simhash"))

  /** SimHash near-dup candidate pairs at Hamming distance <= maxHamming
    * (must be <= 3): the 32-bit fingerprint splits into 4 byte bands; by
    * pigeonhole, any pair within 3 bit flips shares at least one intact
    * byte, so the band-bucket join has LOSSLESS recall — the banded
    * distributed plan returns exactly the quadratic-scan answer, at
    * bucket-local cost. Output: (a_id, b_id, hamming). */
  def simhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3, maxBucket: Int = 2000): DataFrame = {
    require(maxHamming <= 3, "4-band recall is only lossless for <= 3 flips")
    // fingerprints ride INSIDE the bucket structs, so candidate pairs are
    // verified (bit_count) the moment they're expanded — no id→fingerprint
    // joins, and the final `distinct` only sees the tiny post-filter
    // survivor set, not every raw candidate (on skewed corpora the raw
    // candidates outnumber survivors by orders of magnitude)
    val fp = simhash(docs, idCol, textCol) // (id, simhash)
    val buckets = fp.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), 8 * b).bitwiseAND(lit(255L)).as("key"))): _*)).as("bk"))
      .select(struct(col(idCol).as("id"), col("simhash").as("sh")).as("e"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val es = col("es")
    buckets.groupBy("band", "key")
      .agg(sort_array(collect_list(col("e"))).as("es")) // struct sort: id asc
      .filter(size(es) >= 2 && size(es) <= maxBucket)
      .select(es, posexplode(es).as(Seq("i", "a"))) // O(bucket) memory, see bucketPairs
      .select(col("a"),
        explode(slice(es, col("i") + lit(2), size(es) - col("i") - lit(1))).as("b"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** n-gram Jaccard similarity for every pair admitted by `pairCond`
    * (applied to the `a`/`b` aliases). Pair generation is the caller's
    * policy — in production the pairs come from [[minhashCandidates]].
    * Shingle SETS are compared by 32-bit hash, not by string: the
    * intersect/union then run over long arrays (cheap, cache-friendly),
    * identically on both engines — the standard shingling trade
    * (collisions are ~n²/2³² per doc, negligible). */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String, n: Int,
                   pairCond: (DataFrame, DataFrame) => Column): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, n)
    val a = sh.select(col(idCol).as("a_id"), col("sh").as("a_sh"))
    val b = sh.select(col(idCol).as("b_id"), col("sh").as("b_sh"))
    jaccardOf(a.join(b, pairCond(a, b)))
  }

  /** n-gram CONTAINMENT for near-superset detection: for every pair
    * admitted by `pairCond`, the fraction of the SMALLER shingle set
    * contained in the other — |A∩B| / min(|A|,|B|). Jaccard punishes a
    * short document embedded verbatim in a long one (tiny union ratio);
    * containment is the metric that catches quote-expansion, boilerplate
    * wrapping, and chunk-of-a-longer-doc duplicates (Broder's
    * resemblance vs containment split). Same hashed-sorted-set engine
    * as [[ngramJaccard]]: the intersect runs as one merge-scan over long
    * arrays, and the ratio is a division of exact integers — engine-
    * bit-identical. Returns (a_id, b_id, inter, n_a, n_b, containment).
    */
  def ngramContainment(docs: DataFrame, idCol: String, textCol: String, n: Int,
                       pairCond: (DataFrame, DataFrame) => Column): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, n)
    val a = sh.select(col(idCol).as("a_id"), col("sh").as("a_sh"))
    val b = sh.select(col(idCol).as("b_id"), col("sh").as("b_sh"))
    containmentOf(a.join(b, pairCond(a, b)))
  }

  /** [[ngramContainment]] for an explicit candidate-pair list (the LSH
    * output) — the production shape: containment evaluated ONLY on
    * bucket candidates, like [[jaccardForPairs]]. */
  def containmentForPairs(docs: DataFrame, idCol: String, textCol: String, n: Int,
                          pairs: DataFrame): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, n)
    containmentOf(pairs
      .join(sh.select(col(idCol).as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(sh.select(col(idCol).as("b_id"), col("sh").as("b_sh")), "b_id"))
  }

  private def containmentOf(joined: DataFrame): DataFrame =
    joined
      .select(col("a_id"), col("b_id"),
        // NoPushBarrier: callers filter on containment — keep the
        // merge-scan from being re-run inside a pushed-down Filter
        org.apache.spark.sql.graft.NoPushBarrier(
          org.apache.spark.sql.graft.SortedIntersectCount(col("a_sh"), col("b_sh"))).as("inter"),
        size(col("a_sh")).cast("long").as("n_a"),
        size(col("b_sh")).cast("long").as("n_b"))
      .withColumn("containment",
        col("inter").cast("double") / least(col("n_a"), col("n_b")).cast("double"))

  /** Jaccard for an explicit candidate-pair list (the LSH output) — two
    * id→shingle-set joins, similarity evaluated ONLY on candidates. */
  def jaccardForPairs(docs: DataFrame, idCol: String, textCol: String, n: Int,
                      pairs: DataFrame): DataFrame = {
    val sh = shingleSets(docs, idCol, textCol, n)
    jaccardOf(pairs
      .join(sh.select(col(idCol).as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(sh.select(col(idCol).as("b_id"), col("sh").as("b_sh")), "b_id"))
  }

  /** Sorted distinct hashed shingle set per doc (shared by the Jaccard
    * paths). Docs with < n tokens have no n-grams and are dropped —
    * without the filter, `shingles`' descending `sequence` would evaluate
    * `element_at(toks, 0)` and throw. */
  private def shingleSets(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .withColumn("__toks", TextFunctions.tokens(col(textCol))) // see minhashSignatures
      .filter(size(col("__toks")) >= n)
      .select(col(idCol),
        array_sort(array_distinct(
          org.apache.spark.sql.graft.ShingleHashes(col("__toks"), n))).as("sh"))

  private def jaccardOf(joined: DataFrame): DataFrame =
    joined
      .select(col("a_id"), col("b_id"),
        // NoPushBarrier: callers filter on jaccard (>= threshold); without
        // the barrier that predicate is pushed below this projection and
        // re-runs the intersect merge-scan a second time per pair
        org.apache.spark.sql.graft.NoPushBarrier(
          org.apache.spark.sql.graft.SortedIntersectCount(col("a_sh"), col("b_sh"))).as("inter"),
        (size(col("a_sh")) + size(col("b_sh"))).cast("long").as("__sum"))
      // |A ∪ B| = |A| + |B| − |A ∩ B| — avoids materializing the union
      .withColumn("uni", col("__sum") - col("inter")).drop("__sum")
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .select("a_id", "b_id", "inter", "uni", "jaccard")

  /** Connected components over a near-dup pair graph (a_id, b_id) by
    * iterated min-label propagation: every node takes the minimum label in
    * its neighbourhood until fixpoint. Converges in O(component diameter)
    * rounds — near-dup clusters are small and dense, so a handful; each
    * round is one shuffle over the edge list. This is the standard
    * large-scale "collapse duplicate clusters" step after LSH+verify. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // undirected edge list, materialized ONCE: its lineage (often a full
    // LSH+verify pipeline) would otherwise be recomputed by every
    // propagation round and convergence check
    val fwd = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("src").as("id"), col("src").as("label"))
      .union(edges.select(col("dst").as("id"), col("dst").as("label")))
      .groupBy("id").agg(min("label").as("label"))
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // candidate labels: own + every neighbour's current label
      val viaNeighbor = edges.join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("label"))
      // checkpoint FIRST (cuts the iterative lineage and materializes the
      // propagation shuffle once), then the convergence check reads the
      // materialized result instead of recomputing the aggregation
      val next = labels.select("id", "label").union(viaNeighbor)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(true)
      val changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.label") =!= col("o.label")).limit(1).count()
      labels = next
      converged = changed == 0
      it += 1
    }
    labels
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR rounds
    * (Kiveris et al. 2014, "Connected Components in MapReduce and
    * Beyond") — the O(log² n)-round alternative to
    * [[connectedComponents]]' min-label propagation, whose round count
    * is O(component DIAMETER): equivalent on the dense ~50-wide cliques
    * near-dup verify emits, decisively better on chain-shaped clusters
    * (a 200-node path converges in ~6 star rounds vs ~200 propagation
    * rounds — each round a full shuffle). Both produce identical
    * (id, label = component min) tables; CcStarSpec pins the equality.
    *
    * Per round: large-star connects every neighbor ABOVE each center to
    * the center's neighborhood min (one groupBy + one join over the
    * bidirected edges); small-star connects each node's BELOW-neighbors
    * and itself to their min (one groupBy + one join over the canonical
    * hi>lo edges). Edge count never grows above the input's, every
    * round localCheckpoints (iterative lineage), fixpoint = the edge
    * set is unchanged — at which point each component is a star rooted
    * at its minimum. Returns (labels, rounds). */
  def connectedComponentsStarRounds(pairs: DataFrame, maxIter: Int = 50)
      : (DataFrame, Int) = starRoundsCanonical(pairs
      .select(greatest(col("a_id"), col("b_id")).as("hi"),
        least(col("a_id"), col("b_id")).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct().localCheckpoint(true), maxIter)

  /** [[connectedComponentsStarRounds]] over an ALREADY-canonical
    * (hi > lo, distinct, materialized) edge list — shared with
    * [[connectedComponentsAuto]]'s distributed fallback so the edges it
    * canonicalized for the size probe are not re-shuffled. */
  private def starRoundsCanonical(canonical: DataFrame, maxIter: Int)
      : (DataFrame, Int) = {
    var e = canonical
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      // large-star: center src, m = min(N(src) ∪ {src}); (dst, m) for dst > src
      val b = e.select(col("hi").as("src"), col("lo").as("dst"))
        .union(e.select(col("lo").as("src"), col("hi").as("dst")))
      val mins = b.groupBy("src").agg(min("dst").as("__mn"))
        .select(col("src"), least(col("src"), col("__mn")).as("__m"))
      val ls = b.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("hi"), col("__m").as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()
      // small-star: center hi over canonical edges, m = min of its lower
      // neighborhood; (hi, m) and (lo, m) — all canonical by m's minimality
      val smins = ls.groupBy("hi").agg(min("lo").as("__m"))
      val ss = ls.join(smins, "hi")
        .select(explode(array(
          struct(col("hi"), col("__m").as("lo")),
          struct(col("lo").as("hi"), col("__m").as("lo")))).as("p"))
        .select(col("p.hi").as("hi"), col("p.lo").as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()
        .localCheckpoint(true)
      val changed = ss.join(e, Seq("hi", "lo"), "left_anti").limit(1).count() +
        e.join(ss, Seq("hi", "lo"), "left_anti").limit(1).count()
      e = ss
      converged = changed == 0
      rounds += 1
    }
    val labels = e.select(col("hi").as("id"), col("lo").as("label"))
      .union(e.select(col("lo").as("id"), col("lo").as("label")))
      .groupBy("id").agg(min("label").as("label"))
    (labels, rounds)
  }

  /** [[connectedComponentsStarRounds]] labels only — drop-in for
    * [[connectedComponents]]. */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 50): DataFrame =
    connectedComponentsStarRounds(pairs, maxIter)._1

  /** Ceiling on [[connectedComponentsAuto]]'s driver-resident edge list:
    * 2^21 edges × 16 bytes = 32 MiB of edges — the same bounded-collect
    * class as [[Ann.MaxKcenterSample]]. TRUE peak during the solve is
    * ~2x that (~64 MiB at the boundary): the collected edge chunks stay
    * resident through the union pass while the id-rank array (same
    * total length) sits alongside them — budget accordingly. */
  val MaxDriverEdges: Int = 1 << 21

  /** Connected components with the SOLVE placed by graph size: the edge
    * lists this library feeds CC are representative-level (post
    * exact-collapse, post LSH+verify) — orders of magnitude smaller than
    * the corpus, usually thousands of rows — and running a multi-round
    * distributed fixpoint over them costs ~10 rounds × (2 shuffles + 2
    * convergence-count jobs) of pure scheduling/codegen overhead per
    * solve (measured: the star loop was BOTH the wall-clock majority and
    * the run-to-run variance of q_image_clusters_wide at sf0.1 — every
    * round plans fresh codegen units, churning the JVM-wide generated-
    * class cache under which all 32 tasks serialize). So: ONE count of
    * the deduplicated undirected edge list decides — at most
    * `driverEdgeLimit` (default [[MaxDriverEdges]], a 32 MiB bound)
    * edges collect to the driver for a union-find solve (path-halving +
    * union by min, O(E α(E)) — µs per edge), anything larger runs the
    * unchanged O(log² n)-round distributed [[connectedComponentsStar]].
    * Labels are IDENTICAL either way — (id, label = component-min) for
    * every node incident to an edge (CcStarSpec pins the equality), so
    * callers and oracles cannot observe the switch.
    *
    * The driver solve is long-typed; it dispatches on the id columns'
    * DECLARED types, so only integral ids (byte/short/int/long) take it
    * — string/decimal/etc. ids run the type-generic distributed star
    * unconditionally (a silent cast there would null non-numeric ids
    * and drop every edge). The collect is primitive end to end: edges
    * land as packed long arrays (16 bytes/edge, honoring the 32 MiB
    * [[MaxDriverEdges]] budget), node ids dense-rank through one sorted
    * long array, and union-find runs over an int parent array — no Row
    * or boxed-Long materialization. */
  def connectedComponentsAuto(pairs: DataFrame, maxIter: Int = 50,
                              driverEdgeLimit: Int = MaxDriverEdges): DataFrame = {
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    val idTypes = pairs.select(col("a_id"), col("b_id")).schema.map(_.dataType)
    if (!idTypes.forall(integral.contains))
      return connectedComponentsStar(pairs, maxIter)
    // cast FIRST, canonicalize after — greatest/least must compare in the
    // widened numeric type, not the declared one
    val e = pairs
      .select(col("a_id").cast("long").as("__a"), col("b_id").cast("long").as("__b"))
      .select(greatest(col("__a"), col("__b")).as("hi"),
        least(col("__a"), col("__b")).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct().localCheckpoint(true)
    // limit+1 probe, not a full count: the decision needs only "over or
    // under", and the scan stops as soon as the limit is crossed
    if (e.limit(driverEdgeLimit + 1).count() > driverEdgeLimit)
      starRoundsCanonical(e, maxIter)._1
    else {
      val spark = pairs.sparkSession
      // pack per-partition into primitive long arrays: the driver never
      // sees a Row or a boxed Long, only ~16 bytes/edge as budgeted
      val chunks: Array[Array[Long]] = e.rdd.mapPartitions { it =>
        val b = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { r => b += r.getLong(0); b += r.getLong(1) }
        Iterator.single(b.result())
      }.collect()
      var total = 0
      chunks.foreach(total += _.length) // 2 × edge count
      // dense-rank the node ids: sorted unique longs; index order == id
      // order, so union-by-min-INDEX is union-by-min-ID. PEAK DRIVER
      // MEMORY IS ~2x THE 16 B/edge STEADY BUDGET (~64 MiB at the
      // MaxDriverEdges boundary): the edge chunks must stay resident
      // through the union pass below (they ARE the edge list — ids is
      // the id-rank array, not an edge store), so chunks + ids are
      // co-resident from here to the final resolve. The 32 MiB figure
      // in [[MaxDriverEdges]]'s doc is the durable half.
      val ids = new Array[Long](total)
      var off = 0
      chunks.foreach { c => System.arraycopy(c, 0, ids, off, c.length); off += c.length }
      java.util.Arrays.sort(ids)
      var n = 0
      var j = 0
      while (j < total) {
        if (n == 0 || ids(j) != ids(n - 1)) { ids(n) = ids(j); n += 1 }
        j += 1
      }
      val parent = new Array[Int](n)
      var i = 0
      while (i < n) { parent(i) = i; i += 1 }
      def find(x0: Int): Int = {
        var x = x0
        var p = parent(x)
        while (p != x) { // path-halving
          val gp = parent(p)
          parent(x) = gp; x = gp; p = parent(x)
        }
        x
      }
      def rank(id: Long): Int = java.util.Arrays.binarySearch(ids, 0, n, id)
      chunks.foreach { c =>
        var k = 0
        while (k < c.length) {
          val (ra, rb) = (find(rank(c(k))), find(rank(c(k + 1))))
          // union by MIN root: the component root stays its minimum id,
          // so the final resolve needs no second pass to find the min
          if (ra != rb) {
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
          k += 2
        }
      }
      val out = new Array[org.apache.spark.sql.Row](n)
      i = 0
      while (i < n) {
        out(i) = org.apache.spark.sql.Row(ids(i), ids(find(i))); i += 1
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(out.toIndexedSeq,
          math.max(1, math.min(spark.sparkContext.defaultParallelism, n / 4096 + 1))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("label",
            org.apache.spark.sql.types.LongType))))
    }
  }

  /** The deduplicated corpus: from candidate pairs verified near-dups,
    * keep only the minimum-id document of each duplicate cluster. */
  def dedupCorpus(docs: DataFrame, idCol: String, verifiedPairs: DataFrame): DataFrame = {
    // auto CC: identical labels; graphs under the 32 MiB driver bound
    // solve in one union-find pass, larger ones (the 6.9M-pair clique
    // graph at 100×) run the diameter-independent star rounds
    val comps = connectedComponentsAuto(verifiedPairs)
    val losers = comps.filter(col("id") =!= col("label")).select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** End-to-end near-dup removal, EXACT-FIRST: collapse identical content
    * to its min-id representative (one md5-key shuffle) before LSH, then
    * MinHash candidates → n-gram-Jaccard verify (>= `minJaccard`) →
    * connected components → keep each cluster's min id. Returns the
    * surviving representatives' rows.
    *
    * The ordering is the 100 TB-critical part: a duplicate-saturated
    * corpus (c exact copies per document) fed straight to LSH produces
    * ~c² candidate pairs per cluster that all verify at jaccard 1 — real
    * work, quadratic in COPIES. Collapsing exact copies first makes the
    * pair count quadratic only in NEAR-duplicate cluster width. The
    * survivor set is unchanged: an exact copy and its representative
    * carry identical text, so every near-dup cluster's min id IS a
    * representative, and the copies the exact pass removes are exactly
    * the cluster members with a smaller-id twin. (When copies-per-bucket
    * exceeded `maxBucket`, the naive order silently DROPPED those
    * buckets — exact-first also closes that recall hole.) */
  def dedupPipeline(docs: DataFrame, idCol: String, textCol: String,
                    numHashes: Int = 12, rowsPerBand: Int = 3, shingleN: Int = 3,
                    minJaccard: Double = 0.8, maxBucket: Int = 10000): DataFrame = {
    // reps feeds THREE consumers (candidate generation, pair verify, the
    // final dedup) — materialize the exact-collapse once or its
    // md5-groupBy lineage re-executes per consumer (measured ~3x5 s of
    // the 100x wall before round 9)
    val reps = exactRepresentatives(docs, idCol, md5(col(textCol).cast("binary")))
      .localCheckpoint(true)
    val cand = minhashCandidates(reps, idCol, textCol, numHashes, rowsPerBand,
      shingleN, maxBucket)
    val verified = jaccardForPairs(reps, idCol, textCol, shingleN, cand)
      .filter(col("jaccard") >= minJaccard)
    dedupCorpus(reps, idCol, verified)
  }

  /** Near-dup cluster-size histogram — the dedup DIAGNOSTIC an operator
    * reads before and after tuning: (cluster_size, n_clusters) over the
    * connected components of the verified near-dup graph (exact-first
    * reps, bucket-capped LSH candidates, Jaccard ≥ `minJaccard`). A fat
    * tail here means wide boilerplate cliques — the signal to move that
    * content to the exact-hash pass or tighten banding. Cost is the
    * dedup pipeline's own candidate/verify stages plus a cluster-sized
    * double aggregation; all clusters have size ≥ 2 by construction
    * (only edge-touched reps are labeled). */
  def nearDupClusterSizes(docs: DataFrame, idCol: String, textCol: String,
                          numHashes: Int = 12, rowsPerBand: Int = 3, shingleN: Int = 3,
                          minJaccard: Double = 0.8, maxBucket: Int = 10000): DataFrame = {
    val reps = exactRepresentatives(docs, idCol, md5(col(textCol).cast("binary")))
      .localCheckpoint(true)
    val cand = minhashCandidates(reps, idCol, textCol, numHashes, rowsPerBand,
      shingleN, maxBucket)
    val verified = jaccardForPairs(reps, idCol, textCol, shingleN, cand)
      .filter(col("jaccard") >= minJaccard)
    connectedComponentsAuto(verified.select("a_id", "b_id"))
      .groupBy("label").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
  }

  /** Content-defined chunking of a corpus (the LBFS/FastCDC boundary
    * family, applied to text): a chunk boundary sits at every position
    * whose `w`-char gram hash is ≡ 0 (mod `div`) — a CONTENT-LOCAL rule,
    * so an insertion or deletion only disturbs the chunks it touches and
    * boundaries re-synchronize immediately after the edit (fixed-size
    * paragraph splits shift EVERY downstream boundary instead). Expected
    * chunk length ≈ `div` chars. Returns one row per chunk:
    * (idCol, s, e, ph, clen) — [s, e) char offsets, md5, length.
    *
    * Scale shape: boundary candidates are the ~1/div of positions whose
    * hash passes the filter (the per-position stream collapses BEFORE its
    * groupBy), the per-doc cut list rides one join back to the corpus,
    * and chunk slicing is one in-row transform — chunk TEXT never enters
    * an exchange (downstream consumers shuffle md5s). */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                w: Int, div: Int): DataFrame = {
    require(w >= 1 && div >= 1)
    val cuts = docs
      .filter(length(col(textCol)) >= w)
      .select(col(idCol), posexplode(
        org.apache.spark.sql.graft.CharGramHashes60(col(textCol), w))
        .as(Seq("pos", "h")))
      .filter(pmod(col("h"), lit(div.toLong)) === 0)
      .groupBy(idCol).agg(collect_set(col("pos")).as("__cuts"))
    docs
      .filter(length(col(textCol)) > 0)
      .join(cuts, Seq(idCol), "left")
      .withColumn("__all", array_sort(array_distinct(concat(
        array(lit(0)), coalesce(col("__cuts"), typedLit(Seq.empty[Int])),
        array(length(col(textCol)).cast("int"))))))
      .select(col(idCol), explode(expr(
        s"""transform(sequence(0, size(__all) - 2),
              i -> struct(__all[i] AS s, __all[i + 1] AS e,
                substring($textCol, __all[i] + 1, __all[i + 1] - __all[i]) AS c))"""))
        .as("__ch"))
      .select(col(idCol), col("__ch.s").cast("long").as("s"),
        col("__ch.e").cast("long").as("e"),
        md5(col("__ch.c").cast("binary")).as("ph"),
        (col("__ch.e") - col("__ch.s")).cast("long").as("clen"))
  }

  /** Chunk-level dedup accounting over [[cdcChunks]]: corpus-order-FIRST
    * occurrence of each chunk survives (the paragraph-dedup rule at
    * content-defined granularity); per doc, how many chunks are
    * duplicates of earlier content and how many chars they cover. The
    * only corpus-wide exchange after chunking is keyed by the chunk md5
    * and carries (id, offset, md5, len) — never text. */
  def cdcDedup(docs: DataFrame, idCol: String, textCol: String,
               w: Int, div: Int): DataFrame = {
    val ch = cdcChunks(docs, idCol, textCol, w, div)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("ph").orderBy(col(idCol), col("s"))
    ch.select(col(idCol), col("s"), col("ph"), col("clen"))
      .withColumn("__keep", row_number().over(win) === 1)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"),
        count(when(!col("__keep"), 1)).as("n_dup_chunks"),
        coalesce(sum(when(!col("__keep"), col("clen"))), lit(0L)).as("dup_chars"))
  }

  /** Soft deduplication — per-document SAMPLING WEIGHTS instead of
    * removal (He et al. 2024 "SoftDeDup": reweighting duplicated content
    * preserves its signal while restoring the effective token
    * distribution): every document gets weight_u = 1e6 div n_copies,
    * where n_copies counts ALL documents sharing its content cluster —
    * exact copies (md5 multiplicity) plus near-duplicates (the same
    * exact-first → LSH → Jaccard-verify → connected-components chain as
    * [[dedupPipeline]], so the hard and soft paths agree on what "a
    * duplicate" is). A cluster's weights sum to ~1e6 (one document's
    * worth, minus floor truncation), so a weighted sampler sees each
    * piece of content once regardless of its copy count.
    *
    * Scale shape: the costs are the dedup pipeline's own (exact collapse
    * keyed by a 16-byte hash, candidate pairs quadratic only in near-dup
    * cluster width); on top ride two |distinct-content|-bounded
    * aggregations and the final map of docs to their representative via
    * the same md5 key — the corpus text never enters a shuffle. Integer
    * truncating division keeps weights engine-exact. */
  def softDedupWeights(docs: DataFrame, idCol: String, textCol: String,
                       numHashes: Int = 12, rowsPerBand: Int = 3, shingleN: Int = 3,
                       minJaccard: Double = 0.8, maxBucket: Int = 10000): DataFrame = {
    val h = md5(col(textCol).cast("binary"))
    // one row per distinct content: min-id representative + multiplicity
    val groups = docs.groupBy(h.as("__h"))
      .agg(min(col(idCol)).as("__rep"), count(lit(1)).as("__m"))
      .localCheckpoint(true)
    val reps = docs.join(groups.select(col("__rep").as(idCol)), Seq(idCol), "left_semi")
      .localCheckpoint(true)
    val cand = minhashCandidates(reps, idCol, textCol, numHashes, rowsPerBand,
      shingleN, maxBucket)
    val verified = jaccardForPairs(reps, idCol, textCol, shingleN, cand)
      .filter(col("jaccard") >= minJaccard)
    val comps = connectedComponentsAuto(verified.select("a_id", "b_id"))
    // cluster label per representative: CC label where edge-touched,
    // else the rep is its own singleton cluster
    val repLab = groups
      .join(comps.withColumnRenamed("id", "__rep"), Seq("__rep"), "left")
      .withColumn("__label", coalesce(col("label"), col("__rep")))
    val totals = repLab.groupBy("__label").agg(sum("__m").as("n_copies"))
    val repInfo = repLab.join(totals, "__label")
      .select(col("__rep"), col("__h"), col("n_copies"))
    docs.select(col(idCol), h.as("__h"))
      .join(repInfo, "__h")
      .select(col(idCol), col("n_copies"),
        expr("1000000 div n_copies").as("weight_u"))
  }

  /** Leakage-safe train/val/test split: the split unit is the NEAR-DUP
    * CLUSTER, not the document — every member of a cluster (exact copies
    * AND verified near-duplicates) lands in the same split, so a
    * paraphrase of a test document can never sit in train (the
    * eval-integrity failure a doc-level hash split cannot prevent, and
    * the reason dedup-then-split is the published order of operations).
    * Same rep/verified/CC chain as hard and soft dedup; the split key is
    * the first 32 md5 bits of "seed:label" mod 10 (the q_train_order
    * hash shape, CLUSTER-keyed) → 0–7 train, 8 val, 9 test. Returns one
    * row per input doc: (idCol, cluster_label, split). Deterministic in
    * `seed`; scale shape identical to [[softDedupWeights]]. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
                       seed: String, numHashes: Int = 12, rowsPerBand: Int = 3,
                       shingleN: Int = 3, minJaccard: Double = 0.8,
                       maxBucket: Int = 10000): DataFrame = {
    require(!seed.contains("'"), "seed must not contain quotes")
    val h = md5(col(textCol).cast("binary"))
    val groups = docs.groupBy(h.as("__h")).agg(min(col(idCol)).as("__rep"))
      .localCheckpoint(true)
    val reps = docs.join(groups.select(col("__rep").as(idCol)), Seq(idCol), "left_semi")
      .localCheckpoint(true)
    val cand = minhashCandidates(reps, idCol, textCol, numHashes, rowsPerBand,
      shingleN, maxBucket)
    val verified = jaccardForPairs(reps, idCol, textCol, shingleN, cand)
      .filter(col("jaccard") >= minJaccard)
    val comps = connectedComponentsAuto(verified.select("a_id", "b_id"))
    val repLab = groups
      .join(comps.withColumnRenamed("id", "__rep"), Seq("__rep"), "left")
      .withColumn("__label", coalesce(col("label"), col("__rep")))
    val k = conv(substring(
      md5(concat(lit(seed + ":"), col("__label").cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10
    docs.select(col(idCol), h.as("__h"))
      .join(repLab.select(col("__h"), col("__label")), "__h")
      .select(col(idCol), col("__label").as("cluster_label"),
        when(k <= 7, "train").when(k === 8, "val").otherwise("test").as("split"))
  }

  // ---------------------------------------------------------------------
  // Incremental (delta-vs-corpus) dedup over a persisted index
  // ---------------------------------------------------------------------

  /** Persist the dedup index of an already-ingested corpus: the artifact
    * that makes ingestion-time dedup INCREMENTAL — a new batch is checked
    * against these three tables and the corpus itself is never rescanned.
    * Layout under `path`:
    *  - `hashes/`   (content_hash, keeper): one row per distinct content;
    *  - `bands/`    (band, key, keeper): LSH band keys of the exact
    *    representatives, with over-`maxBucket` buckets dropped at build
    *    time (the standard skew guard — degenerate boilerplate belongs to
    *    the exact-hash pass, and a hot band key would otherwise fan every
    *    future delta doc out against the whole bucket);
    *  - `shingles/` (keeper, sh): each representative's sorted distinct
    *    shingle-hash set, so candidate pairs Jaccard-verify against the
    *    index alone — no join back to corpus text.
    * Index size is O(distinct docs), not O(corpus bytes): the shuffle and
    * the files carry hashes and band keys, never document text. */
  def buildDedupIndex(corpus: DataFrame, idCol: String, textCol: String,
                      path: String,
                      numHashes: Int = 12, rowsPerBand: Int = 3,
                      shingleN: Int = 3, maxBucket: Int = 10000): Unit = {
    corpus.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keeper"))
      .write.mode("overwrite").parquet(s"$path/hashes")
    val reps = exactRepresentatives(corpus, idCol, md5(col(textCol).cast("binary")))
    val numBands = numHashes / rowsPerBand
    val banded = withBandKeys(
      minhashSignatures(reps, idCol, textCol, numHashes, shingleN),
      numHashes, rowsPerBand)
    val bands = banded.select(col(idCol).as("keeper"),
        explode(array((0 until numBands).map(b =>
          struct(lit(b).as("band"), col(s"b$b").as("key"))): _*)).as("bk"))
      .select(col("keeper"), col("bk.band").as("band"), col("bk.key").as("key"))
      .localCheckpoint(true) // feeds the guard AND the guarded write once
    val ok = bands.groupBy("band", "key").agg(count(lit(1)).as("n"))
      .filter(col("n") <= maxBucket).select("band", "key")
    bands.join(ok, Seq("band", "key"), "left_semi")
      .write.mode("overwrite").parquet(s"$path/bands")
    shingleSets(reps, idCol, textCol, shingleN)
      .withColumnRenamed(idCol, "keeper")
      .write.mode("overwrite").parquet(s"$path/shingles")
  }

  /** Dedup an arriving delta batch against a [[buildDedupIndex]] index
    * plus itself — the realistic ingestion shape at corpus scale, where
    * re-running full-corpus dedup per batch is off the table. Each delta
    * row is classified:
    *  - `dup_corpus`: content hash already in the corpus (match_id = the
    *    corpus keeper);
    *  - `dup_delta`: exact copy of a smaller-id doc within the batch
    *    (match_id = the batch keeper; near-dup WITHIN a batch is the
    *    streaming LSH stage's job — see streamingLshCandidates);
    *  - `near_corpus`: batch-unique content that collides with a corpus
    *    representative in ≥ 1 LSH band AND verifies at shingle-Jaccard
    *    ≥ `minJaccard` (match_id = the smallest verified corpus keeper,
    *    n_near = how many corpus reps verified);
    *  - `new`: everything else (match_id = -1).
    * Scale shape: the delta is the SMALL side of every join — AQE
    * broadcasts it against the index scans, so per-batch cost is
    * O(|delta| + matched index rows), never O(corpus). Exact matches
    * join on the 16-byte hash; band candidates join on (band, key) with
    * the index's bucket cap already applied at build time. */
  def incrementalDedup(spark: org.apache.spark.sql.SparkSession,
                       delta: DataFrame, idCol: String, textCol: String,
                       path: String,
                       numHashes: Int = 12, rowsPerBand: Int = 3,
                       shingleN: Int = 3, minJaccard: Double = 0.8): DataFrame = {
    val idxHashes = spark.read.parquet(s"$path/hashes")
    val idxBands = spark.read.parquet(s"$path/bands")
    val idxSh = spark.read.parquet(s"$path/shingles")
    val hashed = delta.select(col(idCol), col(textCol))
      .withColumn("__h", md5(col(textCol).cast("binary")))
    val dkeep = hashed.groupBy("__h").agg(min(col(idCol)).as("__dk"))
    val tagged = hashed
      .join(idxHashes.select(col("content_hash").as("__h"),
        col("keeper").as("__ck")), Seq("__h"), "left")
      .join(dkeep, "__h")
    // near-dup candidates: batch-unique exact keepers only — copies are
    // already classified, and a copy's near-matches equal its keeper's
    val surv = tagged.filter(col("__ck").isNull && col(idCol) === col("__dk"))
      .select(col(idCol), col(textCol))
    val numBands = numHashes / rowsPerBand
    val banded = withBandKeys(
      minhashSignatures(surv, idCol, textCol, numHashes, shingleN),
      numHashes, rowsPerBand)
    val dBands = banded.select(col(idCol),
        explode(array((0 until numBands).map(b =>
          struct(lit(b).as("band"), col(s"b$b").as("key"))): _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = dBands.join(idxBands, Seq("band", "key"))
      .select(col(idCol).as("a_id"), col("keeper").as("b_id")).distinct()
    val joined = cand
      .join(shingleSets(surv, idCol, textCol, shingleN)
        .select(col(idCol).as("a_id"), col("sh").as("a_sh")), "a_id")
      .join(idxSh.select(col("keeper").as("b_id"), col("sh").as("b_sh")), "b_id")
    // distinct verified PAIRS before the per-doc aggregate: duplicate
    // index shingle rows (crash-replay debris awaiting compaction) must
    // inflate neither n_near nor anything else
    val near = jaccardOf(joined).filter(col("jaccard") >= minJaccard)
      .select("a_id", "b_id").distinct()
      .groupBy(col("a_id").as(idCol))
      .agg(min("b_id").as("__nk"), count(lit(1)).as("__nn"))
    tagged.join(near, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__ck").isNotNull, lit("dup_corpus"))
          .when(col(idCol) > col("__dk"), lit("dup_delta"))
          .when(col("__nk").isNotNull, lit("near_corpus"))
          .otherwise(lit("new")).as("status"),
        coalesce(col("__ck"),
          when(col(idCol) > col("__dk"), col("__dk")),
          col("__nk"), lit(-1L)).as("match_id"),
        coalesce(col("__nn"), lit(0L)).as("n_near"))
  }

  /** Admit a classified batch's NEW documents into the persisted index —
    * the maintenance half of the incremental-ingestion loop (classify →
    * admit keepers → next batch sees them), without any rebuild. `docs`
    * rows whose id appears in `classified` with status `new` append
    * their content hash, band keys and shingle set; dup_* rows are
    * already represented and near_corpus rows are near-dups the corpus
    * policy drops, so neither is admitted. Appends are plain parquet
    * `append` writes sized O(admitted batch). A hot band key can grow
    * past `maxBucket` across many appends — [[compactDedupIndex]]
    * re-applies the cap; until then an over-cap bucket only costs extra
    * verify candidates (correctness is unaffected: Jaccard still
    * gates). */
  def appendToDedupIndex(delta: DataFrame, classified: DataFrame,
                         idCol: String, textCol: String, path: String,
                         numHashes: Int = 12, rowsPerBand: Int = 3,
                         shingleN: Int = 3): Unit = {
    val admit = delta.join(
      classified.filter(col("status") === "new").select(idCol), Seq(idCol), "left_semi")
      .localCheckpoint(true) // feeds three appends; hashes/ LAST is the gate
    val numBands = numHashes / rowsPerBand
    // bands/ and shingles/ are independent non-gate appends — overlapped
    // (Par §2.6; r17); hashes/ still lands strictly after both
    Par.all(
      () => withBandKeys(minhashSignatures(admit, idCol, textCol, numHashes, shingleN),
          numHashes, rowsPerBand)
        .select(col(idCol).as("keeper"),
          explode(array((0 until numBands).map(b =>
            struct(lit(b).as("band"), col(s"b$b").as("key"))): _*)).as("bk"))
        .select(col("keeper"), col("bk.band").as("band"), col("bk.key").as("key"))
        .write.mode("append").parquet(s"$path/bands"),
      () => shingleSets(admit, idCol, textCol, shingleN)
        .withColumnRenamed(idCol, "keeper")
        .write.mode("append").parquet(s"$path/shingles"))
    // hashes/ LAST: it is the gate that decides future status, so a crash
    // between the appends replays the whole admit identically (the doc
    // still classifies `new`); the duplicate band/shingle rows that
    // re-append are absorbed by the candidate distinct / the verify's
    // pair distinct and reclaimed by [[compactDedupIndex]]
    admit.select(md5(col(textCol).cast("binary")).as("content_hash"),
        col(idCol).as("keeper"))
      .write.mode("append").parquet(s"$path/hashes")
  }

  /** Rewrite a dedup index compactly: coalesce the append-accumulated
    * small files and re-apply the band bucket cap (appends admit rows
    * uncapped — see [[appendToDedupIndex]]). One shuffle per table,
    * sized by the index, run at maintenance cadence — never per
    * batch. */
  def compactDedupIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String, destPath: String,
                        maxBucket: Int = 10000): Unit = {
    requireDistinctPaths(spark, path, destPath)
    // the three table rewrites are independent — overlapped (Par; r17)
    Par.all(
      () => spark.read.parquet(s"$path/hashes")
        .groupBy("content_hash").agg(min("keeper").as("keeper"))
        .write.mode("overwrite").parquet(s"$destPath/hashes"),
      () => {
        // distinct drops crash-replay duplicate rows; distinct KEEPERS for
        // the cap so that debris cannot push a legitimate bucket over it
        val bands = spark.read.parquet(s"$path/bands").distinct().localCheckpoint(true)
        val ok = bands.groupBy("band", "key").agg(count(lit(1)).as("n"))
          .filter(col("n") <= maxBucket).select("band", "key")
        bands.join(ok, Seq("band", "key"), "left_semi").repartition(col("key"))
          .write.mode("overwrite").parquet(s"$destPath/bands")
      },
      () => spark.read.parquet(s"$path/shingles")
        .groupBy("keeper").agg(first("sh").as("sh"))
        .write.mode("overwrite").parquet(s"$destPath/shingles"))
    copyIngestMarker(spark, path, destPath)
  }

  // ---------------------------------------------------------------------
  // Churn-proportional (LSM delta) compaction for the LSH index families
  // ---------------------------------------------------------------------

  /** Manifest of the part files a delta compaction wrote per table — the
    * next swap's quiet/busy oracle. JSON {table: [names...]}. */
  private val CompactManifest = "_compacted_files.json"

  private def partFilesOf(fs: org.apache.hadoop.fs.FileSystem,
                          dir: org.apache.hadoop.fs.Path): Seq[String] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).collect {
      case st if st.isFile && st.getPath.getName.startsWith("part-") =>
        st.getPath.getName
    }.toSeq.sorted

  private def readCompactManifest(fs: org.apache.hadoop.fs.FileSystem,
                                  path: String): Map[String, Set[String]] = {
    val mp = new org.apache.hadoop.fs.Path(s"$path/$CompactManifest")
    if (!fs.exists(mp)) Map.empty
    else {
      val in = fs.open(mp)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      // flat {"table":["f1","f2"],...} — names never contain quotes
      "\"([^\"]+)\"\\s*:\\s*\\[([^\\]]*)\\]".r.findAllMatchIn(txt).map { m =>
        m.group(1) -> "\"([^\"]+)\"".r.findAllMatchIn(m.group(2))
          .map(_.group(1)).toSet
      }.toMap
    }
  }

  private def writeCompactManifest(fs: org.apache.hadoop.fs.FileSystem,
                                   path: String,
                                   m: Map[String, Seq[String]]): Unit = {
    val body = m.toSeq.sortBy(_._1).map { case (t, fsq) =>
      "\"" + t + "\":[" + fsq.sorted.map("\"" + _ + "\"").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$path/$CompactManifest"), true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** One table's move under delta compaction. Returns (action taken
    * ("link" | "delta" | "full"), dest file list, new tier count) for
    * the manifest. `tiers` counts delta swaps since the last full
    * rewrite — at `fullRewriteOver` the table escalates to `full`,
    * which re-bases the manifest and resets the counter (bounding file
    * growth at base + O(fullRewriteOver), since each delta swap adds a
    * byte-sized handful of folded files — one per ~128 MB of delta). `fold` is the table's within-delta debris collapse
    * (exact-duplicate rows from crash replays — replays re-append
    * within the same swap interval, so duplicates never straddle the
    * base/delta boundary); `full` is the table's whole semantic
    * rewrite. */
  private def moveTableDelta(spark: org.apache.spark.sql.SparkSession,
                             path: String, destPath: String, table: String,
                             base: Set[String], tiers: Int,
                             fullRewriteOver: Int,
                             fold: DataFrame => DataFrame,
                             full: () => Unit): (String, Seq[String], Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcDir = new org.apache.hadoop.fs.Path(s"$path/$table")
    val fs = srcDir.getFileSystem(conf)
    val current = partFilesOf(fs, srcDir)
    val deltaNames = current.filterNot(base.contains)
    val destDir = new org.apache.hadoop.fs.Path(s"$destPath/$table")
    if ((deltaNames.nonEmpty && tiers >= fullRewriteOver) ||
        base.exists(b => !current.contains(b)) ||
        (base.isEmpty && current.nonEmpty)) {
      // tier budget spent, a manifest referencing vanished files
      // (foreign interference), or no manifest base yet (first
      // compaction of a legacy index — the whole table IS the delta,
      // and the full rewrite both caps it and re-bases the manifest):
      // escalate to the full semantic rewrite
      full()
      ("full", partFilesOf(fs, destDir), 0)
    } else if (deltaNames.isEmpty) {
      fs.mkdirs(destDir)
      current.foreach(n => Ann.linkOrCopyFile(fs,
        new org.apache.hadoop.fs.Path(srcDir, n),
        new org.apache.hadoop.fs.Path(destDir, n), conf))
      ("link", current, tiers)
    } else {
      fs.mkdirs(destDir)
      val baseNames = current.filter(base.contains)
      baseNames.foreach(n => Ann.linkOrCopyFile(fs,
        new org.apache.hadoop.fs.Path(srcDir, n),
        new org.apache.hadoop.fs.Path(destDir, n), conf))
      // fold the delta tier alone and land it as fresh part file(s):
      // the fold's partition count is sized from the delta tier's
      // BYTES (target ~128 MB/file, capped) — a fixed coalesce(1)
      // would single-thread a large inter-swap append and grow one
      // unbounded file (only tier COUNT, not size, triggers the full
      // rewrite). Small deltas still land as one file.
      val tmp = new org.apache.hadoop.fs.Path(
        s"$destPath/.${table}_delta_tmp")
      val deltaPaths = deltaNames.map(n => new org.apache.hadoop.fs.Path(srcDir, n))
      val deltaBytes = deltaPaths.map(p => fs.getFileStatus(p).getLen).sum
      val foldParts = math.min(512L, deltaBytes / (128L * 1024 * 1024) + 1).toInt
      fold(spark.read.parquet(deltaPaths.map(_.toString): _*))
        .coalesce(foldParts).write.mode("overwrite").parquet(tmp.toString)
      // part names embed a fresh write-job UUID — never collide with
      // the linked base names
      val renamed = partFilesOf(fs, tmp).map { n =>
        fs.rename(new org.apache.hadoop.fs.Path(tmp, n),
          new org.apache.hadoop.fs.Path(destDir, n))
        n
      }
      fs.delete(tmp, true)
      ("delta", baseNames ++ renamed, tiers + 1)
    }
  }

  /** CHURN-PROPORTIONAL compaction for the exact+near dedup index — the
    * LSH-family answer to [[Ann.compactIvfIndexPerBucket]] (VERDICT r15
    * task: "per-bucket compaction for the band tables"). The IVF
    * template (link quiet bucket DIRS) does NOT transfer: band keys are
    * minhashes, so appends HASH-SPREAD across the key space and every
    * key-partition would be busy every swap — for LSH tables the churn
    * axis is TIME (append tiers), not KEY. So this compacts LSM-style:
    * each table's files recorded by the last compaction (the manifest)
    * are its BASE tier and move by hard link (O(metadata), never a
    * Spark job); files appended since are the DELTA tier, folded alone
    * (within-delta debris distinct — crash replays re-append within one
    * swap interval, so duplicates never straddle the boundary) and
    * landed as one fresh file, O(churn). A table whose tier count
    * exceeds `fullRewriteOver` escalates to [[compactDedupIndex]]'s
    * whole rewrite for that table (re-applying the band bucket cap),
    * which re-bases the manifest — classic tiered compaction, amortized
    * O(corpus/fullRewriteOver) per swap. Readers are invariant to the
    * deferral by construction: the candidate distinct absorbs linked
    * debris, the probe cap is applied at classify time
    * (countDistinct per matched (band, key)), and min-resolution folds
    * label/owner history — the same contracts that make APPENDS safe.
    * Zero-churn swap = pure links + a manifest write. Returns
    * (table → action) for receipts; BandCompactBench prices it. */
  def compactDedupIndexDelta(spark: org.apache.spark.sql.SparkSession,
                             path: String, destPath: String,
                             maxBucket: Int = 10000,
                             fullRewriteOver: Int = 16): Map[String, String] = {
    requireDistinctPaths(spark, path, destPath)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val manifest = readCompactManifest(fs, path)
    val actions = Seq(
      ("hashes", (d: DataFrame) =>
        d.groupBy("content_hash").agg(min("keeper").as("keeper")),
        () => spark.read.parquet(s"$path/hashes")
          .groupBy("content_hash").agg(min("keeper").as("keeper"))
          .write.mode("overwrite").parquet(s"$destPath/hashes")),
      ("bands", (d: DataFrame) => d.distinct(),
        () => {
          val bands = spark.read.parquet(s"$path/bands").distinct()
            .localCheckpoint(true)
          val ok = bands.groupBy("band", "key").agg(count(lit(1)).as("n"))
            .filter(col("n") <= maxBucket).select("band", "key")
          bands.join(ok, Seq("band", "key"), "left_semi")
            .repartition(col("key"))
            .write.mode("overwrite").parquet(s"$destPath/bands")
        }),
      ("shingles", (d: DataFrame) =>
        d.groupBy("keeper").agg(first("sh").as("sh")),
        () => spark.read.parquet(s"$path/shingles")
          .groupBy("keeper").agg(first("sh").as("sh"))
          .write.mode("overwrite").parquet(s"$destPath/shingles"))
    )
    // per-table moves are independent (distinct src/dest dirs, manifest
    // written after ALL) — overlap them so one table's fold/rewrite tail
    // back-fills the others' (Par §2.6; r17)
    val moved = Par.run(actions.map { case (t, fold, full) => () =>
      val (act, files, tiers) = moveTableDelta(spark, path, destPath, t,
        manifest.getOrElse(t, Set.empty),
        manifest.getOrElse(s"$t#tiers", Set.empty)
          .headOption.map(_.toInt).getOrElse(0),
        fullRewriteOver, fold, full)
      (t, act, files, tiers)
    })
    writeCompactManifest(fs, destPath,
      moved.flatMap { case (t, _, f, tiers) =>
        Seq(t -> f, s"$t#tiers" -> Seq(tiers.toString)) }.toMap)
    copyIngestMarker(spark, path, destPath)
    moved.map { case (t, a, _, _) => t -> a }.toMap
  }

  /** [[compactDedupIndexDelta]] for the SPLIT index (adds the clusters
    * label-history table, whose delta fold is a plain distinct — the
    * read path min-resolves labels, so stale base rows are inert until
    * the next full rewrite folds them). */
  def compactSplitIndexDelta(spark: org.apache.spark.sql.SparkSession,
                             path: String, destPath: String,
                             maxBucket: Int = 10000,
                             fullRewriteOver: Int = 16): Map[String, String] = {
    requireDistinctPaths(spark, path, destPath)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val manifest = readCompactManifest(fs, path)
    val actions = Seq(
      ("clusters", (d: DataFrame) => d.distinct(),
        () => spark.read.parquet(s"$path/clusters")
          .groupBy("keeper").agg(min("label").as("label"))
          .write.mode("overwrite").parquet(s"$destPath/clusters")),
      ("bands", (d: DataFrame) => d.distinct(),
        () => {
          val sBands = spark.read.parquet(s"$path/bands").distinct()
            .localCheckpoint(true)
          val sOk = sBands.groupBy("band", "key").agg(count(lit(1)).as("__n"))
            .filter(col("__n") <= maxBucket).select("band", "key")
          sBands.join(sOk, Seq("band", "key"), "left_semi")
            .write.mode("overwrite").parquet(s"$destPath/bands")
        }),
      ("shingles", (d: DataFrame) =>
        d.groupBy("keeper").agg(first("sh").as("sh")),
        () => spark.read.parquet(s"$path/shingles")
          .groupBy("keeper").agg(first("sh").as("sh"))
          .write.mode("overwrite").parquet(s"$destPath/shingles")),
      ("hashes", (d: DataFrame) => d.distinct(),
        () => spark.read.parquet(s"$path/hashes").distinct()
          .write.mode("overwrite").parquet(s"$destPath/hashes"))
    )
    // independent per-table moves overlap (see compactDedupIndexDelta)
    val moved = Par.run(actions.map { case (t, fold, full) => () =>
      val (act, files, tiers) = moveTableDelta(spark, path, destPath, t,
        manifest.getOrElse(t, Set.empty),
        manifest.getOrElse(s"$t#tiers", Set.empty)
          .headOption.map(_.toInt).getOrElse(0),
        fullRewriteOver, fold, full)
      (t, act, files, tiers)
    })
    writeCompactManifest(fs, destPath,
      moved.flatMap { case (t, _, f, tiers) =>
        Seq(t -> f, s"$t#tiers" -> Seq(tiers.toString)) }.toMap)
    copyIngestMarker(spark, path, destPath)
    moved.map { case (t, a, _, _) => t -> a }.toMap
  }

  /** One classify-and-admit step of the exact-dedup ingestion loop over
    * a GENERATION-MAINTAINED index root — [[incrementalDedup]] +
    * [[appendToDedupIndex]] against the ACTIVE generation
    * ([[GenIndex.active]]), with the same monotone-id `_ingest_max`
    * guard as the split/chunk families (exact replays of the last batch
    * are admitted and SELF-REPAIR: fully-admitted docs re-classify
    * dup_corpus against their own appended hashes and admit nothing,
    * docs whose appends a crash lost classify `new` again and
    * re-append — hashes/ is written last as the gate), and —
    * every `compactEvery` batches — in-loop compaction through a
    * crash-safe generation swap ([[GenIndex.compact]] of
    * [[compactDedupIndex]]): file counts stay bounded over long feeds,
    * the band bucket cap is re-applied, and a crash at ANY point of the
    * swap leaves the previous generation active. Returns the batch's
    * classification (the [[incrementalDedup]] schema), materialized
    * BEFORE the appends so the admit cannot read its own writes.
    * DedupIngestSpec pins loop == from-scratch classification through
    * swaps and the crash fixtures. */
  def dedupIndexIngest(spark: org.apache.spark.sql.SparkSession,
                       delta: DataFrame, idCol: String, textCol: String,
                       root: String, batchId: Long,
                       numHashes: Int = 12, rowsPerBand: Int = 3,
                       shingleN: Int = 3, minJaccard: Double = 0.8,
                       maxBucket: Int = 10000, compactEvery: Int = 0,
                       onClassified: (DataFrame, Boolean) => Unit = (_, _) => ())
      : DataFrame = {
    val active = GenIndex.active(spark, root)
    val (ingestMm, isReplay) = checkMonotoneIngest(spark, active, delta, idCol,
      "hashes", "keeper")
    // first batch founds the index: an EMPTY build writes the three
    // tables with their schemas, so the classify below probes an empty
    // index instead of failing on missing paths
    val fsRoot = new org.apache.hadoop.fs.Path(active)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fsRoot.exists(new org.apache.hadoop.fs.Path(s"$active/hashes")))
      buildDedupIndex(delta.limit(0), idCol, textCol, active,
        numHashes, rowsPerBand, shingleN, maxBucket)
    val classified = incrementalDedup(spark, delta, idCol, textCol, active,
      numHashes, rowsPerBand, shingleN, minJaccard)
      .localCheckpoint(true) // the admit below APPENDS to the tables this plan reads
    ingestMm.foreach(recordIngestMax(spark, active, _))
    // the caller's per-batch outputs go durable HERE — after the replay
    // marker, BEFORE the appends — with the replay flag, so a streaming
    // loop can keep pre-crash output files on detected replays (a replay
    // against the already-appended index re-derives a self-repaired
    // classification — dup_corpus where the original said new — and the
    // ORIGINAL is the authoritative at-ingest answer, exactly the split
    // loop's kept-output rule)
    onClassified(classified, isReplay)
    // the append ALWAYS runs — on a replay it self-repairs a crash that
    // landed between the per-table appends: fully-admitted docs classify
    // dup_corpus (hashes/ is written last, so it gates) and re-admit
    // nothing, docs whose appends were lost classify `new` again and
    // re-append; duplicate band/shingle debris is absorbed downstream
    // and reclaimed by compaction
    appendToDedupIndex(delta, classified, idCol, textCol, active,
      numHashes, rowsPerBand, shingleN)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
      // in-loop swaps are churn-proportional (round 16): base tiers
      // hard-link, only the files appended since the last swap fold;
      // the whole rewrite still runs when tier count crosses the
      // escalation threshold (and on the first, manifest-less swap)
      GenIndex.compact(spark, root)((src, dest) =>
        compactDedupIndexDelta(spark, src, dest, maxBucket))
      ()
    }
    classified
  }

  // ---------------------------------------------------------------------
  // Shared guards for the persisted-index family (round 13)
  // ---------------------------------------------------------------------

  /** Compaction reads `path` lazily and writes `destPath` with
    * mode("overwrite") — if the two resolve to the same location, Spark
    * deletes the input files before the read completes and the index is
    * destroyed. Fail loudly instead (build-time guard, like the enrich
    * join's watermark check). */
  private def requireDistinctPaths(spark: org.apache.spark.sql.SparkSession,
                                   path: String, destPath: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    def resolved(p: String) = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
        fs.makeQualified(hp)).toString
    }
    require(resolved(path) != resolved(destPath),
      s"compaction destPath must differ from path (both resolve to " +
        s"${resolved(path)}): an overwrite write into the read path " +
        "deletes the index before the lazy read completes")
  }

  /** Runtime enforcement of the dedup family's monotone-id ingestion
    * contract ('batch ids must exceed all ingested ids'): a violating
    * batch would silently break the labels-only-decrease invariant
    * (split index) or misclassify chunk dups (chunk index). The guard is
    * O(1) per batch — the last batch's (min, max, row count) rides a
    * tiny `_ingest_max` marker file, not an index scan. An exact
    * crash-replay of the last batch re-presents the same min, max AND
    * count, which the marker recognizes and admits (replay idempotence
    * is load-bearing for the whole family); a batch that merely SHARES
    * the last batch's min id but differs in max or count is NOT a
    * replay and fails loudly — admitting it would both corrupt the
    * index (its tail ids overlap ingested ones) and, in the staged
    * streaming loops, silently skip its output writes behind the
    * previous batch's `_SUCCESS` marker.
    *
    * A pre-marker index (built before this guard existed) migrates by a
    * one-time max scan of `table.ownerCol`. That high-water mark is
    * BEST-EFFORT UNDERSTATED: the index records representatives/owners
    * only, so ingested docs classified as dups with ids above the last
    * rep are invisible to the scan, and the first post-migration batch
    * may overlap them undetected (the marker is exact from then on).
    * Returns the batch's (min, max, count) for [[recordIngestMax]]
    * (None for an empty batch — nothing to guard or record) plus
    * whether the batch is an exact replay of the last ingested one. */
  private def checkMonotoneIngest(spark: org.apache.spark.sql.SparkSession,
                                  path: String, delta: DataFrame, idCol: String,
                                  table: String, ownerCol: String):
      (Option[(Long, Long, Long)], Boolean) = {
    val mm = delta.agg(min(col(idCol).cast("long")),
      max(col(idCol).cast("long")), count(lit(1))).first()
    if (mm.isNullAt(0)) return (None, false)
    val (bMin, bMax, bCnt) = (mm.getLong(0), mm.getLong(1), mm.getLong(2))
    val conf = spark.sparkContext.hadoopConfiguration
    val marker = new org.apache.hadoop.fs.Path(s"$path/_ingest_max")
    val fs = marker.getFileSystem(conf)
    // marker format: "min,max,count"; older two-field markers (written
    // before the count was recorded) parse with an unknown count, which
    // the replay check then cannot corroborate — same-min-same-max is
    // accepted for that one legacy batch and the rewrite upgrades it
    val last: Option[(Long, Long, Option[Long])] =
      if (fs.exists(marker)) {
        val in = fs.open(marker)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        val parts = txt.split(",")
        Some((parts(0).toLong, parts(1).toLong,
          if (parts.length >= 3) Some(parts(2).toLong) else None))
      } else if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/$table"))) {
        // pre-guard index: derive the (understated — see docstring)
        // high-water mark once; the marker maintains it exactly after
        val m = spark.read.parquet(s"$path/$table")
          .agg(max(col(ownerCol).cast("long"))).first()
        if (m.isNullAt(0)) None else Some((Long.MinValue, m.getLong(0), None))
      } else None
    val isReplay = last.exists { case (lastMin, lastMax, lastCnt) =>
      lastMin == bMin && lastMax == bMax && lastCnt.forall(_ == bCnt)
    }
    last.foreach { case (lastMin, lastMax, lastCnt) =>
      require(bMin > lastMax || isReplay,
        s"monotone-id ingestion contract violated at $path: batch " +
          s"(min=$bMin, max=$bMax, n=$bCnt) neither exceeds the last " +
          s"ingested max id $lastMax nor exactly replays the last batch " +
          s"(min=$lastMin, max=$lastMax, n=${lastCnt.getOrElse("?")}) — " +
          "out-of-order ingestion silently corrupts the index's " +
          "corpus-order-first semantics (note: a high-water mark " +
          "migrated from a pre-guard index understates ids of " +
          "dup-classified docs)")
    }
    (Some((bMin, bMax, bCnt)), isReplay)
  }

  /** Persist the batch's (min, max, count) after its appends commit —
    * the other half of [[checkMonotoneIngest]]. Temp-file + rename, so a
    * crash leaves the previous marker (stale-low is safe: it only ever
    * ADMITS a replay, never rejects a legal batch). */
  private def recordIngestMax(spark: org.apache.spark.sql.SparkSession,
                              path: String, mmc: (Long, Long, Long)): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val marker = new org.apache.hadoop.fs.Path(s"$path/_ingest_max")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_ingest_max.tmp")
    val fs = marker.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(s"${mmc._1},${mmc._2},${mmc._3}".getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(marker)) fs.delete(marker, false)
    fs.rename(tmp, marker)
  }

  // ---------------------------------------------------------------------
  // Incremental leakage-safe split over a persisted SPLIT index
  // ---------------------------------------------------------------------

  /** The cluster-label → split rule shared by [[leakageSafeSplit]] and
    * the incremental [[splitIndexIngest]]: first 32 md5 bits of
    * "seed:label" mod 10 → 0–7 train, 8 val, 9 test. */
  private def splitOf(label: Column, seed: String): Column = {
    val k = conv(substring(
      md5(concat(lit(seed + ":"), label.cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10
    when(k <= 7, "train").when(k === 8, "val").otherwise("test")
  }

  /** Ingest a batch into a persisted SPLIT index and return the batch
    * docs' at-ingest assignment (idCol, cluster_label, split) — the
    * streaming face of [[leakageSafeSplit]]: the train/val/test decision
    * made AS DATA ARRIVES, with every exact copy and verified near-dup
    * of already-ingested content routed to its cluster's split, so a
    * paraphrase of a test document can never land in train even across
    * batches. Batch ids must exceed all ingested ids (the monotone
    * ingestion contract of the dedup family) — ENFORCED at run time via
    * the `_ingest_max` marker ([[checkMonotoneIngest]]; exact replays of
    * the last batch are admitted, violations fail loudly).
    *
    * Index layout under `path` — ALL tables append-only, which is what
    * makes replay after a crash idempotent by construction:
    *  - `hashes/`  (content_hash, keeper): one row per distinct content
    *    ever ingested (unlike the dedup index, near-dup reps ARE
    *    admitted — their bands must catch future docs that match them
    *    but not their cluster's older members);
    *  - `bands/`, `shingles/`: the reps' LSH band keys and shingle sets
    *    ([[buildDedupIndex]] shapes);
    *  - `clusters/` (keeper, label): label HISTORY per rep — the current
    *    label is min(label), sound because a cluster label can only
    *    DECREASE (it is the component's min doc id, new ids are larger,
    *    and merges take the min of the merged labels). A merge appends
    *    correction rows for the losing cluster's keepers; a replayed
    *    append is absorbed by the min.
    *
    * MERGE CASE (the hard one): a batch doc that verifies against reps
    * of two clusters previously labeled L1 < L2 — possibly assigned
    * DIFFERENT splits — merges them; the resolution rule is that the
    * min label's split wins (the whole merged cluster re-keys to L1),
    * the same corpus-order-first convention every dedup operator uses,
    * and exactly what the from-scratch [[leakageSafeSplit]] computes
    * over the accumulated corpus (SplitIngestSpec pins equality,
    * including the merge and the restart-mid-feed cases; equality holds
    * whenever no LSH bucket exceeds `maxBucket` — the cap is a skew
    * guard applied per-batch here but globally from scratch).
    *
    * Scale shape — per-batch cost O(|batch| + matched), the corpus
    * never rescanned and never reshuffled: the batch side broadcasts
    * into every index probe (hash join on content_hash, band join on
    * (band, key), remap filter on label), so index scans are map-side
    * and only batch-sized or matched rows shuffle; the batch-local CC
    * runs over batch-sized edges; appends are batch/matched-sized. */
  def splitIndexIngest(spark: org.apache.spark.sql.SparkSession,
                       delta: DataFrame, idCol: String, textCol: String,
                       seed: String, path: String,
                       numHashes: Int = 12, rowsPerBand: Int = 3,
                       shingleN: Int = 3, minJaccard: Double = 0.8,
                       maxBucket: Int = 10000): DataFrame =
    splitIndexIngestWithCorrections(spark, delta, idCol, textCol, seed, path,
      numHashes, rowsPerBand, shingleN, minJaccard, maxBucket)._1

  /** [[splitIndexIngest]] plus the batch's CORRECTIONS STREAM — the
    * second DataFrame is one row per cluster this batch re-keyed
    * (old_label, new_label, new_split): when a batch merges two clusters
    * previously assigned different splits, docs ALREADY EMITTED under
    * the losing (higher) label belong to the winning label's split from
    * this batch on. A consumer of the per-batch at-ingest outputs folds
    * each batch's corrections over its accumulated rows (join on
    * cluster_label = old_label, applied in batch order — re-keys chain
    * downward across batches) and thereby converges to the final index
    * assignment ([[splitIndexAssignment]]) WITHOUT re-reading the
    * corpus; SplitIngestSpec pins "at-ingest outputs + corrections ==
    * final assignment" on the merge fixture. Empty on merge-free
    * batches. The index appends run before this returns; callers that
    * need their own batch outputs durable BEFORE the index commits (the
    * streaming loop) use [[splitIndexIngestStaged]]. */
  def splitIndexIngestWithCorrections(
      spark: org.apache.spark.sql.SparkSession,
      delta: DataFrame, idCol: String, textCol: String,
      seed: String, path: String,
      numHashes: Int = 12, rowsPerBand: Int = 3,
      shingleN: Int = 3, minJaccard: Double = 0.8,
      maxBucket: Int = 10000): (DataFrame, DataFrame) = {
    val r = splitIndexIngestStaged(spark, delta, idCol, textCol, seed, path,
      numHashes, rowsPerBand, shingleN, minJaccard, maxBucket)
    r.commit()
    (r.assigned, r.corrections)
  }

  /** The result of [[splitIndexIngestStaged]]: the batch's derived
    * outputs, a replay flag, and the deferred index-append commit. */
  final case class SplitIngest(assigned: DataFrame, corrections: DataFrame,
                               replayOfLastBatch: Boolean, commit: () => Unit)

  /** [[splitIndexIngestWithCorrections]] with the index appends DEFERRED
    * behind `commit()` — the crash-safe shape for a streaming loop that
    * must write its own per-batch outputs durably BEFORE the index
    * mutates. Everything is derived (and localCheckpointed) eagerly
    * against the PRE-batch index; the `_ingest_max` replay marker is
    * written here (before any append), so the crash windows line up as:
    *
    *  - crash before the caller's output writes → replay re-derives
    *    everything identically (index unchanged);
    *  - crash between output writes and commit() → replay sees
    *    `replayOfLastBatch` = true with outputs present (skip) or — for
    *    the not-yet-written ones — re-derives them identically;
    *  - crash DURING commit() → `replayOfLastBatch` = true and the
    *    already-written outputs are kept: this matters because a replay
    *    against a partially-appended index CANNOT re-derive the
    *    corrections (the clusters/ append has already applied the merge,
    *    so the re-keying is invisible) — the kept pre-crash files are
    *    the correct ones. The appends themselves replay idempotently
    *    (min-label absorption, candidate distinct, hashes-last gate).
    *
    * `replayOfLastBatch` is the `_ingest_max` marker's (min, max, count)
    * equality — exact replays of the last batch only; anything else out
    * of order (including a batch that merely shares the last min id)
    * fails the monotone guard loudly. */
  def splitIndexIngestStaged(
      spark: org.apache.spark.sql.SparkSession,
      delta: DataFrame, idCol: String, textCol: String,
      seed: String, path: String,
      numHashes: Int = 12, rowsPerBand: Int = 3,
      shingleN: Int = 3, minJaccard: Double = 0.8,
      maxBucket: Int = 10000): SplitIngest = {
    require(!seed.contains("'"), "seed must not contain quotes")
    val (ingestMm, isReplay) = checkMonotoneIngest(spark, path, delta, idCol,
      "hashes", "keeper")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasIndex = fs.exists(new org.apache.hadoop.fs.Path(s"$path/hashes"))
    val idxHashes =
      if (hasIndex) spark.read.parquet(s"$path/hashes")
      else spark.range(0).select(lit("").as("content_hash"), lit(0L).as("keeper"))
    val idxBands =
      if (hasIndex) spark.read.parquet(s"$path/bands")
      else spark.range(0).select(lit(0L).as("keeper"), lit(0).as("band"), lit(0L).as("key"))
    val idxSh =
      if (hasIndex) spark.read.parquet(s"$path/shingles")
      else spark.range(0).select(lit(0L).as("keeper"),
        typedlit(Array.empty[Long]).as("sh"))
    val idxClusters =
      if (hasIndex) spark.read.parquet(s"$path/clusters")
      else spark.range(0).select(lit(0L).as("keeper"), lit(0L).as("label"))

    val hashed = delta.select(col(idCol), col(textCol))
      .withColumn("__h", md5(col(textCol).cast("binary")))
    val dkeep = hashed.groupBy("__h").agg(min(col(idCol)).as("__dk"))
    val tagged = hashed
      .join(idxHashes.select(col("content_hash").as("__h"),
        col("keeper").as("__ck")), Seq("__h"), "left")
      .join(dkeep, "__h")
      .localCheckpoint(true) // feeds reps, the output join, and the admit
    // new reps: batch-unique content not yet in the corpus
    val reps = tagged.filter(col("__ck").isNull && col(idCol) === col("__dk"))
      .select(col(idCol), col(textCol))
      .localCheckpoint(true)
    // in-batch candidate pairs (a < b) + cross pairs vs indexed reps
    val candIn = minhashCandidates(reps, idCol, textCol, numHashes,
      rowsPerBand, shingleN, maxBucket)
    val numBands = numHashes / rowsPerBand
    val banded = withBandKeys(
      minhashSignatures(reps, idCol, textCol, numHashes, shingleN),
      numHashes, rowsPerBand)
    val dBands0 = banded.select(col(idCol),
        explode(array((0 until numBands).map(b =>
          struct(lit(b).as("band"), col(s"b$b").as("key"))): _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
    // dBands (feeds the candidate join AND the admit) and shB (the
    // verify shingle sets) derive independently from the materialized
    // reps — their eager materializations overlap (Par §2.6; r17)
    val Seq(dBands, shB) = Par.run(Seq(
      () => dBands0.localCheckpoint(true),
      () => shingleSets(reps, idCol, textCol, shingleN).localCheckpoint(true)))
    // cross-batch probe, SKEW-GUARDED: a degenerate band key accumulates
    // index rows across batches, so an uncapped probe's matched set for
    // that key would grow per batch and erode the O(|batch| + matched)
    // cost. The cap is applied to the MATCHED INDEX ROWS per (band, key)
    // — materialized BEFORE the pair-expanding join, so a degenerate key
    // is dropped without ever paying its |batch_k|x|index_k| expansion —
    // mirroring leakageSafeSplit's global bucket cap (an index bucket
    // over the cap implies the global bucket is too, so the equality
    // premise is direction-preserved).
    val idxMatched = idxBands
      .join(dBands.select("band", "key").distinct(), Seq("band", "key"),
        "left_semi")
      .localCheckpoint(true) // matched-index-sized; feeds the count AND the join
    // distinct keepers, not raw rows: crash-replay band duplicates must
    // not push a legitimate bucket over the cap before compaction
    val okKeys = idxMatched.groupBy("band", "key")
      .agg(countDistinct("keeper").as("__n"))
      .filter(col("__n") <= maxBucket).select("band", "key")
    val candX = dBands
      .join(idxMatched.join(okKeys, Seq("band", "key"), "left_semi"),
        Seq("band", "key"))
      .select(col(idCol).as("a_id"), col("keeper").as("b_id")).distinct()
    // verify: in-batch over fresh shingle sets; cross against the index's
    val verIn = jaccardOf(candIn
        .join(shB.select(col(idCol).as("a_id"), col("sh").as("a_sh")), "a_id")
        .join(shB.select(col(idCol).as("b_id"), col("sh").as("b_sh")), "b_id"))
      .filter(col("jaccard") >= minJaccard).select("a_id", "b_id")
    val verX = jaccardOf(candX
        .join(shB.select(col(idCol).as("a_id"), col("sh").as("a_sh")), "a_id")
        .join(idxSh.select(col("keeper").as("b_id"), col("sh").as("b_sh")), "b_id"))
      .filter(col("jaccard") >= minJaccard).select("a_id", "b_id")
      .localCheckpoint(true) // feeds the label lookup AND the edge union
    // current labels of the touched corpus keepers: matched rows only
    // (batch side broadcasts into the clusters scan), min = current
    val kLab = idxClusters
      .join(verX.select(col("b_id").as("keeper")).distinct(), Seq("keeper"), "left_semi")
      .groupBy("keeper").agg(min("label").as("__lab"))
    // batch-local graph: nodes are new reps and TOUCHED cluster labels
    // (label ids double as proxy nodes for their whole cluster)
    val edges = verIn.unionByName(
        verX.join(kLab.withColumnRenamed("keeper", "b_id"), "b_id")
          .select(col("a_id"), col("__lab").as("b_id")))
      .localCheckpoint(true)
    val comps = connectedComponentsAuto(edges).localCheckpoint(true)
    // repLab (new label per new rep — own id when untouched; feeds the
    // clusters append AND the output join) and remaps (merge
    // corrections: a touched label whose component min moved down) both
    // derive only from materialized frames — overlapped (Par; r17)
    val Seq(repLab, remaps) = Par.run(Seq(
      () => reps.select(col(idCol))
        .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
        .select(col(idCol).as("keeper"), coalesce(col("label"), col(idCol)).as("label"))
        .localCheckpoint(true),
      () => kLab.select(col("__lab").as("old_label")).distinct()
        .join(comps.withColumnRenamed("id", "old_label"), Seq("old_label"))
        .filter(col("label") < col("old_label"))
        .localCheckpoint(true)))
    // at-ingest assignment for EVERY batch doc: corpus-dup docs resolve
    // their keeper's post-batch label; batch docs take their rep's
    val corpusLab = idxClusters
      .join(tagged.filter(col("__ck").isNotNull)
        .select(col("__ck").as("keeper")).distinct(), Seq("keeper"), "left_semi")
      .groupBy("keeper").agg(min("label").as("__lab0"))
      .join(remaps.select(col("old_label").as("__lab0"),
        col("label").as("__r")), Seq("__lab0"), "left")
      .select(col("keeper").as("__ck"),
        coalesce(col("__r"), col("__lab0")).as("__clab"))
    val batchLab = repLab.select(col("keeper").as("__dk"), col("label").as("__blab"))
    // corrections (materialized BEFORE the clusters/ append reads+writes
    // the same path) and assigned are independent given remaps/repLab —
    // overlapped (Par; r17)
    val Seq(corrections, assigned) = Par.run(Seq(
      () => idxClusters
        .join(remaps.select(col("old_label").as("label"),
          col("label").as("__new")), Seq("label"))
        .select(col("keeper"), col("__new").as("label"))
        .localCheckpoint(true),
      () => tagged
        .join(corpusLab, Seq("__ck"), "left")
        .join(batchLab, Seq("__dk"), "left")
        .select(col(idCol),
          coalesce(col("__clab"), col("__blab")).as("cluster_label"))
        .withColumn("split", splitOf(col("cluster_label"), seed))
        .localCheckpoint(true)))
    // the replay marker commits BEFORE any external write — see the
    // staged docstring's crash-window analysis
    ingestMm.foreach(recordIngestMax(spark, path, _))
    val commit = () => {
      // writes: hashes/ LAST — it is the gate that decides what counts as
      // a new rep, so it acts as the batch's commit marker. A crash before
      // it replays the whole batch identically (same reps re-derived);
      // the earlier appends' duplicates are harmless by construction
      // (label rows absorb into min-resolution, duplicate band rows into
      // the candidate distinct, duplicate shingle rows only re-emit edges
      // CC already contracts) and compaction reclaims the space. The
      // three non-gate appends are mutually independent (distinct
      // tables, all inputs localCheckpointed) — overlapped (Par; r17);
      // only the gate's strictly-after ordering is crash-semantic.
      Par.all(
        () => corrections.unionByName(repLab)
          .write.mode("append").parquet(s"$path/clusters"),
        () => dBands.select(col(idCol).as("keeper"), col("band"), col("key"))
          .write.mode("append").parquet(s"$path/bands"),
        () => shB.withColumnRenamed(idCol, "keeper")
          .write.mode("append").parquet(s"$path/shingles"))
      repLab.select(col("keeper").as(idCol))
        .join(tagged.select(col(idCol), col("__h")), Seq(idCol))
        .select(col("__h").as("content_hash"), col(idCol).as("keeper"))
        .write.mode("append").parquet(s"$path/hashes")
    }
    SplitIngest(assigned,
      remaps.select(col("old_label"), col("label").as("new_label"),
        splitOf(col("label"), seed).as("new_split")),
      isReplay, commit)
  }

  /** Rewrite a split index compactly: collapse each rep's label history
    * to its current (min) label, drop the duplicate band/shingle rows
    * a crash-replay may have appended, and prune band buckets over
    * `maxBucket` (the same LSH skew cap the per-batch probe applies —
    * an index bucket over the cap implies the global bucket is too, so
    * pruning it changes nothing the capped probe would have used). One
    * shuffle per table, sized by the index, run at maintenance cadence —
    * never per batch. The `_ingest_max` marker is carried over so the
    * monotone-ingestion guard survives compaction. */
  def compactSplitIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String, destPath: String,
                        maxBucket: Int = 10000): Unit = {
    requireDistinctPaths(spark, path, destPath)
    // the four table rewrites are independent (distinct src/dest) —
    // overlapped so each rewrite's reduce tail back-fills the next
    // rewrite's scan (Par §2.6; r17)
    Par.all(
      () => spark.read.parquet(s"$path/clusters")
        .groupBy("keeper").agg(min("label").as("label"))
        .write.mode("overwrite").parquet(s"$destPath/clusters"),
      () => {
        val sBands = spark.read.parquet(s"$path/bands").distinct()
          .localCheckpoint(true)
        val sOk = sBands.groupBy("band", "key").agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxBucket).select("band", "key")
        sBands.join(sOk, Seq("band", "key"), "left_semi")
          .write.mode("overwrite").parquet(s"$destPath/bands")
      },
      () => spark.read.parquet(s"$path/shingles")
        .groupBy("keeper").agg(first("sh").as("sh"))
        .write.mode("overwrite").parquet(s"$destPath/shingles"),
      () => spark.read.parquet(s"$path/hashes").distinct()
        .write.mode("overwrite").parquet(s"$destPath/hashes"))
    copyIngestMarker(spark, path, destPath)
  }

  /** [[compactSplitIndex]] with a RETENTION horizon — the GDPR/TTL story
    * for the at-ingest split: clusters whose ENTIRE recorded history
    * predates `epochMin` (every keeper id < epochMin; ids are the
    * corpus's arrival order, so an id horizon IS a time horizon) are
    * RETIRED — their label history, band keys, shingle sets and content
    * hashes all drop from the compacted index. Returns the TOMBSTONE
    * stream: one (old_label) row per retired cluster, materialized
    * before the rewrite, for the at-ingest consumer to fold after its
    * corrections (delete accumulated rows with cluster_label =
    * old_label) — SplitRetentionSpec pins "outputs + corrections +
    * tombstones == from-scratch assignment over the retained corpus"
    * (equality holds for horizon-clean feeds: no cluster straddles
    * epochMin — a straddling cluster is NOT retired, keeping its full
    * machinery and its original label, the conservative reading of
    * retention).
    *
    * Forgetting is semantic, not just space: a future exact copy of
    * retired content re-founds a NEW cluster under its own (fresh)
    * label — exactly what "the index holds no data older than the
    * horizon" must mean. Dup docs of a retired cluster that arrived
    * after the horizon were never recorded (the index stores reps
    * only — the same understatement the monotone guard documents), so
    * cluster retirement is decided on recorded history. */
  def compactSplitIndexDropBefore(spark: org.apache.spark.sql.SparkSession,
                                  path: String, destPath: String,
                                  epochMin: Long,
                                  maxBucket: Int = 10000): DataFrame = {
    requireDistinctPaths(spark, path, destPath)
    val cur = spark.read.parquet(s"$path/clusters")
      .groupBy("keeper").agg(min("label").as("label"))
      .localCheckpoint(true) // feeds retire, keep, and the rewrite
    val tombstones = cur.groupBy("label").agg(max("keeper").as("__mx"))
      .filter(col("__mx") < epochMin)
      .select(col("label").as("old_label"))
      .localCheckpoint(true) // survives the source generation's GC
    val keep = cur.join(
        tombstones.withColumnRenamed("old_label", "label"), Seq("label"), "left_anti")
      .localCheckpoint(true)
    val keepKeepers = keep.select("keeper")
    // keep/ tombstones are materialized (localCheckpoint) — the four
    // retained-table rewrites are independent and overlap (Par; r17)
    Par.all(
      () => keep.select("keeper", "label")
        .write.mode("overwrite").parquet(s"$destPath/clusters"),
      () => {
        val sBands = spark.read.parquet(s"$path/bands").distinct()
          .join(keepKeepers, Seq("keeper"), "left_semi")
          .localCheckpoint(true)
        val sOk = sBands.groupBy("band", "key").agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxBucket).select("band", "key")
        sBands.join(sOk, Seq("band", "key"), "left_semi")
          .write.mode("overwrite").parquet(s"$destPath/bands")
      },
      () => spark.read.parquet(s"$path/shingles")
        .groupBy("keeper").agg(first("sh").as("sh"))
        .join(keepKeepers, Seq("keeper"), "left_semi")
        .write.mode("overwrite").parquet(s"$destPath/shingles"),
      () => spark.read.parquet(s"$path/hashes").distinct()
        .join(keepKeepers, Seq("keeper"), "left_semi")
        .write.mode("overwrite").parquet(s"$destPath/hashes"))
    copyIngestMarker(spark, path, destPath)
    tombstones
  }

  /** Carry the `_ingest_max` monotonicity marker from a compacted index
    * to its destination (the guard would otherwise fall back to a
    * one-time max scan on the next ingest — correct, just slower). */
  private def copyIngestMarker(spark: org.apache.spark.sql.SparkSession,
                               path: String, destPath: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"$path/_ingest_max")
    val fs = src.getFileSystem(conf)
    if (fs.exists(src))
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
        new org.apache.hadoop.fs.Path(s"$destPath/_ingest_max"),
        false, true, conf)
  }

  /** The split index's final per-doc assignment — docs resolve via
    * content hash to their rep's CURRENT (min) label; equals
    * [[leakageSafeSplit]] over everything ingested (SplitIngestSpec). */
  def splitIndexAssignment(spark: org.apache.spark.sql.SparkSession,
                           docs: DataFrame, idCol: String, textCol: String,
                           seed: String, path: String): DataFrame = {
    val cur = spark.read.parquet(s"$path/clusters")
      .groupBy("keeper").agg(min("label").as("label"))
    docs.select(col(idCol), md5(col(textCol).cast("binary")).as("__h"))
      .join(spark.read.parquet(s"$path/hashes")
        .select(col("content_hash").as("__h"), col("keeper")), "__h")
      .join(cur, "keeper")
      .select(col(idCol), col("label").as("cluster_label"),
        splitOf(col("label"), seed).as("split"))
  }

  /** Embedding-cosine near-dup via banded sign-LSH: `tables` independent
    * hash tables of `bitsPerTable` hyperplane sign bits each; a pair is a
    * candidate if it collides in any table, and survives if cosine >=
    * `threshold`. Sign bits are pure column algebra (a dot with a ±1
    * literal plane); the only shuffles are the bucket exchange and the
    * two id→vector joins for the final cosine check. */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
                        dim: Int, threshold: Double,
                        tables: Int = 8, bitsPerTable: Int = 8,
                        maxBucket: Int = 10000): DataFrame = {
    val keyCols = (0 until tables).map { t =>
      val bits = (0 until bitsPerTable).map { bit =>
        val plane = VectorFunctions.signPlane(t, bit, dim)
        when(VectorFunctions.dotLit(col(vecCol), plane) > 0, lit(1L << bit)).otherwise(lit(0L))
      }
      bits.reduce(_ + _).as(s"t$t")
    }
    // vectors ride inside the bucket structs (same shape as
    // simhashCandidates): cosine is checked at pair expansion and the
    // final distinct only sees survivors — no id→vector joins. A pair
    // colliding in several tables re-evaluates its cosine up to `tables`
    // times map-side, which is far cheaper than shuffling every raw
    // candidate through two joins.
    val keyed = emb.select(col(idCol) +: col(vecCol) +: keyCols: _*)
    val buckets = keyed.select(
      struct(col(idCol).as("id"), col(vecCol).as("vec")).as("e"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"), col(s"t$t").as("key"))): _*)).as("bk"))
      .select(col("e"), col("bk.tbl").as("tbl"), col("bk.key").as("key"))
    val es = col("es")
    buckets.groupBy("tbl", "key")
      .agg(sort_array(collect_list(col("e"))).as("es")) // struct sort: id asc
      .filter(size(es) >= 2 && size(es) <= maxBucket)
      .select(es, posexplode(es).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(es, col("i") + lit(2), size(es) - col("i") - lit(1))).as("b"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        // barrier: keep the 64-dim cosine evaluated ONCE per candidate —
        // the >= threshold filter would otherwise be pushed below this
        // projection and duplicate the fold
        org.apache.spark.sql.graft.NoPushBarrier(
          VectorFunctions.cosine(col("a.vec"), col("b.vec"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): collapse exact-duplicate vectors to their min-id
    * representative, assign each representative to its nearest centroid
    * (the same broadcast-map bucketing as the IVF index / cluster
    * profiling), then inside each cluster drop every representative that
    * has a LOWER-id neighbor whose cosine clears `threshold` — the public
    * SemDeDup implementation's upper-triangle rule (pairwise similarities
    * per cluster; a row is removed when any earlier row in its cluster is
    * ε-close). Near-dups straddling a cluster boundary are NOT compared:
    * that is the approximation that makes the op linear in cluster width
    * instead of corpus², and the exact-first collapse keeps width a
    * function of near-dup structure, not copy counts.
    *
    * Output: one decision row per input id — (id, cid, keep). A
    * non-representative exact copy inherits its representative's cluster
    * and is always dropped; a representative keeps iff no lower-id
    * in-cluster neighbor clears the threshold.
    *
    * Scale shape: one groupBy(vector) shuffle + broadcast-map assignment,
    * ONE groupBy(cid) shuffle whose pair expansion is cluster-local
    * (posexplode + slice — O(width) per emitted row, never a width²
    * value), then an id-keyed shuffle fanning decisions back over copies.
    * Clusters wider than `maxCluster` fail loudly in-plan (assert_true):
    * a cluster that wide means the centroid set underfits the corpus —
    * fit more centroids (Ann.kmeans) rather than silently skip decisions.
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    centroids: Array[(Int, Array[Float])], threshold: Double,
                    maxCluster: Int = 10000): DataFrame = {
    val repIds = emb.groupBy(col(vecCol)).agg(min(col(idCol)).as("__rep"))
    val withRep = emb.select(col(idCol), col(vecCol)).join(repIds, Seq(vecCol))
    val reps = withRep.filter(col(idCol) === col("__rep"))
      .select(col(idCol), col(vecCol))
    val assigned = Ann.assignBuckets(reps, idCol, vecCol, centroids)
    val es = col("es")
    val dups = assigned
      .select(struct(col("vec_id").as("id"), col("embedding").as("vec")).as("e"),
        col("bucket"))
      .groupBy("bucket")
      .agg(sort_array(collect_list(col("e"))).as("es")) // struct sort: id asc
      .filter(assert_true(size(es) <= maxCluster,
        lit(s"semanticDedup: cluster exceeds $maxCluster members — the " +
          "centroid set underfits this corpus; fit more centroids " +
          "(Ann.kmeans) instead")).isNull)
      .filter(size(es) >= 2)
      .select(es, posexplode(es).as(Seq("i", "a")))
      .select(col("a"),
        explode(slice(es, col("i") + lit(2), size(es) - col("i") - lit(1))).as("b"))
      .select(col("b.id").as("__rep"),
        // barrier: keep the cosine evaluated ONCE per candidate (the
        // threshold filter would otherwise push below and duplicate it)
        org.apache.spark.sql.graft.NoPushBarrier(
          VectorFunctions.cosine(col("a.vec"), col("b.vec"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .select(col("__rep")).distinct()
      .withColumn("__dup", lit(true))
    withRep
      .join(assigned.select(col("vec_id").as("__rep"), col("bucket").as("cid")),
        Seq("__rep"))
      .join(dups, Seq("__rep"), "left")
      .select(col(idCol), col("cid"),
        (col(idCol) === col("__rep") && col("__dup").isNull).as("keep"))
  }

  /** Merge per-document token intervals [pos, pos+n) of corpus-duplicated
    * n-grams into maximal spans — the span-level output of exact substring
    * dedup (the "remove duplicated text, not whole documents" cleanup):
    * overlapping or adjacent duplicated n-grams chain into one
    * (span_start, span_end) row. `hits` carries one row per duplicated
    * n-gram occurrence (docCol, posCol). Scale shape: both window passes
    * share ONE sort partitioned by document — state is bounded by doc
    * length, never corpus size. */
  def duplicatedSpans(hits: DataFrame, n: Int, docCol: String = "doc_id",
                      posCol: String = "pos"): DataFrame =
    mergeSpans(hits.withColumn("__end", col(posCol) + lit(n)),
      docCol, posCol, "__end")

  /** Merge per-document VARIABLE-length [start, end) intervals into
    * maximal spans (overlapping or adjacent intervals chain): the
    * generalized interval union behind [[duplicatedSpans]] (fixed-width
    * hits) and [[substringDedupAnchored]] (extended matches of any
    * length). Both window passes share ONE sort partitioned by document —
    * state is bounded by doc length, never corpus size. Returns
    * (docCol, span_id, span_start, span_end). */
  def mergeSpans(intervals: DataFrame, docCol: String,
                 startCol: String, endCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(docCol).orderBy(startCol, endCol)
    val wPrev = w.rowsBetween(Long.MinValue, -1)
    intervals
      .withColumn("__pme", max(col(endCol)).over(wPrev))
      .withColumn("__new",
        when(col("__pme").isNull || col(startCol) > col("__pme"), 1L).otherwise(0L))
      .withColumn("span_id", sum(col("__new")).over(w))
      .groupBy(col(docCol), col("span_id"))
      .agg(min(col(startCol)).cast("long").as("span_start"),
        max(col(endCol)).cast("long").as("span_end"))
  }

  /** Per-document REMOVAL decisions for exact substring dedup across the
    * corpus — the Gopher/RefinedWeb-style trim operation: an n-gram
    * occurrence is removable when the same n-gram also occurs in a
    * LOWER-id document (the corpus-order-first occurrence is the keeper),
    * and per doc the removable [pos, pos+n) intervals merge into maximal
    * trim spans via [[duplicatedSpans]]. Intra-document repetition with
    * no earlier-doc twin is NOT trimmed (that is q_repetition's
    * dimension). Shuffle shape: one groupBy(h) for the min-doc map, one
    * join back on h (no broadcast hint — the dup map scales with the
    * corpus, Catalyst picks broadcast only while it is small), and the
    * one per-doc sort duplicatedSpans shares across its window passes. */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val sh = docs
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .filter(size(col("__toks")) >= n)
      .select(col(idCol),
        posexplode(org.apache.spark.sql.graft.ShingleHashes(col("__toks"), n))
          .as(Seq("pos", "h")))
    val minDoc = sh.groupBy("h").agg(min(col(idCol)).as("__min_doc"))
    val hits = sh.join(minDoc, Seq("h"))
      .filter(col(idCol) > col("__min_doc"))
      .select(col(idCol), col("pos"))
    duplicatedSpans(hits, n, idCol, "pos")
  }

  /** CHARACTER-level exact substring dedup — maximal cross-doc repeats of
    * ANY length ≥ `minLen` (the Lee et al. 2021 "Deduplicating Training
    * Data Makes Language Models Better" ExactSubstr operation, re-derived
    * Spark-first; reference scope: the span-trim cleanup family around
    * sed's corpus tooling has no counterpart — this is the LLM-pipeline
    * extension surface).
    *
    * Correctness shape: a position is covered by SOME cross-doc repeat of
    * length ≥ L iff it is covered by a duplicated L-char-gram (any
    * M ≥ L repeat contains an L-gram through every position; an L-gram
    * duplicate IS a length-L repeat). So the union of per-position
    * duplicated-L-gram intervals, interval-merged per document, EQUALS
    * the union of all maximal ≥L repeats — suffix-array-grade trim
    * output without building suffix arrays. Keeper semantics match
    * [[spanDedup]]: the minimum-id document owning a gram keeps it;
    * later docs trim. Hash = 60-bit md5 prefix, engine-replicable
    * (DuckDB `('0x' || substr(md5(g),1,15))::BIGINT`); collisions
    * (~n²/2⁶¹) cause identical spurious trims in both engines — the
    * shingling trade at 28 more bits than ShingleHashes.
    *
    * Scale shape: gram hashing is in-row map-only column algebra
    * (transform over a sequence — no join, no shuffle); the exchanges
    * are ONE groupBy(h) with map-side partial min and ONE join back on
    * h, shuffling (doc, pos, 8-byte hash) per position — ~byte-per-
    * corpus-char×20, the same order as suffix-array construction moves.
    * For corpora where that is too hot, [[substringDedupAnchored]] is
    * the winnowing-sampled path (w× fewer shuffle rows). The span merge
    * is [[duplicatedSpans]]' per-doc sort — state bounded by doc length.
    * Returns (idCol, span_id, span_start, span_end), char offsets,
    * end exclusive. */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
                     minLen: Int): DataFrame = {
    val hits = gramHits(docs, idCol, textCol, minLen)
    duplicatedSpans(hits, minLen, idCol, "pos")
  }

  /** The 100 TB path of [[substringDedup]]: winnowing-sampled anchors +
    * bidirectional seed extension instead of per-position gram hashing.
    * Each doc selects ~2/(w+1) of its k-gram positions as anchors
    * (WinnowedAnchors — content-local, so copies agree); only anchors
    * enter the corpus-wide exchange, a ~(w+1)/2× shuffle-row reduction.
    * Every later-doc anchor pairs with the corpus-EARLIEST occurrence of
    * its gram hash (star pairing — linear in occurrences, never
    * quadratic), texts join in, and MatchExtend walks the real
    * characters both ways from the seed — a hash collision extends to
    * null and is filtered, so every emitted interval is a TRUE shared
    * substring with an earlier doc. Intervals ≥ `minLen` merge per doc
    * via [[mergeSpans]].
    *
    * Guarantee (winnowing, t = w + k − 1 ≤ minLen enforced): both copies
    * of any cross-doc repeat of length ≥ minLen select a common anchor
    * gram, so the repeat is found and fully recovered by extension —
    * PROVIDED the anchor's corpus-earliest occurrence is in the matching
    * doc. When boilerplate makes the same gram appear in an unrelated
    * earlier doc, the star pairs with that doc instead and may extend
    * shorter — the recall trade for linear pair growth (the exact
    * operator has no such gap; SubstringDedupSpec fuzzes anchored ⊆
    * exact and exercises the planted guarantee). Spans are maximal
    * EXTENDED matches, so they can exceed the exact operator's gram
    * union at the edges by < k−1 chars — callers trimming text get
    * strictly more duplicate removal, never less, within true repeats. */
  def substringDedupAnchored(docs: DataFrame, idCol: String, textCol: String,
                             minLen: Int, k: Int = 16, w: Int = 25): DataFrame = {
    require(w + k - 1 <= minLen,
      s"winnowing guarantee needs w + k - 1 <= minLen, got $w + $k - 1 > $minLen")
    val anchors = docs
      .filter(length(col(textCol)) >= k)
      .select(col(idCol),
        explode(org.apache.spark.sql.graft.WinnowedAnchors(col(textCol), k, w)).as("__a"))
      .select(col(idCol), col("__a.pos").as("pos"), col("__a.h").as("h"))
      // materialized once: the subtree feeds BOTH the earliest-occurrence
      // groupBy and the extension join, and the two exchanges don't
      // canonicalize to a reused scan — without this the whole-corpus
      // anchor walk runs twice per job. Lazy persist, not an eager
      // localCheckpoint: the groupBy's map stage populates the cache and
      // the join stage reads it, so no blocking write/read round-trip
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val earliest = anchors
      .groupBy("h")
      .agg(min(struct(col(idCol), col("pos"))).as("__e"))
      .select(col("h"), col("__e")(idCol).as("__e_id"), col("__e")("pos").as("__e_pos"))
    val txt = docs.select(col(idCol), col(textCol))
    // seeds group per (later doc, earliest doc) BEFORE the text joins:
    // a shared repeat contributes ~len/13 anchor seeds per doc pair, and
    // joining texts at seed granularity would shuffle both full texts
    // once PER SEED (measured 69 GB / 109 s of the 1000× run's wall) —
    // grouped, each text crosses the wire once per DOC PAIR and every
    // seed extends in-row. Seed-list state is bounded by a doc's anchor
    // count (≤ len/(w+1)·2).
    val ext = anchors.join(earliest, Seq("h"))
      .filter(col(idCol) > col("__e_id"))
      .groupBy(col(idCol), col("__e_id"))
      .agg(collect_list(struct(col("pos"), col("__e_pos"))).as("__seeds"))
      .join(txt, Seq(idCol))
      .join(txt.select(col(idCol).as("__e_id"), col(textCol).as("__e_text")), Seq("__e_id"))
      .select(col(idCol), explode(transform(col("__seeds"), sd =>
        // barrier: the null/length filters below must not push under
        // this projection and re-run the extension walk per predicate
        org.apache.spark.sql.graft.NoPushBarrier(
          org.apache.spark.sql.graft.MatchExtend(
            col("__e_text"), sd("__e_pos").cast("long"),
            col(textCol), sd("pos").cast("long"), k)))).as("__se"))
      .filter(col("__se").isNotNull)
      .select(col(idCol), element_at(col("__se"), 1).as("__start"),
        element_at(col("__se"), 2).as("__end"))
      .filter(col("__end") - col("__start") >= minLen)
      .distinct()
    mergeSpans(ext, idCol, "__start", "__end")
  }

  /** Apply [[substringDedup]]'s trim decisions — the Lee et al. 2021
    * corpus-cleaning OUTPUT: every document re-assembled from the
    * segments BETWEEN its trim spans (docs with no spans keep their
    * full text). The string surgery is one in-row `aggregate` fold over
    * the doc's sorted span list — no explode, no per-segment rows; the
    * only additional exchange beyond [[substringDedup]] is the per-doc
    * span collect (state bounded by a doc's span count) and the join
    * back to text. Returns
    * (idCol, n_spans, removed_chars, kept_md5) — the count/size audit
    * plus an order-exact content hash of the cleaned text (the
    * compare-friendly projection; swap the md5 for the kept string
    * itself to materialize the cleaned corpus). */
  def substringTrim(docs: DataFrame, idCol: String, textCol: String,
                    minLen: Int): DataFrame = {
    val spans = substringDedup(docs, idCol, textCol, minLen)
      .groupBy(col(idCol))
      .agg(
        sort_array(collect_list(struct(
          col("span_start").as("s"), col("span_end").as("e")))).as("__sp"),
        count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start")).as("removed_chars"))
    docs.select(col(idCol), col(textCol))
      .join(spans, Seq(idCol), "left")
      .withColumn("__kept", when(col("__sp").isNull, col(textCol)).otherwise(expr(
        s"""concat(
              aggregate(__sp,
                named_struct('p', CAST(0 AS BIGINT), 'a', ''),
                (st, x) -> named_struct('p', x.e,
                  'a', concat(st.a, substring($textCol, CAST(st.p + 1 AS INT), CAST(x.s - st.p AS INT)))),
                st -> st.a),
              substring($textCol, CAST(element_at(__sp, -1).e + 1 AS INT)))""")))
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
        md5(col("__kept").cast("binary")).as("kept_md5"))
  }

  /** Most-duplicated substrings — the diagnostic table an operator reads
    * before/after substring dedup (the Lee et al. "what IS all this
    * duplicated text" analysis): for each L-char gram present in ≥ 2
    * docs, the distinct-doc count, total occurrences, and a sample gram,
    * top-K by (n_docs DESC, n_occ DESC, h ASC) planned as TakeOrdered.
    * The shuffle never carries text: the exchange rows are (h, doc_id,
    * pos) only, the sample is pinned to the lexicographically-minimal
    * (doc_id, pos) occurrence (deterministic, engine-identical), and the
    * L chars are sliced AFTER the top-K cut — a k-row broadcast join
    * back to the corpus, so exactly k grams are ever materialized. */
  def topRepeats(docs: DataFrame, idCol: String, textCol: String,
                 minLen: Int, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    // two-stage agg instead of countDistinct-with-siblings (which plans
    // an Expand doubling the position stream) — and ONE exchange for
    // both stages: repartition(h) satisfies the clustering requirement
    // of groupBy(h, doc) AND groupBy(h), so the position stream crosses
    // the wire once and both aggregates run partition-local
    val top = docs
      .filter(length(col(textCol)) >= minLen)
      .select(col(idCol), posexplode(
        org.apache.spark.sql.graft.CharGramHashes60(col(textCol), minLen))
        .as(Seq("pos", "h")))
      .repartition(col("h"))
      .groupBy(col("h"), col(idCol))
      .agg(count(lit(1)).as("__occ"), min(col("pos")).as("__mp"))
      .groupBy("h")
      .agg(count(lit(1)).as("n_docs"), sum("__occ").as("n_occ"),
        // global lexicographic (doc, pos) min: the min doc's min pos
        min(struct(col(idCol).as("d"), col("__mp").as("p"))).as("__loc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("h").asc)
      .limit(k)
    broadcast(top)
      .join(docs.select(col(idCol), col(textCol)), top("__loc.d") === col(idCol))
      .select(col("h"), col("n_docs"), col("n_occ"),
        expr(s"substring($textCol, __loc.p + 1, $minLen)").as("sample"))
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("h").asc)
  }

  /** (doc, pos) occurrences of L-char grams whose hash also occurs in a
    * LOWER-id document — the per-position hit stream behind
    * [[substringDedup]]. */
  private def gramHits(docs: DataFrame, idCol: String, textCol: String,
                       minLen: Int): DataFrame = {
    require(minLen >= 4, s"minLen must be >= 4 chars, got $minLen")
    val grams = docs
      .filter(length(col(textCol)) >= minLen)
      .select(col(idCol), posexplode(
        // native fused loop, bit-identical to the transform/md5/conv
        // formulation (and the DuckDB oracle) — the interpreted HOF
        // lambda re-built 4 expression trees per char position
        org.apache.spark.sql.graft.CharGramHashes60(col(textCol), minLen))
        .as(Seq("pos", "h")))
    val minDoc = grams.groupBy("h").agg(min(col(idCol)).as("__min_doc"))
    grams.join(minDoc, Seq("h"))
      .filter(col(idCol) > col("__min_doc"))
      .select(col(idCol), col("pos"))
  }

  // ---------------------------------------------------------------------
  // Incremental substring dedup over a persisted winnowed-anchor index
  // ---------------------------------------------------------------------

  /** Hash-bucket partition count of the substring index's text store —
    * the static-pruning unit of the per-batch extension read (see
    * [[incrementalSubstringDedup]]). */
  val SubstrTextBuckets = 64

  /** Persist the character-dedup anchor index of an ingested corpus — the
    * ExactSubstr analog of [[buildDedupIndex]], the artifact that makes
    * substring dedup INCREMENTAL: an arriving batch trims against the
    * whole history with the corpus never re-anchored. Layout under
    * `path`:
    *  - `anchors/` (h, e_id, e_pos): the corpus-EARLIEST (id, pos)
    *    occurrence of each winnowed k-gram anchor hash — exactly the
    *    star-pairing targets of [[substringDedupAnchored]], ONE row per
    *    distinct hash (not per occurrence), so the index is a sampled
    *    fingerprint ~2/(w+1) the size of the corpus's gram stream;
    *  - `texts/tb=N/` (id, text): corpus text hash-partitioned into
    *    [[SubstrTextBuckets]] directories so a batch's extension walk
    *    reads ONLY the buckets holding matched earlier docs (static
    *    partition pruning — see the classify step).
    * Both writes shuffle hashes and ids; text moves once, straight into
    * its bucket. */
  def buildSubstringIndex(corpus: DataFrame, idCol: String, textCol: String,
                          path: String, k: Int = 16, w: Int = 25): Unit =
    // the two halves are independent writes — overlapped (Par §2.6; r17).
    // Crash contract unchanged: readers require BOTH anchors/ and texts/
    // to exist (either-half-only re-founds with overwrite), so partial
    // completion in ANY order is absorbed.
    Par.all(
      () => earliestAnchors(corpus, idCol, textCol, k, w)
        .write.mode("overwrite").parquet(s"$path/anchors"),
      () => corpus.select(col(idCol).as("id"), col(textCol).as("text"))
        .withColumn("tb", pmod(col("id"), lit(SubstrTextBuckets)).cast("int"))
        .write.mode("overwrite").partitionBy("tb").parquet(s"$path/texts"))

  /** One (h, e_id, e_pos) row per distinct winnowed-anchor hash: the
    * (id, pos)-earliest occurrence — the index unit of
    * [[buildSubstringIndex]] and the probe unit of a batch. */
  private def earliestAnchors(docs: DataFrame, idCol: String, textCol: String,
                              k: Int, w: Int): DataFrame =
    docs.filter(length(col(textCol)) >= k)
      .select(col(idCol),
        explode(org.apache.spark.sql.graft.WinnowedAnchors(col(textCol), k, w)).as("__a"))
      .select(col(idCol), col("__a.pos").as("pos"), col("__a.h").as("h"))
      .groupBy("h")
      .agg(min(struct(col(idCol), col("pos"))).as("__e"))
      .select(col("h"), col("__e")(idCol).as("e_id"), col("__e")("pos").as("e_pos"))

  /** Substring-dedup an arriving batch against a [[buildSubstringIndex]]
    * index plus itself — the ingestion shape at corpus scale, where
    * re-running [[substringDedupAnchored]] over corpus ∪ batch per batch
    * is off the table. Returns the batch docs' merged trim spans
    * (idCol, span_id, span_start, span_end), and they are EQUAL to the
    * from-scratch anchored operator on corpus ∪ batch restricted to
    * batch ids (IncrementalSubstrSpec proves it): the star target of
    * each anchor hash is min(index earliest, batch earliest) = the
    * global earliest, and MatchExtend walks the same real characters.
    * Batch ids must be disjoint from corpus ids (the ingestion
    * contract; monotone ids satisfy it).
    *
    * Scale shape — per-batch cost O(|batch| + matched), corpus never
    * rescanned: the batch anchor walk is batch-sized and persisted once
    * (feeds the batch-earliest groupBy AND the pairing join); the index
    * anchor scan is probed map-side with the batch side broadcast (AQE),
    * shuffling only batch-sized rows, never the index; and the text
    * read for extension statically prunes to the ≤ SubstrTextBuckets
    * hash buckets that hold a matched earlier doc (the bucket set is a
    * bounded driver value like the other guarded collects). Seeds group
    * per doc PAIR before texts join, so each text crosses the wire once
    * per pair and every seed extends in-row. */
  def incrementalSubstringDedup(spark: org.apache.spark.sql.SparkSession,
                                delta: DataFrame, idCol: String, textCol: String,
                                path: String, minLen: Int,
                                k: Int = 16, w: Int = 25): DataFrame =
    incrementalSubstringDedupManaged(spark, delta, idCol, textCol, path,
      minLen, k, w)._1

  /** [[incrementalSubstringDedup]] plus a cleanup thunk that unpersists
    * the two intermediate caches (batch anchors, seed pairs) once the
    * caller has fully consumed the spans. Long-running ingest loops
    * (the streaming twin calls the operator EVERY micro-batch) must use
    * this form — without it the cached blocks accumulate unboundedly
    * across batches. */
  def incrementalSubstringDedupManaged(
      spark: org.apache.spark.sql.SparkSession,
      delta: DataFrame, idCol: String, textCol: String,
      path: String, minLen: Int,
      k: Int = 16, w: Int = 25): (DataFrame, () => Unit) = {
    require(w + k - 1 <= minLen,
      s"winnowing guarantee needs w + k - 1 <= minLen, got $w + $k - 1 > $minLen")
    val dAnchors = delta
      .filter(length(col(textCol)) >= k)
      .select(col(idCol),
        explode(org.apache.spark.sql.graft.WinnowedAnchors(col(textCol), k, w)).as("__a"))
      .select(col(idCol), col("__a.pos").as("pos"), col("__a.h").as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idxA = spark.read.parquet(s"$path/anchors")
    // global earliest per batch-carried hash = min(corpus earliest from
    // the index, batch earliest) — identical to the from-scratch star
    // target over corpus ∪ batch for every hash the batch can pair on
    val dEarl = dAnchors.groupBy("h")
      .agg(min(struct(col(idCol), col("pos"))).as("__de"))
      .select(col("h"), col("__de")(idCol).as("d_id"), col("__de")("pos").as("d_pos"))
    val idxWins = col("e_id").isNotNull &&
      (col("e_id") < col("d_id") ||
        (col("e_id") === col("d_id") && col("e_pos") <= col("d_pos")))
    val ge = dEarl.join(idxA, Seq("h"), "left")
      .select(col("h"),
        when(idxWins, col("e_id")).otherwise(col("d_id")).as("__e_id"),
        when(idxWins, col("e_pos")).otherwise(col("d_pos")).as("__e_pos"))
    val pairs = dAnchors.join(ge, Seq("h"))
      .filter(col(idCol) > col("__e_id"))
      .groupBy(col(idCol), col("__e_id"))
      .agg(collect_list(struct(col("pos"), col("__e_pos"))).as("__seeds"))
      // shared by the bucket probe below and the extension job
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // text buckets holding a matched earlier doc: ≤ SubstrTextBuckets
    // values — a hard-bounded driver collect — so the corpus text read
    // prunes at plan time to the matched partitions only
    val tbs = pairs
      .select(pmod(col("__e_id"), lit(SubstrTextBuckets)).cast("int").as("tb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val corpusTxt = spark.read.parquet(s"$path/texts")
      .filter(col("tb").isin(tbs: _*))
      .select(col("id").as("__e_id"), col("text").as("__e_text"))
    // the earlier side of a pair may also be a batch doc (in-batch
    // repeat with no earlier corpus twin) — ids are disjoint, so the
    // union resolves each __e_id exactly once
    val etxt = corpusTxt.unionByName(
      delta.select(col(idCol).as("__e_id"), col(textCol).as("__e_text")))
    val ext = pairs
      .join(delta.select(col(idCol), col(textCol)), Seq(idCol))
      .join(etxt, Seq("__e_id"))
      .select(col(idCol), explode(transform(col("__seeds"), sd =>
        org.apache.spark.sql.graft.NoPushBarrier(
          org.apache.spark.sql.graft.MatchExtend(
            col("__e_text"), sd("__e_pos").cast("long"),
            col(textCol), sd("pos").cast("long"), k)))).as("__se"))
      .filter(col("__se").isNotNull)
      .select(col(idCol), element_at(col("__se"), 1).as("__start"),
        element_at(col("__se"), 2).as("__end"))
      .filter(col("__end") - col("__start") >= minLen)
      .distinct()
    (mergeSpans(ext, idCol, "__start", "__end"),
      () => { dAnchors.unpersist(); pairs.unpersist(); () })
  }

  /** Admit a batch into the substring index — the maintenance half of
    * the incremental loop (classify → admit → next batch sees it),
    * without any rebuild. The batch's per-hash earliest anchors append
    * for hashes NOT yet indexed (an already-indexed hash keeps its
    * first-ingested owner: with monotone ingestion ids arrival order IS
    * (id, pos) order, so `anchors/` stays the global earliest without
    * rewriting rows); the batch's text appends into its hash buckets.
    * Unlike exact dedup's index, EVERY doc is admitted — a trimmed doc
    * still owns its surviving text, and a future repeat of that text
    * must pair against it. Append cost is O(|batch|): the anti-join
    * probes the index scan with the batch side broadcast (AQE) and the
    * writes are batch-sized. */
  def appendToSubstringIndex(spark: org.apache.spark.sql.SparkSession,
                             delta: DataFrame, idCol: String, textCol: String,
                             path: String, k: Int = 16, w: Int = 25): Unit = {
    val idxH = spark.read.parquet(s"$path/anchors").select("h")
    // independent tables — overlapped (Par; r17). Replay in either crash
    // order is absorbed: anchor re-appends anti-join away, duplicate
    // text rows only fan out extension seeds the final distinct
    // re-collapses (the streamingSubstringDedup restart contract).
    Par.all(
      () => earliestAnchors(delta, idCol, textCol, k, w)
        .join(idxH, Seq("h"), "left_anti")
        .write.mode("append").parquet(s"$path/anchors"),
      () => delta.select(col(idCol).as("id"), col(textCol).as("text"))
        .withColumn("tb", pmod(col("id"), lit(SubstrTextBuckets)).cast("int"))
        .write.mode("append").partitionBy("tb").parquet(s"$path/texts"))
  }

  /** Rewrite a substring index compactly: coalesce append-accumulated
    * small files and re-min each anchor hash's owner to the true global
    * earliest (relevant only if batches arrived with non-monotone ids —
    * see [[appendToSubstringIndex]]). One shuffle per table, sized by
    * the index, run at maintenance cadence — never per batch. */
  def compactSubstringIndex(spark: org.apache.spark.sql.SparkSession,
                            path: String, destPath: String): Unit = {
    requireDistinctPaths(spark, path, destPath)
    // independent table rewrites — overlapped (Par; r17)
    Par.all(
      () => spark.read.parquet(s"$path/anchors")
        .groupBy("h").agg(min(struct(col("e_id"), col("e_pos"))).as("__e"))
        .select(col("h"), col("__e")("e_id").as("e_id"), col("__e")("e_pos").as("e_pos"))
        .write.mode("overwrite").parquet(s"$destPath/anchors"),
      () => writeTextsReadable(spark,
        spark.read.parquet(s"$path/texts").repartition(col("tb")), destPath))
  }

  /** Write a (possibly empty) `texts/` table so it is ALWAYS readable.
    * A zero-survivor partitioned write emits no part files — only
    * _SUCCESS — and the next `spark.read.parquet(texts)` fails schema
    * inference (VERDICT r15 what's-wrong #2: a retention horizon past
    * every text id). When no `tb=` directory landed, park an explicit
    * zero-row, schema-bearing marker file INSIDE `tb=0`: partition
    * discovery then finds one partition, reads the schema from the
    * marker, and later partitioned appends coexist with it (the marker
    * is data-shaped, just empty — never a layout conflict). */
  private def writeTextsReadable(spark: org.apache.spark.sql.SparkSession,
                                 texts: DataFrame, destPath: String): Unit = {
    texts.write.mode("overwrite").partitionBy("tb").parquet(s"$destPath/texts")
    val destT = new org.apache.hadoop.fs.Path(s"$destPath/texts")
    val fs = destT.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasPartition = fs.exists(destT) && fs.listStatus(destT)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("tb="))
    if (!hasPartition)
      // Filter(false) folds to an empty LocalRelation — no scan runs;
      // the non-partitioned write of an empty frame DOES emit one
      // schema-bearing part file, which is the whole point
      texts.where(lit(false)).drop("tb")
        .write.mode("overwrite").parquet(s"$destPath/texts/tb=0")
  }

  /** [[compactSubstringIndex]] with a RETENTION horizon — the GDPR/TTL
    * story for the substring-anchor family (round 15): anchors whose
    * recorded earliest occurrence predates `epochMin` drop, and — the
    * part that makes this REAL forgetting — the text store drops every
    * doc with id < epochMin, so retired content physically leaves disk.
    * Returns the TOMBSTONE stream: one (h, e_id) row per retired anchor
    * hash, materialized before the rewrite. Forgetting is conservative
    * in the only direction retention allows: a dropped anchor can only
    * REDUCE detected duplication (later docs keep more text), and no
    * surviving anchor can reference a deleted text — the extension walk
    * reads texts/, which this rewrite filtered by the same horizon, so
    * anchors and texts cannot disagree (a stale anchor would silently
    * drop its pairs in the inner text join; dropping it here keeps the
    * index self-consistent instead). Equality with a from-scratch
    * [[buildSubstringIndex]] over the retained corpus holds for
    * horizon-clean feeds (no anchor hash straddling epochMin);
    * straddlers re-found at their next occurrence
    * (ChunkSubstrRetentionSpec). */
  def compactSubstringIndexDropBefore(spark: org.apache.spark.sql.SparkSession,
                                      path: String, destPath: String,
                                      epochMin: Long): DataFrame = {
    requireDistinctPaths(spark, path, destPath)
    val cur = spark.read.parquet(s"$path/anchors")
      .groupBy("h").agg(min(struct(col("e_id"), col("e_pos"))).as("__e"))
      .select(col("h"), col("__e")("e_id").as("e_id"), col("__e")("e_pos").as("e_pos"))
      .localCheckpoint(true) // feeds retire AND keep
    val tombstones = cur.filter(col("e_id") < epochMin)
      .select(col("h"), col("e_id"))
      .localCheckpoint(true) // survives the source generation's GC
    // horizon past every text id leaves zero survivors — the marker in
    // writeTextsReadable keeps the store readable instead of leaving a
    // schema-inference trap (r15 §8 empty-survivor hardening).
    // cur/tombstones are materialized — the two rewrites overlap (Par; r17)
    Par.all(
      () => cur.filter(col("e_id") >= epochMin)
        .write.mode("overwrite").parquet(s"$destPath/anchors"),
      () => writeTextsReadable(spark,
        spark.read.parquet(s"$path/texts")
          .filter(col("id") >= epochMin)
          .repartition(col("tb")), destPath))
    tombstones
  }

  // ---------------------------------------------------------------------
  // Incremental CDC-chunk dedup over a persisted chunk index
  // ---------------------------------------------------------------------

  /** CDC-chunk-dedup an arriving batch against a persisted chunk index
    * plus itself — the ingestion form of [[cdcDedup]], and the chunk
    * analogue of [[incrementalSubstringDedup]] (simpler: chunks are
    * atomic, no extension walk). The index under `path/chunks` is
    * append-only (ph, owner) rows — each distinct chunk hash with the
    * id of its first-ever owner; a batch chunk classifies dup iff its
    * hash is indexed with a STRICTLY SMALLER owner, or an earlier
    * (id, s) occurrence exists within the batch — with monotone
    * ingestion ids that IS the from-scratch corpus-order-first rule, so
    * the accumulated per-doc reports EQUAL [[cdcDedup]] over everything
    * ingested, row-for-row (ChunkIngestSpec; a doc's report can never
    * be changed by later arrivals, so per-batch outputs are final).
    * The strict owner inequality is what makes a POST-append crash
    * replay idempotent: a replayed batch finds its own chunks indexed
    * under its OWN ids, which never classify its first occurrences as
    * dups (the [[incrementalSubstringDedup]] self-exclusion trick), so
    * the re-derived report is identical; the duplicate owner rows it
    * re-appends are absorbed by min-owner resolution and reclaimed by
    * [[compactChunkIndex]]. Returns (idCol, n_chunks, n_dup_chunks,
    * dup_chars). Scale: the batch side broadcasts into the index probe
    * (hash join on the 16-byte md5, min-owner over MATCHED rows only),
    * shuffles are batch/matched-sized, the append new-hash-sized. */
  def incrementalCdcDedup(spark: org.apache.spark.sql.SparkSession,
                          delta: DataFrame, idCol: String, textCol: String,
                          path: String, w: Int, div: Int): DataFrame = {
    val (ingestMm, _) = checkMonotoneIngest(spark, path, delta, idCol,
      "chunks", "owner")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasIndex = fs.exists(new org.apache.hadoop.fs.Path(s"$path/chunks"))
    val idx =
      if (hasIndex) spark.read.parquet(s"$path/chunks")
      else spark.range(0).select(lit("").as("ph"), lit(0L).as("owner"))
    val ch = cdcChunks(delta, idCol, textCol, w, div)
      .localCheckpoint(true) // feeds classify AND the append
    // earliest indexed owner of the batch's hashes: matched rows only
    val owners = idx
      .join(ch.select("ph").distinct(), Seq("ph"), "left_semi")
      .groupBy("ph").agg(min("owner").as("__own"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("ph").orderBy(col(idCol), col("s"))
    val classified = ch
      .join(owners, Seq("ph"), "left")
      .withColumn("__keep",
        (col("__own").isNull || col("__own") >= col(idCol)) &&
          row_number().over(win) === 1)
      .localCheckpoint(true) // feeds the report AND the new-hash append
    val report = classified
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"),
        count(when(!col("__keep"), 1)).as("n_dup_chunks"),
        coalesce(sum(when(!col("__keep"), col("clen"))), lit(0L)).as("dup_chars"))
    classified.filter(col("__keep"))
      .select(col("ph"), col(idCol).as("owner")).distinct()
      .write.mode("append").parquet(s"$path/chunks")
    ingestMm.foreach(recordIngestMax(spark, path, _))
    report
  }

  /** Rewrite a chunk index compactly (coalesce small append files, drop
    * crash-replay duplicate owner rows to the min owner). Index-sized,
    * maintenance cadence. */
  def compactChunkIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String, destPath: String): Unit = {
    requireDistinctPaths(spark, path, destPath)
    spark.read.parquet(s"$path/chunks")
      .groupBy("ph").agg(min("owner").as("owner"))
      .write.mode("overwrite").parquet(s"$destPath/chunks")
    copyIngestMarker(spark, path, destPath)
  }

  /** [[compactDedupIndexDelta]] for the CHUNK index — closing the last
    * whole-rewrite index family (§8 r16): the single `chunks/`
    * (ph, owner) table moves LSM-style. Manifest base tier by hard
    * link (O(metadata), no Spark job); the inter-swap delta folds
    * alone with a WITHIN-DELTA min-owner fold and lands as
    * byte-sized part file(s), O(churn). Correct because the read path
    * ([[incrementalCdcDedup]]'s probe) min-resolves owners ACROSS
    * tiers — min is associative, so folding the delta alone preserves
    * every hash's global min owner, and crash-replay duplicate rows
    * (which re-append within one swap interval, never straddling the
    * base/delta boundary) collapse in the fold. A table whose tier
    * count exceeds `fullRewriteOver` escalates to
    * [[compactChunkIndex]]'s global min-owner rewrite, which re-bases
    * the manifest — same tiered-compaction amortization as the
    * band families. Returns (table → action) for receipts. */
  def compactChunkIndexDelta(spark: org.apache.spark.sql.SparkSession,
                             path: String, destPath: String,
                             fullRewriteOver: Int = 16): Map[String, String] = {
    requireDistinctPaths(spark, path, destPath)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val manifest = readCompactManifest(fs, path)
    val actions = Seq(
      ("chunks", (d: DataFrame) =>
        d.groupBy("ph").agg(min("owner").as("owner")),
        () => spark.read.parquet(s"$path/chunks")
          .groupBy("ph").agg(min("owner").as("owner"))
          .write.mode("overwrite").parquet(s"$destPath/chunks"))
    ).map { case (t, fold, full) =>
      val (act, files, tiers) = moveTableDelta(spark, path, destPath, t,
        manifest.getOrElse(t, Set.empty),
        manifest.getOrElse(s"$t#tiers", Set.empty)
          .headOption.map(_.toInt).getOrElse(0),
        fullRewriteOver, fold, full)
      (t, act, files, tiers)
    }
    writeCompactManifest(fs, destPath,
      actions.flatMap { case (t, _, f, tiers) =>
        Seq(t -> f, s"$t#tiers" -> Seq(tiers.toString)) }.toMap)
    copyIngestMarker(spark, path, destPath)
    actions.map { case (t, a, _, _) => t -> a }.toMap
  }

  /** [[compactChunkIndex]] with a RETENTION horizon — the GDPR/TTL story
    * for the chunk family (round 15, the split family's
    * [[compactSplitIndexDropBefore]] ported): chunk hashes whose
    * recorded first owner predates `epochMin` (ids are arrival order,
    * so an id horizon IS a time horizon) are RETIRED — their (ph, owner)
    * rows drop from the compacted index, and a future copy of retired
    * content re-founds under a fresh owner, which is what "the index
    * holds nothing older than the horizon" must mean. Returns the
    * TOMBSTONE stream — one (ph, owner) row per retired hash,
    * materialized before the rewrite — for an at-ingest consumer to
    * fold (its accumulated per-doc reports for ids < epochMin drop by
    * id; the hashes document WHAT was forgotten). Decided on RECORDED
    * history, like the split family: a post-horizon dup occurrence of a
    * retired chunk was never indexed (only first owners are), so
    * equality with the from-scratch index over the retained corpus
    * holds for horizon-clean feeds (no chunk content straddling
    * epochMin); a straddling hash forgets conservatively — later
    * batches re-found it, reporting LESS duplication, never trimming
    * against forgotten content (ChunkSubstrRetentionSpec pins both). */
  def compactChunkIndexDropBefore(spark: org.apache.spark.sql.SparkSession,
                                  path: String, destPath: String,
                                  epochMin: Long): DataFrame = {
    requireDistinctPaths(spark, path, destPath)
    val cur = spark.read.parquet(s"$path/chunks")
      .groupBy("ph").agg(min("owner").as("owner"))
      .localCheckpoint(true) // feeds retire AND keep
    val tombstones = cur.filter(col("owner") < epochMin)
      .localCheckpoint(true) // survives the source generation's GC
    cur.filter(col("owner") >= epochMin)
      .write.mode("overwrite").parquet(s"$destPath/chunks")
    copyIngestMarker(spark, path, destPath)
    tombstones
  }

  /** Paragraph-level exact dedup (the Dolma/CCNet granularity between
    * whole-document exact dedup and n-gram span trims): documents split
    * into fixed-budget `paraTokens`-token paragraphs, and a paragraph
    * survives only if it is the corpus-order-FIRST occurrence of its
    * content — every later copy (in other docs or later in the same doc)
    * drops. Returns one row per surviving input doc: total/kept
    * paragraph counts plus the md5 and length of the re-assembled kept
    * text (paragraph order preserved). Docs with zero tokens emit no
    * paragraphs and drop — they carry no trainable text.
    *
    * Scale shape: paragraph construction is map-only in-row array
    * algebra (slice over the token array — no explode-then-groupBy
    * re-assembly of the paragraphs themselves); the ONLY corpus-wide
    * exchange is the first-occurrence window keyed by the 128-bit
    * content hash, whose partitions are copy-cluster-sized (bounded by
    * copies of one paragraph, never by corpus size); the final groupBy
    * re-assembles per doc with state bounded by document length. The
    * shuffle carries (id, ord, 32-char hash) — never the text. */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String,
                     paraTokens: Int): DataFrame = {
    require(paraTokens > 0, "paraTokens must be positive")
    val nParas = ((size(col("__toks")) + paraTokens - 1) / paraTokens).cast("int")
    val paras = transform(sequence(lit(0), nParas - 1),
      g => concat_ws(" ", slice(col("__toks"), g * paraTokens + 1, lit(paraTokens))))
    val exploded = docs
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), posexplode(paras).as(Seq("__g", "__para")))
      .withColumn("__ph", md5(col("__para").cast("binary")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__ph").orderBy(col(idCol), col("__g"))
    val keptText = concat_ws(" ", transform(array_sort(col("__kept")), x => x("__para")))
    exploded
      .withColumn("__keep", row_number().over(w) === 1)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_paras"),
        count(when(col("__keep"), 1)).as("n_kept"),
        collect_list(when(col("__keep"), struct(col("__g"), col("__para"))))
          .as("__kept"))
      .select(col(idCol), col("n_paras"), col("n_kept"),
        md5(keptText.cast("binary")).as("kept_md5"),
        length(keptText).cast("long").as("kept_len"))
  }

  /** Two-phase benchmark decontamination for eval n-gram sets too large
    * to broadcast exactly: a Bloom filter over the eval shingle hashes
    * (~10 bits/item at 1% fpp — 10-60× smaller than the exact 64-bit
    * set) prunes the train shingle stream MAP-SIDE, and only the
    * surviving candidates enter the exact semi-join that removes the
    * Bloom's false positives. Bloom filters have no false NEGATIVES, so
    * the output is exactly the per-doc count of distinct contaminated
    * n-grams (> 0 by construction) — phase 1 changes the cost, never
    * the result, which is why the oracle for this operator is the plain
    * inner-join decontamination. At 100 TB the win is twofold: the
    * broadcast shrinks by the Bloom factor, and the exact join's probe
    * side shrinks from every train shingle to fpp·|train| + true hits.
    *
    * Both inputs carry `hashCol` int64 shingle hashes (train side also
    * `docCol`). The eval side is aggregated once (driver-side Bloom
    * build — same eager-index pattern as Ann.buildIvfIndex). */
  def bloomDecontaminate(trainShingles: DataFrame, evalHashes: DataFrame,
                         docCol: String = "doc_id", hashCol: String = "h",
                         expectedItems: Long = 1000000L,
                         fpp: Double = 0.01): DataFrame = {
    val bf = evalHashes.stat.bloomFilter(hashCol, expectedItems, fpp)
    val bc = trainShingles.sparkSession.sparkContext.broadcast(bf)
    trainShingles
      .filter(org.apache.spark.sql.graft.BloomMightContainLong(col(hashCol), bc))
      .join(evalHashes.select(col(hashCol)).distinct(), Seq(hashCol), "left_semi")
      .groupBy(docCol)
      .agg(countDistinct(col(hashCol)).as("n_contam"))
  }

  /** Cross-source near-duplication matrix — the dataset-curation
    * diagnostic "how much of source A duplicates source B": for every
    * unordered source pair, the number of DOCUMENT pairs (one doc from
    * each side, unordered, self-pairs excluded) whose texts are
    * near-duplicates (identical, or shingle-Jaccard ≥ `minJaccard`).
    *
    * Never quadratic in the duplicate count: documents collapse to
    * exact-content representatives first, LSH+verify runs over reps
    * only, and the doc-pair counts are recovered ARITHMETICALLY from
    * per-(content, source) copy counts — a verified rep pair (r1, r2)
    * contributes c1(sa)·c2(sb) pairs per source combo, an exact cluster
    * contributes c(sa)·c(sb) (or C(c,2) within one source). Copies of
    * near-dup reps are near-dups of each other by construction
    * (identical texts have the rep's Jaccard), so the expansion is
    * exact, not an estimate. Shuffles: the md5 collapse, the banded
    * LSH buckets, and a final groupBy over (source, source) — the
    * per-rep source-count fanout is bounded by the source count. */
  def sourceOverlap(docs: DataFrame, idCol: String, textCol: String,
                    srcCol: String, numHashes: Int = 12, rowsPerBand: Int = 3,
                    shingleN: Int = 3, minJaccard: Double = 0.8,
                    maxBucket: Int = 10000): DataFrame = {
    val h = md5(col(textCol).cast("binary"))
    // copy counts per (content hash, source): the multiplicities the
    // rep-level pair counts expand through
    val cnts = docs.select(h.as("__h"), col(srcCol).as("__src"))
      .groupBy("__h", "__src").agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    // reps feed signatures, verify, and the rep→hash map
    val reps = exactRepresentatives(docs, idCol, h).localCheckpoint(true)
    val cand = minhashCandidates(reps, idCol, textCol, numHashes, rowsPerBand,
      shingleN, maxBucket)
    val verified = jaccardForPairs(reps, idCol, textCol, shingleN, cand)
      .filter(col("jaccard") >= minJaccard).select("a_id", "b_id")
    val repH = reps.select(col(idCol).cast("long").as("__rid"), h.as("__h"))
    val crossP = verified
      .join(repH.select(col("__rid").as("a_id"), col("__h").as("__ha")), "a_id")
      .join(repH.select(col("__rid").as("b_id"), col("__h").as("__hb")), "b_id")
      .join(cnts.select(col("__h").as("__ha"), col("__src").as("__sa"),
        col("__c").as("__ca")), "__ha")
      .join(cnts.select(col("__h").as("__hb"), col("__src").as("__sb"),
        col("__c").as("__cb")), "__hb")
      .select(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"),
        (col("__ca") * col("__cb")).as("__p"))
    val withinP = cnts.select(col("__h"), col("__src").as("__sa"), col("__c").as("__ca"))
      .join(cnts.select(col("__h"), col("__src").as("__sb"), col("__c").as("__cb")), "__h")
      .filter(col("__sa") <= col("__sb"))
      .select(col("__sa").as("source_a"), col("__sb").as("source_b"),
        when(col("__sa") === col("__sb"), expr("__ca * (__ca - 1) div 2"))
          .otherwise(col("__ca") * col("__cb")).as("__p"))
    crossP.union(withinP)
      .groupBy("source_a", "source_b").agg(sum("__p").as("dup_pairs"))
      .filter(col("dup_pairs") > 0)
  }
}
