package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

class DedupAnnSpec extends SparkSpecBase {
  import spark.implicits._

  test("exact dedup groups identical content and keeps the min id") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y"), (7L, "a b c"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(df, "doc_id", "text")
      .select("keeper", "n_copies").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L), (3L, 1L)))
  }

  test("sourceOverlap expands rep-level dups into exact doc-pair counts per source pair") {
    val base = (0 until 30).map(i => s"t$i").mkString(" ")
    val near = (0 until 29).map(i => s"t$i").mkString(" ") + " zz" // 28/30 shingles shared
    val other = (0 until 30).map(i => s"u$i").mkString(" ")
    val df = Seq(
      (0L, base, "A"), (1L, base, "B"), (2L, base, "B"), // exact cluster, A:1 B:2
      (3L, near, "A"),                                   // near-dup of the cluster
      (4L, other, "B"))                                  // unrelated
      .toDF("doc_id", "text", "source")
    // precondition: the near pair must survive LSH banding + verify
    // (deterministic hashes — if this fails the fixture needs longer texts)
    val cand = Dedup.minhashCandidates(
      Dedup.exactRepresentatives(df, "doc_id", md5(col("text").cast("binary"))),
      "doc_id", "text", 12, 3, 3, 10000)
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((0L, 3L)), s"LSH missed the near pair: $cand")
    val got = Dedup.sourceOverlap(df, "doc_id", "text", "source")
      .as[(String, String, Long)].collect().toSet
    // exact cluster {0,1,2}: within A-B = 1x2, B-B = C(2,2) = 1
    // near rep pair (0,3): rep0 counts {A:1, B:2} x rep3 {A:1}
    //   -> (A,A) += 1, (A,B) += 2
    assert(got == Set(("A", "A", 1L), ("A", "B", 4L), ("B", "B", 1L)))
  }

  test("nearDupClusterSizes histograms verified components, exact copies collapse first") {
    val base = (0 until 30).map(i => s"t$i").mkString(" ")
    val near = (0 until 29).map(i => s"t$i").mkString(" ") + " zz"
    val near2 = "zz " + (1 until 30).map(i => s"t$i").mkString(" ")
    val other = (0 until 30).map(i => s"u$i").mkString(" ")
    val otherNear = (0 until 29).map(i => s"u$i").mkString(" ") + " qq"
    val df = Seq(
      (0L, base), (1L, base),   // exact copies -> one rep, no near cluster on their own
      (2L, near), (3L, near2),  // chain 0-2, 0-3 -> one component of size 3
      (4L, other), (5L, otherNear), // component of size 2
      (6L, "lone words only"))      // singleton, never labeled
      .toDF("doc_id", "text")
    // precondition: all four near pairs survive banding (deterministic hashes)
    val cand = Dedup.minhashCandidates(
      Dedup.exactRepresentatives(df, "doc_id", md5(col("text").cast("binary"))),
      "doc_id", "text", 12, 3, 3, 10000).as[(Long, Long)].collect().toSet
    assert(cand.contains((0L, 2L)) && cand.contains((4L, 5L)), s"LSH missed: $cand")
    val got = Dedup.nearDupClusterSizes(df, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 1L), (2L, 1L)))
  }

  test("softDedupWeights: cluster-wide copy counts, weights sum to ~1e6 per cluster") {
    val base = (0 until 30).map(i => s"t$i").mkString(" ")
    val near = (0 until 29).map(i => s"t$i").mkString(" ") + " zz"
    val other = (0 until 30).map(i => s"u$i").mkString(" ")
    val df = Seq(
      (0L, base), (1L, base), (2L, base), // 3 exact copies
      (3L, near),                         // + 1 near-dup -> cluster of 4 docs
      (4L, other),                        // singleton content
      (5L, "lone words only"))            // singleton content
      .toDF("doc_id", "text")
    val got = Dedup.softDedupWeights(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // docs 0,1,2 (exact copies) and 3 (verified near-dup of their rep)
    // share one content cluster: n_copies = 4, weight = 250000 each
    Seq(0L, 1L, 2L, 3L).foreach(id => assert(got(id) == ((4L, 250000L)), s"doc $id: ${got(id)}"))
    // singleton content keeps full weight
    Seq(4L, 5L).foreach(id => assert(got(id) == ((1L, 1000000L)), s"doc $id: ${got(id)}"))
    // every doc weighted exactly once; cluster mass ~1e6 (floor truncation)
    assert(got.size == 6)
    assert(got.values.groupBy(identity).forall { case ((n, w), _) => w * n <= 1000000L && (w + 1) * n > 1000000L })
  }

  test("identical documents share the full MinHash signature") {
    val df = Seq((1L, "w1 w2 w3 w4 w5 w6"), (2L, "w1 w2 w3 w4 w5 w6"),
      (3L, "z1 z2 z3 z4 z5 z6")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text", 12, 3)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("minhashCandidates surfaces duplicate pairs and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, base), (2L, base), (3L, "completely different words here with no overlap at all today"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(df, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical docs equal, token order does not matter (bag semantics)") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val h = Dedup.simhash(df, "doc_id", "text").as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
    assert(h(1L) != h(3L))
  }

  test("ngramJaccard: identical docs -> 1.0, disjoint -> 0.0") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "p q r s t"))
      .toDF("doc_id", "text")
    val j = Dedup.ngramJaccard(df, "doc_id", "text", 3, (a, b) => a("a_id") < b("b_id"))
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) == 0.0)
  }

  test("ngramContainment: embedded doc scores 1.0 where jaccard stays small") {
    // doc 2 is a verbatim chunk of doc 1: every 3-gram of 2 appears in 1
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val short = (10 to 14).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, long), (2L, short), (3L, "p q r s t"))
      .toDF("doc_id", "text")
    val c = Dedup.ngramContainment(df, "doc_id", "text", 3, (a, b) => a("a_id") < b("b_id"))
      .select("a_id", "b_id", "containment").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(c((1L, 2L)) == 1.0)
    assert(c((1L, 3L)) == 0.0)
    // the same pair under jaccard: 3 shared of 28 union
    val j = Dedup.ngramJaccard(df, "doc_id", "text", 3, (a, b) => a("a_id") < b("b_id"))
      .filter($"a_id" === 1 && $"b_id" === 2).select("jaccard").as[Double].head()
    assert(j < 0.2)
  }

  test("ngramContainment: partial overlap is inter/min exactly") {
    // A: 4 tokens -> 2 tri-grams; B shares exactly one tri-gram
    val df = Seq((1L, "a b c d"), (2L, "b c d x y")).toDF("doc_id", "text")
    val r = Dedup.ngramContainment(df, "doc_id", "text", 3, (a, b) => a("a_id") < b("b_id"))
      .select("inter", "n_a", "n_b", "containment")
      .as[(Long, Long, Long, Double)].head()
    assert(r == ((1L, 2L, 3L, 0.5)))
  }

  test("FloatVecDot equals a driver-side loop, and dotLit applies literal planes") {
    val vecs = embeddings.limit(20).select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val got = embeddings.limit(20)
      .select($"vec_id", VectorFunctions.dot($"embedding", $"embedding").as("d"))
      .as[(Long, Double)].collect().toMap
    vecs.foreach { case (id, v) =>
      var acc = 0.0
      v.foreach(x => acc += x.toDouble * x.toDouble)
      assert(got(id) == acc)
    }
    val plane = Seq.fill(64)(1.0)
    val gotL = embeddings.limit(5)
      .select($"vec_id", VectorFunctions.dotLit($"embedding", plane).as("d"))
      .as[(Long, Double)].collect().toMap
    vecs.take(5).foreach { case (id, v) =>
      var acc = 0.0
      v.foreach(x => acc += x.toDouble)
      assert(math.abs(gotL(id) - acc) < 1e-12)
    }
  }

  test("bruteTopK matches an exact driver-side ranking") {
    val all = embeddings.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val queries = all.filter(_._1 < 3)
    val got = Ann.bruteTopK(embeddings, "vec_id", "embedding", queries, 5)
      .select("query_id", "rank", "vec_id").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    queries.foreach { case (qid, qv) =>
      val exp = all.filter(_._1 != qid)
        .map { case (id, v) => (dot(qv, v) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(v, v))), id) }
        .sortBy { case (c, id) => (-c, id) }.take(5).map(_._2).toSeq
      assert(got(qid) == exp, s"query $qid")
    }
  }

  test("ivfTopK returns k ranked probed-bucket neighbours per query") {
    val queries = embeddings.filter($"vec_id" < 3)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val got = Ann.ivfTopK(embeddings, "vec_id", "embedding", queries, 5)
    val byQ = got.select("query_id", "rank").as[(Long, Long)].collect().groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach(rs => assert(rs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("ivfTopK refuses an oversized default centroid collect; fitted centroids pass") {
    // 2 * cap rows at stride 1 would collect them all to the driver
    val big = spark.range(0, Ann.MaxDefaultCentroids * 2L)
      .select($"id", array(lit(1.0f), ($"id" % 7).cast("float")).as("embedding"))
    val queries = Array((0L, Array(1.0f, 1.0f)))
    val err = intercept[IllegalArgumentException] {
      Ann.ivfTopK(big, "id", "embedding", queries, 3, centroidStride = 1)
    }
    assert(err.getMessage.contains("centroidsOpt") &&
      err.getMessage.contains("centroidStride"))
    // same corpus with caller-provided centroids is fine
    val cents = Array(0 -> Array(1.0f, 0.0f), 1 -> Array(1.0f, 6.0f))
    val ok = Ann.ivfTopK(big, "id", "embedding", queries, 3,
      centroidsOpt = Some(cents))
    assert(ok.count() === 3L)
  }

  test("persisted IVF index returns IDENTICAL results to inline ivfTopK") {
    val queries = embeddings.filter($"vec_id" < 3)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val centroids = embeddings.filter($"vec_id" % 50 === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => ((id / 50).toInt, v) }.sortBy(_._1)
    val inline = Ann.ivfTopK(embeddings, "vec_id", "embedding", queries, 5,
      centroidsOpt = Some(centroids))
      .as[(Long, Long, Double, Long)].collect().toSet
    val path = java.nio.file.Files.createTempDirectory("ivfspec").toString
    val idx = Ann.buildIvfIndex(embeddings, "vec_id", "embedding", path, centroids)
    val viaIndex = Ann.searchIvfIndex(spark, idx, queries, 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaIndex == inline)
    // load round-trip: centroids survive the sidecar
    val loaded = Ann.loadIvfIndex(spark, path)
    assert(loaded.centroids.length == centroids.length)
    loaded.centroids.zip(centroids).foreach { case ((c1, v1), (c2, v2)) =>
      assert(c1 == c2 && v1.sameElements(v2))
    }
  }

  test("searchIvfJoin (DataFrame query batch) equals searchIvfIndex exactly") {
    val centroids = embeddings.filter($"vec_id" % 50 === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => ((id / 50).toInt, v) }.sortBy(_._1)
    val path = java.nio.file.Files.createTempDirectory("ivfjoinspec").toString
    val idx = Ann.buildIvfIndex(embeddings, "vec_id", "embedding", path, centroids)
    // a LARGE query batch (every 3rd corpus vector) — the regime the
    // driver-array path can't serve; both paths must agree bit-for-bit
    val queryDf = embeddings.filter($"vec_id" % 3 === 0)
    val queries = Ann.collectQueries(queryDf, "vec_id", "embedding")
    val viaArray = Ann.searchIvfIndex(spark, idx, queries, 5, nprobe = 2)
      .as[(Long, Long, Double, Long)].collect().toSet
    val viaJoin = Ann.searchIvfJoin(idx, queryDf, "vec_id", "embedding", 5, nprobe = 2)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaJoin == viaArray)
    // plan shape: a real equi-join on bucket, no quadratic fallback and
    // no per-id literal enumeration of the candidate set
    val plan = Ann.searchIvfJoin(idx, queryDf, "vec_id", "embedding", 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(!plan.contains("vec_id IN ("))
  }

  test("compactIvfIndex: one file per bucket, search bit-identical") {
    val centroids = embeddings.filter($"vec_id" % 50 === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => ((id / 50).toInt, v) }.sortBy(_._1)
    val path = java.nio.file.Files.createTempDirectory("ivfcompact").toString
    // many-small-files state: empty build + 4 appends, as streaming
    // ingest would leave it
    val idx = Ann.buildIvfIndex(embeddings.filter($"vec_id" < 0),
      "vec_id", "embedding", path, centroids)
    (0 until 4).foreach { i =>
      Ann.appendToIvfIndex(idx, embeddings.filter($"vec_id" % 4 === i),
        "vec_id", "embedding")
    }
    def filesPerBucket(p: String): Map[String, Int] = {
      val root = new java.io.File(p)
      root.listFiles.filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(d => d.getName -> d.listFiles.count(_.getName.startsWith("part-"))).toMap
    }
    val before = filesPerBucket(path)
    assert(before.values.max > 1, "fixture must start fragmented")
    val dest = java.nio.file.Files.createTempDirectory("ivfcompact_out").toString
    val compacted = Ann.compactIvfIndex(spark, idx, dest)
    val after = filesPerBucket(dest)
    assert(after.keySet == before.keySet && after.values.forall(_ == 1),
      s"expected one file per bucket, got $after")
    val queries = Ann.collectQueries(embeddings.filter($"vec_id" < 3),
      "vec_id", "embedding")
    val a = Ann.searchIvfIndex(spark, idx, queries, 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    val b = Ann.searchIvfIndex(spark, compacted, queries, 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(a == b)
    // the sidecar round-trips at the new path too
    assert(Ann.loadIvfIndex(spark, dest).centroids.length == centroids.length)
  }

  test("appendToIvfIndex antiJoinExisting makes a retried append idempotent") {
    val centroids = embeddings.filter($"vec_id" % 50 === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => ((id / 50).toInt, v) }.sortBy(_._1)
    val queries = embeddings.filter($"vec_id" < 3)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val path = java.nio.file.Files.createTempDirectory("ivfidem").toString
    val half = embeddings.count() / 2
    val idx = Ann.buildIvfIndex(embeddings.filter($"vec_id" < half),
      "vec_id", "embedding", path, centroids)
    val batch = embeddings.filter($"vec_id" >= half)
    Ann.appendToIvfIndex(idx, batch, "vec_id", "embedding")
    val once = Ann.searchIvfIndex(spark, idx, queries, 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    // a RETRY of the same batch with the guard inserts nothing new
    Ann.appendToIvfIndex(idx, batch, "vec_id", "embedding", antiJoinExisting = true)
    val afterRetry = Ann.searchIvfIndex(spark, idx, queries, 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(afterRetry == once)
    // and the index row count did not grow
    val n = spark.read.parquet(path).count()
    assert(n == embeddings.count(),
      s"guarded retry must not duplicate rows: $n vs ${embeddings.count()}")
  }

  test("incremental IVF append equals a full rebuild with the same centroids") {
    val centroids = embeddings.filter($"vec_id" % 50 === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => ((id / 50).toInt, v) }.sortBy(_._1)
    val queries = embeddings.filter($"vec_id" < 3)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()

    // build on the first half, append the second half incrementally
    val path = java.nio.file.Files.createTempDirectory("ivfappend").toString
    val half = embeddings.count() / 2
    val idx = Ann.buildIvfIndex(embeddings.filter($"vec_id" < half),
      "vec_id", "embedding", path, centroids)
    Ann.appendToIvfIndex(idx, embeddings.filter($"vec_id" >= half),
      "vec_id", "embedding")

    // one index build over the full corpus, same frozen centroids
    val fullPath = java.nio.file.Files.createTempDirectory("ivffull").toString
    val fullIdx = Ann.buildIvfIndex(embeddings, "vec_id", "embedding",
      fullPath, centroids)

    val viaAppend = Ann.searchIvfIndex(spark, idx, queries, 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    val viaFull = Ann.searchIvfIndex(spark, fullIdx, queries, 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaAppend == viaFull && viaAppend.nonEmpty)
    // appended rows really landed (searchable vectors from the second half)
    assert(viaAppend.exists(_._2 >= half), "results must include appended vectors")
  }

  test("IVF probe scan is partition-pruned to the probed buckets only") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val centroids = embeddings.filter($"vec_id" % 50 === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => ((id / 50).toInt, v) }.sortBy(_._1)
    assert(centroids.length >= 3, "fixture must yield >= 3 buckets")
    val path = java.nio.file.Files.createTempDirectory("ivfprune").toString
    Ann.buildIvfIndex(embeddings, "vec_id", "embedding", path, centroids)
    val probed = Seq(centroids.head._1, centroids.last._1)
    val scan = spark.read.parquet(path).filter($"bucket".isin(probed: _*))
    val scans = scan.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
    // only the 2 probed bucket directories are read, not all of them
    assert(scans.head.selectedPartitions.partitionCount == probed.length,
      s"scan read ${scans.head.selectedPartitions.partitionCount} partitions, wanted ${probed.length}")
  }

  test("IVF recall@k vs bruteTopK rises with nprobe and clears 0.9 by nprobe=4") {
    // ANN QUALITY gate (not just equality-with-inline): the probe-pruned
    // search must recover most of the exact top-k, widening the probe set
    // must never lose recall, and FITTED centroids must beat the
    // arbitrary stride sample (the reason kmeans exists in the stack).
    // Full probing (nprobe = #centroids) scans every bucket, so recall is
    // exactly 1.0 there by construction.
    val queries = embeddings.filter($"vec_id" < 10)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val k = 10
    val exact = Ann.bruteTopK(embeddings, "vec_id", "embedding", queries, k)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallSweep(centroids: Array[(Int, Array[Float])],
                    nprobes: Seq[Int]): Seq[(Int, Double)] = {
      val path = java.nio.file.Files.createTempDirectory("ivfrecall").toString
      val idx = Ann.buildIvfIndex(embeddings, "vec_id", "embedding", path, centroids)
      val sweep = nprobes.map { np =>
        val got = Ann.searchIvfIndex(spark, idx, queries, k, np)
          .select("query_id", "vec_id").as[(Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        np -> queries.map { case (qid, _) =>
          got.getOrElse(qid, Set.empty).intersect(exact(qid)).size.toDouble / k
        }.sum / queries.length
      }
      sweep.sliding(2).foreach { case Seq((npA, rA), (npB, rB)) =>
        assert(rB >= rA - 1e-9, s"recall fell from $rA (nprobe=$npA) to $rB (nprobe=$npB)")
      }
      sweep
    }
    // production path: kmeans-fitted centroids (deterministic k-means‖).
    // GATE HONESTY (round 10): the pre-r10 id-seeding gated 0.92 here —
    // but only because the seeds WERE the queries (init = the 10
    // smallest ids = this test's query set; recall with those seeds and
    // ZERO Lloyd iterations is 0.93). This corpus is structureless
    // (intra-label cosine ≈ inter ≈ 0), where any leak-free centroid
    // set lands ~0.7 at nprobe=4 — that is the fair bar; the ≥ 0.9
    // cluster-recovery gate lives in the planted-cluster test below,
    // where it means something.
    val fitted = Ann.kmeans(embeddings, "vec_id", "embedding", 10, iters = 8)
    val fittedSweep = recallSweep(fitted, Seq(1, 2, 4))
    info(s"fitted sweep: $fittedSweep")
    val fittedR4 = fittedSweep.collectFirst { case (4, r) => r }.get
    assert(fittedR4 >= 0.65, s"fitted-centroid recall@$k at nprobe=4 is $fittedR4, expected >= 0.65")
    // arbitrary stride sample: monotone, exact under full probing, and
    // not better than fitted centroids at the same probe budget
    val stride = embeddings.filter($"vec_id" % 50 === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => ((id / 50).toInt, v) }.sortBy(_._1)
    val strideSweep = recallSweep(stride, Seq(1, 2, 4, stride.length))
    assert(strideSweep.last._2 == 1.0, "full probing must recover the exact top-k")
    val strideR4 = strideSweep.collectFirst { case (4, r) => r }.get
    assert(fittedR4 >= strideR4,
      s"fitted centroids ($fittedR4) must not lose to the stride sample ($strideR4) at nprobe=4")
  }

  test("kmeans|| seeding recovers planted clusters under adversarial id order; id-seeding cannot") {
    // 10 tight direction clusters, ids assigned in CLUSTER BLOCKS: the
    // 10 smallest ids all sit in cluster 0 — the exact data order that
    // poisons seed-by-smallest-ids (the pre-r10 init). k-means|| samples
    // by cost, so it finds every cluster regardless of id layout.
    val rng = new scala.util.Random(3)
    val dim = 64
    val centers = Array.fill(10)(Array.fill(dim)(rng.nextGaussian().toFloat))
    val data = (0 until 500).map { i =>
      val c = i / 50 // block layout: ids 0..49 -> cluster 0, ...
      (i.toLong, centers(c).map(x => x + 0.05f * rng.nextGaussian().toFloat))
    }
    val df = data.toDF("vec_id", "embedding")
    val fitted = Ann.kmeans(df, "vec_id", "embedding", 10, iters = 8)
    // determinism: the same fit twice is bit-identical
    val fitted2 = Ann.kmeans(df, "vec_id", "embedding", 10, iters = 8)
    assert(fitted.map(_._2.toSeq).toSeq == fitted2.map(_._2.toSeq).toSeq)
    // every true cluster maps to its OWN bucket (purity + coverage = 10
    // distinct buckets, one per planted cluster)
    val assigned = Ann.assignBuckets(df.select($"vec_id", $"embedding"),
      "vec_id", "embedding", fitted)
      .select($"vec_id".cast("long"), $"bucket".cast("int"))
      .as[(Long, Int)].collect().toMap
    val clusterBuckets = (0 until 10).map { c =>
      val bs = (0 until 50).map(j => assigned((c * 50 + j).toLong))
      // the cluster is not split: all 50 members share one bucket
      assert(bs.distinct.length == 1, s"planted cluster $c split across buckets $bs")
      bs.head
    }
    assert(clusterBuckets.distinct.length == 10,
      s"planted clusters collapsed: buckets $clusterBuckets")
    // the id-order-sensitive seeding (10 smallest ids = all cluster 0),
    // run through the same Lloyd depth, CANNOT separate the 10 clusters
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { s += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      s / math.sqrt(na * nb)
    }
    var idCents = data.take(10).map(_._2).toArray
    for (_ <- 0 until 8) {
      val sums = Array.fill(10)(new Array[Double](dim))
      val ns = new Array[Long](10)
      data.foreach { case (_, v) =>
        val bi = idCents.indices.maxBy(i => cos(idCents(i), v))
        for (q <- 0 until dim) sums(bi)(q) += v(q)
        ns(bi) += 1
      }
      idCents = idCents.indices.map(i =>
        if (ns(i) == 0) idCents(i) else sums(i).map(x => (x / ns(i)).toFloat)).toArray
    }
    val idBuckets = (0 until 10).map { c =>
      idCents.indices.maxBy(i => cos(idCents(i), centers(c)))
    }
    info(s"id-seeded distinct buckets over 10 planted clusters: ${idBuckets.distinct.length}")
    assert(idBuckets.distinct.length < 10,
      "id-seeding separated all clusters — fixture no longer adversarial")
  }

  test("IVF-PQ: codes index is ~4x smaller, fair recall @ nprobe=4, exact under a covering rerank") {
    def partBytes(dir: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.filter(p => p.getFileName.toString.startsWith("part-"))
        .mapToLong(p => java.nio.file.Files.size(p)).sum()
      finally s.close()
    }
    val queries = embeddings.filter($"vec_id" < 10)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val k = 10
    val fitted = Ann.kmeans(embeddings, "vec_id", "embedding", 10, iters = 8)
    val fullPath = java.nio.file.Files.createTempDirectory("ivfpq_full").toString
    val idx = Ann.buildIvfIndex(embeddings, "vec_id", "embedding", fullPath, fitted)
    val pq = Ann.buildIvfPqIndex(spark,
      idx, java.nio.file.Files.createTempDirectory("ivfpq_codes").toString)
    // compression is the index's point: int8 residual codes vs float32.
    // Per-row payload is 76 B (64 code + 4 scale + 8 id) vs 264 B — ~3.5x;
    // at this fixture's ~50-row files parquet footers/dictionaries eat
    // part of that, so the gate is 2.5x (the ratio only improves with
    // file size as fixed metadata amortizes)
    val (fullB, codeB) = (partBytes(fullPath), partBytes(pq.codesPath))
    assert(codeB * 5 <= fullB * 2,
      s"codes index $codeB B not >= 2.5x smaller than full index $fullB B")
    // ANN quality gate at a realistic rerank budget (4k), same FAIR bar
    // as the uncompressed index on this structureless corpus (see the
    // recall-sweep test's gate-honesty note: 0.9 was query-seed leakage)
    val exact = Ann.bruteTopK(embeddings, "vec_id", "embedding", queries, k)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Ann.searchIvfPqIndex(spark, pq, queries, k, nprobe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = queries.map { case (qid, _) =>
      got.getOrElse(qid, Set.empty).intersect(exact(qid)).size.toDouble / k
    }.sum / queries.length
    assert(recall >= 0.65, s"IVF-PQ recall@$k at nprobe=4 is $recall, expected >= 0.65")
    // with a rerank pool covering every probed row, phase 2 re-ranks the
    // whole probe set exactly — results must EQUAL the uncompressed search
    val covering = Ann.searchIvfPqIndex(spark, pq, queries, k,
      nprobe = 2, rerank0 = 100000)
    val ref = Ann.searchIvfIndex(spark, idx, queries, k, nprobe = 2)
    assert(covering.collect().map(_.toSeq).toSet == ref.collect().map(_.toSeq).toSet)
  }

  test("ngramJaccard drops documents shorter than n tokens instead of crashing") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "too short"), (4L, ""))
      .toDF("doc_id", "text")
    val j = Dedup.ngramJaccard(df, "doc_id", "text", 3, (a, b) => a("a_id") < b("b_id"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(j == Set((1L, 2L))) // short/empty docs have no 3-grams
  }

  test("simhashCandidates equals the quadratic hamming scan (lossless banding)") {
    val df = documents.limit(120)
    val fps = Dedup.simhash(df, "doc_id", "text").as[(Long, Long)].collect()
    val expected = (for {
      (a, ha) <- fps; (b, hb) <- fps if a < b
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got = Dedup.simhashCandidates(df, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("connectedComponents labels each cluster with its minimum id") {
    // two components: {1,2,3,9} via chain, {5,6}; singleton 7 not in edges
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L)).toDF("a_id", "b_id")
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("dedupCorpus keeps one representative per duplicate cluster") {
    val docs = Seq(1L, 2L, 3L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val kept = Dedup.dedupCorpus(docs, "doc_id", pairs).as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 5L, 7L)) // cluster minima + untouched doc
  }

  test("exactRepresentatives keeps one min-id row per distinct key") {
    val df = Seq((5L, "a b c"), (2L, "a b c"), (3L, "x y"), (7L, "a b c"))
      .toDF("doc_id", "text")
    val reps = Dedup.exactRepresentatives(df, "doc_id", md5(col("text").cast("binary")))
      .select("doc_id").as[Long].collect().toSet
    assert(reps == Set(2L, 3L))
  }

  test("dedupPipeline (exact-first) survivors equal the naive LSH-first composition") {
    // a duplicate-saturated corpus: 3 content clusters, each with exact
    // copies AND a near-dup variant; plus a short doc (< n tokens, no
    // shingles) with an exact copy — exact-first must still collapse it
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "completely different words appear here with no overlap at all whatsoever"
    val c = "spark catalyst tungsten codegen shuffle partition broadcast join aggregate window"
    val docs = Seq(
      10L -> a, 11L -> a, 12L -> a, 13L -> (a + " extra"),
      20L -> b, 21L -> b, 22L -> (b + " indeed"),
      30L -> c, 31L -> c,
      40L -> "tiny", 41L -> "tiny").toDF("doc_id", "text")
    val exactFirst = Dedup.dedupPipeline(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    // naive order: LSH over the raw corpus, verify, CC, min-id survivors
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
    val verified = Dedup.jaccardForPairs(docs, "doc_id", "text", 3, cand)
      .filter(col("jaccard") >= 0.8)
    val naive = Dedup.dedupCorpus(docs, "doc_id", verified)
      .select("doc_id").as[Long].collect().toSet
    // the naive order cannot see the shingle-less exact pair (40, 41);
    // exact-first collapses it — survivors otherwise identical
    assert(exactFirst == naive - 41L)
    assert(exactFirst == Set(10L, 20L, 30L, 40L))
  }

  test("kmeans converges to cluster directions and feeds ivfTopK") {
    // two obvious direction clusters in 4-d
    val data = (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array(1f, 0f, 0.1f, 0f) else Array(0f, 1f, 0f, 0.1f)
      (i.toLong, base.map(x => x + (i % 5) * 0.01f))
    }
    val df = data.toDF("vec_id", "embedding")
    val cents = Ann.kmeans(df, "vec_id", "embedding", 2, iters = 5)
    assert(cents.length == 2)
    // each centroid should be dominated by one axis
    val dominant = cents.map(_._2.zipWithIndex.maxBy(_._1)._2).toSet
    assert(dominant == Set(0, 1))
    val queries = data.take(2)
    val got = Ann.ivfTopK(df, "vec_id", "embedding", queries.toArray, 3,
      nprobe = 1, centroidsOpt = Some(cents))
    assert(got.groupBy("query_id").count().count() == 2)
  }

  test("embeddingNearDups only emits pairs at/above the cosine threshold") {
    val out = Dedup.embeddingNearDups(embeddings, "vec_id", "embedding", 64, 0.3)
      .select("cosine").as[Double].collect()
    assert(out.nonEmpty && out.forall(_ >= 0.3))
  }

  test("spanDedup trims spans shared with a lower-id doc; keeper and self-repeats untouched") {
    val df = Seq(
      1L -> "a b c d e f",          // keeper: every shared n-gram is first here
      2L -> "x y a b c d q r",      // shares "a b c", "b c d" -> one trim span
      3L -> "u v u v u v u v",      // intra-doc repetition only: nothing to trim
      4L -> "a b c d e f").toDF("doc_id", "text") // exact copy: trim everything
    val got = Dedup.spanDedup(df, "doc_id", "text", 3)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSet
    // doc 2: hits at pos 2,3 -> merged span [2, 6); doc 4: hits 0..3 -> [0, 6)
    assert(got == Set((2L, 2L, 6L), (4L, 0L, 6L)))
  }

  test("duplicatedSpans merges overlapping and touching n-gram intervals per doc") {
    val hits = Seq((1L, 0), (1L, 1), (1L, 5), (1L, 9), // overlap, gap, gap
      (2L, 5), (2L, 8), // touching intervals [5,8)+[8,11) chain
      (3L, 2)).toDF("doc_id", "pos")
    val got = Dedup.duplicatedSpans(hits, n = 3)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 4L), (1L, 5L, 8L), (1L, 9L, 12L),
      (2L, 5L, 11L), (3L, 2L, 5L)))
  }

  test("bloomDecontaminate equals the exact join and prunes before it") {
    // train shingle stream: docs 1-2 share hashes with the eval set,
    // doc 3 is clean; plenty of clean hashes make pruning observable
    val train = ((1 to 400).map(i => (3L, 1000L + i)) ++
      Seq((1L, 10L), (1L, 11L), (1L, 11L), (2L, 12L)))
      .toDF("doc_id", "h")
    val eval = Seq(10L, 11L, 12L, 13L).toDF("h")
    val got = Dedup.bloomDecontaminate(train, eval, expectedItems = 100L)
      .as[(Long, Long)].collect().toMap
    // exact semantics: distinct contaminated hashes per doc, clean docs absent
    assert(got == Map(1L -> 2L, 2L -> 1L))
    // the Bloom phase must prune the join probe side: at fpp=1% over 400
    // clean hashes, survivors are the 4 true hits + a handful of false
    // positives, never the whole stream
    val bf = eval.stat.bloomFilter("h", 100L, 0.01)
    val survivors = train.collect().count(r => bf.mightContainLong(r.getLong(1)))
    assert(survivors < 50, s"bloom pruned nothing: $survivors of ${train.count()}")
  }

  // ---- semanticDedup (SemDeDup): fixture geometry ----
  // centroids c0=(1,0,0,0), c1=(0,1,0,0); ids 1,2 near-identical in
  // cluster 0 (cos≈0.999997), id 5 in cluster 0 but only cos≈0.894 to
  // both, id 3 alone-ish in cluster 1, id 4 an exact copy of id 1, id 8
  // an exact copy of id 2 (whose representative is itself dropped).
  private def semCentroids = Array(
    0 -> Array(1f, 0f, 0f, 0f), 1 -> Array(0f, 1f, 0f, 0f))
  private def semCorpus = Seq(
    (1L, Array(1f, 0.01f, 0f, 0f)),
    (2L, Array(0.99f, 0.012f, 0f, 0f)),
    (3L, Array(0.01f, 1f, 0f, 0f)),
    (4L, Array(1f, 0.01f, 0f, 0f)),
    (5L, Array(1f, 0f, 0.5f, 0f)),
    (8L, Array(0.99f, 0.012f, 0f, 0f))).toDF("vec_id", "embedding")

  test("semanticDedup: upper-triangle in-cluster pruning, exact copies always dropped") {
    val got = Dedup.semanticDedup(semCorpus, "vec_id", "embedding", semCentroids, 0.95)
      .as[(Long, Int, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 8L)) // one decision per input id
    assert(got(1L) == ((0, true)))  // cluster-0 min id survives
    assert(got(2L) == ((0, false))) // near-dup of the earlier id 1
    assert(got(3L) == ((1, true)))  // its cluster holds no earlier neighbor
    assert(got(4L) == ((0, false))) // exact copy: inherits cid, dropped
    assert(got(5L) == ((0, true)))  // same cluster, below threshold: kept
    assert(got(8L) == ((0, false))) // copy of a DROPPED rep: still dropped
  }

  test("semanticDedup: cross-cluster near-dups are not compared (documented approximation)") {
    // two near-identical vectors that straddle the c0/c1 decision boundary:
    // (0.72, 0.69, ...) -> c0, (0.69, 0.72, ...) -> c1; cosine ≈ 0.9991
    val df = Seq((1L, Array(0.72f, 0.69f, 0f, 0f)), (2L, Array(0.69f, 0.72f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(df, "vec_id", "embedding", semCentroids, 0.95)
      .as[(Long, Int, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(1L) == ((0, true)) && got(2L) == ((1, true)))
  }

  test("semanticDedup fails loudly when a cluster exceeds maxCluster") {
    val e = intercept[Throwable] {
      Dedup.semanticDedup(semCorpus, "vec_id", "embedding", semCentroids, 0.95,
        maxCluster = 2).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("underfits"))), s"got: $e")
  }

  test("incrementalDedup classifies a delta batch against the persisted corpus index") {
    val base = (0 until 30).map(i => s"t$i").mkString(" ")
    val near = (0 until 29).map(i => s"t$i").mkString(" ") + " zz" // J ≈ 27/29
    val other = (0 until 30).map(i => s"u$i").mkString(" ")
    val fresh1 = (0 until 30).map(i => s"v$i").mkString(" ")
    val fresh2 = (0 until 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq((10L, base), (11L, base), (12L, other), (13L, "tiny doc here"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (20L, base),    // exact content already in corpus
      (21L, fresh1),  // batch keeper of a within-batch exact pair
      (24L, fresh1),  //   ...its copy
      (22L, near),    // near-dup of corpus rep 10
      (23L, fresh2),  // genuinely new
      (25L, "a b"))   // < shingleN tokens: must classify (not crash) as new
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-incdedup").toString
    Dedup.buildDedupIndex(corpus, "doc_id", "text", path)
    val got = Dedup.incrementalDedup(spark, delta, "doc_id", "text", path)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(20L) == (("dup_corpus", 10L, 0L)))
    assert(got(21L) == (("new", -1L, 0L)))
    assert(got(24L) == (("dup_delta", 21L, 0L)))
    assert(got(22L) == (("near_corpus", 10L, 1L)))
    assert(got(23L) == (("new", -1L, 0L)))
    assert(got(25L) == (("new", -1L, 0L)))
  }

  test("appendToDedupIndex: classify-append-classify equals a from-scratch rebuild") {
    val base = (0 until 30).map(i => s"t$i").mkString(" ")
    val fresh = (0 until 30).map(i => s"v$i").mkString(" ")
    val nearFresh = (0 until 29).map(i => s"v$i").mkString(" ") + " qq"
    val corpus = Seq((10L, base)).toDF("doc_id", "text")
    val batch1 = Seq((20L, fresh), (21L, base)).toDF("doc_id", "text")
    // batch 2 exercises every admitted-content interaction: an exact copy
    // of batch-1's new doc, a near-dup of it, and untouched content
    val batch2 = Seq((30L, fresh), (31L, nearFresh), (32L, base))
      .toDF("doc_id", "text")
    val p1 = java.nio.file.Files.createTempDirectory("graft-incapp1").toString
    Dedup.buildDedupIndex(corpus, "doc_id", "text", p1)
    val c1 = Dedup.incrementalDedup(spark, batch1, "doc_id", "text", p1)
      .localCheckpoint(true) // consumed twice: append + assertion
    Dedup.appendToDedupIndex(batch1, c1, "doc_id", "text", p1)
    assert(c1.filter(col("status") === "new").as[(Long, String, Long, Long)]
      .collect().map(_._1).toSet == Set(20L))
    // reference: an index built directly from corpus + batch-1 survivors
    val p2 = java.nio.file.Files.createTempDirectory("graft-incapp2").toString
    Dedup.buildDedupIndex(corpus.union(Seq((20L, fresh)).toDF("doc_id", "text")),
      "doc_id", "text", p2)
    val viaAppend = Dedup.incrementalDedup(spark, batch2, "doc_id", "text", p1)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val viaRebuild = Dedup.incrementalDedup(spark, batch2, "doc_id", "text", p2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaAppend == viaRebuild)
    assert(viaAppend == Seq((30L, ("dup_corpus", 20L, 0L)), (31L, ("near_corpus", 20L, 1L)),
      (32L, ("dup_corpus", 10L, 0L))).map(t => (t._1, t._2._1, t._2._2, t._2._3)))
    // compaction preserves classification results
    val p3 = java.nio.file.Files.createTempDirectory("graft-incapp3").toString
    Dedup.compactDedupIndex(spark, p1, p3)
    val viaCompact = Dedup.incrementalDedup(spark, batch2, "doc_id", "text", p3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaCompact == viaAppend)
  }

  test("incrementalDedup: an exact corpus copy beats a simultaneous within-batch copy") {
    // both delta rows carry corpus content: BOTH are dup_corpus (the
    // within-batch keeper rule only applies to corpus-unseen content)
    val base = (0 until 30).map(i => s"t$i").mkString(" ")
    val corpus = Seq((10L, base)).toDF("doc_id", "text")
    val delta = Seq((20L, base), (21L, base)).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-incdedup2").toString
    Dedup.buildDedupIndex(corpus, "doc_id", "text", path)
    val got = Dedup.incrementalDedup(spark, delta, "doc_id", "text", path)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(20L) == (("dup_corpus", 10L)))
    assert(got(21L) == (("dup_corpus", 10L)))
  }
}
