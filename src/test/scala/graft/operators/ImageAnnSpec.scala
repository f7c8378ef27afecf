package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Image-domain near-dup retrieval (round 12): the multi-index Hamming
  * graph (Multimodal.hammingNearDupGraph / imageNearDupGraph) and
  * frame-sampled video dedup through the CDC chunker
  * (Multimodal.videoCdcDedup). Gates: EXACT equality of the banded graph
  * with a brute-force Hamming join (pigeonhole: 4 disjoint 16-bit bands
  * catch every pair within Hamming 3), planted near-dup images found at
  * their exact distance, and shared-clip detection surviving an inserted
  * intro on REAL MJPEG-AVI frames. */
class ImageAnnSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- hammingNearDupGraph ----

  test("banded graph equals brute force within Hamming 3 on random hashes") {
    val rng = new scala.util.Random(1210)
    // clustered hashes so radius-3 pairs actually exist: 30 seeds, each
    // with variants at 1-5 flipped bits
    val hs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var id = 0L
    (0 until 30).foreach { _ =>
      val seed = rng.nextLong()
      id += 1; hs += ((id, seed))
      (0 until rng.nextInt(3)).foreach { _ =>
        var v = seed
        (0 until 1 + rng.nextInt(5)).foreach(_ => v ^= 1L << rng.nextInt(64))
        id += 1; hs += ((id, v))
      }
    }
    val df = hs.toSeq.toDF("id", "ph")
    val got = Multimodal.hammingNearDupGraph(df, "id", "ph", maxHamming = 3, k = 64)
      .select("src", "dst", "hamming").as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a != b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == want)
    assert(want.nonEmpty, "fixture planted no near pairs")
  }

  test("top-k and rank ordering: nearest first, ties to lower id, k respected") {
    val base = 0x0f0f0f0f0f0f0f0fL
    val df = Seq(
      (1L, base), (2L, base ^ 1L), (3L, base ^ 3L), (4L, base ^ 7L),
      (5L, base ^ (1L << 63))).toDF("id", "ph")
    val got = Multimodal.hammingNearDupGraph(df, "id", "ph", maxHamming = 3, k = 2)
      .filter(col("src") === 1L).orderBy("rank")
      .select("dst", "hamming", "rank").as[(Long, Long, Long)].collect().toSeq
    // neighbors of 1: id2 @1, id5 @1 (tie -> lower id first), id3 @2, id4 @3; k=2
    assert(got == Seq((2L, 1L, 1L), (5L, 1L, 2L)))
  }

  test("radius 7 via 8 uneven bands still equals brute force") {
    val rng = new scala.util.Random(1213)
    val hs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var id = 0L
    (0 until 20).foreach { _ =>
      val seed = rng.nextLong()
      id += 1; hs += ((id, seed))
      (0 until 2).foreach { _ =>
        var v = seed
        (0 until 1 + rng.nextInt(9)).foreach(_ => v ^= 1L << rng.nextInt(64))
        id += 1; hs += ((id, v))
      }
    }
    val df = hs.toSeq.toDF("id", "ph")
    val got = Multimodal.hammingEdges(df, "id", "ph", maxHamming = 7)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 7
    } yield (a, b, d.toLong)).toSet
    assert(got == want)
    assert(want.exists(_._3 > 3), "fixture planted no 4..7-distance pairs")
  }

  test("maxHamming above the band guarantee is refused") {
    val df = Seq((1L, 0L)).toDF("id", "ph")
    intercept[IllegalArgumentException] {
      Multimodal.hammingNearDupGraph(df, "id", "ph", maxHamming = 8)
    }
  }

  // ---- hammingEdgesWide (round 13): radius up to 15 ----

  test("wide radius 12 equals brute force on clustered random hashes") {
    val rng = new scala.util.Random(1312)
    val hs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var id = 0L
    (0 until 25).foreach { _ =>
      val seed = rng.nextLong()
      id += 1; hs += ((id, seed))
      (0 until 2).foreach { _ =>
        var v = seed
        // variants spread across the whole 0..18 range so the gate
        // exercises in-radius (<=12) AND just-out-of-radius pairs
        (0 until 1 + rng.nextInt(18)).foreach(_ => v ^= 1L << rng.nextInt(64))
        id += 1; hs += ((id, v))
      }
    }
    val df = hs.toSeq.toDF("id", "ph")
    val got = Multimodal.hammingEdgesWide(df, "id", "ph", maxHamming = 12)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 12
    } yield (a, b, d.toLong)).toSet
    assert(got == want)
    assert(want.exists(_._3 > 7), "fixture planted no 8..12-distance pairs")
  }

  test("wide radius 15 finds planted pairs at exactly 15 and excludes 16") {
    val base = 0x5a5a5a5a5a5a5a5aL
    def flipLow(n: Int): Long = base ^ ((1L << n) - 1L)
    // 15 and 16 flipped bits, plus a spread-across-blocks 15 (4+4+4+3)
    val spread = base ^ 0x000F000F000F0007L
    val df = Seq((1L, base), (2L, flipLow(15)), (3L, flipLow(16)),
      (4L, spread)).toDF("id", "ph")
    val got = Multimodal.hammingEdgesWide(df, "id", "ph", maxHamming = 15)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 15L)))
    assert(got.contains((1L, 4L, 15L)))
    assert(!got.exists(t => t._1 == 1L && t._2 == 3L))
  }

  test("wide radius agrees with the narrow operator at radius 7, and refuses 16") {
    val rng = new scala.util.Random(1315)
    val hs = (1L to 60L).map { id =>
      var v = 0x0123456789abcdefL
      (0 until rng.nextInt(10)).foreach(_ => v ^= 1L << rng.nextInt(64))
      (id, v)
    }
    val df = hs.toDF("id", "ph")
    val wide = Multimodal.hammingEdgesWide(df, "id", "ph", maxHamming = 7)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect().toSet
    val narrow = Multimodal.hammingEdges(df, "id", "ph", maxHamming = 7)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(wide == narrow)
    intercept[IllegalArgumentException] {
      Multimodal.hammingEdgesWide(df, "id", "ph", maxHamming = 16)
    }
  }

  test("image clusters: transitive near-dup chains collapse, exact copies counted through") {
    val base = Array.tabulate(64)(i => if (i % 2 == 0) 200.toByte else 0.toByte)
    def flips(n: Int): Array[Byte] = {
      val v = base.clone()
      (0 until n).foreach(j => v(j * 2) = 0.toByte)
      v
    }
    // chain: base —1— f2 —2— f4 (4 > 3 from base, linked via f2); f20 isolated
    val imgs = Seq(
      (1L, pgm(base, 8, 8)), (2L, pgm(flips(2), 8, 8)),
      (3L, pgm(flips(4), 8, 8)), (4L, pgm(flips(20), 8, 8)),
      (5L, pgm(base.clone(), 8, 8))) // exact copy of 1
    val got = Multimodal.imageDupClusters(imgs.toDF("doc_id", "payload"),
        "doc_id", "payload")
      .select("cluster_label", "n_reps", "n_images")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == Map(1L -> ((3L, 4L)), 4L -> ((1L, 1L))))
  }

  // ---- imageNearDupGraph over real decoded images ----

  private def pgm(px: Array[Byte], w: Int, h: Int): Array[Byte] =
    s"P5\n$w $h\n255\n".getBytes("ISO-8859-1") ++ px

  test("planted near-dup images: flipped cells found at their exact distance") {
    // 8x8 binary images: aHash bit b = pixel b strictly above the mean.
    // base has 32 on-pixels; variants flip 1/2/3 cells -> Hamming 1/2/3;
    // a 10-cell flip stays out of the radius-3 graph.
    val base = Array.tabulate(64)(i => if (i % 2 == 0) 200.toByte else 0.toByte)
    def flips(n: Int): Array[Byte] = {
      val v = base.clone()
      (0 until n).foreach(j => v(j * 2) = 0.toByte) // turn ON-cells off
      v
    }
    val imgs = Seq(
      (1L, pgm(base, 8, 8)), (2L, pgm(flips(1), 8, 8)),
      (3L, pgm(flips(2), 8, 8)), (4L, pgm(flips(3), 8, 8)),
      (5L, pgm(flips(10), 8, 8)),
      (6L, pgm(base.clone(), 8, 8)), // exact copy of 1 -> collapses
      (7L, "not an image".getBytes)) // non-image: excluded from the graph
    val got = Multimodal.imageNearDupGraph(imgs.toDF("doc_id", "payload"),
        "doc_id", "payload")
      .select("doc_id", "n_exact", "n_neighbors", "nearest_id", "nearest_hamming")
      .as[(Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L)) // reps only; 6 collapsed, 7 dropped
    assert(got(1L) == ((2L, 3L, Some(2L), Some(1L)))) // copies=2; nearest = 1-flip
    assert(got(2L)._3 == Some(1L) && got(2L)._4 == Some(1L))
    assert(got(5L) == ((1L, 0L, None, None))) // 10 flips: isolated
  }

  // ---- videoCdcDedup over real MJPEG-AVI frames ----

  private def jpegOf(argb: Int): Array[Byte] = {
    import javax.imageio.ImageIO
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 4, 2, Array.fill(8)(argb), 0, 4)
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }
  private def chunk(cc: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + data.length + (data.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(cc.getBytes("US-ASCII")).putInt(data.length).put(data)
    bb.array()
  }
  private def aviOf(frames: Seq[Array[Byte]]): Array[Byte] = {
    def list(t: String, ch: Array[Byte]): Array[Byte] =
      chunk("LIST", t.getBytes("US-ASCII") ++ ch)
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    chunk("RIFF", body).take(8) ++ body
  }

  test("shared clip survives an inserted intro; unrelated videos share nothing") {
    // 30 distinct colour frames as the shared clip; video B prepends 3
    // intro frames — fixed-width chunking would shift every boundary,
    // content-defined chunking re-synchronizes on the clip
    val clip = (0 until 30).map(i => jpegOf(0xff000000 | (i * 8 + 7) << 8))
    val intro = (0 until 3).map(i => jpegOf(0xff000000 | (200 + i)))
    val other = (0 until 30).map(i => jpegOf(0xff000000 | (i * 8 + 7) << 16))
    val vids = Seq(
      (1L, aviOf(clip)),
      (2L, aviOf(intro ++ clip)),
      (3L, aviOf(other))).toDF("doc_id", "payload")
    val got = Multimodal.videoCdcDedup(vids, "doc_id", "payload",
        frameBytes = 64, stride = 1)
      .select("doc_id", "n_frames", "n_dup_chunks")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(1L)._1 == 30 && got(2L)._1 == 33 && got(3L)._1 == 30)
    assert(got(1L)._2 == 0L) // first occurrence owns its chunks
    assert(got(2L)._2 > 0L, "inserted-intro repost shares no chunk — CDC failed to re-sync")
    assert(got(3L)._2 == 0L) // unrelated content shares nothing
  }

  test("fallback slicing: frame-aligned duplication is detected for codec-bound payloads") {
    // non-AVI payloads slice into fixed frames; a repeat aligned on the
    // frame size (the atomic unit real codecs would give us) dedups
    val blockA = Array.tabulate(64 * 20)(i => (i % 251).toByte)
    val blockB = Array.tabulate(64 * 4)(i => (7 + i % 13).toByte)
    val vids = Seq(
      (1L, blockA),
      (2L, blockB ++ blockA)).toDF("doc_id", "payload")
    val got = Multimodal.videoCdcDedup(vids, "doc_id", "payload",
        frameBytes = 64, stride = 1)
      .select("doc_id", "n_dup_chunks").as[(Long, Long)].collect().toMap
    assert(got(1L) == 0L && got(2L) > 0L)
  }
}
