package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Hdf5Writer._

/** Deterministic structural fuzz of the pure-JVM HDF5 writer/reader
  * pair: seeded random node trees (groups, float/int/string datasets,
  * chunked compressed datasets, typed attributes, both on-disk
  * profiles) are written and read back field-for-field. Catches the
  * layout edge cases targeted specs never enumerate — empty groups,
  * deep nesting, rank-0/1/2/3 dataspaces, attribute mixes, chunk
  * boundaries that don't divide the dims. */
class Hdf5FuzzSpec extends AnyFunSuite {

  private def genTree(rnd: scala.util.Random, depth: Int, fmt: Format,
                      maxChildren: Int): Seq[Node] = {
    val n = 1 + rnd.nextInt(maxChildren)
    (0 until n).map { i =>
      val name = s"n${depth}_$i"
      val attrs: Seq[(String, Any)] = (0 until rnd.nextInt(3)).map {
        case 0 => s"a$i" -> (rnd.nextInt(1000).toLong: Any)
        case 1 => s"s$i" -> (s"v${rnd.nextInt(100)}µ": Any)
        case _ => s"d$i" -> (rnd.nextDouble(): Any)
      }
      rnd.nextInt(6) match {
        case 0 if depth < 3 =>
          Group(name, genTree(rnd, depth + 1, fmt, maxChildren - 1), attrs)
        case 1 =>
          val dims = Seq.fill(1 + rnd.nextInt(2))(1L + rnd.nextInt(5))
          DoubleDataset(name, dims,
            Array.fill(dims.product.toInt)(rnd.nextDouble() * 100 - 50), attrs)
        case 2 =>
          val len = 1 + rnd.nextInt(7)
          LongDataset(name, Seq(len.toLong),
            Array.fill(len)(rnd.nextLong() % 100000), attrs)
        case 3 =>
          StringDataset(name, s"text-${rnd.nextInt(1000)}-µ±", attrs)
        case 4 =>
          // chunk dims deliberately misaligned with the data dims
          val r = 2L + rnd.nextInt(6); val c = 2L + rnd.nextInt(6)
          ChunkedDoubleDataset(name, Seq(r, c),
            Seq(1 + rnd.nextInt(3), 1 + rnd.nextInt(3)),
            Array.fill((r * c).toInt)(rnd.nextDouble()), attrs,
            shuffle = rnd.nextBoolean(),
            deflateLevel = if (rnd.nextBoolean()) 6 else 0)
        case _ =>
          Group(name, Nil, attrs) // empty group
      }
    }
  }

  private def verify(f: Hdf5File, path: String, node: Node): Unit = {
    val attrs = f.attributes(path)
    node.attrs.foreach { case (k, v) =>
      val got = attrs.getOrElse(k, fail(s"$path missing attr $k"))
      (v, got) match {
        case (d: Double, g: Double) => assert(g == d, s"$path@$k")
        case (l: Long, g: Long) => assert(g == l, s"$path@$k")
        case (s: String, g: String) => assert(g == s, s"$path@$k")
        case other => fail(s"$path@$k type mismatch: $other")
      }
    }
    node match {
      case Group(_, children, _) =>
        val names = f.childNames(path).toSet
        children.foreach { c =>
          assert(names.contains(c.name), s"$path missing child ${c.name}")
          verify(f, s"$path/${c.name}", c)
        }
      case d: DoubleDataset =>
        assert(f.shape(path) == d.dims)
        assert(f.readDoubles(path).toSeq == d.data.toSeq, path)
      case l: LongDataset =>
        assert(f.readDoubles(path).toSeq == l.data.map(_.toDouble).toSeq, path)
      case s: StringDataset =>
        assert(f.readString(path) == s.value, path)
      case c: ChunkedDoubleDataset =>
        assert(f.shape(path) == c.dims)
        assert(f.readDoubles(path).toSeq == c.data.toSeq, path)
      case _: SoftLink => ()
    }
  }

  private def datasetPaths(prefix: String, nodes: Seq[Node]): Seq[String] =
    nodes.flatMap {
      case g: Group => datasetPaths(s"$prefix/${g.name}", g.children)
      case d: DoubleDataset => Seq(s"$prefix/${d.name}")
      case _ => Nil
    }

  for (fmt <- Seq[Format](ClassicV0, ClassicV1, Latest)) {
    test(s"seeded random trees round-trip byte-faithfully ($fmt)") {
      val rnd = new scala.util.Random(20260813L + fmt.hashCode())
      for (trial <- 0 until 25) {
        val tree0 = genTree(rnd, 0, fmt, 5)
        // soft links in EVERY profile (classic = cache-type-2 symbol
        // entries with link-value heap strings; Latest = link messages):
        // an absolute link at root to a random dataset, and a RELATIVE
        // link (bare child name) inside the first group that has a
        // float dataset child
        val dsPaths = datasetPaths("", tree0)
        val absTarget =
          if (dsPaths.isEmpty) None
          else Some(dsPaths(rnd.nextInt(dsPaths.length)))
        val withAbs = absTarget match {
          case Some(t) => tree0 :+ SoftLink("zlink", t)
          case None => tree0
        }
        var relCheck: Option[(String, String)] = None
        val tree = withAbs.map {
          case g: Group if relCheck.isEmpty && g.children.size < 8 &&
            g.children.exists(_.isInstanceOf[DoubleDataset]) =>
            val ds = g.children.collectFirst { case d: DoubleDataset => d.name }.get
            relCheck = Some((s"/${g.name}/rlink", s"/${g.name}/$ds"))
            g.copy(children = g.children :+ SoftLink("rlink", ds))
          case n => n
        }
        val rootAttrs = Seq("trial" -> (trial.toLong: Any))
        val path = s"${Files.createTempDirectory("h5fuzz")}/t.h5"
        Hdf5Writer.write(tree, rootAttrs, path, fmt)
        val f = Hdf5File.fromPath(java.nio.file.Paths.get(path))
        assert(f.attributes("/").get("trial").contains(trial.toLong))
        tree.foreach(n => verify(f, s"/${n.name}", n))
        absTarget.foreach { t =>
          assert(f.readDoubles("/zlink").toSeq == f.readDoubles(t).toSeq,
            s"absolute soft link /zlink -> $t ($fmt)")
        }
        relCheck.foreach { case (link, t) =>
          assert(f.readDoubles(link).toSeq == f.readDoubles(t).toSeq,
            s"relative soft link $link -> $t ($fmt)")
        }
      }
    }
  }
}
