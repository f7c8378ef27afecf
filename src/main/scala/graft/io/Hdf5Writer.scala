package graft.io

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Minimal HDF5 writer with two on-disk profiles:
  *
  *  - `ClassicV0` / `ClassicV1`: superblock v0/v1, v1 object headers,
  *    symbol-table groups (one B-tree leaf + one SNOD per group, ≤ 8
  *    children — plenty for export layouts), v1 filter pipelines.
  *  - `Latest`: superblock v3 (checksummed), v2 object headers with
  *    compact link messages, v3 attribute messages, v2 filter pipelines —
  *    the layout libhdf5 emits under `libver='latest'`.
  *
  * Datasets are contiguous little-endian float64/int64, or chunked
  * float64 with optional shuffle + deflate filters (chunk B-tree v1,
  * `java.util.zip.Deflater` — no native codec). Checksummed structures
  * carry the real Jenkins lookup3 hash HDF5 specifies. Emitted structures
  * are byte-for-byte the ones [[Hdf5File]] parses from real libhdf5 files
  * (datatype message bodies are the exact constants libhdf5 writes), and
  * every export is round-trip-verified through that reader, which is
  * itself validated against production files. This is what makes the
  * NeXus export REAL HDF5 bytes instead of a documented stand-in.
  */
object Hdf5Writer {

  sealed trait Format
  /** Superblock v0 — what libhdf5 writes by default. */
  case object ClassicV0 extends Format
  /** Superblock v1 (adds the indexed-storage K field). */
  case object ClassicV1 extends Format
  /** Superblock v3 + v2 object headers + link messages (`libver='latest'`). */
  case object Latest extends Format

  sealed trait Node { def name: String; def attrs: Seq[(String, Any)] }
  case class Group(name: String, children: Seq[Node],
                   attrs: Seq[(String, Any)] = Nil) extends Node
  case class DoubleDataset(name: String, dims: Seq[Long], data: Array[Double],
                           attrs: Seq[(String, Any)] = Nil) extends Node
  case class LongDataset(name: String, dims: Seq[Long], data: Array[Long],
                         attrs: Seq[(String, Any)] = Nil) extends Node
  /** Scalar fixed-size null-terminated string dataset (the form NeXus
    * string fields take — h5py writes variable-length, but fixed-size
    * class-3 strings are equally conformant and self-contained). */
  case class StringDataset(name: String, value: String,
                           attrs: Seq[(String, Any)] = Nil) extends Node
  /** Soft link to another object by path (h5py SoftLink — what pynxtools
    * emits for NeXus `@link` entries). Latest format stores it as a link
    * message; classic symbol-table groups as a cache-type-2 symbol entry
    * whose scratch space points at the link value in the group's local
    * heap. Links carry no attributes (they have no object header —
    * attributes belong to the TARGET). */
  case class SoftLink(name: String, target: String) extends Node {
    override def attrs: Seq[(String, Any)] = Nil
  }
  /** Chunked float64 dataset with optional shuffle + deflate filters
    * (the compression every production sed/DAQ file uses). */
  case class ChunkedDoubleDataset(name: String, dims: Seq[Long], chunkDims: Seq[Int],
                                  data: Array[Double],
                                  attrs: Seq[(String, Any)] = Nil,
                                  shuffle: Boolean = true,
                                  deflateLevel: Int = 6) extends Node

  private val Undef = -1L
  private val NulS = "\u0000" // NUL terminator for heap names / attribute strings

  private final class Buf {
    private var arr = new Array[Byte](1 << 16)
    var pos = 0
    private def ensure(n: Int): Unit =
      if (pos + n > arr.length) {
        var cap = arr.length
        while (cap < pos + n) cap *= 2
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    def u8(v: Int): Unit = { ensure(1); arr(pos) = v.toByte; pos += 1 }
    def u16(v: Int): Unit = { ensure(2); arr(pos) = v.toByte; arr(pos + 1) = (v >> 8).toByte; pos += 2 }
    def u32(v: Long): Unit = { ensure(4); var i = 0; while (i < 4) { arr(pos + i) = (v >> (8 * i)).toByte; i += 1 }; pos += 4 }
    def u64(v: Long): Unit = { ensure(8); var i = 0; while (i < 8) { arr(pos + i) = (v >> (8 * i)).toByte; i += 1 }; pos += 8 }
    def bytes(b: Array[Byte]): Unit = { ensure(b.length); System.arraycopy(b, 0, arr, pos, b.length); pos += b.length }
    def pad8(): Unit = while (pos % 8 != 0) u8(0)
    def patch64(at: Int, v: Long): Unit = { var i = 0; while (i < 8) { arr(at + i) = (v >> (8 * i)).toByte; i += 1 } }
    def patch32(at: Int, v: Long): Unit = { var i = 0; while (i < 4) { arr(at + i) = (v >> (8 * i)).toByte; i += 1 } }
    def patch16(at: Int, v: Int): Unit = { arr(at) = v.toByte; arr(at + 1) = (v >> 8).toByte }
    def raw: Array[Byte] = arr // valid up to pos
    def result: Array[Byte] = java.util.Arrays.copyOf(arr, pos)
  }

  /** Bob Jenkins' lookup3 `hashlittle` — the checksum HDF5 uses for
    * superblock v2+/object header v2 structures (public domain algorithm,
    * mirrored from the published reference implementation). */
  private[io] def jenkinsLookup3(data: Array[Byte], off: Int, length: Int): Long = {
    def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    var a = 0xdeadbeef + length
    var b = a
    var c = a
    var p = off
    var len = length
    def u(i: Int): Int = data(p + i) & 0xff
    while (len > 12) {
      a += u(0) | (u(1) << 8) | (u(2) << 16) | (u(3) << 24)
      b += u(4) | (u(5) << 8) | (u(6) << 16) | (u(7) << 24)
      c += u(8) | (u(9) << 8) | (u(10) << 16) | (u(11) << 24)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      p += 12; len -= 12
    }
    if (len == 0) return c.toLong & 0xffffffffL
    // final partial block (fallthrough switch of the reference code)
    if (len >= 12) c += u(11) << 24
    if (len >= 11) c += u(10) << 16
    if (len >= 10) c += u(9) << 8
    if (len >= 9) c += u(8)
    if (len >= 8) b += u(7) << 24
    if (len >= 7) b += u(6) << 16
    if (len >= 6) b += u(5) << 8
    if (len >= 5) b += u(4)
    if (len >= 4) a += u(3) << 24
    if (len >= 3) a += u(2) << 16
    if (len >= 2) a += u(1) << 8
    if (len >= 1) a += u(0)
    c ^= b; c -= rot(b, 14)
    a ^= c; a -= rot(c, 11)
    b ^= a; b -= rot(a, 25)
    c ^= b; c -= rot(b, 16)
    a ^= c; a -= rot(c, 4)
    b ^= a; b -= rot(a, 14)
    c ^= b; c -= rot(b, 24)
    c.toLong & 0xffffffffL
  }

  // datatype message BODIES — the exact byte layouts libhdf5 emits
  // (extracted from real files; IEEE float64 LE and 2's-complement int64 LE)
  private val DtFloat64: Array[Byte] = {
    val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x11.toByte).put(0x20.toByte).put(0x3f.toByte).put(0.toByte).putInt(8)
    b.putShort(0).putShort(64) // bit offset, precision
    b.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte) // exp loc/size, man loc/size
    b.putInt(1023) // exponent bias
    b.array()
  }
  private val DtInt64: Array[Byte] = {
    val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x10.toByte).put(0x08.toByte).put(0.toByte).put(0.toByte).putInt(8)
    b.putShort(0).putShort(64)
    b.array()
  }
  private def dtString(n: Int): Array[Byte] = {
    // class 3 v1, null-terminated ASCII, size n
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(n)
    b.array()
  }
  private val ScalarDataspace: Array[Byte] =
    Array[Byte](1, 0, 0, 0, 0, 0, 0, 0) // v1, rank 0

  private def dataspace(dims: Seq[Long]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + dims.size * 8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put(dims.size.toByte).put(0.toByte)
    b.put(new Array[Byte](5))
    dims.foreach(b.putLong)
    b.array()
  }

  private def pad8len(n: Int): Int = ((n + 7) / 8) * 8

  /** Attribute message body. v1 (classic): padded name/datatype/dataspace.
    * v3 (latest): unpadded, with the charset-encoding byte. */
  private def attrMessage(name: String, value: Any, v3: Boolean): Array[Byte] = {
    val nameB = (name + NulS).getBytes("US-ASCII")
    val (dt, data) = value match {
      case s: String =>
        // UTF-8 bytes under the class-3 string type: names stay ASCII,
        // but unit strings carry µ and friends
        val d = (s + NulS).getBytes("UTF-8")
        (dtString(d.length), d)
      case d: Double =>
        val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN); b.putDouble(d)
        (DtFloat64, b.array())
      case l: Long =>
        val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN); b.putLong(l)
        (DtInt64, b.array())
      case other => throw new IllegalArgumentException(s"attribute type ${other.getClass}")
    }
    if (v3) {
      val total = 9 + nameB.length + dt.length + ScalarDataspace.length + data.length
      val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte).put(0.toByte) // version 3, flags
      b.putShort(nameB.length.toShort).putShort(dt.length.toShort)
        .putShort(ScalarDataspace.length.toShort)
      b.put(0.toByte) // name charset: ASCII
      b.put(nameB); b.put(dt); b.put(ScalarDataspace); b.put(data)
      b.array()
    } else {
      val total = 8 + pad8len(nameB.length) + pad8len(dt.length) +
        pad8len(ScalarDataspace.length) + pad8len(data.length)
      val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put(0.toByte) // version, reserved
      b.putShort(nameB.length.toShort).putShort(dt.length.toShort)
        .putShort(ScalarDataspace.length.toShort)
      def padded(x: Array[Byte]): Unit = { b.put(x); b.put(new Array[Byte](pad8len(x.length) - x.length)) }
      padded(nameB); padded(dt); padded(ScalarDataspace); padded(data)
      b.array()
    }
  }

  /** v1 object header from (type, body) messages; returns its address. */
  private def objectHeaderV1(out: Buf, messages: Seq[(Int, Array[Byte])]): Long = {
    out.pad8()
    val addr = out.pos
    val bodies = messages.map { case (t, b) => (t, b, pad8len(b.length)) }
    val total = bodies.map(_._3 + 8).sum
    out.u8(1); out.u8(0)                 // version, reserved
    out.u16(messages.size)               // message count
    out.u32(1)                           // reference count
    out.u32(total)                       // header size
    out.u32(0)                           // padding to 16-byte prefix
    bodies.foreach { case (t, b, padded) =>
      out.u16(t); out.u16(padded); out.u8(0); out.u8(0); out.u8(0); out.u8(0)
      out.bytes(b)
      out.bytes(new Array[Byte](padded - b.length))
    }
    addr
  }

  /** v2 ("OHDR") object header; chunk-0 size includes the trailing
    * lookup3 checksum. Returns its address. */
  private def objectHeaderV2(out: Buf, messages: Seq[(Int, Array[Byte])]): Long = {
    out.pad8()
    val addr = out.pos
    out.bytes("OHDR".getBytes("US-ASCII"))
    out.u8(2)    // version
    out.u8(0x01) // flags: size-of-chunk-0 stored as u16; no times/phase/order
    val msgBytes = messages.map { case (_, b) => 4 + b.length }.sum
    require(msgBytes + 4 <= 0xffff, "object header chunk too large for u16 size")
    out.u16(msgBytes + 4)
    messages.foreach { case (t, b) =>
      out.u8(t); out.u16(b.length); out.u8(0) // type, size, flags
      out.bytes(b)
    }
    out.u32(jenkinsLookup3(out.raw, addr, out.pos - addr))
    addr
  }

  /** Hard-link message (v1, compact name length, no extra fields). */
  private def linkMessage(name: String, headerAddr: Long): Array[Byte] = {
    val nb = name.getBytes("UTF-8")
    require(nb.length < 256, s"link name too long: $name")
    val b = ByteBuffer.allocate(3 + nb.length + 8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put(0.toByte) // version, flags (u8 name length, hard link)
    b.put(nb.length.toByte).put(nb).putLong(headerAddr)
    b.array()
  }

  /** Soft-link message (v1, flags bit 3 = explicit link type, type 1 =
    * soft; link info = u16 value length + path bytes). */
  private def softLinkMessage(name: String, target: String): Array[Byte] = {
    val nb = name.getBytes("UTF-8")
    val tb = target.getBytes("UTF-8")
    require(nb.length < 256, s"link name too long: $name")
    require(tb.length < 65536, s"link target too long: $target")
    val b = ByteBuffer.allocate(4 + nb.length + 2 + tb.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put(0x08.toByte) // version, flags: link-type field present
    b.put(1.toByte)                  // link type: soft
    b.put(nb.length.toByte).put(nb)
    b.putShort(tb.length.toShort).put(tb)
    b.array()
  }

  /** Write one group's heap/SNOD/B-tree over already-written children;
    * returns the group's object header address. Children are either
    * written objects (Left: header address) or soft links (Right:
    * target path). */
  private def writeGroup(out: Buf, children: Seq[(String, Either[Long, String])],
                         attrs: Seq[(String, Any)], fmt: Format): Long = {
    if (fmt == Latest) {
      // compact (link-message) storage — the libver='latest' layout
      return objectHeaderV2(out,
        children.map {
          case (n, Left(hdr)) => (0x0006, linkMessage(n, hdr))
          case (n, Right(target)) => (0x0006, softLinkMessage(n, target))
        } ++
          attrs.map { case (n, v) => (0x000C, attrMessage(n, v, v3 = true)) })
    }
    require(children.size <= 8,
      s"minimal writer supports <= 8 entries per group, got ${children.size}")
    val sorted = children.sortBy(_._1)
    // local heap: leading 8 zero bytes (offset 0 = empty name), then names;
    // a soft link's target path is stored in the SAME heap (the classic
    // format keeps link values as heap strings referenced from the symbol
    // table entry's scratch space)
    val nameOffsets = ArrayBuffer.empty[Long]
    val linkValOffsets = mutable.Map.empty[Int, Long]
    val heapData = {
      val hb = new Buf
      hb.u64(0)
      sorted.zipWithIndex.foreach { case ((n, child), i) =>
        nameOffsets += hb.pos.toLong
        hb.bytes((n + NulS).getBytes("US-ASCII")); hb.pad8()
        child match {
          case Right(target) =>
            linkValOffsets(i) = hb.pos.toLong
            hb.bytes((target + NulS).getBytes("US-ASCII")); hb.pad8()
          case Left(_) => ()
        }
      }
      hb.result
    }
    out.pad8()
    val heapAddr = out.pos
    out.bytes("HEAP".getBytes("US-ASCII")); out.u8(0); out.u8(0); out.u8(0); out.u8(0)
    out.u64(heapData.length); out.u64(Undef) // data size, free list (none)
    val heapDataAddrPos = out.pos
    out.u64(0) // patched below
    out.pad8()
    val heapDataAddr = out.pos
    out.bytes(heapData)
    out.patch64(heapDataAddrPos, heapDataAddr)
    // SNOD with every entry
    out.pad8()
    val snodAddr = out.pos
    out.bytes("SNOD".getBytes("US-ASCII"))
    out.u8(1); out.u8(0); out.u16(sorted.size)
    sorted.zipWithIndex.foreach { case ((_, child), i) =>
      out.u64(nameOffsets(i))
      child match {
        case Left(hdr) => // cache type 0: plain object
          out.u64(hdr); out.u32(0); out.u32(0)
          out.bytes(new Array[Byte](16))
        case Right(_) => // cache type 2: symbolic link — header address is
          // undefined; scratch bytes 0-3 hold the heap offset of the
          // link value string
          out.u64(Undef); out.u32(2); out.u32(0)
          val scratch = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
          scratch.putInt(linkValOffsets(i).toInt)
          out.bytes(scratch.array())
      }
    }
    // B-tree: single leaf pointing at the SNOD; an attrs-only group
    // (metadata leaves) gets a childless tree — the reader's walk sees
    // n=0 and yields no entries
    out.pad8()
    val btreeAddr = out.pos
    out.bytes("TREE".getBytes("US-ASCII"))
    out.u8(0); out.u8(0) // group node, level 0
    if (sorted.isEmpty) {
      out.u16(0)
      out.u64(Undef); out.u64(Undef) // siblings
      out.u64(0)                     // key 0: empty-name heap offset
    } else {
      out.u16(1)           // one child
      out.u64(Undef); out.u64(Undef) // siblings
      out.u64(nameOffsets.head)      // key 0: heap offset of first name
      out.u64(snodAddr)
      out.u64(nameOffsets.last)      // key 1
    }
    // group object header: symbol table message + attributes
    val stBody = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(btreeAddr).putLong(heapAddr)
      b.array()
    }
    objectHeaderV1(out, (0x0011, stBody) +: attrs.map { case (n, v) => (0x000C, attrMessage(n, v, v3 = false)) })
  }

  // ---- chunked data + filters ----

  private def shuffleBytes(data: Array[Byte], elem: Int): Array[Byte] = {
    val n = data.length / elem
    val out = new Array[Byte](data.length)
    var i = 0
    while (i < n) {
      var b = 0
      while (b < elem) { out(b * n + i) = data(i * elem + b); b += 1 }
      i += 1
    }
    out
  }

  private def deflateBytes(data: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val tmp = new Array[Byte](65536)
    while (!d.finished()) { val n = d.deflate(tmp); out.write(tmp, 0, n) }
    d.end()
    out.toByteArray
  }

  /** Gather one (zero-padded) chunk from a row-major double array. */
  private def gatherChunk(data: Array[Double], dims: Seq[Long], chunkDims: Seq[Int],
                          origin: Seq[Long]): Array[Byte] = {
    val rank = dims.size
    val st = dims.scanRight(1L)(_ * _).tail   // element strides, source
    val cst = chunkDims.map(_.toLong).scanRight(1L)(_ * _).tail // strides, chunk
    val outArr = new Array[Byte](chunkDims.product * 8)
    val bb = ByteBuffer.wrap(outArr).order(ByteOrder.LITTLE_ENDIAN)
    def rec(dim: Int, srcBase: Long, dstBase: Long): Unit = {
      val copyLen = math.min(chunkDims(dim).toLong, dims(dim) - origin(dim)).toInt
      if (dim == rank - 1) {
        var i = 0
        while (i < copyLen) {
          bb.putDouble(((dstBase + i) * 8).toInt, data((srcBase + i).toInt)); i += 1
        }
      } else {
        var i = 0
        while (i < copyLen) {
          rec(dim + 1, srcBase + i * st(dim), dstBase + i * cst(dim)); i += 1
        }
      }
    }
    rec(0, origin.zip(st).map { case (o, s) => o * s }.sum, 0L)
    outArr
  }

  private def chunkOrigins(dims: Seq[Long], chunkDims: Seq[Int]): Seq[Seq[Long]] = {
    val counts = dims.zip(chunkDims).map { case (d, c) => ((d + c - 1) / c).toInt }
    counts.foldLeft(Seq(Seq.empty[Int])) { (acc, n) =>
      for (pre <- acc; i <- 0 until n) yield pre :+ i
    }.map(idx => idx.zip(chunkDims).map { case (i, c) => i.toLong * c })
  }

  /** Filter-pipeline message. v1 pads names to 8 and odd cv counts to 4;
    * v2 omits the Name Length field entirely for pre-registered
    * (id < 256) filters. */
  private def filterPipeline(filters: Seq[(Int, Seq[Long])], v2: Boolean): Array[Byte] = {
    val b = new Buf
    if (v2) {
      b.u8(2); b.u8(filters.size)
      filters.foreach { case (id, cvs) =>
        require(id < 256, "minimal writer emits pre-registered filters only")
        b.u16(id); b.u16(0); b.u16(cvs.size) // id, flags, ncv — no name length
        cvs.foreach(b.u32)
      }
    } else {
      b.u8(1); b.u8(filters.size); b.u16(0); b.u32(0)
      filters.foreach { case (id, cvs) =>
        b.u16(id); b.u16(0); b.u16(0); b.u16(cvs.size) // id, nameLen=0, flags, ncv
        cvs.foreach(b.u32)
        if (cvs.size % 2 == 1) b.u32(0)
      }
    }
    b.result
  }

  /** Chunk-index B-tree (v1, single leaf); returns its address. */
  private def writeChunkBtree(out: Buf, rank: Int,
                              entries: Seq[(Seq[Long], Long, Int)]): Long = {
    // one leaf node; 2K entries at the default indexed-storage K=32 is
    // the conformant per-node bound -- callers size chunks to fit
    require(entries.size <= 64,
      s"minimal writer supports <= 64 chunks per dataset, got ${entries.size}")
    out.pad8()
    val addr = out.pos
    out.bytes("TREE".getBytes("US-ASCII"))
    out.u8(1); out.u8(0) // raw-data chunk node, level 0
    out.u16(entries.size)
    out.u64(Undef); out.u64(Undef) // siblings
    entries.foreach { case (offs, chunkAddr, chunkSize) =>
      out.u32(chunkSize); out.u32(0) // size, filter mask (all filters applied)
      offs.foreach(out.u64); out.u64(0) // dim offsets + element offset
      out.u64(chunkAddr)
    }
    // final (upper-bound) key
    out.u32(0); out.u32(0)
    (0 to rank).foreach(_ => out.u64(0))
    addr
  }

  private def writeNode(out: Buf, node: Node, fmt: Format): (String, Either[Long, String]) = node match {
    case SoftLink(name, target) => (name, Right(target))
    case Group(name, children, attrs) =>
      val kids = children.map(c => writeNode(out, c, fmt))
      (name, Left(writeGroup(out, kids, attrs, fmt)))
    case d: DoubleDataset =>
      out.pad8()
      val dataAddr = out.pos
      d.data.foreach { v =>
        val bits = java.lang.Double.doubleToLongBits(v); out.u64(bits)
      }
      (d.name, Left(datasetHeader(out, d.dims, DtFloat64, dataAddr, d.data.length * 8L, d.attrs, fmt)))
    case l: LongDataset =>
      out.pad8()
      val dataAddr = out.pos
      l.data.foreach(out.u64)
      (l.name, Left(datasetHeader(out, l.dims, DtInt64, dataAddr, l.data.length * 8L, l.attrs, fmt)))
    case s: StringDataset =>
      out.pad8()
      val dataAddr = out.pos
      val d = (s.value + NulS).getBytes("UTF-8")
      out.bytes(d)
      // dims = Nil -> rank-0 (scalar) dataspace
      (s.name, Left(datasetHeader(out, Nil, dtString(d.length), dataAddr, d.length.toLong, s.attrs, fmt)))
    case c: ChunkedDoubleDataset =>
      val rank = c.dims.size
      require(rank >= 1 && c.chunkDims.size == rank, "chunkDims rank mismatch")
      require(c.data.length.toLong == c.dims.product, "data length != dims product")
      val filters: Seq[(Int, Seq[Long])] =
        (if (c.shuffle) Seq((2, Seq(8L))) else Nil) ++
          (if (c.deflateLevel > 0) Seq((1, Seq(c.deflateLevel.toLong))) else Nil)
      val entries = chunkOrigins(c.dims, c.chunkDims).map { origin =>
        var bytesOut = gatherChunk(c.data, c.dims, c.chunkDims, origin)
        if (c.shuffle) bytesOut = shuffleBytes(bytesOut, 8)
        if (c.deflateLevel > 0) bytesOut = deflateBytes(bytesOut, c.deflateLevel)
        out.pad8()
        val addr = out.pos
        out.bytes(bytesOut)
        (origin, addr.toLong, bytesOut.length)
      }
      val btree = writeChunkBtree(out, rank, entries)
      val layout = {
        val b = ByteBuffer.allocate(3 + 8 + (rank + 1) * 4).order(ByteOrder.LITTLE_ENDIAN)
        b.put(3.toByte).put(2.toByte).put((rank + 1).toByte)
        b.putLong(btree)
        c.chunkDims.foreach(d => b.putInt(d))
        b.putInt(8) // element size
        b.array()
      }
      val v3Attrs = fmt == Latest
      val msgs = Seq((0x0001, dataspace(c.dims)), (0x0003, DtFloat64)) ++
        (if (filters.nonEmpty) Seq((0x000B, filterPipeline(filters, v2 = fmt == Latest))) else Nil) ++
        Seq((0x0008, layout)) ++
        c.attrs.map { case (n, v) => (0x000C, attrMessage(n, v, v3 = v3Attrs)) }
      val hdr = if (fmt == Latest) objectHeaderV2(out, msgs) else objectHeaderV1(out, msgs)
      (c.name, Left(hdr))
  }

  private def datasetHeader(out: Buf, dims: Seq[Long], dt: Array[Byte],
                            dataAddr: Long, dataSize: Long,
                            attrs: Seq[(String, Any)], fmt: Format): Long = {
    val layout = {
      val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte).put(1.toByte) // v3, contiguous
      b.putLong(dataAddr).putLong(dataSize)
      b.array()
    }
    val msgs = Seq((0x0001, dataspace(dims)), (0x0003, dt), (0x0008, layout)) ++
      attrs.map { case (n, v) => (0x000C, attrMessage(n, v, v3 = fmt == Latest)) }
    if (fmt == Latest) objectHeaderV2(out, msgs) else objectHeaderV1(out, msgs)
  }

  /** Write a file whose root group holds `children` (+ root attributes). */
  def write(children: Seq[Node], rootAttrs: Seq[(String, Any)], path: String,
            format: Format = ClassicV0): Unit = {
    val out = new Buf
    out.bytes(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    val bytes = format match {
      case Latest =>
        out.u8(3); out.u8(8); out.u8(8); out.u8(0)   // version, offsets, lengths, flags
        out.u64(0)                                   // base address
        out.u64(Undef)                               // superblock extension
        val eofPos = out.pos; out.u64(0)             // EOF (patched)
        val rootHdrPos = out.pos; out.u64(0)         // root header addr (patched)
        val ckPos = out.pos; out.u32(0)              // checksum (patched)
        val kids = children.map(c => writeNode(out, c, format))
        val rootHdr = writeGroup(out, kids, rootAttrs, format)
        out.patch64(rootHdrPos, rootHdr)
        out.patch64(eofPos, out.pos)
        out.patch32(ckPos, jenkinsLookup3(out.raw, 0, ckPos))
        out.result
      case _ =>
        val v1 = format == ClassicV1
        out.u8(if (v1) 1 else 0); out.u8(0); out.u8(0); out.u8(0) // versions
        out.u8(0); out.u8(8); out.u8(8); out.u8(0)   // shared ver, offsets, lengths
        out.u16(4); out.u16(16)                      // leaf K, internal K
        out.u32(0)                                   // consistency flags
        if (v1) { out.u16(32); out.u16(0) }          // indexed-storage K + reserved
        out.u64(0)                                   // base address
        out.u64(Undef)                               // free space
        val eofPos = out.pos; out.u64(0)             // EOF (patched)
        out.u64(Undef)                               // driver info
        out.u64(0)                                   // root link name offset
        val rootHdrPos = out.pos; out.u64(0)         // root header addr (patched)
        out.u32(0); out.u32(0)                       // cache type, reserved
        out.bytes(new Array[Byte](16))               // scratch
        val kids = children.map(c => writeNode(out, c, format))
        val rootHdr = writeGroup(out, kids, rootAttrs, format)
        out.patch64(rootHdrPos, rootHdr)
        out.patch64(eofPos, out.pos)
        out.result
    }
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, bytes)
  }
}
