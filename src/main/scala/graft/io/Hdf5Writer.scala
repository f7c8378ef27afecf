package graft.io

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.mutable.ArrayBuffer

/** Minimal HDF5 CLASSIC-format writer — superblock v0, v1 object headers,
  * symbol-table groups (one B-tree leaf + one SNOD per group, ≤ 8 children
  * — plenty for export layouts), contiguous little-endian float64/int64
  * datasets, and scalar string/double attributes. Emitted structures are
  * byte-for-byte the ones [[Hdf5File]] parses from real libhdf5 files
  * (datatype message bodies are the exact constants libhdf5 writes), and
  * every export is round-trip-verified through that reader, which is
  * itself validated against production files. This is what makes the
  * NeXus export REAL HDF5 bytes instead of a documented stand-in.
  */
object Hdf5Writer {

  sealed trait Node { def name: String; def attrs: Seq[(String, Any)] }
  case class Group(name: String, children: Seq[Node],
                   attrs: Seq[(String, Any)] = Nil) extends Node
  case class DoubleDataset(name: String, dims: Seq[Long], data: Array[Double],
                           attrs: Seq[(String, Any)] = Nil) extends Node
  case class LongDataset(name: String, dims: Seq[Long], data: Array[Long],
                         attrs: Seq[(String, Any)] = Nil) extends Node

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
    def result: Array[Byte] = java.util.Arrays.copyOf(arr, pos)
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

  /** Attribute message body (v1 layout: padded name/datatype/dataspace). */
  private def attrMessage(name: String, value: Any): Array[Byte] = {
    val nameB = (name + NulS).getBytes("US-ASCII")
    val (dt, data) = value match {
      case s: String =>
        val d = (s + NulS).getBytes("US-ASCII")
        (dtString(d.length), d)
      case d: Double =>
        val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN); b.putDouble(d)
        (DtFloat64, b.array())
      case l: Long =>
        val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN); b.putLong(l)
        (DtInt64, b.array())
      case other => throw new IllegalArgumentException(s"attribute type ${other.getClass}")
    }
    val total = 8 + pad8len(nameB.length) + pad8len(dt.length) + pad8len(ScalarDataspace.length) +
      pad8len(data.length)
    val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put(0.toByte) // version, reserved
    b.putShort(nameB.length.toShort).putShort(dt.length.toShort)
      .putShort(ScalarDataspace.length.toShort)
    def padded(x: Array[Byte]): Unit = { b.put(x); b.put(new Array[Byte](pad8len(x.length) - x.length)) }
    padded(nameB); padded(dt); padded(ScalarDataspace); padded(data)
    b.array()
  }

  /** v1 object header from (type, body) messages; returns its address. */
  private def objectHeader(out: Buf, messages: Seq[(Int, Array[Byte])]): Long = {
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

  /** Write one group's heap/SNOD/B-tree over already-written children;
    * returns the group's object header address. */
  private def writeGroup(out: Buf, children: Seq[(String, Long)],
                         attrs: Seq[(String, Any)]): Long = {
    require(children.size <= 8,
      s"minimal writer supports <= 8 entries per group, got ${children.size}")
    val sorted = children.sortBy(_._1)
    // local heap: leading 8 zero bytes (offset 0 = empty name), then names
    val nameOffsets = ArrayBuffer.empty[Long]
    val heapData = {
      val hb = new Buf
      hb.u64(0)
      sorted.foreach { case (n, _) =>
        nameOffsets += hb.pos.toLong
        hb.bytes((n + NulS).getBytes("US-ASCII")); hb.pad8()
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
    sorted.zipWithIndex.foreach { case ((_, hdr), i) =>
      out.u64(nameOffsets(i)); out.u64(hdr); out.u32(0); out.u32(0)
      out.bytes(new Array[Byte](16))
    }
    // B-tree: single leaf pointing at the SNOD
    out.pad8()
    val btreeAddr = out.pos
    out.bytes("TREE".getBytes("US-ASCII"))
    out.u8(0); out.u8(0) // group node, level 0
    out.u16(1)           // one child
    out.u64(Undef); out.u64(Undef) // siblings
    out.u64(nameOffsets.head)      // key 0: heap offset of first name
    out.u64(snodAddr)
    out.u64(nameOffsets.last)      // key 1
    // group object header: symbol table message + attributes
    val stBody = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(btreeAddr).putLong(heapAddr)
      b.array()
    }
    objectHeader(out, (0x0011, stBody) +: attrs.map { case (n, v) => (0x000C, attrMessage(n, v)) })
  }

  private def writeNode(out: Buf, node: Node): (String, Long) = node match {
    case Group(name, children, attrs) =>
      val kids = children.map(c => writeNode(out, c))
      (name, writeGroup(out, kids, attrs))
    case d: DoubleDataset =>
      out.pad8()
      val dataAddr = out.pos
      d.data.foreach { v =>
        val bits = java.lang.Double.doubleToLongBits(v); out.u64(bits)
      }
      (d.name, datasetHeader(out, d.dims, DtFloat64, dataAddr, d.data.length * 8L, d.attrs))
    case l: LongDataset =>
      out.pad8()
      val dataAddr = out.pos
      l.data.foreach(out.u64)
      (l.name, datasetHeader(out, l.dims, DtInt64, dataAddr, l.data.length * 8L, l.attrs))
  }

  private def datasetHeader(out: Buf, dims: Seq[Long], dt: Array[Byte],
                            dataAddr: Long, dataSize: Long,
                            attrs: Seq[(String, Any)]): Long = {
    val layout = {
      val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte).put(1.toByte) // v3, contiguous
      b.putLong(dataAddr).putLong(dataSize)
      b.array()
    }
    objectHeader(out,
      Seq((0x0001, dataspace(dims)), (0x0003, dt), (0x0008, layout)) ++
        attrs.map { case (n, v) => (0x000C, attrMessage(n, v)) })
  }

  /** Write a file whose root group holds `children` (+ root attributes). */
  def write(children: Seq[Node], rootAttrs: Seq[(String, Any)], path: String): Unit = {
    val out = new Buf
    // superblock v0 placeholder (96 bytes incl. root symbol table entry)
    out.bytes(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    out.u8(0); out.u8(0); out.u8(0); out.u8(0)   // versions
    out.u8(0); out.u8(8); out.u8(8); out.u8(0)   // shared ver, offsets, lengths
    out.u16(4); out.u16(16)                      // leaf K, internal K
    out.u32(0)                                   // consistency flags
    out.u64(0)                                   // base address
    out.u64(Undef)                               // free space
    val eofPos = out.pos; out.u64(0)             // EOF (patched)
    out.u64(Undef)                               // driver info
    out.u64(0)                                   // root link name offset
    val rootHdrPos = out.pos; out.u64(0)         // root header addr (patched)
    out.u32(0); out.u32(0)                       // cache type, reserved
    out.bytes(new Array[Byte](16))               // scratch
    val kids = children.map(c => writeNode(out, c))
    val rootHdr = writeGroup(out, kids, rootAttrs)
    out.patch64(rootHdrPos, rootHdr)
    out.patch64(eofPos, out.pos)
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, out.result)
  }
}
