package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

import scala.collection.mutable

/** Minimal pure-JVM reader for the HDF5 CLASSIC file format — the subset
  * the sed loaders actually touch: superblock v0/v2/v3, object headers
  * v1/v2, symbol-table groups (B-tree v1 + local heap) and compact link
  * messages, contiguous/compact/chunked dataset layouts (chunk B-tree v1),
  * deflate + shuffle filters, fixed-point/float datatypes, and
  * header-resident attributes. Implemented from the public HDF5 File
  * Format Specification; no native libhdf5 involved, so .h5 ingestion
  * works inside Spark executors with zero extra dependencies.
  *
  * Out of scope (throws with a clear message): dense/fractal-heap group
  * storage, variable-length/compound datatypes, szip. Those do not occur
  * in the mpes-style per-scan files this loader targets
  * (reference: src/sed/loader/mpes/loader.py reads "Stream_N" 1-D numeric
  * datasets + scalar attributes).
  *
  * The whole file is held in one byte array — sed's scan files are
  * per-chunk artifacts sized for exactly this access pattern (the
  * reference loader also loads each file fully into memory,
  * loader/mpes/loader.py:35 load_h5_in_memory).
  */
final class Hdf5File(bytes: Array[Byte]) {

  private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  private def u8(p: Int): Int = bytes(p) & 0xff
  private def u16(p: Int): Int = buf.getShort(p) & 0xffff
  private def u32(p: Int): Long = buf.getInt(p) & 0xffffffffL
  private def u64(p: Int): Long = buf.getLong(p)
  private val Undef = -1L // 0xffff... addresses mean "undefined"
  private def addr(p: Int): Long = { val a = u64(p); if (a == -1L) Undef else a }

  // ---- superblock ----
  private val (rootHeaderAddr: Long) = {
    require(bytes.length > 64, "not an HDF5 file (too small)")
    val sig = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
    require((0 until 8).forall(i => bytes(i) == sig(i)), "not an HDF5 file (bad signature)")
    u8(8) match {
      case v @ (0 | 1) =>
        require(u8(13) == 8 && u8(14) == 8, "only 8-byte offsets/lengths supported")
        // v1 inserts 4 bytes (indexed-storage K + reserved) before the
        // address block; the root symbol table entry follows 4 addresses,
        // and its object header address is its second 8-byte field
        val symEntry = (if (v == 1) 28 else 24) + 4 * 8
        addr(symEntry + 8)
      case 2 | 3 =>
        require(u8(9) == 8 && u8(10) == 8, "only 8-byte offsets/lengths supported")
        // fields: base@12, sb-extension@20, EOF@28, root header@36
        addr(12 + 8 + 8 + 8)
      case v => throw new UnsupportedOperationException(s"superblock v$v")
    }
  }

  // ---- object header messages ----
  private case class Msg(typ: Int, bodyPos: Int, size: Int)

  private def readMessagesV1(headerAddr: Long): Seq[Msg] = {
    val out = mutable.ArrayBuffer.empty[Msg]
    var nmsg = u16(headerAddr.toInt + 2)
    // prefix: ver(1) res(1) nmsg(2) refcnt(4) hdrSize(4) pad(4)
    var blocks = List((headerAddr + 16, u32(headerAddr.toInt + 8)))
    while (blocks.nonEmpty && out.size < nmsg) {
      val (start, len) = blocks.head
      blocks = blocks.tail
      var p = start.toInt
      val end = (start + len).toInt
      while (p + 8 <= end && out.size < nmsg) {
        val typ = u16(p); val size = u16(p + 2)
        val bodyPos = p + 8
        if (typ == 0x0010) { // continuation: offset(8), length(8)
          blocks = (u64(bodyPos), u64(bodyPos + 8)) :: blocks
        } else out += Msg(typ, bodyPos, size)
        p = bodyPos + size
      }
    }
    out.toSeq
  }

  private def readMessagesV2(headerAddr: Long): Seq[Msg] = {
    val out = mutable.ArrayBuffer.empty[Msg]
    def block(start: Int, size: Long, first: Boolean): Unit = {
      var p = start
      val end = start + size.toInt
      val creationOrderTracked = (u8(headerAddr.toInt + 5) & 0x04) != 0
      while (p + 4 <= end) {
        val typ = u8(p); val size = u16(p + 1); val flags = u8(p + 3)
        var bodyPos = p + 4
        if (creationOrderTracked) bodyPos += 2
        if (typ == 0x10) {
          val off = u64(bodyPos); val len = u64(bodyPos + 8)
          // continuation block: "OCHK" + messages + 4-byte checksum
          block(off.toInt + 4, len - 8, first = false)
        } else out += Msg(typ, bodyPos, size)
        p = bodyPos + size
      }
    }
    val base = headerAddr.toInt
    require(bytes(base) == 'O' && bytes(base + 1) == 'H', "expected OHDR")
    val flags = u8(base + 5)
    var p = base + 6
    if ((flags & 0x20) != 0) p += 16 // times
    if ((flags & 0x10) != 0) p += 4  // max compact / min dense
    val sizeOfChunk0 = (flags & 0x3) match {
      case 0 => val v = u8(p); p += 1; v.toLong
      case 1 => val v = u16(p); p += 2; v.toLong
      case 2 => val v = u32(p); p += 4; v
      case _ => val v = u64(p); p += 8; v
    }
    block(p, sizeOfChunk0 - 4, first = true) // minus checksum
    out.toSeq
  }

  private def readMessages(headerAddr: Long): Seq[Msg] = {
    require(headerAddr != Undef, "undefined object header address")
    if (bytes(headerAddr.toInt) == 'O' && bytes(headerAddr.toInt + 1) == 'H')
      readMessagesV2(headerAddr)
    else readMessagesV1(headerAddr)
  }

  // ---- groups ----
  /** (child name -> object header address) of the group at `headerAddr`. */
  /** Sentinel "address" marking a soft-link entry; the real target path
    * lives in [[softTargets]] keyed by (group header addr, name). */
  private val SoftEntry = Long.MinValue
  private val softTargets = mutable.Map.empty[(Long, String), String]

  private def groupEntries(headerAddr: Long): Seq[(String, Long)] = {
    val msgs = readMessages(headerAddr)
    val out = mutable.ArrayBuffer.empty[(String, Long)]
    msgs.foreach { m =>
      m.typ match {
        case 0x0011 => // symbol table: btree addr, heap addr
          val btree = u64(m.bodyPos); val heap = u64(m.bodyPos + 8)
          val heapData = u64(heap.toInt + 8 + 8 + 8) // sig(4)+ver(1)+res(3)+dataSize(8)+freeOff(8) -> dataAddr
          def walk(node: Long): Unit = {
            val p = node.toInt
            require(bytes(p) == 'T' && bytes(p + 1) == 'R', "expected TREE")
            val level = u8(p + 5); val n = u16(p + 6)
            var q = p + 8 + 16 // skip siblings
            q += 8 // key0
            for (_ <- 0 until n) {
              val child = u64(q); q += 8
              q += 8 // key_{i+1}
              if (level > 0) walk(child)
              else { // SNOD
                val s = child.toInt
                require(bytes(s) == 'S' && bytes(s + 1) == 'N', "expected SNOD")
                val nsyms = u16(s + 6)
                var e = s + 8
                for (_ <- 0 until nsyms) {
                  val nameOff = u64(e); val hdr = u64(e + 8)
                  def heapStr(off: Long): String = {
                    var np = (heapData + off).toInt
                    val sb = new StringBuilder
                    while (bytes(np) != 0) { sb.append(bytes(np).toChar); np += 1 }
                    sb.toString
                  }
                  val name = heapStr(nameOff)
                  // cache type 2 = symbolic link: scratch bytes 0-3 hold
                  // the local-heap offset of the link value string
                  if (u32(e + 16) == 2) {
                    softTargets += ((headerAddr, name)) -> heapStr(u32(e + 24))
                    out += ((name, SoftEntry))
                  } else out += ((name, hdr))
                  e += 40
                }
              }
            }
          }
          walk(btree)
        case 0x0006 => // link message (compact v2 group storage)
          var p = m.bodyPos
          val ver = u8(p); val flags = u8(p + 1); p += 2
          require(ver == 1, s"link message v$ver")
          val linkType = if ((flags & 0x08) != 0) { val t = u8(p); p += 1; t } else 0
          if ((flags & 0x04) != 0) p += 8 // creation order
          if ((flags & 0x10) != 0) p += 1 // charset
          val nameLen = (flags & 0x3) match {
            case 0 => val v = u8(p); p += 1; v.toLong
            case 1 => val v = u16(p); p += 2; v.toLong
            case 2 => val v = u32(p); p += 4; v
            case _ => val v = u64(p); p += 8; v
          }
          val name = new String(bytes, p, nameLen.toInt, "UTF-8"); p += nameLen.toInt
          if (linkType == 0) out += ((name, u64(p))) // hard link
          else if (linkType == 1) { // soft link: u16 value length + path
            val tlen = u16(p)
            softTargets += ((headerAddr, name)) ->
              new String(bytes, p + 2, tlen, "UTF-8")
            out += ((name, SoftEntry))
          }
        case 0x0002 => // link info: dense storage would live here
          val fheap = u64(m.bodyPos + 2 + (if ((u8(m.bodyPos + 1) & 1) != 0) 8 else 0))
          if (fheap != Undef && fheap != 0 && out.isEmpty && !msgs.exists(x => x.typ == 0x0011 || x.typ == 0x0006))
            throw new UnsupportedOperationException("dense (fractal-heap) group storage not supported")
        case _ =>
      }
    }
    out.toSeq
  }

  // ---- datatypes / dataspace ----
  private case class Dtype(clazz: Int, size: Int, signed: Boolean, littleEndian: Boolean)

  private def parseDtype(p: Int): Dtype = {
    val cv = u8(p)
    val clazz = cv & 0x0f
    val b0 = u8(p + 1)
    val size = u32(p + 4).toInt
    Dtype(clazz, size, signed = (b0 & 0x08) != 0, littleEndian = (b0 & 0x01) == 0)
  }

  private def parseDims(p: Int): Array[Long] = {
    val ver = u8(p)
    if (ver == 1) {
      val rank = u8(p + 1)
      Array.tabulate(rank)(i => u64(p + 8 + i * 8))
    } else {
      val rank = u8(p + 1)
      Array.tabulate(rank)(i => u64(p + 4 + i * 8))
    }
  }

  // ---- datasets ----
  private case class Dataset(dims: Array[Long], dtype: Dtype, raw: Array[Byte])

  private def filtersOf(msgs: Seq[Msg]): Seq[(Int, Array[Int])] = {
    msgs.find(_.typ == 0x000B).map { m =>
      val ver = u8(m.bodyPos)
      val nf = u8(m.bodyPos + 1)
      val out = mutable.ArrayBuffer.empty[(Int, Array[Int])]
      var p = m.bodyPos + (if (ver == 1) 8 else 2)
      for (_ <- 0 until nf) {
        val id = u16(p)
        // v2 descriptions for pre-registered filters (id < 256) omit the
        // Name Length field entirely: flags@p+2, ncv@p+4, 6-byte header
        val hasNameLen = ver == 1 || id >= 256
        val nameLen = if (hasNameLen) u16(p + 2) else 0
        val ncv = if (hasNameLen) u16(p + 6) else u16(p + 4)
        p += (if (hasNameLen) 8 else 6) +
          (if (ver == 1) ((nameLen + 7) / 8) * 8 else nameLen)
        val cvs = Array.tabulate(ncv)(i => u32(p + i * 4).toInt)
        p += ncv * 4
        if (ver == 1 && ncv % 2 == 1) p += 4
        out += ((id, cvs))
      }
      out.toSeq
    }.getOrElse(Nil)
  }

  private def unfilter(raw: Array[Byte], filters: Seq[(Int, Array[Int])],
                       elemSize: Int): Array[Byte] = {
    var data = raw
    filters.reverse.foreach { case (id, _) =>
      id match {
        case 1 => // deflate
          val inf = new Inflater()
          inf.setInput(data)
          val out = new java.io.ByteArrayOutputStream(data.length * 4)
          val tmp = new Array[Byte](65536)
          while (!inf.finished()) {
            val n = inf.inflate(tmp)
            if (n == 0 && inf.needsInput()) throw new IllegalStateException("truncated deflate chunk")
            out.write(tmp, 0, n)
          }
          inf.end()
          data = out.toByteArray
        case 2 => // shuffle: de-interleave byte planes
          val n = data.length / elemSize
          val out = new Array[Byte](data.length)
          var i = 0
          while (i < n) {
            var b = 0
            while (b < elemSize) { out(i * elemSize + b) = data(b * n + i); b += 1 }
            i += 1
          }
          // trailing bytes (length not divisible) copied as-is
          System.arraycopy(data, n * elemSize, out, n * elemSize, data.length - n * elemSize)
          data = out
        case 3 => // fletcher32 checksum: strip the trailing 4 bytes
          data = java.util.Arrays.copyOfRange(data, 0, data.length - 4)
        case other => throw new UnsupportedOperationException(s"HDF5 filter id $other")
      }
    }
    data
  }

  private def readDatasetAt(headerAddr: Long): Dataset = {
    val msgs = readMessages(headerAddr)
    val dspace = msgs.find(_.typ == 0x0001).getOrElse(throw new IllegalStateException("no dataspace"))
    val dims = parseDims(dspace.bodyPos)
    val dt = parseDtype(msgs.find(_.typ == 0x0003).get.bodyPos)
    require(dt.clazz == 0 || dt.clazz == 1 || dt.clazz == 3,
      s"unsupported datatype class ${dt.clazz}")
    val filters = filtersOf(msgs)
    val layout = msgs.find(_.typ == 0x0008).getOrElse(throw new IllegalStateException("no layout"))
    val lp = layout.bodyPos
    val ver = u8(lp)
    require(ver == 3, s"layout v$ver not supported")
    val total = dims.product * dt.size
    u8(lp + 1) match {
      case 0 => // compact: size(2), data
        val sz = u16(lp + 2)
        Dataset(dims, dt, java.util.Arrays.copyOfRange(bytes, lp + 4, lp + 4 + sz))
      case 1 => // contiguous: addr(8), size(8)
        val a = u64(lp + 2)
        if (a == Undef) Dataset(dims, dt, new Array[Byte](total.toInt))
        else Dataset(dims, dt, java.util.Arrays.copyOfRange(bytes, a.toInt, (a + total).toInt))
      case 2 => // chunked: dimensionality(1), btreeAddr(8), chunkDims (4 bytes each, incl elem size)
        val ndims = u8(lp + 2)
        val btree = u64(lp + 3)
        val chunkDims = Array.tabulate(ndims - 1)(i => u32(lp + 11 + i * 4))
        val out = new Array[Byte](total.toInt)
        val rank = dims.length
        def strides: Array[Long] = dims.scanRight(1L)(_ * _).tail.toArray
        val st = strides
        def walk(node: Long): Unit = {
          if (node == Undef) return
          val p = node.toInt
          require(bytes(p) == 'T' && bytes(p + 1) == 'R', "expected chunk TREE")
          val level = u8(p + 5); val n = u16(p + 6)
          var q = p + 8 + 16
          // chunk key: size(4), filterMask(4), offsets[(rank+1)](8 each)
          val keyLen = 8 + (rank + 1) * 8
          for (_ <- 0 until n) {
            val chunkSize = u32(q).toInt
            val offs = Array.tabulate(rank)(i => u64(q + 8 + i * 8))
            val child = u64(q + keyLen)
            if (level > 0) walk(child)
            else {
              val raw = java.util.Arrays.copyOfRange(bytes, child.toInt, child.toInt + chunkSize)
              val data = unfilter(raw, filters, dt.size)
              // copy chunk (edge-clipped) into the output at `offs`
              val copyDims = Array.tabulate(rank)(i =>
                math.min(chunkDims(i), dims(i) - offs(i)).toInt)
              val chunkStrides = chunkDims.scanRight(1L)(_ * _).tail
              def rec(dim: Int, srcBase: Long, dstBase: Long): Unit = {
                if (dim == rank - 1) {
                  System.arraycopy(data, (srcBase * dt.size).toInt, out,
                    (dstBase * dt.size).toInt, copyDims(dim) * dt.size)
                } else {
                  var i = 0
                  while (i < copyDims(dim)) {
                    rec(dim + 1, srcBase + i * chunkStrides(dim), dstBase + i * st(dim))
                    i += 1
                  }
                }
              }
              if (rank == 0) System.arraycopy(data, 0, out, 0, dt.size)
              else rec(0, 0L, offs.zip(st).map { case (o, s) => o * s }.sum)
            }
            q += keyLen + 8
          }
        }
        walk(btree)
        Dataset(dims, dt, out)
      case other => throw new UnsupportedOperationException(s"layout class $other")
    }
  }

  // ---- attribute messages ----
  private def attributesAt(headerAddr: Long): Map[String, Any] = {
    readMessages(headerAddr).filter(_.typ == 0x000C).flatMap { m =>
      val p = m.bodyPos
      val ver = u8(p)
      var (nameP, dtP, dsP, dataP) = (0, 0, 0, 0)
      val nameSize = u16(p + 2); val dtSize = u16(p + 4); val dsSize = u16(p + 6)
      def pad8(x: Int): Int = ((x + 7) / 8) * 8
      if (ver == 1) {
        nameP = p + 8
        dtP = nameP + pad8(nameSize)
        dsP = dtP + pad8(dtSize)
        dataP = dsP + pad8(dsSize)
      } else { // v2/v3: unpadded; v3 has +1 encoding byte before name
        val extra = if (ver >= 3) 1 else 0
        nameP = p + 8 + extra
        dtP = nameP + nameSize
        dsP = dtP + dtSize
        dataP = dsP + dsSize
      }
      var ne = nameP
      while (bytes(ne) != 0) ne += 1
      val name = new String(bytes, nameP, ne - nameP, "UTF-8")
      val dt = parseDtype(dtP)
      val dims = parseDims(dsP)
      val n = if (dims.isEmpty) 1L else dims.product
      val value: Any = dt.clazz match {
        case 0 if n == 1 => readIntAt(dataP, dt)
        case 1 if n == 1 => readFloatAt(dataP, dt)
        case 3 => new String(bytes, dataP, dt.size, "UTF-8").takeWhile(_ != 0)
        case _ => null
      }
      if (value == null) None else Some(name -> value)
    }.toMap
  }

  private def readIntAt(p: Int, dt: Dtype): Long = dt.size match {
    case 1 => if (dt.signed) bytes(p).toLong else u8(p).toLong
    case 2 => if (dt.signed) buf.getShort(p).toLong else u16(p).toLong
    case 4 => if (dt.signed) buf.getInt(p).toLong else u32(p)
    case 8 => u64(p)
  }
  private def readFloatAt(p: Int, dt: Dtype): Double = dt.size match {
    case 4 => buf.getFloat(p).toDouble
    case 8 => buf.getDouble(p)
  }

  // ---- public API ----

  /** Object header address lookup by absolute path ("/grp/dset"),
    * following soft links (bounded depth against cycles). */
  private def resolve(path: String): Long = resolve(path, depth = 0)

  private def resolve(path: String, depth: Int): Long = {
    require(depth < 16, s"soft-link chain too deep resolving $path")
    val parts = path.split('/').filter(_.nonEmpty)
    var hdr = rootHeaderAddr
    var i = 0
    while (i < parts.length) {
      val name = parts(i)
      val entry = groupEntries(hdr).find(_._1 == name)
        .getOrElse(throw new NoSuchElementException(s"no '$name' under path in $path"))._2
      if (entry == SoftEntry) {
        val target = softTargets((hdr, name))
        // A target starting with '/' is absolute; otherwise HDF5 resolves
        // it relative to the group HOLDING the link, so prefix the walked
        // path so far. "." segments (self-references) are dropped.
        val tSegs = target.split('/').filter(s => s.nonEmpty && s != ".")
        val base = if (target.startsWith("/")) tSegs else parts.take(i) ++ tSegs
        val rest = parts.drop(i + 1)
        return resolve((base ++ rest).mkString("/", "/", ""), depth + 1)
      }
      hdr = entry
      i += 1
    }
    hdr
  }

  /** Names of the root group's children (datasets and subgroups). */
  def rootNames: Seq[String] = groupEntries(rootHeaderAddr).map(_._1)

  /** Names of a group's children. */
  def childNames(path: String): Seq[String] = groupEntries(resolve(path)).map(_._1)

  /** Whether an object (dataset or group) exists at the absolute path. */
  def exists(path: String): Boolean =
    try { resolve(path); true } catch { case _: NoSuchElementException => false }

  def shape(path: String): Seq[Long] = readDatasetAt(resolve(path)).dims.toSeq

  /** Read a fixed-size string dataset (class 3) as a String; the NUL
    * terminator and anything after it are dropped. */
  def readString(path: String): String = {
    val ds = readDatasetAt(resolve(path))
    require(ds.dtype.clazz == 3, s"not a string dataset: $path (class ${ds.dtype.clazz})")
    new String(ds.raw, java.nio.charset.StandardCharsets.UTF_8).takeWhile(_ != 0)
  }

  /** Read a numeric dataset as doubles (row-major flat). */
  def readDoubles(path: String): Array[Double] = {
    val ds = readDatasetAt(resolve(path))
    require(ds.dtype.clazz == 0 || ds.dtype.clazz == 1,
      s"not a numeric dataset: $path (class ${ds.dtype.clazz})")
    require(ds.dtype.littleEndian, "big-endian data not supported")
    val n = ds.dims.product.toInt
    val bb = ByteBuffer.wrap(ds.raw).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](n)
    var i = 0
    if (ds.dtype.clazz == 1) {
      while (i < n) { out(i) = if (ds.dtype.size == 4) bb.getFloat(i * 4).toDouble else bb.getDouble(i * 8); i += 1 }
    } else {
      while (i < n) {
        out(i) = (ds.dtype.size match {
          case 1 => if (ds.dtype.signed) ds.raw(i).toDouble else (ds.raw(i) & 0xff).toDouble
          case 2 => if (ds.dtype.signed) bb.getShort(i * 2).toDouble else (bb.getShort(i * 2) & 0xffff).toDouble
          case 4 => if (ds.dtype.signed) bb.getInt(i * 4).toDouble else (bb.getInt(i * 4) & 0xffffffffL).toDouble
          case 8 => bb.getLong(i * 8).toDouble
        })
        i += 1
      }
    }
    out
  }

  /** Scalar/string attributes of an object (dataset or group). */
  def attributes(path: String): Map[String, Any] =
    attributesAt(if (path == "/" || path.isEmpty) rootHeaderAddr else resolve(path))
}

object Hdf5File {
  def fromPath(p: java.nio.file.Path): Hdf5File =
    new Hdf5File(java.nio.file.Files.readAllBytes(p))

  /** Read via Hadoop FS (works on distributed storage from executors). */
  def fromHadoop(path: String, conf: org.apache.hadoop.conf.Configuration): Hdf5File = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val out = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, out) finally in.close()
    new Hdf5File(out)
  }
}
