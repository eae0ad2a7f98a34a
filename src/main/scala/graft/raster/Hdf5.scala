package graft.raster

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal HDF5 codec — the container format of NetCDF-4 — written
  * from the public "HDF5 File Format Specification Version 2.0"
  * (superblock v0, version-1 object headers, group symbol tables,
  * contiguous + chunked layouts, deflate/shuffle filters). The
  * reference stack reads NetCDF-4/HDF5 through GDAL (rasterio.py);
  * graft decodes the subset gridded climate data actually uses
  * natively, so post-2015 NetCDF-4 ingest needs no external driver.
  *
  * Reader scope (the layout libnetcdf emits by default — earliest-
  * compatible libver, i.e. superblock v0 + v1 object headers — plus
  * the v2/v3 superblock pointer layout of latest-format files):
  *  - superblock v0/1 (96-byte form) and v2/3 (checksummed form),
  *    8-byte offsets/lengths only;
  *  - v1 object headers with continuation blocks; messages: dataspace
  *    (v1/v2), datatype (fixed-point + IEEE float, both endiannesses),
  *    fill value, layout v1/v2/v3 (contiguous + chunked), filter
  *    pipeline v1/v2 (deflate id 1, shuffle id 2), attribute v1,
  *    symbol table, continuation;
  *  - group traversal via symbol-table B-trees (v1, any level) +
  *    local heaps — nested groups flatten to "group/child" names;
  *  - chunked data via the v1 chunk B-tree (any level), inflate +
  *    un-shuffle, partial edge chunks clipped.
  *
  * Writer scope (the roundtrip/spec fixture path): superblock v0,
  * root-group symbol table (one leaf), f64/i64 LE datasets 1-3D,
  * contiguous or whole-slab chunks with optional deflate, double
  * attributes on the root group.
  *
  * Scale: like [[NetCdf]]/[[GeoTiff]], encode/decode run per scene
  * row inside Dataset.map — distributed, nothing driver-side.
  */
object Hdf5 {

  private val Magic = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF

  // ================================================================ write

  private final class Block(val addr: Long, val bytes: Array[Byte])

  /** In-memory little allocator: reserve sized blocks at 8-aligned
    * addresses, fill in a second pass, then concatenate. */
  private final class Alloc {
    private var next = 0L
    private val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    def reserve(size: Int): Block = {
      val b = new Block(next, new Array[Byte](size))
      blocks += b
      next += (size + 7) / 8 * 8
      b
    }
    def eof: Long = next
    def result(): Array[Byte] = {
      val out = new Array[Byte](next.toInt)
      blocks.foreach(b => System.arraycopy(b.bytes, 0, out, b.addr.toInt, b.bytes.length))
      out
    }
  }

  private def bb(a: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)

  private def pad8(n: Int): Int = (n + 7) / 8 * 8

  /** One dataset to write: name, dims (row-major), data as packed LE
    * bytes of `elemSize`-byte elements, element class (0 fixed-point
    * signed, 1 IEEE float). `deflate` selects the chunked+gzip layout;
    * `chunk` overrides the chunk shape (default whole-slab) — edge
    * chunks pad to the full chunk size with zeros, as real HDF5
    * writers do. */
  final case class Ds(name: String, dims: Seq[Long], data: Array[Byte],
                      elemSize: Int, dclass: Int, deflate: Boolean = false,
                      chunk: Option[Seq[Int]] = None)

  private def datatypeMsg(elemSize: Int, dclass: Int): Array[Byte] = {
    val props: Array[Byte] =
      if (dclass == 1) {
        val p = new Array[Byte](12)
        val b = bb(p)
        b.putShort(0, 0.toShort)                       // bit offset
        b.putShort(2, (elemSize * 8).toShort)          // precision
        p(4) = (if (elemSize == 8) 52 else 23).toByte  // exponent location
        p(5) = (if (elemSize == 8) 11 else 8).toByte   // exponent size
        p(6) = 0                                       // mantissa location
        p(7) = (if (elemSize == 8) 52 else 23).toByte  // mantissa size
        b.putInt(8, if (elemSize == 8) 1023 else 127)  // exponent bias
        p
      } else {
        val p = new Array[Byte](4)
        val b = bb(p)
        b.putShort(0, 0.toShort)
        b.putShort(2, (elemSize * 8).toShort)
        p
      }
    val out = new Array[Byte](8 + props.length)
    out(0) = ((1 << 4) | dclass).toByte // version 1 | class
    // bit field byte 0: byte order LE (bit0 = 0); fixed-point: signed
    // (bit 3); float: mantissa normalization = 2 (bits 4-5)
    out(1) = (if (dclass == 1) 0x20 else 0x08).toByte
    out(2) = (if (dclass == 1) (elemSize * 8 - 1) else 0).toByte // float: sign location
    out(3) = 0
    bb(out).putInt(4, elemSize)
    System.arraycopy(props, 0, out, 8, props.length)
    out
  }

  private def dataspaceMsg(dims: Seq[Long]): Array[Byte] = {
    val out = new Array[Byte](8 + 8 * dims.length)
    out(0) = 1               // version
    out(1) = dims.length.toByte
    out(2) = 0               // flags: no max dims
    val b = bb(out)
    dims.zipWithIndex.foreach { case (d, i) => b.putLong(8 + 8 * i, d) }
    out
  }

  private def attributeMsg(name: String, values: Array[Double]): Array[Byte] = {
    val nameB = name.getBytes("US-ASCII") :+ 0.toByte
    val dt = datatypeMsg(8, 1)
    val sp = dataspaceMsg(Seq(values.length.toLong))
    val out = new Array[Byte](8 + pad8(nameB.length) + pad8(dt.length) +
      pad8(sp.length) + 8 * values.length)
    out(0) = 1 // version
    val b = bb(out)
    b.putShort(2, nameB.length.toShort)
    b.putShort(4, dt.length.toShort)
    b.putShort(6, sp.length.toShort)
    var p = 8
    System.arraycopy(nameB, 0, out, p, nameB.length); p += pad8(nameB.length)
    System.arraycopy(dt, 0, out, p, dt.length); p += pad8(dt.length)
    System.arraycopy(sp, 0, out, p, sp.length); p += pad8(sp.length)
    values.zipWithIndex.foreach { case (v, i) => b.putDouble(p + 8 * i, v) }
    out
  }

  private def message(typ: Int, body: Array[Byte]): Array[Byte] = {
    val padded = pad8(body.length)
    val out = new Array[Byte](8 + padded)
    val b = bb(out)
    b.putShort(0, typ.toShort)
    b.putShort(2, padded.toShort)
    System.arraycopy(body, 0, out, 8, body.length)
    out
  }

  private def objectHeaderV1(msgs: Seq[Array[Byte]]): Array[Byte] = {
    val size = msgs.map(_.length).sum
    val out = new Array[Byte](16 + size)
    out(0) = 1
    val b = bb(out)
    b.putShort(2, msgs.length.toShort)
    b.putInt(4, 1)      // reference count
    b.putInt(8, size)   // header block size
    var p = 16
    msgs.foreach { m => System.arraycopy(m, 0, out, p, m.length); p += m.length }
    out
  }

  /** Encode a flat (root-group) HDF5 file: datasets + double root
    * attributes. Deterministic layout — the literal-restating
    * discipline holds for fixtures built from it. */
  def encode(datasets: Seq[Ds], rootAttrs: Seq[(String, Array[Double])] = Nil): Array[Byte] = {
    require(datasets.nonEmpty)
    val alloc = new Alloc
    val sup = alloc.reserve(96)

    // ---- per-dataset payloads first (addresses needed by headers)
    final case class Placed(ds: Ds, dataAddr: Long, dataLen: Long,
                            btreeAddr: Long)
    val placed = datasets.map { ds =>
      if (!ds.deflate) {
        val blk = alloc.reserve(ds.data.length)
        System.arraycopy(ds.data, 0, blk.bytes, 0, ds.data.length)
        Placed(ds, blk.addr, ds.data.length.toLong, Undef)
      } else {
        // chunked + deflate under a single-leaf chunk B-tree: one
        // entry per chunk-grid position, edge chunks zero-padded to
        // the full chunk shape (the layout real HDF5 writers emit)
        val rank = ds.dims.length
        val cd = ds.chunk.getOrElse(ds.dims.map(_.toInt))
        require(cd.length == rank && cd.forall(_ > 0))
        val elem = ds.elemSize
        val strides = new Array[Long](rank)
        var st = 1L
        for (i <- (rank - 1) to 0 by -1) { strides(i) = st; st *= ds.dims(i) }
        val grid = (0 until rank).map(i => ((ds.dims(i) + cd(i) - 1) / cd(i)).toInt)
        def chunkOrigins(dim: Int, acc: List[Long]): Seq[Seq[Long]] =
          if (dim == rank) Seq(acc.reverse)
          else (0 until grid(dim)).flatMap(g =>
            chunkOrigins(dim + 1, (g.toLong * cd(dim)) :: acc))
        val chunks = chunkOrigins(0, Nil).map { origin =>
          val full = new Array[Byte](cd.product * elem)
          val copyDims = (0 until rank).map(i =>
            math.min(cd(i).toLong, ds.dims(i) - origin(i)).toInt)
          val cStrides = new Array[Long](rank)
          var cs = 1L
          for (i <- (rank - 1) to 0 by -1) { cStrides(i) = cs; cs *= cd(i) }
          val runLen = copyDims(rank - 1) * elem
          def gather(dim: Int, srcBase: Long, dstBase: Long): Unit =
            if (dim == rank - 1)
              System.arraycopy(ds.data, (srcBase * elem).toInt, full,
                (dstBase * elem).toInt, runLen)
            else {
              var i = 0
              while (i < copyDims(dim)) {
                gather(dim + 1, srcBase + i * strides(dim), dstBase + i * cStrides(dim))
                i += 1
              }
            }
          gather(0, (0 until rank).map(i => origin(i) * strides(i)).sum, 0L)
          val d = new java.util.zip.Deflater(6)
          d.setInput(full); d.finish()
          val buf = new Array[Byte](full.length + 64)
          var n = 0
          while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
          d.end()
          val comp = java.util.Arrays.copyOf(buf, n)
          val blk = alloc.reserve(comp.length)
          System.arraycopy(comp, 0, blk.bytes, 0, comp.length)
          (origin, comp.length, blk.addr)
        }
        val keyLen = 8 + 8 * (rank + 1)
        val tree = alloc.reserve(24 + chunks.length * (keyLen + 8) + keyLen)
        val b = bb(tree.bytes)
        tree.bytes(0) = 'T'; tree.bytes(1) = 'R'; tree.bytes(2) = 'E'; tree.bytes(3) = 'E'
        tree.bytes(4) = 1 // node type: raw data chunk
        tree.bytes(5) = 0 // leaf
        b.putShort(6, chunks.length.toShort)
        b.putLong(8, Undef); b.putLong(16, Undef)
        var p = 24
        chunks.foreach { case (origin, sz, addr) =>
          b.putInt(p, sz); b.putInt(p + 4, 0); p += 8
          origin.foreach { o => b.putLong(p, o); p += 8 }
          b.putLong(p, 0L); p += 8 // datum-offset key component
          b.putLong(p, addr); p += 8
        }
        // the +1 key: the dims themselves as the upper bound
        b.putInt(p, 0); b.putInt(p + 4, 0); p += 8
        ds.dims.foreach { dd => b.putLong(p, dd); p += 8 }
        b.putLong(p, ds.elemSize.toLong)
        Placed(ds, Undef, 0L, tree.addr)
      }
    }

    // ---- dataset object headers
    val dsHeaders = placed.map { pl =>
      val ds = pl.ds
      val layout: Array[Byte] =
        if (!ds.deflate) {
          val body = new Array[Byte](2 + 16)
          body(0) = 3; body(1) = 1 // v3 contiguous
          bb(body).putLong(2, pl.dataAddr)
          bb(body).putLong(10, pl.dataLen)
          body
        } else {
          val rank = ds.dims.length
          val cd = ds.chunk.getOrElse(ds.dims.map(_.toInt))
          val body = new Array[Byte](2 + 1 + 8 + 4 * (rank + 1))
          body(0) = 3; body(1) = 2 // v3 chunked
          body(2) = (rank + 1).toByte
          val b = bb(body)
          b.putLong(3, pl.btreeAddr)
          cd.zipWithIndex.foreach { case (d, i) => b.putInt(11 + 4 * i, d) }
          b.putInt(11 + 4 * rank, ds.elemSize)
          body
        }
      val fill = Array[Byte](2, 2, 2, 0) // v2, alloc early, fill-on-alloc, undefined
      val filters: Seq[Array[Byte]] =
        if (!ds.deflate) Nil
        else {
          val body = new Array[Byte](8 + 8 + 4 + 4)
          body(0) = 1 // version
          body(1) = 1 // one filter
          val b = bb(body)
          b.putShort(8, 1.toShort)  // deflate
          b.putShort(10, 0.toShort) // no name
          b.putShort(12, 0.toShort) // flags: mandatory
          b.putShort(14, 1.toShort) // one client value
          b.putInt(16, 6)           // level
          // odd client-value count: 4 zero bytes appended (alloc'd above)
          Seq(message(0x000B, body))
        }
      val msgs = Seq(
        message(0x0001, dataspaceMsg(ds.dims)),
        message(0x0003, datatypeMsg(ds.elemSize, ds.dclass)),
        message(0x0005, fill)) ++ filters :+ message(0x0008, layout)
      val hdr = objectHeaderV1(msgs)
      val blk = alloc.reserve(hdr.length)
      System.arraycopy(hdr, 0, blk.bytes, 0, hdr.length)
      (ds.name, blk.addr)
    }

    // ---- local heap with the child names
    val nameOffsets = scala.collection.mutable.Map.empty[String, Long]
    val heapData = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(new Array[Byte](8)) // offset 0 reserved
      dsHeaders.foreach { case (n, _) =>
        nameOffsets(n) = out.size().toLong
        out.write(n.getBytes("US-ASCII")); out.write(0)
        while (out.size() % 8 != 0) out.write(0)
      }
      out.toByteArray
    }
    val heapSeg = alloc.reserve(heapData.length)
    System.arraycopy(heapData, 0, heapSeg.bytes, 0, heapData.length)
    val heapHdr = alloc.reserve(32)
    heapHdr.bytes(0) = 'H'; heapHdr.bytes(1) = 'E'; heapHdr.bytes(2) = 'A'; heapHdr.bytes(3) = 'P'
    bb(heapHdr.bytes).putLong(8, heapData.length.toLong)
    bb(heapHdr.bytes).putLong(16, Undef) // no free list
    bb(heapHdr.bytes).putLong(24, heapSeg.addr)

    // ---- SNOD with entries sorted by name (the B-tree invariant)
    val sorted = dsHeaders.sortBy(_._1)
    val snod = alloc.reserve(8 + 40 * sorted.length)
    snod.bytes(0) = 'S'; snod.bytes(1) = 'N'; snod.bytes(2) = 'O'; snod.bytes(3) = 'D'
    snod.bytes(4) = 1
    bb(snod.bytes).putShort(6, sorted.length.toShort)
    sorted.zipWithIndex.foreach { case ((n, addr), i) =>
      val b = bb(snod.bytes)
      b.putLong(8 + 40 * i, nameOffsets(n))
      b.putLong(8 + 40 * i + 8, addr)
      // cache type 0, reserved, empty scratch
    }

    // ---- group B-tree (one leaf)
    val tree = alloc.reserve(24 + 8 + 8 + 8)
    tree.bytes(0) = 'T'; tree.bytes(1) = 'R'; tree.bytes(2) = 'E'; tree.bytes(3) = 'E'
    tree.bytes(4) = 0; tree.bytes(5) = 0
    bb(tree.bytes).putShort(6, 1.toShort)
    bb(tree.bytes).putLong(8, Undef); bb(tree.bytes).putLong(16, Undef)
    bb(tree.bytes).putLong(24, 0L)                       // key 0
    bb(tree.bytes).putLong(32, snod.addr)                // child 0
    bb(tree.bytes).putLong(40, nameOffsets(sorted.last._1)) // key 1

    // ---- root group object header: attributes + symbol table msg
    val stab = new Array[Byte](16)
    bb(stab).putLong(0, tree.addr); bb(stab).putLong(8, heapHdr.addr)
    val rootMsgs = rootAttrs.map { case (n, vs) => message(0x000C, attributeMsg(n, vs)) } :+
      message(0x0011, stab)
    val rootHdr = objectHeaderV1(rootMsgs)
    val rootBlk = alloc.reserve(rootHdr.length)
    System.arraycopy(rootHdr, 0, rootBlk.bytes, 0, rootHdr.length)

    // ---- superblock v0
    val s = sup.bytes
    System.arraycopy(Magic, 0, s, 0, 8)
    // versions 0, offsets/lengths 8 bytes, leaf/internal k, flags
    s(13) = 8; s(14) = 8
    val b = bb(s)
    b.putShort(16, 4.toShort)
    b.putShort(18, 16.toShort)
    b.putLong(24, 0L)        // base address
    b.putLong(32, Undef)     // free space
    b.putLong(40, alloc.eof) // EOF (patched below — alloc done)
    b.putLong(48, Undef)     // driver info
    // root symbol table entry: name offset 0, header address, cache 0
    b.putLong(56, 0L)
    b.putLong(64, rootBlk.addr)
    val out = alloc.result()
    ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN).putLong(40, out.length.toLong)
    out
  }

  // ================================================================ read

  final case class H5Dataset(name: String, dims: Seq[Long], elemSize: Int,
                             dclass: Int, littleEndian: Boolean,
                             layoutClass: Int, dataAddr: Long, dataLen: Long,
                             chunkDims: Seq[Int], filters: Seq[Int],
                             attrs: Map[String, Array[Double]])

  final class H5File(bytes: Array[Byte], val datasets: Seq[H5Dataset],
                     val rootAttrs: Map[String, Array[Double]]) {
    def dataset(name: String): H5Dataset = datasets.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"dataset '$name' not in ${datasets.map(_.name).mkString("[", ", ", "]")}"))

    /** Read a dataset's full payload as doubles (row-major). */
    def readVar(name: String): Array[Double] = {
      val d = dataset(name)
      val raw = readRaw(d)
      val n = d.dims.product.toInt
      val out = new Array[Double](n)
      val b = ByteBuffer.wrap(raw).order(
        if (d.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      var i = 0
      while (i < n) {
        out(i) = (d.dclass, d.elemSize) match {
          case (1, 8) => b.getDouble(8 * i)
          case (1, 4) => b.getFloat(4 * i).toDouble
          case (0, 8) => b.getLong(8 * i).toDouble
          case (0, 4) => b.getInt(4 * i).toDouble
          case (0, 2) => b.getShort(2 * i).toDouble
          case (0, 1) => b.get(i).toDouble
          case (c, s) => throw new IllegalArgumentException(s"datatype class $c size $s")
        }
        i += 1
      }
      out
    }

    /** One index of the leading dimension (the record/time axis). */
    def readSlab(name: String, rec: Int): Array[Double] = {
      val d = dataset(name)
      require(d.dims.length >= 2, s"'$name' is not a record stack")
      val per = d.dims.tail.product.toInt
      val all = readVar(name)
      java.util.Arrays.copyOfRange(all, rec * per, (rec + 1) * per)
    }

    private def readRaw(d: H5Dataset): Array[Byte] = d.layoutClass match {
      case 1 => // contiguous
        java.util.Arrays.copyOfRange(bytes, d.dataAddr.toInt,
          (d.dataAddr + d.dataLen).toInt)
      case 2 => // chunked: walk the v1 chunk B-tree
        val rank = d.dims.length
        val elem = d.elemSize
        val total = new Array[Byte]((d.dims.product * elem).toInt)
        def applyFilters(comp: Array[Byte], mask: Int): Array[Byte] = {
          var cur = comp
          // pipeline applies in reverse on read: deflate first (it is
          // the last applied on write), then un-shuffle
          if (d.filters.contains(1) && (mask & (1 << d.filters.indexOf(1))) == 0) {
            val inf = new java.util.zip.Inflater()
            inf.setInput(cur)
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](1 << 16)
            while (!inf.finished()) {
              val n = inf.inflate(buf)
              if (n == 0 && inf.needsInput()) throw new IllegalArgumentException("truncated deflate chunk")
              out.write(buf, 0, n)
            }
            inf.end()
            cur = out.toByteArray
          }
          if (d.filters.contains(2) && (mask & (1 << d.filters.indexOf(2))) == 0) {
            // shuffle: bytes of rank elem grouped by byte position
            val n = cur.length / elem
            val un = new Array[Byte](cur.length)
            var i = 0
            while (i < n) {
              var j = 0
              while (j < elem) { un(i * elem + j) = cur(j * n + i); j += 1 }
              i += 1
            }
            cur = un
          }
          cur
        }
        def placeChunk(offsets: Seq[Long], data: Array[Byte]): Unit = {
          // copy the (possibly edge-clipped) chunk into the row-major whole
          val cd = d.chunkDims
          val copyDims = (0 until rank).map(i =>
            math.min(cd(i).toLong, d.dims(i) - offsets(i)).toInt)
          val strides = new Array[Long](rank) // element strides of the whole
          var st = 1L
          for (i <- (rank - 1) to 0 by -1) { strides(i) = st; st *= d.dims(i) }
          val chunkStrides = new Array[Long](rank)
          var cst = 1L
          for (i <- (rank - 1) to 0 by -1) { chunkStrides(i) = cst; cst *= cd(i) }
          // iterate all element positions of the clipped chunk except the
          // innermost dim, copying contiguous runs
          val runLen = copyDims(rank - 1) * elem
          def rec(dim: Int, srcBase: Long, dstBase: Long): Unit = {
            if (dim == rank - 1) {
              System.arraycopy(data, (srcBase * elem).toInt, total,
                (dstBase * elem).toInt, runLen)
            } else {
              var i = 0
              while (i < copyDims(dim)) {
                rec(dim + 1, srcBase + i * chunkStrides(dim),
                  dstBase + i * strides(dim))
                i += 1
              }
            }
          }
          rec(0, 0L, (0 until rank).map(i => offsets(i) * strides(i)).sum)
        }
        def walk(addr: Long): Unit = {
          val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          require(bytes(addr.toInt) == 'T' && bytes(addr.toInt + 1) == 'R', "bad chunk TREE")
          val level = bytes(addr.toInt + 5) & 0xff
          val used = b.getShort(addr.toInt + 6) & 0xffff
          val keyLen = 8 + 8 * (rank + 1)
          var p = addr.toInt + 24
          var i = 0
          while (i < used) {
            val sz = b.getInt(p); val mask = b.getInt(p + 4)
            val offs = (0 until rank).map(j => b.getLong(p + 8 + 8 * j))
            p += keyLen
            val child = b.getLong(p); p += 8
            if (level > 0) walk(child)
            else {
              val comp = java.util.Arrays.copyOfRange(bytes, child.toInt, child.toInt + sz)
              placeChunk(offs, applyFilters(comp, mask))
            }
            i += 1
          }
        }
        walk(d.dataAddr)
        total
      case c => throw new IllegalArgumentException(s"layout class $c unsupported")
    }
  }

  def decode(fileBytes: Array[Byte]): H5File = {
    require(fileBytes.length > 96 && (0 until 8).forall(i => fileBytes(i) == Magic(i)),
      "not an HDF5 file (bad signature)")
    val b = ByteBuffer.wrap(fileBytes).order(ByteOrder.LITTLE_ENDIAN)
    val supVersion = fileBytes(8) & 0xff
    val rootHeaderAddr = supVersion match {
      case 0 | 1 =>
        require(fileBytes(13) == 8 && fileBytes(14) == 8,
          s"only 8-byte offsets/lengths supported (got ${fileBytes(13)}/${fileBytes(14)})")
        val entryOff = if (supVersion == 0) 56 else 60 // v1 adds 2+2 bytes before flags
        b.getLong(entryOff + 8)
      case 2 | 3 =>
        require(fileBytes(9) == 8 && fileBytes(10) == 8,
          "only 8-byte offsets/lengths supported")
        b.getLong(28) // base(12) ext(20) eof? layout: sizes at 9,10, flags 11, base 12, ext 20, eof 28, root 36
      case v => throw new IllegalArgumentException(s"superblock version $v unsupported")
    }
    val rootAddr = if (supVersion >= 2) b.getLong(36) else rootHeaderAddr

    final case class Parsed(dims: Seq[Long], elemSize: Int, dclass: Int,
                            littleEndian: Boolean, layoutClass: Int,
                            dataAddr: Long, dataLen: Long, chunkDims: Seq[Int],
                            filters: Seq[Int], attrs: Map[String, Array[Double]],
                            stab: Option[(Long, Long)])

    def parseDatatype(at: Int): (Int, Int, Boolean) = {
      val cls = fileBytes(at) & 0x0f
      val le = (fileBytes(at + 1) & 0x01) == 0
      val size = b.getInt(at + 4)
      (cls, size, le)
    }
    def parseDataspace(at: Int): Seq[Long] = {
      val ver = fileBytes(at) & 0xff
      val rank = fileBytes(at + 1) & 0xff
      val base = if (ver == 2) at + 4 else at + 8
      (0 until rank).map(i => b.getLong(base + 8 * i))
    }
    def parseAttr(at: Int): (String, Array[Double]) = {
      val nameSize = b.getShort(at + 2) & 0xffff
      val dtSize = b.getShort(at + 4) & 0xffff
      val spSize = b.getShort(at + 6) & 0xffff
      var p = at + 8
      val rawName = new String(fileBytes, p, nameSize, "US-ASCII").takeWhile(_ != 0)
      p += pad8(nameSize)
      val (cls, esz, le) = parseDatatype(p)
      p += pad8(dtSize)
      val dims = parseDataspace(p)
      p += pad8(spSize)
      val n = if (dims.isEmpty) 1 else dims.product.toInt
      val ord = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
      val dbuf = ByteBuffer.wrap(fileBytes).order(ord)
      val vals = (0 until n).map { i =>
        (cls, esz) match {
          case (1, 8) => dbuf.getDouble(p + 8 * i)
          case (1, 4) => dbuf.getFloat(p + 4 * i).toDouble
          case (0, 8) => dbuf.getLong(p + 8 * i).toDouble
          case (0, 4) => dbuf.getInt(p + 4 * i).toDouble
          case (0, 2) => dbuf.getShort(p + 2 * i).toDouble
          case _ => Double.NaN
        }
      }.toArray
      (rawName, vals)
    }

    /** Parse a v1 object header (with continuations) at `addr`. */
    def parseHeader(addr: Long): Parsed = {
      require((fileBytes(addr.toInt) & 0xff) == 1,
        s"object header version ${fileBytes(addr.toInt)} unsupported (v1 only)")
      val nmsgs = b.getShort(addr.toInt + 2) & 0xffff
      val hsize = b.getInt(addr.toInt + 8)
      var dims: Seq[Long] = Nil
      var elemSize = 8; var dclass = 1; var le = true
      var layoutClass = -1; var dataAddr = Undef; var dataLen = 0L
      var chunkDims: Seq[Int] = Nil
      var filters: Seq[Int] = Nil
      val attrs = scala.collection.mutable.Map.empty[String, Array[Double]]
      var stab: Option[(Long, Long)] = None
      // blocks of (start, end); continuations append more
      var blocks = List((addr.toInt + 16, addr.toInt + 16 + hsize))
      var seen = 0
      while (blocks.nonEmpty && seen < nmsgs) {
        val (start, end) = blocks.head
        blocks = blocks.tail
        var p = start
        while (p + 8 <= end && seen < nmsgs) {
          val typ = b.getShort(p) & 0xffff
          val sz = b.getShort(p + 2) & 0xffff
          val body = p + 8
          typ match {
            case 0x0001 => dims = parseDataspace(body)
            case 0x0003 =>
              val (c, s2, l2) = parseDatatype(body)
              dclass = c; elemSize = s2; le = l2
            case 0x0008 =>
              val ver = fileBytes(body) & 0xff
              if (ver == 3) {
                layoutClass = fileBytes(body + 1) & 0xff
                if (layoutClass == 1) {
                  dataAddr = b.getLong(body + 2); dataLen = b.getLong(body + 10)
                } else if (layoutClass == 2) {
                  val dimy = fileBytes(body + 2) & 0xff
                  dataAddr = b.getLong(body + 3)
                  chunkDims = (0 until dimy - 1).map(i => b.getInt(body + 11 + 4 * i))
                }
              } else if (ver == 1 || ver == 2) {
                // v1/2: dimensionality, class, reserved(5), then props
                val dimy = fileBytes(body + 1) & 0xff
                layoutClass = fileBytes(body + 2) & 0xff
                var q = body + 8
                if (layoutClass != 0) { dataAddr = b.getLong(q); q += 8 }
                val ds2 = (0 until dimy).map { _ => val v = b.getInt(q); q += 4; v }
                if (layoutClass == 2) chunkDims = ds2.dropRight(1)
                if (layoutClass == 1) dataLen = b.getInt(q).toLong
              }
            case 0x000B =>
              val ver = fileBytes(body) & 0xff
              val nf = fileBytes(body + 1) & 0xff
              var q = if (ver == 1) body + 8 else body + 2
              filters = (0 until nf).map { _ =>
                val id = b.getShort(q) & 0xffff
                val hasName = ver == 1 || id >= 256
                val nameLen = if (hasName) b.getShort(q + 2) & 0xffff else 0
                val nvals = b.getShort(q + (if (hasName) 6 else 4)) & 0xffff
                q += (if (hasName) 8 else 6) +
                  (if (ver == 1) pad8(nameLen) else nameLen) + 4 * nvals
                if (ver == 1 && nvals % 2 == 1) q += 4
                id
              }
            case 0x000C =>
              val (n, vs) = parseAttr(body)
              attrs(n) = vs
            case 0x0011 =>
              stab = Some((b.getLong(body), b.getLong(body + 8)))
            case 0x0010 =>
              val cAddr = b.getLong(body); val cLen = b.getLong(body + 8)
              blocks = (cAddr.toInt, (cAddr + cLen).toInt) :: blocks
            case _ => () // skip unknown
          }
          seen += 1 // continuations count in nmsgs too
          p = body + sz
        }
      }
      Parsed(dims, elemSize, dclass, le, layoutClass, dataAddr, dataLen,
        chunkDims, filters, attrs.toMap, stab)
    }

    /** Walk a group's symbol-table B-tree, yielding (name, headerAddr). */
    def children(btreeAddr: Long, heapAddr: Long): Seq[(String, Long)] = {
      require(fileBytes(heapAddr.toInt) == 'H', "bad HEAP signature")
      val heapSeg = b.getLong(heapAddr.toInt + 24)
      def heapName(off: Long): String = {
        var e = (heapSeg + off).toInt
        while (fileBytes(e) != 0) e += 1
        new String(fileBytes, (heapSeg + off).toInt, e - (heapSeg + off).toInt, "US-ASCII")
      }
      def walkTree(addr: Long): Seq[Long] = {
        require(fileBytes(addr.toInt) == 'T', "bad group TREE signature")
        val level = fileBytes(addr.toInt + 5) & 0xff
        val used = b.getShort(addr.toInt + 6) & 0xffff
        // group keys are heap offsets (length = 8); children interleave
        val kids = (0 until used).map(i => b.getLong(addr.toInt + 24 + 8 + i * 16))
        if (level == 0) kids else kids.flatMap(walkTree)
      }
      walkTree(btreeAddr).flatMap { snodAddr =>
        require(fileBytes(snodAddr.toInt) == 'S', "bad SNOD signature")
        val n = b.getShort(snodAddr.toInt + 6) & 0xffff
        (0 until n).map { i =>
          val base = snodAddr.toInt + 8 + 40 * i
          (heapName(b.getLong(base)), b.getLong(base + 8))
        }
      }
    }

    val root = parseHeader(rootAddr)
    val out = scala.collection.mutable.ArrayBuffer.empty[H5Dataset]
    def visit(prefix: String, p: Parsed): Unit = p.stab match {
      case Some((bt, heap)) =>
        children(bt, heap).foreach { case (name, addr) =>
          val child = parseHeader(addr)
          val full = if (prefix.isEmpty) name else s"$prefix/$name"
          if (child.stab.isDefined) visit(full, child)
          else out += H5Dataset(full, child.dims, child.elemSize, child.dclass,
            child.littleEndian, child.layoutClass, child.dataAddr, child.dataLen,
            child.chunkDims, child.filters, child.attrs)
        }
      case None => ()
    }
    visit("", root)
    new H5File(fileBytes, out.toSeq, root.attrs)
  }
}
