package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.vector.GeoJson

/** Zarr v2 scene codec — the cloud-native chunked-array format a
  * post-2020 climate/EO user reaches for after NetCDF-4 (the reference
  * reads it through GDAL/rasterio, rasterio.py:43 `rasterio.open`;
  * graft decodes the gridded subset natively from the public spec,
  * https://zarr-specs.readthedocs.io v2).
  *
  * A Zarr store is a flat key→bytes map: `.zgroup`/`.zattrs` JSON at
  * the group root, one `.zarray` JSON per array, and one object per
  * chunk (keys are grid indices joined by `.`, e.g. `v/0.1`). That
  * maps one-to-one onto DataFrame rows `(key STRING, value BINARY)` —
  * exactly how the store lays out on object storage, one object per
  * chunk — so scenes travel as row groups, never driver bytes.
  *
  * Subset implemented (the regular-grid raster case, mirroring
  * [[NetCdf4]]'s conventions so all three formats ingest to the same
  * UntiledRaster rows):
  *  - dtypes `<f8` (data, coordinates) and `<i8` (time), C order;
  *  - compressor `{"id":"zlib"}` (numcodecs Zlib = RFC 1950 stream —
  *    `java.util.zip.Deflater`'s native format) or `null` (raw);
  *  - edge chunks stored PADDED to the full chunk shape with
  *    `fill_value`, per spec — decode unpads against `shape`;
  *  - data variable dims (y, x) or (time, y, x), row-major y-down;
  *  - extent from `.zattrs` xmin/ymin/xmax/ymax when present, else
  *    derived from the x/y coordinate arrays' cell centers;
  *  - `time` is a 1-D `<i8` coordinate array of epoch seconds.
  *
  * Default chunking splits each spatial dim in two (ceil halves), so
  * every encoded scene exercises the real multi-chunk assembly + edge
  * padding path, not a one-chunk shortcut.
  *
  * Scale shape: per-scene encode/decode inside Dataset.map/mapGroups —
  * the only shuffle is grouping a scene's own chunk rows back
  * together, the same keyed gather every multi-object ingest needs.
  */
object Zarr {

  // ------------------------------------------------------------ arrays

  private def zarrayJson(shape: Seq[Int], chunks: Seq[Int], dtype: String): String = {
    def arr(xs: Seq[Int]) = xs.mkString("[", ",", "]")
    s"""{"zarr_format":2,"shape":${arr(shape)},"chunks":${arr(chunks)},""" +
      s""""dtype":"$dtype","compressor":{"id":"zlib","level":6},""" +
      s""""fill_value":0,"filters":null,"order":"C"}"""
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    // growable sink: stored-block overhead on incompressible chunks
    // can exceed any fixed headroom (the GeoTiff encoder's pattern)
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(z: Array[Byte], outLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(z)
    val out = new Array[Byte](outLen)
    var n = 0
    while (n < outLen && !inf.finished()) {
      val got = inf.inflate(out, n, outLen - n)
      // a truncated/corrupt stream stalls with 0 bytes and
      // finished() false — fail loudly instead of spinning
      require(got > 0 || inf.finished(), s"truncated zarr chunk ($n/$outLen bytes)")
      n += got
    }
    inf.end()
    require(n == outLen, s"zarr chunk inflated to $n bytes, expected $outLen")
    out
  }

  /** Encode one array (dtype `<f8` or `<i8`; `vals` carries the i8
    * values exactly when integral) as `.zarray` + padded zlib chunks.
    * Keys are relative to the array node (caller prefixes `name/`). */
  private[raster] def writeArray(shape: Seq[Int], chunks: Seq[Int], dtype: String,
                         vals: Array[Double]): Seq[(String, Array[Byte])] = {
    require(shape.length == chunks.length && shape.nonEmpty, "rank mismatch")
    require(vals.length == shape.product, "vals must fill shape (C order)")
    val rank = shape.length
    val grid = shape.indices.map(i => (shape(i) + chunks(i) - 1) / chunks(i))
    // strides of the SOURCE array (C order)
    val stride = Array.fill(rank)(1)
    for (i <- rank - 2 to 0 by -1) stride(i) = stride(i + 1) * shape(i + 1)
    val chunkElems = chunks.product
    val out = Seq.newBuilder[(String, Array[Byte])]
    out += (".zarray" -> zarrayJson(shape, chunks, dtype).getBytes("UTF-8"))
    def emit(idx: Array[Int]): Unit = {
      val buf = java.nio.ByteBuffer.allocate(chunkElems * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // walk the chunk C-order; source index or fill (0) past the edge
      val pos = new Array[Int](rank)
      var k = 0
      while (k < chunkElems) {
        var inShape = true
        var src = 0
        var i = 0
        while (i < rank) {
          val g = idx(i) * chunks(i) + pos(i)
          if (g >= shape(i)) inShape = false else src += g * stride(i)
          i += 1
        }
        val v = if (inShape) vals(src) else 0.0
        if (dtype == "<i8") buf.putLong(v.toLong) else buf.putDouble(v)
        // increment pos (C order: last dim fastest)
        var j = rank - 1
        while (j >= 0) {
          pos(j) += 1
          if (pos(j) < chunks(j)) j = -1 else { pos(j) = 0; j -= 1 }
        }
        k += 1
      }
      out += (idx.mkString(".") -> deflate(buf.array()))
    }
    def rec(i: Int, idx: Array[Int]): Unit =
      if (i == rank) emit(idx.clone())
      else (0 until grid(i)).foreach { g => idx(i) = g; rec(i + 1, idx) }
    rec(0, new Array[Int](rank))
    out.result()
  }

  /** Decode one array from its node entries (keys relative to the
    * node). Returns (shape, values C-order as doubles — `<i8` values
    * are integral doubles, the [[Hdf5.H5File.readVar]] convention). */
  private[raster] def readArray(node: Map[String, Array[Byte]]): (Seq[Int], Array[Double]) = {
    val meta = GeoJson.parseJsonValue(
      new String(node.getOrElse(".zarray",
        throw new IllegalArgumentException("missing .zarray")), "UTF-8"))
      .asInstanceOf[Map[String, Any]]
    require(meta("zarr_format").asInstanceOf[Double].toInt == 2, "zarr v2 only")
    require(meta.get("order").forall(_ == "C"), "C order only")
    require(meta.get("filters").forall(_ == null), "filters unsupported")
    val shape = meta("shape").asInstanceOf[Seq[Any]].map(_.asInstanceOf[Double].toInt)
    val chunks = meta("chunks").asInstanceOf[Seq[Any]].map(_.asInstanceOf[Double].toInt)
    val dtype = meta("dtype").asInstanceOf[String]
    require(dtype == "<f8" || dtype == "<i8", s"dtype $dtype unsupported (<f8/<i8)")
    val zlib = meta.get("compressor") match {
      case Some(null) => false
      case Some(c: Map[_, _]) =>
        val id = c.asInstanceOf[Map[String, Any]]("id")
        require(id == "zlib", s"compressor $id unsupported (zlib/null)")
        true
      case _ => false
    }
    // v2 allows "/" as the chunk-key dimension separator (the layout
    // most object-store writers use); honor the declared one, accept
    // either when undeclared
    val sep = meta.get("dimension_separator") match {
      case Some("/") => '/'
      case Some(".") | None => '.'
      case Some(s) => throw new IllegalArgumentException(s"dimension_separator $s")
    }
    val rank = shape.length
    val chunkElems = chunks.product
    val stride = Array.fill(rank)(1)
    for (i <- rank - 2 to 0 by -1) stride(i) = stride(i + 1) * shape(i + 1)
    // per spec a MISSING chunk object means "entirely fill_value"
    // (zarr-python's write_empty_chunks=False default omits them);
    // JSON null fill reads as NaN — the float-nodata convention
    val fill = meta.get("fill_value") match {
      case Some(d: java.lang.Double) => d.doubleValue
      case Some(null) | None => Double.NaN
      case Some(o) => throw new IllegalArgumentException(s"fill_value $o")
    }
    val vals = Array.fill(shape.product)(fill)
    node.foreach { case (key, bytes) =>
      if (key != ".zarray" && key != ".zattrs") {
        val idx = key.split(sep).map(_.toInt)
        require(idx.length == rank, s"chunk key $key rank mismatch")
        val raw = if (zlib) inflate(bytes, chunkElems * 8) else bytes
        require(raw.length == chunkElems * 8, s"chunk $key wrong size")
        val buf = java.nio.ByteBuffer.wrap(raw)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val pos = new Array[Int](rank)
        var k = 0
        while (k < chunkElems) {
          val v = if (dtype == "<i8") buf.getLong(k * 8).toDouble
                  else buf.getDouble(k * 8)
          var inShape = true
          var dst = 0
          var i = 0
          while (i < rank) {
            val g = idx(i) * chunks(i) + pos(i)
            if (g >= shape(i)) inShape = false else dst += g * stride(i)
            i += 1
          }
          if (inShape) vals(dst) = v
          var j = rank - 1
          while (j >= 0) {
            pos(j) += 1
            if (pos(j) < chunks(j)) j = -1 else { pos(j) = 0; j -= 1 }
          }
          k += 1
        }
      }
    }
    (shape, vals)
  }

  // ------------------------------------------------------------ groups

  private def attrsJson(xmin: Double, ymin: Double, xmax: Double, ymax: Double): String =
    s"""{"xmin":$xmin,"ymin":$ymin,"xmax":$xmax,"ymax":$ymax}"""

  private def halves(n: Int): Int = math.max(1, (n + 1) / 2)

  /** One 2D grid (dims y, x) + coordinate arrays + extent `.zattrs` —
    * the [[NetCdf4.encodeGrid]] twin as store entries. */
  def encodeGrid(cells: Array[Double], cols: Int, rows: Int,
                 xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                 varName: String = "v"): Seq[(String, Array[Byte])] = {
    require(cells.length == cols * rows, "cells must be cols*rows row-major")
    val cw = (xmax - xmin) / cols; val ch = (ymax - ymin) / rows
    val ys = Array.tabulate(rows)(r => ymax - (r + 0.5) * ch)
    val xs = Array.tabulate(cols)(c => xmin + (c + 0.5) * cw)
    Seq(
      ".zgroup" -> """{"zarr_format":2}""".getBytes("UTF-8"),
      ".zattrs" -> attrsJson(xmin, ymin, xmax, ymax).getBytes("UTF-8")) ++
      writeArray(Seq(rows), Seq(rows), "<f8", ys).map { case (k, v) => (s"y/$k", v) } ++
      writeArray(Seq(cols), Seq(cols), "<f8", xs).map { case (k, v) => (s"x/$k", v) } ++
      writeArray(Seq(rows, cols), Seq(halves(rows), halves(cols)), "<f8", cells)
        .map { case (k, v) => (s"$varName/$k", v) }
  }

  /** Record-dimension twin of [[NetCdf4.encodeScenes]]: var (time, y,
    * x) chunked one record per chunk slab (×2×2 spatial), `time` a
    * `<i8` coordinate of epoch seconds. */
  def encodeScenes(instants: Array[Long], slabs: Array[Array[Double]],
                   cols: Int, rows: Int,
                   xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                   varName: String = "v"): Seq[(String, Array[Byte])] = {
    require(instants.length == slabs.length && slabs.forall(_.length == cols * rows),
      "one cols*rows slab per instant")
    Seq(
      ".zgroup" -> """{"zarr_format":2}""".getBytes("UTF-8"),
      ".zattrs" -> attrsJson(xmin, ymin, xmax, ymax).getBytes("UTF-8")) ++
      writeArray(Seq(instants.length), Seq(instants.length), "<i8",
        instants.map(_.toDouble)).map { case (k, v) => (s"time/$k", v) } ++
      writeArray(Seq(instants.length, rows, cols),
        Seq(1, halves(rows), halves(cols)), "<f8", slabs.flatten)
        .map { case (k, v) => (s"$varName/$k", v) }
  }

  private[raster] def nodeOf(entries: Map[String, Array[Byte]], name: String): Map[String, Array[Byte]] =
    entries.collect { case (k, v) if k.startsWith(name + "/") =>
      (k.drop(name.length + 1), v) }

  private[raster] def extentOf(entries: Map[String, Array[Byte]]): (Double, Double, Double, Double) = {
    entries.get(".zattrs").flatMap { bytes =>
      val a = GeoJson.parseJsonValue(new String(bytes, "UTF-8"))
        .asInstanceOf[Map[String, Any]]
      if (Seq("xmin", "ymin", "xmax", "ymax").forall(a.contains))
        Some((a("xmin").asInstanceOf[Double], a("ymin").asInstanceOf[Double],
          a("xmax").asInstanceOf[Double], a("ymax").asInstanceOf[Double]))
      else None
    }.getOrElse {
      val xs = readArray(nodeOf(entries, "x"))._2
      val ys = readArray(nodeOf(entries, "y"))._2
      // abs on BOTH axes: external stores may order either coordinate
      // descending, and a signed cw would shrink the derived extent
      val cw = if (xs.length > 1) math.abs(xs(1) - xs(0)) else 1.0
      val ch = if (ys.length > 1) math.abs(ys(0) - ys(1)) else 1.0
      (xs.min - cw / 2, ys.min - ch / 2, xs.max + cw / 2, ys.max + ch / 2)
    }
  }

  /** Zarr store rows → [[UntiledRaster]] — the [[NetCdf4.fromNetCdf4]]
    * twin. `stores` columns: (scene_id, key, value) — one row per
    * store object; a scene's chunks gather with one keyed shuffle. */
  def fromZarr(stores: DataFrame, varName: String = "v"): UntiledRaster = {
    val spark = stores.sparkSession
    import spark.implicits._
    val scenes = stores.select(col("scene_id"), col("key"), col("value"))
      .as[(Long, String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val entries = it.map { case (_, k, v) => (k, v) }.toMap
        val (xmin, ymin, xmax, ymax) = extentOf(entries)
        val (shape, cells) = readArray(nodeOf(entries, varName))
        require(shape.length == 2, s"'$varName' must be 2D (y, x)")
        (id, xmin, ymin, xmax, ymax, shape(1), shape(0), cells.toSeq)
      }
      .toDF("scene_id", "xmin", "ymin", "xmax", "ymax", "cols", "rows", "cells")
    UntiledRaster(scenes)
  }

  /** Temporal twin: every index of the leading `time` dimension
    * becomes one scene stamped with its epoch-second instant. */
  def fromZarrTemporal(stores: DataFrame, varName: String = "v"): UntiledRaster = {
    val spark = stores.sparkSession
    import spark.implicits._
    val scenes = stores.select(col("scene_id"), col("key"), col("value"))
      .as[(Long, String, Array[Byte])]
      .groupByKey(_._1)
      .flatMapGroups { (id, it) =>
        val entries = it.map { case (_, k, v) => (k, v) }.toMap
        val (xmin, ymin, xmax, ymax) = extentOf(entries)
        val times = readArray(nodeOf(entries, "time"))._2
        val (shape, all) = readArray(nodeOf(entries, varName))
        require(shape.length == 3, s"'$varName' must be 3D (time, y, x)")
        val per = shape(1) * shape(2)
        times.indices.map { r =>
          val slab = java.util.Arrays.copyOfRange(all, r * per, (r + 1) * per)
          (id * 65536 + r, xmin, ymin, xmax, ymax, shape(2), shape(1),
            slab.toSeq, times(r).toLong)
        }
      }
      .toDF("scene_id", "xmin", "ymin", "xmax", "ymax", "cols", "rows", "cells", "instant")
    UntiledRaster(scenes)
  }

  /** Layer → one Zarr store per tile as rows (col, row, key, value) —
    * the [[NetCdf4.toNetCdf4]] twin; one output row per store object. */
  def toZarr(layer: RasterLayer): DataFrame = {
    val spark = layer.df.sparkSession
    import spark.implicits._
    val meta = layer.meta
    val tl = meta.layout.tileLayout
    val ext = meta.layout.extent
    val cw = meta.layout.cellWidth; val chh = meta.layout.cellHeight
    layer.df.select(col("col"), col("row"), col("tile"))
      .as[(Int, Int, Seq[Double])]
      .flatMap { case (c, r, tile) =>
        val xmin = ext.xmin + c.toLong * tl.tileCols * cw
        val ymax = ext.ymax - r.toLong * tl.tileRows * chh
        encodeGrid(tile.toArray, tl.tileCols, tl.tileRows,
          xmin, ymax - tl.tileRows * chh, xmin + tl.tileCols * cw, ymax)
          .map { case (k, v) => (c, r, k, v) }
      }
      .toDF("col", "row", "key", "value")
  }
}
