package graft.pipeline

/** Pure-Scala baseline JPEG (JFIF) decoder, written from the public
  * ITU T.81 spec: baseline sequential DCT, 8-bit samples, Huffman
  * entropy coding, grayscale or YCbCr with 1x1/2x1/2x2 subsampling,
  * restart markers.
  *
  * The arithmetic deliberately matches the free libjpeg's default
  * integer pipeline (the JDK's ImageIO reader derives from it), so
  * decoded pixels are BIT-EXACT against javax.imageio on baseline
  * files — spec'd that way in ImageCodecSpec:
  *  - "islow" IDCT: the Loeffler-Ligtenberg-Moshovitz 13-bit
  *    fixed-point factorization,
  *  - "fancy" (triangle-filter) chroma upsampling for 2x1 / 2x2,
  *  - 16-bit fixed-point YCbCr -> RGB with the BT.601 constants.
  *
  * JPEG is the dominant wild image format; without this the
  * multimodal decode path silently fell back to byte statistics for
  * most real blobs. Progressive/arithmetic/12-bit streams throw
  * (same contract as interlaced PNG: known magic + unsupported shape
  * is an error the caller's fallback catches).
  */
object JpegCodec {
  import ImageCodec.Image

  def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff

  // zigzag index -> natural (row-major) index, T.81 figure A.6
  private val Natural: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table (T.81 annex C/F.2.2.3 DECODE). */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def symbol(len: Int, code: Int): Int = symbols(valPtr(len) + code - minCode(len))
  }

  /** MSB-first bit reader over the entropy segment with FF00
    * de-stuffing; stops (pads) at any real marker. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def reset(): Unit = { acc = 0; n = 0 }
    /** byte-align and consume an expected RSTn marker */
    def restart(): Unit = {
      reset()
      require(pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
        (b(pos + 1) & 0xff) >= 0xd0 && (b(pos + 1) & 0xff) <= 0xd7,
        "expected JPEG restart marker")
      pos += 2
    }
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length) return 0 // pad past truncated tail
        val v = b(pos) & 0xff
        if (v == 0xff) {
          val m = if (pos + 1 < b.length) b(pos + 1) & 0xff else 0xd9
          if (m == 0x00) { pos += 2; acc = 0xff; n = 8 }
          else return 0 // marker: scan over, pad with 0s (encoder pads tail bits)
        } else { pos += 1; acc = v; n = 8 }
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(count: Int): Int = {
      var v = 0; var i = 0
      while (i < count) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(h: Huff): Int = {
      var code = bit(); var len = 1
      while (code > h.maxCode(len)) {
        require(len < 16, "corrupt JPEG: huffman code over 16 bits")
        code = (code << 1) | bit(); len += 1
      }
      h.symbol(len, code)
    }
  }

  // T.81 F.2.2.1 EXTEND
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab = 0; var acTab = 0
  }

  def decode(bytes: Array[Byte]): Image = {
    require(isJpeg(bytes), "not a JPEG")
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var p = 2
    var scanAt = -1
    while (scanAt < 0) {
      require(p + 3 < bytes.length, "truncated JPEG before SOS")
      require((bytes(p) & 0xff) == 0xff, "JPEG marker expected")
      val m = bytes(p + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) { p += 2 }
      else {
        val len = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
        val seg = p + 4
        m match {
          case 0xc0 | 0xc1 => // SOF0/1: baseline (+ extended sequential, same decode)
            require((bytes(seg) & 0xff) == 8, "12-bit JPEG unsupported")
            height = ((bytes(seg + 1) & 0xff) << 8) | (bytes(seg + 2) & 0xff)
            width = ((bytes(seg + 3) & 0xff) << 8) | (bytes(seg + 4) & 0xff)
            val nc = bytes(seg + 5) & 0xff
            require(nc == 1 || nc == 3, s"unsupported JPEG component count $nc")
            comps = Array.tabulate(nc) { i =>
              val o = seg + 6 + 3 * i
              Component(bytes(o) & 0xff, (bytes(o + 1) & 0xff) >> 4,
                bytes(o + 1) & 0x0f, bytes(o + 2) & 0xff)
            }
          case 0xc2 => return decodeProgressive(bytes)
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            throw new IllegalArgumentException(f"unsupported JPEG SOF marker ff$m%02x")
          case 0xc4 => // DHT
            var q = seg
            while (q < seg + len - 2) {
              val tc = (bytes(q) & 0xff) >> 4; val th = bytes(q) & 0x0f
              val counts = Array.tabulate(16)(i => bytes(q + 1 + i) & 0xff)
              val total = counts.sum
              val syms = Array.tabulate(total)(i => bytes(q + 17 + i) & 0xff)
              val t = new Huff(counts, syms)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              q += 17 + total
            }
          case 0xdb => // DQT (zigzag order, 8- or 16-bit entries)
            var q = seg
            while (q < seg + len - 2) {
              val pq = (bytes(q) & 0xff) >> 4; val tq = bytes(q) & 0x0f
              val tab = new Array[Int](64)
              var i = 0
              while (i < 64) {
                tab(i) = if (pq == 0) bytes(q + 1 + i) & 0xff
                         else ((bytes(q + 1 + 2 * i) & 0xff) << 8) | (bytes(q + 2 + 2 * i) & 0xff)
                i += 1
              }
              quant(tq) = tab
              q += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xdd => // DRI
            restartInterval = ((bytes(seg) & 0xff) << 8) | (bytes(seg + 1) & 0xff)
          case 0xda => // SOS
            val ns = bytes(seg) & 0xff
            require(comps != null, "JPEG SOS before SOF")
            require(ns == comps.length, "JPEG multi-scan baseline unsupported")
            var i = 0
            while (i < ns) {
              val cid = bytes(seg + 1 + 2 * i) & 0xff
              val c = comps.find(_.id == cid).getOrElse(
                throw new IllegalArgumentException(s"SOS references unknown component $cid"))
              c.dcTab = (bytes(seg + 2 + 2 * i) & 0xff) >> 4
              c.acTab = bytes(seg + 2 + 2 * i) & 0x0f
              i += 1
            }
            scanAt = seg + 1 + 2 * ns + 3
          case _ => // APPn / COM / others: skip
        }
        p += 2 + len
      }
    }

    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuW = 8 * hMax; val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    // per-component padded sample planes (MCU-aligned)
    val planes = comps.map(c => new Array[Byte](mcusX * c.h * 8 * mcusY * c.v * 8))
    val strides = comps.map(c => mcusX * c.h * 8)

    val r = new BitReader(bytes, scanAt)
    val pred = new Array[Int](comps.length)
    val blk = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        r.restart()
        java.util.Arrays.fill(pred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val qt = quant(c.tq)
        require(qt != null, s"missing quant table ${c.tq}")
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // decode one block (T.81 F.2.2): DC diff + AC run/size
            java.util.Arrays.fill(blk, 0)
            val s0 = r.decode(dcTabs(c.dcTab))
            pred(ci) += extend(r.bits(s0), s0)
            blk(0) = pred(ci) * qt(0)
            var k = 1
            var eob = false
            while (!eob && k < 64) {
              val rs = r.decode(acTabs(c.acTab))
              val run = rs >> 4; val size = rs & 15
              if (size == 0) { if (run == 15) k += 16 else eob = true }
              else {
                k += run
                require(k < 64, "corrupt JPEG: AC index past 63")
                blk(Natural(k)) = extend(r.bits(size), size) * qt(k)
                k += 1
              }
            }
            idctBlock(blk, planes(ci), strides(ci),
              (my * c.v + by) * 8, (mx * c.h + bx) * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    composeImage(comps, planes, strides, width, height, hMax, vMax)
  }

  /** Progressive JPEG (SOF2, T.81 annex G): coefficients accumulate
    * across multiple scans — DC first/refinement (interleaved allowed)
    * and per-component AC scans with spectral selection (Ss..Se) +
    * successive approximation (Ah/Al, EOB-run coding) — then one
    * dequantize + IDCT pass reconstructs the planes and reuses the
    * baseline upsample/color tail. Scan semantics follow the spec's
    * G.1.2.2/G.1.2.3 decoding procedures. */
  private def decodeProgressive(bytes: Array[Byte]): Image = {
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    // per component: coefficient store (MCU-padded block grid, 64 ints
    // per block in NATURAL order), padded/actual block dims
    var coefs: Array[Array[Int]] = null
    var bw, bwA, bhA: Array[Int] = null
    var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0

    /** First marker position at or after q (skips fill bytes and
      * entropy-embedded FF00/RSTn sequences defensively). */
    def nextMarker(q0: Int): Int = {
      var q = q0
      while (q + 1 < bytes.length &&
             !((bytes(q) & 0xff) == 0xff && (bytes(q + 1) & 0xff) != 0x00 &&
               (bytes(q + 1) & 0xff) != 0xff &&
               !((bytes(q + 1) & 0xff) >= 0xd0 && (bytes(q + 1) & 0xff) <= 0xd7)))
        q += 1
      q
    }

    /** One scan's entropy-coded data; returns the position just past it. */
    def runScan(dataStart: Int, scanComps: Array[Int],
                ss: Int, se: Int, ah: Int, al: Int): Int = {
      val r = new BitReader(bytes, dataStart)
      val pred = new Array[Int](comps.length)
      var eobrun = 0
      val p1 = 1 << al
      val m1 = -1 << al

      def decodeDc(ci: Int, off: Int): Unit =
        if (ah == 0) {
          val c = comps(ci)
          val s0 = r.decode(dcTabs(c.dcTab))
          pred(ci) += extend(r.bits(s0), s0)
          coefs(ci)(off) = pred(ci) << al
        } else if (r.bit() == 1) coefs(ci)(off) |= p1

      // G.1.2.3: refine an already-nonzero coefficient by one bit
      def refine(cf: Array[Int], i: Int): Unit =
        if (r.bit() == 1 && (cf(i) & p1) == 0)
          cf(i) += (if (cf(i) >= 0) p1 else m1)

      def decodeAcFirst(ci: Int, off: Int): Unit =
        if (eobrun > 0) eobrun -= 1
        else {
          val cf = coefs(ci)
          val ac = acTabs(comps(ci).acTab)
          var k = ss
          while (k <= se) {
            val rs = r.decode(ac)
            val run = rs >> 4; val s0 = rs & 15
            if (s0 == 0) {
              if (run < 15) { eobrun = (1 << run) - 1 + r.bits(run); k = 64 }
              else k += 16
            } else {
              k += run
              require(k <= se, "corrupt JPEG: AC index past Se")
              cf(off + Natural(k)) = extend(r.bits(s0), s0) << al
              k += 1
            }
          }
        }

      def decodeAcRefine(ci: Int, off: Int): Unit = {
        val cf = coefs(ci)
        val ac = acTabs(comps(ci).acTab)
        var k = ss
        if (eobrun == 0) {
          var broke = false
          while (k <= se && !broke) {
            val rs = r.decode(ac)
            var run = rs >> 4
            var newVal = 0
            if ((rs & 15) != 0) newVal = if (r.bit() == 1) p1 else m1
            else if (run < 15) {
              eobrun = (1 << run) + (if (run > 0) r.bits(run) else 0)
              broke = true // rest of block handled by the EOB sweep below
            } // run == 15: pass over 16 zero-history coefficients
            if (!broke) {
              // advance to the run-th zero-history coef, refining
              // nonzero-history coefs passed on the way
              var placed = false
              while (k <= se && !placed) {
                val i = off + Natural(k)
                if (cf(i) != 0) refine(cf, i)
                else if (run == 0) {
                  if (newVal != 0) cf(i) = newVal
                  placed = true
                } else run -= 1
                k += 1
              }
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val i = off + Natural(k)
            if (cf(i) != 0) refine(cf, i)
            k += 1
          }
          eobrun -= 1
        }
      }

      if (scanComps.length == 1) {
        // non-interleaved: iterate the component's ACTUAL block grid
        val ci = scanComps(0)
        val (wB, hB) = (bwA(ci), bhA(ci))
        val total = wB * hB
        var b = 0
        while (b < total) {
          if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
            r.restart(); java.util.Arrays.fill(pred, 0); eobrun = 0
          }
          val off = ((b / wB) * bw(ci) + b % wB) * 64
          if (ss == 0) decodeDc(ci, off)
          else if (ah == 0) decodeAcFirst(ci, off)
          else decodeAcRefine(ci, off)
          b += 1
        }
      } else {
        // interleaved (DC scans only, per T.81): full MCU grid
        require(ss == 0 && se == 0, "interleaved progressive scan must be DC")
        var mcu = 0
        val nMcus = mcusX * mcusY
        while (mcu < nMcus) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            r.restart(); java.util.Arrays.fill(pred, 0); eobrun = 0
          }
          val mx = mcu % mcusX; val my = mcu / mcusX
          var si = 0
          while (si < scanComps.length) {
            val ci = scanComps(si); val c = comps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                decodeDc(ci, ((my * c.v + by) * bw(ci) + mx * c.h + bx) * 64)
                bx += 1
              }
              by += 1
            }
            si += 1
          }
          mcu += 1
        }
      }
      nextMarker(math.max(dataStart, r.pos))
    }

    // marker loop over the WHOLE stream (multiple SOS until EOI)
    var p = 2
    var sawEoi = false
    while (!sawEoi && p + 1 < bytes.length) {
      require((bytes(p) & 0xff) == 0xff, "JPEG marker expected")
      val m = bytes(p + 1) & 0xff
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) p += 2
      else if (m == 0xd9) sawEoi = true
      else {
        val len = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
        val seg = p + 4
        m match {
          case 0xc2 => // SOF2
            require((bytes(seg) & 0xff) == 8, "12-bit JPEG unsupported")
            height = ((bytes(seg + 1) & 0xff) << 8) | (bytes(seg + 2) & 0xff)
            width = ((bytes(seg + 3) & 0xff) << 8) | (bytes(seg + 4) & 0xff)
            val nc = bytes(seg + 5) & 0xff
            require(nc == 1 || nc == 3, s"unsupported JPEG component count $nc")
            comps = Array.tabulate(nc) { i =>
              val o = seg + 6 + 3 * i
              Component(bytes(o) & 0xff, (bytes(o + 1) & 0xff) >> 4,
                bytes(o + 1) & 0x0f, bytes(o + 2) & 0xff)
            }
            require(comps.forall(c => c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4),
              "corrupt JPEG: sampling factors outside 1..4")
            hMax = comps.map(_.h).max; vMax = comps.map(_.v).max
            mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            bw = comps.map(c => mcusX * c.h)
            bwA = comps.map(c => ((width * c.h + hMax - 1) / hMax + 7) / 8)
            bhA = comps.map(c => ((height * c.v + vMax - 1) / vMax + 7) / 8)
            coefs = comps.map(c => new Array[Int](mcusX * c.h * mcusY * c.v * 64))
          case 0xc4 => // DHT
            var q = seg
            while (q < seg + len - 2) {
              val tc = (bytes(q) & 0xff) >> 4; val th = bytes(q) & 0x0f
              val counts = Array.tabulate(16)(i => bytes(q + 1 + i) & 0xff)
              val total = counts.sum
              val syms = Array.tabulate(total)(i => bytes(q + 17 + i) & 0xff)
              val t = new Huff(counts, syms)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              q += 17 + total
            }
          case 0xdb => // DQT
            var q = seg
            while (q < seg + len - 2) {
              val pq = (bytes(q) & 0xff) >> 4; val tq = bytes(q) & 0x0f
              val tab = new Array[Int](64)
              var i = 0
              while (i < 64) {
                tab(i) = if (pq == 0) bytes(q + 1 + i) & 0xff
                         else ((bytes(q + 1 + 2 * i) & 0xff) << 8) | (bytes(q + 2 + 2 * i) & 0xff)
                i += 1
              }
              quant(tq) = tab
              q += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xdd => // DRI
            restartInterval = ((bytes(seg) & 0xff) << 8) | (bytes(seg + 1) & 0xff)
          case 0xda => // SOS
            require(comps != null, "JPEG SOS before SOF2")
            val ns = bytes(seg) & 0xff
            val scanComps = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cid = bytes(seg + 1 + 2 * i) & 0xff
              val ci = comps.indexWhere(_.id == cid)
              require(ci >= 0, s"SOS references unknown component $cid")
              comps(ci).dcTab = (bytes(seg + 2 + 2 * i) & 0xff) >> 4
              comps(ci).acTab = bytes(seg + 2 + 2 * i) & 0x0f
              scanComps(i) = ci
              i += 1
            }
            val ss = bytes(seg + 1 + 2 * ns) & 0xff
            val se = bytes(seg + 2 + 2 * ns) & 0xff
            val ahal = bytes(seg + 3 + 2 * ns) & 0xff
            p = runScan(seg + 4 + 2 * ns, scanComps, ss, se, ahal >> 4, ahal & 15)
          case _ => // APPn / COM: skip
        }
        if (m != 0xda) p += 2 + len
      }
    }

    // dequantize + IDCT every actual block into the sample planes
    val planes = comps.map(c => new Array[Byte](mcusX * c.h * 8 * mcusY * c.v * 8))
    val strides = comps.map(c => mcusX * c.h * 8)
    val blk = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val qt = quant(comps(ci).tq)
      require(qt != null, s"missing quant table ${comps(ci).tq}")
      val cf = coefs(ci)
      var by = 0
      while (by < bhA(ci)) {
        var bx = 0
        while (bx < bwA(ci)) {
          val off = (by * bw(ci) + bx) * 64
          var k = 0
          while (k < 64) { val nk = Natural(k); blk(nk) = cf(off + nk) * qt(k); k += 1 }
          idctBlock(blk, planes(ci), strides(ci), by * 8, bx * 8)
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    composeImage(comps, planes, strides, width, height, hMax, vMax)
  }

  /** Shared tail of both decode paths: upsample each component plane
    * to full resolution and color-convert (gray or YCbCr). */
  private def composeImage(comps: Array[Component], planes: Array[Array[Byte]],
                           strides: Array[Int], width: Int, height: Int,
                           hMax: Int, vMax: Int): Image = {
    val out = new Array[Int](width * height)
    if (comps.length == 1) {
      val pl = planes(0); val st = strides(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = pl(y * st + x) & 0xff
          out(y * width + x) = 0xff000000 | (g << 16) | (g << 8) | g
          x += 1
        }
        y += 1
      }
    } else {
      val full = comps.indices.map { i =>
        val c = comps(i)
        val dw = (width * c.h + hMax - 1) / hMax
        val dh = (height * c.v + vMax - 1) / vMax
        upsample(planes(i), strides(i), dw, dh, hMax / c.h, vMax / c.v, width, height)
      }
      val (yp, cb, cr) = (full(0), full(1), full(2))
      var i = 0
      while (i < width * height) {
        out(i) = yccToArgb(yp(i) & 0xff, cb(i) & 0xff, cr(i) & 0xff)
        i += 1
      }
    }
    Image(width, height, out)
  }

  // ----------------------------------------------------------------
  // IDCT: 13-bit fixed-point Loeffler-Ligtenberg-Moshovitz ("islow")
  // ----------------------------------------------------------------
  private final val ConstBits = 13
  private final val Pass1Bits = 2
  private final val F_0_298 = 2446
  private final val F_0_390 = 3196
  private final val F_0_541 = 4433
  private final val F_0_765 = 6270
  private final val F_0_899 = 7373
  private final val F_1_175 = 9633
  private final val F_1_501 = 12299
  private final val F_1_847 = 15137
  private final val F_1_961 = 16069
  private final val F_2_053 = 16819
  private final val F_2_562 = 20995
  private final val F_3_072 = 25172

  private def descale(x: Long, n: Int): Int = ((x + (1L << (n - 1))) >> n).toInt
  private def clampSample(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  /** Inverse DCT of one dequantized 8x8 block into a sample plane at
    * (row0, col0); samples are level-shifted (+128) and clamped. */
  private def idctBlock(in: Array[Int], outPlane: Array[Byte], stride: Int,
                        row0: Int, col0: Int): Unit = {
    val ws = new Array[Int](64)
    // pass 1: columns
    var c = 0
    while (c < 8) {
      if (in(8 + c) == 0 && in(16 + c) == 0 && in(24 + c) == 0 && in(32 + c) == 0 &&
          in(40 + c) == 0 && in(48 + c) == 0 && in(56 + c) == 0) {
        val dc = in(c) << Pass1Bits
        var i = 0
        while (i < 8) { ws(8 * i + c) = dc; i += 1 }
      } else {
        var z2 = in(16 + c).toLong; var z3 = in(48 + c).toLong
        var z1 = (z2 + z3) * F_0_541
        val t2 = z1 - z3 * F_1_847
        val t3 = z1 + z2 * F_0_765
        z2 = in(c).toLong; z3 = in(32 + c).toLong
        val t0 = (z2 + z3) << ConstBits
        val t1 = (z2 - z3) << ConstBits
        val t10 = t0 + t3; val t13 = t0 - t3; val t11 = t1 + t2; val t12 = t1 - t2
        var a0 = in(56 + c).toLong; var a1 = in(40 + c).toLong
        var a2 = in(24 + c).toLong; var a3 = in(8 + c).toLong
        z1 = a0 + a3; z2 = a1 + a2; z3 = a0 + a2; var z4 = a1 + a3
        val z5 = (z3 + z4) * F_1_175
        a0 *= F_0_298; a1 *= F_2_053; a2 *= F_3_072; a3 *= F_1_501
        z1 *= -F_0_899; z2 *= -F_2_562; z3 *= -F_1_961; z4 *= -F_0_390
        z3 += z5; z4 += z5
        a0 += z1 + z3; a1 += z2 + z4; a2 += z2 + z3; a3 += z1 + z4
        ws(c)      = descale(t10 + a3, ConstBits - Pass1Bits)
        ws(56 + c) = descale(t10 - a3, ConstBits - Pass1Bits)
        ws(8 + c)  = descale(t11 + a2, ConstBits - Pass1Bits)
        ws(48 + c) = descale(t11 - a2, ConstBits - Pass1Bits)
        ws(16 + c) = descale(t12 + a1, ConstBits - Pass1Bits)
        ws(40 + c) = descale(t12 - a1, ConstBits - Pass1Bits)
        ws(24 + c) = descale(t13 + a0, ConstBits - Pass1Bits)
        ws(32 + c) = descale(t13 - a0, ConstBits - Pass1Bits)
      }
      c += 1
    }
    // pass 2: rows, final descale + level shift
    var rI = 0
    while (rI < 8) {
      val o = (row0 + rI) * stride + col0
      val b = 8 * rI
      var z2 = ws(b + 2).toLong; var z3 = ws(b + 6).toLong
      var z1 = (z2 + z3) * F_0_541
      val t2 = z1 - z3 * F_1_847
      val t3 = z1 + z2 * F_0_765
      val t0 = (ws(b).toLong + ws(b + 4)) << ConstBits
      val t1 = (ws(b).toLong - ws(b + 4)) << ConstBits
      val t10 = t0 + t3; val t13 = t0 - t3; val t11 = t1 + t2; val t12 = t1 - t2
      var a0 = ws(b + 7).toLong; var a1 = ws(b + 5).toLong
      var a2 = ws(b + 3).toLong; var a3 = ws(b + 1).toLong
      z1 = a0 + a3; z2 = a1 + a2; z3 = a0 + a2; var z4 = a1 + a3
      val z5 = (z3 + z4) * F_1_175
      a0 *= F_0_298; a1 *= F_2_053; a2 *= F_3_072; a3 *= F_1_501
      z1 *= -F_0_899; z2 *= -F_2_562; z3 *= -F_1_961; z4 *= -F_0_390
      z3 += z5; z4 += z5
      a0 += z1 + z3; a1 += z2 + z4; a2 += z2 + z3; a3 += z1 + z4
      val fin = ConstBits + Pass1Bits + 3
      outPlane(o)     = clampSample(descale(t10 + a3, fin) + 128)
      outPlane(o + 7) = clampSample(descale(t10 - a3, fin) + 128)
      outPlane(o + 1) = clampSample(descale(t11 + a2, fin) + 128)
      outPlane(o + 6) = clampSample(descale(t11 - a2, fin) + 128)
      outPlane(o + 2) = clampSample(descale(t12 + a1, fin) + 128)
      outPlane(o + 5) = clampSample(descale(t12 - a1, fin) + 128)
      outPlane(o + 3) = clampSample(descale(t13 + a0, fin) + 128)
      outPlane(o + 4) = clampSample(descale(t13 - a0, fin) + 128)
      rI += 1
    }
  }

  // ----------------------------------------------------------------
  // Upsampling ("fancy" triangle filter for the 2x cases)
  // ----------------------------------------------------------------
  /** Upsample a downsampled plane (dw x dh valid samples in a padded
    * plane) by (fx, fy) to the full (w x h) image grid. */
  private def upsample(plane: Array[Byte], stride: Int, dw: Int, dh: Int,
                       fx: Int, fy: Int, w: Int, h: Int): Array[Byte] = {
    if (fx == 1 && fy == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(plane, y * stride, out, y * w, w)
        y += 1
      }
      out
    } else if (fx == 2 && fy == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        h2v1Row(plane, y * stride, dw, out, y * w, w)
        y += 1
      }
      out
    } else if (fx == 2 && fy == 2) {
      val out = new Array[Byte](w * h)
      var oy = 0
      while (oy < h) {
        // output row oy blends input row iy (weight 3) with its
        // nearer vertical neighbor (weight 1); edges replicate
        val iy = oy >> 1
        val near = if ((oy & 1) == 0) math.max(iy - 1, 0) else math.min(iy + 1, dh - 1)
        h2v2Row(plane, iy * stride, near * stride, dw, out, oy * w, w)
        oy += 1
      }
      out
    } else {
      // generic integer replication (uncommon ratios)
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val sy = math.min(y / fy, dh - 1)
        var x = 0
        while (x < w) {
          out(y * w + x) = plane(sy * stride + math.min(x / fx, dw - 1))
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** libjpeg h2v1 fancy: out[2i] = (3*in[i] + in[i-1] + 1) >> 2,
    * out[2i+1] = (3*in[i] + in[i+1] + 2) >> 2, edge cols replicate. */
  private def h2v1Row(in: Array[Byte], inOff: Int, dw: Int,
                      out: Array[Byte], outOff: Int, w: Int): Unit = {
    var i = 0
    var o = 0
    while (i < dw && o < w) {
      val v = in(inOff + i) & 0xff
      val left = if (i > 0) in(inOff + i - 1) & 0xff else v
      val right = if (i < dw - 1) in(inOff + i + 1) & 0xff else v
      val e = if (i == 0) v else (v * 3 + left + 1) >> 2
      out(outOff + o) = e.toByte
      if (o + 1 < w) {
        val odd = if (i == dw - 1) v else (v * 3 + right + 2) >> 2
        out(outOff + o + 1) = odd.toByte
      }
      i += 1; o += 2
    }
  }

  /** libjpeg h2v2 fancy: colsum = 3*this_row + near_row (per input
    * col), then horizontally out[2i] = (3*colsum + lastcolsum + 8)>>4,
    * out[2i+1] = (3*colsum + nextcolsum + 7)>>4; edges use
    * (colsum*4 + 8)>>4 / (colsum*4 + 7)>>4. */
  private def h2v2Row(in: Array[Byte], rowOff: Int, nearOff: Int, dw: Int,
                      out: Array[Byte], outOff: Int, w: Int): Unit = {
    def colsum(i: Int): Int = 3 * (in(rowOff + i) & 0xff) + (in(nearOff + i) & 0xff)
    var i = 0
    var o = 0
    var last = colsum(0)
    var cur = last
    while (i < dw && o < w) {
      val next = if (i < dw - 1) colsum(i + 1) else cur
      val e = if (i == 0) (cur * 4 + 8) >> 4 else (cur * 3 + last + 8) >> 4
      out(outOff + o) = e.toByte
      if (o + 1 < w) {
        val odd = if (i == dw - 1) (cur * 4 + 7) >> 4 else (cur * 3 + next + 7) >> 4
        out(outOff + o + 1) = odd.toByte
      }
      last = cur; cur = next
      i += 1; o += 2
    }
  }

  // ----------------------------------------------------------------
  // YCbCr -> RGB (libjpeg 16-bit fixed point, BT.601)
  // ----------------------------------------------------------------
  private final val ScaleBits = 16
  private final val OneHalf = 1 << (ScaleBits - 1)
  private def fix(x: Double): Long = (x * (1L << ScaleBits) + 0.5).toLong
  private val crR = Array.tabulate(256)(i => ((fix(1.40200) * (i - 128) + OneHalf) >> ScaleBits).toInt)
  private val cbB = Array.tabulate(256)(i => ((fix(1.77200) * (i - 128) + OneHalf) >> ScaleBits).toInt)
  private val crG = Array.tabulate(256)(i => -fix(0.71414) * (i - 128))
  private val cbG = Array.tabulate(256)(i => -fix(0.34414) * (i - 128) + OneHalf)

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def yccToArgb(y: Int, cb: Int, cr: Int): Int = {
    val r = clamp255(y + crR(cr))
    val g = clamp255(y + ((cbG(cb) + crG(cr)) >> ScaleBits).toInt)
    val b = clamp255(y + cbB(cb))
    0xff000000 | (r << 16) | (g << 8) | b
  }
}
