package graft.core

/** Compact Hilbert index — Hamilton's published algorithm ("Compact
  * Hilbert Indices", Hamilton, Dalhousie CS-2006-07; Hamilton &
  * Rau-Chaplin, IPL 2008): the Hilbert space-filling curve generalized
  * to grids with UNEQUAL per-dimension bit widths, visiting exactly the
  * 2^(Σm_j) in-box cells in full-curve order. This is the curve
  * geotrellis reaches through the uzaygezen library (Apache-2, itself
  * an implementation of the same report) for its `hilbert` key-index
  * type — the reference stores/reads hilbert-indexed layers via
  * geopyspark catalog.py:210 `write` (IndexingMethod HILBERT) /
  * io/ValueReaderWrapper.scala:1.
  *
  * Formulation (the report's notation; all masks are n-bit words,
  * dimension j is bit j — dimension 0 the LSB):
  *  - gray code gc(i) = i ^ (i >> 1), inverse by prefix XOR;
  *  - entry point e(w) = 0 if w = 0 else gc(2·⌊(w−1)/2⌋);
  *  - intra-subcube direction d(w): 0 if w = 0; tsb(w−1) mod n for
  *    even w; tsb(w) mod n for odd w (tsb = trailing set bits);
  *  - coordinate transform T_{(e,d)}(b) = ror(b ^ e, d+1);
  *  - gray-code rank gcr(w, μ) = the bits of w at μ's set positions,
  *    packed MSB-first (Theorem 2.4 of the report);
  *  - per level i = m−1 … 0: μ = the mask of dimensions with m_j > i
  *    (rotated into the transformed frame), l = the level's coordinate
  *    bits, w = gc⁻¹(T(l)), and gcr(w, μ) appends ‖μ‖ bits to the
  *    index; then e ^= rol(e(w), d+1), d = (d + d(w) + 1) mod n.
  * Initial state (0, 0, 2 mod n) — validated by CompactHilbertSpec:
  * the equal-order 2-D specialization reproduces the classic
  * Lam–Shapiro curve ([[ZIndex.hilbert]]) bit-for-bit at every tested
  * order, and the unequal-width index is bijective onto [0, 2^(Σm_j))
  * and order-isomorphic to the standard index (the report's defining
  * property). Byte parity with the uzaygezen jar itself cannot be
  * executed in this sandbox (no lib, no egress) — asserted by shared
  * published algorithm, documented in README's migration notes.
  */
object CompactHilbert {

  private def gc(i: Long): Long = i ^ (i >>> 1)

  private def gcInverse(g: Long, bits: Int): Long = {
    var i = g
    var j = 1
    while (j < bits) { i ^= g >>> j; j += 1 }
    i
  }

  private def rotr(b: Long, k: Int, n: Int): Long = {
    val kk = ((k % n) + n) % n
    ((b >>> kk) | (b << (n - kk))) & ((1L << n) - 1)
  }

  private def rotl(b: Long, k: Int, n: Int): Long = rotr(b, n - (k % n), n)

  /** Trailing set bits of w. */
  private def tsb(w: Long): Int = java.lang.Long.numberOfTrailingZeros(~w)

  private def entry(w: Long): Long = if (w == 0) 0L else gc(2L * ((w - 1L) / 2L))

  private def direction(w: Long, n: Int): Int =
    if (w == 0) 0
    else if ((w & 1L) == 0) tsb(w - 1) % n
    else tsb(w) % n

  /** The compact Hilbert index of point `p` on the grid with `ms(j)`
    * bits in dimension j. Bijective [0,2^m0)×… → [0, 2^Σm); fails
    * loudly on out-of-range coordinates (the uzaygezen
    * BitVector.copyFrom contract geotrellis inherits). */
  def index(ms: IndexedSeq[Int], p: IndexedSeq[Long]): Long = {
    val n = ms.length
    require(n >= 2, s"compact Hilbert needs >= 2 dimensions, got $n")
    require(p.length == n, s"${p.length} coordinates for $n dimensions")
    require(ms.forall(_ >= 1) && ms.sum <= 62,
      s"total index bits ${ms.sum} outside 1..62")
    var j = 0
    while (j < n) {
      require(p(j) >= 0 && (p(j) >>> ms(j)) == 0,
        s"coordinate ${p(j)} exceeds ${ms(j)} bits in dimension $j")
      j += 1
    }
    val m = ms.max
    var h = 0L
    var e = 0L
    var d = 2 % n
    var i = m - 1
    while (i >= 0) {
      var mu = 0L
      var l = 0L
      var k = 0
      while (k < n) {
        if (ms(k) > i) mu |= 1L << k
        if (((p(k) >>> i) & 1L) != 0) l |= 1L << k
        k += 1
      }
      val muRot = rotr(mu, d + 1, n)
      val w = gcInverse(rotr(l ^ e, d + 1, n), n)
      var r = 0L
      k = n - 1
      while (k >= 0) {
        if (((muRot >>> k) & 1L) != 0) r = (r << 1) | ((w >>> k) & 1L)
        k -= 1
      }
      h = (h << java.lang.Long.bitCount(mu)) | r
      e = e ^ rotl(entry(w), d + 1, n)
      d = (d + direction(w, n) + 1) % n
      i -= 1
    }
    h
  }

  /** Bits needed for values 0..maxValue — geotrellis
    * HilbertKeyIndexMethod's `resolution` (ceil log2 of the range
    * size), floored at 1 bit. */
  def resolutionFor(maxValue: Long): Int = {
    require(maxValue >= 0, s"negative max $maxValue")
    math.max(64 - java.lang.Long.numberOfLeadingZeros(maxValue), 1)
  }
}
