package graft.raster

/** Byte-range access to a (possibly remote) file — the IO contract a
  * COG exists for: serve any window after a handful of small reads,
  * never the whole object. Implementations count their requests and
  * bytes so serving paths (TMS /cog) and specs can assert the range
  * discipline holds.
  */
trait RangeReader extends java.io.Closeable {
  def length: Long
  /** One positioned read of `len` bytes at `off` (clipped to EOF). */
  def read(off: Long, len: Int): Array[Byte]
  /** Range requests served so far. */
  def requests: Int
  /** Total bytes fetched so far. */
  def bytesRead: Long
  override def close(): Unit = ()
}

object RangeReader {
  /** In-memory blob (tests, bytes already fetched elsewhere). */
  final class ByteArrayRangeReader(bytes: Array[Byte]) extends RangeReader {
    private var n = 0
    private var total = 0L
    def length: Long = bytes.length.toLong
    def read(off: Long, len: Int): Array[Byte] = {
      // clip both ends so off past EOF returns empty (HadoopRangeReader
      // clips the same way; the two must agree at the boundary)
      val start = math.min(math.max(off, 0L), bytes.length.toLong).toInt
      val end = math.max(start.toLong, math.min(off + len, bytes.length.toLong)).toInt
      n += 1; total += end - start
      java.util.Arrays.copyOfRange(bytes, start, end)
    }
    def requests: Int = n
    def bytesRead: Long = total
  }

  /** Hadoop-FS positioned reads — URI-transparent (file://, hdfs://,
    * s3a://, ...). Each read() is one `readFully(position, ...)`,
    * which object-store connectors translate to an HTTP Range
    * request; the stream is positioned, so concurrent serving threads
    * can share one reader. */
  final class HadoopRangeReader(uri: String,
                                conf: org.apache.hadoop.conf.Configuration)
      extends RangeReader {
    private val path = new org.apache.hadoop.fs.Path(uri)
    private val fs = path.getFileSystem(conf)
    private val len = fs.getFileStatus(path).getLen
    private val in = fs.open(path)
    private var n = 0
    private var total = 0L
    def length: Long = len
    def read(off: Long, count: Int): Array[Byte] = {
      val clipped = math.max(0L, math.min(count.toLong, len - off)).toInt
      val out = new Array[Byte](clipped)
      in.readFully(off, out, 0, clipped)
      synchronized { n += 1; total += clipped }
      out
    }
    def requests: Int = n
    def bytesRead: Long = total
    override def close(): Unit = in.close()
  }

  def apply(bytes: Array[Byte]): RangeReader = new ByteArrayRangeReader(bytes)

  def hadoop(uri: String,
             conf: org.apache.hadoop.conf.Configuration =
               new org.apache.hadoop.conf.Configuration()): RangeReader =
    new HadoopRangeReader(uri, conf)
}
