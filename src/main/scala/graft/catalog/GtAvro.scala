package graft.catalog

import scala.collection.mutable

/** Apache Avro BINARY datum codec — the written-from-spec discipline
  * ([[graft.raster.NetCdf4]]/[[graft.raster.Grib2]]/TFRecord
  * precedents) applied to the public Avro 1.x specification
  * (avro.apache.org, "Binary encoding"): zig-zag varint ints/longs,
  * little-endian IEEE floats/doubles, length-prefixed bytes/strings,
  * block-framed arrays/maps, index-prefixed unions, field-ordered
  * records.
  *
  * Purpose: GeoTrellis stores tile payloads as raw Avro datums (no
  * container file) whose writer schema is SELF-DESCRIBING — the JSON
  * schema sits in the same attribute store the
  * [[GeoTrellisStore]] adapter already parses (the "schema" layer
  * attribute; reference reads the payloads through
  * geopyspark-backend io/ValueReaderWrapper.scala:1 /
  * io/LayerReaderWrapper.scala:1). A generic schema-driven decoder is
  * therefore enough to read ANY stored layer without geotrellis on
  * the classpath.
  *
  * Subset: record / array / map / union / enum / fixed + the eight
  * primitives — everything the GeoTrellis KeyValueRecord / tile
  * codecs emit. Unknown schema constructs fail loudly at parse time.
  */
object GtAvro {

  // ------------------------------------------------------------ schema AST

  sealed trait Schema
  case object ANull    extends Schema
  case object ABoolean extends Schema
  case object AInt     extends Schema
  case object ALong    extends Schema
  case object AFloat   extends Schema
  case object ADouble  extends Schema
  case object ABytes   extends Schema
  case object AString  extends Schema
  final case class ARecord(name: String, fields: IndexedSeq[(String, Schema)]) extends Schema
  final case class AArray(items: Schema)                       extends Schema
  final case class AMap(values: Schema)                        extends Schema
  final case class AUnion(branches: IndexedSeq[Schema])        extends Schema
  final case class AEnum(name: String, symbols: IndexedSeq[String]) extends Schema
  final case class AFixed(name: String, size: Int)             extends Schema

  /** A decoded record, carrying its schema name (the tile-type
    * dispatch key) beside the field map. */
  final case class Rec(name: String, fields: Map[String, Any]) {
    def apply(field: String): Any = fields(field)
  }

  /** An encode-side union value: the branch index is explicit so the
    * encoder never guesses schema resolution. */
  final case class UnionVal(index: Int, value: Any)

  // --------------------------------------------------------- schema parse

  /** Parse a schema from its JSON text. */
  def parseSchema(json: String): Schema =
    parseSchemaValue(graft.vector.GeoJson.parseJsonValue(json))

  /** Parse a schema from an already-JSON-parsed value tree (the form
    * the attribute store hands back). */
  def parseSchemaValue(v: Any): Schema =
    parse(v, mutable.Map.empty)

  /** Register a named type (enum/fixed — records inline it) under BOTH
    * its short name and, when a namespace is declared, the
    * namespace-qualified fullname: the spec allows references by
    * either, and a schema that declares `ns.Name` then references it
    * by fullname must resolve (r19 review). */
  private def registerNamed(named: mutable.Map[String, Schema],
                            node: Map[String, Any], name: String, s: Schema): Unit = {
    named(name) = s
    node.get("namespace") match {
      case Some(ns: String) if ns.nonEmpty => named(s"$ns.$name") = s
      case _ => ()
    }
  }

  private val primitives: Map[String, Schema] = Map(
    "null" -> ANull, "boolean" -> ABoolean, "int" -> AInt, "long" -> ALong,
    "float" -> AFloat, "double" -> ADouble, "bytes" -> ABytes, "string" -> AString)

  private def parse(v: Any, named: mutable.Map[String, Schema]): Schema = v match {
    case s: String =>
      primitives.getOrElse(s, named.getOrElse(s,
        throw new IllegalArgumentException(
          s"avro schema: unknown type reference '$s'")))
    case branches: Seq[Any @unchecked] =>
      AUnion(branches.map(parse(_, named)).toIndexedSeq)
    case m: Map[String @unchecked, Any @unchecked] =>
      m.getOrElse("type", throw new IllegalArgumentException(
        "avro schema: object without 'type'")) match {
        case "record" =>
          val name = m("name").asInstanceOf[String]
          val full = m.get("namespace") match {
            case Some(ns: String) if ns.nonEmpty => s"$ns.$name"
            case _ => name
          }
          // fields may reference the record recursively by name; the
          // GeoTrellis codecs don't, but register-before-parse is the
          // spec's resolution rule anyway — a placeholder would need
          // mutability, so recursive references fail loudly instead
          val fields = m("fields").asInstanceOf[Seq[Any]].map { f =>
            val fm = f.asInstanceOf[Map[String, Any]]
            (fm("name").asInstanceOf[String], parse(fm("type"), named))
          }.toIndexedSeq
          val rec = ARecord(name, fields)
          named(name) = rec
          named(full) = rec
          rec
        case "array" => AArray(parse(m("items"), named))
        case "map"   => AMap(parse(m("values"), named))
        case "enum" =>
          val e = AEnum(m("name").asInstanceOf[String],
            m("symbols").asInstanceOf[Seq[Any]].map(_.asInstanceOf[String]).toIndexedSeq)
          registerNamed(named, m, e.name, e)
          e
        case "fixed" =>
          val f = AFixed(m("name").asInstanceOf[String],
            m("size").asInstanceOf[Double].toInt)
          registerNamed(named, m, f.name, f)
          f
        case t => parse(t, named) // {"type": "long"} wrapper form
      }
    case other =>
      throw new IllegalArgumentException(s"avro schema: unsupported node $other")
  }

  // -------------------------------------------------------------- decode

  private final class Reader(b: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      require(pos < b.length, s"avro: datum truncated at $pos (${b.length} bytes)")
      val v = b(pos) & 0xff; pos += 1; v
    }
    /** Zig-zag varint long (the spec's int/long wire form). */
    def vlong(): Long = {
      var shift = 0
      var acc = 0L
      var byte = u8()
      while ((byte & 0x80) != 0) {
        acc |= (byte & 0x7fL) << shift
        shift += 7
        require(shift < 64, "avro: varint overruns 64 bits")
        byte = u8()
      }
      acc |= byte.toLong << shift
      (acc >>> 1) ^ -(acc & 1L) // zig-zag decode
    }
    def raw(n: Int): Array[Byte] = {
      require(pos + n <= b.length, s"avro: datum truncated at $pos (+$n > ${b.length})")
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
      out
    }
    def f32(): Float = {
      val v = (u8()) | (u8() << 8) | (u8() << 16) | (u8() << 24)
      java.lang.Float.intBitsToFloat(v)
    }
    def f64(): Double = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (u8().toLong << (8 * i)); i += 1 }
      java.lang.Double.longBitsToDouble(v)
    }
  }

  /** Decode one binary datum against its writer schema. Records come
    * back as [[Rec]], arrays as Vector, maps as Map, unions as the
    * branch value, enums as the symbol string. */
  def decode(bytes: Array[Byte], schema: Schema): Any = {
    val r = new Reader(bytes)
    val v = read(r, schema)
    require(r.pos == bytes.length,
      s"avro: ${bytes.length - r.pos} trailing bytes after datum")
    v
  }

  private def read(r: Reader, s: Schema): Any = s match {
    case ANull    => null
    case ABoolean => r.u8() != 0
    case AInt     =>
      // loud-failure discipline: an out-of-spec datum whose zig-zag
      // value exceeds 32 bits must not silently truncate (r19 review)
      val v = r.vlong()
      require(v >= Int.MinValue && v <= Int.MaxValue,
        s"avro: int datum $v exceeds 32 bits")
      v.toInt
    case ALong    => r.vlong()
    case AFloat   => r.f32()
    case ADouble  => r.f64()
    case ABytes   => r.raw(r.vlong().toInt)
    case AString  => new String(r.raw(r.vlong().toInt), java.nio.charset.StandardCharsets.UTF_8)
    case AFixed(_, size) => r.raw(size)
    case AEnum(name, symbols) =>
      val i = r.vlong().toInt
      require(i >= 0 && i < symbols.length, s"avro: enum $name index $i out of range")
      symbols(i)
    case AUnion(branches) =>
      val i = r.vlong().toInt
      require(i >= 0 && i < branches.length, s"avro: union index $i out of range")
      read(r, branches(i))
    case AArray(items) =>
      val out = Vector.newBuilder[Any]
      var n = r.vlong()
      while (n != 0) {
        if (n < 0) { r.vlong(); n = -n } // negative block: size hint follows
        var i = 0L
        while (i < n) { out += read(r, items); i += 1 }
        n = r.vlong()
      }
      out.result()
    case AMap(values) =>
      val out = Map.newBuilder[String, Any]
      var n = r.vlong()
      while (n != 0) {
        if (n < 0) { r.vlong(); n = -n }
        var i = 0L
        while (i < n) {
          val k = new String(r.raw(r.vlong().toInt), java.nio.charset.StandardCharsets.UTF_8)
          out += (k -> read(r, values))
          i += 1
        }
        n = r.vlong()
      }
      out.result()
    case ARecord(name, fields) =>
      val out = Map.newBuilder[String, Any]
      fields.foreach { case (fn, fs) => out += (fn -> read(r, fs)) }
      Rec(name, out.result())
  }

  // -------------------------------------------------------------- encode

  private final class Writer {
    val buf = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = buf.write(v & 0xff)
    def vlong(v: Long): Unit = {
      var z = (v << 1) ^ (v >> 63) // zig-zag
      while ((z & ~0x7fL) != 0) { u8(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
      u8(z.toInt)
    }
    def f32(v: Float): Unit = {
      val b = java.lang.Float.floatToIntBits(v)
      u8(b); u8(b >> 8); u8(b >> 16); u8(b >> 24)
    }
    def f64(v: Double): Unit = {
      val b = java.lang.Double.doubleToLongBits(v)
      var i = 0
      while (i < 8) { u8((b >> (8 * i)).toInt); i += 1 }
    }
    def raw(b: Array[Byte]): Unit = buf.write(b)
  }

  /** Encode one datum against its schema. Unions take [[UnionVal]]
    * (explicit branch), records take [[Rec]] (fields by name). */
  def encode(value: Any, schema: Schema): Array[Byte] = {
    val w = new Writer
    write(w, value, schema)
    w.buf.toByteArray
  }

  private def write(w: Writer, v: Any, s: Schema): Unit = (s, v) match {
    case (ANull, _)              => ()
    case (ABoolean, b: Boolean)  => w.u8(if (b) 1 else 0)
    case (AInt, i: Int)          => w.vlong(i.toLong)
    case (ALong, l: Long)        => w.vlong(l)
    case (ALong, i: Int)         => w.vlong(i.toLong)
    case (AFloat, f: Float)      => w.f32(f)
    case (ADouble, d: Double)    => w.f64(d)
    case (ABytes, b: Array[Byte]) => { w.vlong(b.length.toLong); w.raw(b) }
    case (AString, t: String) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      w.vlong(b.length.toLong); w.raw(b)
    case (AFixed(name, size), b: Array[Byte]) =>
      require(b.length == size, s"avro: fixed $name expects $size bytes, got ${b.length}")
      w.raw(b)
    case (AEnum(name, symbols), sym: String) =>
      val i = symbols.indexOf(sym)
      require(i >= 0, s"avro: enum $name has no symbol '$sym'")
      w.vlong(i.toLong)
    case (AUnion(branches), UnionVal(i, inner)) =>
      require(i >= 0 && i < branches.length, s"avro: union branch $i out of range")
      w.vlong(i.toLong)
      write(w, inner, branches(i))
    case (AArray(items), seq: Seq[Any @unchecked]) =>
      if (seq.nonEmpty) {
        w.vlong(seq.length.toLong)
        seq.foreach(write(w, _, items))
      }
      w.vlong(0L)
    case (AMap(values), m: Map[String @unchecked, Any @unchecked]) =>
      if (m.nonEmpty) {
        w.vlong(m.size.toLong)
        // deterministic key order — encode is fixture/export plumbing
        m.toSeq.sortBy(_._1).foreach { case (k, mv) =>
          val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          w.vlong(kb.length.toLong); w.raw(kb)
          write(w, mv, values)
        }
      }
      w.vlong(0L)
    case (ARecord(name, fields), rec: Rec) =>
      fields.foreach { case (fn, fs) =>
        require(rec.fields.contains(fn), s"avro: record $name value missing field '$fn'")
        write(w, rec.fields(fn), fs)
      }
    case (other, bad) =>
      throw new IllegalArgumentException(
        s"avro: cannot encode ${if (bad == null) "null" else bad.getClass.getName} as $other")
  }
}
