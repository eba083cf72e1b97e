package graft.sds

import org.apache.spark.sql.types._

/** Minimal protobuf WIRE-FORMAT codec — closes the D1 gap without the
  * environment-blocked toolchain (no `spark-protobuf` jar, no
  * `protobuf-java`, no `protoc`, offline resolution; see the Schemas
  * header). The wire format itself is tiny and fully public
  * (varint tags; wire type 0 = varint, 2 = length-delimited), so this
  * module implements it directly, driven by the SAME `StructType`
  * schemas the JSON mirror uses:
  *
  *  - field number = 1-based position of the field in the StructType
  *    (the published ConsenSource protos declare fields in this order;
  *    if a real descriptor differs, the fix is reordering one schema —
  *    this table-free convention is documented, not hidden);
  *  - `StringType` → length-delimited UTF-8; `LongType` → varint;
  *    nested `StructType` → length-delimited message (last wins);
  *    `ArrayType(StructType)` → repeated length-delimited;
  *  - enum-typed fields (proto3 varint of the ordinal) are declared in
  *    `enumFields` with ordinal 0 = UNSET, matching proto3 defaults;
  *  - proto3 presence: absent scalar = default ("" / 0), absent message
  *    = null — exactly the ""→NULL / missing-struct semantics the
  *    transforms already normalize.
  *
  * Decode emits the SAME JSON the fixtures use, so the entire staged
  * pipeline (`from_json` layers, transforms, SCD2 merge) runs unchanged
  * on wire input: binary → `ProtoLite.decodeToJson` → existing D1. The
  * test-side `encode` round-trips entities so `ProtoLiteSpec` proves
  * wire-path ≡ JSON-path on the transform outputs.
  */
object ProtoLite {

  /** Enum ordinal tables (proto3: 0 = unset). Keyed by field name. */
  val enumFields: Map[String, IndexedSeq[String]] = Map(
    "organization_type" -> IndexedSeq(
      "UNSET_TYPE", "CERTIFYING_BODY", "STANDARDS_BODY", "FACTORY", "INGESTION"),
    "role" -> IndexedSeq("UNSET_ROLE", "ADMIN", "TRANSACTOR"),
    "status" -> IndexedSeq(
      "UNSET_STATUS", "OPEN", "IN_PROGRESS", "CLOSED", "CERTIFIED", "PRE_CERTIFIED"),
    "assertion_type" -> IndexedSeq(
      "UNSET_TYPE", "FACTORY", "CERTIFICATE", "STANDARD"))

  // ---- wire reading ------------------------------------------------------

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (true) {
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
        require(shift < 64, "varint too long")
      }
      out
    }
    def lengthDelimited(): (Int, Int) = {
      val len = varint().toInt
      val s = pos; pos += len
      require(pos <= end, "length-delimited field overruns buffer")
      (s, s + len)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => lengthDelimited()
      case 5 => pos += 4
      case t => throw new IllegalArgumentException(s"unsupported wire type $t")
    }
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Decode one message body to a JSON object string per `schema`. */
  private def decodeObj(buf: Array[Byte], start: Int, end: Int,
                        schema: StructType): String = {
    val n = schema.fields.length
    val scalars = Array.fill(n)(Option.empty[String]) // pre-rendered JSON values
    val repeats = Array.fill(n)(Vector.empty[String])
    val r = new Reader(buf, start, end)
    while (r.hasMore) {
      val tag = r.varint()
      val fieldNo = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      if (fieldNo < 1 || fieldNo > n) r.skip(wire)
      else {
        val f = schema.fields(fieldNo - 1)
        f.dataType match {
          case StringType if enumFields.contains(f.name) =>
            val ord = r.varint().toInt
            val names = enumFields(f.name)
            scalars(fieldNo - 1) =
              Some("\"" + names(math.min(math.max(ord, 0), names.length - 1)) + "\"")
          case StringType =>
            val (s, e) = r.lengthDelimited()
            scalars(fieldNo - 1) =
              Some("\"" + jsonEscape(new String(buf, s, e - s, "UTF-8")) + "\"")
          case LongType =>
            scalars(fieldNo - 1) = Some(r.varint().toString)
          case st: StructType =>
            val (s, e) = r.lengthDelimited()
            scalars(fieldNo - 1) = Some(decodeObj(buf, s, e, st))
          case ArrayType(st: StructType, _) =>
            val (s, e) = r.lengthDelimited()
            repeats(fieldNo - 1) = repeats(fieldNo - 1) :+ decodeObj(buf, s, e, st)
          case dt =>
            throw new IllegalArgumentException(s"unsupported field type $dt (${f.name})")
        }
      }
    }
    val parts = schema.fields.zipWithIndex.flatMap { case (f, i) =>
      f.dataType match {
        case ArrayType(_, _) if repeats(i).nonEmpty =>
          Some("\"" + f.name + "\":" + repeats(i).mkString("[", ",", "]"))
        case ArrayType(_, _) => None // absent repeated = absent key (null array)
        case _ => scalars(i).map(v => "\"" + f.name + "\":" + v)
        // absent scalar = absent key: from_json yields null, and the
        // transforms' ""→NULL / default handling already covers proto3
        // defaults on the JSON mirror path identically
      }
    }
    parts.mkString("{", ",", "}")
  }

  /** bytes of one message → JSON string matching the fixture mirror. */
  def decodeToJson(bytes: Array[Byte], schema: StructType): String =
    decodeObj(bytes, 0, bytes.length, schema)

  // ---- wire writing (test/fixture side) ----------------------------------

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeTag(out: java.io.ByteArrayOutputStream, fieldNo: Int, wire: Int): Unit =
    writeVarint(out, (fieldNo.toLong << 3) | wire)

  /** Encode a field-name→value map per `schema`. Values: String (plain or
    * enum name), Long/Int, Map (nested), Seq[Map] (repeated). Missing or
    * null keys are omitted (proto3 default). */
  def encode(values: Map[String, Any], schema: StructType): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fieldNo = i + 1
      values.get(f.name).filter(_ != null).foreach { v =>
        (f.dataType, v) match {
          case (StringType, s: String) if enumFields.contains(f.name) =>
            writeTag(out, fieldNo, 0)
            writeVarint(out, enumFields(f.name).indexOf(s).max(0).toLong)
          case (StringType, s: String) =>
            val b = s.getBytes("UTF-8")
            writeTag(out, fieldNo, 2); writeVarint(out, b.length.toLong); out.write(b)
          case (LongType, l: Long) =>
            writeTag(out, fieldNo, 0); writeVarint(out, l)
          case (LongType, l: Int) =>
            writeTag(out, fieldNo, 0); writeVarint(out, l.toLong)
          case (st: StructType, m: Map[_, _]) =>
            val b = encode(m.asInstanceOf[Map[String, Any]], st)
            writeTag(out, fieldNo, 2); writeVarint(out, b.length.toLong); out.write(b)
          case (ArrayType(st: StructType, _), xs: Seq[_]) =>
            xs.foreach { x =>
              val b = encode(x.asInstanceOf[Map[String, Any]], st)
              writeTag(out, fieldNo, 2); writeVarint(out, b.length.toLong); out.write(b)
            }
          case (dt, other) =>
            throw new IllegalArgumentException(
              s"cannot encode ${f.name}: $dt from ${other.getClass}")
        }
      }
    }
    out.toByteArray
  }
}
