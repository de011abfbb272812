package graft.sources

/** Minimal JSON record slicer for the REST consume wire (the repo ships
  * no JSON library; the produce side hand-writes JSON the same way).
  * Parses ONLY the shapes the wire contract emits: an array of record
  * objects whose fields are `key` / `value` (arbitrary nested JSON),
  * `offset` and `partition` (integers). Values are returned as RAW JSON
  * slices — the engine never interprets payloads here; `from_json`
  * does, with real schema handling, in the gate layer.
  */
private[graft] object MiniJson {

  final case class Record(key: Option[String], value: String, offset: Long,
      partition: Option[Int])

  /** End index (exclusive) of the JSON value starting at `i` (caller
    * guarantees `i` points at a value start, not whitespace).
    */
  private def valueEnd(s: String, i: Int): Int = s.charAt(i) match {
    case '"' =>
      var j = i + 1
      while (j < s.length && s.charAt(j) != '"') {
        if (s.charAt(j) == '\\') j += 1
        j += 1
      }
      // a truncated response can end mid-string; a descriptive error
      // beats StringIndexOutOfBounds with no context
      if (j >= s.length) throw new IllegalArgumentException(
        s"unterminated JSON string at $i: ${s.slice(i, i + 40)}")
      j + 1
    case '{' | '[' =>
      var depth = 0
      var j = i
      var inStr = false
      while (j < s.length) {
        val c = s.charAt(j)
        if (inStr) {
          if (c == '\\') j += 1
          else if (c == '"') inStr = false
        } else c match {
          case '"' => inStr = true
          case '{' | '[' => depth += 1
          case '}' | ']' =>
            depth -= 1
            if (depth == 0) return j + 1
          case _ =>
        }
        j += 1
      }
      throw new IllegalArgumentException(
        s"unterminated JSON value at $i: ${s.slice(i, i + 40)}")
    case _ => // literal: number / true / false / null
      var j = i
      while (j < s.length && !",}] \t\n\r".contains(s.charAt(j))) j += 1
      j
  }

  private def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    i
  }

  /** The raw field slices of one JSON object at `i0` → (fieldName →
    * raw value text), plus the object's end index.
    */
  private def fields(s: String, i0: Int): (Map[String, String], Int) = {
    require(s.charAt(i0) == '{', s"expected object at $i0")
    val out = Map.newBuilder[String, String]
    var i = i0 + 1
    var done = false
    while (!done) {
      i = skipWs(s, i)
      s.charAt(i) match {
        case '}' => done = true; i += 1
        case ',' => i += 1
        case '"' =>
          val kEnd = valueEnd(s, i)
          val name = unescape(s.substring(i + 1, kEnd - 1))
          i = skipWs(s, kEnd)
          require(s.charAt(i) == ':', s"expected ':' at $i")
          i = skipWs(s, i + 1)
          val vEnd = valueEnd(s, i)
          out += name -> s.substring(i, vEnd)
          i = vEnd
        case c => throw new IllegalArgumentException(
          s"unexpected '$c' in object at $i")
      }
    }
    (out.result(), i)
  }

  private def unescape(raw: String): String = {
    if (!raw.contains('\\')) return raw
    val b = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) {
        raw.charAt(i + 1) match {
          case 'n' => b += '\n'; i += 2
          case 'r' => b += '\r'; i += 2
          case 't' => b += '\t'; i += 2
          case 'b' => b += '\b'; i += 2
          case 'f' => b += '\f'; i += 2
          case 'u' =>
            if (i + 6 > raw.length) throw new IllegalArgumentException(
              s"truncated \\u escape at $i: ${raw.slice(i, raw.length)}")
            b += Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar
            i += 6
          case o => b += o; i += 2
        }
      } else { b += c; i += 1 }
    }
    b.toString
  }

  /** A `key`/`value` field slice → the column's string form: a JSON
    * string unquotes (the payload IS the string), `null` → None, any
    * other JSON stays raw text for from_json downstream.
    */
  private def asColumn(raw: String): Option[String] =
    if (raw == "null") None
    else if (raw.startsWith("\"")) Some(unescape(raw.substring(1, raw.length - 1)))
    else Some(raw)

  /** Parse a fetch response: a JSON array of record objects. */
  def records(body: String): Seq[Record] = {
    var i = skipWs(body, 0)
    require(i < body.length && body.charAt(i) == '[',
      s"expected records array, got: ${body.take(40)}")
    i += 1
    val out = Seq.newBuilder[Record]
    var done = false
    while (!done) {
      i = skipWs(body, i)
      body.charAt(i) match {
        case ']' => done = true
        case ',' => i += 1
        case '{' =>
          val (fs, end) = fields(body, i)
          val off = fs.getOrElse("offset", throw new IllegalArgumentException(
            "record missing offset")).trim.toLong
          out += Record(
            fs.get("key").flatMap(asColumn),
            fs.get("value").flatMap(asColumn).getOrElse("null"),
            off,
            fs.get("partition").map(_.trim.toInt))
          i = end
        case c => throw new IllegalArgumentException(
          s"unexpected '$c' in records array at $i")
      }
    }
    out.result()
  }

  /** Parse a REST-proxy produce body `{"records":[{"key":K,"value":V},…]}`
    * → raw (key, value) JSON text pairs. Slices are preserved verbatim —
    * a produced `null` value stays the literal text "null", which is the
    * tombstone spelling the consume side's log format uses.
    */
  def produceRecords(body: String): Seq[(String, String)] = {
    val i0 = skipWs(body, 0)
    require(i0 < body.length && body.charAt(i0) == '{',
      s"expected produce object, got: ${body.take(40)}")
    val (fs, _) = fields(body, i0)
    val arr = fs.getOrElse("records", throw new IllegalArgumentException(
      s"produce body without records: ${body.take(40)}"))
    var i = skipWs(arr, 0)
    require(i < arr.length && arr.charAt(i) == '[',
      s"expected records array, got: ${arr.take(40)}")
    i += 1
    val out = Seq.newBuilder[(String, String)]
    var done = false
    while (!done) {
      i = skipWs(arr, i)
      arr.charAt(i) match {
        case ']' => done = true
        case ',' => i += 1
        case '{' =>
          val (rf, end) = fields(arr, i)
          out += ((rf.getOrElse("key", "null"), rf.getOrElse("value", "null")))
          i = end
        case c => throw new IllegalArgumentException(
          s"unexpected '$c' in produce records array at $i")
      }
    }
    out.result()
  }
}
