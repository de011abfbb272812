package graft.sqlgate

/** Statement splitter: the line-based scan of the reference's
  * `SqlFileParser.java:25-55` — skip `--` comment lines and blanks,
  * accumulate lines until one ends with `;`, emit the joined statement.
  * Property-tested in SqlGateSpec (comments / semicolons / case).
  */
object SqlSplitter {

  /** Split a SQL script into trimmed statements (no trailing `;`). */
  def split(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val buf = new StringBuilder
    for (rawLine <- script.linesIterator) {
      val line = rawLine.trim
      if (line.nonEmpty && !line.startsWith("--")) {
        // strip a trailing same-line comment (reference keeps it simple:
        // whole-line comments only; we additionally drop text after " --")
        val cleaned = {
          val i = line.indexOf(" --")
          if (i >= 0) line.substring(0, i).trim else line
        }
        if (cleaned.nonEmpty) {
          if (buf.nonEmpty) buf.append('\n')
          buf.append(cleaned)
          if (cleaned.endsWith(";")) {
            out += buf.toString.stripSuffix(";").trim
            buf.clear()
          }
        }
      }
    }
    if (buf.nonEmpty) out += buf.toString.trim // tolerate missing final ;
    out.result().filter(_.nonEmpty)
  }

  /** Split + classify; unclassifiable statements raise, mirroring
    * `SqlFileParser.java:44-50`.
    */
  def parse(script: String): Seq[Classified] =
    split(script).map { stmt =>
      SqlCommand.classify(stmt).getOrElse(
        throw new IllegalArgumentException(
          s"unsupported statement: ${stmt.take(80)}"))
    }
}
