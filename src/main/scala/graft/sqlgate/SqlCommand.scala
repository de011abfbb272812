package graft.sqlgate

import scala.util.matching.Regex

/** Statement classifier — the reference platform's own "engine" code.
  *
  * Mirrors the first-match regex table of
  * `/root/reference/flink-streaming-commom/.../enums/SqlCommand.java:18-117`
  * (case-insensitive, DOTALL, operand extraction), re-expressed as a Scala
  * ADT. The command set is the platform's public statement contract
  * (SURVEY.md §2.2 / reference README §四).
  */
sealed abstract class SqlCommand(pattern: String, val operandGroups: Int = 1) {
  val regex: Regex = ("(?is)" + pattern).r
  def name: String = toString
}

object SqlCommand {
  case object InsertInto extends SqlCommand("(INSERT\\s+INTO.*)")
  case object InsertOverwrite extends SqlCommand("(INSERT\\s+OVERWRITE.*)")
  case object CreateTable extends SqlCommand("(CREATE\\s+TABLE.*)")
  case object CreateFunction extends SqlCommand("(CREATE\\s+(?:TEMPORARY\\s+)?FUNCTION.*)")
  case object CreateView extends SqlCommand(
    "(CREATE\\s+(?:OR\\s+REPLACE\\s+)?(?:TEMPORARY\\s+)?VIEW.*)")
  case object CreateDatabase extends SqlCommand("(CREATE\\s+DATABASE.*)")
  case object CreateCatalog extends SqlCommand("(CREATE\\s+CATALOG.*)")
  case object UseCatalog extends SqlCommand("USE\\s+CATALOG\\s+(.*)")
  case object Use extends SqlCommand("USE\\s+(?!CATALOG)(.*)")
  case object DropTable extends SqlCommand("(DROP\\s+TABLE.*)")
  case object DropDatabase extends SqlCommand("(DROP\\s+DATABASE.*)")
  case object DropView extends SqlCommand("(DROP\\s+VIEW.*)")
  case object DropFunction extends SqlCommand("(DROP\\s+FUNCTION.*)")
  case object AlterTable extends SqlCommand("(ALTER\\s+TABLE.*)")
  case object AlterDatabase extends SqlCommand("(ALTER\\s+DATABASE.*)")
  case object AlterFunction extends SqlCommand("(ALTER\\s+FUNCTION.*)")
  case object Select extends SqlCommand("(SELECT.*)")
  case object ShowCatalogs extends SqlCommand("SHOW\\s+CATALOGS", 0)
  case object ShowDatabases extends SqlCommand("SHOW\\s+DATABASES", 0)
  case object ShowTables extends SqlCommand("SHOW\\s+TABLES", 0)
  case object ShowFunctions extends SqlCommand("SHOW\\s+FUNCTIONS", 0)
  case object ShowModules extends SqlCommand("SHOW\\s+MODULES", 0)
  case object Set extends SqlCommand("SET(\\s+(\\S+)\\s*=\\s*(.*))?", 3)
  case object BeginStatementSet extends SqlCommand("BEGIN\\s+STATEMENT\\s+SET", 0)
  case object End extends SqlCommand("END", 0)

  /** First-match order matters (reference relies on enum declaration
    * order): USE CATALOG before USE, INSERT OVERWRITE before INSERT INTO.
    */
  val all: Seq[SqlCommand] = Seq(
    InsertOverwrite, InsertInto,
    CreateTable, CreateFunction, CreateView, CreateDatabase, CreateCatalog,
    UseCatalog, Use,
    DropTable, DropDatabase, DropView, DropFunction,
    AlterTable, AlterDatabase, AlterFunction,
    ShowCatalogs, ShowDatabases, ShowTables, ShowFunctions, ShowModules,
    Set, BeginStatementSet, End,
    Select)

  /** Classify one trimmed statement; None = unclassifiable (the reference
    * raises on these in `SqlFileParser.java:44-50`).
    */
  def classify(stmt: String): Option[Classified] = {
    val t = stmt.trim.stripSuffix(";").trim
    all.iterator.flatMap { cmd =>
      cmd.regex.findFirstMatchIn(t) match {
        case Some(m) if m.matched.length == t.length =>
          val ops = (1 to m.groupCount)
            .map(m.group).filter(_ != null).map(_.trim)
          Some(Classified(cmd, t, ops))
        case _ => None
      }
    }.nextOption()
  }
}

final case class Classified(command: SqlCommand, text: String,
    operands: Seq[String])
