package graft.sqlgate

import org.apache.spark.sql.SparkSession
import scala.util.{Failure, Success, Try}

/** Pre-flight script validator — mirror of the reference's
  * `SqlValidation.preCheckSql` (`flink-streaming-validation/.../
  * SqlValidation.java:43-144`): per-statement syntax check plus two policy
  * rules — the script must contain at least one INSERT (MESSAGE_010,
  * `ValidationConstants.java:11`) and must not contain a top-level SELECT
  * (MESSAGE_011, `:13`). Like the reference, the check is syntax-only:
  * catalogs/tables/types are not resolved (`docs/manual-sql.md:131`).
  */
object SqlValidator {
  val Message010 = "sql check fail: script must contain an INSERT statement"
  val Message011 = "sql check fail: top-level SELECT is not supported"

  final case class Verdict(ok: Boolean, errors: Seq[String])

  def validate(spark: SparkSession, script: String): Verdict = {
    val parsed = Try(SqlSplitter.parse(script)) match {
      case Failure(e) => return Verdict(ok = false, Seq(e.getMessage))
      case Success(p) => p
    }
    val errors = Seq.newBuilder[String]

    parsed.foreach { c =>
      c.command match {
        case SqlCommand.Set =>
          // SET must be `SET key=value` (reference splits on '=').
          if (c.operands.size >= 2 && c.operands(1).isEmpty)
            errors += s"bad SET statement: ${c.text.take(60)}"
        case SqlCommand.BeginStatementSet | SqlCommand.End |
            SqlCommand.CreateCatalog | SqlCommand.UseCatalog |
            SqlCommand.ShowModules => // gate-level, not Spark-parseable
        case SqlCommand.CreateTable if TableSpec.isConnectorDdl(c.text) =>
          Try(TableSpec.parse(c.text)) match {
            case Failure(e) => errors += s"bad connector DDL: ${e.getMessage}"
            case Success(spec) => Try(spec.schema) match {
              case Failure(e) =>
                errors += s"bad schema in ${spec.name}: ${e.getMessage}"
              case _ =>
            }
          }
        case _ =>
          // Everything else must be Spark-parseable (syntax only) AFTER
          // the dialect rewrite — the runner executes the rewritten form,
          // so validating the raw Flink spelling would reject scripts
          // that actually run (FOR SYSTEM_TIME AS OF a non-constant, …).
          Try(spark.sessionState.sqlParser.parsePlan(FlinkSqlRewrite.validate(c.text))) match {
            case Failure(e) =>
              errors += s"syntax error: ${e.getMessage.linesIterator.next()}"
            case _ =>
          }
      }
    }

    val hasInsert = parsed.exists(c =>
      c.command == SqlCommand.InsertInto ||
        c.command == SqlCommand.InsertOverwrite)
    val hasSelect = parsed.exists(_.command == SqlCommand.Select)
    if (!hasInsert) errors += Message010
    if (hasSelect) errors += Message011

    val e = errors.result()
    Verdict(e.isEmpty, e)
  }
}
