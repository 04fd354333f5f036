package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}

/** `SHOW GRAFT VIEWS` — lists the registered materialized views
  * ([[graft.warehouse.SummaryRewrite]] catalog) as a table: the operational
  * complement of the transparent rewrite ("which summaries is this session
  * serving answers from"). A driver-side catalog dump: zero jobs.
  */
case class ShowGraftViewsCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("view_name", StringType, nullable = false)(),
    AttributeReference("base_table", StringType, nullable = false)(),
    AttributeReference("group_keys", StringType, nullable = false)(),
    AttributeReference("n_measures", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.warehouse.SummaryRewrite.list.sortBy(_.name).map { mv =>
      val base = mv.basePath.stripSuffix("/").split('/').last
      Row(mv.name, base, mv.keys.mkString(","), mv.measures.size)
    }
}

/** Parser extension (`SparkSessionExtensions.injectParser`) — the last
  * slice of the extension surface after function/aggregate/generator
  * registration, optimizer rule, planner strategy and check rule. The
  * delegating pattern is the standard one (Delta/Iceberg ship their SQL
  * the same way): one regex gate for the custom statement, EVERYTHING else
  * — plans, expressions, identifiers, DDL — forwarded verbatim to Spark's
  * parser, so the extension can never change the semantics of normal SQL.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val ShowViews = """(?is)\s*SHOW\s+GRAFT\s+VIEWS\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case ShowViews() => ShowGraftViewsCommand()
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}
