package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{ColumnarRule, FilterExec, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.vectorized.ColumnarBatch

/** The `injectColumnar` slice of the extension API, with a real kernel
  * behind it: a VECTORIZED pre-filter over the graft DSv2 connector's
  * columnar batches. Spark's row `FilterExec` evaluates after the
  * `ColumnarToRow` transition, so every scanned row — matching or not —
  * pays batch→row conversion first. For a simple comparison conjunct
  * (`attr <op> literal` on long/double/int) this rule compacts the batches
  * COLUMNAR-SIDE, before the transition:
  *
  * {{{
  *   Filter(cond, ColumnarToRow(BatchScan))            // row filter only
  *   Filter(cond, ColumnarToRow(ColumnarPreFilter(p, BatchScan)))
  * }}}
  *
  * The original `FilterExec` stays as the residual, so semantics can never
  * change: the pre-filter may only drop rows the residual would drop
  * (rows where the chosen conjunct is false or NULL). What changes is
  * WHERE the selectivity applies — only surviving rows cross the
  * columnar→row boundary, which is the same reason the parquet reader
  * filters inside its vectorized path. At 1% selectivity, 99% of the
  * row-materialization work disappears.
  *
  * Engaged only for this repo's `StatsCsvScan` batches (on-heap vectors
  * it allocated itself); everything else passes through untouched. The
  * rule runs in `postColumnarTransitions` — after Spark has planned the
  * transitions, before codegen collapse.
  */
object ColumnarPreFilter {

  /** One comparison conjunct compiled to (column index, op, literal). */
  final case class Pred(colIdx: Int, op: String, lit: Double, litL: Long, isFloating: Boolean)

  private def numeric(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType => true
    case _ => false
  }

  /** Pick the first `attr <op> literal` conjunct over a numeric column. */
  def extract(cond: Expression, output: Seq[Attribute]): Option[Pred] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    split(cond).flatMap {
      case cmp @ (_: GreaterThan | _: GreaterThanOrEqual | _: LessThan |
                  _: LessThanOrEqual | _: EqualTo) =>
        val (l, r, opRaw) = cmp match {
          case GreaterThan(a, b) => (a, b, ">")
          case GreaterThanOrEqual(a, b) => (a, b, ">=")
          case LessThan(a, b) => (a, b, "<")
          case LessThanOrEqual(a, b) => (a, b, "<=")
          case EqualTo(a, b) => (a, b, "==")
        }
        (l, r) match {
          case (a: AttributeReference, Literal(v, dt)) if numeric(a.dataType) && numeric(dt) =>
            val idx = output.indexWhere(_.exprId == a.exprId)
            if (idx < 0) None
            else {
              val d = v match {
                case x: java.lang.Number => x.doubleValue()
                case _ => return None
              }
              val lng = v match { case x: java.lang.Number => x.longValue() }
              Some(Pred(idx, opRaw, d, lng, a.dataType == DoubleType || dt == DoubleType))
            }
          case _ => None
        }
      case _ => None
    }.headOption
  }

  /** Compact `batch` to the rows where the predicate holds (NULL → drop). */
  def filterBatch(batch: ColumnarBatch, pred: Pred, schema: StructType): ColumnarBatch = {
    val n = batch.numRows()
    val keep = new Array[Int](n)
    var k = 0
    val c = batch.column(pred.colIdx)
    val floating = pred.isFloating
    var i = 0
    while (i < n) {
      if (!c.isNullAt(i)) {
        val pass =
          if (floating) {
            val x = schema.fields(pred.colIdx).dataType match {
              case DoubleType => c.getDouble(i)
              case LongType => c.getLong(i).toDouble
              case IntegerType => c.getInt(i).toDouble
              case _ => return batch
            }
            pred.op match {
              case ">" => x > pred.lit
              case ">=" => x >= pred.lit
              case "<" => x < pred.lit
              case "<=" => x <= pred.lit
              case "==" => x == pred.lit
            }
          } else {
            val x = schema.fields(pred.colIdx).dataType match {
              case LongType => c.getLong(i)
              case IntegerType => c.getInt(i).toLong
              case _ => return batch
            }
            pred.op match {
              case ">" => x > pred.litL
              case ">=" => x >= pred.litL
              case "<" => x < pred.litL
              case "<=" => x <= pred.litL
              case "==" => x == pred.litL
            }
          }
        if (pass) { keep(k) = i; k += 1 }
      }
      i += 1
    }
    if (k == n) return batch // nothing dropped: reuse the input batch
    val out = OnHeapColumnVector.allocateColumns(k, schema)
    var f = 0
    while (f < schema.length) {
      val src = batch.column(f)
      val dst = out(f)
      var j = 0
      schema.fields(f).dataType match {
        case LongType =>
          while (j < k) {
            val r = keep(j)
            if (src.isNullAt(r)) dst.putNull(j) else dst.putLong(j, src.getLong(r))
            j += 1
          }
        case IntegerType =>
          while (j < k) {
            val r = keep(j)
            if (src.isNullAt(r)) dst.putNull(j) else dst.putInt(j, src.getInt(r))
            j += 1
          }
        case DoubleType =>
          while (j < k) {
            val r = keep(j)
            if (src.isNullAt(r)) dst.putNull(j) else dst.putDouble(j, src.getDouble(r))
            j += 1
          }
        case StringType =>
          while (j < k) {
            val r = keep(j)
            if (src.isNullAt(r)) dst.putNull(j)
            else {
              val b = src.getUTF8String(r).getBytes
              dst.putByteArray(j, b, 0, b.length)
            }
            j += 1
          }
        case _ => // unreachable: supported() checked the schema
          throw new IllegalStateException("unsupported type in columnar pre-filter")
      }
      f += 1
    }
    new ColumnarBatch(out.map(v => v: org.apache.spark.sql.vectorized.ColumnVector), k)
  }

  def supported(schema: StructType): Boolean =
    schema.fields.forall(f => f.dataType match {
      case LongType | IntegerType | DoubleType | StringType => true
      case _ => false
    })
}

/** Physical node: columnar in, columnar out, fewer rows. */
case class ColumnarPreFilterExec(pred: ColumnarPreFilter.Pred, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def supportsColumnar: Boolean = true
  private def schema0: StructType =
    StructType(child.output.map(a => StructField(a.name, a.dataType, a.nullable)))
  override def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val p = pred
    val sch = schema0
    child.executeColumnar().map(b => ColumnarPreFilter.filterBatch(b, p, sch))
  }
  override protected def doExecute(): RDD[InternalRow] =
    throw new UnsupportedOperationException(
      "ColumnarPreFilterExec is columnar-only; Spark inserts ColumnarToRow above it")
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** The injected ColumnarRule (see [[graft.GraftExtensions]]). */
class GraftColumnarRule(session: SparkSession) extends ColumnarRule {
  override def postColumnarTransitions: Rule[SparkPlan] = new Rule[SparkPlan] {
    override def apply(plan: SparkPlan): SparkPlan = plan.transformUp {
      case f @ FilterExec(cond,
          c2r @ org.apache.spark.sql.execution.ColumnarToRowExec(scan: BatchScanExec))
          if scan.scan.isInstanceOf[graft.sources.StatsCsvScan] &&
            scan.supportsColumnar &&
            ColumnarPreFilter.supported(StructType(scan.output.map(a =>
              StructField(a.name, a.dataType, a.nullable)))) =>
        ColumnarPreFilter.extract(cond, scan.output) match {
          case Some(p) =>
            FilterExec(cond,
              c2r.copy(child = ColumnarPreFilterExec(p, scan)))
          case None => f
        }
    }
  }
}
