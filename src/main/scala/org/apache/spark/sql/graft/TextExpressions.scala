// Lives under org.apache.spark.sql to reach the private[sql] Column<->
// Expression bridge (ExpressionUtils) — the conventional home for
// third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the two hottest scalar kernels of the dedup
  * pipelines (SURVEY.md §2 LLM-pipeline operators), replacing the last two
  * `ScalaUDF`s on any benched path. A ScalaUDF costs catalyst↔Scala
  * converters on every input/output (UTF8String→String→Seq boxing and
  * back) and an opaque non-codegen call; these stay inside whole-stage
  * codegen as a static-kernel call with no converter layer — the minhash
  * kernel in particular reads its input longs straight out of `ArrayData`
  * with zero boxing.
  *
  * Semantics are bit-identical to the UDFs they replace (pinned by
  * equivalence tests in ExtSpec and by every dedup gate's unchanged oracle
  * hash).
  */
object TextKernels {

  /** Word 3-gram distinct shingles in first-occurrence order — the exact
    * contract of the former `shinglesUdf`: Java `split(" ", -1)` (keep
    * trailing empties, same tokens as DuckDB `string_split`), fewer than 3
    * words → empty array. Works on UTF8String in and out; the split itself
    * runs on the decoded String (the shingle strings must concatenate with
    * spaces anyway, and one decode per row is far cheaper than the UDF's
    * full converter stack).
    */
  def shingles3(text: UTF8String): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < 3) new GenericArrayData(Array.empty[Any])
    else {
      val out = new java.util.LinkedHashSet[String]
      var i = 0
      while (i + 2 < words.length) {
        out.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
        i += 1
      }
      val arr = new Array[Any](out.size)
      val it = out.iterator()
      var j = 0
      while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(arr)
    }
  }

  private final val NumHashes = 32

  private def mix(h0: Long): Long = {
    var h = h0 + 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** The 32-slot minhash signature over a doc's shingle hashes — the exact
    * loop of the former `sigOfHashes` UDF (splitmix64 chain over each base
    * hash, per-slot running minimum), reading primitive longs directly from
    * `ArrayData`.
    */
  def minhashSig(hs: ArrayData): ArrayData = {
    val buf = Array.fill(NumHashes)(Long.MaxValue)
    val n = hs.numElements()
    var k = 0
    while (k < n) {
      var x = hs.getLong(k)
      var i = 0
      while (i < NumHashes) {
        x = mix(x)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
      k += 1
    }
    new GenericArrayData(buf)
  }
}

/** `shingles3(text)` as a codegen'd unary expression (null in → null out). */
case class Shingles3(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles3"

  override def nullSafeEval(a: Any): Any =
    TextKernels.shingles3(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.TextKernels.shingles3($a)")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

/** `minhashSig(array<long>)` as a codegen'd unary expression. */
case class MinhashSig(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(a: Any): Any =
    TextKernels.minhashSig(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.TextKernels.minhashSig($a)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object TextExpressions {
  def shingles3(text: Column): Column =
    ExpressionUtils.column(Shingles3(ExpressionUtils.expression(text)))
  def minhashSig(hashes: Column): Column =
    ExpressionUtils.column(MinhashSig(ExpressionUtils.expression(hashes)))
}
