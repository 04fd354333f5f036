package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating function (UDTF) `graft_ngrams(text, n)` — the
  * GENERATOR slice of the extension surface (the others being scalar
  * expression, declarative aggregate, optimizer rule, planner strategy and
  * check rule). Registered by [[graft.GraftExtensions]], so plain SQL can
  * fan a document into positional word n-grams:
  *
  * {{{ SELECT doc_id, pos, ngram
  *     FROM docs LATERAL VIEW graft_ngrams(text, 3) g AS pos, ngram }}}
  *
  * Emits one row per n-gram with its 0-based word position — unlike
  * [[graft.ext.Dedup.shingles]] (distinct set, for set-similarity), this
  * keeps duplicates and positions, the form span-level operators need.
  * Null text or n larger than the word count generates nothing.
  *
  * Scale shape: a Generator runs inside `GenerateExec` directly over the
  * scan — the fan-out is streamed row-by-row (no intermediate array
  * allocation per document, unlike `explode(split(...))` which
  * materializes the full array first), partition-local, no shuffle.
  */
case class NGramsGenerator(text: Expression, n: Expression)
    extends Generator with CodegenFallback with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(text, n)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (!n.foldable) TypeCheckResult.TypeCheckFailure("graft_ngrams: n must be a constant")
    else super.checkInputDataTypes()

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    val nv = n.eval(input)
    if (t == null || nv == null) Nil
    else {
      val words = t.toString.split(" ", -1)
      val k = nv.asInstanceOf[Int]
      if (k <= 0 || words.length < k) Nil
      else new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= words.length - k
        override def next(): InternalRow = {
          val sb = new java.lang.StringBuilder(words(i))
          var j = 1
          while (j < k) { sb.append(' ').append(words(i + j)); j += 1 }
          val row = InternalRow(i, UTF8String.fromString(sb.toString))
          i += 1
          row
        }
      }
    }
  }

  override def prettyName: String = "graft_ngrams"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGramsGenerator =
    copy(text = newChildren(0), n = newChildren(1))
}
