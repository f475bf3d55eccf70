package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Catalyst Generator form of the fixed-size chunk splitter (the SURVEY
  * §2.9 "optional upgrade" made real; round-7 verdict #4 named it): one
  * input row (a file's bytes) streams out as (pos, chunk) rows through
  * GenerateExec's row-at-a-time pull, WITHOUT first materializing the
  * whole chunk list as an ArrayData the way the
  * `udf(split) + posexplode` formulation must — that intermediate is a
  * second full copy of the file (plus per-chunk Seq boxing) per row,
  * exactly what a 100 TB many-files scan cannot afford to allocate.
  *
  * Semantics mirror [[ChunkSource.split]] (reference:
  * lib/deduplicator/files.ex:45-56, binary_utils.ex:14-24): every chunk
  * has size ≤ n, the last may be short, concat(chunks) == input, empty
  * input yields no rows. ChunkSourceSpec pins Generator-vs-split parity.
  *
  * Interpreted eval (CodegenFallback): Spark's whole-stage codegen for
  * generators only covers the built-in CollectionGenerators; GenerateExec
  * still pipelines an interpreted Generator's iterator without
  * materializing its output, which is the property that matters here.
  * The per-chunk work is one Arrays.copyOfRange — there is nothing for
  * codegen to fuse.
  */
case class ChunkExplode(content: Expression, width: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(content, width)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkExplode =
    copy(content = newChildren(0), width = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (content.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"chunk content must be BINARY, got ${content.dataType.sql}")
    else if (width.dataType != IntegerType || !width.foldable)
      TypeCheckResult.TypeCheckFailure(
        "chunk width must be a constant INT")
    else {
      val n = width.eval(null)
      if (n == null || n.asInstanceOf[Int] <= 0)
        TypeCheckResult.TypeCheckFailure(
          s"chunk width must be positive, got $n")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def elementSchema: StructType = new StructType()
    .add("pos", LongType, nullable = false)
    .add("chunk", BinaryType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = content.eval(input).asInstanceOf[Array[Byte]]
    if (bytes == null || bytes.isEmpty) Iterator.empty
    else {
      val n = width.eval(input).asInstanceOf[Int]
      val total = (bytes.length.toLong + n - 1) / n
      new Iterator[InternalRow] {
        private var i = 0L
        override def hasNext: Boolean = i < total
        override def next(): InternalRow = {
          val start = (i * n).toInt
          val end = math.min(bytes.length.toLong, i * n + n).toInt
          val row = InternalRow(i,
            java.util.Arrays.copyOfRange(bytes, start, end))
          i += 1
          row
        }
      }
    }
  }
}
