package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch frequency estimation — the sketch that answers
  * "how often does this token/key occur corpus-wide?" in O(1) per probe
  * from a few-hundred-KB summary, where the exact answer needs a full
  * groupBy over the corpus. The 100 TB uses: heavy-hitter candidate
  * checks, frequency-band filters at scan speed (e.g. drop docs
  * dominated by ultra-common boilerplate tokens), and join-free
  * enrichment of any row stream with approximate counts.
  *
  * Error model (Cormode & Muthukrishnan 2005): estimates NEVER
  * undercount (every estimate ≥ true count — collisions only add), and
  * with depth d = ⌈ln(1/δ)⌉, width w = ⌈e/ε⌉ the overcount is ≤ ε·N
  * with probability ≥ 1−δ (N = total insertions). Both sides of that
  * contract are falsifiable cross-engine, which is exactly what the
  * q80 gate checks against DuckDB's exact counts.
  *
  * Build is Spark's own `DataFrameStatFunctions.countMinSketch` — a
  * distributed `treeAggregate` of per-partition sketches merged by
  * cell-wise addition (CMS is a linear sketch, so partial/merge is
  * exact). Probe is a native codegen'd expression over the serialized
  * sketch literal: deserialized once per task via `addReferenceObj`,
  * one murmur-hash row probe per call, inside whole-stage codegen.
  */
object CountMinFrequency {

  /** Distributed CMS build over a string key column.
    *
    * @param eps        relative error bound (overcount ≤ eps·N w.h.p.)
    * @param confidence 1−δ for that bound
    */
  def buildSketch(df: DataFrame, key: Column, eps: Double,
                  confidence: Double, seed: Int): CountMinSketch = {
    require(eps > 0 && eps < 1, s"eps must be in (0,1), got $eps")
    require(confidence > 0 && confidence < 1,
      s"confidence must be in (0,1), got $confidence")
    df.select(key.cast("string").as("k")).stat
      .countMinSketch("k", eps, confidence, seed)
  }

  /** Estimated occurrence count of `key` (string) under `sketch` —
    * a codegen'd per-row probe of the broadcast-literal sketch.
    */
  def estimate(sketch: CountMinSketch, key: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(VecExpressions.register)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      sketch.writeTo(bos)
      bos.toByteArray
    }
    call_function("graft_cms_estimate", lit(bytes), key.cast("string"))
  }

  /** `estimateCount` over a serialized CMS literal. The sketch
    * deserializes lazily once per task (the deserialized object rides
    * into generated code via `addReferenceObj`, like
    * [[VecExpressions.VecLshSignature]]'s sign matrix); each row then
    * pays d murmur hashes — no boxing, no UDF boundary.
    *
    * Probes hash the raw UTF-8 bytes of the key, matching what the
    * build side inserted for string columns (`CountMinSketch.add` on
    * `String` values — byte-identical content, so build and probe
    * agree on every cell).
    */
  case class CmsEstimate(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"expected (binary sketch, string key), got " +
            s"(${l.simpleString}, ${r.simpleString})")
      }
    require(left.foldable, "sketch must be a literal")

    @transient private lazy val sketch: CountMinSketch = {
      val bytes = left.eval(null).asInstanceOf[Array[Byte]]
      CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    }

    /** Probe entry shared by interpreted eval and generated code. */
    def probe(key: UTF8String): Long =
      sketch.estimateCount(key.getBytes)

    override def nullSafeEval(s: Any, k: Any): Any =
      probe(k.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("cmsEstimate", this,
        classOf[CmsEstimate].getName)
      nullSafeCodeGen(ctx, ev, (_, k) => s"${ev.value} = $self.probe($k);")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }
}
