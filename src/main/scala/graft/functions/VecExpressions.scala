package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY §2.9;
  * builder brief: "a native Catalyst `Expression` (with doGenCode)
  * beats a Scala UDF beats anything else").
  *
  * Spark's built-in route for vector math is higher-order functions
  * (`zip_with` + `aggregate`), which evaluate INTERPRETED — one lambda
  * dispatch and boxed accumulator per element per row. For ANN over
  * `array<float>` embeddings that overhead dominates the actual FLOPs,
  * and for LSH signatures the built-in formulation must also rehash the
  * (table, bit, dim) hyperplane per element per ROW even though it is
  * row-independent. These two expressions close exactly that gap and
  * nothing more; everything else in the engine stays on built-ins.
  */
object VecExpressions {

  private def checkNumericArray(dt: DataType, side: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$side must be array<float> or array<double>, got ${other.simpleString}")
    }

  private def getter(dt: DataType): String = dt match {
    case ArrayType(DoubleType, _) => "getDouble"
    case _ => "getFloat"
  }

  /** Dot product of two float/double vectors, accumulated left-to-right
    * in double — bit-identical to the `aggregate(zip_with(...))` built-in
    * formulation it replaces, INCLUDING its null semantics: a length
    * mismatch or any null element yields NULL (zip_with null-pads and
    * null poisons the fold), so corrupt/ragged embeddings are excluded
    * from similarity results rather than silently truncated.
    */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkNumericArray(left.dataType, "left") match {
        case TypeCheckResult.TypeCheckSuccess =>
          checkNumericArray(right.dataType, "right")
        case f => f
      }
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      val xd = left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
      val yd = right.dataType.asInstanceOf[ArrayType].elementType == DoubleType
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xv = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
        val yv = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
        s += xv * yv
        i += 1
      }
      s
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val gx = getter(left.dataType)
      val gy = getter(right.dataType)
      nullSafeCodeGen(ctx, ev, (a, b) => {
        // fresh names: several VecDots (cosine = 3) can share one
        // codegen scope; fixed locals would collide and kick the whole
        // stage back to interpreted execution
        val n = ctx.freshName("vdN")
        val acc = ctx.freshName("vdAcc")
        val i = ctx.freshName("vdI")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) { ${ev.isNull} = true; }
           |double $acc = 0.0;
           |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
           |  else { $acc += (double) $a.$gx($i) * (double) $b.$gy($i); }
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Popcount of the bitwise AND of two `array<bigint>` bitmaps — the
    * set-intersection cardinality for dense bitmap-encoded sets (the
    * exact-Jaccard verify kernel in [[graft.ext.DocDedup]]). Null
    * semantics mirror [[VecDot]]: a length mismatch or null element
    * yields NULL. As a codegen'd primitive loop over `ArrayData` it
    * avoids the per-row Seq[Long] boxing a Scala UDF pays — at 10⁷
    * candidate pairs that conversion dominates the actual popcounts.
    */
  case class BitmapAndCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    private def checkLongArray(dt: DataType, side: String): TypeCheckResult =
      dt match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$side must be array<bigint>, got ${other.simpleString}")
      }
    override def checkInputDataTypes(): TypeCheckResult =
      checkLongArray(left.dataType, "left") match {
        case TypeCheckResult.TypeCheckSuccess =>
          checkLongArray(right.dataType, "right")
        case f => f
      }
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var c = 0L
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        c += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
        i += 1
      }
      c
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("bcN")
        val acc = ctx.freshName("bcAcc")
        val i = ctx.freshName("bcI")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) { ${ev.isNull} = true; }
           |long $acc = 0L;
           |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
           |  else { $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i)); }
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** `bits`-bit random-hyperplane LSH signature of a float vector for
    * table `table` (Charikar '02 sign-random-projection): bit j =
    * sign(Σ_d ±v[d]), the ± drawn from xxhash64(table, j, d) — the SAME
    * chained-int hash the Column formulation used, so signatures are
    * bit-identical to it. The hyperplane sign matrix depends only on
    * (table, bits, dim), so it is computed once per executor per dim
    * and cached — the built-in formulation rehashed it per element per
    * row. Codegen emits one virtual call into [[computeSig]]'s tight
    * primitive loop (via addReferenceObj), keeping the projection
    * inside the whole-stage pipeline.
    */
  case class VecLshSignature(child: Expression, bits: Int, table: Int)
      extends UnaryExpression {
    require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      checkNumericArray(child.dataType, "input")

    @transient private lazy val signCache =
      new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Float]]]()

    private def signs(dim: Int): Array[Array[Float]] =
      signCache.computeIfAbsent(dim, _ => {
        val tableSeed = XXH64.hashInt(table, 42L)
        Array.tabulate(bits, dim) { (j, d) =>
          val h = XXH64.hashInt(d, XXH64.hashInt(j, tableSeed))
          if ((h & 1L) == 0L) 1.0f else -1.0f
        }
      })

    @transient private lazy val isDouble =
      child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

    /** Boxed so a null ELEMENT can poison the whole signature to NULL —
      * the same semantics as the `aggregate(zip_with(...))` Column
      * formulation this expression replaced (a corrupt/ragged embedding
      * must drop out of LSH bucketing, exactly as it drops out of
      * [[VecDot]]-based verification — never hash as if its nulls were
      * zeros).
      */
    def computeSig(arr: ArrayData): java.lang.Long = {
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null
        i += 1
      }
      val sg = signs(n)
      var result = 0L
      var j = 0
      while (j < bits) {
        val row = sg(j)
        var s = 0.0
        i = 0
        while (i < n) {
          val v = if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
          s += v * row(i)
          i += 1
        }
        if (s > 0) result |= 1L << j
        j += 1
      }
      result
    }

    override def nullSafeEval(input: Any): Any =
      computeSig(input.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftLsh", this,
        classOf[VecLshSignature].getName)
      nullSafeCodeGen(ctx, ev, c => {
        val sig = ctx.freshName("lshSig")
        s"""
           |java.lang.Long $sig = $ref.computeSig($c);
           |if ($sig == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $sig.longValue(); }
           |""".stripMargin
      })
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `numHashes` MinHash minima of a shingle array, as ONE projection —
    * no explode, no shuffle, no `numHashes`-wide aggregate. Sound
    * because MinHash over a multiset equals MinHash over its set (min is
    * idempotent under duplicates), so the per-doc distinct the exploded
    * formulation needed is unnecessary here. h_j(s) = mix(xxh64(s), j):
    * each shingle is hashed ONCE and the per-permutation values derive
    * from cheap long-mixing — 128 permutations cost 1 string hash + 128
    * `hashLong`s per element, not 128 string hashes. Replaces the
    * 128-wide min-aggregate whose generated code dominated
    * [[graft.ext.DocDedup.minHashPairs]]'s runtime (round-4 verdict,
    * "What's wrong" #3).
    *
    * NULL for a null/empty array or any null element — callers' banding
    * explode then drops the doc, matching the exploded form where a
    * shingle-less doc simply had no rows.
    */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression {
    require(numHashes >= 1 && numHashes <= 4096,
      s"numHashes must be in [1,4096], got $numHashes")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"input must be array<string>, got ${other.simpleString}")
      }

    @transient private lazy val seeds: Array[Long] =
      Array.tabulate(numHashes)(j => XXH64.hashInt(j, 42L))

    def compute(arr: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
      val n = arr.numElements()
      if (n == 0) return null
      val mins = Array.fill(numHashes)(Long.MaxValue)
      val sds = seeds
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null
        val s = arr.getUTF8String(i)
        val base = XXH64.hashUTF8String(s, 42L)
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashLong(base, sds(j))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftMinhash", this,
        classOf[MinHashSig].getName)
      nullSafeCodeGen(ctx, ev, c => {
        val sig = ctx.freshName("mhSig")
        s"""
           |org.apache.spark.sql.catalyst.util.GenericArrayData $sig =
           |  $ref.compute($c);
           |if ($sig == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $sig; }
           |""".stripMargin
      })
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Banded MinHash signatures in one native call: computes the
    * `bands·rows` MinHash minima (exactly as [[MinHashSig]]) and
    * returns the `bands` per-band signatures — band b = chained
    * xxh64-fold over its `rows` minima. Exists because the Column
    * formulation (an `array(...)` of `bands` × `xxhash64(slice(...))`
    * expressions) generated code whose one-time compilation dominated
    * the whole LSH stage (~7 s at 5000 rows); one virtual call into a
    * tight loop replaces all of it. NULL propagation as [[MinHashSig]].
    */
  case class MinHashBandSigs(child: Expression, bands: Int, rows: Int)
      extends UnaryExpression {
    require(bands >= 1 && rows >= 1 && bands * rows <= 4096,
      s"bands*rows must be in [1,4096], got $bands*$rows")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"input must be array<string>, got ${other.simpleString}")
      }

    @transient private lazy val inner = MinHashSig(child, bands * rows)

    def compute(arr: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
      val mins = inner.compute(arr)
      if (mins == null) return null
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var h = 42L
        var r = 0
        while (r < rows) {
          h = XXH64.hashLong(mins.getLong(b * rows + r), h)
          r += 1
        }
        out(b) = h
        b += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftMinhashBands", this,
        classOf[MinHashBandSigs].getName)
      nullSafeCodeGen(ctx, ev, c => {
        val sig = ctx.freshName("mhBands")
        s"""
           |org.apache.spark.sql.catalyst.util.GenericArrayData $sig =
           |  $ref.compute($c);
           |if ($sig == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $sig; }
           |""".stripMargin
      })
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** name → (info, builder), the shape SparkSessionExtensions.injectFunction
    * and FunctionRegistry.registerFunction share.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "graft_vec_dot"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))),
    (FunctionIdentifier("graft_vec_lsh_sig"),
      new ExpressionInfo(classOf[VecLshSignature].getName, "graft_vec_lsh_sig"),
      (es: Seq[Expression]) => VecLshSignature(es(0),
        litInt(es(1), "bits"), litInt(es(2), "table"))),
    (FunctionIdentifier("graft_bitmap_and_count"),
      new ExpressionInfo(classOf[BitmapAndCount].getName, "graft_bitmap_and_count"),
      (es: Seq[Expression]) => BitmapAndCount(es(0), es(1))),
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (es: Seq[Expression]) => MinHashSig(es(0), litInt(es(1), "numHashes"))),
    (FunctionIdentifier("graft_minhash_band_sigs"),
      new ExpressionInfo(classOf[MinHashBandSigs].getName, "graft_minhash_band_sigs"),
      (es: Seq[Expression]) => MinHashBandSigs(es(0),
        litInt(es(1), "bands"), litInt(es(2), "rows"))),
    (FunctionIdentifier("graft_chunk_explode"),
      new ExpressionInfo(classOf[graft.sources.ChunkExplode].getName,
        "graft_chunk_explode"),
      (es: Seq[Expression]) => graft.sources.ChunkExplode(es(0), es(1))),
    (FunctionIdentifier("graft_word_bigrams"),
      new ExpressionInfo(classOf[TextExpressions.WordBigrams].getName,
        "graft_word_bigrams"),
      (es: Seq[Expression]) => TextExpressions.WordBigrams(es(0))),
    (FunctionIdentifier("graft_char_chunks"),
      new ExpressionInfo(classOf[TextExpressions.CharChunks].getName,
        "graft_char_chunks"),
      (es: Seq[Expression]) => TextExpressions.CharChunks(es(0),
        litInt(es(1), "n"))),
    (FunctionIdentifier("graft_char_ngrams"),
      new ExpressionInfo(classOf[TextExpressions.CharNgrams].getName,
        "graft_char_ngrams"),
      (es: Seq[Expression]) => TextExpressions.CharNgrams(es(0),
        litInt(es(1), "n"))),
    (FunctionIdentifier("graft_window_hashes"),
      new ExpressionInfo(classOf[TextExpressions.WindowHashes].getName,
        "graft_window_hashes"),
      (es: Seq[Expression]) => TextExpressions.WindowHashes(es(0),
        litInt(es(1), "w"))),
    // Spark's own runtime-filter sketch pair, surfaced as callable
    // functions (BloomMembership wraps them): the aggregate builds a
    // partial/merge-combining sketch over pre-hashed (xxhash64, long)
    // keys; the probe tests a serialized sketch literal, codegen'd.
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (es: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(es(0), es(1), es(2))),
    (FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_might_contain"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(es(0), es(1))),
    (FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(
        classOf[CountMinFrequency.CmsEstimate].getName, "graft_cms_estimate"),
      (es: Seq[Expression]) => CountMinFrequency.CmsEstimate(es(0), es(1))),
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(
        classOf[TextExpressions.NfcNormalize].getName, "graft_nfc"),
      (es: Seq[Expression]) => TextExpressions.NfcNormalize(es(0))),
    (FunctionIdentifier("graft_byte_stats"),
      new ExpressionInfo(
        classOf[TextExpressions.ByteStats].getName, "graft_byte_stats"),
      (es: Seq[Expression]) => TextExpressions.ByteStats(es(0))),
    (FunctionIdentifier("graft_normalize_url"),
      new ExpressionInfo(
        classOf[TextExpressions.NormalizeUrl].getName, "graft_normalize_url"),
      (es: Seq[Expression]) => TextExpressions.NormalizeUrl(es(0))),
    (FunctionIdentifier("graft_gopher_signals"),
      new ExpressionInfo(
        classOf[TextExpressions.GopherSignals].getName,
        "graft_gopher_signals"),
      (es: Seq[Expression]) => TextExpressions.GopherSignals(es(0))))

  /** Idempotently register the functions in an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident))
        registry.registerFunction(ident, info, builder)
    }
  }
}

/** Config-time injection: `spark.sql.extensions=graft.functions.GraftExtensions`
  * makes the vector functions available in every session of the app.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    VecExpressions.functions.foreach(ext.injectFunction)
}
