package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-shingling expressions (SURVEY §2.9). Companion to
  * [[VecExpressions]]: the shingle PRODUCER for the near-dup family
  * (exact Jaccard, MinHash LSH — [[graft.ext.DocDedup]]).
  *
  * Why native: the Column formulation of word bigrams is a higher-order
  * function (`zip_with` over two `slice`s), and Spark HOFs never
  * participate in codegen — every consumer stage falls back to
  * interpreted `InvokeLike` eval at exactly the hottest projection of
  * the text pipeline. Worse, the interpreted-eval call sites are shared
  * JVM-wide, so a long-lived session running many DIFFERENT lambdas
  * (a benchmark, a notebook, a multi-tenant cluster) degrades them to
  * megamorphic dispatch — the same query measurably slows down as
  * unrelated queries run (round-8 finding; see NOTES_r08). A dedicated
  * expression with `doGenCode` is immune on both counts: one
  * monomorphic call into a primitive byte loop, inside the whole-stage
  * pipeline.
  */
object TextExpressions {

  /** Word-bigram shingles, bit-identical to the Column formulation
    * `zip_with(slice(t,1,n-1), slice(t,2,n-1), (a,b) => concat(a," ",b))`
    * with `t = split(text, " ")` (trailing empties kept, Java
    * `split(..., -1)` semantics). Key observation making one byte scan
    * sufficient: with a single-space delimiter, `token(i) + " " +
    * token(i+1)` is exactly the SUBSTRING of the original text from the
    * start of token i to the end of token i+1 — so bigram j is the span
    * between the spaces bracketing space j, and the result views share
    * the input's byte array (zero per-shingle copies; the consumer's
    * UnsafeProjection does the one copy it always does). A space byte
    * (0x20) never occurs inside a UTF-8 multibyte sequence, so the byte
    * scan is multibyte-safe.
    */
  case class WordBigrams(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"input must be string, got ${other.simpleString}")
    }

    def compute(s: UTF8String): ArrayData = {
      val bytes = s.getBytes
      val len = bytes.length
      var m = 0
      var i = 0
      while (i < len) {
        if (bytes(i) == 0x20) m += 1
        i += 1
      }
      if (m == 0) return new GenericArrayData(Array.empty[Any])
      val spaces = new Array[Int](m)
      var k = 0
      i = 0
      while (i < len) {
        if (bytes(i) == 0x20) { spaces(k) = i; k += 1 }
        i += 1
      }
      val out = new Array[Any](m)
      var j = 0
      while (j < m) {
        val start = if (j == 0) 0 else spaces(j - 1) + 1
        val end = if (j + 1 < m) spaces(j + 1) else len
        out(j) = UTF8String.fromBytes(bytes, start, end - start)
        j += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftBigrams", this,
        classOf[WordBigrams].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Fixed-size CHARACTER chunks of a string, bit-identical to the
    * Column formulation `transform(sequence(1, length(text), n),
    * s => text.substr(s, n))` (with its empty-text guard) — but LINEAR
    * in the text length. The built-in form is quadratic: `substr` by
    * char index re-walks the string from byte 0 on every call (UTF-8
    * offsets aren't random-access), so a 1 MB document pays
    * O(L²/n) byte steps across its chunks — ~16G for 64-char chunks.
    * One walk here collects the chunk-boundary byte offsets; each chunk
    * is a zero-copy view of its byte range.
    */
  case class CharChunks(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"chunk size must be positive, got $n")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"input must be string, got ${other.simpleString}")
    }

    def compute(s: UTF8String): ArrayData = {
      val bytes = s.getBytes
      val len = bytes.length
      if (len == 0) return new GenericArrayData(Array.empty[Any])
      // First pass: byte offsets where a chunk starts (char index ≡ 0
      // mod n). Walk char-by-char; multibyte sequences advance by their
      // UTF-8 width.
      var count = 0
      var i = 0
      var c = 0
      while (i < len) {
        if (c % n == 0) count += 1
        i += UTF8String.numBytesForFirstByte(bytes(i))
        c += 1
      }
      val starts = new Array[Int](count)
      var k = 0
      i = 0
      c = 0
      while (i < len) {
        if (c % n == 0) { starts(k) = i; k += 1 }
        i += UTF8String.numBytesForFirstByte(bytes(i))
        c += 1
      }
      val out = new Array[Any](count)
      var j = 0
      while (j < count) {
        val end = if (j + 1 < count) starts(j + 1) else len
        out(j) = UTF8String.fromBytes(bytes, starts(j), end - starts(j))
        j += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftCharChunks", this,
        classOf[CharChunks].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Sliding character n-gram windows, bit-identical to the Column
    * formulation `transform(sequence(1, greatest(L-(n-1), 1)),
    * s => substr(s, n))` — max(L-n+1, 1) grams, the final ones
    * truncated, a single empty gram for empty input. Same linearity
    * argument as [[CharChunks]]: the substr form re-walks the string
    * per gram (O(L²) per doc); one offset-collecting walk here, each
    * gram a zero-copy view.
    */
  case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, s"n-gram size must be positive, got $n")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"input must be string, got ${other.simpleString}")
    }

    def compute(s: UTF8String): ArrayData = {
      val bytes = s.getBytes
      val len = bytes.length
      // char-start byte offsets, with the end sentinel at offs(chars)
      var chars = 0
      var i = 0
      while (i < len) {
        i += UTF8String.numBytesForFirstByte(bytes(i))
        chars += 1
      }
      val offs = new Array[Int](chars + 1)
      i = 0
      var c = 0
      while (i < len) {
        offs(c) = i
        i += UTF8String.numBytesForFirstByte(bytes(i))
        c += 1
      }
      offs(chars) = len
      val count = math.max(chars - (n - 1), 1)
      val out = new Array[Any](count)
      var j = 0
      while (j < count) {
        val end = offs(math.min(j + n, chars))
        out(j) = UTF8String.fromBytes(bytes, offs(j), end - offs(j))
        j += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftCharNgrams", this,
        classOf[CharNgrams].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private val HexDigits = "0123456789abcdef".getBytes("US-ASCII")

  private val Md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private def md5Hex(bytes: Array[Byte], start: Int, len: Int): UTF8String = {
    val md = Md5Local.get()
    md.reset()
    md.update(bytes, start, len)
    val d = md.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** md5 hex of every `w`-token sliding window, bit-identical to the
    * Column formulation `transform(sequence(1, n-w+1), i ->
    * md5(concat_ws(" ", slice(t, i, w))))` over `t = split(text, " ")`
    * (empties kept) with the n ≥ w guard. The [[WordBigrams]] span
    * argument generalizes to any width: with a single-space delimiter
    * the space-joined window IS the substring from the start of token
    * j to the end of token j+w−1 — so each window digests a byte RANGE
    * of the input directly (no token materialization, no join, no
    * per-window string allocation beyond the 32-byte digest). md5 —
    * not xxhash64 — keeps the hash engine-portable: DuckDB computes
    * the identical hex digest, which is what lets the duplicate-window
    * detector (CorpusPrep.duplicateWindows) carry an exact
    * cross-engine oracle.
    */
  case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {
    require(w >= 1, s"window width must be positive, got $w")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"input must be string, got ${other.simpleString}")
    }

    def compute(s: UTF8String): ArrayData = {
      val bytes = s.getBytes
      val len = bytes.length
      var m = 0
      var i = 0
      while (i < len) {
        if (bytes(i) == 0x20) m += 1
        i += 1
      }
      val count = (m + 1) - w + 1 // tokens − w + 1
      if (count <= 0) return new GenericArrayData(Array.empty[Any])
      val spaces = new Array[Int](m)
      var k = 0
      i = 0
      while (i < len) {
        if (bytes(i) == 0x20) { spaces(k) = i; k += 1 }
        i += 1
      }
      val out = new Array[Any](count)
      var j = 0
      while (j < count) {
        val start = if (j == 0) 0 else spaces(j - 1) + 1
        val endTok = j + w - 1
        val end = if (endTok == m) len else spaces(endTok)
        out(j) = md5Hex(bytes, start, end - start)
        j += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftWindowHashes", this,
        classOf[WindowHashes].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Unicode NFC normalization (UAX #15 canonical composition) — the
    * corpus-prep step that makes exact dedup robust to encoding-level
    * twins: "é" as U+00E9 and as "e" + U+0301 are different byte
    * strings with identical rendering, so un-normalized hashing treats
    * a re-encoded document as new. Wraps `java.text.Normalizer`
    * (the JDK's ICU-derived implementation of the same spec DuckDB's
    * `nfc_normalize` follows, which is what makes q90 an exact
    * cross-engine gate). The common case — pure-ASCII input — is
    * detected with a byte scan and returns the input UTF8String
    * untouched (ASCII is NFC-invariant), so corpus-scale cost is one
    * branch per row; only rows with non-ASCII bytes pay the
    * String round-trip.
    */
  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"input must be string, got ${other.simpleString}")
    }
    def compute(s: UTF8String): UTF8String = NfcNormalize.normalize(s)
    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String])
    // addReferenceObj, NOT a `Module.MODULE$` call: janino cannot
    // resolve `TextExpressions.NfcNormalize$` (the mirror class has no
    // member classes), so the MODULE$ form failed to compile and
    // silently fell back to interpreted eval — caught in the round-9
    // bench log, latent since round 8
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("nfcNormalize", this,
        classOf[NfcNormalize].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object NfcNormalize {
    /** Shared by interpreted eval and generated code. */
    def normalize(s: UTF8String): UTF8String = {
      val bytes = s.getBytes
      var i = 0
      var ascii = true
      while (ascii && i < bytes.length) {
        if (bytes(i) < 0) ascii = false
        i += 1
      }
      if (ascii) s
      else UTF8String.fromString(java.text.Normalizer.normalize(
        s.toString, java.text.Normalizer.Form.NFC))
    }
  }

  /** URL canonicalization — the identity under which a web corpus is
    * deduplicated before any content pass (the same page is crawled as
    * `HTTP://Host/x`, `http://host/x/`, `http://host/x?utm_source=…`,
    * `http://host:80/x#frag`, …). One deterministic pure function:
    *
    *   1. trim; pass through unchanged if there is no valid
    *      `scheme://` prefix (a non-URL string must not be mangled);
    *   2. lowercase scheme and authority; drop the default port
    *      (`:80` for http, `:443` for https);
    *   3. empty path → `/`; otherwise strip all trailing slashes from
    *      a non-root path (a fixed point, so canon∘canon = canon);
    *   4. drop the fragment;
    *   5. query: split on `&`, drop empty params and tracking params
    *      (name case-insensitively `utm_[a-z0-9]+`, `fbclid`,
    *      `gclid`), sort the survivors bytewise, rejoin — so
    *      param-order permutations collide;
    *   6. reassemble; a query with no surviving params contributes
    *      nothing (no bare `?`).
    *
    * Param sort is Java lexicographic (UTF-16 code units) ≡ bytewise
    * for ASCII, which percent-encoded query strings are by
    * construction. Codegen'd via the shared static (same shape as
    * [[NfcNormalize]]); q100 gates it against an INDEPENDENT DuckDB
    * restatement (regexp part extraction + list_filter/list_sort), a
    * true cross-implementation check.
    */
  case class NormalizeUrl(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"input must be string, got ${other.simpleString}")
    }
    def compute(s: UTF8String): UTF8String = NormalizeUrl.normalize(s)
    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String])
    // addReferenceObj pattern — see NfcNormalize.doGenCode
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("normalizeUrl", this,
        classOf[NormalizeUrl].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object NormalizeUrl {
    /** Shared by interpreted eval and generated code. */
    def normalize(s: UTF8String): UTF8String = {
      val out = canon(s.toString)
      UTF8String.fromString(out)
    }

    def canon(raw: String): String = {
      val u = raw.trim
      val se = u.indexOf("://")
      if (se <= 0) return u
      // whitespace is invalid inside a URL (RFC 3986); treat such
      // strings as non-URLs and pass them through rather than produce
      // a "normalized" form that can end in trimmable whitespace —
      // which would break idempotence (canon∘canon ≠ canon), the
      // property the dedup identity depends on (PropertySpec)
      var wi = 0
      while (wi < u.length) {
        val c = u.charAt(wi)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') return u
        wi += 1
      }
      var i = 0
      var schemeOk = isAsciiLetter(u.charAt(0))
      i = 1
      while (schemeOk && i < se) {
        val c = u.charAt(i)
        schemeOk = isAsciiLetter(c) || (c >= '0' && c <= '9') ||
          c == '+' || c == '-' || c == '.'
        i += 1
      }
      if (!schemeOk) return u
      val scheme = u.substring(0, se).toLowerCase(java.util.Locale.ROOT)
      val rest = u.substring(se + 3)
      var ae = 0
      while (ae < rest.length && rest.charAt(ae) != '/' &&
        rest.charAt(ae) != '?' && rest.charAt(ae) != '#') ae += 1
      var auth = rest.substring(0, ae).toLowerCase(java.util.Locale.ROOT)
      if (scheme == "http" && auth.endsWith(":80"))
        auth = auth.substring(0, auth.length - 3)
      else if (scheme == "https" && auth.endsWith(":443"))
        auth = auth.substring(0, auth.length - 4)
      val tail = rest.substring(ae)
      val he = tail.indexOf('#')
      val noFrag = if (he >= 0) tail.substring(0, he) else tail
      val qi = noFrag.indexOf('?')
      var path = if (qi >= 0) noFrag.substring(0, qi) else noFrag
      if (path.isEmpty) path = "/"
      // ALL trailing slashes, not one: stripping just one made
      // "/a//" → "/a/" → "/a" across passes — non-idempotent
      // (PropertySpec caught it), and the dedup identity must be a
      // fixed point
      while (path.length > 1 && path.charAt(path.length - 1) == '/')
        path = path.substring(0, path.length - 1)
      val sb = new java.lang.StringBuilder(u.length)
      sb.append(scheme).append("://").append(auth).append(path)
      if (qi >= 0) {
        val kept = noFrag.substring(qi + 1).split("&", -1)
          .filter(p => p.nonEmpty && !isTracking(p))
        if (kept.nonEmpty) {
          java.util.Arrays.sort(kept.asInstanceOf[Array[AnyRef]])
          sb.append('?')
          var j = 0
          while (j < kept.length) {
            if (j > 0) sb.append('&')
            sb.append(kept(j))
            j += 1
          }
        }
      }
      sb.toString
    }

    private def isAsciiLetter(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

    private def isTracking(p: String): Boolean = {
      val eq = p.indexOf('=')
      val name = (if (eq >= 0) p.substring(0, eq) else p)
        .toLowerCase(java.util.Locale.ROOT)
      name == "fbclid" || name == "gclid" ||
        (name.length > 4 && name.startsWith("utm_") &&
          name.substring(4).forall(c =>
            (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')))
    }
  }

  /** The Gopher filter's four integer signals in ONE byte scan:
    * `(n_words, n_sym, n_alpha, n_stop)`. The Column formulation costs
    * two interpreted HOF `filter` lambdas plus a `regexp_extract_all`
    * per document — ~400M lambda invocations on a 5M-doc probe, 14.4 s
    * of the web-prep probe's wall — where one scan is arithmetic:
    *
    *   - `n_words` = spaces + 1 (split-on-single-space semantics,
    *     empties kept — the [[graft.ext.TextAnalysis.tokens]] contract);
    *   - `n_sym` counts `#` and non-overlapping `...` left-to-right,
    *     exactly the regex `#|\.\.\.`'s match walk;
    *   - `n_alpha` = tokens containing an ASCII letter (UTF-8
    *     continuation bytes are ≥ 0x80, so the byte test is
    *     multibyte-safe);
    *   - `n_stop` = tokens byte-equal to one of the paper's eight
    *     stopwords (the, be, to, of, and, that, have, with).
    *
    * Mean word length needs no signal: `length(text) = Σlen + n − 1`
    * (the join identity) keeps it in the caller.
    */
  case class GopherSignals(child: Expression) extends UnaryExpression {
    override def dataType: DataType = GopherSignals.schema
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"input must be string, got ${other.simpleString}")
    }
    def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow =
      GopherSignals.signals(s.getBytes)
    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("gopherSignals", this,
        classOf[GopherSignals].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object GopherSignals {
    val schema: StructType = StructType(Seq(
      StructField("n_words", LongType, nullable = false),
      StructField("n_sym", LongType, nullable = false),
      StructField("n_alpha", LongType, nullable = false),
      StructField("n_stop", LongType, nullable = false)))

    private val STOPS: Array[Array[Byte]] =
      Array("the", "be", "to", "of", "and", "that", "have", "with")
        .map(_.getBytes("US-ASCII"))

    def signals(b: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
      val n = b.length
      var words = 1L
      var sym = 0L
      var alpha = 0L
      var stop = 0L
      // one pass for the symbol walk (regex-identical advance)
      var i = 0
      while (i < n) {
        val c = b(i)
        if (c == '#') { sym += 1; i += 1 }
        else if (c == '.' && i + 2 < n && b(i + 1) == '.' && b(i + 2) == '.') {
          sym += 1; i += 3
        } else i += 1
      }
      // one pass over tokens
      var start = 0
      i = 0
      while (i <= n) {
        if (i == n || b(i) == 0x20) {
          if (i < n) words += 1
          var hasAlpha = false
          var j = start
          while (!hasAlpha && j < i) {
            val c = b(j)
            hasAlpha = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
            j += 1
          }
          if (hasAlpha) alpha += 1
          val len = i - start
          var k = 0
          var isStop = false
          while (!isStop && k < STOPS.length) {
            val w = STOPS(k)
            if (w.length == len) {
              var m = 0
              while (m < len && b(start + m) == w(m)) m += 1
              isStop = m == len
            }
            k += 1
          }
          if (isStop) stop += 1
          start = i + 1
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](words, sym, alpha, stop))
    }
  }

  /** Byte-level distribution stats in ONE scan — the junk detector's
    * inputs: `(n_bytes, n_distinct, top_count, entropy)`. Shannon
    * entropy (log₂, in bits/byte) separates text (~4–5) from
    * compressed/encrypted junk (~8) and from degenerate padding (~0) —
    * the standard scan-speed filter before paying tokenization for a
    * blob. A 256-cell histogram on the stack, summation in ascending
    * byte order (deterministic), no allocation beyond the output row.
    */
  case class ByteStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ByteStats.schema
    override def nullable: Boolean = child.nullable
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"input must be string or binary, got ${other.simpleString}")
    }
    @transient private lazy val isString = child.dataType == StringType
    def compute(input: Any): org.apache.spark.sql.catalyst.InternalRow = {
      val bytes =
        if (isString) input.asInstanceOf[UTF8String].getBytes
        else input.asInstanceOf[Array[Byte]]
      ByteStats.stats(bytes)
    }
    override def nullSafeEval(input: Any): Any = compute(input)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("byteStats", this,
        classOf[ByteStats].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object ByteStats {
    val schema: StructType = StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("top_count", LongType, nullable = false),
      StructField("entropy", DoubleType, nullable = false)))

    private val LOG2 = math.log(2.0)

    def stats(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
      val hist = new Array[Long](256)
      var i = 0
      while (i < bytes.length) {
        hist(bytes(i) & 0xFF) += 1
        i += 1
      }
      val n = bytes.length.toLong
      var distinct = 0L
      var top = 0L
      var entropy = 0.0
      var b = 0
      while (b < 256) {
        val c = hist(b)
        if (c > 0) {
          distinct += 1
          if (c > top) top = c
          val p = c.toDouble / n
          entropy -= p * (math.log(p) / LOG2)
        }
        b += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](n, distinct, top, if (n == 0) 0.0 else entropy))
    }
  }
}
