package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** Native codegen'd vector expressions for the similarity/dedup hot paths.
  *
  * Spark's array higher-order functions (`aggregate`, `zip_with`) run
  * INTERPRETED — each element evaluation walks an expression tree and
  * boxes intermediates, and `zip_with` materializes a paired array per
  * row. For a 64-dim dot product evaluated 250k× per query (q48) that
  * interpretation tax dominates. These expressions compile the identical
  * arithmetic — same index order, same left-to-right double additions, so
  * results are BIT-IDENTICAL to the HOF spelling (proven in
  * `VectorExprsSpec`) and the DuckDB oracles keep matching — into a tight
  * primitive loop inside whole-stage codegen.
  */

/** Sequential-fold dot product of two double arrays:
  * `Σ_i a(i)*b(i)` accumulated left to right — the codegen'd twin of
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`. Null result when either
  * array is null, lengths differ, or any element is null (matching the
  * HOF spelling's null propagation). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<DOUBLE>, ARRAY<DOUBLE>), " +
        s"got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Integer squared L2 distance of two long arrays: `Σ_i (a(i)-b(i))²` —
  * the codegen'd twin of `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)),
  * 0L, _+_)` ([[graft.ops.Similarity.sqDistIntHof]]), the k-means
  * assignment hot loop (k distance evaluations per vector per
  * iteration). Pure integer arithmetic — exact equivalence with the HOF
  * spelling. Null on null array, length mismatch, or null element (the
  * [[DotProduct]] null contract). */
case class SqDistLong(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(t: DataType) = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<BIGINT>, ARRAY<BIGINT>), " +
        s"got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sqdist"

  override protected def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)
}

/** 16-bit SimHash of a bag of long feature hashes in ONE pass: bit j of
  * the result is set iff `Σ_h ((h>>j)&1)*2-1 >= 0`. The codegen'd twin of
  * the 16-fold `aggregate` vote spelling in `Dedup.simhash16` — pure
  * integer arithmetic, so exact equivalence (proven in `VectorExprsSpec`).
  * Null when the array is null or contains nulls. */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash16"

  override protected def nullSafeEval(hv: Any): Any = {
    val hs = hv.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Long](16)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null
      val h = hs.getLong(i)
      var j = 0
      while (j < 16) { votes(j) += ((h >> j) & 1L) * 2L - 1L; j += 1 }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 16) { if (votes(j) >= 0L) out |= 1L << j; j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val out = ctx.freshName("out")
      s"""
         |int $n = $hs.numElements();
         |long[] $votes = new long[16];
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($hs.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $h = $hs.getLong($i);
         |  for (int $j = 0; $j < 16; $j++) {
         |    $votes[$j] += (($h >> $j) & 1L) * 2L - 1L;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $out = 0L;
         |  for (int $j = 0; $j < 16; $j++) {
         |    if ($votes[$j] >= 0L) { $out |= 1L << $j; }
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** Array-at-a-time oracle-portable hash: every element of a string array
  * hashed to `hash31` (= first 15 md5 hex digits base-16, mod 2^31-1) in
  * ONE expression evaluation per row — the codegen'd twin of
  * `transform(arr, Hashing.hash31)`, whose HOF walk re-interprets the
  * md5/conv expression tree per element. Values are IDENTICAL (the 15
  * hex digits are the top 60 bits of the digest, read here directly from
  * the digest bytes; VectorExprsSpec proves equality). Null elements map
  * to null elements, like the HOF. */
case class ArrayHash31(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_hash31_array"

  /** Shared by eval and the generated code (one call per row). */
  def hashAll(av: ArrayData): ArrayData = {
    val md = ArrayHash31.mdLocal.get()
    val n = av.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!av.isNullAt(i)) {
        md.reset()
        val d = md.digest(av.getUTF8String(i).getBytes)
        // top 60 bits of the digest == parseLong(hex.substring(0, 15), 16)
        val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        out(i) = (top >>> 4) % graft.ops.Hashing.P31
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(av: Any): Any =
    hashAll(av.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("arrayHash31", this, classOf[ArrayHash31].getName)
      s"${ev.value} = $ref.hashAll($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayHash31 =
    copy(child = newChild)
}

object ArrayHash31 {
  private[plans] val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** hash31 every element of a string array into a boxed-long array
    * (null elements → null) — shared by the fused shingle/fraction
    * expressions. */
  private[plans] def hashTokens(arr: ArrayData): Array[java.lang.Long] = {
    val md = mdLocal.get()
    val len = arr.numElements()
    val hs = new Array[java.lang.Long](len)
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        hs(i) = java.lang.Long.valueOf((top >>> 4) % graft.ops.Hashing.P31)
      }
      i += 1
    }
    hs
  }
}

/** Repeated-window fraction over HASHED token windows in one pass:
  * `1 - distinct/total` of the mix31 hashes of every window of `n`
  * consecutive tokens taken at `stride` (with a trailing partial window
  * when `partial` — the tokenChunks shape; full windows only otherwise —
  * the bigram-bag shape). The hashed twin of
  * `repeatedFrac(tokenChunks/shingleBag(toks, n))`: building no window
  * STRINGS makes it an order of magnitude cheaper, and because the
  * oracle spells the identical hash (including any collision, which
  * merges the same two windows on both sides) the value is engine-exact.
  * Null when the array is null or `total` would be 0 (input shorter than
  * one full window with `partial=false`). */
case class RepeatedHashFrac(child: Expression, n: Int, stride: Int, partial: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING>, got $t")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_repeated_hash_frac"

  def frac(av: Any): Any = {
    val arr = av.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val hs = ArrayHash31.hashTokens(arr)
    val lastStart = if (partial) len - 1 else len - n
    if (lastStart < 0) return null
    val seen = new java.util.HashSet[java.lang.Long]()
    var total = 0L
    var start = 0
    while (start <= lastStart) {
      val w = math.min(n, len - start)
      var acc = 0L
      var ok = true
      var j = 0
      while (j < w && ok) {
        val h = hs(start + j)
        if (h == null) ok = false
        else acc = (acc * graft.ops.Hashing.MixA + h.longValue()) % graft.ops.Hashing.P31
        j += 1
      }
      seen.add(if (ok) java.lang.Long.valueOf(acc) else null)
      total += 1
      start += stride
    }
    1.0 - seen.size().toDouble / total
  }

  override protected def nullSafeEval(v: Any): Any = frac(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("repFrac", this, classOf[RepeatedHashFrac].getName)
      s"""
         |Object r = $ref.frac($c);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) r).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RepeatedHashFrac =
    copy(child = newChild)
}

/** All character n-gram `hash31`s of a string in one pass — the native
  * twin of `transform(sequence(1, len-n+1), i -> hash31(substr(text,i,n)))`
  * (`Dedup.charGramHashesHof`). Gram extraction uses UTF8String's own
  * `substringSQL`, i.e. exactly Spark's `substr` code-point semantics.
  * Defined for strings of at least n chars (callers filter shorter ones,
  * as the HOF twin's `sequence` would be descending there). */
case class CharGramHash31(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_chargram_hash31"

  def hashGrams(uv: Any): ArrayData = {
    val u = uv.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val md = ArrayHash31.mdLocal.get()
    val m = u.numChars() - n + 1
    val out = new Array[Any](math.max(m, 0))
    var i = 0
    while (i < m) {
      md.reset()
      val d = md.digest(u.substringSQL(i + 1, n).getBytes)
      val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      out(i) = (top >>> 4) % graft.ops.Hashing.P31
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = hashGrams(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("charGram", this, classOf[CharGramHash31].getName)
      s"${ev.value} = $ref.hashGrams($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharGramHash31 =
    copy(child = newChild)
}

/** Fused token-array → distinct shingle-hash array: md5-hash31 every
  * token ONCE into a local array, then mix each window of n consecutive
  * token hashes ([[graft.ops.Hashing.mix31]] fold) with first-occurrence
  * dedup — one expression call per row replacing the two-stage
  * `transform(toks, hash31)` → `shingleHashes` chain AND the
  * materialization between them (the PERF CONTRACT's reason to exist:
  * without a stored intermediate, the HOF chain re-hashes the whole
  * token array once per shingle). Values identical to the chain,
  * including a null token yielding null shingle hashes for the windows
  * covering it (proven in VectorExprsSpec). Callers filter inputs
  * shorter than n, as with the HOF twin. */
case class TokenShingleHash31(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_token_shingle_hash31"

  def shingle(av: Any): ArrayData = {
    val arr = av.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val hs = ArrayHash31.hashTokens(arr)
    val m = len - n + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var s = 0
    while (s < m) {
      var acc = 0L
      var ok = true
      var j = 0
      while (j < n && ok) {
        val h = hs(s + j)
        if (h == null) ok = false
        else acc = (acc * graft.ops.Hashing.MixA + h.longValue()) % graft.ops.Hashing.P31
        j += 1
      }
      seen.add(if (ok) java.lang.Long.valueOf(acc) else null)
      s += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator(); var o = 0
    while (it.hasNext) {
      val v = it.next()
      out(o) = if (v == null) null else v.longValue()
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = shingle(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("tokShingle", this, classOf[TokenShingleHash31].getName)
      s"${ev.value} = $ref.shingle($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TokenShingleHash31 =
    copy(child = newChild)
}

/** POSITIONAL 64-bit window hashes: element `i` is a 64-bit hash of the
  * `n`-token window starting at `i` (xxhash64 per token ONCE, then an
  * odd-multiplier polynomial fold over each window — full 64-bit ring, so
  * window equality is decided at the [[graft.ops.Hashing.fastHash]]
  * collision width, not the 31-bit one ADVICE r10 flagged). Output length
  * is `len − n + 1` (empty below `n`); a null token nulls every window
  * hash covering it, the [[TokenShingleHash31]] contract. One expression
  * call per row — the codegen replacement for the interpreted
  * `transform(starts, p => xxhash64(slice(toks, p+1, n)))` lambda storm,
  * which q158's window build measured as its dominant local cost. NOT
  * oracle-portable by design: the value is an internal grouping key
  * (grams never surface), so only equality semantics matter. */
case class TokenWindowHash64(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"window width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_token_window_hash64"

  /** Any odd 64-bit constant works; this is the splitmix64 increment. */
  private val MixA64 = 0x9e3779b97f4a7c15L

  def windows(av: Any): ArrayData = {
    val arr = av.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[java.lang.Long](len)
    var i = 0
    while (i < len) {
      hs(i) =
        if (arr.isNullAt(i)) null
        else java.lang.Long.valueOf(
          org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
            arr.getUTF8String(i), StringType, 42L))
      i += 1
    }
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      var acc = 0L
      var ok = true
      var j = 0
      while (j < n && ok) {
        val h = hs(s + j)
        if (h == null) ok = false
        else acc = acc * MixA64 + h.longValue()
        j += 1
      }
      out(s) = if (ok) acc else null
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = windows(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("tokWin", this, classOf[TokenWindowHash64].getName)
      s"${ev.value} = $ref.windows($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHash64 =
    copy(child = newChild)
}

/** Per-token xxhash64 (seed 42) of a string array — the SHARED first
  * stage of [[TokenWindowHash64]], split out so multi-width consumers
  * (q158's six Gopher widths) hash each token ONCE into a materialized
  * long column and fold every width from it with [[WindowFold64]].
  * Null tokens map to null hashes (the fold nulls their windows). */
case class TokenHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_token_hash64"

  def hashes(av: Any): ArrayData = {
    val arr = av.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val out = new Array[Any](len)
    var i = 0
    while (i < len) {
      out(i) =
        if (arr.isNullAt(i)) null
        else org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = hashes(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("tokHash", this, classOf[TokenHash64].getName)
      s"${ev.value} = $ref.hashes($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TokenHash64 =
    copy(child = newChild)
}

/** Positional window fold over PRE-HASHED tokens: element `s` is the
  * [[TokenWindowHash64]] polynomial fold of `n` consecutive long hashes
  * starting at `s` — so `WindowFold64(TokenHash64(toks), n)` ≡
  * `TokenWindowHash64(toks, n)` exactly (spec-proven), but a consumer
  * that needs several widths pays the string hashing once. Output
  * length `len − n + 1`; a null hash slot nulls its covering windows. */
case class WindowFold64(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"window width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<BIGINT>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_window_fold64"

  private val MixA64 = 0x9e3779b97f4a7c15L

  def windows(av: Any): ArrayData = {
    val arr = av.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      var acc = 0L
      var ok = true
      var j = 0
      while (j < n && ok) {
        if (arr.isNullAt(s + j)) ok = false
        else acc = acc * MixA64 + arr.getLong(s + j)
        j += 1
      }
      out(s) = if (ok) acc else null
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = windows(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("winFold", this, classOf[WindowFold64].getName)
      s"${ev.value} = $ref.windows($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): WindowFold64 =
    copy(child = newChild)
}

/** Winnowing fingerprints (distinct per-window minima, window w) in one
  * pass with a monotonic deque — O(len) vs the HOF twin's O(len·w)
  * slice-and-min walk (`Dedup.winnowFingerprintsHof`). Emission order is
  * window order with first-occurrence dedup, exactly `array_distinct` of
  * the per-window minima. Null when the array is null or contains null
  * elements — the same null contract as [[DotProduct]]/[[SimHash16]]
  * (a null hash slot must never be read as 0 and leak into emitted
  * fingerprints). */
case class WinnowMin(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<BIGINT>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow_min"

  /** Returns null (not an array) when any element is null. */
  def winnow(av: Any): ArrayData = {
    val a = av.asInstanceOf[ArrayData]
    val n = a.numElements()
    var c = 0
    while (c < n) { if (a.isNullAt(c)) return null; c += 1 }
    val m = n - w + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (m > 0) {
      // monotonic increasing deque of indices; head = min of current window
      val deque = new java.util.ArrayDeque[Int]()
      var i = 0
      while (i < n) {
        val v = a.getLong(i)
        while (!deque.isEmpty && a.getLong(deque.peekLast()) >= v) deque.pollLast()
        deque.addLast(i)
        if (deque.peekFirst() <= i - w) deque.pollFirst()
        if (i >= w - 1) seen.add(a.getLong(deque.peekFirst()))
        i += 1
      }
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator(); var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any = winnow(v)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowMin].getName)
      s"""
         |${ev.value} = $ref.winnow($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowMin =
    copy(child = newChild)
}
