package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-hashing kernels for dedup at scale.
  *
  * The pure-HOF forms in [[Text]] (nested `transform`/`zip_with`/`aggregate`)
  * are correct but interpreted — on a 5 000-doc × ~400-token corpus the
  * simhash HOF alone costs ~13 s. These expressions run the same algorithms
  * as a primitive loop inside whole-stage codegen.
  *
  * Hashing uses XXH64 (same kernel as Spark's `xxhash64`, seed 42):
  *   - token hash  h(t)      = XXH64(bytes(t), 42)       — identical to the
  *     builtin `xxhash64(t)`, so results cross-check against the HOF forms;
  *   - shingle hash of k consecutive tokens = left-chained
  *     `hashLong(h(t_{i+j}), ...)` — no intermediate strings are built;
  *   - permutation p of a shingle hash = `hashLong(s, p)`.
  */
object HashKernels {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  /** = builtin xxhash64(string) */
  def hashToken(t: UTF8String): Long = XXH64.hashUTF8String(t, 42L)

  def chain(h: Long, next: Long): Long = XXH64.hashLong(next, h)

  /** MinHash signature over k-token shingles, `numPerm` permutations. */
  def shingleMinHash(tokens: ArrayData, k: Int, numPerm: Int): Array[Long] = {
    val n = tokens.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (tokens.isNullAt(i)) 0L else hashToken(tokens.getUTF8String(i))
      i += 1
    }
    val nSh = math.max(1, n - k + 1)
    val sh = new Array[Long](nSh)
    if (n <= k) {
      var h = 42L
      var j = 0
      while (j < n) { h = chain(h, th(j)); j += 1 }
      sh(0) = h
    } else {
      i = 0
      while (i < nSh) {
        var h = 42L
        var j = 0
        while (j < k) { h = chain(h, th(i + j)); j += 1 }
        sh(i) = h
        i += 1
      }
    }
    val sig = new Array[Long](numPerm)
    var p = 0
    while (p < numPerm) {
      var mn = Long.MaxValue
      i = 0
      while (i < sh.length) {
        val v = XXH64.hashLong(sh(i), p.toLong)
        if (v < mn) mn = v
        i += 1
      }
      sig(p) = mn
      p += 1
    }
    sig
  }

  /** Sorted DISTINCT XXH64 hashes of the k-token shingles — the set form used
    * for exact-jaccard verification. Same chained shingle hashing as
    * [[shingleMinHash]], then sort + dedup, so |A∩B| is a linear two-pointer
    * merge in [[jaccardSorted]].
    */
  def shingleHashSet(tokens: ArrayData, k: Int): Array[Long] = {
    val n = tokens.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (tokens.isNullAt(i)) 0L else hashToken(tokens.getUTF8String(i))
      i += 1
    }
    val nSh = math.max(1, n - k + 1)
    val sh = new Array[Long](nSh)
    if (n <= k) {
      var h = 42L
      var j = 0
      while (j < n) { h = chain(h, th(j)); j += 1 }
      sh(0) = h
    } else {
      i = 0
      while (i < nSh) {
        var h = 42L
        var j = 0
        while (j < k) { h = chain(h, th(i + j)); j += 1 }
        sh(i) = h
        i += 1
      }
    }
    java.util.Arrays.sort(sh)
    // in-place dedup of the sorted run
    var w = 0
    i = 0
    while (i < sh.length) {
      if (w == 0 || sh(i) != sh(w - 1)) { sh(w) = sh(i); w += 1 }
      i += 1
    }
    if (w == sh.length) sh else java.util.Arrays.copyOf(sh, w)
  }

  /** One-pass Gopher-repetition statistics over a token array:
    * `[n_tokens, n_distinct_tokens, max_bigram_multiplicity]`.
    *
    * The q64 metrics need the distinct-token count and the modal bigram
    * count per row. The HOF form (array_sort over bigram STRINGS + an
    * `aggregate` run-length scan) is interpreted — higher-order functions
    * are CodegenFallback in Spark — and sorts with per-element string
    * compares. Here both reduce to sorting primitive longs: tokens hash
    * once (XXH64, the shared kernel seed), bigrams are the chained
    * 2-shingle hash (identical chaining to [[shingleHashSet]]'s k>1 path),
    * and multiplicities fall out of run-lengths in the sorted arrays.
    * Distinctness via 64-bit hashes admits collisions in principle; within
    * one document (n ≤ ~10⁴ tokens) the collision probability is ~n²/2⁶⁵
    * < 10⁻¹¹ per doc — far below any curation decision threshold.
    */
  def repetitionStats(tokens: ArrayData): Array[Long] = {
    val n = tokens.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (tokens.isNullAt(i)) 0L else hashToken(tokens.getUTF8String(i))
      i += 1
    }
    val ts = java.util.Arrays.copyOf(th, n)
    java.util.Arrays.sort(ts)
    var distinct = 0L
    i = 0
    while (i < n) {
      if (i == 0 || ts(i) != ts(i - 1)) distinct += 1
      i += 1
    }
    var top = 0L
    if (n >= 2) {
      val bg = new Array[Long](n - 1)
      i = 0
      while (i < n - 1) {
        bg(i) = chain(chain(42L, th(i)), th(i + 1))
        i += 1
      }
      java.util.Arrays.sort(bg)
      top = 1L
      var run = 1L
      i = 1
      while (i < bg.length) {
        if (bg(i) == bg(i - 1)) { run += 1; if (run > top) top = run }
        else run = 1
        i += 1
      }
    }
    Array(n.toLong, distinct, top)
  }

  /** One BPE merge step over a symbol array: replace adjacent (left, right)
    * occurrences with their concatenation, greedy LEFT-TO-RIGHT and
    * non-overlapping — `[a,a,a]` with merge (a,a) → `[aa,a]`, exactly the
    * classic BPE trainer's apply rule. One codegen call per row per round;
    * the trainer's correctness spec pins this against a plain-Scala exact
    * reference implementation.
    */
  def bpeMergePair(syms: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    var w = 0
    while (i < n) {
      val cur = if (syms.isNullAt(i)) null else syms.getUTF8String(i)
      val canMerge = cur != null && cur.equals(l) && i + 1 < n && !syms.isNullAt(i + 1) &&
        syms.getUTF8String(i + 1).equals(r)
      if (canMerge) {
        out(w) = UTF8String.concat(cur, syms.getUTF8String(i + 1))
        w += 1
        i += 2
      } else {
        out(w) = cur
        w += 1
        i += 1
      }
    }
    new GenericArrayData(
      if (w == n) out else java.util.Arrays.copyOf(out, w))
  }

  /** Jaccard of two sorted-distinct long arrays: two-pointer intersection. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** |A ∩ B| of two sorted-distinct long arrays — the integer half of
    * [[jaccardSorted]]'s merge, for callers that decide membership by
    * exact cross-multiplication (ninter·10000 ≥ thr_bp·nunion) instead
    * of a float compare.
    */
  def intersectCountSorted(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** 64-bit SimHash over the token multiset — identical semantics to the HOF
    * form in [[Text.simHash]] (bit j = sign of Σ ±1 by bit j of xxhash64(t)).
    */
  def simHash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hashToken(tokens.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** array<string> tokens → array<long> minhash signature (codegen'd). */
case class ShingleMinHash(child: Expression, k: Int, numPerm: Int)
    extends UnaryExpression {

  override def prettyName: String = "shingle_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      HashKernels.shingleMinHash(v.asInstanceOf[ArrayData], k, numPerm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashKernels.shingleMinHash($c, $k, $numPerm))")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** array<string> tokens → 64-bit simhash (codegen'd). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    HashKernels.simHash64(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simHash64($c)")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** array<string> tokens → sorted-distinct array<long> shingle hash set. */
case class ShingleHashSet(child: Expression, k: Int) extends UnaryExpression {

  override def prettyName: String = "shingle_hash_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      HashKernels.shingleHashSet(v.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashKernels.shingleHashSet($c, $k))")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** array<string> tokens → [n_tok, n_distinct, top_bigram_count] (codegen'd). */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def prettyName: String = "repetition_stats"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      HashKernels.repetitionStats(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.HashKernels.repetitionStats($c))")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** array<string> symbols → array<string> with one BPE merge applied
  * (codegen'd; the merge pair rides along as constants per training round).
  */
case class BpeMergePair(child: Expression, mergeLeft: String, mergeRight: String)
    extends UnaryExpression {

  override def prettyName: String = "bpe_merge_pair"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val lU = UTF8String.fromString(mergeLeft)
  @transient private lazy val rU = UTF8String.fromString(mergeRight)

  override def nullSafeEval(v: Any): Any =
    HashKernels.bpeMergePair(v.asInstanceOf[ArrayData], lU, rU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeMergeLeft", lU)
    val rRef = ctx.addReferenceObj("bpeMergeRight", rU)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.bpeMergePair($c, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** (sorted-distinct array<long>) × 2 → jaccard similarity (codegen'd). */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "jaccard_sorted"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    HashKernels.jaccardSorted(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HashKernels.jaccardSorted($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** (sorted-distinct array<long>) × 2 → |A ∩ B| as bigint (codegen'd). */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "intersect_count_sorted"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    HashKernels.intersectCountSorted(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HashKernels.intersectCountSorted($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object HashExpressions {
  import org.apache.spark.sql.graft.{shims => S}

  def shingleMinHash(tokens: Column, k: Int = 3, numPerm: Int = 32): Column =
    S.column(ShingleMinHash(S.expression(tokens), k, numPerm))

  def simHash64(tokens: Column): Column =
    S.column(SimHash64(S.expression(tokens)))

  def shingleHashSet(tokens: Column, k: Int = 3): Column =
    S.column(ShingleHashSet(S.expression(tokens), k))

  def jaccardSorted(a: Column, b: Column): Column =
    S.column(JaccardSorted(S.expression(a), S.expression(b)))

  def intersectCountSorted(a: Column, b: Column): Column =
    S.column(IntersectCountSorted(S.expression(a), S.expression(b)))

  def repetitionStats(tokens: Column): Column =
    S.column(RepetitionStats(S.expression(tokens)))

  def bpeMergePair(syms: Column, left: String, right: String): Column =
    S.column(BpeMergePair(S.expression(syms), left, right))
}
