package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SQL surface of the engine's custom Catalyst expressions.
  *
  * Two equivalent entry points:
  *   - config: `--conf spark.sql.extensions=graft.GraftExtensions` registers
  *     the functions at session build (the idiomatic engine-extension path);
  *   - runtime: `GraftExtensions.register(spark)` injects the same builders
  *     into an already-running session's FunctionRegistry.
  *
  * After either, the kernels are plain SQL:
  * {{{
  *   SELECT cosine_similarity(a.embedding, b.embedding) FROM ...
  *   SELECT jaccard_sorted(shingle_hash_set(tokens, 3), ...) FROM ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def fn(
      name: String,
      usage: String,
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, ""),
      builder)

  /** name → (identifier, info, builder) for every engine function. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("cosine_similarity",
      "cosine_similarity(a, b) - cosine of two array<float|double> vectors, fused single pass",
      args => CosineSimilarity(args(0), args(1))),
    fn("dot_product",
      "dot_product(a, b) - dot product of two array<float|double> vectors",
      args => DotProduct(args(0), args(1))),
    fn("l2_squared",
      "l2_squared(a, b) - squared euclidean distance of two array<float|double> vectors",
      args => L2Squared(args(0), args(1))),
    fn("simhash64",
      "simhash64(tokens) - 64-bit simhash of an array<string> token stream",
      args => SimHash64(args(0))),
    fn("shingle_minhash",
      "shingle_minhash(tokens[, k[, num_perm]]) - minhash signature over k-token shingles",
      args => ShingleMinHash(
        args(0),
        if (args.length > 1) intArg(args(1), "k") else 3,
        if (args.length > 2) intArg(args(2), "num_perm") else 32)),
    fn("shingle_hash_set",
      "shingle_hash_set(tokens[, k]) - sorted distinct xxh64 hashes of k-token shingles",
      args => ShingleHashSet(
        args(0),
        if (args.length > 1) intArg(args(1), "k") else 3)),
    fn("jaccard_sorted",
      "jaccard_sorted(a, b) - jaccard similarity of two sorted-distinct array<bigint>",
      args => JaccardSorted(args(0), args(1))),
    // raw AggregateFunctions: the analyzer wraps them in AggregateExpressions
    fn("bottom_k_distinct",
      "bottom_k_distinct(expr, k) - k smallest distinct string values, sorted (KMV sketch core)",
      args => BottomKDistinct(args(0), intArg(args(1), "k"))),
    fn("top_k_frequent",
      "top_k_frequent(expr, k[, capacity]) - k most frequent string values with error bounds " +
        "(SpaceSaving heavy hitters; capacity counters per partial)",
      args => TopKFrequent(
        args(0),
        intArg(args(1), "k"),
        if (args.length > 2) intArg(args(2), "capacity") else 4096)),
    fn("bloom_might_contain_long",
      "bloom_might_contain_long(filter_bytes, hash) - bloom membership probe; filter_bytes " +
        "is a foldable binary (serialized spark BloomFilter), false = definitive absence",
      args => BloomMightContainBytes(args(0), args(1))))

  /** Register every engine function on a live session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
