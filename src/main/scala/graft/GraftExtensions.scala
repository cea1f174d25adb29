package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.{BoundedCollect, DotProduct, FrequentWords, Log2Fixed, PolyHash, SimHash64, WordNgramHashes, WordNgrams}

/** SQL surface for the engine's native expressions. Register with
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * and the functions are callable from `spark.sql`:
  *
  *   SELECT poly_hash(text), simhash64(tokens), word_ngrams(text, 3),
  *          dot_product(a, b) FROM ...
  *
  * This is the standard extension-point mechanism for Spark-native
  * libraries — no fork, no UDF registry, full codegen retained.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$name takes $n argument(s), got ${args.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
    ext.injectFunction((FunctionIdentifier("poly_hash"),
      info("poly_hash", "poly_hash(str[, base]) - portable polynomial hash mod 2^31-1"),
      (args: Seq[Expression]) => args match {
        case Seq(s)    => PolyHash(s, PolyHash.DefaultBase)
        case Seq(s, b) => PolyHash(s, intArg(b, "poly_hash base").toLong)
        case _ => throw new IllegalArgumentException("poly_hash takes 1 or 2 args")
      }))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 62-bit simhash of a string array"),
      (args: Seq[Expression]) => {
        arity("simhash64", args, 1); SimHash64(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("word_ngrams"),
      info("word_ngrams", "word_ngrams(text, n) - distinct word n-grams"),
      (args: Seq[Expression]) => {
        arity("word_ngrams", args, 2)
        WordNgrams(args.head, intArg(args(1), "word_ngrams n"))
      }))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - sequential dot of double arrays"),
      (args: Seq[Expression]) => {
        arity("dot_product", args, 2); DotProduct(args.head, args(1))
      }))
    ext.injectFunction((FunctionIdentifier("word_ngram_hashes"),
      info("word_ngram_hashes",
        "word_ngram_hashes(text, n) - sorted distinct 62-bit dual-PolyHash word n-gram hashes"),
      (args: Seq[Expression]) => {
        arity("word_ngram_hashes", args, 2)
        WordNgramHashes(args.head, intArg(args(1), "word_ngram_hashes n"))
      }))
    ext.injectFunction((FunctionIdentifier("bounded_collect"),
      info("bounded_collect",
        "bounded_collect(col, limit) - aggregate: up to limit longs per group, skew-safe"),
      (args: Seq[Expression]) => {
        arity("bounded_collect", args, 2)
        BoundedCollect(args.head, intArg(args(1), "bounded_collect limit"))
          .toAggregateExpression()
      }))
    ext.injectFunction((FunctionIdentifier("log2_fixed"),
      info("log2_fixed",
        "log2_fixed(a, b) - -log2(a/b) in 2^-16 fixed point, no libm (bit-identical across engines); contract 1 <= a <= b < 2^50, violations raise"),
      (args: Seq[Expression]) => {
        arity("log2_fixed", args, 2); Log2Fixed(args.head, args(1))
      }))
    ext.injectFunction((FunctionIdentifier("frequent_words"),
      info("frequent_words",
        "frequent_words(col, capacity) - aggregate: Misra-Gries frequent-item candidates, ≤ capacity counters per group"),
      (args: Seq[Expression]) => {
        arity("frequent_words", args, 2)
        FrequentWords(args.head, intArg(args(1), "frequent_words capacity"))
          .toAggregateExpression()
      }))
  }
}
