package graft

import graft.expressions.{DotProduct, H32, JaroWinkler, L2Normalize, MinhashSignature, MsgpackDecodeFrame, NfcNormalize, SaltedH32Array, ShinglesArray, Simhash32FromHashes}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions at session build time —
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or spark.sql.extensions=graft.GraftExtensions via config
  * }}}
  *
  * No analyzer rules or planner strategies are injected: SURVEY.md §4
  * concluded none are required for parity (built-ins + expressions
  * cover the surface); this class is the seam where they would go.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      e.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  /** Static int parameters (salt, n, k) must be foldable INTEGRAL
    * literals at registration-time call sites:
    * `minhash_signature(words, 3, 12)`. Fractional and out-of-range
    * literals are rejected — Number.intValue would silently truncate
    * 2.9 to 2 and wrap 2^32+3 to 3, running a different shingle width
    * than the user wrote. */
  private def intArg(e: Expression, name: String): Int = {
    val v = if (e.foldable) e.eval(null) else null
    v match {
      case n: Int => n
      case n: Short => n.toInt
      case n: Byte => n.toInt
      case n: Long if n.isValidInt => n.toInt
      case _ => throw new IllegalArgumentException(
        s"$name expects a literal int argument, got: ${e.sql}")
    }
  }

  /** Arity check before destructuring: `h32()` must say so, not throw
    * a bare NoSuchElementException from `exprs.head`. */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == n,
        s"$name expects $n argument(s), got ${exprs.length}")
      build(exprs)
    }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("h32"),
      new ExpressionInfo(classOf[H32].getName, "h32"),
      arity("h32", 1)(exprs => H32(exprs.head))),
    (FunctionIdentifier("msgpack_decode_frame"),
      new ExpressionInfo(classOf[MsgpackDecodeFrame].getName, "msgpack_decode_frame"),
      arity("msgpack_decode_frame", 1)(exprs => MsgpackDecodeFrame(exprs.head))),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      arity("nfc_normalize", 1)(exprs => NfcNormalize(exprs.head))),
    (FunctionIdentifier("salted_h32_array"),
      new ExpressionInfo(classOf[SaltedH32Array].getName, "salted_h32_array"),
      arity("salted_h32_array", 2)(exprs =>
        SaltedH32Array(exprs.head, intArg(exprs(1), "salted_h32_array")))),
    (FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[Simhash32FromHashes].getName, "simhash32"),
      arity("simhash32", 1)(exprs => Simhash32FromHashes(exprs.head))),
    (FunctionIdentifier("shingles_array"),
      new ExpressionInfo(classOf[ShinglesArray].getName, "shingles_array"),
      arity("shingles_array", 2)(exprs =>
        ShinglesArray(exprs.head, intArg(exprs(1), "shingles_array")))),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinhashSignature].getName, "minhash_signature"),
      arity("minhash_signature", 3)(exprs =>
        MinhashSignature(exprs.head, intArg(exprs(1), "minhash_signature"),
          intArg(exprs(2), "minhash_signature")))),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      arity("dot_product", 2)(exprs => DotProduct(exprs.head, exprs(1)))),
    (FunctionIdentifier("l2_normalize"),
      new ExpressionInfo(classOf[L2Normalize].getName, "l2_normalize"),
      arity("l2_normalize", 1)(exprs => L2Normalize(exprs.head))),
    (FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      arity("jaro_winkler", 2)(exprs => JaroWinkler(exprs.head, exprs(1)))))
}
