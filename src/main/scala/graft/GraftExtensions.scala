package graft

import graft.cdc.{CdcHeaderId, CdcHeaderOpCode, CdcHeaderTsUs}
import graft.functions.VecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Session extensions: the engine's native expressions become SQL
  * functions, and the optimizer learns to vectorize declarative
  * dot products. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "")
    def intLit(ex: Expression, what: String): Int = ex match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    // sizes past Int range (e.g. bloom_bits 2^31) arrive as BIGINT literals
    def longLit(ex: Expression, what: String): Long = ex match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v.toLong
      case Literal(v: Long, org.apache.spark.sql.types.LongType) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    // wrong arity must name the function and its signature, not throw
    // an opaque IndexOutOfBoundsException from exprs(i)
    def arity(fn: String, sig: String, exprs: Seq[Expression], n: Int): Unit =
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$fn expects $n arguments ($sig), got ${exprs.length}")

    e.injectFunction((FunctionIdentifier("cdc_header_id"),
      info("cdc_header_id", "_FUNC_(raw) - record id from codec header bytes"),
      (exprs: Seq[Expression]) => {
        arity("cdc_header_id", "raw", exprs, 1)
        CdcHeaderId(exprs.head)
      }))
    e.injectFunction((FunctionIdentifier("cdc_header_ts_us"),
      info("cdc_header_ts_us", "_FUNC_(raw) - commit epoch-us from codec header bytes"),
      (exprs: Seq[Expression]) => {
        arity("cdc_header_ts_us", "raw", exprs, 1)
        CdcHeaderTsUs(exprs.head)
      }))
    e.injectFunction((FunctionIdentifier("cdc_header_op_code"),
      info("cdc_header_op_code", "_FUNC_(raw) - operation code from codec header bytes"),
      (exprs: Seq[Expression]) => {
        arity("cdc_header_op_code", "raw", exprs, 1)
        CdcHeaderOpCode(exprs.head)
      }))
    e.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "_FUNC_(a, b) - sequential dot product of two double arrays"),
      (exprs: Seq[Expression]) => {
        arity("vec_dot", "a, b", exprs, 2)
        VecDot(exprs.head, exprs(1))
      }))
    e.injectFunction((FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs",
        "_FUNC_(words, k, bands) - per-band MinHash signatures over k-shingles"),
      (exprs: Seq[Expression]) => {
        arity("minhash_sigs", "words, k, bands", exprs, 3)
        graft.functions.MinHashSigs(exprs.head,
          intLit(exprs(1), "minhash_sigs k"),
          intLit(exprs(2), "minhash_sigs bands"))
      }))
    e.injectFunction((FunctionIdentifier("shingle_hash_set"),
      info("shingle_hash_set",
        "_FUNC_(words, k) - distinct 64-bit k-shingle hashes"),
      (exprs: Seq[Expression]) => {
        arity("shingle_hash_set", "words, k", exprs, 2)
        graft.functions.ShingleHashSet(exprs.head,
          intLit(exprs(1), "shingle_hash_set k"))
      }))
    e.injectFunction((FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "_FUNC_(words, k, w) - distinct winnowed k-shingle hash minima " +
          "(passage-dedup fingerprints, complete for runs of w+k-1 tokens)"),
      (exprs: Seq[Expression]) => {
        arity("winnow_fingerprints", "words, k, w", exprs, 3)
        graft.functions.WinnowFingerprints(exprs.head,
          intLit(exprs(1), "winnow_fingerprints k"),
          intLit(exprs(2), "winnow_fingerprints w"))
      }))
    e.injectFunction((FunctionIdentifier("simhash32"),
      info("simhash32",
        "_FUNC_(words) - [n_tokens, 32-bit simhash fingerprint]"),
      (exprs: Seq[Expression]) => {
        arity("simhash32", "words", exprs, 1)
        graft.functions.SimHash32(exprs.head)
      }))
    e.injectFunction((FunctionIdentifier("vec_lsum"),
      info("vec_lsum",
        "_FUNC_(arr) - elementwise SUM aggregate over ARRAY<BIGINT>"),
      (exprs: Seq[Expression]) => {
        arity("vec_lsum", "arr", exprs, 1)
        graft.functions.VecLongSumAgg(exprs.head)
      }))
    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes",
        "_FUNC_(words, k) - ALL k-shingle hash64s in position order " +
          "(exact-substring-dedup signal)"),
      (exprs: Seq[Expression]) => {
        arity("shingle_hashes", "words, k", exprs, 2)
        graft.functions.ShingleHashSeq(exprs.head,
          intLit(exprs(1), "shingle_hashes k"))
      }))
    e.injectFunction((FunctionIdentifier("hll_estimate"),
      info("hll_estimate",
        "_FUNC_(hash) - deterministic HLL approximate-distinct aggregate " +
          "over 60-bit key hashes (256 registers, order-invariant merge)"),
      (exprs: Seq[Expression]) => {
        arity("hll_estimate", "hash", exprs, 1)
        graft.functions.HllEstimateAgg(exprs.head)
      }))
    e.injectFunction((FunctionIdentifier("bloom_bits"),
      info("bloom_bits",
        "_FUNC_(hash[, bits]) - Bloom-filter bitmap aggregate over " +
          "60-bit key hashes (bits/8 bytes of OR-merge state, default " +
          "65536 bits; size to your fp budget — see BloomBitsAgg)"),
      (exprs: Seq[Expression]) => {
        if (exprs.size < 1 || exprs.size > 2)
          throw new IllegalArgumentException(
            s"bloom_bits(hash[, bits]) takes 1 or 2 args, got ${exprs.size}")
        if (exprs.size == 1) graft.functions.BloomBitsAgg(exprs.head)
        else graft.functions.BloomBitsAgg(exprs.head,
          longLit(exprs(1), "bloom_bits bits"))
      }))

    e.injectOptimizerRule(_ => RewriteZipWithDot)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

/** Optimizer rule: recognize the declarative dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
  *
  * and replace it with the native [[VecDot]] — same left-fold
  * semantics bit for bit, but no per-row intermediate array and no
  * interpreted lambda (~50x on all-pairs similarity joins). Users
  * keep writing the portable declarative form; plans get the fast
  * operator.
  */
object RewriteZipWithDot extends Rule[LogicalPlan] {

  private object DotShape {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, NumericType}

    /** Array-level double cast for a NUMERIC-element array operand.
      * The analyzer puts the equivalent CAST INSIDE the zip_with
      * lambda (per element), so hoisting it to the array is
      * semantics-identical — including null elements (cast preserves
      * them) and ragged lengths (zip_with's null-pad → null sum either
      * way, which VecDot's dotOrNull reproduces). The hoisted cast's
      * containsNull widens whenever the element cast can MAKE nulls
      * (Cast.forceNullable) so VecDot keeps its element-null scan —
      * carrying the source flag alone would compile the scan out and
      * read the null slot as 0.0 (ADVICE r4). The rewrite itself is
      * GATED on numeric elements ([[numericElems]]): that is the only
      * shape the engine emits, and e.g. a string-element fold keeps
      * its lambda (non-numeric strings → null sum under non-ANSI). */
    private def widen(arr: Expression): Expression = arr.dataType match {
      case ArrayType(DoubleType, _) => arr
      case ArrayType(et, containsNull) =>
        Cast(arr, ArrayType(DoubleType,
          containsNull || Cast.forceNullable(et, DoubleType)))
    }

    private def numericElems(e: Expression): Boolean = e.dataType match {
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }

    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      // Every variable reference must be the ENCLOSING lambda's own
      // parameter — a lambda body referencing an OUTER lambda variable
      // (e.g. zip_with(a, b, (x, y) -> x * s) under transform(scales,
      // s -> ...)) is also a NamedLambdaVariable and would otherwise
      // silently rewrite to a plain dot product of a and b.
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mul,
              Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, x2: NamedLambdaVariable, _),
              Seq(accP: NamedLambdaVariable, xP: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(finP: NamedLambdaVariable), _))
          if Set(acc.exprId, x2.exprId) == Set(accP.exprId, xP.exprId) &&
            acc.exprId != x2.exprId && fin.exprId == finP.exprId =>
        val params = Set(p1.exprId, p2.exprId)
        def ownParams(u: NamedLambdaVariable, v: NamedLambdaVariable): Boolean =
          u.exprId != v.exprId && Set(u.exprId, v.exprId) == params
        mul match {
          // both elements already double
          case Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _)
              if ownParams(x1, y1) =>
            Some((a, b))
          // mixed types: the analyzer casts the narrower element to
          // double inside the lambda (e.g. ann05's double · int8-code
          // rank fold). Hoist by widening whichever ARRAY is not
          // double (identity on the double one) — keyed on the array
          // types, not the lambda-variable positions, so a reversed
          // `(x, c) -> c * x` matches too
          case Multiply(x1: NamedLambdaVariable,
                Cast(y1: NamedLambdaVariable, DoubleType, _, _), _)
              if ownParams(x1, y1) && numericElems(a) && numericElems(b) =>
            Some((widen(a), widen(b)))
          case Multiply(Cast(x1: NamedLambdaVariable, DoubleType, _, _),
                y1: NamedLambdaVariable, _)
              if ownParams(x1, y1) && numericElems(a) && numericElems(b) =>
            Some((widen(a), widen(b)))
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotShape(a, b) => VecDot(a, b)
    }
}
