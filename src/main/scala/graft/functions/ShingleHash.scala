package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Native per-document shingle hashing for the dedup family. One
  * static call per row does ALL the work (shingling, salted md5,
  * 64-bit truncation, per-band minima) in tight Scala loops — the
  * declarative `transform(sgs, sg -> conv(substring(md5(...)...)))`
  * form runs ~1.5M interpreted lambda evals per pass and its
  * performance is hostage to JIT profile state (observed 4s..49s for
  * the same query in one JVM).
  *
  * Hash contract (bit-equal with the DuckDB oracle):
  *   hash64(s) = first 15 hex digits of md5(utf8(s)) as a BIGINT
  *   shingle   = k consecutive words joined by one space
  *   band sig  = min over shingles of hash64("<b>|" + shingle)
  */
object ShingleHashRuntime {

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of md5 = bytes 0..6 plus the high nibble of
    * byte 7 (60 bits, always positive). */
  def hash64(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val h = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >> 4)
  }

  private def shingleBytes(
      words: Array[Array[Byte]], start: Int, k: Int,
      salt: Array[Byte]): Array[Byte] = {
    var len = salt.length + k - 1 // separators
    var j = 0
    while (j < k) { len += words(start + j).length; j += 1 }
    val out = new Array[Byte](len)
    System.arraycopy(salt, 0, out, 0, salt.length)
    var pos = salt.length
    j = 0
    while (j < k) {
      if (j > 0) { out(pos) = ' '; pos += 1 }
      val w = words(start + j)
      System.arraycopy(w, 0, out, pos, w.length)
      pos += w.length
      j += 1
    }
    out
  }

  private def wordBytes(ws: ArrayData): Array[Array[Byte]] = {
    val n = ws.numElements()
    val out = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      out(i) = ws.getUTF8String(i).getBytes
      i += 1
    }
    out
  }

  private val emptySalt = Array.emptyByteArray

  /** Per-band MinHash signatures over k-shingles; null when the doc
    * has fewer than k words (no shingles — matches the oracle's empty
    * generate_series). */
  def minHashSigs(ws: ArrayData, k: Int, bands: Int): GenericArrayData = {
    val words = wordBytes(ws)
    val nSh = words.length - k + 1
    if (nSh <= 0) return null
    val sigs = Array.fill(bands)(Long.MaxValue)
    val salts = Array.tabulate(bands)(b => s"$b|".getBytes("UTF-8"))
    var s = 0
    while (s < nSh) {
      var b = 0
      while (b < bands) {
        val h = hash64(shingleBytes(words, s, k, salts(b)))
        if (h < sigs(b)) sigs(b) = h
        b += 1
      }
      s += 1
    }
    new GenericArrayData(sigs)
  }

  /** First 8 hex digits of md5 = first 4 bytes as an unsigned 32-bit
    * value (matches `conv(substring(md5(w), 1, 8), 16, 10)`). */
  def hash32(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val h = md.digest(bytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** One-pass SimHash over the word array: [n_tokens, simhash32].
    * Replaces the explode + 32-conditional-sum groupBy (a (doc, token)
    * row-multiplication and shuffle) with a single per-row call —
    * same bit contract as the declarative form: token hash =
    * [[hash32]], bit j votes ±1, fingerprint bit set when the sum is
    * strictly positive. */
  def simHash32(ws: ArrayData): GenericArrayData = {
    val n = ws.numElements()
    val sums = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = hash32(ws.getUTF8String(i).getBytes)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) { if (sums(j) > 0) fp |= (1L << j); j += 1 }
    new GenericArrayData(Array(n.toLong, fp))
  }

  /** Robust-winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03): the distinct minima of every w-window of consecutive
    * k-shingle hash64 values. Any verbatim run of ≥ w+k-1 tokens shared
    * by two documents contains one complete window in both, whose
    * minimum both select — so a fingerprint equi-join is COMPLETE for
    * passages of that length while emitting only ~2/w of the shingles.
    * Docs with 0 < shingles < w keep their single global minimum;
    * shingle-less docs fingerprint nothing (empty array). */
  def winnowFingerprints(ws: ArrayData, k: Int, w: Int): GenericArrayData = {
    val words = wordBytes(ws)
    val nSh = words.length - k + 1
    if (nSh <= 0) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](nSh)
    var i = 0
    while (i < nSh) { hs(i) = hash64(shingleBytes(words, i, k, emptySalt)); i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (nSh < w) {
      var m = Long.MaxValue
      i = 0
      while (i < nSh) { if (hs(i) < m) m = hs(i); i += 1 }
      seen.add(m)
    } else {
      // O(n) sliding minimum via a monotonic index deque
      val deque = new Array[Int](nSh)
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < nSh) {
        while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) seen.add(hs(deque(head)))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** ALL k-shingle hash64s in position order (index = 0-based token
    * position of the shingle's first word) — the exact-substring-dedup
    * signal: unlike [[shingleHashSet]] duplicates at different
    * positions are kept, and unlike [[winnowFingerprints]] nothing is
    * sampled, because dd13 needs every duplicated position to merge
    * into spans. Empty array when the doc has < k tokens. */
  def shingleHashSeq(ws: ArrayData, k: Int): GenericArrayData = {
    val words = wordBytes(ws)
    val nSh = words.length - k + 1
    if (nSh <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](nSh)
    var s = 0
    while (s < nSh) {
      out(s) = hash64(shingleBytes(words, s, k, emptySalt))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct 64-bit shingle hashes (order irrelevant downstream —
    * consumers take sizes and intersections). */
  def shingleHashSet(ws: ArrayData, k: Int): GenericArrayData = {
    val words = wordBytes(ws)
    val nSh = words.length - k + 1
    if (nSh <= 0) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var s = 0
    while (s < nSh) {
      seen.add(hash64(shingleBytes(words, s, k, emptySalt)))
      s += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }
}

/** sigs = minhash_sigs(ws, k, bands): array<long> of per-band minima. */
case class MinHashSigs(child: Expression, k: Int, bands: Int)
  extends UnaryExpression {
  require(k >= 1 && bands >= 1,
    s"minhash_sigs needs k >= 1 and bands >= 1, got k=$k bands=$bands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ShingleHashRuntime.minHashSigs(v.asInstanceOf[ArrayData], k, bands)
  override def nullable: Boolean = true
  // minHashSigs returns null for docs with < k words; defineCodeGen
  // assumes non-null results, so flag isNull explicitly
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.ShingleHashRuntime.minHashSigs($c, $k, $bands);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)
  override protected def withNewChildInternal(c: Expression): MinHashSigs = copy(c)
}

/** sh = simhash32(ws): [n_tokens, fingerprint] in one codegen'd call. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ShingleHashRuntime.simHash32(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashRuntime.simHash32($c)")
  override protected def withNewChildInternal(c: Expression): SimHash32 = copy(c)
}

/** fps = winnow_fingerprints(ws, k, w): distinct winnowed shingle
  * hash64 minima — the ExactSubstr/MOSS passage-dedup signal. One
  * codegen'd call per row; the declarative nested-lambda form
  * (transform over array_min(slice(hs, i, w))) re-evaluates its outer
  * references per window once the optimizer inlines it into a
  * Generate — measured 102 s vs 0.2 s for the same sf0.01 explode. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  require(k >= 1 && w >= 1,
    s"winnow_fingerprints needs k >= 1 and w >= 1, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ShingleHashRuntime.winnowFingerprints(v.asInstanceOf[ArrayData], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashRuntime.winnowFingerprints($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(c)
}

/** hset = shingle_hash_set(ws, k): distinct shingle hash64 values. */
case class ShingleHashSet(child: Expression, k: Int)
  extends UnaryExpression {
  require(k >= 1, s"shingle_hash_set needs k >= 1, got k=$k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ShingleHashRuntime.shingleHashSet(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashRuntime.shingleHashSet($c, $k)")
  override protected def withNewChildInternal(c: Expression): ShingleHashSet = copy(c)
}

/** hs = shingle_hashes(ws, k): ALL k-shingle hash64s in position order
  * (index = 0-based start-token position) — dd13's exact-substring
  * signal. */
case class ShingleHashSeq(child: Expression, k: Int)
  extends UnaryExpression {
  require(k >= 1, s"shingle_hashes needs k >= 1, got k=$k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ShingleHashRuntime.shingleHashSeq(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashRuntime.shingleHashSeq($c, $k)")
  override protected def withNewChildInternal(c: Expression): ShingleHashSeq = copy(c)
}
