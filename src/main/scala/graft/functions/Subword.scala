package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Deterministic subword tokenization (tx13 / pk05): greedy
  * longest-match against a FIXED public vocabulary — the budgeting
  * primitive every real training pipeline uses in place of
  * whitespace counts (docs are packed by SUBWORD tokens, not words).
  *
  * The encoding rule both engines share (the DuckDB oracle replays it
  * as a per-word recursive CTE with a lateral longest-match probe):
  * per whitespace word, starting at codepoint position 1, take the
  * LONGEST vocabulary entry matching at the position and advance by
  * its length; if none matches (the word has a codepoint outside the
  * vocabulary's single-char base), advance one codepoint and count an
  * UNK. Pure integer/string ops — no libm, no normalization, no case
  * folding (Java/DuckDB lower() disagree on ß/İ-class codepoints, so
  * none is attempted).
  *
  * The vocabulary is a code fixture: the 95 printable-ASCII
  * single-char base (so ASCII text never UNKs) plus ~130 high-
  * frequency English character n-grams of the kind every public BPE
  * vocabulary's first merges produce. It is deliberately tiny and
  * embedded — the operator's value is the deterministic encoder and
  * its replayability; swapping in a production vocabulary table is a
  * data change, not a code change.
  */
/** A greedy longest-match subword vocabulary as a VALUE (round 11):
  * the encoder machinery parameterized by its entry set, so a TRAINED
  * vocabulary — e.g. tx15's merge table, turned into tokens — plugs
  * into the identical encode rule as data. [[SubwordVocab]] is the
  * embedded fixture instance tx13/pk05 pin their oracles to. */
final class SubwordVocabulary(val entries: Seq[String]) extends Serializable {
  require(entries.nonEmpty, "empty subword vocabulary")
  require(entries.distinct.size == entries.size, "subword vocab has duplicates")
  // byLen indexing, substring matching and the greedy advance are
  // UTF-16-unit based and only equal the documented CODEPOINT
  // semantics (DuckDB's substr/len unit) when every entry is BMP-only
  // — an astral entry would silently diverge from the oracle twin
  // (ADVICE r11), so reject it at construction
  require(entries.forall(e => e.length == e.codePointCount(0, e.length)),
    "subword vocab entries must be BMP-only (UTF-16 length == codepoint length)")

  val maxLen: Int = entries.map(_.length).max

  // per-length exact-match sets: greedy tries maxLen..1 then UNK
  private val byLen: Array[java.util.HashSet[String]] = {
    val a = Array.fill(maxLen + 1)(new java.util.HashSet[String]())
    entries.foreach(t => a(t.length).add(t))
    a
  }

  /** (tokens, unks) of one word under greedy longest-match. Positions
    * advance by CODEPOINT (DuckDB's substr/len unit), not UTF-16
    * char — an astral codepoint is one UNK, not two. */
  def encodeCounts(word: String): (Long, Long) = {
    var toks = 0L
    var unks = 0L
    var i = 0 // UTF-16 index
    val n = word.length
    while (i < n) {
      var matched = 0
      var l = math.min(maxLen, n - i)
      while (matched == 0 && l >= 1) {
        // candidate must also be l CODEPOINTS long: vocab entries are
        // single-UTF-16-unit chars in the base, so UTF-16 length ==
        // codepoint length for every entry and substring compare is
        // exact
        if (byLen(l).contains(word.substring(i, i + l))) matched = l
        else l -= 1
      }
      if (matched > 0) { toks += 1; i += matched }
      else { toks += 1; unks += 1; i += Character.charCount(word.codePointAt(i)) }
    }
    (toks, unks)
  }
}

object SubwordVocab {

  /** Multi-char entries (all lowercase ASCII; matching is
    * case-sensitive — capitals fall back to the single-char base). */
  val Merges: Seq[String] = Seq(
    // 5-char
    "ation", "ition", "ement", "ently", "ingly", "ances", "ators",
    "inter", "trans", "under", "ution",
    // 4-char
    "tion", "ther", "ment", "ight", "ness", "able", "ible", "ance",
    "ence", "ious", "ting", "ating", "sion", "ship", "less", "over",
    "ever", "ward", "ture", "sure", "ally", "ified",
    // 3-char
    "the", "ing", "and", "ion", "ent", "ers", "est", "ate", "ess",
    "ive", "ous", "ant", "int", "for", "ter", "ver", "pro", "con",
    "com", "per", "sta", "str", "ist", "ure", "ity", "ies", "ied",
    "age", "ful", "our", "out", "all", "ear", "art", "ore", "ome",
    "ame", "ite", "ine", "one", "ose", "ase", "use", "ice", "ace",
    // 2-char
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ti",
    "es", "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to",
    "nt", "ng", "se", "ha", "as", "ou", "io", "le", "ve", "co", "me",
    "de", "hi", "ri", "ro", "ic", "ne", "ea", "ra", "ce", "li", "ch",
    "ll", "be", "ma", "si", "om", "ur", "ca", "el", "ta", "la", "ns",
    "di", "fo", "ho", "pe", "ec", "pr", "no", "ct", "us", "ac", "ot",
    "il", "tr", "ly", "nc", "et", "ut", "ss", "so", "rs", "un", "lo",
    "wa", "ge", "ie", "wh", "ee", "wi", "em", "ad", "ol", "rt", "po",
    "we", "na", "ul", "ni", "ts", "mo", "ow", "pa", "im", "mi", "ai",
    "sh")

  /** Single-codepoint base: the 95 printable ASCII chars. */
  val Singles: Seq[String] = (0x20 to 0x7e).map(_.toChar.toString)

  /** The full vocabulary, longest-first (the match order). */
  val All: Seq[String] = Merges ++ Singles

  /** The fixture as a [[SubwordVocabulary]] value — the same class a
    * trained merge table instantiates. */
  val vocab: SubwordVocabulary = new SubwordVocabulary(All)

  val MaxLen: Int = vocab.maxLen

  /** DuckDB list literal of the SAME vocabulary — the oracle-side
    * twin, generated from the single definition above. */
  def vocabSql: String =
    All.map(t => "'" + t.replace("'", "''") + "'")
      .mkString("[", ", ", "]")

  def encodeCounts(word: String): (Long, Long) = vocab.encodeCounts(word)
}

/** Pure-JVM runtime entry points (called from codegen'd expressions —
  * must be public, static-shaped, and allocation-lean). */
object SubwordRuntime {
  /** ws (array of words) → [n_subwords, n_unk] summed over the doc. */
  def subwordCounts(ws: ArrayData): ArrayData = {
    var toks = 0L
    var unks = 0L
    var i = 0
    val n = ws.numElements()
    while (i < n) {
      val (t, u) = SubwordVocab.encodeCounts(ws.getUTF8String(i).toString)
      toks += t
      unks += u
      i += 1
    }
    new GenericArrayData(Array(toks, unks))
  }
}

/** c = subword_counts(ws): [n_subwords, n_unk] of a doc's word array
  * under [[SubwordVocab]] greedy longest-match — one codegen'd call
  * per row, no explode, rides the scan like [[ShingleHashSet]]. */
case class SubwordCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    SubwordRuntime.subwordCounts(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SubwordRuntime.subwordCounts($c)")
  override protected def withNewChildInternal(c: Expression): SubwordCounts =
    copy(c)
}
