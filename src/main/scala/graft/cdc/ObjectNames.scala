package graft.cdc

/** Multi-part object-name compression (ref: formats/internal/utils/
  * ObjectNameUtils.java:18-49): database/schema/table coordinates
  * travel as ONE dot-joined string in selector options and config
  * surfaces, but a segment may itself CONTAIN a dot (Oracle sources
  * legitimately ship `SCHEMA.MY.TABLE`-style names). The contract:
  * literal dots inside a segment are escaped as the 6-char sequence
  * backslash-u002E before joining, and unescaped after splitting, so
  * any segment round-trips — compress(Seq("a.b", "t")) yields
  * "a{esc}b.t" and uncompress restores ("a.b", "t") exactly.
  *
  * Known ambiguity (shared with the reference): a segment that
  * literally contains the backslash-u002E text conflates with an
  * escaped dot. Real identifiers never carry that sequence.
  */
object ObjectNames {

  private val EscapedDot = "\\u002E"

  /** Escape a single segment for joining. Null passes through (a
    * namespace level can be undeclared). */
  def escape(name: String): String =
    if (name == null || name.indexOf('.') < 0) name
    else name.replace(".", EscapedDot)

  /** Inverse of [[escape]]. */
  def unescape(name: String): String =
    if (name == null || !name.contains(EscapedDot)) name
    else name.replace(EscapedDot, ".")

  /** Join segments into one compressed name; null when nothing is
    * declared (the reference's all-null rule). Null segments join as
    * empty ("db..tbl" for a missing middle level) and uncompress back
    * to empty strings — a lossy corner the reference shares; callers
    * with nullable middles should drop them instead. */
  def compress(names: Seq[String]): String =
    if (names == null || names.isEmpty || names.forall(_ == null)) null
    else names.map(n => Option(escape(n)).getOrElse("")).mkString(".")

  /** Split a compressed name back into unescaped segments. Escaped
    * dots never match the separator, so segments with dots survive. */
  def uncompress(compressed: String): Array[String] =
    if (compressed == null || compressed.isEmpty) null
    else compressed.split("\\.", -1).map(unescape)

  /** Limit variant (the reference's two-arg overload): at most
    * `limit` segments, the last keeping any remaining separators. */
  def uncompress(compressed: String, limit: Int): Array[String] =
    if (compressed == null || compressed.isEmpty) null
    else compressed.split("\\.", limit).map(unescape)
}
