package graft.pipelines

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** §2.3 text analysis: language-ID, quality scoring, token counting,
  * fingerprinting. All per-row narrow transforms (they ride the scan;
  * zero shuffles except tx04's per-doc min) built from codegen'd
  * string expressions — no UDFs in the hot path.
  */
object TextAnalysis {

  /** Occurrence count of marker `m` via length-difference — the same
    * textual expression parses in Spark SQL and DuckDB; the division
    * is exact (numerator is a multiple of the marker length). */
  private def cnt(m: String): String =
    s"CAST((length(t2) - length(replace(t2, '$m', ''))) / ${m.length} AS INT)"

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " que ", " los "),
    "fr" -> Seq(" le ", " et ", " les "),
    "zh" -> Seq("的", "是"))

  // -------------------------------------------------------------- tx01
  /** Stopword-profile language ID with a fixed priority order on
    * ties. Both engines evaluate the identical expression text. */
  private val tx01 = {
    val hitExprs = langMarkers.map { case (l, ms) =>
      s"(${ms.map(cnt).mkString(" + ")}) AS h_$l"
    }
    val langs = langMarkers.map(_._1)
    val pred = langs.init.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"h_$l >= h_$o").mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString("CASE ", " ", s" ELSE '${langs.last}' END AS pred_lang")
    QueryDef(
      "tx01_langid",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .selectExpr("doc_id", "lang", "' ' || text || ' ' AS t2")
          .selectExpr(Seq("doc_id", "lang") ++ hitExprs: _*)
          .selectExpr("doc_id", "lang", "h_en", "h_de", "h_es", "h_fr",
            "h_zh", pred)
          .selectExpr("doc_id", "lang", "h_en", "h_de", "h_es", "h_fr",
            "h_zh", "pred_lang",
            "CAST(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END AS INT) AS label_match"),
      Some(s"""WITH t AS (SELECT doc_id, lang, ' ' || text || ' ' AS t2
        |  FROM documents),
        |h AS (SELECT doc_id, lang, ${hitExprs.mkString(", ")} FROM t),
        |p AS (SELECT *, $pred FROM h)
        |SELECT doc_id, lang, h_en, h_de, h_es, h_fr, h_zh, pred_lang,
        | CAST(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END AS INT)
        |   AS label_match
        |FROM p""".stripMargin))
  }

  // -------------------------------------------------------------- tx02
  /** Quality scoring: word stats + stopword/digit/uppercase ratios
    * combined into a fixed-formula score (identical expression trees
    * on both engines => bit-equal doubles). */
  private val tx02 = {
    val stopHits = Seq(" the ", " a ", " of ", " and ").map(cnt).mkString(" + ")
    QueryDef(
      "tx02_quality",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .selectExpr("doc_id", "' ' || text || ' ' AS t2", "text",
            "CAST(size(filter(split(text, '\\\\s+'), x -> x <> '')) AS INT) AS n_words",
            "CAST(length(replace(text, ' ', '')) AS INT) AS n_nospace")
          .selectExpr("doc_id", "n_words",
            "CAST(n_nospace AS DOUBLE) / n_words AS avg_wlen",
            s"CAST(($stopHits) AS DOUBLE) / n_words AS stop_ratio",
            "CAST(length(regexp_replace(text, '[^0-9]', '')) AS DOUBLE)" +
              " / length(text) AS digit_ratio",
            "CAST(length(regexp_replace(text, '[^A-Z]', '')) AS DOUBLE)" +
              " / length(text) AS upper_ratio")
          .selectExpr("doc_id", "n_words", "avg_wlen", "stop_ratio",
            "digit_ratio", "upper_ratio",
            "(((0.3 * stop_ratio) + (0.3 * (least(avg_wlen, 8.0) / 8.0)))" +
              " + (0.2 * (1.0 - digit_ratio))) + (0.2 * (1.0 - upper_ratio))" +
              " AS quality_score"),
      Some(s"""WITH t AS (SELECT doc_id, ' ' || text || ' ' AS t2, text,
        |  CAST(len(list_filter(string_split_regex(text, '\\s+'),
        |    x -> x <> '')) AS INT) AS n_words,
        |  CAST(length(replace(text, ' ', '')) AS INT) AS n_nospace
        |  FROM documents),
        |m AS (SELECT doc_id, n_words,
        |  CAST(n_nospace AS DOUBLE) / n_words AS avg_wlen,
        |  CAST(($stopHits) AS DOUBLE) / n_words AS stop_ratio,
        |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        |    / length(text) AS digit_ratio,
        |  CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
        |    / length(text) AS upper_ratio
        |  FROM t)
        |SELECT doc_id, n_words, avg_wlen, stop_ratio, digit_ratio,
        | upper_ratio,
        | (((0.3 * stop_ratio) + (0.3 * (least(avg_wlen, 8.0) / 8.0)))
        |   + (0.2 * (1.0 - digit_ratio))) + (0.2 * (1.0 - upper_ratio))
        |   AS quality_score
        |FROM m""".stripMargin))
  }

  // -------------------------------------------------------------- tx03
  /** Token counting: whitespace tokens vs a BPE-ish regex lexer
    * ([A-Za-z]+ | digit runs), plus chars-per-token and a stored-
    * metadata consistency flag. */
  private val tx03 = QueryDef(
    "tx03_tokens",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .selectExpr("doc_id",
          "CAST(size(filter(split(text, '\\\\s+'), x -> x <> '')) AS INT) AS ws_tokens",
          "CAST(regexp_count(text, '[A-Za-z]+|[0-9]+') AS INT) AS re_tokens",
          "CAST(length(text) AS INT) AS len_text",
          "n_chars")
        .selectExpr("doc_id", "ws_tokens", "re_tokens",
          "CAST(len_text AS DOUBLE) / re_tokens AS chars_per_tok",
          "CAST(CASE WHEN len_text = n_chars THEN 1 ELSE 0 END AS INT) AS len_ok"),
    Some("""SELECT doc_id,
      | CAST(len(list_filter(string_split_regex(text, '\s+'),
      |   x -> x <> '')) AS INT) AS ws_tokens,
      | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS INT)
      |   AS re_tokens,
      | CAST(length(text) AS DOUBLE)
      |   / len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+'))
      |   AS chars_per_tok,
      | CAST(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END AS INT)
      |   AS len_ok
      |FROM documents""".stripMargin))

  // -------------------------------------------------------------- tx04
  /** Document fingerprinting: min-hash over 5-word shingles (a
    * winnowing-style content signature), second salted hash to cut
    * collision odds; short docs fall back to the full-text hash.
    * Pure per-row array math — no explode, no groupBy, no shuffle. */
  private val tx04 = QueryDef(
    "tx04_fingerprint",
    (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          expr("filter(split(text, '\\\\s+'), x -> x <> '')").as("ws"))
        .withColumn("sgs", expr(TextShingles.shingleArray(5)))
        .select(col("doc_id"),
          coalesce(expr("array_min(transform(sgs, sg -> md5(sg)))"),
            md5(col("text"))).as("fp1"),
          coalesce(expr("array_min(transform(sgs, sg -> md5(concat('s2|', sg))))"),
            md5(concat(lit("s2|"), col("text")))).as("fp2"),
          size(col("sgs")).cast("long").as("n_shingles")),
    Some(s"""WITH ${TextShingles.shinglesSql(5)},
      |fps AS (SELECT doc_id, MIN(md5(sg)) AS fp_a,
      |  MIN(md5('s2|' || sg)) AS fp_b, COUNT(*) AS n_shingles
      |  FROM sh GROUP BY doc_id)
      |SELECT d.doc_id,
      | COALESCE(f.fp_a, md5(d.text)) AS fp1,
      | COALESCE(f.fp_b, md5('s2|' || d.text)) AS fp2,
      | COALESCE(f.n_shingles, 0) AS n_shingles
      |FROM documents d LEFT JOIN fps f ON d.doc_id = f.doc_id
      |""".stripMargin))

  // -------------------------------------------------------------- tx05
  /** Corpus vocabulary statistics + per-doc key terms: tf per
    * (doc, term), document frequency per term, top-3 distinctive
    * terms per doc ranked (tf DESC, df ASC, term ASC) — the tf-idf
    * ordering expressed on INTEGER keys only. The float idf is
    * deliberately absent from the output: Java's Math.log and
    * DuckDB's libm log can differ in the last ulp, and a hash-exact
    * oracle must not depend on which libm linked. The shape is the
    * canonical vocab build: one (doc, term) shuffle for tf, one term
    * shuffle for df, a broadcast-sized df table joined back.
    *
    * The per-doc top-3 runs on the custom [[graft.plans.TopKPerGroup]]
    * operator (bounded heap, partial before the exchange) instead of a
    * windowed row_number — at 100 TB that is a heap scan of the
    * (doc, term) table, not a full sort of it. The rank column is
    * re-derived by a window AFTER the heap, over ≤3 rows per doc
    * already clustered by doc_id (no extra exchange; the sort is
    * per-3-row-group). The heap order (tf DESC, df ASC, term ASC) is
    * total within a doc — terms are unique per (doc, term) — so the
    * top-3 set and ranks are deterministic, bit-equal with the
    * row_number form the DuckDB oracle runs. */
  private val tx05 = QueryDef(
    "tx05_keyterms",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val words = TextShingles.words(s, dir)
        .select(col("doc_id"), explode(col("ws")).as("term"))
      val tf = words.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val joined = tf.join(dfreq, "term")
        .select(col("doc_id"), col("term"), col("tf"), col("df"))
      val top = graft.plans.TopKPerGroup(joined,
        keys = Seq(joined("doc_id")),
        order = Seq(joined("tf").desc, joined("df").asc, joined("term").asc),
        k = 3)
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term").asc)
      top.withColumn("rank", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rank"))
    },
    Some("""WITH w AS (SELECT doc_id,
      |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |d AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
      |SELECT doc_id, term, tf, df, rank FROM (
      |  SELECT tf.doc_id, tf.term, tf.tf, d.df,
      |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
      |      ORDER BY tf.tf DESC, d.df ASC, tf.term ASC) AS rank
      |  FROM tf JOIN d USING (term))
      |WHERE rank <= 3""".stripMargin))

  // -------------------------------------------------------------- tx06
  /** Rare-word ratio quality signal: corpus vocabulary = the top-10
    * words by document frequency (ties broken by word — deterministic
    * in both engines), per-doc fraction of token occurrences outside
    * it. High rare-ratio documents are the gibberish/OCR-noise
    * candidates a quality filter drops (the corpus-statistics signal
    * beside tx02's per-doc shape ratios). Shape: vocabulary is a
    * corpus-level aggregate (one map-side-combinable shuffle over
    * token rows) that collapses to a broadcast array; scoring is then
    * a narrow per-doc array op — the corpus itself never shuffles. */
  private val tx06 = QueryDef(
    "tx06_rareword",
    (s, dir) => {
      val w = TextShingles.words(s, dir)
      val vocab = w.select(col("doc_id"), explode(col("ws")).as("word"))
        .distinct()
        .groupBy(col("word")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("word").asc).limit(10)
        .agg(sort_array(collect_list(col("word"))).as("vocab"))
      w.crossJoin(broadcast(vocab))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_tokens"),
          expr("size(filter(ws, x -> NOT array_contains(vocab, x)))")
            .cast("long").as("n_rare"))
        .withColumn("rare_ratio",
          when(col("n_tokens") > 0,
            col("n_rare").cast("double") / col("n_tokens"))
            .otherwise(lit(0.0)))
    },
    Some("""WITH w AS (SELECT doc_id,
      |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
      |df AS (SELECT word, COUNT(DISTINCT doc_id) AS df
      |  FROM tok GROUP BY word),
      |vocab AS (SELECT word FROM df ORDER BY df DESC, word ASC LIMIT 10),
      |stats AS (SELECT t.doc_id, COUNT(*) AS n_tokens,
      |  SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS n_rare
      |  FROM tok t LEFT JOIN vocab v ON t.word = v.word
      |  GROUP BY t.doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(s.n_rare, 0) AS BIGINT) AS n_rare,
      |  CASE WHEN COALESCE(s.n_tokens, 0) > 0
      |    THEN CAST(s.n_rare AS DOUBLE) / s.n_tokens ELSE 0.0 END AS rare_ratio
      |FROM documents d LEFT JOIN stats s ON d.doc_id = s.doc_id
      |""".stripMargin))

  // -------------------------------------------------------------- tx07
  /** Repetition / boilerplate signal (the Gopher-style "repetition"
    * quality gates): per doc, the duplicate-trigram ratio (templated
    * and machine-generated text repeats long n-grams) and the
    * top-token share (max term frequency / token count — keyword-stuffed
    * or degenerate docs concentrate mass on one token). Trigram stats
    * are a NARROW per-row array op (shingles + array_distinct ride the
    * scan, nothing row-multiplies); the top-token share is one
    * (doc, term) shuffle with map-side partial counts, the same shape
    * as tx05's tf pass. Ratios are exact small-int divisions — both
    * engines produce bit-identical doubles. */
  private val tx07 = QueryDef(
    "tx07_repetition",
    (s, dir) => {
      val w = TextShingles.words(s, dir)
        .withColumn("tri", expr(TextShingles.shingleArray(3)))
      val narrow = w.select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(col("tri")).cast("long").as("n_tri"),
        size(array_distinct(col("tri"))).cast("long").as("n_tri_distinct"))
      val topTf = TextShingles.words(s, dir)
        .select(col("doc_id"), explode(col("ws")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .groupBy(col("doc_id")).agg(max(col("tf")).as("max_tf"))
      narrow.join(topTf, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("n_tri"),
          col("n_tri_distinct"),
          when(col("n_tri") > 0,
            lit(1.0) - col("n_tri_distinct").cast("double") / col("n_tri"))
            .otherwise(lit(0.0)).as("dup_tri_ratio"),
          when(col("n_tokens") > 0,
            coalesce(col("max_tf"), lit(0L)).cast("double") / col("n_tokens"))
            .otherwise(lit(0.0)).as("top_tok_ratio"))
    },
    Some("""WITH w AS (SELECT doc_id,
      |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
      |  FROM documents),
      |tri AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sg
      |  FROM w CROSS JOIN LATERAL
      |    (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t),
      |td AS (SELECT doc_id, COUNT(*) AS n_tri,
      |  COUNT(DISTINCT sg) AS n_tri_distinct FROM tri GROUP BY 1),
      |tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      |mt AS (SELECT doc_id, MAX(tf) AS max_tf FROM tf GROUP BY 1)
      |SELECT w.doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(td.n_tri, 0) AS BIGINT) AS n_tri,
      |  CAST(COALESCE(td.n_tri_distinct, 0) AS BIGINT) AS n_tri_distinct,
      |  CASE WHEN COALESCE(td.n_tri, 0) > 0
      |    THEN 1.0 - CAST(td.n_tri_distinct AS DOUBLE) / td.n_tri
      |    ELSE 0.0 END AS dup_tri_ratio,
      |  CASE WHEN len(ws) > 0
      |    THEN CAST(COALESCE(mt.max_tf, 0) AS DOUBLE) / len(ws)
      |    ELSE 0.0 END AS top_tok_ratio
      |FROM w LEFT JOIN td ON w.doc_id = td.doc_id
      |LEFT JOIN mt ON w.doc_id = mt.doc_id
      |""".stripMargin))

  // -------------------------------------------------------------- tx08
  /** PII redaction — the compliance pass a corpus takes before
    * training: emails, IPv4s and SSN-shaped ids are replaced with
    * typed placeholder tokens and counted per doc. One narrow per-row
    * pass (regexp_replace/extract_all ride the scan, zero shuffles);
    * patterns stay in the Java∩RE2 common dialect so both engines
    * match identical spans. The synthetic corpus contains no PII
    * (counts verify as zero against the oracle); TextSpec proves the
    * redaction path itself on constructed rows. */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[graft] val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** text → text with PII spans replaced by placeholder tokens. */
  private[graft] def redact(c: org.apache.spark.sql.Column) =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      SsnRe, "<SSN>")

  private val tx08 = QueryDef(
    "tx08_pii_redact",
    (s, dir) =>
      // column-function API, not expr(): Spark's SQL literal parser
      // eats backslashes ('\d' → 'd'), silently corrupting patterns
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
            .cast("long").as("n_email"),
          size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0)))
            .cast("long").as("n_ip"),
          size(regexp_extract_all(col("text"), lit(SsnRe), lit(0)))
            .cast("long").as("n_ssn"),
          redact(col("text")).as("red_text")),
    Some(s"""SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_email,
      |  CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ip,
      |  CAST(len(regexp_extract_all(text, '$SsnRe')) AS BIGINT) AS n_ssn,
      |  regexp_replace(regexp_replace(regexp_replace(text,
      |    '$EmailRe', '<EMAIL>', 'g'),
      |    '$Ipv4Re', '<IP>', 'g'),
      |    '$SsnRe', '<SSN>', 'g') AS red_text
      |FROM documents
      |""".stripMargin))

  // -------------------------------------------------------------- tx09
  /** Unigram-LM fluency score (the CCNet-style perplexity filter in
    * count space): every token occurrence is scored by its corpus
    * frequency, and a doc's signal is the mean — low-mean docs are the
    * improbable/gibberish tail a fluency filter drops. Count space
    * (not log space) on purpose: Java's and DuckDB's libm `log` can
    * differ in the last ulp (tx05's documented hazard), while integer
    * sums + one exact division are bit-identical everywhere. Shape:
    * the corpus LM "trains" in one map-side-combinable term count,
    * scoring is a (term) join back — at 100 TB the vocabulary table is
    * millions of rows (skew-safe hash join), never the corpus twice. */
  private val tx09 = QueryDef(
    "tx09_unigram_lm",
    (s, dir) => {
      val tok = TextShingles.words(s, dir)
        .select(col("doc_id"), explode(col("ws")).as("term"))
      val ctf = tok.groupBy(col("term")).agg(count(lit(1)).as("ctf"))
      val scored = tok.join(ctf, "term")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("ctf")).as("sum_ctf"))
      Tables.load(s, dir, "documents").select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("sum_ctf"), lit(0L)).as("sum_ctf"),
          when(coalesce(col("n_tokens"), lit(0L)) > 0,
            col("sum_ctf").cast("double") / col("n_tokens"))
            .otherwise(lit(0.0)).as("mean_ctf"))
    },
    Some("""WITH w AS (SELECT doc_id,
      |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
      |ctf AS (SELECT term, COUNT(*) AS ctf FROM tok GROUP BY term),
      |sc AS (SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(c.ctf) AS sum_ctf
      |  FROM tok t JOIN ctf c USING (term) GROUP BY t.doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(sc.sum_ctf, 0) AS BIGINT) AS sum_ctf,
      |  CASE WHEN COALESCE(sc.n_tokens, 0) > 0
      |    THEN CAST(sc.sum_ctf AS DOUBLE) / sc.n_tokens ELSE 0.0 END
      |    AS mean_ctf
      |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
      |""".stripMargin))

  // -------------------------------------------------------------- tx10
  /** Quality-filter CASCADE with first-fail attribution — the
    * C4/Gopher-style rule funnel every corpus build runs before
    * training: an ordered list of cheap heuristics; each document is
    * charged to the FIRST rule it fails (so the funnel's per-rule
    * drop counts sum to the rejected total, the number a pipeline
    * owner actually tunes against).
    *
    * Every rule is INTEGER-EXACT: ratio thresholds are stated as
    * cross-multiplied integer comparisons (e.g. distinct/total < 0.4
    * ⇔ 10·n_distinct < 4·n_tok), so no engine-specific float
    * division can flip a boundary document. One narrow pass riding
    * the scan — per-doc token stats are array folds on the split,
    * no shuffle, no UDF.
    *
    * Rules, in charge order:
    *   1 too_short       n_tok < 20
    *   2 too_long        n_tok > 1000
    *   3 word_len        mean token length outside [3,5]
    *                     (sum_wlen < 3·n_tok or > 5·n_tok)
    *   4 low_diversity   distinct-token ratio < 0.4
    *   5 no_stopwords    zero stopword hits
    */
  private val Tx10Stops = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** tx10's rule cascade, factored (round 13) so px01 can chain the
    * funnel between dedup and packing with ONE definition of the
    * rules (the pk08/tx17 single-definition precedent). */
  private[pipelines] val Tx10FirstFail: String =
    """CASE WHEN n_tok < 20 THEN 'too_short'
      |  WHEN n_tok > 1000 THEN 'too_long'
      |  WHEN sum_wlen < 3 * n_tok OR sum_wlen > 5 * n_tok THEN 'word_len'
      |  WHEN 10 * n_distinct < 4 * n_tok THEN 'low_diversity'
      |  WHEN n_stop = 0 THEN 'no_stopwords'
      |  ELSE 'pass' END""".stripMargin

  /** The funnel frame over any (doc_id, text) input. */
  private[pipelines] def filterFunnel(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val stopArrSpark = Tx10Stops.map(s => s"'$s'").mkString("array(", ", ", ")")
    docs
      .selectExpr("doc_id",
        "filter(split(text, '\\\\s+'), x -> x <> '') AS ws")
      .selectExpr("doc_id",
        "CAST(size(ws) AS BIGINT) AS n_tok",
        "CAST(size(array_distinct(ws)) AS BIGINT) AS n_distinct",
        "CAST(aggregate(transform(ws, x -> length(x)), 0," +
          " (a, x) -> a + x) AS BIGINT) AS sum_wlen",
        s"CAST(size(filter(ws, x -> array_contains($stopArrSpark, x)))" +
          " AS BIGINT) AS n_stop")
      .selectExpr("doc_id", "n_tok", "n_distinct", "sum_wlen", "n_stop",
        s"$Tx10FirstFail AS first_fail",
        s"CAST(CASE WHEN ($Tx10FirstFail) = 'pass' THEN 1 ELSE 0 END" +
          " AS BIGINT) AS keep")
  }

  /** DuckDB twin as WITH-clause members `w10`, `m10`, `f10` over the
    * named source relation (must expose doc_id, text). */
  private[pipelines] def tx10Ctes(from: String, sfx: String = ""): String = {
    val stopArrSql = Tx10Stops.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""w10$sfx AS (SELECT doc_id,
       |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
       |  FROM $from),
       |m10$sfx AS (SELECT doc_id,
       |  CAST(len(ws) AS BIGINT) AS n_tok,
       |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
       |  CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)
       |    AS BIGINT) AS sum_wlen,
       |  CAST(len(list_filter(ws, x -> list_contains($stopArrSql, x)))
       |    AS BIGINT) AS n_stop
       |  FROM w10$sfx),
       |f10$sfx AS (SELECT doc_id, n_tok, n_distinct, sum_wlen, n_stop,
       |  $Tx10FirstFail AS first_fail,
       |  CAST(CASE WHEN ($Tx10FirstFail) = 'pass' THEN 1 ELSE 0 END
       |    AS BIGINT) AS keep
       |  FROM m10$sfx)""".stripMargin
  }

  private val tx10 = QueryDef(
    "tx10_filter_funnel",
    (s, dir) => filterFunnel(
      Tables.load(s, dir, "documents").select("doc_id", "text")),
    Some(s"""WITH ${tx10Ctes("documents")}
      |SELECT doc_id, n_tok, n_distinct, sum_wlen, n_stop, first_fail, keep
      |FROM f10""".stripMargin))

  // -------------------------------------------------------------- tx11
  /** Shannon-surprise fluency score in INTEGER BITS — the log-scale
    * signal tx09 deliberately avoids (a CCNet-style perplexity filter
    * ranks docs by mean −log₂ p(token); tx09 stays in count space
    * because libm log differs across engines in the last ulp). The
    * exact bridge: quantize surprise to whole bits —
    * ⌊log₂(N/ctf)⌋ = bitlength(⌊N/ctf⌋) − 1, computed via bin() on
    * the exact integer quotient in BOTH engines, no libm anywhere.
    * A doc's mean bits ranks it on the same scale a real perplexity
    * filter uses (a token seen once in a 2^20-token corpus scores 20
    * bits; 'the' scores ~3), quantization costs < 1 bit of
    * resolution, and every number is hash-exact.
    *
    * Shape: identical to tx09 — one vocabulary aggregate (map-side
    * combined), one skew-safe hash join back, per-doc integer sums;
    * the corpus text never travels twice. `high_surprise` flags the
    * gibberish tail (mean ≥ 12 bits — on this corpus the ceiling is
    * ~bitlength(N) ≈ 15). */
  private val tx11 = {
    val Threshold = 12L
    QueryDef(
      "tx11_surprise",
      (s, dir) => {
        val tok = TextShingles.words(s, dir)
          .select(col("doc_id"), explode(col("ws")).as("term"))
        val ctf = tok.groupBy(col("term")).agg(count(lit(1)).as("ctf"))
        val n = tok.agg(count(lit(1)).as("n_total"))
        val scored = tok.join(ctf, "term").crossJoin(broadcast(n))
          .select(col("doc_id"),
            (length(expr("bin(n_total div ctf)")) - 1).cast("long")
              .as("bits"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("bits")).as("sum_bits"))
        Tables.load(s, dir, "documents").select(col("doc_id"))
          .join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("sum_bits"), lit(0L)).as("sum_bits"),
            when(coalesce(col("n_tokens"), lit(0L)) > 0,
              col("sum_bits").cast("double") / col("n_tokens"))
              .otherwise(lit(0.0)).as("mean_bits"))
          .withColumn("high_surprise",
            col("n_tokens") > 0 &&
              col("sum_bits") >= lit(Threshold) * col("n_tokens"))
      },
      Some(s"""WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
        |ctf AS (SELECT term, COUNT(*) AS ctf FROM tok GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_total FROM tok),
        |sc AS (SELECT t.doc_id, COUNT(*) AS n_tokens,
        |    SUM(length(bin(n.n_total // c.ctf)) - 1) AS sum_bits
        |  FROM tok t JOIN ctf c USING (term) CROSS JOIN n
        |  GROUP BY t.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(sc.sum_bits, 0) AS BIGINT) AS sum_bits,
        |  CASE WHEN COALESCE(sc.n_tokens, 0) > 0
        |    THEN CAST(sc.sum_bits AS DOUBLE) / sc.n_tokens ELSE 0.0 END
        |    AS mean_bits,
        |  COALESCE(sc.n_tokens, 0) > 0 AND
        |    COALESCE(sc.sum_bits, 0) >= $Threshold * COALESCE(sc.n_tokens, 0)
        |    AS high_surprise
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin))
  }

  // -------------------------------------------------------------- tx12
  /** BIGRAM-conditional surprise in integer bits (round 8) — the next
    * rung above tx11's unigram form, and the signal that separates
    * "rare words" from "words in the wrong order": per bigram position
    * the surprise is −log₂ P(w₂|w₁) ≈ ⌊log₂(c(w₁·)/c(w₁w₂))⌋, where
    * c(w₁·) counts bigram positions starting with w₁ (so the
    * conditional normalizes exactly) and both counts come from the
    * same one-pass aggregate family. Shuffled-word gibberish scores
    * high here even when every token is common — the fluency check a
    * perplexity filter actually wants. Bits via bin() bitlength on the
    * exact integer quotient (c₁ ≥ c₁₂ always ⇒ quotient ≥ 1), zero
    * libm, < 1 bit quantization — the tx11 bridge.
    *
    * Scale shape: the corpus explodes once to (doc, h₁, h₁₂) bigram
    * rows (16-byte keys — 60-bit hashes of the prefix token and the
    * joined pair, the dd02 long-key lesson: fixed-width HashAggregate,
    * never string SortAggregate); prefix and pair counts are two
    * map-side-combined aggregates on those keys; scoring is two hash
    * joins back on the same keys. At 100 TB the bigram vocabulary is
    * itself huge — which is exactly why it must stay a hash-partitioned
    * table and never a broadcast. Hash-collision caveat as dd13:
    * distinct bigrams colliding in 60 bits merge counts; expected mass
    * n²/2^61, identical in both engines, so the oracle stays
    * hash-exact regardless. `high_surprise` flags mean ≥ 4.5 bits via
    * the cross-multiplied integer comparison 8·sum ≥ 36·n (eighths of
    * a bit — the corpus' conditional band is tight, 4.1-4.7, so a
    * whole-bit threshold flags everything or nothing; the fractional
    * threshold stays exact integer math). */
  private val tx12 = {
    val Threshold8 = 36L // 36/8 = 4.5 bits
    QueryDef(
      "tx12_bigram_surprise",
      (s, dir) => {
        val bg = TextShingles.words(s, dir)
          .filter(size(col("ws")) >= 2)
          .select(col("doc_id"), explode(expr(
            """zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
              |  (a, b) -> named_struct('w1', a, 'pr', concat(a, '|', b)))"""
              .stripMargin)).as("g"))
          .select(col("doc_id"),
            expr(graft.OracleSafe.hash60("g.w1")).as("h1"),
            expr(graft.OracleSafe.hash60("g.pr")).as("h12"))
        val c1 = bg.groupBy(col("h1")).agg(count(lit(1)).as("c1"))
        val c12 = bg.groupBy(col("h12")).agg(count(lit(1)).as("c12"))
        val scored = bg.join(c12, "h12").join(c1, "h1")
          .select(col("doc_id"),
            (length(expr("bin(c1 div c12)")) - 1).cast("long").as("bits"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("sum_bits"))
        Tables.load(s, dir, "documents").select(col("doc_id"))
          .join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("sum_bits"), lit(0L)).as("sum_bits"),
            when(coalesce(col("n_bigrams"), lit(0L)) > 0,
              col("sum_bits").cast("double") / col("n_bigrams"))
              .otherwise(lit(0.0)).as("mean_bits"))
          .withColumn("high_surprise",
            col("n_bigrams") > 0 &&
              lit(8L) * col("sum_bits") >= lit(Threshold8) * col("n_bigrams"))
      },
      Some(s"""WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |bg AS (SELECT doc_id,
        |    ${graft.OracleSafe.hash60Sql("p[1]")} AS h1,
        |    ${graft.OracleSafe.hash60Sql("(p[1] || '|' || p[2])")} AS h12
        |  FROM w CROSS JOIN LATERAL (SELECT
        |    unnest(list_zip(ws[1:len(ws) - 1], ws[2:len(ws)])) AS p) t
        |  WHERE len(ws) >= 2),
        |c1 AS (SELECT h1, COUNT(*) AS c1 FROM bg GROUP BY h1),
        |c12 AS (SELECT h12, COUNT(*) AS c12 FROM bg GROUP BY h12),
        |sc AS (SELECT b.doc_id, COUNT(*) AS n_bigrams,
        |    SUM(length(bin(c1.c1 // c12.c12)) - 1) AS sum_bits
        |  FROM bg b JOIN c12 USING (h12) JOIN c1 USING (h1)
        |  GROUP BY b.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  CAST(COALESCE(sc.sum_bits, 0) AS BIGINT) AS sum_bits,
        |  CASE WHEN COALESCE(sc.n_bigrams, 0) > 0
        |    THEN CAST(sc.sum_bits AS DOUBLE) / sc.n_bigrams ELSE 0.0 END
        |    AS mean_bits,
        |  COALESCE(sc.n_bigrams, 0) > 0 AND
        |    8 * COALESCE(sc.sum_bits, 0) >= $Threshold8 * COALESCE(sc.n_bigrams, 0)
        |    AS high_surprise
        |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin))
  }

  // -------------------------------------------------------------- tx13
  /** Subword token counting ([[graft.functions.SubwordVocab]] greedy
    * longest-match — the budgeting unit real training pipelines pack
    * by, replacing tx03/pk01's whitespace counts): per doc, the word
    * count, total subword tokens and UNK count, all via ONE codegen'd
    * [[graft.functions.SubwordCounts]] call per row — no explode,
    * rides the scan. The DuckDB oracle replays the encoder exactly:
    * distinct words (each distinct word is encoded once — the same
    * saving a 100 TB run takes by dictionary-encoding hot words),
    * then a per-word RECURSIVE cursor (depth ≤ word length) whose
    * step takes the longest vocabulary entry matching at the cursor
    * via a lateral probe, then a join back to docs. Pure
    * integer/string ops — hash-exact. */
  private val tx13 = QueryDef(
    "tx13_subword_tokens",
    (s, dir) => {
      import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
      TextShingles.words(s, dir)
        .withColumn("c",
          column(graft.functions.SubwordCounts(expression(col("ws")))))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          element_at(col("c"), 1).as("n_subwords"),
          element_at(col("c"), 2).as("n_unk"))
    },
    Some(s"""WITH w AS (SELECT doc_id,
      |    unnest(list_filter(string_split_regex(text, '\\s+'),
      |      x -> x <> '')) AS word
      |  FROM documents),
      |dw AS (SELECT DISTINCT word FROM w),
      |vocab AS (SELECT unnest(${graft.functions.SubwordVocab.vocabSql})
      |  AS tok),
      |enc AS (
      |  WITH RECURSIVE cur(word, pos, ntok, nunk) AS (
      |    SELECT word, 1, 0, 0 FROM dw
      |    UNION ALL
      |    SELECT c.word, c.pos + COALESCE(m.mlen, 1), c.ntok + 1,
      |      c.nunk + (CASE WHEN m.mlen IS NULL THEN 1 ELSE 0 END)
      |    FROM cur c
      |    LEFT JOIN LATERAL (
      |      SELECT MAX(len(v.tok)) AS mlen FROM vocab v
      |      WHERE substr(c.word, c.pos, len(v.tok)) = v.tok) m ON TRUE
      |    WHERE c.pos <= len(c.word))
      |  SELECT word, ntok, nunk FROM cur WHERE pos > len(word)),
      |agg AS (SELECT w.doc_id, COUNT(*) AS n_words,
      |    SUM(e.ntok) AS n_subwords, SUM(e.nunk) AS n_unk
      |  FROM w JOIN enc e USING (word) GROUP BY w.doc_id)
      |SELECT d.doc_id, CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
      |  CAST(COALESCE(a.n_subwords, 0) AS BIGINT) AS n_subwords,
      |  CAST(COALESCE(a.n_unk, 0) AS BIGINT) AS n_unk
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin))

  // -------------------------------------------------------------- tx14
  /** Per-SOURCE distribution drift vs the whole corpus — the
    * domain-shift monitor a 100 TB pipeline runs when a new crawl
    * source lands: for each (source, term), the whole-bit
    * log-likelihood ratio ⌊log₂(n_g/c_g)⌋ − ⌊log₂(n_s/c_s)⌋
    * (positive when the term is over-represented in the source),
    * summed term-count-weighted per source — an integer-bits KL(
    * source ‖ corpus) estimate on tx11's no-libm bitlength bridge
    * (quantization < 1 bit/term; the whole-bit form can dip slightly
    * negative where true KL is ~0, which is itself the "no drift"
    * reading). `drifted` flags sources averaging ≥ 1 bit/token — the
    * knob a corpus owner tunes. Shape: two map-side-combined
    * aggregates ((source,term) and term — the vocabulary stays a
    * hash-partitioned table, never a broadcast, the tx12 lesson), two
    * hash joins back, one scalar broadcast; output is |sources| rows.
    * Pure integer math + one division — hash-exact. */
  private val tx14 = QueryDef(
    "tx14_source_drift",
    (s, dir) => {
      val tok = Tables.load(s, dir, "documents")
        .select(col("source"),
          explode(expr("filter(split(text, '\\\\s+'), x -> x <> '')"))
            .as("term"))
      val cs = tok.groupBy(col("source"), col("term"))
        .agg(count(lit(1)).as("c_s"))
      val ns = cs.groupBy(col("source")).agg(sum(col("c_s")).as("n_s"))
      val cg = tok.groupBy(col("term")).agg(count(lit(1)).as("c_g"))
      val ng = tok.agg(count(lit(1)).as("n_g"))
      val sc = cs.join(ns, "source").join(cg, "term")
        .crossJoin(broadcast(ng))
        .select(col("source"), col("c_s"),
          ((length(expr("bin(n_g div c_g)")) - 1) -
            (length(expr("bin(n_s div c_s)")) - 1)).cast("long").as("dbits"))
        .groupBy(col("source"))
        .agg(sum(col("c_s")).as("n_tokens"),
          count(lit(1)).as("n_terms"),
          sum(col("c_s") * col("dbits")).as("drift_bits"))
      Tables.load(s, dir, "documents").select(col("source")).distinct()
        .join(sc, Seq("source"), "left")
        .select(col("source"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_terms"), lit(0L)).as("n_terms"),
          coalesce(col("drift_bits"), lit(0L)).as("drift_bits"),
          when(coalesce(col("n_tokens"), lit(0L)) > 0,
            col("drift_bits").cast("double") / col("n_tokens"))
            .otherwise(lit(0.0)).as("bits_per_token"))
        .withColumn("drifted",
          col("n_tokens") > 0 && col("drift_bits") >= col("n_tokens"))
    },
    Some("""WITH tok AS (SELECT source,
      |  unnest(list_filter(string_split_regex(text, '\s+'),
      |    x -> x <> '')) AS term FROM documents),
      |cs AS (SELECT source, term, COUNT(*) AS c_s FROM tok GROUP BY 1, 2),
      |ns AS (SELECT source, CAST(SUM(c_s) AS BIGINT) AS n_s
      |  FROM cs GROUP BY 1),
      |cg AS (SELECT term, COUNT(*) AS c_g FROM tok GROUP BY 1),
      |ng AS (SELECT COUNT(*) AS n_g FROM tok),
      |sc AS (SELECT c.source, CAST(SUM(c.c_s) AS BIGINT) AS n_tokens,
      |    COUNT(*) AS n_terms,
      |    CAST(SUM(c.c_s * ((length(bin(ng.n_g // g.c_g)) - 1) -
      |      (length(bin(s2.n_s // c.c_s)) - 1))) AS BIGINT) AS drift_bits
      |  FROM cs c JOIN ns s2 USING (source) JOIN cg g USING (term)
      |  CROSS JOIN ng GROUP BY c.source)
      |SELECT d.source,
      |  CAST(COALESCE(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(sc.n_terms, 0) AS BIGINT) AS n_terms,
      |  CAST(COALESCE(sc.drift_bits, 0) AS BIGINT) AS drift_bits,
      |  CASE WHEN COALESCE(sc.n_tokens, 0) > 0
      |    THEN CAST(sc.drift_bits AS DOUBLE) / sc.n_tokens ELSE 0.0 END
      |    AS bits_per_token,
      |  COALESCE(sc.n_tokens, 0) > 0 AND
      |    COALESCE(sc.drift_bits, 0) >= COALESCE(sc.n_tokens, 0) AS drifted
      |FROM (SELECT DISTINCT source FROM documents) d
      |LEFT JOIN sc USING (source)""".stripMargin))

  // -------------------------------------------------------------- tx15
  /** BPE-style MERGE TRAINER over the corpus (round 11, VERDICT r10
    * #3 — the tokenizer family's missing rung: tx13 ships a fixture
    * vocabulary; every real pipeline TRAINS one). Deterministic
    * fixed-round top-pair merging on exact integer pair counts
    * (Sennrich et al. 2016, arXiv:1508.07909, re-expressed for a
    * distributed corpus):
    *
    *   1. the ONE corpus-scale pass collapses the corpus to a
    *      (word, freq) vocabulary table — a map-side-combined groupBy,
    *      exactly how production BPE trainers start; every later step
    *      touches only this table (hash-partitioned, never broadcast —
    *      the tx12/tx14 lesson);
    *   2. each word's segmentation is a string of WRAPPED symbols
    *      (`<c1><c2>…`) — wrapping makes the per-round merge apply a
    *      single engine-portable `replace(seg, '<l><r>', '<lr>')`:
    *      adjacent matches share no delimiter, so left-to-right
    *      non-overlapping replacement IS the standard greedy one-pass
    *      BPE apply (the corpus is [a-z ]-only; `<`/`>` are safe);
    *   3. per round: adjacent-pair counts weighted by word freq
    *      (exact integers — order-invariant under any partitioning),
    *      global argmax with pinned tie-break (count DESC, lhs ASC,
    *      rhs ASC; a TakeOrdered of ONE row — the emb05 Lloyd
    *      recipe's bounded per-round collect), merge applied to the
    *      vocab table, plan kept flat with an eager checkpoint.
    *
    * [[BpeRounds]] merge rounds; output = the merge TABLE (round,
    * lhs, rhs, merged, pair_count) — the artifact a tokenizer ships.
    * tx13/pk05's encoder already treats its vocabulary as data, so
    * the trained merges feed it directly (TextSpec pins that
    * round-trip). DuckDB replays the full trajectory as chained
    * MATERIALIZED CTEs; hash-exact at all three SFs. No end-of-word
    * marker (documented choice: the corpus' words are space-delimited
    * already; merges never cross word boundaries by construction). */
  private[pipelines] val BpeRounds = 12

  private def freeCp(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** The trainer loop, shared by tx15 and pk06's end-to-end pipeline:
    * [[BpeRounds]] rounds of (pair count → pinned-tiebreak argmax →
    * merge apply) over the vocabulary table. Returns the merge list
    * (round, lhs, rhs, merged, pair_count), in training order. */
  private[pipelines] def trainBpeMerges(
      s: SparkSession, dir: String): Seq[(Int, String, String, String, Long)] = {
    var words = Tables.load(s, dir, "documents")
      .select(explode(expr("regexp_extract_all(text, '[a-z]+', 0)"))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("seg", regexp_replace(col("word"), "(.)", "<$1>"))
      .localCheckpoint(true)
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var i = 1
    while (i <= BpeRounds) {
      val counts = words
        .withColumn("syms", expr("regexp_extract_all(seg, '<([^>]*)>', 1)"))
        .select(col("freq"), explode(expr(
          "transform(slice(syms, 1, size(syms) - 1), " +
            "(x, i) -> struct(x AS lhs, syms[i + 1] AS rhs))")).as("pr"))
        .select(col("freq"), col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
        .groupBy("lhs", "rhs").agg(sum(col("freq")).as("cnt"))
      val best = counts
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()(0)
      val (l, r, c) = (best.getString(0), best.getString(1), best.getLong(2))
      merges += ((i, l, r, l + r, c))
      val nw = words
        .withColumn("seg", expr(s"replace(seg, '<$l><$r>', '<$l$r>')"))
        .localCheckpoint(true)
      freeCp(words)
      words = nw
      i += 1
    }
    freeCp(words)
    merges.toSeq
  }

  /** Process-level trained-merges artifact (optimization r17 — the
    * ann06→ann09 / ensureMemberIndex producer/consumer registry
    * pattern): tx15 IS the trainer and keeps paying the live 12-round
    * loop on every invocation (its bench line measures training);
    * pk06's verb is the trained APPLY (encode + pack) over the merge
    * table a tokenizer ships as data, so it reads the artifact built
    * once per (dir, process) instead of re-running the identical
    * training loop (~24 driver-round jobs) per invocation. The merge
    * list is 12 tuples — deterministic, engine-independent — so
    * pk06's oracle replay is unchanged. */
  private val bpeMergesBuilt = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Int, String, String, String, Long)]]()

  private[pipelines] def bpeMergesArtifact(
      s: SparkSession, dir: String): Seq[(Int, String, String, String, Long)] =
    bpeMergesBuilt.computeIfAbsent(dir, _ => trainBpeMerges(s, dir))

  /** The DuckDB replay of the trainer trajectory (w0 … m{R}/w{R}),
    * shared by tx15's oracle and pk06's (which chains the per-doc
    * encode + packing window after it). Starts after a `WITH`. */
  private[pipelines] def bpeCtes: String = {
    val rounds = (1 to BpeRounds).map { r =>
      val p = s"w${r - 1}"
      s"""sy$r AS MATERIALIZED (SELECT word, freq,
         |  regexp_extract_all(seg, '<([^>]*)>', 1) AS syms FROM $p),
         |p$r AS MATERIALIZED (SELECT lhs, rhs,
         |    CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |  SELECT s.freq, s.syms[t.i] AS lhs, s.syms[t.i + 1] AS rhs
         |  FROM sy$r s, LATERAL (SELECT unnest(generate_series(1,
         |    len(s.syms) - 1)) AS i) t)
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p$r
         |  ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1),
         |w$r AS MATERIALIZED (SELECT word, freq,
         |  replace(seg, '<'||m.lhs||'><'||m.rhs||'>',
         |    '<'||m.lhs||m.rhs||'>') AS seg
         |  FROM $p, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS MATERIALIZED (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
       |    regexp_replace(word, '(.)', '<\\1>', 'g') AS seg
       |  FROM (SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS word
       |    FROM documents) GROUP BY 1),
       |$rounds""".stripMargin
  }

  private val tx15 = QueryDef(
    "tx15_bpe_train",
    (s, dir) => {
      import s.implicits._
      trainBpeMerges(s, dir)
        .toDF("round", "lhs", "rhs", "merged", "pair_count")
    },
    Some {
      val sel = (1 to BpeRounds)
        .map(r => s"SELECT $r AS round, lhs, rhs, lhs||rhs AS merged, " +
          s"cnt AS pair_count FROM m$r")
        .mkString("\nUNION ALL ")
      s"""WITH $bpeCtes
         |$sel""".stripMargin
    })

  // -------------------------------------------------------------- tx16
  /** CORPUS-FREQUENCY BOILERPLATE REMOVAL — the CCNet/RefinedWeb pass
    * (Wenzek et al. 2020, arXiv:1911.00359; Penedo et al. 2023,
    * arXiv:2306.01116): text fragments repeated across many DOCUMENTS
    * (headers, footers, navigation chrome) are deleted from every
    * document; dd13/dd16 target long verbatim runs between doc PAIRS,
    * this targets short spans whose signal is corpus-wide document
    * frequency. The unit is the non-overlapping [[Tx16SpanW]]-token
    * span (the fixture has no newlines, so spans play the role lines
    * play on web text); the tail (< W tokens) is always kept.
    *
    * The boilerplate rule is CORPUS-RELATIVE: the top ⌈keys/100⌉ span
    * keys by (document frequency DESC, span ASC), with a df ≥ 2
    * floor. An absolute df threshold has NO stable regime on this
    * uniform synthetic corpus (measured: at W=2 every threshold is
    * either ~0% or ~100% removal as the SF changes, because df/n
    * concentrates as n grows) — and rank cuts are also the
    * scale-portable form: a top-k is a `TakeOrderedAndProject`, never
    * a global window.
    *
    * Scale shape: span construction is a narrow per-row transform; df
    * is ONE map-side-combinable distinct-aggregate shuffle keyed by
    * span; the cut is a count plus a top-k (the boilerplate list —
    * ≤1% of the key space — is a bounded model artifact like emb05's
    * centroids, broadcast into the span stream); marking is a
    * broadcast hash join riding the scan; reassembly is ONE
    * doc-keyed aggregate, the only stage that carries document text.
    * Deterministic end-to-end (exact counts, pinned tie-breaks, exact
    * integer cut) — the DuckDB replay hash-matches at all three SFs. */
  private val Tx16SpanW = 2

  private val tx16 = QueryDef(
    "tx16_boilerplate",
    (s, dir) => {
      val base = TextShingles.words(s, dir).select(
        col("doc_id"),
        expr("CAST(size(ws) AS BIGINT)").as("n_tok"),
        expr(s"CASE WHEN size(ws) % $Tx16SpanW = 1 THEN ws[size(ws) - 1] " +
          "ELSE '' END").as("tail_tok"),
        expr(s"""CASE WHEN size(ws) >= $Tx16SpanW THEN
            transform(sequence(1, size(ws) div $Tx16SpanW),
              i -> concat(ws[$Tx16SpanW*i - 2], ' ', ws[$Tx16SpanW*i - 1]))
          ELSE array() END""").as("sps"))
      val sp = base.select(col("doc_id"), col("n_tok"), col("tail_tok"),
        posexplode_outer(col("sps")).as(Seq("idx", "sg")))
      val dfTab = sp.filter(col("sg").isNotNull)
        .groupBy("sg").agg(countDistinct(col("doc_id")).as("df"))
      // bounded driver scalar: the distinct-span-key count sizes the
      // rank cut (exact ⌈keys/100⌉ in both engines)
      val nKeys = dfTab.count()
      val kCut = ((nKeys + 99L) / 100L).toInt
      val boiler = dfTab.orderBy(col("df").desc, col("sg").asc)
        .limit(kCut).filter(col("df") >= 2L)
        .select(col("sg"), lit(true).as("hit"))
      sp.join(broadcast(boiler), Seq("sg"), "left_outer")
        .select(col("doc_id"), col("n_tok"), col("tail_tok"), col("idx"),
          col("sg"), coalesce(col("hit"), lit(false)).as("rem"))
        .groupBy(col("doc_id"), col("n_tok"), col("tail_tok"))
        .agg(
          count(col("sg")).as("n_spans"),
          sum(when(col("rem"), 1L).otherwise(0L)).as("removed_spans"),
          concat_ws(" ", transform(
            array_sort(collect_list(
              when(!col("rem") && col("sg").isNotNull,
                struct(col("idx"), col("sg"))))),
            x => x.getField("sg"))).as("kept"))
        .select(col("doc_id"), col("n_tok"), col("n_spans"),
          col("removed_spans"),
          when(col("kept") === "", col("tail_tok"))
            .when(col("tail_tok") === "", col("kept"))
            .otherwise(concat(col("kept"), lit(" "), col("tail_tok")))
            .as("cleaned"))
    },
    Some(s"""WITH w AS (SELECT doc_id,
      |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
      |  FROM documents),
      |b AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tok,
      |  len(ws) // $Tx16SpanW AS nsp,
      |  CASE WHEN len(ws) % $Tx16SpanW = 1 THEN ws[len(ws)] ELSE '' END
      |    AS tail_tok,
      |  ws FROM w),
      |sp AS (SELECT doc_id, t.i AS idx,
      |  ws[$Tx16SpanW*t.i - 1] || ' ' || ws[$Tx16SpanW*t.i] AS sg
      |  FROM b CROSS JOIN LATERAL
      |    (SELECT unnest(generate_series(1, nsp)) AS i) t),
      |dfx AS (SELECT sg, COUNT(DISTINCT doc_id) AS df FROM sp GROUP BY sg),
      |st AS (SELECT COUNT(*) AS n_keys FROM dfx),
      |bo AS (SELECT x.sg FROM (SELECT sg, df,
      |    ROW_NUMBER() OVER (ORDER BY df DESC, sg ASC) AS r FROM dfx) x, st
      |  WHERE x.r <= (st.n_keys + 99) // 100 AND x.df >= 2),
      |mk AS (SELECT s.doc_id, s.idx, s.sg, (b2.sg IS NOT NULL) AS rem
      |  FROM sp s LEFT JOIN bo b2 USING (sg)),
      |ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
      |  CAST(SUM(CASE WHEN rem THEN 1 ELSE 0 END) AS BIGINT)
      |    AS removed_spans,
      |  COALESCE(string_agg(CASE WHEN NOT rem THEN sg END, ' '
      |    ORDER BY idx), '') AS kept
      |  FROM mk GROUP BY doc_id)
      |SELECT b.doc_id, b.n_tok,
      |  COALESCE(ag.n_spans, 0) AS n_spans,
      |  COALESCE(ag.removed_spans, 0) AS removed_spans,
      |  CASE WHEN COALESCE(ag.kept, '') = '' THEN b.tail_tok
      |       WHEN b.tail_tok = '' THEN ag.kept
      |       ELSE ag.kept || ' ' || b.tail_tok END AS cleaned
      |FROM b LEFT JOIN ag USING (doc_id)""".stripMargin))

  // -------------------------------------------------------------- tx17
  /** CCNet PERPLEXITY BUCKETS (Wenzek et al. 2020, arXiv:1911.00359
    * §4.3) — the quality-split every CCNet-lineage corpus ships: a
    * language model trained on a CLEAN REFERENCE slice (CCNet uses
    * Wikipedia; here the first [[Tx17RefSrcs]] sources play that
    * role) scores EVERY document, and the corpus splits into
    * equal-document head/middle/tail terciles by perplexity — head =
    * most reference-like, the slice pretraining recipes up-sample.
    * Differs from tx11 in both halves: the LM is trained on the
    * reference slice (scoring is relative to a TARGET distribution,
    * not the corpus itself — tx14's drift direction reversed), and
    * the output is the rank-based tercile label, not a fixed
    * threshold.
    *
    * Determinism: tx11's integer-bits bridge (⌊log₂(N/ctf)⌋ via
    * bin(), no libm) + out-of-vocabulary tokens scored bitlength(N) —
    * one bit above the rarest reference token (a fixed additive
    * smoothing in log space). The per-doc score is the EXACT scaled
    * integer ⌊2²⁰·sum_bits/n_tokens⌋, so ranks and tercile cuts are
    * pure integer comparisons with doc_id tie-breaks.
    *
    * Scale shape: reference ctf = one map-side-combined aggregate
    * (vocabulary-bounded, stays hash-partitioned — the tx12 lesson);
    * scoring = one hash join riding the token stream; the tercile
    * rank uses [[Ranking.integerRank]] — the pk04 two-phase rank on
    * the score integer, whose histogram collect is bounded by the
    * score RANGE (≤ ~40·2²⁰ ≫ shifted to ~hundreds of buckets),
    * never the corpus; NO global sort anywhere. */
  private val Tx17RefSrcs = Seq("src0", "src1", "src2", "src3")
  /** tx17's scoring + tercile pass as a reusable frame — pk08's
    * curriculum phases consume it (the pk05 chaining pattern). */
  private[pipelines] def pplBuckets(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val tok = TextShingles.words(s, dir)
      .select(col("doc_id"), explode(col("ws")).as("term"))
    val refTok = Tables.load(s, dir, "documents")
      .filter(col("source").isin(Tx17RefSrcs: _*))
      .select(col("doc_id"))
      .join(tok, "doc_id")
    val ctf = refTok.groupBy(col("term")).agg(count(lit(1)).as("ctf"))
    val n = refTok.agg(count(lit(1)).as("n_ref"))
    val scored = tok.join(ctf, Seq("term"), "left")
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        when(col("ctf").isNotNull,
          (length(expr("bin(n_ref div ctf)")) - 1).cast("long"))
          .otherwise(length(expr("bin(n_ref)")).cast("long"))
          .as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("bits")).as("sum_bits"))
    val base = Tables.load(s, dir, "documents").select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"))
      .withColumn("ppl_q",
        when(col("n_tokens") > 0,
          expr("(sum_bits * 1048576L) div n_tokens"))
          .otherwise(lit(0L)))
    val nDocs = Tables.rowCount(s, dir, "documents")
    val pos = Ranking.integerRank(base, "ppl_q", "doc_id", 15)
    base.join(pos, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("sum_bits"),
        col("ppl_q"),
        when(col("pos") * 3 < nDocs, "head")
          .when(col("pos") * 3 < 2L * nDocs, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** DuckDB twin of [[pplBuckets]]: the CTE chain and the final
    * select, split so pk08 can chain the whole pass as `t17`. */
  private[pipelines] val Tx17Select: String =
    """SELECT doc_id, n_tokens, sum_bits, CAST(ppl_q AS BIGINT) AS ppl_q,
      |  CASE WHEN pos * 3 < n_docs THEN 'head'
      |       WHEN pos * 3 < 2 * n_docs THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM rk""".stripMargin

  private[pipelines] val Tx17Ctes: String = {
    val refIn = Tx17RefSrcs.map(s => s"'$s'").mkString(", ")
    s"""w AS (SELECT doc_id,
      |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
      |rtok AS (SELECT t.doc_id, t.term FROM tok t
      |  JOIN documents d ON t.doc_id = d.doc_id
      |  WHERE d.source IN ($refIn)),
      |ctf AS (SELECT term, COUNT(*) AS ctf FROM rtok GROUP BY term),
      |n AS (SELECT COUNT(*) AS n_ref FROM rtok),
      |sc AS (SELECT t.doc_id, COUNT(*) AS n_tokens,
      |    SUM(CASE WHEN c.ctf IS NOT NULL
      |      THEN length(bin(n.n_ref // c.ctf)) - 1
      |      ELSE length(bin(n.n_ref)) END) AS sum_bits
      |  FROM tok t LEFT JOIN ctf c USING (term) CROSS JOIN n
      |  GROUP BY t.doc_id),
      |b AS (SELECT d.doc_id,
      |  CAST(COALESCE(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(sc.sum_bits, 0) AS BIGINT) AS sum_bits,
      |  CASE WHEN COALESCE(sc.n_tokens, 0) > 0
      |    THEN (sc.sum_bits * 1048576) // sc.n_tokens ELSE 0 END AS ppl_q
      |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
      |rk AS (SELECT *,
      |  ROW_NUMBER() OVER (ORDER BY ppl_q ASC, doc_id ASC) - 1 AS pos,
      |  COUNT(*) OVER () AS n_docs FROM b)""".stripMargin
  }

  private val tx17 = QueryDef(
    "tx17_ppl_buckets",
    (s, dir) => pplBuckets(s, dir),
    Some(s"WITH $Tx17Ctes\n$Tx17Select"))

  // ------------------------------------------------------------- tx18
  /** GOPHER REPETITION FILTERS (round 12; Rae et al. 2021,
    * arXiv:2112.11446 Table A1) — the per-document repetition gates
    * every Gopher/MassiveText-lineage corpus runs between language ID
    * and quality scoring: documents dominated by a single repeated
    * n-gram, or with a large mass of duplicated n-grams, are
    * machine-generated/boilerplate and are dropped before training.
    * Two legs, both character-mass fractions over the
    * space-normalized document (denom = Σ token chars + separators):
    *
    *  1. TOP-2-GRAM fraction: chars of the most frequent 2-gram ×
    *     its count / denom (ties → lexicographically smallest gram —
    *     deterministic in both engines). Gopher's threshold 0.20
    *     kept: flags 6/8/59 docs at the three SFs.
    *  2. DUPLICATE-3-GRAM fraction: chars in ALL occurrences of
    *     3-grams appearing more than once / denom (overlap-counting,
    *     the paper's definition). Gopher gates n=5..10; this
    *     fixture's duplicated-5-gram mass is exactly ZERO (measured
    *     at every SF — short word-salad docs), so the gate runs the
    *     same n-agnostic math at n=3 with threshold 0.10 (flags
    *     9/5/80) so both outcomes are non-vacuous.
    *
    * keep = both fractions at or under threshold. All counts are
    * integers; each fraction is ONE textually-identical double
    * division (the q37 recipe) so the hash matches bit-for-bit.
    * Scale: 2-/3-gram explodes are bounded row-multiplies riding the
    * scan; the per-(doc,gram) count and per-doc window shuffle on
    * doc-keyed data — corpus-linear, no global structure. */
  private val tx18 = QueryDef(
    "tx18_gopher_repeat",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = TextShingles.words(s, dir)
        .withColumn("n_tokens", size(col("ws")).cast("long"))
        .withColumn("denom",
          expr("aggregate(ws, 0L, (a, x) -> a + length(x))") +
            when(col("n_tokens") > 0, col("n_tokens") - 1).otherwise(lit(0L)))
      val g2 = base.filter(col("n_tokens") >= 2)
        .select(col("doc_id"),
          explode(expr(TextShingles.shingleArray(2))).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      val w2 = Window.partitionBy("doc_id")
        .orderBy(col("c").desc, col("g").asc)
      val top2 = g2.withColumn("rn", row_number().over(w2))
        .filter(col("rn") === 1)
        .select(col("doc_id"),
          (col("c") * length(col("g"))).cast("long").as("top2_n"))
      val dup3 = base.filter(col("n_tokens") >= 3)
        .select(col("doc_id"),
          explode(expr(TextShingles.shingleArray(3))).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .groupBy("doc_id")
        .agg(sum(col("c") * length(col("g"))).cast("long").as("dup3_n"))
      base.select("doc_id", "n_tokens", "denom")
        .join(top2, Seq("doc_id"), "left")
        .join(dup3, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"), col("denom"),
          coalesce(col("top2_n"), lit(0L)).as("top2_n"),
          coalesce(col("dup3_n"), lit(0L)).as("dup3_n"))
        .withColumn("top2_frac", expr(
          "CASE WHEN denom > 0 THEN CAST(top2_n AS DOUBLE) / denom ELSE CAST(0 AS DOUBLE) END"))
        .withColumn("dup3_frac", expr(
          "CASE WHEN denom > 0 THEN CAST(dup3_n AS DOUBLE) / denom ELSE CAST(0 AS DOUBLE) END"))
        .withColumn("keep",
          col("top2_frac") <= 0.2 && col("dup3_frac") <= 0.1)
    },
    Some("""WITH w AS (SELECT doc_id,
      |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
      |  FROM documents),
      |base AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0)
      |      AS BIGINT)
      |    + CASE WHEN len(ws) > 0 THEN len(ws) - 1 ELSE 0 END AS denom
      |  FROM w),
      |g2 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g, COUNT(*) AS c
      |  FROM w CROSS JOIN LATERAL
      |    (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) t
      |  GROUP BY doc_id, g),
      |top2 AS (SELECT doc_id, CAST(c * length(g) AS BIGINT) AS top2_n
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY c DESC, g ASC) AS rn FROM g2)
      |  WHERE rn = 1),
      |g3 AS (SELECT doc_id,
      |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g, COUNT(*) AS c
      |  FROM w CROSS JOIN LATERAL
      |    (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t
      |  GROUP BY doc_id, g),
      |dup3 AS (SELECT doc_id, CAST(SUM(c * length(g)) AS BIGINT) AS dup3_n
      |  FROM g3 WHERE c > 1 GROUP BY doc_id),
      |sel AS (SELECT b.doc_id, b.n_tokens, b.denom,
      |    COALESCE(t.top2_n, 0) AS top2_n, COALESCE(d.dup3_n, 0) AS dup3_n
      |  FROM base b LEFT JOIN top2 t USING (doc_id)
      |  LEFT JOIN dup3 d USING (doc_id))
      |SELECT doc_id, n_tokens, denom, top2_n, dup3_n,
      |  CASE WHEN denom > 0 THEN CAST(top2_n AS DOUBLE) / denom
      |    ELSE CAST(0 AS DOUBLE) END AS top2_frac,
      |  CASE WHEN denom > 0 THEN CAST(dup3_n AS DOUBLE) / denom
      |    ELSE CAST(0 AS DOUBLE) END AS dup3_frac,
      |  top2_frac <= 0.2 AND dup3_frac <= 0.1 AS keep
      |FROM sel""".stripMargin))

  // ------------------------------------------------------------- tx19
  /** PII REDACTION (round 12) — the masking pass every released web
    * corpus runs before training (C4 scrubbed pages; Dolma §2.3 /
    * RedPajama-v2 mask emails, IP addresses and phone numbers with
    * exactly this regex-class approach): per document, count and
    * replace each PII class with a typed placeholder token, emitting
    * the cleaned text plus the per-class counts an audit needs. The
    * fixture corpus is PII-free by construction (digit-free word
    * salad), so the gate INJECTS deterministic PII first — the ing02
    * corruption pattern: the oracle knows the injection RULE, and the
    * whole inject→count→redact path is hash-gated end-to-end.
    *
    * Injection rule (id-keyed, classes overlap on lcm residues):
    * id ≡ 0 mod 5 prepends an email, id ≡ 0 mod 7 appends an IPv4,
    * id ≡ 0 mod 11 appends a phone. Patterns are the Java∩RE2
    * compatible subset (character classes + bounded repeats — no
    * backrefs/lookaround, so Spark's java.util.regex and DuckDB's RE2
    * agree by construction). Counts are taken on the dirty text;
    * redaction applies all three classes (nested regexp_replace —
    * Spark replaces all occurrences natively, DuckDB via the 'g'
    * flag). Scale: one narrow per-row map riding the scan — no
    * shuffle, no state, codegen'd regex. */
  private val tx19 = QueryDef(
    "tx19_pii_redact",
    (s, dir) => {
      val emailPat = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
      val ipPat = "10\\.[0-9]+\\.[0-9]+\\.[0-9]+"
      val phonePat = "555-[0-9]{4}"
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("dirty", expr(
          """concat(
            |  CASE WHEN doc_id % 5 = 0
            |    THEN concat('contact u', doc_id, '@ex', doc_id % 7, '.org ')
            |    ELSE '' END,
            |  text,
            |  CASE WHEN doc_id % 7 = 0
            |    THEN concat(' from 10.', doc_id % 256, '.0.', doc_id % 100)
            |    ELSE '' END,
            |  CASE WHEN doc_id % 11 = 0
            |    THEN concat(' call 555-', 1000 + doc_id % 9000)
            |    ELSE '' END)""".stripMargin))
        .select(col("doc_id"),
          regexp_count(col("dirty"), lit(emailPat)).cast("long").as("n_email"),
          regexp_count(col("dirty"), lit(ipPat)).cast("long").as("n_ip"),
          regexp_count(col("dirty"), lit(phonePat)).cast("long").as("n_phone"),
          regexp_replace(
            regexp_replace(
              regexp_replace(col("dirty"), emailPat, "<EMAIL>"),
              ipPat, "<IP>"),
            phonePat, "<PHONE>").as("clean"))
        .withColumn("is_dirty",
          col("n_email") + col("n_ip") + col("n_phone") > 0)
    },
    Some("""WITH dirty AS (SELECT doc_id,
      |  CASE WHEN doc_id % 5 = 0
      |    THEN 'contact u' || doc_id || '@ex' || (doc_id % 7) || '.org '
      |    ELSE '' END ||
      |  text ||
      |  CASE WHEN doc_id % 7 = 0
      |    THEN ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)
      |    ELSE '' END ||
      |  CASE WHEN doc_id % 11 = 0
      |    THEN ' call 555-' || (1000 + doc_id % 9000)
      |    ELSE '' END AS dirty
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(dirty, '[a-z0-9]+@[a-z0-9]+\.[a-z]+'))
      |    AS BIGINT) AS n_email,
      |  CAST(len(regexp_extract_all(dirty, '10\.[0-9]+\.[0-9]+\.[0-9]+'))
      |    AS BIGINT) AS n_ip,
      |  CAST(len(regexp_extract_all(dirty, '555-[0-9]{4}'))
      |    AS BIGINT) AS n_phone,
      |  regexp_replace(regexp_replace(regexp_replace(dirty,
      |    '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
      |    '10\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g'),
      |    '555-[0-9]{4}', '<PHONE>', 'g') AS clean,
      |  n_email + n_ip + n_phone > 0 AS is_dirty
      |FROM dirty""".stripMargin))

  // ------------------------------------------------------------- tx20
  /** QUALITY-CLASSIFIER FILTER with Pareto-tail sampling (round 12) —
    * the GPT-3 CommonCrawl curation rule (Brown et al. 2020
    * arXiv:2005.14165 Appendix A, reused by LLaMA/RedPajama): a cheap
    * linear classifier over hashed n-gram features scores every
    * document against a high-quality reference, and documents are
    * kept when `pareto(α=9) > 1 − score` — LOW-scoring docs still
    * keep a heavy-tailed chance, which preserves distributional
    * diversity instead of hard-thresholding (the paper's stated
    * reason). Re-expressed fully deterministically and ENGINE-EXACT:
    *
    *  - features: each bigram occurrence hashes (md5-60) into 256
    *    buckets; weights are the fixed integer table
    *    w(j) = (j·37) mod 101 − 50 (a synthetic classifier — the
    *    real one is trained data, and the operator treats it as
    *    such: any 256-int table slots in);
    *  - margin = Σ w(bucket) over occurrences — INTEGER; normalized
    *    to s64 ∈ [0,64] with an offset-before-divide so the integer
    *    division never sees a negative numerator (Spark `div` and
    *    DuckDB `//` agree on nonnegative truncation by construction);
    *  - the Pareto rule: u^(−1/9) − 1 > 1 − s  ⟺  u·(2−s)⁹ < 1.
    *    s = s64/64 and u = (md5-52 bits)/2⁵² are EXACT doubles
    *    (divisions by powers of two); (2−s)⁹ is spelled as nine
    *    left-associated IEEE multiplications with the SAME expression
    *    text in both engines — no libm pow, no rounding divergence.
    *    P(keep) = min(1, (2−s)⁻⁹): s=1 always keeps, s=0 keeps 1/512.
    *
    * Spec re-derives margins/s64/keep driver-side byte-for-byte and
    * pins both outcomes AND both tail regimes non-vacuous (kept
    * low-score docs exist — the heavy tail actually fires). Scale:
    * one bounded bigram explode + a doc-keyed agg + a narrow map —
    * corpus-linear, classifier application is embarrassingly
    * parallel (the reason this filter runs at CommonCrawl scale). */
  private val tx20 = {
    val uTxt = "(CAST(u52 AS DOUBLE) / 4503599627370496.0)"
    val yTxt = "(2.0 - CAST(s64 AS DOUBLE) / 64.0)"
    val keepTxt = s"$uTxt * ${Seq.fill(9)(yTxt).mkString(" * ")} < 1.0"
    val s64Txt = "CASE WHEN n_bigrams > 0 THEN " +
      "LEAST(GREATEST(((margin + n_bigrams * 50) * 32) DIVOP (n_bigrams * 50), 0), 64) " +
      "ELSE 32 END"
    QueryDef(
      "tx20_quality_classifier",
      (s, dir) => {
        val g = TextShingles.words(s, dir)
          .filter(size(col("ws")) >= 2)
          .select(col("doc_id"),
            explode(expr(TextShingles.shingleArray(2))).as("g"))
        val agg = g
          .select(col("doc_id"),
            pmod(expr(graft.OracleSafe.hash60("g")), lit(256L)).as("j"))
          .withColumn("w", pmod(col("j") * 37, lit(101L)) - 50L)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum("w").as("margin"))
        TextShingles.words(s, dir).select(col("doc_id"))
          .join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("margin"), lit(0L)).as("margin"))
          .withColumn("s64", expr(s64Txt.replace("DIVOP", "div")))
          .withColumn("u52",
            pmod(expr(graft.OracleSafe.hash60("concat('qc|', CAST(doc_id AS STRING))")),
              lit(4503599627370496L)))
          .withColumn("keep", expr(keepTxt))
          .select("doc_id", "n_bigrams", "margin", "s64", "u52", "keep")
      },
      Some(s"""WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |g AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
        |  FROM w CROSS JOIN LATERAL
        |    (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) t),
        |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |    CAST(SUM((${graft.OracleSafe.hash60Sql("g")} % 256) * 37 % 101 - 50)
        |      AS BIGINT) AS margin
        |  FROM g GROUP BY doc_id),
        |b AS (SELECT w.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams,
        |    COALESCE(a.margin, 0) AS margin
        |  FROM w LEFT JOIN agg a USING (doc_id)),
        |sc AS (SELECT *, ${s64Txt.replace("DIVOP", "//")} AS s64,
        |    ${graft.OracleSafe.hash60Sql("'qc|' || CAST(doc_id AS VARCHAR)")}
        |      % 4503599627370496 AS u52
        |  FROM b)
        |SELECT doc_id, n_bigrams, margin, s64, u52, $keepTxt AS keep
        |FROM sc""".stripMargin))
  }

  // -------------------------------------------------------------- tx21
  /** DSIR-style data selection via importance resampling (round 14) —
    * the hashed-n-gram importance weighting of Xie et al. 2023
    * ("Data Selection for Language Models via Importance Resampling"),
    * the standard pretraining-corpus selection recipe: score every
    * raw document by how target-like its hashed n-gram distribution
    * is, keep the target-leaning mass. Target here is the `lang='en'`
    * slice (a stand-in for the paper's Wikipedia+books formal-text
    * target); features are word unigrams AND bigrams hashed into
    * [[Tx21Buckets]] buckets, exactly the paper's feature space.
    *
    * The importance weight is INTEGER-EXACT in the tx11/tx12 bit
    * convention (no libm, no float log): per occurrence of a feature
    * in bucket b the score is
    *   [bitlen(t_b+1) − bitlen(T+B)] − [bitlen(r_b+1) − bitlen(R+B)]
    * — floor-log₂ of the +1-smoothed target probability minus
    * floor-log₂ of the raw probability, each term a bin() bit-length
    * on a BIGINT. No product ever forms (the naive
    * bitlen((t+1)·(R+B)) form overflows BIGINT once a corpus passes
    * ~3·10⁹ features; the term-by-term form is scale-safe to 2⁶³
    * features), at ≤2 bits quantization per occurrence, identical in
    * both engines. `selected` keeps the docs whose PER-FEATURE score
    * beats the corpus mean (DSIR's keep-the-target-leaning-mass, at
    * the natural threshold — a flat ≥0 cut is vacuous because the
    * floor-log smoothing bias shifts every sum negative):
    * sum_score·F ≥ S·n_feat, cross-multiplied with both sides as
    * products of exact integers cast to DOUBLE — the same two
    * correctly-rounded multiplies in both engines, overflow-free at
    * any corpus size (past 2⁵³ it quantizes, identically on both
    * sides of the compare).
    *
    * Scale shape (SURVEY §5): the corpus explodes ONCE to
    * (doc, bucket) feature rows riding the scan (is_target is read
    * from the doc row BEFORE exploding, so no join touches the
    * exploded table except the final broadcast); the two bucket
    * histograms are map-side-combined aggregates producing ≤B rows
    * each; the score table is B rows and BROADCAST back onto the
    * feature rows; the per-doc sum is the query's ONE shuffle. At
    * 100 TB: one wide-table pass, one broadcast hash join, one
    * map-side-combined per-doc aggregate.
    *
    * Fixture non-vacuity: the generator gives each lang a distinct
    * token-frequency profile over a shared vocabulary ('order'/
    * 'table' hot in en; 'slow'/'agg' in es; 'scan'/'data' in fr), so
    * en docs genuinely score higher — PipelineSpec pins the mean-gap
    * plus a crafted two-vocabulary corpus where selection is exact.
    */
  private val Tx21Buckets = 1024L
  private val tx21 = QueryDef(
    "tx21_dsir",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), (col("lang") === "en").as("is_tgt"),
          expr("filter(split(text, '\\\\s+'), x -> x <> '')").as("ws"))
      val uni = docs.select(col("doc_id"), col("is_tgt"),
        explode(col("ws")).as("f"))
        .select(col("doc_id"), col("is_tgt"),
          concat(lit("u|"), col("f")).as("f"))
      val big = docs.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), col("is_tgt"),
          explode(expr(TextShingles.shingleArray(2))).as("g"))
        .select(col("doc_id"), col("is_tgt"),
          concat(lit("b|"), col("g")).as("f"))
      val feats = uni.union(big).select(col("doc_id"), col("is_tgt"),
        pmod(expr(graft.OracleSafe.hash60("f")), lit(Tx21Buckets)).as("b"))
      val rb = feats.groupBy(col("b")).agg(count(lit(1)).as("r"))
      val tb = feats.filter(col("is_tgt"))
        .groupBy(col("b")).agg(count(lit(1)).as("t"))
      val totals = feats
        .agg(count(lit(1)).as("rtot"),
          sum(when(col("is_tgt"), 1L).otherwise(0L)).as("ttot"))
      val bits = (e: String) => s"CAST(length(bin($e)) - 1 AS BIGINT)"
      val sc = rb.join(tb, Seq("b"), "left")
        .select(col("b"), col("r"), coalesce(col("t"), lit(0L)).as("t"))
        .crossJoin(broadcast(totals))
        .selectExpr("b",
          s"(${bits("t + 1")} - ${bits(s"ttot + $Tx21Buckets")})" +
            s" - (${bits("r + 1")} - ${bits(s"rtot + $Tx21Buckets")})" +
            " AS score")
      val perDoc = feats.join(broadcast(sc), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_feat"), sum(col("score")).as("sum_score"))
      val corpus = perDoc.agg(sum(col("n_feat")).as("ftot"),
        sum(col("sum_score")).as("stot"))
      Tables.load(s, dir, "documents").select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .crossJoin(broadcast(corpus))
        .select(col("doc_id"),
          coalesce(col("n_feat"), lit(0L)).as("n_feat"),
          coalesce(col("sum_score"), lit(0L)).as("sum_score"),
          (coalesce(col("n_feat"), lit(0L)) > 0 &&
            coalesce(col("sum_score"), lit(0L)).cast("double") *
              col("ftot").cast("double") >=
              col("stot").cast("double") *
                coalesce(col("n_feat"), lit(0L)).cast("double"))
            .as("selected"))
    },
    Some {
      val bits = (e: String) => s"CAST(length(bin($e)) - 1 AS BIGINT)"
      s"""WITH w AS (SELECT doc_id, lang = 'en' AS is_tgt,
        |  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |uni AS (SELECT doc_id, is_tgt, 'u|' || t AS f FROM
        |  (SELECT doc_id, is_tgt, unnest(ws) AS t FROM w)),
        |big AS (SELECT doc_id, is_tgt, 'b|' || ws[i] || ' ' || ws[i+1] AS f
        |  FROM w CROSS JOIN LATERAL
        |    (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) t
        |  WHERE len(ws) >= 2),
        |feats AS (SELECT doc_id, is_tgt,
        |    ${graft.OracleSafe.hash60Sql("f")} % $Tx21Buckets AS b
        |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
        |rb AS (SELECT b, COUNT(*) AS r FROM feats GROUP BY b),
        |tb AS (SELECT b, COUNT(*) AS t FROM feats WHERE is_tgt GROUP BY b),
        |tot AS (SELECT COUNT(*) AS rtot,
        |    SUM(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS ttot FROM feats),
        |sc AS (SELECT rb.b,
        |    (${bits("COALESCE(tb.t, 0) + 1")} - ${bits(s"tot.ttot + $Tx21Buckets")})
        |    - (${bits("rb.r + 1")} - ${bits(s"tot.rtot + $Tx21Buckets")}) AS score
        |  FROM rb LEFT JOIN tb USING (b) CROSS JOIN tot),
        |pd AS (SELECT f.doc_id, COUNT(*) AS n_feat, SUM(sc.score) AS sum_score
        |  FROM feats f JOIN sc USING (b) GROUP BY f.doc_id),
        |corp AS (SELECT SUM(n_feat) AS ftot, SUM(sum_score) AS stot FROM pd)
        |SELECT d.doc_id,
        |  CAST(COALESCE(pd.n_feat, 0) AS BIGINT) AS n_feat,
        |  CAST(COALESCE(pd.sum_score, 0) AS BIGINT) AS sum_score,
        |  COALESCE(pd.n_feat, 0) > 0 AND
        |    CAST(COALESCE(pd.sum_score, 0) AS DOUBLE) * CAST(corp.ftot AS DOUBLE)
        |    >= CAST(corp.stot AS DOUBLE) * CAST(COALESCE(pd.n_feat, 0) AS DOUBLE)
        |    AS selected
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id CROSS JOIN corp
        |""".stripMargin
    })

  val defs: Seq[QueryDef] =
    Seq(tx01, tx02, tx03, tx04, tx05, tx06, tx07, tx08, tx09, tx10, tx11,
      tx12, tx13, tx14, tx15, tx16, tx17, tx18, tx19, tx20, tx21)
}
