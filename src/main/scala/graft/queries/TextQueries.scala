package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for a large-scale training-data pipeline:
  * token statistics, quality scoring, language ID (n-gram/stopword
  * heuristic), and a BPE-ish regex tokenizer count.
  *
  * Scale design: every operator here is a PER-ROW projection built from
  * codegen'd built-ins (split / HOFs / regex) — no shuffle, no UDF, no
  * driver state. On 100 TB of documents these run map-only at scan speed,
  * and column pruning means only `doc_id`+`text` are read.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Whitespace tokens of `text` (the corpus is single-space separated). */
  private def toks(c: Column): Column = split(c, " ")

  // Stopword/marker lists shared between the Spark side and the SQL oracle.
  private val stopEn = Seq("the", "a", "of", "and", "to", "in", "is", "on")
  private val markEn = Seq("the", "is", "and", "of", "to")
  private val markDe = Seq("der", "die", "das", "und", "ist")
  private val markFr = Seq("le", "la", "les", "et", "est")
  private val markEs = Seq("el", "los", "las", "y", "es")

  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Count of tokens that appear in `words`, as a codegen'd HOF chain. */
  private def countIn(ts: Column, words: Seq[String]): Column =
    size(filter(ts, t => t.isin(words.map(x => x: Any): _*)))

  /** q20: token statistics (token counting: whitespace tokenizer). */
  def q20TextStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        length($"text").as("len_chars"),
        size(toks($"text")).as("n_tokens"),
        size(array_distinct(toks($"text"))).as("n_uniq_tokens"))
      .orderBy($"doc_id")
  }

  val q20Sql: String =
    """SELECT doc_id,
      | LENGTH(text) AS len_chars,
      | len(string_split(text, ' ')) AS n_tokens,
      | len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** q21: quality scoring — stopword ratio, punctuation ratio, mean token
    * length, and a boolean gate. Ratios are exact IEEE divisions of integer
    * counts, so they hash-match across engines without rounding. */
  def q21TextQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = toks($"text")
    val nTok = size(t).cast("double")
    val stopRatio = countIn(t, stopEn).cast("double") / nTok
    val punct = length($"text") -
      length(regexp_replace($"text", "[^A-Za-z0-9 ]", ""))
    val punctRatio = punct.cast("double") / length($"text").cast("double")
    val avgTokLen = aggregate(t, lit(0),
      (acc, x) => acc + length(x)).cast("double") / nTok
    Tables.documents(s, dir)
      .select($"doc_id",
        stopRatio.as("stop_ratio"),
        punctRatio.as("punct_ratio"),
        avgTokLen.as("avg_tok_len"),
        (length($"text") >= 100 && stopRatio <= lit(0.3) &&
          punctRatio <= lit(0.1)).as("quality_ok"))
      .orderBy($"doc_id")
  }

  val q21Sql: String = {
    val stop = s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ${sqlList(stopEn)})) AS DOUBLE)" +
      " / CAST(len(string_split(text, ' ')) AS DOUBLE)"
    val punct = "CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)" +
      " / CAST(LENGTH(text) AS DOUBLE)"
    val avgTok = "CAST(list_sum(list_transform(string_split(text, ' '), t -> LENGTH(t))) AS DOUBLE)" +
      " / CAST(len(string_split(text, ' ')) AS DOUBLE)"
    s"""SELECT doc_id,
       | $stop AS stop_ratio,
       | $punct AS punct_ratio,
       | $avgTok AS avg_tok_len,
       | (LENGTH(text) >= 100 AND $stop <= 0.3 AND $punct <= 0.1) AS quality_ok
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  /** q22: language ID via stopword-marker counting with a deterministic
    * arg-max (priority order en > de > fr > es on ties; 'unknown' when no
    * marker hits). A real pipeline would use char-n-gram profiles; the
    * Spark shape (per-row HOF counts + CASE) is identical. */
  def q22LangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = toks($"text")
    val (nEn, nDe, nFr, nEs) =
      (countIn(t, markEn), countIn(t, markDe), countIn(t, markFr), countIn(t, markEs))
    Tables.documents(s, dir)
      .select($"doc_id", $"lang",
        nEn.as("n_en"), nDe.as("n_de"), nFr.as("n_fr"), nEs.as("n_es"))
      .withColumn("lang_pred",
        when($"n_en" === 0 && $"n_de" === 0 && $"n_fr" === 0 && $"n_es" === 0, "unknown")
          .when($"n_en" >= $"n_de" && $"n_en" >= $"n_fr" && $"n_en" >= $"n_es", "en")
          .when($"n_de" >= $"n_fr" && $"n_de" >= $"n_es", "de")
          .when($"n_fr" >= $"n_es", "fr")
          .otherwise("es"))
      .orderBy($"doc_id")
  }

  val q22Sql: String = {
    def cnt(ws: Seq[String]) =
      s"len(list_filter(string_split(text, ' '), t -> t IN ${sqlList(ws)}))"
    s"""SELECT doc_id, lang, n_en, n_de, n_fr, n_es,
       | CASE
       |   WHEN n_en = 0 AND n_de = 0 AND n_fr = 0 AND n_es = 0 THEN 'unknown'
       |   WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
       |   WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
       |   WHEN n_fr >= n_es THEN 'fr'
       |   ELSE 'es'
       | END AS lang_pred
       |FROM (
       |  SELECT doc_id, lang,
       |    ${cnt(markEn)} AS n_en, ${cnt(markDe)} AS n_de,
       |    ${cnt(markFr)} AS n_fr, ${cnt(markEs)} AS n_es
       |  FROM documents
       |)
       |ORDER BY doc_id""".stripMargin
  }

  /** q23: BPE-ish token count — alpha runs, single digits, single
    * punctuation marks (regex shared with the oracle; RE2/Java compatible). */
  def q23TokenRegexCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        regexp_count($"text", lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"))
          .as("n_bpe_tokens"))
      .orderBy($"doc_id")
  }

  val q23Sql: String =
    """SELECT doc_id,
      | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS n_bpe_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- q56: deterministic stratified train/val/test split ----

  /** q56: content-addressed dataset split — every document lands in
    * train/val/test by `md5(doc_id) mod 100` (80/10/10), reported as
    * per-(lang, split) counts. The hash assignment is the point: it is
    * STABLE under corpus growth (a document's split never changes when
    * neighbors are added/removed — row_number-based splits reshuffle
    * everything) and needs no global sort or driver state.
    *
    * Scale: map-only hash + one partial-aggregated count; the result is
    * strata × 3 rows. This is how a 100 TB corpus gets split: no sampling
    * pass, no persisted assignment table. */
  /** The per-document split assignment: a pure function of the id, so a
    * document's split survives corpus growth/shrinkage (row_number splits
    * reshuffle on any change) — pinned in PipelineQueriesSpec. */
  def splitAssign(s: SparkSession, id: Column): Column = {
    val bucket = pmod(
      graft.functions.Md5Prefix64(s, id.cast("string").cast("binary"), 8),
      lit(100L))
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  }

  def q56StratifiedSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val split = splitAssign(s, $"doc_id")
    Tables.documents(s, dir)
      .select($"lang", split.as("split"), $"n_chars")
      .groupBy($"lang", $"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .orderBy($"lang", $"split")
  }

  val q56Sql: String = {
    val bucket = s"(${DedupQueries.sqlH32("CAST(doc_id AS VARCHAR)")} % 100)"
    s"""SELECT lang,
       | CASE WHEN $bucket < 80 THEN 'train'
       |      WHEN $bucket < 90 THEN 'val'
       |      ELSE 'test' END AS split,
       | COUNT(*) AS n_docs,
       | CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM documents
       |GROUP BY 1, 2
       |ORDER BY lang, split""".stripMargin
  }

  // ---- q57: TF-IDF top terms per document ----

  val TfIdfTopK = 3

  /** q57: corpus-weighted term scoring — smoothed TF-IDF
    * (`tf · (ln((N+1)/(df+1)) + 1)`, the sklearn formulation) with the
    * top-[[TfIdfTopK]] terms per document.
    *
    * Scale design: term frequencies are one shuffle on (doc_id, term);
    * document frequencies aggregate THAT result (vocabulary-sized, ≪
    * corpus) and come back as a broadcast join, so the corpus-sized side
    * never reshuffles for the idf lookup. The corpus size N joins as a
    * broadcast single row (no driver-side count). Top-k is a row_number
    * window → WindowGroupLimit pushes the limit into the partial sort.
    *
    * Determinism: the ranking and output key is round(tfidf, 6) with a
    * term tie-break (the float-similarity recipe), so an ulp-level ln()
    * disagreement between engines cannot flip ranks. */
  def q57TfIdf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val tok = docs.select($"doc_id", explode(toks($"text")).as("term"))
    val tf = tok.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .select($"doc_id", $"term", $"tf", $"df",
        round($"tf" * (log(($"n" + lit(1.0)) / ($"df" + lit(1.0))) + lit(1.0)), 6)
          .as("tfidf_r"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"tfidf_r".desc, $"term")))
      .where($"rnk" <= TfIdfTopK)
      .select($"doc_id", $"rnk", $"term", $"tf", $"df", $"tfidf_r")
      .orderBy($"doc_id", $"rnk")
  }

  val q57Sql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |scored AS (
       |  SELECT doc_id, term, tf, df,
       |    round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf_r
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY tfidf_r DESC, term) AS rnk
       |  FROM scored)
       |SELECT doc_id, rnk, term, tf, df, tfidf_r
       |FROM ranked WHERE rnk <= $TfIdfTopK
       |ORDER BY doc_id, rnk""".stripMargin

  val queries: Map[String, Q] = Map(
    "q20_text_stats"        -> (q20TextStats _),
    "q21_text_quality"      -> (q21TextQuality _),
    "q22_lang_id"           -> (q22LangId _),
    "q23_token_regex_count" -> (q23TokenRegexCount _),
    "q56_stratified_split"  -> (q56StratifiedSplit _),
    "q57_tfidf_topterms"    -> (q57TfIdf _),
  )

  val oracleSql: Map[String, String] = Map(
    "q20_text_stats"        -> q20Sql,
    "q21_text_quality"      -> q21Sql,
    "q22_lang_id"           -> q22Sql,
    "q23_token_regex_count" -> q23Sql,
    "q56_stratified_split"  -> q56Sql,
    "q57_tfidf_topterms"    -> q57Sql,
  )
}
