package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language-ID (marker-word
  * heuristic), quality scoring, token counting, winnowing document
  * fingerprints. Column algebra only; per-doc work is embarrassingly
  * parallel (map-only except the winnowing window, which partitions by
  * doc id).
  */
object TextAnalysis {

  /** Marker stopwords per language for the n-gram/marker heuristic
    * (LanguageID parse filter analogue, `external/langid/.../LanguageID
    * .java:54`). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for"),
    "es" -> Seq("el", "los", "las", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "zh" -> Seq("的", "是", "不", "我", "在", "有", "了", "人"))

  /** n-gram profile language identification (character trigrams +
    * script-range detection, [[graft.functions.LangProfiles]]) — the
    * reference's LanguageID parse filter approach
    * (`external/langid/.../LanguageID.java:54`), run as ONE codegen'd
    * pass per document. Language inventory lives in
    * [[graft.functions.LangProfiles]] (script ranges + script-family
    * marker tiers + Latin trigram profiles) + und; confidence =
    * dominant script fraction, or profile score / total trigrams. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        graft.functions.TextStatExpressions.langId(col(textCol)).as("li"))
      .select(col(idCol),
        col("li").getField("lang").as("lang_pred"),
        col("li").getField("conf").as("confidence"))

  /** Quality score: token count, mean word length, stopword ratio,
    * punctuation density — exact-arithmetic combination (no libm).
    * All counters come from one native pass per doc
    * ([[graft.functions.TextStatsExpr]]); the `size(filter(...))` HOF
    * formulation survives only as the DuckDB oracle. */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val st = graft.functions.TextStatExpressions
      .textStats(col(textCol), langMarkers("en"))
    df.select(
        col(idCol),
        st.getItem(0).cast("int").as("n_tokens"),
        st.getItem(5).cast("int").as("n_chars_m"),
        st.getItem(1).cast("int").as("n_stop"),
        st.getItem(2).cast("int").as("n_punct"))
      .select(
        col(idCol), col("n_tokens"),
        (col("n_stop").cast("double") / greatest(col("n_tokens"), lit(1)).cast("double"))
          .as("stop_ratio"),
        (col("n_chars_m").cast("double") / greatest(col("n_tokens"), lit(1)).cast("double"))
          .as("mean_word_len"),
        ((col("n_stop").cast("double") / greatest(col("n_tokens"), lit(1)).cast("double")) * 0.5 +
         (col("n_tokens").cast("double") / (col("n_chars_m") + 1).cast("double")) * 0.5)
          .as("quality"))
  }

  /** Token counts: whitespace tokens + a BPE-ish regex token count
    * (alnum runs and single non-space symbols counted separately).
    * One native pass per doc — no regex, no interpreted lambdas. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val st = graft.functions.TextStatExpressions
      .textStats(col(textCol), Seq.empty)
    df.select(
      col(idCol),
      st.getItem(0).cast("int").as("ws_tokens"),
      st.getItem(3).cast("int").as("alnum_tokens"),
      st.getItem(4).cast("int").as("symbol_tokens"))
  }

  /** Top-k distinctive terms per document — TF-IDF-shaped ranking with
    * a fully deterministic, integer-only order: term frequency DESC
    * (rarer-is-later tie-break on document frequency ASC, then term
    * ASC). No float idf in the sort key, so results are bit-identical
    * across engines and partitionings.
    *
    * Scale: the corpus is scanned and exploded ONCE — document
    * frequency comes from a `count over (partition by term)` window on
    * the already-aggregated (doc,term) rows, not a self-join (a join
    * formulation makes Spark re-scan + re-explode the corpus for the
    * df side). Partial aggregation (map-side combine) collapses
    * repeated terms before the first shuffle; the final top-k is a
    * per-doc `WindowGroupLimit` (rank pushed below the exchange).
    * Three shuffles, all over aggregated rows. */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    // same tokenization as [[Dedup.words]] (the literal-single-space
    // split every oracle mirrors — see its scaladoc), but as explode +
    // relational post-filter: `Dedup.words`' higher-order `filter`
    // lambda is CodegenFallback, and in a per-token explode that
    // interpretation cost multiplies by corpus token count
    val toks = graft.plans.InputWidth.widen(df)
      .select(col(idCol),
        explode(split(col(textCol), " ")).as("term"))
      .where(col("term") =!= "")
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"))
  }

  /** PII redaction: emails / IPv4s / long digit runs replaced with
    * typed placeholders. Patterns are RE2-safe (no lookaround, no \b)
    * so the identical regex runs in any engine; `regexp_replace` is
    * codegen'd — map-only at any scale. Order matters: emails first
    * (an address contains digit runs), then IPs (dotted digits), then
    * bare digit runs. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "([0-9]{1,3}\\.){3}[0-9]{1,3}" -> "[IP]",
    "[0-9]{7,}" -> "[NUM]")

  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val redacted = piiPatterns.foldLeft(col(textCol)) {
      case (c, (re, repl)) => regexp_replace(c, re, repl)
    }
    df.select(col(idCol), redacted.as("redacted"),
      size(regexp_extract_all(col(textCol), lit(piiPatterns.head._1), lit(0)))
        .as("n_emails"))
  }

  /** Winnowing fingerprints (Schleimer et al., MOSS): hash every k-word
    * shingle, take the min hash of each sliding window of `w` positions,
    * count the distinct window-minima per doc. Fingerprinting is
    * document-local, so it runs as ONE codegen'd pass per row
    * ([[graft.functions.WinnowFpExpr]]) — no posexplode, no window
    * shuffle: at scale the fingerprint stage is a pure map. The
    * windowed relational formulation survives as the DuckDB oracle. */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
                            shingleK: Int = 4, window: Int = 5): DataFrame =
    graft.plans.InputWidth.widen(df).select(col(idCol),
        graft.functions.TextHashExpressions.winnowFp(col(textCol), shingleK, window).as("wf"))
      .where(col("wf").isNotNull)
      .select(col(idCol),
        col("wf").getItem(0).as("n_fingerprints"),
        col("wf").getItem(1).as("min_fp"))
}
