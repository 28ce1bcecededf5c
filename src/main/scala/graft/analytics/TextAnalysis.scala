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

  private def markerCount(wordsCol: Column, lang: String): Column =
    size(filter(wordsCol, w => w.isin(langMarkers(lang).map(lit): _*)))

  /** Predicted language = argmax of marker-word hits, ties broken by
    * language code ascending; confidence = hits / tokens. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val langs = langMarkers.keys.toSeq.sorted
    val withWords = df.select(col(idCol), Dedup.words(col(textCol)).as("ws"))
    val scored = langs.foldLeft(withWords)((d, l) =>
      d.withColumn(s"s_$l", markerCount(col("ws"), l)))
    val best = greatest(langs.map(l => col(s"s_$l")): _*)
    val pred = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"s_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight puts earlier langs outermost => first max wins ties
    scored.select(col(idCol), pred.as("lang_pred"),
      (best.cast("double") / greatest(size(col("ws")), lit(1)).cast("double")).as("confidence"))
  }

  /** Quality score: token count, mean word length, stopword ratio,
    * punctuation density — exact-arithmetic combination (no libm). */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = Dedup.words(col(textCol))
    df.select(
        col(idCol),
        size(ws).as("n_tokens"),
        length(col(textCol)).as("n_chars_m"),
        size(filter(ws, w => w.isin(langMarkers("en").map(lit): _*))).as("n_stop"),
        size(split(col(textCol), "[.,!?;:]")).minus(1).as("n_punct"))
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
    * (alnum runs and single non-space symbols counted separately). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(Dedup.words(col(textCol))).as("ws_tokens"),
      size(filter(split(col(textCol), "[^A-Za-z0-9]+"), t => t =!= "")).as("alnum_tokens"),
      length(regexp_replace(col(textCol), "[A-Za-z0-9\\s]", "")).as("symbol_tokens"))

  /** Winnowing fingerprints (Schleimer et al., MOSS): hash every k-word
    * shingle, take the min hash of each sliding window of `w` positions,
    * count the distinct window-minima per doc. Fingerprinting is
    * document-local, so it runs as ONE codegen'd pass per row
    * ([[graft.functions.WinnowFpExpr]]) — no posexplode, no window
    * shuffle: at scale the fingerprint stage is a pure map. The
    * windowed relational formulation survives as the DuckDB oracle. */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
                            shingleK: Int = 4, window: Int = 5): DataFrame =
    df.select(col(idCol),
        graft.functions.TextHashExpressions.winnowFp(col(textCol), shingleK, window).as("wf"))
      .where(col("wf").isNotNull)
      .select(col(idCol),
        col("wf").getItem(0).as("n_fingerprints"),
        col("wf").getItem(1).as("min_fp"))
}
