package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation over the `documents`
  * table: token counting (whitespace + BPE-ish regex), quality scoring,
  * language-ID heuristic, and document fingerprinting.
  *
  * All counts are integers and every ratio is an explicit double division of
  * two integers, so results are bit-reproducible in the DuckDB oracle.
  */
object TextOps {

  private val stopwords = Seq("the", "a", "of", "and", "in")

  /** Token statistics: whitespace tokens, BPE-ish subword tokens (runs of
    * letters / digits / single punctuation — the usual pre-tokenizer regex),
    * char count, avg token length. */
  def tokenStats(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val bpe = regexp_extract_all(col("text"),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))
    docs.select(
      col("doc_id"),
      size(words).as("n_ws_tokens"),
      size(bpe).as("n_bpe_tokens"),
      length(col("text")).as("n_chars"),
      (length(col("text")).cast("double") / size(words)).as("avg_token_span"))
  }

  /** Quality signals: stopword ratio, punctuation count, distinct-word
    * ratio (lexical diversity), plus a deterministic 0/1 keep-gate of the
    * kind training pipelines apply (length window + stopword floor). */
  def quality(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val stopHits = size(filter(words, w => w.isin(stopwords: _*)))
    val punct = size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9 ]"), lit(0)))
    val distinctWords = size(array_distinct(words))
    docs.select(
      col("doc_id"),
      size(words).as("n_tokens"),
      stopHits.as("stop_hits"),
      (stopHits.cast("double") / size(words)).as("stop_ratio"),
      punct.as("punct_chars"),
      distinctWords.as("n_distinct"),
      (distinctWords.cast("double") / size(words)).as("diversity"),
      (size(words).between(20, 90) && stopHits >= 1).cast("int").as("keep"))
  }

  /** Language-ID heuristic: count hits against per-language marker lists
    * (n-gram/stopword style). The synthetic corpus is English-shaped, so
    * markers for other languages come from the declared `lang` column's
    * domain — the heuristic's value here is its determinism, not its
    * accuracy. Output keeps the evidence counts. */
  def langId(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val enHits = size(filter(words, w => w.isin("the", "a", "of")))
    docs.select(
      col("doc_id"), col("lang").as("declared_lang"),
      enHits.as("en_hits"),
      when(enHits >= 1, "en").otherwise(col("lang")).as("pred_lang"))
  }

  /** Document fingerprints: md5 of the whitespace-normalized text (exact
    * fingerprint) + k-min sketch (min md5 over word 5-gram shingles — a
    * winnowing-style content fingerprint robust to local edits). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val sh = Dedup.shingles(docs.select(col("doc_id"), col("text")), 5)
      .groupBy("doc_id").agg(min(md5(col("shingle"))).as("fp_kmin"))
    docs.select(col("doc_id"),
      md5(regexp_replace(trim(col("text")), "\\s+", " ")).as("fp_full"))
      .join(sh, Seq("doc_id"), "left")
  }
}
