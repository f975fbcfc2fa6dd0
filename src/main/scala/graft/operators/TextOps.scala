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

  /** Per-language stopword marker lists (fastText/langdetect-style
    * evidence, stopword flavor). Overlaps (la, de, es…) are fine — the
    * argmax with a fixed priority tie-break keeps it deterministic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is"),
    "fr" -> Seq("le", "la", "les", "des", "et", "une", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "es" -> Seq("el", "los", "las", "que", "y", "es", "una"))

  /** Language-ID: per-language stopword hit counts → argmax, ties broken by
    * the fixed language order above; zero evidence falls back to the
    * declared lang column. Output keeps the per-language evidence counts.
    * A real model slots into the same shape (counts → scores). */
  def langId(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val hitCols = langMarkers.map { case (l, ms) =>
      l -> size(filter(words, w => w.isin(ms: _*)))
    }
    val best = greatest(hitCols.map(_._2): _*)
    val pred = hitCols.foldRight(col("lang")) { case ((l, h), els) =>
      when(h === best, lit(l)).otherwise(els)
    }
    docs.select(
      Seq(col("doc_id"), col("lang").as("declared_lang")) ++
        hitCols.map { case (l, h) => h.as(s"${l}_hits") } :+
        when(best === 0, col("lang")).otherwise(pred).as("pred_lang"): _*)
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
