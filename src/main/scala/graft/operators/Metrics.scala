package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Run metrics — the analog of the reference's mapping-failure histograms
  * (`Biography/culturalForm.py:546-638`, `Utils/place.py:100-113`) and
  * run statistics (`Biography/bio_extraction.py:84-90`). These are emitted
  * as queryable DataFrames (and persisted next to the output by the sink)
  * instead of log lines.
  */
object Metrics {

  /** A4: per-(kind, surface) counts of unmapped values. */
  def unmappedHistogram(linked: DataFrame): DataFrame =
    linked.filter(!col("matched"))
      .groupBy(col("kind"), col("surface"))
      .agg(count(lit(1)).as("n"))

  /** A3: triples-per-conversation statistics (total/max/min/avg), one row.
    * The conv of a triple is recovered from its subject URI; identity
    * triples (person/viaf subjects) are out of scope like the reference's
    * per-file stats. avg is computed as an explicit double division so the
    * oracle reproduces it bit-for-bit.
    */
  def convStats(triples: DataFrame): DataFrame = {
    val withConv = triples
      .withColumn("conv", regexp_extract(col("subj"), "(conv_[0-9]+)", 1))
      .filter(col("conv") =!= "")
    val per = withConv.groupBy("conv").agg(count(lit(1)).as("n"))
    per.agg(
      count(lit(1)).as("n_convs"),
      sum("n").as("total_triples"),
      max("n").as("max_per_conv"),
      min("n").as("min_per_conv"),
      (sum("n").cast("double") / count(lit(1))).as("avg_per_conv"))
  }
}
