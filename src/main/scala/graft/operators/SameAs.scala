package graft.operators

import graft.model.Ns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sameAs canonicalization (SURVEY.md §2.3 J7): the reference only rewrites
  * identities through PERSON_MAP (`Utils/utilities.py:289-304`) and leaves
  * transitive closure to consumers; the north_rule mandates a real closure.
  *
  * Algorithm: iterative min-label propagation (connected components)
  * expressed in DataFrame joins — each pass sends every node's current label
  * across every undirected edge and takes the min. Converges in
  * O(log(diameter)) passes; our sameAs graphs are dictionary-derived chains
  * and stars with tiny diameter (≤ ~8), so 3-5 passes suffice. Per-iteration
  * `localCheckpoint` truncates lineage so the plan doesn't grow exponentially
  * (SURVEY.md §4 item 5). Edge sets are minuscule next to the fact table
  * (distinct linked entities only), so these shuffles are cheap at any scale;
  * mega-cluster skew is bounded because labels are aggregated with a
  * partial-agg-friendly min().
  */
object SameAs {

  /** edges(a, b) → (node, canon): every node of the edge set mapped to the
    * lexicographic min of its connected component. */
  def closure(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val und = edges.select(col("a"), col("b"))
      .unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = und.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var i = 0
    var changed = 1L
    while (changed > 0 && i < maxIter) {
      val msgs = und.join(labels, und("a") === labels("node"))
        .select(und("b").as("node"), col("label"))
      val next = labels.unionAll(msgs)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint()
      changed = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.label") =!= col("o.label"))
        .count()
      labels = next
      i += 1
    }
    labels.select(col("node"), col("label").as("canon"))
  }

  /** Extract sameAs edges from a triple table. */
  def edgesOf(triples: DataFrame): DataFrame =
    triples.filter(col("pred") === Ns.owlSameAs)
      .select(col("subj").as("a"), col("obj_value").as("b"))

  /** Rewrite subj and IRI objects through the canonical map, then re-dedup
    * (the rewrite can collapse previously distinct triples — same as the
    * reference's PERSON_MAP substitution collapsing graph nodes). */
  def canonicalize(triples: DataFrame, canon: DataFrame): DataFrame = {
    val cs = canon.withColumnRenamed("node", "s_node")
      .withColumnRenamed("canon", "s_canon")
    val co = canon.withColumnRenamed("node", "o_node")
      .withColumnRenamed("canon", "o_canon")
    // No broadcast hint: the canon map's size is data-dependent (distinct
    // linked entities). AQE converts these to broadcast joins at runtime
    // when the map is small; at 10^12-turn scale with a huge identity space
    // it falls back to a shuffle join with skew splitting.
    triples
      .join(cs, triples("subj") === cs("s_node"), "left")
      .join(co,
        triples("obj_is_iri") && triples("obj_value") === co("o_node"), "left")
      .select(
        coalesce(col("s_canon"), col("subj")).as("subj"),
        col("pred"),
        coalesce(col("o_canon"), col("obj_value")).as("obj_value"),
        col("obj_is_iri"), col("obj_lang"), col("obj_dtype"))
      .distinct()
  }
}
