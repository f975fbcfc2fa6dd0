package graft
import graft.operators.Metrics
import graft.oracle.OracleSql
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each query surfaces one stage/operator of the KG-construction pipeline
  * (SURVEY.md §2 inventory); oracleSql holds the DuckDB twin of each.
  */
object SparkEntry {
  /** Flagship: the full triple table on sf=0.001 (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.triples(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // input synthesis — also the per-turn text-equality invariant check
    "kg_transcripts" -> ((s, d) => Pipeline.transcripts(s, d)),
    // §2.2 mention detection (P1/P4-P7)
    "kg_mentions" -> ((s, d) => Pipeline.mentions(s, d)
      .select("conv_id", "turn_idx", "kind", "surface")),
    // §2.3 entity linking (J1/J2/J5) incl. fallback + ISO-literal paths
    "kg_linked" -> ((s, d) => Pipeline.linked(s, d).drop("text")),
    // §2.4 A5 / §2.5 W1 ordinal windows
    "kg_ordinals" -> ((s, d) => Pipeline.ordinals(s, d)),
    // full emission + union-distinct (A1)
    "kg_triples" -> ((s, d) => Pipeline.triples(s, d)),
    // §2.3 J7 sameAs closure (min-label propagation)
    "kg_sameas_clusters" -> ((s, d) => Pipeline.sameAsClusters(s, d)),
    // closure applied: canonical triple table
    "kg_triples_canon" -> ((s, d) => Pipeline.canonTriples(s, d)),
    // §2.4 A4 unmapped histogram
    "kg_unmapped" -> ((s, d) => Metrics.unmappedHistogram(Pipeline.linked(s, d))),
    // §2.4 A3 run statistics
    "kg_stats" -> ((s, d) => Metrics.convStats(Pipeline.triples(s, d))),
    // §2.5 W2 closest heading
    "kg_heading" -> ((s, d) => Pipeline.headings(s, d)),
    // §2.4 A7 first-mention selection
    "kg_first_person" -> ((s, d) => Pipeline.firstPerson(s, d))
  )

  def oracleSql: Map[String, String] = OracleSql.queries
}
