package graft

import graft.model.Ns
import graft.operators._
import graft.sources.SynthTranscripts
import org.apache.spark.{storage}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end stage wiring (SURVEY.md §3.1 Spark trace):
  * transcripts → mentions → broadcast-linked → triple emit → sameAs closure
  * → canonical triple table. Each stage is exposed as a DataFrame factory so
  * SparkEntry.queries can surface any intermediate for the correctness gate.
  */
object Pipeline {

  def transcripts(s: SparkSession, d: String): DataFrame =
    SynthTranscripts(s, d)

  def mentions(s: SparkSession, d: String): DataFrame =
    Mentions.extract(transcripts(s, d))

  def linked(s: SparkSession, d: String): DataFrame =
    Link.linkAll(s, d, mentions(s, d))

  def triples(s: SparkSession, d: String): DataFrame =
    Emit.allTriples(s, d, transcripts(s, d), linked(s, d))

  /** The triple table + precomputed `conv` column (for Quads/convStats —
    * drops the per-row subject regex those consumers otherwise pay). */
  def triplesWithConv(s: SparkSession, d: String): DataFrame =
    Emit.allTriplesConv(s, d, transcripts(s, d), linked(s, d))

  def sameAsClusters(s: SparkSession, d: String): DataFrame =
    SameAs.closure(SameAs.edgesOf(triples(s, d)))

  def canonTriples(s: SparkSession, d: String): DataFrame = {
    // Materialize ONLY the fact triples (they feed the edge extraction +
    // both rewrite branches — canonicalize's read-twice input contract);
    // the snippet-heavy context/activity triples stream through exactly
    // once, untouched by the rewrite (ctx/act subjects/objects are
    // canon-inert by namespace). A full-table localCheckpoint variant
    // (materialize `triples` once, filter the checkpoint per branch) was
    // shipped mid-round and then REVERTED by measurement: it forces full
    // materialization of every string column that Catalyst otherwise
    // prunes under the bench's count action, and at scale the copy
    // dominates — local[2] × scale-19 compute-only reps 248-308 s vs
    // 56-58 s for this shape (the 58.7M-row checkpoint spills), while
    // under the frozen warm bench the two differ by noise (3.55 s vs
    // 3.81 s). Fewest materialized bytes wins at scale; in the staged
    // Run the triples parquet plays the checkpoint's role.
    val l = Emit.persistedLinked(linked(s, d))
    val facts = Emit.factTriples(s, d, transcripts(s, d), l)
      .localCheckpoint()
    val canon = SameAs.closure(SameAs.edgesOf(facts))
    SameAs.canonicalize(facts, canon)
      .unionAll(Emit.contextTriples(l))
      .unionAll(Emit.activityTriples(l)) // date/cert objects — canon-inert
  }

  /** Context ordinals (W1/A5) surfaced directly for verification — the
    * SAME frame emission uses (Emit.ctxFrame), so the verified ordinals and
    * the minted context URIs can never drift apart. */
  def ordinals(s: SparkSession, d: String): DataFrame =
    Emit.ctxFrame(linked(s, d))
      .select("conv_id", "turn_idx", "kind", "midx", "ordinal", "ctx_uri")

  /** W2 "closest heading": each turn gets the text of the nearest
    * role=system turn at-or-before it, falling back to the nearest after
    * (`Utils/context.py:61-92`). Pure window functions, co-partitioned with
    * the conv bucketing — one shuffle on conv_id.
    */
  def headings(s: SparkSession, d: String): DataFrame = {
    val tr = transcripts(s, d)
    val h = when(col("role") === "system", col("text"))
    val before = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    tr.select(col("conv_id"), col("turn_idx"),
      coalesce(
        last(h, ignoreNulls = true).over(before),
        first(h, ignoreNulls = true).over(after),
        lit("")).as("heading"))
  }

  /** A7 "first mentioned" person per conversation
    * (`Biography/biography.py:139-144`: mother/father = first mentioned).
    * Order key is document order (turn_idx, midx) packed into one BIGINT
    * with a 10^6 radix — collision-free for any realistic mention count
    * per turn and overflow-free for any turn index. */
  def firstPerson(s: SparkSession, d: String): DataFrame =
    linked(s, d).filter(col("kind") === "person")
      .groupBy("conv_id")
      .agg(min_by(col("obj_value"),
        col("turn_idx").cast("long") * 1000000L + col("midx"))
        .as("first_person"))
}
