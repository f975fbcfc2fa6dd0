package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-turn mention detection — the analog of the reference's tag selection
  * (`find_all(...)` over NAME/PLACE/ORGNAME/JOB subtrees, SURVEY.md §2.2
  * P1/P4-P7). Mentions sit in fixed syntactic frames in the transcript text
  * ("visited X", "met X", "working as X", "at X", "leaving X") the way the
  * reference's mentions sit in fixed XML tags.
  *
  * Scale design: ONE projection builds an array of (kind, surface) structs
  * and explodes it — a single pass over the scan, no self-unions that would
  * re-read the input N times, no shuffle. The whole stage is narrow and
  * codegen-friendly (regexp_extract + explode).
  */
object Mentions {

  /** Frames: kind → (regex, group). A turn may carry ANY number of mentions
    * of each kind — all matches are collected, in document order, like the
    * reference's `find_all` (`Utils/utilities.py:351-360`). */
  val frames: Seq[(String, String)] = Seq(
    "place"      -> "visited (Nation_[0-9]+)",
    "place_left" -> "leaving (Nation_[0-9]+)",
    "person"     -> "met (Customer#[0-9]{9})",
    "org"        -> "at (Supplier#[0-9]{9})",
    "occupation" -> "working as ([A-Za-z-]+)",
    "education"  -> "studied at (Academy_[0-9]+)")

  /** transcripts(conv_id, turn_idx, role, text, tool, ts)
    * → mentions(conv_id, turn_idx, kind, midx, surface, text, ts).
    * `midx` is the 0-based match position of this mention within its
    * (turn, kind) — the document-order tiebreak that keeps ordinals and
    * first-mention selection deterministic when a turn mentions a kind
    * more than once. `text`/`ts` ride along so downstream context/activity
    * emission needs no join back to the scan (SURVEY.md §2.8 F7/F9).
    */
  def extract(transcripts: DataFrame): DataFrame = {
    val candidates = array(frames.map { case (kind, re) =>
      struct(lit(kind).as("kind"),
        regexp_extract_all(col("text"), lit(re), lit(1)).as("ms"))
    }: _*)
    transcripts
      .select(col("conv_id"), col("turn_idx"), col("text"), col("ts"),
        explode(candidates).as("m"))
      .select(col("conv_id"), col("turn_idx"), col("m.kind").as("kind"),
        posexplode(col("m.ms")).as(Seq("midx", "surface")),
        col("text"), col("ts"))
  }
}
