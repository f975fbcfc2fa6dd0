package graft.io

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint/resume + lineage for staged materialization (SURVEY.md §4
  * item 4; north_rule: "resumable from checkpoint with per-partition
  * lineage + metrics").
  *
  * Each stage writes:
  *  - `<out>/<stage>/` — the stage's rows (partitioned parquet; in a real
  *    deployment an Iceberg table — same layout, snapshot id ↔ manifest row)
  *  - `<out>/_lineage/<stage>/` — per-partition row counts (partition_id,
  *    rows) captured from the ACTUAL write-side partitions
  *  - one JSON line in `<out>/manifest.jsonl` — (stage, rows, partitions,
  *    wall_ms, status) — the resume log.
  *
  * `resume = true` skips any stage whose manifest line says "done" and whose
  * directory exists, reading the materialized parquet instead — a restart
  * re-executes only the missing suffix of the DAG.
  */
class RunManifest(spark: SparkSession, out: String, resume: Boolean) {

  private val manifestPath = Paths.get(s"$out/manifest.jsonl")
  Files.createDirectories(Paths.get(out))

  private def doneStages: Set[String] =
    if (!Files.exists(manifestPath)) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(manifestPath).asScala
        .filter(_.contains("\"status\":\"done\""))
        .flatMap { l =>
          "\"stage\":\"([^\"]+)\"".r.findFirstMatchIn(l).map(_.group(1))
        }.toSet
    }

  private def appendLine(s: String): Unit =
    Files.writeString(manifestPath, s + "\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  /** Materialize `df` as stage `name` (or reuse it when resuming).
    * `partitionCols` adds a directory-partitioned layout (the Iceberg
    * bucket(...) analog) so per-entity reads prune. */
  def stage(name: String, partitionCols: Seq[String] = Nil)
           (df: => DataFrame): DataFrame = {
    val dir = s"$out/$name"
    if (resume && doneStages.contains(name) && Files.exists(Paths.get(dir))) {
      appendLine(s"""{"stage":"$name","status":"skipped_resume"}""")
      return spark.read.parquet(dir)
    }
    val t0 = System.nanoTime()
    val d = df
    val w = d.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dir)
    val written = spark.read.parquet(dir)
    // per-partition lineage: ONE scan of the materialized stage, attributed
    // to the FILES the write tasks committed (input_file_name) — true
    // write-side lineage, independent of how the re-read happens to split.
    // The key keeps the partition DIRECTORY (bucket=N/...) so a
    // directory-partitioned stage never aggregates unrelated part-00000
    // files from different buckets under one id.
    val lineage = written
      .groupBy(regexp_extract(input_file_name(),
        "([^/]+=[^/]+/)?part-[0-9]+[^/]*$", 0).as("partition_id"))
      .agg(count(lit(1)).as("rows"))
      .collect()
    import spark.implicits._
    lineage.map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("partition_id", "rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/_lineage/$name")
    val rows = lineage.map(_.getLong(1)).sum
    val nParts = lineage.length
    val wallMs = (System.nanoTime() - t0) / 1000000
    appendLine(s"""{"stage":"$name","status":"done","rows":$rows,"partitions":$nParts,"wall_ms":$wallMs}""")
    written
  }
}
