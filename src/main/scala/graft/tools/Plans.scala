package graft.tools

import graft._
import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for plan-quality review
  * (broadcast joins present, filters/column pruning pushed to scans,
  * whole-stage codegen coverage). */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    dump("linked", Pipeline.linked(spark, sfDir))
    dump("facts", graft.operators.Emit.factTriples(spark, sfDir,
      Pipeline.transcripts(spark, sfDir), Pipeline.linked(spark, sfDir)))
    dump("ann_topk", operators.Ann.bruteForceTopK(sources.Tables.embeddings(spark, sfDir)))
    dump("doc_token_stats", operators.TextOps.tokenStats(
      sources.Tables.documents(spark, sfDir).select("doc_id", "text")))
    dump("kg_works", operators.Works.workTriples(
      sources.Tables.orders(spark, sfDir), sources.Tables.lineitem(spark, sfDir)))
    dump("emb_neardup", operators.Ann.nearDupPairs(
      sources.Tables.embeddings(spark, sfDir)))
    dump("kg_ttl_lines", io.Turtle.export(Pipeline.triples(spark, sfDir)))
    spark.stop()
  }
}
