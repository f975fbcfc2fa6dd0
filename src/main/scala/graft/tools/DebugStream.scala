package graft.tools

import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Scratch probe for stream_linked latency breakdown (deleted after use). */
object DebugStream {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    // batch control: the same extract+link cold (no caches)
    t("batch extract+link cold") {
      operators.Link.linkAll(spark, dir,
        operators.Mentions.extract(Pipeline.transcripts(spark, dir))).count()
    }
    t("dict build alone") {
      operators.Link.unifiedDict(spark, dir).count()
    }
    // streaming run with progress breakdown
    val stream = streaming.StreamOps.linkedStream(spark, dir)
    val t0 = System.nanoTime()
    val q = stream.writeStream.format("memory").queryName("dbg_linked")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    println(f"[probe] stream_linked total        ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    q.recentProgress.foreach { p =>
      println(s"[probe] batch ${p.batchId}: rows=${p.numInputRows} " +
        s"durations=${p.durationMs}")
    }
    spark.stop()
  }
}
