package graft.tools

import graft._
import graft.operators._
import org.apache.spark.sql.SparkSession

/** Dev profiling main: per-phase wall times of the compute path. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions._
    val tmp = Files.createTempDirectory("graft-prof-in")
    Seq("nation", "region", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Files.createSymbolicLink(tmp.resolve(s"$t.parquet"), Paths.get(s"$sfDir/$t.parquet"))
    }
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("k", explode(sequence(lit(0L), lit(scale - 1L))))
      .withColumn("event_id", col("event_id") + col("k") * 1000000L)
      .drop("k").repartition(spark.sparkContext.defaultParallelism)
      .write.parquet(tmp.resolve("events.parquet").toString)
    val d = tmp.toString

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    phase("mentions.count") { Pipeline.mentions(spark, d).count() }
    phase("linked.count") { Pipeline.linked(spark, d).count() }
    val t = Pipeline.triples(spark, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    phase("triples.count (materialize)") { t.count() }
    val canon = phase("closure") { SameAs.closure(SameAs.edgesOf(t)) }
    phase("canonicalize.count") { SameAs.canonicalize(t, canon).count() }
    spark.stop()
  }
}
