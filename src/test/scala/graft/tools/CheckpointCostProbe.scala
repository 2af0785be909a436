package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe — dev only (r18, VERDICT #5): prices RELIABLE
  * checkpointing against localCheckpoint for the shared kNN edge
  * substrate at sf1, for SCALE.md's executor-loss posture section.
  * localCheckpoint blocks are non-replicated executor memory/disk — an
  * executor loss at cluster scale kills the lineage; reliable
  * checkpoint() writes to the checkpoint dir (HDFS/object store in
  * production) and survives. This measures what that durability costs
  * on the same frame.
  */
object CheckpointCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft_ck_probe_").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.embeddings(spark, sfDir)
    val n = e.filter(size(col("embedding")) >= 64).count()
    var b = 4
    while ((1L << b) * 32 < n && b < 24) b += 1
    println(s"PROBE n=$n b=$b")
    def edges = graft.llm.Similarity.knnGraph(e, "vec_id", "embedding",
      k = 3, b = b, dim = 64, bands = 2)
    // warm (JIT + parquet footers)
    edges.count()
    (1 to 2).foreach { r =>
      var t0 = System.nanoTime()
      val lc = edges.localCheckpoint()
      println(f"PROBE r$r localCheckpoint ${(System.nanoTime() - t0) / 1e9}%6.2f s (${lc.count()} edges)")
      t0 = System.nanoTime()
      val rc = edges.checkpoint()
      println(f"PROBE r$r reliableCheckpoint ${(System.nanoTime() - t0) / 1e9}%6.2f s (${rc.count()} edges)")
    }
    // consumer read cost from each
    val lc = edges.localCheckpoint(); val rc = edges.checkpoint()
    (1 to 2).foreach { r =>
      var t0 = System.nanoTime()
      lc.groupBy("src").count().count()
      println(f"PROBE r$r read-from-local ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      t0 = System.nanoTime()
      rc.groupBy("src").count().count()
      println(f"PROBE r$r read-from-reliable ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
      .iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    spark.stop()
  }
}
