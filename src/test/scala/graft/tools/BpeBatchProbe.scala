package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe — dev only: replays every real training round of
  * `bpe_train_deep`'s corpus at `$SPARK_GRAFT_SF_DIR` against a replica
  * of the PRE-round-11 batch selector (guard (c) without the in-batch
  * minted set), reporting whether the r11 guard ever changes a batch at
  * this SF — the direct mechanism check behind the r11 bench move.
  *
  * Usage: `sbt "Test/runMain graft.tools.BpeBatchProbe"`
  */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the shared pre-r11 selector replica (same copy the sf0.01 spec
    // replays against — see BpePreGuard's scaladoc)
    def preGuard(top: IndexedSeq[(String, String, Long)], want: Int,
                 symbols: String => Boolean) = BpePreGuard(top, want, symbols)

    val docs = graft.core.Tables.documents(spark, sfDir)
    var rounds = 0
    var mismatches = 0
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val t0 = System.nanoTime()
    val n = graft.llm.Bpe.trainObserved(docs, "text", merges = 500,
      batchCap = 8, (top, want, syms, acc) => {
        rounds += 1
        sizes += acc.length
        val pre = preGuard(top, want, syms)
        if (acc != pre) {
          mismatches += 1
          println(s"DIFF round $rounds: acc=$acc pre=$pre")
        }
      }).count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"BPEPROBE sf=$sfDir merges=$n rounds=$rounds " +
      f"mismatches=$mismatches wall=$secs%.2f s")
    println(s"BPEPROBE sizes=${sizes.mkString(",")}")
    spark.stop()
  }
}
