package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall probe for the IVF-seeded graph walk: mean recall@5 of the
  * seeded vs unseeded walk vs the multi-probe sign-LSH path, same
  * queries, same corpus — the measurement behind the seeding claim in
  * SCALE.md §10a. */
object GraphSeedProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llm.Similarity
    val e = graft.core.Tables.embeddings(spark, d)
    val n = e.count()
    var b = 4
    while ((1L << b) * 32 < n && b < 24) b += 1
    val q = e.filter(col("vec_id") < 50)
    val edges = Similarity.knnGraph(e, "vec_id", "embedding",
      k = 3, b = b, dim = 64, bands = 2).select("src", "dst")
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
    def mean(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(exact, approx, k = 5)
        .agg(avg(col("recall"))).head.getDouble(0)
    for ((label, beam, hops, m) <- Seq(
        ("beam8 hop3 m4", 8, 3, 4), ("beam8 hop3 m8", 8, 3, 8),
        ("beam16 hop4 m8", 16, 4, 8), ("beam24 hop5 m8", 24, 5, 8))) {
      val seeded = Similarity.graphSearchTopKSeeded(e, "vec_id",
        "embedding", q, edges, k = 5, beam = beam, hops = hops, dim = 64,
        m = m)
      println(f"$label seeded=${mean(seeded)}%.4f")
    }
    val unseeded = Similarity.graphSearchTopK(e, "vec_id", "embedding",
      q, edges, k = 5, beam = 8, hops = 3, dim = 64)
    val lsh = Similarity.signLshTopK(e, q, "vec_id", "embedding",
      k = 5, b = b, rotatedDim = Some(64), multiProbe = true)
    println(f"n=$n b=$b recall@5: unseeded(8,3)=${mean(unseeded)}%.4f " +
      f"lsh=${mean(lsh)}%.4f")
    // denser substrate: the walk's ceiling is the GRAPH, not the seeding
    val dense = Similarity.knnGraph(e, "vec_id", "embedding",
      k = 8, b = b, dim = 64, bands = 4).select("src", "dst")
    for ((label, beam, hops) <- Seq(("beam8 hop3", 8, 3),
        ("beam16 hop4", 16, 4))) {
      val sd = Similarity.graphSearchTopKSeeded(e, "vec_id", "embedding",
        q, dense, k = 5, beam = beam, hops = hops, dim = 64, m = 8)
      val un = Similarity.graphSearchTopK(e, "vec_id", "embedding",
        q, dense, k = 5, beam = beam, hops = hops, dim = 64)
      println(f"dense(k=8,bands=4) $label seeded=${mean(sd)}%.4f " +
        f"unseeded=${mean(un)}%.4f")
    }
    spark.stop()
  }
}
