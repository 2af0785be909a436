package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a cartesian product. Spark plans a
  * bare `p BETWEEN lo AND hi` join (no equi-key) as BroadcastNestedLoop —
  * fine for a tiny interval table, fatal when both sides are big.
  *
  * Bucketize instead: pick a bucket width `w`; an interval [lo, hi] lands in
  * every bucket it overlaps (`sequence(lo div w, hi div w)` exploded), a
  * point lands in exactly `p div w`. The join becomes an equi-join on the
  * bucket id followed by the exact BETWEEN filter — a plain hash shuffle
  * whose cost is O(points + intervals · span/w + candidate pairs).
  *
  * 100 TB posture: choose `w` near the median interval span so each
  * interval replicates into O(1) buckets; a uniform time axis then gives
  * near-uniform bucket load. Candidate pairs — not input size — dominate:
  * dense overlapping intervals produce genuinely quadratic output and no
  * algorithm avoids that. A pathological mega-interval (spanning the whole
  * axis) would replicate into every bucket; cap with `maxBucketsPerInterval`
  * which drops (and should be logged/observed upstream, not silently) —
  * loud beats a job that never finishes.
  */
object RangeJoin {

  /** Join `points` to every `intervals` row with lo <= point <= hi.
    * `pointCol`, `loCol`, `hiCol` are integer columns in the same unit.
    * Output: all point columns + all interval columns.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Int = 1024): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive (got $bucketWidth)")
    val overlap = points.columns.intersect(intervals.columns)
    require(overlap.isEmpty, s"column collision: ${overlap.mkString(",")}")

    // Exact integer floor-division: `div` truncates toward zero, so shift
    // negatives down one bucket. `/` would be double division — inexact
    // beyond 2^53 (e.g. nanosecond timestamps).
    def bucketOf(c: String) = {
      val x = col(c).cast("long")
      val q = expr(s"CAST($c AS BIGINT) div $bucketWidth")
      when(x % bucketWidth < 0, q - 1).otherwise(q)
    }
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .filter(bucketOf(hiCol) - bucketOf(loCol) < maxBucketsPerInterval)
      .withColumn("__bucket", explode(sequence(bucketOf(loCol), bucketOf(hiCol))))
    val pt = points
      .withColumn("__bucket", bucketOf(pointCol))
    pt.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval×interval overlap join: every (left, right) pair whose
    * closed integer intervals intersect (`lLo <= rHi AND rLo <= lHi`).
    * Both sides explode to covered buckets and equi-join on the bucket
    * id; a pair colliding in several shared buckets is emitted ONCE by
    * keeping only the bucket containing the overlap's START
    * (`greatest(lLo, rLo)` — a bucket both sides cover by definition) —
    * a map-side filter, not a distinct exchange.
    *
    * Same 100 TB posture as [[pointInInterval]]: width near the median
    * span keeps per-interval replication O(1); genuinely dense overlap
    * sets produce quadratic output no algorithm avoids; intervals wider
    * than `maxBucketsPerInterval` buckets are dropped by a plain filter —
    * like pointInInterval, the drop should be counted/observed upstream
    * (e.g. `df.observe`) rather than trusted to be rare. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLo: String, lHi: String, rLo: String, rHi: String,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Int = 1024): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive (got $bucketWidth)")
    val collide = left.columns.intersect(right.columns)
    require(collide.isEmpty, s"column collision: ${collide.mkString(",")}")
    def bucketOf(c: String) = {
      val x = col(c).cast("long")
      val q = expr(s"CAST($c AS BIGINT) div $bucketWidth")
      when(x % bucketWidth < 0, q - 1).otherwise(q)
    }
    def side(df: DataFrame, lo: String, hi: String) = df
      .filter(col(lo) <= col(hi))
      .filter(bucketOf(hi) - bucketOf(lo) < maxBucketsPerInterval)
      .withColumn("__bucket", explode(sequence(bucketOf(lo), bucketOf(hi))))
    val startBucket = {
      val s = expr(s"CAST(greatest($lLo, $rLo) AS BIGINT)")
      val q = expr(s"CAST(greatest($lLo, $rLo) AS BIGINT) div $bucketWidth")
      when(s % bucketWidth < 0, q - 1).otherwise(q)
    }
    side(left, lLo, lHi).join(side(right, rLo, rHi), Seq("__bucket"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bucket") === startBucket)
      .drop("__bucket")
  }
}
