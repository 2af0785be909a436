package graft

import org.apache.spark.sql.functions._
import graft.llm.{Corpus, Dedup, Sampling}

/** Split-hygiene audits (exact + near-dup train→val leakage) and the
  * sketch-based corpus profile. Expectations are brute-forced in Scala
  * from the SAME deterministic split assignment the operators use, so the
  * tests hold for whatever way the md5 gate happens to cut the fixture. */
class SplitHygieneSpec extends SparkSpec {
  import spark.implicits._

  // texts 1/2/3 are the same document modulo case + whitespace (the
  // normalization canon must identify them); 4/5 are an unrelated dup
  // pair; 6 is a singleton; 7 is a null text.
  private val docs = Seq(
    (1L, "The quick   brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "  THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG  "),
    (4L, "an unrelated second document body repeated verbatim"),
    (5L, "an unrelated second document body repeated verbatim"),
    (6L, "a singleton document that duplicates nothing at all"),
    (7L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  private def normKey(s: String): String =
    if (s == null) null
    else java.text.Normalizer.normalize(
      s.toLowerCase.replaceAll("\\s+", " ").trim,
      java.text.Normalizer.Form.NFC)

  private def splitOf(trainPct: Double): Map[Long, String] =
    Sampling.split(docs, "doc_id", trainPct)
      .select("doc_id", "split").as[(Long, String)].collect().toMap

  test("splitLeakageExact matches a brute-forced audit at several cuts") {
    for (pct <- Seq(0.2, 0.5, 0.8)) {
      val split = splitOf(pct)
      val texts = docs.select("doc_id", "text").as[(Long, String)]
        .collect().toMap
      val trainKeys = texts.collect {
        case (id, t) if split(id) == "train" && t != null => normKey(t)
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = texts.collect { case (id, t) if split(id) == "val" =>
        val n = if (t == null) 0L
                else trainKeys.getOrElse(normKey(t), 0L)
        (id, n, n > 0)
      }.toSet

      val got = Sampling.splitLeakageExact(docs, "text", "doc_id", pct)
        .select("doc_id", "n_train_dups", "leaked")
        .as[(Long, Long, Boolean)].collect().toSet
      assert(got == expected, s"trainPct=$pct split=$split")
    }
  }

  test("splitLeakageExact emits one audit row per val doc, none for train") {
    val split = splitOf(0.5)
    val ids = Sampling.splitLeakageExact(docs, "text", "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSeq
    val valIds = split.collect { case (id, "val") => id }.toSeq
    assert(ids.sorted == valIds.sorted)
  }

  test("splitLeakageNear flags exact copies across the cut, not singletons") {
    // brute-force from the operator's own band rows (identical texts share
    // every band by construction, so any cross-split identical pair MUST
    // collide; singletons must never appear)
    for (pct <- Seq(0.3, 0.5, 0.7)) {
      val split = splitOf(pct)
      val bands = Dedup.lshBands(
          Dedup.minhashSignatures(Dedup.shingles(docs, "text", "doc_id", 3),
            "doc_id", 8), "doc_id", 8, 4)
        .select("doc_id", "band", "band_hash")
        .as[(Long, Int, String)].collect()
      val trainBands = bands.filter(r => split(r._1) == "train")
      val expected = bands.filter(r => split(r._1) == "val")
        .flatMap { case (id, b, h) =>
          trainBands.collect { case (tid, tb, th) if tb == b && th == h => (id, tid) }
        }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong)
        .toMap

      val got = Sampling.splitLeakageNear(docs, "text", "doc_id", pct)
        .select("doc_id", "n_train_cands").as[(Long, Long)]
        .collect().toMap
      assert(got == expected, s"trainPct=$pct split=$split")
    }
  }

  test("weightedPerGroup == per-group brute force; caps each group at k") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val rows = (1L to 40L).map(i =>
      (i, if (i <= 25) "big" else "small", (i % 7 + 1).toDouble))
    val df = rows.toDF("doc_id", "grp", "w")
    val got = Sampling.weightedPerGroup(df, "grp", "doc_id", "w", k = 5)
      .select("grp", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = rows.groupBy(_._2).view.mapValues { rs =>
      rs.sortBy { case (id, _, w) =>
        val u = java.lang.Long.parseLong(md5hex(id.toString).take(13), 16)
        ((u / 4503599627370496.0) / w, id)
      }.take(5).map(_._1).toSet
    }.toMap
    assert(got == expected)
    assert(got.values.forall(_.size == 5))
  }

  test("writeShards: one dir per shard, offset order inside each file") {
    val docs = (1L to 50L).map(i => (i, s"src${i % 3}", 100L))
      .toDF("doc_id", "lang", "tokens")
    val packed = Sampling.packShards(docs, "lang", "doc_id", "tokens",
      budget = 1000L)
    val tmp = java.nio.file.Files.createTempDirectory("shards_").toString
    try {
      Sampling.writeShards(packed, "shard_id", "shard_offset", tmp)
      val back = spark.read.parquet(tmp)
      // round-trip: every (doc, shard, offset) survives exactly
      val want = packed.select("doc_id", "shard_id", "shard_offset")
        .as[(Long, String, Long)].collect().toSet
      val got = back.select("doc_id", "shard_id", "shard_offset")
        .as[(Long, String, Long)].collect().toSet
      assert(got == want)
      // layout: hive-style one directory per shard id
      val dirs = new java.io.File(tmp).listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(dirs == want.map(w => s"shard_id=${w._2}"))
      // in-file order: rows come back in ascending shard_offset per file
      for (d <- new java.io.File(tmp).listFiles() if d.isDirectory;
           f <- d.listFiles() if f.getName.endsWith(".parquet")) {
        val offs = spark.read.parquet(f.getAbsolutePath)
          .select("shard_offset").as[Long].collect().toSeq
        assert(offs == offs.sorted, s"unsorted file in ${d.getName}")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("mixtureSchedule: exact WFQ prefix counts at every threshold") {
    val corpus = (1L to 60L).map(i =>
      (i, if (i % 3 == 0) "code" else "web")).toDF("doc_id", "source")
    // weights web=3, code=1 → lcm 3 → strides web=1, code=3
    val out = Sampling.mixtureSchedule(corpus, "doc_id", "source",
        weights = Seq("web" -> 3L, "code" -> 1L))
      .select("doc_id", "source", "sched_key")
      .as[(Long, String, Long)].collect()
    // virtual-finish-time invariant: among keys <= K, source i has served
    // exactly floor(K / stride_i) docs — the 3:1 rate holds in EVERY
    // prefix, not just in aggregate
    for (k <- 1L to 60L) {
      val served = out.filter(_._3 <= k).groupBy(_._2)
        .view.mapValues(_.length.toLong).toMap
      assert(served.getOrElse("web", 0L) == math.min(k / 1, 40),
        s"web at K=$k")
      assert(served.getOrElse("code", 0L) == math.min(k / 3, 20),
        s"code at K=$k")
    }
    // ranks are the stable md5 order per source
    val webKeys = out.filter(_._2 == "web").map(_._3).sorted
    assert(webKeys.toSeq == (1L to 40L).map(_ * 1).toSeq)
  }

  test("mixtureSchedule: lcm strides, unknown source gets default, guards") {
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "mystery"))
      .toDF("doc_id", "source")
    val out = Sampling.mixtureSchedule(corpus, "doc_id", "source",
        weights = Seq("a" -> 4L, "b" -> 6L), defaultWeight = 2L)
      .select("source", "sched_key").as[(String, Long)].collect().toMap
    // lcm(2,4,6)=12 → strides a=3, b=2, default=6; single doc per source
    assert(out == Map("a" -> 3L, "b" -> 2L, "mystery" -> 6L))
    intercept[IllegalArgumentException] {
      Sampling.mixtureSchedule(corpus, "doc_id", "source",
        weights = Seq("a" -> 0L))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureSchedule(corpus, "doc_id", "source",
        weights = Seq("a" -> 1L, "a" -> 2L))
    }
  }

  test("sketchProfile: exact counts exact, sketches inside error bounds") {
    val docsTbl = spark.read.parquet(s"$sf001/documents.parquet")
    val prof = Corpus.sketchProfile(docsTbl, "source", "text", "n_chars")
      .collect().map(r => r.getString(0) -> r).toMap

    val exact = docsTbl
      .select(col("source"), col("n_chars"),
        graft.llm.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("source"), col("n_chars"),
        size(col("toks")).as("n_toks"), explode(col("toks")).as("tok"))
      .groupBy("source")
      .agg(countDistinct(col("tok")).as("vocab"),
        count(lit(1)).as("tokens"),
        countDistinct(col("n_chars")).as("_ignore"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

    val lens = docsTbl.select("source", "n_chars").as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

    assert(prof.keySet == exact.keySet)
    for ((src, r) <- prof) {
      val (vExact, tokExact) = exact(src)
      assert(r.getAs[Long]("tokens") == tokExact, s"$src tokens")
      // raw HLL at m=256: sd 1.04/√256 ≈ 6.5%; allow 3σ
      assert(math.abs(r.getAs[Double]("vocab_est") - vExact) <=
        math.max(2.0, vExact * 0.20), s"$src vocab")
      val sortedLens = lens(src)
      val n = sortedLens.length
      for ((cname, p) <- Seq(("len_p50", 0.5), ("len_p90", 0.9),
                             ("len_p99", 0.99))) {
        val got = r.getAs[Double](cname)
        // the HDR-bucket estimate lies in the bucket holding the true
        // quantile value v, whose width is ≤ max(1, v/10) at grid 1
        val target = math.ceil(p * n).toInt.max(1)
        val v = sortedLens(target - 1).toDouble
        assert(math.abs(got - v) <= math.max(1.0, v / 10.0) + 1e-6,
          s"$src $cname got=$got exact=$v")
      }
    }
  }
}
