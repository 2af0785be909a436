package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions}
import org.apache.spark.sql.functions._

import graft.core.Tables.spread

/** Byte-pair-encoding tokenizer TRAINING — the iterative merge loop that
  * [[Corpus.bpePairCounts]] computes one statistic of. Each round finds
  * the corpus-weighted most frequent adjacent token pair and fuses it
  * into a new vocabulary symbol (Sennrich et al. 2016); the resulting
  * merge table IS the tokenizer.
  *
  * == Plan shape ==
  * BPE's sequential-merge dependency is irreducible — the rounds are a
  * DRIVER loop — but the corpus is scanned ONCE: words collapse to
  * (word, count) up front (Heaps' law makes that frame orders of
  * magnitude smaller than the corpus), the pair-count frame is built
  * once from it, and every later round touches only the words the
  * winning pair occurs in (incremental pair-delta maintenance — see
  * [[train]]). Per round the driver holds exactly ONE row (the argmax
  * pair — same footprint as the scalar watermark reads in the streaming
  * harnesses). `localCheckpoint` after each rewrite keeps the plan from
  * deepening.
  *
  * == Token encoding and engine-exact replay ==
  * A word's segmentation is kept as a wrapped string `<h><e><l><l><o>`:
  * every token sits in its own `<>` cell, so the merge of (a, b) is the
  * plain string replace `<a><b>` → `<ab>` — and sequential left-to-right
  * non-overlapping `replace` is EXACTLY BPE's merge order, with
  * identical semantics in Spark and DuckDB (`<a><a>` in `<a><a><a>`
  * merges once, at the left). The argmax breaks ties on (left, right)
  * text, and pair counting is COUNTING ADJACENT OCCURRENCES (overlaps
  * included — the standard statistic), so the whole training run is
  * bit-reproducible and the oracle unrolls it round for round.
  * Constraint: `<` and `>` must not appear inside words — enforced by a
  * filter, counted against coverage by the caller.
  */
object Bpe {

  /** Wrapped initial segmentation: every character in its own cell. */
  private def wrapped(word: org.apache.spark.sql.Column) =
    regexp_replace(word, "(.)", "<$1>")

  /** Un-aggregated corpus-weighted adjacent-pair rows of a (v, wc)
    * vocabulary frame: (left, right, pair_count=wc per occurrence).
    * Overlapping occurrences all emit (the standard BPE statistic); `wc`
    * may be negative — the delta path feeds retiring segmentations with
    * −wc so ONE downstream aggregate nets old vs new against the
    * maintained counts. */
  private def pairRows(vf: DataFrame): DataFrame = {
    val toks = split(regexp_replace(col("v"), "^<|>$", ""), "><")
    vf.select(col("wc"), toks.as("t"))
      .filter(size(col("t")) >= 2)
      // adjacent (t[i], t[i+1]) pairs; [] is 0-based, slice 1-based
      .select(col("wc"), explode(expr(
        "transform(slice(t, 1, size(t) - 1), " +
          "(x, i) -> struct(x AS l, t[i + 1] AS r))")).as("p"))
      .select(col("p.l").as("left"), col("p.r").as("right"),
        col("wc").as("pair_count"))
  }

  /** Train `merges` BPE merges over the whitespace vocabulary of
    * `textCol`. Returns the merge table: (round, left, right, merged,
    * pair_count) — one row per learned merge, pair_count the exact
    * corpus-weighted adjacency count that won the round.
    *
    * == Incremental pair-delta maintenance ==
    * The corpus is scanned ONCE (into the (word, count) vocabulary
    * frame) and the full pair-count frame is built ONCE. After merging
    * (l, r), only words whose segmentation contains the cell pattern
    * `<l><r>` change their pair multiset — so each round recounts just
    * those words (their old pairs enter the aggregate with −wc, their
    * rewritten pairs with +wc) and nets the delta into the maintained
    * pair frame, instead of recounting the whole vocabulary. Per-round
    * cost is proportional to the words the winning pair touches (which
    * shrinks fast down the frequency curve), making deep training
    * sub-linear in merges; untouched vocabulary rows are never read
    * again. The driver still holds exactly one row per round (the
    * argmax). The pair frame is `localCheckpoint`ed per round (its
    * aggregate lineage would otherwise deepen); the vocab frame grows by
    * one narrow single-reference map per round and is cut every few
    * rounds. */
  def train(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 100000,
      s"merges=$merges out of [1,100000]")
    val spark = df.sparkSession
    var vocab = spread(df)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains("<") &&
        !col("w").contains(">"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(wrapped(col("w")).as("v"), col("wc"))
      .localCheckpoint()
    var pairs = pairRows(vocab)
      .groupBy("left", "right").agg(sum(col("pair_count")).as("pair_count"))
      .localCheckpoint()
    // per-round aggregate width from the MEASURED pair-frame size (~2M
    // pair rows per reduce task): hash-repartitioning on the group keys
    // satisfies the aggregate's required distribution, so each round's
    // update is exactly one exchange at a width that matches the data —
    // hundreds of rounds over a small frame don't pay full-parallelism
    // scheduling, and a 100 TB vocabulary still fans out
    val w = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      pairs.count() / 2000000L + 1L)).toInt
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var exhausted = false
    while (!exhausted && out.length < merges) {
      // a pair-less vocabulary (single-char words, or fully fused) ends
      // training early with however many merges the corpus supported
      pairs.orderBy(col("pair_count").desc, col("left"), col("right"))
        .limit(1).collect().headOption match {
        case None => exhausted = true
        case Some(t) =>
          val (l, r, c) = (t.getString(0), t.getString(1), t.getLong(2))
          val pat = s"<$l><$r>"
          val repl = lit(s"<$l$r>")
          // only the touched words' pairs change: retire theirs at −wc,
          // admit the rewritten segmentation's at +wc — the raw ±rows
          // union straight into the maintained counts so the whole
          // update is ONE hash aggregate and one checkpoint per round.
          // The per-round SHUFFLE is therefore proportional to the
          // winning pair's support; the vocab itself only sees a narrow
          // cached-scan filter, never a shuffle.
          val hit = vocab.filter(col("v").contains(pat))
          val delta = pairRows(
            hit.select(col("v"), (-col("wc")).as("wc"))
              .unionByName(hit.select(
                functions.replace(col("v"), lit(pat), repl).as("v"),
                col("wc"))))
          // single-reference full-frame rewrite (a no-op on untouched
          // rows): the vocab plan grows by ONE narrow map per round —
          // a filter/union split would reference the parent twice and
          // double the Catalyst plan tree per deferred round — so lineage
          // only needs cutting every few rounds, not every round
          vocab = vocab.withColumn("v",
            functions.replace(col("v"), lit(pat), repl))
          if (out.length % 8 == 7) vocab = vocab.localCheckpoint()
          pairs = pairs.unionByName(delta)
            .repartition(w, col("left"), col("right"))
            .groupBy("left", "right")
            .agg(sum(col("pair_count")).as("pair_count"))
            .filter(col("pair_count") > 0)
            .localCheckpoint()
          out += ((out.length + 1, l, r, l + r, c))
      }
    }
    import spark.implicits._
    out.toSeq.toDF("round", "left", "right", "merged", "pair_count")
  }

  /** Tokenize the CORPUS with a trained merge table: per document, the
    * wrapped-cell segmentation of the whole text (words joined by a
    * space OUTSIDE the cells, so merges never cross word boundaries) and
    * the resulting token count — the serving path of [[train]], and the
    * real-tokenizer upgrade of [[TextAnalysis.bpeishCount]]'s regex
    * proxy. Map-only: the merge table is a handful of chained
    * `replace`s compiled into the projection; the corpus never
    * shuffles. Output: (idCol, n_bpe_tokens, n_words). */
  def segmentCorpus(df: DataFrame, textCol: String, idCol: String,
                    merges: Int): DataFrame =
    segmentCorpus(df, textCol, idCol, mergeTable(df, textCol, merges))

  /** [[segmentCorpus]] with a PRE-TRAINED merge table — the serving path
    * when training already ran (one training pass serves every surface).
    * Words containing the cell sentinels `<`/`>` are excluded from the
    * segmentation exactly as [[train]] excludes them from the vocabulary
    * (they'd otherwise render malformed cells and let merges fire across
    * cell boundaries); they still count in `n_words`, so coverage
    * (`n_bpe_tokens` vs `n_words`) charges them as unsegmentable. */
  def segmentCorpus(df: DataFrame, textCol: String, idCol: String,
                    table: Seq[(String, String)]): DataFrame = {
    val clean = filter(TextAnalysis.tokens(col(textCol)),
      w => !w.contains("<") && !w.contains(">"))
    val wrappedDoc = concat_ws(" ",
      transform(clean, w => regexp_replace(w, "(.)", "<$1>")))
    val seg = table.foldLeft(wrappedDoc) { case (acc, (l, r)) =>
      functions.replace(acc, lit(s"<$l><$r>"), lit(s"<$l$r>"))
    }
    spread(df).select(col(idCol),
        seg.as("__v"), size(TextAnalysis.tokens(col(textCol))).as("n_words"))
      .select(col(idCol),
        (length(col("__v")) -
          length(functions.replace(col("__v"), lit("<"), lit(""))))
          .cast("long").as("n_bpe_tokens"),
        col("n_words").cast("long").as("n_words"))
  }

  /** Collect a trained merge table to its round-ordered (left, right)
    * driver form — the handoff between [[train]] and the serving
    * surfaces ([[segmentCorpus]], [[segmentedVocab]]). Merge tables are
    * vocabulary-sized at most (thousands of rows), never corpus-sized. */
  def mergeTable(df: DataFrame, textCol: String, merges: Int)
      : Seq[(String, String)] =
    train(df, textCol, merges).collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** The vocabulary AFTER `merges` trained merges: (v, wc) with `v` the
    * wrapped segmentation — exposed so tests and downstream tokenizers
    * can apply the learned table. */
  def segmentedVocab(df: DataFrame, textCol: String,
                     merges: Int): DataFrame =
    segmentedVocab(df, textCol, mergeTable(df, textCol, merges))

  /** [[segmentedVocab]] with a PRE-TRAINED merge table: one training
    * pass serves both the vocabulary and corpus surfaces. The chained
    * replaces compile into one map-only projection over the vocabulary
    * frame. */
  def segmentedVocab(df: DataFrame, textCol: String,
                     table: Seq[(String, String)]): DataFrame = {
    var vocab = spread(df)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains("<") &&
        !col("w").contains(">"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(wrapped(col("w")).as("v"), col("wc"))
    table.foreach { case (l, r) =>
      vocab = vocab.withColumn("v",
        functions.replace(col("v"), lit(s"<$l><$r>"), lit(s"<$l$r>")))
    }
    vocab
  }
}
