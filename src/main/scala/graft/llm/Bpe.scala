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
  * DRIVER loop — but each round is one distributed pass over the
  * VOCABULARY frame, not the corpus: words collapse to (word, count)
  * once (Heaps' law makes that frame orders of magnitude smaller than
  * the corpus, and it only shrinks as merges fuse symbols), and the
  * merge rewrite is a map-side `replace`. Per round the driver holds
  * exactly ONE row (the argmax pair — same footprint as the scalar
  * watermark reads in the streaming harnesses). `localCheckpoint` after
  * each rewrite keeps the plan from deepening.
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

  /** Train `merges` BPE merges over the whitespace vocabulary of
    * `textCol`. Returns the merge table: (round, left, right, merged,
    * pair_count) — one row per learned merge, pair_count the exact
    * corpus-weighted adjacency count that won the round. */
  def train(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 50, s"merges=$merges out of [1,50]")
    val spark = df.sparkSession
    var vocab = spread(df)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains("<") &&
        !col("w").contains(">"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(wrapped(col("w")).as("v"), col("wc"))
      .localCheckpoint()
    val rows = (1 to merges).map { round =>
      val toks = split(regexp_replace(col("v"), "^<|>$", ""), "><")
      val pairs = vocab
        .select(col("wc"), toks.as("t"))
        .filter(size(col("t")) >= 2)
        // adjacent (t[i], t[i+1]) pairs; [] is 0-based, slice 1-based
        .select(col("wc"), explode(expr(
          "transform(slice(t, 1, size(t) - 1), " +
            "(x, i) -> struct(x AS l, t[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("left"), col("p.r").as("right"))
        .agg(sum(col("wc")).as("pair_count"))
      val top = pairs
        .orderBy(col("pair_count").desc, col("left"), col("right"))
        .limit(1).collect().headOption
      top.map { t =>
        val (l, r, c) = (t.getString(0), t.getString(1), t.getLong(2))
        vocab = vocab
          .withColumn("v",
            functions.replace(col("v"), lit(s"<$l><$r>"), lit(s"<$l$r>")))
          .localCheckpoint()
        (round, l, r, l + r, c)
      }
    }
    import spark.implicits._
    // a pair-less vocabulary (single-char words, or fully fused) ends
    // training early with however many merges the corpus supported
    rows.takeWhile(_.isDefined).flatten
      .toDF("round", "left", "right", "merged", "pair_count")
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
                    merges: Int): DataFrame = {
    val table = train(df, textCol, merges).collect().sortBy(_.getInt(0))
    val wrappedDoc = concat_ws(" ",
      transform(TextAnalysis.tokens(col(textCol)),
        w => regexp_replace(w, "(.)", "<$1>")))
    val seg = table.foldLeft(wrappedDoc) { (acc, row) =>
      val (l, r) = (row.getString(1), row.getString(2))
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

  /** The vocabulary AFTER `merges` trained merges: (v, wc) with `v` the
    * wrapped segmentation — exposed so tests and downstream tokenizers
    * can apply the learned table. */
  def segmentedVocab(df: DataFrame, textCol: String,
                     merges: Int): DataFrame = {
    // re-derive by replaying train's merge choices — train() is cheap on
    // the vocab frame and this keeps one code path for the loop
    val table = train(df, textCol, merges).collect()
      .sortBy(_.getInt(0))
    var vocab = spread(df)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains("<") &&
        !col("w").contains(">"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(wrapped(col("w")).as("v"), col("wc"))
    table.foreach { row =>
      val (l, r) = (row.getString(1), row.getString(2))
      vocab = vocab.withColumn("v",
        functions.replace(col("v"), lit(s"<$l><$r>"), lit(s"<$l$r>")))
    }
    vocab
  }
}
