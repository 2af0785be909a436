package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables.spread

/** Inverted-index construction and boolean retrieval over a document
  * corpus — the sparse-search leg of a curation stack (seed-set mining,
  * targeted filtering, "find everything mentioning X" audits), and the
  * precomputed counterpart of [[Corpus.bm25TopK]]'s scan-time scoring.
  *
  * == Scale shape ==
  * The corpus explodes once to distinct (term, doc) postings and shuffles
  * on the TERM — the index build's one irreducible exchange. The stop-term
  * hazard (a term appearing in most of a 10⁹-doc corpus would make one
  * reducer collect a 10⁹-element list) is handled the same way as
  * [[Dedup]]'s stop-shingle cap: a df COUNT pre-pass (cheap long
  * aggregate, map-side partials) finds terms over `maxDf`, and the
  * posting-list build anti-joins them out against the BROADCAST stop set
  * before any `collect_list` runs — capped terms still appear in the
  * index with their df but a NULL posting list, so the index is honest
  * about what it dropped (no silent cap). Per-group list size is bounded
  * by `maxDf` by construction.
  *
  * Query evaluation never materializes lists: conjunctive search runs on
  * the exploded posting rows (term ∈ query → group by doc → count
  * distinct = |query|), which is a |query|-way semi-intersection with
  * map-side partial counts, not a driver-side list walk.
  */
object Index {

  /** Tokens for indexing: [[TextAnalysis.tokens]]' whitespace split,
    * distinct per document (postings are set-valued). */
  private def docTerms(df: DataFrame, textCol: String, idCol: String) =
    spread(df).select(col(idCol).as("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol))))
          .as("term"))
      .filter(length(col("term")) > 0)

  /** Build the inverted index: one row per distinct term —
    * (term, df, postings) where `postings` is the comma-joined sorted
    * doc-id list, NULL when df > `maxDf` (stop term; df still exact). */
  def postings(df: DataFrame, textCol: String, idCol: String,
               maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"maxDf=$maxDf must be >= 1")
    val td = docTerms(df, textCol, idCol)
    val dfCounts = td.groupBy("term").agg(count(lit(1)).as("df"))
    val stop = dfCounts.filter(col("df") > maxDf).select("term")
    val lists = td.join(broadcast(stop), Seq("term"), "left_anti")
      .groupBy("term")
      .agg(array_join(transform(array_sort(collect_list(col("doc_id"))),
        _.cast("string")), ",").as("postings"))
    dfCounts.join(lists, Seq("term"), "left")
      .select(col("term"), col("df"), col("postings"))
  }

  /** Conjunctive (AND) boolean retrieval: documents containing EVERY
    * query term. Output (doc_id) — the candidate set downstream ranking
    * ([[Corpus.bm25TopK]]) scores. */
  def searchAll(df: DataFrame, textCol: String, idCol: String,
                terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "searchAll needs at least one term")
    docTerms(df, textCol, idCol)
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__n")) // (term, doc) rows are distinct
      .filter(col("__n") === terms.distinct.size)
      .select(col("doc_id"))
  }

  /** Exact phrase retrieval over POSITIONAL postings: documents where
    * the query terms appear as adjacent tokens, with the occurrence
    * count. Positions are indices into the whitespace token sequence
    * (split preserves adjacency), so the phrase match is a
    * (|phrase|−1)-way equi-join on (doc, pos + k) — hash joins on the
    * positional posting rows, the classic positional-index evaluation;
    * each join side is pre-filtered to ONE term's postings, so the join
    * input is term-selectivity-sized, not corpus-sized. */
  def searchPhrase(df: DataFrame, textCol: String, idCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "searchPhrase needs at least two terms")
    val t = spread(df).select(col(idCol).as("doc_id"),
      posexplode(TextAnalysis.tokens(col(textCol))))
    val first = t.filter(col("col") === phrase.head)
      .select(col("doc_id"), col("pos"))
    phrase.zipWithIndex.drop(1).foldLeft(first) { case (acc, (term, k)) =>
      acc.join(
        t.filter(col("col") === term)
          .select(col("doc_id"), (col("pos") - k).as("pos")),
        Seq("doc_id", "pos"))
    }
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Disjunctive (OR) retrieval with a match count: documents containing
    * at least `minMatch` of the query terms, with how many they matched —
    * the recall-first variant (weak-AND gate before a scorer). */
  def searchAny(df: DataFrame, textCol: String, idCol: String,
                terms: Seq[String], minMatch: Int = 1): DataFrame = {
    require(terms.nonEmpty, "searchAny needs at least one term")
    require(minMatch >= 1 && minMatch <= terms.distinct.size,
      s"minMatch=$minMatch out of [1, ${terms.distinct.size}]")
    docTerms(df, textCol, idCol)
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatch)
      .select(col("doc_id"), col("n_matched"))
  }
}
