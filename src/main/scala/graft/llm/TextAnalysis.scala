package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Tables.spread

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization stats, quality scoring, language ID, fingerprinting.
  *
  * All pure column expressions — the whole module is a map-only stage
  * (no shuffle, full whole-stage codegen), so it scales linearly and can be
  * fused with the scan at 100 TB. Hash choices: md5 where the DuckDB oracle
  * must reproduce the value bit-for-bit; xxhash64 for the production path
  * (see [[Dedup]]).
  */
object TextAnalysis {

  /** Whitespace tokenizer (shared by every operator so stats agree). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish token segmentation: letter runs, digit runs, single
    * punctuation. A cheap proxy for subword token counting. */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]"
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0)))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately minimal — the mechanism (per-language hit
    * counting + deterministic argmax) is the operator; swap in real lists
    * for production. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des", "que"),
    "de" -> Seq("der", "die", "das", "und", "ein", "zu", "den", "ist"))

  /** Count of tokens contained in `set` (not distinct — frequency-weighted). */
  def hitCount(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => set.map(s => t === lit(s)).reduce(_ || _)))

  /** Language-ID: argmax of stopword hits, ties → lexicographically first
    * language; zero hits everywhere → "und".
    *
    * The argmax is a single flat `greatest` over (hits, -lexRank, lang)
    * structs — struct comparison is field-by-field, so `greatest` picks
    * max hits, then max(-lexRank) = lexicographically FIRST language on
    * ties. Each per-language hitCount appears exactly ONCE in the tree; a
    * naive when-chain reduce references both branches at every level and
    * duplicates the (interpreted, HOF-based) hitCount subtrees
    * exponentially — measured 2.5× slower on the documents table. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val byLex = stopwords.map(_._1).sorted.zipWithIndex.toMap
    val best = greatest(stopwords.map { case (lang, words) =>
      struct(hitCount(toks, words).as("hits"),
        lit(-byLex(lang)).as("neg_rank"), lit(lang).as("lang"))
    }: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Sliding token windows with overlap — the chunking stage of an
    * embedding/RAG pipeline: windows of `window` tokens starting every
    * `stride` tokens (stride < window ⇒ overlap of window − stride).
    * A window is emitted only if it contributes tokens the previous
    * window didn't already cover (`start == 0 OR remaining > window −
    * stride`), so the tail is covered exactly once and short documents
    * yield one chunk.
    *
    * Output rows: (id, chunk_idx, chunk_text, n_tokens). Map-only — the
    * start-list generation, filter, and slice all run inside one codegen
    * projection; no shuffle at any size. */
  def slidingChunks(df: DataFrame, textCol: String, idCol: String,
                    window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"window=$window, stride=$stride")
    val toks = tokens(col(textCol))
    spread(df.filter(size(toks) >= 1))
      .select(col(idCol), toks.as("__w"))
      .select(col(idCol), explode(expr(
        s"""transform(
           |  filter(sequence(0, size(__w) - 1, $stride),
           |         s -> s = 0 OR size(__w) - s > ${window - stride}),
           |  s -> struct(
           |    CAST(s div $stride AS INT) AS chunk_idx,
           |    array_join(slice(__w, s + 1, $window), ' ') AS chunk_text,
           |    CAST(least($window, size(__w) - s) AS INT) AS n_tokens))
           |""".stripMargin)).as("c"))
      .select(col(idCol), col("c.chunk_idx"), col("c.chunk_text"),
        col("c.n_tokens"))
  }

  /** Quality-scoring feature bundle; see reference-free heuristics used by
    * C4/Gopher-style filters (length, punctuation, stopword density,
    * type-token ratio). */
  def stats(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks)
    val nDistinct = size(array_distinct(toks))
    val nChar = length(t)
    val punct = nChar - length(regexp_replace(t, "[^\\w\\s]", ""))
    val stop = hitCount(toks, stopwords.flatMap(_._2).distinct.sorted)
    df.withColumn("token_count", nTok)
      .withColumn("bpeish_count", bpeishCount(t))
      .withColumn("char_count", nChar)
      .withColumn("distinct_tokens", nDistinct)
      .withColumn("type_token_ratio",
        round(nDistinct.cast("double") / nTok, 6))
      .withColumn("avg_token_len",
        round((nChar - nTok + 1).cast("double") / nTok, 6))
      // empty text has nChar = 0, and ANSI mode THROWS on the 0/0 a
      // bare division would produce (split("") is [""], so nTok is
      // always ≥ 1 and the token-denominator ratios need no guard);
      // null mirrors DuckDB's divide-by-zero null in the oracle
      .withColumn("punct_ratio",
        when(nChar > 0, round(punct.cast("double") / nChar, 6)))
      .withColumn("stopword_ratio", round(stop.cast("double") / nTok, 6))
  }

  /** Per-document Shannon token entropy — the information-density
    * quality feature [[stats]]' type-token ratio approximates crudely:
    * boilerplate ("click here click here …") scores near 0 nats however
    * long it runs, natural prose climbs with vocabulary. H = ln n −
    * (Σ c·ln c)/n over the document's token counts c (the n·H = n·ln n −
    * Σ c·ln c identity keeps one libm ln PER DISTINCT TOKEN, on exact
    * integer operands, each term 9-dp-fixed before an exact decimal sum
    * — the BM25/linkPredict determinism discipline, so the oracle
    * replays bit-for-bit). Also emits the normalized H/ln n ∈ [0,1]
    * (null for single-token docs, whose ln n = 0 carries no information
    * either way).
    *
    * Scale shape: one (doc, token) hash aggregate (map-side combined)
    * and one per-doc fold of its distinct-token rows — the tf explode
    * never re-shuffles the text itself. Output: (idCol, n_tokens,
    * n_distinct, entropy_nats, entropy_norm). */
  def tokenEntropy(df: DataFrame, textCol: String,
                   idCol: String): DataFrame = {
    import graft.core.Tables.spread
    val tf = spread(df)
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
    val agg = tf.groupBy(col(idCol)).agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      sum(round(col("c").cast("double") * log(col("c").cast("double")), 9)
        .cast("decimal(28,9)")).as("__sclnc"))
    val n = col("n_tokens").cast("double")
    val h = round(log(n) - col("__sclnc").cast("double") / n, 6)
    agg.select(col(idCol), col("n_tokens"), col("n_distinct"),
      h.as("entropy_nats"),
      when(col("n_tokens") > 1,
        round((log(n) - col("__sclnc").cast("double") / n) / log(n), 6))
        .as("entropy_norm"))
  }

  /** Sliding-window document chunking over token positions — the
    * context-window segmentation every training/embedding pipeline runs
    * before packing or encoding: chunk starts at multiples of
    * (budget − overlap) while start < n_tokens, each chunk spans
    * [tok_start, min(tok_start + budget, n_tokens)), and consecutive
    * chunks share `overlap` tokens so no span is ever cut mid-context.
    * Empty documents emit no chunks. Output: (idCol, seg_id, tok_start,
    * tok_end, n_seg_tokens, seg_text).
    *
    * Scale shape: map-only — one `sequence` explode per document (the
    * chunk count is ⌈n/step⌉, bounded by the document's own length) and
    * a row-local array slice/join; no shuffle, no window, the corpus
    * never leaves its partitions. At 100 TB this is the shape you want
    * for a pre-tokenization pass: chunk rows inherit the input's
    * partitioning and flow straight into the encode/pack stages. */
  def chunkDocs(df: DataFrame, textCol: String, idCol: String,
                budget: Int, overlap: Int): DataFrame = {
    require(budget >= 1, s"budget=$budget must be >= 1")
    require(overlap >= 0 && overlap < budget,
      s"overlap=$overlap out of [0, budget=$budget)")
    val step = budget - overlap
    import graft.core.Tables.spread
    spread(df)
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .withColumn("n_tokens", size(col("__t")))
      .filter(col("n_tokens") > 0)
      .select(col(idCol), col("__t"), col("n_tokens"),
        posexplode(sequence(lit(0), col("n_tokens") - 1, lit(step))))
      .select(col(idCol),
        col("pos").cast("long").as("seg_id"),
        col("col").cast("long").as("tok_start"),
        least(col("col") + budget, col("n_tokens")).cast("long")
          .as("tok_end"),
        (least(col("col") + budget, col("n_tokens")) - col("col"))
          .cast("long").as("n_seg_tokens"),
        concat_ws(" ", slice(col("__t"), col("col") + 1,
          least(col("col") + budget, col("n_tokens")) - col("col")))
          .as("seg_text"))
  }

  /** Composite quality score in [0,1]: length band + lexical diversity −
    * punctuation noise. Deterministic, portable arithmetic. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val s = stats(df, textCol)
    s.withColumn("quality_score", round(
      least(col("token_count").cast("double") / 50.0, lit(1.0)) * 0.4 +
        col("type_token_ratio") * 0.4 +
        (lit(1.0) - least(col("punct_ratio") * 10.0, lit(1.0))) * 0.2, 6))
  }

  /** Per-language stopword-hit mix — the language-MIXTURE view [[langId]]
    * collapses to an argmax: per document, each language's
    * frequency-weighted stopword hits plus its share of all hits
    * (6 dp; null shares when no language hits at all — "und" territory).
    * Catches the code-switched and boilerplate-mixed documents a single
    * label hides, which matters for "mostly-English with a French
    * navigation bar" crawl pages. Map-only single scan (one codegen'd
    * HOF count per language), same cost class as [[langId]]. */
  def langMix(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val hits = stopwords.map { case (lang, words) =>
      lang -> hitCount(toks, words)
    }
    val total = hits.map(_._2).reduce(_ + _)
    val base = df.select(
      (col(idCol) +: hits.map { case (l, c) => c.as(s"hits_$l") }) :+
        total.as("total_hits"): _*)
    base.select(
      (col(idCol) +: stopwords.map { case (l, _) => col(s"hits_$l") }) ++
        (col("total_hits") +: stopwords.map { case (l, _) =>
          when(col("total_hits") > 0,
            round(col(s"hits_$l").cast("double") /
              col("total_hits").cast("double"), 6)).as(s"share_$l")
        }): _*)
  }

  /** Blocklist tagger: per-document count/fraction of tokens from a
    * curated term list (NSFW, spam, boilerplate markers — the standard
    * tag-then-filter gate every web-corpus pipeline runs). Emits counts
    * and a `flagged` bool (more than `maxHits` hits) rather than
    * dropping rows, so kill rates are auditable per list before any
    * filter commits — the same posture as [[gopherRules]]. Matching is
    * case-insensitive whole-token membership; null text propagates null
    * (un-taggable, not clean).
    *
    * Map-only single scan, no shuffle, no UDF: one lowered tokenize +
    * one codegen'd HOF membership count per document. The term list
    * rides the plan as a literal OR-chain — right up to a few hundred
    * terms; a 10⁵+-term list should hash tokens and broadcast-join a
    * (term) table instead (the [[QualityModel]] weights-table swap,
    * same reasoning). */
  def blocklist(df: DataFrame, textCol: String, idCol: String,
                terms: Seq[String], maxHits: Long = 0L): DataFrame = {
    require(terms.nonEmpty, "empty blocklist")
    val lowered = terms.map(_.toLowerCase).distinct.sorted
    val toks = tokens(lower(col(textCol)))
    val n = size(toks).cast("long")
    val hits = hitCount(toks, lowered).cast("long")
    df.select(col(idCol),
      n.as("n_tokens"),
      hits.as("n_blocked"),
      when(n > 0,
        round(hits.cast("double") / n.cast("double"), 6)).as("blocked_frac"),
      (hits > maxHits).as("flagged"))
  }

  /** Flesch reading-ease + Flesch–Kincaid grade level — the classic
    * readability gates (curriculum ordering by difficulty, child-content
    * filtering, "too telegraphic / too baroque" outlier pruning).
    * Syllables are approximated as vowel-letter groups with a one-
    * syllable floor per word (the standard regex proxy; exact
    * hyphenation dictionaries are language-specific model artifacts,
    * out of scope for a corpus-wide scan); sentences as terminal-
    * punctuation runs `[.!?]+` with a floor of 1, so fragments without
    * punctuation read as one long sentence rather than dividing by zero.
    *
    * Map-only single scan: three regex counts + one HOF filter per
    * document, no shuffle, no UDF — same cost class as [[stats]].
    * All arithmetic is exact-integer counts entering a fixed tree of
    * correctly-rounded double ops, 6-dp rounded: engine-portable.
    * Zero-word documents yield null scores. */
  def readability(df: DataFrame, textCol: String,
                  idCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nWords = when(length(trim(t)) === 0, 0).otherwise(size(toks))
    val vowelGroups = size(regexp_extract_all(t, lit("[aeiouyAEIOUY]+"),
      lit(0)))
    // one-syllable floor: words with no vowel letter still count 1
    val novowel = size(filter(toks,
      x => x.rlike("^[^aeiouyAEIOUY]*$") && length(x) > 0))
    val nSyll = vowelGroups + novowel
    val nSent = greatest(lit(1),
      size(regexp_extract_all(t, lit("[.!?]+"), lit(0))))
    val wps = nWords.cast("double") / nSent.cast("double")
    val spw = nSyll.cast("double") / nWords.cast("double")
    df.select(col(idCol), nWords.as("n_words"), nSent.as("n_sentences"),
      nSyll.as("n_syllables"),
      when(nWords > 0,
        round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6))
        .as("flesch"),
      when(nWords > 0,
        round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6))
        .as("fk_grade"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021, appendix A1.1):
    * per document, the fraction of n-gram occurrences that are repeats
    * (`dup_Ngram_frac`) and the share taken by the single most frequent
    * n-gram (`top_Ngram_frac`), for n = 2 and 3. High values flag
    * boilerplate, scraped navigation chrome, and degenerate generated
    * text. Map-only: one codegen frequency-map pass per (doc, n) — see
    * [[graft.functions.RepetitionUtil]]. Documents with fewer than n
    * tokens score 0.0 (nothing is repeated in an empty n-gram stream). */
  def repetitionSignals(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    def frac(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den, 6)).otherwise(lit(0.0))
    Seq(2, 3).foldLeft(df) { (acc, n) =>
      val st = s"__rep$n"
      val total = element_at(col(st), 1)
      val dist = element_at(col(st), 2)
      val top = element_at(col(st), 3)
      acc.withColumn(st, graft.functions.RepetitionUtil.ngramStats(toks, n))
        .withColumn(s"dup_${n}gram_frac", frac(total - dist, total))
        .withColumn(s"top_${n}gram_frac", frac(top, total))
        .drop(st)
    }
  }

  /** Document fingerprints: full-content hash and bag-of-words hash (a
    * rolling-hash-class fingerprint that survives word reordering). */
  def fingerprints(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("content_fp", md5(lower(trim(t))))
      .withColumn("bow_fp",
        md5(array_join(array_sort(array_distinct(tokens(lower(t)))), " ")))
  }

  /** Canonical text normalization for corpus prep: Unicode NFC (composed
    * form — see [[graft.functions.TextNorm]]), lowercase, whitespace runs
    * collapsed to single spaces, leading/trailing space trimmed. Map-only,
    * fully codegen'd; adds `text_norm` and its length. Downstream dedup /
    * fingerprints run on `text_norm` so visually-identical docs collide. */
  def normalize(df: DataFrame, textCol: String): DataFrame = {
    val norm = graft.functions.TextNorm.nfcNormalize(
      lower(trim(regexp_replace(col(textCol), "\\s+", " "))))
    df.withColumn("text_norm", norm)
      .withColumn("norm_len", length(col("text_norm")))
  }

  /** Main-text extraction from HTML markup — the very first step of a
    * web-crawl pipeline (every downstream gate scores the ARTICLE text,
    * not navigation chrome or JavaScript). A deterministic regex chain,
    * all map-only codegen'd `regexp_replace`s portable across engines
    * ((?is) inline flags and lazy quantifiers work in both Java regex
    * and RE2):
    *   1. script/style elements drop WITH their contents;
    *   2. HTML comments drop;
    *   3. block-element boundaries (`</p>`, `<br>`, headings, list
    *      items, `</div>`) become newlines so words from adjacent
    *      blocks don't fuse;
    *   4. every remaining tag becomes a space;
    *   5. the five predefined XML entities plus `&nbsp;` decode (the
    *      long tail of named/numeric entities belongs to a real parser —
    *      this is the deterministic columnar subset);
    *   6. whitespace runs collapse, ends trim.
    * Output column: `text_main`. */
  def htmlExtract(df: DataFrame, htmlCol: String): DataFrame = {
    var t: Column = col(htmlCol)
    // two separate element rules — RE2 (the other engines' regex) has
    // no backreferences, so <(script|style)>…</\1> is not portable
    t = regexp_replace(t, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    t = regexp_replace(t, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    t = regexp_replace(t, "(?s)<!--.*?-->", " ")
    t = regexp_replace(t,
      "(?i)</?(p|br|div|li|ul|ol|h[1-6]|tr|table)\\b[^>]*>", "\n")
    t = regexp_replace(t, "(?s)<[^>]*>", " ")
    // entity strings contain no regex metacharacters — plain patterns
    Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&apos;" -> "'", "&#39;" -> "'",
      "&nbsp;" -> " ").foreach { case (e, r) =>
      t = regexp_replace(t, e, r)
    }
    df.withColumn("text_main", trim(regexp_replace(t, "\\s+", " ")))
  }

  /** The Gopher rule-based document filter (Rae et al. 2021, appendix
    * A1.1): the canonical pre-model gate web-corpus pipelines apply
    * before any learned quality score. Emits the measured value AND a
    * boolean per rule plus the conjunction, so the caller can filter,
    * audit per-rule kill rates, or relax individual thresholds:
    *
    *  - `rule_word_count`: token count in [minWords, maxWords]
    *  - `rule_mean_word_len`: mean token length in [minMeanLen, maxMeanLen]
    *  - `rule_symbol_ratio`: (# + ellipsis) occurrences / words ≤ 0.1
    *  - `rule_bullet_lines`: < 90% of lines start with a bullet
    *  - `rule_ellipsis_lines`: < 30% of lines end with an ellipsis
    *  - `rule_alpha_words`: ≥ 80% of tokens contain a letter
    *  - `rule_stopwords`: ≥ 2 distinct hits in a small English stop list
    *  - `pass_gopher`: all of the above
    *
    * Empty / whitespace-only documents never pass (the word-count rule
    * fails) and produce no NULL flags — every division is guarded, so
    * the output is filter- and oracle-stable.
    *
    * Map-only, fully codegen'd (regex + HOF chain, no UDF): fuses with
    * the scan at 100 TB like the rest of this module. */
  def gopherRules(df: DataFrame, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0,
                  maxMeanLen: Double = 10.0): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = when(length(trim(t)) === 0, 0).otherwise(size(toks))
    def ratio(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den.cast("double"), 6))
        .otherwise(lit(0.0))
    // occurrence counts by length delta (regexp_replace removes ALL
    // matches in both Spark and, with the 'g' flag, DuckDB)
    val hashes = length(t) - length(regexp_replace(t, "#", ""))
    val ellipses =
      (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3 +
        (length(t) - length(regexp_replace(t, "…", "")))
    val lines = split(t, "\n")
    val nLines = size(lines)
    val bulletLines = size(filter(lines, l => ltrim(l).rlike("^[-*•]")))
    val ellipsisLines =
      size(filter(lines, l => rtrim(l).rlike("(\\.\\.\\.|…)$")))
    val alphaWords = size(filter(toks, w => w.rlike("[A-Za-z]")))
    val stopHits = size(filter(
      array(stopwords.head._2.map(lit): _*), s => array_contains(toks, s)))
    df.withColumn("n_words", nTok)
      .withColumn("mean_word_len",
        ratio(length(regexp_replace(t, "\\s", "")), nTok))
      .withColumn("symbol_ratio", ratio(hashes + ellipses, nTok))
      .withColumn("bullet_line_frac", ratio(bulletLines, nLines))
      .withColumn("ellipsis_line_frac", ratio(ellipsisLines, nLines))
      .withColumn("alpha_word_frac", ratio(alphaWords, nTok))
      .withColumn("stop_hits", stopHits)
      .withColumn("rule_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("rule_mean_word_len",
        col("n_words") > 0 && col("mean_word_len") >= minMeanLen &&
          col("mean_word_len") <= maxMeanLen)
      .withColumn("rule_symbol_ratio",
        col("n_words") > 0 && col("symbol_ratio") <= 0.1)
      .withColumn("rule_bullet_lines", col("bullet_line_frac") < 0.9)
      .withColumn("rule_ellipsis_lines", col("ellipsis_line_frac") < 0.3)
      .withColumn("rule_alpha_words",
        col("n_words") > 0 && col("alpha_word_frac") >= 0.8)
      .withColumn("rule_stopwords", col("stop_hits") >= 2)
      .withColumn("pass_gopher",
        col("rule_word_count") && col("rule_mean_word_len") &&
          col("rule_symbol_ratio") && col("rule_bullet_lines") &&
          col("rule_ellipsis_lines") && col("rule_alpha_words") &&
          col("rule_stopwords"))
  }

  // ------------------------------------------------ URL canonicalization

  /** Query parameters stripped by [[urlNormalize]]: tracking params that
    * vary per click without changing the resource — the #1 source of
    * spurious URL-level "uniqueness" in crawl dedup. */
  val trackingParamPattern = "^(utm_[^=]*|ref|fbclid|gclid)="

  /** Host (lowercased, `www.` and an explicit default port stripped) from
    * a raw URL — the key for per-domain accounting and mixing. */
  def urlHost(url: Column): Column = {
    val raw = lower(regexp_extract(trim(url),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    val scheme = lower(regexp_extract(trim(url),
      "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val noWww = regexp_replace(raw, "^www\\.", "")
    when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
  }

  /** Canonical URL for crawl-level dedup: lowercase the scheme and host
    * (NOT the path — paths are case-sensitive), strip `www.`, the
    * scheme's default port, the fragment, and tracking query params
    * ([[trackingParamPattern]]), sort surviving params (order never
    * distinguishes resources), and collapse a trailing slash. Two crawl
    * records of one page normalize to one string, so exact-hash dedup on
    * `url_norm` collapses them BEFORE any content fetch/compare — the
    * cheapest dedup tier, upstream of content hashing.
    *
    * Pure column expression (regex + array HOFs, no UDF): fuses with the
    * scan like every other op in this module. */
  def urlNormalize(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val host = urlHost(u)
    // everything after host, fragment dropped
    val pathq = regexp_replace(
      regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1),
      "#.*$", "")
    val path0 = regexp_extract(pathq, "^([^?]*)", 1)
    val path = when(regexp_replace(path0, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(path0, "/+$", ""))
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingParamPattern)))
    val qnorm = array_join(params, "&")
    when(scheme === "", u) // not a hierarchical URL: leave untouched
      .otherwise(concat(scheme, lit("://"), host, path,
        when(qnorm === "", lit("")).otherwise(concat(lit("?"), qnorm))))
  }
}
