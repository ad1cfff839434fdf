package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis operators for large-scale training-data pipelines: language
 * identification, quality scoring, token counting, document
 * fingerprinting. All pure `functions._` column expressions — no UDFs, so
 * everything stays inside whole-stage codegen and is SQL-mirrorable for
 * the DuckDB oracle.
 *
 * (Beyond-reference surface: the reference's NLP layer is an LLM-driven KG
 * constructor + embedding service, `src/query/processor/nlp/...`; these
 * operators are the deterministic, scale-out complement.)
 */
object TextAnalysis {

  /** Marker stopwords per language for the n-gram-free language-ID
    * heuristic. Counting ' w ' occurrences in the padded lowercased text is
    * exactly mirrorable in SQL, which is why this beats a model here. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "una", "y", "que"))

  /** Number of non-overlapping occurrences of `word` as a whole token. */
  private def markerHits(padded: Column, word: String): Column = {
    val w = s" $word "
    (length(padded) - length(regexp_replace(padded, w, " "))) / lit(w.length - 1)
  }

  private def paddedLower(text: Column): Column =
    concat(lit(" "), regexp_replace(lower(text), "\\s+", " "), lit(" "))

  /** Per-language marker score columns (langScore_en, ...). */
  def withLangScores(df: DataFrame, textCol: String): DataFrame = {
    val padded = paddedLower(col(textCol))
    langMarkers.toSeq.sortBy(_._1).foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"langScore_$lang",
        words.map(w => markerHits(padded, w)).reduce(_ + _).cast(LongType))
    }
  }

  /** Language-ID: argmax of marker scores, ties broken by language code
    * order, all-zero → 'unknown'. */
  def langId(textCol: String): Column = {
    val padded = paddedLower(col(textCol))
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> words.map(w => markerHits(padded, w)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("unknown"): Column) { case ((lang, s), els) =>
      when(s === best && s > 0, lang).otherwise(els)
    }
  }

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(textCol: String): Column =
    when(length(trim(col(textCol))) === 0, lit(0))
      .otherwise(size(split(trim(col(textCol)), "\\s+")))

  /** BPE-ish subword count: alternating letter/digit/punctuation runs —
    * a cheap deterministic proxy for tokenizer token counts. */
  def subwordCount(textCol: String): Column =
    when(length(trim(col(textCol))) === 0, lit(0))
      .otherwise(size(filter(
        split(col(textCol), "(?<=[a-zA-Z])(?=[^a-zA-Z])|(?<=[0-9])(?=[^0-9])|\\s+"),
        t => length(t) > 0)))

  /**
   * Quality components + composite score in [0,1]:
   * alpha ratio, whitespace-word length sanity, stopword ratio, and
   * punctuation density. Weights are arbitrary but fixed; the value of the
   * operator is that every component is a pushdown-friendly expression.
   */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val len = length(t).cast(DoubleType)
    val alpha = length(regexp_replace(t, "[^A-Za-z]", "")).cast(DoubleType)
    val punct = length(regexp_replace(t, "[^.,;:!?]", "")).cast(DoubleType)
    val toks = tokenCount(textCol).cast(DoubleType)
    val padded = paddedLower(t)
    val stop = langMarkers("en").map(w => markerHits(padded, w)).reduce(_ + _).cast(DoubleType)
    // The composite score is computed on an exact integer grid: the
    // rounded component ratios are multiples of 1e-6, so the weighted sum
    // (weights 0.5/0.3/0.2) lives on a 1e-7 grid where binary-double
    // arithmetic lands exact half-ties — rounding those back to 6
    // decimals is engine-dependent (Spark HALF_UP on Decimal vs a
    // DuckDB/C double round). Doing the weighting and the final half-up
    // in Long micro-units keeps Spark and any ANSI-SQL oracle
    // bit-identical.
    val aM = round(col("alpha_ratio") * 1e6).cast(LongType)
    val sM = round(col("stopword_ratio") * 1e6).cast(LongType)
    val pM = round(col("punct_ratio") * 1e6).cast(LongType)
    val raw7 = aM * 5 + least(sM * 2, lit(1000000L)) * 3 +
      (lit(1000000L) - least(pM * 5, lit(1000000L))) * 2 // 1e-7 units, in [0, 1e7]
    df.withColumn("alpha_ratio", round(when(len > 0, alpha / len).otherwise(0.0), 6))
      .withColumn("punct_ratio", round(when(len > 0, punct / len).otherwise(0.0), 6))
      .withColumn("stopword_ratio", round(when(toks > 0, stop / toks).otherwise(0.0), 6))
      .withColumn("avg_word_len", round(when(toks > 0, len / toks).otherwise(0.0), 6))
      .withColumn("quality_score",
        floor((least(greatest(raw7, lit(0L)), lit(10000000L)) + lit(5L)) / lit(10.0))
          .cast(LongType).cast(DoubleType) / lit(1000000.0))
  }

  /**
   * Keep documents at or above the global `percentile` of
   * `quality_score` — the corpus-relative quality cut a pipeline applies
   * when it wants "the best 75%" rather than a fixed threshold.
   *
   * The percentile is EXACT at any scale because the score lives on a
   * 1e-6 grid (see [[withQuality]]): the selection runs on the score
   * HISTOGRAM (≤ 1e6+1 buckets regardless of corpus size — one
   * map-side-combined aggregate), whose cumulative sum is a
   * range-partitioned distributed prefix scan
   * ([[graft.operators.Relational.prefixSum]] — no single-partition
   * window anywhere, whatever the score granularity). Threshold =
   * smallest score with cum ≥ ceil(p·n) (inclusive-rank
   * percentile-disc), broadcast back as a pure filter on the scored
   * scan.
   */
  def qualityPercentileFilter(df: DataFrame, textCol: String, idCol: String,
                              percentile: Double): DataFrame = {
    require(percentile > 0 && percentile < 1,
      s"percentile must be in (0,1): $percentile")
    // score once, materialize ONLY (id, score): the scored projection
    // feeds the histogram AND the final filter, and without a
    // materialization each consumer re-runs the regex-heavy scoring
    // (hist twice — cum and tot — plus the filter: 3 evaluations,
    // measured ~3.6 s vs ~1.2 s for one). At cluster scale this
    // two-column table is exactly the score artifact a real pipeline
    // persists before thresholding.
    val q = withQuality(df, textCol).select(col(idCol), col("quality_score"))
      .localCheckpoint(true)
    val hist = q.groupBy(col("quality_score")).agg(count(lit(1)).as("c"))
    val cum = graft.operators.Relational
      .prefixSum(hist, "quality_score", "c", "cumless")
      .withColumn("cum", col("cumless") + col("c"))
    val tot = hist.agg(sum(col("c")).as("n"))
    val thr = cum.crossJoin(broadcast(tot))
      .where(col("cum") >= ceil(lit(percentile) * col("n")))
      .agg(min(col("quality_score")).as("thr"))
    q.crossJoin(broadcast(thr))
      .where(col("quality_score") >= col("thr"))
      .select(col(idCol), col("quality_score"))
  }

  /**
   * Gopher-style quality rules (Rae et al. 2021, "Scaling Language
   * Models", Table A1) — the structural/repetition filters a pretraining
   * pipeline applies before anything model-based:
   *
   *  - 50 ≤ word_count ≤ 100 000
   *  - 3 ≤ mean word length ≤ 10
   *  - symbol-to-word ratio ('#' chars + '...' runs per word) ≤ 0.1
   *  - ≤ 90% of lines start with a bullet, ≤ 30% end with an ellipsis
   *  - ≥ 80% of words contain an alphabetic character
   *  - ≥ 2 distinct English stop words present
   *  - ≤ 20% of characters in duplicated (non-unique) lines
   *
   * Every per-document measure is a codegen'd column expression; the one
   * corpus-shaped measure (duplicate-line character fraction) is a
   * line-explode + (id, line) count + per-id aggregate — linear, one
   * shuffle on (id, line), never quadratic in lines per document.
   * Returns (id, word_count, mean_word_len, alpha_word_ratio,
   * symbol_word_ratio, bullet_ratio, ellipsis_ratio,
   * dup_line_char_ratio, stop_hits, gopher_pass); ratios rounded to 6 so
   * the DuckDB oracle replays bit-identically. Null text behaves as "".
   */
  def gopherQuality(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val toks = filter(split(trim(t), "\\s+"), x => length(x) > 0)
    val wc = size(toks).cast(DoubleType)
    val meanWl = when(wc > 0,
      aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast(DoubleType) / wc)
      .otherwise(0.0)
    val alphaWords = size(filter(toks, x => x.rlike("[A-Za-z]"))).cast(DoubleType)
    val hashes = (length(t) - length(regexp_replace(t, "#", ""))).cast(DoubleType)
    val ellipses = ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast(DoubleType)
    val lines = split(t, "\n")
    val lc = size(lines).cast(DoubleType)
    val bulletLines = size(filter(lines,
      l => substring(ltrim(l), 1, 1).isin("-", "*", "•"))).cast(DoubleType)
    val ellipsisLines = size(filter(lines,
      l => endswith(rtrim(l), lit("...")) || endswith(rtrim(l), lit("…")))).cast(DoubleType)
    val padded = paddedLower(t)
    val stopHits = langMarkers("en")
      .map(w => when(padded.contains(s" $w "), 1).otherwise(0))
      .reduce(_ + _)

    val base = df.select(
      col(idCol).as("id"),
      size(toks).cast(LongType).as("word_count"),
      round(meanWl, 6).as("mean_word_len"),
      round(when(wc > 0, alphaWords / wc).otherwise(0.0), 6).as("alpha_word_ratio"),
      round(when(wc > 0, (hashes + ellipses) / wc).otherwise(0.0), 6).as("symbol_word_ratio"),
      round(when(lc > 0, bulletLines / lc).otherwise(0.0), 6).as("bullet_ratio"),
      round(when(lc > 0, ellipsisLines / lc).otherwise(0.0), 6).as("ellipsis_ratio"),
      stopHits.cast(LongType).as("stop_hits"))

    // duplicate-line character fraction, linear shape (cf. lineDedup)
    val docLines = df.select(col(idCol).as("id"),
      explode(split(coalesce(col(textCol), lit("")), "\n")).as("l0"))
      .select(col("id"), trim(col("l0")).as("l"))
      .where(length(col("l")) > 0)
    val lineCounts = docLines.groupBy("id", "l")
      .agg(count(lit(1)).as("c"))
      .select(col("id"),
        (col("c") * length(col("l"))).cast(DoubleType).as("chars"),
        when(col("c") > 1, col("c") * length(col("l"))).otherwise(0L)
          .cast(DoubleType).as("dupChars"))
    val dupAgg = lineCounts.groupBy("id")
      .agg(round(sum(col("dupChars")) / sum(col("chars")), 6).as("dup_line_char_ratio"))

    base.join(dupAgg, Seq("id"), "left")
      .withColumn("dup_line_char_ratio", coalesce(col("dup_line_char_ratio"), lit(0.0)))
      .withColumn("gopher_pass",
        col("word_count").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_word_ratio") <= 0.1 &&
          col("bullet_ratio") <= 0.9 &&
          col("ellipsis_ratio") <= 0.3 &&
          col("alpha_word_ratio") >= 0.8 &&
          col("stop_hits") >= 2 &&
          col("dup_line_char_ratio") <= 0.2)
  }

  /**
   * C4 heuristic cleaning (Raffel et al. 2020, §2.2 — the line-level
   * rules [[gopherQuality]]'s document-level measures don't cover). A
   * line is KEPT iff it ends in terminal punctuation (`.` `!` `?` `"`),
   * has ≥ `minLineWords` words, and doesn't mention "javascript" (the
   * enable-JS boilerplate rule). Document-level: any "lorem ipsum" or a
   * curly brace (code) fails the doc outright; `c4_pass` additionally
   * requires ≥ `minKeptLines` surviving lines (the ≥3-sentences rule,
   * line-approximated). Returns per doc:
   * (id, line_total, lines_kept, kept_ratio, has_lorem_ipsum, has_curly,
   * c4_pass, clean_text) where clean_text is the kept lines re-joined in
   * order — the rebuilt document C4 actually trains on.
   *
   * Shape at scale: one narrow map per document (array ops over the line
   * split — no explode, no shuffle at all); kept_ratio rounds to 6 so the
   * DuckDB oracle replays bit-identically. Null text behaves as "".
   * (C4's bad-words list is licensing-encumbered and out of scope; its
   * 3-sentence-span dedup is [[lineDedup]]'s family.)
   */
  def c4Filters(df: DataFrame, textCol: String, idCol: String,
                minLineWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val lines = split(t, "\n")
    val keep = (l: Column) =>
      substring(rtrim(l), -1, 1).isin(".", "!", "?", "\"") &&
        size(filter(split(trim(l), "\\s+"), x => length(x) > 0)) >= minLineWords &&
        !lower(l).contains("javascript")
    val kept = filter(lines, keep)
    val lc = size(lines).cast(DoubleType)
    df.select(
      col(idCol).as("id"),
      size(lines).cast(LongType).as("line_total"),
      size(kept).cast(LongType).as("lines_kept"),
      round(when(lc > 0, size(kept).cast(DoubleType) / lc).otherwise(0.0), 6)
        .as("kept_ratio"),
      lower(t).contains("lorem ipsum").as("has_lorem_ipsum"),
      t.contains("{").as("has_curly"),
      (size(kept) >= minKeptLines &&
        !lower(t).contains("lorem ipsum") && !t.contains("{")).as("c4_pass"),
      array_join(kept, "\n").as("clean_text"))
  }

  /**
   * Gopher repetition filters (Rae et al. 2021, Table A1 — the measures
   * [[gopherQuality]] leaves out because they are gram-shaped, not
   * line-shaped):
   *
   *  - `top{n}_char_ratio` for n in `topNs`: fraction of the document's
   *    characters covered by its single most frequent word n-gram,
   *    count × len(gram) / len(trim(text)) — ties broken by the
   *    lexicographically smallest gram so the pick is deterministic;
   *  - `dup{n}_char_ratio` for n in `dupNs`: fraction covered by ALL
   *    duplicated n-grams, Σ_{count>1} count × len(gram) / len(trim(text)).
   *    (Overlapping occurrences are each counted — the standard
   *    reimplementation convention, e.g. Dolma/NeMo-Curator; Gopher's
   *    prose is ambiguous on overlap.)
   *
   * Shape at scale: ONE tokenize+posexplode of the corpus feeds every n
   * (the lead() window extends grams in place), then one (id, gram)
   * count per n and a per-id aggregate — linear in corpus tokens, one
   * shuffle per n on (id, gram-hash-sized keys), never quadratic.
   * Tokens are lowercased like [[tfIdfTopTerms]]; grams join with single
   * spaces; ratios round to 6 so the DuckDB oracle replays bit-identically.
   * Null/blank text yields zero ratios.
   */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String,
                      topNs: Seq[Int] = Seq(2, 3), dupNs: Seq[Int] = Seq(5)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require((topNs ++ dupNs).forall(_ >= 1), "n-gram sizes must be >= 1")
    val ids = df.select(col(idCol).as("id"),
      length(trim(coalesce(col(textCol), lit("")))).cast(DoubleType).as("__chars"))
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+")))
      .where(length(col("col")) > 0)
      .select(col("id"), col("pos"), col("col").as("tok"))
    val w = Window.partitionBy("id").orderBy("pos")

    def gramCover(n: Int): DataFrame = {
      // gram = tok ++ lead(tok,1) ... ++ lead(tok,n-1); rows where any
      // lead is null (document tail) carry no full gram
      val withG = (1 until n).foldLeft(toks.withColumn("g", col("tok"))) { (d, i) =>
        d.withColumn("g", concat_ws(" ", col("g"), lead(col("tok"), i).over(w)))
          .withColumn(s"ok$i", lead(col("tok"), i).over(w).isNotNull)
      }
      val okCols = (1 until n).map(i => col(s"ok$i")).reduceOption(_ && _).getOrElse(lit(true))
      withG.where(okCols).groupBy(col("id"), col("g"))
        .agg(count(lit(1)).as("c"))
        .select(col("id"), col("g"), col("c"),
          (col("c") * length(col("g"))).cast(DoubleType).as("cover"))
    }

    val topAggs = topNs.map { n =>
      // argmax by (count DESC, gram ASC) via min(struct(-c, g)) — the
      // labelPropagation trick; covered chars recomputed from the winner
      val winner = gramCover(n).groupBy("id")
        .agg(min(struct((-col("c")).as("nc"), col("g").as("g"))).as("top"))
        .select(col("id"),
          ((-col("top.nc")) * length(col("top.g"))).cast(DoubleType).as(s"__topcover$n"))
      (n, winner)
    }
    val dupAggs = dupNs.map { n =>
      val d = gramCover(n).where(col("c") > 1).groupBy("id")
        .agg(sum(col("cover")).as(s"__dupcover$n"))
      (n, d)
    }

    val joined = (topAggs.map(_._2) ++ dupAggs.map(_._2))
      .foldLeft(ids)((acc, d) => acc.join(d, Seq("id"), "left"))
    val withTop = topNs.foldLeft(joined) { (d, n) =>
      d.withColumn(s"top${n}_char_ratio",
        round(when(col("__chars") > 0,
          coalesce(col(s"__topcover$n"), lit(0.0)) / col("__chars")).otherwise(0.0), 6))
    }
    val withDup = dupNs.foldLeft(withTop) { (d, n) =>
      d.withColumn(s"dup${n}_char_ratio",
        round(when(col("__chars") > 0,
          coalesce(col(s"__dupcover$n"), lit(0.0)) / col("__chars")).otherwise(0.0), 6))
    }
    withDup.select(col("id") +:
      (topNs.map(n => col(s"top${n}_char_ratio")) ++
        dupNs.map(n => col(s"dup${n}_char_ratio"))): _*)
  }

  /** PII patterns used by [[scrubPii]] — kept in the regex subset both
    * Java (Spark codegen) and RE2 (DuckDB oracle) accept: no lookaround,
    * no backreferences. Order matters: emails are scrubbed before phone
    * numbers so digit runs inside a local-part don't double-count. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\+?\\d{1,3}[-. ]?\\(?\\d{2,4}\\)?[-. ]?\\d{3,4}[-. ]?\\d{3,4}",
    "ip" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  /**
   * PII scrubbing — the redaction pass a training pipeline runs before
   * anything leaves the ingest boundary: emails, phone-number shapes and
   * IPv4 literals are replaced with `[EMAIL]`/`[PHONE]`/`[IP]` sentinels,
   * and per-category match counts are reported so downstream can filter
   * or audit. Pure regexp_replace/regexp_count chains — codegen'd,
   * pushdown-friendly, and replayed verbatim by the DuckDB oracle.
   * Patterns are deliberately shape-based (this is a scrubber, not a
   * validator): over-redaction is the safe failure mode.
   */
  def scrubPii(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // each category counts matches on the text AFTER the previous
    // categories were redacted, so a digit run inside an email local-part
    // is an email, not also a phone number — the oracle chains the same way
    val (scrubbed, counts) = piiPatterns
      .foldLeft((coalesce(col(textCol), lit("")), Seq.empty[Column])) {
        case ((c, cnts), (name, p)) =>
          (regexp_replace(c, p, s"[${name.toUpperCase}]"),
            cnts :+ regexp_count(c, lit(p)).cast(LongType).as(s"n_$name"))
      }
    df.select(col(idCol).as("id") +: scrubbed.as("text") +: counts: _*)
  }

  /**
   * Token-budgeted document chunking — the pre-training windowing pass:
   * split each document's whitespace tokens into chunks of `maxTokens`
   * with `overlap` tokens repeated between consecutive chunks (stride =
   * maxTokens − overlap). Returns (id, chunk_no, chunk, n_tokens);
   * chunk_no is 0-based, the final chunk may be short, and empty/null
   * documents produce no chunks. One narrow explode per document —
   * chunk COUNT not corpus size drives the row multiplier, so the shape
   * survives 100 TB (no shuffle at all until the caller aggregates).
   */
  def chunkTokens(df: DataFrame, textCol: String, idCol: String,
                  maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens, "0 <= overlap < maxTokens")
    val stride = maxTokens - overlap
    val toks = filter(split(trim(coalesce(col(textCol), lit(""))), "\\s+"),
      x => length(x) > 0)
    // ceil((n - overlap)/stride), min 1: the last window reaching the end
    // terminates the sequence — a tail that would sit entirely inside the
    // previous window is never emitted
    val nChunks = when(size(toks) === 0, lit(0))
      .otherwise(greatest(lit(1),
        ceil((size(toks) - overlap).cast(DoubleType) / stride).cast(IntegerType)))
    df.select(col(idCol).as("id"), toks.as("__toks"), nChunks.as("__n"))
      .where(col("__n") > 0)
      .select(col("id"), col("__toks"),
        posexplode(transform(sequence(lit(0), col("__n") - 1),
          i => slice(col("__toks"), i * stride + 1, lit(maxTokens)))))
      .select(col("id"), col("pos").cast(IntegerType).as("chunk_no"),
        concat_ws(" ", col("col")).as("chunk"),
        size(col("col")).as("n_tokens"))
  }

  /**
   * Training-corpus SEQUENCE PACKING: assign documents to fixed
   * token-budget bins ("packed training sequences") in a deterministic
   * global order — the corpus layout step between filtering and
   * tokenized-batch writing in a pre-training pipeline.
   *
   * Discipline: STREAM-SPLIT at document starts. Conceptually the
   * corpus is one concatenated token stream cut into budget-sized
   * windows; a document belongs to the window its FIRST token lands in
   * (`seq_id = floor(tokens_before / budget)`), so bins are contiguous
   * in `orderCol`, curriculum order is preserved, no document is ever
   * split, and a bin overflows its budget by less than its last
   * document's length (cap outliers upstream with [[chunkTokens]]).
   * Greedy first-fit packing needs a sequential mutable bin table;
   * this layout is a pure PREFIX SUM — exact integers, bit-identical
   * replays, and the distributed shape is
   * [[graft.operators.Relational.prefixSum]] (range sort + bounded
   * per-partition offsets; no global Window, nothing row-shaped on the
   * driver).
   *
   * Emits one row per document: `(doc_id, n_tokens, seq_id,
   * seq_offset)` — offset = the document's start within its bin.
   */
  def packSequences(df: DataFrame, idCol: String, tokenCol: Column,
                    budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val base = df.select(col(idCol).as("doc_id"),
      tokenCol.cast(LongType).as("n_tokens"))
    graft.operators.Relational
      .prefixSum(base, "doc_id", "n_tokens", "__before")
      .select(col("doc_id"), col("n_tokens"),
        // SQL DIV: exact 64-bit integer division (a double `/` would
        // round above 2^53 — the whole point is bit-exact replay)
        expr(s"__before DIV ${budget}L").as("seq_id"),
        (col("__before") % budget).as("seq_offset"))
  }

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * lowercase token set. Identical in DuckDB:
    * md5(array_to_string(list_sort(list_distinct(...)), ' ')). */
  def fingerprint(textCol: String): Column =
    md5(concat_ws(" ",
      array_sort(array_distinct(
        filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)))))

  /** Character k-shingles of the whitespace-normalized lowercase text. */
  def charShingles(textCol: String, k: Int): Column = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    filter(
      transform(sequence(lit(0), greatest(length(norm) - k, lit(0))),
        i => norm.substr(lit(1) + i, lit(k))),
      s => length(s) === k)
  }

  /** Word n-grams as space-joined strings. */
  def wordNgrams(textCol: String, n: Int): Column = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)
    filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
      s => size(split(s, " ")) === n)
  }

  /**
   * Top-k characteristic terms per document by TF-IDF: term frequency ×
   * ln(N / document frequency), natural log, no smoothing (every scored
   * term has df ≥ 1). Returns (id, term, tfidf, rank) with rank 1..k per
   * document, ordered by (tfidf ROUNDED to 4 decimals desc, term asc) —
   * ranking on the rounded value keeps the selection replayable across
   * engines whose ln() may differ in the last ulp.
   *
   * Shape at scale: one tokenize+explode (narrow), one (id, term) count,
   * one term-keyed document-frequency aggregate joined back — the df
   * side is vocabulary-sized, broadcastable — a 1-row corpus count
   * broadcast, and one per-document top-k window. No all-pairs, no
   * driver-side vocabulary.
   */
  def tfIdfTopTerms(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
        explode(filter(split(lower(trim(col(textCol))), "\\s+"),
          t => length(t) > 0)).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val total = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(total))
      .withColumn("tfidf",
        round(col("tf") * log(col("__n").cast("double") / col("df")), 4))
    val w = Window.partitionBy("id").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id"), col("term"), col("tfidf"), col("rank"))
  }

  /**
   * Benchmark-contamination detection — the decontamination step of a
   * training-data pipeline: for every document, the fraction of its
   * distinct word n-grams that appear anywhere in the `benchmark` corpus
   * (the eval set). Returns (id, grams, hits, contamination); documents
   * with fewer than n tokens have zero grams and contamination 0.
   *
   * Shape at scale: both sides are one tokenize+explode (narrow) to
   * distinct (id, gram) postings; the benchmark's distinct-gram set is
   * eval-set-sized — tiny next to a 100 TB corpus — so the membership
   * probe is a broadcastable left-semi join keyed on an 8-byte gram hash,
   * followed by one per-document count aggregate. The corpus is never
   * shuffled on anything wider than (id, gramHash); no all-pairs, no
   * driver-side gram set.
   */
  def contamination(df: DataFrame, textCol: String, idCol: String,
                    benchmark: DataFrame, benchTextCol: String, n: Int = 3): DataFrame = {
    val docGrams = Dedup.ngramPosting(df, textCol, idCol, n)
    val benchGrams = Dedup.ngramPosting(
      benchmark.select(col(benchTextCol), monotonically_increasing_id().as("__bid")),
      benchTextCol, "__bid", n)
      .select(col("shingle")).distinct()
    val perDoc = docGrams
      .join(benchGrams, Seq("shingle"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("hits"))
    val totals = docGrams.groupBy("id").agg(count(lit(1)).as("grams"))
    df.select(col(idCol).as("id"))
      .join(totals, Seq("id"), "left")
      .join(perDoc, Seq("id"), "left")
      .na.fill(0L, Seq("grams", "hits"))
      .withColumn("contamination",
        round(when(col("grams") > 0,
          col("hits").cast(DoubleType) / col("grams").cast(DoubleType)).otherwise(0.0), 6))
  }

  /**
   * Line-level deduplication (the C4/RefinedWeb-style boilerplate pass):
   * drop every line that occurs in at least `minDocFreq` DISTINCT
   * documents, preserving the order of surviving lines. Returns
   * (id, text, removed) — `removed` counts dropped line instances;
   * documents whose every line is boilerplate come back with empty text.
   *
   * `sep` is a LITERAL separator (default newline), used both to split
   * and to rejoin.
   *
   * Shape at scale: one split+posexplode (narrow), one distinct +
   * line-keyed document-frequency aggregate joined back on the line —
   * frequent lines are by construction few distinct values, and the join
   * key is the line itself so skew concentrates on exactly the rows being
   * dropped — then one per-document sort-and-concat aggregate. Line order
   * is restored from the carried position, not a global sort.
   */
  def lineDedup(df: DataFrame, textCol: String, idCol: String,
                minDocFreq: Long, sep: String = "\n"): DataFrame = {
    val quoted = java.util.regex.Pattern.quote(sep)
    val lines = df
      .select(col(idCol).as("id"), posexplode(split(col(textCol), quoted)).as(Seq("pos", "l")))
    val dfreq = lines.select(col("id"), col("l")).distinct()
      .groupBy("l").agg(count(lit(1)).as("df"))
    val tagged = lines.join(dfreq, Seq("l"))
    val kept = tagged.where(col("df") < minDocFreq)
      .groupBy("id")
      .agg(
        concat_ws(sep,
          transform(array_sort(collect_list(struct(col("pos"), col("l")))), _.getField("l")))
          .as("__text"),
        count(lit(1)).as("__kept"))
    val totals = lines.groupBy("id").agg(count(lit(1)).as("__total"))
    // totals is LEFT-joined: split(null) explodes to zero rows, so a
    // null-text document is absent from `lines` — an inner join would
    // silently drop it from the output (unlike contamination(), which
    // preserves every input document); it comes back as (id, "", 0)
    df.select(col(idCol).as("id"))
      .join(totals, Seq("id"), "left")
      .join(kept, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__text"), lit("")).as("text"),
        (coalesce(col("__total"), lit(0L)) - coalesce(col("__kept"), lit(0L))).as("removed"))
  }

  /**
   * C4 three-sentence-span dedup (Raffel et al. 2020 §2.2: "we removed
   * all but one of any three-sentence span occurring more than once") —
   * the cross-document complement of [[lineDedup]]'s per-line frequency
   * pass. Sentences are '.'-delimited segments (trimmed, empties
   * dropped); every `spanSentences`-sentence sliding window is ranked
   * globally by first occurrence (doc id, then position), and every
   * occurrence after the first marks its sentences for removal. The
   * document is rebuilt from surviving sentences joined with ". " — the
   * kept text a C4 pipeline trains on. Returns (id, text, removed).
   *
   * Shape at scale: one sentence explode, one lead() window per doc for
   * span assembly, ONE shuffle on the span hash for the global
   * first-occurrence rank, a tiny marked-set explode, and the ordered
   * rebuild aggregate — linear in corpus sentences, never quadratic.
   * Determinism: the "first" occurrence is min (id, position) — total
   * order, no data-order dependence anywhere.
   */
  def spanDedup(df: DataFrame, textCol: String, idCol: String,
                spanSentences: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(spanSentences >= 2, s"spanSentences must be >= 2: $spanSentences")
    val segs = df
      .select(col(idCol).as("id"), posexplode(split(col(textCol), "\\.")).as(Seq("pos", "s0")))
      .select(col("id"), col("pos"), trim(col("s0")).as("s"))
      .where(length(col("s")) > 0)
    // re-index surviving sentences so spans are over ADJACENT sentences
    val w = Window.partitionBy("id").orderBy("pos")
    val sent = segs.withColumn("sidx", row_number().over(w) - 1).drop("pos")
    val withLeads = (1 until spanSentences).foldLeft(sent.withColumn("span", col("s"))) {
      (d, i) =>
        // '.' as the span separator cannot appear inside a sentence
        // segment (sentences are the '.'-split), so distinct sentence
        // triples never concatenate to the same span string
        d.withColumn("span", concat_ws(".", col("span"), lead(col("s"), i).over(
          Window.partitionBy("id").orderBy("sidx"))))
          .withColumn(s"ok$i", lead(col("s"), i).over(
            Window.partitionBy("id").orderBy("sidx")).isNotNull)
    }
    val okAll = (1 until spanSentences).map(i => col(s"ok$i")).reduce(_ && _)
    val spans = withLeads.where(okAll)
      .select(col("id"), col("sidx"), xxhash64(col("span")).as("h"))
    // global first-occurrence rank per span; rank >= 2 → remove sentences
    val ranked = spans.withColumn("rn",
      row_number().over(Window.partitionBy("h").orderBy(col("id"), col("sidx"))))
    val marked = ranked.where(col("rn") >= 2)
      .select(col("id"), explode(sequence(col("sidx"),
        col("sidx") + lit(spanSentences - 1))).as("sidx"))
      .distinct()
    val kept = sent.join(marked, Seq("id", "sidx"), "left_anti")
      .groupBy("id")
      .agg(
        concat_ws(". ",
          transform(array_sort(collect_list(struct(col("sidx"), col("s")))), _.getField("s")))
          .as("__text"),
        count(lit(1)).as("__kept"))
    val totals = sent.groupBy("id").agg(count(lit(1)).as("__total"))
    df.select(col(idCol).as("id"))
      .join(totals, Seq("id"), "left")
      .join(kept, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__text"), lit("")).as("text"),
        (coalesce(col("__total"), lit(0L)) - coalesce(col("__kept"), lit(0L))).as("removed"))
  }

  /**
   * Corpus-trained bigram language-model predictability score — the
   * CCNet-style LM quality signal (Wenzek et al. 2020; there a KenLM
   * wikipedia perplexity, here the corpus itself is the training set and
   * the score is an EXACT integer contract any engine replays): tokens
   * are the lowercased whitespace split (the house tokenization); corpus
   * bigram counts c(w1,w2); left marginal c(w1·) = Σ_w2 c(w1,w2); each
   * doc bigram scores c(w1,w2)·10⁶ div c(w1·) — the conditional
   * probability p(w2|w1) in parts-per-million — and the doc score is the
   * integer mean over its bigrams (0 when it has none; such docs are
   * preserved, not dropped). High = predictable/templated text, low =
   * surprising — the two tails a quality-filtering pipeline cuts.
   *
   * Shape at scale: one narrow explode, one shuffle on (w1,w2) for the
   * count table, a vocabulary-sized groupBy for the marginal, one join
   * of doc bigrams back on (w1,w2), one groupBy id — no all-pairs, no
   * driver state, and the count/marginal tables are vocabulary-sized
   * (broadcastable for natural-language vocabularies).
   */
  def lmScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+")))
      .where(length(col("col")) > 0)
      .select(col("id"), col("pos"), col("col").as("tok"))
    val w = Window.partitionBy("id").orderBy("pos")
    val bi = toks.withColumn("w2", lead(col("tok"), 1).over(w))
      .where(col("w2").isNotNull)
      .select(col("id"), col("tok").as("w1"), col("w2"))
    val cnt = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val marg = cnt.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val perDoc = bi.join(cnt, Seq("w1", "w2")).join(marg, Seq("w1"))
      .select(col("id"), expr("c12 * 1000000 DIV c1").as("ppm"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), expr("SUM(ppm) DIV COUNT(*)").as("score_ppm"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score_ppm"), lit(0L)).as("score_ppm"))
  }
}
