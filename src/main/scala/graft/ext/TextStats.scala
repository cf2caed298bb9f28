package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: tokenization,
  * quality scoring, language ID, fingerprinting.
  *
  * Everything is a composition of built-in column functions — fully
  * codegen'd, no UDFs, so the hot path stays inside whole-stage codegen
  * and scales linearly with input. Language ID is the classic stopword
  * n-gram heuristic (cf. fastText/langdetect's cheap tier).
  */
object TextStats {

  /** Whitespace tokens of trimmed text (empty string → one empty token,
    * matching common split semantics across engines).
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-family pretokenizer pieces: contraction suffixes, optionally
    * space-prefixed letter runs / digit runs / symbol runs, residual
    * whitespace. This is the public BPE *pre*-tokenization regex (the
    * merge table itself is model weights, not engine surface); counting
    * its pieces gives the standard "BPE-ish" token estimate used for
    * corpus budgeting. The original pattern's `\s+(?!\S)` lookahead is
    * dropped so the same pattern runs under both Java regex and RE2
    * (lookahead is the one feature RE2 refuses); the cost is that each
    * whitespace character not consumed by a ` ?X` piece counts as its
    * own piece (GPT-2 counts one per run) — an overcount only on
    * consecutive whitespace, which real tokenizers also bill roughly
    * per character once runs get long.
    */
  private val bpePiece =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s']+|\\s"

  /** Number of BPE-ish pieces in `text` (0 for empty; whitespace-only
    * text counts its characters, see [[bpePiece]]).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePiece), lit(0)))

  def charCount(text: Column): Column = length(text)

  /** Count of punctuation characters. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.!?,;:]", ""))

  /** Occurrences of `word` as a whitespace-delimited token. Uses the
    * replace-length trick so it stays a pure string expression.
    */
  def wordOccurrences(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val target = s" $word "
    // overlapping " w1 w2 " occurrences need single-space padding intact;
    // collapse any run of whitespace first so the trick is exact.
    val norm = regexp_replace(padded, "\\s+", " ")
    ((length(norm) - length(replace(norm, lit(target), lit(" ")))) /
      (target.length - 1)).cast("int")
  }

  /** Small per-language stopword lists for the n-gram heuristic. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "und", "nicht", "das"),
    "es" -> Seq("el", "los", "que", "y", "una"),
    "fr" -> Seq("le", "les", "et", "dans", "une"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Total stopword hits for one language. */
  def stopwordHits(text: Column, lang: String): Column =
    stopwords.toMap.apply(lang).map(w => wordOccurrences(text, w)).reduce(_ + _)

  /** Heuristic language ID: argmax of stopword hits, ties broken by the
    * fixed language order, zero hits → 'und'. Deterministic by
    * construction (same CASE chain is expressible in ANSI SQL).
    *
    * Computed by the native [[graft.functions.StopwordExpressions]]
    * one-pass expression: the column-composed CASE chain
    * ([[langIdReference]], kept as the oracle-shaped reference and
    * pinned bit-equal by `StopwordExpressionsSpec`) expands to 25
    * `wordOccurrences` chains, which overflowed janino's 64 KB method
    * limit when fused with other signals in one filter and silently
    * dropped the corpus-build clean stage out of whole-stage codegen.
    */
  def langId(text: Column): Column =
    graft.functions.StopwordExpressions.stopwordSignals(text).getField("lang")

  /** Reference column-composed spelling of [[langId]] — the shape the
    * DuckDB oracles replay in SQL. Test-pinned equal to the fast path.
    */
  private[graft] def langIdReference(text: Column): Column = {
    val hits = stopwords.map { case (l, _) => l -> stopwordHits(text, l) }
    val maxHits = greatest(hits.map(_._2): _*)
    val chain = hits.foldLeft(when(maxHits === 0, lit("und"))) {
      case (acc, (l, h)) => acc.when(h === maxHits, lit(l))
    }
    chain.otherwise(lit("und"))
  }

  /** Quality score in [0,1]: token-length band + punctuation ratio +
    * stopword presence, equally weighted. The exact formula is less
    * important than it being cheap, monotone in "looks like prose", and
    * reproducible in plain SQL. The stopword-presence term rides the
    * same native one-pass expression as [[langId]] (codegen-size
    * rationale there).
    */
  def qualityScore(text: Column): Column = {
    val anyStop = when(graft.functions.StopwordExpressions
      .stopwordSignals(text).getField("total_hits") > 0, 1.0).otherwise(0.0)
    qualityScoreFrom(text, anyStop)
  }

  /** Reference spelling of [[qualityScore]] with the column-composed
    * stopword term. Test-pinned equal to the fast path.
    */
  private[graft] def qualityScoreReference(text: Column): Column = {
    val anyStop = when(
      stopwords.map(l => stopwordHits(text, l._1)).reduce(_ + _) > 0,
      1.0).otherwise(0.0)
    qualityScoreFrom(text, anyStop)
  }

  private def qualityScoreFrom(text: Column, anyStop: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lengthOk = when(nTok >= 10 && nTok <= 5000, 1.0).otherwise(0.0)
    val punctRatio = punctCount(text).cast("double") / greatest(charCount(text), lit(1)).cast("double")
    val punctOk = when(punctRatio <= 0.1, 1.0).otherwise(0.0)
    round((lengthOk + punctOk + anyStop) / 3.0, 6)
  }

  /** C4-family rule flags (the published heuristic cleaning pass:
    * Raffel et al. 2020 §2.2, re-expressed as engine predicates over
    * whole documents): terminal punctuation, minimum length, brace/
    * boilerplate markers, "lorem ipsum". Returns a struct of booleans
    * plus the conjunction (`keep`) so pipelines can either filter or
    * audit per-rule drop rates. Pure codegen'd column compositions;
    * patterns restricted to RE2-safe constructs so the same regexes
    * run on any engine (the oracle respells them in DuckDB).
    */
  def c4Rules(text: Column): Column = {
    val t = trim(text)
    val endsWithPunct = t.rlike("[.!?\"']$")
    val longEnough = tokenCount(t) >= 5
    val noBrace = !t.contains("{")
    val noLorem = !lower(t).contains("lorem ipsum")
    val noJs = !lower(t).contains("javascript")
    struct(
      endsWithPunct.as("ends_with_punct"),
      longEnough.as("long_enough"),
      noBrace.as("no_brace"),
      noLorem.as("no_lorem"),
      noJs.as("no_js"),
      (endsWithPunct && longEnough && noBrace && noLorem && noJs).as("keep"))
  }

  // ------------------------------------- repetition quality signals
  /** Word n-grams of the text as an array column; empty array when the
    * document has fewer than `n` tokens.
    *
    * Built by zipping the token array with its own k-shifted slices
    * (`zip_with` materializes each argument array ONCE per row) rather
    * than indexing back into the tokens with `element_at` inside a
    * lambda — higher-order lambdas run interpreted, where every
    * `element_at(tokens(text), i)` reference would re-split the whole
    * document per element: O(L²) re-parses that measured ~30 s for one
    * small scale factor. The zip spelling is O(L·n).
    *
    * zip_with pads the shorter side with nulls; the null tail of the
    * accumulator is always a subset of the shift's null tail, so one
    * final isNotNull filter yields exactly the L-n+1 grams.
    */
  def ngramArray(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1: $n")
    val toks = tokens(text)
    if (n == 1) toks
    else {
      val grams = (2 to n).foldLeft(toks) { (acc, k) =>
        val shifted = slice(toks, lit(k), greatest(size(toks) - (k - 1), lit(0)))
        zip_with(acc, shifted,
          (a, b) => when(b.isNotNull && a.isNotNull, concat_ws(" ", a, b)))
      }
      filter(grams, x => x.isNotNull)
    }
  }

  /** Fraction of the document's n-grams taken by its single most
    * frequent n-gram — the Gopher-family repetition signal (high value
    * = boilerplate / degenerate repetition; typical filter keeps docs
    * under ~0.2 for 2-grams). Runs per-row with ZERO shuffle: sort the
    * gram array, then one `aggregate` pass finds the longest equal run
    * — O(L log L) per doc, not the O(L²) count-each-gram spelling, so
    * it stays viable on long documents at corpus scale.
    */
  def topNgramFrac(text: Column, n: Int): Column = {
    val grams = ngramArray(text, n)
    val sorted = array_sort(grams)
    val zero = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"))
    val best = aggregate(sorted, zero,
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(size(grams) > 0, round(best.cast("double") / size(grams), 6))
      .otherwise(lit(0.0))
  }

  /** Fraction of token occurrences that are repeats of an earlier
    * token (1 - distinct/total) — the companion within-document
    * duplication signal. Per-row, shuffle-free.
    */
  def dupTokenFrac(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      round(lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks), 6))
      .otherwise(lit(0.0))
  }

  /** Top-k characteristic terms per document by TF-IDF — the standard
    * keyword-extraction / topic-tagging primitive over a corpus.
    *
    * Plan shape at scale: one explode → (doc, term) partial-aggregated
    * count (map-side combine before the shuffle); document frequency is
    * a second aggregate over that same frame (vocabulary-sized, heavy
    * tail — kept as a shuffle join on term, NOT broadcast: a 100 TB
    * corpus's vocabulary does not fit an executor); the corpus doc
    * count rides the plan as a broadcast scalar (no driver action);
    * the final per-doc ranking is the row_number()<=k spelling that
    * [[graft.plans.TopKPerKey]]'s rule rewrites to the bounded-heap
    * operator — the shuffle carries at most k rows per document.
    * tf_idf is rounded BEFORE ranking so rank boundaries are stable
    * across engines.
    */
  def tfIdfTopTerms(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("tf_idf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df_t")), 6))
    val w = Window.partitionBy("id").orderBy(col("tf_idf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("tf"), col("tf_idf"),
        col("rank").cast("long").as("rank"))
  }

  /** Per-document Shannon entropy (log2) of the whitespace-token
    * distribution — the information-density quality signal (boilerplate
    * and keyword-stuffed spam score low; natural prose scores near
    * log2(n_tokens) for mostly-distinct tokens). Computed relationally
    * as H = log2(t) − (Σ c·log2 c)/t from one (doc, token) count — two
    * partially-aggregated keyed shuffles, no window, no HOF re-derives.
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg((log2(sum(col("c"))) -
        sum(col("c").cast("double") * log2(col("c"))) / sum(col("c")))
        .as("token_entropy"))

  /** Dedup-grade canonical form: lowercase, punctuation stripped to
    * spaces, whitespace collapsed, trimmed. Exact dedup over this form
    * catches the trivial-variant duplicates (case, punctuation,
    * spacing) that byte-exact dedup misses — the standard first
    * normalization tier before MinHash. Character classes are the
    * Unicode letter/number properties, identical under Java regex and
    * RE2, so the form is engine-portable.
    */
  def normalizeForDedup(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(text, "[^\\p{L}\\p{N}\\s]", " "), "\\s+", " ")))

  /** Split a document into fixed-size token windows with stride
    * `stride` (overlap = size - stride) — context-window / RAG chunk
    * preparation. Returns the array of chunk strings; explode it for
    * the long form. A document shorter than `size` yields one chunk.
    *
    * Cost note (see the HOF lesson in SCALE.md): the slice lambda
    * re-derives the token array per CHUNK (not per token), so the
    * per-row cost is O(chunks × L) — bounded and fine for documents;
    * for pathological multi-million-token rows, explode to (doc, pos)
    * and group by pos div stride instead.
    */
  def chunkTokens(text: Column, size: Int, stride: Int): Column = {
    require(size >= 1 && stride >= 1 && stride <= size,
      s"need 1 <= stride <= size: size=$size stride=$stride")
    val nChunks = greatest(
      ceil((tokenCount(text) - size).cast("double") / stride).cast("int") + 1,
      lit(1))
    transform(sequence(lit(0), nChunks - 1),
      i => concat_ws(" ", slice(tokens(text), i * stride + 1, lit(size))))
  }

  /** PII patterns for [[redactPii]], deliberately in the common
    * RE2-compatible subset (no backreferences, no lookaround) so the
    * same pattern strings run identically under Java regex and RE2 —
    * portable across engines and auditable as data, not code.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    // order matters: emails before bare domains, URLs before hostnames
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "\\+?\\d{1,3}[-. ]\\d{3}[-. ]\\d{3,4}[-. ]?\\d{0,4}" -> "<PHONE>",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b" -> "<IP>")

  /** Scrub personally-identifiable patterns (emails, URLs, phone
    * numbers, IPv4s) to typed placeholders — the standard pre-training
    * hygiene pass. A chain of codegen'd regexp_replace calls; each
    * replaces ALL occurrences (Spark default, = the 'g' flag
    * elsewhere).
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (pat, tag)) =>
      regexp_replace(acc, pat, tag)
    }

  // ------------------------------------- line-level boilerplate
  /** Line-level boilerplate predicate (a jusText-lite heuristic tier):
    * a line is boilerplate when it is too short to be prose (< 5
    * tokens), looks like a separator-delimited nav bar (>= 2 pipe
    * characters), or carries legal/footer markers (copyright, all
    * rights reserved, privacy policy, terms of, cookie). Pure
    * codegen'd string expressions, RE2-free, so the DuckDB oracle runs
    * the identical predicate inside `list_filter`.
    */
  def isBoilerplateLine(line: Column): Column = {
    val t = trim(line)
    val short = size(split(t, "\\s+")) < 5
    val navBar = (length(t) - length(replace(t, lit("|"), lit("")))) >= 2
    val lower_ = lower(t)
    val legal = Seq("copyright", "all rights reserved", "privacy policy",
      "terms of", "cookie").map(m => lower_.contains(m)).reduce(_ || _)
    short || navBar || legal
  }

  /** Strip boilerplate lines from a newline-delimited document —
    * the standard main-content extraction pass between raw web text and
    * the document-level quality filters. Per-row, shuffle-free: one
    * split + one `filter` HOF + one join.
    */
  def stripBoilerplate(text: Column): Column =
    array_join(filter(split(text, "\n"), l => !isBoilerplateLine(l)), "\n")

  /** Per-document line audit for [[stripBoilerplate]]: total lines,
    * boilerplate lines, and the cleaned text — pipelines filter on the
    * ratio (a mostly-boilerplate page is dropped whole, not trimmed).
    */
  def boilerplateAudit(text: Column): Column = {
    val lines = split(text, "\n")
    val nBoiler = size(filter(lines, l => isBoilerplateLine(l)))
    struct(
      size(lines).as("n_lines"),
      nBoiler.as("n_boiler"),
      stripBoilerplate(text).as("clean_text"))
  }

  /** Unicode NFC normalization — see
    * [[graft.functions.UnicodeExpressions]]. Run BEFORE
    * [[normalizeForDedup]] / fingerprinting on any web corpus: composed
    * vs decomposed forms of the same visible text otherwise fragment
    * every dedup key.
    */
  def nfcNormalize(text: Column): Column =
    graft.functions.UnicodeExpressions.nfcNormalize(text)

  def nfkcNormalize(text: Column): Column =
    graft.functions.UnicodeExpressions.nfkcNormalize(text)

  /** Per-script character profile: counts of Latin, Han (CJK),
    * Cyrillic, digit, whitespace, and other characters, plus the
    * dominant script — the writing-system companion to [[langId]]
    * (language ID by stopwords only works for languages whose script
    * you already matched; a multilingual crawl routes on script
    * FIRST). Pure codegen'd replace-length counting; the oracle
    * respells the script classes in RE2's `\p{Han}` syntax (Java
    * spells the same Unicode property `\p{IsHan}`).
    */
  def scriptProfile(text: Column): Column = {
    def cnt(pattern: String): Column =
      length(text) - length(regexp_replace(text, pattern, ""))
    val latin = cnt("[A-Za-z]")
    val han = cnt("\\p{IsHan}")
    val cyr = cnt("\\p{IsCyrillic}")
    val digit = cnt("[0-9]")
    val ws = cnt("\\s")
    val other = length(text) - latin - han - cyr - digit - ws
    val top = greatest(latin, han, cyr)
    val dominant = when(top === 0, lit("none"))
      .when(latin === top, lit("latin"))
      .when(han === top, lit("han"))
      .otherwise(lit("cyrillic"))
    struct(
      latin.cast("long").as("n_latin"),
      han.cast("long").as("n_han"),
      cyr.cast("long").as("n_cyrillic"),
      digit.cast("long").as("n_digit"),
      ws.cast("long").as("n_space"),
      other.cast("long").as("n_other"),
      dominant.as("dominant_script"))
  }

  /** DEFLATE length of the document's UTF-8 bytes (fixed level, raw
    * stream) — see [[graft.functions.CompressExpressions]].
    */
  def deflateLength(text: Column): Column =
    graft.functions.CompressExpressions.deflateLength(text)

  /** Compression ratio `deflate_len / byte_len` — the redundancy
    * quality signal: template/generated text lands well below prose
    * (~0.3–0.6 for English), random noise near or above 1. Null for
    * the empty document (no bytes to measure).
    */
  def compressionRatio(text: Column): Column =
    when(octet_length(text) > 0,
      round(deflateLength(text).cast("double") / octet_length(text), 6))

  /** Content fingerprint: first 16 hex chars of md5 — stable across
    * engines, enough bits (64) for dedup bucketing at trillions of docs.
    */
  /** Flesch reading-ease statistics: (n_words, n_sents, n_syll,
    * flesch) with the classic 206.835 − 1.015·(words/sentence) −
    * 84.6·(syllables/word) formula. Sentences are terminal-punctuation
    * runs `[.!?]+` (min 1); syllables use the standard cheap heuristic
    * — vowel-group count (`[aeiouy]+` on lower-cased text; groups
    * cannot span whitespace, so the whole-text count equals the
    * per-word sum). All three counts are exact integers from codegen'd
    * regex counting — no UDF — and the one double formula at the end
    * is IEEE-deterministic. Readability is a standard quality-scoring
    * axis beside [[c4Rules]]'s structural checks: very low scores
    * flag boilerplate/gibberish, very high ones flag trivial text.
    */
  def readabilityStats(text: Column): Column = {
    val words = tokenCount(text).cast("long")
    val sents = greatest(regexp_count(text, lit("[.!?]+")), lit(1))
      .cast("long")
    val syll = greatest(regexp_count(lower(text), lit("[aeiouy]+")), lit(1))
      .cast("long")
    struct(
      words.as("n_words"), sents.as("n_sents"), syll.as("n_syll"),
      round(lit(206.835)
        - lit(1.015) * (words.cast("double") / sents.cast("double"))
        - lit(84.6) * (syll.cast("double") / words.cast("double")), 6)
        .as("flesch"))
  }

  def fingerprintMd5(text: Column): Column = substring(md5(text), 1, 16)

  /** Seed for the rolling fingerprint (FNV offset basis, non-zero). */
  val rollingSeed: Long = 1469598103934665603L

  /** 64-bit rolling fingerprint over tokens: order-aware (unlike a
    * bag-of-words hash), the recurrence `acc' = xxhash64(acc, token)` —
    * a hash chain instead of `h*31+x`, so it cannot overflow under ANSI
    * mode and mixes bits better than a polynomial. Runs as the native
    * codegen'd [[graft.functions.TextHashExpressions.RollingXxHash64]];
    * [[fingerprintRollingHof]] is the interpreted higher-order spelling
    * it is bit-identical to (pinned by `TextHashExpressionsSpec`).
    */
  def fingerprintRolling(text: Column): Column =
    graft.functions.TextHashExpressions.rollingXxHash64(tokens(text), rollingSeed)

  /** Reference spelling of [[fingerprintRolling]] as a higher-order
    * aggregate — interpreted (CodegenFallback), kept for the equivalence
    * spec and as documentation of the semantics.
    */
  private[graft] def fingerprintRollingHof(text: Column): Column =
    aggregate(tokens(text), lit(rollingSeed), (acc, t) => xxhash64(acc, t))
}
