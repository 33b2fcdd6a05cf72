package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines:
  * tokenization, n-grams, quality scoring, language ID heuristics.
  *
  * The tokenizer mirrors the reference's: lowercase, strip punctuation,
  * split on whitespace (reference: docarray/document/mixins/text.py:104-114).
  * We normalize to `[a-z0-9]+` runs so the same definition is expressible
  * in ANSI SQL for the oracle.
  */
object TextFunctions {

  /** Canonical token list: lowercase alnum runs, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-style pre-tokenization (the GPT-2 pre-tokenizer pattern, minus
    * the trailing-whitespace lookahead so the identical regex runs under
    * DuckDB's RE2 for the oracle): contraction suffixes, space-prefixed
    * letter runs, digit runs, punctuation runs, whitespace runs. This is
    * the "how many BPE tokens would this cost" estimator a training-data
    * pipeline budgets with — a real BPE merges within these pieces, so
    * this counts pre-merge units. */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^ \\t\\n\\ra-zA-Z0-9]+|[ \\t\\n\\r]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Distinct token set (for Jaccard / vocabulary). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Word n-grams as space-joined strings (shingles for MinHash / Jaccard).
    * Empty array when the doc has fewer than n tokens. Single-pass native
    * expression — a `transform(sequence, i => element_at(tokens, i))`
    * composition would re-tokenize per element (HOF lambdas don't CSE
    * captured subexpressions). */
  def wordNgrams(text: Column, n: Int): Column =
    graft.functions.text_ngrams(text, n)

  /** Character n-grams over the normalized text (spaces collapsed),
    * single-pass native expression. */
  def charNgrams(text: Column, n: Int): Column =
    graft.functions.char_ngrams(text, n)

  /** Ratio of punctuation (non-alnum, non-space) chars to total chars. */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[a-zA-Z0-9 ]", "")).cast("double") / total)
  }

  /** Mean token length in characters (fused [[token_top_stats]] pass —
    * one compiled scan instead of an interpreted per-token fold;
    * value-identical to the old `aggregate(tokens, …)` HOF chain up to
    * the byte-tokenizer equivalence regime TokenTopStats documents). */
  def meanTokenLength(text: Column): Column = {
    val st = graft.functions.token_top_stats(text)
    when(st.getField("n") === 0, lit(0.0)).otherwise(
      st.getField("sum_len").cast("double") / st.getField("n"))
  }

  private val enStop = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "are", "was", "for", "on", "with", "as", "by", "at", "it", "this",
    "that", "be", "from")
  private val frStop = Seq("le", "la", "les", "de", "des", "du", "un", "une",
    "et", "ou", "est", "sont", "pour", "dans", "par", "sur", "avec", "ce",
    "que", "qui", "au", "aux")
  private val deStop = Seq("der", "die", "das", "und", "oder", "ist", "sind",
    "ein", "eine", "zu", "von", "mit", "auf", "für", "im", "den", "dem",
    "nicht", "sich", "auch")
  private val esStop = Seq("el", "la", "los", "las", "de", "del", "un", "una",
    "y", "o", "es", "son", "para", "en", "por", "con", "que", "se", "no", "al")

  /** Fraction of tokens that are (english, by default) stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = enStop): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0)).otherwise(
      size(filter(ts, t => t.isin(stopwords.map(lit): _*))).cast("double") / size(ts))
  }

  /** Syllable estimate for one lowercase token: vowel-group runs
    * ([aeiouy]+), floored at 1 — the standard readability heuristic
    * (identical under Java regex and RE2, so it replays). */
  def syllables(word: Column): Column =
    greatest(size(regexp_extract_all(word, lit("[aeiouy]+"), lit(0))),
      lit(1))

  /** Sentence count: maximal [.!?]+ runs, floored at 1 so fragment-only
    * docs don't divide by zero. */
  def sentenceCount(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))

  /** Flesch reading ease (Flesch 1948):
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words) — the
    * classic readability signal of corpus-quality batteries, computed
    * from three exact integer counts and one fixed-order float chain
    * (null for token-less docs). Gate the counts, round the score. */
  def fleschCounts(text: Column): Column = {
    val toks = tokens(text)
    struct(
      size(toks).as("n_words"),
      sentenceCount(text).as("n_sent"),
      aggregate(toks, lit(0),
        (acc, w) => acc + syllables(w)).as("n_syll"))
  }

  def fleschScore(nWords: Column, nSent: Column, nSyll: Column): Column =
    when(nWords > 0,
      lit(206.835) -
        lit(1.015) * (nWords.cast("double") / nSent.cast("double")) -
        lit(84.6) * (nSyll.cast("double") / nWords.cast("double")))
      .otherwise(lit(null).cast("double"))

  /** Heuristic document quality score in [0,1]: combines length band,
    * mean-token-length band, and low punctuation — the shape of the usual
    * pretraining-corpus quality filters. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 50.0, lit(1.0))
    val mtl = meanTokenLength(text)
    val mtlScore = when(mtl >= 3 && mtl <= 10, lit(1.0))
      .when(mtl === 0.0, lit(0.0)).otherwise(lit(0.5))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    round((lenScore + mtlScore + punctScore) / 3.0, 6)
  }

  // ---- repetition / format signals -----------------------------------
  // The Gopher/MassiveText-shape quality rules a pretraining pipeline
  // filters on (repetition, boilerplate markers), expressed as portable
  // array/HOF math so the DuckDB oracle replays them exactly. The
  // max-count formulas are O(distinct × total) per doc — array HOFs
  // don't CSE the captured token array — which is the right trade for
  // document-sized arrays (a per-doc hash map would mean a UDF).

  /** Fraction of token occurrences that repeat an earlier token:
    * 1 - distinct/total; 0 for empty docs. */
  def dupWordFrac(text: Column): Column = {
    val st = graft.functions.token_top_stats(text)
    when(st.getField("n") === 0, lit(0.0)).otherwise(
      lit(1.0) - st.getField("n_distinct").cast("double") /
        st.getField("n"))
  }

  /** Share of the doc taken by its single most frequent token.
    * Fused [[token_top_stats]] pass — the old
    * `array_max(transform(array_distinct(ts), w => size(filter(ts,
    * _ === w))))` was O(distinct × len) PER DOC in interpreted HOF
    * lambdas; the kernel counts in one compiled hash pass with the
    * identical result. */
  def topWordFrac(text: Column): Column = {
    val st = graft.functions.token_top_stats(text)
    when(st.getField("n") === 0, lit(0.0)).otherwise(
      st.getField("max_word").cast("double") / st.getField("n"))
  }

  /** Share of all word bigrams taken by the most frequent bigram
    * (fused pass, see [[topWordFrac]]). */
  def topBigramFrac(text: Column): Column = {
    val st = graft.functions.token_top_stats(text)
    when(st.getField("n_bigrams") === 0, lit(0.0)).otherwise(
      st.getField("max_bigram").cast("double") /
        st.getField("n_bigrams"))
  }

  private def lines(text: Column): Column =
    filter(split(text, "\n"), l => length(l) > 0)

  /** Fraction of non-empty lines that duplicate another line (fused
    * [[gopher_aux_stats]] pass — one compiled scan shared by the
    * whole line-rule family via codegen CSE). `stopwords` does not
    * change this value; pass the battery's list so every rule shares
    * ONE GopherAuxStats instance (CSE keys on the expression,
    * stopword list included — a mismatched list forces a second
    * line/word walk per row). */
  def dupLineFrac(text: Column, stopwords: Seq[String] = Nil): Column = {
    val st = graft.functions.gopher_aux_stats(text, stopwords)
    when(st.getField("n_lines") === 0, lit(0.0)).otherwise(
      lit(1.0) - st.getField("n_distinct_lines").cast("double") /
        st.getField("n_lines"))
  }

  /** Fraction of non-empty lines that start with a bullet marker
    * (stopwords: see [[dupLineFrac]]). */
  def bulletLineFrac(text: Column, stopwords: Seq[String] = Nil): Column = {
    val st = graft.functions.gopher_aux_stats(text, stopwords)
    when(st.getField("n_lines") === 0, lit(0.0)).otherwise(
      st.getField("n_bullet").cast("double") / st.getField("n_lines"))
  }

  /** Fraction of non-empty lines that trail off in an ellipsis
    * (stopwords: see [[dupLineFrac]]). */
  def ellipsisLineFrac(text: Column, stopwords: Seq[String] = Nil): Column = {
    val st = graft.functions.gopher_aux_stats(text, stopwords)
    when(st.getField("n_lines") === 0, lit(0.0)).otherwise(
      st.getField("n_ellipsis").cast("double") / st.getField("n_lines"))
  }

  /** Shannon entropy (nats) of the doc's unigram distribution —
    * a lexical-diversity quality signal (low = repetitive/templated).
    * The fold runs over the SORTED distinct tokens so the float
    * summation order is deterministic and an oracle replaying the same
    * sorted fold lands on the identical double. */
  def tokenEntropy(text: Column): Column = {
    val ts = tokens(text)
    val n = size(ts).cast("double")
    // 0.0 - sum, not -sum: a one-distinct-token doc sums to 0.0 and
    // unary negation would emit -0.0, whose sign survives DuckDB's round
    // but not Spark's BigDecimal round — a cross-engine parity trap
    when(size(ts) === 0, lit(0.0)).otherwise(
      lit(0.0) - aggregate(array_sort(array_distinct(ts)), lit(0.0), (acc, w) => {
        val p = size(filter(ts, t => t === w)).cast("double") / n
        acc + p * log(p)
      }))
  }

  /** Fraction of tokens containing at least one alphabetic character
    * (the Gopher "80% of words must contain an alphabetic char" rule;
    * under the alnum tokenizer a non-alpha token is a pure digit run). */
  def alphaWordFrac(text: Column, stopwords: Seq[String] = Nil): Column = {
    val st = graft.functions.token_top_stats(text)
    val aux = graft.functions.gopher_aux_stats(text, stopwords)
    when(st.getField("n") === 0, lit(0.0)).otherwise(
      aux.getField("n_alpha").cast("double") / st.getField("n"))
  }

  /** How many of `words` appear in the doc at least once (the Gopher
    * "must contain ≥2 of 8 required stopwords" rule). */
  def distinctStopwordCount(text: Column, words: Seq[String]): Column =
    graft.functions.gopher_aux_stats(text, words).getField("n_stop")

  /** Symbol marks (#, …) per token — boilerplate/markup density
    * (stopwords: see [[dupLineFrac]]). */
  def symbolWordRatio(text: Column, stopwords: Seq[String] = Nil): Column = {
    val st = graft.functions.token_top_stats(text)
    val aux = graft.functions.gopher_aux_stats(text, stopwords)
    when(st.getField("n") === 0, lit(0.0)).otherwise(
      aux.getField("n_symbol").cast("double") / st.getField("n"))
  }

  // ---- PII scrubbing ---------------------------------------------------
  // The pre-training scrub pass: find and mask emails / IPv4 literals.
  // Patterns are deliberately RE2-safe (no lookaround, no backrefs) so the
  // DuckDB oracle replays them byte-identically; counting is done with the
  // split-fencepost trick (split keeps boundary empties in both engines),
  // which keeps the whole thing codegen'd — no UDF, no regexp_count
  // portability question.

  private[graft] val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Number of non-overlapping matches of an RE2-safe pattern. */
  def matchCount(text: Column, pattern: String): Column =
    size(split(text, pattern, -1)) - 1

  def emailCount(text: Column): Column = matchCount(text, emailPattern)
  def ipv4Count(text: Column): Column = matchCount(text, ipv4Pattern)

  /** Mask emails then IPv4 literals (order matters and is part of the
    * contract — the oracle applies the same two passes). */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"),
      ipv4Pattern, "<IP>")

  // ---- unicode canonicalization ---------------------------------------

  /** The normalize-before-dedup pass for crawled text: NFC-canonicalize,
    * strip accents, lowercase, collapse runs of blank/newline whitespace
    * to one space, trim. Every step is engine-portable (the whitespace
    * class is spelled out — no `\s` semantics gap between regex engines). */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      lower(graft.functions.strip_accents(
        graft.functions.normalize_text(text, "NFC"))),
      "[ \\t\\n\\r]+", " "))

  // ---- html → text extraction ------------------------------------------

  /** HTML → text extraction for crawled corpora — the step upstream of
    * every C4-style cleaning battery. The contract is a fixed, engine-
    * portable pass order (RE2-safe: non-greedy dotall, inline flags, NO
    * lookaround, so the identical patterns run in DuckDB/Trino):
    * 1. drop `<script>`/`<style>` subtrees and `<!-- -->` comments;
    * 2. `<br>` and closing block tags become newlines;
    * 3. every remaining tag is stripped;
    * 4. the five XML entities + `&nbsp;` decode (`&amp;` LAST, so
    *    double-encoded text decodes one level, same both engines);
    * 5. blank runs collapse: tabs/spaces to one space, space-padded
    *    newline runs to one newline, then trim.
    * Numeric character references are left as-is — decoding them needs
    * per-engine code; callers who care apply [[cleanText]] after. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", ""),
      "(?is)<style[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", "")
    val breaks = regexp_replace(
      regexp_replace(noComment, "(?i)<br[^>]*>", "\n"),
      "(?i)</(p|div|h[1-6]|li|tr|ul|ol|table|blockquote)>", "\n")
    val noTags = regexp_replace(breaks, "(?s)<[^>]*>", "")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(decoded, "[ \\t]+", " "),
        " *\\n[ \\n]*", "\n"),
      "^\\n+|\\n+$", ""))
  }

  /** Stopword-profile language ID over {en, fr, de, es} with a CJK-character
    * shortcut for zh. Returns the language code with the highest stopword hit
    * ratio, 'und' when nothing matches. */
  def langId(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))
    val scores: Seq[(String, Column)] = Seq(
      "en" -> stopwordRatio(text, enStop),
      "fr" -> stopwordRatio(text, frStop),
      "de" -> stopwordRatio(text, deStop),
      "es" -> stopwordRatio(text, esStop))
    val best = scores.map { case (l, s) => struct(s.as("s"), lit(l).as("l")) }
      .reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    when(cjk > 0, lit("zh"))
      .when(best.getField("s") <= 0.0, lit("und"))
      .otherwise(best.getField("l"))
  }

  /** Unicode script composition of a text — exact per-class character
    * counts (struct latin/digit/cyrillic/greek/arabic/cjk/space/other/n),
    * the multilingual-corpus filter signal ("drop documents whose
    * declared language disagrees with their script", "split mixed-
    * script docs before langID"). Pure builtin Column ops: split to
    * characters, classify each by codepoint range (BMP contract:
    * astral characters land in `other`, and Spark's UTF-16 split
    * counts their two surrogates — document, don't hide), classes are
    * disjoint by construction so the struct sums to n. */
  def scriptCounts(text: Column): Column = {
    val chars = filter(split(coalesce(text, lit("")), ""), c => c =!= "")
    def inRange(c: Column, ranges: Seq[(Int, Int)]): Column =
      ranges.map { case (a, b) => ascii(c) >= a && ascii(c) <= b }
        .reduce(_ || _)
    val latin = Seq(0x41 -> 0x5A, 0x61 -> 0x7A, 0xC0 -> 0x24F)
    val digit = Seq(0x30 -> 0x39)
    val cyr = Seq(0x400 -> 0x4FF)
    val greek = Seq(0x370 -> 0x3FF)
    val arabic = Seq(0x600 -> 0x6FF)
    val cjk = Seq(0x3040 -> 0x30FF, 0x4E00 -> 0x9FFF, 0xAC00 -> 0xD7AF)
    val space = Seq(0x09 -> 0x0D, 0x20 -> 0x20)
    def cnt(ranges: Seq[(Int, Int)]): Column =
      size(filter(chars, c => inRange(c, ranges))).cast("long")
    val all = Seq("latin" -> latin, "digit" -> digit, "cyrillic" -> cyr,
      "greek" -> greek, "arabic" -> arabic, "cjk" -> cjk, "space" -> space)
    val counted = all.map { case (n, r) => cnt(r).as(n) }
    val n = size(chars).cast("long")
    val other = (n - all.map { case (_, r) => cnt(r) }.reduce(_ + _))
      .as("other")
    struct(counted :+ other :+ n.as("n"): _*)
  }
}
