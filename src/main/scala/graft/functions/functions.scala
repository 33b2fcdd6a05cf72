package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.plans.TopKByDistance

/** Public Column-level facade over graft's native Catalyst expressions.
  * Mirrors `org.apache.spark.sql.functions` style: import graft.functions._ */
package object functions {

  /** Cosine distance 1 - a·b/(|a||b|) between two float/double arrays. */
  def cosine_distance(a: Column, b: Column): Column =
    dist(a, b, "cosine")

  /** Squared euclidean distance. */
  def sqeuclidean_distance(a: Column, b: Column): Column =
    dist(a, b, "sqeuclidean")

  /** Euclidean (L2) distance. */
  def euclidean_distance(a: Column, b: Column): Column =
    dist(a, b, "euclidean")

  /** Negative inner product (ascending = most similar). */
  def inner_product_distance(a: Column, b: Column): Column =
    dist(a, b, "inner_product")

  def vector_distance(a: Column, b: Column, metric: String): Column =
    dist(a, b, metric)

  /** Distance over ml.linalg Vector columns (sparse-aware merge loops). */
  def ml_vector_distance(a: Column, b: Column, metric: String = "cosine"): Column =
    Bridge.column(
      MlVectorDistance(Bridge.expression(a), Bridge.expression(b), metric))

  /** L2-normalized copy of an embedding (array<double>). */
  def l2_normalize(a: Column): Column =
    Bridge.column(L2Normalize(Bridge.expression(a)))

  /** m nearest centroid ids of an array<double> vector against a
    * driver-resident centroid matrix — map-only IVF assignment. */
  def nearest_cells(a: Column, centroids: Seq[Seq[Double]],
      cellIds: Seq[Int], m: Int): Column =
    Bridge.column(NearestCells(Bridge.expression(a), centroids, cellIds, m))

  /** Cheap early-exit "tokenizes to ≥ n tokens" predicate under the
    * [[graft.functions.TextFunctions.tokens]] definition
    * (`split(lower(text), "[^a-z0-9]+")`) — the pushdown-safe stand-in
    * for `size(tokens(text)) >= n` that keeps a pushed filter from
    * re-running the full tokenize (guide §4.4, optimization r10). */
  def has_min_tokens(text: Column, n: Int): Column =
    Bridge.column(HasMinTokens(Bridge.expression(text), n, ascii = false))

  /** Same predicate under the fused byte-walk tokenizer of
    * `minhash_text` / `text_ngrams` (ASCII-only folding): true iff
    * `minhash_text(text, n, …)` would be non-sentinel /
    * `text_ngrams(text, n)` non-empty. */
  def has_min_tokens_bytes(text: Column, n: Int): Column =
    Bridge.column(HasMinTokens(Bridge.expression(text), n, ascii = true))

  /** Canonical URL dedup key (see [[graft.operators.Web.urlNormalize]])
    * in one fused byte walk — bit-identical to the declarative regex
    * composition, one pass instead of seven regex extracts. */
  def url_normalize(url: Column): Column =
    Bridge.column(UrlNormalize(Bridge.expression(url)))

  /** Sign-bit binary quantization: array<float|double> → array<long>
    * words, 32 dims per word (strictly-positive rule, 32-bit lanes). */
  def sign_pack_words(a: Column): Column =
    Bridge.column(SignPackWords(Bridge.expression(a)))

  /** Mean-centered sign packing: bit iff ppm(x)·n > threshQ(i), the
    * division-free integer "x > mean_i" test (threshQ = per-dim
    * Σ ppm(x) over the n-row corpus). */
  def sign_pack_words(a: Column, threshQ: Seq[Long], n: Long): Column =
    Bridge.column(SignPackWords(Bridge.expression(a), threshQ, n))

  /** Hamming distance between two sign_pack_words signatures:
    * Σ popcount(xor) over the common word prefix. */
  def hamming_words(a: Column, b: Column): Column =
    Bridge.column(HammingWords(Bridge.expression(a), Bridge.expression(b)))

  /** Bounded top-k aggregate: smallest-k (distance, payload) pairs per group,
    * map-side combined. Returns array<struct<distance, value>> ascending. */
  def topk_by_distance(distance: Column, payload: Column, k: Int): Column =
    Bridge.column(
      TopKByDistance(Bridge.expression(distance), Bridge.expression(payload), k)
        .toAggregateExpression())

  /** One-scan exact integer co-moment aggregate (n, Σx_i, Σx_i·x_j upper
    * triangle) over a pre-quantized `array<long>` vector — the distributed
    * stage of [[graft.operators.Pca]]. */
  def co_moments(vec: Column, dims: Int): Column =
    Bridge.column(
      CoMomentAgg(Bridge.expression(vec), dims).toAggregateExpression())

  /** Map-only affine projection onto driver-fitted loadings:
    * out_k = Σ_j components(k)(j)·(v_j − mean_j). */
  def project_vector(vec: Column, mean: Seq[Double],
      components: Seq[Seq[Double]]): Column =
    Bridge.column(ProjectVector(Bridge.expression(vec), mean, components))

  /** Non-overlapping occurrence counts of literal substring patterns
    * (replace-convention: advance past a match) — array<long> aligned
    * with `patterns`. */
  def substring_count_all(text: Column, patterns: Seq[String]): Column =
    Bridge.column(SubstringCountAll(Bridge.expression(text), patterns))

  /** Integer JL sign-projection of an already-quantized long vector onto a
    * driver-precomputed ±1 matrix: out_t = Σ_j signs(t)(j)·v_j, exact long
    * arithmetic in fixed order. */
  def sign_project_long(vec: Column, signs: Seq[Seq[Byte]]): Column =
    Bridge.column(SignProjectLong(Bridge.expression(vec), signs))

  /** KMV distinct estimate from the kth-minimum signed hash: exact integer
    * (k−1)·2^64 / unsigned(hash) floor division. */
  def kmv_estimate(h: Column, k: Int): Column =
    Bridge.column(KmvEstimate(Bridge.expression(h), k))

  /** One-shuffle bounded KMV sketch aggregate: the k smallest distinct
    * unsigned hashes per group as array<long> (ascending unsigned). */
  def kmv_sketch(h: Column, k: Int): Column =
    Bridge.column(
      KmvSketchAgg(Bridge.expression(h), k).toAggregateExpression())

  /** Deterministic FNV-1a 64-bit hash of a string. */
  def fnv64(c: Column, seed: Long = 0L): Column =
    Bridge.column(Fnv64Hash(Bridge.expression(c), seed))

  /** Longest-common-subsequence length of two token arrays (exact DP). */
  def lcs_length(a: Column, b: Column): Column =
    Bridge.column(LcsLength(Bridge.expression(a), Bridge.expression(b)))

  /** Dynamic-time-warping cost of two integer series (exact DP). */
  def dtw_distance(a: Column, b: Column): Column =
    Bridge.column(DtwDistance(Bridge.expression(a), Bridge.expression(b)))

  /** Highest-set-bit position of a long (0 for 0) — codegen'd clz. */
  def bit_length64(c: Column): Column =
    Bridge.column(BitLength64(Bridge.expression(c)))

  /** One-shuffle dense HyperLogLog register aggregate: array<int> of
    * 2^p registers per group, ≤ 2^p bytes per (partition, group). */
  def hll_sketch(hash: Column, p: Int): Column =
    Bridge.column(
      HllSketchAgg(Bridge.expression(hash), p).toAggregateExpression())

  /** splitmix64(key + seed): engine-portable deterministic rank over an
    * integral key — powers seeded sampling that an external SQL engine
    * can replicate bit-for-bit. */
  def splitmix64_rank(c: Column, seed: Long = 0L): Column =
    Bridge.column(Splitmix64Rank(Bridge.expression(c), seed))

  /** WordPiece greedy longest-match-first encode of an already
    * word-split array against a fixed vocab (`##` continuations; BERT
    * whole-word-UNK rule). */
  def wordpiece_encode(words: Column, vocab: Seq[String],
      unk: String = "[UNK]", maxWordLen: Int = 100): Column =
    Bridge.column(WordPieceEncode(Bridge.expression(words), vocab, unk,
      maxWordLen))

  /** 8-bit scalar-quantize an embedding to a binary code (one byte per
    * dimension) against a trained per-dim (min, delta) codebook. */
  def sq_encode(vec: Column, mins: Seq[Double], deltas: Seq[Double]): Column =
    Bridge.column(SqEncode(Bridge.expression(vec), mins, deltas))

  /** Product-quantization codes (one byte per subspace) against a trained
    * per-subspace codebook. */
  def pq_encode(vec: Column, subDim: Int,
      centroids: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), subDim, centroids))

  /** Map-only nearest-centroid cell id over a driver-collected centroid
    * table (ascending-cell tie-break, bit-identical to the join argmin —
    * see [[graft.operators.Ann.kmeansLloyd]]). */
  def nearest_centroid(vec: Column, cells: Seq[Int],
      centers: Seq[Seq[Double]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(vec), cells, centers))

  /** Unsigned byte view of a binary column as array<int> (0-255). */
  def bytes_to_ints(b: Column): Column =
    Bridge.column(BytesToInts(Bridge.expression(b)))

  /** MinHash signature (array<long>) of a token array. */
  def minhash_signature(tokens: Column, numHashes: Int, seed: Long = 42L): Column =
    Bridge.column(MinHashSignature(Bridge.expression(tokens), numHashes, seed))

  /** Fused one-pass MinHash over raw text (tokenize + shingle + hash,
    * no intermediate arrays) — identical output to
    * `minhash_signature(wordNgrams(text, n), numHashes, seed)`. */
  def minhash_text(text: Column, ngram: Int, numHashes: Int, seed: Long = 42L): Column =
    Bridge.column(MinHashText(Bridge.expression(text), ngram, numHashes, seed))

  /** Fused repetition-rule statistics: struct(n, n_distinct, sum_len,
    * max_word, n_bigrams, max_bigram) in one token pass. */
  def token_top_stats(text: Column): Column =
    Bridge.column(TokenTopStats(Bridge.expression(text)))

  /** LSH banding keys of a minhash signature (bit-identical to the
    * xxhash64-over-slices Column formulation, one compiled pass). */
  def band_hashes(sig: Column, bands: Int, rows: Int,
      seed: Long = 42L): Column =
    Bridge.column(BandHashes(Bridge.expression(sig), bands, rows, seed))

  /** Fused line/word-rule statistics: struct(n_lines, n_distinct_lines,
    * n_bullet, n_ellipsis, n_alpha, n_stop, n_symbol) in one pass. */
  def gopher_aux_stats(text: Column,
      stopwords: Seq[String] = Nil): Column =
    Bridge.column(GopherAuxStats(Bridge.expression(text), stopwords))

  /** One-pass word n-gram shingles of raw text (see TextNgrams). */
  def text_ngrams(text: Column, n: Int): Column =
    Bridge.column(TextNgrams(Bridge.expression(text), n))

  /** One-pass character n-grams of normalized text (see CharNgrams). */
  def char_ngrams(text: Column, n: Int): Column =
    Bridge.column(CharNgrams(Bridge.expression(text), n))

  /** 64-bit SimHash of a token array. */
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  /** Winnowing-style rolling-hash fingerprint of a string. */
  def rolling_fingerprint(text: Column, window: Int = 16): Column =
    Bridge.column(RollingFingerprint(Bridge.expression(text), window))

  /** Content-defined chunking on the same rolling hash (see CdcChunks). */
  def cdc_chunks(text: Column, window: Int = 16, maskBits: Int = 5,
      minLen: Int = 0, maxLen: Int = 0): Column =
    Bridge.column(CdcChunks(Bridge.expression(text), window, maskBits,
      minLen, maxLen))

  /** Random-hyperplane cosine-LSH signature (see CosineLsh). */
  def cosine_lsh(vec: Column, dim: Int, nPlanes: Int, seed: Long = 42L): Column =
    Bridge.column(CosineLsh(Bridge.expression(vec), dim, nPlanes, seed))

  /** Hashing-trick embedding of a token array (reference featurehash). */
  def feature_hash(tokens: Column, nDim: Int): Column =
    Bridge.column(FeatureHash(Bridge.expression(tokens), nDim))

  /** BPE tokens after applying a trained merge list (see operators.Bpe). */
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncode(Bridge.expression(text), merges))

  /** BPE token ids in `vocab` (−1 for out-of-vocab symbols). */
  def bpe_encode_ids(text: Column, merges: Seq[(String, String)],
      vocab: Seq[String]): Column =
    Bridge.column(BpeEncodeIds(Bridge.expression(text), merges, vocab))

  /** Unicode normalization (NFC/NFD/NFKC/NFKD) of a string column. */
  def normalize_text(c: Column, form: String = "NFC"): Column =
    Bridge.column(NormalizeText(Bridge.expression(c), form))

  /** Drop combining accents (NFD → strip marks → NFC), utf8proc-style. */
  def strip_accents(c: Column): Column =
    Bridge.column(StripAccents(Bridge.expression(c)))

  /** Jaro similarity over raw UTF-8 bytes (oracle-parity semantics). */
  def jaro_similarity(a: Column, b: Column): Column =
    Bridge.column(JaroSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Jaro–Winkler similarity (boost > 0.7, prefix cap 4, scaling 0.1). */
  def jaro_winkler_similarity(a: Column, b: Column): Column =
    Bridge.column(
      JaroWinklerSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** TRUE Damerau–Levenshtein distance (transpositions cost 1, edits
    * allowed between the transposed pair) over raw UTF-8 bytes. */
  def damerau_levenshtein(a: Column, b: Column): Column =
    Bridge.column(
      DamerauLevenshtein(Bridge.expression(a), Bridge.expression(b)))

  /** Redact Luhn-valid 13–19-digit runs with `[CARD]`. */
  def redact_cards(c: Column): Column =
    Bridge.column(RedactCards(Bridge.expression(c)))

  /** Classic Porter stem of a lowercase token. */
  def porter_stem(c: Column): Column =
    Bridge.column(PorterStem(Bridge.expression(c)))

  /** Min-cost unigram segmentation of one word (integer Viterbi). */
  def unigram_segment(word: Column, vocab: Seq[(String, Long)],
      unkCostMicro: Long = 50000000L): Column =
    Bridge.column(
      UnigramSegment(Bridge.expression(word), vocab, unkCostMicro))

  /** struct(n_runs, n_valid): candidate card runs and Luhn survivors. */
  def card_run_stats(c: Column): Column =
    Bridge.column(CardRunStats(Bridge.expression(c)))

  private def dist(a: Column, b: Column, metric: String): Column =
    Bridge.column(
      VectorDistance(Bridge.expression(a), Bridge.expression(b), metric))

  /** Register all graft functions for SQL use on a session. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => Bridge.registerFunction(spark, name, b) }

  /** Single source of truth for SQL-facing function builders (used both by
    * runtime registration here and GraftExtensions session injection). */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = {
    def litInt(e: Expression): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => other.eval().toString.toInt
    }
    Seq("cosine", "sqeuclidean", "euclidean", "inner_product").map { m =>
      s"${m}_distance" ->
        ((exprs: Seq[Expression]) => VectorDistance(exprs(0), exprs(1), m))
    } ++ Seq[(String, Seq[Expression] => Expression)](
      "l2_normalize" -> (exprs => L2Normalize(exprs(0))),
      "fnv64" -> (exprs => Fnv64Hash(exprs(0))),
      "simhash64" -> (exprs => SimHash64(exprs(0))),
      "text_ngrams" -> (exprs => TextNgrams(exprs(0), litInt(exprs(1)))),
      "feature_hash" -> (exprs => FeatureHash(exprs(0), litInt(exprs(1)))),
      "rolling_fingerprint" -> (exprs =>
        RollingFingerprint(exprs(0), litInt(exprs(1)))),
      "cosine_lsh" -> (exprs =>
        CosineLsh(exprs(0), litInt(exprs(1)), litInt(exprs(2)),
          if (exprs.length > 3) exprs(3).eval().toString.toLong else 42L)),
      "minhash_signature" -> (exprs =>
        MinHashSignature(exprs(0), litInt(exprs(1)),
          if (exprs.length > 2) exprs(2).eval().toString.toLong else 42L)),
      "minhash_text" -> (exprs =>
        MinHashText(exprs(0), litInt(exprs(1)), litInt(exprs(2)),
          if (exprs.length > 3) exprs(3).eval().toString.toLong else 42L)),
      "splitmix64_rank" -> (exprs =>
        Splitmix64Rank(exprs(0),
          if (exprs.length > 1) exprs(1).eval().toString.toLong else 0L)),
      "hilbert2" -> (exprs =>
        HilbertIndex2(exprs(0), exprs(1), litInt(exprs(2)))),
      "bytes_to_ints" -> (exprs => BytesToInts(exprs(0))),
      "normalize_text" -> (exprs =>
        NormalizeText(exprs(0),
          if (exprs.length > 1) exprs(1).eval().toString else "NFC")),
      "strip_accents" -> (exprs => StripAccents(exprs(0))),
      "topk_by_distance" -> (exprs =>
        TopKByDistance(exprs(0), exprs(1), litInt(exprs(2)))),
      "lcs_length" -> (exprs => LcsLength(exprs(0), exprs(1))),
      "dtw_distance" -> (exprs => DtwDistance(exprs(0), exprs(1))),
      "jaro_similarity" -> (exprs => JaroSimilarity(exprs(0), exprs(1))),
      "redact_cards" -> (exprs => RedactCards(exprs(0))),
      "card_run_stats" -> (exprs => CardRunStats(exprs(0))),
      "jaro_winkler_similarity" -> (exprs =>
        JaroWinklerSimilarity(exprs(0), exprs(1))),
      "damerau_levenshtein" -> (exprs =>
        DamerauLevenshtein(exprs(0), exprs(1))),
      "porter_stem" -> (exprs => PorterStem(exprs(0))),
      "bit_length64" -> (exprs => BitLength64(exprs(0))),
      "hll_sketch" -> (exprs =>
        HllSketchAgg(exprs(0), litInt(exprs(1))).toAggregateExpression()),
      "kmv_estimate" -> (exprs => KmvEstimate(exprs(0), litInt(exprs(1)))),
      "kmv_sketch" -> (exprs =>
        KmvSketchAgg(exprs(0), litInt(exprs(1))).toAggregateExpression()),
      "co_moments" -> (exprs =>
        CoMomentAgg(exprs(0), litInt(exprs(1))).toAggregateExpression()),
      "sign_pack_words" -> (exprs => SignPackWords(exprs(0))),
      "hamming_words" -> (exprs => HammingWords(exprs(0), exprs(1))))
  }
}
