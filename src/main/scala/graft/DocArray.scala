package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.schema.DocSchema

/** Reference-shaped facade: the `DocumentArray` API surface
  * (reference: docarray/array/document.py:19 and its ~20 mixins), with each
  * method delegating to the corresponding graft operator. A user of the
  * reference can port call sites almost 1:1; everything stays a lazy
  * DataFrame plan until an action.
  *
  * {{{
  *   val da = DocArray.fromParquet(spark, "s3://corpus/docs")
  *   da.find("""{"tags__lang": "en"}""")                 // filter QL
  *     .find(queries, k = 10)                            // knn
  *     .df.show()
  *   da.matchWith(other, k = 5)                          // da.match(other)
  *   da.reduce(other).sample(1000, seed = 1).df          // merge + sample
  * }}}
  */
final case class DocArray(df: DataFrame, idCol: String = "id") {

  private def wrap(d: DataFrame): DocArray = copy(df = d)

  // ---- find (§2.3 / §2.4: filter, vector, text) ----------------------

  /** find(filter_dict): MongoDB-style boolean filter. */
  def find(filterJson: String): DocArray = wrap(Filters.where(df, filterJson))

  /** find(query_vectors): brute-force knn against this array. */
  def find(queries: DataFrame, k: Int, metric: String = "cosine",
      vecCol: String = "embedding", excludeSelf: Boolean = false): DataFrame =
    Knn.bruteForce(df, queries, k, metric,
      docId = idCol, docVec = vecCol, queryId = idCol, queryVec = vecCol,
      excludeSelf = excludeSelf)

  /** find(text_query): BM25 full-text relevance. */
  def findText(query: String, textCol: String = "text"): DataFrame =
    TextSearch.bm25(df, idCol, textCol, query)

  /** find(text_query) over Porter stems — inflection-robust BM25
    * ("querying tables" matches docs saying "query"/"table"). */
  def findTextStemmed(query: String, textCol: String = "text"): DataFrame =
    TextSearch.bm25Stemmed(df, idCol, textCol, query)

  /** Per-doc TF-IDF keyword profile (top-k terms by smooth-idf weight). */
  def tfidfTopTerms(topK: Int, textCol: String = "text"): DataFrame =
    TextSearch.tfidfTopTerms(df, idCol, textCol, topK)

  /** Canonicalize a URI column in place (lowercase scheme/host, default
    * ports and tracking params dropped, sorted query) — the
    * normalize-before-dedup key for web corpora. */
  def canonicalizeUris(uriCol: String = "uri",
      dropPrefixes: Seq[String] = Seq("utm_")): DocArray =
    wrap(df.withColumn(uriCol,
      graft.functions.UrlFunctions.urlCanonicalize(col(uriCol), dropPrefixes)))

  /** Hybrid find: BM25 + cosine-knn fused by reciprocal rank (RRF). The
    * vector side ranks `vectors` (an embedding table sharing this array's
    * id space — pass this array itself for self-contained corpora). */
  def findHybrid(queryText: String, queryVec: Array[Double], k: Int,
      vectors: DocArray, textCol: String = "text",
      vecCol: String = "embedding", depth: Int = 50): DataFrame =
    TextSearch.hybridRrf(df, idCol, textCol, vectors.df, vectors.idCol,
      vecCol, queryText, queryVec, k, depth)

  /** Normalize text in place: NFC, accents stripped, lowercased,
    * whitespace collapsed — the canonical form content dedup keys on. */
  def cleanText(textCol: String = "text"): DocArray =
    wrap(df.withColumn(textCol,
      graft.functions.TextFunctions.cleanText(col(textCol))))

  /** Per-doc duplicated-span coverage (fraction of tokens inside n-token
    * runs shared with other docs) — the substring-dedup signal. */
  def dupSpans(n: Int, textCol: String = "text"): DataFrame =
    Dedup.dupSpanCoverage(df, idCol, textCol, n)

  /** Shift-robust duplicated-content stats via content-defined chunking
    * (rsync/LBFS boundaries — survives insertions that break fixed or
    * line blocking): per doc, its chunk count and how many chunks recur
    * in other docs. */
  def cdcSharedChunks(window: Int = 16, maskBits: Int = 5,
      textCol: String = "text"): DataFrame =
    Dedup.cdcSharedChunks(df, idCol, textCol, window, maskBits)

  /** Rows of this array whose `key` is absent from `corpus` — incremental
    * ingest dedup, Bloom-prefiltered but exact. */
  def newAgainst(corpus: DocArray, key: Column): DocArray =
    wrap(Dedup.newAgainstCorpusBloom(df, corpus.df, key, key))

  /** Fold this array (a NEW batch) and its near-dup `newPairs` into an
    * existing persisted (id, cluster_id) `assignment` — re-resolving
    * only the touched components, identical to a full recompute (see
    * [[graft.operators.Dedup.clustersIncremental]]). */
  def foldIntoClusters(assignment: DataFrame,
      newPairs: DataFrame): DataFrame =
    Dedup.clustersIncremental(assignment, newPairs,
      df.select(col(idCol)), idCol)

  /** SemDeDup: drop semantic near-duplicates (cosine distance below
    * `threshold` inside learned embedding clusters), keeping the
    * best-`score` copy of each duplicate group. */
  def semanticDedup(threshold: Double, nCells: Int, score: Column,
      vecCol: String = "embedding"): DocArray =
    wrap(Dedup.semanticDedup(df, idCol, vecCol, threshold, nCells, score))

  /** Cluster the corpus by embedding with fully distributed Lloyd
    * k-means (every row participates in every update — the cluster-side
    * complement of the sampled IVF quantizer fit): adds an integer
    * `_cell` column; deterministic and layout-invariant. For domain
    * discovery, cluster-balanced mixing quotas, SemDeDup blocking. */
  def kmeans(k: Int, iters: Int = 5, seed: Long = 42L,
      vecCol: String = "embedding"): DocArray =
    wrap(Ann.kmeansLloyd(df, idCol, vecCol, k, iters, seed).assigned)

  /** Fit an exact PCA basis over the embedding column (one integer
    * co-moment scan + a deterministic driver-side Jacobi eigensolve) and
    * project every doc onto it — a map-only codegen stage, no shuffle.
    * The usual front end of [[semanticDedup]]/[[kmeans]] at scale. */
  def pca(outDim: Int, outCol: String = "pca",
      vecCol: String = "embedding"): DocArray = {
    val (_, out) = Pca.fitTransform(df, vecCol, outDim, outCol)
    wrap(out)
  }

  /** Distinct-cardinality estimate per group (vocabulary size, unique
    * URLs/n-grams) via a mergeable bottom-k KMV sketch — bounded memory
    * at any scale, deterministic, engine-replayable. */
  def distinctEstimate(key: Column, groupCols: Seq[String],
      k: Int = 1024, seed: Long = 0L): DataFrame =
    Sketch.kmvDistinctStrings(df, groupCols, key, k, seed)

  /** Distinct-cardinality estimate per group via fixed-size HyperLogLog
    * registers (2^p bytes per group regardless of cardinality — the
    * smaller-state alternative to [[distinctEstimate]]'s KMV; KMV also
    * supports Jaccard/overlap, HLL merges cheaper). */
  def distinctEstimateHll(key: Column, groupCols: Seq[String],
      p: Int = 12, seed: Long = 0L): DataFrame =
    Sketch.hllDistinctStrings(df, groupCols, key, p, seed)

  /** Frequency estimates for `probes` from a count-min sketch of `key`
    * occurrences — "how often does x occur" at corpus scale without a
    * full distinct-key aggregation shuffle; never undercounts. */
  def frequencyEstimate(key: Column, probes: DataFrame, probeCol: String,
      depth: Int = 4, width: Int = 4096, seed: Long = 0L): DataFrame =
    Sketch.cmEstimate(Sketch.cmSketch(df, key, depth, width, seed),
      probes, probeCol, depth, width, seed)

  /** Per-group quantiles of a non-negative integer measure (doc length,
    * token count, byte size) from a mergeable log-scale histogram —
    * ≤ 1/16 relative bin width, exact integer selection. */
  def quantiles(value: Column, groupCols: Seq[String],
      qs: Seq[(Int, Int)] = Seq((1, 2), (9, 10), (99, 100))): DataFrame =
    Sketch.histQuantiles(
      Sketch.logHistogram(df, groupCols, value), groupCols, qs)

  /** Sentence BLEU-N of a candidate vs reference text column per row —
    * exact clipped n-gram integers, standard zero rule. */
  def bleu(candCol: Column, refCol: Column, maxN: Int = 4): DataFrame =
    Evaluate.bleu(df, idCol, graft.functions.TextFunctions.tokens(candCol),
      graft.functions.TextFunctions.tokens(refCol), maxN)

  /** ROUGE-L (β=1) of a candidate vs reference text column per row —
    * exact-integer LCS kernel, map-only. */
  def rougeL(candCol: Column, refCol: Column): DataFrame =
    Evaluate.rougeL(df, idCol, graft.functions.TextFunctions.tokens(candCol),
      graft.functions.TextFunctions.tokens(refCol))

  /** Jensen–Shannon divergence of the unigram distributions between
    * every pair of corpus slices — the drift/domain-shift monitor. */
  def corpusDrift(groupCol: String, textCol: String = "text"): DataFrame =
    LangModel.jsDivergencePairs(df, groupCol, col(textCol))

  /** Train a BPE tokenizer on this corpus (distributed count pass +
    * deterministic merge fit). */
  def trainBpe(numMerges: Int, textCol: String = "text"): Seq[(String, String)] =
    Bpe.train(df, col(textCol), numMerges)

  /** Tokenize with a trained BPE merge list into a `bpe_tokens` column. */
  def tokenizeBpe(merges: Seq[(String, String)],
      textCol: String = "text"): DocArray =
    wrap(df.withColumn("bpe_tokens", Bpe.encode(col(textCol), merges)))

  /** Keep each doc with probability `weight` (deterministic, seeded). */
  def sampleWeighted(weight: Column, seed: Long): DocArray =
    wrap(GroupOps.sampleWeighted(df, weight, seed, col(idCol)))

  /** Exact-quota class rebalancing: every `group` to exactly `quota`
    * rows — deterministic oversample-with-replacement below quota,
    * first-draws downsample above it; adds a `rep` copy index. */
  def rebalanceClasses(quota: Int, seed: Long, group: Column): DocArray =
    wrap(GroupOps.rebalanceToQuota(df, quota, seed, group, col(idCol)))

  /** Winnowing (MOSS) shared-fingerprint near-dup pairs: local-match
    * detection with the w+k−1 guarantee — code clones, quotes. */
  def winnowNearDupPairs(k: Int = 8, w: Int = 4, minShared: Int = 2,
      textCol: String = "text"): DataFrame =
    Dedup.winnowPairs(df, idCol, textCol, k, w, minShared)

  /** Edit-distance-verified near-dup pairs: minhash banding candidates,
    * Levenshtein verify at an integer percentage ratio. */
  def fuzzyDedupPairs(maxRatioPct: Int = 10,
      textCol: String = "text"): DataFrame =
    Dedup.editDistancePairs(df, idCol, textCol, maxRatioPct)

  /** Moore–Lewis contrastive selection: score every doc by general-vs-
    * in-domain unigram NLL difference; `keep` marks in-domain-like docs. */
  def selectLikeDomain(inDomain: Column,
      textCol: String = "text"): DataFrame =
    LangModel.mooreLewisScore(df, idCol, col(textCol), inDomain)

  /** MMR diverse top-k: fetch the most-similar `fetchK`, greedily keep
    * `k` balancing relevance against redundancy — the RAG diversity
    * re-ranker. */
  def findDiverse(queries: DataFrame, k: Int, fetchK: Int,
      lambda: Double = 0.75, vecCol: String = "embedding",
      queryIdCol: String = "id", queryVecCol: String = "embedding"): DataFrame =
    Knn.mmrSelect(df, queries, k, fetchK, lambda,
      docId = idCol, docVec = vecCol,
      queryId = queryIdCol, queryVec = queryVecCol)

  /** Zipf-law slope per corpus slice — the corpus-health diagnostic
    * (natural text ≈ −1; templated/synthetic sources drift off). */
  def zipfSlopes(groupCol: String, textCol: String = "text"): DataFrame =
    LangModel.zipfFit(df, groupCol, col(textCol))

  /** Exact Pearson correlation matrix over named per-doc signals — the
    * feature audit before trusting a quality score. */
  def signalCorrelations(signals: (String, Column)*): DataFrame =
    Pca.correlationPairs(df, signals)

  /** Z-score standardize scalar signal columns (exact integer
    * numerators; adds `znum_<name>` / `z_<name>_r`). */
  def standardized(signals: (String, Column)*): DocArray =
    wrap(GroupOps.standardize(df, signals))

  /** Label every doc train/val/test (or any named fractions summing to
    * 1) by its seeded hash draw — deterministic, layout-invariant,
    * zero-shuffle; the label column doubles as a write partition key. */
  def withSplits(seed: Long, fractions: (String, Double)*): DocArray =
    wrap(GroupOps.splitHashed(df, col(idCol), seed, fractions))

  /** Write as parquet clustered on the z-curve of `cols` — multi-column
    * min/max pruning for any stats-aware reader. */
  def saveZOrdered(path: String, nFiles: Int, bits: Int,
      cols: String*): Unit =
    ZOrder.writeZOrdered(df, path, nFiles, bits, cols: _*)

  /** post(cmd): ship the array through an external executor process
    * speaking the DocBin wire protocol and wrap the transformed array —
    * the reference's Flow post at the process boundary (reference:
    * array/mixins/post.py:47-118). */
  def post(command: Seq[String], batchSize: Int = 512,
      env: Map[String, String] = Map.empty): DocArray =
    wrap(graft.sources.PostPipe.post(df, command, batchSize, env))

  /** push(name): publish this array as an immutable versioned artifact
    * under a registry root — the reference's cloud push realized over any
    * Hadoop filesystem (reference: array/mixins/io/pushpull.py:52-103). */
  def push(registryRoot: String, name: String,
      fieldResolver: Map[String, String] = Map.empty): graft.sources.Registry.Artifact =
    graft.sources.Registry.push(df, registryRoot, name, fieldResolver)

  /** Train a target-domain quality discriminator (GPT-3/CCNet-style
    * linear classifier over hashed n-gram features). */
  def fitQualityClassifier(target: DocArray, dim: Int = 4096,
      textCol: String = "text"): QualityClassifier.Model =
    QualityClassifier.fit(df, target.df, col(textCol), dim)

  /** Keep each doc with probability `score^alpha` under a fitted
    * quality model (deterministic splitmix draw). */
  def filterByQuality(model: QualityClassifier.Model, alpha: Double = 1.0,
      textCol: String = "text"): DocArray =
    wrap(QualityClassifier.filterByScore(df, col(textCol), model,
      col(idCol), alpha))

  /** Hard-triplet mining over a label column: per doc, its nearest
    * same-label and nearest other-label neighbor (metric-learning
    * batch construction). */
  def mineTriplets(labelCol: String, kCand: Int = 128,
      metric: String = "cosine", vecCol: String = "embedding"): DataFrame =
    Knn.tripletMine(df, idCol, vecCol, labelCol, metric, kCand)

  /** C4 line-level cleaning (Raffel et al. 2020 §2.2): terminal-punct /
    * min-words / javascript line rules + lorem-ipsum / brace / min-kept
    * doc rules; adds n_lines, n_kept, keep, kept_text. Map-only. */
  def c4Clean(textCol: String = "text", minWordsPerLine: Int = 5,
      minKeptLines: Int = 3): DocArray =
    wrap(Quality.c4Clean(df, col(textCol), minWordsPerLine, minKeptLines))

  /** Gopher/MassiveText quality rule battery (Rae et al. 2021 Table A1)
    * at the published default thresholds: adds one ok_* boolean per rule
    * plus their conjunction `keep`. Map-only. */
  def gopherQuality(textCol: String = "text"): DocArray =
    wrap(Quality.gopherQuality(df, col(textCol)))

  /** Deflate compression-ratio signal (the zlib repetitiveness test):
    * adds raw_bytes, deflate_bytes, ratio_ppm — low = boilerplate/
    * repetition, high = noise/binary-ish. Map-only codec pass; byte
    * lengths exact per zlib build, not pinned across builds. */
  def compressionSignals(textCol: String = "text"): DocArray =
    wrap(Quality.compressionSignals(df, col(textCol)))

  /** PMI collocation mining over the corpus: top-`k` bigrams by exact
    * integer independence lift (see LangModel.collocations). */
  def collocations(k: Int = 50, minCount: Long = 5,
      textCol: String = "text"): DataFrame =
    LangModel.collocations(df, col(textCol), minCount, k)

  /** knn majority-vote pseudo-labeling: classify every doc of THIS array
    * by its k nearest neighbors in `labeled` (ties → smallest label).
    * Returns (query_id, label, votes). */
  def classifyWith(labeled: DocArray, k: Int, metric: String = "cosine",
      labelCol: String = "label", vecCol: String = "embedding"): DataFrame =
    Knn.classify(labeled.df, df, k, metric, labelCol,
      docId = labeled.idCol, docVec = vecCol,
      queryId = idCol, queryVec = vecCol)

  /** kth-NN distance outlier scores over the embedding column —
    * far-from-everything rows are the drop candidates. */
  def outlierScores(k: Int = 10, metric: String = "cosine",
      vecCol: String = "embedding"): DataFrame =
    Knn.outlierScores(df, k, metric, idCol, vecCol)

  /** Reciprocal-kNN near-dup pairs over the embedding column: exact
    * self-knn + the mutuality filter (one-directional hub hits die).
    * Returns (a, b, rank_ab, rank_ba, distance), a < b. */
  def mutualNearDupPairs(k: Int = 10, metric: String = "cosine",
      vecCol: String = "embedding"): DataFrame =
    Knn.mutualPairsFromHits(Knn.bruteForce(df, df, k, metric,
      docId = idCol, docVec = vecCol, queryId = idCol, queryVec = vecCol,
      excludeSelf = true))

  /** Word-order-insensitive duplicate groups: exact dedup on the sorted
    * token multiset (reordered copies collapse; repeat-count changes
    * don't). Returns (bag_fp, keep_id, n_copies). */
  def bagDedup(textCol: String = "text"): DataFrame =
    Dedup.bagDedup(df, idCol, textCol)

  /** Exact phrase search (the quoted query): every occurrence of the
    * phrase's token sequence at consecutive positions — (id, pos). */
  def findPhrase(phrase: String, textCol: String = "text"): DataFrame =
    TextSearch.phrasePositions(df, idCol, textCol, phrase)

  /** Proximity search: co-occurrences of two terms within `window`
    * token positions — (id, pos_a, pos_b). */
  def findNear(termA: String, termB: String, window: Int,
      textCol: String = "text"): DataFrame =
    TextSearch.proximityPairs(df, idCol, textCol, termA, termB, window)

  /** k-anonymity / l-diversity privacy profile over quasi-identifier
    * columns — the release gate before data leaves a tenant boundary. */
  def kAnonymityProfile(qiCols: Seq[String], k: Long,
      sensitiveCol: Option[String] = None): DataFrame =
    Quality.kAnonymityGroups(df, qiCols, k, sensitiveCol)

  /** Per-group tie-aware percentile ranks — normalize heterogeneous
    * per-source scores into comparable [0, 1e6] percentiles. */
  def percentileRank(groupCols: Seq[String], value: Column): DataFrame =
    GroupOps.percentileRank(df, groupCols, value)

  /** Two-slice location drift: exact tie-corrected Mann–Whitney U of
    * `value` between the rows matching `slice` and the rest. */
  def rankSumDrift(slice: Column, value: Column): DataFrame =
    Evaluate.mannWhitneyU(df.where(slice), df.where(!slice), value)

  /** k-slice location drift: exact tie-corrected Kruskal–Wallis H of
    * `value` across the groups of `group`. */
  def rankDriftByGroup(group: Column, value: Column): DataFrame =
    Evaluate.kruskalWallis(df, group, value)

  /** Chance-corrected agreement (Cohen's kappa) between two categorical
    * columns — classifier-vs-gold or annotator-pair QA. */
  def agreement(a: Column, b: Column): DataFrame =
    Evaluate.cohensKappa(df, a, b)

  /** Paired-filter disagreement (McNemar): does filter `b` keep what
    * filter `a` drops beyond symmetric noise? */
  def filterDisagreement(a: Column, b: Column): DataFrame =
    Evaluate.mcnemar(df, a, b)

  /** Per-group concentration (exact Gini) of `weight` over `item` —
    * token-mass, bytes-per-domain, docs-per-cluster. */
  def concentration(groupCols: Seq[String], item: Column,
      weight: Column): DataFrame =
    Evaluate.giniByGroup(df, groupCols, item, weight)

  /** Exact-k weighted sampling without replacement (inclusion odds ∝
    * weight; deterministic, layout-invariant, engine-replayable). */
  def sampleByWeight(k: Int, weight: Column, seed: Long): DocArray =
    wrap(GroupOps.sampleWeightedK(df, k, weight, seed, col(idCol))
      .drop("es_ppb"))

  /** SVD-PPMI word vectors trained on this corpus's co-occurrence
    * statistics (deterministic word2vec-equivalent geometry). */
  def wordVectors(window: Int = 3, dim: Int = 32, minCount: Long = 5L,
      textCol: String = "text"): DataFrame =
    LangModel.wordVectors(df, idCol, col(textCol), window, dim, minCount)

  /** Grid-blocked DBSCAN over a 2-D projection of the corpus (PCA the
    * embeddings to 2-D first, or pass any two numeric columns):
    * (id, kind core|border|noise, cluster_id). */
  def dbscan(xCol: String, yCol: String, eps: Double,
      minPts: Int): DataFrame =
    Density.dbscan2d(df, idCol, xCol, yCol, eps, minPts)

  /** Pairwise cosine similarity between per-group embedding centroids
    * — which sources/domains are interchangeable in embedding space. */
  def domainSimilarity(group: String,
      vecCol: String = "embedding"): DataFrame =
    GroupOps.centroidPairs(df, group, col(vecCol))

  /** Split-conformal threshold + coverage for an integer-valued
    * nonconformity score against a calibration slice. */
  def conformalWith(calib: DocArray, score: Column,
      alphaNum: Long, alphaDen: Long): DataFrame =
    Evaluate.conformal(calib.df, df, score, alphaNum, alphaDen)

  /** Greedy k-center coreset over the embedding column: the diverse
    * prototype subset (selection order, id, distance when chosen). */
  def coreset(k: Int, vecCol: String = "embedding"): DataFrame =
    Ann.kCenter(df, idCol, vecCol, k)

  /** Fixed-point PLSA topic model over the text column: deterministic
    * integer EM — (theta, phi) ppm tables for topic-balanced mixing
    * and corpus-diversity audits. */
  def topicModel(k: Int, iters: Int = 2,
      textCol: String = "text"): Plsa.Model =
    Plsa.fit(df
        .select(col(idCol).as("d"),
          explode(split(col(textCol), " ")).as("w"))
        .where(length(col("w")) > 0)
        .groupBy("d", "w")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("c")),
      "d", "w", "c", k, iters)

  /** Exact verified heavy hitters of the token stream: every token
    * with count·k > N, found without a full-vocabulary shuffle. */
  def heavyTokens(k: Int, textCol: String = "text"): DataFrame =
    Sketch.heavyHitters(df
        .select(explode(split(col(textCol), " ")).as("w"))
        .where(length(col("w")) > 0),
      col("w"), k)

  /** Adamic–Adar link prediction over a pair table (near-dup edges,
    * co-click edges, …): (a, b, cn, aa_ppb) for node pairs at
    * distance 2, rare shared neighbors weighted up. */
  def linkPredict(pairs: DataFrame,
      maxDegree: Long = Long.MaxValue): DataFrame =
    Graph.adamicAdar(pairs, maxDegree = maxDegree)

  /** k-core of a pair graph: `rounds` peels of degree < k — the dense
    * substructure that survives (node, degree). */
  def kCoreOf(pairs: DataFrame, k: Int, rounds: Int): DataFrame =
    Graph.kCore(pairs, k, rounds)

  /** Poisson-bootstrap standard error of the mean of an integer-valued
    * (pre-quantized) signal: one row (b_used, grand_mean, se_boot). */
  def bootstrapSe(value: Column, reps: Int = 32,
      seed: Long = 0L): DataFrame =
    Evaluate.bootstrapSe(
      Evaluate.poissonBootstrap(df, col(idCol), value, reps, seed))

  /** RAKE corpus keywords: candidate phrases between stopword
    * delimiters scored by summed member deg/freq — (phrase, n_occ,
    * score_ppm). */
  def keywords(stopwords: Seq[String],
      textCol: String = "text"): DataFrame =
    TextSearch.rakeKeywords(df, idCol, textCol, stopwords)

  /** Quantile-normalize a per-group score onto the pooled
    * distribution (exact midrank percentile → pooled order statistic);
    * adds (d_rank, pct_ppm, qn_value). */
  def normalizeQuantiles(groupCols: Seq[String],
      value: Column): DataFrame =
    GroupOps.quantileNormalize(df, groupCols, value)

  /** Kaplan–Meier survival curves per group: duration + 0/1 event
    * (0 = censored) → (t, n_risk, d, c, surv). */
  def survivalCurve(groupCols: Seq[String], duration: Column,
      event: Column): DataFrame =
    Evaluate.kaplanMeier(df, groupCols, duration, event)

  /** Min hop distance from a seed id set through a pair graph, up to
    * maxHops (absent = unreached). */
  def seedDistances(pairs: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame =
    Graph.bfsDistances(pairs, seeds, idCol, maxHops)

  /** Exact 1-D Wasserstein drift of an integer measure vs another
    * array — the total-transport complement of the KS max-gap. */
  def driftW1(other: DocArray, value: Column): DataFrame =
    Evaluate.w1Test2(df, other.df, value)

  /** Do the two survival curves differ — two-group log-rank z over
    * right-censored durations (the [[survivalCurve]] significance
    * companion). */
  def survivalSignificance(duration: Column, event: Column,
      inA: Column): DataFrame =
    Evaluate.logRank(df, Nil, duration, event, inA)

  /** Does `value` trend monotonically across the ORDERED groups of
    * `groupOrder` — Jonckheere–Terpstra z (the ordered-group
    * Mann-Kendall). */
  def trendAcrossGroups(groupOrder: Column, value: Column): DataFrame =
    Evaluate.jonckheere(df, groupOrder, value)

  /** How much does one categorical column tell you about another —
    * mutual information + NMI (the metadata→label leakage probe). */
  def dependence(x: Column, y: Column): DataFrame =
    Evaluate.mutualInfo(df, x, y)

  /** k nearest other-array points within `radiusKm` great-circle km of
    * each of this array's (lat, lon) points — the geo `find`.
    * `otherLatCol`/`otherLonCol` name the right side's coordinate
    * columns when they differ from this array's (default: same names). */
  def geoNearest(other: DocArray, latCol: String, lonCol: String,
      radiusKm: Double, k: Int,
      otherLatCol: String = null, otherLonCol: String = null): DataFrame =
    Geo.nearestWithin(df, other.df, idCol, latCol, lonCol,
      other.idCol,
      Option(otherLatCol).getOrElse(latCol),
      Option(otherLonCol).getOrElse(lonCol), radiusKm, k)

  /** What did the corpus refresh actually do — per-id
    * added/removed/changed/unchanged vs a previous snapshot, by
    * content hash of `contentCol`. */
  def snapshotDiff(previous: DocArray, contentCol: Column): DataFrame =
    Dedup.snapshotDiff(previous.df, df, idCol, contentCol)

  /** Unicode script composition of every document's text — the
    * mixed-script / declared-language-disagrees filter signal. */
  def scriptComposition(textCol: String = "text"): DataFrame =
    df.withColumn("scripts",
      graft.functions.TextFunctions.scriptCounts(col(textCol)))

  /** Top terms per cluster by c-TF-IDF — label what each cluster of
    * documents is ABOUT (the BERTopic topic-word step). */
  def clusterTerms(cluster: Column, topK: Int,
      textCol: String = "text"): DataFrame =
    TextSearch.clusterTerms(df, cluster, col(textCol), topK)

  /** Per-document robust outlier score of `value` within `groupCols`
    * — (v − median)/(1.4826·MAD), heavy-tail safe. */
  def robustScores(groupCols: Seq[String], value: Column): DataFrame =
    GroupOps.robustZ(df, groupCols, idCol, value)

  /** Pre-promotion data-contract report: named row rules (NULL =
    * violation) in one pass. */
  def expect(rules: (String, Column)*): DataFrame =
    Quality.expectRows(df, rules)

  /** PSI drift of a [0,1] score distribution vs another array
    * (per-bin ppb contributions; total = Σ psi_ppb / 1e9). */
  def driftPsi(other: DocArray, score: Column,
      nBins: Int = 10): DataFrame =
    Evaluate.psiBins(df, other.df, score, nBins)

  /** Expected calibration error of a [0,1] score against a boolean
    * outcome (exact integer numerator). */
  def calibrationError(score: Column, positive: Column,
      nBins: Int = 10): DataFrame =
    Evaluate.ece(df, score, positive, nBins)

  /** C4's bad-words rule: adds `keep` = no token on the blocklist.
    * Map-only broadcast-literal containment check. */
  def blocklistFilter(words: Seq[String],
      textCol: String = "text"): DocArray =
    wrap(Quality.blocklistFilter(df, col(textCol), words))

  /** CCNet-style perplexity scoring under an interpolated Kneser-Ney
    * bigram model fitted on `reference` (this array when None): adds
    * (n_bigrams, nll_kn) per doc via an id-join. */
  def kneserNeyScore(reference: Option[DocArray] = None,
      textCol: String = "text"): DocArray = {
    val fitOn = reference.getOrElse(this).df
    val model = LangModel.bigramFit(fitOn, col(textCol))
    wrap(df.join(
      LangModel.kneserNeyBigramNll(df, model, idCol, col(textCol)),
      Seq(idCol), "left"))
  }

  /** Decode each image blob (resized to `h`×`w` by the real codec path)
    * and attach its 64-bit average perceptual hash. */
  def withImagePhash(blobCol: String = "blob", h: Int = 16, w: Int = 16,
      outCol: String = "phash"): DocArray =
    wrap(df.withColumn("_t",
      Multimodal.decodeImage(col(blobCol), lit(h), lit(w)))
      // explicit null-out for failed decodes: transform-over-sequence
      // builds a non-null array of null sums from a null tensor, and the
      // threshold when/otherwise would then swallow the nulls into an
      // all-zero hash — every corrupt blob colliding with every other
      .withColumn(outCol, when(col("_t").isNotNull,
        Multimodal.aHashFromBlocks(
          Multimodal.grayBlockSums(col("_t.values"), h, w))))
      .drop("_t"))

  /** Image near-duplicate pairs by perceptual hash: [[withImagePhash]] →
    * banded hamming join (exact up to `maxHamming` ≤ 3, the pigeonhole
    * radius). Output (a, b, hamming). */
  def imageNearDupPairs(blobCol: String = "blob", maxHamming: Int = 3,
      h: Int = 16, w: Int = 16): DataFrame =
    Dedup.hammingPairs64(
      withImagePhash(blobCol, h, w).df.where(col("phash").isNotNull),
      idCol, "phash", maxHamming)

  /** Decode each WAV blob and attach its 64-bit energy-envelope
    * fingerprint over `frames` frames of `frameLen` samples (clips are
    * expected at a fixed length ≥ frames·frameLen; shorter decodes
    * yield null). */
  def withAudioFingerprint(frameLen: Int, blobCol: String = "blob",
      frames: Int = 64, outCol: String = "afp"): DocArray =
    wrap(df.withColumn("_b", Multimodal.decodeWav(col(blobCol)))
      // mono only: frameEnergies indexes the flat values array, so on an
      // interleaved stereo decode it would fingerprint half the clip
      // with L/R mixed — null those out rather than mis-hash them
      .withColumn(outCol, when(
        size(col("_b.shape")) === 1 &&
          element_at(col("_b.shape"), 1) >= frames * frameLen,
        Multimodal.aHashFromBlocks(
          Multimodal.frameEnergies(col("_b.values"), frames, frameLen))))
      .drop("_b"))

  /** Audio near-duplicate pairs by energy-envelope fingerprint —
    * [[withAudioFingerprint]] → banded hamming join (exact up to
    * `maxHamming` ≤ 3). Output (a, b, hamming). */
  def audioNearDupPairs(frameLen: Int, blobCol: String = "blob",
      maxHamming: Int = 3, frames: Int = 64): DataFrame =
    Dedup.hammingPairs64(
      withAudioFingerprint(frameLen, blobCol, frames).df
        .where(col("afp").isNotNull),
      idCol, "afp", maxHamming)

  /** Curriculum training order: exact global position under
    * (`orderCols`…, id) — never a single-partition sort. */
  def withTrainingOrder(posCol: String, orderCols: Column*): DocArray =
    wrap(GroupOps.globalOrderIndex(df, posCol,
      (orderCols :+ col(idCol)): _*))

  /** DSIR importance resampling: keep the `k` docs most like `target`
    * under hashed-n-gram bag models (Xie et al. 2023). */
  def dsirResample(target: DocArray, k: Int, buckets: Int = 1 << 16,
      textCol: String = "text"): DocArray = {
    val keep = Dsir.resampleTop(
      Dsir.importanceWeights(df, target.df, idCol, col(textCol), buckets),
      idCol, k).select(col(idCol))
    wrap(df.join(keep, Seq(idCol)))
  }

  /** match(other): knn results written into a `matches` column. */
  def matchWith(other: DocArray, k: Int, metric: String = "cosine",
      vecCol: String = "embedding", excludeSelf: Boolean = false): DocArray =
    wrap(Knn.attachMatches(df, other.df, k, metric,
      leftId = idCol, leftVec = vecCol, rightId = other.idCol,
      rightVec = vecCol, excludeSelf = excludeSelf))

  // ---- indexing / mutation (§2.2) ------------------------------------

  def apply(ids: Seq[Any]): DocArray = wrap(Items.byIds(df, idCol, ids))
  def where(mask: Column): DocArray = wrap(Items.byMask(df, mask))
  def attrs(names: String*): DataFrame = Items.attrs(df, names: _*)
  def update(updates: DataFrame): DocArray = wrap(Items.updateById(df, updates, idCol))
  def delete(ids: Seq[Any]): DocArray = wrap(Items.deleteByIds(df, idCol, ids))
  def extend(other: DocArray): DocArray = wrap(Items.extend(df, other.df))

  // ---- merge / traversal / grouping (§2.4-2.6) -----------------------

  def reduce(other: DocArray): DocArray = wrap(Reduce.merge(df, other.df, idCol))
  def traverse(path: String): DocArray = wrap(Traverse.traverse(df, path))
  def flatten(depth: Int = 2): DocArray = wrap(Traverse.flatten(df, depth))
  /** `da['@c'] = docs` — id-keyed write-back through a traversal path. */
  def setByPath(path: String, updates: DataFrame): DocArray =
    wrap(Traverse.setByPath(df, path, updates, idCol))
  /** `load_uri_to_blob` for every doc (data:/file:/http URIs). */
  def loadUriToBlob(uriCol: String = "uri", blobCol: String = "blob"): DocArray =
    wrap(Multimodal.loadUriToBlob(df, uriCol, blobCol))
  /** `load_uri_to_point_cloud_tensor(samples)`: glb blob → sampled point
    * cloud (reference: document/mixins/mesh.py:12-42). */
  def loadBlobToPointCloud(samples: Int, seed: Long = 42L,
      blobCol: String = "blob", outCol: String = "point_cloud"): DocArray =
    wrap(Multimodal.loadGlbToPointCloud(df, blobCol, samples, seed, outCol))
  /** `load_uri_to_video_tensor(only_keyframes=True)` addressing: keyframe
    * sample numbers / byte offsets / sizes from the mp4 sample tables
    * (reference: document/mixins/video.py:12-70). */
  def videoKeyframes(blobCol: String = "blob",
      outCol: String = "keyframes"): DocArray =
    wrap(df.withColumn(outCol, Multimodal.mp4SampleTable(col(blobCol))))
  /** One row per keyframe with its raw byte payload sliced out of the
    * container blob (substr is byte-addressed on binary columns). Frame
    * decode needs a codec this JVM lacks, but the per-keyframe payloads
    * are exactly what a user hands to an external decoder via
    * [[Parallel.mapBatch]] (reference: video.py:12-70 only_keyframes). */
  def videoKeyframeBlobs(blobCol: String = "blob",
      outCol: String = "frame_blob"): DocArray = {
    val exploded = df
      .withColumn("_kf", Multimodal.mp4SampleTable(col(blobCol)))
      .where(col("_kf").isNotNull)
      .withColumn("_k", explode(arrays_zip(
        col("_kf.keyframe_samples").as("sample"),
        col("_kf.keyframe_offsets").as("offset"),
        col("_kf.keyframe_sizes").as("size"))))
    // a lying co64 offset beyond the blob (or beyond int range — the
    // JVM can't hold a >2 GB blob anyway) must yield null, not a
    // wrapped-negative substr slicing arbitrary bytes
    val inRange = col("_k.offset") >= 0 &&
      col("_k.size") >= 0 &&
      col("_k.offset") + col("_k.size") <= length(col(blobCol)).cast("long")
    wrap(exploded
      .withColumn("frame_sample", col("_k.sample"))
      .withColumn(outCol, when(inRange,
        col(blobCol).substr(col("_k.offset").cast("int") + lit(1),
          col("_k.size").cast("int"))))
      .drop("_kf", "_k"))
  }
  /** Per-video content signature for exact video dedup: xxhash64 of each
    * keyframe payload (the byte ranges the sample tables address),
    * collected in sample order and hashed again — videos with identical
    * keyframe content collide regardless of id/uri/tag metadata. One
    * row per parseable video: (id, n_keyframes, vsig). Re-encoded or
    * trimmed copies do NOT collide (this is the exact tier; perceptual
    * video dedup needs a frame decoder, which stays out of scope). */
  def videoContentSignature(blobCol: String = "blob"): DataFrame = {
    val cnt = org.apache.spark.sql.functions.count(lit(1))
    videoKeyframeBlobs(blobCol).df
      .groupBy(col(idCol))
      // sign only fully-readable videos: a video whose trailing keyframe
      // offsets lie beyond the blob must NOT silently collide with a
      // genuinely shorter video that matches its readable prefix
      .agg(cnt.cast("int").as("n_keyframes"),
        when(cnt === org.apache.spark.sql.functions.count(col("frame_blob")),
          xxhash64(transform(
            array_sort(collect_list(struct(col("frame_sample"),
              xxhash64(col("frame_blob")).as("_h")))),
            x => x.getField("_h")))).as("vsig"))
  }

  /** Groups of exact video duplicates by [[videoContentSignature]]:
    * (vsig, n_copies, ids), only signatures with ≥ 2 members. */
  def videoDupGroups(blobCol: String = "blob"): DataFrame =
    videoContentSignature(blobCol)
      .where(col("vsig").isNotNull)
      .groupBy("vsig")
      .agg(org.apache.spark.sql.functions.count(lit(1)).cast("int").as("n_copies"),
        array_sort(collect_list(col(idCol))).as("ids"))
      .where(col("n_copies") >= 2)

  def splitByTag(tag: Column): DataFrame = GroupOps.splitByTag(df, tag, col(idCol))
  def vocabulary(minFreq: Long = 1, textCol: String = "text"): DataFrame =
    GroupOps.vocabulary(df, col(textCol), minFreq)

  // ---- sampling / ordering (§2.7) ------------------------------------

  def sample(k: Int, seed: Long): DocArray = wrap(GroupOps.sampleExact(df, k, seed))
  /** Seeded exact-k sample that is reproducible across engines and data
    * layouts (splitmix64 rank on the id) — prefer this in pipelines that
    * must replay the identical draw. */
  def sampleDeterministic(k: Int, seed: Long): DocArray =
    wrap(GroupOps.sampleHashed(df, k, seed, col(idCol)))
  def shuffle(seed: Long): DocArray = wrap(GroupOps.shuffle(df, seed))

  // ---- evaluation (§2.5) ---------------------------------------------

  def evaluate(groundTruth: DocArray, matchesCol: String = "matches"): DataFrame =
    Evaluate.relevanceAgainst(df, groundTruth.df, idCol, matchesCol)

  // ---- UDF surface (§2.10) -------------------------------------------

  /** Per-doc transform preserving the schema — the reference's
    * `da.map(fn)` / `da.apply(fn)` (eager vs lazy is moot here: Spark is
    * lazy until an action). */
  def mapRows(f: org.apache.spark.sql.Row => org.apache.spark.sql.Row): DocArray =
    wrap(df.map(f)(org.apache.spark.sql.Encoders.row(df.schema)))

  /** Batched per-partition transform preserving the schema — the
    * reference's `da.map_batch(fn, batch_size)`. */
  def mapBatch(batchSize: Int)(
      f: Seq[org.apache.spark.sql.Row] => Iterator[org.apache.spark.sql.Row]): DocArray =
    wrap(Parallel.mapBatch(df, batchSize)(f)(
      org.apache.spark.sql.Encoders.row(df.schema)))

  /** Batched model inference filling `embedding` — the reference's
    * `da.embed(model, batch_size)`; `model` scores a batch of rows into
    * one embedding each (plug ONNX Runtime or any JVM scorer). */
  def embed(batchSize: Int)(
      model: Seq[org.apache.spark.sql.Row] => Seq[Array[Float]]): DocArray = {
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields.filterNot(_.name == "embedding") :+
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val base = df.drop("embedding")
    wrap(base.mapPartitions(_.grouped(batchSize).flatMap { b =>
      val out = model(b)
      // one embedding per row, enforced: a short return would silently
      // drop docs and a mid-batch skip would shift every later pair
      require(out.size == b.size,
        s"embed model returned ${out.size} embeddings for ${b.size} rows")
      b.zip(out).map { case (r, e) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ e.toSeq) }
    })(org.apache.spark.sql.Encoders.row(schema)))
  }

  /** Density-relative outlier scores (LOF) over the embedding column:
    * exact self-knn + the quantize-once reachability chain. */
  def lofScores(k: Int = 10, metric: String = "cosine",
      vecCol: String = "embedding"): DataFrame =
    Knn.lofScores(df, k, metric, idCol, vecCol)

  /** Train a multinomial Naive Bayes text classifier on a label column. */
  def trainClassifier(labelCol: String, textCol: String = "text")
      : LangModel.NaiveBayesModel =
    LangModel.naiveBayesFit(df, col(labelCol), col(textCol))

  /** Classify every doc under a fitted NB model. */
  def classify(model: LangModel.NaiveBayesModel,
      textCol: String = "text"): DataFrame =
    LangModel.naiveBayesScore(df, model, idCol, col(textCol))

  /** Leakage-safe target encoding of a categorical column. */
  def targetEncode(category: String, y: Column, m: Long = 10L): DataFrame =
    GroupOps.targetEncode(df, idCol, col(category), y, m)

  /** Deterministic DeepWalk corpus over an UNDIRECTED pair table from
    * this array's ids (walk keys are splitmix draws — replayable, no
    * RNG state). The pairs are symmetrized here (a,b) ∪ (b,a) before
    * the walk — like the sibling pair-graph facades — because
    * [[Graph.randomWalks]] builds a DIRECTED adjacency: feeding it a
    * canonical a<b pair table unsymmetrized would only ever step toward
    * higher ids and silently bias the corpus (r7 ADVICE fix). */
  def randomWalks(pairs: DataFrame, walksPerNode: Int, walkLength: Int,
      seed: Long = 0L): DataFrame = {
    val sym = pairs.select(col("a"), col("b")).unionByName(
      pairs.select(col("b").as("a"), col("a").as("b")))
    Graph.randomWalks(sym, "a", "b",
      df.select(col(idCol)), idCol, walksPerNode, walkLength, seed)
  }

  /** Autocomplete/typeahead table over this array's token vocabulary. */
  def completions(minLen: Int = 1, maxLen: Int = 4, topK: Int = 3,
      textCol: String = "text"): DataFrame =
    TextSearch.prefixCompletions(df, col(textCol), minLen, maxLen, topK)

  /** SymSpell-correct this array's ids-as-tokens column against a
    * vocabulary frame (complete deletion-neighborhood blocking,
    * levenshtein ≤ 1 verify, (dist, freq desc, word) pick). */
  def spellCorrect(tokCol: String, vocab: DataFrame,
      wordCol: String = "word", freqCol: String = "freq"): DataFrame =
    TextSearch.spellCorrect(df, tokCol, vocab, wordCol, freqCol)

  /** Non-overlapping occurrence counts of literal substring patterns
    * per doc — the substring-level blocklist probe. */
  def substringCounts(patterns: Seq[String],
      textCol: String = "text"): DataFrame =
    df.select(col(idCol), graft.functions.substring_count_all(
      col(textCol), patterns).as("pattern_counts"))

  /** Batch gap sessionization of an event-shaped array. */
  def sessionize(userCol: String, tsCol: String, typeCol: String,
      gapNs: Long): DataFrame =
    Funnel.sessionize(df, userCol, tsCol, typeCol, gapNs)

  /** Top-k frequent contiguous session paths (gap-free sequential
    * patterns): (path, occurrences, support). */
  def frequentPaths(userCol: String, tsCol: String, typeCol: String,
      gapNs: Long, n: Int = 3, topK: Int = 25): DataFrame =
    Funnel.frequentPaths(df, userCol, tsCol, typeCol, gapNs, n, topK)

  /** Binary-quantized knn over this array's embeddings: mean-centered
    * sign-bit Hamming candidate scan + exact rerank of the top 1000
    * (the defaults the honest clustered-corpus numbers come from —
    * Recall@10 = 1.000 at 1M×128). On a STRUCTURELESS corpus treat
    * this as a prefilter/candidate generator, not the search (see
    * [[graft.operators.Ann.binarySearchRerank]]'s regime notes). */
  def findBinaryQuantized(queries: DataFrame, k: Int,
      metric: String = "cosine", rerank: Int = 1000,
      vecCol: String = "embedding"): DataFrame =
    Ann.binarySearchRerank(df, queries, k, metric, idCol, vecCol,
      idCol, vecCol, rerank)

  /** find(query_vectors) through a per-query EARLY-TERMINATING IVF
    * probe ([[graft.operators.Ann.ivfSearchAdaptive]]): cells are
    * probed in centroid-distance order in blocks, and each query
    * retires once `patience` consecutive blocks stop improving its
    * k-th best distance — easy queries pay a few cells, hard ones
    * probe deep, so the average scan at equal recall beats any fixed
    * nProbe on a mixed workload (measured: 0.984 recall at 0.053 scan
    * vs fixed-64's 0.068). Builds a mean-centered spherical IVF per
    * call; callers who reuse an index across query batches should hold
    * an [[graft.operators.Ann.IvfIndex]] and call the engine method
    * directly. Driver probe state is loudly bounded
    * (`Ann.defaultMaxProbeState`). */
  def findNearAdaptive(queries: DataFrame, k: Int, nCells: Int = 1024,
      blockCells: Int = 64, patience: Int = 2,
      metric: String = "cosine", vecCol: String = "embedding"): DataFrame = {
    val idx = Ann.ivfBuild(df, idCol, vecCol, nCells,
      fitSampleFraction = 0.2, center = true)
    Ann.ivfSearchAdaptive(idx, queries, k, idCol, vecCol, metric,
      blockCells, patience = patience).hits
  }

  /** Matryoshka sizing table: recall@k of prefix-truncated search per
    * width vs the full-dim exact top-k. */
  def truncationRecall(queries: DataFrame, k: Int, dims: Seq[Int],
      metric: String = "cosine",
      vecCol: String = "embedding"): DataFrame =
    Ann.truncatedRecall(df, queries, k, dims, metric, idCol, vecCol,
      idCol, vecCol)

  /** Distributed isotonic calibration (zero driver state — the
    * [[Evaluate.isotonicCalibrate]] twin). */
  def isotonic(score: Column, positive: Column,
      quantScale: Long = 100L): DataFrame =
    Evaluate.isotonicFit(df, score, positive, quantScale)

  /** Smooth an integer (ppm) feature over a pair graph of this array's
    * ids — the SGC/label-spreading precompute. */
  def smoothFeature(pairs: DataFrame, valCol: Column,
      rounds: Int): DataFrame =
    Graph.featureSmoothPpm(pairs, df, idCol, valCol, rounds)

  /** Order-invariant reproducibility fingerprint of this array. */
  def fingerprint(keyCols: Seq[String]): DataFrame =
    Quality.fingerprint(df, concat_ws("|", keyCols.map(col): _*))

  /** TensorBoard Embedding Projector artifact of this array — the
    * on-disk half of the reference's `plot_embeddings` (vectors.tsv +
    * metadata.tsv + projector_config.pbtxt); returns the files read
    * back line by line. Browser-bounded: sample/coreset first above
    * `maxRows`. */
  def exportProjector(dir: String, labelCols: Seq[String],
      vecCol: String = "embedding", maxRows: Long = 100000L): DataFrame =
    Projector.exportEmbeddings(df, idCol, vecCol, labelCols, dir, maxRows)

  /** Sprite sheet of this array's image tensors (the reference's
    * `plot_image_sprites` file), written as a real PNG. */
  def plotImageSprites(outPath: String, valuesCol: String = "values",
      shapeCol: String = "shape", canvasSize: Int = 512,
      minSize: Int = 16): (Int, Int, Int, String) =
    Sprites.imageSprites(df, idCol, valuesCol, shapeCol, outPath,
      canvasSize, minSize)

  /** Animated GIF, one frame per doc (the reference's `save_gif`). */
  def saveGif(outPath: String, valuesCol: String = "values",
      shapeCol: String = "shape", delayMs: Int = 200): Int =
    Sprites.saveGif(df, idCol, valuesCol, shapeCol, outPath, delayMs)

  /** Per-dimension embedding-distribution drift vs another array. */
  def embeddingDriftVs(other: DocArray,
      vecCol: String = "embedding"): DataFrame =
    Evaluate.embeddingDrift(df, other.df, vecCol)

  /** Benjamini–Hochberg FDR control over a per-test p-value frame
    * derived from this array (one row per hypothesis, p in ppb). */
  def bhAdjust(testId: Column, pPpb: Column,
      alphaPpb: Long): DataFrame =
    Evaluate.bhAdjust(df, testId, pPpb, alphaPpb)

  /** Difference-in-differences contrast over this array's rows. */
  def diffInDiff(treated: Column, post: Column, value: Column): DataFrame =
    Evaluate.diffInDiff(df, treated, post, value)

  /** Uplift / Qini bin table: incremental-conversion report of a
    * targeting score under a treatment flag. */
  def upliftBins(score: Column, treated: Column, positive: Column,
      nBins: Int = 10): DataFrame =
    Evaluate.upliftBins(df, score, treated, positive, col(idCol), nBins)

  /** Split-conformal threshold + held-out coverage over a quantized
    * nonconformity score. */
  def conformalSplit(score: Column, isCal: Column,
      alphaPpm: Long): DataFrame =
    Evaluate.conformalSplit(df, score, isCal, alphaPpm)

  /** Weight-of-evidence / information-value screen of a categorical
    * feature against a binary outcome. */
  def woeIv(bucket: Column, positive: Column): DataFrame =
    Evaluate.woeIv(df, bucket, positive)

  /** Padding-waste study: pad-to-max batch bill under arrival vs
    * length-grouped order (see [[graft.operators.Pack.paddingWaste]]). */
  def paddingWaste(nTokensCol: String, batchSize: Int): DataFrame =
    Pack.paddingWaste(df, idCol, nTokensCol, batchSize)

  /** Wilcoxon signed-rank test of a paired before/after measure. */
  def wilcoxonSignedRank(before: Column, after: Column): DataFrame =
    Evaluate.wilcoxonSignedRank(df, before, after)

  /** Friedman test: k treatments ranked within each block. */
  def friedman(block: Column, treatment: Column,
      value: Column): DataFrame =
    Evaluate.friedman(df, block, treatment, value)

  /** Stratified ATE (= exact-propensity IPW) of a treatment flag. */
  def strataAte(stratum: Column, treated: Column,
      value: Column): DataFrame =
    Evaluate.strataAte(df, stratum, treated, value)

  /** Wald SPRT over a Bernoulli outcome in a deterministic key order. */
  def sprt(outcome: Column, orderKey: Column, p0Ppm: Long, p1Ppm: Long,
      alphaPpm: Long = 50000L, betaPpm: Long = 50000L): DataFrame =
    Evaluate.sprtBinary(df, outcome, orderKey, p0Ppm, p1Ppm,
      alphaPpm, betaPpm)

  /** Nelson–Aalen cumulative hazard per group (all-integer twin of
    * [[survivalCurve]]). */
  def cumulativeHazard(groupCols: Seq[String], duration: Column,
      event: Column): DataFrame =
    Evaluate.nelsonAalen(df, groupCols, duration, event)

  /** Restricted mean survival time to horizon tau per group. */
  def restrictedMeanSurvival(groupCols: Seq[String], duration: Column,
      event: Column, tau: Long): DataFrame =
    Evaluate.rmst(df, groupCols, duration, event, tau)

  /** Granger lag-1 causality F-test of bucketed series x onto y. */
  def grangerCausality(bucket: Column, x: Column, y: Column): DataFrame =
    Evaluate.grangerLag1(df, bucket, x, y)

  /** Caliper nearest-neighbor propensity matching ATT. */
  def caliperMatch(scorePpm: Column, treated: Column, y: Column,
      caliper: Long): DataFrame =
    Evaluate.caliperMatchAtt(df, scorePpm, treated, y, caliper)

  /** Time-decay multi-touch attribution (discrete halving weights). */
  def timeDecayAttribution(userCol: String, tsCol: String,
      typeCol: String, conversionType: String, touchTypes: Seq[String],
      windowNs: Long, halfLifeNs: Long): DataFrame =
    Funnel.timeDecayAttribution(df, userCol, tsCol, typeCol, idCol,
      conversionType, touchTypes, windowNs, halfLifeNs)

  /** Item-item collaborative-filtering top-N recommendations. */
  def recommendItems(userCol: String, itemCol: String, topN: Int = 10,
      minSupport: Long = 2L, maxUserItems: Int = 1000,
      simTopK: Int = 50): DataFrame =
    Recommend.itemItemRecs(df, userCol, itemCol, topN, minSupport,
      maxUserItems, simTopK)

  /** Next-item top-N from first-order transition counts. */
  def nextItems(userCol: String, itemCol: String, order: Column,
      topN: Int = 10, minCount: Long = 2L): DataFrame =
    Recommend.nextItemRecs(df, userCol, itemCol, order, topN, minCount)

  /** Coverage / popularity-bias report of a rec table vs a catalog. */
  def recommendationCoverage(recs: DataFrame,
      itemCol: String = "item"): DataFrame =
    Recommend.coverageReport(recs, df.select(col(itemCol)),
      itemCol = itemCol)

  /** Leave-last-out hit-rate@N eval of the item-item recommender. */
  def recommenderHitRate(userCol: String, itemCol: String,
      order: Column, topN: Int = 10): DataFrame =
    Recommend.hitRateAtN(df, userCol, itemCol, order, topN)

  /** Walk-forward CV fold boundaries with an embargo gap. */
  def walkForwardFolds(bucket: Column, nFolds: Int,
      embargo: Long = 0L): DataFrame =
    GroupOps.walkForwardFolds(df, bucket, nFolds, embargo)

  /** Rank-1 ALS factorization of a (user, item, rating) view. */
  def als1(userCol: String, itemCol: String, rating: Column,
      iters: Int = 2): (DataFrame, DataFrame) =
    Recommend.als1(df, userCol, itemCol, rating, iters)

  /** Damped bias baseline (μ + b_i + b_u) — ALS's null model. */
  def biasBaseline(userCol: String, itemCol: String, rating: Column,
      lambda: Long = 10L): (DataFrame, DataFrame) =
    Recommend.biasBaseline(df, userCol, itemCol, rating, lambda)

  /** Dataset-card release manifest (exact-integer JSON lines). */
  def exportDatacard(dir: String, sourceCol: String = "source",
      textCol: String = "text", langCol: String = "lang"): DataFrame =
    Datacard.export(df, sourceCol, textCol, langCol, dir)

  /** Quantile treatment effects of a treatment flag on an integer
    * outcome (tails, where the mean contrast is blind). */
  def quantileTreatmentEffect(treated: Column, y: Column,
      qPpms: Seq[Long] = Seq(100000L, 250000L, 500000L, 750000L,
        900000L)): DataFrame =
    Evaluate.quantileTreatmentEffect(df, treated, y, qPpms)

  /** Kish effective sample size of an importance-weight column. */
  def effectiveSampleSize(weight: Column): DataFrame =
    GroupOps.essWeights(df, weight)

  /** Seeded-Laplace DP release of per-key counts (ε in ppm). */
  def dpNoisyCounts(key: Column, epsilonPpm: Long,
      seed: Long = 0L): DataFrame =
    Quality.dpNoisyCounts(df, key, epsilonPpm, seed)

  /** Canonical URL dedup key + parsed components appended per row. */
  def normalizeUrls(url: Column): DocArray =
    wrap(df.withColumn("url_host", Web.urlHost(url))
      .withColumn("url_domain", Web.registrableDomain(Web.urlHost(url)))
      .withColumn("url_norm", Web.urlNormalize(url)))

  /** Shapley-value channel attribution over this array's events. */
  def shapleyAttribution(userCol: String, tsCol: String,
      typeCol: String, conversionType: String, touchTypes: Seq[String],
      windowNs: Long): DataFrame =
    Funnel.shapleyAttribution(df, userCol, tsCol, typeCol, idCol,
      conversionType, touchTypes, windowNs)

  /** Probabilistic-prediction eval battery over a score column. */
  def brier(score: Column, positive: Column): DataFrame =
    Evaluate.brierScore(df, score, positive)
  def logLoss(score: Column, positive: Column): DataFrame =
    Evaluate.logLoss(df, score, positive)
  def precisionAt(ks: Seq[Int], score: Column,
      positive: Column): DataFrame =
    Evaluate.precisionAtK(df, col(idCol), score, positive, ks)
  def averagePrecision(score: Column, positive: Column): DataFrame =
    Evaluate.averagePrecision(df, col(idCol), score, positive)

  /** Feature-redundancy screen over integer-castable measures. */
  def correlations(measures: Seq[String]): DataFrame =
    Evaluate.correlationMatrix(df, measures)

  def summary(): DataFrame = Summary.describe(df)

  /** This array's actual schema as a JSON-Schema document (the
    * `PydanticDocument.schema_json()` analog for arbitrary columns). */
  def schemaJson(title: String = "Document"): String =
    graft.schema.Projections.toJsonSchema(df.schema, title)

  // ---- persistence (§2.1) --------------------------------------------

  def saveParquet(path: String, partitionBy: Seq[String] = Nil): Unit =
    graft.sources.Writers.toParquet(df, path, partitionBy)
  def saveCsv(path: String): Unit = graft.sources.Writers.toCsv(df, path)
  def saveBinary(dir: String): Unit =
    graft.sources.BinaryCodec.saveBinaryShards(df, dir)

  def count(): Long = df.count()
}

object DocArray {
  def fromParquet(spark: SparkSession, path: String, idCol: String = "id"): DocArray =
    DocArray(spark.read.parquet(path), idCol)
  def fromCsv(spark: SparkSession, path: String,
      fieldResolver: Map[String, String] = Map.empty): DocArray =
    DocArray(graft.sources.Readers.fromCsv(spark, path, fieldResolver))
  def fromJsonl(spark: SparkSession, path: String): DocArray =
    DocArray(graft.sources.Readers.fromJsonl(spark, path))
  def fromBinary(spark: SparkSession, path: String): DocArray =
    DocArray(graft.sources.BinaryCodec.loadBinary(spark, path))
  def empty(spark: SparkSession, n: Long): DocArray =
    DocArray(DocSchema.empty(spark, n))
  /** pull(name): load a pushed artifact back (latest published version by
    * default — reference: array/mixins/io/pushpull.py:105-199). */
  def pull(spark: SparkSession, registryRoot: String, name: String,
      version: Int = -1): DocArray =
    DocArray(graft.sources.Registry.pull(spark, registryRoot, name, version))
  /** Canonical Document model projections (pydantic / strawberry analogs). */
  def jsonSchema: String = graft.schema.Projections.documentJsonSchema
  def graphqlSdl: String = graft.schema.Projections.documentGraphqlSdl
}
