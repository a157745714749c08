package graft.api

/** Single entry point to the engine's operator library — one import
  * for a user replacing the reference stack:
  *
  * {{{
  * import graft.api.Graft._
  *
  * val clean   = docs.withColumn("text", nfcNormalize(col("text")))
  * val scored  = textStats.qualityScore(clean, "text")
  * val nearDup = textDedup.minhashCandidates(clean, "doc_id", "text", k = 64, bands = 16)
  * val packed  = seqPack.pack(kept, "doc_id", "n_tokens", budget = 2048)
  * val card    = // q261-style per-source audit via the same primitives
  * }}}
  *
  * Everything here is a plain re-export: each member IS the operator
  * object documented (and oracle-gated) in COVERAGE.md — this facade
  * adds no behavior, only one discoverable namespace. SQL users get
  * the same surface by building their session with
  * `.withExtensions(new graft.GraftExtensions)` (native expressions +
  * the window-top-k optimizer rule) or calling
  * `graft.GraftFunctions.registerAll(spark)` on an existing session.
  */
object Graft {

  // ---- text / corpus prep ----
  /** Exact, MinHash-LSH, SimHash, containment and clustered dedup. */
  val textDedup = graft.llm.TextDedup
  /** Asymmetric containment (sub-document) near-dup, PPJoin-pruned. */
  val containmentJoin = graft.llm.ContainmentJoin
  /** Language-ID, quality scoring, token counts, fingerprints, PII. */
  val textStats = graft.llm.TextStats
  /** Unigram bit-length surprisal filter (CCNet-style, integer-exact). */
  val surprisal = graft.llm.Surprisal
  /** Kneser-Ney bigram LM: train, score, incremental maintenance. */
  val kneserNey = graft.llm.KneserNey
  /** Eval-set n-gram decontamination. */
  val decontaminate = graft.llm.Decontaminate
  /** BPE train/encode. */
  val bpe = graft.llm.Bpe
  /** Document chunking for retrieval. */
  val chunker = graft.llm.Chunker
  /** Sequence packing into fixed token budgets. */
  val seqPack = graft.llm.SeqPack

  // ---- embeddings / retrieval ----
  /** Brute-force / LSH / IVF / PQ / IVF-PQ ANN (recall-gated). */
  val ann = graft.llm.Ann
  /** Product quantization codebooks. */
  val pq = graft.llm.Pq
  /** Semantic dedup over sign-random-projection cells. */
  val semDedup = graft.llm.SemDedup
  /** Mean / max / CLS embedding pooling (engine-exact accumulators). */
  val pooling = graft.llm.Pooling
  /** int8 embedding quantization. */
  val quantize = graft.llm.Quantize
  /** BM25 scoring (+ persisted index form). */
  val bm25 = graft.llm.Bm25
  /** Reciprocal-rank-fusion hybrid ranking. */
  val hybridRank = graft.llm.HybridRank

  // ---- sampling / mixing ----
  /** Temperature / mixture sampling with md5-rank determinism. */
  val mixtureSample = graft.llm.MixtureSample
  /** Priority and stratified sampling. */
  val prioritySample = graft.llm.PrioritySample

  // ---- multimodal ----
  /** Binary image/audio/video plumbing (PNG/GIF/WAV real codecs). */
  val multimodal = graft.llm.Multimodal

  // ---- relational / incremental operators ----
  /** CDC MERGE fold (batch) — latest-wins with tombstones. */
  val cdcApply = graft.operators.CdcApply
  /** Fuzzy entity-resolution join (blocked Levenshtein). */
  val fuzzyJoin = graft.operators.FuzzyJoin
  /** Pointer-jumping connected components. */
  val connectedComponents = graft.operators.ConnectedComponents
  /** PageRank with cached stationary edges. */
  val pageRank = graft.operators.PageRank

  // ---- streaming ----
  /** Watermarked dedup, stream-stream inner/LEFT OUTER joins,
    * sessionization, CDC upsert, incremental dedup, heavy hitters. */
  val streams = graft.streaming.StreamOps

  // ---- plan-level ----
  /** Window-top-k → bounded-buffer aggregate rewrite (row_number,
    * rank, dense_rank); also usable one-shot: `WindowTopKRewrite(df)`. */
  val windowTopK = graft.plans.WindowTopKRewrite

  // ---- native expressions (Column forms) ----
  import org.apache.spark.sql.Column
  /** 60-bit portable md5 token hash. */
  def portableHash60(c: Column): Column = graft.functions.PortableHash60(c)
  /** Jaro-Winkler similarity in exact micro-units (DuckDB-pinned). */
  def jaroWinklerMicro(a: Column, b: Column): Column =
    graft.functions.JaroWinklerMicro(a, b)
  /** Unicode NFC canonical composition. */
  def nfcNormalize(c: Column): Column = graft.functions.NfcNormalize(c)
}
