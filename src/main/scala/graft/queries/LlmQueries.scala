package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.util.Tables._
import graft.llm.{Ann, Decontaminate, MixtureSample, MlService, Multimodal, Pq, PrepPipeline, SemDedup, SeqPack, ShardBalance, TextDedup, TextStats, UniMax}

/** LLM training-data pipeline block: dedup (exact / MinHash-LSH /
  * SimHash / n-gram Jaccard), ANN (brute-force + LSH/IVF/PQ), text
  * analysis, multimodal plumbing. Everything is oracle-checked: exact
  * paths bit-for-bit (portable md5-derived hashes where the engine
  * default is xxhash64), approximate ANN paths via pinned recall@k
  * against a DuckDB-recomputed exact baseline (see recallSummary).
  */
object LlmQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Recall@k of an approximate ANN result vs the exact baseline, as ONE
    * summary row — the oracle-checkable form of an approximate query:
    * DuckDB independently computes the exact top-k (n_queries, n_truth
    * derived from data) and the CORRECTNESS gate pins the achieved
    * n_hits/recall, so any regression in the approximate path's recall
    * turns the row red. */
  private def recallSummary(approx: DataFrame, exact: DataFrame): DataFrame = {
    val truth = exact.select(col("qid"), col("cid"))
    val hits = approx.select(col("qid"), col("cid")).join(truth, Seq("qid", "cid"))
    truth.agg(count_distinct(col("qid")).as("n_queries"), count(lit(1)).as("n_truth"))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
      .select(col("n_queries"), col("n_truth"), col("n_hits"),
        round(col("n_hits").cast(DoubleType) / col("n_truth").cast(DoubleType), 4)
          .as("recall"))
  }

  /** q88's reusable shard-export dirs, keyed by sf dir (see q88). */
  private val shardDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q117's persisted LSH signature index, built ONCE per (JVM, sf dir)
    * — the incremental-dedup contract is that batches never re-sign the
    * existing corpus, so the index build must not sit in the repeated
    * query body (same reuse rationale as [[shardDirs]]/exactTruth). */
  private val sigIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q142's persisted IVF index (centroids + cell-partitioned
    * assignments), built ONCE per (JVM, sf dir) — same amortization
    * contract as [[sigIndexDirs]]: the benched body is the PROBE. */
  private val ivfIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Partition fan-out of the persisted signature index (band × pkey
    * directories — see TextDedup.sigPartition). 8 at test SF keeps the
    * directory count sane; at corpus scale this is thousands so a daily
    * batch's probe prunes to a fraction of the index. */
  private val sigIndexParts = 8

  /** q118's staged (batch-docs dir, seeded PRISTINE index dir), once
    * per (JVM, sf dir). Each invocation copies the pristine seed to a
    * FRESH working index (the stream appends its batch signatures to
    * the working copy), so repeated runs — bench min-of-2, bench then
    * correctness — measure the SAME input instead of an index that
    * grew by one batch per prior run. */
  private val streamDedupDirs =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** q118's previous invocation's (working index, stream output) temp
    * dirs, deleted at the start of the next invocation (the returned
    * DataFrame reads the output dir lazily, so cleanup must wait until
    * the next run rather than happen in the query body). */
  private val streamDedupScratch =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** q286's staged corpus-batch dir (4 part files = 4 triggers), once
    * per (JVM, sf dir); the stream is stateless so the input never
    * mutates across runs. */
  private val streamDeconDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q286's previous invocation's output dir, deleted at the start of
    * the next invocation (same lazy-read contract as q118's scratch). */
  private val streamDeconScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q292's staged full-corpus batch dir + previous output scratch —
    * same contracts as q286's pair above. */
  private val streamManifestDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val streamManifestScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q297's staged batch dir + previous output scratch — same
    * contracts as q286's pair above. */
  private val streamSampleDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val streamSampleScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q302's persisted gram-count index dir — same build-once contract
    * as q117's signature index. */
  private val gramIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // every build-once dir and last-run scratch above is reclaimed at
  // JVM exit (graft.util.ScratchSweep — ADVICE r14 leak fix)
  locally {
    import scala.jdk.CollectionConverters._
    graft.util.ScratchSweep.atExit {
      Seq(shardDirs, sigIndexDirs, ivfIndexDirs,
        streamDeconDirs, streamDeconScratch, streamManifestDirs,
        streamManifestScratch, streamSampleDirs, streamSampleScratch,
        gramIndexDirs).flatMap(_.values.asScala) ++
      Seq(streamDedupDirs, streamDedupScratch)
        .flatMap(_.values.asScala).flatMap { case (a, b) => Seq(a, b) }
    }
  }

  /** Verbatim 8-token windows as portable 60-bit hashes (the q168/q271
    * window unit) — one exploded row per window; docs under 8 tokens
    * contribute none. Shared by q298/q300/q302. */
  private def gram8(ws: org.apache.spark.sql.Column) = explode(
    when(size(ws) >= 8,
      transform(sequence(lit(0), size(ws) - 8), i =>
        TextDedup.portableHash(concat_ws(" ",
          (1 to 8).map(o => try_element_at(ws, i + o)): _*))))
      .otherwise(array()))

  private def copyTree(src: String, dst: String): Unit = {
    val sp = java.nio.file.Paths.get(src)
    val dp = java.nio.file.Paths.get(dst)
    val it = java.nio.file.Files.walk(sp)
    try it.forEach { p =>
      val t = dp.resolve(sp.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally it.close()
  }

  private def deleteTree(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      val it = java.nio.file.Files.walk(p)
      try {
        val all = new java.util.ArrayList[java.nio.file.Path]()
        it.forEach(x => { all.add(x); () })
        java.util.Collections.reverse(all)
        all.forEach(x => { java.nio.file.Files.deleteIfExists(x); () })
      } finally it.close()
    }
  }

  /** Exact top-k ground truth for the ANN recall gates, computed ONCE
    * per (sf dir, query set, k) and pinned as a local relation. The
    * result is bounded by construction (|queries| × k rows — ≤150 at
    * the gate settings), so collecting it is a driver-side constant,
    * and the pinned relation broadcast-joins for free inside
    * recallSummary. This keeps the O(|corpus|·|queries|) exact scan —
    * the thing ANN exists to avoid — OUT of the timed query body: the
    * benched q75/q82/q86 now measure the approximate operator, not the
    * gate harness. (DuckDB still recomputes the exact baseline fully
    * independently in annRecallOracle.) */
  private val exactTruthCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[org.apache.spark.sql.Row], StructType)]()
  private def exactTruth(s: SparkSession, dir: String, qMax: Int, k: Int): DataFrame = {
    val (rows, schema) = exactTruthCache.computeIfAbsent(s"$dir|$qMax|$k", _ => {
      val emb = t(s, dir, "embeddings")
      val df = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < qMax), k)
        .select(col("qid"), col("cid"))
      (df.collect(), df.schema)
    })
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Pipeline stages materialized once per (app, sf dir, key) via
    * localCheckpoint — executor-resident, never driver-side; keyed by
    * applicationId so a fresh session never sees another context's
    * blocks. Two uses, both the [[exactTruth]] principle of keeping
    * harness/input stages out of a timed operator body:
    *  - synthetic media fixtures (q111/q112/q115): the ENCODE side is
    *    gate harness — the oracle checks decoded stats against
    *    closed-form functions — so the benched queries time the codec
    *    DECODE path, not fixture generation;
    *  - cluster assignments consumed by q120: a real pipeline persists
    *    the clustering stage's output table and keeper selection reads
    *    it; q83 times the clustering stage itself (it does NOT consume
    *    the pin), q120 times keeper selection over the materialized
    *    stage. */
  private val stageCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def pinnedStage(s: SparkSession, key: String,
      make: => DataFrame): DataFrame =
    stageCache.computeIfAbsent(
      s"${s.sparkContext.applicationId}|$key", _ => make.localCheckpoint())

  private val stopwords = Seq("the", "a", "and", "of", "to")
  private val langMarkers = Map(
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("el", "la", "rapido"),
    "de" -> Seq("der", "die", "das"),
    "fr" -> Seq("le", "la", "vite"),
    "zh" -> Seq("de", "shi"))

  val queries: Map[String, Q] = Map(
    // Typo-tolerant entity resolution: deterministic single-char
    // corruption of a third of the part names, then resolve DISTINCT
    // names (pigeonhole segment blocking + levenshtein verify, prefix-4
    // candidate contract identical to the oracle) and map the per-name
    // best match back to rows. The q72 block/verify/keep shape on short
    // strings; the name space saturates as data grows, so verify cost
    // is ~constant (measured flat 0.001→0.1 SF) and only the row
    // map-back is linear.
    "q132_fuzzy_join" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .select(col("p_partkey").as("id"), col("p_name").as("name"))
      val dirty = p.filter(col("id") % 3 === 0)
        .withColumn("pos", (col("id") % (length(col("name")) - 6)) + 5)
        .select(col("id"), expr(
          "concat(substring(name, 1, CAST(pos AS INT)), 'q', " +
            "substring(name, CAST(pos + 2 AS INT)))").as("name"))
      graft.operators.FuzzyJoin.resolve(dirty, p, maxDist = 2, prefixLen = 4)
        .withColumn("dist", col("dist").cast(LongType))
        .orderBy("dirty_id")
    }),

    // Exact dedup: normalized-content digest groups, one row per distinct
    // content with its keeper (min doc_id) and duplicate count.
    "q70_exact_dedup" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(TextDedup.contentKey(col("text")).as("content_key"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .groupBy("n_copies")
        .agg(count(lit(1)).as("n_groups"), min(col("keeper")).as("first_keeper"))
        .orderBy("n_copies")
    }),

    // Near-dup pipeline end-to-end: MinHash-LSH candidate generation
    // (q72's scale path — banded equi-join, never all-pairs) followed by
    // exact token-set Jaccard VERIFICATION of only those candidates.
    // The oracle is the all-pairs ground truth on the same 5-source
    // block, so a green hash also certifies 100% candidate recall at
    // J ≥ 0.95 on this corpus. Blocking uses TOKEN-level minhash
    // (shingleW=1 — the verifier is token-set Jaccard, and reordered
    // near-dups share tokens, not 3-shingles) with bands=8/rows=4:
    // P[miss | J=0.95] = (1-0.95⁴)⁸ ≈ 1e-6 per pair, 0 for identical
    // token sets. Verification runs on hashed-long token arrays with a
    // size-ratio prefilter (TextDedup.verifyJaccard) — this corpus is
    // near-dup-dense, so the candidate set is large and verify cost,
    // not blocking, is the hot path.
    "q71_jaccard_neardup" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
      TextDedup.verifyJaccard(
        TextDedup.minhashCandidates(d, k = 32, bands = 8, shingleW = 1),
        d, threshold = 0.95)
        .orderBy("doc_a", "doc_b")
    }),

    // Fuzzy-dedup clustering end-to-end: LSH candidates → exact Jaccard
    // verify → connected components (min-label propagation) → canonical
    // keeper per cluster. Oracle recomputes the same clusters from
    // all-pairs ground truth + a recursive-CTE closure, so a green hash
    // certifies both 100% candidate recall AND the component labels.
    "q83_dedup_clusters" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
      TextDedup.clusterAssignments(d, threshold = 0.95, k = 32, bands = 8,
        shingleW = 1)
        .orderBy("doc_id")
    }),

    // Quality-aware keeper selection — the step AFTER clustering: for
    // each duplicate cluster keep the highest-quality member (q76's
    // score; ties → min doc_id), not blindly the min id. Composes the
    // full LSH→verify→CC cluster pipeline with the quality scorer; the
    // oracle recomputes clusters from all-pairs ground truth + the same
    // score, so a green hash certifies the whole composition.
    "q120_quality_keeper" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
      val clusters = pinnedStage(s, s"$dir|clusters",
        TextDedup.clusterAssignments(d, threshold = 0.95,
          k = 32, bands = 8, shingleW = 1))
      val quality = d.select(col("doc_id"),
        TextStats.qualityScore(col("text"), stopwords).as("quality"))
      val j = clusters.select("doc_id", "cluster_id").join(quality, "doc_id")
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("quality").desc, col("doc_id"))
      j.withColumn("rn", row_number().over(w))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy("cluster_id")))
        .filter(col("rn") === 1)
        .select(col("cluster_id"), col("doc_id").as("keeper"),
          col("n_members"), col("quality").as("keeper_quality"))
        .orderBy("cluster_id")
    }),

    // Benchmark decontamination: trigram overlap of each training doc
    // against a held-out eval sample (doc_id % 7 == 0 of the same block —
    // this corpus's near-dups are token REORDERINGS, so long verbatim
    // n-grams never collide; trigrams expose the shared phrasing while
    // staying order-sensitive, which is the point of the check).
    "q84_decontaminate" -> ((s, dir) => {
      val block = t(s, dir, "documents")
        .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
      Decontaminate.report(
        block.filter(col("doc_id") % 7 =!= 0),
        block.filter(col("doc_id") % 7 === 0),
        n = 3, flagRatio = 0.1)
        .orderBy("doc_id")
    }),

    // Deterministic mixture sampling: exact per-source quotas selected by
    // md5(doc_id) rank — the "data mixing" step that assembles a training
    // set to target source proportions, reproducibly (no RNG state).
    "q85_mixture_sample" -> ((s, dir) => {
      MixtureSample.sample(s, t(s, dir, "documents"),
        Map("src0" -> 12, "src1" -> 5, "src2" -> 18, "src3" -> 3, "src5" -> 25))
        .orderBy("source", "pick_rank")
    }),

    // MinHash-LSH candidate pairs (banded; no all-pairs join anywhere) —
    // approximate by design → rows-only check. Shape: sig (linear) →
    // band explode (×bands) → equi-join on (band, key) → distinct pairs.
    // Band selectivity matters: rowsPerBand = k/bands sets the jaccard
    // threshold (P[collide] = j^rows per band). rows=8 targets j≳0.8;
    // fewer rows over a small-vocabulary corpus floods buckets and the
    // in-bucket pair expansion goes quadratic.
    // Oracle-checked bit-for-bit via the portable md5-derived hash family
    // (the q73 trick): DuckDB recomputes the full shingle→minhash→band
    // pipeline. xxhash64 stays the library's scale default.
    "q72_minhash_lsh" -> ((s, dir) => {
      TextDedup.minhashCandidates(t(s, dir, "documents"), k = 32, bands = 4,
          portable = true)
        .orderBy("doc_a", "doc_b")
    }),

    // Incremental dedup against a PERSISTED signature index: the
    // existing corpus (doc_id % 5 != 0) is signed ONCE per (JVM, sf
    // dir) and written as the parquet index; each "daily batch"
    // (doc_id % 5 == 0) signs only itself and bucket-joins the stored
    // signatures. The oracle recomputes the FULL portable pipeline and
    // filters to batch-involving pairs — a green hash proves the
    // incremental path returns exactly the batch-involving subset of
    // the batch-mode result (the 100 TB daily-dedup contract: cost
    // follows the batch, not the corpus).
    "q117_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxPath = sigIndexDirs.computeIfAbsent(dir, _ => {
        val p = java.nio.file.Files.createTempDirectory("graft_sigidx").toString
        // partitionBy(band, pkey) layout: batch probes prune the scan
        // to their touched pkey directories (asserted in PlanAuditSpec)
        TextDedup.writeSigIndex(
          TextDedup.bandedSignatures(docs.filter(col("doc_id") % 5 =!= 0),
            k = 32, bands = 4, shingleW = 3, portable = true),
          p, parts = sigIndexParts)
        p
      })
      TextDedup.incrementalCandidates(docs.filter(col("doc_id") % 5 === 0),
          s.read.parquet(idxPath), k = 32, bands = 4, shingleW = 3,
          portable = true, pruneParts = sigIndexParts)
        .orderBy("doc_a", "doc_b")
    }),

    // q117's arrival-time form: the batch docs ARRIVE AS A STREAM
    // (4 files, maxFilesPerTrigger=2 → 2 triggers) and every
    // micro-batch joins the persisted index then appends its own
    // signatures — the growing index catches pairs split across
    // triggers when the later doc arrives, so the emitted set equals
    // the batch result regardless of how the stream is chopped (same
    // oracle as q117 proves it end-to-end; chop=1 equivalence stays
    // spec-pinned in StreamOpsSpec). Two triggers, not four: each
    // trigger pays a fixed index-scan + probe + append cost that
    // dominates at bench scale, and the cross-batch property needs
    // only >1 trigger — at production scale the trigger size is set
    // by arrival cadence, not by this knob.
    "q118_stream_incr_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (batchDir, seedDir) = streamDedupDirs.computeIfAbsent(dir, _ => {
        val bd = java.nio.file.Files.createTempDirectory("graft_sbatch").toString
        docs.filter(col("doc_id") % 5 === 0).select("doc_id", "text")
          .repartition(4).write.mode("overwrite").parquet(bd)
        val ix = java.nio.file.Files.createTempDirectory("graft_sigidx_s").toString
        TextDedup.writeSigIndex(
          TextDedup.bandedSignatures(docs.filter(col("doc_id") % 5 =!= 0),
            k = 32, bands = 4, shingleW = 3, portable = true),
          ix, parts = sigIndexParts)
        (bd, ix)
      })
      // truncate-on-reuse: previous run's working index + output are
      // dropped, the pristine seed is copied to a fresh working dir —
      // every invocation streams against an identical input.
      Option(streamDedupScratch.remove(dir)).foreach {
        case (oldIdx, oldOut) => deleteTree(oldIdx); deleteTree(oldOut)
      }
      val workIdx = java.nio.file.Files
        .createTempDirectory("graft_sigidx_w").toString
      copyTree(seedDir, workIdx)
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_sdedup_out").toString
      streamDedupScratch.put(dir, (workIdx, outDir))
      graft.streaming.StreamOps.incrementalDedupStream(s, batchDir, workIdx,
          queryName = "q118_" +
            java.util.UUID.randomUUID().toString.replace("-", ""),
          k = 32, bands = 4, shingleW = 3, portable = true,
          maxFilesPerTrigger = 2, pruneParts = sigIndexParts,
          outDir = Some(outDir))
        .orderBy("doc_a", "doc_b")
    }),

    // SimHash: 64-bit signatures, grouped by signature — hash collisions
    // = near-dup buckets. Deterministic (xxhash64) but not reasonably
    // SQL-expressible → rows-only.
    // SimHash signature grouping, oracle-checked bit-for-bit via the
    // portable md5-derived token hash (xxhash64 stays the library's
    // scale default — same plan shape, cheaper per-token hash).
    "q73_simhash" -> ((s, dir) => {
      TextDedup.simhashDf(t(s, dir, "documents"), bits = 48,
          tokenHash = TextDedup.portableHash)
        .groupBy("sig").agg(count(lit(1)).as("n"), min("id").as("keeper"))
        .orderBy(col("n").desc, col("sig"))
    }),

    // ANN baseline: exact cosine top-3 for queries vec_id < 5, exact
    // integer dot products → engine-identical ranking.
    "q74_ann_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 3)
        .orderBy("qid", "rank")
    }),

    // ANN scale path: multi-table LSH signature buckets + in-bucket exact
    // re-rank, reported as recall@3 vs the exact baseline (a pinned,
    // DuckDB-checked recall gate — see recallSummary).
    "q75_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 50)
      recallSummary(
        Ann.lshTopK(emb, qs, k = 3, nBits = 6, nTables = 8),
        exactTruth(s, dir, qMax = 50, k = 3))
    }),

    // Product-quantization ANN (ADC over per-subspace codebooks + exact
    // re-rank of survivors): the memory-bounded scale path — the search
    // scan reads m codes per corpus vector, not the embedding. Reported
    // as a pinned recall@3 gate (recallSummary).
    "q86_ann_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 20)
      recallSummary(
        Pq.pqTopK(emb, qs, k = 3, dim = 64, m = 8, ksub = 16, refine = 32),
        exactTruth(s, dir, qMax = 20, k = 3))
    }),

    "q82_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 20)
      recallSummary(
        Ann.ivfTopK(emb, qs, k = 3, nCells = 16, nProbe = 8),
        exactTruth(s, dir, qMax = 20, k = 3))
    }),

    // IVF ANN against the PERSISTED index (q82's scale path made real,
    // the dense sibling of q140): centroids + cell-partitioned
    // assignments written once; each query batch probes its nProbe
    // cells and the assignment scan partition-prunes to exactly those
    // directories. Bit-identical to the in-query IVF, so the same
    // pinned-recall oracle gates both.
    "q142_ann_ivf_indexed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idxPath = ivfIndexDirs.computeIfAbsent(dir, _ => {
        val p = java.nio.file.Files.createTempDirectory("graft_ivfidx").toString
        Ann.writeIvfIndex(emb, nCells = 16, kmeansIters = 1, p)
        p
      })
      val qs = emb.filter(col("vec_id") < 20)
      recallSummary(
        Ann.ivfTopKFromIndex(s, idxPath, qs, k = 3, nProbe = 8),
        exactTruth(s, dir, qMax = 20, k = 3))
    }),

    // Symmetric int8 embedding quantization — the embedding STORAGE
    // path at corpus scale (4x smaller than float32). Every published
    // column is an integer derived from the codes (dims, saturation
    // count, plain + position-weighted code sums), so DuckDB recomputes
    // the whole pipeline bit-for-bit — no float hashing anywhere.
    "q119_embed_quant" -> ((s, dir) => {
      graft.llm.Quantize.int8Report(t(s, dir, "embeddings"))
        .orderBy("vec_id")
    }),

    // IVF-PQ composition (the canonical 100 TB ANN layout): coarse
    // cells prune the scan to nProbe/nCells of the corpus, PQ codes
    // bound the bytes per scanned vector, exact integer re-rank of
    // survivors — reported as a pinned recall@3 gate like q75/q82/q86.
    "q116_ann_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 20)
      recallSummary(
        Pq.ivfPqTopK(emb, qs, k = 3, dim = 64, m = 8, ksub = 16,
          nCells = 16, nProbe = 8, refine = 32),
        exactTruth(s, dir, qMax = 20, k = 3))
    }),

    // Embedding-cosine near-dup dedup: label-blocked exact cosine pairs
    // (the brief's "embedding-cosine near-dup" method; blocking plays the
    // LSH-bucket role — q75 is the unblocked approximate path). Exact
    // integer dot products (floor(v·2^20) longs) → engine-identical
    // values.
    "q81_embedding_neardup" -> ((s, dir) => {
      graft.functions.DotProductF32.register(s)
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding"),
          Ann.norm2Exact(col("embedding")).as("n2"))
      val a = e.select(col("vec_id").as("va"), col("label"),
        col("embedding").as("ea"), col("n2").as("na"))
      val b = e.select(col("vec_id").as("vb"), col("label"),
        col("embedding").as("eb"), col("n2").as("nb"))
      a.join(b, Seq("label")).filter(col("va") < col("vb"))
        // two-phase: the native codegen'd dot (bit-identical to the HOF
        // double fold) prunes ~99% of pairs; the exact integer dot only
        // on survivors. The prune margin is PER PAIR — the
        // double-vs-quantized cosine drift is norm-dependent
        // (≤ ~2⁻²⁰·√dim·(1/|a|+1/|b|) first-order), so a fixed 1e-3
        // would silently drop boundary pairs on small-norm embeddings
        // (r13 advisor finding; same derivation as SemDedup.dedup) —
        // dim (not √dim) keeps it a strict upper bound.
        // na/nb are the quantized norm² longs (scaled by 2^40); the float
        // dot is unscaled, so restore true-cosine units with one exact
        // 2^40 factor before thresholding
        .withColumn("nda",
          sqrt(col("na").cast(DoubleType)) / lit(math.pow(2, 20)))
        .withColumn("ndb",
          sqrt(col("nb").cast(DoubleType)) / lit(math.pow(2, 20)))
        .withColumn("cos_fast",
          expr("dot_f32(ea, eb)") / (col("nda") * col("ndb")))
        .filter(col("cos_fast") >= lit(0.3) -
          lit(2.0 * math.pow(2, -20)) * size(col("ea")).cast(DoubleType) *
            (lit(1.0) / col("nda") + lit(1.0) / col("ndb")))
        .withColumn("dot", Ann.dotExact(col("ea"), col("eb")))
        .withColumn("cosine", Ann.cosineFrom(col("dot"), col("na"), col("nb")))
        .filter(col("cosine") >= 0.3)
        .select(col("va").as("vec_a"), col("vb").as("vec_b"),
          col("label"), round(col("cosine"), 6).as("cosine"))
        .orderBy("vec_a", "vec_b")
    }),

    // Text quality metrics per document (token counts, mean token len,
    // stopword/punct ratios, composite score).
    "q76_text_quality" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextStats.tokenCount(col("text")).as("n_tokens"),
          TextStats.meanTokenLen(col("text")).as("mean_tok_len"),
          TextStats.stopwordRatio(col("text"), stopwords).as("stop_ratio"),
          TextStats.punctRatio(col("text")).as("punct_ratio"),
          TextStats.qualityScore(col("text"), stopwords).as("quality"))
        .orderBy("doc_id")
    }),

    // Language-ID heuristic vs the labeled lang column: per-source
    // accuracy of the marker-lexicon argmax.
    "q77_langid" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("guess", TextStats.languageGuess(col("text"), langMarkers))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          count_if(col("guess") === col("lang")).as("n_correct"),
          count_if(col("guess") === "en").as("n_en_guess"))
        .orderBy("source")
    }),

    // BPE-ish token counting (pre-tokenizer regex) per source.
    "q78_token_count" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextStats.bpeishTokenCount(col("text")).as("n_bpe"),
          TextStats.tokenCount(col("text")).as("n_ws"))
        .groupBy("source")
        .agg(sum(col("n_bpe")).as("total_bpe"), sum(col("n_ws")).as("total_ws"),
          max(col("n_bpe")).as("max_bpe"))
        .orderBy("source")
    }),

    // Rolling-hash document fingerprint (integer arithmetic, portable).
    "q79_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextStats.rollingFingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // Multimodal plumbing: binary payload column + metadata + content
    // digest. (The mapPartitions decode stub is exercised in the test
    // suite; this query checks the oracle-able binary layer.)
    "q80_multimodal_binary" -> ((s, dir) => {
      Multimodal.syntheticMedia(t(s, dir, "documents"))
        .select(col("doc_id"), col("media_type"),
          octet_length(col("payload")).as("byte_len"),
          sha2(col("payload"), 256).as("digest"))
        .orderBy("doc_id")
    }),

    // REAL image codec round-trip: deterministic PNGs encoded with
    // javax.imageio executor-side, then DECODED with javax.imageio; the
    // decoded width/height/channel sums must equal the closed-form pixel
    // functions the oracle evaluates without any codec. Green ⇒ the
    // decode boundary is a real lossless codec, not a byte slice.
    "q111_image_decode" -> ((s, dir) => {
      Multimodal.decodeImageStats(s,
          pinnedStage(s, s"$dir|png",
            Multimodal.syntheticPngMedia(s, t(s, dir, "documents"))))
        .toDF()
        .orderBy("doc_id")
    }),

    // Perceptual image near-dup via average-hash over the REAL PNG
    // decode path: every 10th doc gets a planted color-rotated
    // duplicate ((r,g,b)→(g,b,r) — byte-wise a different PNG, same
    // luminance field). The aHash bits compare each grid cell's gray
    // sum to the image mean CROSS-MULTIPLIED (s_c·N > S·n_c, no
    // division), so planted dups hash identically by construction
    // while a byte digest separates them (Wave7Spec), and the oracle
    // replays every hash from the pixel closed form with no codec.
    // Per-row decode+hash, no shuffle; dedup is then a hash equi-join.
    "q200_image_phash_dedup" -> ((s, dir) =>
      Multimodal.imageAHash(s,
          pinnedStage(s, s"$dir|pngpair",
            Multimodal.syntheticPngPairMedia(s, t(s, dir, "documents"),
              dupOffset = 1000000000L)))
        .toDF()
        .orderBy("doc_id")),

    // REAL audio codec round-trip: deterministic 16-bit PCM clips
    // encoded to WAV with javax.sound.sampled executor-side, then
    // DECODED with javax.sound.sampled; the decoded channel count,
    // frame length and per-channel sample sums must equal the
    // closed-form sample functions the oracle evaluates without any
    // codec. Green ⇒ the audio boundary is a real lossless codec, not
    // a byte slice (the former declared stub, now closed — only video
    // remains stubbed).
    "q112_audio_decode" -> ((s, dir) => {
      Multimodal.decodeAudioStats(s,
          pinnedStage(s, s"$dir|wav",
            Multimodal.syntheticWavMedia(s, t(s, dir, "documents"))))
        .toDF()
        .orderBy("doc_id")
    }),

    // REAL video-container frame sampling: deterministic animated GIFs
    // encoded with javax.imageio's sequence writer executor-side, then
    // frame-extracted + stride-2 sampled with javax.imageio; the frame
    // count, sampled count and gray pixel sum over SAMPLED FRAMES ONLY
    // must equal the closed-form pixel functions the oracle evaluates
    // without any codec. Green ⇒ the video frame path is a real
    // multi-frame container decode (the last declared media stub, now
    // closed — only raw video codecs like H.264 stay stubbed, no
    // native libs in this container).
    "q115_video_frames" -> ((s, dir) => {
      Multimodal.decodeVideoFrameStats(s,
          pinnedStage(s, s"$dir|gif",
            Multimodal.syntheticGifMedia(s, t(s, dir, "documents"))),
          stride = 2)
        .toDF()
        .orderBy("doc_id")
    }),

    // ML remote-service enrichment (F6, the reference's last job with
    // no runnable analogue): translate + classify every document
    // through a REAL HTTP boundary — batched JSON POSTs with an API
    // key from inside mapPartitions (java.net.http client per
    // partition), the reference's retry-until-ready loop, and the
    // failed-translation fallback to the original body. The service is
    // an in-process deterministic stand-in whose model outputs are pure
    // functions of the payload, so DuckDB recomputes every enrichment
    // without any HTTP. The result is pinned as a local relation so the
    // service's lifecycle (start → enrich → stop) stays inside the
    // query body.
    "q113_ml_enrich" -> ((s, dir) => {
      val server = new MlService.FakeMlServer()
      try {
        // repartition to core count: the sf-dir documents scan is one
        // parquet split at bench SFs, which would serialize the whole
        // HTTP fan-out through a single task (measured 33 s at sf0.1);
        // on a real cluster this is the executor-level fan-out the
        // operator is designed around.
        val reports = t(s, dir, "documents").select(
          col("doc_id").as("uuid"),
          concat(lit("doc "), col("doc_id")).as("title"),
          col("text").as("body"))
          .repartition(s.sparkContext.defaultParallelism)
        // n_attempts is deliberately NOT published: a task retry (or
        // speculative duplicate) re-POSTs an already-seen uuid and the
        // server answers ready=true immediately, so attempts=1 where a
        // single clean run records 2 — a red row for a non-bug. The
        // retry-until-ready protocol itself stays spec-asserted
        // (MlServiceSpec) under controlled single-run conditions.
        val df = MlService.enrich(s, reports, server.base).toDF()
          .drop("n_attempts")
        val rows = df.collect() // bounded: one fixed-width row per doc
        s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
          .orderBy("uuid")
      } finally server.stop()
    }),

    // Within-doc n-gram repetition (the Gopher/FineWeb boilerplate
    // signal): pure per-row array arithmetic, pipelines inside the scan.
    "q57_repetition" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextStats.repetitionRatio(col("text"), 2).as("rep2"),
          TextStats.repetitionRatio(col("text"), 3).as("rep3"))
        .orderBy("doc_id")
    }),

    // PII scrub pass: deterministic email/URL injection (doc_id % 3), then
    // regex redaction; per-source counts + redacted-byte savings verify
    // byte-identical scrubbing across engines.
    "q58_pii_redact" -> ((s, dir) => {
      val aug = t(s, dir, "documents").withColumn("aug",
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com via https://site"), col("doc_id"), lit(".org/p")))
          .otherwise(col("text")))
      aug.select(col("source"), col("aug"),
          size(regexp_extract_all(col("aug"), lit(TextStats.emailRe), lit(0))).as("n_email"),
          size(regexp_extract_all(col("aug"), lit(TextStats.urlRe), lit(0))).as("n_url"),
          (length(col("aug")) - length(TextStats.redacted(col("aug")))).as("saved"))
        .groupBy("source")
        .agg(sum(col("n_email")).as("emails"), sum(col("n_url")).as("urls"),
          sum(col("saved")).as("bytes_saved"),
          count_if(col("n_email") + col("n_url") > 0).as("docs_with_pii"))
        .orderBy("source")
    }),

    // Verbatim-window duplicate detection (exact-substring dedup a la
    // "Deduplicating Training Data Makes Language Models Better"):
    // flag docs sharing an exact 8-token window with another doc.
    // LINEAR shape — per-gram document frequency then join back; never a
    // doc-pair join, and boilerplate windows (df > 10) are dropped the
    // same way the suffix-array pipeline drops over-common substrings.
    // Grams shuffle as 8-byte xxhash64 keys (TextStats.wordGramKeys),
    // not ~50-byte window strings — same distinct/df semantics (join-
    // with-space is injective over space-free tokens), 6× less shuffle
    // payload.
    "q68_window_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val grams = docs.select(col("doc_id"),
          explode(TextStats.wordGramKeys(col("text"), 8)).as("g"))
        .distinct()
      val dfreq = grams.groupBy("g").agg(count(lit(1)).as("df"))
      val flagged = grams
        .join(dfreq.filter(col("df").between(2, 10)), Seq("g"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup_windows"))
      docs.select("doc_id").join(flagged, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
          (coalesce(col("n_dup_windows"), lit(0L)) > 0).cast("int").as("dup_flag"))
        .orderBy("doc_id")
    }),

    // Sequence packing: shard-local contiguous packing into 512-token
    // bins (one window shuffle, no global sort), per-bin density stats.
    "q59_sequence_pack" -> ((s, dir) => {
      SeqPack.pack(t(s, dir, "documents"),
          TextStats.tokenCount(col("text")), seqLen = 512, nShards = 8)
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("shard", "bin")
    }),

    // Packing-efficiency audit over q59's concat packing: per shard,
    // bins used vs the ceil(tokens/512) lower bound and the fill rate
    // — the number that decides whether a packing strategy is wasting
    // paid-for sequence capacity at training time. Integer rollup of
    // the packed table; one division for the published rate.
    "q269_packing_audit" -> ((s, dir) => {
      SeqPack.pack(t(s, dir, "documents"),
          TextStats.tokenCount(col("text")), seqLen = 512, nShards = 8)
        .groupBy("shard").agg(
          count_distinct(col("bin")).as("n_bins"),
          sum("n_tok").as("tokens"),
          count(lit(1)).as("n_docs"))
        .withColumn("capacity", col("n_bins") * 512)
        .withColumn("lb_bins", expr("CAST((tokens + 511) div 512 AS BIGINT)"))
        .withColumn("overhead_bins", col("n_bins") - col("lb_bins"))
        .withColumn("fill_rate", col("tokens").cast(DoubleType) /
          col("capacity").cast(DoubleType))
        .orderBy("shard")
    }),

    // SemDeDup-style semantic dedup: deterministic sign-cell partition +
    // exact-cosine prune within cells; keeper = min vec_id per
    // neighborhood. Fully oracle-checked (the cell id and the decimal
    // cosine are both SQL-expressible).
    "q87_semantic_dedup" -> ((s, dir) => {
      SemDedup.dedup(t(s, dir, "embeddings"), tau = 0.2, signBits = 8)
        .orderBy("vec_id")
    }),

    // Corpus-size-adaptive SemDeDup — the 100 TB entry point. Identical
    // semantics to q87 but the sign-bit count is derived from count(*)
    // (SemDedup.signBitsFor) so expected cell occupancy stays pinned as
    // the corpus grows: within-cell pair volume is then LINEAR in n
    // instead of n²/2^bits. Measured at 100× data: fixed 8-bit q87 is
    // 318 s (super-linear pair blowup); this query stays linear. The
    // oracle derives the same bit count from count(*) with the same
    // integer-exact formula.
    "q122_semantic_dedup_auto" -> ((s, dir) => {
      SemDedup.dedupAuto(t(s, dir, "embeddings"), tau = 0.2,
        targetOccupancy = 64)
        .orderBy("vec_id")
    }),

    // Johnson–Lindenstrauss ±1 random projection (Achlioptas form) —
    // 64-dim embeddings down to 8 dims through an md5-DERIVED sign
    // matrix: no RNG, no stored matrix, identical on every engine.
    // floor(v·2^20)·s integer sums (the exact-cosine idiom) keep each
    // coordinate exact and order-independent; one divide by 2^20·√d at
    // the end.
    "q160_random_projection" -> ((s, dir) => {
      graft.llm.RandomProjection.project(
          t(s, dir, "embeddings").filter(col("vec_id") < 200),
          idCol = "vec_id", vecCol = "embedding", d = 8)
        .orderBy("vec_id", "j")
    }),

    // INCREMENTAL inverted-index maintenance — q140's persisted index
    // kept current under a CDC changelog (inserts: the held-out 10%,
    // updates: appended text, deletes: every 13th doc, delete-wins)
    // WITHOUT a rebuild: touched postings anti-joined away, changed
    // docs re-tokenized and appended; cost follows the changes, not
    // the corpus. Gate: BM25 over the maintained index must equal the
    // oracle's scoring of the FINAL corpus — maintenance ≡ rebuild.
    "q159_index_maintenance" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
        .select("doc_id", "text")
      val idx0 = pinnedStage(s, s"bm25idx0|$dir",
        graft.llm.Bm25.buildIndex(base))
      val inserts = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select(lit("I").as("op"), col("doc_id"), col("text"))
      val updates = docs.filter(pmod(col("doc_id"), lit(9)) === 0 &&
          pmod(col("doc_id"), lit(10)) =!= 0)
        .select(lit("U").as("op"), col("doc_id"),
          concat(col("text"), lit(" graft update")).as("text"))
      val deletes = docs.filter(pmod(col("doc_id"), lit(13)) === 0)
        .select(lit("D").as("op"), col("doc_id"),
          lit(null).cast(StringType).as("text"))
      // the maintained index feeds BOTH the term-filtered postings scan
      // and the full-index stats aggregate inside topKFromIndex —
      // checkpoint so the anti-join + re-tokenize delta apply runs once
      // (r16; postings are corpus-vocab bounded)
      val idx1 = graft.llm.Bm25.applyChanges(idx0,
        inserts.unionByName(updates).unionByName(deletes))
        .localCheckpoint()
      graft.llm.Bm25.topKFromIndex(idx1, bm25Queries, k = 10)
        .orderBy("query_id", "rank")
    }),

    // Deterministic negative-pair generation for contrastive training:
    // docs are placed on a B-bucket md5 ring, each bucket's canonical
    // representative is its min doc_id, and anchor i's j-th negative is
    // the representative of bucket (b(i) + stride_j) mod B — uniform-ish
    // pairing with ZERO RNG state, reproducible under any partitioning,
    // and one broadcast equi-join instead of any cross join. Self-pairs
    // are filtered (an anchor can land on its own bucket's rep).
    "q158_negative_pairs" -> ((s, dir) => {
      val b = 64
      val d = t(s, dir, "documents").select(col("doc_id"),
        pmod(graft.functions.BqShims.md5Bucket(col("doc_id")), lit(b.toLong))
          .as("bk"))
      val reps = d.groupBy("bk").agg(min("doc_id").as("neg_doc_id"))
      d.select(col("doc_id"), col("bk"),
          posexplode(array(Seq(7, 19, 31, 43).map(lit): _*)))
        .select(col("doc_id"), (col("pos") + 1).as("neg_rank"),
          pmod(col("bk") + col("col"), lit(b.toLong)).as("tb"))
        .join(broadcast(reps.withColumnRenamed("bk", "tb")), "tb")
        .filter(col("neg_doc_id") =!= col("doc_id"))
        .select("doc_id", "neg_rank", "neg_doc_id")
        .orderBy("doc_id", "neg_rank")
    }),

    // Weighted sampling without replacement via PRIORITY SAMPLING
    // (Duffield–Lund–Thorup): priority = w·2^32 / (md5_32(id)+1), keep
    // the top k, and publish the unbiased total-weight estimator
    // ŵ = max(w, τ) against the (k+1)-th priority threshold. Top-k is
    // TakeOrderedAndProject (bounded per-partition heaps), never a
    // global sort; every number replays bit-for-bit in the oracle.
    "q147_priority_sample" -> ((s, dir) => {
      graft.llm.PrioritySample.sample(
          t(s, dir, "documents").select("doc_id", "source", "n_chars"),
          idCol = "doc_id", weightCol = "n_chars", k = 64)
        .select("rank", "doc_id", "source", "n_chars", "priority", "w_hat")
        .orderBy("rank")
    }),

    // Temperature-scaled mixture sampling (sqrt-flattening): per-source
    // keep rate sqrt(min_n/n_s) — integer min_n, so no order-dependent
    // float normalizer — against the md5-derived portable per-doc
    // uniform. Report = per-source totals, kept counts, id checksums,
    // applied rate.
    "q125_temp_mixture" -> ((s, dir) => {
      MixtureSample.temperatureReport(t(s, dir, "documents"))
        .orderBy("source")
    }),

    // BM25 keyword retrieval (log-free Robertson idf, rational k1/b →
    // every term score is one exact integer ratio divided once in
    // double; per-query sums in fixed term order). One scan pass for
    // (dl, tf*), a 1-row broadcast stats agg, one ranking window over
    // matching docs. The oracle replays the identical arithmetic from
    // the SAME term list (bm25Sql is generated from bm25Queries).
    "q124_bm25" -> ((s, dir) => {
      graft.llm.Bm25.topK(t(s, dir, "documents"), bm25Queries, k = 10)
        .orderBy("query_id", "rank")
    }),

    // BPE merge learning: 6 most-frequent-adjacent-pair merges over the
    // corpus vocabulary (tokenizer training's core loop), learned on the
    // distinct-word frequency table so per-merge cost follows the
    // saturating vocab, not the corpus. Integer weights, total-order
    // argmax, literal-replace application — the oracle replays all six
    // steps unrolled.
    "q141_bpe_merges" -> ((s, dir) => {
      graft.llm.Bpe.learnMerges(t(s, dir, "documents"), m = 6)
        .orderBy("step")
    }),

    // BPE ENCODE — q141's learned merges applied back to the corpus:
    // m literal replaces over the distinct-word vocab (one chained
    // narrow projection, the vocab saturates while the corpus grows),
    // token counts joined onto the exploded corpus, per-source totals —
    // the "how many tokens is this corpus" training-budget question.
    "q148_bpe_encode" -> ((s, dir) => {
      graft.llm.Bpe.encodeCorpus(t(s, dir, "documents"), m = 6)
        .orderBy("source")
    }),

    // BM25 from the PERSISTED inverted index — the q124 scale path made
    // real: postings built once per corpus (pinned stage, the q117
    // persisted-index principle), each query batch probes only its
    // terms' postings and reassembles per-query sums in fixed term
    // order. Bit-identical to q124's full-scan scorer by construction,
    // so the same generated oracle gates both.
    "q140_bm25_indexed" -> ((s, dir) => {
      val idx = pinnedStage(s, s"bm25idx|$dir",
        graft.llm.Bm25.buildIndex(t(s, dir, "documents")))
      graft.llm.Bm25.topKFromIndex(idx, bm25Queries, k = 10)
        .orderBy("query_id", "rank")
    }),

    // Sliding-window chunking: overlapping 32-token windows every 16
    // tokens, sub-8-token tails dropped, md5 chunk identity — the
    // context-window shaping step before embedding/packing. Pure
    // per-row array ops, no shuffle (scan-bound at any scale).
    "q137_chunking" -> ((s, dir) => {
      graft.llm.Chunker.chunk(t(s, dir, "documents"),
          window = 32, stride = 16, minTokens = 8)
        .orderBy("doc_id", "chunk_id")
    }),

    // Hybrid retrieval: BM25 top-20 (q124's lexical scorer) fused with
    // exact-cosine dense top-20 (q74's scorer, query vectors 1-3) by
    // reciprocal-rank fusion — score-free combination, one IEEE divide
    // per contribution so both engines replay the fused ranking
    // exactly.
    "q138_hybrid_rrf" -> ((s, dir) => {
      val lex = graft.llm.Bm25.topK(t(s, dir, "documents"), bm25Queries, k = 20)
      val emb = t(s, dir, "embeddings")
      val dense = Ann.bruteForceTopK(emb,
        emb.filter(col("vec_id").isin(1, 2, 3)), k = 20)
      graft.llm.HybridRank.rrf(lex, dense, k0 = 60, topK = 10)
        .orderBy("query_id", "rank")
    }),

    // Group-aware train/val/test split: the md5 bucket of the GROUP key
    // (source), never the row, decides the split — so no group straddles
    // splits by construction (the leakage guard a contamination-safe
    // corpus split needs; row-hash splits leak near-duplicates across
    // the boundary). Deterministic, RNG-free, one aggregation.
    "q139_group_split" -> ((s, dir) => {
      val b = graft.functions.BqShims.md5Bucket(col("source")) % 10
      t(s, dir, "documents")
        .withColumn("split", when(b < 8, lit("train"))
          .when(b === 8, lit("val")).otherwise(lit("test")))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("source").as("n_groups"),
          sum("n_chars").as("total_chars"))
        .orderBy("split")
    }),

    // Integer-exact distributed k-means (Lloyd's; k=8, 2 fixed
    // iterations, grid-snapped vectors, deterministic lowest-id init):
    // the centroid-LEARNING operator behind IVF cell maps and semantic
    // dedup, expressed so DuckDB replays the whole two-iteration fit
    // bit-for-bit as unrolled CTEs (integer distances, portable
    // round-half-away centroid means). Report = per-cluster sizes, id
    // checksums and integer inertia.
    "q123_kmeans" -> ((s, dir) => {
      graft.llm.KMeans.report(
        graft.llm.KMeans.fit(s, t(s, dir, "embeddings"), k = 8, iters = 2))
    }),

    // Deterministic shard export: md5-derived shard id, write partitioned
    // parquet (the real training-data sink layout), read back and report
    // per-shard balance stats. The md5 shard key is what keeps shards
    // balanced and reproducible with no RNG state.
    // Token-BALANCED shard assignment (q88 balances rows by hash;
    // training shards are consumed by token budget): serpentine deal
    // over the token-descending global rank — the rank computed by the
    // scalable two-phase pattern (range exchange + per-partition
    // row_number + partition-offset broadcast), NEVER a single-
    // partition global Window. Published as the per-shard audit with
    // the max−min token spread the deal is meant to pin down.
    "q277_token_balanced_shards" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      ShardBalance.audit(ShardBalance.assign(
        docs, "doc_id", TextStats.tokenCount(col("text")), nShards = 16))
    }),

    // Systematic weighted resampling — EXACTLY m = 1000 draws with
    // every document's multiplicity within 1 of its exact expectation
    // m·w/W (the low-variance sampler a mixture builder uses where
    // multinomial drawing would over-draw hot documents): midpoint
    // targets on the cumulative token axis, multiplicity a per-row
    // BIGINT closed form over the two-phase distributed prefix sum (no
    // single-partition window, no RNG — the oracle replays every draw).
    // Result joins back broadcast (≤ m rows) for the per-source rollup.
    "q314_systematic_resample" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val drawn = graft.llm.Resample.systematic(
        d, "doc_id", TextStats.tokenCount(col("text")), m = 1000L)
      d.select(col("doc_id"), col("source"))
        .join(broadcast(drawn), Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs_drawn"), sum("mult").as("draws"),
          max("mult").as("max_mult"))
        .orderBy("source")
    }),

    // UniMax epoch-capped mixture budget (Chung 2023): equal token
    // budget per domain, except no domain repeats past 2 epochs — the
    // budget small domains cannot absorb re-spreads over the rest.
    // Domains group sources by suffix first-digit, which makes one
    // domain structurally ~11x the others — the skewed mixture UniMax
    // exists for (the raw fixture sources are near-uniform, where the
    // cap never binds). Closed-form waterfilling on the per-domain
    // count table (tiny by construction — see llm/UniMax scaladoc for
    // the prefix proof); budget = 1.5x the corpus tokens, exact BIGINT
    // end to end: the 9 small domains cap at 2 epochs, the big one
    // absorbs the rest at the water level.
    "q278_unimax_budget" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .groupBy(substring(col("source"), 4, 1).as("domain"))
        .agg(sum(TextStats.tokenCount(col("text")).cast(LongType))
          .as("n_tok"))
      UniMax.allocate(counts,
        budget = expr("(sum(n_tok) OVER () * 3) DIV 2"),
        epochCap = 2, srcCol = "domain")
    }),

    // Leakage-free train/val/test split: q139 hashes GROUPS (source)
    // and a doc-level hash split leaks near-duplicates across the
    // boundary — the classic eval-contamination failure. Here the
    // split key is the NEAR-DUP CLUSTER id (q83's LSH→verify→CC
    // pipeline, same pinned stage as q120), so a whole duplicate
    // cluster lands in one split by construction. The audit proves it
    // relationally: cluster_straddle (clusters spanning >1 split) must
    // be 0 under the cluster key, and naive_straddle shows the leakage
    // the doc-level hash would have caused on the same corpus. Scale:
    // the split is a per-row hash of an already-computed cluster id —
    // zero extra shuffles beyond the cluster stage itself.
    "q279_cluster_split" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
      val clusters = pinnedStage(s, s"$dir|clusters",
        TextDedup.clusterAssignments(d, threshold = 0.95,
          k = 32, bands = 8, shingleW = 1))
        .select("doc_id", "cluster_id")
      def splitOf(c: org.apache.spark.sql.Column) = {
        val b = graft.functions.BqShims.md5Bucket(c) % 10
        when(b < 8, lit("train")).when(b === 8, lit("val"))
          .otherwise(lit("test"))
      }
      // ONE pass: doc rows fold to the cluster level (split is a
      // function of cluster_id, so first() is exact), clusters fold to
      // the ≤3-row split level carrying their straddle partials, and
      // the global straddle totals are an unpartitioned window over
      // those ≤3 rows — no branch re-joins the corpus.
      val perCluster = clusters
        .join(d.select("doc_id", "n_chars"), "doc_id")
        .withColumn("split", splitOf(col("cluster_id")))
        .withColumn("naive_split", splitOf(col("doc_id")))
        .groupBy("cluster_id")
        .agg(first("split").as("split"),
          countDistinct("split").as("cs"),
          countDistinct("naive_split").as("ns"),
          count(lit(1)).as("docs"),
          sum("n_chars").as("chars"))
      val all = Window.partitionBy()
      perCluster.groupBy("split")
        .agg(sum("docs").as("n_docs"),
          count(lit(1)).as("n_clusters"),
          sum("chars").as("total_chars"),
          sum(when(col("cs") > 1, 1L).otherwise(0L)).as("cstr"),
          sum(when(col("ns") > 1, 1L).otherwise(0L)).as("nstr"))
        .withColumn("cluster_straddle", sum("cstr").over(all))
        .withColumn("naive_straddle", sum("nstr").over(all))
        .select(col("split"), col("n_docs"), col("n_clusters"),
          col("total_chars"), col("cluster_straddle"),
          col("naive_straddle"))
        .orderBy("split")
    }),

    // Quality-gate calibration curve — the operator the r14 threshold
    // scale audit did by hand: kept-docs/kept-tokens at every candidate
    // threshold, in ONE corpus pass. The quality score is recast in
    // integer deci-units (5/3/2 for the q76 length/stopword/punct
    // bands) so threshold comparisons are exact on any engine, the 11
    // (docs, tokens) pairs are conditional sums inside ONE 1-row
    // aggregate (no 11x row fan-out before the agg), and posexplode
    // turns the 1-row result back into the curve. A gate calibrated on
    // this curve at one SF can be re-checked at the next SF for the
    // q271-style saturation failure before it ships.
    "q280_quality_sweep" -> ((s, dir) => {
      val score10 =
        (when(TextStats.tokenCount(col("text")).between(10, 1000), lit(5))
            .otherwise(lit(0)) +
          when(TextStats.stopwordRatio(col("text"), stopwords) > 0.01,
            lit(3)).otherwise(lit(0)) +
          when(TextStats.punctRatio(col("text")) < 0.2, lit(2))
            .otherwise(lit(0))).cast(IntegerType)
      val scored = t(s, dir, "documents").select(score10.as("s10"),
        TextStats.tokenCount(col("text")).cast(LongType).as("n_tok"))
      val aggs = (0 to 10).flatMap { th => Seq(
        sum(when(col("s10") >= th, 1L).otherwise(0L)).as(s"d$th"),
        sum(when(col("s10") >= th, col("n_tok")).otherwise(0L)).as(s"t$th"))
      }
      scored.agg(aggs.head, aggs.tail: _*)
        .select(posexplode(array((0 to 10).map(th =>
          struct(col(s"d$th").as("kept_docs"),
            col(s"t$th").as("kept_tokens"))): _*)))
        .select(col("pos").cast(IntegerType).as("threshold10"),
          col("col.kept_docs"), col("col.kept_tokens"))
        .orderBy("threshold10")
    }),

    // Token-budget quality cut: keep the best documents (integer
    // deci-score desc, doc_id tiebreak) until a global token budget —
    // a quarter of the corpus — is spent; report the cut per source.
    // The corpus-wide running token total comes from ShardBalance's
    // two-phase machinery (range exchange + per-partition running sums
    // + a <=32-row offsets fold), and the budget itself falls out of
    // the same fold (`total`), so there is no single-partition window
    // and no second pass to compute the denominator.
    "q281_budget_cut" -> ((s, dir) => {
      val score10 =
        (when(TextStats.tokenCount(col("text")).between(10, 1000), lit(5))
            .otherwise(lit(0)) +
          when(TextStats.stopwordRatio(col("text"), stopwords) > 0.01,
            lit(3)).otherwise(lit(0)) +
          when(TextStats.punctRatio(col("text")) < 0.2, lit(2))
            .otherwise(lit(0))).cast(IntegerType)
      val scored = t(s, dir, "documents").select(col("doc_id"),
        col("source"), score10.as("s10"),
        TextStats.tokenCount(col("text")).cast(LongType).as("n_tok"))
      graft.llm.ShardBalance.globalOrderStats(scored,
          Seq(col("s10").desc, col("doc_id")))
        .withColumn("kept", col("cum") <= expr("total DIV 4"))
        .groupBy("source")
        .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"),
          sum(when(col("kept"), col("n_tok")).otherwise(0L))
            .as("kept_tokens"),
          count(lit(1)).as("n_docs"),
          sum("n_tok").as("total_tokens"))
        .orderBy("source")
    }),

    // Cell-occupancy drift audit — index-maintenance health for a
    // cell-partitioned ANN layout (the q122 sign-cell scheme, 6 bits =
    // 64 cells): the persisted corpus (90%) vs an arriving delta batch
    // (10%), per-cell occupancies, an overload flag (post-merge cell
    // above 1.25x mean occupancy — the SemDedup occupancy knob's
    // re-split trigger; 1.25x is the calibrated bar that fires on the
    // fixture's near-uniform cells at every SF where a 2x bar never
    // would — the q271 gate lesson), and the drift as ONE exact
    // cross-multiplied integer Σ|nb_i·td − nd_i·tb| (TVD scaled by
    // 2·tb·td — goes positive long before any single cell overloads).
    // All scalars ride an unpartitioned window over the ≤64-cell
    // frame; cell assignment is a per-row integer expression.
    "q289_cell_drift" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"),
        SemDedup.signCell(col("embedding"), signBits = 6).as("cell"))
      val all = Window.partitionBy()
      e.groupBy("cell")
        .agg(sum(when(col("vec_id") % 10 =!= 0, 1L).otherwise(0L))
            .as("n_base"),
          sum(when(col("vec_id") % 10 === 0, 1L).otherwise(0L))
            .as("n_delta"))
        .withColumn("n_total", col("n_base") + col("n_delta"))
        .withColumn("tb", sum("n_base").over(all))
        .withColumn("td", sum("n_delta").over(all))
        .withColumn("nc", count(lit(1)).over(all))
        .withColumn("overloaded",
          (col("n_total") * col("nc") * 4 >
            lit(5) * (col("tb") + col("td"))).cast(IntegerType))
        .withColumn("drift_num", sum(abs(
          col("n_base") * col("td") - col("n_delta") * col("tb")))
          .over(all))
        .select(col("cell"), col("n_base"), col("n_delta"),
          col("n_total"), col("overloaded"), col("drift_num"))
        .orderBy("cell")
    }),

    // Shard manifest — the reproducibility companion to q88's export:
    // per shard an ORDER-INDEPENDENT content fingerprint (bit_xor of
    // each doc's md5-derived 60-bit text hash — xor is the one
    // aggregate that is exact, commutative, and cannot overflow, so
    // the manifest is identical however the export was partitioned or
    // parallelized), plus counts and id bounds. Re-running an export
    // on any cluster and diffing manifests is the cheap end-to-end
    // "did we ship the same bytes" audit.
    "q287_shard_manifest" -> ((s, dir) => {
      def shardOf(id: org.apache.spark.sql.Column) = {
        val h = md5(id.cast("string"))
        ((ascii(substring(h, 1, 1)) * 31 + ascii(substring(h, 2, 1))) % 16)
          .cast("int")
      }
      t(s, dir, "documents")
        .select(col("doc_id"), shardOf(col("doc_id")).as("shard"),
          TextDedup.portableHash(col("text")).as("h"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          expr("bit_xor(h)").as("fingerprint"),
          min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"))
        .orderBy("shard")
    }),

    // Streaming shard manifest — q287 under continuous ingest
    // (StreamOps.shardManifestStream): each micro-batch appends
    // per-shard (count, xor) PARTIALS and the read-back folds them.
    // xor/+/min/max are associative+commutative, so the streamed
    // manifest equals the batch manifest regardless of trigger
    // chopping — which is why the oracle below is q287's, shared
    // verbatim (the same algebra that makes the manifest incrementally
    // maintainable makes stream == batch provable by one gate).
    "q292_stream_manifest" -> ((s, dir) => {
      def shardOf(id: org.apache.spark.sql.Column) = {
        val h = md5(id.cast("string"))
        ((ascii(substring(h, 1, 1)) * 31 + ascii(substring(h, 2, 1))) % 16)
          .cast("int")
      }
      val batchDir = streamManifestDirs.computeIfAbsent(dir, _ => {
        val bd = java.nio.file.Files
          .createTempDirectory("graft_smani_in").toString
        t(s, dir, "documents").select("doc_id", "text")
          .repartition(4).write.mode("overwrite").parquet(bd)
        bd
      })
      Option(streamManifestScratch.remove(dir)).foreach(deleteTree)
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_smani_out").toString
      streamManifestScratch.put(dir, outDir)
      graft.streaming.StreamOps.shardManifestStream(s, batchDir,
          shardOf, c => TextDedup.portableHash(c), outDir)
        .orderBy("shard")
    }),

    // Dedup-savings report — the PLANNING number the dedup family
    // exists to produce: per source, tokens raw vs tokens after exact
    // dedup (min-id keeper per normalized content key, q70's rule) vs
    // tokens after near-dup canonical selection (cluster min-id, the
    // q83 pipeline via the shared pinned stage). exact ≥ near always;
    // the gap is what MinHash buys over hashing, per source — the
    // number that decides whether the near-dup pass is worth its cost
    // on a new feed. One corpus pass + two keeper-id semi-flags.
    "q291_dedup_savings" -> ((s, dir) => {
      val block = t(s, dir, "documents")
        .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
      val d = block.select(col("doc_id"), col("source"),
        TextStats.tokenCount(col("text")).cast(LongType).as("tok"),
        TextDedup.contentKey(col("text")).as("ck"))
      val exactKeep = d.groupBy("ck").agg(min("doc_id").as("doc_id"))
        .select(col("doc_id"), lit(1).as("ek"))
      val canon = pinnedStage(s, s"$dir|clusters",
        TextDedup.clusterAssignments(block, threshold = 0.95,
          k = 32, bands = 8, shingleW = 1))
        .filter(col("is_canonical") === 1)
        .select(col("doc_id"), lit(1).as("nk"))
      d.join(exactKeep, Seq("doc_id"), "left")
        .join(canon, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("tok").as("tokens_raw"),
          sum(when(col("ek") === 1, col("tok")).otherwise(0L))
            .as("tokens_exact"),
          sum(when(col("nk") === 1, col("tok")).otherwise(0L))
            .as("tokens_near"))
        .orderBy("source")
    }),

    // Manifest diff — the q287 manifest's use-case: corpus version v1
    // (even doc ids) vs v2 (the full table), per shard. Because the
    // fingerprint is an xor fold, the DELTA fingerprint is just
    // fp_v1 XOR fp_v2 — the xor of exactly the documents that changed
    // — so version drift localizes to shards without touching any
    // document twice: changed = (fp_v1 != fp_v2), and a re-export
    // only needs the changed shards. This algebraic incrementality is
    // why the manifest uses xor rather than a concatenation hash.
    "q290_manifest_diff" -> ((s, dir) => {
      def shardOf(id: org.apache.spark.sql.Column) = {
        val h = md5(id.cast("string"))
        ((ascii(substring(h, 1, 1)) * 31 + ascii(substring(h, 2, 1))) % 16)
          .cast("int")
      }
      val d = t(s, dir, "documents")
        .select(col("doc_id"), shardOf(col("doc_id")).as("shard"),
          TextDedup.portableHash(col("text")).as("h"))
      d.groupBy("shard")
        .agg(
          sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("n_v1"),
          count(lit(1)).as("n_v2"),
          expr("bit_xor(CASE WHEN doc_id % 2 = 0 THEN h ELSE 0 END)")
            .as("fp_v1"),
          expr("bit_xor(h)").as("fp_v2"))
        .withColumn("delta_fp",
          expr("fp_v1 ^ fp_v2")) // xor of exactly the added docs' hashes
        .withColumn("changed", (col("fp_v1") =!= col("fp_v2"))
          .cast(IntegerType))
        .orderBy("shard")
    }),

    // Token-compression audit — chars per whitespace token, per
    // language: the tokenizer-budget check (a language whose words run
    // long pays more bytes per token of context; on real BPE vocab the
    // same audit is fertility). The fixture's BPE-ish and whitespace
    // counts coincide exactly (all-lowercase alnum words), so the
    // chars basis is the one with signal — measured spread
    // 5.455..5.511 across langs at the three SFs. Flag = language's
    // chars/token above the corpus mean, CROSS-MULTIPLIED in exact
    // integers; scalars ride an unpartitioned window over the ≤5-row
    // language frame.
    "q288_token_compression" -> ((s, dir) => {
      val all = Window.partitionBy()
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast(LongType)).as("total_chars"),
          sum(TextStats.tokenCount(col("text")).cast(LongType))
            .as("total_tokens"))
        .withColumn("high_chars_per_tok",
          (col("total_chars") * sum("total_tokens").over(all) >
            sum("total_chars").over(all) * col("total_tokens"))
            .cast(IntegerType))
        .orderBy("lang")
    }),

    // Streaming decontamination — the q84 gate under continuous
    // ingest (StreamOps.decontaminateStream): the corpus side arrives
    // in 4 micro-batches, each flagged against the static eval grams.
    // Decisions are batch-local by design (no cross-batch state), so
    // stream == batch independent of trigger chopping — which is why
    // the oracle below IS q84's oracle, shared verbatim.
    "q286_stream_decon" -> ((s, dir) => {
      val block = t(s, dir, "documents")
        .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
      val batchDir = streamDeconDirs.computeIfAbsent(dir, _ => {
        val bd = java.nio.file.Files
          .createTempDirectory("graft_sdecon_in").toString
        block.filter(col("doc_id") % 7 =!= 0).select("doc_id", "text")
          .repartition(4).write.mode("overwrite").parquet(bd)
        bd
      })
      Option(streamDeconScratch.remove(dir)).foreach(deleteTree)
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_sdecon_out").toString
      streamDeconScratch.put(dir, outDir)
      graft.streaming.StreamOps.decontaminateStream(s, batchDir,
          block.filter(col("doc_id") % 7 === 0), n = 3, flagRatio = 0.1,
          outDir = outDir)
        .orderBy("doc_id")
    }),

    // kNN label probe — the standard embedding-quality eval: for each
    // held-out vector (the q283 10% id split), do its 3 nearest train
    // neighbors (exact integer cosine, train_id tiebreak) vote its own
    // label? Per-label exact counts. The top-3-per-eval idiom is the
    // Filter+row_number shape the WindowTopKRewrite compiles to the
    // bounded-heap aggregate (partial top-k map-side — the pair volume
    // never sorts, and only 3 rows per eval id cross the exchange);
    // the majority vote is a 3-row-per-eval argmax with (votes desc,
    // label) tiebreak.
    "q285_knn_probe" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding"),
          Ann.norm2Exact(col("embedding")).as("n2"))
      val eval = e.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("eval_id"), col("label").as("elabel"),
          col("embedding").as("ee"), col("n2").as("ne"))
      val train = e.filter(col("vec_id") % 10 =!= 0)
        .select(col("vec_id").as("train_id"), col("label").as("tlabel"),
          col("embedding").as("et"), col("n2").as("nt"))
      val scored = train.crossJoin(broadcast(eval))
        .withColumn("cosine",
          Ann.dotExact(col("ee"), col("et")).cast(DoubleType) /
            (sqrt(col("ne").cast(DoubleType)) *
              sqrt(col("nt").cast(DoubleType))))
      val wNn = Window.partitionBy("eval_id")
        .orderBy(col("cosine").desc, col("train_id"))
      val top3 = scored.withColumn("rn", row_number().over(wNn))
        .filter(col("rn") <= 3)
      val wVote = Window.partitionBy("eval_id")
        .orderBy(col("votes").desc, col("tlabel"))
      top3.groupBy("eval_id", "elabel", "tlabel")
        .agg(count(lit(1)).as("votes"))
        .withColumn("vr", row_number().over(wVote))
        .filter(col("vr") === 1)
        .groupBy(col("elabel").as("label"))
        .agg(count(lit(1)).as("n_eval"),
          sum(when(col("tlabel") === col("elabel"), 1L).otherwise(0L))
            .as("n_correct"))
        .orderBy("label")
    }),

    // Epoch-schedule materialization — the step that turns q278's
    // UniMax token allocation into a RUNNABLE plan: alloc_tok of a
    // domain = full_epochs complete passes (alloc DIV n_tok; the
    // 2-epoch cap bounds it) + one partial pass sampled at the exact
    // leftover rate rem/n_tok with the md5-derived 60-bit per-doc
    // uniform (reproducible on any engine, no RNG state — the q85/q125
    // convention). Publishes the plan next to the realized partial
    // pick (docs, tokens) so a training job can audit how close the
    // deterministic sample lands to its token target. Two corpus
    // passes by construction — one to count (map-side combinable), one
    // to tag against the broadcast 10-row plan — the classic
    // plan/apply split.
    "q284_epoch_schedule" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        substring(col("source"), 4, 1).as("domain"),
        TextStats.tokenCount(col("text")).cast(LongType).as("tok"))
      val counts = docs.groupBy("domain").agg(sum("tok").as("n_tok"))
      val plan = UniMax.allocate(counts,
          budget = expr("(sum(n_tok) OVER () * 3) DIV 2"),
          epochCap = 2, srcCol = "domain")
        .withColumn("full_epochs", expr("alloc_tok DIV n_tok"))
        .withColumn("rem_tok",
          col("alloc_tok") - col("full_epochs") * col("n_tok"))
        .select("domain", "n_tok", "alloc_tok", "full_epochs", "rem_tok")
      docs.join(broadcast(plan), "domain")
        .withColumn("u",
          TextDedup.portableHash(col("doc_id").cast(StringType))
            .cast(DoubleType) / lit(1152921504606846976.0d)) // 2^60
        .withColumn("picked",
          col("u") * col("n_tok").cast(DoubleType) <
            col("rem_tok").cast(DoubleType))
        .groupBy("domain", "n_tok", "alloc_tok", "full_epochs", "rem_tok")
        .agg(sum(when(col("picked"), 1L).otherwise(0L)).as("sched_docs"),
          sum(when(col("picked"), col("tok")).otherwise(0L))
            .as("sched_tokens"))
        .orderBy("domain")
    }),

    // Embedding-space decontamination — the SEMANTIC twin of q84's
    // n-gram gate: an eval item is contaminated if some training
    // vector is too close in cosine, which catches paraphrases that
    // share no 8-gram. Eval = vec_id % 10 == 0 (the q117-style
    // deterministic holdout); per eval vector the max train cosine +
    // its argmin-id witness, flagged at 0.4 (non-degenerate at all
    // three SFs: the max-cosine range straddles it — measured
    // 0.28..0.53). Exact integer dots/norms (floor(v*2^20), the ANN
    // family's scheme) make the ranking engine-identical; cosine is
    // one fixed IEEE chain for publishing. Scale shape: eval is the
    // small side by construction — broadcast it, pairs reduce
    // MAP-SIDE to one row per eval id (partial max of (cosine, -id)
    // structs), so nothing pair-sized ever shuffles; the IVF/LSH
    // prune (q82/q75) is the drop-in at billion-row train sides.
    "q283_semantic_decon" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          Ann.norm2Exact(col("embedding")).as("n2"))
      val eval = e.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("eval_id"), col("embedding").as("ee"),
          col("n2").as("ne"))
      val train = e.filter(col("vec_id") % 10 =!= 0)
        .select(col("vec_id").as("train_id"), col("embedding").as("et"),
          col("n2").as("nt"))
      train.crossJoin(broadcast(eval))
        .withColumn("cosine",
          Ann.dotExact(col("ee"), col("et")).cast(DoubleType) /
            (sqrt(col("ne").cast(DoubleType)) *
              sqrt(col("nt").cast(DoubleType))))
        .groupBy("eval_id")
        .agg(max(struct(col("cosine"), (-col("train_id")).as("nid")))
          .as("m"))
        .select(col("eval_id"),
          round(col("m.cosine"), 6).as("max_cosine"),
          (-col("m.nid")).as("nearest_train"),
          (col("m.cosine") >= 0.4).cast(IntegerType).as("contaminated"))
        .orderBy("eval_id")
    }),

    // Bigram-LM surprisal rollup — the q166 CCNet-style filter raised
    // to bigram order (fluency, not just token rarity): every in-doc
    // bigram scores bitlen(p_den)−bitlen(p_num) of its exact-rational
    // KN probability (the ±1-bit integer proxy — float log-likelihoods
    // are libm/order-dependent across engines), docs roll up to
    // sources, and a source is flagged high-surprisal when its mean
    // bits/bigram exceeds the corpus mean CROSS-MULTIPLIED (exact
    // integers, non-degenerate at any SF by construction — the q271
    // gate lesson). Self-scored (model trained on the same corpus), so
    // every scoring bigram is in the model — no backoff path needed.
    // Scale: one (w1,w2) shuffle for the model, vocab-sized marginal
    // joins, and a (w1,w2)-keyed scoring join whose input is distinct
    // bigrams per doc; the flag scalars ride an unpartitioned window
    // over the 20-row source frame.
    "q282_kn_surprisal" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = graft.llm.KneserNey
        .bigramModel(docs, col("doc_id"), col("text"))
        .select(col("w1"), col("w2"),
          (length(bin(col("p_den"))) - length(bin(col("p_num"))))
            .cast(LongType).as("bits"))
      val perDoc = graft.llm.KneserNey
        .docBigramCounts(docs, col("doc_id"), col("text"), Seq("source"))
        .join(model, Seq("w1", "w2"))
        .groupBy("doc", "source")
        .agg(sum("tf").as("n_bg"),
          sum(col("tf") * col("bits")).as("bits_sum"))
      val all = Window.partitionBy()
      perDoc.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_bg").as("n_bigrams"),
          sum("bits_sum").as("bits_total"))
        .withColumn("high_surprisal",
          (col("bits_total") * sum("n_bigrams").over(all) >
            sum("bits_total").over(all) * col("n_bigrams"))
            .cast(IntegerType))
        .orderBy("source")
    }),

    "q88_shard_export" -> ((s, dir) => {
      def shardOf(id: org.apache.spark.sql.Column) = {
        val h = md5(id.cast("string"))
        ((ascii(substring(h, 1, 1)) * 31 + ascii(substring(h, 2, 1))) % 16).cast("int")
      }
      val docs = t(s, dir, "documents").withColumn("shard", shardOf(col("doc_id")))
      // one shard dir per (JVM, sf-dir), reused across invocations: bench
      // runs each query twice and plan-only consumers (DumpPlans,
      // PlanAuditSpec) also construct this query — a fresh never-deleted
      // temp dir per call leaked one full corpus copy each time. The
      // overwrite-mode write keeps the reused dir correct.
      val path = shardDirs.computeIfAbsent(dir, d =>
        java.nio.file.Files.createTempDirectory("graft_shards").toString)
      docs.repartition(col("shard"))
        .write.mode("overwrite").partitionBy("shard").parquet(path)
      s.read.parquet(path)
        .withColumn("shard", col("shard").cast("int"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          countDistinct("source").as("n_sources"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
        .orderBy("shard")
    }),

    // Pipeline CARD (r12 ask #7): the LLM-prep flagships fused as ONE
    // plan over the corpus — eval holdout → exact dedup → 8-gram
    // decontamination → quality gate → md5-rank mixture sample →
    // 512-token shard packing → partitioned export — publishing the
    // funnel counts + packing/shard stats. Every stage is a cumulative
    // survival FLAG on one frame (not a chain of filters), so the whole
    // funnel is: one broadcast gram join, three window passes (dedup
    // key, per-source sample rank, per-shard token offset — each a
    // single hash exchange), and ONE final aggregate. q89 audits a
    // smaller per-row funnel; this composes the cross-row operators
    // (dedup/decon/sample/pack) end-to-end under one oracle.
    "q271_pipeline_card" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val isEval = col("doc_id") % 7 === 0
      // contamination mask vs the eval holdout's 8-grams (q84 plan
      // shape, but an 8-token window: r13 shipped this gate at n=3 and
      // it SATURATED at sf0.1 — short grams lose discriminating power
      // as a bounded-vocabulary eval set grows (4285/4285 docs ≥10%
      // 3-gram-contaminated at sf0.1, vs ~77% at sf0.01), emptying the
      // funnel. 8-token windows are the Lee-2021/DupSpans scale: the
      // measured survivor curve is non-degenerate and near-flat across
      // sf0.001/0.01/0.1 (contaminated: 7/428, 9/428, 57/4285 —
      // PERF_NOTES r14 gate sweep), which is the invariant a
      // decontamination gate must hold as the holdout scales 100×.
      val contam = Decontaminate.report(docs.filter(!isEval),
          docs.filter(isEval), n = 8, flagRatio = 0.1)
        .select(col("doc_id"), col("contaminated"))
      val wK = Window.partitionBy("k").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wSrc = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wShard = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val flagged0 = docs
        .withColumn("is_eval", isEval)
        .withColumn("k", md5(lower(col("text"))))
        .join(contam, Seq("doc_id"), "left")
        // exact dedup among corpus docs: first non-eval row per content key
        .withColumn("cum_k", sum(when(!col("is_eval"), 1).otherwise(0)).over(wK))
        .withColumn("s1", !col("is_eval") && col("cum_k") === 1)
        .withColumn("s2", col("s1") && coalesce(col("contaminated"), lit(0)) === 0)
        .withColumn("s3",
          col("s2") && TextStats.qualityScore(col("text"), stopwords) >= 0.7)
        // sample rank counts SURVIVORS only (rank over the s3 subset,
        // computed without re-partitioning the frame)
        .withColumn("pick_rank", sum(when(col("s3"), 1).otherwise(0)).over(wSrc))
        // mixture quotas cover EVERY source (r13 verdict: the 5-entry
        // map silently zeroed 15 sources — an sf0.01 fixture artifact,
        // not a mixture decision). Unknown sources still coalesce to 0,
        // but now that path means "not in the recipe", not "forgot".
        .withColumn("quota", coalesce(element_at(
          typedLit(Map(
            "src0" -> 12, "src1" -> 5, "src2" -> 18, "src3" -> 3,
            "src4" -> 9, "src5" -> 25, "src6" -> 7, "src7" -> 14,
            "src8" -> 4, "src9" -> 21, "src10" -> 6, "src11" -> 11,
            "src12" -> 16, "src13" -> 2, "src14" -> 8, "src15" -> 19,
            "src16" -> 5, "src17" -> 13, "src18" -> 10, "src19" -> 22)),
          col("source")), lit(0)))
        .withColumn("s4", col("s3") && col("pick_rank") <= col("quota"))
        .withColumn("n_tok", TextStats.tokenCount(col("text")).cast("long"))
        .withColumn("shard", SeqPack.shardOf(col("doc_id"), 8))
        // greedy concat packing offset over the sampled stream (q59 form)
        .withColumn("off", sum(when(col("s4"), col("n_tok")).otherwise(0L)).over(wShard))
        .withColumn("bin", floor(coalesce(col("off"), lit(0L)) / 512))
      // the funnel frame feeds two actions (the sharded export and the
      // card aggregate); without a barrier the decontamination join and
      // all three windows execute twice. Project down to the ten columns
      // both consumers need (drops text) and checkpoint once (r16).
      val flagged = flagged0.select(col("doc_id"), col("source"),
          col("is_eval"), col("s1"), col("s2"), col("s3"), col("s4"),
          col("n_tok"), col("shard"), col("bin"))
        .localCheckpoint()
      // export the sampled set sharded (side effect + read-back proof,
      // the q88 pattern: shared dir per sf, overwrite keeps it correct)
      val path = shardDirs.computeIfAbsent(s"$dir#card",
        _ => java.nio.file.Files.createTempDirectory("graft_card").toString)
      val exportDf = flagged.filter(col("s4"))
        .select(col("doc_id"), col("source"), col("n_tok"), col("bin"), col("shard"))
      exportDf.repartition(col("shard"))
        .write.mode("overwrite").partitionBy("shard").parquet(path)
      // read-back with the writer's schema, NOT inference: an empty
      // funnel writes only _SUCCESS, and schema inference on a
      // part-file-less dir throws UNABLE_TO_INFER_SCHEMA (r13's sf0.1
      // crash). With the schema given, zero survivors is what it
      // should be — a zero-row answer. Empty-result robustness is
      // table stakes for any export stage at scale.
      val exported = s.read.schema(exportDf.schema).parquet(path).count()
      val agg = flagged.agg(
        count(lit(1)).as("n_raw"),
        count(when(!col("is_eval"), 1)).as("n_corpus"),
        count(when(col("s1"), 1)).as("n_dedup"),
        count(when(col("s2"), 1)).as("n_decon"),
        count(when(col("s3"), 1)).as("n_quality"),
        count(when(col("s4"), 1)).as("n_sampled"),
        countDistinct(when(col("s4"), col("shard") * 100000L + col("bin"))).as("n_bins"),
        countDistinct(when(col("s4"), col("shard"))).as("n_shards"),
        sum(when(col("s4"), col("n_tok")).otherwise(0L)).as("n_tokens"))
      def stage(i: Int, name: String, c: org.apache.spark.sql.Column) =
        struct(lit(i).as("stage_idx"), lit(name).as("stage"),
          c.cast("long").as("n"))
      agg.select(explode(array(
          stage(0, "raw", col("n_raw")),
          stage(1, "eval_holdout", col("n_corpus")),
          stage(2, "exact_dedup", col("n_dedup")),
          stage(3, "decontaminated", col("n_decon")),
          stage(4, "quality", col("n_quality")),
          stage(5, "sampled", col("n_sampled")),
          stage(6, "packed_bins", col("n_bins")),
          stage(7, "shards", col("n_shards")),
          stage(8, "tokens_packed", col("n_tokens")),
          stage(9, "exported_rows", lit(exported)))).as("st"))
        .select(col("st.stage_idx"), col("st.stage"), col("st.n"))
        .orderBy("stage_idx")
    }),

    // Data-prep pipeline funnel: length -> language -> quality ->
    // exact-dedup cascade with per-stage survivor counts, computed as
    // cumulative survival flags + one aggregation — a genuine single
    // pass over the corpus (auditOnePass).
    "q89_prep_pipeline" -> ((s, dir) => {
      PrepPipeline.auditOnePass(t(s, dir, "documents"),
        Seq(
          "min_length" -> (col("n_chars") >= 120),
          "lang_en" -> (col("lang") === "en"),
          "quality" -> (TextStats.qualityScore(col("text"), stopwords) >= 0.7)),
        dedupKey = Some("exact_dedup" -> md5(lower(col("text")))))
        .orderBy("stage_idx")
    }),

    // CCNet-style LM quality filter, integer-exact: unigram surprisal
    // via the bit-length proxy bitlen(N)-bitlen(c) (= ⌊log2⌋+1, exact
    // as length(bin(x)) in any engine), keep-decision cross-multiplied
    // at mean ≤ 101/20 bits/token. One token shuffle for the LM, one
    // (doc,token) reduce, one vocab join — no floats anywhere.
    "q166_surprisal_filter" -> ((s, dir) => {
      graft.llm.Surprisal.scoreDocs(t(s, dir, "documents"),
          "doc_id", "text", maxMeanBitsNum = 101, maxMeanBitsDen = 20)
        .orderBy("doc_id")
    }),

    // Exact duplicated-substring spans (Lee et al. 2021, "Deduplicating
    // Training Data Makes Language Models Better"): every 8-token
    // window occurring in >1 document is a duplicated window; per doc,
    // overlapping duplicated windows merge into maximal spans
    // (gaps-and-islands over window starts). Published: span count +
    // duplicated-token count per affected doc — integers only. Scale:
    // windows explode 1:~len rows, the gram count is one shuffle, the
    // span merge is one per-doc window pass; no all-pairs anywhere.
    "q168_dup_spans" -> ((s, dir) =>
      graft.llm.DupSpans.spans(t(s, dir, "documents"), "doc_id", "text",
        w = 8).orderBy("doc_id")),

    // Chunk-embedding mean pooling: chunk vectors (4 consecutive
    // embeddings = one "document") pooled elementwise into a doc
    // vector via llm/Pooling.meanPoolCells (decimal-accumulated,
    // order-independent — see the operator Scaladoc). Published in
    // EXPLODED (doc, pos, m, n) scalar form: r11's ARRAY<DOUBLE>
    // publish crashed the driver's pandas comparator (numpy arrays
    // are unhashable under sort_values — CORRECTNESS_r11 q185); the
    // array form stays available as Pooling.meanPool.
    "q185_embed_pool" -> ((s, dir) => {
      graft.llm.Pooling.meanPoolCells(t(s, dir, "embeddings"),
          expr("vec_id div 4"), col("embedding"))
        .toDF("doc", "pos", "m", "n")
        .orderBy("doc", "pos")
    }),

    // Max pooling over the same chunk groups — the "any chunk fires"
    // feature semantics (exact in any merge order, so a plain double
    // max). Same exploded publish contract as q185.
    "q250_pool_max" -> ((s, dir) => {
      graft.llm.Pooling.maxPoolCells(t(s, dir, "embeddings"),
          expr("vec_id div 4"), col("embedding"))
        .toDF("doc", "pos", "m")
        .orderBy("doc", "pos")
    }),

    // CLS pooling: the group's FIRST vector (min vec_id) stands for
    // the document — one min_by aggregation, no window, then exploded
    // for the publish contract. Float→double cast is exact.
    "q251_pool_cls" -> ((s, dir) => {
      graft.llm.Pooling.clsPool(t(s, dir, "embeddings"),
          expr("vec_id div 4"), col("embedding"), col("vec_id"))
        .select(col("g").as("doc"), col("ord"),
          posexplode(col("pooled")))
        .select(col("doc"), col("ord"), col("pos"),
          col("col").cast(DoubleType).as("v"))
        .orderBy("doc", "pos")
    }),

    // Asymmetric CONTAINMENT near-dup (sub-document duplication — the
    // case Jaccard misses when a small doc is swallowed by a big one):
    // containment(A→B) = |S(A) ∩ S(B)| / |S(A)| ≥ 80% over distinct
    // 3-shingle sets via the PPJoin-style prefix filter (candidates
    // from each doc's rarest ⌊0.2·sz⌋+1 shingles — complete by the
    // prefix theorem; the naive Σdf² shingle self-join measured 2.8M
    // join rows at sf0.1 and grows quadratically under a fixed vocab).
    // Exact intersection per candidate via array_intersect. The oracle
    // IS the naive join — an independent implementation.
    "q184_containment_dedup" -> ((s, dir) =>
      graft.llm.ContainmentJoin.pairs(t(s, dir, "documents"),
          "doc_id", "text", shingleW = 3, num = 4, den = 5)
        .select(col("a"), col("b"), col("inter"), col("size_a"),
          lit(true).as("contained"))
        .orderBy("a", "b")),

    // PMI collocation extraction, integer-exact: a bigram (a,b) with
    // count ≥ 5 is a collocation iff PMI > 0 (above independence — 437
    // of 900 candidates at sf0.01, a real split), tested log-free by
    // cross-multiplication in DECIMAL(38,0) — c12·N² > M·c1·c2 (N =
    // token count for unigram probs, M = bigram count for the pair
    // prob; decimal keeps the product exact at any corpus size where a
    // BIGINT would overflow). One bigram shuffle + two vocab joins.
    "q174_pmi_collocations" -> ((s, dir) => {
      val dec = DecimalType(38, 0)
      val toks = t(s, dir, "documents").select(col("doc_id"),
        graft.llm.Surprisal.tokens(col("text")).as("toks"))
      val bi = toks.select(posexplode(when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => struct(element_at(col("toks"), i).as("w1"),
              element_at(col("toks"), i + 1).as("w2"))))
          .otherwise(array())))
        .select(col("col.w1"), col("col.w2"))
      val uni = toks.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val n1 = uni.agg(sum("c").as("n1"))
      val big = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val m = big.agg(sum("c12").as("m"))
      big.filter(col("c12") >= 5)
        .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
        .crossJoin(broadcast(n1)).crossJoin(broadcast(m))
        .select(col("w1"), col("w2"), col("c12"),
          (col("c12").cast(dec) * col("n1").cast(dec) * col("n1").cast(dec) >
            col("m").cast(dec) * col("c1").cast(dec) *
              col("c2").cast(dec)).as("colloc"))
        .orderBy("w1", "w2")
    }),

    // Training-shard label-balance audit: embeddings land on 8 md5
    // shards (the q88 deterministic export key) and each shard's label
    // distribution is gated against the global one with the q150
    // integer-exact TVD (cross-multiplied, scaled by shard_n·total_n).
    // A skewed shard starves a training job of a class; the gate says
    // which shard and by how much, no floats anywhere.
    "q238_shard_balance" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(
        pmod(graft.functions.BqShims.md5Bucket(col("vec_id")), lit(8L))
          .as("shard"),
        col("label"))
      val cell = e.groupBy("shard", "label").agg(count(lit(1)).as("c"))
      val shardN = e.groupBy("shard").agg(count(lit(1)).as("sn"))
      val labelN = e.groupBy("label").agg(count(lit(1)).as("ln"))
      val totalN = e.agg(count(lit(1)).as("tn"))
      // FULL shard × label grid (ADVICE r11): a shard entirely missing
      // a label — the worst imbalance this audit exists to catch — has
      // no (shard,label) cell, and a cell-only sum would silently drop
      // its |0·tn − ln·sn| term. The grid is #shards × #labels rows
      // (tiny at any scale: both sides are aggregates).
      val grid = shardN.crossJoin(broadcast(labelN))
      grid.join(cell, Seq("shard", "label"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
        .crossJoin(broadcast(totalN))
        .groupBy(col("shard"), col("sn"), col("tn"))
        .agg(sum(abs(col("c") * col("tn") - col("ln") * col("sn")))
          .as("tvd_scaled"))
        .select(col("shard"), col("sn").as("n_rows"), col("tvd_scaled"),
          (col("tvd_scaled") * 10 > col("sn") * col("tn") * 2)
            .as("imbalanced"))
        .orderBy("shard")
    }),

    // Cross-source content leakage report (corpus governance: the same
    // text appearing under multiple sources means licensing/provenance
    // review, and dedup-by-source quotas silently double-count it):
    // exact content keys grouped, keys spanning >1 source counted with
    // the docs involved. One digest group-by — the q70 exact-dedup
    // shuffle with a provenance lens.
    "q237_cross_source_leakage" -> ((s, dir) => {
      val keyed = t(s, dir, "documents")
        .select(md5(lower(col("text"))).as("k"), col("source"))
      val perKey = keyed.groupBy("k")
        .agg(count_distinct(col("source")).as("n_sources"),
          count(lit(1)).as("n_docs"))
      perKey.agg(count(lit(1)).as("n_keys"),
          count_if(col("n_sources") > 1).as("n_leaked_keys"),
          coalesce(sum(when(col("n_sources") > 1, col("n_docs"))), lit(0L))
            .as("n_docs_involved"),
          coalesce(max(col("n_sources")), lit(0L)).as("max_sources"))
    }),

    // Distinctive terms per source, c-TF-IDF style (the BERTopic
    // class-based TF-IDF topic-labeling step): each source's terms
    // rank by tf_in_source / corpus_tf — the lift of the term inside
    // the class — with min support 5. The ratio is one IEEE integer÷
    // integer divide (deterministic, q220 discipline), ties break by
    // token; top-3 per source. One token shuffle builds both counts;
    // the corpus vocab joins back partial-aggregated.
    "q225_distinctive_terms" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, dir, "documents").select(col("source"),
        explode(graft.llm.Surprisal.tokens(col("text"))).as("tok"))
      val bySrc = toks.groupBy("source", "tok").agg(count(lit(1)).as("tf"))
        .filter(col("tf") >= 5)
      val corpus = bySrc.groupBy("tok").agg(sum("tf").as("ctf"))
      val scored = bySrc.join(corpus, "tok")
        .withColumn("lift", col("tf").cast(DoubleType) /
          col("ctf").cast(DoubleType))
      val w = Window.partitionBy("source")
        .orderBy(desc("lift"), col("tok"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("source"), col("rank"), col("tok"), col("tf"),
          col("ctf"), round(col("lift"), 6).as("lift"))
        .orderBy("source", "rank")
    }),

    // Vocabulary-coverage / OOV-rate audit (the tokenizer-vocab check
    // run before committing a training corpus): the reference vocab is
    // the corpus's own top-20 tokens (count DESC, token ASC — fully
    // deterministic), every token outside it counts as OOV, and each
    // source gets a cross-multiplied coverage gate (OOV < 10%). The
    // vocab is a 20-row broadcast; the corpus pass is one explode +
    // partial-aggregatable rollup — linear at any scale.
    "q219_oov_rate" -> ((s, dir) => {
      val toks = t(s, dir, "documents").select(col("source"),
        explode(graft.llm.Surprisal.tokens(col("text"))).as("tok"))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), col("tok")).limit(20)
        .select(col("tok"), lit(1).as("in_v"))
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          count_if(col("in_v").isNull).as("n_oov"))
        // gate calibrated to DISCRIMINATE (r14 gate audit): the corpus
        // vocabulary is ~31 tokens, so top-20 coverage leaves every
        // source with a 30-35% OOV rate — the old <10% bar was all-fail
        // at every SF (a gate with no discriminating power, the q271
        // saturation failure mode in the other direction). A 33% bar
        // sits inside the observed rate distribution and splits
        // sources at every SF (15/14/12 of 20 pass at sf0.001/.01/.1);
        // integer cross-multiply keeps it engine-exact.
        .select(col("source"), col("n_tokens"), col("n_oov"),
          (col("n_oov") * 100 < col("n_tokens") * 33).as("coverage_ok"))
        .orderBy("source")
    }),

    // Hard-negative mining for contrastive training (q74's exact-cosine
    // machinery + a label-mismatch predicate): for each of 20 query
    // vectors, the 5 nearest DIFFERENT-label candidates — the
    // "looks similar, means different" pairs an embedding fine-tune
    // wants. Decimal-exact dots, deterministic (cosine DESC, cid) tie
    // order; at corpus scale the candidate set comes from the IVF/LSH
    // probes and this exact form is their recall oracle.
    "q209_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.llm.Ann.hardNegatives(emb, emb.filter(col("vec_id") < 20), k = 5)
        .orderBy("qid", "rank")
    }),

    // fastText-style hashed linear classifier inference (Joulin et al.
    // 2016) — the model-based-filtering stage of an LLM data pipeline,
    // with ZERO shuffles: tokens hash into 256 feature buckets, the
    // (bucket, class) weights are closed-form integers from the
    // portable 60-bit mix, and each document folds its own bucket
    // array per class with `aggregate`. No weight join, no broadcast,
    // no exchange — the plan is a single projected scan, linear in
    // corpus bytes at any scale. First-max argmax, scores published.
    "q193_linear_classifier" -> ((s, dir) =>
      graft.llm.LinearClassifier.classify(t(s, dir, "documents"),
        "doc_id", "text", classes = 4, buckets = 256).orderBy("doc_id")),

    // Token-budget apportionment across sources (the "data mixture"
    // allocation step): a 1M-token training budget split across the
    // corpus sources proportionally to their token mass by the
    // largest-remainder (Hamilton) method — base = floor(T·w/W), the
    // T − Σbase leftover units go to the largest remainders (source
    // name breaks ties) — so allocations are integer-exact, sum to T
    // exactly, and replay identically in the oracle. One map-side
    // token-length scan + a sources-sized window; nothing else moves.
    "q196_token_budget" -> ((s, dir) => {
      val T = 1000000L
      val w = t(s, dir, "documents")
        .select(col("source"),
          size(graft.llm.Surprisal.tokens(col("text"))).cast(LongType)
            .as("n"))
        .groupBy("source").agg(sum("n").as("w"))
      val tot = w.agg(sum("w").as("w_tot"))
      val base = w.crossJoin(broadcast(tot))
        .select(col("source"), col("w"),
          expr(s"CAST(($T * w) div w_tot AS BIGINT)").as("base"),
          expr(s"CAST(($T * w) % w_tot AS BIGINT)").as("rem"))
      val wAll = Window.orderBy(desc("rem"), col("source"))
      val wSum = Window.partitionBy(lit(1))
      base
        .withColumn("rk", row_number().over(wAll))
        .withColumn("leftover", lit(T) - sum("base").over(wSum))
        .select(col("source"), col("w"), col("base"),
          when(col("rk") <= col("leftover"), 1L).otherwise(0L).as("extra"))
        .withColumn("alloc", col("base") + col("extra"))
        .orderBy("source")
    }),

    // Entity-resolution linkage scored by the native Jaro-Winkler
    // expression (functions/JaroWinkler.scala) — the name-matching
    // scorer Levenshtein-based q132 can't express (JW rewards shared
    // prefixes and tolerates transpositions). Blocked equi-join on
    // (brand, size) — candidate volume is sum of block² (160k pairs at
    // sf0.1, never all-pairs), the same blocking discipline as
    // FuzzyJoin; the scorer runs inside whole-stage codegen in exact
    // micro-units, so the oracle (DuckDB's jaro_winkler_similarity,
    // ROUND(*1e6)) replays it bit-for-bit — divergence verified zero
    // over ~180k pairs at three SFs.
    "q254_jw_linkage" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val a = p.select(col("p_partkey").as("k1"), col("p_name").as("n1"),
        col("p_brand").as("blk_b"), col("p_size").as("blk_s"))
      val b = p.select(col("p_partkey").as("k2"), col("p_name").as("n2"),
        col("p_brand").as("blk_b"), col("p_size").as("blk_s"))
      a.join(b, Seq("blk_b", "blk_s")).filter(col("k1") < col("k2"))
        .withColumn("jw_micro",
          graft.functions.JaroWinklerMicro(col("n1"), col("n2")))
        .filter(col("jw_micro") >= 850000L)
        .select("k1", "k2", "n1", "n2", "jw_micro")
        .orderBy("k1", "k2")
    }),

    // Unicode NFC canonicalization (functions/NfcNormalize.scala) —
    // the dedup-key prerequisite: composed 'é' and 'e'+U+0301 are the
    // same text but different bytes, so un-normalized corpora split
    // exact-dedup groups and shingle hashes. Inputs are part names
    // with a deterministic decomposed accent appended (the corpus
    // itself is ASCII); per-row map, no shuffle, NFC fast-path keeps
    // already-normalized rows allocation-free. Oracle: DuckDB
    // nfc_normalize — byte-identical UAX#15.
    "q255_unicode_normalize" -> ((s, dir) => {
      val marks = array(lit("\u0301"), lit("\u030a"), lit("\u0302\u0301"))
      val raw = concat(col("p_name"), lit("e"),
        element_at(marks, (col("p_partkey") % 3 + 1).cast(IntegerType)))
      t(s, dir, "part")
        .select(col("p_partkey").as("k"), raw.as("raw"))
        .select(col("k"), col("raw"),
          graft.functions.NfcNormalize(col("raw")).as("norm"))
        .select(col("k"), col("norm"),
          length(col("raw")).cast(LongType).as("len_raw"),
          length(col("norm")).cast(LongType).as("len_norm"))
        .withColumn("composed", col("len_norm") < col("len_raw"))
        .orderBy("k")
    }),

    // Matryoshka truncation eval: recall@10 of a 16-dim-prefix
    // ranking vs the full 64-dim exact ranking — the measurement that
    // decides how far MRL embeddings can be truncated before retrieval
    // quality pays. Dot products are exact integers (floor(v·2^20)
    // per side, products ≤2^40, 64-term sums ≤2^46 — engine- and
    // order-identical); queries are broadcast so candidates never
    // shuffle for scoring; the per-query top-10 window shuffles only
    // (n_q × n_c) scored pairs. At corpus scale the candidate side
    // would route through the IVF index (q142) instead of brute
    // force — this query is the truncation QUALITY gate, not the
    // serving path.
    "q256_matryoshka_recall" -> ((s, dir) => {
      val pairs = dotPairs(s, dir)
      val wF = Window.partitionBy("qid").orderBy(desc("dot_full"), col("cid"))
      val wT = Window.partitionBy("qid").orderBy(desc("dot_16"), col("cid"))
      val topF = pairs.withColumn("r", row_number().over(wF))
        .filter(col("r") <= 10).select("qid", "cid")
      val topT = pairs.withColumn("r", row_number().over(wT))
        .filter(col("r") <= 10).select("qid", "cid")
      val hits = topF.join(topT, Seq("qid", "cid"))
        .groupBy("qid").agg(count(lit(1)).as("hits"))
      pairs.select("qid").distinct()
        .join(hits, Seq("qid"), "left")
        .withColumn("hits", coalesce(col("hits"), lit(0L)))
        .withColumn("recall", col("hits").cast(DoubleType) / lit(10.0))
        .orderBy("qid")
    }),

    // Retrieval eval metrics over the exact full-dim ranking:
    // precision@10 and MRR@10 with label-match relevance. Reciprocal
    // ranks stay EXACT integers via the 2520 trick (2520 = lcm(1..10),
    // so 2520/rank is integral for every in-window rank) — no float
    // fold across queries, so corpus-level MRR aggregates of these
    // rows stay order-independent at any scale. Same scored-pairs
    // plan as q256.
    "q257_retrieval_metrics" -> ((s, dir) => {
      val lab = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"))
      val ranked = dotPairs(s, dir)
        .join(lab.select(col("vec_id").as("qid"), col("label").as("ql")), Seq("qid"))
        .join(lab.select(col("vec_id").as("cid"), col("label").as("cl")), Seq("cid"))
        .withColumn("r", row_number().over(
          Window.partitionBy("qid").orderBy(desc("dot_full"), col("cid"))))
        .filter(col("r") <= 10)
        .withColumn("rel", (col("ql") === col("cl")).cast(LongType))
      ranked.groupBy("qid").agg(
        sum("rel").as("n_rel10"),
        min(when(col("rel") === 1L, col("r"))).as("first_rel0"))
        .select(col("qid"),
          coalesce(col("first_rel0"), lit(0L)).cast(LongType).as("first_rel"),
          when(col("first_rel0").isNotNull, lit(2520L) / col("first_rel0"))
            .otherwise(lit(0L)).cast(LongType).as("rr_2520"),
          col("n_rel10"),
          (col("n_rel10").cast(DoubleType) / lit(10.0)).as("prec_at10"))
        .orderBy("qid")
    }),

    // Interpolated Kneser-Ney bigram LM trained distributed with EXACT
    // rational probabilities (llm/KneserNey — d=3/4 makes every term an
    // integer over 4·c(w1·)·T, and Σ_w2 P = 1 holds as an integer
    // identity, spec-proved). Published: the 20 highest-count bigrams
    // with their count marginals and the exact p_num/p_den pair; p_kn
    // is the single correctly-rounded division. One (w1,w2) shuffle +
    // vocab-sized marginal group-bys — the LM table itself stays
    // distributed (no collect), joining token-keyed like Surprisal's.
    "q259_kn_bigram" -> ((s, dir) => {
      graft.llm.KneserNey.bigramModel(t(s, dir, "documents"),
          col("doc_id"), col("text"))
        .orderBy(desc("c"), col("w1"), col("w2"))
        .limit(20)
    }),

    // Incremental KN-model maintenance: the persisted state is the
    // bigram COUNT table (additive integers); a delta corpus folds on
    // with one equi-shuffle and the marginals re-derive from the
    // merged vocab-sized table. Because everything is integer-exact,
    // incremental == from-scratch BIT FOR BIT — the oracle computes
    // the from-scratch model over the full corpus, so this gate fails
    // if the fold ever drifts. Published: every bigram with c >= 3
    // (deterministic, ~vocab-sized).
    "q263_kn_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val base = graft.llm.KneserNey.bigramCounts(
        docs.filter(col("doc_id") % 2 === 0), col("doc_id"), col("text"))
      val delta = graft.llm.KneserNey.bigramCounts(
        docs.filter(col("doc_id") % 2 =!= 0), col("doc_id"), col("text"))
      graft.llm.KneserNey.withProbabilities(
          graft.llm.KneserNey.mergeCounts(base, delta))
        .filter(col("c") >= 3)
        .orderBy("w1", "w2")
    }),

    // Source-overlap matrix: exact pairwise shingle-set Jaccard
    // between SOURCES — the corpus-level contamination audit ("which
    // feeds are re-crawls of each other") that doc-level dedup can't
    // see. Source gram-sets via one distinct on (source, gram-hash);
    // intersections via a gram-keyed equi-join (volume = Σ_g df(g)²
    // over the SOURCE-level df ≤ #sources — bounded, never all-docs);
    // the missing-pair grid is rebuilt source² (tiny) with coalesce 0,
    // the q238 lesson. Flag cross-multiplied at Jaccard > 5%.
    "q264_source_overlap" -> ((s, dir) => {
      val grams = t(s, dir, "documents")
        .select(col("source"),
          explode(TextDedup.shingles(col("text"), 3)).as("gs"))
        .select(col("source"), TextDedup.portableHash(col("gs")).as("g"))
        .distinct()
      // ONE gram pass: per-gram sorted source set (≤ |sources| entries).
      // The previous shape evaluated the md5-gram build three times
      // (sizes + both self-join sides) and shuffled the gram table twice
      // more for the join; pair volume is identical — Σ_g C(|S_g|,2) —
      // it just never leaves the aggregated frame (r16). sort_array
      // makes s1 < s2 by construction, matching the old string filter.
      // r17: singles (s2 = NULL) and in-array pairs ride ONE generator,
      // so the per-gram set frame has a single consumer and the r16
      // localCheckpoint — one row per distinct gram, corpus-sized, the
      // q201-class spill risk — is gone; sizes and intersections split
      // back out of the one tiny (s1, s2) count table.
      val gsets = grams.groupBy("g")
        .agg(sort_array(collect_set(col("source"))).as("ss"))
      val pairsOf = flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + lit(2),
          greatest(size(col("ss")) - i - lit(1), lit(0))),
          y => struct(x.as("s1"), y.as("s2")))))
      val singlesOf = transform(col("ss"),
        x => struct(x.as("s1"), lit(null).cast(StringType).as("s2")))
      val counts = gsets
        .select(explode(concat(singlesOf, pairsOf)).as("p"))
        .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // ≤ |sources|² rows — bounded, two consumers
      val sizes = counts.filter(col("s2").isNull)
        .select(col("s1").as("source"), col("cnt").as("n"))
      val inter = counts.filter(col("s2").isNotNull)
        .select(col("s1"), col("s2"), col("cnt").as("inter"))
      val grid = sizes.select(col("source").as("s1"), col("n").as("n1"))
        .crossJoin(sizes.select(col("source").as("s2"), col("n").as("n2")))
        .filter(col("s1") < col("s2"))
      grid.join(inter, Seq("s1", "s2"), "left")
        .withColumn("inter", coalesce(col("inter"), lit(0L)))
        .select(col("s1"), col("s2"), col("n1"), col("n2"), col("inter"),
          (col("inter").cast(DoubleType) /
            (col("n1") + col("n2") - col("inter")).cast(DoubleType))
            .as("jaccard"),
          (col("inter") * 20 > col("n1") + col("n2") - col("inter"))
            .as("overlap_flag"))
        .orderBy("s1", "s2")
    }),

    // Dataset card: the one-row-per-source release audit every corpus
    // ships with — volume (docs/tokens/chars), language spread, exact
    // duplicate mass (md5 content keys, the q70 definition), and the
    // median length as an exact order statistic (the q260 rank-window
    // pattern; lower median, doc_id tiebreak). Three group-bys on
    // source + one per-source rank window; all counts integers, the
    // two published rates are single exact-int divisions. Sources are
    // few — the card is a reduction, never a bottleneck.
    // Scale audit (r15 ask #3): the rank window is PARTITIONED BY
    // source — sources parallelize, and no partition ever holds more
    // than one source's rows. A corpus where a single source is itself
    // petabyte-scale would migrate this one column to
    // ShardBalance.globalOrderStats run per source (or
    // percentile_approx when the card tolerates it); everything else
    // here is partial-aggregatable.
    "q261_dataset_card" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
        col("lang"), col("n_chars"),
        size(graft.llm.Surprisal.tokens(col("text"))).cast(LongType)
          .as("n_toks"),
        md5(col("text")).as("key"))
      val base = d.groupBy("source").agg(count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"), countDistinct("lang").as("n_langs"),
        sum("n_chars").as("sum_chars"))
      val dup = d.groupBy("source", "key").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_docs"))
      val med = d.withColumn("rn", row_number().over(
          Window.partitionBy("source").orderBy("n_chars", "doc_id")))
        .join(base.select(col("source"), col("n_docs")), "source")
        .filter(col("rn") === expr("(n_docs + 1) div 2"))
        .select(col("source"), col("n_chars").as("p50_chars"))
      base.join(dup, "source").join(med, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_langs"), col("dup_docs"), col("p50_chars"),
          (col("sum_chars").cast(DoubleType) / col("n_docs").cast(DoubleType))
            .as("mean_chars"),
          (col("dup_docs").cast(DoubleType) / col("n_docs").cast(DoubleType))
            .as("dup_rate"))
        .orderBy("source")
    }),

    // Dedup-threshold calibration curve — q280's sweep idea applied to
    // the NEAR-DUP knob: over the LSH candidate set (the q71 band
    // geometry — shingleW=1, k=32, bands=8 — in its PORTABLE-hash
    // variant: q71 itself runs the default xxhash64 family, so its
    // recall proof does NOT cover this candidate set; q293's own
    // oracle independently certifies it), exact
    // token-set Jaccard bucketed at 6 candidate thresholds, as
    // conditional sums in ONE aggregate over the candidate pairs (no
    // 6x fan-out, no re-verify per threshold). The curve is computed
    // over CANDIDATES, not all pairs — that is the honest scale path
    // (banded recall bounds what any threshold can see; at 0.5 the
    // capture probability is the floor, and the published
    // n_candidates row makes the denominator explicit) — and the
    // oracle replays the full portable shingle→minhash→band pipeline,
    // so a green hash certifies candidates AND the curve. The verify
    // intersects DISTINCT-TOKEN sets; Spark hashes tokens to longs
    // first (xxhash64, the library's scale default — long intersects,
    // no string compares on the 479k-pair hot path) while the oracle
    // intersects the raw strings: the CARDINALITIES are identical, and
    // cardinalities are all the curve consumes.
    "q293_dedup_threshold_curve" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
      val cands = TextDedup.minhashCandidates(d, k = 32, bands = 8,
        shingleW = 1, portable = true)
      val sets = d.select(col("doc_id"),
        array_distinct(transform(split(col("text"), " "),
          w => xxhash64(w))).as("ts"))
      val ths = Seq(50, 60, 70, 80, 90, 95)
      val pairs = cands
        .join(sets.select(col("doc_id").as("doc_a"), col("ts").as("ta")),
          Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("ts").as("tb")),
          Seq("doc_b"))
        .select(size(array_intersect(col("ta"), col("tb"))).cast(LongType)
            .as("i"),
          (size(col("ta")) + size(col("tb"))).cast(LongType).as("ab"))
        .select(col("i"), (col("ab") - col("i")).as("u"))
      pairs
        .agg(count(lit(1)).as("n_candidates"),
          ths.map(th => sum(when(col("i") * 100 >= col("u") * th, 1L)
            .otherwise(0L)).as(s"n$th")): _*)
        .select(col("n_candidates"), explode(array(ths.map(th =>
          struct(lit(th).as("threshold_pct"), col(s"n$th").as("n_pairs"))): _*))
          .as("r"))
        .select(col("r.threshold_pct"), col("r.n_pairs"),
          col("n_candidates"))
        .orderBy("threshold_pct")
    }),

    // Per-source duplication PROFILE — the question after any dedup
    // threshold is picked (q293's curve): how duplicated is each
    // source? For every document, the nearest-duplicate similarity =
    // max exact Jaccard over its LSH candidates (same portable
    // candidate set as q293 — linear, no all-pairs), scaled to an
    // exact integer (i·10⁶ DIV u — deterministic floor division, so
    // the per-doc MAX is engine-identical), bucketed into the
    // {none, <50, 50-80, 80-95, 95+} duplication bands and counted per
    // source. Docs with NO candidate are the 'none' band (banded
    // recall bounds what any profile can see — q293's honesty note).
    "q321_nearest_dup_profile" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
      val cands = TextDedup.minhashCandidates(d, k = 32, bands = 8,
        shingleW = 1, portable = true)
      val sets = d.select(col("doc_id"),
        array_distinct(transform(split(col("text"), " "),
          w => xxhash64(w))).as("ts"))
      val sims = cands
        .join(sets.select(col("doc_id").as("doc_a"), col("ts").as("ta")),
          Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("ts").as("tb")),
          Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("ta"), col("tb"))).cast(LongType).as("i"),
          (size(col("ta")) + size(col("tb"))).cast(LongType).as("ab"))
        .select(col("doc_a"), col("doc_b"),
          expr("(i * 1000000) DIV (ab - i)").as("sim6"))
      // one evaluation of the candidate-verify join, exploded to both
      // endpoints — the union-of-two-selects form re-executed the whole
      // LSH+intersect pipeline per branch (no shared exchange subtree;
      // measured 2x at sf0.1, r16). Same multiset of (doc_id, sim6) rows.
      val perDoc = sims
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"),
          col("sim6"))
        .groupBy("doc_id").agg(max("sim6").as("mx"))
      d.select(col("doc_id"), col("source"))
        .join(perDoc, Seq("doc_id"), "left")
        .withColumn("band",
          when(col("mx").isNull, "none")
            .when(col("mx") >= 950000L, "95+")
            .when(col("mx") >= 800000L, "80-95")
            .when(col("mx") >= 500000L, "50-80")
            .otherwise("<50"))
        .groupBy("source", "band")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source", "band")
    }),

    // Inference-batch padding audit — the serving-side twin of q269's
    // packing audit: fixed 16-doc batches padded to the batch max, the
    // cost model of batched transformer inference. Length-sorted
    // batching (the standard bucketing trick) vs arrival-order (FIFO)
    // batching, per batch: the padding a batch wastes under each
    // policy. Both global orders come from the two-phase distributed
    // rank (range exchange + per-partition row_number + broadcast
    // offsets — ShardBalance.globalOrderStats, never a single-
    // partition corpus Window), so the plan holds at any corpus size;
    // the output is one row per batch (N/16), a report, not a scalar.
    "q294_batch_padding" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        TextStats.tokenCount(col("text")).cast(LongType).as("n_tok"))
      val sorted = ShardBalance
        .globalOrderStats(d, Seq(col("n_tok").desc, col("doc_id")))
        .withColumn("batch", expr("r DIV 16"))
        .groupBy("batch")
        .agg(count(lit(1)).as("n_docs"), max("n_tok").as("max_tok"),
          sum("n_tok").as("sum_tok"))
        .withColumn("padded_sorted",
          col("max_tok") * col("n_docs") - col("sum_tok"))
      val fifo = ShardBalance.globalOrderStats(d, Seq(col("doc_id")))
        .withColumn("batch", expr("r DIV 16"))
        .groupBy("batch")
        .agg((max("n_tok") * count(lit(1)) - sum("n_tok")).as("padded_fifo"))
      sorted.join(fifo, Seq("batch"))
        .select(col("batch"), col("n_docs"), col("max_tok"), col("sum_tok"),
          col("padded_sorted"), col("padded_fifo"))
        .orderBy("batch")
    }),

    // DSIR-style importance weights (Xie 2023, hashed n-gram features):
    // score every doc by how target-like its token distribution is,
    // where the TARGET is the quality-gated subset (all three q76
    // bands pass — the practical convention: the target sample is
    // drawn from the corpus itself). Features are 64 hashed unigram
    // buckets (portable md5 bucket); the per-bucket weight is the
    // LINEARIZED importance ratio in exact scaled integers —
    // 1024·(p_target_ppm+1)/(p_raw_ppm+1) − 1024, probabilities as
    // integer parts-per-million, add-1 smoothed — monotone in the true
    // ratio (all DSIR needs) and engine-exact where a float log is
    // not. (A ±1-bit bitlen proxy was tried first and measured
    // DEGENERATE here: the target is ~90% of this corpus, so every
    // bucket ratio sits inside one bit.) Contract: target tokens ·1e6
    // must fit a long → corpora up to ~9·10^12 target tokens.
    // Per-source rollup publishes the signed importance mass and an
    // above-corpus-mean flag, cross-multiplied (measured split:
    // 10/11/9 of 20 sources at the three SFs). Scale: one token
    // shuffle to bucket counts, the ≤64-row weight table broadcasts
    // back, one per-doc sum — linear end to end.
    "q295_dsir_weights" -> ((s, dir) => {
      val all = Window.partitionBy()
      val d = t(s, dir, "documents")
      val base = d.select(col("doc_id"), col("source"),
        (TextStats.tokenCount(col("text")).between(10, 1000) &&
          (TextStats.stopwordRatio(col("text"), stopwords) > 0.01) &&
          (TextStats.punctRatio(col("text")) < 0.2)).as("is_target"))
      val tf = d.select(col("doc_id"),
          explode(split(lower(col("text")), "[^a-z0-9]+")).as("tok"))
        .filter(col("tok") =!= "")
        .select(col("doc_id"),
          pmod(graft.functions.BqShims.md5Bucket(col("tok")), lit(64L))
            .as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("tf"))
      val weights = tf
        .join(base.select("doc_id", "is_target"), Seq("doc_id"))
        .groupBy("b")
        .agg(sum("tf").as("cr"),
          sum(when(col("is_target"), col("tf")).otherwise(0L)).as("ct"))
        .withColumn("rt", sum("cr").over(all))
        .withColumn("tt", sum("ct").over(all))
        // tt = 0 (no document passed the quality gate) would make the
        // non-ANSI DIV yield null weights while the oracle's integer
        // division errors — fail loudly on that degenerate corpus
        // instead of silently diverging (the documented assumption is
        // target ≈ 90% of corpus, so tt > 0 on any real input)
        .select(col("b"), expr(
          "CASE WHEN tt <= 0 THEN CAST(raise_error(" +
            "'q295: no document passes the quality gate (tt=0); " +
            "DSIR weights are undefined') AS BIGINT) " +
            "ELSE ((ct * 1000000) DIV tt + 1) * 1024" +
            " DIV ((cr * 1000000) DIV rt + 1) - 1024 END").cast(LongType)
          .as("w"))
      val scores = tf.join(broadcast(weights), Seq("b"))
        .groupBy("doc_id").agg(sum(col("tf") * col("w")).as("score"))
      scores.join(base, Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_target_like"),
          sum("score").as("score_sum"),
          sum(when(col("is_target"), 1L).otherwise(0L)).as("n_target"))
        .withColumn("above_corpus_mean",
          (col("score_sum") * sum("n_docs").over(all) >
            sum("score_sum").over(all) * col("n_docs")).cast(IntegerType))
        .orderBy("source")
    }),

    // Incremental re-export planner — the q290 manifest diff put to
    // work: corpus v2 = v1 + a ~1% delta (doc_id % 97 == 0), per-shard
    // xor fingerprints localize the change, and ONLY changed shards
    // re-export (docs/tokens to move vs the full-export
    // counterfactual). The measured gate: 6/16 shards changed at
    // sf0.001/0.01 and 13/16 at sf0.1 — non-degenerate both ways,
    // which a 50% delta (the q290 fixture split) is not. The totals
    // ride an unpartitioned window over the 16-row shard frame.
    "q296_reexport_plan" -> ((s, dir) => {
      def shardOf(id: org.apache.spark.sql.Column) = {
        val h = md5(id.cast("string"))
        ((ascii(substring(h, 1, 1)) * 31 + ascii(substring(h, 2, 1))) % 16)
          .cast("int")
      }
      val all = Window.partitionBy()
      t(s, dir, "documents")
        .select(col("doc_id"), shardOf(col("doc_id")).as("shard"),
          TextDedup.portableHash(col("text")).as("h"),
          TextStats.tokenCount(col("text")).cast(LongType).as("n_tok"))
        .groupBy("shard")
        .agg(sum(when(col("doc_id") % 97 =!= 0, 1L).otherwise(0L))
            .as("n_v1"),
          count(lit(1)).as("n_v2"),
          expr("bit_xor(CASE WHEN doc_id % 97 != 0 THEN h ELSE 0 END)")
            .as("fp_v1"),
          expr("bit_xor(h)").as("fp_v2"),
          sum("n_tok").as("tok_v2"))
        .withColumn("changed",
          (col("fp_v1") =!= col("fp_v2")).cast(IntegerType))
        .withColumn("docs_to_export",
          when(col("changed") === 1, col("n_v2")).otherwise(0L))
        .withColumn("tokens_to_export",
          when(col("changed") === 1, col("tok_v2")).otherwise(0L))
        .withColumn("changed_shards", sum("changed").over(all))
        .withColumn("saved_docs",
          sum(when(col("changed") === 0, col("n_v2")).otherwise(0L))
            .over(all))
        .select(col("shard"), col("n_v1"), col("n_v2"), col("changed"),
          col("docs_to_export"), col("tokens_to_export"),
          col("changed_shards"), col("saved_docs"))
        .orderBy("shard")
    }),

    // Streaming stratified sample — the q85/q125 deterministic-mixture
    // convention under continuous ingest (StreamOps
    // .stratifiedSampleStream): per-source percent rates, keep iff
    // md5Bucket(doc_id) % 100 < rate. The decision is a pure row
    // function (no cross-batch state), so stream == batch independent
    // of trigger chopping — the oracle is the one-shot batch rule.
    "q297_stream_stratified" -> ((s, dir) => {
      val batchDir = streamSampleDirs.computeIfAbsent(dir, _ => {
        val bd = java.nio.file.Files
          .createTempDirectory("graft_ssamp_in").toString
        t(s, dir, "documents").select("doc_id", "source")
          .repartition(4).write.mode("overwrite").parquet(bd)
        bd
      })
      Option(streamSampleScratch.remove(dir)).foreach(deleteTree)
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_ssamp_out").toString
      streamSampleScratch.put(dir, outDir)
      graft.streaming.StreamOps.stratifiedSampleStream(s, batchDir,
          Map("src0" -> 80, "src1" -> 50, "src2" -> 25, "src3" -> 10),
          defaultRate = 40, outDir = outDir)
        .orderBy("source")
    }),

    // Novelty / memorization-risk rollup — the per-source governance
    // number behind q168's per-doc dup spans: of each source's 8-token
    // windows, how many are verbatim-duplicated ANYWHERE in the corpus
    // (total occurrences >= 2 — Lee 2021's repetition unit, catching
    // within-doc repeats too)? Gram keys shuffle once to global
    // counts, join back to window owners, roll up to sources; the risk
    // flag is the ABOVE-CORPUS-MEAN dup rate, cross-multiplied (the
    // q282/q295 convention — an absolute 5% bar was measured here at
    // 11/20 sources at sf0.01 but SATURATED 20/20 at sf0.1, the exact
    // q271 failure genus; the relative bar splits at every scale by
    // construction). The fixture's near-dups are REORDERINGS, so
    // 8-gram hits isolate exact-dup phrasing — the same property that
    // made 8 the right decon window in q271.
    "q298_novelty_rollup" -> ((s, dir) => {
      // per-gram count as a whole-partition window over `g` instead of a
      // groupBy(g) + join-back (r17): the same count reaches every gram
      // row off ONE exchange, the gram frame has a single consumer, and
      // the r16 localCheckpoint — a corpus-sized (one row per token
      // window) executor-resident materialization, flagged as a 100 TB
      // spill risk — is no longer needed at all.
      val grams = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          graft.llm.Surprisal.tokens(col("text")).as("ws"))
        .select(col("doc_id"), col("source"), gram8(col("ws")).as("g"))
      val all = Window.partitionBy()
      grams
        .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
        .groupBy("source")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_windows"),
          sum(when(col("n") >= 2, 1L).otherwise(0L)).as("dup_windows"))
        .withColumn("risk_flag",
          (col("dup_windows") * sum("n_windows").over(all) >
            sum("dup_windows").over(all) * col("n_windows"))
            .cast(IntegerType))
        .orderBy("source")
    }),

    // Curriculum shard ordering — train easy-to-hard: shards (the q287
    // md5 scheme) ranked by exact mean doc quality (integer
    // micro-units: sum_s10*1e6 DIV n_docs — no float mean), cut into
    // three difficulty bands, then given a training position that
    // walks bands easiest-first with an md5-shuffled order INSIDE each
    // band (deterministic, but not id-correlated — the within-band
    // shuffle every curriculum schedule needs). One corpus pass to the
    // 16-row shard frame; every window runs on those 16 rows.
    "q299_curriculum_order" -> ((s, dir) => {
      def shardOf(id: org.apache.spark.sql.Column) = {
        val h = md5(id.cast("string"))
        ((ascii(substring(h, 1, 1)) * 31 + ascii(substring(h, 2, 1))) % 16)
          .cast("int")
      }
      val score10 =
        (when(TextStats.tokenCount(col("text")).between(10, 1000), lit(5))
            .otherwise(lit(0)) +
          when(TextStats.stopwordRatio(col("text"), stopwords) > 0.01,
            lit(3)).otherwise(lit(0)) +
          when(TextStats.punctRatio(col("text")) < 0.2, lit(2))
            .otherwise(lit(0))).cast(LongType)
      val per = t(s, dir, "documents")
        .select(shardOf(col("doc_id")).as("shard"), score10.as("s10"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("s10").as("sum_s10"))
        .withColumn("mean_q_micro",
          expr("sum_s10 * 1000000 DIV n_docs"))
      val byCurriculum = Window.orderBy(col("band"),
        graft.functions.BqShims.md5Bucket(col("shard")), col("shard"))
      per
        .withColumn("band",
          expr("CAST((row_number() OVER (ORDER BY mean_q_micro DESC, shard)" +
            " - 1) * 3 DIV 16 AS INT)"))
        .withColumn("position", row_number().over(byCurriculum).cast(LongType))
        .select(col("shard"), col("n_docs"), col("sum_s10"),
          col("mean_q_micro"), col("band"), col("position"))
        .orderBy("shard")
    }),

    // Clean eval-holdout builder — the inverse composition of q84: a
    // 10% md5 candidate split, then every candidate sharing ANY
    // verbatim 8-token window with the remaining train side is
    // ejected, so the surviving holdout is decontaminated BY
    // CONSTRUCTION (the guarantee an eval set needs, not a post-hoc
    // overlap report). Gram-keyed equi-joins only: candidate grams
    // probe the distinct train-gram set, hit docs eject — linear in
    // corpus tokens, nothing pair-sized. Measured ejections 0/1/46 at
    // the three SFs (the sf0.001 sample holds no dup-phrase mass).
    "q300_eval_holdout" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("source"),
        (pmod(graft.functions.BqShims.md5Bucket(col("doc_id")), lit(10L))
          === 0).as("cand"),
        graft.llm.Surprisal.tokens(col("text")).as("ws"))
      val grams = base.select(col("doc_id"), col("cand"),
        gram8(col("ws")).as("g"))
      val trainGrams = grams.filter(!col("cand")).select("g").distinct()
      val contam = grams.filter(col("cand")).join(trainGrams, Seq("g"))
        .select("doc_id").distinct().withColumn("contaminated", lit(1))
      base.select("doc_id", "source", "cand")
        .join(contam, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("cand"), 1L).otherwise(0L)).as("n_candidates"),
          sum(when(col("cand") && col("contaminated") === 1, 1L)
            .otherwise(0L)).as("n_contaminated"),
          sum(when(col("cand") && col("contaminated").isNull, 1L)
            .otherwise(0L)).as("n_final"))
        .orderBy("source")
    }),

    // Farthest-point-sampling coreset (Gonzalez k-center): pick 8
    // maximally-diverse vectors; publishes the selection order and the
    // coverage-radius curve. Exact integer grid distances, min-id
    // start, ties to lower id — the oracle replays the greedy
    // selection CTE-per-pick and certifies every pick AND radius.
    // Scale: state is one row per vector (never pairwise); each round
    // is one broadcast-closure distance update + a global top-1
    // (TakeOrderedAndProject); k driver-collected rows, bounded by
    // construction (see llm/Coreset scaladoc).
    "q301_coreset_fps" -> ((s, dir) =>
      graft.llm.Coreset.farthestPoints(s, t(s, dir, "embeddings"), k = 8)
        .orderBy("pick")),

    // Incremental novelty gate — q298's memorization-risk check as an
    // INDEX-MAINTENANCE operator (the q117 pattern): the persisted
    // corpus's 8-gram counts are written ONCE as a bucket-partitioned
    // parquet index; each arriving delta batch probes it with a
    // (bucket, gram) equi-join — a small delta touching few buckets
    // prunes the index scan to those directories, and this fixture's
    // full-width delta documents the layout without exercising the
    // prune. Per delta source: windows seen in the index vs novel,
    // with the above-delta-mean seen-rate flag (cross-multiplied).
    "q302_incr_novelty" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val idxPath = gramIndexDirs.computeIfAbsent(dir, _ => {
        val p = java.nio.file.Files
          .createTempDirectory("graft_gramidx").toString
        docs.filter(col("doc_id") % 5 =!= 0)
          .select(graft.llm.Surprisal.tokens(col("text")).as("ws"))
          .select(gram8(col("ws")).as("g"))
          .groupBy("g").agg(count(lit(1)).as("n"))
          .withColumn("bucket", pmod(col("g"), lit(32L)))
          .write.partitionBy("bucket").mode("overwrite").parquet(p)
        p
      })
      val idx = s.read.parquet(idxPath)
        .select(col("bucket"), col("g"), lit(1).as("seen"))
      val all = Window.partitionBy()
      docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("source"),
          graft.llm.Surprisal.tokens(col("text")).as("ws"))
        .select(col("doc_id"), col("source"), gram8(col("ws")).as("g"))
        .withColumn("bucket", pmod(col("g"), lit(32L)))
        .join(idx, Seq("bucket", "g"), "left")
        .groupBy("source")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_windows"),
          sum(when(col("seen") === 1, 1L).otherwise(0L)).as("seen_windows"))
        .withColumn("high_overlap",
          (col("seen_windows") * sum("n_windows").over(all) >
            sum("seen_windows").over(all) * col("n_windows"))
            .cast(IntegerType))
        .orderBy("source")
    }),

    // Cross-lingual duplicate report — near-dup pairs bucketed by
    // (lang, lang): verbatim-content pairs carrying DIFFERENT language
    // labels are either langid errors or true translations, and both
    // need review before per-language mixture decisions trust the lang
    // column (this fixture: 110/142 verified pairs at sf0.01 are
    // cross-lang — the report exists because that number is usually
    // assumed to be ~0). Pairs from the linear LSH→verify path (the
    // q71 operating point, whose oracle proves 100% candidate recall
    // at 0.95); lang pair normalized (lexicographic) so the grid is
    // triangular. Exact counts; share published as one exact division.
    "q303_cross_lang_dups" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
      val pairs = TextDedup.verifyJaccard(
        TextDedup.minhashCandidates(d, k = 32, bands = 8, shingleW = 1),
        d, threshold = 0.95)
      val langs = d.select(col("doc_id"), col("lang"))
      val all = Window.partitionBy()
      pairs
        .join(langs.select(col("doc_id").as("doc_a"), col("lang").as("la")),
          Seq("doc_a"))
        .join(langs.select(col("doc_id").as("doc_b"), col("lang").as("lb")),
          Seq("doc_b"))
        .select(least(col("la"), col("lb")).as("lang_a"),
          greatest(col("la"), col("lb")).as("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("cross_lang",
          (col("lang_a") =!= col("lang_b")).cast(IntegerType))
        .withColumn("share",
          col("n_pairs").cast(DoubleType) /
            sum("n_pairs").over(all).cast(DoubleType))
        .orderBy("lang_a", "lang_b")
    }),

    // Duplicate-cluster size audit — the distributional companion to
    // q83: how big do near-dup clusters get? Histogram of cluster
    // sizes (n_clusters and docs per size), plus the boilerplate flag:
    // the largest cluster's share of all duplicate-involved docs,
    // cross-multiplied against a 25% bar on the ≤|sizes|-row frame.
    // At web scale this curve is the boilerplate detector — a fat tail
    // means one template owns the corpus; the cluster stage is the
    // shared pinned q83 pipeline, the histogram is two tiny aggregates.
    "q304_cluster_sizes" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
      val clusters = pinnedStage(s, s"$dir|clusters",
        TextDedup.clusterAssignments(d, threshold = 0.95,
          k = 32, bands = 8, shingleW = 1))
      val sizes = clusters.groupBy("cluster_id")
        .agg(count(lit(1)).as("sz"))
        .filter(col("sz") > 1)
      val all = Window.partitionBy()
      sizes.groupBy("sz")
        .agg(count(lit(1)).as("n_clusters"))
        .withColumn("n_docs", col("sz") * col("n_clusters"))
        .withColumn("max_cluster_docs", max(col("sz")).over(all))
        .withColumn("dup_docs_total", sum("n_docs").over(all))
        .withColumn("boilerplate_flag",
          (col("max_cluster_docs") * 4 > col("dup_docs_total"))
            .cast(IntegerType))
        .select(col("sz"), col("n_clusters"), col("n_docs"),
          col("boilerplate_flag"))
        .orderBy("sz")
    }),

    // Mixture-ablation grid — leave-one-domain-out UniMax: the q278
    // allocation re-run for every 'drop one domain' arm UNDER THE SAME
    // absolute budget, in ONE frame (UniMax.allocateGrid — every
    // waterfilling window partitioned by arm). The grid is what an
    // ablation study actually trains from, and it exercises all three
    // allocation regimes at once: the full arm caps the 9 small
    // domains, dropping a small domain re-spreads its share, and
    // dropping the structurally-11x big domain makes the budget exceed
    // every remaining cap (all capped, positive leftover). One corpus
    // pass to the 10-row domain table; the grid is 10x9+10 rows.
    "q305_ablation_grid" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .groupBy(substring(col("source"), 4, 1).as("domain"))
        .agg(sum(TextStats.tokenCount(col("text")).cast(LongType))
          .as("n_tok"))
        .withColumn("b", expr("(sum(n_tok) OVER () * 3) DIV 2"))
      val arms = counts
        .select(concat(lit("drop_"), col("domain")).as("arm"))
        .union(counts.select(lit("full").as("arm")).limit(1))
      val grid = counts.crossJoin(broadcast(arms))
        .filter(col("arm") === "full" ||
          col("domain") =!= substring(col("arm"), 6, 1))
      UniMax.allocateGrid(grid, col("b"), epochCap = 2, armCol = "arm",
          srcCol = "domain")
        .orderBy("arm", "domain")
    }),

    // Exact range-partition boundaries — the TeraSort-style splits
    // computation as a first-class operator: 32 token-balanced export
    // ranges over the (n_tok, doc_id) order, boundary i = the first
    // row whose running token total reaches ceil(i·total/32). The
    // running totals come from the two-phase global rank
    // (ShardBalance.globalOrderStats — no single-partition Window);
    // each row then decides LOCALLY which targets it crosses (a
    // bounded sequence between its floor-scaled neighbors — fan-out
    // only on the ≤31 boundary rows), so the whole computation is one
    // pass + per-row arithmetic, no range join, no sampling error.
    // Contract: total·32 must fit a long → corpora to ~2.8·10^17
    // tokens.
    "q306_range_splits" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"),
        TextStats.tokenCount(col("text")).cast(LongType).as("n_tok"))
      val nSplits = 32
      ShardBalance.globalOrderStats(d, Seq(col("n_tok"), col("doc_id")))
        .withColumn("prev", col("cum") - col("n_tok"))
        .withColumn("ilo", expr(s"(prev * $nSplits) DIV total"))
        .withColumn("ihi", expr(s"(cum * $nSplits) DIV total + 1"))
        .withColumn("lo", greatest(lit(1L), col("ilo")))
        .withColumn("hi", least(lit(nSplits - 1L), col("ihi")))
        .withColumn("split_id", explode(expr(
          s"""filter(
             |  CASE WHEN lo <= hi THEN sequence(lo, hi)
             |       ELSE array() END,
             |  i -> prev < (i * total + ${nSplits - 1}) DIV $nSplits
             |    AND (i * total + ${nSplits - 1}) DIV $nSplits <= cum)
             |""".stripMargin)))
        .withColumn("target_cum",
          expr(s"(split_id * total + ${nSplits - 1}) DIV $nSplits"))
        .select(col("split_id"), col("target_cum"),
          col("doc_id").as("boundary_doc"),
          col("n_tok").as("boundary_n_tok"), col("cum"))
        .orderBy("split_id")
    }),

    // Training-run manifest — the artifact a trainer actually consumes,
    // composing three planning operators into one 16-row table: the
    // q277 token-balanced serpentine shards, the q299 curriculum
    // (3 quality bands, md5-shuffled within band), and each shard's
    // exact start_token_offset in training order (exclusive prefix sum
    // — the resume/checkpoint coordinate). One corpus pass to the
    // shard frame (the doc-keyed score join rides the assign output);
    // every window runs on 16 rows.
    "q307_training_manifest" -> ((s, dir) => {
      val score10 =
        (when(TextStats.tokenCount(col("text")).between(10, 1000), lit(5))
            .otherwise(lit(0)) +
          when(TextStats.stopwordRatio(col("text"), stopwords) > 0.01,
            lit(3)).otherwise(lit(0)) +
          when(TextStats.punctRatio(col("text")) < 0.2, lit(2))
            .otherwise(lit(0))).cast(LongType)
      val d = t(s, dir, "documents")
      val assigned = ShardBalance.assign(d, "doc_id",
        TextStats.tokenCount(col("text")), nShards = 16)
      val per = assigned
        .join(d.select(col("doc_id"), score10.as("s10")), Seq("doc_id"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"),
          sum("s10").as("sum_s10"))
        .withColumn("mean_q_micro", expr("sum_s10 * 1000000 DIV n_docs"))
      val byCurriculum = Window.orderBy(col("band"),
        graft.functions.BqShims.md5Bucket(col("shard")), col("shard"))
      per
        .withColumn("band",
          expr("CAST((row_number() OVER (ORDER BY mean_q_micro DESC, shard)" +
            " - 1) * 3 DIV 16 AS INT)"))
        .withColumn("position", row_number().over(byCurriculum).cast(LongType))
        .withColumn("start_token_offset", coalesce(
          sum("tokens").over(
            byCurriculum.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select(col("shard"), col("n_docs"), col("tokens"), col("sum_s10"),
          col("mean_q_micro"), col("band"), col("position"),
          col("start_token_offset"))
        .orderBy("shard")
    }),

    // Incremental manifest maintenance under CDC — the q287 xor
    // manifest IS an incrementally-maintainable view: because xor is
    // its own inverse, applying a changelog needs only the CHANGED
    // rows' hashes (delete folds the old hash out, update folds
    // old-out/new-in, insert folds new in) — never a rescan of the
    // corpus. A deterministic disjoint changelog (inserts %11==3,
    // updates %13==0, deletes %17==0 of the rest) is applied both ways
    // per shard: the O(|delta|) incremental fold vs the full v2
    // recompute, and the published identity flag (fp match AND count
    // match) must be 1 on every shard — the q226/q227 IVM gate
    // convention applied to export provenance.
    "q308_manifest_cdc" -> ((s, dir) => {
      def shardOf(id: org.apache.spark.sql.Column) = {
        val h = md5(id.cast("string"))
        ((ascii(substring(h, 1, 1)) * 31 + ascii(substring(h, 2, 1))) % 16)
          .cast("int")
      }
      val d = t(s, dir, "documents").select(col("doc_id"),
        shardOf(col("doc_id")).as("shard"),
        TextDedup.portableHash(col("text")).as("h"),
        TextDedup.portableHash(concat(col("text"), lit(" v2"))).as("h2"),
        (col("doc_id") % 11 === 3).as("ins"),
        (col("doc_id") % 11 =!= 3 && col("doc_id") % 13 === 0).as("upd"),
        (col("doc_id") % 11 =!= 3 && col("doc_id") % 13 =!= 0 &&
          col("doc_id") % 17 === 0).as("del"))
      d.groupBy("shard")
        .agg(
          sum(when(!col("ins"), 1L).otherwise(0L)).as("n_v1"),
          sum(when(!col("del"), 1L).otherwise(0L)).as("n_v2"),
          expr("bit_xor(CASE WHEN NOT ins THEN h ELSE 0 END)").as("fp_v1"),
          // incremental: start from v1, fold deltas only
          expr("bit_xor(CASE WHEN del THEN h WHEN upd THEN h ^ h2 " +
            "WHEN ins THEN h2 ELSE 0 END)").as("delta_fp"),
          // full recompute of v2 (updates carry h2, inserts h2)
          expr("bit_xor(CASE WHEN del THEN 0 WHEN upd THEN h2 " +
            "WHEN ins THEN h2 ELSE h END)").as("fp_full"))
        .withColumn("fp_inc", expr("fp_v1 ^ delta_fp"))
        .withColumn("match",
          (col("fp_inc") === col("fp_full")).cast(IntegerType))
        .select(col("shard"), col("n_v1"), col("n_v2"), col("fp_inc"),
          col("fp_full"), col("match"))
        .orderBy("shard")
    })
  )

  /** Exact integer dot products between the 50 query vectors
    * (vec_id < 50, broadcast) and every other vector, at full width
    * and at the 16-dim matryoshka prefix. floor(v·2^20) quantization:
    * the scale mul is exact in double, floor is engine-deterministic,
    * and all products/sums fit long — so Spark and DuckDB compute the
    * same integers (the q185/Pooling portability scheme). */
  private def dotPairs(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select(col("vec_id"),
      transform(col("embedding"),
        v => floor(v.cast(DoubleType) * lit(1048576.0)).cast(LongType))
        .as("iv"))
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("iv").as("qv"))
    val c = e.select(col("vec_id").as("cid"), col("iv").as("cv"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        aggregate(zip_with(col("qv"), col("cv"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v).as("dot_full"),
        aggregate(zip_with(slice(col("qv"), 1, 16), slice(col("cv"), 1, 16),
          (x, y) => x * y), lit(0L), (acc, v) => acc + v).as("dot_16"))
  }

  /** DuckDB side of [[recallSummary]]: the exact top-k is computed
    * independently (decimal-exact dots, same (cosine DESC, cid) tiebreak
    * as bruteForceTopK), n_queries/n_truth derive from it, and the
    * achieved n_hits is PINNED — measured deterministic (bit-stable
    * across partitionings; decimal-mean k-means) at the gate SF. A recall
    * regression in the approximate path turns the row red. */
  /** q124's fixed retrieval workload. The oracle SQL is GENERATED from
    * this list (bm25Sql), so the Spark plan and the DuckDB replay score
    * the same terms in the same float-addition order by construction. */
  private val bm25Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("hash", "join"),
    2 -> Seq("scan", "filter", "slow"),
    3 -> Seq("spark", "stream", "window"))

  /** DuckDB replay of Bm25.topK: same tokenizer (string_split_regex ↔
    * split, the q76-proven pair), same integer ratios in HUGEINT
    * (DECIMAL(38,0) on the Spark side), one double divide per term,
    * left-to-right term addition. */
  private def bm25Sql(queries: Seq[(Int, Seq[String])], k: Int,
      corpusSql: String = "SELECT doc_id, text FROM documents"): String = {
    val terms = queries.flatMap(_._2).distinct
    def tf(t: String) = s"tf_${terms.indexOf(t)}"
    def df(t: String) = s"df_${terms.indexOf(t)}"
    val baseCols = terms.map(t =>
      s"    len(list_filter(string_split_regex(lower(text), '\\s+'), " +
        s"x -> x = '$t')) AS ${tf(t)}").mkString(",\n")
    val dfCols = terms.map(t =>
      s"    SUM(CASE WHEN ${tf(t)} > 0 THEN 1 ELSE 0 END)::BIGINT AS ${df(t)}")
      .mkString(",\n")
    def termScore(t: String) =
      s"(CASE WHEN ${tf(t)} > 0 THEN " +
        s"CAST((2*n_docs - 2*${df(t)} + 1)::HUGEINT * 22 * ${tf(t)} * t_toks AS DOUBLE) / " +
        s"CAST((2*${df(t)} + 1)::HUGEINT * " +
        s"(10*${tf(t)}*t_toks + 3*t_toks + 9*dl*n_docs) AS DOUBLE) ELSE 0.0 END)"
    val qSelects = queries.map { case (qid, qTerms) =>
      s"  SELECT $qid AS query_id, doc_id,\n    " +
        qTerms.map(termScore).mkString("\n    + ") + s" AS score\n  FROM sc"
    }.mkString("\n  UNION ALL\n")
    s"""WITH base AS (
       |  SELECT doc_id,
       |    len(string_split_regex(lower(text), '\\s+')) AS dl,
       |$baseCols
       |  FROM ($corpusSql)),
       |stats AS (
       |  SELECT COUNT(*) AS n_docs, SUM(dl)::BIGINT AS t_toks,
       |$dfCols
       |  FROM base),
       |sc AS (SELECT * FROM base, stats),
       |allq AS (
       |$qSelects),
       |r AS (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |  FROM allq WHERE score > 0)
       |SELECT query_id, rank, doc_id, round(score, 6) AS score
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** q74's exact-cosine ranking parameterized by query ids — reused as
    * the dense half of the q138 hybrid oracle. */
  private def annBruteSql(ids: Seq[Int], k: Int): String =
    s"""WITH norms AS (
       |  SELECT vec_id, SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)
       |      * CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS n2
       |  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) GROUP BY vec_id),
       |el AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    unnest(q.embedding) AS qv, unnest(c.embedding) AS cv
       |  FROM embeddings q JOIN embeddings c
       |    ON q.vec_id IN (${ids.mkString(", ")}) AND c.vec_id != q.vec_id),
       |dots AS (
       |  SELECT qid, cid, SUM(CAST(FLOOR(CAST(qv AS DOUBLE) * 1048576) AS BIGINT)
       |      * CAST(FLOOR(CAST(cv AS DOUBLE) * 1048576) AS BIGINT)) AS dot
       |  FROM el GROUP BY qid, cid),
       |scored AS (
       |  SELECT d.qid, d.cid,
       |    CAST(d.dot AS DOUBLE) / (SQRT(CAST(nq.n2 AS DOUBLE)) * SQRT(CAST(nc.n2 AS DOUBLE))) AS cosine
       |  FROM dots d
       |  JOIN norms nq ON nq.vec_id = d.qid
       |  JOIN norms nc ON nc.vec_id = d.cid)
       |SELECT qid, rank, cid FROM (
       |  SELECT qid, cid,
       |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
       |  FROM scored) WHERE rank <= $k""".stripMargin

  /** RRF fusion of the generated lexical + dense oracles — identical
    * reciprocal-rank arithmetic to HybridRank.rrf (one double divide
    * per side, lexical term added first). */
  private def hybridSql(k: Int, k0: Int, topK: Int): String =
    s"""WITH lex AS (${bm25Sql(bm25Queries, k)}),
       |dense AS (${annBruteSql(Seq(1, 2, 3), k)}),
       |fused AS (
       |  SELECT COALESCE(l.query_id, d.qid) AS query_id,
       |    COALESCE(l.doc_id, d.cid) AS doc_id,
       |    l.rank AS lex_rank, d.rank AS dense_rank,
       |    COALESCE(CAST(1 AS DOUBLE) / ($k0 + l.rank), CAST(0 AS DOUBLE)) +
       |    COALESCE(CAST(1 AS DOUBLE) / ($k0 + d.rank), CAST(0 AS DOUBLE)) AS rrf
       |  FROM lex l FULL OUTER JOIN dense d
       |    ON d.qid = l.query_id AND d.cid = l.doc_id)
       |SELECT query_id, rank, doc_id, lex_rank, dense_rank,
       |  round(rrf, 6) AS rrf FROM (
       |  SELECT query_id, doc_id, lex_rank, dense_rank, rrf,
       |    row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank
       |  FROM fused) WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin

  /** Full portable MinHash-LSH pipeline in DuckDB SQL (q72's oracle),
    * with an optional final pair filter (q117's incremental gate). */
  private def portableLshSql(pairFilter: String): String = {
    val seedVals = TextDedup.portableSeeds(32).zipWithIndex
      .map { case (c, i) => s"($i, $c)" }.mkString(", ")
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5(concat_ws(' ', w[i+1], w[i+2], w[i+3])), 1, 15)) AS BIGINT) AS sh
      |  FROM (SELECT doc_id, w, unnest(range(0, greatest(len(w) - 3, 0) + 1)) AS i FROM ws)),
      |seeds(seed, sc) AS (VALUES $seedVals),
      |seeded AS (
      |  SELECT doc_id, s.seed, ${TextDedup.portableMixSql("sh.sh", "s.sc")} AS h
      |  FROM sh CROSS JOIN seeds s),
      |mins AS (SELECT doc_id, seed, MIN(h) AS m FROM seeded GROUP BY doc_id, seed),
      |bk AS (
      |  SELECT doc_id, seed // 8 AS band,
      |    string_agg(CAST(m AS VARCHAR), '_' ORDER BY seed) AS key
      |  FROM mins GROUP BY doc_id, seed // 8)
      |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
      |$pairFilter
      |ORDER BY doc_a, doc_b""".stripMargin
  }

  private def annRecallOracle(qFilter: String, k: Int, nHits: Int): String =
    s"""WITH norms AS (
       |  SELECT vec_id, SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)
       |      * CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS n2
       |  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) GROUP BY vec_id),
       |el AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS cid,
       |    unnest(q.embedding) AS qv, unnest(c.embedding) AS cv
       |  FROM embeddings q JOIN embeddings c ON $qFilter AND c.vec_id != q.vec_id),
       |dots AS (
       |  SELECT qid, cid, SUM(CAST(FLOOR(CAST(qv AS DOUBLE) * 1048576) AS BIGINT)
       |      * CAST(FLOOR(CAST(cv AS DOUBLE) * 1048576) AS BIGINT)) AS dot
       |  FROM el GROUP BY qid, cid),
       |scored AS (
       |  SELECT d.qid, d.cid,
       |    CAST(d.dot AS DOUBLE) / (SQRT(CAST(nq.n2 AS DOUBLE)) * SQRT(CAST(nc.n2 AS DOUBLE))) AS cosine
       |  FROM dots d
       |  JOIN norms nq ON nq.vec_id = d.qid
       |  JOIN norms nc ON nc.vec_id = d.cid),
       |topk AS (
       |  SELECT qid, cid FROM (
       |    SELECT qid, cid,
       |      row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
       |    FROM scored) WHERE rank <= $k)
       |SELECT COUNT(DISTINCT qid)::BIGINT AS n_queries, COUNT(*)::BIGINT AS n_truth,
       |  CAST($nHits AS BIGINT) AS n_hits,
       |  ROUND(CAST($nHits AS DOUBLE) / COUNT(*), 4) AS recall
       |FROM topk""".stripMargin

  /** q84's DuckDB gate, shared verbatim with q286: the streaming
    * decontamination is batch-local per trigger, so the batch gate IS
    * its oracle. */
  private val deconReportSql =
    """WITH block AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks
      |  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')),
      |grams AS (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) >= 3
      |      THEN list_distinct([array_to_string(toks[i:i+2], ' ')
      |                          for i in generate_series(1, len(toks)-2)])
      |      ELSE [array_to_string(toks, ' ')] END AS gs
      |  FROM block),
      |eval_grams AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 7 = 0),
      |exploded AS (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 7 != 0),
      |overlap AS (
      |  SELECT x.doc_id AS did, COUNT(DISTINCT x.g) AS n_overlap
      |  FROM exploded x JOIN eval_grams e ON e.g = x.g GROUP BY x.doc_id)
      |SELECT c.doc_id, len(c.gs) AS n_grams,
      |  COALESCE(o.n_overlap, 0) AS n_overlap,
      |  ROUND(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / len(c.gs), 6) AS overlap_ratio,
      |  CAST(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / len(c.gs) >= 0.1 AS INT) AS contaminated
      |FROM (SELECT doc_id, gs FROM grams WHERE doc_id % 7 != 0) c
      |LEFT JOIN overlap o ON o.did = c.doc_id
      |ORDER BY doc_id""".stripMargin

  /** q287's DuckDB gate, shared verbatim with the streaming build
    * (q292): the manifest's aggregates are associative+commutative, so
    * the streamed fold equals the batch fold. */
  /** q293's oracle: the full portable 1-gram shingle→minhash→band
    * pipeline (k=32, bands=8 → 4 rows/band — q71's operating point)
    * replayed in DuckDB over the src0-4 block, then the exact
    * token-set Jaccard curve over the candidate pairs as conditional
    * sums + an unnest back into rows. */
  private def dedupCurveSql: String = {
    val seedVals = TextDedup.portableSeeds(32).zipWithIndex
      .map { case (c, i) => s"($i, $c)" }.mkString(", ")
    val blk = "WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')"
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
      |  FROM documents $blk),
      |sh AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5(w[i+1]), 1, 15)) AS BIGINT) AS sh
      |  FROM (SELECT doc_id, w,
      |    unnest(range(0, greatest(len(w) - 1, 0) + 1)) AS i FROM ws)),
      |seeds(seed, sc) AS (VALUES $seedVals),
      |seeded AS (
      |  SELECT doc_id, s.seed, ${TextDedup.portableMixSql("sh.sh", "s.sc")} AS h
      |  FROM sh CROSS JOIN seeds s),
      |mins AS (SELECT doc_id, seed, MIN(h) AS m FROM seeded GROUP BY 1, 2),
      |bk AS (
      |  SELECT doc_id, seed // 4 AS band,
      |    string_agg(CAST(m AS VARCHAR), '_' ORDER BY seed) AS key
      |  FROM mins GROUP BY doc_id, seed // 4),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
      |    AND a.doc_id < b.doc_id),
      |sets AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
      |  FROM documents $blk),
      |p AS (
      |  SELECT CAST(len(list_intersect(sa.ts, sb.ts)) AS BIGINT) AS i,
      |    CAST(len(sa.ts) + len(sb.ts) - len(list_intersect(sa.ts, sb.ts))
      |      AS BIGINT) AS u
      |  FROM cand JOIN sets sa ON sa.doc_id = cand.da
      |    JOIN sets sb ON sb.doc_id = cand.db),
      |a AS (SELECT COUNT(*)::BIGINT AS n_candidates,
      |  SUM(CASE WHEN i*100 >= u*50 THEN 1 ELSE 0 END)::BIGINT AS n50,
      |  SUM(CASE WHEN i*100 >= u*60 THEN 1 ELSE 0 END)::BIGINT AS n60,
      |  SUM(CASE WHEN i*100 >= u*70 THEN 1 ELSE 0 END)::BIGINT AS n70,
      |  SUM(CASE WHEN i*100 >= u*80 THEN 1 ELSE 0 END)::BIGINT AS n80,
      |  SUM(CASE WHEN i*100 >= u*90 THEN 1 ELSE 0 END)::BIGINT AS n90,
      |  SUM(CASE WHEN i*100 >= u*95 THEN 1 ELSE 0 END)::BIGINT AS n95
      |  FROM p)
      |SELECT t.th AS threshold_pct,
      |  CASE t.th WHEN 50 THEN n50 WHEN 60 THEN n60 WHEN 70 THEN n70
      |    WHEN 80 THEN n80 WHEN 90 THEN n90 ELSE n95 END AS n_pairs,
      |  n_candidates
      |FROM a, (VALUES (50), (60), (70), (80), (90), (95)) AS t(th)
      |ORDER BY 1""".stripMargin
  }

  /** q321's oracle: the q293 portable candidate pipeline, then per-doc
    * max scaled similarity (exact floor division — the max is over
    * integers, engine-identical), left-joined back so candidate-less
    * docs land in the 'none' band. */
  private def nearestDupProfileSql: String = {
    val seedVals = TextDedup.portableSeeds(32).zipWithIndex
      .map { case (c, i) => s"($i, $c)" }.mkString(", ")
    val blk = "WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')"
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
      |  FROM documents $blk),
      |sh AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5(w[i+1]), 1, 15)) AS BIGINT) AS sh
      |  FROM (SELECT doc_id, w,
      |    unnest(range(0, greatest(len(w) - 1, 0) + 1)) AS i FROM ws)),
      |seeds(seed, sc) AS (VALUES $seedVals),
      |seeded AS (
      |  SELECT doc_id, s.seed, ${TextDedup.portableMixSql("sh.sh", "s.sc")} AS h
      |  FROM sh CROSS JOIN seeds s),
      |mins AS (SELECT doc_id, seed, MIN(h) AS m FROM seeded GROUP BY 1, 2),
      |bk AS (
      |  SELECT doc_id, seed // 4 AS band,
      |    string_agg(CAST(m AS VARCHAR), '_' ORDER BY seed) AS key
      |  FROM mins GROUP BY doc_id, seed // 4),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
      |    AND a.doc_id < b.doc_id),
      |sets AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
      |  FROM documents $blk),
      |p AS (
      |  SELECT cand.da, cand.db,
      |    CAST(len(list_intersect(sa.ts, sb.ts)) AS BIGINT) AS i,
      |    CAST(len(sa.ts) + len(sb.ts) AS BIGINT) AS ab
      |  FROM cand JOIN sets sa ON sa.doc_id = cand.da
      |    JOIN sets sb ON sb.doc_id = cand.db),
      |sims AS (SELECT da, db, (i * 1000000) // (ab - i) AS sim6 FROM p),
      |per_doc AS (
      |  SELECT doc_id, MAX(sim6) AS mx FROM (
      |    SELECT da AS doc_id, sim6 FROM sims
      |    UNION ALL SELECT db AS doc_id, sim6 FROM sims)
      |  GROUP BY 1),
      |banded AS (
      |  SELECT d.source,
      |    CASE WHEN pd.mx IS NULL THEN 'none'
      |      WHEN pd.mx >= 950000 THEN '95+'
      |      WHEN pd.mx >= 800000 THEN '80-95'
      |      WHEN pd.mx >= 500000 THEN '50-80'
      |      ELSE '<50' END AS band
      |  FROM (SELECT doc_id, source FROM documents $blk) d
      |  LEFT JOIN per_doc pd ON pd.doc_id = d.doc_id)
      |SELECT source, band, COUNT(*)::BIGINT AS n_docs
      |FROM banded GROUP BY 1, 2 ORDER BY source, band""".stripMargin
  }

  /** q301's oracle: the greedy farthest-point selection unrolled
    * CTE-per-pick — each round takes the (m DESC, vec_id) top-1 of the
    * running min-distance state, then folds the new center's exact
    * integer distances in with LEAST. Generated from k so the Spark
    * loop and the oracle cannot drift in round count. */
  private def coresetFpsSql(k: Int): String = {
    def dist(x: String, c: String) =
      s"CAST(list_sum(list_transform(range(1, len($x.codes)+1), " +
        s"i -> ($x.codes[i] - $c.codes[i]) * ($x.codes[i] - $c.codes[i]))) AS BIGINT)"
    val sb = new StringBuilder
    sb.append("""WITH codes AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS codes
      |  FROM embeddings),
      |c1 AS (SELECT vec_id, codes FROM codes ORDER BY vec_id LIMIT 1),
      |d1 AS (SELECT x.vec_id, x.codes, """.stripMargin)
    sb.append(dist("x", "c")).append(" AS m FROM codes x, c1 c)")
    for (i <- 2 to k) {
      sb.append(s""",
        |p$i AS (SELECT vec_id, codes, m FROM d${i - 1}
        |  ORDER BY m DESC, vec_id LIMIT 1),
        |d$i AS (SELECT x.vec_id, x.codes, LEAST(x.m, """.stripMargin)
      sb.append(dist("x", "c")).append(s") AS m FROM d${i - 1} x, p$i c)")
    }
    sb.append(
      "\nSELECT 1 AS pick, vec_id, CAST(0 AS BIGINT) AS radius2 FROM c1")
    for (i <- 2 to k)
      sb.append(s"\nUNION ALL SELECT $i, vec_id, m FROM p$i")
    sb.append("\nORDER BY pick")
    sb.toString
  }

  private val shardManifestSql =
    """WITH s AS (
      |  SELECT doc_id,
      |    CAST((ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
      |        + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 16
      |      AS INTEGER) AS shard,
      |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
      |  FROM documents)
      |SELECT shard, COUNT(*)::BIGINT AS n_docs,
      |  CAST(bit_xor(h) AS BIGINT) AS fingerprint,
      |  MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  val oracles: Map[String, String] = Map(
    "q286_stream_decon" -> deconReportSql,
    // the q122 sign-cell expression with fixed 6 bits; drift and
    // overload replayed cross-multiplied
    "q289_cell_drift" ->
      """WITH base AS (
        |  SELECT vec_id,
        |    CAST(list_sum(list_transform(range(6),
        |      i -> CASE WHEN embedding[CAST(i + 1 AS INT)] > 0
        |           THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS cell
        |  FROM embeddings),
        |per AS (
        |  SELECT cell,
        |    SUM(CASE WHEN vec_id % 10 != 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_base,
        |    SUM(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_delta
        |  FROM base GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_base) AS BIGINT) AS tb,
        |  CAST(SUM(n_delta) AS BIGINT) AS td, COUNT(*)::BIGINT AS nc
        |  FROM per),
        |dr AS (SELECT CAST(SUM(ABS(n_base * t.td - n_delta * t.tb))
        |  AS BIGINT) AS drift_num FROM per, tot t)
        |SELECT per.cell, per.n_base, per.n_delta,
        |  per.n_base + per.n_delta AS n_total,
        |  CAST((per.n_base + per.n_delta) * t.nc * 4 > 5 * (t.tb + t.td)
        |    AS INTEGER) AS overloaded,
        |  dr.drift_num
        |FROM per, tot t, dr ORDER BY per.cell""".stripMargin,
    // q88's shard key + the portable 60-bit text hash, xor-folded;
    // shared verbatim with q292 (stream == batch by xor associativity)
    "q287_shard_manifest" -> shardManifestSql,
    "q292_stream_manifest" -> shardManifestSql,
    // q70's content-key rule + q83's all-pairs recursive clusters,
    // folded into one per-source savings grid
    "q291_dedup_savings" ->
      """WITH RECURSIVE s AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS tok,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ckey,
        |    list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.95),
        |edges AS (
        |  SELECT doc_a AS s0, doc_b AS d0 FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT s0 AS a, d0 AS b FROM edges
        |  UNION
        |  SELECT r.a, e.d0 FROM reach r JOIN edges e ON r.b = e.s0 WHERE e.d0 != r.a),
        |mins AS (SELECT a, MIN(b) AS mn FROM reach GROUP BY a),
        |canon AS (
        |  SELECT d.doc_id FROM (SELECT doc_id FROM s) d
        |  LEFT JOIN mins m ON m.a = d.doc_id
        |  WHERE LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) = d.doc_id),
        |ek AS (SELECT MIN(doc_id) AS doc_id FROM s GROUP BY ckey)
        |SELECT source, COUNT(*)::BIGINT AS n_docs,
        |  CAST(SUM(tok) AS BIGINT) AS tokens_raw,
        |  CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM ek)
        |    THEN tok ELSE 0 END) AS BIGINT) AS tokens_exact,
        |  CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM canon)
        |    THEN tok ELSE 0 END) AS BIGINT) AS tokens_near
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // the q287 manifest per version; xor algebra replayed directly
    "q290_manifest_diff" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST((ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
        |        + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 16
        |      AS INTEGER) AS shard,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |per AS (
        |  SELECT shard,
        |    SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_v1,
        |    COUNT(*)::BIGINT AS n_v2,
        |    CAST(bit_xor(CASE WHEN doc_id % 2 = 0 THEN h ELSE 0 END)
        |      AS BIGINT) AS fp_v1,
        |    CAST(bit_xor(h) AS BIGINT) AS fp_v2
        |  FROM s GROUP BY 1)
        |SELECT shard, n_v1, n_v2, fp_v1, fp_v2,
        |  CAST(xor(fp_v1, fp_v2) AS BIGINT) AS delta_fp,
        |  CAST(fp_v1 != fp_v2 AS INTEGER) AS changed
        |FROM per ORDER BY shard""".stripMargin,
    // per-language integer char/token totals; the compression flag
    // replayed cross-multiplied against the corpus totals
    "q288_token_compression" ->
      """WITH per AS (
        |  SELECT lang, COUNT(*)::BIGINT AS n_docs,
        |    CAST(SUM(length(text)) AS BIGINT) AS total_chars,
        |    CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT)
        |      AS total_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(total_chars) AS BIGINT) AS tc,
        |  CAST(SUM(total_tokens) AS BIGINT) AS tt FROM per)
        |SELECT lang, n_docs, total_chars, total_tokens,
        |  CAST(total_chars * tot.tt > tot.tc * total_tokens AS INTEGER)
        |    AS high_chars_per_tok
        |FROM per, tot ORDER BY lang""".stripMargin,
    // integer-exact surprisal: bitlen via bin() string length on both
    // engines; keep-decision cross-multiplied (101/20 bits/token)
    "q166_surprisal_filter" ->
      """WITH toks AS (
        |  SELECT doc_id, tok FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
        |    FROM documents) WHERE tok <> ''),
        |dtc AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |lm AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS c FROM dtc GROUP BY 1),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM lm),
        |bits AS (
        |  SELECT tok, CAST(length(bin(n.n)) - length(bin(c)) AS BIGINT) AS bits
        |  FROM lm, n)
        |SELECT d.doc_id, CAST(SUM(d.tf) AS BIGINT) AS n_tokens,
        |  CAST(SUM(d.tf * b.bits) AS BIGINT) AS surprisal_sum,
        |  (SUM(d.tf * b.bits) * 20 <= 101 * SUM(d.tf)) AS keep
        |FROM dtc d JOIN bits b USING (tok)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // duplicated 8-token windows -> merged maximal spans; start index is
    // 1-based here vs 0-based posexplode on the Spark side — internal
    // only, the published span arithmetic is identical
    "q168_dup_spans" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |wl AS (
        |  SELECT doc_id, len(toks) AS n_tokens,
        |    CASE WHEN len(toks) >= 8
        |      THEN list_transform(range(1, len(toks) - 6),
        |        i -> struct_pack(s := i,
        |          gram := array_to_string(toks[i:i+7], ' ')))
        |      ELSE [] END AS ws
        |  FROM base),
        |wins AS (SELECT doc_id, n_tokens, unnest(ws) AS w FROM wl),
        |flat AS (SELECT doc_id, n_tokens, w.s AS start, w.gram AS gram FROM wins),
        |dupg AS (SELECT gram FROM flat GROUP BY gram
        |  HAVING COUNT(DISTINCT doc_id) > 1),
        |dup AS (SELECT f.* FROM flat f WHERE f.gram IN (SELECT gram FROM dupg)),
        |marked AS (
        |  SELECT doc_id, n_tokens, start,
        |    MAX(start + 7) OVER (PARTITION BY doc_id ORDER BY start
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM dup),
        |isl AS (
        |  SELECT doc_id, n_tokens, start,
        |    SUM(CASE WHEN prev_end IS NULL OR start > prev_end + 1
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY start
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM marked),
        |spans AS (
        |  SELECT doc_id, n_tokens, island,
        |    MAX(start) + 7 - MIN(start) + 1 AS span_tokens
        |  FROM isl GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  COUNT(*)::BIGINT AS n_spans,
        |  CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens
        |FROM spans GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // the q74 decimal-accumulation pattern, per (doc, dimension)
    "q185_embed_pool" ->
      """WITH e AS (
        |  SELECT vec_id // 4 AS doc, unnest(embedding) AS v,
        |    unnest(range(0, len(embedding))) AS pos
        |  FROM embeddings)
        |SELECT doc, pos,
        |  CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1099511627776.0)
        |      AS HUGEINT)) AS DOUBLE)
        |    / (COUNT(*) * 1099511627776.0) AS m,
        |  COUNT(*)::BIGINT AS n
        |FROM e GROUP BY 1, 2 ORDER BY doc, pos""".stripMargin,
    "q250_pool_max" ->
      """WITH e AS (
        |  SELECT vec_id // 4 AS doc, unnest(embedding) AS v,
        |    unnest(range(0, len(embedding))) AS pos
        |  FROM embeddings)
        |SELECT doc, pos, MAX(CAST(v AS DOUBLE)) AS m
        |FROM e GROUP BY 1, 2 ORDER BY doc, pos""".stripMargin,
    "q251_pool_cls" ->
      """WITH f AS (
        |  SELECT vec_id // 4 AS doc, vec_id AS ord, embedding,
        |    row_number() OVER (PARTITION BY vec_id // 4
        |      ORDER BY vec_id) AS rn
        |  FROM embeddings)
        |SELECT doc, ord, unnest(range(0, len(embedding))) AS pos,
        |  CAST(unnest(embedding) AS DOUBLE) AS v
        |FROM f WHERE rn = 1 ORDER BY doc, pos""".stripMargin,
    // same shingle definition as TextDedup.shingles (split on ' ',
    // w=3, short-doc whole-text fallback) hashed to the same 60-bit
    // md5 ids, exact set intersection via the NAIVE shingle self-join
    // — an independent implementation of the prefix-filtered path
    "q184_containment_dedup" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    CASE WHEN len(w) >= 3
        |      THEN list_transform(range(1, len(w) - 1),
        |        i -> array_to_string(w[i:i+2], ' '))
        |      ELSE [array_to_string(w, ' ')] END,
        |    s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)))) AS sh
        |  FROM (
        |    SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |sizes AS (SELECT doc_id, COUNT(*)::BIGINT AS sz FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*)::BIGINT AS inter
        |  FROM sh a JOIN sh b USING (sh)
        |  WHERE a.doc_id <> b.doc_id GROUP BY 1, 2)
        |SELECT i.a, i.b, i.inter, s.sz AS size_a, TRUE AS contained
        |FROM inter i JOIN sizes s ON s.doc_id = i.a
        |WHERE i.inter * 5 >= s.sz * 4
        |ORDER BY i.a, i.b""".stripMargin,
    // HUGEINT cross-multiply on the DuckDB side ≡ DECIMAL(38,0) on the
    // Spark side — both exact, so the collocation booleans replay
    "q174_pmi_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> '') AS l
        |  FROM documents),
        |uni AS (
        |  SELECT w, COUNT(*)::BIGINT AS c FROM (
        |    SELECT unnest(l) AS w FROM toks) GROUP BY 1),
        |n1 AS (SELECT CAST(SUM(c) AS BIGINT) AS n1 FROM uni),
        |bi AS (
        |  SELECT b.w1 AS w1, b.w2 AS w2 FROM (
        |    SELECT unnest(CASE WHEN len(l) >= 2
        |      THEN list_transform(range(1, len(l)),
        |        i -> struct_pack(w1 := l[i], w2 := l[i+1]))
        |      ELSE [] END) AS b
        |    FROM toks)),
        |big AS (SELECT w1, w2, COUNT(*)::BIGINT AS c12 FROM bi GROUP BY 1, 2),
        |m AS (SELECT CAST(SUM(c12) AS BIGINT) AS m FROM big)
        |SELECT b.w1, b.w2, b.c12,
        |  CAST(b.c12 AS HUGEINT) * n1.n1 * n1.n1 >
        |    CAST(m.m AS HUGEINT) * u1.c * u2.c AS colloc
        |FROM big b
        |JOIN uni u1 ON u1.w = b.w1
        |JOIN uni u2 ON u2.w = b.w2, n1, m
        |WHERE b.c12 >= 5
        |ORDER BY b.w1, b.w2""".stripMargin,
    "q75_ann_lsh" -> annRecallOracle("q.vec_id < 50", 3, 138),
    "q82_ann_ivf" -> annRecallOracle("q.vec_id < 20", 3, 58),
    // the persisted-index probe must reproduce q82's result exactly
    "q142_ann_ivf_indexed" -> annRecallOracle("q.vec_id < 20", 3, 58),
    "q86_ann_pq" -> annRecallOracle("q.vec_id < 20", 3, 51),
    // Integer-exact quantization recompute: same IEEE double ops
    // (cast, max, divide) and the same round-half-away tie rule on
    // both engines, then integer-only aggregation.
    "q119_embed_quant" ->
      """WITH s AS (
        |  SELECT vec_id,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
        |    embedding
        |  FROM embeddings),
        |el AS (
        |  SELECT vec_id, scale,
        |    unnest(embedding) AS x,
        |    unnest(range(1, len(embedding) + 1)) AS i
        |  FROM s),
        |c AS (
        |  SELECT vec_id, i,
        |    CASE WHEN scale = 0 THEN 0
        |      ELSE CAST(round(CAST(x AS DOUBLE) / scale, 0) AS BIGINT) END AS code
        |  FROM el)
        |SELECT vec_id, CAST(COUNT(*) AS INTEGER) AS n_dims,
        |  SUM(CASE WHEN abs(code) >= 127 THEN 1 ELSE 0 END)::BIGINT AS n_sat,
        |  SUM(code)::BIGINT AS code_sum,
        |  SUM(code * i)::BIGINT AS weighted_sum
        |FROM c GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "q124_bm25" -> bm25Sql(bm25Queries, 10),
    // identical scoring arithmetic from the index probe — same oracle
    "q140_bm25_indexed" -> bm25Sql(bm25Queries, 10),
    "q141_bpe_merges" -> graft.llm.Bpe.unrolledSql(m = 6),
    "q148_bpe_encode" -> graft.llm.Bpe.encodeSql(m = 6),
    "q137_chunking" ->
      (graft.llm.Chunker.chunkSql(window = 32, stride = 16, minTokens = 8) +
        "\nORDER BY doc_id, chunk_id"),
    "q138_hybrid_rrf" -> hybridSql(k = 20, k0 = 60, topK = 10),
    // the oracle scores the FINAL corpus directly — maintenance must
    // be indistinguishable from rebuild
    "q159_index_maintenance" -> bm25Sql(bm25Queries, 10, corpusSql =
      """SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 0 AND doc_id % 10 <> 0
        |      THEN text || ' graft update' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 <> 0""".stripMargin),
    "q160_random_projection" ->
      """WITH el AS (
        |  SELECT vec_id, g.i, embedding[g.i] AS v
        |  FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200)
        |  CROSS JOIN generate_series(1, 64) g(i)),
        |signs AS (
        |  SELECT i, j,
        |    CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || 'x' ||
        |      CAST(j AS VARCHAR)), 1, 8)) AS BIGINT) % 2 * 2 - 1 AS s
        |  FROM generate_series(1, 64) gi(i)
        |  CROSS JOIN generate_series(0, 7) gj(j))
        |SELECT vec_id, j,
        |  round(CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)
        |      * s) AS DOUBLE) / (1048576 * sqrt(8.0)), 6) AS p
        |FROM el JOIN signs USING (i)
        |GROUP BY vec_id, j ORDER BY vec_id, j""".stripMargin,
    "q158_negative_pairs" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 64 AS bk
        |  FROM documents),
        |reps AS (SELECT bk, MIN(doc_id) AS neg_doc_id FROM d GROUP BY 1),
        |a AS (
        |  SELECT d.doc_id, g.j + 1 AS neg_rank,
        |    (d.bk + CASE g.j WHEN 0 THEN 7 WHEN 1 THEN 19
        |            WHEN 2 THEN 31 ELSE 43 END) % 64 AS tb
        |  FROM d CROSS JOIN generate_series(0, 3) g(j))
        |SELECT a.doc_id, a.neg_rank, r.neg_doc_id
        |FROM a JOIN reps r ON r.bk = a.tb
        |WHERE r.neg_doc_id <> a.doc_id
        |ORDER BY doc_id, neg_rank""".stripMargin,
    "q147_priority_sample" ->
      """WITH pr AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(n_chars AS DOUBLE) * 4294967296.0 /
        |      (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) + 1) AS priority
        |  FROM documents),
        |top AS (
        |  SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id)
        |    AS rank
        |  FROM pr ORDER BY priority DESC, doc_id LIMIT 65),
        |tau AS (SELECT MIN(priority) AS tau FROM top)
        |SELECT rank, doc_id, source, n_chars, priority,
        |  GREATEST(CAST(n_chars AS DOUBLE), tau) AS w_hat
        |FROM top, tau WHERE rank <= 64 ORDER BY rank""".stripMargin,
    "q139_group_split" ->
      """WITH b AS (
        |  SELECT source, n_chars,
        |    CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 10 AS bk
        |  FROM documents)
        |SELECT CASE WHEN bk < 8 THEN 'train' WHEN bk = 8 THEN 'val'
        |            ELSE 'test' END AS split,
        |  COUNT(*)::BIGINT AS n_docs,
        |  COUNT(DISTINCT source)::BIGINT AS n_groups,
        |  SUM(n_chars)::BIGINT AS total_chars
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,
    // sqrt-flattened mixture replay: same integer min_n rate formula,
    // same md5-derived 60-bit uniform scaled by 2^-60.
    "q125_temp_mixture" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY 1),
        |m AS (SELECT MIN(n_src) AS min_n FROM c),
        |k AS (
        |  SELECT d.doc_id, d.source, c.n_src,
        |    sqrt(CAST(m.min_n AS DOUBLE) / CAST(c.n_src AS DOUBLE)) AS p,
        |    CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      / 1152921504606846976.0 AS u
        |  FROM documents d JOIN c USING (source), m)
        |SELECT source, n_src AS n_total,
        |  SUM(CASE WHEN u < p THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  MIN(CASE WHEN u < p THEN doc_id END) AS min_kept,
        |  SUM(CASE WHEN u < p THEN doc_id ELSE 0 END)::BIGINT AS sum_kept,
        |  ROUND(MAX(p), 6) AS rate
        |FROM k GROUP BY source, n_src ORDER BY source""".stripMargin,
    // The full two-iteration Lloyd fit unrolled: grid codes -> long
    // form -> (assign, update, carry-empty) x2 -> final assignment ->
    // per-cluster report. Every value is an exact integer or a
    // correctly-rounded double op both engines share, so this is a
    // bit-for-bit replay, not an approximation gate.
    "q123_kmeans" ->
      """WITH codes AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS codes
        |  FROM embeddings),
        |cl AS (
        |  SELECT vec_id, unnest(codes) AS v,
        |    unnest(range(1, len(codes) + 1)) AS i
        |  FROM codes),
        |c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, i, v FROM cl WHERE vec_id < 8),
        |d1 AS (
        |  SELECT cl.vec_id, c0.cid, SUM((cl.v - c0.v) * (cl.v - c0.v)) AS d2
        |  FROM cl JOIN c0 USING (i) GROUP BY 1, 2),
        |a1 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |    FROM d1) WHERE rn = 1),
        |u1 AS (
        |  SELECT a1.cid, cl.i,
        |    CAST(round(CAST(SUM(cl.v) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS v
        |  FROM cl JOIN a1 USING (vec_id) GROUP BY 1, 2),
        |c1 AS (
        |  SELECT c0.cid, c0.i, COALESCE(u1.v, c0.v) AS v
        |  FROM c0 LEFT JOIN u1 ON u1.cid = c0.cid AND u1.i = c0.i),
        |d2_ AS (
        |  SELECT cl.vec_id, c1.cid, SUM((cl.v - c1.v) * (cl.v - c1.v)) AS d2
        |  FROM cl JOIN c1 USING (i) GROUP BY 1, 2),
        |a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |    FROM d2_) WHERE rn = 1),
        |u2 AS (
        |  SELECT a2.cid, cl.i,
        |    CAST(round(CAST(SUM(cl.v) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS v
        |  FROM cl JOIN a2 USING (vec_id) GROUP BY 1, 2),
        |c2 AS (
        |  SELECT c1.cid, c1.i, COALESCE(u2.v, c1.v) AS v
        |  FROM c1 LEFT JOIN u2 ON u2.cid = c1.cid AND u2.i = c1.i),
        |d3 AS (
        |  SELECT cl.vec_id, c2.cid, SUM((cl.v - c2.v) * (cl.v - c2.v)) AS d2
        |  FROM cl JOIN c2 USING (i) GROUP BY 1, 2),
        |a3 AS (
        |  SELECT vec_id, cid, d2 FROM (
        |    SELECT vec_id, cid, d2,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |    FROM d3) WHERE rn = 1)
        |SELECT cid AS cluster, COUNT(*) AS n_members, MIN(vec_id) AS first_vec,
        |  SUM(vec_id)::BIGINT AS sum_vec, SUM(d2)::BIGINT AS inertia
        |FROM a3 GROUP BY cid ORDER BY cluster""".stripMargin,
    // IVF-PQ: cell prune can only drop candidates plain PQ would score,
    // yet the measured pin sits ABOVE q86's 51 — the probed-cell scan
    // plus refine=32 recovers more of the true top-3 than the unpruned
    // ADC ranking alone (fewer high-norm far-cell distractors).
    "q116_ann_ivfpq" -> annRecallOracle("q.vec_id < 20", 3, 55),
    // Full portable-hash MinHash-LSH pipeline recomputed in DuckDB:
    // shingle strings → md5-derived 60-bit hashes → 32 integer seed
    // mixes (generated from the SAME constants as the Spark side via
    // TextDedup.portableMixSql, so they cannot drift) → per-seed minima
    // → 4 banded keys → in-band equi-join.
    "q72_minhash_lsh" -> portableLshSql(""),
    // Same full-pipeline recompute, filtered to pairs involving the
    // "daily batch" — what the incremental index path must match.
    "q117_incremental_dedup" ->
      portableLshSql("WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0"),
    // The streaming form must land on the identical pair set — the
    // growing index makes the result trigger-split-invariant.
    "q118_stream_incr_dedup" ->
      portableLshSql("WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0"),
    "q132_fuzzy_join" ->
      """WITH p AS (SELECT p_partkey AS id, p_name AS name FROM part),
        |dirty AS (
        |  SELECT id, concat(substring(name, 1, pos), 'q',
        |    substring(name, pos + 2)) AS name
        |  FROM (SELECT id, name, (id % (length(name) - 6)) + 5 AS pos
        |        FROM p WHERE id % 3 = 0)),
        |cand AS (
        |  SELECT d.id AS dirty_id, d.name AS dirty_name,
        |    c.id AS clean_id, c.name AS clean_name,
        |    levenshtein(d.name, c.name) AS dist
        |  FROM dirty d JOIN p c
        |    ON substring(d.name, 1, 4) = substring(c.name, 1, 4)
        |  WHERE abs(length(d.name) - length(c.name)) <= 2
        |    AND levenshtein(d.name, c.name) <= 2),
        |best AS (SELECT *, row_number() OVER
        |  (PARTITION BY dirty_id ORDER BY dist, clean_id) AS rn FROM cand)
        |SELECT dirty_id, dirty_name, clean_id, clean_name,
        |  CAST(dist AS BIGINT) AS dist
        |FROM best WHERE rn = 1 ORDER BY dirty_id""".stripMargin,
    "q70_exact_dedup" ->
      """WITH g AS (
        |  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_key,
        |    MIN(doc_id) AS keeper, COUNT(*) AS n_copies
        |  FROM documents GROUP BY 1)
        |SELECT n_copies, COUNT(*) AS n_groups, MIN(keeper) AS first_keeper
        |FROM g GROUP BY n_copies ORDER BY n_copies""".stripMargin,
    // ALL-PAIRS ground truth over the 5-source block (tractable in
    // DuckDB at oracle scale): the Spark side must recover every one of
    // these pairs from LSH candidates alone.
    "q71_jaccard_neardup" ->
      """WITH s AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |           FROM documents
        |           WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4'))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.95
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Ground-truth clusters: all-pairs verified edges + recursive-CTE
    // reachability, component label = min reachable doc id.
    "q83_dedup_clusters" ->
      """WITH RECURSIVE s AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.95),
        |edges AS (
        |  SELECT doc_a AS s0, doc_b AS d0 FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT s0 AS a, d0 AS b FROM edges
        |  UNION
        |  SELECT r.a, e.d0 FROM reach r JOIN edges e ON r.b = e.s0 WHERE e.d0 != r.a),
        |mins AS (SELECT a, MIN(b) AS mn FROM reach GROUP BY a)
        |SELECT d.doc_id,
        |  LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS cluster_id,
        |  CAST(LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) = d.doc_id AS INT) AS is_canonical
        |FROM (SELECT doc_id FROM s) d LEFT JOIN mins m ON m.a = d.doc_id
        |ORDER BY doc_id""".stripMargin,
    // Clusters from all-pairs ground truth (q83's recursive CTE) +
    // q76's quality expression, argmax per cluster with min-id tiebreak.
    "q120_quality_keeper" ->
      """WITH RECURSIVE s AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.95),
        |edges AS (
        |  SELECT doc_a AS s0, doc_b AS d0 FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT s0 AS a, d0 AS b FROM edges
        |  UNION
        |  SELECT r.a, e.d0 FROM reach r JOIN edges e ON r.b = e.s0 WHERE e.d0 != r.a),
        |mins AS (SELECT a, MIN(b) AS mn FROM reach GROUP BY a),
        |clusters AS (
        |  SELECT d.doc_id, LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS cluster_id
        |  FROM (SELECT doc_id FROM s) d LEFT JOIN mins m ON m.a = d.doc_id),
        |q AS (
        |  SELECT doc_id,
        |    (CASE WHEN len(string_split_regex(text, '\s+')) BETWEEN 10 AND 1000 THEN 0.5 ELSE 0.0 END +
        |     CASE WHEN CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |       t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
        |       / len(string_split_regex(lower(text), '\s+')) > 0.01 THEN 0.3 ELSE 0.0 END +
        |     CASE WHEN CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |       / length(text) < 0.2 THEN 0.2 ELSE 0.0 END) AS quality
        |  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')),
        |ranked AS (
        |  SELECT c.cluster_id, c.doc_id, q.quality,
        |    row_number() OVER (PARTITION BY c.cluster_id ORDER BY q.quality DESC, c.doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members
        |  FROM clusters c JOIN q USING (doc_id))
        |SELECT cluster_id, doc_id AS keeper, n_members::BIGINT AS n_members,
        |  quality AS keeper_quality
        |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    "q84_decontaminate" -> deconReportSql,
    "q85_mixture_sample" ->
      """WITH ranked AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick_rank
        |  FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src5'))
        |SELECT doc_id, source, pick_rank FROM ranked
        |WHERE pick_rank <= CASE source
        |  WHEN 'src0' THEN 12 WHEN 'src1' THEN 5 WHEN 'src2' THEN 18
        |  WHEN 'src3' THEN 3 ELSE 25 END
        |ORDER BY source, pick_rank""".stripMargin,
    "q73_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)),
        |bits AS (
        |  SELECT doc_id, i, SUM((h >> i) & 1) AS ones, COUNT(*) AS n
        |  FROM tok CROSS JOIN generate_series(0, 47) g(i)
        |  GROUP BY doc_id, i),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN ones * 2 > n THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS sig
        |  FROM bits GROUP BY doc_id)
        |SELECT sig, COUNT(*) AS n, MIN(doc_id) AS keeper
        |FROM sig GROUP BY sig ORDER BY n DESC, sig""".stripMargin,
    "q74_ann_bruteforce" ->
      """WITH norms AS (
        |  SELECT vec_id, SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)
       |      * CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS n2
        |  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) GROUP BY vec_id),
        |el AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    unnest(q.embedding) AS qv, unnest(c.embedding) AS cv
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND c.vec_id != q.vec_id),
        |dots AS (
        |  SELECT qid, cid, SUM(CAST(FLOOR(CAST(qv AS DOUBLE) * 1048576) AS BIGINT)
       |      * CAST(FLOOR(CAST(cv AS DOUBLE) * 1048576) AS BIGINT)) AS dot
        |  FROM el GROUP BY qid, cid),
        |scored AS (
        |  SELECT d.qid, d.cid,
        |    CAST(d.dot AS DOUBLE) / (SQRT(CAST(nq.n2 AS DOUBLE)) * SQRT(CAST(nc.n2 AS DOUBLE))) AS cosine
        |  FROM dots d
        |  JOIN norms nq ON nq.vec_id = d.qid
        |  JOIN norms nc ON nc.vec_id = d.cid)
        |SELECT qid, rank, cid, ROUND(cosine, 6) AS cosine FROM (
        |  SELECT qid, cid, cosine,
        |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
        |  FROM scored) WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,
    "q81_embedding_neardup" ->
      """WITH norms AS (
        |  SELECT vec_id, SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)
       |      * CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS n2
        |  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) GROUP BY vec_id),
        |el AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb, a.label AS label,
        |    unnest(a.embedding) AS av, unnest(b.embedding) AS bv
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id),
        |dots AS (
        |  SELECT va, vb, label,
        |    SUM(CAST(FLOOR(CAST(av AS DOUBLE) * 1048576) AS BIGINT)
        |      * CAST(FLOOR(CAST(bv AS DOUBLE) * 1048576) AS BIGINT)) AS dot
        |  FROM el GROUP BY va, vb, label),
        |scored AS (
        |  SELECT d.va, d.vb, d.label,
        |    CAST(d.dot AS DOUBLE) / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))) AS cosine
        |  FROM dots d JOIN norms na ON na.vec_id = d.va JOIN norms nb ON nb.vec_id = d.vb)
        |SELECT va AS vec_a, vb AS vec_b, label, ROUND(cosine, 6) AS cosine
        |FROM scored WHERE cosine >= 0.3 ORDER BY vec_a, vec_b""".stripMargin,
    "q76_text_quality" ->
      """SELECT doc_id,
        |  len(string_split_regex(text, '\s+')) AS n_tokens,
        |  CAST(list_reduce(list_prepend(0, list_transform(string_split_regex(text, '\s+'), t -> length(t))), (a, x) -> a + x) AS DOUBLE)
        |    / len(string_split_regex(text, '\s+')) AS mean_tok_len,
        |  CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |    t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
        |    / len(string_split_regex(lower(text), '\s+')) AS stop_ratio,
        |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |    / length(text) AS punct_ratio,
        |  (CASE WHEN len(string_split_regex(text, '\s+')) BETWEEN 10 AND 1000 THEN 0.5 ELSE 0.0 END +
        |   CASE WHEN CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |     t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
        |     / len(string_split_regex(lower(text), '\s+')) > 0.01 THEN 0.3 ELSE 0.0 END +
        |   CASE WHEN CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |     / length(text) < 0.2 THEN 0.2 ELSE 0.0 END) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q77_langid" ->
      """WITH g AS (
        |  SELECT source, lang,
        |    len(list_filter(toks, t -> t IN ('the', 'a', 'fast', 'slow'))) AS h_en,
        |    len(list_filter(toks, t -> t IN ('el', 'la', 'rapido'))) AS h_es,
        |    len(list_filter(toks, t -> t IN ('der', 'die', 'das'))) AS h_de,
        |    len(list_filter(toks, t -> t IN ('le', 'la', 'vite'))) AS h_fr,
        |    len(list_filter(toks, t -> t IN ('de', 'shi'))) AS h_zh
        |  FROM (SELECT source, lang, string_split_regex(lower(text), '\s+') AS toks
        |        FROM documents)),
        |guessed AS (
        |  SELECT source, lang,
        |    CASE GREATEST(h_de, h_en, h_es, h_fr, h_zh)
        |      WHEN h_de THEN 'de' WHEN h_en THEN 'en' WHEN h_es THEN 'es'
        |      WHEN h_fr THEN 'fr' ELSE 'zh' END AS guess
        |  FROM g)
        |SELECT source, COUNT(*) AS n,
        |  count_if(guess = lang)::BIGINT AS n_correct,
        |  count_if(guess = 'en')::BIGINT AS n_en_guess
        |FROM guessed GROUP BY source ORDER BY source""".stripMargin,
    "q78_token_count" ->
      """SELECT source,
        |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpe,
        |  CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_ws,
        |  CAST(MAX(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS INTEGER) AS max_bpe
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q79_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split_regex(text, '\s+'),
        |        tok -> CAST(length(tok) * 17 + ascii(tok) AS BIGINT))),
        |    (acc, v) -> (acc * 31 + v) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q80_multimodal_binary" ->
      """SELECT doc_id, 'image/fake-' || (doc_id % 3) AS media_type,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS byte_len,
        |  sha256(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Closed-form pixel sums — no codec on the oracle side; the engine
    // must reproduce these through a real PNG encode+decode round-trip.
    "q111_image_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, xs.x, ys.y
        |  FROM d
        |  CROSS JOIN generate_series(0, 7) xs(x)
        |  CROSS JOIN generate_series(0, 5) ys(y)
        |  WHERE xs.x < w AND ys.y < h)
        |SELECT doc_id, CAST(MAX(w) AS INTEGER) AS width, CAST(MAX(h) AS INTEGER) AS height,
        |  SUM((doc_id + 3 * x + 7 * y) % 256)::BIGINT AS r_sum,
        |  SUM((2 * doc_id + 5 * x + y) % 256)::BIGINT AS g_sum,
        |  SUM((doc_id + x * y) % 256)::BIGINT AS b_sum
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // The fake model is a pure function of the payload: translation is
    // word-reversal (status 'error' for uuid%97=0 → original body),
    // probability is the first 6 md5 hex digits of the classified body
    // over 2^24 (an exact binary fraction — no float rounding on either
    // engine). The retry count (not-ready-on-first-attempt for uuid%5=0)
    // is exercised but not published — task re-execution would legally
    // change it (see the query body comment).
    "q113_ml_enrich" ->
      """WITH used AS (
        |  SELECT doc_id AS uuid,
        |    substr(md5(text), 1, 2) AS detected_lang,
        |    doc_id % 97 <> 0 AS translated,
        |    CASE WHEN doc_id % 97 = 0 THEN text
        |      ELSE array_to_string(list_reverse(string_split(text, ' ')), ' ')
        |    END AS body
        |  FROM documents)
        |SELECT uuid, detected_lang, translated,
        |  CASE WHEN CAST(('0x' || substr(md5(body), 1, 6)) AS BIGINT) / 16777216.0 >= 0.5
        |    THEN 'invalid' ELSE 'valid' END AS prediction,
        |  CAST(('0x' || substr(md5(body), 1, 6)) AS BIGINT) / 16777216.0 AS probability
        |FROM used ORDER BY uuid""".stripMargin,
    // Closed-form pixel sums over the stride-2 sampled frames — no
    // codec on the oracle side; the engine must reproduce these
    // through a real animated-GIF encode + frame-extract round-trip.
    "q115_video_frames" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + doc_id % 3 AS w, 12 + doc_id % 4 AS h,
        |    3 + doc_id % 5 AS nf
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, nf, fs.f, xs.x, ys.y
        |  FROM d
        |  CROSS JOIN generate_series(0, 6) fs(f)
        |  CROSS JOIN generate_series(0, 17) xs(x)
        |  CROSS JOIN generate_series(0, 14) ys(y)
        |  WHERE fs.f < nf AND fs.f % 2 = 0 AND xs.x < w AND ys.y < h)
        |SELECT doc_id, CAST(MAX(nf) AS INTEGER) AS n_frames,
        |  CAST((MAX(nf) + 1) // 2 AS INTEGER) AS n_sampled,
        |  SUM(((doc_id + x + 2 * y + 3 * f) % 4) * 85)::BIGINT AS gray_sum
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Closed-form PCM sample sums — no codec on the oracle side; the
    // engine must reproduce these through a real WAV encode+decode
    // round-trip.
    "q112_audio_decode" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        |    50 + doc_id % 37 AS nf
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, channels, nf, i.i
        |  FROM d CROSS JOIN generate_series(0, 86) i(i)
        |  WHERE i.i < nf)
        |SELECT doc_id, MAX(channels) AS channels, MAX(nf)::BIGINT AS n_frames,
        |  SUM((31 * doc_id + 7 * i) % 65536 - 32768)::BIGINT AS sum_ch0,
        |  SUM(CASE WHEN channels = 2
        |    THEN (31 * doc_id + 7 * i + 13) % 65536 - 32768 ELSE 0 END)::BIGINT AS sum_ch1
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q68_window_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id, unnest(
        |      CASE WHEN len(t) >= 8
        |        THEN [array_to_string(t[i:i+7], ' ') for i in generate_series(1, len(t)-7)]
        |        ELSE [array_to_string(t, ' ')] END) AS g
        |    FROM toks)),
        |dfreq AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g),
        |flagged AS (
        |  SELECT doc_id, COUNT(*) AS n_dup_windows
        |  FROM grams JOIN dfreq USING (g)
        |  WHERE df BETWEEN 2 AND 10 GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(f.n_dup_windows, 0) AS n_dup_windows,
        |  CAST(COALESCE(f.n_dup_windows, 0) > 0 AS INT) AS dup_flag
        |FROM documents d LEFT JOIN flagged f ON f.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q59_sequence_pack" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST((ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
        |        + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 8 AS INTEGER) AS shard,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |p AS (
        |  SELECT shard, doc_id, n_tok,
        |    COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM s)
        |SELECT shard, CAST(FLOOR(off / 512) AS BIGINT) AS bin, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM p GROUP BY shard, bin ORDER BY shard, bin""".stripMargin,
    // same md5 shard + offset-bin construction as q59, rolled up
    "q269_packing_audit" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST((ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
        |        + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 8 AS INTEGER) AS shard,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |p AS (
        |  SELECT shard, doc_id, n_tok,
        |    COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM s),
        |b AS (
        |  SELECT shard, CAST(FLOOR(off / 512) AS BIGINT) AS bin, n_tok
        |  FROM p),
        |r AS (
        |  SELECT shard, COUNT(DISTINCT bin)::BIGINT AS n_bins,
        |    CAST(SUM(n_tok) AS BIGINT) AS tokens,
        |    COUNT(*)::BIGINT AS n_docs
        |  FROM b GROUP BY 1)
        |SELECT shard, n_bins, tokens, n_docs,
        |  CAST(n_bins * 512 AS BIGINT) AS capacity,
        |  CAST((tokens + 511) // 512 AS BIGINT) AS lb_bins,
        |  CAST(n_bins - (tokens + 511) // 512 AS BIGINT) AS overhead_bins,
        |  CAST(tokens AS DOUBLE) / (n_bins * 512) AS fill_rate
        |FROM r ORDER BY shard""".stripMargin,
    "q57_repetition" ->
      """WITH g AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) >= 2
        |      THEN [array_to_string(toks[i:i+1], ' ') for i in generate_series(1, len(toks)-1)]
        |      ELSE [array_to_string(toks, ' ')] END AS g2,
        |    CASE WHEN len(toks) >= 3
        |      THEN [array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks)-2)]
        |      ELSE [array_to_string(toks, ' ')] END AS g3
        |  FROM g)
        |SELECT doc_id,
        |  ROUND(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6) AS rep2,
        |  ROUND(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 6) AS rep3
        |FROM r ORDER BY doc_id""".stripMargin,
    "q58_pii_redact" ->
      """WITH aug AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN text || ' contact user' || doc_id || '@example.com via https://site'
        |           || doc_id || '.org/p'
        |      ELSE text END AS aug
        |  FROM documents),
        |scrub AS (
        |  SELECT source, aug,
        |    len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |    len(regexp_extract_all(aug, 'https?://[^\s]+')) AS n_url,
        |    length(aug) - length(
        |      regexp_replace(
        |        regexp_replace(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |        'https?://[^\s]+', '<URL>', 'g')) AS saved
        |  FROM aug)
        |SELECT source, CAST(SUM(n_email) AS BIGINT) AS emails,
        |  CAST(SUM(n_url) AS BIGINT) AS urls,
        |  CAST(SUM(saved) AS BIGINT) AS bytes_saved,
        |  count_if(n_email + n_url > 0)::BIGINT AS docs_with_pii
        |FROM scrub GROUP BY source ORDER BY source""".stripMargin,
    "q87_semantic_dedup" ->
      """WITH base AS (
        |  SELECT vec_id, embedding,
        |    CAST(CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
        |       + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
        |       + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
        |       + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END
        |       + CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END
        |       + CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END
        |       + CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END
        |       + CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END AS BIGINT) AS cell
        |  FROM embeddings),
        |norms AS (
        |  SELECT vec_id, SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)
       |      * CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS n2
        |  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) GROUP BY vec_id),
        |el AS (
        |  SELECT a.vec_id AS aid, b.vec_id AS bid,
        |    unnest(a.embedding) AS av, unnest(b.embedding) AS bv
        |  FROM base a JOIN base b ON a.cell = b.cell AND a.vec_id < b.vec_id),
        |dots AS (
        |  SELECT aid, bid, SUM(CAST(FLOOR(CAST(av AS DOUBLE) * 1048576) AS BIGINT)
        |      * CAST(FLOOR(CAST(bv AS DOUBLE) * 1048576) AS BIGINT)) AS dot
        |  FROM el GROUP BY aid, bid),
        |scored AS (
        |  SELECT d.bid, CAST(d.dot AS DOUBLE)
        |      / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))) AS cosine
        |  FROM dots d
        |  JOIN norms na ON na.vec_id = d.aid
        |  JOIN norms nb ON nb.vec_id = d.bid),
        |prior AS (
        |  SELECT bid, MAX(cosine) AS mx FROM scored WHERE cosine >= 0.2 GROUP BY bid)
        |SELECT b.vec_id, b.cell,
        |  CASE WHEN p.mx IS NULL THEN 1 ELSE 0 END AS kept,
        |  ROUND(p.mx, 6) AS max_prior_cos
        |FROM base b LEFT JOIN prior p ON p.bid = b.vec_id
        |ORDER BY vec_id""".stripMargin,
    "q122_semantic_dedup_auto" ->
      """WITH nrow AS (SELECT count(*) AS c FROM embeddings),
        |bits AS (SELECT greatest(4, least(20,
        |  (SELECT min(b) FROM range(0, 21) t(b), nrow WHERE 2**b >= ceil(c / 64.0)))) AS bts),
        |base AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_sum(list_transform(range((SELECT bts FROM bits)),
        |      i -> CASE WHEN embedding[CAST(i + 1 AS INT)] > 0 THEN (1::BIGINT << i) ELSE 0 END)) AS BIGINT) AS cell
        |  FROM embeddings),
        |norms AS (
        |  SELECT vec_id, SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)
       |      * CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS n2
        |  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) GROUP BY vec_id),
        |el AS (
        |  SELECT a.vec_id AS aid, b.vec_id AS bid,
        |    unnest(a.embedding) AS av, unnest(b.embedding) AS bv
        |  FROM base a JOIN base b ON a.cell = b.cell AND a.vec_id < b.vec_id),
        |dots AS (
        |  SELECT aid, bid, SUM(CAST(FLOOR(CAST(av AS DOUBLE) * 1048576) AS BIGINT)
        |      * CAST(FLOOR(CAST(bv AS DOUBLE) * 1048576) AS BIGINT)) AS dot
        |  FROM el GROUP BY aid, bid),
        |scored AS (
        |  SELECT d.bid, CAST(d.dot AS DOUBLE)
        |      / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))) AS cosine
        |  FROM dots d
        |  JOIN norms na ON na.vec_id = d.aid
        |  JOIN norms nb ON nb.vec_id = d.bid),
        |prior AS (
        |  SELECT bid, MAX(cosine) AS mx FROM scored WHERE cosine >= 0.2 GROUP BY bid)
        |SELECT b.vec_id, b.cell,
        |  CASE WHEN p.mx IS NULL THEN 1 ELSE 0 END AS kept,
        |  ROUND(p.mx, 6) AS max_prior_cos
        |FROM base b LEFT JOIN prior p ON p.bid = b.vec_id
        |ORDER BY vec_id""".stripMargin,
    // plain global row_number replays the two-phase distributed rank
    // (rank is a property of the total order, not of the exchange)
    "q277_token_balanced_shards" ->
      """WITH ranked AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok,
        |    row_number() OVER (
        |      ORDER BY CAST(len(string_split_regex(text, '\s+')) AS BIGINT) DESC,
        |        doc_id) - 1 AS r
        |  FROM documents),
        |dealt AS (
        |  SELECT doc_id, n_tok,
        |    CAST(CASE WHEN (r // 16) % 2 = 0 THEN r % 16
        |         ELSE 15 - (r % 16) END AS INTEGER) AS shard
        |  FROM ranked),
        |per AS (
        |  SELECT shard, COUNT(*)::BIGINT AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS tokens
        |  FROM dealt GROUP BY 1),
        |sp AS (SELECT MAX(tokens) - MIN(tokens) AS spread FROM per)
        |SELECT shard, n_docs, tokens, sp.spread
        |FROM per, sp ORDER BY shard""".stripMargin,
    // every systematic draw replayed: same cumulative axis (doc_id
    // order), same midpoint-target counting formula in BIGINT
    "q314_systematic_resample" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, source, n_tok,
        |    CAST(SUM(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(SUM(n_tok) OVER () AS BIGINT) AS total
        |  FROM w WHERE n_tok > 0),
        |m AS (
        |  SELECT source, doc_id,
        |    (2000 * cum + total - 1) // (2 * total)
        |      - (2000 * (cum - n_tok) + total - 1) // (2 * total) AS mult
        |  FROM pos)
        |SELECT source, COUNT(*)::BIGINT AS n_docs_drawn,
        |  CAST(SUM(mult) AS BIGINT) AS draws,
        |  CAST(MAX(mult) AS BIGINT) AS max_mult
        |FROM m WHERE mult > 0 GROUP BY 1 ORDER BY source""".stripMargin,
    // the sequential UniMax loop replayed via the same closed-form
    // prefix test — capped set is a prefix of the cap-ascending order
    "q278_unimax_budget" ->
      """WITH c AS (
        |  SELECT substr(source, 4, 1) AS domain,
        |    CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tok
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT COUNT(*)::BIGINT AS n_src,
        |    CAST((SUM(n_tok) * 3) // 2 AS BIGINT) AS b FROM c),
        |r AS (
        |  SELECT domain, n_tok, n_tok * 2 AS cap,
        |    CAST(row_number() OVER (ORDER BY n_tok * 2, domain) AS BIGINT) AS k,
        |    CAST(COALESCE(SUM(n_tok * 2) OVER (ORDER BY n_tok * 2, domain
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS prefix
        |  FROM c),
        |f AS (SELECT r.*, t.n_src, t.b,
        |    CASE WHEN cap * (t.n_src - k + 1) <= t.b - prefix
        |         THEN 1 ELSE 0 END AS flag
        |  FROM r, tot t),
        |ks AS (SELECT COALESCE(MAX(CASE WHEN flag = 1 THEN k END), 0) AS kstar,
        |    CAST(COALESCE(SUM(CASE WHEN flag = 1 THEN cap END), 0) AS BIGINT)
        |      AS csum
        |  FROM f),
        |a AS (
        |  SELECT f.domain, f.n_tok, f.cap,
        |    CAST(CASE WHEN f.k <= ks.kstar THEN f.cap
        |         ELSE (f.b - ks.csum) // (f.n_src - ks.kstar) END AS BIGINT)
        |      AS alloc_tok,
        |    CAST(CASE WHEN f.k <= ks.kstar THEN 1 ELSE 0 END AS INTEGER)
        |      AS is_capped,
        |    f.b
        |  FROM f, ks),
        |sp2 AS (SELECT CAST(SUM(alloc_tok) AS BIGINT) AS spent FROM a)
        |SELECT a.domain, a.n_tok, a.cap, a.alloc_tok, a.is_capped,
        |  CAST(a.b - sp2.spent AS BIGINT) AS leftover
        |FROM a, sp2 ORDER BY a.domain""".stripMargin,
    // clusters from all-pairs ground truth (q83's recursive CTE), then
    // the same md5-bucket split applied to cluster id vs doc id
    "q279_cluster_split" ->
      """WITH RECURSIVE s AS (
        |  SELECT doc_id, n_chars, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.95),
        |edges AS (
        |  SELECT doc_a AS s0, doc_b AS d0 FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT s0 AS a, d0 AS b FROM edges
        |  UNION
        |  SELECT r.a, e.d0 FROM reach r JOIN edges e ON r.b = e.s0 WHERE e.d0 != r.a),
        |mins AS (SELECT a, MIN(b) AS mn FROM reach GROUP BY a),
        |cl AS (
        |  SELECT d.doc_id, d.n_chars,
        |    LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS cluster_id
        |  FROM (SELECT doc_id, n_chars FROM s) d LEFT JOIN mins m ON m.a = d.doc_id),
        |sp AS (
        |  SELECT doc_id, n_chars, cluster_id,
        |    CASE WHEN cb < 8 THEN 'train' WHEN cb = 8 THEN 'val'
        |         ELSE 'test' END AS split,
        |    CASE WHEN db < 8 THEN 'train' WHEN db = 8 THEN 'val'
        |         ELSE 'test' END AS naive_split
        |  FROM (SELECT *,
        |      CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) % 10 AS cb,
        |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) % 10 AS db
        |    FROM cl)),
        |st AS (
        |  SELECT COUNT(CASE WHEN cs > 1 THEN 1 END)::BIGINT AS cluster_straddle,
        |    COUNT(CASE WHEN ns > 1 THEN 1 END)::BIGINT AS naive_straddle
        |  FROM (SELECT cluster_id, COUNT(DISTINCT split) AS cs,
        |      COUNT(DISTINCT naive_split) AS ns FROM sp GROUP BY 1))
        |SELECT split, COUNT(*)::BIGINT AS n_docs,
        |  COUNT(DISTINCT cluster_id)::BIGINT AS n_clusters,
        |  SUM(n_chars)::BIGINT AS total_chars,
        |  st.cluster_straddle, st.naive_straddle
        |FROM sp, st
        |GROUP BY split, st.cluster_straddle, st.naive_straddle
        |ORDER BY split""".stripMargin,
    // integer deci-score (q76's bands x10) crossed with the threshold
    // spine — the conditional-sum single pass replayed as a cross join
    "q280_quality_sweep" ->
      """WITH sc AS (
        |  SELECT
        |    (CASE WHEN len(string_split_regex(text, '\s+')) BETWEEN 10 AND 1000 THEN 5 ELSE 0 END +
        |     CASE WHEN CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |       t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
        |       / len(string_split_regex(lower(text), '\s+')) > 0.01 THEN 3 ELSE 0 END +
        |     CASE WHEN CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |       / length(text) < 0.2 THEN 2 ELSE 0 END) AS s10,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |th AS (SELECT UNNEST(range(0, 11)) AS th)
        |SELECT CAST(th.th AS INTEGER) AS threshold10,
        |  COUNT(CASE WHEN sc.s10 >= th.th THEN 1 END)::BIGINT AS kept_docs,
        |  CAST(COALESCE(SUM(CASE WHEN sc.s10 >= th.th THEN sc.n_tok END), 0)
        |    AS BIGINT) AS kept_tokens
        |FROM sc, th GROUP BY 1 ORDER BY 1""".stripMargin,
    // plain global cumulative sum replays the two-phase running total
    // (the prefix sum is a property of the total order, not of the
    // exchange that computed it)
    "q281_budget_cut" ->
      """WITH sc AS (
        |  SELECT doc_id, source,
        |    (CASE WHEN len(string_split_regex(text, '\s+')) BETWEEN 10 AND 1000 THEN 5 ELSE 0 END +
        |     CASE WHEN CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |       t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
        |       / len(string_split_regex(lower(text), '\s+')) > 0.01 THEN 3 ELSE 0 END +
        |     CASE WHEN CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |       / length(text) < 0.2 THEN 2 ELSE 0 END) AS s10,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT *, SUM(n_tok) OVER (ORDER BY s10 DESC, doc_id) AS cum,
        |    CAST(SUM(n_tok) OVER () // 4 AS BIGINT) AS b
        |  FROM sc)
        |SELECT source,
        |  COUNT(CASE WHEN cum <= b THEN 1 END)::BIGINT AS kept_docs,
        |  CAST(COALESCE(SUM(CASE WHEN cum <= b THEN n_tok END), 0) AS BIGINT)
        |    AS kept_tokens,
        |  COUNT(*)::BIGINT AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // same integer-dot scoring as q283; top-3 and majority vote
    // replayed as two row_number windows
    "q285_knn_probe" ->
      """WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
        |ev AS (SELECT * FROM e WHERE vec_id % 10 = 0),
        |tr AS (SELECT * FROM e WHERE vec_id % 10 != 0),
        |norms AS (
        |  SELECT vec_id, SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)
        |      * CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS n2
        |  FROM (SELECT vec_id, unnest(embedding) AS v FROM e) GROUP BY 1),
        |el AS (
        |  SELECT a.vec_id AS eval_id, a.label AS elabel,
        |    b.vec_id AS train_id, b.label AS tlabel,
        |    unnest(a.embedding) AS av, unnest(b.embedding) AS bv
        |  FROM ev a JOIN tr b ON true),
        |dots AS (
        |  SELECT eval_id, elabel, train_id, tlabel,
        |    SUM(CAST(FLOOR(CAST(av AS DOUBLE) * 1048576) AS BIGINT)
        |      * CAST(FLOOR(CAST(bv AS DOUBLE) * 1048576) AS BIGINT)) AS dot
        |  FROM el GROUP BY 1, 2, 3, 4),
        |scored AS (
        |  SELECT d.eval_id, d.elabel, d.train_id, d.tlabel,
        |    CAST(d.dot AS DOUBLE) /
        |      (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE)))
        |      AS cosine
        |  FROM dots d JOIN norms na ON na.vec_id = d.eval_id
        |    JOIN norms nb ON nb.vec_id = d.train_id),
        |top3 AS (
        |  SELECT * FROM (
        |    SELECT eval_id, elabel, tlabel,
        |      row_number() OVER (PARTITION BY eval_id
        |        ORDER BY cosine DESC, train_id) AS rn
        |    FROM scored) WHERE rn <= 3),
        |votes AS (
        |  SELECT eval_id, elabel, tlabel, COUNT(*)::BIGINT AS votes
        |  FROM top3 GROUP BY 1, 2, 3),
        |pred AS (
        |  SELECT * FROM (
        |    SELECT eval_id, elabel, tlabel,
        |      row_number() OVER (PARTITION BY eval_id
        |        ORDER BY votes DESC, tlabel) AS vr
        |    FROM votes) WHERE vr = 1)
        |SELECT elabel AS label, COUNT(*)::BIGINT AS n_eval,
        |  SUM(CASE WHEN tlabel = elabel THEN 1 ELSE 0 END)::BIGINT
        |    AS n_correct
        |FROM pred GROUP BY 1 ORDER BY 1""".stripMargin,
    // q278's waterfilling CTE extended with the epoch split and the
    // q125-convention md5 uniform partial pick
    "q284_epoch_schedule" ->
      """WITH c AS (
        |  SELECT substr(source, 4, 1) AS domain,
        |    CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tok
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT COUNT(*)::BIGINT AS n_src,
        |    CAST((SUM(n_tok) * 3) // 2 AS BIGINT) AS b FROM c),
        |r AS (
        |  SELECT domain, n_tok, n_tok * 2 AS cap,
        |    CAST(row_number() OVER (ORDER BY n_tok * 2, domain) AS BIGINT) AS k,
        |    CAST(COALESCE(SUM(n_tok * 2) OVER (ORDER BY n_tok * 2, domain
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS prefix
        |  FROM c),
        |f AS (SELECT r.*, t.n_src, t.b,
        |    CASE WHEN cap * (t.n_src - k + 1) <= t.b - prefix
        |         THEN 1 ELSE 0 END AS flag
        |  FROM r, tot t),
        |ks AS (SELECT COALESCE(MAX(CASE WHEN flag = 1 THEN k END), 0) AS kstar,
        |    CAST(COALESCE(SUM(CASE WHEN flag = 1 THEN cap END), 0) AS BIGINT)
        |      AS csum
        |  FROM f),
        |a AS (
        |  SELECT f.domain, f.n_tok,
        |    CAST(CASE WHEN f.k <= ks.kstar THEN f.cap
        |         ELSE (f.b - ks.csum) // (f.n_src - ks.kstar) END AS BIGINT)
        |      AS alloc_tok
        |  FROM f, ks),
        |plan AS (
        |  SELECT domain, n_tok, alloc_tok,
        |    CAST(alloc_tok // n_tok AS BIGINT) AS full_epochs,
        |    CAST(alloc_tok - (alloc_tok // n_tok) * n_tok AS BIGINT)
        |      AS rem_tok
        |  FROM a),
        |d AS (
        |  SELECT substr(source, 4, 1) AS domain, doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS tok,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) / 1152921504606846976.0 AS u
        |  FROM documents)
        |SELECT p.domain, p.n_tok, p.alloc_tok, p.full_epochs, p.rem_tok,
        |  SUM(CASE WHEN d.u * p.n_tok < p.rem_tok THEN 1 ELSE 0 END)::BIGINT
        |    AS sched_docs,
        |  CAST(COALESCE(SUM(CASE WHEN d.u * p.n_tok < p.rem_tok
        |    THEN d.tok ELSE 0 END), 0) AS BIGINT) AS sched_tokens
        |FROM plan p JOIN d USING (domain)
        |GROUP BY 1, 2, 3, 4, 5 ORDER BY 1""".stripMargin,
    // same floor(v*2^20) integer dots as the q74/q81 oracles; argmax
    // replayed as row_number over (cosine DESC, train_id)
    "q283_semantic_decon" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |ev AS (SELECT vec_id, embedding FROM e WHERE vec_id % 10 = 0),
        |tr AS (SELECT vec_id, embedding FROM e WHERE vec_id % 10 != 0),
        |norms AS (
        |  SELECT vec_id, SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)
        |      * CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS n2
        |  FROM (SELECT vec_id, unnest(embedding) AS v FROM e) GROUP BY 1),
        |el AS (
        |  SELECT a.vec_id AS eval_id, b.vec_id AS train_id,
        |    unnest(a.embedding) AS av, unnest(b.embedding) AS bv
        |  FROM ev a JOIN tr b ON true),
        |dots AS (
        |  SELECT eval_id, train_id,
        |    SUM(CAST(FLOOR(CAST(av AS DOUBLE) * 1048576) AS BIGINT)
        |      * CAST(FLOOR(CAST(bv AS DOUBLE) * 1048576) AS BIGINT)) AS dot
        |  FROM el GROUP BY 1, 2),
        |scored AS (
        |  SELECT d.eval_id, d.train_id,
        |    CAST(d.dot AS DOUBLE) /
        |      (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE)))
        |      AS cosine
        |  FROM dots d JOIN norms na ON na.vec_id = d.eval_id
        |    JOIN norms nb ON nb.vec_id = d.train_id),
        |best AS (
        |  SELECT eval_id, train_id, cosine,
        |    row_number() OVER (PARTITION BY eval_id
        |      ORDER BY cosine DESC, train_id) AS rn
        |  FROM scored)
        |SELECT eval_id, ROUND(cosine, 6) AS max_cosine,
        |  train_id AS nearest_train,
        |  CAST(cosine >= 0.4 AS INTEGER) AS contaminated
        |FROM best WHERE rn = 1 ORDER BY eval_id""".stripMargin,
    // q263's exact-rational KN model + per-doc instance join; the same
    // length(bin(x)) integer bit-length proxy as q166
    "q282_kn_surprisal" ->
      """WITH tl AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> '') AS l
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, source, unnest(l) AS w,
        |    unnest(range(1, len(l) + 1)) AS pos
        |  FROM tl),
        |inst AS (
        |  SELECT doc_id, source, w1, w2 FROM (
        |    SELECT doc_id, source, w AS w1,
        |      lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |    FROM toks)
        |  WHERE w2 IS NOT NULL),
        |bg AS (SELECT w1, w2, COUNT(*)::BIGINT AS c FROM inst GROUP BY 1, 2),
        |st AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1,
        |  COUNT(*)::BIGINT AS n_follow FROM bg GROUP BY 1),
        |pr AS (SELECT w2, COUNT(*)::BIGINT AS n_prec FROM bg GROUP BY 1),
        |ty AS (SELECT COUNT(*)::BIGINT AS t FROM bg),
        |bits AS (
        |  SELECT bg.w1, bg.w2,
        |    CAST(length(bin(CAST(4 * st.cw1 * ty.t AS BIGINT))) -
        |      length(bin(CAST((4 * bg.c - 3) * ty.t +
        |        3 * st.n_follow * pr.n_prec AS BIGINT))) AS BIGINT) AS bits
        |  FROM bg JOIN st USING (w1) JOIN pr USING (w2), ty),
        |di AS (SELECT doc_id, source, w1, w2, COUNT(*)::BIGINT AS tf
        |  FROM inst GROUP BY 1, 2, 3, 4),
        |perdoc AS (
        |  SELECT d.doc_id, d.source, CAST(SUM(d.tf) AS BIGINT) AS n_bg,
        |    CAST(SUM(d.tf * b.bits) AS BIGINT) AS bits_sum
        |  FROM di d JOIN bits b USING (w1, w2) GROUP BY 1, 2),
        |persrc AS (
        |  SELECT source, COUNT(*)::BIGINT AS n_docs,
        |    CAST(SUM(n_bg) AS BIGINT) AS n_bigrams,
        |    CAST(SUM(bits_sum) AS BIGINT) AS bits_total
        |  FROM perdoc GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_bigrams) AS BIGINT) AS nb,
        |  CAST(SUM(bits_total) AS BIGINT) AS bt FROM persrc)
        |SELECT source, n_docs, n_bigrams, bits_total,
        |  CAST(bits_total * tot.nb > tot.bt * n_bigrams AS INTEGER)
        |    AS high_surprisal
        |FROM persrc, tot ORDER BY source""".stripMargin,

    "q88_shard_export" ->
      """WITH sharded AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST((ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
        |        + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 16 AS INTEGER) AS shard
        |  FROM documents)
        |SELECT shard, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM sharded GROUP BY shard ORDER BY shard""".stripMargin,
    "q89_prep_pipeline" ->
      """WITH s1 AS (SELECT * FROM documents WHERE n_chars >= 120),
        |s2 AS (SELECT * FROM s1 WHERE lang = 'en'),
        |s3 AS (SELECT * FROM s2 WHERE
        |  (CASE WHEN len(string_split_regex(text, '\s+')) BETWEEN 10 AND 1000 THEN 0.5 ELSE 0.0 END +
        |   CASE WHEN CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |     t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
        |     / len(string_split_regex(lower(text), '\s+')) > 0.01 THEN 0.3 ELSE 0.0 END +
        |   CASE WHEN CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |     / length(text) < 0.2 THEN 0.2 ELSE 0.0 END) >= 0.7),
        |s4 AS (SELECT DISTINCT md5(lower(text)) AS k FROM s3)
        |SELECT CAST(0 AS INTEGER) AS stage_idx, 'raw' AS stage, (SELECT COUNT(*) FROM documents) AS n_rows
        |UNION ALL SELECT 1, 'min_length', (SELECT COUNT(*) FROM s1)
        |UNION ALL SELECT 2, 'lang_en', (SELECT COUNT(*) FROM s2)
        |UNION ALL SELECT 3, 'quality', (SELECT COUNT(*) FROM s3)
        |UNION ALL SELECT 4, 'exact_dedup', (SELECT COUNT(*) FROM s4)
        |ORDER BY stage_idx""".stripMargin,
    "q271_pipeline_card" ->
      """WITH base AS (
        |  SELECT doc_id, source, text,
        |    doc_id % 7 = 0 AS is_eval,
        |    md5(lower(text)) AS k,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok,
        |    CAST((ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
        |        + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 8 AS INTEGER) AS shard
        |  FROM documents),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |grams AS (
        |  SELECT doc_id, CASE WHEN len(toks) >= 8
        |    THEN list_distinct([array_to_string(toks[i:i+7], ' ')
        |                        for i in generate_series(1, len(toks)-7)])
        |    ELSE [array_to_string(toks, ' ')] END AS gs
        |  FROM toks),
        |eval_grams AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 7 = 0),
        |overlap AS (
        |  SELECT x.doc_id AS did, COUNT(DISTINCT x.g) AS n_overlap
        |  FROM (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 7 != 0) x
        |  JOIN eval_grams e ON e.g = x.g GROUP BY x.doc_id),
        |contam AS (
        |  SELECT c.doc_id,
        |    CAST(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / len(c.gs) >= 0.1 AS INT) AS contaminated
        |  FROM (SELECT doc_id, gs FROM grams WHERE doc_id % 7 != 0) c
        |  LEFT JOIN overlap o ON o.did = c.doc_id),
        |f1 AS (
        |  SELECT b.*, COALESCE(ct.contaminated, 0) AS contaminated,
        |    SUM(CASE WHEN NOT is_eval THEN 1 ELSE 0 END) OVER
        |      (PARTITION BY k ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_k,
        |    (CASE WHEN len(string_split_regex(text, '\s+')) BETWEEN 10 AND 1000 THEN 0.5 ELSE 0.0 END +
        |     CASE WHEN CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |       t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
        |       / len(string_split_regex(lower(text), '\s+')) > 0.01 THEN 0.3 ELSE 0.0 END +
        |     CASE WHEN CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |       / length(text) < 0.2 THEN 0.2 ELSE 0.0 END) AS qual
        |  FROM base b LEFT JOIN contam ct USING (doc_id)),
        |f2 AS (SELECT *, (NOT is_eval) AND cum_k = 1 AS s1 FROM f1),
        |f3 AS (SELECT *, s1 AND contaminated = 0 AS s2 FROM f2),
        |f4 AS (SELECT *, s2 AND qual >= 0.7 AS s3 FROM f3),
        |f5 AS (
        |  SELECT *, SUM(CASE WHEN s3 THEN 1 ELSE 0 END) OVER
        |      (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |       ROWS UNBOUNDED PRECEDING) AS pick_rank,
        |    CASE source WHEN 'src0' THEN 12 WHEN 'src1' THEN 5 WHEN 'src2' THEN 18
        |      WHEN 'src3' THEN 3 WHEN 'src4' THEN 9 WHEN 'src5' THEN 25
        |      WHEN 'src6' THEN 7 WHEN 'src7' THEN 14 WHEN 'src8' THEN 4
        |      WHEN 'src9' THEN 21 WHEN 'src10' THEN 6 WHEN 'src11' THEN 11
        |      WHEN 'src12' THEN 16 WHEN 'src13' THEN 2 WHEN 'src14' THEN 8
        |      WHEN 'src15' THEN 19 WHEN 'src16' THEN 5 WHEN 'src17' THEN 13
        |      WHEN 'src18' THEN 10 WHEN 'src19' THEN 22 ELSE 0 END AS quota
        |  FROM f4),
        |f6 AS (SELECT *, s3 AND pick_rank <= quota AS s4 FROM f5),
        |f7 AS (
        |  SELECT *, SUM(CASE WHEN s4 THEN n_tok ELSE 0 END) OVER
        |      (PARTITION BY shard ORDER BY doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off
        |  FROM f6),
        |f8 AS (SELECT *, CAST(FLOOR(COALESCE(off, 0) / 512) AS BIGINT) AS bin FROM f7),
        |summary AS (
        |  SELECT COUNT(*)::BIGINT AS n_raw,
        |    COUNT(CASE WHEN NOT is_eval THEN 1 END)::BIGINT AS n_corpus,
        |    COUNT(CASE WHEN s1 THEN 1 END)::BIGINT AS n_dedup,
        |    COUNT(CASE WHEN s2 THEN 1 END)::BIGINT AS n_decon,
        |    COUNT(CASE WHEN s3 THEN 1 END)::BIGINT AS n_quality,
        |    COUNT(CASE WHEN s4 THEN 1 END)::BIGINT AS n_sampled,
        |    COUNT(DISTINCT CASE WHEN s4 THEN shard * 100000 + bin END)::BIGINT AS n_bins,
        |    COUNT(DISTINCT CASE WHEN s4 THEN shard END)::BIGINT AS n_shards,
        |    CAST(SUM(CASE WHEN s4 THEN n_tok ELSE 0 END) AS BIGINT) AS n_tokens
        |  FROM f8)
        |SELECT * FROM (
        |  SELECT CAST(0 AS INTEGER) AS stage_idx, 'raw' AS stage, n_raw AS n FROM summary
        |  UNION ALL SELECT 1, 'eval_holdout', n_corpus FROM summary
        |  UNION ALL SELECT 2, 'exact_dedup', n_dedup FROM summary
        |  UNION ALL SELECT 3, 'decontaminated', n_decon FROM summary
        |  UNION ALL SELECT 4, 'quality', n_quality FROM summary
        |  UNION ALL SELECT 5, 'sampled', n_sampled FROM summary
        |  UNION ALL SELECT 6, 'packed_bins', n_bins FROM summary
        |  UNION ALL SELECT 7, 'shards', n_shards FROM summary
        |  UNION ALL SELECT 8, 'tokens_packed', n_tokens FROM summary
        |  UNION ALL SELECT 9, 'exported_rows', n_sampled FROM summary)
        |ORDER BY stage_idx""".stripMargin,
    // same md5 shard key, same scaled integer TVD per shard
    "q238_shard_balance" ->
      """WITH e AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) % 8 AS shard, label
        |  FROM embeddings),
        |cell AS (SELECT shard, label, COUNT(*)::BIGINT AS c
        |  FROM e GROUP BY 1, 2),
        |sn AS (SELECT shard, COUNT(*)::BIGINT AS sn FROM e GROUP BY 1),
        |ln AS (SELECT label, COUNT(*)::BIGINT AS ln FROM e GROUP BY 1),
        |tn AS (SELECT COUNT(*)::BIGINT AS tn FROM e),
        |grid AS (SELECT sn.shard, sn.sn, ln.label, ln.ln FROM sn, ln),
        |fc AS (
        |  SELECT g.shard, g.sn, g.ln, COALESCE(cell.c, 0) AS c
        |  FROM grid g LEFT JOIN cell
        |    ON cell.shard = g.shard AND cell.label = g.label)
        |SELECT fc.shard, fc.sn AS n_rows,
        |  CAST(SUM(ABS(fc.c * tn.tn - fc.ln * fc.sn)) AS BIGINT)
        |    AS tvd_scaled,
        |  SUM(ABS(fc.c * tn.tn - fc.ln * fc.sn)) * 10 >
        |    fc.sn * tn.tn * 2 AS imbalanced
        |FROM fc, tn
        |GROUP BY 1, 2, tn.tn ORDER BY 1""".stripMargin,
    // same md5 content keys, same provenance rollup
    "q237_cross_source_leakage" ->
      """WITH k AS (
        |  SELECT md5(lower(text)) AS k,
        |    COUNT(DISTINCT source)::BIGINT AS n_sources,
        |    COUNT(*)::BIGINT AS n_docs
        |  FROM documents GROUP BY 1)
        |SELECT COUNT(*)::BIGINT AS n_keys,
        |  CAST(COUNT(*) FILTER (WHERE n_sources > 1) AS BIGINT)
        |    AS n_leaked_keys,
        |  CAST(COALESCE(SUM(n_docs) FILTER (WHERE n_sources > 1), 0)
        |    AS BIGINT) AS n_docs_involved,
        |  CAST(COALESCE(MAX(n_sources), 0) AS BIGINT) AS max_sources
        |FROM k""".stripMargin,
    // same counts, same IEEE ratio, same (lift DESC, tok) rank
    "q225_distinctive_terms" ->
      """WITH toks AS (
        |  SELECT source, tok FROM (
        |    SELECT source,
        |      unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
        |    FROM documents) WHERE tok <> ''),
        |bysrc AS (
        |  SELECT source, tok, COUNT(*)::BIGINT AS tf
        |  FROM toks GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |corpus AS (
        |  SELECT tok, CAST(SUM(tf) AS BIGINT) AS ctf
        |  FROM bysrc GROUP BY 1),
        |s AS (
        |  SELECT b.source, b.tok, b.tf, c.ctf,
        |    CAST(b.tf AS DOUBLE) / CAST(c.ctf AS DOUBLE) AS lift
        |  FROM bysrc b JOIN corpus c USING (tok))
        |SELECT source, rank, tok, tf, ctf, round(lift, 6) AS lift FROM (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY source ORDER BY lift DESC, tok) AS rank
        |  FROM s) WHERE rank <= 3 ORDER BY source, rank""".stripMargin,
    // same deterministic top-20 vocab, same coverage gate
    "q219_oov_rate" ->
      """WITH toks AS (
        |  SELECT source, tok FROM (
        |    SELECT source,
        |      unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS tok
        |    FROM documents) WHERE tok <> ''),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1
        |    ORDER BY c DESC, tok LIMIT 20))
        |SELECT source, COUNT(*)::BIGINT AS n_tokens,
        |  CAST(COUNT(*) FILTER (WHERE v.tok IS NULL) AS BIGINT) AS n_oov,
        |  COUNT(*) FILTER (WHERE v.tok IS NULL) * 100 < COUNT(*) * 33
        |    AS coverage_ok
        |FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // same exact-integer dot accumulation + IEEE cosine as the q74
    // oracle, plus the label-mismatch predicate
    "q209_hard_negatives" ->
      """WITH norms AS (
        |  SELECT vec_id,
        |    SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)
        |      * CAST(FLOOR(CAST(v AS DOUBLE) * 1048576) AS BIGINT)) AS n2
        |  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings)
        |  GROUP BY vec_id),
        |el AS (
        |  SELECT q.vec_id AS qid, q.label AS qlabel,
        |    c.vec_id AS cid, c.label AS clabel,
        |    unnest(q.embedding) AS qv, unnest(c.embedding) AS cv
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id < 20 AND c.vec_id != q.vec_id
        |      AND c.label != q.label),
        |dots AS (
        |  SELECT qid, qlabel, cid, clabel,
        |    SUM(CAST(FLOOR(CAST(qv AS DOUBLE) * 1048576) AS BIGINT)
        |      * CAST(FLOOR(CAST(cv AS DOUBLE) * 1048576) AS BIGINT)) AS dot
        |  FROM el GROUP BY 1, 2, 3, 4),
        |scored AS (
        |  SELECT d.qid, d.qlabel, d.cid, d.clabel,
        |    CAST(d.dot AS DOUBLE) /
        |      (SQRT(CAST(nq.n2 AS DOUBLE)) * SQRT(CAST(nc.n2 AS DOUBLE)))
        |      AS cosine
        |  FROM dots d
        |  JOIN norms nq ON nq.vec_id = d.qid
        |  JOIN norms nc ON nc.vec_id = d.cid)
        |SELECT qid, qlabel, rank, cid, clabel AS neg_label,
        |  round(cosine, 6) AS cosine
        |FROM (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // the aHash replayed from the pixel closed form — no codec needed:
    // same grid mapping (i = x·4 div w), same cross-multiplied bits
    "q200_image_phash_dedup" ->
      """WITH ids AS (
        |  SELECT doc_id, doc_id AS base FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000, doc_id FROM documents
        |  WHERE doc_id % 10 = 0),
        |dims AS (
        |  SELECT doc_id, base, CAST(4 + base % 5 AS BIGINT) AS w,
        |    CAST(3 + base % 4 AS BIGINT) AS h
        |  FROM ids),
        |xs AS (SELECT doc_id, base, w, h, unnest(range(0, w)) AS x FROM dims),
        |ys AS (SELECT doc_id, base, w, h, x, unnest(range(0, h)) AS y FROM xs),
        |px AS (
        |  SELECT doc_id, w, h, (x * 4) // w AS i, (y * 3) // h AS j,
        |    ((base + 3*x + 7*y) % 256) + ((2*base + 5*x + y) % 256) +
        |      ((base + x*y) % 256) AS gray
        |  FROM ys),
        |cells AS (
        |  SELECT doc_id, w, h, i, j, CAST(SUM(gray) AS BIGINT) AS s,
        |    COUNT(*)::BIGINT AS n
        |  FROM px GROUP BY 1, 2, 3, 4, 5),
        |tot AS (
        |  SELECT doc_id, CAST(SUM(s) AS BIGINT) AS st,
        |    CAST(SUM(n) AS BIGINT) AS np
        |  FROM cells GROUP BY 1)
        |SELECT c.doc_id, CAST(MIN(c.w) AS INTEGER) AS width,
        |  CAST(MIN(c.h) AS INTEGER) AS height,
        |  CAST(SUM(CASE WHEN c.s * t.np > t.st * c.n
        |    THEN 1 << (j * 4 + i) ELSE 0 END) AS BIGINT) AS ahash
        |FROM cells c JOIN tot t USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // generated from the same seed/weight constants as the Spark plan —
    // the two sides cannot drift (the KCore/Hilbert dual-gen pattern)
    "q193_linear_classifier" ->
      graft.llm.LinearClassifier.oracleSql("doc_id", "text",
        classes = 4, buckets = 256),
    // largest-remainder apportionment: floor quotas + ranked remainders;
    // `//`/`%` on non-negative BIGINTs match Spark's div/% exactly
    "q196_token_budget" ->
      """WITH w AS (
        |  SELECT source,
        |    CAST(SUM(len(list_filter(
        |      string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> ''))) AS BIGINT) AS w
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS w_tot FROM w),
        |base AS (
        |  SELECT source, w,
        |    CAST((1000000 * w) // w_tot AS BIGINT) AS base,
        |    CAST((1000000 * w) % w_tot AS BIGINT) AS rem
        |  FROM w, tot),
        |rk AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
        |    1000000 - SUM(base) OVER () AS leftover
        |  FROM base)
        |SELECT source, w, base,
        |  CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc
        |FROM rk ORDER BY source""".stripMargin,
    // DuckDB's own jaro_winkler_similarity is the reference the native
    // expression was pinned against (floored half-transpositions,
    // >=0.7 boost) — ROUND(*1e6) is the same micro-unit contract
    "q254_jw_linkage" ->
      """SELECT * FROM (
        |  SELECT a.p_partkey AS k1, b.p_partkey AS k2,
        |    a.p_name AS n1, b.p_name AS n2,
        |    CAST(ROUND(jaro_winkler_similarity(a.p_name, b.p_name)
        |      * 1000000) AS BIGINT) AS jw_micro
        |  FROM part a JOIN part b
        |    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |   AND a.p_partkey < b.p_partkey)
        |WHERE jw_micro >= 850000 ORDER BY k1, k2""".stripMargin,
    // same deterministic decomposed-accent construction (chr codes
    // 769 = U+0301 acute, 778 = U+030A ring, 770 = U+0302 circumflex)
    "q255_unicode_normalize" ->
      """WITH d AS (
        |  SELECT p_partkey AS k,
        |    p_name || 'e' || CASE p_partkey % 3
        |      WHEN 0 THEN chr(769) WHEN 1 THEN chr(778)
        |      ELSE chr(770) || chr(769) END AS raw
        |  FROM part)
        |SELECT k, nfc_normalize(raw) AS norm,
        |  length(raw) AS len_raw,
        |  length(nfc_normalize(raw)) AS len_norm,
        |  length(nfc_normalize(raw)) < length(raw) AS composed
        |FROM d ORDER BY k""".stripMargin,
    // same floor(v*2^20) integer dot products, same (desc dot, cid)
    // tiebreak windows
    "q256_matryoshka_recall" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1048576)
        |      AS BIGINT) AS v,
        |    unnest(range(1, len(embedding) + 1)) AS pos
        |  FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 50),
        |p AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    CAST(SUM(q.v * c.v) AS BIGINT) AS dot_full,
        |    CAST(SUM(CASE WHEN q.pos <= 16 THEN q.v * c.v ELSE 0 END)
        |      AS BIGINT) AS dot_16
        |  FROM q JOIN e c ON q.pos = c.pos AND q.vec_id <> c.vec_id
        |  GROUP BY 1, 2),
        |tf AS (SELECT qid, cid, row_number() OVER
        |  (PARTITION BY qid ORDER BY dot_full DESC, cid) AS r FROM p),
        |tt AS (SELECT qid, cid, row_number() OVER
        |  (PARTITION BY qid ORDER BY dot_16 DESC, cid) AS r FROM p),
        |h AS (
        |  SELECT tf.qid, COUNT(*)::BIGINT AS hits
        |  FROM tf JOIN tt ON tf.qid = tt.qid AND tf.cid = tt.cid
        |  WHERE tf.r <= 10 AND tt.r <= 10 GROUP BY 1)
        |SELECT q2.qid, COALESCE(h.hits, 0)::BIGINT AS hits,
        |  COALESCE(h.hits, 0) / 10.0 AS recall
        |FROM (SELECT DISTINCT vec_id AS qid FROM embeddings
        |      WHERE vec_id < 50) q2
        |LEFT JOIN h ON q2.qid = h.qid ORDER BY q2.qid""".stripMargin,
    // same exact ranking; rr in lcm(1..10)=2520 units stays integral
    "q257_retrieval_metrics" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1048576)
        |      AS BIGINT) AS v,
        |    unnest(range(1, len(embedding) + 1)) AS pos
        |  FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 50),
        |p AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    CAST(SUM(q.v * c.v) AS BIGINT) AS dot_full
        |  FROM q JOIN e c ON q.pos = c.pos AND q.vec_id <> c.vec_id
        |  GROUP BY 1, 2),
        |lab AS (SELECT vec_id, label FROM embeddings),
        |rk AS (
        |  SELECT p.qid, p.cid,
        |    row_number() OVER (PARTITION BY p.qid
        |      ORDER BY p.dot_full DESC, p.cid) AS r,
        |    CASE WHEN ql.label = cl.label THEN 1 ELSE 0 END AS rel
        |  FROM p JOIN lab ql ON p.qid = ql.vec_id
        |         JOIN lab cl ON p.cid = cl.vec_id)
        |SELECT qid,
        |  CAST(COALESCE(MIN(CASE WHEN rel = 1 THEN r END), 0) AS BIGINT)
        |    AS first_rel,
        |  CAST(COALESCE(2520 // MIN(CASE WHEN rel = 1 THEN r END), 0)
        |    AS BIGINT) AS rr_2520,
        |  CAST(SUM(rel) AS BIGINT) AS n_rel10,
        |  SUM(rel) / 10.0 AS prec_at10
        |FROM rk WHERE r <= 10 GROUP BY qid ORDER BY qid""".stripMargin,
    // same filter-then-position tokenization (list_filter BEFORE the
    // positional unnest — filtering after would shift positions), same
    // exact-rational KN algebra
    "q259_kn_bigram" ->
      """WITH tl AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> '') AS l
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(l) AS w,
        |    unnest(range(1, len(l) + 1)) AS pos
        |  FROM tl),
        |bg AS (
        |  SELECT w1, w2, COUNT(*)::BIGINT AS c FROM (
        |    SELECT doc_id, w AS w1,
        |      lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |    FROM toks)
        |  WHERE w2 IS NOT NULL GROUP BY 1, 2),
        |st AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1,
        |  COUNT(*)::BIGINT AS n_follow FROM bg GROUP BY 1),
        |pr AS (SELECT w2, COUNT(*)::BIGINT AS n_prec FROM bg GROUP BY 1),
        |ty AS (SELECT COUNT(*)::BIGINT AS t FROM bg)
        |SELECT bg.w1, bg.w2, bg.c, st.cw1, st.n_follow, pr.n_prec,
        |  CAST((4 * bg.c - 3) * ty.t + 3 * st.n_follow * pr.n_prec
        |    AS BIGINT) AS p_num,
        |  CAST(4 * st.cw1 * ty.t AS BIGINT) AS p_den,
        |  CAST((4 * bg.c - 3) * ty.t + 3 * st.n_follow * pr.n_prec
        |    AS DOUBLE) / (4 * st.cw1 * ty.t) AS p_kn
        |FROM bg JOIN st USING (w1) JOIN pr USING (w2), ty
        |ORDER BY bg.c DESC, bg.w1, bg.w2 LIMIT 20""".stripMargin,
    // FROM-SCRATCH model over the full corpus: equality with the
    // incrementally-folded Spark result is the invariant under test
    "q263_kn_incremental" ->
      """WITH tl AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> '') AS l
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(l) AS w,
        |    unnest(range(1, len(l) + 1)) AS pos
        |  FROM tl),
        |bg AS (
        |  SELECT w1, w2, COUNT(*)::BIGINT AS c FROM (
        |    SELECT doc_id, w AS w1,
        |      lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |    FROM toks)
        |  WHERE w2 IS NOT NULL GROUP BY 1, 2),
        |st AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1,
        |  COUNT(*)::BIGINT AS n_follow FROM bg GROUP BY 1),
        |pr AS (SELECT w2, COUNT(*)::BIGINT AS n_prec FROM bg GROUP BY 1),
        |ty AS (SELECT COUNT(*)::BIGINT AS t FROM bg)
        |SELECT bg.w1, bg.w2, bg.c, st.cw1, st.n_follow, pr.n_prec,
        |  CAST((4 * bg.c - 3) * ty.t + 3 * st.n_follow * pr.n_prec
        |    AS BIGINT) AS p_num,
        |  CAST(4 * st.cw1 * ty.t AS BIGINT) AS p_den,
        |  CAST((4 * bg.c - 3) * ty.t + 3 * st.n_follow * pr.n_prec
        |    AS DOUBLE) / (4 * st.cw1 * ty.t) AS p_kn
        |FROM bg JOIN st USING (w1) JOIN pr USING (w2), ty
        |WHERE bg.c >= 3 ORDER BY bg.w1, bg.w2""".stripMargin,
    // same w=3 shingles (short-doc whole-text fallback), same 60-bit
    // md5 gram ids, same rebuilt grid
    "q264_source_overlap" ->
      """WITH tl AS (
        |  SELECT source, string_split(text, ' ') AS toks FROM documents),
        |gs AS (
        |  SELECT source, CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [array_to_string(toks, ' ')] END AS grams
        |  FROM tl),
        |gu AS (SELECT source, unnest(grams) AS gm FROM gs),
        |g AS (SELECT DISTINCT source,
        |    CAST(('0x' || substr(md5(gm), 1, 15)) AS BIGINT) AS g
        |  FROM gu),
        |sz AS (SELECT source, COUNT(*)::BIGINT AS n FROM g GROUP BY 1),
        |it AS (
        |  SELECT a.source AS s1, b.source AS s2, COUNT(*)::BIGINT AS inter
        |  FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT a.source AS s1, a.n AS n1, b.source AS s2, b.n AS n2
        |  FROM sz a JOIN sz b ON a.source < b.source)
        |SELECT grid.s1, grid.s2, n1, n2,
        |  COALESCE(it.inter, 0)::BIGINT AS inter,
        |  CAST(COALESCE(it.inter, 0) AS DOUBLE)
        |    / (n1 + n2 - COALESCE(it.inter, 0)) AS jaccard,
        |  COALESCE(it.inter, 0) * 20 > n1 + n2 - COALESCE(it.inter, 0)
        |    AS overlap_flag
        |FROM grid LEFT JOIN it ON grid.s1 = it.s1 AND grid.s2 = it.s2
        |ORDER BY 1, 2""".stripMargin,
    // same md5 content keys (q70), same lower-median rank pattern (q260)
    "q261_dataset_card" ->
      """WITH d AS (
        |  SELECT source, doc_id, lang, n_chars,
        |    len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> ''))::BIGINT AS n_toks,
        |    md5(text) AS key
        |  FROM documents),
        |base AS (
        |  SELECT source, COUNT(*)::BIGINT AS n_docs,
        |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
        |    COUNT(DISTINCT lang)::BIGINT AS n_langs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |  FROM d GROUP BY 1),
        |dup AS (
        |  SELECT source,
        |    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
        |      AS dup_docs
        |  FROM (SELECT source, key, COUNT(*) AS c FROM d GROUP BY 1, 2)
        |  GROUP BY 1),
        |med AS (
        |  SELECT source, n_chars AS p50_chars FROM (
        |    SELECT d.source, d.n_chars, b.n_docs, row_number() OVER
        |      (PARTITION BY d.source ORDER BY d.n_chars, d.doc_id) AS rn
        |    FROM d JOIN base b USING (source))
        |  WHERE rn = (n_docs + 1) // 2)
        |SELECT base.source, n_docs, n_tokens, n_langs, dup_docs, p50_chars,
        |  CAST(sum_chars AS DOUBLE) / n_docs AS mean_chars,
        |  CAST(dup_docs AS DOUBLE) / n_docs AS dup_rate
        |FROM base JOIN dup USING (source) JOIN med USING (source)
        |ORDER BY base.source""".stripMargin,
    "q293_dedup_threshold_curve" -> dedupCurveSql,
    "q321_nearest_dup_profile" -> nearestDupProfileSql,
    // both global orders replayed as row_number windows; integer DIV
    // batching and exact integer padding arithmetic on both engines
    "q294_batch_padding" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |s AS (SELECT *, (row_number() OVER (ORDER BY n_tok DESC, doc_id) - 1)
        |    // 16 AS batch FROM d),
        |f AS (SELECT *, (row_number() OVER (ORDER BY doc_id) - 1)
        |    // 16 AS batch FROM d),
        |sb AS (
        |  SELECT batch, COUNT(*)::BIGINT AS n_docs, MAX(n_tok) AS max_tok,
        |    CAST(SUM(n_tok) AS BIGINT) AS sum_tok
        |  FROM s GROUP BY 1),
        |fb AS (
        |  SELECT batch,
        |    CAST(MAX(n_tok) * COUNT(*) - SUM(n_tok) AS BIGINT) AS padded_fifo
        |  FROM f GROUP BY 1)
        |SELECT sb.batch, sb.n_docs, sb.max_tok, sb.sum_tok,
        |  sb.max_tok * sb.n_docs - sb.sum_tok AS padded_sorted,
        |  fb.padded_fifo
        |FROM sb JOIN fb USING (batch) ORDER BY 1""".stripMargin,
    // hashed-bucket counts, the ppm-scaled linearized weight, and the
    // per-doc integer score replayed; the target set is the q281 band
    // triple, the flag the q282 above-corpus-mean convention
    "q295_dsir_weights" ->
      """WITH base AS (
        |  SELECT doc_id, source,
        |    (len(string_split_regex(text, '\s+')) BETWEEN 10 AND 1000
        |     AND CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |       t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
        |       / len(string_split_regex(lower(text), '\s+')) > 0.01
        |     AND CAST(length(text) - length(regexp_replace(text,
        |       '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |       / length(text) < 0.2) AS is_target
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text),
        |    '[^a-z0-9]+')) AS tok
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 64 AS b
        |  FROM toks WHERE tok <> ''),
        |tf AS (SELECT doc_id, b, COUNT(*)::BIGINT AS tf FROM tk GROUP BY 1, 2),
        |bc AS (
        |  SELECT tf.b, CAST(SUM(tf.tf) AS BIGINT) AS cr,
        |    CAST(SUM(CASE WHEN base.is_target THEN tf.tf ELSE 0 END)
        |      AS BIGINT) AS ct
        |  FROM tf JOIN base USING (doc_id) GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS rt,
        |  CAST(SUM(ct) AS BIGINT) AS tt FROM bc),
        |wt AS (
        |  SELECT b, CAST(((ct * 1000000) // t.tt + 1) * 1024
        |    // ((cr * 1000000) // t.rt + 1) - 1024 AS BIGINT) AS w
        |  FROM bc, tot t),
        |ds AS (
        |  SELECT tf.doc_id, CAST(SUM(tf.tf * wt.w) AS BIGINT) AS score
        |  FROM tf JOIN wt USING (b) GROUP BY 1),
        |per AS (
        |  SELECT source, COUNT(*)::BIGINT AS n_docs,
        |    SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_target_like,
        |    CAST(SUM(score) AS BIGINT) AS score_sum,
        |    SUM(CASE WHEN is_target THEN 1 ELSE 0 END)::BIGINT AS n_target
        |  FROM ds JOIN base USING (doc_id) GROUP BY 1),
        |g AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS gd,
        |  CAST(SUM(score_sum) AS BIGINT) AS gs FROM per)
        |SELECT source, n_docs, n_target_like, score_sum, n_target,
        |  CAST(score_sum * g.gd > g.gs * n_docs AS INTEGER)
        |    AS above_corpus_mean
        |FROM per, g ORDER BY 1""".stripMargin,
    // the q287/q290 xor-manifest algebra with a 1% delta; totals from
    // the 16-row shard frame
    "q296_reexport_plan" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST((ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
        |        + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 16
        |      AS INTEGER) AS shard,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |per AS (
        |  SELECT shard,
        |    SUM(CASE WHEN doc_id % 97 != 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n_v1,
        |    COUNT(*)::BIGINT AS n_v2,
        |    CAST(bit_xor(CASE WHEN doc_id % 97 != 0 THEN h ELSE 0 END)
        |      AS BIGINT) AS fp_v1,
        |    CAST(bit_xor(h) AS BIGINT) AS fp_v2,
        |    CAST(SUM(n_tok) AS BIGINT) AS tok_v2
        |  FROM d GROUP BY 1),
        |f AS (SELECT *, CAST(fp_v1 != fp_v2 AS INTEGER) AS changed FROM per),
        |tot AS (SELECT CAST(SUM(changed) AS BIGINT) AS changed_shards,
        |  CAST(SUM(CASE WHEN changed = 0 THEN n_v2 ELSE 0 END) AS BIGINT)
        |    AS saved_docs FROM f)
        |SELECT f.shard, f.n_v1, f.n_v2, f.changed,
        |  CASE WHEN f.changed = 1 THEN f.n_v2 ELSE 0 END AS docs_to_export,
        |  CASE WHEN f.changed = 1 THEN f.tok_v2 ELSE 0 END
        |    AS tokens_to_export,
        |  t.changed_shards, t.saved_docs
        |FROM f, tot t ORDER BY 1""".stripMargin,
    // the batch rule IS the oracle: md5 draw under per-source rates —
    // stream == batch because the keep decision is a pure row function
    "q297_stream_stratified" ->
      """WITH k AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 100 AS u
        |  FROM documents),
        |r(source, rate) AS (VALUES ('src0', 80), ('src1', 50),
        |  ('src2', 25), ('src3', 10)),
        |s AS (
        |  SELECT k.doc_id, k.source FROM k LEFT JOIN r USING (source)
        |  WHERE k.u < COALESCE(r.rate, 40))
        |SELECT source, COUNT(*)::BIGINT AS n_kept, MIN(doc_id) AS min_kept,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_kept
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // 8-token windows over the q166 token basis; global gram counts
    // joined back, per-source conditional rollup
    "q298_novelty_rollup" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source, array_to_string(ws[i+1:i+8], ' ') AS gram
        |  FROM (SELECT doc_id, source, ws,
        |    unnest(range(0, len(ws) - 7)) AS i FROM toks WHERE len(ws) >= 8)),
        |c AS (SELECT gram, COUNT(*)::BIGINT AS n FROM g GROUP BY 1),
        |per AS (
        |  SELECT g.source, COUNT(DISTINCT g.doc_id)::BIGINT AS n_docs,
        |    COUNT(*)::BIGINT AS n_windows,
        |    SUM(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END)::BIGINT
        |      AS dup_windows
        |  FROM g JOIN c USING (gram) GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_windows) AS BIGINT) AS tw,
        |  CAST(SUM(dup_windows) AS BIGINT) AS td FROM per)
        |SELECT source, n_docs, n_windows, dup_windows,
        |  CAST(dup_windows * t.tw > t.td * n_windows AS INTEGER)
        |    AS risk_flag
        |FROM per, t ORDER BY 1""".stripMargin,
    // q287's shard key + the q281 score bands; integer micro-unit mean,
    // band and curriculum position as 16-row windows
    "q299_curriculum_order" ->
      """WITH sc AS (
        |  SELECT (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
        |      + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 16
        |    AS shard,
        |    CAST(CASE WHEN len(string_split_regex(text, '\s+'))
        |        BETWEEN 10 AND 1000 THEN 5 ELSE 0 END +
        |      CASE WHEN CAST(len(list_filter(string_split_regex(lower(text),
        |        '\s+'), t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
        |        / len(string_split_regex(lower(text), '\s+')) > 0.01
        |        THEN 3 ELSE 0 END +
        |      CASE WHEN CAST(length(text) - length(regexp_replace(text,
        |        '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |        / length(text) < 0.2 THEN 2 ELSE 0 END AS BIGINT) AS s10
        |  FROM documents),
        |per AS (
        |  SELECT CAST(shard AS INTEGER) AS shard, COUNT(*)::BIGINT AS n_docs,
        |    CAST(SUM(s10) AS BIGINT) AS sum_s10,
        |    CAST(SUM(s10) * 1000000 // COUNT(*) AS BIGINT) AS mean_q_micro
        |  FROM sc GROUP BY 1),
        |b AS (
        |  SELECT *, CAST((row_number() OVER
        |      (ORDER BY mean_q_micro DESC, shard) - 1) * 3 // 16 AS INTEGER)
        |    AS band
        |  FROM per)
        |SELECT shard, n_docs, sum_s10, mean_q_micro, band,
        |  CAST(row_number() OVER (ORDER BY band,
        |    CAST(('0x' || substr(md5(CAST(shard AS VARCHAR)), 1, 8))
        |      AS BIGINT), shard) AS BIGINT) AS position
        |FROM b ORDER BY shard""".stripMargin,
    // 10% md5 candidate split; candidate 8-gram windows probe the
    // distinct train grams, hit docs eject
    "q300_eval_holdout" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 10 = 0 AS cand,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, cand, array_to_string(ws[i+1:i+8], ' ') AS gram
        |  FROM (SELECT doc_id, cand, ws,
        |    unnest(range(0, len(ws) - 7)) AS i FROM toks WHERE len(ws) >= 8)),
        |tg AS (SELECT DISTINCT gram FROM g WHERE NOT cand),
        |contam AS (
        |  SELECT DISTINCT g.doc_id FROM g JOIN tg USING (gram) WHERE g.cand)
        |SELECT source, COUNT(*)::BIGINT AS n_docs,
        |  SUM(CASE WHEN cand THEN 1 ELSE 0 END)::BIGINT AS n_candidates,
        |  SUM(CASE WHEN cand AND doc_id IN (SELECT doc_id FROM contam)
        |    THEN 1 ELSE 0 END)::BIGINT AS n_contaminated,
        |  SUM(CASE WHEN cand AND doc_id NOT IN (SELECT doc_id FROM contam)
        |    THEN 1 ELSE 0 END)::BIGINT AS n_final
        |FROM toks GROUP BY 1 ORDER BY 1""".stripMargin,
    "q301_coreset_fps" -> coresetFpsSql(8),
    // index = distinct 8-grams of the persisted corpus (%5 != 0);
    // delta probes replayed as one join, flag on the delta frame
    "q302_incr_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      t -> t <> '') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source, array_to_string(ws[i+1:i+8], ' ') AS gram
        |  FROM (SELECT doc_id, source, ws,
        |    unnest(range(0, len(ws) - 7)) AS i FROM toks WHERE len(ws) >= 8)),
        |idx AS (SELECT DISTINCT gram FROM g WHERE doc_id % 5 != 0),
        |probe AS (
        |  SELECT g.source, g.doc_id,
        |    CASE WHEN idx.gram IS NOT NULL THEN 1 ELSE 0 END AS seen
        |  FROM g LEFT JOIN idx USING (gram) WHERE g.doc_id % 5 = 0),
        |per AS (
        |  SELECT source, COUNT(DISTINCT doc_id)::BIGINT AS n_docs,
        |    COUNT(*)::BIGINT AS n_windows,
        |    CAST(SUM(seen) AS BIGINT) AS seen_windows
        |  FROM probe GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_windows) AS BIGINT) AS tw,
        |  CAST(SUM(seen_windows) AS BIGINT) AS ts FROM per)
        |SELECT source, n_docs, n_windows, seen_windows,
        |  CAST(seen_windows * t.tw > t.ts * n_windows AS INTEGER)
        |    AS high_overlap
        |FROM per, t ORDER BY 1""".stripMargin,
    // all-pairs exact ground truth (q71's oracle proved the LSH path's
    // 100% recall at 0.95, so counts agree); normalized lang grid
    "q303_cross_lang_dups" ->
      """WITH s AS (
        |  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')),
        |p AS (
        |  SELECT LEAST(a.lang, b.lang) AS lang_a,
        |    GREATEST(a.lang, b.lang) AS lang_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        |    >= 0.95),
        |per AS (SELECT lang_a, lang_b, COUNT(*)::BIGINT AS n_pairs
        |  FROM p GROUP BY 1, 2),
        |t AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS tp FROM per)
        |SELECT lang_a, lang_b, n_pairs,
        |  CAST(lang_a != lang_b AS INTEGER) AS cross_lang,
        |  CAST(n_pairs AS DOUBLE) / CAST(t.tp AS DOUBLE) AS share
        |FROM per, t ORDER BY 1, 2""".stripMargin,
    // q291's recursive closure reused; histogram over multi-doc
    // clusters, boilerplate flag on the tiny size frame
    "q304_cluster_sizes" ->
      """WITH RECURSIVE s AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        |    >= 0.95),
        |edges AS (
        |  SELECT doc_a AS s0, doc_b AS d0 FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        |  SELECT s0 AS a, d0 AS b FROM edges
        |  UNION
        |  SELECT r.a, e.d0 FROM reach r JOIN edges e ON r.b = e.s0
        |  WHERE e.d0 != r.a),
        |mins AS (SELECT a, MIN(b) AS mn FROM reach GROUP BY a),
        |cl AS (
        |  SELECT s.doc_id, LEAST(s.doc_id, COALESCE(m.mn, s.doc_id)) AS cid
        |  FROM s LEFT JOIN mins m ON m.a = s.doc_id),
        |szs AS (SELECT cid, COUNT(*)::BIGINT AS sz FROM cl GROUP BY 1
        |  HAVING COUNT(*) > 1),
        |h AS (SELECT sz, COUNT(*)::BIGINT AS n_clusters FROM szs GROUP BY 1),
        |t AS (SELECT MAX(sz) AS mx, CAST(SUM(sz) AS BIGINT) AS tot FROM szs)
        |SELECT h.sz, h.n_clusters, h.sz * h.n_clusters AS n_docs,
        |  CAST(t.mx * 4 > t.tot AS INTEGER) AS boilerplate_flag
        |FROM h, t ORDER BY h.sz""".stripMargin,
    // the q278 waterfilling replayed with every window PARTITION BY
    // arm; arms = full + drop_<domain>, same absolute budget
    "q305_ablation_grid" ->
      """WITH c AS (
        |  SELECT substr(source, 4, 1) AS domain,
        |    CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tok
        |  FROM documents GROUP BY 1),
        |bt AS (SELECT CAST((SUM(n_tok) * 3) // 2 AS BIGINT) AS b FROM c),
        |arms AS (SELECT 'full' AS arm
        |  UNION ALL SELECT 'drop_' || domain FROM c),
        |g AS (
        |  SELECT a.arm, c.domain, c.n_tok, bt.b FROM arms a, c, bt
        |  WHERE a.arm = 'full' OR c.domain != substr(a.arm, 6, 1)),
        |r AS (
        |  SELECT *, n_tok * 2 AS cap,
        |    CAST(row_number() OVER (PARTITION BY arm
        |      ORDER BY n_tok * 2, domain) AS BIGINT) AS k,
        |    CAST(COALESCE(SUM(n_tok * 2) OVER (PARTITION BY arm
        |      ORDER BY n_tok * 2, domain
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS prefix,
        |    COUNT(*) OVER (PARTITION BY arm) AS n_src
        |  FROM g),
        |f AS (SELECT *,
        |    CASE WHEN cap * (n_src - k + 1) <= b - prefix THEN 1 ELSE 0 END
        |      AS flag
        |  FROM r),
        |x AS (SELECT *,
        |    COALESCE(MAX(CASE WHEN flag = 1 THEN k END)
        |      OVER (PARTITION BY arm), 0) AS kstar,
        |    CAST(COALESCE(SUM(CASE WHEN flag = 1 THEN cap END)
        |      OVER (PARTITION BY arm), 0) AS BIGINT) AS csum
        |  FROM f),
        |a2 AS (
        |  SELECT arm, domain, n_tok, cap,
        |    CAST(CASE WHEN k <= kstar THEN cap
        |      WHEN n_src > kstar THEN (b - csum) // (n_src - kstar)
        |      ELSE 0 END AS BIGINT) AS alloc_tok,
        |    CAST(CASE WHEN k <= kstar THEN 1 ELSE 0 END AS INTEGER)
        |      AS is_capped,
        |    b
        |  FROM x)
        |SELECT arm, domain, n_tok, cap, alloc_tok, is_capped,
        |  CAST(b - SUM(alloc_tok) OVER (PARTITION BY arm) AS BIGINT)
        |    AS leftover
        |FROM a2 ORDER BY arm, domain""".stripMargin,
    // exact token-balanced split boundaries: first row whose running
    // total reaches ceil(i*total/32)
    "q306_range_splits" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |s AS (
        |  SELECT *, CAST(SUM(n_tok) OVER (ORDER BY n_tok, doc_id) AS BIGINT)
        |    AS cum, CAST(SUM(n_tok) OVER () AS BIGINT) AS total
        |  FROM d),
        |g AS (
        |  SELECT i.i, CAST((i.i * t.total + 31) // 32 AS BIGINT) AS tgt
        |  FROM (SELECT DISTINCT total FROM s) t,
        |    (SELECT unnest(range(1, 32)) AS i) i)
        |SELECT g.i AS split_id, g.tgt AS target_cum,
        |  s.doc_id AS boundary_doc, s.n_tok AS boundary_n_tok, s.cum
        |FROM g JOIN s ON s.cum >= g.tgt AND s.cum - s.n_tok < g.tgt
        |ORDER BY 1""".stripMargin,
    // q277's serpentine deal + q299's band/position + the exclusive
    // token prefix sum in curriculum order
    "q307_training_manifest" ->
      """WITH ranked AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok,
        |    (CASE WHEN len(string_split_regex(text, '\s+'))
        |        BETWEEN 10 AND 1000 THEN 5 ELSE 0 END +
        |     CASE WHEN CAST(len(list_filter(string_split_regex(lower(text),
        |       '\s+'), t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS DOUBLE)
        |       / len(string_split_regex(lower(text), '\s+')) > 0.01
        |       THEN 3 ELSE 0 END +
        |     CASE WHEN CAST(length(text) - length(regexp_replace(text,
        |       '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |       / length(text) < 0.2 THEN 2 ELSE 0 END) AS s10,
        |    row_number() OVER (
        |      ORDER BY CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
        |        DESC, doc_id) - 1 AS r
        |  FROM documents),
        |dealt AS (
        |  SELECT doc_id, n_tok, s10,
        |    CAST(CASE WHEN (r // 16) % 2 = 0 THEN r % 16
        |         ELSE 15 - (r % 16) END AS INTEGER) AS shard
        |  FROM ranked),
        |per AS (
        |  SELECT shard, COUNT(*)::BIGINT AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS tokens,
        |    CAST(SUM(s10) AS BIGINT) AS sum_s10,
        |    CAST(SUM(s10) * 1000000 // COUNT(*) AS BIGINT) AS mean_q_micro
        |  FROM dealt GROUP BY 1),
        |b AS (
        |  SELECT *, CAST((row_number() OVER
        |      (ORDER BY mean_q_micro DESC, shard) - 1) * 3 // 16 AS INTEGER)
        |    AS band
        |  FROM per),
        |o AS (
        |  SELECT *,
        |    CAST(row_number() OVER (ORDER BY band,
        |      CAST(('0x' || substr(md5(CAST(shard AS VARCHAR)), 1, 8))
        |        AS BIGINT), shard) AS BIGINT) AS position,
        |    CAST(COALESCE(SUM(tokens) OVER (ORDER BY band,
        |      CAST(('0x' || substr(md5(CAST(shard AS VARCHAR)), 1, 8))
        |        AS BIGINT), shard
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start_token_offset
        |  FROM b)
        |SELECT shard, n_docs, tokens, sum_s10, mean_q_micro, band,
        |  position, start_token_offset
        |FROM o ORDER BY shard""".stripMargin,
    // both maintenance paths replayed: the O(|delta|) xor fold and the
    // full v2 recompute; match must be 1 everywhere (xor algebra)
    "q308_manifest_cdc" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST((ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
        |        + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 16
        |      AS INTEGER) AS shard,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h,
        |    CAST(('0x' || substr(md5(text || ' v2'), 1, 15)) AS BIGINT) AS h2,
        |    doc_id % 11 = 3 AS ins,
        |    doc_id % 11 != 3 AND doc_id % 13 = 0 AS upd,
        |    doc_id % 11 != 3 AND doc_id % 13 != 0 AND doc_id % 17 = 0 AS del
        |  FROM documents),
        |per AS (
        |  SELECT shard,
        |    SUM(CASE WHEN NOT ins THEN 1 ELSE 0 END)::BIGINT AS n_v1,
        |    SUM(CASE WHEN NOT del THEN 1 ELSE 0 END)::BIGINT AS n_v2,
        |    CAST(bit_xor(CASE WHEN NOT ins THEN h ELSE 0 END) AS BIGINT)
        |      AS fp_v1,
        |    CAST(bit_xor(CASE WHEN del THEN h WHEN upd THEN xor(h, h2)
        |      WHEN ins THEN h2 ELSE 0 END) AS BIGINT) AS delta_fp,
        |    CAST(bit_xor(CASE WHEN del THEN 0 WHEN upd THEN h2
        |      WHEN ins THEN h2 ELSE h END) AS BIGINT) AS fp_full
        |  FROM d GROUP BY 1)
        |SELECT shard, n_v1, n_v2,
        |  CAST(xor(fp_v1, delta_fp) AS BIGINT) AS fp_inc, fp_full,
        |  CAST(xor(fp_v1, delta_fp) = fp_full AS INTEGER) AS match
        |FROM per ORDER BY 1""".stripMargin
  )
}
