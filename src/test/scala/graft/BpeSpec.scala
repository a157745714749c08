package graft

import graft.llm.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("merges follow frequency with deterministic tie-break") {
    // "ab" x3, "abc" x2, "zz" x1:
    // pair counts: (a,b)=5, (b,c)=2, (z,z)=1 → merge 1 = (a,b) w=5
    // then seqs: " ab ", " ab c ", " z z ": (ab,c)=2, (z,z)=1 → merge 2 = (ab,c)
    val docs = Seq((1L, "ab ab abc"), (2L, "abc zz ab")).toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, m = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq((1, "a", "b", 5L), (2, "ab", "c", 2L), (3, "z", "z", 1L)))
  }

  test("merged symbols participate in later merges (hierarchy builds up)") {
    // 4x "abcd": merges chain (a,b) → (ab,c) → (abc,d)
    val docs = Seq((1L, "abcd abcd"), (2L, "abcd abcd")).toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, m = 3)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(("a", "b"), ("ab", "c"), ("abc", "d")))
  }

  test("exhausted pair space stops early instead of emitting junk") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text") // single-char words: no pairs
    assert(Bpe.learnMerges(docs, m = 5).count() == 0)
  }

  test("encodeCorpus: token counts shrink as merges apply") {
    val docs = Seq((1L, "s1", "abcd abcd xy"), (2L, "s2", "abcd xy xy"))
      .toDF("doc_id", "source", "text")
    def totals(m: Int) = Bpe.encodeCorpus(docs, m).orderBy("source")
      .select("source", "n_words", "n_tokens")
      .as[(String, Long, Long)].collect().toSeq
    // m=0: pure char counts — s1: 4+4+2=10, s2: 4+2+2=8
    assert(totals(0) === Seq(("s1", 3L, 10L), ("s2", 3L, 8L)))
    // merges learned on word frequency: abcd x3, xy x3 →
    // (a,b) then (ab,c) then (abc,d)=1 token, then (x,y)=1 token
    assert(totals(4) === Seq(("s1", 3L, 3L), ("s2", 3L, 3L)))
    // monotone non-increasing token totals in m
    val seq = (0 to 4).map(m => totals(m).map(_._3).sum)
    assert(seq === seq.sorted.reverse)
  }

  test("encodeCorpus honors word frequency across docs (vocab is distinct)") {
    // "zz" appears once per doc but in both docs: vocab row is one,
    // corpus join restores per-source multiplicity
    val docs = Seq((1L, "a", "zz zz zz"), (2L, "b", "zz"))
      .toDF("doc_id", "source", "text")
    val out = Bpe.encodeCorpus(docs, 1).orderBy("source")
      .select("source", "n_tokens").as[(String, Long)].collect().toSeq
    // merge (z,z) → every "zz" is 1 token
    assert(out === Seq(("a", 3L), ("b", 1L)))
  }

  test("weights are word-frequency sums, not document counts") {
    // one doc repeating "xy" 4 times: weight of (x,y) must be 4
    val docs = Seq((1L, "xy xy xy xy")).toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, m = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq(("x", "y", 4L)))
  }

  test("batched acceptance == one-collect-per-merge loop (property, 40 corpora)") {
    // topK=1 degenerates acceptBatch to "accept the argmax only" — the
    // exact sequential loop — so batched-vs-sequential equivalence is a
    // pure property of the acceptance rule. Small alphabet + short
    // words maximize the adversarial cases the rule must survive:
    // overlapping runs ("abab" → leftover pairs literal replace skips),
    // symbol collisions (a+b = "ab" colliding with later candidates),
    // and dense weight ties.
    val rnd = new scala.util.Random(20260815L)
    // "ab": maximal collision/run density; "abcd": wider pair table, so
    // the prefix rule actually accepts >1 merge and its bounds (not
    // just the stop-at-first-failure path) are what equivalence tests
    for (alpha <- Seq("ab", "abcd"); trial <- 1 to 40) {
      val words = (1 to (3 + rnd.nextInt(8))).map { _ =>
        (1 to (1 + rnd.nextInt(6)))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val text = (1 to 20).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ")
      val docs = Seq((trial.toLong, text)).toDF("doc_id", "text")
      val (batched, _) = Bpe.learnMergeListWithRounds(docs, m = 8)
      val (sequential, seqRounds) =
        Bpe.learnMergeListWithRounds(docs, m = 8, topK = 1)
      assert(batched == sequential,
        s"alpha $alpha trial $trial diverged on '$text':\n  batched   $batched\n  sequential $sequential")
      assert(seqRounds >= sequential.size)
    }
  }

  test("batched == sequential on collision-prone fragments, long words, m=16") {
    // r15 ADVICE regime widening: words built from multi-char FRAGMENTS
    // {a, b, ab, ba} — so a freshly minted merge symbol "ab" collides
    // with pre-existing substrings constantly — plus words up to ~14
    // chars (long runs → many leftover pairs literal replace skips) and
    // a deeper merge budget (m=16) so late rounds run on heavily merged
    // symbol sequences where the interference bounds have compounded.
    val rnd = new scala.util.Random(16160816L)
    val frags = Seq("a", "b", "ab", "ba")
    for (trial <- 1 to 40) {
      val words = (1 to (3 + rnd.nextInt(6))).map { _ =>
        (1 to (2 + rnd.nextInt(6)))
          .map(_ => frags(rnd.nextInt(frags.size))).mkString
      }
      val text = (1 to 25).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ")
      val docs = Seq((trial.toLong, text)).toDF("doc_id", "text")
      val (batched, _) = Bpe.learnMergeListWithRounds(docs, m = 16)
      val (sequential, _) =
        Bpe.learnMergeListWithRounds(docs, m = 16, topK = 1)
      assert(batched == sequential,
        s"trial $trial diverged on '$text':\n  batched   $batched\n  sequential $sequential")
    }
  }

  test("batched acceptance needs FEWER rounds than merges on a spread corpus") {
    // well-separated pair frequencies over disjoint alphabets: the
    // prefix rule accepts several merges per collect
    val docs = Seq((1L,
      ("ab " * 40) + ("cd " * 20) + ("ef " * 10) + ("gh " * 5) + "ij"))
      .toDF("doc_id", "text")
    val (merges, rounds) = Bpe.learnMergeListWithRounds(docs, m = 5)
    assert(merges.map(t => (t._2, t._3)) ==
      Seq(("a", "b"), ("c", "d"), ("e", "f"), ("g", "h"), ("i", "j")))
    assert(rounds < merges.size,
      s"no batching happened: $rounds rounds for ${merges.size} merges")
  }
}
