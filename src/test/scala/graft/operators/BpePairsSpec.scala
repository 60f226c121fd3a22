package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE pair counting ([[Corpus.bpePairCounts]]): multiplicity, ordering,
  * deterministic tie-break, the top-k cut, and degenerate docs. */
class BpePairsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("adjacent pairs count with multiplicity across documents") {
    val df = Seq(
      (1L, "a b a b c"), // pairs: "a b", "b a", "a b", "b c"
      (2L, "a b")).toDF("id", "text")
    val got = Corpus.bpePairCounts(df, "text", k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("top-k cuts deterministically: count desc, then pair text asc") {
    val df = Seq((1L, "z y z y x w x w")).toDF("id", "text")
    // pairs: "z y"x1? — tokens: z y z y x w x w → pairs: z y, y z, z y? no:
    // (z,y)(y,z)(z,y)(y,x)(x,w)(w,x)(x,w) → z y:2, x w:2, y z:1, y x:1, w x:1
    val got = Corpus.bpePairCounts(df, "text", k = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("x w", 2L), ("z y", 2L), ("w x", 1L)))
  }

  test("single-token and null docs contribute nothing") {
    val df = Seq((1L, "solo"), (2L, null.asInstanceOf[String]),
      (3L, "p q")).toDF("id", "text")
    val got = Corpus.bpePairCounts(df, "text", k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("p q", 1L)))
  }

  test("merge-apply is greedy leftmost-non-overlapping; a repeated-token " +
      "pair never chains through its own output") {
    val df = Seq(
      (1L, "a b a b c"), // two disjoint (a,b) hits
      (2L, "x x x"), // (x,x): first two fold, third survives
      (3L, "x x x x"), // two folds
      (4L, "no hits here")).toDF("id", "text")
    val got = Corpus.bpeMergeApply(df, "text", "id", "a", "b")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got(0) == ((1L, "ab ab c", 2L, 5L, 3L)))
    assert(got(3) == ((4L, "no hits here", 0L, 3L, 3L)))
    val xx = Corpus.bpeMergeApply(df, "text", "id", "x", "x")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(xx(1) == ((2L, "xx x", 1L, 3L, 2L)),
      "the merged token must not re-merge with the next x in the same pass")
    assert(xx(2) == ((3L, "xx xx", 2L, 4L, 2L)))
    // empty-token pairs refuse loudly (split noise, not a vocabulary unit)
    intercept[IllegalArgumentException](
      Corpus.bpeMergeApply(df, "text", "id", "", "x"))
    intercept[IllegalArgumentException](
      Corpus.bpeMergeApply(df, "text", "id", "a b", "x"))
  }

  test("count -> apply -> recount composes into a 3-round trainer loop: " +
      "each applied pair's count drops to zero and merged tokens join " +
      "later rounds' vocabulary") {
    var corpus = Seq(
      (1L, "t h e c a t t h e h a t"),
      (2L, "t h e m a t t h e c a t"),
      (3L, "a h a t")).toDF("id", "text")
    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    for (round <- 1 to 3) {
      val top = Corpus.bpePairCounts(corpus, "text", k = 1)
        .as[(String, Long)].collect().head
      val Array(a, b) = top._1.split(" ", -1)
      merges += s"$a+$b"
      corpus = Corpus.bpeMergeApply(corpus, "text", "id", a, b)
        .select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("merged_text").as("text"))
      // the applied pair is gone from the recount
      val recount = Corpus.bpePairCounts(corpus, "text", k = 100)
        .as[(String, Long)].collect().toMap
      assert(!recount.contains(top._1),
        s"round $round: applied pair '${top._1}' still counted")
    }
    // round 1: (a,t) x5 wins; round 2: (h,e) x4 beats (t,h) x4 on the
    // pair-asc tie-break; round 3: (t,he) x4 — a pair BUILT FROM round 2's
    // merged token, proof the vocabulary composes across rounds
    assert(merges.toSeq == Seq("a+t", "h+e", "t+he"),
      s"unexpected merge sequence: $merges")
    val finalTexts = corpus.as[(Long, String)].collect().sortBy(_._1)
    assert(finalTexts(0)._2 == "the c at the h at")
    assert(finalTexts(2)._2 == "a h at")
  }

  test("bpeTrain runs the loop as ONE operator: merge table matches the " +
      "hand-composed rounds, with pick-time counts and applied tallies") {
    val df = Seq(
      (1L, "t h e c a t t h e h a t"),
      (2L, "t h e m a t t h e c a t"),
      (3L, "a h a t")).toDF("id", "text")
    val got = Corpus.bpeTrain(df, "text", "id", rounds = 3)
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1).toSeq
    // same winners as the hand-composed loop above; counts are pick-time
    // adjacent counts, n_merges the greedy tally (equal here — no overlaps)
    assert(got == Seq(
      (1L, "a", "t", 5L, 5L),
      (2L, "h", "e", 4L, 4L),
      (3L, "t", "he", 4L, 4L)), s"unexpected merge table: $got")
  }

  test("bpeApplyMerges (tokenizer inference) encodes with min-rank-iterate " +
      "semantics and reproduces its own trainer's final corpus exactly") {
    val df = Seq(
      (1L, "t h e c a t t h e h a t"),
      (2L, "t h e m a t t h e c a t"),
      (3L, "a h a t")).toDF("id", "text")
    val merges = Corpus.bpeTrain(df, "text", "id", rounds = 3)
      .orderBy("round")
      .as[(Long, String, String, Long, Long)].collect()
      .map(r => (r._2, r._3)).toSeq
    val got = Corpus.bpeApplyMerges(df, "text", "id", merges)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // self-trained ranks are causal, so the one-scan encode must equal the
    // trainer's sequential rounds (the hand-verified corpus from above)
    assert(got == Seq(
      (1L, "the c at the h at", 6L),
      (2L, "the m at the c at", 6L),
      (3L, "a h at", 3L)), s"unexpected encode: $got")
    // TRAINER-FAITHFUL rank sweep, not min-rank-iterate: rank 0 = (x, yz)
    // is absent when its turn comes and must NOT re-fire after rank 1
    // creates a yz token — a real trainer would have learned (x, yz) only
    // AFTER (y, z), so a rank-ordered table never needs reactivation, and
    // on ALIASING corpora (literal "yz" token coexisting with "y" "z")
    // re-firing would diverge from the trained vocabulary's statistics
    val chained = Seq((1L, "x y z")).toDF("id", "text")
    val enc = Corpus.bpeApplyMerges(chained, "text", "id",
      Seq(("x", "yz"), ("y", "z")))
      .as[(Long, String, Long)].collect().head
    assert(enc == ((1L, "x yz", 2L)),
      s"rank sweep must not revisit earlier ranks: $enc")
    // aliasing corpus end-to-end: the trainer's own merges replay to the
    // trainer's own output even when a later merge RECREATES an earlier
    // pair's text ("ab" exists both as a literal token and as a+b)
    val alias = Seq(
      (1L, "ab c ab c ab c a b c"),
      (2L, "a b a b ab c")).toDF("id", "text")
    val m = Corpus.bpeTrain(alias, "text", "id", rounds = 2)
      .orderBy("round")
      .as[(Long, String, String, Long, Long)].collect()
      .map(r => (r._2, r._3)).toSeq
    val viaTrainer = {
      var cur = alias
      m.foreach { case (a, b) =>
        cur = Corpus.bpeMergeApply(cur, "text", "id", a, b)
          .select(org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.col("merged_text").as("text"))
      }
      cur.as[(Long, String)].collect().sortBy(_._1).toSeq
    }
    val viaApply = Corpus.bpeApplyMerges(alias, "text", "id", m)
      .as[(Long, String, Long)].collect().sortBy(_._1).map(r => (r._1, r._2)).toSeq
    assert(viaApply == viaTrainer,
      s"aliasing corpus diverged: apply=$viaApply trainer=$viaTrainer")
    // malformed pairs refuse loudly
    intercept[IllegalArgumentException](
      Corpus.bpeApplyMerges(df, "text", "id", Seq(("", "x"))))
  }

  test("bpeTrainBatched with batch=1 IS bpeTrain: identical merge tables " +
      "on any corpus (the batched trick degenerates to the sequential " +
      "trainer when each round accepts one pair)") {
    val df = Seq(
      (1L, "t h e c a t t h e h a t"),
      (2L, "t h e m a t t h e c a t"),
      (3L, "a h a t")).toDF("id", "text")
    val seq3 = Corpus.bpeTrain(df, "text", "id", rounds = 3)
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1).toSeq
    val bat1 = Corpus.bpeTrainBatched(df, "text", "id", rounds = 3, batch = 1)
      .as[(Long, Long, String, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(bat1.map(r => (r._1, r._3, r._4, r._5, r._6)) ==
      seq3.map(r => (r._1, r._2, r._3, r._4, r._5)),
      s"batch=1 diverged from the sequential trainer:\n $bat1\n $seq3")
    assert(bat1.forall(_._2 == 1L), "every round accepts exactly rank 1")
  }

  test("bpeTrainBatched: one round of batch=m equals m sequential rounds " +
      "on a disjoint-winners corpus (non-interacting pairs commute)") {
    // winners (a,b) x3, (c,d) x2, (e,f) x1 live in separate docs: merging
    // one creates no new pairs and changes no other count, so sequential
    // re-ranking sees exactly the original ranking
    val docs = (Seq.fill(3)("a b") ++ Seq.fill(2)("c d") ++ Seq("e f"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val seq = Corpus.bpeTrain(docs, "text", "id", rounds = 3)
      .as[(Long, String, String, Long, Long)].collect().sortBy(_._1).toSeq
    val bat = Corpus.bpeTrainBatched(docs, "text", "id", rounds = 1, batch = 3)
      .as[(Long, Long, String, String, Long, Long)].collect().sortBy(_._2).toSeq
    assert(bat.map(r => (r._3, r._4, r._5, r._6)) ==
      seq.map(r => (r._2, r._3, r._4, r._5)),
      s"batched round diverged from sequential rounds:\n $bat\n $seq")
    assert(bat.map(_._1).distinct == Seq(1L), "all merges land in round 1")
  }

  test("bpeTrainBatched compatibility filter: token-sharing and merged-" +
      "output-colliding candidates are deferred, not misapplied") {
    // (a,b) x3 and (b,c) x3 tie; pair-asc accepts (a,b), and (b,c) shares
    // b so the round's second slot goes to (x,y) x2 instead
    val df = Seq((1L, "a b c a b c a b c"), (2L, "x y"), (3L, "x y"))
      .toDF("id", "text")
    val got = Corpus.bpeTrainBatched(df, "text", "id", rounds = 1, batch = 2)
      .as[(Long, Long, String, String, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq(
      (1L, 1L, "a", "b", 3L, 3L),
      (1L, 2L, "x", "y", 2L, 2L)), s"filter misfired: $got")
    // merged-output collision: accepting (a,bc) claims the token "abc", so
    // (ab,c) — which would PRODUCE "abc" — is rejected even though its own
    // tokens are free; (c,ab) stays compatible and takes the slot
    val alias = Seq((1L, "a bc a bc"), (2L, "ab c ab c")).toDF("id", "text")
    val got2 = Corpus.bpeTrainBatched(alias, "text", "id",
        rounds = 1, batch = 2)
      .as[(Long, Long, String, String, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got2 == Seq(
      (1L, 1L, "a", "bc", 2L, 2L),
      (1L, 2L, "c", "ab", 1L, 1L)), s"output-collision filter misfired: $got2")
  }

  test("bpeTrainBatched stops early on a dry corpus") {
    val noise = Seq((1L, "  ")).toDF("id", "text")
    assert(Corpus.bpeTrainBatched(noise, "text", "id",
      rounds = 2, batch = 4).count() == 0L)
    // a corpus exhausted mid-run returns the rounds it could learn
    val tiny = Seq((1L, "p q")).toDF("id", "text")
    val got = Corpus.bpeTrainBatched(tiny, "text", "id", rounds = 5, batch = 2)
      .as[(Long, Long, String, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, "p", "q", 1L, 1L)))
  }

  test("bpeTrain stops early when the corpus runs dry of well-formed pairs") {
    // one two-token doc: round 1 merges it into a single token, round 2
    // finds no adjacent pair at all — the trainer must return 1 row, not
    // throw or loop
    val df = Seq((1L, "p q")).toDF("id", "text")
    val got = Corpus.bpeTrain(df, "text", "id", rounds = 5)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "p", "q", 1L, 1L)))
    // split-noise-only corpus: empty tokens never form a well-formed pair,
    // so the trainer learns nothing (and must not crash picking one)
    val noise = Seq((1L, "  ")).toDF("id", "text") // tokens: "", "", ""
    assert(Corpus.bpeTrain(noise, "text", "id", rounds = 2).count() == 0L)
  }
}
