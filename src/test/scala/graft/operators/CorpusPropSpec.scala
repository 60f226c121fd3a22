package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** JVM-only fuzz for the corpus kernels the DataFrame operators delegate
  * to — no SparkSession, so hundreds of adversarial cases run in
  * milliseconds. */
object CorpusPropSpec extends Properties("CorpusKernels") {

  // -------------------------------------------- rolling window fingerprints

  private val doc: Gen[(String, Int)] = for {
    n <- Gen.choose(0, 60)
    // a TINY vocabulary forces heavy window repetition — the interesting
    // regime for both the rolling algebra and hash-vs-text agreement
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "cc", "", "aa"))
    w <- Gen.choose(2, 12)
  } yield (toks.mkString(" "), w)

  property("rolling fingerprints group windows EXACTLY like window text " +
      "(equal text <=> equal 128-bit fingerprint on generated corpora)") =
    Prop.forAll(Gen.listOfN(4, doc.map(_._1)), Gen.choose(2, 8)) { (texts, w) =>
      val rows = texts.zipWithIndex.flatMap { case (t, id) =>
        Corpus.windowFingerprints(id.toLong, t, w).map { case (i, p, h1, h2) =>
          val toks = t.split(" ", -1)
          val win = toks.slice(p.toInt, p.toInt + w).mkString(" ")
          (win, (h1, h2), i, p)
        }
      }
      // same text -> same fingerprint, different text -> different (no
      // collisions on these sizes, by construction of 128 bits)
      val byText = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val byHash = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
      byText.forall(_._2.size == 1) && byHash.forall(_._2.size == 1)
    }

  property("rolling update equals direct per-window recomputation " +
      "(the O(1) slide is algebraically exact over the Long ring)") =
    Prop.forAll(doc) { case (text, w) =>
      val rolled = Corpus.windowFingerprints(7L, text, w).toSeq
      // direct: fingerprint each window from scratch as its own w-token
      // document (position 0 of a fresh doc = no rolling applied)
      val toks = text.split(" ", -1)
      val direct = (0 to toks.length - w).map { p =>
        val win = toks.slice(p, p + w).mkString(" ")
        val one = Corpus.windowFingerprints(7L, win, w).toSeq
        (one.length == 1) && {
          val (_, _, h1, h2) = one.head
          val (_, rp, r1, r2) = rolled(p)
          rp == p.toLong && r1 == h1 && r2 == h2
        }
      }
      (toks.length >= w || rolled.isEmpty) && direct.forall(identity)
    }

  property("window count is max(0, n - w + 1) with 0-based positions") =
    Prop.forAll(doc) { case (text, w) =>
      val n = text.split(" ", -1).length
      val got = Corpus.windowFingerprints(1L, text, w).toSeq
      got.length == math.max(0, n - w + 1) &&
        got.map(_._2) == got.indices.map(_.toLong)
    }

  // ----------------------------------------------------- greedy BPE merge

  private val mergeCase: Gen[(Array[String], String, String)] = for {
    n <- Gen.choose(0, 40)
    // single-char vocabulary: the merged token (length 2) can never occur
    // in the input, so expanding it back must reconstruct the original
    toks <- Gen.listOfN(n, Gen.oneOf("x", "y", "z"))
    a <- Gen.oneOf("x", "y", "z")
    b <- Gen.oneOf("x", "y", "z")
  } yield (toks.toArray, a, b)

  property("greedy merge: count identity, exact reconstruction, no (a,b) " +
      "adjacency survives, leftmost-first") =
    Prop.forAll(mergeCase) { case (t, a, b) =>
      val (out, n) = Corpus.greedyMergePass(t, a, b)
      val merged = a + b
      val countOk = out.length.toLong == t.length - n
      // expanding each merged token back yields the original sequence
      val rebuilt = out.flatMap(tok =>
        if (tok == merged) Array(a, b) else Array(tok))
      val reconstructs = rebuilt.sameElements(t)
      // one pass leaves no un-merged (a,b) adjacency of SINGLE tokens
      val noneLeft = !out.sliding(2).exists(p =>
        p.length == 2 && p(0) == a && p(1) == b)
      // leftmost-first: positions before the first input adjacency copy
      // 1:1, so the first merged token lands exactly there
      val firstIn = t.sliding(2).indexWhere(p =>
        p.length == 2 && p(0) == a && p(1) == b)
      val firstOut = out.indexOf(merged)
      val leftmost =
        if (n == 0) firstIn == -1
        else firstOut == firstIn && out.take(firstOut).sameElements(t.take(firstIn))
      countOk && reconstructs && noneLeft && leftmost
    }

  property("a pass over a sequence with no (a,b) adjacency is the identity") =
    Prop.forAll(mergeCase) { case (t, a, b) =>
      val (out, n) = Corpus.greedyMergePass(t, a, b)
      val (out2, n2) = Corpus.greedyMergePass(out, a, b)
      // idempotence on the merged output: nothing left to merge
      n2 == 0 && out2.sameElements(out) && (n >= 0)
    }
}
