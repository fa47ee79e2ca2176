package graft.pipeline

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // The classic BPE teaching corpus (Sennrich et al. shape): frequencies
  // hug×10, pug×5, pun×12, bun×4, hugs×5.
  private def corpus = Seq(
    (1L, Array.fill(10)("hug").mkString(" ")),
    (2L, Array.fill(5)("pug").mkString(" ")),
    (3L, Array.fill(12)("pun").mkString(" ")),
    (4L, Array.fill(4)("bun").mkString(" ")),
    (5L, Array.fill(5)("hugs").mkString(" "))).toDF("doc_id", "text")

  test("train: merges follow pair frequency with deterministic ties") {
    val merges = Bpe.train(corpus, "text", nMerges = 3)
    // round 1: (u,g)=10+5+5=20, (u,n)=16, (p,u)=17, (h,u)=15 → ug
    assert(merges.head == (("u", "g")))
    // round 2: pug became (p,ug) so (p,u) drops to 12 (pun only);
    // (u,n)=16 and (h,ug)=15 → un
    assert(merges(1) == (("u", "n")))
    // round 3: pun/bun became (p,un)/(b,un); (h,ug)=15 wins
    assert(merges(2) == (("h", "ug")))
  }

  test("tokenizeWord: merges apply in priority order, to fixpoint") {
    val merges = Seq(("u", "g"), ("p", "u"), ("h", "ug"), ("hug", "s"))
    assert(Bpe.tokenizeWord("hugs", merges) == Seq("hugs"))
    assert(Bpe.tokenizeWord("pug", merges) == Seq("p", "ug"),
      "u+g merges before p+u can see the u")
    assert(Bpe.tokenizeWord("pun", merges) == Seq("pu", "n"))
    assert(Bpe.tokenizeWord("zzz", merges) == Seq("z", "z", "z"),
      "unseen chars stay single")
  }

  test("tokenizeWord: one pass per rule is exhaustive for that rule") {
    // "aaaa" under (a,a): leftmost non-overlap → aa, aa
    assert(Bpe.tokenizeWord("aaaa", Seq(("a", "a"))) == Seq("aa", "aa"))
    assert(Bpe.tokenizeWord("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
  }

  test("tokenize: invariants — pieces reassemble, counts consistent") {
    val merges = Bpe.train(corpus, "text", nMerges = 5)
    val got = Bpe.tokenize(corpus, "text", "doc_id", merges)
      .as[(Long, Long, Long, String)].collect()
    assert(got.length == 5)
    got.foreach { case (_, nWords, nPieces, _) =>
      assert(nPieces >= nWords, "a word is at least one piece")
    }
    // doc 1 = "hug"×10; with ≥3 merges hug is one piece → 10 pieces
    val d1 = got.find(_._1 == 1L).get
    assert(d1._2 == 10L && d1._3 == 10L)
    // spot-check full reassembly through the public tokenizer
    Seq("hug", "pug", "pun", "bun", "hugs", "xyzzy").foreach { w =>
      assert(Bpe.tokenizeWord(w, merges).mkString == w)
    }
  }
}
