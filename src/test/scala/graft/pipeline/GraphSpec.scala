package graft.pipeline

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: empty edge list → empty frame, no division by zero") {
    val edges = Seq.empty[(String, String)].toDF("s", "t")
    val got = Graph.pageRank(edges, "s", "t", iters = 3)
    assert(got.columns.toSeq == Seq("id", "rank_micros"))
    assert(got.count() == 0L)
  }

  test("pageRank: uniform cycle is a fixed point of the integer update") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "t")
    val got = Graph.pageRank(edges, "s", "t", iters = 5)
      .as[(String, Long)].collect().toMap
    // r0 = 10^6 div 3 = 333333; every node receives
    // 50000 + (850000·333333) div 10^6 = 50000 + 283333 = 333333 again
    assert(got == Map("a" -> 333333L, "b" -> 333333L, "c" -> 333333L))
  }

  test("pageRank: star graph, hand-computed two iterations") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
      .toDF("s", "t")
    val got = Graph.pageRank(edges, "s", "t", iters = 2)
      .as[(String, Long)].collect().toMap
    // N=3, base=50000, r0=333333 each.
    // iter1: a→{b,c}: (850000·333333) div 2e6 = 141666 each;
    //        b→a, c→a: 283333 each
    //   r1(a)=50000+2·283333=616666, r1(b)=r1(c)=191666
    // iter2: a's contrib (850000·616666) div 2e6 = 262083;
    //        b/c's contrib (850000·191666) div 1e6 = 162916
    //   r2(a)=50000+2·162916=375832, r2(b)=r2(c)=312083
    assert(got == Map("a" -> 375832L, "b" -> 312083L, "c" -> 312083L))
  }

  test("pageRank: bit-identical under repartitioning") {
    val edges = (1L to 60L)
      .map(i => (i % 12, (i * 7 + 3) % 12)).filter(e => e._1 != e._2)
      .toDF("s", "t")
    val a = Graph.pageRank(edges, "s", "t", iters = 4)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(edges.repartition(13), "s", "t", iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "integer micros ranks must not depend on layout")
    assert(a.values.sum <= 1000000L,
      "floor division only ever loses mass, never creates it")
  }
}
