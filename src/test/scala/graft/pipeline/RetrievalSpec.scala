package graft.pipeline

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: hand-computed scores, saturation, and ranking") {
    // N=3, avgdl=8/3; df(spark)=2 → idf=(3-2+0.5)/(2+0.5)=0.6
    // d1 tf=1 dl=2: denom=1+1.2*(0.25+0.75*2/(8/3))=1.975
    //   score=0.6*2.2/1.975=0.6683544…  → 668354
    // d2 tf=2 dl=3: denom=2+1.2*(0.25+0.75*3/(8/3))=3.3125
    //   score=0.6*4.4/3.3125=0.7969811… → 796981
    val df = Seq((1L, "spark fast"), (2L, "spark spark slow"),
      (3L, "other words here")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(df, "text", "doc_id", Seq("spark"), k = 10)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(got.map(_._1).toSeq == Seq(2L, 1L), "tf=2 doc ranks first")
    assert(got.map(_._3).toSeq == Seq(796981L, 668354L))
    assert(got.forall(_._2 == 1), "one distinct query term matched")
    assert(got.map(_._4).toSeq == Seq(1, 2))
  }

  test("bm25: non-matching docs are not candidates; ties break on id") {
    val df = Seq((5L, "spark"), (2L, "spark"), (9L, "none")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(df, "text", "doc_id", Seq("spark"), k = 10)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(got.map(_._1).toSeq == Seq(2L, 5L), "equal score → id ascending")
    assert(got(0)._3 == got(1)._3)
  }

  test("bm25: multi-term scores sum exactly; k truncates") {
    val df = Seq((1L, "alpha beta"), (2L, "alpha"), (3L, "beta"),
      (4L, "alpha beta gamma")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(df, "text", "doc_id",
      Seq("alpha", "beta"), k = 2)
      .as[(Long, Long, Long, Int)].collect()
    assert(got.length == 2)
    assert(got.forall(_._2 == 2), "both terms matched by top docs")
  }
}
