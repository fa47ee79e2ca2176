package graft.plans

import graft.SparkSpec
import graft.pipeline.{Curation, MediaCodec, Multimodal, Profile, Retrieval, TextAnalysis}
import org.apache.spark.sql.functions._

/** Machine-checked scale claims for this round's operators: the shapes
  * the scaladocs promise (distributed top-k, two-phase ranks, no
  * global windows) asserted against the executed plans, so a refactor
  * that silently degrades one to a single-partition sort fails CI. */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("keySkew top-k is a distributed TakeOrdered, not a global sort") {
    val df = (1L to 500L).map(i => Tuple1(i % 17)).toDF("k")
    val p = plan(Profile.keySkew(df, "k", topK = 5))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("rrfFusion final k is a distributed TakeOrdered") {
    val a = (1L to 50L).map(i => (i, i.toInt)).toDF("id", "rank")
    val p = plan(Retrieval.rrfFusion(Seq(a, a), "id", "rank", k = 10))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("curriculumBins rank windows are _pid-partitioned (two-phase)") {
    val df = (1L to 100L).map(i => (i, i % 9)).toDF("id", "s")
    val p = plan(Curation.curriculumBins(df, "s", "id", nBins = 4))
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, p)
    specs.foreach(s => assert(s.contains("_pid"),
      s"window must partition by _pid, got: $s"))
  }

  test("interleaveSources has no unpartitioned window") {
    val df = (1L to 60L).map(i => (i, s"s${i % 4}")).toDF("id", "source")
    val p = plan(Curation.interleaveSources(df, "source", "id", "t"))
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    specs.foreach(s => assert(s.contains("source"),
      s"only the per-source rank window may exist, got: $s"))
  }

  test("tokenEntropy window is doc-partitioned") {
    val df = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val p = plan(TextAnalysis.tokenEntropy(df, "text", "doc_id"))
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, p)
    specs.foreach(s => assert(s.contains("doc_id"), s))
  }

  test("perceptual near-dup banding is a hash join, never a nested loop") {
    import graft.pipeline.Multimodal.MediaRecord
    implicit val sp = spark
    val media = Seq(
      MediaRecord(1L, "image", MediaCodec.encodeBmp(16, 16, 1), "s"),
      MediaRecord(2L, "audio", MediaCodec.encodeWav(800, 1), "s"),
      MediaRecord(3L, "video", MediaCodec.encodeVideo(2, 40, 16, 16, 2), "s"))
      .toDS()
    // inspect the LAZY plan (eager=false): the public ops return a
    // cached pair frame whose executed plan is just the cache scan
    def banded(hashes: org.apache.spark.sql.DataFrame, hashCol: String,
        maxH: Int, extraKeys: Seq[String], maxBucket: Int) =
      Multimodal.bandedHammingPairs(hashes, hashCol, maxH,
        pairCols = Seq("media_id"), extraKeys = extraKeys,
        maxBucket = maxBucket, eager = false)
    val img = Multimodal.imagePhash(media.filter(_.media_type == "image"))
    val vid = Multimodal.videoSignatures(media.filter(_.media_type == "video"))
    for (df <- Seq(
        banded(img, "phash", 7, Nil, 0),
        banded(vid, "vsig", 7, Seq("n_frames"), 0),
        // the capped grid must keep the equi-join shape too: sub-group
        // cell ids join as plain keys, and the sizes frame joins back on
        // the bucket key (data-sized at bands=1 — never a nested loop)
        banded(img, "phash", 7, Nil, 2),
        banded(img, "phash", 0, Nil, 2))) {
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"banding must stay an equi-join:\n$p")
    }
  }

  test("admission replay is one tenant shuffle: no windows, no joins") {
    val ts = new java.sql.Timestamp(1700000000000L)
    val ev = Seq((ts, 1L, "t", 1L), (ts, 2L, "t", 2L))
      .toDF("ts", "user_id", "event_type", "event_id")
    val p = plan(graft.rates.Rates.joinAdmission(ev, "event_type", "user_id",
      "ts", "event_id", maxConcurrent = 1, limitNum = 1L, limitDen = 1L))
    // slot order falls out of the kernel's sorted walk — a regression back
    // to rank-windows-plus-join would reintroduce two shuffles here
    assert(!p.contains("windowspecdefinition") &&
      !p.contains("HashJoin") && !p.contains("SortMergeJoin") &&
      !p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert("Exchange".r.findAllIn(p).size <= 1,
      s"admission must shuffle once, by tenant:\n$p")
  }
}
