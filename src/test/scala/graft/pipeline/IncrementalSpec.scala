package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  // corpus with cross-batch duplicates: ids 0-99 history, 100-199 batch;
  // every batch id ≡ 0 (mod 4) repeats a history text
  private def corpus = (0L until 200L).map { i =>
    val text = if (i >= 100 && i % 4 == 0) s"text ${i - 100}" else s"text $i"
    (i, text)
  }
  private def history = corpus.filter(_._1 < 100).toDF("doc_id", "text")
  private def batch = corpus.filter(_._1 >= 100).toDF("doc_id", "text")

  private def exactNew: Set[Long] =
    (100L until 200L).filterNot(i => i % 4 == 0).toSet

  test("newDocs equals the exact anti-join at default sizing") {
    val got = Incremental.newDocs(batch, history, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(got == exactNew)
  }

  test("newDocs stays exact when the Bloom filter is tiny (many false positives)") {
    // 64 bits for 100 digests → filter saturates, nearly every batch doc
    // becomes a candidate — the confirm join must still remove every
    // false positive
    val got = Incremental.newDocs(batch, history, "text", "doc_id",
        mBits = 64, k = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(got == exactNew)
  }

  test("bloom has no false negatives: every history digest tests positive") {
    val hist = history.select(md5(col("text")).as("digest"))
    val words = Incremental.bloomWords(hist, "digest", mBits = 1 << 12, k = 5)
    val misses = hist.withColumn("_bloom", typedLit(words.toSeq))
      .where(!Incremental.mightContain(words, "digest", 1 << 12, 5))
      .count()
    assert(misses == 0L)
  }

  test("bloom build is deterministic across runs") {
    val hist = history.select(md5(col("text")).as("digest"))
    val a = Incremental.bloomWords(hist, "digest", 1 << 12, 5)
    val b = Incremental.bloomWords(hist.repartition(7), "digest", 1 << 12, 5)
    assert(a.toSeq == b.toSeq, "partitioning must not change the filter")
  }

  test("prefilter routes most truly-new docs around the confirm join") {
    // with a well-sized filter the candidate set ≈ true dups + fpp·batch;
    // check the definite-new path actually fires (not everything funnels
    // through the anti-join)
    val hist = history.select(md5(col("text")).as("digest"))
    val words = Incremental.bloomWords(hist, "digest", 1 << 14, 5)
    val maybe = batch.select(md5(col("text")).as("digest"))
      .withColumn("_bloom", typedLit(words.toSeq))
      .where(Incremental.mightContain(words, "digest", 1 << 14, 5))
      .count()
    assert(maybe < 40, s"expected ~25 dups + few fps, got $maybe candidates")
    assert(maybe >= 25, "all 25 true duplicates must be candidates")
  }

  test("empty history: everything is new, nothing shuffles to the confirm join") {
    val got = Incremental.newDocs(batch, history.limit(0), "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(got == (100L until 200L).toSet)
  }
}
