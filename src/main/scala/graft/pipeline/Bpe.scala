package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: TRAIN merge rules from the corpus,
  * then TOKENIZE the corpus with them — the "fit a tokenizer to your
  * data" step of building a training set, done inside the engine.
  *
  * Scale shape (the standard BPE factorization): training operates on
  * the WORD-TYPE frequency table, not the corpus — one distributed
  * `groupBy(word).count()` reduces 100 TB of text to a vocabulary-sized
  * table (Zipf: types ≪ tokens; cap with `maxTypes` top-frequency types
  * when the corpus is open-vocabulary), and the merge loop runs
  * driver-side over that small table exactly like k-means centroids run
  * driver-side over k rows. Tokenization is then a narrow
  * `mapPartitions` pass with the learned merges broadcast — embarrassing
  * parallelism, no shuffle.
  *
  * The merge loop and the tokenizer are the classic algorithm (Sennrich
  * et al. 2016): count adjacent symbol pairs weighted by type frequency,
  * merge the most frequent pair (ties broken lexicographically so
  * training is deterministic), repeat. Tokenization applies merges in
  * learned priority order, each to fixpoint. A per-rule
  * engine-SQL re-expression does not exist (the algorithm is inherently
  * iterative-to-fixpoint), so the gate entry is rows-only and
  * correctness rides on hand-computed specs + invariants
  * (concat(pieces) == word; pieces ∈ learned vocab ∪ single chars). */
object Bpe {

  /** Train `nMerges` merge rules from the corpus's word-type table.
    * Returns merges in priority order. `maxTypes` bounds the driver-side
    * table (top types by frequency, ties by word — deterministic). */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      maxTypes: Int = 100000): Seq[(String, String)] = {
    val types = df
      .select(explode(filter(TextAnalysis.words(col(textCol)),
        w => length(w) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc)
      .limit(maxTypes)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // driver-side merge loop over the type table (vocabulary-sized)
    var words: Array[(Array[String], Long)] =
      types.map { case (w, f) => (w.split("").filter(_.nonEmpty), f) }
    val merges = Vector.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // highest count; ties → lexicographically smallest pair
        val best = pairCounts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += best
        words = words.map { case (syms, f) => (mergePass(syms, best), f) }
        step += 1
      }
    }
    merges.result()
  }

  /** One exhaustive left-to-right merge pass of `pair` over a symbol
    * sequence (the BPE apply step for a single rule). */
  private def mergePass(syms: Array[String],
      pair: (String, String)): Array[String] = {
    if (syms.length < 2) return syms
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (pair._1 + pair._2)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Tokenize one word with merges in priority order, each to fixpoint
    * (one [[mergePass]] IS the fixpoint for a single rule: the pass
    * merges every non-overlapping occurrence left-to-right, and a new
    * occurrence of the SAME pair cannot be created by merging it). */
  def tokenizeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.split("").filter(_.nonEmpty)
    merges.foreach { m => syms = mergePass(syms, m) }
    syms.toSeq
  }

  /** Tokenize every document: per-row kernel with the merges broadcast.
    * Emits `(idCol, n_words, n_pieces, pieces_sample)` — the piece
    * stream itself would be token-count-sized; callers wanting it
    * per-row can lift [[tokenizeWord]] into their own projection. */
  def tokenize(df: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    val input = df.select(col(idCol).cast("long").as("id"),
      coalesce(col(textCol), lit("")).as("t")).as[(Long, String)]
    input.mapPartitions { it =>
      val ms = bc.value
      it.map { case (id, t) =>
        val ws = t.trim.split("\\s+").filter(_.nonEmpty)
        var pieces = 0L
        val sample = Vector.newBuilder[String]
        var n = 0
        ws.foreach { w =>
          val toks = tokenizeWord(w, ms)
          pieces += toks.length
          if (n < 8) { sample ++= toks.take(8 - n); n += math.min(toks.length, 8 - n) }
        }
        (id, ws.length.toLong, pieces, sample.result().mkString(" "))
      }
    }.toDF(idCol, "n_words", "n_pieces", "pieces_sample")
  }
}
