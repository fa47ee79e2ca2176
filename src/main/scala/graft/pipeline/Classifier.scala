package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trainable bag-of-words document classification — the quality/domain
  * classifier stage of an LLM data pipeline (CCNet/GPT-3-style "does this
  * look like the target distribution" filtering), as a multinomial Naive
  * Bayes trained and applied entirely in the engine.
  *
  * Scale shape: training is two token aggregates (per-(label, token)
  * counts and per-label totals) whose output is VOCABULARY-sized, not
  * corpus-sized — it broadcasts. Scoring is one narrow token explode on
  * the test side, a broadcast join against the model, and one aggregate
  * per (doc, label); |labels| is a small constant multiplier, never a
  * shuffle of its own.
  *
  * Determinism: per-(token, label) log-probabilities are integer-ized at
  * 1e-6 (`BIGINT` micros) immediately after the one `ln` call, so every
  * downstream sum is exact 64-bit arithmetic — order-independent and
  * bit-reproducible. The `ln` itself is evaluated on identical doubles in
  * both engines (rational counts), and a last-ulp difference only matters
  * if the value sits within 1e-16 of a 1e-6 rounding boundary —
  * vanishing at vocabulary scale (~1e-10 per value over V×C values).
  */
object Classifier {

  /** Multinomial Naive Bayes with add-1 (Laplace) smoothing: train on
    * `(textCol, labelCol)` rows of `train`, emit the argmax class per
    * `test` row as `(idCol, predicted, score_micro)`.
    *
    * `P(w|c) = (count(w,c) + 1) / (tokens_c + V)`; a token unseen for a
    * class — including tokens absent from training entirely — scores the
    * same smoothed floor `1 / (tokens_c + V)`, so out-of-vocabulary
    * handling IS the smoothing (no special case). Documents with zero
    * tokens classify by prior alone. Ties break on the label string. */
  def naiveBayes(train: DataFrame, test: DataFrame, textCol: String,
      idCol: String, labelCol: String): DataFrame = {
    val toks = (d: DataFrame, keep: Seq[String]) =>
      d.select((keep.map(col) :+
        explode(filter(TextAnalysis.words(col(textCol)),
          w => length(w) > 0)).as("w")): _*)

    val trainToks = toks(train, Seq(labelCol))
    val classTok = trainToks.groupBy(col(labelCol), col("w"))
      .agg(count(lit(1)).as("cnt"))
    // tok_c and the vocabulary size derive from the (label, token)
    // counts — V×C-sized inputs — instead of re-running the corpus
    // tokenize+explode pass once per aggregate (r16, guide §2.3
    // "aggregate before you shuffle": one token-sized pass, not three)
    val classTot = classTok.groupBy(col(labelCol))
      .agg(sum(col("cnt")).as("tok_c"))
    val vocab = classTok.agg(countDistinct(col("w")).as("v"))
    val nd = train.agg(count(lit(1)).as("nd"))

    // classes: (label, prior_micro, oov_micro) — |C| rows.
    val classes = train.groupBy(col(labelCol))
      .agg(count(lit(1)).as("nd_c"))
      .crossJoin(nd).join(classTot, labelCol).crossJoin(vocab)
      .select(col(labelCol),
        round(log(col("nd_c").cast("double") / col("nd")) * lit(1e6))
          .cast("long").as("prior_micro"),
        round(log(lit(1.0) / (col("tok_c") + col("v"))) * lit(1e6))
          .cast("long").as("oov_micro"))

    // model: (label, token, logp_micro) — V×C rows, vocab-scaling.
    val model = classTok.join(classTot, labelCol).crossJoin(vocab)
      .select(col(labelCol), col("w"),
        round(log((col("cnt") + lit(1.0)) / (col("tok_c") + col("v"))) *
          lit(1e6)).cast("long").as("logp_micro"))

    val testTf = toks(test, Seq(idCol))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("tf"))
    val tokScore = testTf
      .crossJoin(broadcast(classes.select(col(labelCol), col("oov_micro"))))
      // model is V×C (vocab-sized) — no broadcast hint; AQE decides
      .join(model, Seq(labelCol, "w"), "left")
      .groupBy(col(idCol), col(labelCol))
      .agg(sum(col("tf") * coalesce(col("logp_micro"), col("oov_micro")))
        .as("tok_micro"))
    // every (test doc × class) pair scores, even token-less docs
    val scoredAll = test.select(col(idCol))
      .crossJoin(broadcast(classes.select(col(labelCol), col("prior_micro"))))
      .join(tokScore, Seq(idCol, labelCol), "left")
      .select(col(idCol), col(labelCol),
        (col("prior_micro") + coalesce(col("tok_micro"), lit(0L)))
          .as("score_micro"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col(labelCol).asc)
    scoredAll.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col(idCol), col(labelCol).as("predicted"), col("score_micro"))
  }

  /** Logistic-regression LINEAR PROBE over an embedding column — the
    * "train a small head on frozen embeddings" quality/domain
    * classifier (the embedding-space analog of the fastText filter).
    * Full-batch gradient descent: the weight vector (dim+1, bias last)
    * lives on the driver like k-means centroids; each iteration is one
    * corpus scan + a (component)-keyed aggregate of 1e-6-integer-ized
    * gradient contributions — EXACT sums, so training is deterministic
    * under any partitioning (a plain float sum would drift with
    * partition order). At 100 TB, train on a sample (same contract as
    * `Similarity.trainCentroids`); scoring the full corpus stays one
    * narrow broadcast pass.
    *
    * Returns `(idCol, y, score_micro, predicted)` for `test` under the
    * trained head. Iterative training has no SQL re-expression → gate
    * entry is rows-only; the spec carries convergence + determinism. */
  def linearProbe(train: DataFrame, test: DataFrame, vecCol: String,
      idCol: String, positive: org.apache.spark.sql.Column, dim: Int,
      iters: Int = 15, lr: Double = 2.0): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    def prepared(df: DataFrame) = df.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("x"),
      when(positive, 1.0).otherwise(0.0).as("y"))
    val tr = prepared(train)
    val n = tr.count().toDouble
    var w = Array.fill(dim + 1)(0.0)
    // dot against the constant weight vector via the DotFixed loop
    // kernel (same left-associated sum as the unrolled chain it
    // replaced, which generated a >12 KB unJITtable method — CodegenAudit
    // catch); the bias rides as a plain literal add
    def margin(weights: Array[Double]): org.apache.spark.sql.Column =
      Similarity.dotFixed(col("x"),
        typedLit(weights.take(dim).toSeq), dim) + lit(weights(dim))
    for (_ <- 1 to iters) {
      val resid = tr.withColumn("g",
        lit(1.0) / (lit(1.0) + exp(-margin(w))) - col("y"))
      // gradient components: g·x_j for j < dim, g for the bias row —
      // integer-ized per row so the cross-partition sum is exact
      val grads = resid
        .select(posexplode(concat(col("x"), array(lit(1.0))))
          .as(Seq("pos", "xv")), col("g"))
        .select(col("pos"),
          round(col("g") * col("xv") * lit(1e6)).cast("long").as("micro"))
        .groupBy("pos").agg(sum(col("micro")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      w = w.zipWithIndex.map { case (wj, j) =>
        wj - lr * (grads.getOrElse(j, 0L) / 1e6) / n
      }
    }
    prepared(test)
      .withColumn("p", lit(1.0) / (lit(1.0) + exp(-margin(w))))
      .select(col("id").as(idCol), col("y"),
        round(col("p") * lit(1e6)).cast("long").as("score_micro"),
        (col("p") >= 0.5).as("predicted"))
  }
}
