package graft.ext

import graft.learn.{DetRandom, Scoring, TrainLR}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TRAINED document-quality classifier (r11 verdict Next #5) — the
  * fastText/CCNet quality-filter pipeline (Joulin et al. 2017, "Bag of
  * Tricks for Efficient Text Classification"; Wenzek et al. 2020, CCNet
  * §4.4; the GPT-3/PaLM corpus-filtering recipe): WEAK labels from the
  * engine's own integer-exact heuristics (the q57/q75 family), hashed
  * token features, a logistic head — turning the heuristic-only q75 tier
  * into a first-class trained capability.
  *
  * The q28/q53/q43 oracle discipline, applied verbatim:
  *   - the FIT (q134, [[trainQuality]]) is legitimately unoracleable
  *     float territory, so the oracled surface is the rows-only ENVELOPE:
  *     split/label counts on deterministic predicates the oracle replays
  *     exactly, plus theorem-backed convergence flags (L-BFGS line search
  *     only accepts decreases; the zero-coefficient start with
  *     prior-log-odds intercept prices obj₀ = H(prior) ≤ ln 2);
  *   - SERVING (q135, [[scoreFrozen]]) runs a FROZEN integer head, so
  *     every output cell is exact integer arithmetic any engine replays
  *     bit-for-bit.
  *
  * Scale shape: one tokenize pass per document and row-local feature
  * arithmetic (codegen'd HOFs, no shuffle); the fit is Spark ML L-BFGS —
  * one treeAggregate per iteration over dim-64 hashed features, the
  * gradient parallelism scaling with the cluster via
  * [[TrainLR.trainPartitionTarget]]; frozen serving is a pure projection.
  */
object QualityClassifier {

  /** Hashed-feature width: 64 buckets is plenty for the heuristic signal
    * (two stopwords + volume) while keeping every L-BFGS iteration's
    * dense-gradient treeAggregate payload trivially small. */
  val Dim = 64

  /** Integer-exact per-doc features + the weak label. `stop_ppm` uses the
    * same two-stopword set as q32/q57 (the fixture's lang-id contract);
    * the weak label is the CCNet-style conjunctive heuristic "long enough
    * AND fluent enough" (n_tokens ≥ 40 ∧ stopword ratio ≥ 4%) — exactly
    * replayable in ANSI SQL, which is what makes the envelope and the
    * frozen serving oracles possible. */
  private[graft] def features(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        regexp_extract_all(col(textCol), lit("[a-z0-9]+"), lit(0)).as("ts"))
      .withColumn("n_tokens", size(col("ts")).cast("long"))
      .withColumn("stop_ppm", expr(
        """CASE WHEN n_tokens = 0 THEN 0L
          |ELSE CAST(size(filter(ts, x -> x = 'the' OR x = 'a')) AS BIGINT)
          |  * 1000000 div n_tokens END""".stripMargin))
      .withColumn("weak_label", expr(
        "CASE WHEN n_tokens >= 40 AND stop_ppm >= 40000 THEN 1L ELSE 0L END"))

  /** Frozen serving head (q135): `quality_fp = 25000·(n_tokens − 40) +
    * 22·(stop_ppm − 40000) − 600000`, prediction = sign — a linear
    * approximation of the conjunctive weak label (the −600000 intercept
    * penalises sitting below either threshold), agreeing with it on ~82 %
    * of the fixture corpus at every scale factor. Weights are FROZEN
    * integers in the source exactly like q43's serving head: serving is
    * the deterministic half of the pipeline, so the whole scored corpus
    * is hash-exact. */
  def scoreFrozen(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    features(docs, idCol, textCol)
      .withColumn("quality_fp", expr(
        "25000 * (n_tokens - 40) + 22 * (stop_ppm - 40000) - 600000"))
      .select(col("doc_id"), col("n_tokens"), col("stop_ppm"),
        col("quality_fp"),
        (col("quality_fp") > 0).cast("long").as("pred_label"),
        col("weak_label"))

  /** Calibration audit of the frozen head (q136) — the reliability-
    * diagram table (DeGroot & Fienberg 1983; Niculescu-Mizil & Caruana
    * 2005): scores bucketed into fixed 500k-wide integer bins, per bin
    * the doc count, weak-positive count, and positive rate in ppm. A
    * monotone pos_ppm column is what "higher score ⇒ more likely good"
    * looks like; flat or inverted bins localise where the head lies.
    * Exact integers end to end (floor-div binning, ppm rates), so the
    * whole table is oracle-replayable. One map-side-combined aggregate
    * over the row-local scores; ≤ #bins rows ever move. */
  def calibration(
      docs: DataFrame, idCol: String, textCol: String,
      binWidth: Long = 500000L): DataFrame =
    scoreFrozen(docs, idCol, textCol)
      .withColumn("bin", expr(
        s"CASE WHEN quality_fp >= 0 THEN quality_fp div $binWidth " +
          s"ELSE -((-quality_fp + ${binWidth - 1}) div $binWidth) END"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("weak_label")).as("n_pos"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        expr("(n_pos * 1000000) div n_docs").as("pos_ppm"))

  /** Train the quality head (q134): HashingTF token counts → logistic
    * regression on the weak labels, deterministic doc-keyed split
    * ([[DetRandom]], partition-independent). Returns the one-row
    * ENVELOPE: the four split×label counts as LAZY aggregates (the bench
    * times the counting work) and the theorem-backed fit flags. */
  def trainQuality(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      valFrac: Double = 0.15,
      seed: Long = 42L): DataFrame = {
    val spark = docs.sparkSession
    val f = features(docs, idCol, textCol)
      .withColumn("u", DetRandom.uniform(col("doc_id"), col("doc_id"), seed))
    val htf = new HashingTF().setInputCol("ts").setOutputCol("features")
      .setNumFeatures(Dim)
    // cache: one L-BFGS job per iteration over this frame (see TrainLR)
    val trainDf = htf.transform(f.filter(col("u") >= valFrac))
      .select(col("features"), col("weak_label").cast("double").as("label"))
      .coalesce(TrainLR.trainPartitionTarget(
        spark.sparkContext.defaultParallelism))
      .cache()
    // Degenerate-corpus guard: a single-class weak-label set makes LR
    // short-circuit (trivial/empty objectiveHistory — `hist.last` below
    // would throw on empty) and an empty validation split yields NaN
    // metrics — either would surface as an uninformative q134 oracle
    // flag mismatch. Fail loudly with the actual defect instead. Cost:
    // the class count runs on the cache the fit materialises anyway;
    // the split check is a limit-1 probe.
    val lr = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setStandardization(true)
    // one try/finally spans the guards AND the fit: a guard that throws
    // must not leak the cached frame into the session
    val model = try {
      val cls = trainDf.agg(
          sum(when(col("label") === 1.0, 1L).otherwise(0L)),
          sum(when(col("label") === 0.0, 1L).otherwise(0L)))
        .head()
      require(cls.getLong(0) > 0L && cls.getLong(1) > 0L,
        "trainQuality: training split needs BOTH weak-label classes " +
          s"(pos=${cls.getLong(0)}, neg=${cls.getLong(1)}) — degenerate corpus")
      require(!f.filter(col("u") < valFrac).isEmpty,
        "trainQuality: validation split is empty — corpus too small for " +
          s"valFrac=$valFrac")
      lr.fit(trainDf)
    } finally trainDf.unpersist()
    val hist = model.summary.objectiveHistory
    val scored = model.transform(htf.transform(f.filter(col("u") < valFrac)))
      .select(element_at(vector_to_array(col("probability")), 2).as("score"),
        col("weak_label").cast("int").as("label"))
    val vm = Scoring.metrics(scored)
    val inRange = Seq("accuracy", "precision", "recall", "f1").forall(k =>
      vm(k) >= 0.0 && vm(k) <= 1.0) && vm("bce") >= 0.0 && !vm("bce").isNaN
    def flag(b: Boolean) = lit(if (b) 1L else 0L)
    f.agg(
        sum(when(col("u") >= valFrac && col("weak_label") === 1L, 1L)
          .otherwise(0L)).as("n_train_pos"),
        sum(when(col("u") >= valFrac && col("weak_label") === 0L, 1L)
          .otherwise(0L)).as("n_train_neg"),
        sum(when(col("u") < valFrac && col("weak_label") === 1L, 1L)
          .otherwise(0L)).as("n_val_pos"),
        sum(when(col("u") < valFrac && col("weak_label") === 0L, 1L)
          .otherwise(0L)).as("n_val_neg"))
      .select(col("n_train_pos"), col("n_train_neg"),
        col("n_val_pos"), col("n_val_neg"),
        flag(model.summary.totalIterations <= 51).as("fit_iters_le_max"),
        flag(hist.last <= hist.head + 1e-9).as("fit_loss_decreased"),
        flag(hist.last <= math.log(2.0) + 1e-9).as("fit_beats_chance"),
        flag(inRange).as("val_metrics_in_range"))
  }
}
