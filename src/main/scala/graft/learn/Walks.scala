package graft.learn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic uniform random-walk corpus generation — the
  * DeepWalk/node2vec training-data primitive (Perozzi et al., "DeepWalk:
  * online learning of social representations", KDD 2014): emit `nWalks`
  * fixed-length walks per node; the walk corpus is the "sentences" a
  * skip-gram embedding trainer consumes. The reference's pipeline stops at
  * message passing over the explicit graph (`model.py`); walk corpora are
  * the other standard graph-representation input, so the engine ships the
  * generator.
  *
  * Determinism (the whole point, vs. the papers' `random.choice`): the
  * step-t choice out of `cur` is `mix(cur, wid·31 + t, seed) mod deg(cur)`
  * over [[DetRandom]] — partition-independent, identical under any
  * shuffle-partition setting, and expressible 1:1 in the DuckDB oracle
  * (q109 unrolls the steps as CTEs). Neighbour slots are the
  * `row_number − 1` of the neighbour list ordered by id, which is
  * duplicate-free after canonicalization, so the slot table is unique.
  *
  * Scale shape: the adjacency is built ONCE — one window pass over the
  * symmetrized edge list yields each edge's slot (`idx`), the source
  * degree (`deg`) and the DESTINATION degree (`vdeg`); carrying `vdeg` on
  * the edge row means a walk always arrives at a node already knowing its
  * degree. Each step is then a single 2-key equi-join
  * `(cur, choice) = (u, idx)` of the walk frontier against the pinned
  * adjacency — message volume is O(#walks) per step, never O(Σ deg) (a
  * join on `u` alone would replicate hub neighbour lists under every walk
  * sitting on the hub), and there is no driver-side state. Steps are
  * bounded like the propagation family's rounds.
  */
object Walks {

  /** `(walk_id, step, node_id)` for `nWalks` walks per graph node, each
    * of `steps` steps (`steps + 1` rows per walk incl. the start);
    * `walk_id = node·nWalks + w`. Isolated nodes (absent from `edges`)
    * start no walks; walks never get stuck because the symmetrized graph
    * gives every reached node degree ≥ 1.
    */
  def randomWalks(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      nWalks: Int = 2,
      steps: Int = 4,
      seed: Long = 42L,
      checkpoint: Boolean = true,
      assumeCanonical: Boolean = false): DataFrame = {
    require(nWalks >= 1, s"nWalks must be >= 1: $nWalks")
    require(steps >= 1, s"steps must be >= 1: $steps")
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    def pin(df: DataFrame): DataFrame =
      if (checkpoint) df.coalesce(parts).localCheckpoint(eager = true) else df
    val e0 =
      if (assumeCanonical)
        edges.select(col(srcCol).cast("long").as("a"),
          col(dstCol).cast("long").as("b"))
      else
        edges.select(
            least(col(srcCol), col(dstCol)).cast("long").as("a"),
            greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
          .filter(col("a") =!= col("b"))
          .distinct()
    val sym = e0.select(col("a").as("u"), col("b").as("v"))
      .union(e0.select(col("b").as("u"), col("a").as("v")))
    // one shuffle on u serves the slot ranking and deg(u); the deg(v)
    // window adds the second build-time exchange — both once per call
    val bySrc = Window.partitionBy("u")
    val adj = pin(sym
      .withColumn("idx", row_number().over(bySrc.orderBy("v")) - 1)
      .withColumn("deg", count(lit(1)).over(bySrc))
      .withColumn("vdeg", count(lit(1)).over(Window.partitionBy("v"))))
    val starts = adj.filter(col("idx") === 0)
      .select(col("u").as("id"), col("deg"))
    var frontier = pin(starts
      .select(col("id"), col("deg"),
        explode(sequence(lit(0L), lit(nWalks - 1L))).as("g"))
      .select((col("id") * nWalks + col("g")).as("wid"),
        col("id").as("cur"), col("deg")))
    val outs = Seq.newBuilder[DataFrame]
    outs += frontier.select(col("wid"), lit(0L).as("step"),
      col("cur").as("node_id"))
    for (t <- 1 to steps) {
      val choice =
        DetRandom.mix(col("cur"), col("wid") * lit(31L) + lit(t.toLong), seed) %
          col("deg")
      frontier = pin(frontier
        .select(col("wid"), col("cur"), choice.as("choice"))
        .join(adj, col("cur") === col("u") && col("choice") === col("idx"))
        .select(col("wid"), col("v").as("cur"), col("vdeg").as("deg")))
      outs += frontier.select(col("wid"), lit(t.toLong).as("step"),
        col("cur").as("node_id"))
    }
    outs.result().reduce(_ union _)
      .select(col("wid").as("walk_id"), col("step"), col("node_id"))
  }

  /** node2vec SECOND-ORDER biased walks (Grover & Leskovec, "node2vec:
    * scalable feature learning for networks", KDD 2016): from step 2 on,
    * the candidate weight depends on the PREVIOUS node — `wRet` for
    * returning to it, `wIn` for candidates that are its neighbours
    * (BFS-ish, structural equivalence), `wOut` otherwise (DFS-ish,
    * homophily). Integer weights replace the paper's 1/p : 1 : 1/q
    * ratios (p = 4, q = 2 ⇒ (wRet, wIn, wOut) = (1, 4, 2)), so the
    * weighted draw is exact: the step choice is the candidate whose
    * cumulative-weight slot (slot order = neighbour id) contains
    * `mix(cur, wid·31 + t, seed) mod Σw` — deterministic,
    * partition-independent, oracle-unrolled (q115). Step 1 has no
    * previous node and draws uniformly like [[randomWalks]].
    *
    * Scale shape: step t joins the frontier's current nodes against the
    * pinned adjacency (message volume O(Σ deg(cur)) — the inherent
    * second-order cost; the paper pays the same in its alias tables),
    * marks in-neighbourhood candidates with ONE (prev, v) equi-join
    * against the same adjacency, and resolves the draw with a per-walk
    * running-sum window (partition = walk, size = deg(cur)). No
    * driver-side state; steps bounded. */
  def node2vecWalks(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      nWalks: Int = 2,
      steps: Int = 4,
      wRet: Long = 1L,
      wIn: Long = 4L,
      wOut: Long = 2L,
      seed: Long = 42L,
      checkpoint: Boolean = true,
      assumeCanonical: Boolean = false): DataFrame = {
    require(nWalks >= 1, s"nWalks must be >= 1: $nWalks")
    require(steps >= 1, s"steps must be >= 1: $steps")
    require(wRet >= 1 && wIn >= 1 && wOut >= 1,
      s"weights must be >= 1: ($wRet, $wIn, $wOut)")
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    def pin(df: DataFrame): DataFrame =
      if (checkpoint) df.coalesce(parts).localCheckpoint(eager = true) else df
    val e0 =
      if (assumeCanonical)
        edges.select(col(srcCol).cast("long").as("a"),
          col(dstCol).cast("long").as("b"))
      else
        edges.select(
            least(col(srcCol), col(dstCol)).cast("long").as("a"),
            greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
          .filter(col("a") =!= col("b"))
          .distinct()
    val sym = e0.select(col("a").as("u"), col("b").as("v"))
      .union(e0.select(col("b").as("u"), col("a").as("v")))
    val bySrc = Window.partitionBy("u")
    val adj = pin(sym
      .withColumn("idx", row_number().over(bySrc.orderBy("v")) - 1)
      .withColumn("deg", count(lit(1)).over(bySrc)))
    val starts = adj.filter(col("idx") === 0)
      .select(col("u").as("id"), col("deg"))
    val w0 = pin(starts
      .select(col("id"), col("deg"),
        explode(sequence(lit(0L), lit(nWalks - 1L))).as("g"))
      .select((col("id") * nWalks + col("g")).as("wid"),
        col("id").as("cur"), col("deg")))
    // step 1: uniform (no previous node yet)
    var frontier = pin(w0
      .select(col("wid"), col("cur"),
        (DetRandom.mix(col("cur"), col("wid") * lit(31L) + lit(1L), seed) %
          col("deg")).as("choice"))
      .join(adj, col("cur") === col("u") && col("choice") === col("idx"))
      .select(col("wid"), col("cur").as("prev"), col("v").as("cur")))
    val outs = Seq.newBuilder[DataFrame]
    outs += w0.select(col("wid"), lit(0L).as("step"), col("cur").as("node_id"))
    outs += frontier.select(col("wid"), lit(1L).as("step"),
      col("cur").as("node_id"))
    val byWalk = Window.partitionBy("wid")
    for (t <- 2 to steps) {
      val cand = frontier
        .join(adj.select(col("u"), col("v"), col("idx")),
          col("u") === col("cur"))
        .join(adj.select(col("u").as("pu"), col("v").as("pv")),
          col("pu") === col("prev") && col("pv") === col("v"), "left")
        .withColumn("wt",
          when(col("v") === col("prev"), lit(wRet))
            .when(col("pu").isNotNull, lit(wIn))
            .otherwise(lit(wOut)))
        .withColumn("cw", sum("wt").over(byWalk.orderBy("idx")))
        .withColumn("tot", sum("wt").over(byWalk))
        .withColumn("r",
          DetRandom.mix(col("cur"), col("wid") * lit(31L) + lit(t.toLong),
            seed) % col("tot"))
      frontier = pin(cand
        .filter(col("r") >= col("cw") - col("wt") && col("r") < col("cw"))
        .select(col("wid"), col("cur").as("prev"), col("v").as("cur")))
      outs += frontier.select(col("wid"), lit(t.toLong).as("step"),
        col("cur").as("node_id"))
    }
    outs.result().reduce(_ union _)
      .select(col("wid").as("walk_id"), col("step"), col("node_id"))
  }

  /** Skip-gram training pairs over a walk corpus — the table a
    * word2vec-style node-embedding trainer actually consumes (DeepWalk
    * §4.2 feeds walks to skip-gram; this materialises the (center,
    * context) co-occurrences with their corpus counts): every ordered
    * pair of walk positions at distance 1..`window` inside the same
    * walk, counted across the corpus. Symmetric by construction (both
    * orientations of a co-occurrence appear), matching skip-gram's
    * both-sides context window.
    *
    * Scale shape: one equi-join of the corpus with itself on `walk_id`
    * — fan-out per walk is ≤ (steps+1)·2·window, a constant — then one
    * map-side-combined `(src, ctx)` count; the exchange moves O(distinct
    * co-occurring pairs). */
  def skipGramPairs(walks: DataFrame, window: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    val a = walks.select(col("walk_id"),
      col("step").as("sc"), col("node_id").as("src"))
    val b = walks.select(col("walk_id"),
      col("step").as("so"), col("node_id").as("ctx"))
    a.join(b, Seq("walk_id"))
      .filter(col("so") =!= col("sc") &&
        abs(col("so") - col("sc")) <= window)
      .groupBy("src", "ctx").agg(count(lit(1)).as("cnt"))
  }

  /** Time-RESPECTING temporal walks (the CTDNE shape — Nguyen et al.,
    * "Continuous-time dynamic network embeddings", WWW 2018 companion):
    * every hop must use an edge whose timestamp is ≥ the timestamp of
    * the edge that reached the current node, so a walk is a temporally
    * valid path — the training-data generator for dynamic-graph
    * embeddings, where a static walk (q109/q115) would happily traverse
    * causally impossible sequences. Walks that run out of
    * forward-in-time edges TRUNCATE (the paper's walks end the same
    * way; truncation is semantics, not error).
    *
    * Deterministic: the step-t choice is slot
    * `mix(cur, wid·31 + t, seed) mod n_valid` among the valid
    * candidates slot-ordered by (time, neighbour id) — so the draw is
    * partition-independent and the DuckDB oracle unrolls it (q118).
    * Multi-edges at distinct times are distinct candidates (arriving
    * earlier leaves more future open), exactly the paper's model.
    *
    * Scale shape: per step one frontier ⨝ edges equi-join on the
    * current node with the `time ≥ clock` residual (O(Σ deg(cur))
    * messages — inherent, since validity depends on the walk's own
    * clock) and one per-walk count+rank window bounded by the max
    * temporal degree; steps bounded; no driver state.
    *
    * Output: `(walk_id, step, node_id, day)` where `day` is the arrival
    * edge's time (start rows carry 0, the epoch floor every edge
    * satisfies). */
  def temporalWalks(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      timeCol: String = "t",
      nWalks: Int = 2,
      steps: Int = 4,
      seed: Long = 42L,
      checkpoint: Boolean = true): DataFrame = {
    require(nWalks >= 1, s"nWalks must be >= 1: $nWalks")
    require(steps >= 1, s"steps must be >= 1: $steps")
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    def pin(df: DataFrame): DataFrame =
      if (checkpoint) df.coalesce(parts).localCheckpoint(eager = true) else df
    val e0 = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"),
        col(timeCol).cast("long").as("d"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val sym = pin(e0.select(col("a").as("u"), col("b").as("v"), col("d"))
      .union(e0.select(col("b").as("u"), col("a").as("v"), col("d"))))
    var frontier = pin(sym.select(col("u").as("id")).distinct()
      .select(col("id"), explode(sequence(lit(0L), lit(nWalks - 1L))).as("g"))
      .select((col("id") * nWalks + col("g")).as("wid"),
        col("id").as("cur"), lit(0L).as("curd")))
    val outs = Seq.newBuilder[DataFrame]
    outs += frontier.select(col("wid"), lit(0L).as("step"),
      col("cur").as("node_id"), col("curd").as("day"))
    val byWalk = Window.partitionBy("wid")
    for (t <- 1 to steps) {
      val cand = frontier
        .join(sym, col("u") === col("cur") && col("d") >= col("curd"))
        .withColumn("slot",
          row_number().over(byWalk.orderBy("d", "v")) - 1)
        .withColumn("n", count(lit(1)).over(byWalk))
      frontier = pin(cand
        .filter(col("slot") ===
          DetRandom.mix(col("cur"), col("wid") * lit(31L) + lit(t.toLong),
            seed) % col("n"))
        .select(col("wid"), col("v").as("cur"), col("d").as("curd")))
      outs += frontier.select(col("wid"), lit(t.toLong).as("step"),
        col("cur").as("node_id"), col("curd").as("day"))
    }
    outs.result().reduce(_ union _)
      .select(col("wid").as("walk_id"), col("step"), col("node_id"),
        col("day"))
  }

  /** The walk-corpus PMI matrix's exact integer image — the NetMF
    * observation (Qiu et al., "Network embedding as matrix
    * factorization", WSDM 2018): skip-gram with negative sampling over
    * a walk corpus implicitly factorizes the co-occurrence PMI matrix.
    * This emits that matrix's strongest entries as the log-free LIFT
    * `cnt·N·scale div (n_src·n_ctx)` — the exact monotone image of PMI
    * at fixed pair count (the q99 collocation treatment applied to walk
    * co-occurrences), so it hash-verifies where `ln` never can.
    *
    * Scale shape: marginals are O(|V|) aggregates over the pair table,
    * re-joined on their own keys; the corpus total is a 1-row
    * broadcast; the top-k cut is `TakeOrderedAndProject`. Nothing
    * re-touches walks. */
  def pairLift(
      pairs: DataFrame, // (src, ctx, cnt) from [[skipGramPairs]]
      minCount: Long = 5L,
      topK: Int = 200): DataFrame = {
    val msrc = pairs.groupBy("src").agg(sum("cnt").as("n_src"))
    val mctx = pairs.groupBy("ctx").agg(sum("cnt").as("n_ctx"))
    val total = pairs.agg(sum("cnt").as("n_total"))
    pairs.filter(col("cnt") >= minCount)
      .join(msrc, Seq("src")).join(mctx, Seq("ctx"))
      .crossJoin(broadcast(total))
      // all factors positive, so Spark's truncating div ≡ DuckDB's
      // flooring // — and cnt·N·1e6 stays < 2⁶³ for corpora to ~10¹²
      // total pairs (beyond that, drop the scale a decade)
      .select(col("src"), col("ctx"), col("cnt"),
        expr("(cnt * n_total * 1000000) div (n_src * n_ctx)").as("lift_fp"))
      .orderBy(desc("lift_fp"), asc("src"), asc("ctx"))
      .limit(topK)
  }
}
