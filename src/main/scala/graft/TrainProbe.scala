package graft

import graft.catalog.Catalogs
import graft.graph.GraphBuilder
import graft.topology.{EdgeKey, Topology}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector

/** Scratch phase-timing probe for q28 (dev-only; not part of the API). */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sp: SparkSession = spark

    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    def t(n: String) = Tables.load(spark, sfDir, n)

    if (sys.env.contains("NOBC"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // TRAIN_REAL=1: time the actual TrainLR.train call (the q28 body)
    if (sys.env.contains("TRAIN_REAL")) {
      for (rep <- 1 to 3) {
        val g = phase(s"rep$rep build+aug") {
          GraphBuilder.build(Catalogs.tpch, n => t(n), probeDense = true)
            .addDegree.withReverseEdges.withSelfLoops
        }
        val target = Topology.classify(Catalogs.tpch).edges
          .find(e => e.srcTable == "orders" && e.dstTable == "customer")
          .map(e => EdgeKey(e.srcTable, e.relation, e.dstTable)).get
        val m = phase(s"rep$rep TrainLR.train")(
          graft.learn.TrainLR.train(g, target))
        println(s"PROBE rep$rep metrics ${m.valMetrics.toSeq.sortBy(_._1)}")
      }
      spark.stop()
      return
    }

    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      val g = phase("build+aug") {
        GraphBuilder.build(Catalogs.tpch, n => t(n), probeDense = true)
          .addDegree.withReverseEdges.withSelfLoops
      }
      val target = Topology.classify(Catalogs.tpch).edges
        .find(e => e.srcTable == "orders" && e.dstTable == "customer")
        .map(e => EdgeKey(e.srcTable, e.relation, e.dstTable)).get

      val split = phase("split")(graft.learn.LinkSplit.split(g, target, 0.15, 42L))
      // mirrors TrainLR.train: NOT cached — the flat layout consumes each
      // frame exactly once
      val msgGraph = phase("restrict") {
        split.messageGraph.restrictTo(Set(target.src, target.dst), 2)
      }
      val trainPos = graft.functions.Caching.ensureCached(split.trainPos)
      val valPos = graft.functions.Caching.ensureCached(split.valPos)
      val emb = phase("meanRoundsFlat") {
        graft.learn.Propagate.meanRoundsFlat(
          msgGraph, graft.learn.Propagate.degreeInit(msgGraph), 2)
      }
      val nDst = phase("nDst count")(g.nodes(target.dst).count())
      val allPos = graft.functions.Caching.ensureCached(g.edges(target))
      def negs(pos: org.apache.spark.sql.DataFrame, s: Long) =
        graft.learn.NegativeSampling.sample(pos, allPos, nDst, s)

      def edgeFeatures(pairs: org.apache.spark.sql.DataFrame, label: Int) =
        pairs
          .join(emb(target.src).select(col("id").as("src"), col("vec").as("sv")), Seq("src"))
          .join(emb(target.dst).select(col("id").as("dst"), col("vec").as("dv")), Seq("dst"))
          .select(concat(col("sv"), col("dv"),
            graft.functions.ArrayOps.hadamard(col("sv"), col("dv"))).as("f"),
            lit(label).as("label"))

      val trainDf = edgeFeatures(trainPos, 1)
        .unionByName(edgeFeatures(negs(trainPos, 43L), 0))
        .select(array_to_vector(col("f")).as("features"), col("label"))
        .coalesce(graft.learn.TrainLR.trainPartitionTarget(
          spark.sparkContext.defaultParallelism))
        .cache()
      val n = phase("trainDf materialize")(trainDf.count())
      println(s"PROBE trainDf rows=$n partitions=${trainDf.rdd.getNumPartitions}")
      val lr = new LogisticRegression()
        .setMaxIter(50).setRegParam(0.01).setStandardization(true)
      val model = phase("lr.fit")(try lr.fit(trainDf) finally trainDf.unpersist())
      println(s"PROBE lbfgs totalIterations=${model.summary.totalIterations}")
      val valDf = edgeFeatures(valPos, 1).unionByName(edgeFeatures(negs(valPos, 44L), 0))
      val wCol = typedlit(model.coefficients.toArray.toSeq)
      val scored = valDf.select(
        graft.functions.ArrayOps.sigmoid(
          graft.functions.ArrayOps.dot(col("f"), wCol) + lit(model.intercept)).as("score"),
        col("label"))
      val m = phase("metrics")(graft.learn.Scoring.metrics(scored))
      println(s"PROBE metrics ${m.toSeq.sortBy(_._1)}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
