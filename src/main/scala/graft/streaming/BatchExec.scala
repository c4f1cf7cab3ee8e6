package graft.streaming

import org.apache.spark.sql.SparkSession

/** Execution helpers for the `foreachBatch` ingest bodies (r18
  * optimization round — guide §1 measured the lifecycle queries at
  * 56–122 Spark jobs each, job-count/overhead-bound, not data-bound).
  *
  * [[aqeOn]]: Spark force-disables AQE on the session clone it creates
  * for a streaming query (`ResolveWriteToStream` — AQE is unsupported
  * for the STREAMING plan), and every DataFrame action inside a
  * `foreachBatch` body runs in that clone. But the body's queries are
  * plain BATCH queries over a completed micro-batch — exactly the
  * workload AQE exists for (guide §2.2: coalesce the 32-partition
  * shuffles that move 0.1–0.3 MB per batch, SCALE_r18 §2). The wrapper
  * re-enables AQE for the body and restores the previous value before
  * returning, so the micro-batch ENGINE (which plans the next batch
  * only after the body returns — `foreachBatch` is synchronous) never
  * observes it enabled. Re-entrant and a no-op when AQE is already on
  * (direct calls from the main session, nested family bodies under
  * [[CurationIngest]]), so concurrent inner legs never race the toggle:
  * only the outermost wrapper flips the conf, strictly before/after the
  * legs run. Results are unaffected by construction — every operator in
  * the engine is partition-count independent (the determinism
  * contract); AQE only changes physical partitioning.
  *
  * [[par]]: run INDEPENDENT per-batch legs concurrently (guide §2.6 —
  * actions are only sequential because driver code calls them
  * sequentially; overlapping independent jobs back-fills the tail of
  * each leg's tiny stages). Await ALL legs before returning — a batch
  * must not commit while one of its legs is still writing — then
  * rethrow the first failure so a failed leg still fails the batch
  * (at-least-once replay re-runs the whole body, the families' replay
  * contract). Callers may only pass legs with DISJOINT outputs and no
  * read-after-write ordering between them. */
private[graft] object BatchExec {

  private val AqeKey = "spark.sql.adaptive.enabled"

  def aqeOn[A](spark: SparkSession)(f: => A): A =
    if (spark.conf.get(AqeKey, "true") == "true") f
    else {
      spark.conf.set(AqeKey, "true")
      try f
      finally spark.conf.set(AqeKey, "false")
    }

  def par(thunks: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fs = thunks.map(t => Future(t()))
    val done = fs.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    done.foreach {
      case scala.util.Failure(e) => throw e
      case _ => ()
    }
  }
}
