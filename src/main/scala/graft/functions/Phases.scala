package graft.functions

import scala.collection.concurrent.TrieMap

/** Wall-clock phase accounting for composite queries. A query like q55 is
  * three very different costs in one number — bucketed CTAS write I/O,
  * catalog reload, and the exchange-free propagation that is the actual
  * 100 TB claim — so [[graft.Bench]] drains these records per query and
  * reports the split alongside the headline seconds ("phases" in the JSON
  * line). Labels accumulate (a label recorded twice sums); [[drain]]
  * returns-and-clears so each timed query only sees its own phases.
  *
  * CONTRACT: the accumulator is JVM-global, not session-scoped — phase
  * attribution is only meaningful when one thread runs one query between
  * drains (the bench's single-threaded loop; the probes). Concurrent
  * sessions recording phases would interleave into whoever drains next;
  * that is out of contract, not detected. Within the contract, [[drain]]
  * is lossless: each label is atomically removed and its removed value
  * reported, so a record landing between snapshot and removal is either
  * reported now or left for the next drain — never dropped. */
object Phases {
  private val acc = TrieMap.empty[String, Double]

  def record(label: String, sec: Double): Unit =
    acc.updateWith(label) {
      case Some(prev) => Some(prev + sec)
      case None       => Some(sec)
    }

  /** Time `f`, record it under `label`, and print to stderr when
    * SPARK_GRAFT_TRAIN_PHASES is set (the dev-probe behavior). */
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    record(label, sec)
    if (sys.env.contains("SPARK_GRAFT_TRAIN_PHASES"))
      System.err.println(f"PHASE $label $sec%.2f s")
    r
  }

  /** Atomically remove-and-report every recorded phase (see CONTRACT). */
  def drain(): Map[String, Double] =
    acc.readOnlySnapshot().keys
      .flatMap(k => acc.remove(k).map(k -> _)).toMap
}
