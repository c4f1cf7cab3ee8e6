package graft

/** Throwaway probe: is javax.sound serializing parallel WAV decode? */
object AudioLockProbe {
  def main(args: Array[String]): Unit = {
    val n = 5000
    val payloads = (0 until n).map(i =>
      graft.multimodal.MediaSynth.wavMotifFixture(i.toLong)).toArray
    def once(threads: Int): Double = {
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val tasks = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = t
            while (i < n) {
              graft.multimodal.AudioDedup.energyDeltaFp64(payloads(i))
              i += threads
            }
          }
        })
      }
      tasks.foreach(_.get())
      pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    once(1) // warm
    println(f"decode 1 thread:  ${once(1)}%.2f s")
    println(f"decode 16 threads: ${once(16)}%.2f s")
    // synth side
    def synthOnce(threads: Int): Double = {
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val tasks = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = t
            while (i < n) {
              graft.multimodal.MediaSynth.wavMotifFixture(i.toLong)
              i += threads
            }
          }
        })
      }
      tasks.foreach(_.get())
      pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"synth 1 thread:  ${synthOnce(1)}%.2f s")
    println(f"synth 16 threads: ${synthOnce(16)}%.2f s")
  }
}
