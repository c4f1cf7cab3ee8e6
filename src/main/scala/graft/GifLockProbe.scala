package graft

/** Throwaway probe: does javax.imageio GIF encode/decode thread-scale? */
object GifLockProbe {
  def main(args: Array[String]): Unit = {
    val n = 2000
    val payloads = (0 until n).map(i =>
      graft.multimodal.MediaSynth.gifMotifFixture(i.toLong)).toArray
    def bench(label: String)(work: Int => Unit): Unit = {
      def once(threads: Int): Double = {
        val t0 = System.nanoTime()
        val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
        val tasks = (0 until threads).map { t =>
          pool.submit(new Runnable {
            def run(): Unit = {
              var i = t
              while (i < n) { work(i); i += threads }
            }
          })
        }
        tasks.foreach(_.get())
        pool.shutdown()
        (System.nanoTime() - t0) / 1e9
      }
      once(1) // warm
      println(f"$label 1 thread: ${once(1)}%.2f s   16 threads: ${once(16)}%.2f s")
    }
    bench("gif synth")(i => graft.multimodal.MediaSynth.gifMotifFixture(i.toLong))
    bench("gif sample")(i =>
      graft.multimodal.GifFrameSampler(2).sample(payloads(i)))
  }
}
