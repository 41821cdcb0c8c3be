package graft.tools

/** Host memory-bandwidth calibration, the second axis next to
  * ScalingBench.calibrate's SHA-256 ALU probe: each thread streams over its
  * own 256 MB long array (far outside cache), and we report aggregate GB/s
  * at each requested thread count. A replay batch is shuffle- and
  * scan-heavy — closer to this kernel than to cache-resident hashing — so
  * when SHA-256 scales ~4x from 8->32 threads but streamed reads scale
  * ~1.5-2x, an engine pairwise efficiency between those two bounds is the
  * host's memory system, not the plan, and multi-node scaling (each node
  * brings its OWN memory channels) is the 2->8 number, not this one.
  *
  * Usage: MemBandwidthProbe [threadCounts...]   (default: 8 32)
  */
object MemBandwidthProbe {

  /** Aggregate streamed-read bandwidth (bytes/sec) at `threads` threads. */
  def measure(threads: Int, millis: Long = 4000L): Double = {
    val words = (256L << 20).toInt / 8 // 256 MB of longs per thread
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bytes = new java.util.concurrent.atomic.AtomicLongArray(threads)
    val ready = new java.util.concurrent.CountDownLatch(threads)
    val go = new java.util.concurrent.CountDownLatch(1)
    val sink = new java.util.concurrent.atomic.AtomicLong() // defeat DCE
    val ts = (0 until threads).map { i =>
      val t = new Thread(() => {
        val a = new Array[Long](words)
        java.util.Arrays.fill(a, i.toLong) // touch every page
        ready.countDown(); go.await()
        var acc = 0L; var passes = 0L
        while (!stop.get()) {
          var j = 0
          while (j < words) { acc += a(j); j += 1 }
          passes += 1
        }
        bytes.set(i, passes * words * 8L)
        sink.addAndGet(acc)
      })
      t.setDaemon(true); t.start(); t
    }
    ready.await()
    val t0 = System.nanoTime()
    go.countDown()
    Thread.sleep(millis)
    stop.set(true)
    ts.foreach(_.join())
    val secs = (System.nanoTime() - t0) / 1e9
    (0 until threads).map(bytes.get).sum / secs
  }

  def main(args: Array[String]): Unit = {
    val counts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 32)
    // Fail fast instead of GC-thrashing: the arrays alone need
    // threads * 256 MB; an undersized -Xmx turns the probe into a
    // minutes-long allocation stall that measures nothing.
    val neededBytes = (counts.max.toLong << 28) + (1L << 30)
    val maxHeap = Runtime.getRuntime.maxMemory()
    require(maxHeap >= neededBytes,
      f"heap too small for ${counts.max} threads x 256MB: need >=${neededBytes >> 30}g, " +
        f"have -Xmx${maxHeap >> 30}g - rerun with a larger -Xmx")
    // warmup (JIT the loop at the smallest count)
    measure(counts.min, 1500L)
    val res = counts.map(c => c -> measure(c))
    val pairs = res.map { case (c, b) => f""""threads_$c":${b / 1e9}%.2f""" }
    val ratio =
      if (res.size >= 2) f""","speedup_${res.head._1}_to_${res.last._1}":${res.last._2 / res.head._2}%.3f"""
      else ""
    println(s"""{"metric":"mem_bandwidth_gbps",${pairs.mkString(",")}$ratio}""")
  }
}
