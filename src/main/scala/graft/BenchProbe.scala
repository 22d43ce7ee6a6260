package graft

/** Sub-metric timing probe for the bench record: operators whose check
  * query bundles a ONE-TIME cost (index build, classifier training)
  * with the per-ingest cost the row's name claims to price wrap the
  * one-time phase in [[time]], and Bench splits the row into
  * {build_s, ingest_s} in BENCH_FULL.json — production amortizes the
  * former, so the marginal operator cost stays the adjudicable
  * headline as the suite grows. Nanosecond accumulation in a concurrent
  * map; always on (two map ops per probe site — noise-level against
  * the seconds-scale phases it wraps). */
object BenchProbe {
  private val acc = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def time[T](key: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally acc.merge(key, Long.box(System.nanoTime() - t0),
      (a, b) => Long.box(a + b))
  }

  /** Accumulated seconds per key since the last drain; clears. */
  def drain(): Map[String, Double] = {
    val out = scala.collection.mutable.Map.empty[String, Double]
    val it = acc.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(e.getKey) = e.getValue.toDouble / 1e9
    }
    acc.clear()
    out.toMap
  }
}
