package graft

/** Runtime skew-guard observability. Each adaptive self-pair join
  * (minhash band pairs, chunk-grain near-dup) probes its key-level
  * max bucket once per invocation and picks the plain equi-join or
  * the salted triangle join; this registry records those probes so a
  * scale rehearsal can REPORT which guards activated and how close
  * the observed buckets sat to the threshold, instead of arguing it
  * from the code. Bounded: one entry per guard probe (a handful per
  * query). [[drain]] empties the registry — callers snapshot between
  * measurements. Recording is O(1) driver-side and carries no
  * executor cost; the probe count itself is the pre-existing
  * map-side-combined aggregate, not new work. */
object SkewStats {
  final case class Probe(site: String, maxBucket: Long, threshold: Int) {
    def salted: Boolean = maxBucket > threshold
  }

  private val probes =
    new java.util.concurrent.ConcurrentLinkedQueue[Probe]()

  def record(site: String, maxBucket: Long, threshold: Int): Unit =
    probes.add(Probe(site, maxBucket, threshold))

  /** Remove and return every probe recorded since the last drain. */
  def drain(): Seq[Probe] = {
    val out = Seq.newBuilder[Probe]
    var p = probes.poll()
    while (p != null) { out += p; p = probes.poll() }
    out.result()
  }
}
