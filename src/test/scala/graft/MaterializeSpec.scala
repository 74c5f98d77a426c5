package graft

import graft.operators.Dedup

/** The dedup/graph suite must produce identical results under every
  * [[Materialize]] strategy — `local` (localCheckpoint, the local-run
  * default), `reliable` (checkpoint dir, the cluster setting: survives
  * executor loss where localCheckpoint's block-storage lineage cannot),
  * and `persist` (DISK_ONLY, lineage kept). */
class MaterializeSpec extends SparkSpec {

  private def runSuite(): Map[String, Seq[String]] = {
    Dedup.clearMemos()
    Seq("q31_minhash_pairs", "q35_dup_clusters", "q35b_dedup_select")
      .map { q =>
        q -> Dedup.queries(q)(spark, sf).collect().map(_.toString).toSeq
      }.toMap
  }

  test("dedup suite is result-identical under all materialize strategies") {
    val conf = spark.conf
    val prev = conf.getOption("spark.graft.materialize")
    try {
      conf.set("spark.graft.materialize", "local")
      val base = runSuite()
      assert(base("q35_dup_clusters").nonEmpty)
      for (mode <- Seq("reliable", "persist")) {
        conf.set("spark.graft.materialize", mode)
        val got = runSuite()
        for ((q, rows) <- base)
          assert(got(q) === rows, s"$q differs under materialize=$mode")
      }
    } finally {
      prev match {
        case Some(v) => conf.set("spark.graft.materialize", v)
        case None => conf.unset("spark.graft.materialize")
      }
      Dedup.clearMemos()
    }
  }

  test("release frees local-checkpoint blocks (clearMemos does not leak storage)") {
    val s = spark
    import s.implicits._
    val conf = s.conf
    val prev = conf.getOption("spark.graft.materialize")
    try {
      conf.set("spark.graft.materialize", "local")
      val before = s.sparkContext.getPersistentRDDs.keySet
      val frame = Materialize((1 to 1000).toDF("x"))
      val added = s.sparkContext.getPersistentRDDs.keySet -- before
      assert(added.nonEmpty, "localCheckpoint registered no persistent RDD")
      Materialize.release(frame)
      // unpersist is non-blocking; the registry update is synchronous
      // on the driver, the block drop is not — poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      var gone = false
      while (!gone && System.nanoTime() < deadline) {
        gone = (s.sparkContext.getPersistentRDDs.keySet & added).isEmpty
        if (!gone) Thread.sleep(100)
      }
      assert(gone, "released local-checkpoint RDD still registered as " +
        "persistent — Materialize.release leaks block storage")
    } finally {
      prev match {
        case Some(v) => conf.set("spark.graft.materialize", v)
        case None => conf.unset("spark.graft.materialize")
      }
    }
  }

  test("q35b reuses memoized cluster labels (no second convergence loop)") {
    Dedup.clearMemos()
    Dedup.queries("q35_dup_clusters")(spark, sf).collect()
    // after q35, q35b must be a plain join+window over the memoized
    // labels — it must not trigger label-propagation jobs again.
    // Proxy check: the memoized frame is the same object q35b plans over.
    val first = Dedup.dupClusters(spark, sf)
    val second = Dedup.dupClusters(spark, sf)
    assert(first eq second)
  }
}
