package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage timing probe (dev tool, not part of the contract).
  * Usage: runMain graft.Probe <sfDir> */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    // warmup
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    import org.apache.spark.sql.functions._
    if (args.lift(1).contains("q99")) {
      val docs0 = Tables.documents(spark, sfDir)
      time("docs scan")(docs0.count())
      val resident = docs0.where(pmod(col("doc_id"), lit(10)) =!= 0)
      val probe = docs0.where(pmod(col("doc_id"), lit(10)) === 0)
      val dir = Fs.createStagingDir(spark, "probe-q99")
      time("bandRows(probe) raw")(
        operators.Dedup.indexBandRows(probe).count())
      time("save(resident)") {
        graft.plans.MinHashIndex.save(spark, resident,
          s"$sfDir/documents.parquet", dir); 1L
      }
      val h = graft.plans.MinHashIndex.load(spark, dir)
      time("serve #1")(
        graft.plans.MinHashIndex.serve(spark, h, probe).count())
      time("serve #2")(
        graft.plans.MinHashIndex.serve(spark, h, probe).count())
      time("q99 registered")(
        operators.Dedup.queries("q99_lsh_index_dedup")(spark, sfDir).count())
      time("q99 registered again")(
        operators.Dedup.queries("q99_lsh_index_dedup")(spark, sfDir).count())
      // simulate the bench sweep loop: memo clear + blanket unpersist
      for (i <- 1 to 3) {
        operators.Dedup.clearMemos()
        operators.Similarity.clearMemos()
        operators.TextAnalysis.clearMemos()
        operators.Curation.clearMemos()
        for ((_, rdd) <- spark.sparkContext.getPersistentRDDs)
          rdd.unpersist(blocking = false)
        time(s"q99 sweep-sim $i unsorted write") {
          graft.plans.MinHashIndex.serve(spark, h, probe)
            .write.mode("overwrite").parquet(s"$dir/_out.parquet"); 1L
        }
        time(s"q99 sweep-sim $i sorted write") {
          operators.Dedup.queries("q99_lsh_index_dedup")(spark, sfDir)
            .write.mode("overwrite").parquet(s"$dir/_out.parquet"); 1L
        }
      }
      Fs.deleteRecursively(dir)
      spark.stop()
      return
    }
    val docs = Tables.documents(spark, sfDir)
    time("docs scan")(docs.count())
    time("withMinhash only")(operators.Dedup.withMinhash(docs).select("doc_id").count())
    time("minhashPairs (pre-sort)")(operators.Dedup.minhashPairs(spark, sfDir).count())
    time("q31 full (with sort)")(
      operators.Dedup.queries("q31_minhash_pairs")(spark, sfDir).count())
    time("q35 clusters")(
      operators.Dedup.queries("q35_dup_clusters")(spark, sfDir).count())

    // per-node metrics for the pair pipeline: where do rows and time go
    val df = operators.Dedup.minhashPairs(spark, sfDir)
    df.queryExecution.toRdd.count() // execute THIS plan so metrics fill
    def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, depth); return
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth); return
        case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
          walk(r.child, depth); return
        case _ =>
      }
      val m = p.metrics.collect {
        case (k, v) if v.value > 0 &&
          (k.contains("numOutputRows") || k.contains("Time") || k.contains("size")) =>
          s"$k=${v.value}"
      }.mkString(" ")
      println(s"[metrics] ${"  " * depth}${p.nodeName} $m")
      p.children.foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
