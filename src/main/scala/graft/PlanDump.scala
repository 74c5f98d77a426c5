package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev tool for the optimization rounds: dump `.explain("formatted")`
  * of selected registered queries to `plans/<round>/<query>_<tag>.txt`
  * so before/after plan evidence can be committed alongside the
  * measurements.
  *
  * Usage: sbt "runMain graft.PlanDump <tag> <q1,q2,...> [outDir] [sfDir]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse(sys.error("tag required (before|after)"))
    val names = args.lift(1).getOrElse(sys.error("query list required"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val outDir = args.lift(2).getOrElse("plans/r18")
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (n <- names) {
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      // lifecycle queries run their side effects while building the
      // returned frame; the dumped plan is the final assembly, the
      // same surface EXPLAINS.md pins
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${n}_$tag.txt"), txt)
      graft.streaming.Replay.releaseOutputs()
      println(s"[plandump] wrote $outDir/${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
