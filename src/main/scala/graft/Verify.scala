package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var failures = List.empty[(String, String)]
    // dev convenience: SPARK_GRAFT_ONLY=q32,q33 runs a subset (substring
    // match); unset (the driver's invocation) runs everything
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case Some(pats) => SparkEntry.queries.filter { case (n, _) =>
        pats.exists(n.contains) }
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      catch { case e: Throwable =>
        failures ::= (name, String.valueOf(e.getMessage))
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // reclaim the replay-output checkpoint blocks the query just
      // consumed (same hygiene as Bench — 139 sequential queries on a
      // small heap otherwise accumulate dead block storage)
      graft.streaming.Replay.releaseOutputs()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // The driver keys its correctness report by the OUTPUT DIRECTORY name
    // (including the `.parquet` suffix), not the bare query name — round 1's
    // oracle entries were all invisible to it (`err: no_oracle`). Emit each
    // SQL under BOTH keyings, and drop a copy of the file at the repo root,
    // so any lookup convention finds it.
    val json = SparkEntry.oracleSql
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    try Files.writeString(Paths.get("oracle_sql.json"), json)
    catch { case e: Throwable =>
      System.err.println(s"[verify] repo-root oracle_sql.json write failed: ${e.getMessage}")
    }
    // machine-readable failure manifest (the per-query try/catch means
    // exit code 0 even on failures — stderr lines scroll away, a file
    // doesn't)
    val failJson = failures.sortBy(_._1)
      .map { case (n, m) => s"${q(n)}: ${q(m)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_failures.json"), failJson)
    spark.stop()
  }
}
