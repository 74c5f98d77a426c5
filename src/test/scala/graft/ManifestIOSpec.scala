package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** ManifestIO.read must be SEMANTICALLY IDENTICAL to
  * `spark.read.option("basePath", dir).parquet(files: _*)` — same
  * schema (names, types, nullability, partition-column placement and
  * inferred types), same rows, same partition pruning — while
  * launching NO listing job (the whole point: the manifested serve
  * plans from supplied statuses, not a re-listing pass). */
class ManifestIOSpec extends SparkSpec {

  private def dataFiles(dir: String): Seq[String] =
    Fs.listDataFiles(dir, spark.sparkContext.hadoopConfiguration)
      .map(_.getPath.toString)

  private def assertSame(base: String, files: Seq[String],
      mergeSchema: Boolean = false): Unit = {
    val r0 = if (mergeSchema)
      spark.read.option("basePath", base).option("mergeSchema", "true")
        .parquet(files: _*)
    else spark.read.option("basePath", base).parquet(files: _*)
    val r1 = graft.plans.ManifestIO.read(spark, base, files, mergeSchema)
    assert(r1.schema === r0.schema,
      s"schema mismatch:\n  listing: ${r0.schema.treeString}\n  " +
        s"manifest: ${r1.schema.treeString}")
    val cols = r0.columns.sorted.map(col)
    val a = r0.select(cols: _*).collect().map(_.toString).sorted
    val b = r1.select(cols: _*).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("flat table: schema + rows identical, no listing job") {
    val dir = Fs.createStagingDir(spark, "graft-manifestio-flat")
    try {
      spark.range(100).select(col("id"),
          (col("id") * 2).as("v"), concat(lit("s"), col("id")).as("s"))
        .repartition(4).write.parquet(s"$dir/t")
      val files = dataFiles(s"$dir/t")
      assert(files.size >= 4)
      // count listing jobs fired while ManifestIO plans + executes
      val listJobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          val d = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          if (d.contains("Listing leaf files")) listJobs.incrementAndGet()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        val df = graft.plans.ManifestIO.read(spark, s"$dir/t", files)
        assert(df.count() === 100)
        Thread.sleep(500) // listener events are async
        assert(listJobs.get() === 0, "manifest-fed read must not list")
      } finally spark.sparkContext.removeSparkListener(l)
      assertSame(s"$dir/t", files)
      // subset read (an as-of selection)
      assertSame(s"$dir/t", files.take(2))
    } finally Fs.deleteRecursively(dir,
      spark.sparkContext.hadoopConfiguration)
  }

  test("hive-partitioned table: partition columns, types and pruning") {
    val dir = Fs.createStagingDir(spark, "graft-manifestio-part")
    try {
      spark.range(90).select(col("id"),
          pmod(col("id"), lit(3)).cast("int").as("band_id"),
          pmod(col("id"), lit(5)).cast("int").as("kbucket"))
        .write.partitionBy("band_id", "kbucket").parquet(s"$dir/t")
      val files = dataFiles(s"$dir/t")
      assertSame(s"$dir/t", files)
      // a manifested SUBSET keeps partition columns via basePath
      val sub = files.filter(_.contains("band_id=1"))
      assertSame(s"$dir/t", sub)
      // partition pruning still reaches the scan
      val df = graft.plans.ManifestIO.read(spark, s"$dir/t", files)
        .where(col("band_id") === 2 && col("kbucket") === 4)
      val scanned = df.select(input_file_name()).distinct()
        .collect().map(_.getString(0))
      assert(scanned.nonEmpty &&
        scanned.forall(f => f.contains("band_id=2") && f.contains("kbucket=4")),
        s"pruning failed: $scanned")
      assert(df.count() ===
        spark.read.parquet(s"$dir/t")
          .where(col("band_id") === 2 && col("kbucket") === 4).count())
    } finally Fs.deleteRecursively(dir,
      spark.sparkContext.hadoopConfiguration)
  }

  test("mergeSchema serve over a widened tree") {
    val dir = Fs.createStagingDir(spark, "graft-manifestio-merge")
    try {
      spark.range(10).select(col("id")).write.parquet(s"$dir/t")
      spark.range(10, 20).select(col("id"), lit("w").as("wide"))
        .write.mode("append").parquet(s"$dir/t")
      val files = dataFiles(s"$dir/t")
      assertSame(s"$dir/t", files, mergeSchema = true)
    } finally Fs.deleteRecursively(dir,
      spark.sparkContext.hadoopConfiguration)
  }
}
