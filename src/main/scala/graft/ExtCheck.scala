package graft

import org.apache.spark.sql.SparkSession

/** End-to-end SparkSessionExtensions check, in its own JVM: the
  * in-suite test can only exercise [[graft.functions.GraftExtensions]]
  * against a bare `SparkSessionExtensions` instance because
  * `getOrCreate` reuses the shared test session. This main builds a
  * FRESH session with `spark.sql.extensions=graft.functions
  * .GraftExtensions` — the way a user of this library installs it —
  * and asserts (a) every injected `graft_*` function resolves from
  * SQL, and (b) the FoldSelfCosine optimizer rule fires inside the
  * session's own optimizer (self-cosine of a provably non-null input
  * folds to a literal in the optimized plan). Exit code is the
  * verdict. Run: `sbt "runMain graft.ExtCheck"`. */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-check")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // (a) injected functions resolve and compute from plain SQL
      val row = spark.sql(
        """SELECT
          |  graft_cosine(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |               array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c,
          |  graft_l2sq(array(CAST(0.0 AS DOUBLE), CAST(3.0 AS DOUBLE)),
          |             array(CAST(4.0 AS DOUBLE), CAST(3.0 AS DOUBLE))) AS d,
          |  graft_simhash16(array('a', 'b')) IS NOT NULL AS sh,
          |  graft_minhash16(array('a', 'b')) IS NOT NULL AS mh
          |""".stripMargin).head()
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-12, s"cosine: $row")
      assert(math.abs(row.getDouble(1) - 16.0) < 1e-12, s"l2sq: $row")
      assert(row.getBoolean(2) && row.getBoolean(3), s"sketches: $row")
      // (b) the injected optimizer rule folds self-cosine of a
      // non-nullable input to a literal IN THIS SESSION'S optimizer
      val plan = spark.sql(
        """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                    array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c
          |""".stripMargin).queryExecution.optimizedPlan.toString
      assert(!plan.contains("graft_cosine"),
        s"FoldSelfCosine did not fire in the extension-built session:\n$plan")
      println("ExtCheck OK: functions resolve, FoldSelfCosine fires end-to-end")
    } finally spark.stop()
  }
}
