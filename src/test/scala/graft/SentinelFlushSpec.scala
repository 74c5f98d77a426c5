package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Replay

/** Property test for [[Replay.sentinelAfterStage]] (the shared far-
  * future watermark-flush primitive behind q77/q51s/q102b): for an
  * ARBITRARY keyed append-mode stateful aggregation — random keys,
  * random event times, random watermark delay and window width — a
  * bounded replay with one sentinel row past
  * max(ts) + delay + window delivered in the final micro-batch drains
  * EVERY real window from the state store, i.e. streaming output ≡
  * the batch aggregation. Without the sentinel the final windows stay
  * open forever (exactly the failure the primitive exists to
  * prevent), which the last test demonstrates.
  */
class SentinelFlushSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def check(prop: Prop): Unit = {
    // streaming replays cost seconds each — 8 cases exercise the
    // space (keys × times × delay × width are all drawn fresh) while
    // keeping the suite's wall-time sane
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  private val base = 1700000000L

  private case class Cfg(rows: List[(Long, Long)], delaySec: Int,
      windowSec: Int)

  private val genCfg: Gen[Cfg] = for {
    n <- Gen.chooseNum(1, 40)
    keys <- Gen.listOfN(n, Gen.chooseNum(0L, 4L))
    // event times spread over ~2 hours, arbitrary order
    offs <- Gen.listOfN(n, Gen.chooseNum(0L, 7200L))
    delay <- Gen.chooseNum(10, 3600)
    window <- Gen.oneOf(60, 300, 900, 3600)
  } yield Cfg(keys.zip(offs), delay, window)

  private def frameOf(rows: List[(Long, Long)]) = {
    s.sparkContext.setLogLevel("WARN")
    s.createDataFrame(
      java.util.Arrays.asList(rows.map { case (k, off) =>
        Row(k, new java.sql.Timestamp((base + off) * 1000L))
      }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType))))
  }

  private def run(cfg: Cfg, sentinel: Boolean): Set[(Long, Long, Long)] = {
    val ev = frameOf(cfg.rows)
    val maxOff = cfg.rows.map(_._2).max
    // caller contract: strictly past max(ts) + delay + window
    val sentTs = new java.sql.Timestamp(
      (base + maxOff + cfg.delaySec + cfg.windowSec + 3600) * 1000L)
    val after: String => Unit =
      if (sentinel)
        Replay.sentinelAfterStage(s, Seq(Row(-1L, sentTs)), ev.schema)
      else _ => ()
    Replay.run(s, ev, files = 2, stateParts = Some(2),
        afterStage = after) { stream =>
      stream
        .withWatermark("ts", s"${cfg.delaySec} seconds")
        .groupBy(col("k"), window(col("ts"), s"${cfg.windowSec} seconds"))
        .agg(count(lit(1)).as("n"))
        .select(col("k"), unix_timestamp(col("window.start")).as("w"),
          col("n"))
    }
      .where(col("k") =!= -1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def batchOf(cfg: Cfg): Set[(Long, Long, Long)] =
    frameOf(cfg.rows)
      .groupBy(col("k"), window(col("ts"), s"${cfg.windowSec} seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("k"), unix_timestamp(col("window.start")).as("w"),
        col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("arbitrary keyed append-mode window agg drains completely " +
      "under the sentinel (property)") {
    check(Prop.forAll(genCfg) { cfg =>
      run(cfg, sentinel = true) == batchOf(cfg)
    })
  }

  test("without the sentinel the final windows stay in state " +
      "(the failure mode the primitive exists for)") {
    // one deterministic shape: all rows in one window — nothing can
    // close it, so the streaming output must be empty
    val cfg = Cfg(List((1L, 10L), (2L, 20L), (1L, 30L)),
      delaySec = 600, windowSec = 3600)
    assert(run(cfg, sentinel = false).isEmpty)
    assert(batchOf(cfg).nonEmpty)
  }
}
