package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Guards the bench harness's knowledge of which queries use keyed
  * replay staging: [[Bench.replayStagers]] must list exactly the
  * query prefixes that pass a `stageKey = Some(s"qNN:...")` to
  * [[graft.streaming.Replay.run]] or call `Replay.stageOnce(s,
  * s"qNN:...")` directly. A replay query added without updating the
  * set would silently lose its untimed pre-stage pass and re-absorb
  * the one-time staging write into sweep 1's timing — the exact skew
  * the pass exists to remove. */
class BenchConfigSpec extends AnyFunSuite {

  test("Bench.replayStagers matches the stageKey call sites in source") {
    val root = Paths.get("src", "main", "scala")
    assert(Files.isDirectory(root), s"source root $root not found")
    val scalaFiles: List[Path] = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toList
    // a keyed staging site is the string literal s"<prefix>:..."
    // appearing as the key argument of stageKey=Some(...) or
    // stageOnce(session, ...): match the literal within a short
    // window after either marker (DOTALL — call sites wrap lines)
    val pat = """(?s)stage(?:Key\s*=\s*Some\(|Once\([^"]{0,80}?)s"([A-Za-z0-9]+):""".r
    val found = scalaFiles.flatMap { p =>
      val text = Files.readString(p)
      pat.findAllMatchIn(text).map(_.group(1))
    }.toSet
    assert(found.nonEmpty, "no stageKey call sites found — pattern rot?")
    assert(found === Bench.replayStagers,
      s"Bench.replayStagers=${Bench.replayStagers.toSeq.sorted} but source " +
        s"call sites use ${found.toSeq.sorted} — update Bench.replayStagers")
  }

  test("Bench.gramStagers matches the benchGramsRel consumers in Curation") {
    // same coupling idea as replayStagers: a query that consumes the
    // memoized benchmark-gram relation must be listed so its
    // materialization is pre-staged untimed (r11: the unstaged rebuild
    // doubled q84's median on an unchanged stream plan)
    val text = Files.readString(Paths.get(
      "src", "main", "scala", "graft", "operators", "Curation.scala"))
    val entry = """"(q[0-9]+[a-z]*)_[a-z0-9_]*"\s*->""".r
    val ms = entry.findAllMatchIn(text).toList
    assert(ms.nonEmpty, "no query entries found in Curation — pattern rot?")
    val consumers = ms.zipWithIndex.flatMap { case (m, i) =>
      val end = if (i + 1 < ms.size) ms(i + 1).start else text.length
      if (text.substring(m.end, end).contains("benchGramsRel(")) Some(m.group(1))
      else None
    }.toSet
    assert(consumers.nonEmpty, "no benchGramsRel consumers found — pattern rot?")
    assert(consumers === Bench.gramStagers,
      s"Bench.gramStagers=${Bench.gramStagers.toSeq.sorted} but Curation " +
        s"queries using benchGramsRel are ${consumers.toSeq.sorted}")
    val bench = Files.readString(
      Paths.get("src", "main", "scala", "graft", "Bench.scala"))
    assert(bench.contains("Curation.stageGrams("),
      "Bench's stage block never calls Curation.stageGrams")
  }

  test("Bench.cloneStagers matches the takeClone consumers in Dedup") {
    // a lifecycle query that mutates a per-invocation index clone
    // (Dedup.takeClone) must be listed so the bench pre-stages its
    // clone untimed — an unlisted consumer silently re-absorbs the
    // ~4-5 s byte copy into its timed median (the r12 accounting bug)
    val text = Files.readString(Paths.get(
      "src", "main", "scala", "graft", "operators", "Dedup.scala"))
    val entry = """"(q[0-9]+[a-z]*)_[a-z0-9_]*"\s*->""".r
    val ms = entry.findAllMatchIn(text).toList
    assert(ms.nonEmpty, "no query entries found in Dedup — pattern rot?")
    // an entry's body ends at the NEXT entry or at its Map literal's
    // closing paren, whichever comes first — the regex matches both
    // the queries and the oracle maps, and the last entry of each map
    // would otherwise swallow the helper DEFINITIONS that follow
    // (ingestLoop, takeClone, ...) and self-attribute their names
    def bodyEnd(from: Int, nextStart: Int): Int = {
      val close = text.indexOf("\n  )\n", from)
      if (close == -1) nextStart else math.min(close, nextStart)
    }
    def consumersOf(markers: String*): Set[String] =
      ms.zipWithIndex.flatMap { case (m, i) =>
        val next = if (i + 1 < ms.size) ms(i + 1).start else text.length
        val body = text.substring(m.end, bodyEnd(m.end, next))
        if (markers.exists(body.contains)) Some(m.group(1)) else None
      }.toSet
    // direct takeClone call or via the shared ingestLoop helper
    // (which takeClones internally)
    val consumers = consumersOf("takeClone(", "ingestLoop(")
    assert(consumers.nonEmpty, "no takeClone consumers found — pattern rot?")
    assert(consumers === Bench.cloneStagers,
      s"Bench.cloneStagers=${Bench.cloneStagers.toSeq.sorted} but Dedup " +
        s"queries consuming clones are ${consumers.toSeq.sorted}")
    // the committed-v1 snapshot clones (q109) have their own pool
    val snapConsumers = consumersOf("takeSnapClone(")
    assert(snapConsumers === Bench.snapStagers,
      s"Bench.snapStagers=${Bench.snapStagers.toSeq.sorted} but Dedup " +
        s"queries consuming snap clones are ${snapConsumers.toSeq.sorted}")
    // the persisted resident-label state table (q110 family): direct
    // stageResidentState call or the residentLabelsServed reader
    val stateConsumers =
      consumersOf("residentLabelsServed(", "stageResidentState(")
    assert(stateConsumers === Bench.stateStagers,
      s"Bench.stateStagers=${Bench.stateStagers.toSeq.sorted} but Dedup " +
        s"queries consuming the label state are ${stateConsumers.toSeq.sorted}")
    val bench = Files.readString(
      Paths.get("src", "main", "scala", "graft", "Bench.scala"))
    assert(bench.contains("Dedup.stageIngestClones("),
      "Bench's stage block never calls Dedup.stageIngestClones")
    assert(bench.contains("Dedup.stageSnapClones("),
      "Bench's stage block never calls Dedup.stageSnapClones")
    assert(bench.contains("Dedup.stageResidentState("),
      "Bench's stage block never calls Dedup.stageResidentState")
  }

  test("Bench.vocabStagers matches the stageVocabStats consumers in TextAnalysis") {
    // q116's persisted vocabulary-stats table is derived once per
    // session (files, like the label state table); a consumer missing
    // from vocabStagers pays the one-time resident-corpus aggregate
    // inside whichever sweep times it first (the r13 advice item)
    val text = Files.readString(Paths.get(
      "src", "main", "scala", "graft", "operators", "TextAnalysis.scala"))
    val entry = """"(q[0-9]+[a-z]*)_[a-z0-9_]*"\s*->""".r
    val ms = entry.findAllMatchIn(text).toList
    assert(ms.nonEmpty, "no query entries found in TextAnalysis — pattern rot?")
    def bodyEnd(from: Int, nextStart: Int): Int = {
      val close = text.indexOf("\n  )\n", from)
      if (close == -1) nextStart else math.min(close, nextStart)
    }
    val consumers = ms.zipWithIndex.flatMap { case (m, i) =>
      val next = if (i + 1 < ms.size) ms(i + 1).start else text.length
      val body = text.substring(m.end, bodyEnd(m.end, next))
      if (body.contains("stageVocabStats(")) Some(m.group(1)) else None
    }.toSet
    assert(consumers.nonEmpty, "no stageVocabStats consumers found — pattern rot?")
    assert(consumers === Bench.vocabStagers,
      s"Bench.vocabStagers=${Bench.vocabStagers.toSeq.sorted} but TextAnalysis " +
        s"queries consuming vocab stats are ${consumers.toSeq.sorted}")
    val bench = Files.readString(
      Paths.get("src", "main", "scala", "graft", "Bench.scala"))
    assert(bench.contains("TextAnalysis.stageVocabStats("),
      "Bench's stage block never calls TextAnalysis.stageVocabStats")
  }

  test("Bench.bm25SnapStagers/ivfSnapStagers match the snap-clone consumers") {
    // the committed-v1 snapshot clones of the BM25 and IVF families
    // (q129/q130) follow the same accounting as Dedup's snapStagers: a
    // consumer missing from its set re-absorbs the index build + v1
    // commit into its timed median
    def consumersIn(file: String, marker: String): Set[String] = {
      val text = Files.readString(Paths.get(
        "src", "main", "scala", "graft", "operators", file))
      val entry = """"(q[0-9]+[a-z]*)_[a-z0-9_]*"\s*->""".r
      val ms = entry.findAllMatchIn(text).toList
      def bodyEnd(from: Int, nextStart: Int): Int = {
        val close = text.indexOf("\n  )\n", from)
        if (close == -1) nextStart else math.min(close, nextStart)
      }
      ms.zipWithIndex.flatMap { case (m, i) =>
        val next = if (i + 1 < ms.size) ms(i + 1).start else text.length
        val body = text.substring(m.end, bodyEnd(m.end, next))
        if (body.contains(marker)) Some(m.group(1)) else None
      }.toSet
    }
    val bm25 = consumersIn("TextAnalysis.scala", "takeBm25SnapClone(")
    assert(bm25.nonEmpty, "no takeBm25SnapClone consumers — pattern rot?")
    assert(bm25 === Bench.bm25SnapStagers,
      s"Bench.bm25SnapStagers=${Bench.bm25SnapStagers.toSeq.sorted} but " +
        s"TextAnalysis consumers are ${bm25.toSeq.sorted}")
    val ivf = consumersIn("Similarity.scala", "takeIvfSnapClone(")
    assert(ivf.nonEmpty, "no takeIvfSnapClone consumers — pattern rot?")
    assert(ivf === Bench.ivfSnapStagers,
      s"Bench.ivfSnapStagers=${Bench.ivfSnapStagers.toSeq.sorted} but " +
        s"Similarity consumers are ${ivf.toSeq.sorted}")
    val pq = consumersIn("Similarity.scala", "takePqSnapClone(")
    assert(pq.nonEmpty, "no takePqSnapClone consumers — pattern rot?")
    assert(pq === Bench.pqSnapStagers,
      s"Bench.pqSnapStagers=${Bench.pqSnapStagers.toSeq.sorted} but " +
        s"Similarity consumers are ${pq.toSeq.sorted}")
    val bench = Files.readString(
      Paths.get("src", "main", "scala", "graft", "Bench.scala"))
    assert(bench.contains("TextAnalysis.stageBm25SnapClones("),
      "Bench's stage block never calls TextAnalysis.stageBm25SnapClones")
    assert(bench.contains("Similarity.stageIvfSnapClones("),
      "Bench's stage block never calls Similarity.stageIvfSnapClones")
    assert(bench.contains("Similarity.stagePqSnapClones("),
      "Bench's stage block never calls Similarity.stagePqSnapClones")
  }

  test("partialSelection: heaviest-first admission under the remaining " +
      "budget, returned in name order") {
    val samples = Seq("q_a" -> 100.0, "q_b" -> 50.0, "q_c" -> 10.0,
      "q_d" -> 1.0, "q_e" -> 0.1)
    // generous budget: everything fits (est = 0.6 × sample, 30 s margin)
    assert(Bench.partialSelection(samples, 130.0).toSet ==
      samples.map(_._1).toSet)
    // tight budget: the HEAVIEST query is admitted first and exhausts
    // it — the cold-inflated heavy family is exactly what needs its
    // second sample
    assert(Bench.partialSelection(samples, 90.0) == Seq("q_a"))
    // too tight for the heavies: the cheap tail still back-fills
    assert(Bench.partialSelection(samples, 31.0) == Seq("q_d", "q_e"))
    // name order on return (memo-payment order within the sweep must
    // match a full sweep's relative order), whatever admission did
    assert(Bench.partialSelection(
      Seq("q_z" -> 5.0, "q_a" -> 50.0, "q_m" -> 20.0), 1000.0) ==
      Seq("q_a", "q_m", "q_z"))
  }

  test("cleanSamples: ambient-polluted sweeps are excluded from the median; " +
      "jitter and all-clean runs are untouched") {
    def medianOf(ts: List[Double]): Double = {
      val cl = Bench.cleanSamples(ts).map(ts).sorted
      if (cl.size % 2 == 1) cl(cl.size / 2)
      else (cl(cl.size / 2 - 1) + cl(cl.size / 2)) / 2
    }
    // the r14 official record's q84/q84b details — two of four sweeps
    // polluted, median-of-4 landed on the polluted side (8.50/9.72 s);
    // the clean median must sit within 1.5x of the best sample (the
    // verdict's done-criterion, by construction of the threshold)
    val q84 = List(4.27, 12.72, 3.29, 15.58)
    assert(Bench.cleanSamples(q84) == List(0, 2), Bench.cleanSamples(q84))
    assert(medianOf(q84) <= 1.5 * q84.min, s"q84 clean median ${medianOf(q84)}")
    val q84b = List(13.14, 4.78, 6.30, 14.16)
    assert(Bench.cleanSamples(q84b) == List(1, 2))
    assert(medianOf(q84b) <= 1.5 * q84b.min)
    // an all-clean run keeps every sample (the filter must not bias
    // ordinary variance)
    assert(Bench.cleanSamples(List(3.0, 3.3, 2.9)) == List(0, 1, 2))
    // sub-second jitter is NOT pollution: the absolute floor keeps a
    // 0.2 s query's 0.9 s sample (4.5x) in the median and out of the
    // rerun trigger
    assert(Bench.cleanSamples(List(0.2, 0.9)) == List(0, 1))
    // fewer than 2 clean samples is the rerun trigger's condition —
    // [3.3, 12.7, 15.6] keeps only the best and needs another sweep
    assert(Bench.cleanSamples(List(3.3, 12.7, 15.6)) == List(0))
    // the best sample is always chosen, whatever the spread
    assert(Bench.cleanSamples(List(100.0, 1.0, 100.0)) == List(1))
  }

  test("Bench flushes the cumulative record per sweep and budget-gates " +
      "both later sweeps and the guard rerun") {
    // r16's one failed gate: BENCH.json was written ONCE at the end, so
    // the driver's rc=124 kill left parsed:null — the harness must
    // flush after every sweep and never START work it cannot finish
    // inside SPARK_GRAFT_TIME_BUDGET_S. Assert the structure in source
    // (the same grep-coupling style as the stager tests): the flush
    // call sits INSIDE runSweep, and both the sweep loop and the guard
    // loop consult elapsed + lastSweepWall against the budget.
    val bench = Files.readString(
      Paths.get("src", "main", "scala", "graft", "Bench.scala"))
    assert(bench.contains("SPARK_GRAFT_TIME_BUDGET_S"),
      "Bench has no wall-clock budget env knob")
    val sweepBody = bench.substring(bench.indexOf("def runSweep("))
    val sweepEnd = sweepBody.indexOf("\n    }")
    assert(sweepBody.substring(0, sweepEnd + 6).contains("writeRecord()"),
      "runSweep does not flush the cumulative record — a driver kill " +
        "mid-run would leave no parseable BENCH.json (the r16 failure)")
    val gates = "elapsedS \\+ lastSweepWall <= budgetS".r
      .findAllIn(bench).size
    assert(gates >= 2,
      s"expected the budget gate on BOTH the sweep loop and the guard " +
        s"rerun, found $gates consults")
    assert(bench.contains("budgetSkipped"),
      "a budget skip must be recorded in the artifact, not silent")
  }

  test("noop sink is an honest materialization: the presentation sort " +
      "survives into the executed plan") {
    // Bench times fn(...).write.format("noop") — valid only if the
    // noop write still executes the full plan (a dropped final Sort
    // would under-time every ORDER BY query). Capture the executed
    // plan via a QueryExecutionListener and assert the Sort is there.
    val s = SparkSpec.spark
    @volatile var plan: String = null
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        if (qe.executedPlan.toString.contains("Noop"))
          plan = qe.executedPlan.toString
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    try {
      import org.apache.spark.sql.functions._
      s.range(0, 1000).select(col("id"), (col("id") % 7).as("k"))
        .orderBy(col("k"), col("id"))
        .write.mode("overwrite").format("noop").save()
      // the listener fires asynchronously — poll briefly
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (plan == null && System.nanoTime() < deadline) Thread.sleep(50)
      assert(plan != null, "no executed plan captured for the noop write")
      assert(plan.contains("Sort"),
        s"the noop write dropped the presentation sort:\n$plan")
    } finally s.listenerManager.unregister(listener)
  }

  test("Bench sweep loop clears every module that defines clearMemos") {
    // The sweep loop's blanket unpersist of ALL persistent RDDs is
    // only safe because every cross-query memo was released by a
    // clearMemos call just before it — a module that adds a memo
    // registry without being wired into the sweep loop would have its
    // LIVE localCheckpoint blocks freed mid-sweep and fail its next
    // use. Couple the two by construction: any `def clearMemos` in
    // main source must be invoked as `<Module>.clearMemos()` in
    // Bench.scala.
    val root = Paths.get("src", "main", "scala")
    val definers = Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .filter(p => Files.readString(p).contains("def clearMemos"))
      .map(_.getFileName.toString.stripSuffix(".scala"))
      .toSet
    assert(definers.nonEmpty, "no clearMemos definers found — pattern rot?")
    val bench = Files.readString(
      Paths.get("src", "main", "scala", "graft", "Bench.scala"))
    val uncleared = definers.filterNot(m => bench.contains(s"$m.clearMemos()"))
    assert(uncleared.isEmpty,
      s"modules define clearMemos but Bench's sweep loop never calls them: " +
        s"${uncleared.toSeq.sorted} — wire them in before the blanket unpersist")
  }
}
