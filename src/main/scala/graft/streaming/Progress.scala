package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Progress / heartbeat events (SURVEY.md §2.6 #31/#32).
  *
  * The reference computes dataset progress with a parallelism-1 global
  * window over four instrumented streams and per-operator mutable
  * counters (`J/DatasetProgressWindowFunction.java:35-73`). In Spark
  * the engine-maintained `StreamingQueryProgress` already carries
  * cumulative input counts, so progress is a DRIVER-SIDE listener —
  * zero impact on the dataflow, no extra shuffle, no
  * non-checkpointed operator state.
  *
  * `expectedRows` plays the role of the reference's pre-scan row
  * estimate (`GridFSCsvSource.getStats`); when the stream is a bounded
  * replay (Trigger.AvailableNow), `isLast` fires on query termination
  * like the reference's EOF-sentinel + idle-timeout protocol.
  */
final class ProgressListener(expectedRows: Long,
    onProgress: ProgressListener.Heartbeat => Unit = _ => (),
    queryName: Option[String] = None)
  extends StreamingQueryListener {

  import ProgressListener._

  private val events = new ConcurrentLinkedQueue[Heartbeat]()
  private val runIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.util.UUID]()
  @volatile private var seen = 0L

  def heartbeats: Seq[Heartbeat] = events.asScala.toSeq

  /** Input rows attributed to the tracked query so far (all queries
    * when no name filter is set). */
  def inputRows: Long = seen

  private def emit(h: Heartbeat): Unit = { events.add(h); onProgress(h) }

  /** Listener callbacks fire for EVERY query on the session; when
    * `queryName` is set, only the matching query's runs are tracked —
    * otherwise a concurrent stream (e.g. the q27s replay) would
    * inflate `seen` and fire isLast early. With no name set, all
    * queries count (single-stream sessions). */
  private def tracks(name: String, runId: java.util.UUID): Boolean =
    queryName match {
      case Some(n) =>
        if (n == name) { runIds.add(runId); true }
        else runIds.contains(runId)
      case None => true
    }

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    if (tracks(e.name, e.runId)) emit(Heartbeat(0.0, isLast = false))

  override def onQueryProgress(e: QueryProgressEvent): Unit =
    if (tracks(e.progress.name, e.progress.runId)) {
      seen += e.progress.numInputRows
      val p =
        if (expectedRows <= 0) 0.0
        else math.min(1.0, seen.toDouble / expectedRows.toDouble)
      emit(Heartbeat(p, isLast = false))
    }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    // terminated events carry no name — match on the runIds recorded
    // from started/progress events when filtering
    if (queryName.isEmpty || runIds.contains(e.runId)) {
      val p = if (expectedRows <= 0) 1.0
        else math.min(1.0, seen.toDouble / expectedRows.toDouble)
      emit(Heartbeat(p, isLast = true))
    }
}

object ProgressListener {
  /** One heartbeat: fraction complete + terminal flag (the payload of
    * the reference's `JobHeartbeatEvent`, transport-agnostic — the
    * Kafka producer of #11 is an I/O adapter around `onProgress`). */
  final case class Heartbeat(progress: Double, isLast: Boolean)
}
