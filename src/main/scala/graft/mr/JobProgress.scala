package graft.mr

import org.apache.spark.scheduler.{
  SparkListener, SparkListenerJobStart, SparkListenerStageCompleted,
  SparkListenerStageSubmitted, SparkListenerTaskEnd
}

import java.util.concurrent.atomic.AtomicReference

/** The reference's `stage_t` enum: UNDEFINED / MAP / SHUFFLE / REDUCE
  * (`MapReduceFramework.h`, SURVEY.md §2.1 R9). */
sealed abstract class Stage(val name: String)
object Stage {
  case object Undefined extends Stage("UNDEFINED")
  case object Map extends Stage("MAP")
  case object Shuffle extends Stage("SHUFFLE")
  case object Reduce extends Stage("REDUCE")
}

/** The reference's `JobState { stage_t stage; float percentage }`. */
final case class JobState(stage: Stage, percentage: Float)

/** `getJobState` support (SURVEY.md §3.2): the reference packs
  * {stage, done, total} into one `atomic<uint64_t>`; here a
  * `SparkListener` plays that role — shuffle-map stages report as MAP,
  * the boundary between them as SHUFFLE, result stages as REDUCE, and
  * percentage = finished tasks / total tasks of the active stage.
  *
  * Like the reference's atomic, `state` is safe to poll from any thread
  * while the job runs.
  */
final class JobProgress extends SparkListener {

  private final case class Snap(stage: Stage, done: Int, total: Int)
  private val snap = new AtomicReference(Snap(Stage.Undefined, 0, 0))
  // The result stage of the most recent job: its tasks are the REDUCE
  // phase; every earlier stage feeds a shuffle, i.e. is MAP-side.
  @volatile private var resultStageId: Int = -1

  def state: JobState = {
    val s = snap.get()
    val pct = if (s.total <= 0) 0f else 100f * s.done / s.total
    JobState(s.stage, pct)
  }

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    if (e.stageIds.nonEmpty) resultStageId = e.stageIds.max
  }

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
    val st =
      if (e.stageInfo.stageId == resultStageId) Stage.Reduce else Stage.Map
    snap.set(Snap(st, 0, e.stageInfo.numTasks))
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    snap.updateAndGet(s => s.copy(done = math.min(s.done + 1, s.total)))
    ()
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    // Between the map stage finishing and the reduce stage submitting,
    // the job is in the exchange — the reference's SHUFFLE phase.
    snap.updateAndGet { s =>
      if (s.stage == Stage.Map) Snap(Stage.Shuffle, 0, 0) else s
    }
    ()
  }
}
