package graft.mr

import org.apache.spark.scheduler.{
  GraftSchedulerAccess, SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerStageSubmitted,
  SparkListenerTaskEnd
}

import java.util.concurrent.ConcurrentHashMap
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
  * `SparkListener` plays that role.
  *
  * Scoping: the listener bus is SparkContext-wide, so events from every
  * concurrent job arrive here. We only count jobs whose job group equals
  * `groupId` (set by [[MapReduce.startJob]] on the launching thread), and
  * only stages belonging to those jobs — two concurrent `startJob`s (or
  * any other query on the session) no longer corrupt each other's state.
  *
  * Classification: a stage that writes shuffle output
  * (`stageInfo.shuffleDepId.isDefined`) is MAP-side; a result stage is
  * REDUCE. This stays correct under AQE, which splits one logical job
  * into several physical jobs (a shuffle-materialization job's single
  * stage is a shuffle-map stage, so it reports as MAP — the
  * max-stage-id-per-job heuristic used to misreport it as REDUCE).
  *
  * Like the reference's atomic, `state` is safe to poll from any thread
  * while the job runs.
  */
final class JobProgress(groupId: String) extends SparkListener {

  private final case class Snap(stage: Stage, done: Int, total: Int)
  private val snap = new AtomicReference(Snap(Stage.Undefined, 0, 0))
  // Stage ids belonging to jobs launched under our job group.
  private val ourStages = ConcurrentHashMap.newKeySet[Int]()

  def state: JobState = {
    val s = snap.get()
    val pct = if (s.total <= 0) 0f else 100f * s.done / s.total
    JobState(s.stage, pct)
  }

  /** Force the terminal state. Called by `waitForJob` once the action's
    * result is in hand — listener-bus delivery is asynchronous, so
    * without this a caller polling right after completion could still
    * observe a mid-run snapshot. */
  private[mr] def finish(): Unit = snap.set(Snap(Stage.Reduce, 1, 1))

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    val g = Option(e.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
    if (g.contains(groupId)) e.stageIds.foreach(ourStages.add)
  }

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
    if (ourStages.contains(e.stageInfo.stageId)) {
      val st =
        if (GraftSchedulerAccess.isShuffleMapStage(e.stageInfo)) Stage.Map
        else Stage.Reduce
      snap.set(Snap(st, 0, e.stageInfo.numTasks))
    }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    // Only successful attempts count — a failed/killed attempt also
    // fires TaskEnd and its retry would otherwise be double-counted,
    // overstating the reference's finished/total percentage.
    if (ourStages.contains(e.stageId) && e.reason == org.apache.spark.Success) {
      snap.updateAndGet(s => s.copy(done = math.min(s.done + 1, s.total)))
      ()
    }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
    if (ourStages.contains(e.stageInfo.stageId) &&
        GraftSchedulerAccess.isShuffleMapStage(e.stageInfo)) {
      // Between a map stage finishing and the next stage submitting, the
      // job is in the exchange — the reference's SHUFFLE phase.
      snap.updateAndGet { s =>
        if (s.stage == Stage.Map) Snap(Stage.Shuffle, 0, 0) else s
      }
      ()
    }
}
