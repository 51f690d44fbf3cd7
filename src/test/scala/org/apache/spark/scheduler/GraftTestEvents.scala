package org.apache.spark.scheduler

import java.util.Properties

/** Test-only factory for synthetic scheduler events. `StageInfo`'s
  * constructor is `private[spark]` at the Scala level, so building the
  * events that drive [[graft.mr.JobProgress]] deterministically needs a
  * shim in this package — the same (and only) internals escape hatch as
  * `GraftSchedulerAccess`. */
object GraftTestEvents {

  def stageInfo(id: Int, numTasks: Int, shuffleDepId: Option[Int]): StageInfo =
    new StageInfo(id, 0, s"stage-$id", numTasks, Seq.empty, Seq.empty, "",
      null, Seq.empty, shuffleDepId, 0, false, 0)

  def jobStart(groupId: String, stages: Seq[StageInfo]): SparkListenerJobStart = {
    val props = new Properties()
    props.setProperty("spark.jobGroup.id", groupId)
    SparkListenerJobStart(1, 0L, stages, props)
  }

  def successfulTaskEnd(stageId: Int): SparkListenerTaskEnd =
    SparkListenerTaskEnd(stageId, 0, "ShuffleMapTask", org.apache.spark.Success,
      new TaskInfo(0L, 0, 0, 0, 0L, "exec", "host", TaskLocality.PROCESS_LOCAL,
        false),
      null, null)
}
