package org.apache.spark

/** Test-only bridge: `SparkContext.checkpointDir` is `private[spark]` and has
  * no public clear API, but specs that flip the shared session into
  * reliable-checkpoint mode must restore it so later suites keep using
  * localCheckpoint. Compiled into test sources only.
  */
object GraftTestBridge {
  def checkpointDir(sc: SparkContext): Option[String] = sc.checkpointDir
  def setCheckpointDir(sc: SparkContext, dir: Option[String]): Unit =
    sc.checkpointDir = dir
}
