package org.apache.spark.graftshim

import org.apache.spark.TaskContext

/** Bridge for `protected[spark]` core APIs the engine needs (the sql-side
  * twin is [[org.apache.spark.sql.graftshim.GraftSqlShim]]).
  *
  * [[propagateTaskContext]]: Spark's TaskContext is a thread-local; helper
  * threads a task spawns (e.g. the external-process writer thread in
  * graft.io.ExternalProcess) must install the task's context before
  * touching upstream iterators — memory-managed iterators look it up and
  * NPE without it. This is exactly what Spark's own PipedRDD does in its
  * stdin thread (core/src/main/scala/org/apache/spark/rdd/PipedRDD.scala),
  * but the setter is protected[spark].
  */
object GraftCoreShim {
  def propagateTaskContext(ctx: TaskContext): Unit =
    TaskContext.setTaskContext(ctx)
}
