package graft.io

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.util.concurrent.LinkedBlockingQueue

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StringType

/** External-process stage: shell a column through a line filter, one
  * process per partition — the engine's analog of the reference's
  * subprocess op stages (reference/dupliganger/remove_adapter.py:82-144
  * runs the whole adapter-trim stage through an external tool; here the
  * tool runs per partition, so the stage scales with the cluster instead
  * of a single host pipe).
  *
  * Contract: `cmd` must be a LINE-PRESERVING filter (one output line per
  * input line, e.g. `tr`, `sed -e s/…/…/`, a tokenizer): the stage zips
  * stdout lines back onto the partition's rows positionally and RAISES on
  * count mismatch. Input values must be non-null and newline-free
  * (checked — a null or embedded newline would silently break the 1:1
  * zip). Rows are queued while in flight, so memory per task is bounded
  * by the filter's internal buffering (a streaming filter holds O(1)
  * lines; a sorting filter would buffer the partition — don't use one).
  * The child's stderr is drained concurrently (a chatty filter would
  * otherwise fill the stderr pipe, stop reading stdin, and deadlock the
  * task); its tail is attached to the exit-code error.
  */
object ExternalProcess {

  /** df + `outCol`: the external filter's output line for each row's
    * `inCol` value. */
  def pipeLines(df: DataFrame, inCol: String, outCol: String,
                cmd: Seq[String]): DataFrame = {
    require(cmd.nonEmpty, "cmd must be non-empty")
    val schema = df.schema.add(outCol, StringType)
    val idx = df.schema.fieldIndex(inCol)
    val cmdList = cmd.toIndexedSeq
    df.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty[Row]
      else {
        val proc = new ProcessBuilder(cmdList: _*).start()
        // Bind the child's lifetime to the TASK, not the iterator: if the
        // output iterator is abandoned (downstream limit/take) or the task
        // fails elsewhere, the completion listener reaps the process —
        // otherwise children accumulate in a long-lived executor JVM.
        val ctx = TaskContext.get()
        if (ctx != null) ctx.addTaskCompletionListener[Unit] { _ =>
          if (proc.isAlive) proc.destroyForcibly()
          ()
        }
        val pending = new LinkedBlockingQueue[Row]()
        @volatile var writeError: Throwable = null
        val writer = new Thread(() => {
          // The writer consumes the upstream partition iterator off the
          // task thread; memory-managed upstream iterators look up the
          // TaskContext thread-local (NPE without it) — same propagation
          // Spark's PipedRDD does in its stdin thread.
          if (ctx != null)
            org.apache.spark.graftshim.GraftCoreShim.propagateTaskContext(ctx)
          val w = new BufferedWriter(
            new OutputStreamWriter(proc.getOutputStream, "UTF-8"))
          try {
            it.foreach { r =>
              require(!r.isNullAt(idx),
                s"pipeLines: NULL value in '$inCol' — the 1:1 line contract cannot hold (filter nulls first)")
              val v = r.getString(idx)
              require(!v.contains('\n'),
                s"pipeLines: value in '$inCol' contains a newline — the 1:1 line contract cannot hold")
              pending.put(r)
              w.write(v); w.newLine()
            }
            w.close()
          } catch { case t: Throwable => writeError = t; proc.destroy() }
        })
        writer.setDaemon(true)
        writer.start()
        // drain stderr so a chatty filter can't fill the pipe and deadlock;
        // keep the tail for diagnostics
        val errTail = new java.util.concurrent.atomic.AtomicReference[String]("")
        val errDrain = new Thread(() => {
          val er = new BufferedReader(
            new InputStreamReader(proc.getErrorStream, "UTF-8"))
          try {
            var l = er.readLine()
            while (l != null) { errTail.set(l); l = er.readLine() }
          } catch { case _: Throwable => () }
        })
        errDrain.setDaemon(true)
        errDrain.start()
        val rd = new BufferedReader(
          new InputStreamReader(proc.getInputStream, "UTF-8"))
        new Iterator[Row] {
          private var line: String = rd.readLine()
          override def hasNext: Boolean = {
            if (line == null) {
              writer.join()
              if (writeError != null) throw writeError
              if (!pending.isEmpty)
                throw new IllegalStateException(
                  s"external process '${cmdList.head}' emitted fewer lines than it was fed (${pending.size} rows unanswered) — not a line-preserving filter")
              val code = proc.waitFor()
              if (code != 0)
                throw new IllegalStateException(
                  s"external process '${cmdList.head}' exited with $code" +
                    (if (errTail.get.nonEmpty) s"; last stderr: ${errTail.get}" else ""))
            }
            line != null
          }
          override def next(): Row = {
            val row = pending.poll()
            if (row == null)
              throw new IllegalStateException(
                s"external process '${cmdList.head}' emitted more lines than it was fed — not a line-preserving filter")
            val out = Row.fromSeq(row.toSeq :+ line)
            line = rd.readLine()
            out
          }
        }
      }
    }(Encoders.row(schema))
  }
}
