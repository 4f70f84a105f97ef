package graft.stream

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryProgress}

/** Progress-entry selection shared by benches (main scope) and the test
  * kit: streaming state metrics must be read from the last progress
  * entry that actually PROCESSED data — `lastProgress` can be a trailing
  * no-data micro-batch whose state metrics lag (or post-date) the batch
  * the caller means to observe, making direct `lastProgress` reads
  * timing-sensitive (ADVICE r11). One definition so the bench and the
  * test helper cannot drift. */
object Progress {

  /** The last progress entry with `numInputRows > 0`, falling back to
    * `lastProgress` when no data batch is retained. */
  def lastDataProgress(q: StreamingQuery): StreamingQueryProgress = {
    val withData = q.recentProgress.filter(_.numInputRows > 0)
    if (withData.nonEmpty) withData.last else q.lastProgress
  }

  /** Total state rows across operators, read per [[lastDataProgress]]. */
  def stateRowsAfterData(q: StreamingQuery): Long =
    lastDataProgress(q).stateOperators.map(_.numRowsTotal).sum
}
