package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.expressions.UnsafeRow

/** Thin public facade over Spark's `private[sql]`
  * [[ExternalAppendOnlyUnsafeRowArray]] — the spillable row buffer
  * SortMergeJoinExec/WindowExec use for their buffered side — so
  * `graft.plans.RangeJoinExec` can buffer a key group's interval rows
  * with the SAME spill discipline instead of an on-heap ArrayBuffer.
  * Lives in this package only to cross the `private[sql]` boundary;
  * adds no behavior.
  *
  * Semantics inherited from the wrapped array:
  *  - `add` copies the row (in-memory mode) or serializes it into the
  *    task's UnsafeExternalSorter pages (spilled mode), so callers may
  *    pass a reused row object;
  *  - once `numRowsInMemoryBufferThreshold` is exceeded the buffer
  *    migrates to the sorter, which spills to disk under memory
  *    pressure or past `numRowsSpillThreshold`, charging the task's
  *    memory/disk-spill metrics;
  *  - `iterator` rows are REUSED objects when reading from spill
  *    files — callers that retain a row across `next()` must copy;
  *  - `clear` resets for the next group and invalidates live iterators.
  */
final class GraftSpillableRowArray(
    numRowsInMemoryBufferThreshold: Int,
    numRowsSpillThreshold: Int) {

  private val arr = new ExternalAppendOnlyUnsafeRowArray(
    numRowsInMemoryBufferThreshold, Long.MaxValue,
    numRowsSpillThreshold, Long.MaxValue)

  def add(row: UnsafeRow): Unit = arr.add(row)
  def iterator: Iterator[UnsafeRow] = arr.generateIterator()
  def isEmpty: Boolean = arr.isEmpty
  def length: Int = arr.length
  def clear(): Unit = arr.clear()

  /** Cumulative bytes spilled to disk by this buffer (monotone across
    * `clear`s — suitable for an SQLMetric). */
  def spillSize: Long = arr.spillSize
}
