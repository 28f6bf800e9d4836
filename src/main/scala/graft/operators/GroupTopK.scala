package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Map-side prefilter for per-group top-k: keep at most `k` rows per
  * group from EACH partition before the shuffle that computes the exact
  * per-group rank.
  *
  * A per-group top-k via window rank shuffles the whole table to rank
  * rows it then throws away; but any row in the global top-k of its
  * group is necessarily in the top-k of its own partition, so dropping
  * the rest map-side first is lossless. The shuffle then carries at most
  * k·partitions rows per group instead of the whole group — for a
  * per-language cap over a 100 TB corpus that is the difference between
  * shuffling the corpus and shuffling a candidate list ~1e6× smaller.
  * This is `TakeOrderedAndProject`'s partial-ordering trick, which Spark
  * applies only to GLOBAL limits, generalized to grouped limits.
  *
  * Implemented with `mapPartitions` (the sanctioned escape hatch for
  * genuine per-partition imperative logic): a bounded k-heap per group
  * per partition — memory O(k · groups-per-partition), one pass, no
  * sort of the full partition.
  */
object GroupTopK {

  /** Rows surviving the per-partition cut: at most `k` rows per group
    * per input partition, best under `sortCols` ((column, ascending)
    * lexicographic order; include a unique tiebreak column for
    * determinism, as any top-k should). Compose with the exact window
    * rank afterwards; the composition is row-identical to ranking the
    * raw input. */
  def prefilter(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, s"k ($k) must be positive")
    val schema = df.schema
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    val sIdx = sortCols.map { case (c, asc) => (schema.fieldIndex(c), asc) }.toArray
    df.mapPartitions { rows =>
      // negative = a sorts before b (a is better); nulls first to match
      // Spark's ASC NULLS FIRST / DESC NULLS LAST defaults
      def cmpRows(a: Row, b: Row): Int = {
        var i = 0
        var c = 0
        while (i < sIdx.length && c == 0) {
          val (idx, asc) = sIdx(i)
          val raw = (a.get(idx), b.get(idx)) match {
            case (null, null) => 0
            case (null, _) => -1
            case (_, null) => 1
            case (x, y) =>
              x.asInstanceOf[Comparable[Any]].compareTo(y.asInstanceOf[Any])
          }
          c = if (asc) raw else -raw
          i += 1
        }
        c
      }
      // worst row on top (PriorityQueue dequeues the max) → O(log k) evict
      val worstOnTop: Ordering[Row] = (a: Row, b: Row) => cmpRows(a, b)
      val heaps = mutable.Map.empty[Seq[Any], mutable.PriorityQueue[Row]]
      rows.foreach { r =>
        val key = gIdx.map(r.get).toSeq
        val h = heaps.getOrElseUpdate(key,
          mutable.PriorityQueue.empty[Row](worstOnTop))
        if (h.size < k) h.enqueue(r)
        else if (cmpRows(r, h.head) < 0) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(schema))
  }
}
