package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Write-side layout for scan-side data skipping.
  *
  * Parquet readers prune row groups with column min/max statistics
  * (zone maps), but the stats only help if the write clustered the data:
  * a randomly-laid-out 100 TB table has every row group spanning the
  * whole key range, so a point or range predicate still reads the whole
  * table. `clusteredWrite` fixes the layout once, at write time:
  *
  *  1. `repartitionByRange(key)` — rows are range-partitioned, so each
  *     output FILE owns a disjoint slice of the key space (one shuffle,
  *     paid once per write);
  *  2. `sortWithinPartitions(key)` — rows inside each file are sorted,
  *     so each ROW GROUP inside a file owns a disjoint sub-slice.
  *
  * After this, a predicate on the cluster key prunes at both
  * granularities: Spark's scan drops whole files/row-groups whose
  * min/max excludes the predicate. The same layout is what makes the
  * sort-merge-friendly reads and range joins cheap downstream. This is
  * the portable, format-level equivalent of the clustering/Z-order
  * features lakehouse table formats expose — expressed purely with
  * Spark primitives.
  */
object Layout {

  /** Range-cluster `df` by `keys` into `numFiles` parquet files at
    * `path`. Each file covers a disjoint key range (LayoutSpec asserts
    * this); rows are sorted by `keys` within each file for row-group
    * pruning. */
  def clusteredWrite(df: DataFrame, path: String, numFiles: Int,
      keys: Column*): Unit = {
    require(numFiles > 0, s"numFiles ($numFiles) must be positive")
    df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(path)
  }
}
