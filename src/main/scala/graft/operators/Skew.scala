package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot join keys.
  *
  * AQE's skew-join handles most runtime skew (GraftSession pins it on),
  * but AQE only splits SORT-MERGE partitions; a pathologically hot key
  * joined against a non-broadcastable build side still needs salting:
  * the probe side scatters each hot key across `buckets` salted
  * sub-keys, the build side replicates its rows once per salt value, and
  * the join key becomes (key, salt) — the hot key's work now spreads
  * over `buckets` tasks instead of one straggler.
  *
  * Salting is deterministic here (salt derived from a caller-named
  * column, not rand()) so results are reproducible and oracle-able;
  * at 100 TB prefer a high-cardinality natural column (row id, line
  * number) as the salt source.
  */
object Skew {

  /** Equi-join `probe` (large, skewed) with `build` (large, not
    * broadcastable) on `probe(probeKey) === build(buildKey)`, salted
    * into `buckets` sub-keys. Output = inner join output. */
  def saltedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, saltSource: Column,
      buckets: Int = 8): DataFrame = {
    val salted = probe.withColumn("__salt", pmod(saltSource, lit(buckets)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated,
      salted(probeKey) === replicated(buildKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
