package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The clustered write must produce files owning DISJOINT key ranges —
  * the property zone-map pruning needs — and must not change the data. */
class LayoutSpec extends SparkSpec {

  test("clusteredWrite yields per-file disjoint key ranges and loses no rows") {
    val sf = "/root/testdata/sf0.001"
    val out = tmpDir("layout_events")
    val ev = graft.queries.events(spark, sf) // ns-parquet → µs timestamps
    Layout.clusteredWrite(ev, out, numFiles = 8, col("ts"))

    val back = spark.read.parquet(out)
    assert(back.count() == ev.count(), "clustered write changed the row count")

    // each physical file must own a key slice no other file overlaps —
    // otherwise a ts-range predicate cannot skip files by min/max stats
    val ranges = back
      .select(input_file_name().as("f"), col("ts"))
      .groupBy("f").agg(min("ts").as("lo"), max("ts").as("hi"))
      .orderBy("lo")
      .collect()
      .map(r => (r.getTimestamp(1).getTime, r.getTimestamp(2).getTime))
    assert(ranges.length > 1, "expected multiple files to check disjointness")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: hi=$hi1 > next lo=$lo2")
      case _ =>
    }

    // and the pruning actually pays: a narrow ts band must touch fewer
    // files than the total (the reader-visible effect of the layout)
    val (gLo, gHi) = (ranges.head._1, ranges.last._2)
    val cut = new java.sql.Timestamp(gLo + (gHi - gLo) / 16)
    val touched = back.filter(col("ts") <= cut)
      .select(input_file_name()).distinct().count()
    assert(touched < ranges.length,
      s"narrow band touched all ${ranges.length} files — no skipping possible")
  }
}
