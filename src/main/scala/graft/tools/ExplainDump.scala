package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence dumper: writes the FINALIZED (post-AQE)
  * `explain("formatted")` output of selected declared queries to
  * plans/<tag>/<query>_<suffix>.txt — the before/after plan artifacts the
  * optimization judge checks claims against (the judge cannot run Spark).
  *
  * The dump EXECUTES each query first (collect) so AQE finalizes: an
  * un-executed `explain` would show `isFinalPlan=false` placeholders and
  * none of the runtime join-strategy/coalesce decisions the claims are
  * about. Runs at bench-like settings (local[8], AQE defaults).
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <tag> <suffix> <q1> [q2 ...]
  * e.g.   runMain graft.tools.ExplainDump /root/testdata/sf0.01 r15 before q173_setsim_join */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ExplainDump <sfDir> <tag> <suffix> <query> [query ...]")
    val sfDir = args(0)
    val tag = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get(s"/root/repo/plans/$tag")
    Files.createDirectories(outDir)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE so the dump shows runtime decisions
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"),
        s"// $name @ $sfDir — explain(\"formatted\"), post-execution " +
          s"(AQE final)\n$formatted\n")
      graft.core.CacheScope.drain()
      println(s"[explain] wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
