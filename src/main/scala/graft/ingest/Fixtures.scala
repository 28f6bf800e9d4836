package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reference-faithful CSV fixtures (FIXTURES.md §B), generated once per
  * scale-factor dir under java.io.tmpdir and reused. The fixture mirrors
  * the reference's input contract — `;` delimiter, ISO-8859-1, messy
  * headers with spaces/case (sanitized away by R3), plus an extra column
  * that projection (R4) must silently drop — over real testdata volume
  * (the scale-factor dir's lineitem.parquet).
  */
object Fixtures {

  /** Messy header per lineitem column: sanitize+lower must invert this. */
  val messyLineitemHeaders: Map[String, String] = Map(
    "l_orderkey" -> "L OrderKey",
    "l_partkey" -> "l partkey",
    "l_suppkey" -> "L SUPPKEY",
    "l_linenumber" -> "l lineNumber",
    "l_quantity" -> "L Quantity",
    "l_extendedprice" -> "l extendedprice",
    "l_discount" -> "l discount!!",
    "l_tax" -> "l tax",
    "l_returnflag" -> "L ReturnFlag",
    "l_linestatus" -> "l  lineStatus",
    "l_shipdate" -> "l shipdate")

  /** Canonical (sanitized) lineitem column order for the CSV path. */
  val lineitemCanonicalCols: Seq[String] = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate")

  /** Write (once) a `;`/ISO-8859-1 CSV copy of `$sfDir/lineitem.parquet`
    * with messy headers + a droppable `Extra Col!` — returns its path. */
  def messyLineitemCsv(spark: SparkSession, sfDir: String): String =
    once(sfDir, "lineitem_csv") { out =>
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val messy = li.columns.map(c => col(c).as(messyLineitemHeaders.getOrElse(c, c)))
      li.select(messy.toIndexedSeq: _*)
        .withColumn("Extra.Col!", lit("drop-me"))
        .write.mode("overwrite")
        .option("sep", ";")
        .option("encoding", "ISO-8859-1")
        .option("header", "true")
        .csv(out)
    }

  /** Columns of the JSON-lines fixture (int/string only — lossless
    * through a text format on both engines). */
  val lineitemJsonCols: Seq[String] =
    Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")

  /** Write (once) a JSON-lines copy of the lossless lineitem columns —
    * returns its path. */
  def lineitemJson(spark: SparkSession, sfDir: String): String =
    once(sfDir, "lineitem_json") { out =>
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(lineitemJsonCols.map(col): _*)
        .write.mode("overwrite").json(out)
    }

  /** Write (once) an ORC copy of the lossless lineitem columns —
    * returns its path. */
  def lineitemOrc(spark: SparkSession, sfDir: String): String =
    once(sfDir, "lineitem_orc") { out =>
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(lineitemJsonCols.map(col): _*)
        .write.mode("overwrite").orc(out)
    }

  /** Generate-once guard shared by the fixture writers. */
  private def once(sfDir: String, name: String)(write: String => Unit): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_fixtures/$tag/$name"
    val done = Paths.get(out, "_SUCCESS")
    if (!Files.exists(done)) synchronized {
      if (!Files.exists(done)) write(out)
    }
    out
  }
}
