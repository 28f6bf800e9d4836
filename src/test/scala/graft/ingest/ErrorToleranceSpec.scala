package graft.ingest

import java.nio.charset.Charset
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.core.Schemas

/** R11 semantics (SURVEY.md §2.1): the reference logs-and-continues on
  * per-file errors (`app.py:134-139`) and yields nothing for missing
  * objects (`app.py:105-109`). Spark equivalents: PERMISSIVE CSV mode and
  * ignoreMissingFiles — bad input degrades, never kills the pipeline. */
class ErrorToleranceSpec extends SparkSpec {

  private val header = "Ano;Trimestre;Categoria;Tipo;CNPJ IF\n"

  test("ragged rows survive in PERMISSIVE mode (short rows null-fill)") {
    val dir = tmpDir("ragged_csv")
    Files.write(Paths.get(dir, "r.csv"),
      (header + "2022;1º;C;B;123\n2023;2º\n;;;;\n")
        .getBytes(Charset.forName("ISO-8859-1")))
    val canon = Pipeline.canonicalBatch(spark, dir)
    val rows = canon.collect()
    assert(rows.length == 3, "no row may be dropped")
    val byAno = rows.map(r => Option(r.getAs[String]("ano"))).toSet
    assert(byAno == Set(Some("2022"), Some("2023"), None))
    val short = canon.filter(canon("ano") === "2023").collect().head
    assert(short.getAs[String]("categoria") == null, "short row must null-fill")
  }

  test("empty directory yields an empty canonical frame, not an error") {
    val dir = tmpDir("empty_csv")
    // header-only file: zero data rows but a resolvable schema
    Files.write(Paths.get(dir, "h.csv"),
      header.getBytes(Charset.forName("ISO-8859-1")))
    val canon = Pipeline.canonicalBatch(spark, dir)
    assert(canon.columns.toSeq == Schemas.reclamacoesColumns)
    assert(canon.count() == 0)
  }

  test("non-CSV files under the prefix are ignored by the glob") {
    val dir = tmpDir("mixed_files")
    Files.write(Paths.get(dir, "good.csv"),
      (header + "2022;1º;C;B;1\n").getBytes(Charset.forName("ISO-8859-1")))
    Files.write(Paths.get(dir, "junk.txt"), "not;a;csv\n".getBytes)
    Files.write(Paths.get(dir, "data.json"), "{}".getBytes)
    assert(Pipeline.canonicalBatch(spark, dir).count() == 1)
  }

  test("GraftSession registers the engine functions") {
    // shares the JVM-wide session config but must expose the functions
    val s = graft.core.GraftSession.getOrCreate(master = "local[2]")
    assert(s.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d))")
      .collect().head.getDouble(0) == 1.0)
    assert(s.catalog.functionExists("avro_encode") ||
      s.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("avro_encode")))
  }
}
