package graft.ingest

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pipeline observability without extra passes: Spark's Observation API
  * attaches named aggregates to the canonical frame, collected as a
  * side effect of the SAME action that ships the data — at 100 TB a
  * second counting pass over the corpus is a second corpus scan, so
  * quality metrics must ride along, not re-scan. */
class ObservationSpec extends SparkSpec {

  test("canonicalization metrics ride the shipping action (no second scan)") {
    val dir = tmpDir("obs_csv")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.csv"),
      ("Ano;Trimestre;Categoria;Tipo;CNPJ IF;Instituição financeira;Índice;" +
        "Quantidade de reclamações reguladas procedentes;Quantidade de reclamações reguladas - outras;" +
        "Quantidade de reclamações não reguladas;Quantidade total de reclamações;" +
        "Quantidade total de clientes – CCS e SCR;Quantidade de clientes – CCS;Quantidade de clientes – SCR\n" +
        "2022;1º;C;B;1;BANCO A;2;3;4;5;6;7;8;9\n" +
        "2022;2º;C;B;;BANCO B;3;4;5;6;7;8;9;10\n")
        .getBytes(java.nio.charset.Charset.forName("ISO-8859-1")))
    val obs = Observation("canon_metrics")
    val canon = Pipeline.canonicalBatch(spark, dir)
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(col("cnpj_if").isNull.cast("long")).as("null_cnpj"),
        // DISTINCT aggregates are disallowed in observed metrics (they'd
        // break the single-pass guarantee) — the HLL sketch is the
        // observable cardinality, exact at this tiny cardinality
        approx_count_distinct(col("trimestre")).as("quarters"))
    val shipped = canon.collect() // ONE action: data + metrics together
    assert(shipped.length == 2)
    val m = obs.get
    assert(m("rows") == 2L)
    assert(m("null_cnpj") == 1L) // empty→null normalization observed in-flight
    assert(m("quarters") == 2L)
  }
}
