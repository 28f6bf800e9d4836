package graft.core

import graft.SparkSpec
import graft.ingest.Pipeline

/** The typed view of the canonical frame (SURVEY §1.4): nullability is
  * carried in the type (Option for the 5 union fields), and the typed
  * conversion is a plan-level projection over the same pipeline. */
class ReclamacaoSpec extends SparkSpec {

  test("canonical frame maps onto Dataset[Reclamacao] with Option nullables") {
    val dir = tmpDir("typed_csv")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.csv"),
      ("Ano;Trimestre;Categoria;Tipo;CNPJ IF;Instituição financeira;Índice;" +
        "Quantidade de reclamações reguladas procedentes;Quantidade de reclamações reguladas - outras;" +
        "Quantidade de reclamações não reguladas;Quantidade total de reclamações;" +
        "Quantidade total de clientes – CCS e SCR;Quantidade de clientes – CCS;Quantidade de clientes – SCR\n" +
        "2022;1º;Cat;Banco;;BANCO T;2;3;;5;6;7;;9\n")
        .getBytes(java.nio.charset.Charset.forName("ISO-8859-1")))
    val typed = Reclamacao.typed(Pipeline.canonicalBatch(spark, dir)).collect()
    assert(typed.length == 1)
    val r = typed.head
    assert(r.ano == "2022")
    assert(r.trimestre == "1º")
    assert(r.cnpj_if.isEmpty)                     // empty → null → None
    assert(r.quantidade_de_reclamacoes_reguladas_outras.isEmpty)
    assert(r.quantidade_de_clientes_ccs.isEmpty)
    assert(r.quantidade_de_clientes_scr.contains("9"))
    assert(r.instituicao_financeira == "BANCO T")
  }
}
