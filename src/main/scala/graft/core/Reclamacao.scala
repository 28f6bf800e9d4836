package graft.core

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed domain record for the wire row (SURVEY.md §1.4): the 5
  * `["null","string"]` union fields of the .avsc
  * (`reclamacoes.avsc:23-29,42-57,66-81`) are `Option[String]`, the
  * other 9 are required strings — so the type system carries the wire
  * contract that the reference only documents. `DataFrame` remains the
  * operator currency; this is the type-safe view for user code and
  * tests (`Dataset[Reclamacao]` keeps the same columnar plan —
  * encoders are schema projections, not row conversions). */
final case class Reclamacao(
    ano: String,
    trimestre: String,
    categoria: String,
    tipo: String,
    cnpj_if: Option[String],
    instituicao_financeira: String,
    indice: String,
    quantidade_de_reclamacoes_reguladas_procedentes: String,
    quantidade_de_reclamacoes_reguladas_outras: Option[String],
    quantidade_de_reclamacoes_nao_reguladas: Option[String],
    quantidade_total_de_reclamacoes: String,
    quantidade_total_de_clientes_ccs_e_scr: String,
    quantidade_de_clientes_ccs: Option[String],
    quantidade_de_clientes_scr: Option[String])

object Reclamacao {
  /** Canonical 14-column frame → typed Dataset. The column order must
    * match [[Schemas.reclamacoesColumns]] (Canonicalize guarantees it). */
  def typed(canonical: DataFrame): Dataset[Reclamacao] = {
    val spark = canonical.sparkSession
    import spark.implicits._
    canonical.as[Reclamacao]
  }
}
