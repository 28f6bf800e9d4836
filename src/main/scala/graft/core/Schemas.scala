package graft.core

import org.apache.spark.sql.types._

/** The reference's one table: the BCB "reclamações" record.
  *
  * Canonical column list mirrors the projection map
  * (`/root/reference/src/ex8_producer/settings.py:22-37`); wire nullability
  * mirrors the Avro schema
  * (`/root/reference/src/ex8_producer/schemas/reclamacoes.avsc:5-82`):
  * all-strings on the wire, exactly 5 nullable. The *typed* variant honors
  * the (never-enforced) `"int"` declarations in `settings.py:30-36`.
  */
object Schemas {

  /** Canonical column order = insertion order of `settings.SCHEMA`. */
  val reclamacoesColumns: Seq[String] = Seq(
    "ano", "trimestre", "categoria", "tipo", "cnpj_if",
    "instituicao_financeira", "indice",
    "quantidade_de_reclamacoes_reguladas_procedentes",
    "quantidade_de_reclamacoes_reguladas_outras",
    "quantidade_de_reclamacoes_nao_reguladas",
    "quantidade_total_de_reclamacoes",
    "quantidade_total_de_clientes_ccs_e_scr",
    "quantidade_de_clientes_ccs",
    "quantidade_de_clientes_scr")

  /** The 5 fields that are `["null","string"]` unions in the .avsc. */
  val nullableColumns: Set[String] = Set(
    "cnpj_if",
    "quantidade_de_reclamacoes_reguladas_outras",
    "quantidade_de_reclamacoes_nao_reguladas",
    "quantidade_de_clientes_ccs",
    "quantidade_de_clientes_scr")

  /** The 8 count fields `settings.py:30-36` *intended* as ints. */
  val intColumns: Set[String] = Set(
    "quantidade_de_reclamacoes_reguladas_procedentes",
    "quantidade_de_reclamacoes_reguladas_outras",
    "quantidade_de_reclamacoes_nao_reguladas",
    "quantidade_total_de_reclamacoes",
    "quantidade_total_de_clientes_ccs_e_scr",
    "quantidade_de_clientes_ccs",
    "quantidade_de_clientes_scr")

  /** Wire schema: what goes into Avro — all strings, 5 nullable. */
  val reclamacoesWire: StructType = StructType(reclamacoesColumns.map { c =>
    StructField(c, StringType, nullable = nullableColumns.contains(c))
  })

  /** Typed schema honoring settings.py's intended int fields (`ano` is
    * declared "int" at settings.py:23 too, but stays string here because
    * the wire contract and the quarterly "1º" data keep it textual; the 7
    * quantidade_* counts cast cleanly). */
  val reclamacoesTyped: StructType = StructType(reclamacoesColumns.map { c =>
    val dt = if (intColumns.contains(c)) IntegerType else StringType
    StructField(c, dt, nullable = true)
  })

  /** `reclamacoes.avsc` verbatim (record `reclamacoes`, namespace
    * `ex7_producer` — sic). Kept inline so the engine has no filesystem
    * dependency on the read-only reference tree. */
  val reclamacoesAvsc: String =
    """{"type":"record","name":"reclamacoes","namespace":"ex7_producer","fields":[
      |{"name":"ano","type":"string"},
      |{"name":"trimestre","type":"string"},
      |{"name":"categoria","type":"string"},
      |{"name":"tipo","type":"string"},
      |{"name":"cnpj_if","type":["null","string"],"default":null},
      |{"name":"instituicao_financeira","type":"string"},
      |{"name":"indice","type":"string"},
      |{"name":"quantidade_de_reclamacoes_reguladas_procedentes","type":"string"},
      |{"name":"quantidade_de_reclamacoes_reguladas_outras","type":["null","string"],"default":null},
      |{"name":"quantidade_de_reclamacoes_nao_reguladas","type":["null","string"],"default":null},
      |{"name":"quantidade_total_de_reclamacoes","type":"string"},
      |{"name":"quantidade_total_de_clientes_ccs_e_scr","type":"string"},
      |{"name":"quantidade_de_clientes_ccs","type":["null","string"],"default":null},
      |{"name":"quantidade_de_clientes_scr","type":["null","string"],"default":null}
      |]}""".stripMargin

  /** An EVOLVED reader schema for `reclamacoes` — the day-one schema
    * change a real Avro consumer hits (the one R6 contract facet q09's
    * same-schema round-trip can't see). Three standard evolutions
    * against the writer schema above, resolved by Avro's writer→reader
    * rules:
    *   - `indice` DROPPED (a required writer field — the reader skips
    *     its bytes);
    *   - `origem` ADDED as a null-union with default null (the
    *     add-an-optional-column shape — every old record reads null);
    *   - `fonte` ADDED as a required string with default "bcb" (the
    *     add-with-backfill-constant shape — every old record reads the
    *     default).
    * The 5 nullable unions of the writer schema are retained, so
    * null-union resolution is exercised alongside both default kinds. */
  val reclamacoesEvolvedAvsc: String =
    """{"type":"record","name":"reclamacoes","namespace":"ex7_producer","fields":[
      |{"name":"ano","type":"string"},
      |{"name":"trimestre","type":"string"},
      |{"name":"categoria","type":"string"},
      |{"name":"tipo","type":"string"},
      |{"name":"cnpj_if","type":["null","string"],"default":null},
      |{"name":"instituicao_financeira","type":"string"},
      |{"name":"quantidade_de_reclamacoes_reguladas_procedentes","type":"string"},
      |{"name":"quantidade_de_reclamacoes_reguladas_outras","type":["null","string"],"default":null},
      |{"name":"quantidade_de_reclamacoes_nao_reguladas","type":["null","string"],"default":null},
      |{"name":"quantidade_total_de_reclamacoes","type":"string"},
      |{"name":"quantidade_total_de_clientes_ccs_e_scr","type":"string"},
      |{"name":"quantidade_de_clientes_ccs","type":["null","string"],"default":null},
      |{"name":"quantidade_de_clientes_scr","type":["null","string"],"default":null},
      |{"name":"origem","type":["null","string"],"default":null},
      |{"name":"fonte","type":"string","default":"bcb"}
      |]}""".stripMargin
}
