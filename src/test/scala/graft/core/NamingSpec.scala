package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Byte-for-byte parity with the reference `sinitize_text`
  * (`functions.py:5-20`) + `.lower()` (`app.py:129`) on the real
  * dataset's header vocabulary (FIXTURES.md §B), plus ScalaCheck
  * properties (SURVEY.md §5.2 item 3). */
class NamingSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, res.status.toString)
  }

  val parity: Seq[(String, String)] = Seq(
    "Ano" -> "ano",
    "Trimestre" -> "trimestre",
    "Categoria" -> "categoria",
    "Tipo" -> "tipo",
    "CNPJ IF" -> "cnpj_if",
    "Instituição financeira" -> "instituicao_financeira",
    "Índice" -> "indice",
    "Quantidade de reclamações reguladas procedentes" ->
      "quantidade_de_reclamacoes_reguladas_procedentes",
    "Quantidade de reclamações reguladas - outras" ->
      "quantidade_de_reclamacoes_reguladas_outras",
    "Quantidade de reclamações não reguladas" ->
      "quantidade_de_reclamacoes_nao_reguladas",
    "Quantidade total de reclamações" -> "quantidade_total_de_reclamacoes",
    "Quantidade total de clientes – CCS e SCR" ->
      "quantidade_total_de_clientes_ccs_e_scr",
    "Quantidade de clientes – CCS" -> "quantidade_de_clientes_ccs",
    "Quantidade de clientes – SCR" -> "quantidade_de_clientes_scr",
    // rule pins from functions.py:
    "123 coluna" -> "col_123_coluna",      // digit-prefix, :17-18
    "  espaços   múltiplos  " -> "espacos_multiplos", // \s+ collapse, :14
    "a__b___c" -> "a_b_c",                 // _+ collapse, :15
    "__wrapped__" -> "wrapped",            // strip("_"), :16
    "l.linestatus" -> "llinestatus",       // punct deleted, not underscored
    "ção!!!" -> "cao")

  parity.foreach { case (raw, want) =>
    test(s"sanitize parity: '$raw' -> '$want'") {
      assert(Naming.sanitizeLower(raw) == want)
    }
  }

  // Latin-1-ish strings, the reference's input domain (ISO-8859-1 CSVs).
  private val latin1Gen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '_', '-', '.', ';', '\t'),
      3 -> Gen.oneOf("áéíóúâêôãõçÁÉÍÓÚÂÊÔÃÕÇºª–".toSeq))).map(_.mkString)

  test("property: sanitize is idempotent") {
    checkProp(Prop.forAll(latin1Gen) { s =>
      val once = Naming.sanitizeLower(s)
      Naming.sanitizeLower(once) == once
    })
  }

  test("property: output is [a-z0-9_]* and never starts with a digit") {
    checkProp(Prop.forAll(latin1Gen) { s =>
      val out = Naming.sanitizeLower(s)
      out.matches("[a-z0-9_]*") && (out.isEmpty || !out.charAt(0).isDigit)
    })
  }
}
