package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Language

/** Breadth + gate semantics of the multi-language detector: en gate first,
  * then argmax over stopword (es/de/fr/pt/it/nl) and script (zh/ru/ja/ko/ar)
  * profiles with OtherLangs-order tie preference.
  */
class LanguageSpec extends AnyFunSuite with Matchers with TestSpark {

  private def detect(texts: (String, String)*): Map[String, String] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    texts.toSeq.toDF("expected", "text")
      .select(col("expected"), Language.language(col("text")).as("lang"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
      .map { case (k, v) => k -> v }
  }

  test("detects each breadth profile on representative text") {
    val got = detect(
      "en" -> "the food was great and the service is on point",
      "es" -> "la comida es muy buena y el servicio era excelente para todos",
      "de" -> "das essen war sehr gut und der service ist nicht schlecht",
      "fr" -> "le service est excellent et les plats du jour pour tous",
      "pt" -> "os pratos do dia para quem gosta mais como sempre mas bom",
      "it" -> "il cibo era ottimo e il servizio non sono della citta nel centro",
      "nl" -> "ik vond het een lekker gerecht en je wil niet naar huis met zijn allen",
      "zh" -> "这家餐厅的菜非常好吃",
      "ru" -> "очень вкусная еда и хороший сервис",
      "ja" -> "とてもおいしかったですねまたきたい",
      "ko" -> "음식이 정말 맛있어요 또 오고 싶어요",
      "ar" -> "الطعام لذيذ جدا والخدمة ممتازة")
    got.foreach { case (expected, detected) => detected shouldBe expected }
  }

  test("en gate wins over any other profile count") {
    // heavy Cyrillic content but one en stopword -> en (the reference's
    // binary supported-language gate must stay bit-identical)
    detect("en" ->
      ("the еда вкусная " +
        "очень хорошо"))
      .values.head shouldBe "en"
  }

  test("all-zero profiles -> unknown; ties prefer OtherLangs order") {
    val got = detect(
      "unknown" -> "zzz qqq xxx 12345",
      // 'de que' -> es counts 2 (de, que), fr counts 2 (de, que): tie -> es
      "es" -> "de que")
    got("unknown") shouldBe "unknown"
    got("es") shouldBe "es"
  }

  test("q_lang_id breadth tail 2: new stopword + script profiles detect " +
      "representative text and never fire on the seeded corpus langs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val samples = Seq(
      "ca" -> "els plats amb una qualitat com dels millors pero molt cars",
      "lt" -> "maistas yra geras bet aptarnavimas buvo tik del to gerai",
      "sw" -> "chakula ni kizuri sana na huduma yake katika mkahawa hii",
      "tl" -> "ang pagkain ay masarap at hindi ako magsisisi sa lugar na ito",
      "te" -> "ఆహారం చాలా బాగుంది",
      "ka" -> "საჭმელი ძალიან გემრიელია",
      "am" -> "ምግቡ በጣም ጣፋጭ ነው",
      "km" -> "អាហារឆ្ងាញ់ណាស់",
      // earlier profiles must still win their own text (append-only)
      "en" -> "the food was great and the service is on point",
      "zh" -> "这家餐厅的菜非常好吃")
    val out = graft.ops.TextAnalysis.langId(
      samples.zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }
        .toDF("doc_id", "lang", "text"))
      .select(col("lang"), col("lang_pred")).collect()
    out.foreach(r => r.getString(1) shouldBe r.getString(0))
  }

  test("oracle SQL language CASE stays in sync with OtherLangs") {
    // the generated DuckDB CASE must reference every profile column
    val sql = graft.oracle.Sql.cleanDocs
    ("en" +: Language.OtherLangs).foreach { l =>
      sql should include(s"${l}_matches")
    }
  }
}
