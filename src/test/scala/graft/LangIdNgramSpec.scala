package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-14: char-trigram language ID. The oracle gate proves
  * Spark/DuckDB parity of the arithmetic; this pins the LINGUISTIC
  * behavior on genuine sentences — which the synthetic corpus (one
  * shared vocabulary across lang labels) cannot exercise. */
class LangIdNgramSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def predict(texts: Seq[String]): Map[Long, (String, Long)] =
    TextAnalysis.langIdNgram(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .select($"doc_id", $"pred_lang", $"score")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("genuine sentences classify to their language") {
    val out = predict(Seq(
      "The quick brown fox is jumping over the lazy dog and the cat",
      "Der schnelle braune Fuchs springt gerne und ich sehe ein Licht",
      "Les enfants mangent une pomme avec leur mère dans le jardin",
      "Que los perros de la casa grande miraron al gato dormido"))
    assert(out(0)._1 == "en", s"en sentence read as ${out(0)}")
    assert(out(1)._1 == "de", s"de sentence read as ${out(1)}")
    assert(out(2)._1 == "fr", s"fr sentence read as ${out(2)}")
    assert(out(3)._1 == "es", s"es sentence read as ${out(3)}")
    out.values.foreach { case (_, score) => assert(score > 0) }
  }

  test("case-insensitive: SHOUTED text classifies the same") {
    val out = predict(Seq(
      "THE CAT AND THE DOG ARE RUNNING IN THE GARDEN OF THE HOUSE"))
    assert(out(0)._1 == "en")
  }

  test("no profile hit and short/empty text fall back to 'und'") {
    val out = predict(Seq("", "xy", "zzz qqq vvv", "42 17 99"))
    out.values.foreach { case (pred, score) =>
      assert(pred == "und" && score == 0L, s"junk read as $pred/$score")
    }
  }

  test("morphology fires without standalone stopwords (the tokenizer-free win)") {
    // no whitespace-delimited profile stopword anywhere, but the
    // trigrams inside the words carry the language
    val out = predict(Seq("singing ringing bringing finished wanted"))
    assert(out(0)._1 == "en", s"got ${out(0)}")
    val de = predict(Seq("schneller schlechter gedichte nachricht"))
    assert(de(0)._1 == "de", s"got ${de(0)}")
  }
}
