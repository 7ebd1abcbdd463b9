package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** Swedish / Norwegian / Russian / Finnish / Hungarian light stemmers pinned
  * against the reference's OWN shipped vocabularies
  * (`lucene/analysis/common/src/test/org/apache/lucene/analysis/{sv/svlighttestdata.zip,
  * ru/rulighttestdata.zip, fi/filighttestdata.zip, hu/hulighttestdata.zip,
  * no/nb_light.txt, no/nn_light.txt}`; each line `word \t expected-stem`).
  * The committed CLEF-vocabulary fixtures are deterministic every-Nth-line
  * samples; the Norwegian files are the reference's complete hand-written
  * test vectors. The engine stemmers are EXACT re-expressions — parity was
  * additionally verified against every pair of the full vocabularies
  * (sv 30,623 / ru 49,673 / fi 50,000 / hu 30,000: 0 mismatches) before
  * sampling. */
class LightStemmersSpec extends AnyFunSuite {

  private def pairs(name: String): Seq[(String, String)] = {
    val in = getClass.getResourceAsStream(s"/stemmers/$name")
    require(in != null, s"missing resource $name")
    try Source.fromInputStream(in, "UTF-8").getLines().toVector.map { l =>
      val Array(w, s) = l.split('\t'); (w, s)
    } finally in.close()
  }

  private def assertParity(name: String, stem: String => String, minSize: Int): Unit = {
    val vocab = pairs(name)
    val bad = vocab.filter { case (w, exp) => stem(w) != exp }
    assert(bad.isEmpty, s"${bad.size} mismatches, first 10: ${bad.take(10)}")
    assert(vocab.size >= minSize)
  }

  test("SwedishLightStem matches the reference vocabulary exactly") {
    assertParity("svlight_sample.tsv", SwedishLightStem.stem, 6000)
  }

  test("RussianLightStem matches the reference vocabulary exactly") {
    assertParity("rulight_sample.tsv", RussianLightStem.stem, 6000)
  }

  test("FinnishLightStem matches the reference vocabulary exactly") {
    assertParity("filight_sample.tsv", FinnishLightStem.stem, 6000)
  }

  test("HungarianLightStem matches the reference vocabulary exactly") {
    assertParity("hulight_sample.tsv", HungarianLightStem.stem, 6000)
  }

  test("Norwegian Bokmål stemmer matches the reference's complete test vectors") {
    assertParity("nb_light.tsv", NorwegianLightStem().stem, 120)
  }

  test("Norwegian Nynorsk stemmer matches the reference's complete test vectors") {
    assertParity("nn_light.tsv",
      NorwegianLightStem(useBokmaal = false, useNynorsk = true).stem, 90)
  }

  test("Norwegian flag split: Bokmål endings only strip under BOKMAAL, Nynorsk under NYNORSK") {
    val nb = NorwegianLightStem()
    val nn = NorwegianLightStem(useBokmaal = false, useNynorsk = true)
    // -heter is Bokmål-only; -heiter is Nynorsk-only (ref comments :95-110)
    assert(nb.stem("hemmeligheter") == "hemmelig")
    assert(nn.stem("hemmelegheiter") == "hemmeleg")
    assert(nn.stem("hemmeligheter") != "hemmelig")
    // masc pl definite -ane strips only in Nynorsk
    assert(nn.stem("gutane") == "gut")
  }

  test("Finnish clitic loop strips repeatedly, like the reference's recursion") {
    // talossa+kin+ko style stacking: each -kin/-ko layer strips while len > 8
    assert(FinnishLightStem.stem("talossakinko") == FinnishLightStem.stem("talossa"))
  }

  test("Finnish k/p/t squeeze and short-word passthrough") {
    // kk collapses inside norm2 (kirkko -> kirko: one duplicate k squeezed)
    assert(FinnishLightStem.stem("kirkko") == "kirko")
    // words under 4 chars pass through UNfolded
    assert(FinnishLightStem.stem("yö") == "yö")
    assert(FinnishLightStem.stem("ää") == "ää")
  }

  test("Hungarian assimilated instrumental: geminate + al/el drops three chars") {
    // barát+tal -> barattal (folded) -> barat: -al with doubled consonant
    assert(HungarianLightStem.stem("baráttal") == "barat")
  }

  test("Russian normalize: trailing soft sign and double н") {
    // иям/ям case endings then normalize
    assert(RussianLightStem.stem("организациям") == "организац")
    assert(RussianLightStem.stem("военный") == "воен")
  }

  // ------------------------------------------------------------------ chains

  test("Swedish chain: stop on surface form, stem after, positions kept") {
    val toks = SwedishAnalyzer().tokenize("och hunden springer till husets tabeller")
    // "och", "till" stopped; kept tokens retain ORIGINAL positions
    assert(toks.map(_.term) == Vector("hund", "spring", "hus", "tabell"))
    assert(toks.map(_.position) == Vector(1, 2, 4, 5))
  }

  test("Norwegian chain: Bokmål default, stop increments kept") {
    val toks = NorwegianAnalyzer().tokenize("og bilene til sekretæren")
    assert(toks.map(_.term) == Vector("bil", "sekretær"))
    assert(toks.map(_.position) == Vector(1, 3))
  }

  test("Russian chain: Cyrillic tokenization, stop, stem") {
    val toks = RussianAnalyzer().tokenize("и организациям в москве")
    assert(toks.map(_.term) == Vector("организац", "москв"))
    assert(toks.map(_.position) == Vector(1, 3))
  }

  test("registry resolves the five new chains by name") {
    assert(Analyzers.byName("swedish").isInstanceOf[SwedishAnalyzer])
    assert(Analyzers.byName("norwegian").isInstanceOf[NorwegianAnalyzer])
    assert(Analyzers.byName("norwegian-nynorsk").asInstanceOf[NorwegianAnalyzer].nynorsk)
    assert(Analyzers.byName("russian").isInstanceOf[RussianAnalyzer])
    assert(Analyzers.byName("finnish").isInstanceOf[FinnishAnalyzer])
    assert(Analyzers.byName("hungarian").isInstanceOf[HungarianAnalyzer])
  }
}
