package graft

import graft.search.Highlighter
import org.scalatest.funsuite.AnyFunSuite

class PassageSpec extends AnyFunSuite {
  import SparkTestEnv._

  private def run(texts: Seq[String], terms: Set[String], window: Int) = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    Highlighter.passages(df, "id", "text", terms, window)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getString(3)))).toMap
  }

  test("docs with no match (or empty) are dropped; matches marked") {
    val out = run(Seq("alpha beta gamma", "", "delta spark echo"), Set("spark"), 4)
    assert(out.keySet == Set(2L))
    val (pid, score, snip) = out(2L)
    assert(pid == 0L && score > 0)
    assert(snip == "delta <b>spark</b> echo")
  }

  test("later passage with more hits outranks the early-position boost") {
    // slab 0 has one hit, slab 1 has two: tf(2) × weight ≫ position norm gap
    val text = "spark a b c " + "spark spark d e"
    val out = run(Seq(text), Set("spark"), 4)
    assert(out(0L)._1 == 1L)
    assert(out(0L)._3 == "<b>spark</b> <b>spark</b> d e")
  }

  test("equal-score tie keeps the earliest passage") {
    // identical slabs → identical Σ tf×weight, but norm(start) strictly
    // decreases, so the first slab wins; assert via symmetric content
    val text = "spark a b c spark a b c"
    val out = run(Seq(text), Set("spark"), 4)
    assert(out(0L)._1 == 0L)
  }

  test("distinct terms sum; in-doc freq damps the weight of a common term") {
    // 'x' occurs 5× in the doc (low weight), 'y' once (high weight): the
    // y-slab must outrank an x-slab with the same in-passage freq
    val text = "x a x a x a x a x a " + "y b c d"
    val out = run(Seq(text), Set("x", "y"), 4)
    assert(out(0L)._1 == 2L) // slab 2 = "x a y b": one rare y beats two common x
    assert(out(0L)._3 == "<b>x</b> a <b>y</b> b")
  }
}
