package graft

import graft.search.Fusion
import org.scalatest.funsuite.AnyFunSuite

/** [[Fusion.rrf]] vs the reference's own `TestTopDocsRRF` vectors
  * (`lucene/core/src/test/org/apache/lucene/search/TestTopDocsRRF.java:22-50`)
  * plus a randomized model check and the batch ≡ per-query equivalence. */
class FusionSpec extends AnyFunSuite {
  import SparkTestEnv._
  import spark.implicits._

  private def frame(rows: Seq[(Long, Double)]) =
    rows.toDF("docId", "score")

  test("reference testBasics vector: ranks, summed scores, doc-id tiebreak") {
    // td1 = [doc42@10, doc10@5, doc20@3], td2 = [doc10@10, doc20@5], k = 20
    val td1 = frame(Seq(42L -> 10.0, 10L -> 5.0, 20L -> 3.0))
    val td2 = frame(Seq(10L -> 10.0, 20L -> 5.0))
    val out = Fusion.rrf(3, 20, Seq(td1, td2))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSeq == Seq(10L, 20L, 42L))
    assert(math.abs(out(0)._2 - (1d / 22 + 1d / 21)) < 1e-12)
    assert(math.abs(out(1)._2 - (1d / 23 + 1d / 22)) < 1e-12)
    assert(math.abs(out(2)._2 - 1d / 21) < 1e-12)
  }

  test("randomized: fused scores equal the sequential model") {
    val rnd = new scala.util.Random(42)
    (0 until 5).foreach { _ =>
      val lists = (0 until 3).map { _ =>
        val n = 5 + rnd.nextInt(10)
        // distinct scores to keep the model's rank unambiguous modulo ties;
        // docIds overlap across lists on purpose
        val rows = rnd.shuffle((0 until n).toList).zipWithIndex.map { case (d, i) =>
          (d.toLong, (100 - i) + rnd.nextDouble())
        }
        rows
      }
      val k = 1 + rnd.nextInt(40)
      val expected = {
        val m = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
        lists.foreach { rows =>
          rows.sortBy { case (d, s) => (-s, d) }.zipWithIndex.foreach { case ((d, _), i) =>
            m(d) += 1.0 / (k + i + 1)
          }
        }
        m.toSeq.sortBy { case (d, s) => (-s, d) }.take(7)
      }
      val got = Fusion.rrf(7, k, lists.map(frame))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got.map(_._1) == expected.map(_._1))
      got.zip(expected).foreach { case ((_, g), (_, e)) => assert(math.abs(g - e) < 1e-12) }
    }
  }

  test("batch fusion equals per-query fusion") {
    val rnd = new scala.util.Random(7)
    val queryIds = Seq(0L, 1L, 2L)
    val perQueryLists = queryIds.map { q =>
      q -> (0 until 2).map { _ =>
        (0 until 8).map(d => (d.toLong, rnd.nextDouble() * 10)).toList
      }
    }.toMap
    // batch frames: one frame per retriever, all queries stacked
    val batchFrames = (0 until 2).map { li =>
      queryIds.flatMap(q => perQueryLists(q)(li).map { case (d, s) => (q, d, s) })
        .toDF("queryId", "docId", "score")
    }
    val batched = Fusion.rrfBatch(4, 60, batchFrames)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (-t._3, t._2)).map(t => (t._2, t._3)).toSeq).toMap
    queryIds.foreach { q =>
      val single = Fusion.rrf(4, 60, perQueryLists(q).map(frame))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batched(q).map(_._1) == single.map(_._1), s"query $q")
      batched(q).zip(single).foreach { case ((_, g), (_, e)) => assert(math.abs(g - e) < 1e-12) }
    }
  }

  test("parameter validation matches the reference") {
    val td = frame(Seq(1L -> 1.0))
    assertThrows[IllegalArgumentException](Fusion.rrf(0, 20, Seq(td)))
    assertThrows[IllegalArgumentException](Fusion.rrf(3, 0, Seq(td)))
  }
}
