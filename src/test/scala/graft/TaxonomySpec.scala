package graft

import graft.search.Taxonomy
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Taxonomy]] — FastTaxonomyFacetCounts side-index analog: dense ordinals
  * over the prefix closure in global path order, assigned by the distributed
  * zip-with-index (no single-partition Window exchange — web-corpus
  * taxonomies scale with the corpus). */
class TaxonomySpec extends AnyFunSuite {

  private lazy val spark = SparkTestEnv.spark

  test("ordinals are dense 0-based ranks in global path order; parent/depth correct") {
    import spark.implicits._
    val docs = Seq("a/b/c", "a/b", "z", "a/b/c", "m/n").toDF("p")
    val tax = Taxonomy.build(docs, col("p"), numPartitions = 3)
    val rows = tax.orderBy("ordinal")
      .select("ordinal", "path", "parent", "depth").collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getString(2), r.getInt(3)))
    val paths = rows.map(_._2).toSeq
    assert(paths == Seq("a", "a/b", "a/b/c", "m", "m/n", "z"))
    assert(rows.map(_._1).toSeq == (0L until 6L))
    assert(rows.map(_._3).toSeq == Seq(null, "a", "a/b", null, "m", null))
    assert(rows.map(_._4).toSeq == Seq(1, 2, 3, 1, 2, 1))
    tax.unpersist()
  }

  test("1e6 distinct paths: dense ordinals, path-rank order, and NO single-partition Window/exchange in the plan") {
    import spark.implicits._
    // two-level host/page hierarchy: 1000 hosts x 999 pages (+1000 host
    // prefixes) => 10^6 distinct closure paths
    val corpus = spark.range(999000L).select(
      concat(lit("host"), format_string("%04d", (col("id") % 1000).cast("long")),
        lit("/p"), format_string("%05d", (col("id") / 1000).cast("long"))).as("p"))
    val tax = Taxonomy.build(corpus, col("p"), numPartitions = 32)
    val plan = tax.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"taxonomy plan must not window:\n$plan")
    assert(!plan.toLowerCase.contains("singlepartition"),
      s"taxonomy plan must not round-trip through one partition:\n$plan")
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"ordinal assignment should be a distributed range sort:\n$plan")
    val n = tax.count()
    assert(n == 1000000L)
    val agg = tax.agg(min("ordinal"), max("ordinal"), countDistinct("ordinal")).head()
    assert(agg.getLong(0) == 0L && agg.getLong(1) == n - 1 && agg.getLong(2) == n)
    // global order: ordinal ranks == path ranks (spot-checked via min/max
    // per range bucket — full sort of 1e6 rows is the oracle's job, the
    // invariant here is monotonicity across buckets)
    val buckets = tax.groupBy(substring(col("path"), 1, 8).as("b"))
      .agg(min("ordinal").as("lo"), max("ordinal").as("hi"), count(lit(1)).as("c"))
      .orderBy("b").collect()
    var prevHi = -1L
    buckets.foreach { r =>
      val (lo, hi, c) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lo == prevHi + 1, s"bucket ${r.getString(0)} not contiguous after $prevHi")
      assert(hi - lo + 1 == c, s"bucket ${r.getString(0)} ordinals not dense")
      prevHi = hi
    }
    assert(prevHi == n - 1)
    tax.unpersist()
  }
}
