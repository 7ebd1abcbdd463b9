package graft

import graft.index._
import graft.search._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Segment-merge metamorphic + invariant tests (SURVEY.md §5: merged index
  * must be observationally identical to the unmerged one; pattern from the
  * reference's `TestSegmentMerger` / `BaseMergePolicyTestCase`).
  */
class MergeSpec extends AnyFunSuite {
  import SparkTestEnv._

  // tiny flush budget + small salt budget → many segments, real salting
  lazy val fragmented: InvertedIndex = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-frag-").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("docId"), col("text"))
      .repartition(8)
      .as[InputDoc]
    IndexBuilder.build(docs, dir, IndexConfig(graft.core.SimpleAnalyzer, flushDocBudget = 32))
  }

  lazy val mergedPair: (InvertedIndex, MergeMetrics) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-merged-").toString
    SegmentMerger.merge(fragmented, dir, mergeRound = 1, targetPostingsPerGroup = 64)
  }

  test("merge compacts: fewer postings rows and blocks, head terms salted") {
    val (_, m) = mergedPair
    assert(m.rowsOut <= m.rowsIn, s"rows ${m.rowsOut} > ${m.rowsIn}")
    assert(m.blocksOut <= m.blocksIn, s"blocks ${m.blocksOut} > ${m.blocksIn}")
    assert(m.saltedTerms > 0, "expected head terms to be salted at targetPostingsPerGroup=64")
  }

  test("merge preserves global term statistics exactly") {
    val (merged, _) = mergedPair
    val before = fragmented.termStats.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val after = merged.termStats.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(before == after)
    assert(merged.collectionStats == fragmented.collectionStats)
  }

  test("merged index satisfies CheckIndex invariants") {
    val (merged, _) = mergedPair
    val violations = CheckIndex.check(merged)
    assert(violations.isEmpty, violations.take(5).mkString("; "))
  }

  test("Or-rooted interval on a MERGED index decomposes per branch: no positional union, results exact") {
    val (merged, _) = mergedPair
    val s = new Searcher(merged, ScoringMode.PreciseBM25())
    // head-term disjunction — no required term gates the whole source, but
    // the root decomposes: the bare term branch is a doc-ids-only decode and
    // the Ordered branch leapfrogs off its own rarest required term
    def brute(src: graft.search.IntervalsSource): Set[Long] =
      corpus.collect { case (doc, toks)
        if graft.search.IntervalEval.matches(src,
          toks.groupBy(_.term).map { case (t, ts) => t -> ts.map(_.position).toArray.sorted })
        => doc }.toSet
    // term-only head Or: NO positional decode anywhere — doc-ids-only
    // postings scans unioned, no collect_list/plists aggregation in the plan
    val termOr = Intervals.Or(Seq(Intervals.Term("spark"), Intervals.Term("fast")))
    val termFrame = s.scored(IntervalQuery(termOr))
    val plan = termFrame.queryExecution.executedPlan.toString
    assert(!plan.contains("plists") && !plan.contains("collect_list"),
      s"term-only Or-root interval must not union positional postings into a doc-keyed shuffle:\n$plan")
    assert(termFrame.collect().map(_.getLong(0)).toSet == brute(termOr))
    // mixed Or: the Ordered branch re-enters with its OWN required-term lead
    // (its positional aggregation is the accepted lead-filtered shape); the
    // union stays exact
    val mixed = Intervals.Or(Seq(
      Intervals.Term("spark"),
      Intervals.Ordered(Seq(Intervals.Term("fast"), Intervals.Term("data")))))
    val got = s.scored(IntervalQuery(mixed)).collect().map(_.getLong(0)).toSet
    assert(got == brute(mixed))
    assert(got.nonEmpty)
  }

  test("pruned boolean top-k is exact on a MERGED index (doc-alignment fallback)") {
    // merged postings are re-sharded by (term, salt): one doc's terms live in
    // different merged "segments", so the per-segment WAND loop would sum
    // partial scores — the searcher must detect this and take the doc-keyed
    // aggregation path (regression test for that detection)
    val (merged, _) = mergedPair
    assert(fragmented.docAlignedSegments, "built index should be doc-aligned")
    assert(!merged.docAlignedSegments, "merged index must NOT be doc-aligned")
    val pruned = new Searcher(merged, ScoringMode.PreciseBM25(), pruneThreshold = 1L)
    val plain = new Searcher(merged, ScoringMode.PreciseBM25(), pruneThreshold = Long.MaxValue)
    Seq(Seq("spark", "data"), Seq("the", "dup", "vector")).foreach { ts =>
      Seq(true, false).foreach { conj =>
        val q = BooleanQuery(ts.map(t =>
          (if (conj) Occur.MUST else Occur.SHOULD) -> TermQuery(t)))
        val a = pruned.search(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val b = plain.search(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(a.map(_._1) == b.map(_._1), s"pruned-on-merged != exhaustive for $ts conj=$conj")
        a.zip(b).foreach { case ((_, sa), (_, sb)) => assert(math.abs(sa - sb) < 1e-9) }
      }
    }
  }

  test("metamorphic: identical query results before and after merge") {
    val (merged, _) = mergedPair
    val a = new Searcher(fragmented, ScoringMode.PreciseBM25())
    val b = new Searcher(merged, ScoringMode.PreciseBM25())
    val queries: Seq[Query] = Seq(
      TermQuery("spark"),
      TermQuery("the"),
      BooleanQuery.must(TermQuery("data"), TermQuery("dup")),
      BooleanQuery.should(TermQuery("vector"), TermQuery("stream")),
      PhraseQuery(Seq("batch", "batch")),
      PrefixQuery("st"))
    queries.foreach { q =>
      val ra = a.search(q, 20).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val rb = b.search(q, 20).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(ra == rb, s"merge changed results for $q")
    }
  }

  test("purge-merge with 10^6+ tombstones (distributed anti-join, no driver set)") {
    import spark.implicits._
    // copy the fragmented index into its own dir so the shared fixture stays
    // tombstone-free, then tombstone 1.2M ids — every odd corpus doc plus a
    // large non-resident id range, the shape of a mass update wave. The purge
    // path must anti-join the tombstone FRAME inside the shuffle (a driver
    // Set of this many ids is the r2 OOM shape being regression-tested).
    val dir = java.nio.file.Files.createTempDirectory("graft-bigtomb-").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("docId"), col("text"))
      .repartition(4)
      .as[InputDoc]
    IndexBuilder.build(docs, dir, IndexConfig(graft.core.SimpleAnalyzer, flushDocBudget = 64))
    val corpusIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long].collect().sorted
    val oddIds = corpusIds.filter(_ % 2 == 1)
    val tombs = spark.range(10000000L, 11200000L).map(java.lang.Long.valueOf(_))
      .union(oddIds.toSeq.map(java.lang.Long.valueOf(_)).toDS())
    Deletes.tombstone(spark, dir, tombs)
    val reopened = InvertedIndex.open(spark, dir)
    assert(reopened.deletedDocs.get.count() >= 1200000L)
    val (purged, _) = SegmentMerger.merge(reopened, dir + "-purged", computeMetrics = false)
    // survivors: exactly the even corpus docs, with recomputed stats
    val evenIds = corpusIds.filter(_ % 2 == 0)
    assert(purged.docs.count() == evenIds.length)
    assert(purged.collectionStats.docCount == evenIds.length)
    assert(purged.deletedDocs.isEmpty)
    // postings carry no tombstoned doc
    val resident = new Searcher(purged).scored(MatchAllDocsQuery)
      .select("docId").as[Long].collect().toSet
    assert(resident == evenIds.toSet)
    val violations = CheckIndex.check(purged)
    assert(violations.isEmpty, violations.take(5).mkString("; "))
  }

  test("merge manifest records per-partition lineage") {
    val (merged, m) = mergedPair
    val manifest = spark.read.parquet(s"${merged.dir}/merge_manifest")
    val rows = manifest.collect()
    assert(rows.nonEmpty)
    assert(manifest.columns.toSet ==
      Set("mergeRound", "partitionId", "rowsOut", "blocksOut", "postings"))
    val totalRows = rows.map(r => r.getLong(r.fieldIndex("rowsOut"))).sum
    assert(totalRows == m.rowsOut)
  }
}

/** Block-max pruned boolean top-k ≡ exhaustive (metamorphic, pattern from the
  * reference's `TestBlockMaxConjunction` / WAND equivalence tests).
  */
class PrunedBooleanSpec extends AnyFunSuite {
  import SparkTestEnv._

  test("pruned OR top-k == exhaustive OR top-k") {
    val pruned = new Searcher(index, ScoringMode.PreciseBM25(), pruneThreshold = 1L)
    val plain = new Searcher(index, ScoringMode.PreciseBM25(), pruneThreshold = Long.MaxValue)
    val termSets = Seq(
      Seq("spark", "data"),
      Seq("the", "dup", "vector"),
      Seq("stream", "batch", "query", "line"))
    termSets.foreach { ts =>
      val q = BooleanQuery(ts.map(t => Occur.SHOULD -> TermQuery(t)))
      val a = pruned.search(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = plain.search(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a.map(_._1) == b.map(_._1), s"pruned OR doc ids != exhaustive for $ts")
      a.zip(b).foreach { case ((_, sa), (_, sb)) => assert(math.abs(sa - sb) < 1e-9) }
    }
  }

  test("pruned AND top-k == exhaustive AND top-k") {
    val pruned = new Searcher(index, ScoringMode.PreciseBM25(), pruneThreshold = 1L)
    val plain = new Searcher(index, ScoringMode.PreciseBM25(), pruneThreshold = Long.MaxValue)
    val termSets = Seq(Seq("data", "dup"), Seq("the", "data", "query"))
    termSets.foreach { ts =>
      val q = BooleanQuery(ts.map(t => Occur.MUST -> TermQuery(t)))
      val a = pruned.search(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = plain.search(q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(a.map(_._1) == b.map(_._1), s"pruned AND doc ids != exhaustive for $ts")
      a.zip(b).foreach { case ((_, sa), (_, sb)) => assert(math.abs(sa - sb) < 1e-9) }
    }
  }

  test("pruned path handles absent terms") {
    val pruned = new Searcher(index, ScoringMode.PreciseBM25(), pruneThreshold = 1L)
    val or = pruned.search(BooleanQuery(Seq(
      Occur.SHOULD -> TermQuery("spark"), Occur.SHOULD -> TermQuery("zzzznotaterm"))), 5)
    assert(or.count() > 0)
    val and = pruned.search(BooleanQuery(Seq(
      Occur.MUST -> TermQuery("spark"), Occur.MUST -> TermQuery("zzzznotaterm"))), 5)
    assert(and.count() == 0)
  }
}
