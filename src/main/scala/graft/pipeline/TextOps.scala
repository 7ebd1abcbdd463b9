package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression building blocks shared by the pipeline operators.
  *
  * Everything here is native Catalyst expressions (whole-stage-codegen'd) —
  * no UDFs — and every hash is reproducible in ANSI SQL (`md5` + hex→int),
  * so each operator downstream can be oracle-checked externally.
  */
object TextOps {

  /** Spread a narrow input over the cluster before CPU-heavy per-row
    * transforms (tokenize/shingle/hash): a small corpus arrives as one
    * parquet file = ONE scan partition, serializing everything downstream on
    * a single core. No-op when the input is already at least as parallel as
    * the cluster (the at-scale case), so this never coalesces real inputs. */
  def parallelized(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // Catalyst-side size check (no RDD materialization): a file scan splits
    // into ~sizeInBytes / maxPartitionBytes partitions, so an input smaller
    // than target × maxPartitionBytes cannot saturate the cluster
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(maxPart) * target) df.repartition(target) else df
  }

  /** Tokens of `c` under the engine's SimpleAnalyzer contract: lowercase,
    * maximal `[a-z0-9]+` runs (see `graft.core.SimpleAnalyzer`). */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")

  /** Deterministic 60-bit hash of a string, identical in Spark and DuckDB:
    * first 15 hex chars of md5 as a non-negative long. At 100 TB scale one
    * would swap in xxhash64 for speed; md5 is the cross-engine-reproducible
    * choice for the oracle-checked small-scale path. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Word `n`-gram shingles of a token array (space-joined), empty when the
    * doc has fewer than `n` tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array())

  /** Canonical bag-of-words fingerprint: md5 of the sorted distinct token
    * list — the "document fingerprinting" primitive (equal fingerprints ⇒
    * same vocabulary regardless of order/repetition). */
  def bagFingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(c)))))
}
