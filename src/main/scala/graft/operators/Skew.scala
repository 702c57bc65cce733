package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for keyed joins — the explicit-salting complement to
  * AQE's runtime skew-join split.
  *
  * AQE splits an oversized sort-merge partition automatically, but only
  * for the join patterns it rewrites (plain SMJ, no bucket/cached reuse,
  * skew detectable from runtime stats). When one key holds 10⁸ rows and
  * the other side is too big to broadcast, the classic design-time fix is
  * salting: spread the hot key's rows over S sub-keys and replicate the
  * other side S×, turning one 10⁸-row partition into S partitions of
  * 10⁸/S.
  *
  * Cost model: the replicated side's shuffle volume multiplies by S —
  * worth it exactly when (max-key rows / S) falls under the straggler
  * threshold and the replicated side is ≤ 1/S of the skewed side. Use
  * `broadcast()` instead whenever the small side fits; use this when it
  * doesn't.
  */
object Skew {

  /** Equi-join `skewed` with `other` on `keys`, salting the skewed side
    * into `salts` sub-keys and replicating the other side `salts`×.
    *
    * The salt is a deterministic per-row hash over ALL of the skewed
    * side's columns (NOT just the keys — a key-derived salt would land
    * the whole hot key on one sub-key and change nothing). Correctness
    * does not depend on the salt value: the replicated side carries
    * every salt, so any assignment joins identically — determinism just
    * keeps plans replayable.
    *
    * Inner and left-outer semantics match the unsalted join row-for-row
    * (each skewed row meets each matching other row exactly once — one
    * salt value per row, one replica per salt). */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType " +
        "(right/full would need the salt on the other side's unmatched rows)")
    val rowHash: Column = xxhash64(skewed.columns.map(col): _*)
    val sl = skewed.withColumn("__salt", pmod(rowHash, lit(salts.toLong)))
    val rep = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    sl.join(rep, keys :+ "__salt", joinType).drop("__salt")
  }

  /** The diagnostic that DECIDES between [[saltedJoin]], `broadcast()`
    * and doing nothing: the `topN` heaviest keys with their row count,
    * corpus share, and a salt-factor hint
    * `ceil(cnt · distinct_keys / total)` — how many mean-sized keys the
    * hot key weighs (1 ⇒ balanced, S ⇒ spread it over ~S sub-keys).
    * Run it on the join key BEFORE shipping a 100 TB join; a top key
    * holding >1% of the corpus is the straggler the plan must design
    * around.
    *
    * One keyed count agg (exchange bounded by key cardinality) + a
    * 1-row broadcast of the totals + TakeOrdered — never a global sort
    * of data. */
  def skewReport(df: DataFrame, keys: Seq[String], topN: Int): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("__total"),
      count(lit(1)).as("__dk"))
    counts.crossJoin(broadcast(tot))
      .withColumn("share",
        col("cnt").cast("double") / col("__total").cast("double"))
      .withColumn("salts_hint",
        ceil(col("cnt").cast("double") * col("__dk") / col("__total")))
      .orderBy(col("cnt").desc +: keys.map(col(_).asc): _*)
      .limit(topN)
      .select(keys.map(col) ++
        Seq(col("cnt"), col("share"), col("salts_hint")): _*)
  }
}
