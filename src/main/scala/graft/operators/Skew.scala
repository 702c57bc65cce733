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
}
