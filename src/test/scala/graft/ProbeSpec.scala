package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Supervised linear probe (the embedding quality classifier): solve
  * correctness, accuracy floor on a separable synthetic, determinism,
  * and the scoring plan shape. */
class ProbeSpec extends SparkSpec {
  import spark.implicits._

  /** 4 classes on orthogonal-ish centroids in R^8 + small noise —
    * linearly separable by construction. */
  private def synth(n: Int, seed: Long): Seq[(Long, Seq[Float], Int)] = {
    val rnd = new scala.util.Random(seed)
    val centroids = Array.tabulate(4, 8)((c, i) =>
      if (i == 2 * c || i == 2 * c + 1) 3.0 else 0.0)
    (0 until n).map { k =>
      val c = k % 4
      val v = centroids(c).map(x => (x + rnd.nextGaussian() * 0.4).toFloat)
      (k.toLong, v.toSeq, c)
    }
  }

  test("fitProbe recovers a separable labeling (accuracy >= 0.95) and " +
      "is bit-deterministic across fits") {
    val df = synth(400, seed = 4).toDF("vec_id", "embedding", "label")
    val m1 = Similarity.fitProbe(df, "embedding", "label")
    val m2 = Similarity.fitProbe(df, "embedding", "label")
    assert(m1.classes == Seq(0L, 1L, 2L, 3L))
    // decimal-sum stats + driver solve → bit-identical weights
    assert(m1.classes.forall(c =>
      m1.weights(c).toSeq == m2.weights(c).toSeq))
    val scored = Similarity.scoreProbe(df, "embedding", m1)
    val acc = scored
      .agg(avg(when(col("probe_label") === col("label"), 1.0).otherwise(0.0)))
      .as[Double].head()
    info(s"probe accuracy = $acc")
    assert(acc >= 0.95)
  }

  test("ridge solve is exact on a hand-built system (bias " +
      "unregularized): w*x reproduces a known linear function") {
    // y = 2*x0 - 3*x1 + 0.5, one-hot-ish inputs, zero noise, lambda→0:
    // the probe for a {0,1} target built from a threshold must rank
    // positives above negatives perfectly
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { k =>
      val x0 = rnd.nextDouble() * 2 - 1
      val x1 = rnd.nextDouble() * 2 - 1
      val y = 2 * x0 - 3 * x1 + 0.5
      (k.toLong, Seq(x0.toFloat, x1.toFloat), if (y > 0) 1 else 0)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val m = Similarity.fitProbe(df, "embedding", "label", lambda = 1e-9)
    val scored = Similarity.scoreProbe(df, "embedding", m)
      .select("vec_id", "probe_label").as[(Long, Long)].collect().toMap
    val acc = rows.count { case (id, _, l) => scored(id) == l.toLong }
      .toDouble / rows.size
    info(s"threshold-function accuracy = $acc")
    // least squares (not logistic) misranks a thin margin band around
    // the threshold — ~3% of uniform draws here
    assert(acc >= 0.95)
  }

  test("probeGram/probeMoments shapes: upper triangle only, bias row " +
      "present, per-class counts correct") {
    val df = synth(40, seed = 9).toDF("vec_id", "embedding", "label")
    val g = Similarity.probeGram(df, "embedding").collect()
    assert(g.length == 9 * 10 / 2) // d+1 = 9
    assert(g.forall(r => r.getInt(0) <= r.getInt(1)))
    // gram(bias,bias) = n
    val nn = g.find(r => r.getInt(0) == 8 && r.getInt(1) == 8).get.getDouble(2)
    assert(nn == 40.0)
    val m = Similarity.probeMoments(df, "embedding", "label").collect()
    assert(m.length == 4 * 9)
    assert(m.filter(_.getInt(1) == 8) // bias slot sums = class counts
      .forall(r => r.getDouble(2) == r.getLong(3).toDouble))
  }

  test("scoreProbe plans as a narrow map: zero shuffles, weights as " +
      "plan literals") {
    val df = synth(40, seed = 9).toDF("vec_id", "embedding", "label")
    val m = Similarity.fitProbe(df, "embedding", "label")
    val p = Similarity.scoreProbe(df, "embedding", m)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }
}
