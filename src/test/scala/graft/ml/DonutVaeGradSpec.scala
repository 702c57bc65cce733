package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Finite-difference check of the hand-rolled VAE backprop: for every
  * parameter of every layer, the analytic gradient accumulated by
  * [[DonutVae.step]] must match the central difference of the sample
  * loss (SSE + M-ELBO KL; ℓ₂ is applied at the optimizer step, not in
  * the loss, so it's excluded here) through the SAME fixed ε draw.
  * This pins the trickiest code in the model — the reparameterization
  * and KL gradients — far more tightly than any training floor. */
class DonutVaeGradSpec extends AnyFunSuite {

  test("analytic gradients match central differences to 1e-5 relative") {
    val p = DonutVae.Params(bucketInterval = 3600L, span = 6,
      intermediate = 4, latent = 2, seed = 123L)
    val rnd = new scala.util.Random(7)
    val net = new DonutVae.Net(p, new scala.util.Random(p.seed))
    val x = Array.fill(p.span)(rnd.nextGaussian())
    val miss = Array.tabulate(p.span)(_ % 3 == 0) // β < 1 branch active
    var j = 0
    while (j < p.span) { if (miss(j)) x(j) = 0.0; j += 1 }
    val eps = Array.fill(p.latent)(rnd.nextGaussian())

    def loss(): Double = {
      // step() accumulates grads as a side effect; zero them after
      val l = DonutVae.step(net, p, x, miss, eps)
      net.layers.foreach(_.zeroGrad())
      l
    }

    // analytic gradients for the single sample
    DonutVae.step(net, p, x, miss, eps)
    val analytic = net.layers.map(l => (l.gk.clone(), l.gb.clone()))
    net.layers.foreach(_.zeroGrad())

    val h = 1e-6
    var checked = 0
    net.layers.zip(analytic).zipWithIndex.foreach {
      case ((layer, (gk, gb)), li) =>
        def check(arr: Array[Double], grads: Array[Double],
            what: String): Unit = {
          // sample a subset of indices per tensor to keep this fast
          val idxs = (0 until arr.length by math.max(1, arr.length / 7))
          idxs.foreach { i =>
            val keep = arr(i)
            arr(i) = keep + h; val up = loss()
            arr(i) = keep - h; val dn = loss()
            arr(i) = keep
            val num = (up - dn) / (2 * h)
            val ana = grads(i)
            val denom = math.max(1e-4, math.max(math.abs(num), math.abs(ana)))
            assert(math.abs(num - ana) / denom < 1e-5,
              s"layer $li $what[$i]: analytic $ana vs numeric $num")
            checked += 1
          }
        }
        check(layer.k, gk, "k")
        check(layer.b, gb, "b")
    }
    info(s"checked $checked parameters across ${net.layers.size} tensors")
    assert(checked > 50)
  }

  test("relu-boundary note: gradients stay consistent when a unit is " +
      "exactly inactive (subgradient 0 on both paths)") {
    val p = DonutVae.Params(bucketInterval = 3600L, span = 4,
      intermediate = 3, latent = 2, seed = 5L)
    val net = new DonutVae.Net(p, new scala.util.Random(p.seed))
    // zero input: encoder pre-activations = biases = 0 → relu'(0) = 0
    // everywhere; the step must not NaN and the loss must be finite
    val x = new Array[Double](p.span)
    val miss = Array.fill(p.span)(true)
    val eps = Array.fill(p.latent)(0.5)
    val l = DonutVae.step(net, p, x, miss, eps)
    assert(!l.isNaN && !l.isInfinite)
    assert(net.layers.forall(ly =>
      ly.gk.forall(g => !g.isNaN) && ly.gb.forall(g => !g.isNaN)))
  }
}
