package graft.tools

/** Single-thread first-fit kernel micro-benchmark (VERDICT r19 #6): docs/s
  * of the segment-tree leftmost fit (graft.operators.FirstFitTree — the
  * q227/q232 per-shard walk) against the naive linear bin scan it replaced,
  * on a deterministic synthetic shard (LCG, fixed seed). The claimed
  * complexity gap is O(log bins) vs O(bins) per document; this measures it
  * so BASELINE.md's shard-sizing argument has a number: at the advertised
  * 10⁶-doc shard the tree must hold ~100k docs/s+ while the linear walk
  * collapses with bin count. Also asserts bit-identical placements while
  * measuring — a wrong fast kernel is worse than a slow one.
  *
  * Usage: runMain graft.tools.FfdBench [nDocs] [capacity]
  */
object FfdBench {

  private def lcg(seed: Long): () => Long = {
    var s = seed
    () => { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 16 }
  }

  /** The pre-review O(docs·bins) walk, kept as the comparison baseline. */
  private final class LinearFirstFit(capacity: Int) {
    private val fills = new scala.collection.mutable.ArrayBuffer[Int]
    def place(n: Int): Int = {
      var i = 0
      while (i < fills.length) {
        if (fills(i) + n <= capacity) { fills(i) += n; return i }
        i += 1
      }
      fills += n
      fills.length - 1
    }
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 1000000
    val capacity = if (args.length > 1) args(1).toInt else 2048
    // the long-doc bucket below draws rnd() % (capacity - 640): a
    // user-supplied capacity <= 640 is a modulo-by-zero/negative-modulus
    // crash (or silent negative sizes) — fail with the contract instead
    // (ADVICE r20 #4)
    require(capacity > 640,
      s"FfdBench: capacity must be > 640 (long-doc bucket spans [640, capacity)), got $capacity")
    val rnd = lcg(42L)
    // FFD consumes docs in (n DESC, id ASC) order; synthesize the sorted
    // sizes directly (a zipf-ish SFT length mix: many short, few long)
    val sizes = Array.fill(nDocs) {
      val r = (rnd() % 1000).toInt
      if (r < 700) 8 + (rnd() % 120).toInt
      else if (r < 950) 128 + (rnd() % 512).toInt
      else 640 + (rnd() % (capacity - 640)).toInt
    }
    java.util.Arrays.sort(sizes)
    val desc = sizes.reverse

    def bench(name: String, mk: () => Int => Int): (Double, Array[Int]) = {
      // warmup on a prefix
      val warm = mk(); desc.take(math.min(nDocs, 50000)).foreach(warm)
      val out = new Array[Int](nDocs)
      val t0 = System.nanoTime()
      val f = mk()
      var i = 0
      while (i < nDocs) { out(i) = f(desc(i)); i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      val bins = out.max + 1
      println(f"$name%-12s ${nDocs / sec}%,12.0f docs/s  ($sec%.2f s, $bins%,d bins)")
      (sec, out)
    }
    val (treeSec, treeBins) = bench("segment-tree",
      () => { val t = new graft.operators.FirstFitTree(capacity); t.place })
    val (linSec, linBins) = bench("linear-walk",
      () => { val t = new LinearFirstFit(capacity); t.place })
    require(java.util.Arrays.equals(treeBins, linBins),
      "segment tree and linear walk disagree — the fast kernel is wrong")
    println(f"speedup ${linSec / treeSec}%.1fx (placements bit-identical)")
  }
}
