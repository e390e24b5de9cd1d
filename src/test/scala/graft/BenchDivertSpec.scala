package graft

import org.scalatest.funsuite.AnyFunSuite

/** Write-time contention divert (Bench.shouldDivert): the guard that keeps a
  * contended driver run from clobbering the committed clean
  * bench_full.json. VERDICT r16 #3 added the per-query trigger — bursty
  * contention leaves the version-call floor clean while inflating
  * individual trivial queries 10-20x, so the floor canary alone misses it.
  */
class BenchDivertSpec extends AnyFunSuite {

  private def artifact(floor: Double, spread: Double, qs: (String, Double)*): String = {
    val q = qs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val sp = qs.map { case (k, _) => "\"" + k + "\":1.1" }.mkString("{", ",", "}")
    s"""{"metric":"total","value":1.0,"unit":"sec","queries":$q,""" +
      s""""median_rep_spread":$spread,"rep_spread":$sp,""" +
      s""""version_call_floor_sec":$floor,"cheap5_floor_sec":0.3,"sf":"x"}"""
  }

  test("clean run against a clean prior does not divert") {
    val prior = artifact(0.021, 1.4, "q01" -> 0.6, "q02" -> 0.4, "q03" -> 0.5,
      "q04" -> 0.7, "q05" -> 0.3, "q62" -> 0.021)
    val now = Seq("q01" -> 0.62, "q02" -> 0.38, "q03" -> 0.55,
      "q04" -> 0.69, "q05" -> 0.31, "q62" -> 0.02)
    assert(!Bench.shouldDivert(prior, versionFloor = 0.02, medianSpread = 1.3, now))
  }

  test("inflated version-call floor diverts (the r15 trigger)") {
    val prior = artifact(0.021, 1.4, "q01" -> 0.6)
    assert(Bench.shouldDivert(prior, versionFloor = 0.5, medianSpread = 1.3,
      Seq("q01" -> 0.62)))
  }

  test("bursty contention diverts on >=5 shared 3x queries even with a clean floor (the r16 signature)") {
    val prior = artifact(0.021, 1.4, "q01" -> 0.6, "q02" -> 0.4, "q03" -> 0.5,
      "q04" -> 0.7, "q05" -> 0.3, "q06" -> 0.2, "q62" -> 0.021)
    // floor clean (0.024 vs 0.021) but six queries at 10x — the r16 artifact shape
    val now = Seq("q01" -> 6.0, "q02" -> 4.0, "q03" -> 5.0,
      "q04" -> 7.0, "q05" -> 3.0, "q06" -> 2.5, "q62" -> 0.024)
    assert(Bench.shouldDivert(prior, versionFloor = 0.024, medianSpread = 1.6, now))
  }

  test("four mild 3x queries without a 4x outlier do not divert") {
    // the wide trigger needs five; the narrow trigger needs a >4x outlier —
    // four queries at 3.2-3.5x (a plausible genuine regression band after
    // a shared-code change) land in bench_full.json and get compared
    // honestly
    val prior = artifact(0.021, 1.4, "q01" -> 0.6, "q02" -> 0.4, "q03" -> 0.5,
      "q04" -> 0.7, "q05" -> 0.3, "q62" -> 0.021)
    val now = Seq("q01" -> 1.95, "q02" -> 1.3, "q03" -> 1.7,
      "q04" -> 2.3, "q05" -> 0.31, "q62" -> 0.022)
    assert(!Bench.shouldDivert(prior, versionFloor = 0.022, medianSpread = 1.4, now))
  }

  test("narrow burst with a 4x outlier diverts (the r18 driver-run fixture)") {
    // VERDICT r18 #4: the r18 contended driver run inflated EXACTLY three
    // queries (q129 0.4076 -> 2.0390 = 5.0x, q166 0.8775 -> 3.6147 =
    // 4.1x, q167 0.1879 -> 0.6434 = 3.4x) with a clean floor and flat
    // clean times — one short of the wide >=5 trigger — and the 130.1 s
    // artifact overwrote the committed clean 122.9 s bench_full.json.
    // These are the artifact's real numbers.
    val prior = artifact(0.018, 1.44,
      "q129_histogram_quantiles" -> 0.407625569,
      "q166_bigram_fluency" -> 0.877492845,
      "q167_random_projection" -> 0.1878577,
      "q01" -> 0.6, "q02" -> 0.4, "q62" -> 0.018)
    val now = Seq(
      "q129_histogram_quantiles" -> 2.039045306,
      "q166_bigram_fluency" -> 3.614671559,
      "q167_random_projection" -> 0.643433395,
      "q01" -> 0.62, "q02" -> 0.41, "q62" -> 0.019)
    assert(Bench.shouldDivert(prior, versionFloor = 0.019, medianSpread = 1.47, now),
      "the r18 three-query burst must divert under the narrow trigger")
    // and two inflated queries alone (even huge) stay below the narrow
    // trigger's count floor
    val two = Seq("q129_histogram_quantiles" -> 2.039045306,
      "q166_bigram_fluency" -> 3.614671559, "q01" -> 0.62, "q62" -> 0.019)
    assert(!Bench.shouldDivert(prior, versionFloor = 0.019, medianSpread = 1.45, two))
  }

  test("sub-0.05s prior times cannot vote (noise immunity)") {
    val prior = artifact(0.021, 1.4, "q01" -> 0.02, "q02" -> 0.02, "q03" -> 0.02,
      "q04" -> 0.02, "q05" -> 0.02, "q62" -> 0.021)
    val now = Seq("q01" -> 0.07, "q02" -> 0.08, "q03" -> 0.07,
      "q04" -> 0.09, "q05" -> 0.07, "q62" -> 0.022)
    assert(!Bench.shouldDivert(prior, versionFloor = 0.022, medianSpread = 1.4, now))
  }

  test("rep_spread keys do not leak into the per-query comparison") {
    // rep_spread carries the same "qNN":x shape with values near 1.1; if it
    // were parsed as prior times, these 4.0 s queries would all read as >3x
    // and force a spurious divert
    val prior = artifact(0.021, 1.4, "q01" -> 5.0, "q02" -> 5.0, "q03" -> 5.0,
      "q04" -> 5.0, "q05" -> 5.0, "q62" -> 0.021)
    val now = Seq("q01" -> 4.0, "q02" -> 4.0, "q03" -> 4.0,
      "q04" -> 4.0, "q05" -> 4.0, "q62" -> 0.022)
    assert(!Bench.shouldDivert(prior, versionFloor = 0.022, medianSpread = 1.4, now))
  }

  test("adaptive third rep fires only on discordant non-trivial reps") {
    // VERDICT r16 #8: single-rep outliers need a tiebreaker; idle hosts
    // and sub-100ms jitter must not pay for one
    assert(Bench.needsExtraRep(Seq(1.0, 2.0)), "2x disagreement on a 1s query")
    assert(!Bench.needsExtraRep(Seq(1.0, 1.3)), "within-band reps")
    assert(!Bench.needsExtraRep(Seq(0.02, 0.08)), "sub-100ms jitter exempt")
    assert(Bench.needsExtraRep(Seq(0.2, 0.9)), "0.1s+ queries qualify")
  }

  test("scientific-notation times parse (raw Double.toString emits E-4 below 1e-3)") {
    // round-17 review finding: `(-?[0-9.eE+]+)` captured "9.8E" from
    // 9.8E-4, toDouble threw, and the caller's catch disabled the WHOLE
    // guard — including the floor trigger
    val prior = """{"metric":"total","queries":{"q62":9.8E-4,"q01":0.6,"q02":0.4,"q03":0.5,"q04":0.7,"q05":0.3},""" +
      """"median_rep_spread":1.4,"version_call_floor_sec":9.8E-4}"""
    val burst = Seq("q01" -> 6.0, "q02" -> 4.0, "q03" -> 5.0,
      "q04" -> 7.0, "q05" -> 3.0, "q62" -> 0.001)
    assert(Bench.shouldDivert(prior, versionFloor = 0.001, medianSpread = 1.5, burst),
      "per-query trigger must survive scientific-notation priors")
  }

  test("truncated artifact (no closing brace) degrades to no-divert, not a crash") {
    val truncated = """{"metric":"total","queries":{"q01":0.6,"q02":0.4"""
    assert(!Bench.shouldDivert(truncated, versionFloor = 0.02, medianSpread = 1.3,
      Seq("q01" -> 0.62)))
  }

  test("inflatedQueries names exactly the >3x shared queries (ADVICE r19 #3)") {
    // the diverted-history entry records WHICH queries inflated so a
    // repeat across consecutive diverted runs reads as a regression
    val prior = artifact(0.021, 1.4, "q01" -> 0.6, "q02" -> 0.4, "q03" -> 0.5,
      "q04" -> 0.7, "q05" -> 0.01, "q62" -> 0.021)
    val now = Seq("q01" -> 3.0, "q02" -> 0.41, "q03" -> 5.0,
      "q04" -> 0.7, "q05" -> 1.0, "q06" -> 9.9, "q62" -> 0.02)
    // q01 = exactly 5x, q03 = 10x; q02/q04 flat; q05's prior 0.01 < 0.05
    // cannot vote; q06 has no prior; q62's prior 0.021 < 0.05 cannot vote
    assert(Bench.inflatedQueries(prior, now) == Seq("q01", "q03"))
    // failed queries (negative sentinel) never vote
    assert(Bench.inflatedQueries(prior, Seq("q01" -> -1.0)).isEmpty)
  }

  test("sf mismatch always diverts; same sf and unparseable priors do not (the r20 contamination incident)") {
    // an sf0.001 contract-check run has BETTER canaries than the
    // committed sf0.1 artifact, so floor/spread guards pass it through —
    // the sf field is the only reliable discriminator
    val sf01 = """{"metric":"total","queries":{"q01":0.6},"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.sfMismatch(sf01, "/root/testdata/sf0.001"))
    assert(!Bench.sfMismatch(sf01, "/root/testdata/sf0.1"))
    assert(!Bench.sfMismatch("""{"metric":"total","queries":{}}""", "/root/testdata/sf0.1"),
      "a prior without an sf field must not vote")
  }

  test("spread-only trigger still requires a missing prior floor") {
    val noFloor = """{"metric":"total","value":1.0,"queries":{"q01":0.6},"median_rep_spread":1.2}"""
    assert(Bench.shouldDivert(noFloor, versionFloor = 0.02, medianSpread = 2.5,
      Seq("q01" -> 0.6)))
    val withFloor = artifact(0.021, 1.2, "q01" -> 0.6)
    assert(!Bench.shouldDivert(withFloor, versionFloor = 0.02, medianSpread = 2.5,
      Seq("q01" -> 0.6)))
  }
}
