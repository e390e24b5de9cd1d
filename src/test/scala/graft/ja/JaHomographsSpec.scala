package graft.ja

import org.scalatest.funsuite.AnyFunSuite

/** The homograph-tie ledger (VERDICT r10 #7) must stay green: every
  * documented divergence's reviewed reading wins its carrier, scored
  * margins are non-negative, and the two engineered-fence cases keep a
  * real (>=500-point) margin — they are contract cells, not ties.
  */
class JaHomographsSpec extends AnyFunSuite {

  private lazy val reports = JaHomographs.report()

  test("every ledger pin holds on its carrier sentence") {
    val flips = reports.filterNot(_.pinnedWins)
    assert(flips.isEmpty,
      flips.map(r => s"${r.name}: got ${r.got.mkString("|")}").mkString("; "))
  }

  test("scored margins are non-negative (rejected reading never cheaper)") {
    val neg = reports.filter(_.margin.exists(_ < 0))
    assert(neg.isEmpty, neg.map(r => s"${r.name}: ${r.margin.get}").mkString("; "))
  }

  test("engineered fences keep real margins; the よく tie is documented at 0") {
    val byName = reports.map(r => (r.name, r.margin)).toMap
    assert(byName("もいた: も+いる vs 音便もぐ+た").exists(_ >= 500),
      "VOnbin た-fence margin collapsed — contract cell lost?")
    assert(byName("光って: 光っ+て vs 光+って").exists(_ >= 500),
      "flat-function-word-cost margin collapsed")
    // よく is a genuine class-level tie: margin exactly 0, the pin holds by
    // deterministic relaxation order. If this becomes nonzero, the cost
    // model moved — re-verify the three golden よく pins before accepting.
    assert(byName("よく: 形容詞よい-連用 vs 副詞").contains(0),
      s"よく margin moved: ${byName("よく: 形容詞よい-連用 vs 副詞")}")
  }

  test("the shadowed 行った case stays shadowed (load-order contract)") {
    assert(reports.find(_.name.startsWith("行った")).exists(_.margin.isEmpty),
      "行う's 音便 stem is no longer shadowed — (surface,pos) dedupe changed?")
  }
}
