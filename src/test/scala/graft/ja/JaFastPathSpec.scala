package graft.ja

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property check for the single-class fast path (JaTokenizer.fastSingleClass):
  * on Latin/digit runs with no dictionary surface inside, the shortcut must
  * produce exactly the full Viterbi lattice's output in every mode. The
  * shortcut's equivalence rests on JaCosts invariants (conn(Unknown,Unknown)
  * and conn(Num,Num) strictly positive, linear per-codepoint unknownCost,
  * the SearchOtherLen threshold) that a future cost-model tuning could break
  * without any other test noticing (ADVICE r3) — this spec is the tripwire.
  */
class JaFastPathSpec extends AnyFunSuite {

  private val modes = Seq(JaMode.Normal, JaMode.Search, JaMode.Extended)

  private def compare(tokFast: JaTokenizer, tokFull: JaTokenizer, s: String): Unit = {
    val fast = tokFast.tokenize(s).toSeq
    val full = tokFull.tokenize(s).toSeq
    assert(fast == full,
      s"fast path diverged from lattice on '$s': fast=${fast.mkString("|")} full=${full.mkString("|")}")
  }

  private def pair(mode: JaMode): (JaTokenizer, JaTokenizer) = {
    val fast = new JaTokenizer(mode)
    val full = new JaTokenizer(mode)
    full.fastPathEnabled = false
    (fast, full)
  }

  test("random ASCII letter / digit / mixed runs match the full lattice in all modes") {
    val rnd = new Random(20260812L)
    val letters = ('a' to 'z') ++ ('A' to 'Z')
    val digits = '0' to '9'
    for (mode <- modes) {
      val (tokFast, tokFull) = pair(mode)
      for (_ <- 0 until 400) {
        val len = 1 + rnd.nextInt(48)
        val pool = rnd.nextInt(3) match {
          case 0 => letters          // uniform Latin run — fast path applies
          case 1 => digits           // uniform digit run — fast path applies
          case _ => letters ++ digits // class changes — fast path must decline
        }
        val s = Array.fill(len)(pool(rnd.nextInt(pool.length))).mkString
        compare(tokFast, tokFull, s)
      }
    }
  }

  test("runs spanning the SEARCH long-token threshold match in all modes") {
    for (mode <- modes) {
      val (tokFast, tokFull) = pair(mode)
      for (len <- 1 to 40) {
        compare(tokFast, tokFull, "x" * len)
        compare(tokFast, tokFull, "7" * len)
      }
    }
  }

  test("runs embedded between punctuation and CJK text match in all modes") {
    val rnd = new Random(42L)
    for (mode <- modes) {
      val (tokFast, tokFull) = pair(mode)
      for (_ <- 0 until 100) {
        val word = Array.fill(1 + rnd.nextInt(20))(('a' + rnd.nextInt(26)).toChar).mkString
        compare(tokFast, tokFull, s"$word。$word")
        compare(tokFast, tokFull, s"東京$word")
        compare(tokFast, tokFull, s"${word}12${word}")
      }
    }
  }
}
