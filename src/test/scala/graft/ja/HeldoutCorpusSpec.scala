package graft.ja

import org.scalatest.funsuite.AnyFunSuite

/** Held-out conformance pin (VERDICT r6 "Next round" #2). The corpus was
  * authored blind from topic lists and first run against the tokenizer only
  * after being committed; the first run measured 63/98 (2 of the authored 100 coincided verbatim
  * with development sentences and were removed as not out-of-sample) (recorded in
  * SURVEY.md §7.4 and the resource header, with the 15 adjudicated
  * convention conflicts itemized there). After the round-7 lexeme additions
  * and the two lattice-cost fixes it is pinned at 98/98 — this spec keeps
  * it there, and q101 pins the same rows inside the driver's oracle gate.
  */
class HeldoutCorpusSpec extends AnyFunSuite {

  test("held-out corpus: 98 blind-authored sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus
    assert(corpus.size == 98, s"held-out corpus must stay at 98 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus is disjoint from the development golden corpus") {
    val dev = JaGolden.corpus.map(_.sentence).toSet
    val overlap = JaGolden.heldoutCorpus.filter { case (_, s, _) => dev.contains(s) }
    assert(overlap.isEmpty, s"held-out sentences also in golden corpus: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 2: 60 blind-authored sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus2
    assert(corpus.size == 60, s"held-out corpus 2 must stay at 60 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-2 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 2 is disjoint from the golden corpus and held-out 1") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++ JaGolden.heldoutCorpus.map(_._2)
    val overlap = JaGolden.heldoutCorpus2.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-2 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 3: 30 post-compound-derivation sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus3
    assert(corpus.size == 30, s"held-out corpus 3 must stay at 30 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-3 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 3 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2)
    val overlap = JaGolden.heldoutCorpus3.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-3 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 4: 40 post-aux-expansion sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus4
    assert(corpus.size == 40, s"held-out corpus 4 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-4 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 4 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2)
    val overlap = JaGolden.heldoutCorpus4.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-4 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 5: 42 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus5
    assert(corpus.size == 42, s"held-out corpus 5 must stay at 42 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-5 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 5 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2)
    val overlap = JaGolden.heldoutCorpus5.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-5 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 6: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus6
    assert(corpus.size == 40, s"held-out corpus 6 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-6 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 6 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2)
    val overlap = JaGolden.heldoutCorpus6.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-6 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 7: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus7
    assert(corpus.size == 40, s"held-out corpus 7 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-7 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 7 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2)
    val overlap = JaGolden.heldoutCorpus7.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-7 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 8: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus8
    assert(corpus.size == 40, s"held-out corpus 8 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-8 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 8 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2)
    val overlap = JaGolden.heldoutCorpus8.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-8 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 9: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus9
    assert(corpus.size == 40, s"held-out corpus 9 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-9 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 9 is disjoint from all earlier corpora (one documented slip)") {
    // sid 38 duplicates golden sid 1236 — a blind-authoring slip documented
    // in the resource header; it is the ONLY allowed overlap.
    val allowed = Set("落ち葉を踏む音が心地よかった。")
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2)
    val overlap = JaGolden.heldoutCorpus9
      .filter { case (_, s, _) => seen.contains(s) && !allowed.contains(s) }
    assert(overlap.isEmpty, s"held-out-9 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 10: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus10
    assert(corpus.size == 40, s"held-out corpus 10 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-10 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 10 is disjoint from all earlier corpora (one documented slip)") {
    // sid 35 duplicates golden sid 1044 — a blind-authoring slip documented
    // in the resource header; it is the ONLY allowed overlap.
    val allowed = Set("夏祭りの屋台で焼きそばを買った。")
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2)
    val overlap = JaGolden.heldoutCorpus10
      .filter { case (_, s, _) => seen.contains(s) && !allowed.contains(s) }
    assert(overlap.isEmpty, s"held-out-10 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 11: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus11
    assert(corpus.size == 40, s"held-out corpus 11 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-11 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 11 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2)
    val overlap = JaGolden.heldoutCorpus11.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-11 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 12: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus12
    assert(corpus.size == 40, s"held-out corpus 12 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-12 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 12 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2)
    val overlap = JaGolden.heldoutCorpus12.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-12 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 13: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus13
    assert(corpus.size == 40, s"held-out corpus 13 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-13 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 13 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2) ++ JaGolden.heldoutCorpus12.map(_._2)
    val overlap = JaGolden.heldoutCorpus13.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-13 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 14: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus14
    assert(corpus.size == 40, s"held-out corpus 14 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-14 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 14 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2) ++ JaGolden.heldoutCorpus12.map(_._2) ++
      JaGolden.heldoutCorpus13.map(_._2)
    val overlap = JaGolden.heldoutCorpus14.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-14 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 15: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus15
    assert(corpus.size == 40, s"held-out corpus 15 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-15 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 15 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2) ++ JaGolden.heldoutCorpus12.map(_._2) ++
      JaGolden.heldoutCorpus13.map(_._2) ++ JaGolden.heldoutCorpus14.map(_._2)
    val overlap = JaGolden.heldoutCorpus15.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-15 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 16: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus16
    assert(corpus.size == 40, s"held-out corpus 16 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-16 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 16 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2) ++ JaGolden.heldoutCorpus12.map(_._2) ++
      JaGolden.heldoutCorpus13.map(_._2) ++ JaGolden.heldoutCorpus14.map(_._2) ++
      JaGolden.heldoutCorpus15.map(_._2)
    val overlap = JaGolden.heldoutCorpus16.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-16 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 17: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus17
    assert(corpus.size == 40, s"held-out corpus 17 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-17 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 17 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2) ++ JaGolden.heldoutCorpus12.map(_._2) ++
      JaGolden.heldoutCorpus13.map(_._2) ++ JaGolden.heldoutCorpus14.map(_._2) ++
      JaGolden.heldoutCorpus15.map(_._2) ++ JaGolden.heldoutCorpus16.map(_._2)
    val overlap = JaGolden.heldoutCorpus17.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-17 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 18: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus18
    assert(corpus.size == 40, s"held-out corpus 18 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-18 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 18 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2) ++ JaGolden.heldoutCorpus12.map(_._2) ++
      JaGolden.heldoutCorpus13.map(_._2) ++ JaGolden.heldoutCorpus14.map(_._2) ++
      JaGolden.heldoutCorpus15.map(_._2) ++ JaGolden.heldoutCorpus16.map(_._2) ++
      JaGolden.heldoutCorpus17.map(_._2)
    val overlap = JaGolden.heldoutCorpus18.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-18 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 19: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus19
    assert(corpus.size == 40, s"held-out corpus 19 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-19 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 19 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2) ++ JaGolden.heldoutCorpus12.map(_._2) ++
      JaGolden.heldoutCorpus13.map(_._2) ++ JaGolden.heldoutCorpus14.map(_._2) ++
      JaGolden.heldoutCorpus15.map(_._2) ++ JaGolden.heldoutCorpus16.map(_._2) ++
      JaGolden.heldoutCorpus17.map(_._2) ++ JaGolden.heldoutCorpus18.map(_._2)
    val overlap = JaGolden.heldoutCorpus19.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-19 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 20: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus20
    assert(corpus.size == 40, s"held-out corpus 20 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-20 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 20 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2) ++ JaGolden.heldoutCorpus12.map(_._2) ++
      JaGolden.heldoutCorpus13.map(_._2) ++ JaGolden.heldoutCorpus14.map(_._2) ++
      JaGolden.heldoutCorpus15.map(_._2) ++ JaGolden.heldoutCorpus16.map(_._2) ++
      JaGolden.heldoutCorpus17.map(_._2) ++ JaGolden.heldoutCorpus18.map(_._2) ++
      JaGolden.heldoutCorpus19.map(_._2)
    val overlap = JaGolden.heldoutCorpus20.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-20 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 21: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus21
    assert(corpus.size == 40, s"held-out corpus 21 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-21 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 21 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2) ++ JaGolden.heldoutCorpus12.map(_._2) ++
      JaGolden.heldoutCorpus13.map(_._2) ++ JaGolden.heldoutCorpus14.map(_._2) ++
      JaGolden.heldoutCorpus15.map(_._2) ++ JaGolden.heldoutCorpus16.map(_._2) ++
      JaGolden.heldoutCorpus17.map(_._2) ++ JaGolden.heldoutCorpus18.map(_._2) ++
      JaGolden.heldoutCorpus19.map(_._2) ++ JaGolden.heldoutCorpus20.map(_._2)
    val overlap = JaGolden.heldoutCorpus21.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-21 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 22: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus22
    assert(corpus.size == 40, s"held-out corpus 22 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-22 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 22 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2) ++ JaGolden.heldoutCorpus12.map(_._2) ++
      JaGolden.heldoutCorpus13.map(_._2) ++ JaGolden.heldoutCorpus14.map(_._2) ++
      JaGolden.heldoutCorpus15.map(_._2) ++ JaGolden.heldoutCorpus16.map(_._2) ++
      JaGolden.heldoutCorpus17.map(_._2) ++ JaGolden.heldoutCorpus18.map(_._2) ++
      JaGolden.heldoutCorpus19.map(_._2) ++ JaGolden.heldoutCorpus20.map(_._2) ++
      JaGolden.heldoutCorpus21.map(_._2)
    val overlap = JaGolden.heldoutCorpus22.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-22 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 23: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus23
    assert(corpus.size == 40, s"held-out corpus 23 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-23 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 23 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2) ++ JaGolden.heldoutCorpus12.map(_._2) ++
      JaGolden.heldoutCorpus13.map(_._2) ++ JaGolden.heldoutCorpus14.map(_._2) ++
      JaGolden.heldoutCorpus15.map(_._2) ++ JaGolden.heldoutCorpus16.map(_._2) ++
      JaGolden.heldoutCorpus17.map(_._2) ++ JaGolden.heldoutCorpus18.map(_._2) ++
      JaGolden.heldoutCorpus19.map(_._2) ++ JaGolden.heldoutCorpus20.map(_._2) ++
      JaGolden.heldoutCorpus21.map(_._2) ++ JaGolden.heldoutCorpus22.map(_._2)
    val overlap = JaGolden.heldoutCorpus23.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-23 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 24: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus24
    assert(corpus.size == 40, s"held-out corpus 24 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-24 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 24 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2) ++ JaGolden.heldoutCorpus12.map(_._2) ++
      JaGolden.heldoutCorpus13.map(_._2) ++ JaGolden.heldoutCorpus14.map(_._2) ++
      JaGolden.heldoutCorpus15.map(_._2) ++ JaGolden.heldoutCorpus16.map(_._2) ++
      JaGolden.heldoutCorpus17.map(_._2) ++ JaGolden.heldoutCorpus18.map(_._2) ++
      JaGolden.heldoutCorpus19.map(_._2) ++ JaGolden.heldoutCorpus20.map(_._2) ++
      JaGolden.heldoutCorpus21.map(_._2) ++ JaGolden.heldoutCorpus22.map(_._2) ++
      JaGolden.heldoutCorpus23.map(_._2)
    val overlap = JaGolden.heldoutCorpus24.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-24 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 25: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus25
    assert(corpus.size == 40, s"held-out corpus 25 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-25 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 25 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2) ++ JaGolden.heldoutCorpus12.map(_._2) ++
      JaGolden.heldoutCorpus13.map(_._2) ++ JaGolden.heldoutCorpus14.map(_._2) ++
      JaGolden.heldoutCorpus15.map(_._2) ++ JaGolden.heldoutCorpus16.map(_._2) ++
      JaGolden.heldoutCorpus17.map(_._2) ++ JaGolden.heldoutCorpus18.map(_._2) ++
      JaGolden.heldoutCorpus19.map(_._2) ++ JaGolden.heldoutCorpus20.map(_._2) ++
      JaGolden.heldoutCorpus21.map(_._2) ++ JaGolden.heldoutCorpus22.map(_._2) ++
      JaGolden.heldoutCorpus23.map(_._2) ++ JaGolden.heldoutCorpus24.map(_._2)
    val overlap = JaGolden.heldoutCorpus25.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-25 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }

  test("held-out corpus 26: 40 fresh-register sentences, full-sequence match") {
    val tok = new JaTokenizer()
    val corpus = JaGolden.heldoutCorpus26
    assert(corpus.size == 40, s"held-out corpus 26 must stay at 40 sentences, got ${corpus.size}")
    val failures = corpus.flatMap { case (sid, s, expected) =>
      val got = tok.tokenize(s).toSeq
      if (got == expected) None
      else Some(s"sid=$sid $s\n  expected ${expected.mkString("|")}\n  got      ${got.mkString("|")}")
    }
    assert(failures.isEmpty, s"\n${failures.size} held-out-26 mismatches:\n${failures.mkString("\n")}")
  }

  test("held-out corpus 26 is disjoint from all earlier corpora") {
    val seen = JaGolden.corpus.map(_.sentence).toSet ++
      JaGolden.heldoutCorpus.map(_._2) ++ JaGolden.heldoutCorpus2.map(_._2) ++
      JaGolden.heldoutCorpus3.map(_._2) ++ JaGolden.heldoutCorpus4.map(_._2) ++
      JaGolden.heldoutCorpus5.map(_._2) ++ JaGolden.heldoutCorpus6.map(_._2) ++
      JaGolden.heldoutCorpus7.map(_._2) ++ JaGolden.heldoutCorpus8.map(_._2) ++
      JaGolden.heldoutCorpus9.map(_._2) ++ JaGolden.heldoutCorpus10.map(_._2) ++
      JaGolden.heldoutCorpus11.map(_._2) ++ JaGolden.heldoutCorpus12.map(_._2) ++
      JaGolden.heldoutCorpus13.map(_._2) ++ JaGolden.heldoutCorpus14.map(_._2) ++
      JaGolden.heldoutCorpus15.map(_._2) ++ JaGolden.heldoutCorpus16.map(_._2) ++
      JaGolden.heldoutCorpus17.map(_._2) ++ JaGolden.heldoutCorpus18.map(_._2) ++
      JaGolden.heldoutCorpus19.map(_._2) ++ JaGolden.heldoutCorpus20.map(_._2) ++
      JaGolden.heldoutCorpus21.map(_._2) ++ JaGolden.heldoutCorpus22.map(_._2) ++
      JaGolden.heldoutCorpus23.map(_._2) ++ JaGolden.heldoutCorpus24.map(_._2) ++
      JaGolden.heldoutCorpus25.map(_._2)
    val overlap = JaGolden.heldoutCorpus26.filter { case (_, s, _) => seen.contains(s) }
    assert(overlap.isEmpty, s"held-out-26 sentences not out-of-sample: ${overlap.map(_._1).mkString(",")}")
  }
}
