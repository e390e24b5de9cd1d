package graft.tools

/** Per-executor dictionary memory audit (VERDICT r10 "Next round" #8): the
  * number behind the 100x-scale executor-sizing claim. Measures (a) the
  * serialized resource footprint (the TSVs shipped in the jar — what every
  * executor downloads with the application jar), and (b) the expanded heap
  * cost of the live tokenizer (dictionary entries + trie + scratch),
  * via forced-GC used-heap deltas on a quiet JVM. Heap deltas on a real
  * JVM are approximate (±a few MB); run on an idle heap for stable output.
  */
object DictMemAudit {

  private def usedHeap(): Long = {
    val rt = Runtime.getRuntime
    var prev = Long.MaxValue
    var cur = rt.totalMemory() - rt.freeMemory()
    var i = 0
    while (i < 8 && cur < prev) { // settle: GC until used-heap stops shrinking
      System.gc(); Thread.sleep(50)
      prev = cur; cur = rt.totalMemory() - rt.freeMemory()
      i += 1
    }
    cur
  }

  def main(args: Array[String]): Unit = {
    // (a) serialized: sum the classpath resources the dictionary loads from
    val resources = Seq(
      "/graft/ja/core.tsv", "/graft/ja/lexemes/nouns.tsv",
      "/graft/ja/lexemes/verbs.tsv", "/graft/ja/lexemes/adjectives.txt",
      "/graft/ja/lexemes/katakana.txt", "/graft/ja/lexemes/entities.tsv",
      "/graft/ja/lexemes/misc.tsv", "/graft/ja/conn_trained.tsv",
      "/graft/ja/stopwords.txt", "/graft/ja/stoptags.txt")
    val serialized = resources.map { r =>
      val in = getClass.getResourceAsStream(r)
      if (in == null) 0L
      else try {
        var n = 0L; val buf = new Array[Byte](65536)
        var k = in.read(buf)
        while (k >= 0) { n += k; k = in.read(buf) }
        n
      } finally in.close()
    }.sum

    val before = usedHeap()
    val t0 = System.nanoTime()
    val tok = new graft.ja.JaTokenizer()
    val warm = tok.tokenize("初期化の計測のための一文です。") // force full build
    val initMs = (System.nanoTime() - t0) / 1e6
    val after = usedHeap()
    val entries = graft.ja.JaDictionary.embeddedEntries.size

    println(f"[dictmem] entries=$entries%,d serialized_tsv=${serialized / 1024.0 / 1024.0}%.1f MiB " +
      f"expanded_heap=${(after - before) / 1024.0 / 1024.0}%.1f MiB cold_init=${initMs}%.0f ms " +
      s"(warm tokens=${warm.length})")
  }
}
