package graft.tools

import graft.ja.{JaGolden, JaMode, JaTokenizer}

/** Single-thread tokenizer kernel micro-benchmark — the feedback loop for
  * per-row cost work (VERDICT r2 "Next round" #2: q47/q51 regressed with
  * unchanged plan shapes, so the fix target is sentences/second on one core,
  * not query wall-clock). Runs the golden corpus sentences in a loop after a
  * JIT warmup and reports sentences/s and chars/s; also times the mixed
  * ASCII path (documents.parquet-style text) since q47 tokenizes ASCII.
  */
object TokBench {

  private def bench(name: String, tok: JaTokenizer, lines: Array[String], iters: Int): Unit = {
    var sink = 0 // defeat dead-code elimination
    var i = 0
    while (i < iters / 10) { lines.foreach(l => sink += tok.tokenize(l).length); i += 1 }
    val t0 = System.nanoTime()
    i = 0
    while (i < iters) { lines.foreach(l => sink += tok.tokenize(l).length); i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    val sentences = iters.toLong * lines.length
    val chars = iters.toLong * lines.map(_.length.toLong).sum
    println(f"$name%-10s ${sentences / sec}%,12.0f sentences/s ${chars / sec}%,14.0f chars/s (sink=$sink)")
  }

  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toInt else 2000
    val ja = JaGolden.corpus.map(_.sentence).toArray
    val ascii = Array(
      "the quick brown fox jumps over the lazy dog near the river bank",
      "machine learning models require large amounts of training data",
      "spark executes queries as distributed stages over partitioned files",
      "tokenization quality drives downstream deduplication accuracy")
    bench("ja/NORMAL", new JaTokenizer(), ja, iters)
    bench("ja/SEARCH", new JaTokenizer(mode = JaMode.Search), ja, iters)
    bench("ascii", new JaTokenizer(), ascii, iters * 10)
  }
}
