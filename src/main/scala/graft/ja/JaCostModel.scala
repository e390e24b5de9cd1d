package graft.ja

/** Loader for the corpus-trained connection model written by JaCostTrain
  * (resources/graft/ja/conn_trained.tsv). Format, one record per line:
  *
  *   conn<TAB>left<TAB>right<TAB>cost
  *   eos<TAB>left<TAB>cost
  *
  * Class indices are JaCosts' connection classes. Every (left, right) cell
  * and every eos entry must be present (the trainer writes the complete
  * model, including hand-prior fallback rows for unseen classes), so a
  * partial file is a build error, not a silent half-trained matrix.
  */
private[ja] object JaCostModel {

  def loadTrained(numClasses: Int): Option[(Array[Array[Int]], Array[Int])] = {
    val in = getClass.getResourceAsStream("/graft/ja/conn_trained.tsv")
    if (in == null) return None
    val conn = Array.fill(numClasses, numClasses)(Int.MinValue)
    val eos = Array.fill(numClasses)(Int.MinValue)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).foreach { l =>
        val f = l.split('\t')
        f(0) match {
          case "conn" => conn(f(1).toInt)(f(2).toInt) = f(3).toInt
          case "eos" => eos(f(1).toInt) = f(2).toInt
          case other => sys.error(s"conn_trained.tsv: unknown record type '$other'")
        }
      }
    } finally src.close()
    val missing = (for {
      l <- 0 until numClasses; r <- 0 until numClasses
      if conn(l)(r) == Int.MinValue
    } yield s"conn($l,$r)") ++
      (0 until numClasses).collect { case l if eos(l) == Int.MinValue => s"eos($l)" }
    require(missing.isEmpty,
      s"conn_trained.tsv is incomplete: ${missing.take(5).mkString(", ")} (${missing.size} cells)")
    Some((conn, eos))
  }
}
