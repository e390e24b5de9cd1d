package graft.ja

import java.io.{ByteArrayOutputStream, InputStream}
import java.net.{HttpURLConnection, URL}
import java.nio.charset.{CodingErrorAction, StandardCharsets}
import java.util.zip.GZIPInputStream

/** Kuromoji-format user dictionary: CSV rows
  * `surface,space-delimited segmentation,space-delimited readings,POS`.
  *
  * Reimplements the reference's two loading paths (SURVEY.md §2-A A6/A7):
  *   - const array<string> of CSV rows (KuromojiNEologdUDF.java:230–249)
  *   - HTTP(S)/file URL with gzip Accept-Encoding, 10 s connect / 60 s read
  *     timeouts, 32 MiB cap, strict UTF-8 (malformed input → error), and
  *     non-200 → error (KuromojiNEologdUDF.java:251–304, constants :71–73).
  */
object UserDict {

  final val ConnectTimeoutMs = 10000 // reference CONNECT_TIMEOUT_MS, UDF:71
  final val ReadTimeoutMs = 60000 // reference READ_TIMEOUT_MS, UDF:72
  final val MaxBytes = 32 * 1024 * 1024 // reference MAX_INPUT_STREAM_SIZE, UDF:73

  /** Parse CSV rows into entries. Rows starting with '#' and blank rows are
    * skipped (Kuromoji user-dict format).
    */
  def parse(rows: Iterable[String]): Seq[DictEntry] =
    rows.iterator
      .filter(r => r != null)
      .map(_.trim)
      .filter(r => r.nonEmpty && !r.startsWith("#"))
      .map { row =>
        val f = row.split(",", -1).map(_.trim)
        if (f.length < 4)
          throw new IllegalArgumentException(
            s"Invalid user dictionary row (expected surface,segmentation,readings,POS): '$row'")
        val surface = f(0)
        val pos = f(3)
        val segs = f(1).split("\\s+").filter(_.nonEmpty)
        val reads = f(2).split("\\s+").filter(_.nonEmpty)
        if (segs.length != reads.length)
          throw new IllegalArgumentException(
            s"Segmentation/readings length mismatch in user dictionary row: '$row'")
        if (segs.mkString != surface)
          throw new IllegalArgumentException(
            s"Segmentation does not concatenate to surface in user dictionary row: '$row'")
        val segEntries =
          if (segs.length == 1) Array.empty[DictEntry]
          else segs.map(sg => DictEntry(sg, pos, "", Array.empty))
        DictEntry(surface, pos, "", segEntries)
      }.toSeq

  /** Fetch a user dictionary from a URL with the reference's exact transfer
    * semantics, then parse. Fetched lazily per executor (first evaluate),
    * mirroring UDF:136–138.
    */
  def fetch(url: String): Seq[DictEntry] = {
    val conn = new URL(url).openConnection()
    conn.setConnectTimeout(ConnectTimeoutMs)
    conn.setReadTimeout(ReadTimeoutMs)
    conn.setRequestProperty("Accept-Encoding", "gzip")
    var in: InputStream = null
    try {
      conn match {
        case http: HttpURLConnection =>
          val code = http.getResponseCode
          if (code != HttpURLConnection.HTTP_OK)
            throw new java.io.IOException(
              s"Failed to fetch user dictionary from $url: HTTP response code $code")
        case _ => ()
      }
      in = conn.getInputStream
      if ("gzip".equalsIgnoreCase(conn.getContentEncoding)) in = new GZIPInputStream(in)
      val bytes = readCapped(in, MaxBytes, url)
      val decoder = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val text = decoder.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      parse(text.split("\r?\n").toSeq)
    } finally if (in != null) in.close()
  }

  private def readCapped(in: InputStream, cap: Int, url: String): Array[Byte] = {
    val out = new ByteArrayOutputStream(8192)
    val buf = new Array[Byte](8192)
    var total = 0
    var n = in.read(buf)
    while (n >= 0) {
      total += n
      if (total > cap)
        throw new java.io.IOException(
          s"User dictionary at $url exceeds the maximum size of $cap bytes")
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }
}
