package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted media features — opaque binary in, typed metadata out. */
final case class MediaFeatures(
    id: Long,
    byte_len: Int,
    fmt: String,
    width: Int,
    height: Int,
    n_frames: Int,
    feat_sum: Long)

/** Multimodal-column plumbing (SURVEY.md §2-C): image/audio/video travel as
  * opaque `binary` columns; decode/feature-extract runs batch-wise inside
  * `mapPartitions`, the Scala analogue of a Pandas UDF — per-partition
  * iterator in, iterator out, with decoder state initialized once per
  * partition (the pattern that amortizes a real model/codec load across the
  * partition at 100 TB scale).
  *
  * The decode itself is a STUB: no image/audio codec ships in this
  * environment, so `decodeStub` computes a deterministic fake from the raw
  * bytes. Everything around it — schema, encoder, partition batching,
  * feature shape — is real and oracle-tested.
  */
object Multimodal {

  /** STUB decoder — deterministic fake standing in for a real codec
    * (e.g. JPEG decode + CNN feature head). Replace the body, keep the
    * signature.
    */
  def decodeStub(bytes0: Array[Byte]): (String, Int, Int, Int, Long) = {
    // null media columns are common in curation tables: decode as empty
    // rather than failing the task
    val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
    val n = bytes.length // raw byte length (DuckDB oracle: strlen)
    val fmt = (n % 3) match {
      case 0 => "png"
      case 1 => "jpg"
      case _ => "webp"
    }
    // "features" = first 4 code points of the UTF-8 decode — char-based so
    // the SQL oracle (unicode() over substr) agrees on non-ASCII payloads
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    var featSum = 0L
    var i = 0
    var taken = 0
    while (i < s.length && taken < 4) {
      val cp = s.codePointAt(i)
      featSum += cp
      i += Character.charCount(cp)
      taken += 1
    }
    (fmt, 1 + n % 64, 1 + (n * 7) % 64, 1 + n % 8, featSum)
  }

  /** Batch feature extraction over a binary column. */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec/model handle)
        it.map { case (id, bytes0) =>
          val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
          val (fmt, w, h, frames, featSum) = decodeStub(bytes)
          MediaFeatures(id, bytes.length, fmt, w, h, frames, featSum)
        }
      }
  }
}
