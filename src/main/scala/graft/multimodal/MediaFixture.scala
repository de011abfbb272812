package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}

/** Deterministic image-corpus generator for the multimodal oracles: the
  * container ships no real media, so the fixture derives every image
  * CLOSED-FORM from its id — dimensions, per-pixel RGB, container format,
  * and a corruption slice — and encodes REAL PNG/BMP/JPEG bytes with
  * `javax.imageio`. Because the ground truth is arithmetic on the id, the
  * DuckDB oracle recomputes the expected decode output (dims, exact
  * channel sums, histograms) without ever touching an image library: the
  * correctness gate then verifies the full encode → bytes → `ImageIO`
  * decode round trip end-to-end.
  *
  * The closed form (mirrored token-for-token by the oracle SQL in
  * [[graft.queries.Multimodal]]):
  *   - width  = 8 + id % 9, height = 8 + id % 7 (bounded so the DuckDB
  *     per-pixel list comprehensions stay cheap at oracle scale)
  *   - pixel p (row-major, 0-based): r = (id + 3p) % 256,
  *     g = (2·id + 5p) % 256, b = (3·id + 7p) % 256
  *   - format: id % 4 == 3 → jpg, == 2 → bmp, else png
  *   - corruption: id % 13 == 5 → payload truncated to its first 8 bytes
  *     (magic survives, decode cannot — the skip-and-count path)
  *
  * Encoding runs as a narrow `mapPartitions` (the same no-shuffle shape
  * as the decode operators); JPEG is encoded from TYPE_INT_RGB so the
  * writer never sees an alpha channel it would reject.
  */
object MediaFixture {

  // heap-backed ImageIO streams — see the MediaOps note (file-backed
  // caches cost a temp file per encoded image)
  ImageIO.setUseCache(false)

  def fmtFor(id: Long): String =
    (id % 4) match { case 3 => "jpg"; case 2 => "bmp"; case _ => "png" }

  def isCorrupt(id: Long): Boolean = id % 13 == 5

  def widthFor(id: Long): Int = (8 + id % 9).toInt
  def heightFor(id: Long): Int = (8 + id % 7).toInt

  /** Encode one deterministic image; requires id >= 0 (the % closed form
    * and the oracle's mirror both assume nonnegative ids).
    */
  def encode(id: Long): Array[Byte] = {
    require(id >= 0, s"MediaFixture ids must be nonnegative, got $id")
    val w = widthFor(id)
    val h = heightFor(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < w * h) {
      val r = ((id + 3L * p) % 256).toInt
      val g = ((2L * id + 5L * p) % 256).toInt
      val b = ((3L * id + 7L * p) % 256).toInt
      img.setRGB(p % w, p / w, (r << 16) | (g << 8) | b)
      p += 1
    }
    val out = new ByteArrayOutputStream()
    val wrote = ImageIO.write(img, fmtFor(id), out)
    require(wrote, s"no ImageIO writer for ${fmtFor(id)}")
    val bytes = out.toByteArray
    if (isCorrupt(id)) java.util.Arrays.copyOf(bytes, 8) else bytes
  }

  /** (id BIGINT, media BINARY) fixture frame from an id column — a
    * narrow map over the input, no shuffle.
    */
  def mediaTable(ids: Dataset[Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map(id => (id, encode(id)))).toDF("id", "media")
  }
}
