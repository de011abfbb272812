package graft.multimodal

import java.awt.image.BufferedImage
import javax.imageio.{ImageIO, ImageReader, ImageWriter}
import javax.imageio.stream.{ImageInputStreamImpl, ImageOutputStreamImpl}

import scala.util.control.NonFatal

/** Registry-free, finalizer-free ImageIO plumbing for the media
  * operators. Two measured pathologies in the convenience API
  * (`ImageIO.read(InputStream)` / `ImageIO.write(img, fmt, out)`) break
  * it at corpus scale:
  *
  *   1. EVERY call scans the IIORegistry under a synchronized monitor
  *      (`SubRegistry.getServiceProviders`). At 32 executor threads ×
  *      millions of tiny images the monitor convoys: a thread dump
  *      mid-run showed 13/32 task threads BLOCKED on that lock, and the
  *      same video-encode pass measured 40 s cold and 234-257 s once
  *      the convoy collapsed (sf10, 462 k clips).
  *   2. Every call allocates a `MemoryCacheImage{Input,Output}Stream`,
  *      which is FINALIZABLE (`ImageInputStreamImpl.finalize`) and
  *      registers with the single-threaded `sun.java2d.Disposer` —
  *      millions of per-row registrations for streams over in-heap
  *      byte arrays that need no cleanup at all.
  *
  * The fix is the shape a production decoder uses: look the plugin up
  * ONCE per executor thread (readers keyed by sniffed format, one PNG/
  * BMP/JPEG writer each) and hand it a plain in-heap stream whose
  * trivial `finalize()` override keeps the JVM from ever enqueueing it.
  * Same plugins, same pixels, zero shared monitors on the per-row path.
  */
object MediaCodec {

  /** Seekable read-only ImageInputStream over a byte array. The empty
    * `finalize` override replaces `ImageInputStreamImpl`'s non-trivial
    * one, so instances are never registered for finalization (nothing
    * to clean: the backing store is the heap array itself).
    */
  private[multimodal] final class BytesImageInputStream(bytes: Array[Byte])
      extends ImageInputStreamImpl {
    override def read(): Int = {
      bitOffset = 0
      if (streamPos >= bytes.length) -1
      else { val v = bytes(streamPos.toInt) & 0xff; streamPos += 1; v }
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      bitOffset = 0
      if (streamPos >= bytes.length) -1
      else {
        val n = math.min(len, bytes.length - streamPos.toInt)
        System.arraycopy(bytes, streamPos.toInt, b, off, n)
        streamPos += n
        n
      }
    }
    override def length(): Long = bytes.length.toLong
    override def isCached: Boolean = true
    override def isCachedMemory: Boolean = true
    @annotation.nowarn("cat=deprecation")
    override protected def finalize(): Unit = ()
  }

  /** Random-access in-heap ImageOutputStream (writers may seek back to
    * patch headers); same trivial-finalize contract as the input side.
    */
  private[multimodal] final class BytesImageOutputStream
      extends ImageOutputStreamImpl {
    private var buf = new Array[Byte](4096)
    private var size = 0
    private def ensure(cap: Long): Unit = {
      if (cap > buf.length) {
        require(
          cap <= Int.MaxValue - 8,
          s"encoded image exceeds the 2 GB single-buffer limit (need $cap bytes)")
        var n = buf.length.toLong
        while (n < cap) n *= 2
        buf = java.util.Arrays.copyOf(buf, math.min(n, Int.MaxValue - 8L).toInt)
      }
    }
    override def write(b: Int): Unit = {
      flushBits()
      ensure(streamPos + 1)
      buf(streamPos.toInt) = b.toByte
      streamPos += 1
      if (streamPos > size) size = streamPos.toInt
    }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      flushBits()
      ensure(streamPos + len)
      System.arraycopy(b, off, buf, streamPos.toInt, len)
      streamPos += len
      if (streamPos > size) size = streamPos.toInt
    }
    override def read(): Int = {
      bitOffset = 0
      if (streamPos >= size) -1
      else { val v = buf(streamPos.toInt) & 0xff; streamPos += 1; v }
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      bitOffset = 0
      if (streamPos >= size) -1
      else {
        val n = math.min(len, size - streamPos.toInt)
        System.arraycopy(buf, streamPos.toInt, b, off, n)
        streamPos += n
        n
      }
    }
    override def length(): Long = size.toLong
    def toByteArray: Array[Byte] = java.util.Arrays.copyOf(buf, size)
    @annotation.nowarn("cat=deprecation")
    override protected def finalize(): Unit = ()
  }

  // one plugin instance per executor thread per format: ImageReader /
  // ImageWriter are stateful and not thread-safe, but an executor
  // thread reuses its own across rows and partitions — the registry is
  // consulted once per (thread, format), not once per row. Pooled
  // plugins are deliberately NOT disposed at thread death: Spark
  // executor task threads live for the JVM's lifetime, and a
  // ThreadLocal death hook would reintroduce per-thread bookkeeping
  // for a handful of small native-free objects the GC reclaims anyway.
  private val readerPool =
    ThreadLocal.withInitial[java.util.HashMap[String, ImageReader]](
      () => new java.util.HashMap[String, ImageReader]())
  private val writerPool =
    ThreadLocal.withInitial[java.util.HashMap[String, ImageWriter]](
      () => new java.util.HashMap[String, ImageWriter]())

  /** Decode via the pooled reader for the sniffed format; null for
    * anything undecodable (unknown container, truncated/garbage body).
    * A reader that threw is disposed and dropped from the pool — the
    * next row gets a fresh instance rather than one in a failed state.
    */
  def decode(bytes: Array[Byte]): BufferedImage = {
    val fmt = MediaOps.sniffFormat(bytes)
    if (fmt == "unknown") return null
    val pool = readerPool.get()
    var reader = pool.get(fmt)
    if (reader == null) {
      val it = ImageIO.getImageReadersByFormatName(fmt)
      if (!it.hasNext) return null
      reader = it.next()
      pool.put(fmt, reader)
    }
    val in = new BytesImageInputStream(bytes)
    try {
      reader.setInput(in, true, true)
      val img = reader.read(0)
      // drop the stream reference so the pooled slot doesn't pin this
      // row's payload byte array until the thread's next decode
      reader.setInput(null)
      img
    } catch {
      case NonFatal(_) =>
        reader.dispose()
        pool.remove(fmt)
        null
    } finally in.close()
  }

  /** Encode via the pooled writer for the format; the returned bytes
    * are identical to `ImageIO.write(img, fmt, out)`'s (same plugin).
    */
  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val pool = writerPool.get()
    var writer = pool.get(fmt)
    if (writer == null) {
      val it = ImageIO.getImageWritersByFormatName(fmt)
      require(it.hasNext, s"no ImageIO writer for $fmt")
      writer = it.next()
      pool.put(fmt, writer)
    }
    val out = new BytesImageOutputStream
    try {
      writer.setOutput(out)
      writer.write(img)
      // same payload-pinning discipline as decode(): release the
      // output buffer reference before the slot goes idle
      writer.setOutput(null)
      out.toByteArray
    } catch {
      case NonFatal(e) =>
        writer.dispose()
        pool.remove(fmt)
        throw e
    } finally out.close()
  }
}
