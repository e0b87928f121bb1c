package graft.core

import java.io.{InputStream, OutputStream}

/** Minimal USTAR tar writer/reader — just enough to bundle a model
  * directory into the single-file `model.tar.gz` artifact shape the
  * reference pipeline exchanges (reference: src/train/unpack_models.py:
  * 40-60 reads `model.tar.gz` members; SageMaker emits the same).
  *
  * Deliberately tiny: regular files only, relative names under 100
  * chars, fixed mtime (deterministic archives), 512-byte USTAR blocks.
  * Not a general tar implementation.
  */
object Tar {

  private val Block = 512
  private val Nul: Byte = 0

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits then a NUL terminator (classic numeric
    // field); overflow must fail fast — silently writing extra digits
    // would smear into the next header field (size ≥ 8 GiB → mtime)
    // and corrupt the archive
    require(v >= 0 && v.toOctalString.length <= width - 1,
      s"value $v does not fit a $width-byte octal tar field")
    val s = v.toOctalString.reverse.padTo(width - 1, '0').reverse
    s.getBytes("US-ASCII") :+ Nul
  }

  private def header(name: String, size: Long, mtime: Long): Array[Byte] = {
    require(name.getBytes("UTF-8").length < 100, s"tar entry name too long: $name")
    val h = new Array[Byte](Block)
    def put(off: Int, bytes: Array[Byte]): Unit =
      System.arraycopy(bytes, 0, h, off, bytes.length)
    put(0, name.getBytes("UTF-8"))
    put(100, octal(420, 8))          // mode 0644
    put(108, octal(0, 8))            // uid
    put(116, octal(0, 8))            // gid
    put(124, octal(size, 12))
    put(136, octal(mtime, 12))
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum placeholder
    h(156) = '0'                     // typeflag: regular file
    put(257, Array[Byte]('u', 's', 't', 'a', 'r', Nul, '0', '0'))
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    val chk = octal(sum, 7)          // 6 digits + NUL, then a space
    put(148, chk); h(155) = ' '
    h
  }

  /** Append one regular-file entry; `data` is fully streamed. */
  def writeEntry(out: OutputStream, name: String, size: Long, mtime: Long,
      data: InputStream): Unit = {
    out.write(header(name, size, mtime))
    val buf = new Array[Byte](64 * 1024)
    var left = size
    while (left > 0) {
      val n = data.read(buf, 0, math.min(buf.length, left).toInt)
      require(n > 0, s"tar entry $name shorter than declared size")
      out.write(buf, 0, n); left -= n
    }
    val pad = ((Block - size % Block) % Block).toInt
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** Terminate the archive (two zero blocks). */
  def finish(out: OutputStream): Unit = out.write(new Array[Byte](2 * Block))

  /** Iterate entries, invoking f(name, size, boundedStream) per file.
    * The stream handed to f reads exactly that entry's bytes; any
    * unread remainder is drained before the next entry.
    */
  def read(in: InputStream, f: (String, Long, InputStream) => Unit): Unit = {
    val h = new Array[Byte](Block)
    // clean EOF (offset 0) returns false; EOF INSIDE a block throws —
    // and the loop below additionally requires the zero-block
    // terminator before accepting EOF. Without both checks a stream
    // truncated at a block boundary (e.g. a crashed writer whose gzip
    // trailer still closed cleanly) reads as a complete archive, and
    // the unpack-then-swap callers install a model missing its tail
    // files with no error.
    def readFully(buf: Array[Byte], len: Int): Boolean = {
      var off = 0
      while (off < len) {
        val n = in.read(buf, off, len - off)
        if (n < 0) {
          if (off == 0) return false
          throw new java.io.EOFException(
            s"truncated tar: EOF inside a $len-byte block after $off bytes")
        }
        off += n
      }
      true
    }
    var done = false
    while (!done && readFully(h, Block)) {
      if (h.forall(_ == 0)) done = true // end-of-archive zero block
      else {
        val name = new String(h, 0, 100, "UTF-8").takeWhile(_ != 0.toChar)
        val sizeField = new String(h, 124, 12, "US-ASCII")
          .filter(c => c >= '0' && c <= '7')
        val size = if (sizeField.isEmpty) 0L else java.lang.Long.parseLong(sizeField, 8)
        var left = size
        val bounded: InputStream = new InputStream {
          def read(): Int =
            if (left <= 0) -1
            else { val b = in.read(); if (b >= 0) left -= 1; b }
          override def read(b: Array[Byte], off: Int, len: Int): Int =
            if (left <= 0) -1
            else {
              val n = in.read(b, off, math.min(len, left).toInt)
              if (n > 0) left -= n
              n
            }
        }
        f(name, size, bounded)
        val drain = new Array[Byte](8192)
        while (left > 0 && bounded.read(drain) >= 0) {}
        if (left > 0)
          throw new java.io.EOFException(
            s"truncated tar: entry $name ended $left bytes short of its header size")
        val pad = ((Block - size % Block) % Block).toInt
        if (pad > 0 && !readFully(new Array[Byte](pad), pad))
          throw new java.io.EOFException(s"truncated tar: EOF inside $name's padding")
      }
    }
    if (!done)
      throw new java.io.EOFException(
        "truncated tar: stream ended without the end-of-archive terminator")
  }
}
