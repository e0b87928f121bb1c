package graft.core

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** The tar reader must accept exactly the archives the writer
  * produces and REJECT truncation — unpack-then-swap callers treat a
  * clean read as "the whole archive arrived", so a truncated stream
  * read as complete installs a silently partial model.
  */
class TarSpec extends AnyFunSuite {

  private def archive(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      Tar.writeEntry(bos, name, data.length.toLong, 1700000000L,
        new ByteArrayInputStream(data))
    }
    Tar.finish(bos)
    bos.toByteArray
  }

  private def readAll(bytes: Array[Byte]): Seq[(String, Long, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Long, Array[Byte])]
    Tar.read(new ByteArrayInputStream(bytes), (name, size, in) => {
      val buf = new ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      out += ((name, size, buf.toByteArray))
    })
    out.result()
  }

  test("round-trips entries byte-for-byte") {
    val a = "alpha".getBytes("UTF-8")
    val b = Array.tabulate(1000)(_.toByte) // crosses a block boundary
    val got = readAll(archive("a.txt" -> a, "dir/b.bin" -> b))
    assert(got.map(_._1) == Seq("a.txt", "dir/b.bin"))
    assert(got(0)._3.sameElements(a) && got(1)._3.sameElements(b))
  }

  test("truncated archives throw instead of reading as complete") {
    val full = archive("a.txt" -> "alpha".getBytes, "b.txt" -> ("x" * 600).getBytes)
    // cut at a BLOCK boundary before the terminator: the old reader
    // accepted this as a clean end-of-archive
    val atBoundary = full.take(full.length - 2 * 512)
    intercept[java.io.EOFException](readAll(atBoundary))
    // cut inside an entry's data
    intercept[java.io.EOFException](readAll(full.take(600)))
    // cut inside a header
    intercept[java.io.EOFException](readAll(full.take(100)))
    // the untouched archive still reads
    assert(readAll(full).size == 2)
  }
}
