package graft.expressions

/** Lowercase hex encoding of a 16-byte digest, shared by the MinHash
  * expressions. Byte-for-byte order-preserving (00→"00" … ff→"ff"): the
  * hex-string order the DuckDB oracle's varchar min uses equals unsigned
  * lexicographic order on the raw digests.
  */
private[expressions] object HexBytes {
  private val hexDigits = "0123456789abcdef".toCharArray

  def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
