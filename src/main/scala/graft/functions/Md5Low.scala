package graft.functions

/** Shared md5-low-bits primitive of the hashing expressions: the little-
  * endian read of the first `width/8` digest bytes — equal to DuckDB's
  * `md5_number(t) % 2^width` and to [[graft.ops.TextAnalysis.tokenHash32]]/
  * `tokenHash64`. ONE copy of the byte-order-sensitive spec; the thread-local
  * digest instance is shared by every expression on the task thread.
  */
private[functions] object Md5Low {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def digest(): java.security.MessageDigest = { val d = md5.get(); d.reset(); d }

  /** Low `width` bits of an md5 digest, little-endian. */
  def bits(dig: Array[Byte], width: Int): Long = {
    var h = 0L
    var i = width / 8 - 1
    while (i >= 0) {
      h = (h << 8) | (dig(i) & 0xffL)
      i -= 1
    }
    h
  }

  def hash(bytes: Array[Byte], width: Int): Long =
    bits(digest().digest(bytes), width)
}
