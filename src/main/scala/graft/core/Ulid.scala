package graft.core

import java.security.SecureRandom
import java.time.Instant

/** ULID: 26-char Crockford-base32 string over 128 bits — 48-bit millisecond
  * timestamp followed by 80 bits of entropy. Lexicographic order of the
  * encoded string equals time order, which is what makes a plain `StringType`
  * event-id column range-scannable and min/max-skippable in Parquet.
  *
  * Semantics mirror the reference's event IDs (reference:
  * eventid/eventid.go:14-25,57-83 and the oklog/ulid layout) including the
  * monotonic generator's +1ms clock-skew guard
  * (eventid/eventid.go:170-201), but the implementation is independent.
  */
object Ulid {
  final val EncodedSize = 26
  private final val Alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
  private final val Decode: Array[Byte] = {
    val d = Array.fill[Byte](128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) =>
      d(c.toInt) = i.toByte
      d(c.toLower.toInt) = i.toByte
    }
    // Crockford decoding treats I/L as 1 and O as 0.
    Seq('I', 'L', 'i', 'l').foreach(c => d(c.toInt) = 1)
    Seq('O', 'o').foreach(c => d(c.toInt) = 0)
    d
  }

  /** Encode 48-bit millis + 80-bit entropy to the canonical 26-char form. */
  def encode(timeMs: Long, entropy: Array[Byte]): String = {
    require(entropy.length == 10, s"entropy must be 10 bytes, got ${entropy.length}")
    val b = new Array[Byte](16)
    b(0) = (timeMs >>> 40).toByte
    b(1) = (timeMs >>> 32).toByte
    b(2) = (timeMs >>> 24).toByte
    b(3) = (timeMs >>> 16).toByte
    b(4) = (timeMs >>> 8).toByte
    b(5) = timeMs.toByte
    System.arraycopy(entropy, 0, b, 6, 10)
    encodeBytes(b)
  }

  def encodeBytes(b: Array[Byte]): String = {
    require(b.length == 16)
    val out = new Array[Char](EncodedSize)
    // 130 bits of output over 128 bits of input: leading 2 bits are zero.
    var acc = 0L
    var accBits = 0
    var outPos = EncodedSize - 1
    var i = 15
    while (i >= 0) {
      acc |= (b(i) & 0xffL) << accBits
      accBits += 8
      while (accBits >= 5) {
        out(outPos) = Alphabet((acc & 0x1f).toInt)
        acc >>>= 5
        accBits -= 5
        outPos -= 1
      }
      i -= 1
    }
    while (outPos >= 0) {
      out(outPos) = Alphabet((acc & 0x1f).toInt)
      acc >>>= 5
      outPos -= 1
    }
    new String(out)
  }

  def decodeBytes(s: String): Array[Byte] = {
    require(s.length == EncodedSize, s"ULID must be 26 chars, got '$s'")
    val out = new Array[Byte](16)
    var acc = 0L
    var accBits = 0
    var outPos = 15
    var i = EncodedSize - 1
    while (i >= 0) {
      val c = s.charAt(i)
      val v = if (c < 128) Decode(c.toInt) else -1
      require(v >= 0, s"invalid ULID char '$c' in '$s'")
      acc |= (v & 0x1fL) << accBits
      accBits += 5
      while (accBits >= 8 && outPos >= 0) {
        out(outPos) = (acc & 0xff).toByte
        acc >>>= 8
        accBits -= 8
        outPos -= 1
      }
      i -= 1
    }
    out
  }

  /** Millisecond timestamp component (first 48 bits / first 10 chars). */
  def timestampMs(s: String): Long = {
    val b = decodeBytes(s)
    ((b(0) & 0xffL) << 40) | ((b(1) & 0xffL) << 32) | ((b(2) & 0xffL) << 24) |
      ((b(3) & 0xffL) << 16) | ((b(4) & 0xffL) << 8) | (b(5) & 0xffL)
  }

  /** ULID with the given time and zero entropy — the smallest ID at that
    * millisecond. Used to derive scan bounds (`id <= untilFor(t)` style),
    * mirroring eventid TimeOnly (reference: eventid/eventid.go:51-55).
    */
  def timeOnly(timeMs: Long): String = encode(timeMs, new Array[Byte](10))

  /** Largest ID at the given millisecond (entropy all-ones): inclusive upper
    * bound for `id <= until` scans covering the whole millisecond.
    */
  def timeMax(timeMs: Long): String = encode(timeMs, Array.fill[Byte](10)(-1))

  /** Re-stamp the time component, keeping entropy (eventid/eventid.go:89-97). */
  def offsetTime(s: String, offsetMs: Long): String = {
    val b = decodeBytes(s)
    val entropy = new Array[Byte](10)
    System.arraycopy(b, 6, entropy, 0, 10)
    encode(timestampMs(s) + offsetMs, entropy)
  }

  /** Per-thread/per-partition monotonic generator. Within one generator,
    * successive IDs are strictly increasing even if the clock goes backwards:
    * same-or-earlier millisecond increments the previous entropy instead
    * (oklog-style monotonic entropy); a fresh generator seeded "after" a known
    * instant starts at that instant + 1ms (the reference's clock-skew guard,
    * eventid/eventid.go:170-201).
    *
    * At scale: create one generator per partition inside `mapPartitions`;
    * global uniqueness comes from the 80-bit entropy seed, per-stream ordering
    * from seeding at the stream's `updatedAt + 1ms`.
    */
  final class Generator(startAfterMs: Long = 0L, seed: Option[Long] = None) {
    private val rnd = seed match {
      case Some(s) => new java.util.Random(s)
      case None => new SecureRandom()
    }
    private var lastMs: Long = startAfterMs // minimum allowed millisecond
    private var lastEntropy: Array[Byte] = null

    def next(): String = next(System.currentTimeMillis())

    def next(nowMs: Long): String = synchronized {
      val t = math.max(nowMs, lastMs)
      if (lastEntropy != null && t == lastMs) {
        incrementEntropy()
      } else {
        lastEntropy = new Array[Byte](10)
        rnd.nextBytes(lastEntropy)
        // Clear the top bit so monotonic increments have headroom.
        lastEntropy(0) = (lastEntropy(0) & 0x7f).toByte
      }
      lastMs = t
      Ulid.encode(t, lastEntropy)
    }

    private def incrementEntropy(): Unit = {
      var i = 9
      var carry = true
      while (carry && i >= 0) {
        val v = (lastEntropy(i) & 0xff) + 1
        lastEntropy(i) = (v & 0xff).toByte
        carry = v > 0xff
        i -= 1
      }
    }
  }

  def generatorAfter(t: Instant, seed: Option[Long] = None): Generator =
    new Generator(t.toEpochMilli + 1, seed)
}
