package graft

import graft.core.Ulid
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class Fnv1a32Spec extends AnyFunSuite {
  // Golden values computed with the standard FNV-1a 32-bit algorithm
  // (the reference delegates to Go stdlib hash/fnv; util/common.go:40-56
  // then clears the sign bit).
  val golden = Seq(
    "" -> 18652613, "a" -> 1678518572, "Account" -> 1509466876,
    "hello world" -> 1435189159, "01ARZ3NDEKTSV4RRFFQ69G5FAV" -> 1543523712,
    "Paulo" -> 984763476)

  test("scala hash matches golden FNV-1a32 values") {
    golden.foreach { case (s, h) =>
      assert(graft.functions.Fnv1a32.hashString(s) == h, s"for '$s'")
    }
  }

  test("catalyst expression matches golden values") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = golden.map(_._1).toDF("s")
      .withColumn("h", graft.functions.fnv1a32(col("s")))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    golden.foreach { case (s, h) => assert(got(s) == h) }
  }

  test("hash is always non-negative (randomized)") {
    val rnd = new Random(42)
    (1 to 5000).foreach { _ =>
      val s = rnd.nextString(rnd.nextInt(40))
      assert(graft.functions.Fnv1a32.hashString(s) >= 0)
    }
  }

  test("partition assignment is stable: Scala-side == Catalyst-side for random ids (FIXTURES §4)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new Random(7)
    val ids = (1 to 1000).map(_ => rnd.alphanumeric.take(26).mkString)
    val scalaSide = ids.map(id =>
      id -> (Math.floorMod(graft.functions.Fnv1a32.hashString(id), 8) + 1)).toMap
    val columnSide = ids.toDF("id")
      .select(col("id"),
        graft.functions.calc_partition(graft.functions.fnv1a32(col("id")), 8).as("p"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(scalaSide == columnSide)
    // every partition is within range and the split selector covers disjointly
    assert(columnSide.values.forall(p => p >= 1 && p <= 8))
  }
}

class UlidSpec extends AnyFunSuite {
  test("zero ULID") {
    assert(Ulid.timeOnly(0L) == "00000000000000000000000000")
  }

  test("encode/decode round trip (randomized)") {
    val rnd = new Random(42)
    (1 to 2000).foreach { _ =>
      val entropy = new Array[Byte](10); rnd.nextBytes(entropy)
      val t = math.abs(rnd.nextLong()) & ((1L << 48) - 1)
      val s = Ulid.encode(t, entropy)
      assert(s.length == 26)
      assert(Ulid.timestampMs(s) == t)
      assert(Ulid.encodeBytes(Ulid.decodeBytes(s)) == s)
    }
  }

  test("lexicographic order equals time order (randomized)") {
    val rnd = new Random(7)
    (1 to 2000).foreach { _ =>
      val a = math.abs(rnd.nextLong()) & ((1L << 48) - 1)
      val b = math.abs(rnd.nextLong()) & ((1L << 48) - 1)
      val (sa, sb) = (Ulid.timeOnly(a), Ulid.timeOnly(b))
      assert((a compare b).sign == (sa compare sb).sign)
    }
  }

  test("monotonic generator is strictly increasing even with a stuck clock") {
    val gen = new Ulid.Generator(seed = Some(42L))
    val now = 1700000000000L
    val ids = (1 to 1000).map(_ => gen.next(now)) // same millisecond every call
    assert(ids == ids.sorted)
    assert(ids.distinct.size == ids.size)
  }

  test("generatorAfter starts strictly after the seed instant (+1ms skew guard)") {
    val t = java.time.Instant.ofEpochMilli(1700000000000L)
    val gen = Ulid.generatorAfter(t, seed = Some(1L))
    // Clock far behind the seed time: id must still be at seed+1ms.
    val id = gen.next(1600000000000L)
    assert(Ulid.timestampMs(id) == 1700000000001L)
  }

  test("offsetTime shifts only the time component") {
    val gen = new Ulid.Generator(seed = Some(7L))
    val id = gen.next(1700000000000L)
    val shifted = Ulid.offsetTime(id, -60000L)
    assert(Ulid.timestampMs(shifted) == 1700000000000L - 60000L)
    assert(shifted.substring(10) == id.substring(10)) // entropy intact
  }

  test("ulid_millis expression extracts the timestamp") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = new Ulid.Generator(seed = Some(9L))
    val pairs = (1 to 50).map(i => (gen.next(1700000000000L + i * 1000L), 1700000000000L + i * 1000L))
    val got = pairs.map(_._1).toDF("id")
      .withColumn("ms", graft.functions.ulid_millis(col("id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    pairs.foreach { case (id, ms) => assert(got(id) == ms) }
  }
}
