package graft

import graft.functions.{BloomBitsAgg, HllEstimateAgg}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based fuzz of the deterministic sketch aggregates' merge
  * algebra — the exact properties that make q20/dd12 reproducible
  * across any partitioning: register max-merge and bitmap OR-merge
  * must be commutative, associative and idempotent, and the Bloom
  * filter must NEVER false-negative. Driven through the aggregate
  * objects' pure state math (buffers + update/merge/eval) so the
  * properties hold for any row routing Spark could choose.
  */
object SketchProps extends Properties("Sketches") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(500)

  // 60-bit hashes, the aggregates' declared input domain
  private val genHash: Gen[Long] = Gen.chooseNum(0L, (1L << 60) - 1)
  private val genHashes: Gen[List[Long]] = Gen.listOf(genHash)

  // ------------------------------------------------------------- HLL
  // drive the same register math the aggregate executes, on plain
  // arrays (update() needs an InternalRow; the register transition is
  // what the properties quantify)
  private def hllUpdate(buf: Array[Byte], h: Long): Array[Byte] = {
    val bucket = (h >>> (60 - HllEstimateAgg.P)).toInt & (HllEstimateAgg.M - 1)
    val w = h & HllEstimateAgg.WindowMask
    val rho =
      if (w == 0L) (HllEstimateAgg.WindowBits + 1).toByte
      else (java.lang.Long.numberOfLeadingZeros(w) -
        (64 - HllEstimateAgg.WindowBits) + 1).toByte
    if (rho > buf(bucket)) buf(bucket) = rho
    buf
  }
  private def hllOf(hs: Seq[Long]): Array[Byte] =
    hs.foldLeft(new Array[Byte](HllEstimateAgg.M))(hllUpdate)
  private def hllMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => if (x > y) x else y }

  property("hll: split-merge equals single-pass for any split point") =
    forAll(genHashes, Gen.chooseNum(0, 100)) { (hs, cut) =>
      val i = if (hs.isEmpty) 0 else cut % (hs.length + 1)
      val (l, r) = hs.splitAt(i)
      hllMerge(hllOf(l), hllOf(r)).sameElements(hllOf(hs))
    }

  property("hll: merge is commutative and idempotent") =
    forAll(genHashes, genHashes) { (a, b) =>
      val (sa, sb) = (hllOf(a), hllOf(b))
      hllMerge(sa, sb).sameElements(hllMerge(sb, sa)) &&
        hllMerge(sa, sa).sameElements(sa)
    }

  property("hll: permutation-invariant registers") =
    forAll(genHashes, Gen.long) { (hs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(hs)
      hllOf(shuffled).sameElements(hllOf(hs))
    }

  property("hll: rho stays in [1, 53] for any hash") =
    forAll(genHash) { h =>
      val buf = hllOf(Seq(h))
      val rho = buf.max
      rho >= 1 && rho <= (HllEstimateAgg.WindowBits + 1)
    }

  // ----------------------------------------------------------- Bloom
  private def positions(h: Long): Seq[Int] = {
    val b = BloomBitsAgg.DefaultBits
    val h1 = h % b
    val h2 = 1L + (h / b) % (b - 1)
    (0 until BloomBitsAgg.K).map(i => ((h1 + i * h2) % b).toInt)
  }
  private def bloomOf(hs: Seq[Long]): Array[Long] =
    hs.foldLeft(new Array[Long](BloomBitsAgg.Words)) { (buf, h) =>
      positions(h).foreach(p => buf(p >> 6) |= 1L << (p & 63))
      buf
    }
  private def hits(buf: Array[Long], h: Long): Boolean =
    positions(h).forall(p => (buf(p >> 6) & (1L << (p & 63))) != 0L)

  property("bloom: never false-negative") =
    forAll(genHashes) { hs =>
      val buf = bloomOf(hs)
      hs.forall(h => hits(buf, h))
    }

  property("bloom: split-merge equals single-pass for any split point") =
    forAll(genHashes, Gen.chooseNum(0, 100)) { (hs, cut) =>
      val i = if (hs.isEmpty) 0 else cut % (hs.length + 1)
      val (l, r) = hs.splitAt(i)
      bloomOf(l).zip(bloomOf(r)).map { case (x, y) => x | y }
        .sameElements(bloomOf(hs))
    }

  property("bloom: probe positions are in range and deterministic") =
    forAll(genHash) { h =>
      val ps = positions(h)
      ps.length == BloomBitsAgg.K &&
        ps.forall(p => p >= 0 && p < BloomBitsAgg.DefaultBits) &&
        ps == positions(h)
    }

  property("bloom: empty filter hits nothing") =
    forAll(genHash) { h =>
      !hits(new Array[Long](BloomBitsAgg.Words), h)
    }

  // ------------------------------------------- model ↔ implementation
  // the properties above run on a model of the state math; these bind
  // the model to the REAL aggregates by driving update() through
  // catalyst rows — a drift between spec and implementation fails here
  private val hllAgg = HllEstimateAgg(
    org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, org.apache.spark.sql.types.LongType, nullable = true))
  private val bloomAgg = BloomBitsAgg(
    org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, org.apache.spark.sql.types.LongType, nullable = true))

  property("hll: model registers equal the real aggregate's") =
    forAll(genHashes) { hs =>
      val real = hs.foldLeft(hllAgg.createAggregationBuffer()) { (b, h) =>
        hllAgg.update(b, org.apache.spark.sql.catalyst.InternalRow(h))
      }
      real.sameElements(hllOf(hs))
    }

  property("bloom: model bitmap equals the real aggregate's") =
    forAll(genHashes) { hs =>
      val real = hs.foldLeft(bloomAgg.createAggregationBuffer()) { (b, h) =>
        bloomAgg.update(b, org.apache.spark.sql.catalyst.InternalRow(h))
      }
      real.sameElements(bloomOf(hs))
    }
}
