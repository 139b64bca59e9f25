package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-property tests pinning the native kernels to their
  * composable reference semantics (no Spark session needed — ArrayData
  * in/out; fixed seed keeps runs reproducible). */
class TextHashesPropSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812L)
  private val vocab = Vector("a", "b", "c", "dd", "e", "x")

  private def toks(ts: Seq[String]): ArrayData =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any])

  private def stringBigrams(ts: Seq[String]): Seq[String] =
    ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq.distinct

  private def randomDoc(): Seq[String] =
    Seq.fill(rnd.nextInt(31))(vocab(rnd.nextInt(vocab.size)))

  test("bigram_hashes cardinality == distinct string-bigram cardinality") {
    for (_ <- 1 to 300) {
      val doc = randomDoc()
      val got = TextHashes.bigramHashes(toks(doc)).toLongArray().toSeq
      assert(got.size == stringBigrams(doc).size, s"doc=$doc")
      assert(got.distinct == got) // output itself is duplicate-free
    }
  }

  test("shared bigram hashes across two docs == shared string bigrams") {
    for (_ <- 1 to 300) {
      val d1 = randomDoc()
      val d2 = randomDoc()
      val h1 = TextHashes.bigramHashes(toks(d1)).toLongArray().toSet
      val h2 = TextHashes.bigramHashes(toks(d2)).toLongArray().toSet
      val s1 = stringBigrams(d1).toSet
      val s2 = stringBigrams(d2).toSet
      assert(h1.intersect(h2).size == s1.intersect(s2).size,
        s"d1=$d1 d2=$d2")
    }
  }

  test("packed_pairs round-trips to exactly the k-choose-2 ordered pairs") {
    for (_ <- 1 to 300) {
      val ids = Seq.fill(rnd.nextInt(21))(rnd.nextLong(Int.MaxValue.toLong + 1)).distinct
      val packed = TextHashes.packedPairs(new GenericArrayData(ids.toArray))
        .toLongArray().toSeq
      val decoded = packed.map(p => (p >> 32, p & 0xFFFFFFFFL)).toSet
      val want = (for {
        i <- ids.indices; j <- ids.indices if i != j && ids(i) < ids(j)
      } yield (ids(i), ids(j))).toSet
      assert(decoded == want)
      assert(packed.size == want.size)
      assert(decoded.forall { case (a, b) => a < b })
    }
  }
}
