package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized validation of the round-3 graph/hash algorithms against
  * brute-force references: contraction connected components vs an
  * in-test union-find, and banded Hamming near-dup pairs vs an all-pairs
  * scan (the recall guarantee is pigeonhole — verify it holds, not just
  * on the corpus's dup structure). Fixed seed keeps runs reproducible. */
class DedupPropSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260812L)

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-root canonical form
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(v => v -> find(v)).toMap
  }

  test("duplicateClusters equals union-find on random graphs (20 cases)") {
    val s = spark
    import s.implicits._
    for (c <- 0 until 20) {
      val n = 5 + rnd.nextInt(60) // vertices
      val m = 1 + rnd.nextInt(2 * n) // edges
      val shape = rnd.nextInt(3)
      val edges = (0 until m).map { _ =>
        shape match {
          case 0 => // random
            (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
          case 1 => // chain-heavy (the near-dup worst case)
            val i = rnd.nextInt(n - 1); (i.toLong, (i + 1).toLong)
          case 2 => // star-heavy
            (rnd.nextInt(5).toLong, rnd.nextInt(n).toLong)
        }
      }.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val pairs = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
          .toDF("id_a", "id_b")
        val got = Dedup.duplicateClusters(pairs)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = unionFind(n, edges)
        assert(got == want, s"case $c (shape $shape, n=$n, m=$m)")
      }
    }
  }

  test("duplicateClusters: reliable-checkpoint mode writes checkpoint files and matches the local path") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    try {
      // two chains + an isolated pair: multiple contraction rounds
      val edges = ((0L to 6L).sliding(2).map(w => (w(0), w(1))).toSeq ++
        (10L to 14L).sliding(2).map(w => (w(0), w(1))).toSeq :+ ((20L, 21L))): Seq[(Long, Long)]
      val pairs = edges.toDF("id_a", "id_b")
      val local = Dedup.duplicateClusters(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val reliable = Dedup.duplicateClusters(pairs, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == local)
      // the reliable path genuinely persisted RDD blocks to the filesystem
      def files(p: java.io.File): Seq[java.io.File] = {
        val kids = Option(p.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(files)
      }
      assert(files(new java.io.File(dir)).nonEmpty, "no checkpoint files written")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("duplicateClusters: empty pair set yields empty labels") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.duplicateClusters(empty).collect().isEmpty)
  }

  test("hammingNearDupPairs matches brute force on random 64-bit hashes (10 cases)") {
    val s = spark
    import s.implicits._
    for (c <- 0 until 10) {
      val n = 10 + rnd.nextInt(40)
      // half the hashes cluster near a few seeds (guaranteed close pairs),
      // half are uniform
      val seeds = Array.fill(3)(rnd.nextLong())
      val hashes = (0 until n).map { i =>
        val h =
          if (i % 2 == 0) seeds(rnd.nextInt(3)) ^ (1L << rnd.nextInt(64)) ^
            (if (rnd.nextBoolean()) 1L << rnd.nextInt(64) else 0L)
          else rnd.nextLong()
        (i.toLong, h)
      }
      val df = hashes.toDF("id", "h")
      val got = Dedup.hammingNearDupPairs(df, "h", "id",
          hashBits = 64, numBands = 4, maxHamming = 3, maxBucket = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (ia, ha) <- hashes; (ib, hb) <- hashes
        if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
      } yield (ia, ib)).toSet
      assert(got == want, s"case $c: missing ${want.diff(got)}, spurious ${got.diff(want)}")
    }
  }
}
