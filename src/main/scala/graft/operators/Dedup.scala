package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public deduplication API over a document table (builder contract:
  * first-class training-data operators). Every method returns a plain
  * DataFrame plan — no driver materialization — and each is verified
  * end-to-end by the DuckDB oracle gate (qd04/qd05/qd06/qd09 invoke
  * these with the gate's parameters).
  *
  * Scale stance (100 TB): all pairwise work is blocked — by content hash,
  * LSH band bucket, or a caller-supplied block column — so pair fan-out
  * is bounded per bucket and every stage is a hash-partitioned
  * groupBy/broadcast join. Shuffled keys in the hot paths are fixed-width
  * longs via the native kernels in [[graft.functions.TextHashes]].
  */
object Dedup {

  private def toks(c: Column): Column = split(c, " ")

  /** Exact duplicate groups by content hash: (content_hash, n_copies,
    * keeper_id = min id). One shuffle. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(idCol).as("keeper_id"))
      .filter(col("n_copies") > 1)

  /** MinHash signatures: `numHashes` salted-md5 min-hashes over the
    * distinct token set, columns mh0..mh{n-1}. Lexicographic min over hex
    * strings is a total order identical in any engine (oracle-stable). */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 4): DataFrame = {
    val tok = df.select(col(idCol),
      explode(array_distinct(toks(col(textCol)))).as("tok"))
    val aggs = (0 until numHashes).map(i =>
      min(md5(concat(lit(s"s${i}_"), col("tok")))).as(s"mh$i"))
    tok.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH banding candidate pairs: (id_a, id_b), id_a < id_b,
    * distinct across bands. Band buckets expand pairs in-row via the
    * native packed_pairs kernel (ids must fit 31 bits) — one groupBy, no
    * self-join. At larger scale, cap runaway buckets before expansion
    * with e.g. `.filter(size(col("ds")) < maxBucket)`. */
  def lshCandidatePairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val spark = df.sparkSession
    graft.functions.TextHashes.register(spark)
    val sig = minhashSignatures(df, textCol, idCol, numHashes)
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i"))
      sig.select(col(idCol), md5(concat(cols: _*)).as("band"))
    }.reduce(_ unionAll _)
    bands.groupBy("band")
      .agg(collect_list(col(idCol).cast("long")).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(expr("packed_pairs(ds)")).as("pair")).distinct()
      .select(shiftright(col("pair"), 32).as("id_a"),
        col("pair").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"))
  }

  /** Word-bigram Jaccard similarity for every overlapping pair within a
    * block: (block, id_a, id_b, inter, na, nb, jacc). Shingles are 64-bit
    * hashes inside the row (native bigram_hashes); bucket pair expansion
    * is packed longs; per-doc sizes rejoin via broadcast. */
  def bigramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      blockCol: String): DataFrame = {
    val spark = df.sparkSession
    graft.functions.TextHashes.register(spark)
    val docs = df
      .select(col(blockCol).as("block"), col(idCol).cast("long").as("id"),
        expr(s"bigram_hashes(split($textCol, ' '))").as("grams"))
      .withColumn("ng", size(col("grams")))
    val g = docs.select(col("block"), col("id"), explode(col("grams")).as("gram"))
    val buckets = g.groupBy("block", "gram")
      .agg(collect_list(col("id")).as("ds"))
      .filter(size(col("ds")) > 1)
    val inter = buckets
      .select(col("block"), explode(expr("packed_pairs(ds)")).as("pair"))
      .groupBy("block", "pair").agg(count(lit(1)).as("inter"))
      .select(col("block"), shiftright(col("pair"), 32).as("id_a"),
        col("pair").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"), col("inter"))
    val sizes = docs.select(col("id"), col("ng"))
    inter
      .join(broadcast(sizes.select(col("id").as("id_a"), col("ng").as("na"))), "id_a")
      .join(broadcast(sizes.select(col("id").as("id_b"), col("ng").as("nb"))), "id_b")
      .withColumn("jacc",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
  }
}
