package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-bucket corpus state for [[StreamingDedup.nearDupPairs]] — top-level
  * so the state-store encoder's generated code can construct it. Members
  * are parallel arrays (id, hash); `saturated` marks a bucket that blew
  * past `maxBucket` and was evicted (load shedding, see the operator doc). */
final case class HamBucketState(ids: Array[Long], hhs: Array[Long],
    saturated: Boolean)

/** Per-bucket corpus state for [[StreamingDedup.lshCandidatePairs]]:
  * member ids plus their FULL minhash signatures, flattened with stride
  * `numHashes` (sig of ids(i) = flatSigs[i*numHashes, (i+1)*numHashes)). */
final case class LshBucketState(ids: Array[Long], flatSigs: Array[String],
    saturated: Boolean)

/** Ingest-time near-duplicate detection: probe each arriving document's
  * band keys against the accumulated corpus state and emit duplicate
  * pairs as they are discovered — the streaming face of
  * [[graft.operators.Dedup.hammingNearDupPairs]] /
  * [[graft.operators.Dedup.lshCandidatePairs]] (SURVEY §2.7 X5 extension;
  * the reference pipeline is batch-only, label-maker-dask has no
  * streaming surface at all).
  *
  * Mechanics: signatures band exactly like the batch operators; rows are
  * grouped by (band index, band key) so each state-store group IS one LSH
  * bucket, holding the ids+signatures of every corpus member that landed
  * in it. A new arrival compares against the bucket's members (plus
  * earlier rows of the same micro-batch, processed in id order), then
  * joins the bucket. State never expires (`NoTimeout`): dedup against
  * "the whole corpus so far" inherently needs state proportional to the
  * corpus — at cluster scale back the state store with RocksDB, i.e. set
  * `spark.sql.streaming.stateStore.providerClass` to
  * `org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
  * so state spills to executor-local disk instead of heap (exercised end
  * to end by StreamingDedupSpec's RocksDB test — identical output to the
  * batch operator under the swapped provider), and the per-bucket
  * `maxBucket` cap bounds any single group's row.
  *
  * Exactly-once pair emission WITHOUT a downstream distinct: a pair
  * within Hamming distance d < numBands agrees on >= 1 band (pigeonhole);
  * it is emitted only by the LOWEST band on which the two signatures
  * agree. Every bucket can decide this locally from the two full
  * signatures it already holds, so no cross-band coordination, no
  * retraction, and no stateful dedup stage after the flatMapGroupsWithState
  * (append-mode streaming allows none).
  *
  * `maxBucket` semantics vs batch: the batch operators drop an
  * over-`maxBucket` bucket RETROACTIVELY (no pairs at all from it); a
  * stream cannot retract, so a bucket that grows past the cap stops
  * emitting and drops its members from then on (pairs found while it was
  * small stand). Both are load-shedding on degenerate buckets
  * (boilerplate bands that pair everything with everything); results are
  * identical whenever no bucket exceeds the cap.
  *
  * Batch parity (spec-asserted): run on a non-streaming DataFrame, the
  * same code executes with empty initial state in one pass and emits
  * exactly the batch operator's rows; run on a stream split across
  * micro-batches, the union of emissions equals the batch result. */
object StreamingDedup {

  /** One signature banded for one bucket: group key is (bandIdx, bandKey). */
  final case class HamBandRow(bandIdx: Int, bandKey: Long, id: Long, hh: Long)
  final case class LshBandRow(bandIdx: Int, bandKey: String, id: Long,
      sig: Array[String])
  final case class PairOut(id_a: Long, id_b: Long, hd: Int)
  final case class CandOut(id_a: Long, id_b: Long)

  /** Streaming banded-Hamming near-dup pairs over an arbitrary long hash
    * column (SimHash, image aHash): emits (id_a, id_b, hd), id_a < id_b,
    * `hd <= maxHamming`, exactly once per pair, as soon as the later
    * document arrives. Full recall for maxHamming < numBands, same
    * pigeonhole as the batch operator. Ids must be unique per document;
    * a replayed (bucket-duplicate) id is ignored, so at-least-once
    * upstream delivery cannot double-emit. */
  def nearDupPairs(sig: DataFrame, hashCol: String, idCol: String,
      hashBits: Int = 64, numBands: Int = 4, maxHamming: Int = 3,
      maxBucket: Int = 1000): Dataset[PairOut] = {
    require(hashBits % numBands == 0, "numBands must divide hashBits")
    require(maxHamming < numBands,
      s"banding guarantees recall only for maxHamming < numBands ($numBands)")
    val spark = sig.sparkSession
    import spark.implicits._
    val bandBits = hashBits / numBands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val s = sig.select(col(idCol).cast("long").as("id"),
        col(hashCol).cast("long").as("hh"))
      .filter(col("hh").isNotNull)
    val bands = (0 until numBands).map { b =>
      s.select(lit(b).as("bandIdx"),
        shiftright(col("hh"), b * bandBits).bitwiseAND(lit(mask)).as("bandKey"),
        col("id"), col("hh"))
    }.reduce(_ unionAll _).as[HamBandRow]

    def fn(key: (Int, Long), rows: Iterator[HamBandRow],
        state: GroupState[HamBucketState]): Iterator[PairOut] = {
      val bandIdx = key._1
      var st = state.getOption.getOrElse(
        HamBucketState(Array.empty, Array.empty, saturated = false))
      if (st.saturated) return Iterator.empty
      val ids = scala.collection.mutable.ArrayBuffer(st.ids: _*)
      val hhs = scala.collection.mutable.ArrayBuffer(st.hhs: _*)
      val out = scala.collection.mutable.ArrayBuffer[PairOut]()
      val it = rows.toArray.sortBy(_.id).iterator
      var saturated = false
      while (it.hasNext && !saturated) {
        val r = it.next()
        if (!ids.contains(r.id)) {
          var i = 0
          while (i < ids.length) {
            val x = hhs(i) ^ r.hh
            val hd = java.lang.Long.bitCount(x)
            if (hd <= maxHamming) {
              // lowest band on which the two hashes agree owns the pair
              var low = 0
              while (((x >>> (low * bandBits)) & mask) != 0) low += 1
              if (low == bandIdx)
                out += PairOut(math.min(ids(i), r.id), math.max(ids(i), r.id), hd)
            }
            i += 1
          }
          ids += r.id
          hhs += r.hh
          if (ids.length > maxBucket) saturated = true
        }
      }
      if (saturated) state.update(HamBucketState(Array.empty, Array.empty, true))
      else state.update(HamBucketState(ids.toArray, hhs.toArray, false))
      out.iterator
    }

    bands.groupByKey(r => (r.bandIdx, r.bandKey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming SimHash near-dup pairs over a text column — the 16-bit
    * text-simhash convenience face of [[nearDupPairs]], banded on the two
    * 8-bit halves exactly like the batch
    * [[graft.operators.Dedup.simhashNearDupPairs]] (full recall for
    * maxHamming <= 1). The signature projection is per-row, so it runs
    * unchanged on a streaming DataFrame. */
  def simhashNearDupPairs(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 1, maxBucket: Int = 1000): Dataset[PairOut] = {
    require(maxHamming >= 0 && maxHamming <= 1,
      "2-half banding guarantees recall only for maxHamming <= 1")
    val sig = graft.operators.Text.simhash16(docs, textCol, idCol)
    nearDupPairs(sig, "simhash", idCol, hashBits = 16, numBands = 2,
      maxHamming = maxHamming, maxBucket = maxBucket)
  }

  /** Streaming MinHash + LSH banding candidate pairs: (id_a, id_b),
    * id_a < id_b, distinct across bands, emitted when the later document
    * arrives — the ingest-time face of
    * [[graft.operators.Dedup.lshCandidatePairs]] with the same band-bucket
    * keys (md5 over the band's minhash run, band index prefixed).
    *
    * Buckets GROUP by the md5 band key but pair emission re-checks real
    * band equality on the stored signatures (a hash collision can
    * co-locate two different bands' runs; it can never emit a false
    * candidate). The lowest truly-equal band owns each pair, so emissions
    * are exactly-once with no downstream distinct — same discipline as
    * [[nearDupPairs]]. Feed emissions to
    * [[graft.operators.Dedup.verifyCandidatePairs]] against the stored
    * corpus for exact-Jaccard confirmation. */
  def lshCandidatePairs(docs: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 4, rowsPerBand: Int = 2,
      maxBucket: Int = 1000): Dataset[CandOut] = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    require(maxBucket >= 2, "maxBucket must be >= 2")
    val spark = docs.sparkSession
    import spark.implicits._
    val numBands = numHashes / rowsPerBand
    val sig = graft.operators.Dedup.minhashSignatures(docs, textCol, idCol, numHashes)
    val sigArr = array((0 until numHashes).map(i => col(s"mh$i")): _*)
    val bands = (0 until numBands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i"))
      sig.select(lit(b).as("bandIdx"),
        md5(concat(lit(s"$b") +: cols: _*)).as("bandKey"),
        col(idCol).cast("long").as("id"), sigArr.as("sig"))
    }.reduce(_ unionAll _).as[LshBandRow]

    def bandEqual(a: scala.collection.IndexedSeq[String], aOff: Int,
        b: Array[String], bOff: Int, band: Int): Boolean = {
      var i = band * rowsPerBand
      val end = (band + 1) * rowsPerBand
      while (i < end) {
        if (a(aOff + i) != b(bOff + i)) return false
        i += 1
      }
      true
    }

    def fn(key: (Int, String), rows: Iterator[LshBandRow],
        state: GroupState[LshBucketState]): Iterator[CandOut] = {
      val bandIdx = key._1
      val st = state.getOption.getOrElse(
        LshBucketState(Array.empty, Array.empty, saturated = false))
      if (st.saturated) return Iterator.empty
      val ids = scala.collection.mutable.ArrayBuffer(st.ids: _*)
      val sigs = scala.collection.mutable.ArrayBuffer(st.flatSigs: _*)
      val out = scala.collection.mutable.ArrayBuffer[CandOut]()
      val it = rows.toArray.sortBy(_.id).iterator
      var saturated = false
      while (it.hasNext && !saturated) {
        val r = it.next()
        if (!ids.contains(r.id)) {
          var i = 0
          while (i < ids.length) {
            // true equality on THIS band (guards md5-key collisions), then
            // lowest-equal-band ownership for cross-band exactly-once
            if (bandEqual(sigs, i * numHashes, r.sig, 0, bandIdx)) {
              var low = 0
              while (!bandEqual(sigs, i * numHashes, r.sig, 0, low)) low += 1
              if (low == bandIdx)
                out += CandOut(math.min(ids(i), r.id), math.max(ids(i), r.id))
            }
            i += 1
          }
          ids += r.id
          sigs ++= r.sig
          if (ids.length > maxBucket) saturated = true
        }
      }
      if (saturated) state.update(LshBucketState(Array.empty, Array.empty, true))
      else state.update(LshBucketState(ids.toArray, sigs.toArray, false))
      out.iterator
    }

    bands.groupByKey(r => (r.bandIdx, r.bandKey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
