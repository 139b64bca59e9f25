package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application — the incremental half of a 100 TB
  * corpus: snapshots are rewritten only by applying a (small) keyed
  * changelog, never recomputed (the `MERGE INTO` pattern, as plain
  * operators — no table format required). Complements
  * [[Dedup.dropDuplicatesIncremental]] (content identity) with KEY
  * identity: inserts/updates/deletes with latest-wins ordering.
  */
object Cdc {

  /** Apply a changelog to a snapshot: `opCol` in {I, U, D}, the
    * highest-`seqCol` op per key wins (ties break toward D — a delete
    * and an update at the same sequence must not resurrect the row).
    * Output schema = snapshot schema; I/U rows take the delta's values,
    * unmentioned keys pass through, D keys disappear.
    *
    * Shape: the delta collapses to one row per key via a window over its
    * OWN shuffle (delta-sized, tiny by definition), then one full-outer
    * join against the snapshot on the key — the snapshot is never
    * re-sorted or re-aggregated. */
  def applyChangelog(snapshot: DataFrame, delta: DataFrame,
      keyCols: Seq[String], seqCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty)
    val valueCols = snapshot.columns.filterNot(keyCols.contains).toSeq
    // tie order past (seq desc, delete-first): greater value tuple, then
    // greater op tag — a TOTAL order, so equal-seq winners are
    // deterministic under any partitioning (mirrors CdcStream.wins)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(Seq(col(seqCol).desc, when(col(opCol) === "D", 0).otherwise(1),
        struct(valueCols.map(col): _*).desc_nulls_last, col(opCol).desc): _*)
    val latest = delta
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select((keyCols.map(col) :+ col(opCol).as("__op")) ++
        valueCols.map(c => col(c).as(s"__d_$c")): _*)
    snapshot.join(latest, keyCols, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(keyCols.map(col) ++ valueCols.map(c =>
        when(col("__op").isNotNull, col(s"__d_$c"))
          .otherwise(col(c)).as(c)): _*)
  }

  /** The inverse of [[applyChangelog]]: diff two keyed snapshots into the
    * minimal changelog that turns `before` into `after` — op I for keys
    * only in `after`, D for keys only in `before`, U for keys whose value
    * tuple changed; unchanged keys emit nothing. This is how the delta
    * GETS MADE when the upstream can't stream changes (nightly dump
    * diffing, backfill reconciliation); replaying the emitted changelog
    * through [[applyChangelog]] reproduces `after` exactly (spec-pinned).
    * Output: (keys..., op, values... from the surviving side — the
    * `before` image for D rows).
    *
    * Shape: ONE full-outer hash join on the key and a per-row tuple
    * comparison — no window, no driver state; cost ∝ the larger
    * snapshot, output ∝ the true change volume. Null-safe equality
    * (`<=>` per column) so a null→value transition is a U, not a miss. */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty)
    val valueCols = before.columns.filterNot(keyCols.contains).toSeq
    val b = before.select(keyCols.map(col) :+ lit(true).as("__in_b") :+
      struct(valueCols.map(col): _*).as("__bv"): _*)
    val a = after.select(keyCols.map(col) :+ lit(true).as("__in_a") :+
      struct(valueCols.map(col): _*).as("__av"): _*)
    val same = valueCols.map(c => col(s"__bv.$c") <=> col(s"__av.$c"))
      .reduce(_ && _)
    b.join(a, keyCols, "full_outer")
      .withColumn("op",
        when(col("__in_b").isNull, "I")
          .when(col("__in_a").isNull, "D")
          .when(same, lit(null: String))
          .otherwise("U"))
      .filter(col("op").isNotNull)
      .select(keyCols.map(col) ++ Seq(col("op")) ++ valueCols.map(c =>
        when(col("op") === "D", col(s"__bv.$c"))
          .otherwise(col(s"__av.$c")).as(c)): _*)
  }

  /** SCD-type-2 history from a changelog: one validity interval per
    * change — (keys..., values..., valid_from, valid_to, is_current),
    * `valid_to` = the next change's sequence (null while current); a D op
    * closes the key's history without opening a row. One window over the
    * changelog's key shuffle; nothing touches a snapshot. */
  def scd2History(delta: DataFrame, keyCols: Seq[String], seqCol: String,
      opCol: String): DataFrame = {
    require(keyCols.nonEmpty)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    delta
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(seqCol, "valid_from")
      .drop(opCol)
  }

  /** Incremental aggregate maintenance — refresh a materialized
    * per-key (count, sum) rollup from a DELTA without rescanning the
    * base (the incremental-view economics every nightly 100 TB rollup
    * needs: cost ∝ new rows + touched keys, never history): the delta
    * aggregates to per-key partials (exact decimal sum — order-
    * independent), full-outer-merges with the base rollup, and both
    * sides' partials ADD — the mergeability that makes (count, sum)
    * partials the right materialization (avg/rate derive downstream).
    * Returns the refreshed (key, n, sum) rollup.
    *
    * Scale shape: one delta aggregation on the key + one key-partitioned
    * full-outer hash join against the (key-cardinality-sized) base
    * rollup. The base's SOURCE rows are never read. */
  def mergeAggDeltas(base: DataFrame, delta: DataFrame, keyCol: String,
      valueCol: String, nCol: String = "n",
      sumCol: String = "sum_value"): DataFrame = {
    val d = delta.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__dn"),
        sum(col(valueCol).cast("decimal(30,2)")).as("__ds"))
    base.join(d, Seq(keyCol), "full")
      .select(col(keyCol),
        (coalesce(col(nCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(nCol),
        (coalesce(col(sumCol), lit(0).cast("decimal(30,2)")) +
          coalesce(col("__ds"), lit(0).cast("decimal(30,2)")))
          .cast("decimal(30,2)").as(sumCol))
  }

  /** Changelog compaction — collapse a long changelog to its NET effect
    * per key (ship/replay one op per key instead of the whole history;
    * the Kafka-compaction semantics as an operator):
    *   - first op I, last op D  → key never existed downstream: emit
    *     nothing;
    *   - last op D (first not I) → one D;
    *   - first op I (last not D) → one I carrying the LAST values;
    *   - otherwise → one U carrying the LAST values.
    * The emitted seq is the key's max seq, so replay ordering survives.
    * Invariant (spec-pinned): applyChangelog(snapshot, compacted) ==
    * applyChangelog(snapshot, full) whenever the changelog is consistent
    * with the snapshot (I only for absent keys).
    *
    * Scale shape: one window over the delta's own key shuffle
    * (delta-sized); first/last resolve via rank in both directions. */
  def compactChangelog(delta: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty)
    val valueCols = delta.columns
      .filterNot(keyCols.contains).filterNot(Seq(seqCol, opCol).contains)
      .toSeq
    val asc = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    val desc = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc)
    delta
      .withColumn("__firstOp", first(col(opCol)).over(asc))
      .withColumn("__rnd", row_number().over(desc))
      .filter(col("__rnd") === 1)
      .withColumn("__net",
        when(col("__firstOp") === "I" && col(opCol) === "D", "X")
          .when(col(opCol) === "D", "D")
          .when(col("__firstOp") === "I", "I")
          .otherwise("U"))
      .filter(col("__net") =!= "X")
      .select(keyCols.map(col) ++ Seq(col(seqCol), col("__net").as(opCol)) ++
        valueCols.map(col): _*)
  }

  /** Point-in-time dimension enrichment — join each fact to the SCD2
    * dimension version that was VALID AT the fact's own time (the
    * training-feature form of "as of": joining today's dimension row to
    * last year's fact leaks the future): `dims` is [[scd2History]]
    * output (key…, attrs, valid_from, valid_to, is_current); a fact at
    * time t takes the interval with valid_from ≤ t < valid_to
    * (valid_to NULL = open). Facts before the key's first version keep
    * NULL attrs (left join — a fact is never dropped by enrichment).
    *
    * Scale shape: one hash equi-join on the key (per-key version counts
    * are changelog-bounded, so the equi-key already bounds the fan-out —
    * no range-binning needed), then one per-fact rank window to collapse
    * back to exactly one output row per fact: the valid interval when
    * one exists (intervals are disjoint, so at most one qualifies),
    * otherwise the fact with NULLed attrs. */
  def pitEnrich(facts: DataFrame, dims: DataFrame, keyCols: Seq[String],
      factIdCol: String, factTimeCol: String): DataFrame = {
    require(keyCols.nonEmpty)
    val t = col(factTimeCol)
    val attrCols = dims.columns
      .filterNot(keyCols.contains)
      .filterNot(Seq("valid_from", "valid_to", "is_current").contains).toSeq
    val d = dims.select(
      (keyCols.map(col) ++ attrCols.map(c => col(c).as(s"__dim_$c")) ++
        Seq(col("valid_from").as("__vf"), col("valid_to").as("__vt"))): _*)
    val ok = col("__vf").isNotNull && col("__vf") <= t &&
      (col("__vt").isNull || t < col("__vt"))
    val w = Window.partitionBy(factIdCol)
      .orderBy(when(ok, 0).otherwise(1), col("__vf").asc_nulls_last)
    facts.join(d, keyCols, "left_outer")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(facts.columns.map(col) ++
        attrCols.map(c => when(ok, col(s"__dim_$c")).as(s"dim_$c")): _*)
  }

  /** Two-master merge-conflict detection — two sites applied changes
    * independently and must reconcile (multi-master replication, offline
    * sync, branch merges-as-data): each side collapses to its latest op
    * per key under [[applyChangelog]]'s total order, then per key
    * touched by EITHER side: status `a_only` / `b_only` / `agree`
    * (both sides landed on the identical op + value tuple, null-safe) /
    * `conflict`. Returns (keys..., op_a, op_b, status) — the conflict
    * rows are the manual-review queue; `agree` rows merge mechanically.
    *
    * Shape: one window per side on its own key shuffle + ONE full-outer
    * hash join; cost ∝ the changelogs, never a snapshot. */
  def mergeConflicts(logA: DataFrame, logB: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty)
    val valueCols = logA.columns
      .filterNot((keyCols ++ Seq(seqCol, opCol)).contains).toSeq
    def latest(log: DataFrame, tag: String) = {
      val w = Window.partitionBy(keyCols.map(col): _*)
        .orderBy(Seq(col(seqCol).desc,
          when(col(opCol) === "D", 0).otherwise(1),
          struct(valueCols.map(col): _*).desc_nulls_last,
          col(opCol).desc): _*)
      log.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(keyCols.map(col) :+ col(opCol).as(s"op_$tag") :+
          struct(valueCols.map(col): _*).as(s"__v_$tag"): _*)
    }
    val same = col("op_a") === col("op_b") &&
      valueCols.map(c => col(s"__v_a.$c") <=> col(s"__v_b.$c"))
        .foldLeft(lit(true))(_ && _)
    latest(logA, "a").join(latest(logB, "b"), keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(col("op_a"), col("op_b"),
        when(col("op_b").isNull, "a_only")
          .when(col("op_a").isNull, "b_only")
          .when(same, "agree")
          .otherwise("conflict").as("status")): _*)
  }

  /** Changelog health profile — the ops-side view of a CDC feed BEFORE
    * applying it (a changelog whose update:insert ratio or per-key churn
    * suddenly shifts usually means an upstream bug, not real change):
    * per op in {I, U, D}: (op, n_ops, n_keys, max_per_key) — volume,
    * breadth, and the hottest key's op count.
    *
    * Shape: one (key, op) pre-aggregation with map-side combine, then a
    * 3-row op rollup. Never a per-key driver structure. */
  def changelogStats(delta: DataFrame, keyCols: Seq[String],
      opCol: String): DataFrame = {
    require(keyCols.nonEmpty)
    delta.groupBy((keyCols.map(col) :+ col(opCol).as("op")): _*)
      .agg(count(lit(1)).as("c"))
      .groupBy("op")
      .agg(sum("c").as("n_ops"), count(lit(1)).as("n_keys"),
        max("c").as("max_per_key"))
  }

  /** Time-travel read — reconstruct the table AS OF a past sequence
    * point from the changelog alone (no table format, no stored
    * snapshots): the latest op per key with `seqCol <= asOfSeq` wins
    * under [[applyChangelog]]'s exact total order (seq desc,
    * delete-first at equal seq, value tuple, op), D winners erase the
    * key. The missing verb of the CDC algebra here: [[applyChangelog]]
    * rolls forward, [[snapshotDiff]] derives deltas, [[compactChangelog]]
    * bounds retention, [[scd2History]] materializes all versions — this
    * answers "what did the table say on Tuesday" with one scan. Output:
    * (keys..., values...).
    *
    * Shape: the seq filter prunes at the scan, then ONE window over the
    * changelog's key shuffle — identical cost to reading the changelog
    * once. Beware compacted logs: ops older than the compaction horizon
    * are gone, so `asOfSeq` must postdate the last compaction. */
  /** Bitemporal point read — Snodgrass's two-axis question
    * [[snapshotAsOf]] can't ask: "what did the system KNOW at commit
    * time T about the state EFFECTIVE at valid time V?". A late-arriving
    * correction (high tx, low valid time) is visible only to readers
    * whose txAsOf has passed its commit — exactly how a compliance
    * re-run reproduces a historical report after backfills landed.
    * Filter tx ≤ txAsOf (knowledge horizon) and valid ≤ validAsOf
    * (effective horizon), then latest-per-key by valid time with tx as
    * the first tie-break (a later commit about the same effective
    * instant wins — the correction), then the [[applyChangelog]] total
    * order; deletes drop.
    *
    * Scale shape: both horizon filters push into the scan; one key
    * window on the key's own shuffle — the snapshotAsOf plan class with
    * a second pushed predicate. */
  def bitemporalAsOf(changelog: DataFrame, keyCols: Seq[String],
      validCol: String, txCol: String, opCol: String,
      validAsOf: Long, txAsOf: Long): DataFrame = {
    require(keyCols.nonEmpty)
    val valueCols = changelog.columns
      .filterNot((keyCols ++ Seq(validCol, txCol, opCol)).contains).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(Seq(col(validCol).desc, col(txCol).desc,
        when(col(opCol) === "D", 0).otherwise(1),
        struct(valueCols.map(col): _*).desc_nulls_last,
        col(opCol).desc): _*)
    changelog.filter(col(txCol) <= txAsOf && col(validCol) <= validAsOf)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .filter(col(opCol) =!= "D")
      .select(keyCols.map(col) ++ valueCols.map(col): _*)
  }

  def snapshotAsOf(changelog: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String, asOfSeq: Long): DataFrame = {
    require(keyCols.nonEmpty)
    val valueCols = changelog.columns
      .filterNot((keyCols ++ Seq(seqCol, opCol)).contains).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(Seq(col(seqCol).desc, when(col(opCol) === "D", 0).otherwise(1),
        struct(valueCols.map(col): _*).desc_nulls_last, col(opCol).desc): _*)
    changelog.filter(col(seqCol) <= asOfSeq)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .filter(col(opCol) =!= "D")
      .select(keyCols.map(col) ++ valueCols.map(col): _*)
  }

  /** Time-travel diff — "what changed
    * between Monday's and Tuesday's state?" as rows, not a re-read of
    * either snapshot: per key present at either horizon, `change` ∈
    * {added, removed, changed} with the old/new value columns side by
    * side (`old_<c>` / `new_<c>`); keys whose values are identical at
    * both horizons are not emitted. Value comparison is null-safe —
    * NULL→NULL is unchanged, NULL→x is changed. Both states replay
    * [[snapshotAsOf]]'s exact total order, so the diff inherits its
    * pinned tie semantics.
    *
    * Scale shape: two snapshotAsOf window passes (each ONE shuffle on
    * the key partitioning) + one full-outer hash join on the same key —
    * no extra exchange beyond the snapshots' own; output is bounded by
    * the number of keys that actually changed. */
  def timeTravelDiff(changelog: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String, seqFrom: Long, seqTo: Long)
      : DataFrame = {
    require(seqFrom <= seqTo, s"seqFrom $seqFrom > seqTo $seqTo")
    val valueCols = changelog.columns
      .filterNot((keyCols ++ Seq(seqCol, opCol)).contains).toSeq
    require(valueCols.nonEmpty,
      "timeTravelDiff needs at least one value column beyond " +
        s"keys/$seqCol/$opCol (a key-only changelog has no changed/" +
        "unchanged distinction — diff presence with snapshotAsOf instead)")
    val a = snapshotAsOf(changelog, keyCols, seqCol, opCol, seqFrom)
      .select(keyCols.map(col) ++
        valueCols.map(c => col(c).as(s"old_$c")): _*)
    val b = snapshotAsOf(changelog, keyCols, seqCol, opCol, seqTo)
      .select(keyCols.map(col) ++
        valueCols.map(c => col(c).as(s"new_$c")): _*)
    // explicit presence markers: an all-NULL value row must not read as
    // absent, so old_/new_ NULLs can't stand in for side membership
    val joined = a.withColumn("__in_a", lit(1))
      .join(b.withColumn("__in_b", lit(1)), keyCols.toSeq, "full_outer")
    val same = valueCols
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    joined
      .withColumn("change",
        when(col("__in_a").isNull, "added")
          .when(col("__in_b").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed"))
      .filter(col("change") =!= "unchanged")
      .select(keyCols.map(col) ++ Seq(col("change")) ++
        valueCols.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c"))): _*)
  }
}
