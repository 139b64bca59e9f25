package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming change-data-capture application — the streaming face of
  * [[graft.operators.Cdc.applyChangelog]]: a changelog stream folds into
  * per-key latest-wins state and emits one post-image change row per key
  * per micro-batch in which the key's winner changed. The batch operator
  * rewrites a snapshot once per delta; this keeps the table CONTINUOUSLY
  * current — the Delta/Debezium "apply changes" serving pattern — while
  * preserving the exact same winner rule, so replaying any changelog
  * prefix through either face lands on identical rows (spec-proven).
  */
object CdcStream {

  /** One changelog record: `op` I/U/D, `seq` the total order (a CDC LSN /
    * commit timestamp), `payload` the row image (pack value columns with
    * `to_json(struct(...))` — a stateful operator wants one stable encoder,
    * not a per-caller schema). Top-level so the state-store encoder's
    * generated code can construct it. */
  final case class CdcEvent(key: Long, op: String, seq: Long, payload: String)
  /** Current winner per key (also the initial-snapshot state shape). */
  final case class CdcState(seq: Long, op: String, payload: String)
  /** Emitted when a key's winner changes: the new post-image (op=I/U) or
    * tombstone (op=D). `materialize` turns the change stream back into a
    * table. */
  final case class CdcChange(key: Long, op: String, seq: Long, payload: String)

  /** Winner of `a` vs incoming `b` — a TOTAL order so the fold is
    * arrival-order independent (r6 ADVICE: "first-installed wins" on an
    * equal-seq U/U tie made stream/oracle parity depend on arrival
    * order): highest seq wins; on an equal seq a delete wins (a delete
    * and an update at the same sequence must not resurrect the row — the
    * [[graft.operators.Cdc.applyChangelog]] tie rule); then the greater
    * payload (null lowest), then the greater op tag. Two records equal
    * under all four are interchangeable. */
  private def rank(s: CdcState): (Long, Int, String, String) =
    (s.seq, if (s.op == "D") 1 else 0,
      Option(s.payload).getOrElse(""), Option(s.op).getOrElse(""))
  private def wins(a: CdcState, b: CdcState): CdcState = {
    import scala.math.Ordering.Implicits._
    if (rank(b) > rank(a)) b else a
  }

  /** Fold a changelog stream (columns `keyCol`: long, `opCol`: I/U/D,
    * `seqCol`: long, `payloadCol`: string) into per-key state, emitting a
    * [[CdcChange]] whenever a key's winner changes. `snapshot` (key,
    * payload) seeds the state as seq = Long.MinValue inserts, so deltas
    * apply ON TOP of an existing table exactly as the batch operator
    * does. Works unchanged on a batch DataFrame (one pass, all groups) —
    * the parity the spec pins.
    *
    * Scale shape: state is ONE (seq, op, payload) per live key — the
    * serving table itself, the minimum any upsert materialization holds;
    * back it with RocksDB at cluster scale (same config as
    * [[StreamingDedup]]). Late records older than the installed winner
    * are dropped by the winner rule, not buffered. */
  def applyChangelogStream(delta: DataFrame, keyCol: String, opCol: String,
      seqCol: String, payloadCol: String,
      snapshot: Option[DataFrame] = None): Dataset[CdcChange] = {
    val spark = delta.sparkSession
    import spark.implicits._
    val typed = delta.select(col(keyCol).cast("long").as("key"),
        col(opCol).cast("string").as("op"),
        col(seqCol).cast("long").as("seq"),
        col(payloadCol).cast("string").as("payload"))
      .as[CdcEvent]

    def fn(key: Long, rows: Iterator[CdcEvent],
        state: GroupState[CdcState]): Iterator[CdcChange] = {
      val before = state.getOption
      var cur = before.getOrElse(CdcState(Long.MinValue, "D", null))
      // wins is a total-order max, so the fold lands on the same winner
      // under ANY arrival order / partitioning — no sort needed
      rows.foreach(e => cur = wins(cur, CdcState(e.seq, e.op, e.payload)))
      if (before.contains(cur)) Iterator.empty
      else {
        state.update(cur)
        Iterator.single(CdcChange(key, cur.op, cur.seq, cur.payload))
      }
    }

    val grouped = typed.groupByKey(_.key)
    snapshot match {
      case Some(snap) =>
        val init = snap.select(col(keyCol).cast("long").as("_1"),
            struct(lit(Long.MinValue).as("seq"), lit("I").as("op"),
              col(payloadCol).cast("string").as("payload")).as("_2"))
          .as[(Long, CdcState)].groupByKey(_._1).mapValues(_._2)
        grouped.flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout, init)(fn)
      case None =>
        grouped.flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.NoTimeout)(fn)
    }
  }

  /** Materialize a collected change stream into the current table:
    * latest change per key (seq desc, delete-wins tie), tombstones
    * dropped — (key, payload). Pass the same `snapshot` given to
    * [[applyChangelogStream]] to restore pass-through keys: a snapshot
    * key the delta never touched emits no change (its state never
    * changes), so the baseline must be unioned back in (as
    * seq = Long.MinValue inserts, losing to any real change). Over any
    * replay prefix this equals
    * [[graft.operators.Cdc.applyChangelog]] on the same prefix. */
  def materialize(changes: DataFrame, snapshot: Option[DataFrame] = None,
      keyCol: String = "key", payloadCol: String = "payload"): DataFrame = {
    val base = snapshot match {
      case Some(snap) => changes.select("key", "op", "seq", "payload")
        .unionAll(snap.select(col(keyCol).cast("long").as("key"),
          lit("I").as("op"), lit(Long.MinValue).as("seq"),
          col(payloadCol).cast("string").as("payload")))
      case None => changes.select("key", "op", "seq", "payload")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("seq").desc,
        when(col("op") === "D", 0).otherwise(1),
        col("payload").desc_nulls_last, col("op").desc)
    base.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .filter(col("op") =!= "D")
      .select(col("key"), col("payload"))
  }
}
