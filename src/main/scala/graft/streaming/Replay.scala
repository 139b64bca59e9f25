package graft.streaming

import org.apache.spark.sql.Dataset

/** Driver-side gather for MemoryStream replay harnesses, with a HARD cap.
  *
  * Every registered query that replays a relation through a MemoryStream
  * must route its driver gather through [[bounded]] instead of calling
  * `.collect()` directly. The helper bounds driver memory *by construction*:
  * it fetches at most `max + 1` rows (a `limit` pushed into the scan, so the
  * executors never ship more than that) and fails loudly if the input held
  * more — which means an unbounded or linear-in-SF replay set can never OOM
  * the driver silently; it trips the `require` at the smallest SF that
  * exceeds the cap.
  *
  * `ReplayHygieneSpec` machine-enforces the other half of the invariant: no
  * file under `graft/queries` may contain a raw `.collect()` call at all, so
  * this helper is the only driver-gather path a registered query can take.
  *
  * SCALE CONTRACT: driver memory is O(max) at every SF. Callers must still
  * pre-filter with a deterministic, SF-independent predicate (e.g.
  * `user_id < 300`, `doc_id < 2000`) so the *content* of the replay set is
  * stable across scale factors — the cap converts a forgotten filter from a
  * silent driver OOM into a named, immediate test failure.
  */
object Replay {
  def bounded[T](ds: Dataset[T], max: Int): Array[T] = {
    require(max > 0, s"replay cap must be positive, got $max")
    val rows = ds.limit(max + 1).collect()
    require(rows.length <= max,
      s"replay set exceeds its $max-row bound (>= ${rows.length} rows): " +
        "filter the replay input with a deterministic constant-size " +
        "predicate (qs08's user_id < 300 discipline) before collecting")
    rows
  }
}
