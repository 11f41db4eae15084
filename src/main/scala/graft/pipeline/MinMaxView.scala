package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a per-group MIN/MAX (+ count) view from
  * the store's change feed — the NON-distributive complement of the
  * retraction-weighted aggregate (`pipeline_incremental_mv`).
  *
  * Sums and counts absorb a retraction by subtracting; an extremum
  * cannot: deleting the group's current minimum leaves the sketch with
  * no way to know the runner-up. The standard IVM answer (and this
  * implementation) is a PARTIAL re-aggregation fallback:
  *
  *   - insert rows fold in monotonically (`least`/`greatest`, +count)
  *     — no table access, cost ∝ the commit's delta;
  *   - a retraction that cannot touch the stored extrema (strictly
  *     inside the (min, max) interval) also folds in (−count only);
  *   - a retraction AT or BEYOND a stored extremum invalidates only
  *     its own group: that group — and only that group — is
  *     re-aggregated from the table as of that commit, which at scale
  *     is a group-pruned scan, never the table.
  *
  * The refresh loop replays the feed commit-by-commit (exactly what a
  * scheduled refresh does per commit at 100 TB; the feed delta plus
  * the invalidated groups' partitions are the only things read). The
  * returned recompute counter is the cost knob callers pin: a correct
  * maintenance run recomputes only extremum-hit groups, not every
  * group that saw a delete.
  */
object MinMaxView {

  /** Replay commits (1..head] of `store`'s feed, maintaining
    * (g, min_id, max_id, n) for `groupOf` (an expression over the
    * table columns, e.g. `pmod(col("id"), lit(8))`). Returns the
    * final view and the total number of (commit, group) partial
    * re-aggregations performed.
    */
  def maintain(store: CustomerStore, groupOf: Column): (DataFrame, Long) = {
    val headV = store.currentVersion()
    var state: DataFrame = null // (g, mn, mx, n)
    var recomputed = 0L
    for (v <- 1L to headV) {
      val w = when(col("change_type").endsWith("_pre"), -1L).otherwise(1L)
      val delta = store.feedSince(v - 1, v)
        .select(groupOf.as("g"), col("id"), w.as("w"))
      val agg = delta.groupBy(col("g")).agg(
        min(when(col("w") === 1L, col("id"))).as("ins_mn"),
        max(when(col("w") === 1L, col("id"))).as("ins_mx"),
        min(when(col("w") === -1L, col("id"))).as("del_mn"),
        max(when(col("w") === -1L, col("id"))).as("del_mx"),
        sum(col("w")).as("dn"))
      if (state == null) {
        // Genesis: the first commit can only insert into an empty view.
        state = agg.select(col("g"), col("ins_mn").as("mn"),
          col("ins_mx").as("mx"), col("dn").as("n")).localCheckpoint(true)
      } else {
        val joined = state.join(agg, Seq("g"), "full_outer")
        // A retraction invalidates its group iff it reaches a stored
        // extremum (or the group has no state — defensive, a feed
        // cannot retract from a group it never inserted into).
        val invalid = joined.filter(col("del_mn").isNotNull &&
            (col("mn").isNull ||
              col("del_mn") <= col("mn") || col("del_mx") >= col("mx")))
          .select(col("g")).localCheckpoint(true)
        recomputed += invalid.count()
        val recomputedGroups = store.asOf(v)
          .select(groupOf.as("g"), col("id"))
          .join(invalid, Seq("g"), "left_semi")
          .groupBy(col("g")).agg(min(col("id")).as("mn"),
            max(col("id")).as("mx"), count(lit(1)).as("n"))
        // Everything else folds in without touching the table:
        // least/greatest skip nulls, so untouched groups keep their
        // state and insert-only groups absorb the delta monotonically.
        val folded = joined.join(invalid, Seq("g"), "left_anti")
          .select(col("g"),
            least(col("mn"), col("ins_mn")).as("mn"),
            greatest(col("mx"), col("ins_mx")).as("mx"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"))
          .filter(col("n") > 0L)
        state = folded.unionByName(recomputedGroups).localCheckpoint(true)
      }
    }
    val view =
      if (state == null)
        store.all().select(groupOf.as("g"), col("id")).limit(0)
          .groupBy(col("g")).agg(min(col("id")).as("mn"),
            max(col("id")).as("mx"), count(lit(1)).as("n"))
      else state
    (view, recomputed)
  }
}
