package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture over keyed snapshots (beyond-reference,
  * SURVEY.md §2.8 versioning): [[diff]] classifies what changed
  * between two versions of a table, [[applyDiff]] replays such a
  * changeset onto the old version — together the derive/apply halves
  * of every MERGE-style snapshot-promotion pipeline, satisfying
  * `applyDiff(v1, diff(v1, v2)) == v2` exactly (property-checked in
  * ExtSpec; x153 judges the identity against the real v2).
  *
  * Scale shape: each half is ONE full-outer join on the snapshot key —
  * the shuffle carries (key, value) pairs only, unchanged rows never
  * appear in a changeset, and nothing ever sorts or collects globally.
  * At 100 TB this is the standard CDC merge: both sides hash-partition
  * by key and every decision (insert / update / delete / carry-over)
  * is a per-row coalesce inside the join task.
  */
object Cdc {

  /** Classify `v2` against `v1` on unique `key`: one row per key whose
    * presence or `value` changed — status added / removed / changed,
    * with both versions' values (null on the absent side). Presence is
    * decided by join-side MARKER columns and values compared with
    * null-safe equality, so a NULL value never masquerades as an
    * absent row: NULL-valued keys classify by presence, and x -> NULL /
    * NULL -> x transitions are 'changed' — `applyDiff(v1, diff(v1,
    * v2)) == v2` holds for nullable value columns of ANY type
    * (property-checked in ExtSpec). Unchanged keys (null-safe equal)
    * are dropped inside the join. */
  def diff(v1: DataFrame, v2: DataFrame, key: String,
           value: String): DataFrame = {
    val a = v1.select(col(key), col(value).as("__c1"), lit(1).as("__p1"))
    val b = v2.select(col(key), col(value).as("__c2"), lit(1).as("__p2"))
    a.join(b, Seq(key), "full_outer")
      .select(col(key),
        when(col("__p1").isNull, "added")
          .when(col("__p2").isNull, "removed")
          .when(!(col("__c1") <=> col("__c2")), "changed").as("status"),
        col("__c1").as(s"${value}_v1"),
        col("__c2").as(s"${value}_v2"))
      .where(col("status").isNotNull)
  }

  /** Replay a [[diff]]-shaped changeset onto `v1`, reconstructing the
    * next version: removed keys are dropped, changed keys take their
    * new value, added keys are inserted, untouched keys carry over —
    * one keyed full-outer + per-row coalesce. */
  def applyDiff(v1: DataFrame, changes: DataFrame, key: String,
                value: String): DataFrame = {
    val base = v1.select(col(key), col(value).as("__old"))
    val ch = changes.select(col(key), col("status"),
      col(s"${value}_v2").as("__new"))
    base.join(ch, Seq(key), "full_outer")
      .where(col("status").isNull || col("status") =!= "removed")
      .select(col(key),
        when(col("status").isNotNull, col("__new"))
          .otherwise(col("__old")).as(value))
  }

  /** THREE-WAY merge of two divergent snapshots against their common
    * base — the data-branching counterpart of a VCS merge: branches
    * `a` and `b` both evolved from `base`; keys changed on ONE side
    * take that side, keys changed identically on both sides converge,
    * and keys changed DIFFERENTLY are conflicts that keep the base
    * state (never silently pick a winner). "Changed" is the [[diff]]
    * classification (presence + null-safe value inequality), so
    * add/remove/update conflicts all surface: a removed-vs-updated
    * key is a conflict exactly like two different updates.
    *
    * One 3-way full-outer join on the key (presence markers per
    * side), per-row classification — the same single-shuffle
    * discipline as diff/applyDiff. Output: one row per key whose
    * merged state is present, PLUS every conflict row regardless of
    * merged presence (an add-add conflict reverts to the absent base
    * state and would otherwise vanish) — (key, status ∈ {unchanged,
    * a_only, b_only, both_same, conflict}, value — the MERGED value,
    * null when the merged state is absent, present flag). */
  def threeWayMerge(base: DataFrame, a: DataFrame, b: DataFrame,
                    key: String, value: String): DataFrame = {
    val v0 = base.select(col(key), col(value).as("__c0"), lit(1).as("__p0"))
    val va = a.select(col(key), col(value).as("__ca"), lit(1).as("__pa"))
    val vb = b.select(col(key), col(value).as("__cb"), lit(1).as("__pb"))
    val j = v0.join(va, Seq(key), "full_outer")
      .join(vb, Seq(key), "full_outer")
    val chA = !(col("__p0").isNotNull <=> col("__pa").isNotNull) ||
      !(col("__c0") <=> col("__ca"))
    val chB = !(col("__p0").isNotNull <=> col("__pb").isNotNull) ||
      !(col("__c0") <=> col("__cb"))
    val sameAB = (col("__pa").isNotNull <=> col("__pb").isNotNull) &&
      (col("__ca") <=> col("__cb"))
    j.select(col(key),
        when(!chA && !chB, "unchanged")
          .when(chA && !chB, "a_only")
          .when(!chA && chB, "b_only")
          .when(sameAB, "both_same")
          .otherwise("conflict").as("status"),
        when(!chA && !chB, col("__c0"))
          .when(chA && !chB, col("__ca"))
          .when(!chA && chB, col("__cb"))
          .when(sameAB, col("__ca"))
          .otherwise(col("__c0")).as(value),
        when(!chA && !chB, col("__p0").isNotNull)
          .when(chA && !chB, col("__pa").isNotNull)
          .when(!chA && chB, col("__pb").isNotNull)
          .when(sameAB, col("__pa").isNotNull)
          .otherwise(col("__p0").isNotNull).as("present"))
      // conflicts must ALWAYS surface: an add-add conflict (key absent
      // from base, added divergently on both branches) reverts to the
      // absent base state — present=false — and a bare present filter
      // would silently swallow the very row the caller must resolve
      .where(col("present") || col("status") === "conflict")
      .select(col(key), col("status"), col(value), col("present"))
  }
}
