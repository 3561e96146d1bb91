package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-diff (CDC derivation): given two versions of a keyed table,
  * emit the insert/update/delete change set — the batch form of a
  * change-data-capture feed, and the inverse of `Sinks.upsert`.
  *
  * Scale: one full-outer join co-partitioned on the key; payload
  * comparison is a struct equality evaluated in codegen (no
  * serialization), and unchanged rows are filtered before anything
  * downstream sees them — the change set is usually a tiny fraction of
  * either snapshot.
  */
object Cdc {

  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String): DataFrame = {
    val payload = oldSnap.columns.filterNot(_ == key).sorted
    require(payload.sameElements(newSnap.columns.filterNot(_ == key).sorted),
      "snapshots must share a schema")
    def pack(side: String): Column =
      struct(payload.map(c => col(s"$side.$c")): _*)
    // explicit presence flags, NOT key-null checks: a NULL key never
    // joins (NULL = NULL is not true), and checking a.key IS NULL
    // would misread such an old-side row as an insert. NULL-key rows
    // surface as one delete + one insert — the honest answer, since
    // no equality can pair them.
    val a = oldSnap.withColumn("__graft_a_present", lit(true)).as("a")
    val b = newSnap.withColumn("__graft_b_present", lit(true)).as("b")
    a.join(b, col(s"a.$key") === col(s"b.$key"), "full_outer")
      .withColumn("change_type",
        when(col("__graft_a_present").isNull, lit("insert"))
          .when(col("__graft_b_present").isNull, lit("delete"))
          .when(pack("a") =!= pack("b"), lit("update"))
          .otherwise(lit("same")))
      .filter(col("change_type") =!= "same")
      .select(coalesce(col(s"a.$key"), col(s"b.$key")).as(key), col("change_type"))
  }
}
