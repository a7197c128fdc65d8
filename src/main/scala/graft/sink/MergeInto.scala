package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generalized MERGE INTO (the Delta/Iceberg upsert statement) as a
  * relational kernel:
  *
  *   MERGE INTO target t USING source s ON t.key = s.key
  *     WHEN MATCHED AND <deleteWhen>  THEN DELETE
  *     WHEN MATCHED                    THEN UPDATE SET <updateSet>
  *     WHEN NOT MATCHED                THEN INSERT <insertValues>
  *
  * Clause expressions reference the two sides through the aliases
  * `t` and `s` (e.g. `col("t.bal") + col("s.delta")`). Unmatched
  * TARGET rows carry over unchanged; the DELETE clause wins over
  * UPDATE when both apply (first-clause-wins, the SQL standard's
  * order). `updateSet`/`insertValues` map target column names to
  * expressions; omitted update columns keep their target value,
  * omitted insert columns become NULL of the target type.
  *
  * Ambiguity contract (Delta's own rule): a source with more than one
  * row per key makes the merge non-deterministic, so it throws
  * loudly. The audit is one delta-sized aggregate pass over the
  * source — at 100 TB fold it into the source derivation's final
  * aggregate, or attach it via Dataset.observe on the merge job
  * itself.
  *
  * Scale shape: ONE full-outer join on the key (a full outer cannot
  * broadcast, so it plans as a sort-merge join on the key exchange —
  * exactly the shuffle the statement needs); every clause is a
  * row-local conditional projection on the joined row, so the merge
  * costs the join and nothing else. q_snapshot_merge covers the
  * diff-apply special case; this kernel is the general statement.
  */
object MergeInto {

  def apply(target: DataFrame, source: DataFrame, key: String,
      deleteWhen: Option[Column] = None,
      updateSet: Map[String, Column] = Map.empty,
      insertValues: Map[String, Column] = Map.empty): DataFrame = {
    val dup = source.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > 1).limit(1).collect()
    if (dup.nonEmpty) throw new IllegalArgumentException(
      s"ambiguous MERGE: source has multiple rows for $key=" +
        s"${dup(0).get(0)} — deduplicate the source first")
    val targetSchema = target.schema
    // Side presence is a MARKER column, not a key null-check: a target
    // row with a NULL merge key never joins (SQL null semantics) but is
    // still PRESENT on the t side and must carry over unchanged — a key
    // null-check would misroute it into the insert branch.
    val j = target.withColumn("__t_side", lit(true)).alias("t")
      .join(source.withColumn("__s_side", lit(true)).alias("s"),
        col(s"t.$key") === col(s"s.$key"), "full_outer")
    val tPresent = coalesce(col("t.__t_side"), lit(false))
    val matched = tPresent && coalesce(col("s.__s_side"), lit(false))
    // A clause condition that evaluates to NULL is NOT satisfied (the
    // SQL/Delta MERGE rule) — null-safe-compare against true so a NULL
    // deleteWhen falls through to UPDATE instead of silently deleting.
    val del = deleteWhen.getOrElse(lit(false)) <=> lit(true)
    j.filter(!(matched && del))
      .select(targetSchema.fields.toSeq.map { f =>
        val c = f.name
        val carried =
          if (c == key) coalesce(col(s"t.$key"), col(s"s.$key"))
          else col(s"t.$c")
        when(matched, updateSet.getOrElse(c, carried))
          .when(tPresent, carried)
          .otherwise(
            if (c == key) col(s"s.$key")
            else insertValues.getOrElse(c, lit(null).cast(f.dataType)))
          .as(c)
      }: _*)
  }
}
