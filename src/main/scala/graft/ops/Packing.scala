package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing: assign documents to fixed-token-budget training
  * examples (context windows) with the standard greedy sequential rule —
  * walk the group in id order, start a new bin whenever the running
  * token total would exceed the budget. The reference has no analog;
  * this is the example-construction step of an LLM data pipeline.
  *
  * Scale notes (100 TB): the assignment is sequential WITHIN a group
  * (pack bins never span groups — in practice the group is a shard or
  * source), so the parallel unit is the group. The implementation is
  * `repartition(group) → sortWithinPartitions(group, id) →
  * mapPartitions` with state reset at group boundaries: one shuffle,
  * O(1) memory per task regardless of group size (no collect_list /
  * flatMapGroups group materialization), arbitrarily many groups per
  * task. A row longer than the budget gets a bin of its own (never
  * dropped, never split).
  */
object Packing {

  /** @param lenCol pre-computed token length per row (compute narrow,
    *               e.g. `native.tokenCount`)
    * @return input columns plus `bin_id` (0-based per group) and
    *         `bin_fill` (running token total of the row's bin AFTER
    *         placing the row) */
  def packGreedy(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      lenCol: String,
      budget: Long): DataFrame = {
    val inSchema = docs.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("bin_id", LongType, nullable = false),
      StructField("bin_fill", LongType, nullable = false)))
    val gi = inSchema.fieldIndex(groupCol)
    val li = inSchema.fieldIndex(lenCol)
    docs
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(idCol))
      .mapPartitions { it =>
        var group: Any = null
        var first = true
        var bin = 0L
        var fill = 0L
        it.map { row =>
          val g = row.get(gi)
          val len = row.get(li).asInstanceOf[Number].longValue
          if (first || g != group) { group = g; first = false; bin = 0L; fill = 0L }
          if (fill > 0L && fill + len > budget) { bin += 1L; fill = len }
          else fill += len
          Row.fromSeq(row.toSeq :+ bin :+ fill)
        }
      }(Encoders.row(outSchema))
  }
}
