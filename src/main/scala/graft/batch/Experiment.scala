package graft.batch

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.dsl.{Records, Topology}

/** The reference's `run-experiment` surface (willa
  * `experiment.clj:241-263`): evaluate a topology over LITERAL input
  * records and read back every entity's output — the REPL/unit-test
  * interface, with the BatchCompiler doing the evaluation so "experiment"
  * and "production batch" are one code path by construction. */
object Experiment {

  /** A literal input record: (key, value, epoch-millis ts). */
  type In = (Any, Any, Long)

  /** Run the topology over literal per-topic records. Returns every
    * node's DataFrame (lazy; `collect` for the reference's `::output`). */
  def run(
      spark: SparkSession,
      topology: Topology,
      inputs: Map[String, Seq[In]]): Map[String, DataFrame] = {
    val dfs = inputs.map { case (id, rows) =>
      require(rows.nonEmpty, s"experiment input '$id' needs at least one record")
      val data = rows.map { case (k, v, t) => Row(k, v, t) }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(Records.KeyCol,
          org.apache.spark.sql.catalyst.expressions.Literal(data.head.get(0)).dataType),
        org.apache.spark.sql.types.StructField(Records.ValueCol,
          org.apache.spark.sql.catalyst.expressions.Literal(data.head.get(1)).dataType),
        org.apache.spark.sql.types.StructField("__ms",
          org.apache.spark.sql.types.LongType)))
      id -> spark.createDataFrame(
        spark.sparkContext.parallelize(data.map(r => Row(r.get(0), r.get(1), r.get(2)))),
        schema)
        .withColumn(Records.TsCol, timestamp_millis(col("__ms"))).drop("__ms")
    }
    BatchCompiler.run(topology, dfs)
  }

  /** Leaf-topic outputs only as (key, value) pairs — the reference's
    * `results-only` (`experiment.clj:258-263`). */
  def resultsOnly(
      spark: SparkSession,
      topology: Topology,
      inputs: Map[String, Seq[In]]): Map[String, Seq[(Any, Any)]] = {
    val all = run(spark, topology, inputs)
    val leaves = graft.graph.Dag.leaves(topology.workflow)
    leaves.map { id =>
      id -> all(id).select(Records.KeyCol, Records.ValueCol)
        .collect().map(r => (r.get(0), r.get(1))).toSeq
    }.toMap
  }
}
