package graft.viz

import graft.dsl._

/** GraphViz rendering of a topology (willa `viz.clj:9-69`): topics as
  * cylinders, streams as rectangles, tables as components, global tables
  * as double circles; joined inputs annotated with the join type on the
  * edges. Pure string builder — no graphviz dependency; feed the output
  * to `dot -Tsvg` or any renderer. Optionally includes per-node sample
  * rows (the experiment-output labels of `viz.clj:46-58`). */
object Dot {

  private def shape(e: Entity): String = e match {
    case _: Entity.Topic        => "cylinder"
    case _: Entity.KStream      => "box"
    case _: Entity.KTable       => "component"
    case _: Entity.GlobalKTable => "doublecircle"
  }

  private def color(e: Entity): String = e match {
    case _: Entity.Topic        => "lightblue"
    case _: Entity.KStream      => "palegreen"
    case _: Entity.KTable       => "khaki"
    case _: Entity.GlobalKTable => "plum"
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** Experiment-mode viz (willa `viz.clj:46-58`): render the topology
    * with up to `n` sampled output rows per node, taken from a
    * BatchCompiler run's node map. */
  def renderWithSamples(
      t: Topology,
      outputs: Map[String, org.apache.spark.sql.DataFrame],
      n: Int = 3): String =
    render(t, outputs.map { case (id, df) =>
      id -> df.take(n).map(_.mkString("(", ", ", ")")).toSeq
    })

  /** Render the topology; `samples` adds "k → v" lines under a node's
    * name (per-node observability, mirrors experiment-mode viz). */
  def render(t: Topology, samples: Map[String, Seq[String]] = Map.empty): String = {
    val sb = new StringBuilder("digraph topology {\n")
    sb ++= "  rankdir=LR;\n  node [style=filled];\n"
    val nodes = (t.workflow.flatMap { case (a, b) => Seq(a, b) } ++ t.entities.keys).distinct
    nodes.foreach { id =>
      t.entities.get(id).foreach { e =>
        val extra = samples.get(id).filter(_.nonEmpty)
          .map(rows => "\\n" + rows.map(esc).mkString("\\n")).getOrElse("")
        sb ++= s"""  "${esc(id)}" [shape=${shape(e)}, fillcolor=${color(e)}, label="${esc(id)}$extra"];\n"""
      }
    }
    val joinLabel: Map[String, String] = t.joins.flatMap { case (ins, cfg) =>
      val lbl = cfg.joinType.toString.toLowerCase +
        cfg.window.map(w => s" ±${w.beforeMs}/${w.afterMs}ms").getOrElse("")
      ins.map(_ -> lbl)
    }
    t.workflow.foreach { case (from, to) =>
      val lbl = t.joinFor(t.predecessors.getOrElse(to, Seq.empty)) match {
        case Some((ins, _)) if ins.contains(from) =>
          s""" [label="${esc(joinLabel.getOrElse(from, ""))}"]"""
        case _ => ""
      }
      sb ++= s"""  "${esc(from)}" -> "${esc(to)}"$lbl;\n"""
    }
    sb ++= "}\n"
    sb.toString
  }
}
