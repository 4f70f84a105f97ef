package graft.graph

/** Directed-acyclic-graph helpers over a plain edge list of node ids.
  *
  * Mirrors the reference's graph layer (willa `utils.clj:29-46`: loom
  * digraph + roots/leaves, and `core.clj:122-126`: topological traversal
  * with predecessors) without any graph-library dependency — Kahn's
  * algorithm over adjacency maps is all the reference semantics need.
  */
object Dag {

  type Node = String
  type Edge = (Node, Node)

  /** All nodes mentioned by the edge list (insertion-ordered). */
  def nodes(edges: Seq[Edge]): Seq[Node] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[Node]
    edges.foreach { case (a, b) => seen += a; seen += b }
    seen.toSeq
  }

  /** node -> direct successors */
  def successors(edges: Seq[Edge]): Map[Node, Seq[Node]] =
    edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._2) }
      .withDefaultValue(Seq.empty)

  /** node -> direct predecessors (parent order = edge-list order, which is
    * significant for joins: the reference folds join inputs in declared
    * order, `streams.clj:119-123`). */
  def predecessors(edges: Seq[Edge]): Map[Node, Seq[Node]] =
    edges.groupBy(_._2).map { case (k, es) => k -> es.map(_._1) }
      .withDefaultValue(Seq.empty)

  /** Nodes with no incoming edge (willa `utils.clj:33-38`). */
  def roots(edges: Seq[Edge]): Set[Node] =
    nodes(edges).toSet -- edges.map(_._2).toSet

  /** Nodes with no outgoing edge (willa `utils.clj:41-46`). */
  def leaves(edges: Seq[Edge]): Set[Node] =
    nodes(edges).toSet -- edges.map(_._1).toSet

  /** Kahn topological sort. Returns None when the graph has a cycle
    * (mirrors the reference's `dag?` validation, `specs.clj:117-118`). */
  def topsort(edges: Seq[Edge]): Option[Seq[Node]] = {
    val all = nodes(edges)
    val succ = successors(edges)
    val indeg = scala.collection.mutable.Map.empty[Node, Int]
    all.foreach(n => indeg(n) = 0)
    edges.foreach { case (_, b) => indeg(b) += 1 }
    val queue = scala.collection.mutable.Queue(all.filter(indeg(_) == 0): _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[Node]
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      out += n
      succ(n).foreach { m =>
        indeg(m) -= 1
        if (indeg(m) == 0) queue += m
      }
    }
    if (out.size == all.size) Some(out.toSeq) else None
  }

  def isDag(edges: Seq[Edge]): Boolean = topsort(edges).isDefined
}
