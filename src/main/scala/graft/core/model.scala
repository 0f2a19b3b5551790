package graft.core

/** Typed property-graph model (SURVEY §1.1): the BioCypher tuple shapes as
  * case classes, for `Dataset[Node]` / `Dataset[Edge]` where compile-time
  * field checks help (pipeline emit boundaries); plain DataFrames remain
  * the norm for dynamic-schema intermediates. */
object model {

  /** Node 3-tuple `(id, label, props)` (ec.py:124, disease.py:1386). Props
    * are the flat escaped `k=v|k=v` CSV form at the emit boundary. */
  final case class Node(id: String, label: String, props: String)

  /** Edge 5-tuple `(rel_id, src, dst, label, props)` (ec.py:203,
    * drug.py:1246). */
  final case class Edge(
      rel_id: String, src: String, dst: String, label: String, props: String)
}
