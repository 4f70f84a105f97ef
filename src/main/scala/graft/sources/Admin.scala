package graft.sources

import graft.dsl.{Entity, Topology}

/** Topic provisioning surface — parity with the reference's per-topic
  * admin config (`willa/example.clj:14-25`, README.md:94-99), where every
  * topic carries `:partition-count` / `:replication-factor` and is created
  * with an admin client before the app starts.
  *
  * This sandbox has no broker, so provisioning is expressed as pure
  * descriptors: [[topicSpecs]] extracts everything an external
  * `kafka-topics --create` / `AdminClient.createTopics` call (or a
  * filesystem layout script) needs, with the reference example's defaults
  * (partitions=1, replication=1). The parquet transport consumes the same
  * config directly at write time via [[Sources.writeTopic]]. */
object Admin {

  final case class TopicSpec(
      name: String,
      partitionCount: Int,
      replicationFactor: Int,
      partitionBy: Seq[String])

  /** One spec per distinct topic NAME in the topology (several entity ids
    * may point at one physical topic; conflicting admin configs for the
    * same name are rejected rather than silently merged). */
  def topicSpecs(
      topology: Topology,
      defaultPartitions: Int = 1,
      defaultReplication: Int = 1): Seq[TopicSpec] = {
    val topics = topology.entities.values.collect { case t: Entity.Topic => t }.toSeq
    topics.groupBy(_.name).toSeq.sortBy(_._1).map { case (name, ts) =>
      val distinct = ts.distinct
      require(distinct.size == 1,
        s"topic '$name' declared with conflicting admin configs: $distinct")
      val t = distinct.head
      require(t.partitionCount.forall(_ > 0) && t.replicationFactor.forall(_ > 0),
        s"topic '$name': partitionCount/replicationFactor must be positive")
      TopicSpec(name, t.partitionCount.getOrElse(defaultPartitions),
        t.replicationFactor.getOrElse(defaultReplication), t.partitionBy)
    }
  }
}
