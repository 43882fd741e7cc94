package graft.sources

/** S11 — Kafka topic administration, mirroring the reference harness's
  * lifecycle verbs (reference: src/utils/kafka.py:38-144):
  *
  *  - `createTopicsIfNotExists`: each topic is created with 3 partitions,
  *    replication factor 1, and `message.timestamp.type=LogAppendTime` (the
  *    broker stamps event time — dedup watermarks key off it, see KafkaIO);
  *    TOPIC_ALREADY_EXISTS is success, any other error is fatal
  *    (kafka.py:49-86).
  *  - `cleanup`: list all topics, delete those starting with the load-test
  *    prefix `load_`; per-topic delete failures are recorded and skipped,
  *    never fatal (kafka.py:89-144).
  *
  * The broker verbs live behind [[KafkaTopicAdmin.Endpoint]] — the exact
  * AdminClient surface the reference uses (create/list/delete). On a cluster
  * with `kafka-clients` on the classpath, bind it to
  * `org.apache.kafka.clients.admin.AdminClient` (`createTopics` with a
  * `NewTopic(name, 3, 1.toShort).configs(...)`, `listTopics().names()`,
  * `deleteTopics`); that jar is not on this offline classpath, so the
  * policy layer — spec'd by KafkaAdminSpec against an injected in-memory
  * endpoint — is what ships here, like O1's lifecycle state machine.
  */
object KafkaTopicAdmin {

  /** The reference's topic shape: 3 partitions, RF 1, LogAppendTime. */
  final case class TopicSpec(name: String, numPartitions: Int,
                             replicationFactor: Short,
                             config: Map[String, String])

  def topicSpecFor(name: String): TopicSpec =
    TopicSpec(name, numPartitions = 3, replicationFactor = 1,
      config = Map("message.timestamp.type" -> "LogAppendTime"))

  sealed trait CreateResult
  object CreateResult {
    case object Created extends CreateResult
    case object AlreadyExists extends CreateResult
    final case class Failed(error: String) extends CreateResult
  }

  /** Minimal admin endpoint: the three AdminClient verbs the reference
    * drives. Implementations must be idempotency-transparent — report
    * AlreadyExists rather than mask it, so the policy layer can log the
    * reference's "Already exists" outcome distinctly.
    */
  trait Endpoint {
    def createTopic(spec: TopicSpec): CreateResult
    def listTopics(): Seq[String]
    /** Left(error) on failure — cleanup treats it as skip-and-record. */
    def deleteTopic(name: String): Either[String, Unit]
  }

  /** Create every topic that doesn't exist yet; AlreadyExists is success.
    * Any other failure aborts (the reference raises — a load test without
    * its topic is meaningless, kafka.py:77-86).
    */
  def createTopicsIfNotExists(ep: Endpoint,
                              topics: Seq[String]): Seq[(String, CreateResult)] =
    topics.map { t =>
      ep.createTopic(topicSpecFor(t)) match {
        case CreateResult.Failed(e) =>
          throw new IllegalStateException(s"Failed to create topic $t: $e")
        case ok => t -> ok
      }
    }

  final case class CleanupReport(deleted: Seq[String],
                                 failed: Seq[(String, String)]) {
    def nothingToDelete: Boolean = deleted.isEmpty && failed.isEmpty
  }

  /** Delete every topic starting with `prefix`. Per-topic failures are
    * collected, not thrown — cleanup is best-effort by contract
    * (kafka.py:108-122).
    */
  def cleanup(ep: Endpoint, prefix: String = "load_"): CleanupReport = {
    val targets = ep.listTopics().filter(_.startsWith(prefix))
    val (ok, bad) = targets.map(t => t -> ep.deleteTopic(t)).partition(_._2.isRight)
    CleanupReport(
      deleted = ok.map(_._1),
      failed = bad.collect { case (t, Left(e)) => t -> e })
  }
}
