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

  object Endpoint {

    /** Bind the Endpoint to a real `org.apache.kafka.clients.admin.AdminClient`
      * when kafka-clients is on the runtime classpath (it is on any cluster
      * that runs the Kafka connector; it is NOT in this offline sandbox).
      * Resolution is reflective so this module compiles and ships without the
      * jar — the standard optional-dependency seam. Returns Left with the
      * reason when the classes are absent.
      *
      * Reflection map (reference drives the same verbs, src/utils/kafka.py:
      * 38-144): `AdminClient.create(Properties)`;
      * `createTopics(Collection[NewTopic])` where
      * `NewTopic(name, partitions, rf).configs(map)`; `listTopics().names()`;
      * `deleteTopics(Collection[String])`; every result is a KafkaFuture
      * joined via `.get()`. TopicExistsException (possibly wrapped in an
      * ExecutionException) maps to AlreadyExists.
      */
    def reflective(bootstrap: String,
                   props: Map[String, String] = Map.empty): Either[String, Endpoint with AutoCloseable] =
      try {
        val loader = Thread.currentThread.getContextClassLoader
        val adminCls = Class.forName("org.apache.kafka.clients.admin.AdminClient", true, loader)
        val newTopicCls = Class.forName("org.apache.kafka.clients.admin.NewTopic", true, loader)
        val p = new java.util.Properties()
        p.put("bootstrap.servers", bootstrap)
        props.foreach { case (k, v) => p.put(k, v) }
        val client = adminCls.getMethod("create", classOf[java.util.Properties])
          .invoke(null, p)

        def call(target: AnyRef, method: String, sig: Seq[Class[_]], args: AnyRef*): AnyRef =
          try target.getClass.getMethod(method, sig: _*).invoke(target, args: _*)
          catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }

        def await(futureHolder: AnyRef): AnyRef = {
          // CreateTopicsResult/DeleteTopicsResult/ListTopicsResult all expose
          // a KafkaFuture via all()/names(); join it with get()
          val fut =
            try call(futureHolder, "all", Nil)
            catch { case _: NoSuchMethodException => call(futureHolder, "names", Nil) }
          call(fut, "get", Nil)
        }

        def isTopicExists(t: Throwable): Boolean = {
          var c = t
          while (c != null) {
            if (c.getClass.getName == "org.apache.kafka.common.errors.TopicExistsException")
              return true
            c = c.getCause
          }
          false
        }

        Right(new Endpoint with AutoCloseable {
          def createTopic(spec: TopicSpec): CreateResult =
            try {
              val nt = newTopicCls
                .getConstructor(classOf[String], java.lang.Integer.TYPE, java.lang.Short.TYPE)
                .newInstance(spec.name, Int.box(spec.numPartitions),
                  Short.box(spec.replicationFactor)).asInstanceOf[AnyRef]
              val cfg = new java.util.HashMap[String, String]()
              spec.config.foreach { case (k, v) => cfg.put(k, v) }
              call(nt, "configs", Seq(classOf[java.util.Map[_, _]]), cfg)
              await(call(client, "createTopics", Seq(classOf[java.util.Collection[_]]),
                java.util.Collections.singletonList(nt)))
              CreateResult.Created
            } catch {
              case e: Throwable if isTopicExists(e) => CreateResult.AlreadyExists
              case e: Throwable => CreateResult.Failed(e.toString)
            }

          def listTopics(): Seq[String] = {
            import scala.jdk.CollectionConverters._
            await(call(client, "listTopics", Nil))
              .asInstanceOf[java.util.Set[String]].asScala.toSeq.sorted
          }

          def deleteTopic(name: String): Either[String, Unit] =
            try {
              await(call(client, "deleteTopics", Seq(classOf[java.util.Collection[_]]),
                java.util.Collections.singletonList(name)))
              Right(())
            } catch { case e: Throwable => Left(e.toString) }

          def close(): Unit = call(client, "close", Nil)
        })
      } catch {
        case _: ClassNotFoundException =>
          Left("kafka-clients is not on the classpath (offline sandbox); " +
            "Endpoint.reflective binds on any cluster that ships the Kafka connector")
        case e: Throwable => Left(s"AdminClient binding failed: $e")
      }
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
