package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KafkaTopicAdmin
import graft.sources.KafkaTopicAdmin.{CreateResult, TopicSpec}

/** S11 — topic-admin policy against an injected in-memory endpoint:
  * create-if-not-exists semantics (AlreadyExists is success, other failures
  * fatal), the reference's 3-partition/LogAppendTime topic shape, and
  * best-effort prefix cleanup (reference: src/utils/kafka.py:38-144).
  */
class KafkaAdminSpec extends AnyFunSuite {

  private class FakeBroker(failCreate: Set[String] = Set.empty,
                           failDelete: Set[String] = Set.empty)
      extends KafkaTopicAdmin.Endpoint {
    val topics: mutable.Map[String, TopicSpec] = mutable.Map.empty
    override def createTopic(spec: TopicSpec): CreateResult =
      if (failCreate(spec.name)) CreateResult.Failed("AUTHORIZATION_FAILED")
      else if (topics.contains(spec.name)) CreateResult.AlreadyExists
      else { topics(spec.name) = spec; CreateResult.Created }
    override def listTopics(): Seq[String] = topics.keys.toSeq.sorted
    override def deleteTopic(name: String): Either[String, Unit] =
      if (failDelete(name)) Left("TIMED_OUT")
      else if (topics.remove(name).isDefined) Right(())
      else Left("UNKNOWN_TOPIC_OR_PART")
  }

  test("topics are created with the reference shape: 3 partitions, RF 1, LogAppendTime") {
    val b = new FakeBroker
    val res = KafkaTopicAdmin.createTopicsIfNotExists(b, Seq("load_a", "load_b"))
    assert(res.forall(_._2 == CreateResult.Created))
    val spec = b.topics("load_a")
    assert(spec.numPartitions == 3)
    assert(spec.replicationFactor == 1.toShort)
    assert(spec.config == Map("message.timestamp.type" -> "LogAppendTime"))
  }

  test("create is idempotent: AlreadyExists is success, not an error") {
    val b = new FakeBroker
    KafkaTopicAdmin.createTopicsIfNotExists(b, Seq("load_a"))
    val again = KafkaTopicAdmin.createTopicsIfNotExists(b, Seq("load_a", "load_c"))
    assert(again.toMap == Map(
      "load_a" -> CreateResult.AlreadyExists, "load_c" -> CreateResult.Created))
  }

  test("non-exists create failure is fatal (the reference raises)") {
    val b = new FakeBroker(failCreate = Set("load_bad"))
    val e = intercept[IllegalStateException](
      KafkaTopicAdmin.createTopicsIfNotExists(b, Seq("load_bad")))
    assert(e.getMessage.contains("load_bad"))
  }

  test("cleanup deletes only load_-prefixed topics") {
    val b = new FakeBroker
    KafkaTopicAdmin.createTopicsIfNotExists(b,
      Seq("load_x", "load_y", "orders_keep", "metrics"))
    val rep = KafkaTopicAdmin.cleanup(b)
    assert(rep.deleted.sorted == Seq("load_x", "load_y"))
    assert(rep.failed.isEmpty)
    assert(b.listTopics() == Seq("metrics", "orders_keep"))
  }

  test("cleanup is best-effort: per-topic failures recorded, others still deleted") {
    val b = new FakeBroker(failDelete = Set("load_stuck"))
    KafkaTopicAdmin.createTopicsIfNotExists(b, Seq("load_stuck", "load_ok"))
    val rep = KafkaTopicAdmin.cleanup(b)
    assert(rep.deleted == Seq("load_ok"))
    assert(rep.failed == Seq("load_stuck" -> "TIMED_OUT"))
    assert(b.listTopics() == Seq("load_stuck"))
  }

  test("cleanup with nothing matching reports no-op (reference 'Skipped' path)") {
    val b = new FakeBroker
    KafkaTopicAdmin.createTopicsIfNotExists(b, Seq("other"))
    assert(KafkaTopicAdmin.cleanup(b).nothingToDelete)
  }
}
