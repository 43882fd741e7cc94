package graft

import graft.config._
import graft.sources.CatalogOps

class ConfigJsonSpec extends SparkSpecBase {

  private val pipelineJson =
    """{
      |  "pipeline_id": "dedup-pipe",
      |  "source": {
      |    "topics": [{
      |      "name": "load_topic",
      |      "consumer_group_initial_offset": "latest",
      |      "schema": {"fields": [
      |        {"name": "event_id", "type": "string"},
      |        {"name": "user_id", "type": "string"},
      |        {"name": "created_at", "type": "string"}
      |      ]},
      |      "deduplication": {"enabled": true, "id_field": "event_id",
      |                        "id_field_type": "string", "time_window": "8h"}
      |    }]
      |  },
      |  "join": {"enabled": false},
      |  "sink": {
      |    "table": "load_table", "max_batch_size": 5000, "max_delay_time": "10s",
      |    "table_mapping": [
      |      {"source_id": "t", "field_name": "event_id", "column_name": "event_id", "column_type": "uuid"},
      |      {"source_id": "t", "field_name": "created_at", "column_name": "created_at", "column_type": "datetime"}
      |    ]
      |  }
      |}""".stripMargin

  test("json parser: scalars, nesting, escapes, numbers") {
    import Json.JsonOps
    val v = Json.parse("""{"a": [1, 2.5, "x\n\"y", true, null], "b": {"c": -3}}""")
    assert(v.list("a") == List(1L, 2.5, "x\n\"y", true, null))
    assert(v.obj("b").long("c") == -3L)
    intercept[Exception](Json.parse("""{"a": }"""))
    intercept[Exception](Json.parse("""{"a": 1} trailing"""))
  }

  test("pipeline config decodes the reference shape") {
    val cfg = PipelineConfigJson.fromJson(pipelineJson)
    assert(cfg.pipelineId == "dedup-pipe")
    assert(cfg.sourceSchema.map(_.name) == Seq("event_id", "user_id", "created_at"))
    assert(cfg.dedup.enabled && cfg.dedup.idField == "event_id")
    assert(cfg.dedup.timeWindow.millis == 8L * 3600 * 1000)
    assert(cfg.join.exists(!_.enabled))
    assert(cfg.sink.table == "load_table" && cfg.sink.maxBatchSize == 5000)
    assert(cfg.sink.tableMapping.map(_.columnType) == Seq("uuid", "datetime"))
    // ORDER BY rule: no enabled join → first mapped column
    assert(cfg.sink.orderByKey(cfg.join) == "event_id")
  }

  test("variant rewrite points every keyed field at the variant (P4)") {
    val cfg = PipelineConfigJson.fromJson(pipelineJson)
    val out = PipelineConfigJson.rewriteForVariant(cfg, "load_abc12345",
      Duration.parse("1h"), 100000, Duration.parse("30s"))
    assert(out.pipelineId == "load_abc12345")
    assert(out.sink.table == "load_abc12345")
    assert(out.dedup.timeWindow.millis == 3600000L)
    assert(out.sink.maxBatchSize == 100000)
    assert(out.sink.maxDelayTime.millis == 30000L)
    // untouched parts survive
    assert(out.sourceSchema == cfg.sourceSchema)
  }

  test("catalog cleanup drops exactly the prefix-matched tables (S10)") {
    spark.sql("CREATE TABLE IF NOT EXISTS load_t1 (x INT) USING parquet")
    spark.sql("CREATE TABLE IF NOT EXISTS load_t2 (x INT) USING parquet")
    spark.sql("CREATE TABLE IF NOT EXISTS keep_t (x INT) USING parquet")
    try {
      assert(CatalogOps.listByPrefix(spark, "load_").toSet == Set("load_t1", "load_t2"))
      val dropped = CatalogOps.cleanup(spark, "load_")
      assert(dropped.toSet == Set("load_t1", "load_t2"))
      assert(CatalogOps.listByPrefix(spark, "load_").isEmpty)
      assert(spark.catalog.tableExists("keep_t"), "non-prefixed table survives")
    } finally spark.sql("DROP TABLE IF EXISTS keep_t")
  }
}
