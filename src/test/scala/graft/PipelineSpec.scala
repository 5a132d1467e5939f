package graft

import java.util.concurrent.atomic.AtomicInteger
import graft.pipeline.ModelGraph
import graft.pipeline.ModelGraph.{Failed, Model, Skipped, Success_}
import graft.settings.EngineConf

class PipelineSpec extends SparkSpec {

  test("DAG runs in dependency order with parallel independent nodes") {
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val models = Seq(
      Model("a")(_ => order.add("a")),
      Model("b")(_ => order.add("b")),
      Model("c", deps = Seq("a", "b"))(_ => order.add("c")),
      Model("d", deps = Seq("c"))(_ => order.add("d")))
    val st = ModelGraph.run(spark, models, parallelism = 4)
    assert(st.values.forall(_ == Success_))
    val seq = order.toArray.map(_.toString).toSeq
    assert(seq.indexOf("c") > seq.indexOf("a"))
    assert(seq.indexOf("c") > seq.indexOf("b"))
    assert(seq.indexOf("d") > seq.indexOf("c"))
  }

  test("wide graph with dependents listed before deps completes (no recursive-update hang)") {
    // Regression: futures used to be built via a recursive
    // ConcurrentHashMap.computeIfAbsent, which deadlocks/throws when a dep's
    // key hashes into the same bin — dependent-first ordering across many
    // names makes that reachable. Now futures build eagerly in topo order.
    val ran = new AtomicInteger(0)
    val chains = (0 until 40).flatMap { i =>
      Seq( // dependent deliberately listed BEFORE its dep
        Model(s"leaf_$i", deps = Seq(s"mid_$i"))(_ => ran.incrementAndGet()),
        Model(s"mid_$i", deps = Seq("root"))(_ => ran.incrementAndGet()))
    }
    val models = chains :+ Model("root")(_ => ran.incrementAndGet())
    val st = ModelGraph.run(spark, models, parallelism = 8)
    assert(st.size == 81 && st.values.forall(_ == Success_))
    assert(ran.get() == 81)
  }

  test("a failing node skips its transitive dependents; siblings still run") {
    val ran = new AtomicInteger(0)
    val models = Seq(
      Model("ok")(_ => ran.incrementAndGet()),
      Model("boom")(_ => throw new RuntimeException("nope")),
      Model("child", deps = Seq("boom"))(_ => ran.incrementAndGet()),
      Model("grandchild", deps = Seq("child"))(_ => ran.incrementAndGet()),
      Model("sibling", deps = Seq("ok"))(_ => ran.incrementAndGet()))
    val st = ModelGraph.run(spark, models)
    assert(st("ok") == Success_)
    assert(st("boom").isInstanceOf[Failed])
    assert(st("child") == Skipped("boom"))
    assert(st("grandchild") == Skipped("child"))
    assert(st("sibling") == Success_)
    assert(ran.get() == 2)
  }

  test("hooks run around the build (ref hooks.sql:1-10)") {
    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val m = Model("hooked",
      preHook = _ => log.add("pre"), postHook = _ => log.add("post"))(
      _ => log.add("build"))
    ModelGraph.run(spark, Seq(m))
    assert(log.toArray.map(_.toString).toSeq == Seq("pre", "build", "post"))
  }

  test("cycles and unknown deps are rejected") {
    intercept[IllegalArgumentException] {
      ModelGraph.run(spark, Seq(
        Model("x", deps = Seq("y"))(_ => ()),
        Model("y", deps = Seq("x"))(_ => ())))
    }
    intercept[IllegalArgumentException] {
      ModelGraph.run(spark, Seq(Model("x", deps = Seq("zzz"))(_ => ())))
    }
  }

  test("execution-mode routing maps to scheduler pools (ref wrapper.py:78-104)") {
    assert(EngineConf.route(spark, Map("dbt.execution_mode" -> "maxqa")) ==
      EngineConf.Interactive)
    assert(spark.sparkContext.getLocalProperty("spark.scheduler.pool") == "interactive")
    assert(EngineConf.route(spark, Map.empty) == EngineConf.Offline)
    intercept[IllegalArgumentException](EngineConf.parseMode("warp-speed"))
  }

  test("defaults apply under user conf (ref context.py:3-13)") {
    EngineConf.applyDefaults(spark, Map("spark.sql.shuffle.partitions" -> "7"))
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
  }
}
