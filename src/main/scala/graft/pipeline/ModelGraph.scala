package graft.pipeline

import java.util.concurrent.Executors
import scala.collection.mutable
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.SparkSession

/** The model DAG and its executor — the engine-side equivalent of dbt-core's
  * ref()/source() graph scheduling (reference behavior pinned by
  * tests/functional/test_concurrency.py: independent models run
  * thread-parallel over one connection/session; SparkSession is
  * thread-safe so the same holds here).
  *
  *  - nodes are named build actions (materializations) with explicit deps;
  *  - `run` executes in topological order with max parallelism across
  *    independent nodes (bounded thread pool);
  *  - a failing node marks its transitive dependents SKIPPED, everything
  *    else still runs (dbt semantics);
  *  - hooks run before/after each node (materializations/hooks.sql:1-10).
  */
object ModelGraph {

  final case class Model(
      name: String,
      deps: Seq[String] = Nil,
      preHook: SparkSession => Unit = _ => (),
      postHook: SparkSession => Unit = _ => ())(
      val build: SparkSession => Unit)

  sealed trait Status
  case object Success_ extends Status
  final case class Failed(error: Throwable) extends Status
  final case class Skipped(becauseOf: String) extends Status

  def run(spark: SparkSession, models: Seq[Model], parallelism: Int = 4)
      : Map[String, Status] = {
    val byName = models.map(m => m.name -> m).toMap
    require(byName.size == models.size, "duplicate model names")
    models.foreach(m => m.deps.foreach(d =>
      require(byName.contains(d), s"${m.name}: unknown dep $d")))
    // cycle check (Kahn) — also yields the topological order we build
    // futures in below
    val topo = mutable.ArrayBuffer.empty[String]
    locally {
      val indeg = mutable.Map(models.map(m => m.name -> m.deps.size): _*)
      val out = models.flatMap(m => m.deps.map(_ -> m.name))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val q = mutable.Queue(models.filter(_.deps.isEmpty).map(_.name): _*)
      while (q.nonEmpty) {
        val n = q.dequeue(); topo += n
        out.getOrElse(n, Nil).foreach { m =>
          indeg(m) -= 1; if (indeg(m) == 0) q.enqueue(m)
        }
      }
      require(topo.size == models.size, "model graph has a cycle")
    }

    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // Futures are created eagerly in topological order into a plain Map —
    // a dep's future always exists before its dependents'. (A recursive
    // ConcurrentHashMap.computeIfAbsent here is forbidden by its contract
    // and can deadlock when dependent keys hash to the same bin.)
    val futures = mutable.Map.empty[String, Future[Status]]
    topo.foreach { name =>
      val m = byName(name)
      val depFutures = m.deps.map(futures)
      futures(name) = Future.sequence(depFutures).flatMap { depStatuses =>
        val blocked = m.deps.zip(depStatuses).collectFirst {
          case (d, Failed(_)) => d
          case (d, Skipped(_)) => d
        }
        blocked match {
          case Some(d) => Future.successful(Skipped(d))
          case None => Future {
            Try {
              m.preHook(spark)
              m.build(spark)
              m.postHook(spark)
            } match {
              case Success(_) => Success_
              case Failure(e) => Failed(e)
            }
          }
        }
      }
    }

    try {
      val all = Future.sequence(models.map(m => futures(m.name).map(m.name -> _)))
      Await.result(all, Duration.Inf).toMap
    } finally pool.shutdown()
  }
}
