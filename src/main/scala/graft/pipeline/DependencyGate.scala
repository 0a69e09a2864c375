package graft.pipeline

import com.fasterxml.jackson.databind.JsonNode
import graft.config.Specs.NodeOps
import java.time.{Duration, Instant}

/** Job-audit store + dependency gate (SURVEY.md §1.4 / lambda_handler.py
  * 157-178 and the dependency_trigger Lambda): a dependent dataset's job is
  * queued until every `depends_on` source has completed successfully within
  * the `lookback` window; a completing job then releases its queued
  * dependents. DynamoDB audit table → in-memory/JSONL audit log. */
object DependencyGate {

  case class DependencySpec(dependsOn: Map[String, Int], lookback: Option[Duration])

  def parseSpec(root: JsonNode): DependencySpec = {
    import scala.jdk.CollectionConverters._
    val deps = Option(root.get("depends_on")).map(_.properties().asScala
      .map(e => e.getKey -> e.getValue.asInt).toMap).getOrElse(Map.empty)
    val lookback = Option(root.get("lookback")).map { lb =>
      Duration.ofDays(lb.int("days").getOrElse(0).toLong)
        .plusHours(lb.int("hours").getOrElse(0).toLong)
    }
    DependencySpec(deps, lookback)
  }

  case class JobRun(sourceKey: String, executionId: String, status: String,
                    updated: Instant)

  /** In-memory job-audit log (swap for a durable KV store in production). */
  class AuditLog {
    private val runs = scala.collection.mutable.ListBuffer.empty[JobRun]
    def record(run: JobRun): Unit = synchronized { runs += run }
    def latestSuccess(sourceKey: String): Option[Instant] = synchronized {
      runs.filter(r => r.sourceKey == sourceKey && r.status == "SUCCEEDED")
        .map(_.updated).sorted(Ordering[Instant].reverse).headOption
    }
  }

  /** True when the job must QUEUE: it has dependencies and at least one has
    * not succeeded within the lookback window (no lookback → always queue
    * until a dependent completes explicitly, as in the reference's
    * queue_job=bool(dependencies)). */
  def mustQueue(spec: DependencySpec, audit: AuditLog,
                now: Instant = Instant.now()): Boolean = {
    if (spec.dependsOn.isEmpty) return false
    spec.lookback match {
      case None => true
      case Some(lb) =>
        !spec.dependsOn.keys.forall { dep =>
          audit.latestSuccess(dep).exists(t => !t.isBefore(now.minus(lb)))
        }
    }
  }
}
