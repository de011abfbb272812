package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Savepoint manager — the reference's stop-with-savepoint / restore flow
  * (`JobStandaloneServerAOImpl.java:88-158`, `CommandUtil.java:117-137`)
  * restated for Structured Streaming: a "savepoint" is a snapshot of the
  * query's checkpointLocation taken while the query is stopped; restore
  * starts the (same-plan) query pointing at a copy of the snapshot.
  * Mirrors the reference's `savepoint_backup` registry with an on-disk
  * layout `<root>/<name>/sp-<n>`.
  *
  * Same-plan restriction applies exactly as in the platform's own use
  * (restart the same SQL job): Spark checkpoints are not relocatable
  * across plan changes (SURVEY §7.4).
  */
object Savepoints {

  private def index(name: String): Option[Int] =
    if (name.startsWith("sp-")) name.stripPrefix("sp-").toIntOption else None

  /** Snapshot a stopped query's checkpoint dir; returns the savepoint
    * path. Numbered max-existing-index + 1 so pruning old savepoints can
    * never make a new snapshot collide with (and corrupt) a survivor.
    */
  def snapshot(checkpointDir: String, root: String, name: String): String = {
    val src = Paths.get(checkpointDir)
    require(Files.isDirectory(src), s"no checkpoint at $checkpointDir")
    val base = Paths.get(root, name)
    Files.createDirectories(base)
    val n = Option(base.toFile.list()).map(
      _.flatMap(index).foldLeft(-1)(math.max) + 1).getOrElse(0)
    val dst = base.resolve(s"sp-$n")
    copyTree(src, dst)
    dst.toString
  }

  /** Materialize a savepoint as a fresh checkpoint dir to restart from.
    * (Copying keeps the savepoint immutable — the restarted query mutates
    * its own checkpoint, like Flink's restore-from-savepoint.)
    */
  def restore(savepointPath: String, newCheckpointDir: String): String = {
    val dst = Paths.get(newCheckpointDir)
    if (Files.exists(dst)) {
      Using.resource(Files.walk(dst)) { walk =>
        walk.sorted(Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.delete)
      }
    }
    copyTree(Paths.get(savepointPath), dst)
    newCheckpointDir
  }

  /** List savepoints for a job name in numeric order, newest last
    * (lexical order would put sp-10 before sp-2).
    */
  def list(root: String, name: String): Seq[String] = {
    val base = Paths.get(root, name)
    if (!Files.isDirectory(base)) Nil
    else base.toFile.list().flatMap(index).sorted
      .map(n => base.resolve(s"sp-$n").toString).toSeq
  }

  private def copyTree(src: Path, dst: Path): Unit =
    Using.resource(Files.walk(src)) { walk =>
      walk.iterator().asScala.foreach { p =>
        val target = dst.resolve(src.relativize(p).toString)
        try {
          if (Files.isDirectory(p)) Files.createDirectories(target)
          else {
            Files.createDirectories(target.getParent)
            Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING)
          }
        } catch {
          // live-checkpoint snapshot (auto-savepoint of a RUNNING job):
          // state compaction can delete a file between walk and copy —
          // skip it; Spark's commit protocol keeps the snapshot usable
          // (uncommitted batch files are ignored on restore)
          case _: java.nio.file.NoSuchFileException => ()
        }
      }
    }
}
