package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.ops.{DupGroups, Lineage}

/** [[Lineage.cut]] dispatch: reliable `checkpoint` when the session has a
  * checkpoint dir (the cluster deployment — blocks survive executor loss
  * and dynamic allocation), `localCheckpoint` otherwise (single-box
  * zero-I/O path), overridable with `spark.graft.checkpoint`. The suite
  * pins the conf to `local` on exit: `SparkContext.setCheckpointDir`
  * cannot be unset, and later suites in the shared session must keep the
  * zero-I/O behavior they were written against.
  */
class LineageSpec extends SparkSpec {

  private def treeFiles(p: Path): Long = {
    val s = Files.walk(p)
    try s.filter(Files.isRegularFile(_)).count()
    finally s.close()
  }

  test("auto mode goes reliable once a checkpoint dir is set; iterative op stays correct") {
    val session = spark
    import session.implicits._
    try {
      // no dir yet: auto must take the local path (cut succeeds without
      // any checkpoint dir configured — reliable would throw)
      assert(session.sparkContext.getCheckpointDir.isEmpty)
      val local = Lineage.cut(Seq(1, 2).toDF("x"))
      assert(local.as[Int].collect().sorted.sameElements(Array(1, 2)))

      val dir = Files.createTempDirectory("graft-lineage-ckpt")
      session.sparkContext.setCheckpointDir(dir.toString)
      val before = treeFiles(dir)

      // explicit local: no new checkpoint files even though the dir is set
      session.conf.set("spark.graft.checkpoint", "local")
      Lineage.cut(Seq(3).toDF("x")).collect()
      assert(treeFiles(dir) == before, "local mode must not write checkpoints")

      // auto + dir: the whole iterative loop runs on reliable checkpoints
      session.conf.unset("spark.graft.checkpoint")
      val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("u", "v")
      val comps = DupGroups.connectedComponents(edges, "u", "v")
        .as[(Long, Long)].collect().toSet
      assert(comps == Set((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L)))
      assert(treeFiles(dir) > before,
        "auto mode with a checkpoint dir must write reliable checkpoints")
    } finally {
      // sticky for the rest of the shared-session JVM (see class doc)
      session.conf.set("spark.graft.checkpoint", "local")
    }
  }
}
