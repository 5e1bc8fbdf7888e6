package graft.streaming

import graft.SparkSpec
import graft.cdc.{CanalJson, CdcApply}

/** S5 snapshot export/restore (scripts/backup.sh / restore.sh analog). */
class SnapshotSpec extends SparkSpec {

  test("export → restore round-trips state; manifest carries metadata") {
    val state = CdcApply.materialize(CanalJson.events(CanalJson.fixtureRaw(spark)))
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    Snapshot.export(state, dir, Map("source_offset" -> "9"))
    val back = Snapshot.restore(spark, dir)
    assert(back.count() === state.count())
    assert(back.columns.sorted === state.columns.sorted)
    val m = Snapshot.manifest(dir)
    assert(m("source_offset") === "9")
    assert(m("row_count").toLong === state.count())
  }

  test("torn snapshot (manifest row-count mismatch) fails the restore loudly") {
    val state = CdcApply.materialize(CanalJson.events(CanalJson.fixtureRaw(spark)))
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_torn").toString
    Snapshot.export(state, dir)
    val props = new java.util.Properties()
    props.setProperty("row_count", "999")
    val out = new java.io.FileOutputStream(s"$dir/MANIFEST.properties")
    try props.store(out, "tampered") finally out.close()
    intercept[IllegalArgumentException] { Snapshot.restore(spark, dir) }
  }
}
