package graft.ops

import java.io.{DataInputStream, DataOutputStream, EOFException, IOException}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Magic + version stamp for the ops library's persisted artifacts
  * ([[KeyBloom]] binary filters, [[BandPostings]] postings dirs,
  * [[Pq]] / [[IvfIndex]] model parquets).
  *
  * Without a stamp, every loader validated SHAPE only (non-contiguous PQ
  * blocks rejected, torn postings repaired) — so a future format change,
  * or pointing a loader at the wrong artifact type, would decode garbage
  * before anything failed. The stamp makes all three failure modes loud
  * and specific: wrong magic (not a graft artifact / pre-versioning
  * file), wrong KIND (a Pq dir fed to IvfIndex.load), wrong VERSION (an
  * artifact from a newer release).
  *
  * Two carriers, one layout (`magic,int kind,int version` big-endian):
  *  - binary streams ([[KeyBloom.save]]): [[writeStamp]]/[[readStamp]]
  *    at the head of the stream;
  *  - parquet directories ([[Pq.save]], [[IvfIndex.save]]): an
  *    underscore-prefixed sidecar file (ignored by parquet readers),
  *    [[writeSidecar]]/[[checkSidecar]]. [[BandPostings]] stamps the
  *    head of its existing `_graft_band_params` sidecar instead of
  *    adding a second file.
  */
private[graft] object ArtifactFormat {

  /** "GRFT" — shared across artifact kinds; the kind int disambiguates. */
  val Magic: Int = 0x47524654

  val KindKeyBloom = 1
  val KindBandPostings = 2
  val KindPqModel = 3
  val KindIvfModel = 4

  /** Current writer version (per kind; all at 1 — bump on any layout
    * change so old releases reject new artifacts instead of misreading
    * them, and vice versa). */
  val Version = 1

  private def name(kind: Int): String = kind match {
    case KindKeyBloom     => "KeyBloom"
    case KindBandPostings => "BandPostings"
    case KindPqModel      => "Pq model"
    case KindIvfModel     => "IvfIndex model"
    case other            => s"artifact kind #$other"
  }

  def writeStamp(out: DataOutputStream, kind: Int): Unit = {
    out.writeInt(Magic)
    out.writeInt(kind)
    out.writeInt(Version)
  }

  /** Read + validate a [[writeStamp]] header; throws with a specific
    * message on truncation, foreign files, kind mixups, and unknown
    * versions. */
  def readStamp(in: DataInputStream, kind: Int, where: String): Unit = {
    val (m, k, v) =
      try (in.readInt(), in.readInt(), in.readInt())
      catch {
        case _: EOFException => throw new IOException(
          s"[${name(kind)}] $where is truncated inside the format stamp")
      }
    if (m != Magic) throw new IOException(
      f"[${name(kind)}] $where is not a graft ${name(kind)} artifact " +
        f"(magic 0x$m%08x, expected 0x$Magic%08x) — a pre-versioning " +
        "artifact must be re-saved by this release")
    if (k != kind) throw new IOException(
      s"[${name(kind)}] $where holds a ${name(k)} artifact, not a ${name(kind)}")
    if (v != Version) throw new IOException(
      s"[${name(kind)}] $where has format version $v; this release reads only $Version")
  }

  /** Sidecar name for parquet-directory artifacts; the underscore prefix
    * keeps Spark/parquet path listings from treating it as data. */
  private[graft] val SidecarFile = "_graft_format"

  def writeSidecar(fs: FileSystem, dir: String, kind: Int): Unit = {
    val out = new DataOutputStream(fs.create(new Path(dir, SidecarFile), true))
    try writeStamp(out, kind) finally out.close()
  }

  def checkSidecar(fs: FileSystem, dir: String, kind: Int): Unit = {
    val p = new Path(dir, SidecarFile)
    if (!fs.exists(p)) throw new java.io.FileNotFoundException(
      s"[${name(kind)}] no $SidecarFile under $dir — not a graft " +
        s"${name(kind)} artifact, or written by a pre-versioning release " +
        "(re-save to stamp it)")
    val in = new DataInputStream(fs.open(p))
    try readStamp(in, kind, dir) finally in.close()
  }
}
