package graft.tools

/** The one recursive local-file delete (the JDK has no single-call
  * equivalent) — shared by the probe/fixture mains, Verify, and the
  * fixture-backed queries instead of a per-file copy. */
object LocalFs {
  def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }
}
