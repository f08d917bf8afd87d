package graft.sources

/** Local-filesystem helpers shared by the layout tooling and Verify. */
object FsUtil {
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }
}
