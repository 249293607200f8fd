package graft.io

/** Tiny filesystem helpers shared across the engine (one definition —
  * four copies of the recursive delete had already drifted in style). */
object FsUtil {
  /** Recursive delete, tolerant of races (missing children are fine). */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
