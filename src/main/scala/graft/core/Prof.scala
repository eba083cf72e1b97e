package graft.core

/** Opt-in phase timing (`-Dgraft.streamprof=1`): prints one stderr line
  * per labeled phase so multi-job drives (streaming replays, the
  * incremental dedup store) can be attributed phase by phase without
  * touching bench output. A no-op unless the property is set. */
object Prof {
  val enabled: Boolean = sys.props.get("graft.streamprof").isDefined

  def apply[T](label: String)(body: => T): T =
    if (!enabled) body
    else {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[streamprof] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
}
