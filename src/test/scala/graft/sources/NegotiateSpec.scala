package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import Negotiate._

/** S4 fork-point negotiation (`src/subscriber.rs:97-100,153-178`):
  * window construction, shift-by-10 recursion, genesis fallback, and the
  * resume-index mapping used by the block-log stand-in. */
class NegotiateSpec extends AnyFunSuite {

  private val ids = (1 to 25).map(i => f"blk$i%02d").reverse // newest first

  test("window: ≤10 ids from startIndex; genesis past the end") {
    assert(window(ids, 0) === ids.slice(0, 10))
    assert(window(ids, 10) === ids.slice(10, 20))
    assert(window(ids, 20) === ids.slice(20, 25)) // short tail window
    assert(window(ids, 25) === Seq(NullBlockId))
    assert(window(Seq.empty, 0) === Seq(NullBlockId))
  }

  test("validator knows a block in the first window → accepted immediately") {
    var calls = 0
    val known = Set(ids(3)) // 4th-newest block survived the fork
    val r = negotiate(ids, w => { calls += 1
      if (w.exists(known) || w.contains(NullBlockId)) Ok else UnknownBlock })
    assert(r === Right(ids.slice(0, 10)))
    assert(calls === 1)
  }

  test("UNKNOWN_BLOCK shifts the window by 10 until an ancestor is found") {
    val offered = collection.mutable.Buffer.empty[Seq[String]]
    val known = Set(ids(22)) // deep fork: only an old block is shared
    val r = negotiate(ids, w => { offered += w
      if (w.exists(known)) Ok else UnknownBlock })
    assert(r === Right(ids.slice(20, 25)))
    assert(offered.toSeq === Seq(ids.slice(0, 10), ids.slice(10, 20), ids.slice(20, 25)))
  }

  test("nothing shared → genesis fallback accepted") {
    val offered = collection.mutable.Buffer.empty[Seq[String]]
    val r = negotiate(ids, w => { offered += w
      if (w.contains(NullBlockId)) Ok else UnknownBlock })
    assert(r === Right(Seq(NullBlockId)))
    assert(offered.size === 4) // 3 shifted windows + genesis
  }

  test("genesis rejected → terminating error (reference recurses forever)") {
    assert(negotiate(ids, _ => UnknownBlock).isLeft)
  }

  test("invalid validator status surfaces as an error") {
    assert(negotiate(ids, _ => Invalid("INVALID_FILTER")).isLeft)
  }

  test("resumeIndex: just past the newest known id still in the log") {
    val log = (1 to 20).map(i => f"blk$i%02d")
    // consumer knows blocks 25..16 (newest first); log only reaches 20
    assert(resumeIndex(ids.take(10), log) === Right(20)) // blk20 is newest shared
    // consumer knows only blocks the log never had → genesis, replay all
    assert(resumeIndex(Seq("other1", "other2"), log) === Right(0))
    // empty store (bootstrap): single genesis window, full replay
    assert(resumeIndex(Seq(NullBlockId), log) === Right(0))
  }
}
