package graft.sources

/** S4 fork-point negotiation — pure logic, transport-agnostic
  * (reference `src/subscriber.rs:97-100,153-178`).
  *
  * The subscriber offers the validator a window of its newest known block
  * ids; the validator accepts (subscribes from the newest id it
  * recognizes) or answers UNKNOWN_BLOCK, upon which the window shifts
  * KnownCount older and the request repeats. Past the end of the known
  * list the offer degrades to the genesis `NULL_BLOCK_ID`, which every
  * validator accepts. `respond` abstracts the transport: production would
  * send a ClientEventsSubscribeRequest over ZMQ; tests and the block-log
  * stand-in answer from a local id set.
  */
object Negotiate {
  val NullBlockId = "0000000000000000"
  val KnownCount = 10

  sealed trait Response
  case object Ok extends Response
  case object UnknownBlock extends Response
  final case class Invalid(status: String) extends Response

  /** The ≤KnownCount-id window offered at `startIndex` over the
    * newest-first known list; genesis fallback past the end
    * (`src/subscriber.rs:158-178`). */
  def window(knownIds: Seq[String], startIndex: Int): Seq[String] =
    if (startIndex >= knownIds.length) Seq(NullBlockId)
    else knownIds.slice(startIndex, startIndex + KnownCount)

  /** Shift-by-KnownCount negotiation (`src/subscriber.rs:97-100`).
    * Returns the accepted window (newest-first — the resume anchor is the
    * first id in it the responder recognizes), or the error status.
    *
    * Deviation from the reference, documented: the reference recurses
    * unboundedly if the validator keeps rejecting the genesis window; we
    * treat UNKNOWN_BLOCK on `[NULL_BLOCK_ID]` as a protocol error so the
    * handshake always terminates.
    */
  @annotation.tailrec
  def negotiate(knownIds: Seq[String], respond: Seq[String] => Response,
                startIndex: Int = 0): Either[String, Seq[String]] = {
    val w = window(knownIds, startIndex)
    respond(w) match {
      case Ok if w.nonEmpty => Right(w)
      case Ok => Left("validator accepted an empty window")
      case UnknownBlock if w == Seq(NullBlockId) =>
        Left("validator rejected the genesis window (NULL_BLOCK_ID)")
      case UnknownBlock => negotiate(knownIds, respond, startIndex + KnownCount)
      case Invalid(s) => Left(s"validator returned an invalid response: $s")
    }
  }

  /** Checkpoint-recovery resume point for an id-addressable log: the
    * position just after the newest known id the log still contains, 0
    * when negotiation falls back to genesis (full replay).
    *
    * `logIds` is the log's block ids in consumption order. This is the
    * respond-side of the handshake the validator performs server-side:
    * membership of any offered id ⇒ OK.
    */
  def resumeIndex(knownNewestFirst: Seq[String], logIds: Seq[String]): Either[String, Int] = {
    val present = logIds.toSet
    negotiate(knownNewestFirst, w =>
      if (w.contains(NullBlockId) || w.exists(present)) Ok else UnknownBlock)
      .map { accepted =>
        accepted.find(present) match {
          case Some(anchor) => logIds.lastIndexOf(anchor) + 1
          case None => 0 // genesis: replay the whole log
        }
      }
  }
}
