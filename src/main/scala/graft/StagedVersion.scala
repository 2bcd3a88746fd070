package graft

/** Stage-once-per-version memo for oracle scratch tables (the
  * pattern VERDICT r7 item 2 asked for, now in one place instead of
  * four hand-rolled copies): runs the staging body only when `key`
  * differs from the LAST staged key — once per JVM for a constant
  * key, and re-staged whenever a version key (an index path, a
  * corpus fingerprint) moves. Last-version semantics matter: a
  * set-of-done-keys memo would wrongly skip re-staging on a version
  * flip-flop (A → B → A), leaving the single staged output holding
  * B's data while the operator runs against A. Double-checked under
  * the instance lock so concurrent first callers stage once. */
final class StagedVersion[K] {
  @volatile private var current: Option[K] = None
  def apply(key: K)(body: => Unit): Unit =
    if (!current.contains(key)) synchronized {
      if (!current.contains(key)) { body; current = Some(key) }
    }
}
