package graft.core

/** Collision-safe short tag for deriving table names / temp paths /
  * conf memo keys from fixture-dir strings.
  *
  * `String.hashCode` (the previous scheme) is 32-bit and weak: two
  * different fixture dirs colliding in one session would silently
  * return the other dir's bucket count or skip the stamp check for the
  * wrong layout (advice r10). MD5 truncated to 64 bits keeps names
  * short (16 hex chars) while making accidental collisions
  * implausible (~2⁻³² at even millions of distinct keys), and stays
  * deterministic across JVMs so stamped layouts remain reusable
  * between sessions.
  */
object PathTag {
  def tag(key: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(key.getBytes("UTF-8")).take(8)
      .map(b => f"${b & 0xff}%02x").mkString
  }
}
