package graft

/** Collision-resistant scratch-name key for a path string: the first 16
  * hex chars (64 bits) of its MD5.
  *
  * `String.hashCode`'s 32 bits reach even odds of a collision near 77k
  * distinct keys and admit trivially constructible collisions — two
  * fixture paths colliding would silently share a scratch directory (or
  * bucketed table name), the second writer's overwrite replacing the
  * first's data while the first memo still points at it. 64 digest bits
  * make an accidental collision implausible at any session scale
  * (~1e-10 at a million keys), and the hex form stays a valid path
  * segment and SQL identifier suffix.
  */
object PathKey {
  def apply(path: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
}
