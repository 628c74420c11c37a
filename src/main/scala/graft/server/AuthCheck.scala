package graft.server

import java.nio.charset.StandardCharsets.UTF_8

/** Constant-time credential comparison for the HTTP and Flight auth
  * layers: plain string equality short-circuits at the first differing
  * character — a timing side channel on secret comparison.
  * `MessageDigest.isEqual` compares the full byte arrays time-independent
  * of content (it still reveals the length, which is standard and benign
  * for `Bearer`/`Basic` header shapes).
  */
object AuthCheck {
  def sameSecret(expected: String, provided: String): Boolean =
    java.security.MessageDigest.isEqual(
      expected.getBytes(UTF_8), provided.getBytes(UTF_8))
}
