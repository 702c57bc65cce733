package graft.api

/** Identifier schemas (/root/reference/loudml/schemas.py:28-50,
  * tests/test_schemas.py): names used as storage paths and registry keys
  * must match `^[a-zA-Z0-9-_@]+$` — rejecting empties, slashes and dots
  * keeps every `<storageRoot>/<name>` path traversal-safe by
  * construction. */
object Schemas {

  private val KeyRe = "^[a-zA-Z0-9\\-_@]+$".r

  def isKey(s: String): Boolean =
    s != null && s.nonEmpty && s.length <= 256 && KeyRe.matches(s)

  def requireKey(s: String, what: String): String = {
    if (!isKey(s)) throw new IllegalArgumentException(
      s"invalid $what '$s': must match ^[a-zA-Z0-9-_@]+$$ (schemas.py:28-32)")
    s
  }
}
