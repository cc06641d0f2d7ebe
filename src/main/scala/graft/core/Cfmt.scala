package graft.core

/** Locale-pinned formatting for the byte-exact text sinks: the
  * reference binaries printf under the C locale, while Scala's `f""`
  * interpolator formats with the JVM DEFAULT locale — on a de_DE JVM
  * `%f` prints `48,858000` and every golden byte comparison breaks.
  * All reference-parity formatting must go through here. */
object Cfmt {
  def f(fmt: String, args: Any*): String =
    String.format(java.util.Locale.ROOT, fmt, args.map(_.asInstanceOf[AnyRef]): _*)
}
