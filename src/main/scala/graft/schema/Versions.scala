package graft.schema

/** Schema/code version compatibility (the reference's VersionTuple
  * semantics, P/sql/_ppdb_sql_base.py:333-372): versions are
  * major.minor.patch; a stored schema is usable by running code iff the
  * majors match and the code's minor is >= the stored minor (newer minors
  * are backward compatible; majors are breaking).
  */
final case class VersionTuple(major: Int, minor: Int, patch: Int) {
  def render: String = s"$major.$minor.$patch"

  /** Can code at `this` version read data written at `stored`? */
  def compatibleWith(stored: VersionTuple): Boolean =
    major == stored.major && minor >= stored.minor
}

object VersionTuple {
  val Current: VersionTuple = VersionTuple(0, 1, 0)

  def parse(s: String): VersionTuple = s.split("\\.") match {
    case Array(ma, mi, pa) => VersionTuple(ma.toInt, mi.toInt, pa.toInt)
    case _ => throw new IllegalArgumentException(s"bad version '$s'")
  }
}
