package graft.api

/** Typed error contract mirroring firepit/exceptions.py:1-40. */
class GraftException(msg: String) extends RuntimeException(msg)
class InvalidViewname(name: String) extends GraftException(s"invalid view name: $name")
class InvalidStixPath(path: String) extends GraftException(s"invalid STIX path: $path")
class InvalidAttr(attr: String) extends GraftException(s"invalid attribute: $attr")
class IncompatibleType(msg: String) extends GraftException(msg)
class InvalidObject(msg: String) extends GraftException(msg)
class UnknownViewname(name: String) extends GraftException(s"unknown view: $name")
class InvalidQuery(msg: String) extends GraftException(msg)
class InvalidComparisonOperator(op: String)
    extends GraftException(s"invalid comparison operator: $op")
class InvalidAggregateFunction(func: String)
    extends GraftException(s"invalid aggregate function: $func")
class StixPatternError(pattern: String) extends GraftException(s"bad STIX pattern: $pattern")
class DuplicateTable(name: String) extends GraftException(s"duplicate table: $name")

/** Identifier/path validators kept for the reference's error contract
  * (firepit/validate.py:8-25; exercised by tests/test_errors.py) — the
  * SQL-injection threat model mostly disappears without SQL text, but the
  * typed failure behavior is part of the API. */
object Validate {
  private val namePattern = "^[\\w-]+$".r
  private val pathPattern =
    ("^([a-zA-Z][a-zA-Z0-9-]*:)?[\\w]+(\\[\\*\\])?" +
      "((\\.\\w+|\\.'[a-zA-Z0-9-]+')(\\[\\*\\])?)*$").r

  def validateName(name: String): Unit =
    if (name == null || namePattern.findFirstIn(name).isEmpty)
      throw new InvalidViewname(name)

  def validatePath(path: String): Unit =
    if (path == null || pathPattern.findFirstIn(path).isEmpty)
      throw new InvalidStixPath(path)
}
