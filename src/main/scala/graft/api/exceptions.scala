package graft.api

/** Typed error contract mirroring firepit/exceptions.py:1-40. */
class GraftException(msg: String) extends RuntimeException(msg)
class InvalidViewname(name: String) extends GraftException(s"invalid view name: $name")
class InvalidStixPath(path: String) extends GraftException(s"invalid STIX path: $path")
class InvalidAttr(attr: String) extends GraftException(s"invalid attribute: $attr")
class IncompatibleType(msg: String) extends GraftException(msg)
class UnknownViewname(name: String) extends GraftException(s"unknown view: $name")
class InvalidQuery(msg: String) extends GraftException(msg)
class StixPatternError(pattern: String) extends GraftException(s"bad STIX pattern: $pattern")
class DuplicateTable(name: String) extends GraftException(s"duplicate table: $name")
