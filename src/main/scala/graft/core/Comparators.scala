package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Comparator DSL — the query-predicate surface of the reference
  * (littletable.py:998-1139): `lt/le/gt/ge/ne/eq`, `is_none/is_not_none`,
  * `is_null/is_not_null` (reference treats `None` OR `""` as null),
  * `is_in/not_in`, `startswith/endswith`, `between` (open interval),
  * `within` (closed), `in_range` (half-open).
  *
  * Each combinator is a `Column => Column` predicate builder, so it composes
  * directly into Catalyst plans (full pushdown / codegen — no UDFs). Usage:
  *
  * {{{
  *   tbl.where("l_quantity" -> Cmp.gt(45), "l_returnflag" -> Cmp.eq("R"))
  * }}}
  */
object Cmp {
  type Pred = Column => Column

  /** NOTE (Scala pitfall): in a context expecting `Any`/`AnyRef` —
    * e.g. building a heterogeneous Seq — `Cmp.eq(x)`/`Cmp.ne(x)` can
    * resolve to `AnyRef.eq`/`AnyRef.ne` (reference identity, returns
    * Boolean) instead of these Pred factories. Where the expected type
    * is `Pred` (the normal `where(...)` call shape) resolution is
    * correct; in generic contexts prefer the collision-free aliases
    * [[is]] / [[isNot]]. Names kept for reference parity (Table.eq/ne,
    * littletable.py:1119-1139). */
  def eq(v: Any): Pred = _ === lit(v)
  def ne(v: Any): Pred = _ =!= lit(v)
  /** Collision-free alias of [[eq]]. */
  def is(v: Any): Pred = _ === lit(v)
  /** Collision-free alias of [[ne]]. */
  def isNot(v: Any): Pred = _ =!= lit(v)
  def lt(v: Any): Pred = _ < lit(v)
  def le(v: Any): Pred = _ <= lit(v)
  def gt(v: Any): Pred = _ > lit(v)
  def ge(v: Any): Pred = _ >= lit(v)

  /** Reference semantics: attribute is absent / None (littletable.py:1125). */
  def isNone: Pred = _.isNull
  def isNotNone: Pred = _.isNotNull

  /** Reference semantics: null means None OR empty string
    * (littletable.py:1127-1130). */
  def isNullOrEmpty: Pred = c => c.isNull || (c === lit(""))
  def isNotNullOrEmpty: Pred = c => c.isNotNull && (c =!= lit(""))

  def isIn(vs: Any*): Pred = _.isin(vs: _*)
  def notIn(vs: Any*): Pred = c => !c.isin(vs: _*)

  def startswith(s: String): Pred = _.startsWith(s)
  def endswith(s: String): Pred = _.endsWith(s)

  /** Open interval: lo < x < hi (littletable.py:1133). */
  def between(lo: Any, hi: Any): Pred = c => (c > lit(lo)) && (c < lit(hi))

  /** Closed interval: lo <= x <= hi (littletable.py:1135). */
  def within(lo: Any, hi: Any): Pred = c => (c >= lit(lo)) && (c <= lit(hi))

  /** Half-open interval: lo <= x < hi (littletable.py:1137). */
  def inRange(lo: Any, hi: Any): Pred = c => (c >= lit(lo)) && (c < lit(hi))

  /** Regex containment — the reference's `re.compile(...).search` predicate
    * idiom (how_to_use_littletable.md:615-647). */
  def matches(regex: String): Pred = _.rlike(regex)
}
