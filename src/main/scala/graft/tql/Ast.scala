package graft.tql

/** TQL expression AST (reference: mods/tql/expression — Pratt-parsed
  * scalar expressions used in every statement; operator set
  * expression/operator.go:5-124).
  */
sealed trait Expr
object Expr {
  case class Num(v: Double) extends Expr
  case class Str(v: String) extends Expr
  case class Bool(v: Boolean) extends Expr
  case object Null extends Expr
  case class Ident(name: String) extends Expr
  /** `$name` — record variable set by SET / request param. */
  case class Var(name: String) extends Expr
  case class Call(name: String, args: List[Expr]) extends Expr
  case class Unary(op: String, e: Expr) extends Expr
  case class Bin(op: String, l: Expr, r: Expr) extends Expr
  /** cond ? a : b */
  case class Ternary(c: Expr, t: Expr, f: Expr) extends Expr
  /** value IN (a, b, c) */
  case class In(v: Expr, set: List[Expr]) extends Expr
  case class Index(e: Expr, idx: Expr) extends Expr
}

/** One parsed TQL statement: a top-level function call. */
case class Statement(call: Expr.Call, text: String)
