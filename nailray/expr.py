"""Expression surface: the condition mini-language and `create`
expressions, evaluated vectorized over Arrow batches.

Reference parity:
- conditions ``col OP literal`` with ops ``= != > >= < <=``, comma-AND,
  literal inference int → float → bool → string
  (src/commands/filter.rs:84-119, src/commands/drop.rs:130-140)
- case-insensitive column resolution (src/utils/column.rs:4-27)
- `create` arithmetic ``+ - * / ( )`` plus comparisons
  (src/commands/create.rs:13-23)

All evaluation is ``pyarrow.compute`` over zero-copy batches inside
``map_batches`` — no per-row Python.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

_OPS = ["!=", ">=", "<=", "=", ">", "<"]
_OP_FN = {
    "=": pc.equal,
    "!=": pc.not_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
    "<": pc.less,
    "<=": pc.less_equal,
}


def resolve_column(names: list[str], name: str) -> str:
    """Exact match first, then case-insensitive (src/utils/column.rs:4-27)."""
    if name in names:
        return name
    lowered = {n.lower(): n for n in names}
    if name.lower() in lowered:
        return lowered[name.lower()]
    raise KeyError(f"column '{name}' not found; available: {names}")


def infer_literal(text: str):
    """int → float → bool → string (src/commands/filter.rs:95-101)."""
    text = text.strip()
    try:
        return int(text)
    except ValueError:
        pass
    try:
        return float(text)
    except ValueError:
        pass
    if text.lower() in ("true", "false"):
        return text.lower() == "true"
    return text.strip("'\"")


@dataclass
class Condition:
    column: str
    op: str
    value: object

    def mask(self, batch: pa.Table) -> pa.ChunkedArray:
        col = batch.column(self.column)
        val = self.value
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            val = str(val)
        elif isinstance(val, str):
            # string literal against numeric column → compare as string
            col = pc.cast(col, pa.string())
        return _OP_FN[self.op](col, val)


def parse_conditions(spec: str, names: list[str]) -> list[Condition]:
    """Parse ``"age>25,status=active"`` → AND-combined conditions."""
    out = []
    for raw in spec.split(","):
        raw = raw.strip()
        if not raw:
            continue
        for op in _OPS:
            i = raw.find(op)
            if i > 0:
                col = resolve_column(names, raw[:i].strip())
                out.append(Condition(col, op, infer_literal(raw[i + len(op):])))
                break
        else:
            raise ValueError(f"cannot parse condition: {raw!r}")
    return out


def conditions_mask(batch: pa.Table, conds: list[Condition]) -> pa.Array:
    mask = None
    for c in conds:
        m = c.mask(batch)
        mask = m if mask is None else pc.and_kleene(mask, m)
    if mask is None:
        return pa.array([True] * batch.num_rows)
    return pc.fill_null(mask, False)


# --------------------------------------------------------------------------
# create-expression evaluator: + - * / ( ) comparisons, columns, literals
# --------------------------------------------------------------------------

_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*|\.\d+|\d+)|(?P<id>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<str>'[^']*'|\"[^\"]*\")|(?P<op>!=|>=|<=|[-+*/()=<>]))"
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise ValueError(f"bad token at {src[pos:]!r}")
        pos = m.end()
        for kind in ("num", "id", "str", "op"):
            v = m.group(kind)
            if v is not None:
                toks.append((kind, v))
                break
    return toks


class Expr:
    def eval(self, batch: pa.Table):
        raise NotImplementedError


@dataclass
class Lit(Expr):
    value: object

    def eval(self, batch):
        return self.value


@dataclass
class Col(Expr):
    name: str

    def eval(self, batch):
        return batch.column(self.name)


@dataclass
class Bin(Expr):
    op: str
    left: Expr
    right: Expr

    _FN = {
        "+": pc.add, "-": pc.subtract, "*": pc.multiply,
        "/": pc.divide, **_OP_FN,
    }

    def eval(self, batch):
        ln, rn = self.left.eval(batch), self.right.eval(batch)
        if self.op == "/":
            # float division semantics (SQL-style) even for int columns
            if hasattr(ln, "type") and pa.types.is_integer(ln.type):
                ln = pc.cast(ln, pa.float64())
            elif isinstance(ln, int):
                ln = float(ln)
        return self._FN[self.op](ln, rn)


class _Parser:
    """Precedence-climbing parser for the documented operator set."""

    def __init__(self, toks: list[tuple[str, str]], names: list[str]):
        self.toks = toks
        self.i = 0
        self.names = names

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> Expr:
        e = self.comparison()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return e

    def comparison(self) -> Expr:
        left = self.additive()
        kind, v = self.peek()
        if kind == "op" and v in ("=", "!=", ">", ">=", "<", "<="):
            self.next()
            return Bin(v, left, self.additive())
        return left

    def additive(self) -> Expr:
        left = self.multiplicative()
        while True:
            kind, v = self.peek()
            if kind == "op" and v in ("+", "-"):
                self.next()
                left = Bin(v, left, self.multiplicative())
            else:
                return left

    def multiplicative(self) -> Expr:
        left = self.unary()
        while True:
            kind, v = self.peek()
            if kind == "op" and v in ("*", "/"):
                self.next()
                left = Bin(v, left, self.unary())
            else:
                return left

    def unary(self) -> Expr:
        kind, v = self.peek()
        if kind == "op" and v == "-":
            self.next()
            return Bin("-", Lit(0), self.unary())
        return self.primary()

    def primary(self) -> Expr:
        kind, v = self.next()
        if kind == "num":
            return Lit(float(v) if "." in v else int(v))
        if kind == "str":
            return Lit(v[1:-1])
        if kind == "id":
            return Col(resolve_column(self.names, v))
        if kind == "op" and v == "(":
            e = self.comparison()
            k2, v2 = self.next()
            if v2 != ")":
                raise ValueError("expected )")
            return e
        raise ValueError(f"unexpected token {v!r}")


def parse_expression(src: str, names: list[str]) -> Expr:
    return _Parser(_tokenize(src), names).parse()
