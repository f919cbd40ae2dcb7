"""YARRRML/GREL function registry → built-in Column functions (§2.8).

The reference only *parses* ``function: ex:toLowerCase(input=$(x))``
(yarrrml_parser.py:577-606) and never executes it (except the special-cased
subject join). Here every registered function compiles to a Catalyst
expression, so mapped transforms run vectorized JVM-side.

Names are matched on the local part (after the prefix), case-insensitive —
``grel:toLowerCase``, ``ex:toLowerCase`` and ``toLowerCase`` all resolve.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

FunctionImpl = Callable[..., Column]

_FUNCTIONS: dict[str, FunctionImpl] = {}


def register_function(name: str):
    def deco(fn: FunctionImpl) -> FunctionImpl:
        _FUNCTIONS[name.lower()] = fn
        return fn

    return deco


def resolve_function(name: str) -> FunctionImpl:
    local = name.rsplit(":", 1)[-1].rsplit("/", 1)[-1].rsplit("#", 1)[-1]
    key = local.lower()
    if key not in _FUNCTIONS:
        raise ValueError(f"unregistered mapping function: {name!r}")
    return _FUNCTIONS[key]


def registered_functions() -> list[str]:
    return sorted(_FUNCTIONS)


register_function("toLowerCase")(lambda c: F.lower(c))
register_function("toUpperCase")(lambda c: F.upper(c))
register_function("trim")(lambda c: F.trim(c))
register_function("reverse")(lambda c: F.reverse(c))
register_function("length")(lambda c: F.length(c).cast("string"))
register_function("md5")(lambda c: F.md5(c))
register_function("sha256")(lambda c: F.sha2(c, 256))
register_function("title")(lambda c: F.initcap(c))


@register_function("substring")
def _substring(c: Column, start: Column | str = "0", end: Column | str = "0") -> Column:
    s = F.lit(int(start)) if isinstance(start, str) else start
    e = F.lit(int(end)) if isinstance(end, str) else end
    return F.substring(c, s + 1, e - s)


@register_function("replace")
def _replace(c: Column, find: Column | str = "", repl: Column | str = "") -> Column:
    f_ = F.lit(find) if isinstance(find, str) else find
    r_ = F.lit(repl) if isinstance(repl, str) else repl
    return F.replace(c, f_, r_)


@register_function("concat")
def _concat(*cols: Column) -> Column:
    return F.concat(*cols)
