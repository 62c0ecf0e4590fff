"""Posterior-expression evaluation: derived quantities from fitted params.

Rebuilds ``walker-with-exp`` (mcmc-fitting.lisp:1052-1064) and its macro
sibling ``walker-get-f`` (1039): walk an expression, substitute ``:keyword``
parameters with their most-likely values, evaluate.  Reference uses:
``(walker-with-exp woi '(/ :linewidth :x0))`` (test.lisp:31) and
``(/ (- :mu2 :mu1) 2 2.8)`` (nv-specific.lisp:68-69).

Two input syntaxes are accepted:
  - Lisp-style s-expressions, e.g. ``"(/ (- :mu2 :mu1) 2 2.8)"`` — parsed
    and evaluated by a small safe interpreter (no ``eval``);
  - Python expressions with ``:name`` parameter references, e.g.
    ``":linewidth / :x0"`` — evaluated with an empty builtins namespace and
    a math whitelist.
"""

from __future__ import annotations

import math
import re
from typing import Mapping

__all__ = ["eval_expression", "walker_with_expression"]

_SEXP_OPS = {
    "+": lambda *a: sum(a),
    "-": lambda *a: a[0] - sum(a[1:]) if len(a) > 1 else -a[0],
    "*": lambda *a: math.prod(a),
    "/": lambda *a: a[0] / math.prod(a[1:]) if len(a) > 1 else 1.0 / a[0],
    "expt": lambda a, b: a**b,
    "exp": math.exp,
    "log": lambda a, *b: math.log(a, *b),
    "sqrt": math.sqrt,
    "sin": math.sin,
    "cos": math.cos,
    "tan": math.tan,
    "abs": abs,
    "min": min,
    "max": max,
    "floor": math.floor,
    "mod": lambda a, b: a % b,
}

_MATH_NS = {name: getattr(math, name) for name in (
    "exp", "log", "sqrt", "sin", "cos", "tan", "pi", "e", "floor", "ceil"
)}
_MATH_NS.update({"abs": abs, "min": min, "max": max})


def _tokenize_sexp(text: str) -> list[str]:
    return text.replace("(", " ( ").replace(")", " ) ").split()


def _parse_sexp(tokens: list[str]):
    if not tokens:
        raise ValueError("unexpected end of expression")
    tok = tokens.pop(0)
    if tok == "(":
        expr = []
        while tokens and tokens[0] != ")":
            expr.append(_parse_sexp(tokens))
        if not tokens:
            raise ValueError("missing closing paren")
        tokens.pop(0)
        return expr
    if tok == ")":
        raise ValueError("unexpected )")
    return tok


def _eval_sexp(node, params: Mapping[str, float]):
    if isinstance(node, list):
        if not node:
            raise ValueError("empty expression")
        op = node[0]
        if not isinstance(op, str) or op.lower() not in _SEXP_OPS:
            raise ValueError(f"unknown operator {op!r}")
        args = [_eval_sexp(a, params) for a in node[1:]]
        return _SEXP_OPS[op.lower()](*args)
    if isinstance(node, str):
        if node.startswith(":"):
            key = node[1:]
            if key not in params:
                raise KeyError(f"unknown parameter :{key}")
            return float(params[key])
        try:
            return float(node)
        except ValueError:
            raise ValueError(f"unknown atom {node!r}") from None
    return float(node)


def eval_expression(expr: str, params: Mapping[str, float]) -> float:
    """Evaluate an expression against a parameter dict.

    S-expression form if it starts with ``(``; otherwise a Python
    expression where ``:name`` references substitute parameter values.
    """
    expr = expr.strip()
    if expr.startswith("("):
        tokens = _tokenize_sexp(expr)
        tree = _parse_sexp(tokens)
        if tokens:
            raise ValueError(f"trailing tokens in expression: {tokens}")
        return float(_eval_sexp(tree, params))
    # Python style: substitute :name -> value, then eval in a bare namespace.
    def sub(match):
        key = match.group(1)
        if key not in params:
            raise KeyError(f"unknown parameter :{key}")
        return repr(float(params[key]))

    substituted = re.sub(r":([A-Za-z_][A-Za-z0-9_]*)", sub, expr)
    return float(eval(substituted, {"__builtins__": {}}, dict(_MATH_NS)))


def walker_with_expression(walker, expr: str, take: int | None = 1000) -> float:
    """``walker-with-exp`` (mcmc-fitting.lisp:1052-1064): evaluate ``expr``
    at the walker's most-likely parameters."""
    params = walker.most_likely_params()
    del take  # most-likely tracking is exact over the whole run here
    return eval_expression(expr, params)
