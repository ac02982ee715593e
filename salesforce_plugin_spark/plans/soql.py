"""SOQL front door (SURVEY §2 D, §7 phase 4): a small parser that turns the
reference's string-query entry points (``soql`` param
salesforce_to_s3_operator.py:29, ``query`` :127, generated projection
:201-202) into DataFrame plans. Strictly a front-end — every construct
lowers to DataFrame calls and Catalyst owns optimization from there.

Supported surface (the D-rows of SURVEY §2):

- ``SELECT f1, f2 | agg(f)`` projection and aggregates
  (COUNT()/COUNT(f)/COUNT_DISTINCT(f)/SUM/AVG/MIN/MAX) — D1, D10
- date functions in SELECT/GROUP BY: CALENDAR_YEAR/CALENDAR_MONTH/
  CALENDAR_QUARTER/DAY_ONLY/HOUR_IN_DAY/DAY_IN_WEEK/DAY_IN_MONTH/
  DAY_IN_YEAR/WEEK_IN_YEAR/WEEK_IN_MONTH and FISCAL_YEAR/FISCAL_QUARTER/
  FISCAL_MONTH under a configurable fiscal-year start month — D19
- ``WHERE`` with ``= != < <= > >= LIKE IN NOT IN``, AND/OR/NOT, parens,
  semi/anti subqueries ``[NOT] IN (SELECT ...)`` — D2-D7
- SOQL semantic shims: LIKE is case-insensitive (D3); ``= NULL`` /
  ``!= NULL`` are null tests, not ANSI unknown (D20)
- ``GROUP BY`` (+ ROLLUP/CUBE), ``HAVING`` — D11-D14
- ``ORDER BY ... [ASC|DESC] [NULLS FIRST|LAST]`` (SOQL default ASC NULLS
  FIRST = Spark's default) — D15
- ``LIMIT`` / ``OFFSET`` — D16, D17
- date literals with SOQL *range* semantics (``=`` is containment, ``<``
  precedes the range, ``>`` follows it): TODAY/YESTERDAY/TOMORROW,
  THIS|LAST|NEXT_WEEK/MONTH/QUARTER/YEAR, LAST|NEXT_90_DAYS, and the
  parameterized LAST|NEXT_N_DAYS/WEEKS/MONTHS/QUARTERS/YEARS:n and
  N_DAYS_AGO:n — anchored to an injectable ``today`` for deterministic
  replay — D18

- dot-path relationship traversal (D8) and nested parent-to-child
  subselects in SELECT (D9), given a ``RelationshipRegistry`` mapping
  relationship names to join keys (plays describe()'s metadata role)

Accepted-and-inert (parsed, recorded on the statement, no effect on the
result set — semantics are server-side bookkeeping with no analog in an
analytics replica):

- ``FOR VIEW`` / ``FOR REFERENCE`` — update Salesforce's "recently
  viewed/referenced" MRU lists server-side; result rows are unchanged.
- ``FOR UPDATE`` — row locking for a subsequent DML transaction; an
  analytics engine reads an immutable snapshot, so there is nothing to
  lock (recorded so callers can reject it if they need DML fidelity).
- ``WITH SECURITY_ENFORCED`` — field-level-security enforcement. The
  extracted replica is single-tenant (every field the extract ran with is
  present by construction), so enforcement is vacuous here; the flag is
  recorded on the parsed statement for callers that layer their own
  column-level policy.

- ``TYPEOF rel WHEN Type THEN f… [ELSE f…] END`` — polymorphic field
  branching, lowered to discriminator-guarded broadcast left joins per
  branch against ``RelationshipRegistry.poly`` metadata (the describe()
  analog for polymorphic lookups). Flattened contract: WHEN fields emit
  ``{type}_{field}`` columns, ELSE fields ``else_{field}`` (a coalesce
  over the types no WHEN names). REST-path only — the Bulk API rejects
  TYPEOF (assert_bulk_compatible fails fast, mirroring the server-side
  error the reference's forwarded string would hit,
  salesforce_to_s3_operator.py:47-50).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


class SoqlError(ValueError):
    """Raised on any parse or lowering failure, with position context."""


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
      (?P<string>'(?:[^'\\]|\\.)*')
    | (?P<isodate>\d{4}-\d{2}-\d{2}(?:T[\d:.]+(?:Z|[+-]\d{2}:?\d{2})?)?)
    | (?P<number>-?\d+(?:\.\d+)?)
    | (?P<datelit>(?:LAST_N_DAYS|NEXT_N_DAYS|LAST_N_WEEKS|NEXT_N_WEEKS
                     |LAST_N_MONTHS|NEXT_N_MONTHS|LAST_N_QUARTERS|NEXT_N_QUARTERS
                     |LAST_N_YEARS|NEXT_N_YEARS|N_DAYS_AGO):\d+)
    | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    | (?P<op><=|>=|!=|=|<|>)
    | (?P<punct>[(),*])
    )
    """,
    re.X,
)


@dataclass
class Tok:
    kind: str
    text: str
    pos: int


def tokenize(s: str) -> list[Tok]:
    out, i = [], 0
    while i < len(s):
        if s[i].isspace():
            i += 1
            continue
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise SoqlError(f"SOQL: unexpected character {s[i]!r} at {i}")
        out.append(Tok(m.lastgroup, m.group(m.lastgroup), i))
        i = m.end()
    return out


# ---------------------------------------------------------------------------
# Parser (recursive descent over the token list)
# ---------------------------------------------------------------------------

_AGGS = {"COUNT", "COUNT_DISTINCT", "SUM", "AVG", "MIN", "MAX"}
_DATE_FNS: dict[str, Callable[[Column], Column]] = {
    "CALENDAR_YEAR": F.year,
    "CALENDAR_MONTH": F.month,
    "CALENDAR_QUARTER": F.quarter,
    "DAY_ONLY": F.to_date,
    "HOUR_IN_DAY": F.hour,
    # D19 extensions. DAY_IN_WEEK: 1=Sunday in both SOQL and Spark's
    # dayofweek — a direct match. WEEK_IN_YEAR / WEEK_IN_MONTH use SOQL's
    # simple 7-day blocks from Jan 1 / the 1st (NOT ISO weeks — Spark's
    # weekofyear is ISO and diverges at year boundaries).
    "DAY_IN_WEEK": F.dayofweek,
    "DAY_IN_MONTH": F.dayofmonth,
    "DAY_IN_YEAR": F.dayofyear,
    "WEEK_IN_YEAR": lambda c: ((F.dayofyear(c) - 1) / 7 + 1).cast("int"),
    "WEEK_IN_MONTH": lambda c: ((F.dayofmonth(c) - 1) / 7 + 1).cast("int"),
}
#: Fiscal D19 functions — need the org's fiscal-year start month, so they are
#: built per-query (see ``_fiscal_col``); keys listed here for parse-time
#: recognition alongside _DATE_FNS.
_FISCAL_FNS = {"FISCAL_YEAR", "FISCAL_QUARTER", "FISCAL_MONTH"}
#: D18 keyword range literals (value-less; the N-parameterized family is
#: tokenized as ``datelit``). Each denotes a [start, end) date range.
_RANGE_KEYWORDS = {
    "TODAY", "YESTERDAY", "TOMORROW",
    "THIS_WEEK", "LAST_WEEK", "NEXT_WEEK",
    "THIS_MONTH", "LAST_MONTH", "NEXT_MONTH",
    "THIS_QUARTER", "LAST_QUARTER", "NEXT_QUARTER",
    "THIS_YEAR", "LAST_YEAR", "NEXT_YEAR",
    "LAST_90_DAYS", "NEXT_90_DAYS",
}
_KEYWORDS = {
    "SELECT", "FROM", "WHERE", "GROUP", "BY", "HAVING", "ORDER", "LIMIT",
    "OFFSET", "AND", "OR", "NOT", "IN", "LIKE", "ASC", "DESC", "NULLS",
    "FIRST", "LAST", "TRUE", "FALSE", "NULL", "ROLLUP", "CUBE",
    "TYPEOF", "WHEN", "THEN", "ELSE", "END",
} | _RANGE_KEYWORDS


class _Parser:
    def __init__(self, toks: list[Tok], source: str):
        self.toks, self.i, self.src = toks, 0, source

    # -- token plumbing ----------------------------------------------------
    def peek(self, k: int = 0) -> Tok | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> Tok:
        t = self.peek()
        if t is None:
            raise SoqlError("SOQL: unexpected end of query")
        self.i += 1
        return t

    def kw(self, *words: str) -> bool:
        """Consume the keyword sequence if present."""
        for k, w in enumerate(words):
            t = self.peek(k)
            if t is None or t.kind != "word" or t.text.upper() != w:
                return False
        self.i += len(words)
        return True

    def expect(self, text: str) -> None:
        t = self.next()
        if t.text.upper() != text.upper():
            raise SoqlError(f"SOQL: expected {text!r}, got {t.text!r} at {t.pos}")

    # -- grammar -----------------------------------------------------------
    def parse_query(self) -> dict:
        self.expect("SELECT")
        items = [self.parse_select_item()]
        while self.peek() and self.peek().text == ",":
            self.next()
            items.append(self.parse_select_item())
        self.expect("FROM")
        obj = self.next()
        if obj.kind != "word":
            raise SoqlError(f"SOQL: expected object name at {obj.pos}")
        q = {"select": items, "from": obj.text, "where": None, "group": None,
             "grouping": "plain", "having": None, "order": [], "limit": None,
             "offset": None, "security_enforced": False, "for_clause": None}
        if self.kw("WHERE"):
            q["where"] = self.parse_or()
        if self.kw("WITH"):
            if not self.kw("SECURITY_ENFORCED"):
                t = self.peek()
                raise SoqlError(
                    f"SOQL: only WITH SECURITY_ENFORCED is supported at "
                    f"{t.pos if t else 'end'}"
                )
            q["security_enforced"] = True
        if self.kw("GROUP", "BY"):
            if self.kw("ROLLUP"):
                q["grouping"] = "rollup"
                self.expect("(")
                q["group"] = self.parse_expr_list(until=")")
                self.expect(")")
            elif self.kw("CUBE"):
                q["grouping"] = "cube"
                self.expect("(")
                q["group"] = self.parse_expr_list(until=")")
                self.expect(")")
            else:
                q["group"] = self.parse_expr_list()
        if self.kw("HAVING"):
            q["having"] = self.parse_or()
        if self.kw("ORDER", "BY"):
            q["order"] = self.parse_order_list()
        if self.kw("LIMIT"):
            q["limit"] = int(self.next().text)
        if self.kw("OFFSET"):
            q["offset"] = int(self.next().text)
        if self.kw("FOR"):
            t = self.next() if self.peek() else None
            mode = t.text.upper() if t is not None and t.kind == "word" else None
            if mode not in ("VIEW", "REFERENCE", "UPDATE"):
                raise SoqlError(
                    f"SOQL: expected VIEW, REFERENCE or UPDATE after FOR at "
                    f"{t.pos if t else 'end'}"
                )
            q["for_clause"] = mode
        if self.peek() is not None:
            t = self.peek()
            raise SoqlError(f"SOQL: trailing input {t.text!r} at {t.pos}")
        return q

    def parse_expr_list(self, until: str | None = None) -> list[dict]:
        items = [self.parse_value_expr()]
        while self.peek() and self.peek().text == ",":
            self.next()
            items.append(self.parse_value_expr())
        return items

    def parse_order_list(self) -> list[dict]:
        out = []
        while True:
            e = self.parse_value_expr()
            desc = False
            nulls = None
            if self.kw("ASC"):
                pass
            elif self.kw("DESC"):
                desc = True
            if self.kw("NULLS", "FIRST"):
                nulls = "first"
            elif self.kw("NULLS", "LAST"):
                nulls = "last"
            out.append({"expr": e, "desc": desc, "nulls": nulls})
            if self.peek() and self.peek().text == ",":
                self.next()
                continue
            return out

    def parse_select_item(self) -> dict:
        t = self.peek()
        if t is not None and t.kind == "word" and t.text.upper() == "TYPEOF":
            # SOQL polymorphic branching:
            #   TYPEOF rel WHEN Type THEN f1, f2 [WHEN …] [ELSE f…] END
            # Lowered against the registry's polymorphic relationship
            # metadata (RelationshipRegistry.poly — the describe()-analog
            # a deployment declares once per schema).
            self.next()
            rel = self.next()
            if rel.kind != "word" or rel.text.upper() in _KEYWORDS:
                raise SoqlError(
                    f"SOQL: expected polymorphic field after TYPEOF at {rel.pos}"
                )
            if "." in rel.text:
                raise SoqlError(
                    f"SOQL: TYPEOF field must be a direct relationship "
                    f"({rel.text!r} at {rel.pos})"
                )
            branches: list[tuple[str, list[str]]] = []
            while self.kw("WHEN"):
                ty = self.next()
                if ty.kind != "word" or ty.text.upper() in _KEYWORDS:
                    raise SoqlError(
                        f"SOQL: expected object type after WHEN at {ty.pos}"
                    )
                if not self.kw("THEN"):
                    nt = self.peek()
                    raise SoqlError(
                        f"SOQL: expected THEN in TYPEOF branch at "
                        f"{nt.pos if nt else 'end'}"
                    )
                branches.append((ty.text, self._typeof_field_list()))
            else_fields: list[str] = []
            if self.kw("ELSE"):
                else_fields = self._typeof_field_list()
            if not self.kw("END"):
                nt = self.peek()
                raise SoqlError(
                    f"SOQL: expected END closing TYPEOF at "
                    f"{nt.pos if nt else 'end'}"
                )
            if not branches:
                raise SoqlError("SOQL: TYPEOF needs at least one WHEN branch")
            return {
                "kind": "typeof",
                "rel": rel.text,
                "branches": branches,
                "else": else_fields,
                "alias": rel.text.lower(),
            }
        if t is not None and t.text == "(":
            # D9: parent-to-child nested subselect — (SELECT … FROM RelName)
            self.next()
            if not (self.peek() and self.peek().kind == "word"
                    and self.peek().text.upper() == "SELECT"):
                raise SoqlError(
                    f"SOQL: expected nested SELECT at {t.pos}"
                )
            depth, j = 0, self.i
            while j < len(self.toks):
                if self.toks[j].text == "(":
                    depth += 1
                elif self.toks[j].text == ")":
                    if depth == 0:
                        break
                    depth -= 1
                j += 1
            sub = _Parser(self.toks[self.i:j], self.src).parse_query()
            self.i = j
            self.expect(")")
            return {"kind": "child_sub", "q": sub,
                    "alias": self.maybe_alias(sub["from"].lower())}
        if t.kind == "word" and t.text.upper() == "COUNT" and \
                self.peek(1) and self.peek(1).text == "(" and \
                self.peek(2) and self.peek(2).text == ")":
            self.i += 3
            return {"kind": "agg", "fn": "COUNT", "arg": None,
                    "alias": self.maybe_alias("expr0")}
        if t.kind == "word" and t.text.upper() == "FIELDS" and \
                self.peek(1) and self.peek(1).text == "(":
            # SOQL FIELDS(ALL|STANDARD|CUSTOM) — dynamic column-set
            # expansion (resolved against the object's schema at lowering,
            # the describe()-analog of Salesforce's field registry)
            scope_t = self.peek(2)
            if (
                scope_t is None
                or scope_t.kind != "word"
                or scope_t.text.upper() not in ("ALL", "STANDARD", "CUSTOM")
            ):
                raise SoqlError(
                    f"SOQL: FIELDS() takes ALL, STANDARD or CUSTOM at "
                    f"{t.pos}"
                )
            if not (self.peek(3) and self.peek(3).text == ")"):
                raise SoqlError(
                    f"SOQL: expected ')' closing FIELDS at {t.pos}"
                )
            self.i += 4
            return {"kind": "fields", "scope": scope_t.text.upper()}
        e = self.parse_value_expr()
        return {**e, "alias": self.maybe_alias(default_alias(e))}

    def _typeof_field_list(self) -> list[str]:
        """Comma-separated plain field names inside a TYPEOF branch
        (terminated by WHEN / ELSE / END, which are keywords)."""
        fields: list[str] = []
        while True:
            t = self.next()
            if t.kind != "word" or t.text.upper() in _KEYWORDS:
                raise SoqlError(
                    f"SOQL: expected field name in TYPEOF branch at {t.pos}"
                )
            if "." in t.text:
                raise SoqlError(
                    f"SOQL: dotted paths are not supported inside TYPEOF "
                    f"branches ({t.text!r} at {t.pos})"
                )
            fields.append(t.text)
            if self.peek() and self.peek().text == ",":
                self.next()
                continue
            return fields

    def maybe_alias(self, default: str) -> str:
        t = self.peek()
        if (
            t is not None
            and t.kind == "word"
            and t.text.upper() not in _KEYWORDS
            and not (t.text.upper() in _AGGS or t.text.upper() in _DATE_FNS
                     or t.text.upper() in _FISCAL_FNS)
        ):
            self.next()
            return t.text
        return default

    def parse_value_expr(self) -> dict:
        t = self.next()
        if t.kind != "word":
            raise SoqlError(f"SOQL: expected field or function at {t.pos}")
        up = t.text.upper()
        if up in _AGGS and self.peek() and self.peek().text == "(":
            self.next()
            if self.peek() and self.peek().text == ")":  # COUNT()
                self.next()
                return {"kind": "agg", "fn": "COUNT", "arg": None}
            inner = self.parse_value_expr()
            self.expect(")")
            return {"kind": "agg", "fn": up, "arg": inner}
        if (up in _DATE_FNS or up in _FISCAL_FNS) and self.peek() and \
                self.peek().text == "(":
            self.next()
            inner = self.parse_value_expr()
            self.expect(")")
            return {"kind": "datefn", "fn": up, "arg": inner}
        return {"kind": "field", "name": t.text}

    # WHERE grammar: or := and (OR and)* ; and := unary (AND unary)* ;
    # unary := NOT unary | ( or ) | comparison
    def parse_or(self) -> dict:
        left = self.parse_and()
        while self.kw("OR"):
            left = {"kind": "or", "l": left, "r": self.parse_and()}
        return left

    def parse_and(self) -> dict:
        left = self.parse_unary()
        while self.kw("AND"):
            left = {"kind": "and", "l": left, "r": self.parse_unary()}
        return left

    def parse_unary(self) -> dict:
        if self.kw("NOT"):
            return {"kind": "not", "e": self.parse_unary()}
        if self.peek() and self.peek().text == "(":
            # lookahead: grouped boolean, not an IN-list
            self.next()
            e = self.parse_or()
            self.expect(")")
            return e
        return self.parse_comparison()

    def parse_comparison(self) -> dict:
        lhs = self.parse_value_expr()
        if self.kw("NOT", "IN"):
            return {"kind": "in", "neg": True, "l": lhs, "r": self.parse_in_rhs()}
        if self.kw("IN"):
            return {"kind": "in", "neg": False, "l": lhs, "r": self.parse_in_rhs()}
        if self.kw("LIKE"):
            pat = self.next()
            if pat.kind != "string":
                raise SoqlError(f"SOQL: LIKE needs a string literal at {pat.pos}")
            return {"kind": "like", "l": lhs, "pat": unquote(pat.text)}
        t = self.next()
        if t.kind != "op":
            raise SoqlError(f"SOQL: expected comparison operator at {t.pos}")
        return {"kind": "cmp", "op": t.text, "l": lhs, "r": self.parse_literal()}

    def parse_in_rhs(self) -> dict:
        self.expect("(")
        if self.peek() and self.peek().kind == "word" and \
                self.peek().text.upper() == "SELECT":
            sub = _Parser(self.toks[self.i:], self.src)
            # re-parse the subquery from the remaining tokens up to its ')'
            depth, j = 0, self.i
            while j < len(self.toks):
                if self.toks[j].text == "(":
                    depth += 1
                elif self.toks[j].text == ")":
                    if depth == 0:
                        break
                    depth -= 1
                j += 1
            sub = _Parser(self.toks[self.i:j], self.src).parse_query()
            self.i = j
            self.expect(")")
            return {"kind": "subquery", "q": sub}
        vals = [self.parse_literal()]
        while self.peek() and self.peek().text == ",":
            self.next()
            vals.append(self.parse_literal())
        self.expect(")")
        return {"kind": "list", "vals": vals}

    def parse_literal(self) -> dict:
        t = self.next()
        if t.kind == "string":
            return {"kind": "lit", "v": unquote(t.text)}
        if t.kind == "isodate":
            # D20: unquoted ISO date/datetime literal; the 'T' separator
            # becomes a space for Spark/DuckDB timestamp casts
            return {"kind": "lit", "v": t.text.replace("T", " ")}
        if t.kind == "number":
            v = float(t.text) if "." in t.text else int(t.text)
            return {"kind": "lit", "v": v}
        if t.kind == "datelit":
            fn, n = t.text.split(":")
            return {"kind": "datelit", "fn": fn, "n": int(n)}
        up = t.text.upper()
        if up == "TRUE":
            return {"kind": "lit", "v": True}
        if up == "FALSE":
            return {"kind": "lit", "v": False}
        if up == "NULL":
            return {"kind": "null"}
        if up in _RANGE_KEYWORDS:
            return {"kind": "datelit", "fn": up, "n": 0}
        # bare word: SOQL allows ISO date/datetime literals unquoted
        if re.fullmatch(r"\d{4}-\d{2}-\d{2}(T[\d:.+Zz-]+)?", t.text):
            return {"kind": "lit", "v": t.text}
        raise SoqlError(f"SOQL: bad literal {t.text!r} at {t.pos}")


def unquote(s: str) -> str:
    return s[1:-1].replace("\\'", "'").replace('\\"', '"')


def default_alias(e: dict) -> str:
    if e["kind"] == "field":
        # dotted traversal paths flatten to underscore-joined output names
        return e["name"].lower().replace(".", "_")
    if e["kind"] == "agg":
        arg = e["arg"]["name"].lower() if e.get("arg") else ""
        return f"{e['fn'].lower()}_{arg}".rstrip("_")
    if e["kind"] == "datefn":
        return f"{e['fn'].lower()}_{e['arg']['name'].lower()}"
    raise SoqlError(f"no alias for {e}")


# ---------------------------------------------------------------------------
# Lowering to DataFrame plans
# ---------------------------------------------------------------------------

def _fiscal_col(fn: str, c: Column, start_month: int) -> Column:
    """FISCAL_* (D19) under the org's fiscal-year start month.

    Convention (Salesforce default): fiscal month 1 is ``start_month``; the
    fiscal year is named by the calendar year in which it *ends* (with
    start_month=2, Jan-2020 is FY2020, Feb-2020 opens FY2021).
    ``start_month=1`` collapses to the calendar functions.
    """
    fm = (F.month(c) - start_month + 12) % 12 + 1
    if fn == "FISCAL_MONTH":
        return fm
    if fn == "FISCAL_QUARTER":
        return ((fm - 1) / 3 + 1).cast("int")
    if start_month == 1:
        return F.year(c)
    return F.year(c) + F.when(F.month(c) >= start_month, 1).otherwise(0)


def _value_col(e: dict, fsm: int = 1) -> Column:
    if e["kind"] == "field":
        return F.col(e["name"].lower())
    if e["kind"] == "datefn":
        if e["fn"] in _FISCAL_FNS:
            return _fiscal_col(e["fn"], _value_col(e["arg"], fsm), fsm)
        return _DATE_FNS[e["fn"]](_value_col(e["arg"], fsm))
    if e["kind"] == "agg":
        raise SoqlError("aggregate not allowed here")
    raise SoqlError(f"bad value expr {e}")


def _agg_col(e: dict, fsm: int = 1) -> Column:
    fn, arg = e["fn"], e.get("arg")
    if fn == "COUNT":
        return F.count(_value_col(arg, fsm)) if arg else F.count(F.lit(1))
    if fn == "COUNT_DISTINCT":
        return F.countDistinct(_value_col(arg, fsm))
    return {"SUM": F.sum, "AVG": F.avg, "MIN": F.min, "MAX": F.max}[fn](
        _value_col(arg, fsm)
    )


def _agg_sig(e: dict) -> tuple:
    """Structural signature of an aggregate expression — used to match
    HAVING / ORDER BY aggregate references to SELECTed aggregates in
    the two-phase grouping-set lowering."""
    import json as _json

    return (e["fn"], _json.dumps(e.get("arg"), sort_keys=True))


def _agg_refs(e) -> list:
    """All aggregate expressions referenced inside a boolean tree
    (HAVING); SOQL grammar puts aggregates only on comparison LHS."""
    if not e:
        return []
    k = e.get("kind")
    if k in ("and", "or"):
        return _agg_refs(e["l"]) + _agg_refs(e["r"])
    if k == "not":
        return _agg_refs(e["e"])
    if k in ("cmp", "like", "in"):
        lhs = e.get("l")
        return [lhs] if lhs and lhs.get("kind") == "agg" else []
    return []


def _literal_col(e: dict) -> Column:
    if e["kind"] == "lit":
        return F.lit(e["v"])
    raise SoqlError(f"bad literal {e}")


def _datelit_range(e: dict, today: Column) -> tuple[Column, Column]:
    """D18: a SOQL date literal denotes a half-open **[start, end) date
    range** relative to ``today`` — ``=`` means "within", ``<`` "before the
    start", ``>`` "after the end" (lowered in ``_Lowerer._bool``). Weeks
    start Monday (Spark's ``date_trunc('week')``); SOQL's locale-dependent
    week start is out of scope.
    """
    fn, n = e["fn"], e.get("n", 0)
    week0 = F.date_trunc("week", today).cast("date")
    month0 = F.trunc(today, "month")
    quarter0 = F.trunc(today, "quarter")
    year0 = F.trunc(today, "year")
    ranges: dict[str, tuple[Column, Column]] = {
        "TODAY": (today, F.date_add(today, 1)),
        "YESTERDAY": (F.date_sub(today, 1), today),
        "TOMORROW": (F.date_add(today, 1), F.date_add(today, 2)),
        "THIS_WEEK": (week0, F.date_add(week0, 7)),
        "LAST_WEEK": (F.date_sub(week0, 7), week0),
        "NEXT_WEEK": (F.date_add(week0, 7), F.date_add(week0, 14)),
        "THIS_MONTH": (month0, F.add_months(month0, 1)),
        "LAST_MONTH": (F.add_months(month0, -1), month0),
        "NEXT_MONTH": (F.add_months(month0, 1), F.add_months(month0, 2)),
        "THIS_QUARTER": (quarter0, F.add_months(quarter0, 3)),
        "LAST_QUARTER": (F.add_months(quarter0, -3), quarter0),
        "NEXT_QUARTER": (F.add_months(quarter0, 3), F.add_months(quarter0, 6)),
        "THIS_YEAR": (year0, F.add_months(year0, 12)),
        "LAST_YEAR": (F.add_months(year0, -12), year0),
        "NEXT_YEAR": (F.add_months(year0, 12), F.add_months(year0, 24)),
        # the LAST_* day families include today (public SOQL semantics:
        # "continues up to the current second")
        "LAST_90_DAYS": (F.date_sub(today, 90), F.date_add(today, 1)),
        "NEXT_90_DAYS": (F.date_add(today, 1), F.date_add(today, 91)),
        "LAST_N_DAYS": (F.date_sub(today, n), F.date_add(today, 1)),
        "NEXT_N_DAYS": (F.date_add(today, 1), F.date_add(today, n + 1)),
        "N_DAYS_AGO": (F.date_sub(today, n), F.date_sub(today, n - 1)),
        "LAST_N_WEEKS": (F.date_sub(week0, 7 * n), week0),
        "NEXT_N_WEEKS": (F.date_add(week0, 7), F.date_add(week0, 7 * (n + 1))),
        "LAST_N_MONTHS": (F.add_months(month0, -n), month0),
        "NEXT_N_MONTHS": (F.add_months(month0, 1), F.add_months(month0, n + 1)),
        "LAST_N_QUARTERS": (F.add_months(quarter0, -3 * n), quarter0),
        "NEXT_N_QUARTERS": (F.add_months(quarter0, 3), F.add_months(quarter0, 3 * (n + 1))),
        "LAST_N_YEARS": (F.add_months(year0, -12 * n), year0),
        "NEXT_N_YEARS": (F.add_months(year0, 12), F.add_months(year0, 12 * (n + 1))),
    }
    if fn not in ranges:
        raise SoqlError(f"SOQL: unknown date literal {fn}")
    return ranges[fn]


def _datelit_range_py(e: dict, today) -> tuple:
    """Python mirror of :func:`_datelit_range` for a *static* ``today`` —
    used to derive scan-side pushdown bounds at plan-build time (the Column
    form stays the source of truth for the actual filter)."""
    import datetime as _dt

    def add_months(d: _dt.date, n: int) -> _dt.date:
        m = d.month - 1 + n
        return _dt.date(d.year + m // 12, m % 12 + 1, 1)

    fn, n = e["fn"], e.get("n", 0)
    day = _dt.timedelta(days=1)
    week0 = today - _dt.timedelta(days=today.weekday())
    month0 = today.replace(day=1)
    quarter0 = _dt.date(today.year, ((today.month - 1) // 3) * 3 + 1, 1)
    year0 = _dt.date(today.year, 1, 1)
    ranges = {
        "TODAY": (today, today + day),
        "YESTERDAY": (today - day, today),
        "TOMORROW": (today + day, today + 2 * day),
        "THIS_WEEK": (week0, week0 + 7 * day),
        "LAST_WEEK": (week0 - 7 * day, week0),
        "NEXT_WEEK": (week0 + 7 * day, week0 + 14 * day),
        "THIS_MONTH": (month0, add_months(month0, 1)),
        "LAST_MONTH": (add_months(month0, -1), month0),
        "NEXT_MONTH": (add_months(month0, 1), add_months(month0, 2)),
        "THIS_QUARTER": (quarter0, add_months(quarter0, 3)),
        "LAST_QUARTER": (add_months(quarter0, -3), quarter0),
        "NEXT_QUARTER": (add_months(quarter0, 3), add_months(quarter0, 6)),
        "THIS_YEAR": (year0, add_months(year0, 12)),
        "LAST_YEAR": (add_months(year0, -12), year0),
        "NEXT_YEAR": (add_months(year0, 12), add_months(year0, 24)),
        "LAST_90_DAYS": (today - 90 * day, today + day),
        "NEXT_90_DAYS": (today + day, today + 91 * day),
        "LAST_N_DAYS": (today - n * day, today + day),
        "NEXT_N_DAYS": (today + day, today + (n + 1) * day),
        "N_DAYS_AGO": (today - n * day, today - (n - 1) * day),
        "LAST_N_WEEKS": (week0 - 7 * n * day, week0),
        "NEXT_N_WEEKS": (week0 + 7 * day, week0 + 7 * (n + 1) * day),
        "LAST_N_MONTHS": (add_months(month0, -n), month0),
        "NEXT_N_MONTHS": (add_months(month0, 1), add_months(month0, n + 1)),
        "LAST_N_QUARTERS": (add_months(quarter0, -3 * n), quarter0),
        "NEXT_N_QUARTERS": (add_months(quarter0, 3), add_months(quarter0, 3 * (n + 1))),
        "LAST_N_YEARS": (add_months(year0, -12 * n), year0),
        "NEXT_N_YEARS": (add_months(year0, 12), add_months(year0, 12 * (n + 1))),
    }
    return ranges.get(fn, (None, None))


class RelationshipRegistry:
    """Join metadata for SOQL relationship traversal (D8/D9).

    ``lookups[(table, rel_name)] = (parent_table, fk, pk)`` resolves
    child-to-parent dot paths (``SELECT rel.col FROM table``);
    ``children[(table, rel_name)] = (child_table, fk, pk)`` resolves
    parent-to-child nested subselects (``SELECT (SELECT … FROM RelName)``);
    ``poly[(table, rel_name)] = (fk, type_col, {TypeName: (parent_table,
    pk[, disc_value])})`` resolves TYPEOF polymorphic branching: ``fk`` is
    the polymorphic id field, ``type_col`` the discriminator column on the
    base table (Salesforce's ``<rel>.Type``), and each registered object
    type maps to its parent table, join key, and the discriminator value
    denoting it (defaults to the type name).
    Plays the role of Salesforce's relationship metadata from describe() —
    the engine-side registry a deployment declares once per schema.
    """

    def __init__(
        self,
        lookups: dict | None = None,
        children: dict | None = None,
        poly: dict | None = None,
    ):
        self.lookups = {
            (t.lower(), r.lower()): v for (t, r), v in (lookups or {}).items()
        }
        self.children = {
            (t.lower(), r.lower()): v for (t, r), v in (children or {}).items()
        }
        self.poly = {}
        for (t, r), (fk, type_col, types) in (poly or {}).items():
            norm = {}
            for ty, spec in types.items():
                pt, pk, disc = spec if len(spec) == 3 else (*spec, ty)
                norm[ty.lower()] = (pt.lower(), pk, disc)
            self.poly[(t.lower(), r.lower())] = (fk, type_col, norm)


#: dataType.typeName() → comparison category for lowering-time typecheck.
_TYPE_CATEGORY = {
    "byte": "num", "short": "num", "integer": "num", "long": "num",
    "float": "num", "double": "num", "decimal": "num",
    "string": "str", "varchar": "str", "char": "str",
    "boolean": "bool",
    "date": "date", "timestamp": "date", "timestamp_ntz": "date",
}

_ISO_DATE_RE = re.compile(r"\d{4}-\d{2}-\d{2}([T ][\d:.+Zz-]+)?")


def _literal_category(e: dict) -> str | None:
    if e["kind"] == "datelit":
        return "date"
    if e["kind"] == "null":
        return None  # NULL compares with anything (as a null test)
    v = e["v"]
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, float)):
        return "num"
    if isinstance(v, str):
        # ISO date/datetime literals are parsed as strings (SOQL unquoted)
        return "date" if _ISO_DATE_RE.fullmatch(v) else "str"
    return None


class _Lowerer:
    def __init__(
        self,
        resolve: Callable[[str], DataFrame],
        registry: RelationshipRegistry | None = None,
        today=None,
        fiscal_start_month: int = 1,
        ci_strings: bool = False,
    ):
        import inspect

        self.resolve = resolve
        self.registry = registry or RelationshipRegistry()
        self.ci_strings = ci_strings
        self._schema_cats: dict[str, str] = {}
        # D18 anchor: a datetime.date pins relative date literals for
        # deterministic replay; None = the engine clock (current_date).
        self.today = F.lit(today) if today is not None else F.current_date()
        self.today_raw = today
        self.fsm = fiscal_start_month
        # Resolvers that accept ts_range= get scan-side event-time pushdown
        # (see _static_ts_range); detected by signature, never by trial call.
        try:
            params = inspect.signature(resolve).parameters.values()
            self._accepts_ts_range = any(
                p.name == "ts_range" or p.kind == inspect.Parameter.VAR_KEYWORD
                for p in params
            )
        except (TypeError, ValueError):
            self._accepts_ts_range = False

    # -- D8: dot-path lookup joins -----------------------------------------

    @staticmethod
    def _walk_fields(node, fn):
        """Apply fn to every field node, skipping nested query contexts
        (IN-subqueries and child subselects resolve on their own tables)."""
        if isinstance(node, dict):
            k = node.get("kind")
            if k in ("subquery", "child_sub"):
                return
            if k == "field":
                fn(node)
            for v in node.values():
                _Lowerer._walk_fields(v, fn)
        elif isinstance(node, (list, tuple)):
            for v in node:
                _Lowerer._walk_fields(v, fn)

    def _apply_lookups(self, df: DataFrame, q: dict) -> DataFrame:
        """Resolve every dotted field path with broadcast lookup joins
        (≤5 levels like SOQL) and rewrite the AST to the joined columns."""
        dotted: set[str] = set()
        scope = [q["select"], q["where"], q["group"], q["having"],
                 [o["expr"] for o in q["order"]]]
        self._walk_fields(scope, lambda n: "." in n["name"] and dotted.add(n["name"]))
        if not dotted:
            return df
        base_table = q["from"].lower()
        chain_table: dict[tuple, str] = {}
        mapping: dict[str, str] = {}
        for name in sorted(dotted):
            segs = name.lower().split(".")
            if len(segs) > 6:
                raise SoqlError(f"SOQL: relationship path too deep: {name!r}")
            path: tuple = ()
            cur_table = base_table
            for seg in segs[:-1]:
                parent_path = path
                path = path + (seg,)
                if path not in chain_table:
                    rel = self.registry.lookups.get((cur_table, seg))
                    if rel is None:
                        raise SoqlError(
                            f"SOQL: unknown relationship {seg!r} on {cur_table!r}"
                        )
                    parent_table, fk, pk = rel
                    prefix = "__" + "__".join(path) + "__"
                    pdf = self.resolve(parent_table)
                    pdf = pdf.select(
                        *[F.col(c).alias(prefix + c.lower()) for c in pdf.columns]
                    )
                    fk_col = (
                        "__" + "__".join(parent_path) + "__" + fk.lower()
                        if parent_path
                        else fk.lower()
                    )
                    df = df.join(
                        F.broadcast(pdf),
                        F.col(fk_col) == F.col(prefix + pk.lower()),
                        "left",
                    )
                    chain_table[path] = parent_table.lower()
                cur_table = chain_table[path]
            mapping[name.lower()] = "__" + "__".join(segs[:-1]) + "__" + segs[-1]

        def rewrite(n):
            n["name"] = mapping.get(n["name"].lower(), n["name"])

        self._walk_fields(scope, rewrite)
        return df

    # -- TYPEOF: polymorphic branch joins ----------------------------------

    def _apply_typeof(self, df: DataFrame, q: dict) -> DataFrame:
        """Lower each ``TYPEOF rel WHEN Type THEN fields … END`` select item
        to one broadcast left join per branch, guarded by the discriminator
        (``type_col = disc AND fk = pk``) so a row only ever matches the
        branch its runtime type selects — the relational reading of
        Salesforce's polymorphic field dispatch. Flattened output contract:
        each WHEN field becomes ``{type}_{field}``; each ELSE field becomes
        ``else_{field}``, a coalesce over the registered types NOT named in
        any WHEN (the fields must exist on all of them — Salesforce's
        common-``Name``-object restriction, engine-checked)."""
        for it in q["select"]:
            if it["kind"] != "typeof":
                continue
            base_table = q["from"].lower()
            rel = it["rel"].lower()
            spec = self.registry.poly.get((base_table, rel))
            if spec is None:
                raise SoqlError(
                    f"SOQL: unknown polymorphic relationship {it['rel']!r} "
                    f"on {base_table!r}"
                )
            fk, type_col, types = spec
            out: list[tuple] = []
            named: list[str] = []

            def join_branch(ty: str) -> str:
                parent_table, pk, disc = types[ty]
                prefix = f"__typeof__{rel}__{ty}__"
                pdf = self.resolve(parent_table)
                pdf = pdf.select(
                    *[F.col(c).alias(prefix + c.lower()) for c in pdf.columns]
                )
                nonlocal df
                df = df.join(
                    F.broadcast(pdf),
                    (F.col(type_col) == F.lit(disc))
                    & (F.col(fk.lower()) == F.col(prefix + pk.lower())),
                    "left",
                )
                return prefix

            def check_fields(ty: str, fields: list[str]) -> None:
                parent_table = types[ty][0]
                cols = {c.lower() for c in self.resolve(parent_table).columns}
                for f_ in fields:
                    if f_.lower() not in cols:
                        raise SoqlError(
                            f"SOQL: TYPEOF field {f_!r} does not exist on "
                            f"{parent_table!r}"
                        )

            for ty_name, fields in it["branches"]:
                ty = ty_name.lower()
                if ty not in types:
                    raise SoqlError(
                        f"SOQL: unknown TYPEOF type {ty_name!r} for "
                        f"{it['rel']!r} (registered: {sorted(types)})"
                    )
                check_fields(ty, fields)
                prefix = join_branch(ty)
                named.append(ty)
                for f_ in fields:
                    out.append(
                        (F.col(prefix + f_.lower()), f"{ty}_{f_.lower()}")
                    )
            if it["else"]:
                rest = [ty for ty in types if ty not in named]
                if not rest:
                    raise SoqlError(
                        "SOQL: TYPEOF ELSE has no remaining registered types "
                        f"for {it['rel']!r} — every type is named in a WHEN"
                    )
                for ty in rest:
                    check_fields(ty, it["else"])
                    join_branch(ty)
                for f_ in it["else"]:
                    refs = [
                        F.col(f"__typeof__{rel}__{ty}__{f_.lower()}")
                        for ty in rest
                    ]
                    out.append((F.coalesce(*refs), f"else_{f_.lower()}"))
            it["cols"] = out
        return df

    # -- D9: parent-to-child nested subselects -----------------------------

    def _apply_child_subs(self, df: DataFrame, q: dict) -> DataFrame:
        base_table = q["from"].lower()
        for it in q["select"]:
            if it["kind"] != "child_sub":
                continue
            sub = it["q"]
            rel = self.registry.children.get((base_table, sub["from"].lower()))
            if rel is None:
                raise SoqlError(
                    f"SOQL: unknown child relationship {sub['from']!r} "
                    f"on {base_table!r}"
                )
            child_table, fk, pk = rel
            if sub["group"] is not None or any(
                s["kind"] == "agg" for s in sub["select"]
            ):
                raise SoqlError(
                    "SOQL: aggregates are not allowed in child subselects"
                )
            inner = _Lowerer(self.resolve, self.registry)
            inner.today, inner.fsm = self.today, self.fsm
            inner.today_raw = self.today_raw
            cdf = self.resolve(child_table)
            inner._schema_cats = {
                f.name.lower(): _TYPE_CATEGORY.get(f.dataType.typeName(), "other")
                for f in cdf.schema.fields
            }
            if sub["where"] is not None:
                cdf = cdf.filter(inner._bool(sub["where"]))
            sel = [
                _value_col(s, self.fsm).alias(s["alias"]) for s in sub["select"]
            ]
            nested = cdf.groupBy(F.col(fk.lower()).alias("__child_fk")).agg(
                F.collect_list(F.struct(*sel)).alias(it["alias"])
            )
            df = df.join(
                nested, F.col(pk.lower()) == F.col("__child_fk"), "left"
            ).drop("__child_fk")
        return df

    def _field_category(self, e: dict) -> str | None:
        """Comparison category of a value expr, from the resolved schema."""
        if e["kind"] == "field":
            return self._schema_cats.get(e["name"].lower())
        if e["kind"] == "datefn":
            return "date" if e["fn"] == "DAY_ONLY" else "num"
        return None  # aggregates etc.: skip the check

    def _check_comparable(self, lhs: dict, rhs: dict, op: str) -> None:
        """D20 discipline: SOQL rejects type-mismatched comparisons
        (MALFORMED_QUERY) — surface them as SoqlError at plan-build time
        instead of leaking an engine cast failure at runtime."""
        lcat, rcat = self._field_category(lhs), _literal_category(rhs)
        if lcat is None or rcat is None:
            return
        # date fields accept only ISO-parseable values (rcat "date") — a
        # non-ISO quoted string vs a date field is Salesforce's
        # MALFORMED_QUERY, and letting it through becomes an ANSI cast
        # crash at runtime (found by fuzzing: ``WHERE ts = 'x'``)
        ok = lcat == rcat or (
            # ISO-looking *string literal* vs varchar is plain string equality;
            # a relative date expression (TODAY, LAST_N_DAYS) vs varchar is not
            lcat == "str" and rcat == "date" and rhs["kind"] == "lit"
        )
        if not ok:
            name = lhs.get("name", "?")
            raise SoqlError(
                f"SOQL: cannot compare {lcat} field {name!r} {op} {rcat} literal"
            )

    def _reset_cats(self, df: DataFrame) -> None:
        self._schema_cats = {
            f.name.lower(): _TYPE_CATEGORY.get(f.dataType.typeName(), "other")
            for f in df.schema.fields
        }

    # -- scan-side event-time pushdown -------------------------------------

    def _static_ts_range(self, q: dict):
        """Derive a conservative (superset) [lo, hi) bound per date column
        from the top-level AND conjuncts of WHERE, when the bounds are
        static at plan-build time (ISO literals always; relative date
        literals only under an injected ``today``). The real filter still
        applies — this range exists solely so the resolver can prune the
        scan (catalog.load_table(ts_range=…) filters raw nanos longs ahead
        of the timestamp repair, re-enabling row-group min/max skipping
        that the repair projection otherwise blocks — SCALE.md)."""
        import datetime as _dt

        if q["where"] is None:
            return None

        def parse_iso(v: str):
            try:
                if len(v) <= 10:
                    return _dt.datetime.strptime(v, "%Y-%m-%d")
                return _dt.datetime.fromisoformat(v.replace("Z", "+00:00")).replace(
                    tzinfo=None
                )
            except ValueError:
                return None

        def bounds(r: dict, op: str):
            """(lo, hi) datetimes — a superset of values passing `col op r`."""
            day = _dt.timedelta(days=1)
            if r["kind"] == "datelit":
                if self.today_raw is None:
                    return None
                s, e = _datelit_range_py(r, self.today_raw)
                if s is None:
                    return None
                s = _dt.datetime.combine(s, _dt.time())
                e = _dt.datetime.combine(e, _dt.time())
                return {
                    "=": (s, e), ">=": (s, None), ">": (e, None),
                    "<": (None, s), "<=": (None, e),
                }.get(op)
            if r["kind"] == "lit" and isinstance(r["v"], str):
                p = parse_iso(r["v"])
                if p is None:
                    return None
                return {
                    "=": (p, p + day), ">=": (p, None), ">": (p, None),
                    "<": (None, p), "<=": (None, p + day),
                }.get(op)
            return None

        cands: dict[str, list] = {}
        for c in self._split_and(q["where"]):
            if c.get("kind") != "cmp":
                continue
            l = c["l"]
            if l.get("kind") != "field" or "." in l["name"]:
                continue
            name = l["name"].lower()
            if self._schema_cats.get(name) != "date":
                continue
            b = bounds(c["r"], c["op"])
            if b is None:
                continue
            lo, hi = cands.get(name, [None, None])
            nlo, nhi = b
            cands[name] = [
                max(filter(None, [lo, nlo]), default=None),
                min(filter(None, [hi, nhi]), default=None),
            ]

        def score(item):
            _, (lo, hi) = item
            return (lo is not None) + (hi is not None)

        best = max(cands.items(), key=score, default=None)
        if best is None or score(best) == 0:
            return None
        col, (lo, hi) = best
        fmt = lambda d: d.strftime("%Y-%m-%d %H:%M:%S") if d else None  # noqa: E731
        return (col, fmt(lo), fmt(hi))

    def _two_phase_grouping(self, pre, key_names, q, aggs):
        """ROLLUP/CUBE over decomposable aggregates, lowered two-phase
        (round 9): Spark expands the INPUT ×(grouping sets) before a
        naive multi-set aggregate — on a fact table that is 3-4× the
        hash work and the measured sf1.0 cube straggler. Aggregating
        once at full key granularity first (the only fact-scale pass,
        fully map-side-combined) and re-grouping the tiny base is
        value-identical when every aggregate is decomposable:
        COUNT → Σ partial counts (coalesced to 0 for the empty-input
        global row), SUM over exact types → Σ partial sums (integer /
        decimal addition is associative; a DOUBLE sum would change
        low bits, so it falls back; the decimal final re-sum is cast
        back to the single-phase sum-widened-once result type so the
        output schema is lowering-path-independent), MIN/MAX →
        min/max of partials, AVG over integral types → Σ sums / Σ
        counts (round 10), all-COUNT_DISTINCT-over-one-column → Expand
        over the distinct (keys, value) pair base (round 10).
        Decimal/double AVG, mixed COUNT_DISTINCT, and COUNT_DISTINCT
        over differing columns are not decomposable here → fallback.
        Data-NULL keys stay correct: the base keeps a NULL-key group
        and re-grouping reproduces exactly the detail and subtotal
        rows the single-phase form emits.

        HAVING / ORDER BY aggregate references resolve against the
        FINAL aggregate, where re-deriving ``count(1)`` would count
        BASE rows — so two-phase only applies when every such
        reference structurally matches a SELECTed aggregate, and the
        match map (sig → output alias) is installed for ``_bool`` /
        the order lowering to resolve through. Returns None when not
        applicable (caller uses the single-phase form)."""
        from pyspark.sql import types as _T

        items = aggs or [{"fn": "COUNT", "arg": None, "alias": "count"}]

        # COUNT_DISTINCT-only form (round 10): when EVERY aggregate is
        # COUNT_DISTINCT over the SAME column, the base is the distinct
        # (keys, value) PAIR set — one fact-scale exchange with map-side
        # dedup — and Expand runs over the deduped pairs instead of the
        # fact (per-set re-dedup still happens, but over far fewer
        # rows). Exactly value-preserving: deduping at full key
        # granularity keeps every per-grouping-set distinct value set
        # intact, and countDistinct skips NULLs on both paths. Mixed
        # aggregates keep the single-phase form (a multiplicity-losing
        # pair base cannot also serve COUNT/SUM partials).
        if all(it["fn"] == "COUNT_DISTINCT" for it in items):
            args = {_agg_sig(it)[1:] for it in items}
            if len(args) != 1:
                return None  # different columns need different bases
            sig_map = {}
            vcol = _value_col(items[0].get("arg"), self.fsm)
            base = pre.select(
                *key_names, vcol.alias("__dv")
            ).distinct()
            finals = []
            for it in items:
                finals.append(F.countDistinct(F.col("__dv")).alias(it["alias"]))
                sig_map[_agg_sig(it)] = it["alias"]
            order_aggs = [
                o["expr"]
                for o in (q.get("order") or [])
                if o["expr"]["kind"] == "agg"
            ]
            for ref in _agg_refs(q.get("having")) + order_aggs:
                if _agg_sig(ref) not in sig_map:
                    return None
            regrouped = (
                base.rollup(*key_names)
                if q["grouping"] == "rollup"
                else base.cube(*key_names)
            )
            self._agg_alias_map = sig_map
            return regrouped.agg(*finals)

        partials, finals, sig_map = [], [], {}
        for i, it in enumerate(items):
            fn, arg, alias = it["fn"], it.get("arg"), it["alias"]
            p = f"__p{i}"
            if fn == "COUNT":
                partials.append(
                    (
                        F.count(_value_col(arg, self.fsm))
                        if arg
                        else F.count(F.lit(1))
                    ).alias(p)
                )
                finals.append(
                    F.coalesce(F.sum(F.col(p)), F.lit(0))
                    .cast("long")
                    .alias(alias)
                )
            elif fn in ("MIN", "MAX"):
                agg_f = F.min if fn == "MIN" else F.max
                partials.append(agg_f(_value_col(arg, self.fsm)).alias(p))
                finals.append(agg_f(F.col(p)).alias(alias))
            elif fn == "SUM":
                col = _value_col(arg, self.fsm)
                dt = pre.select(col).schema[0].dataType
                if not isinstance(
                    dt,
                    (
                        _T.ByteType,
                        _T.ShortType,
                        _T.IntegerType,
                        _T.LongType,
                        _T.DecimalType,
                    ),
                ):
                    return None
                partials.append(F.sum(col).alias(p))
                if isinstance(dt, _T.DecimalType):
                    # cast back to the SINGLE-phase result type (sum
                    # widens precision once, +10): without it the
                    # partial→final double widening leaks a
                    # decimal(p+20,s) schema that depends on which
                    # lowering path fired (ADVICE r9)
                    rt = _T.DecimalType(
                        min(38, dt.precision + 10), dt.scale
                    )
                    finals.append(F.sum(F.col(p)).cast(rt).alias(alias))
                else:
                    finals.append(F.sum(F.col(p)).alias(alias))
            elif fn == "AVG":
                # decomposable as (Σ partial sums) / (Σ partial counts)
                # for INTEGRAL inputs only: partial long sums are exact,
                # so the final double division reproduces single-phase
                # avg bit-for-bit in the < 2^53 regime. Beyond int64 the
                # two paths DIVERGE differently (ADVICE r10 low): the
                # partial BIGINT sum wraps silently under non-ANSI Spark,
                # while single-phase Average accumulates in double and
                # returns an approximately-correct value — a per-group
                # Σ|v| beyond ±2^63 is outside this lowering's domain
                # just as > 2^53 is outside its exactness claim. DECIMAL avg has
                # Catalyst-specific (p+4, s+4) divide-and-round
                # semantics and DOUBLE sums are order-dependent — both
                # fall back to single-phase (round 10, VERDICT item 5a).
                col = _value_col(arg, self.fsm)
                dt = pre.select(col).schema[0].dataType
                if not isinstance(
                    dt,
                    (
                        _T.ByteType,
                        _T.ShortType,
                        _T.IntegerType,
                        _T.LongType,
                    ),
                ):
                    return None
                pc = f"__pc{i}"
                partials.append(F.sum(col).alias(p))
                partials.append(F.count(col).alias(pc))
                finals.append(
                    (F.sum(F.col(p)) / F.sum(F.col(pc))).alias(alias)
                )
            else:  # COUNT_DISTINCT
                return None
            sig_map[_agg_sig(it)] = alias
        order_aggs = [
            o["expr"]
            for o in (q.get("order") or [])
            if o["expr"]["kind"] == "agg"
        ]
        for ref in _agg_refs(q.get("having")) + order_aggs:
            if _agg_sig(ref) not in sig_map:
                return None
        base = pre.groupBy(*key_names).agg(*partials)
        regrouped = (
            base.rollup(*key_names)
            if q["grouping"] == "rollup"
            else base.cube(*key_names)
        )
        self._agg_alias_map = sig_map
        return regrouped.agg(*finals)

    def _resolve_agg(self, e: dict) -> Column:
        """Aggregate expression in HAVING/ORDER BY: under the two-phase
        lowering it must resolve to the FINAL output column (re-deriving
        the aggregate would aggregate base rows); otherwise the plain
        lowering applies."""
        m = getattr(self, "_agg_alias_map", None)
        if m is not None:
            return F.col(m[_agg_sig(e)])
        return _agg_col(e, self.fsm)

    def lower(self, q: dict) -> DataFrame:
        self._agg_alias_map = None  # two-phase map is per-lowering state
        df = self.resolve(q["from"])
        q = self._expand_fields(q, df.columns)
        if self._accepts_ts_range:
            self._reset_cats(df)
            rng = self._static_ts_range(q)
            if rng is not None:
                df = self.resolve(q["from"], ts_range=rng)
        df = self._apply_lookups(df, q)
        df = self._apply_typeof(df, q)
        df = self._apply_child_subs(df, q)
        self._reset_cats(df)
        if q["where"] is not None:
            df = self._apply_where(df, q["where"])
            # subquery lowering overwrote the category map; restore for HAVING
            self._reset_cats(df)

        items = q["select"]
        aggs = [it for it in items if it["kind"] == "agg"]
        if any(it["kind"] == "typeof" for it in items) and (
            q["group"] is not None or aggs
        ):
            raise SoqlError(
                "SOQL: TYPEOF cannot mix with GROUP BY or aggregates"
            )
        if q["group"] is not None:
            if any(it["kind"] == "child_sub" for it in items):
                raise SoqlError(
                    "SOQL: child subselects cannot mix with GROUP BY"
                )
            keys = [_value_col(g, self.fsm).alias(default_alias(g)) for g in q["group"]]
            key_names = [default_alias(g) for g in q["group"]]
            pre = df.select("*", *[
                _value_col(g, self.fsm).alias(default_alias(g))
                for g in q["group"] if g["kind"] == "datefn"
            ])
            self._agg_alias_map = None
            df = None
            if q["grouping"] in ("rollup", "cube"):
                df = self._two_phase_grouping(pre, key_names, q, aggs)
            if df is None:
                grouped = {
                    "plain": pre.groupBy(*key_names),
                    "rollup": pre.rollup(*key_names),
                    "cube": pre.cube(*key_names),
                }[q["grouping"]]
                agg_cols = [
                    _agg_col(it, self.fsm).alias(it["alias"]) for it in aggs
                ]
                if not agg_cols:
                    agg_cols = [F.count(F.lit(1)).alias("count")]
                df = grouped.agg(*agg_cols)
            proj = []
            for it in items:
                if it["kind"] == "agg":
                    proj.append(F.col(it["alias"]))
                else:
                    proj.append(F.col(default_alias(it)).alias(it["alias"]))
            post_agg = df
            if q["having"] is not None:
                post_agg = post_agg.filter(self._bool(q["having"], agg_ok=True))
            df = post_agg.select(*proj)
            # ORDER BY below may still reference aggregates; the map (set
            # only under two-phase) stays active through it and dies with
            # this lowering call
        elif aggs:
            if any(it["kind"] == "child_sub" for it in items):
                raise SoqlError(
                    "SOQL: child subselects cannot mix with aggregates"
                )
            df = df.agg(*[_agg_col(it, self.fsm).alias(it["alias"]) for it in items])
        else:
            proj = []
            for it in items:
                if it["kind"] == "child_sub":
                    proj.append(F.col(it["alias"]))
                elif it["kind"] == "typeof":
                    proj.extend(c.alias(a) for c, a in it["cols"])
                else:
                    proj.append(_value_col(it, self.fsm).alias(it["alias"]))
            df = df.select(*proj)

        if q["order"]:
            cols = []
            for o in q["order"]:
                c = _value_col(o["expr"], self.fsm) if o["expr"]["kind"] != "agg" \
                    else self._resolve_agg(o["expr"])
                name = default_alias(o["expr"])
                if name in df.columns:
                    c = F.col(name)
                if o["desc"]:
                    c = c.desc_nulls_last() if o["nulls"] == "last" else \
                        c.desc_nulls_first() if o["nulls"] == "first" else c.desc()
                else:
                    c = c.asc_nulls_last() if o["nulls"] == "last" else \
                        c.asc_nulls_first()  # SOQL default: ASC NULLS FIRST
                cols.append(c)
            df = df.orderBy(*cols)
        if q["offset"]:
            df = df.offset(q["offset"])
        if q["limit"] is not None:
            df = df.limit(q["limit"])
        return df

    def _expand_fields(self, q: dict, base_cols: list[str]) -> dict:
        """Expand FIELDS(ALL|STANDARD|CUSTOM) select items against the
        source object's schema (Salesforce resolves them against the
        field registry; here the catalog schema is that registry —
        custom fields are the ``__c``-suffixed ones, Salesforce's
        public custom-field naming convention).
        SOQL's bounded-query rule applies: FIELDS(ALL)/FIELDS(CUSTOM)
        require an explicit LIMIT of at most 200; FIELDS(STANDARD) is
        unbounded. FIELDS cannot mix with GROUP BY/aggregates (same
        Salesforce restriction)."""
        if not any(it.get("kind") == "fields" for it in q["select"]):
            return q
        if q["group"] is not None or any(
            it.get("kind") == "agg" for it in q["select"]
        ):
            raise SoqlError("SOQL: FIELDS() cannot mix with aggregates")
        items: list[dict] = []
        seen: set[str] = set()
        for it in q["select"]:
            if it.get("kind") != "fields":
                if it["alias"] not in seen:
                    seen.add(it["alias"])
                    items.append(it)
                continue
            scope = it["scope"]
            if scope in ("ALL", "CUSTOM") and (
                q["limit"] is None or q["limit"] > 200
            ):
                raise SoqlError(
                    f"SOQL: FIELDS({scope}) requires LIMIT <= 200 "
                    "(bounded-query rule)"
                )
            cols = [
                c
                for c in base_cols
                if scope == "ALL"
                or (scope == "CUSTOM") == c.lower().endswith("__c")
            ]
            if not cols:
                raise SoqlError(
                    f"SOQL: FIELDS({scope}) matched no fields on "
                    f"{q['from']!r}"
                )
            for c in cols:
                if c.lower() not in seen:
                    seen.add(c.lower())
                    items.append(
                        {"kind": "field", "name": c, "alias": c.lower()}
                    )
        return {**q, "select": items}

    def _apply_where(self, df: DataFrame, e: dict) -> DataFrame:
        """Split top-level AND into plain predicates and subquery joins so
        semi/anti conditions lower to left_semi/left_anti joins."""
        conjuncts = self._split_and(e)
        plain = [c for c in conjuncts if not self._is_subquery(c)]
        subs = [c for c in conjuncts if self._is_subquery(c)]
        if plain:
            pred = plain[0]
            for p in plain[1:]:
                pred = {"kind": "and", "l": pred, "r": p}
            df = df.filter(self._bool(pred))
        for s in subs:
            key = _value_col(s["l"], self.fsm)
            sub_df = self.lower(s["r"]["q"])
            sub_key = sub_df.columns[0]
            how = "left_anti" if s["neg"] else "left_semi"
            df = df.join(sub_df, key == sub_df[sub_key], how)
        return df

    @staticmethod
    def _split_and(e: dict) -> list[dict]:
        if e["kind"] == "and":
            return _Lowerer._split_and(e["l"]) + _Lowerer._split_and(e["r"])
        return [e]

    @staticmethod
    def _is_subquery(e: dict) -> bool:
        return e["kind"] == "in" and e["r"]["kind"] == "subquery"

    def _bool(self, e: dict, agg_ok: bool = False) -> Column:
        k = e["kind"]
        if k == "and":
            return self._bool(e["l"], agg_ok) & self._bool(e["r"], agg_ok)
        if k == "or":
            return self._bool(e["l"], agg_ok) | self._bool(e["r"], agg_ok)
        if k == "not":
            return ~self._bool(e["e"], agg_ok)
        if k == "like":
            # D3: SOQL LIKE is case-insensitive; only string fields
            lcat = self._field_category(e["l"])
            if lcat not in (None, "str"):
                raise SoqlError(
                    f"SOQL: LIKE requires a string field, got {lcat}"
                )
            return F.lower(_value_col(e["l"], self.fsm)).like(e["pat"].lower())
        if k == "in":
            if e["r"]["kind"] == "subquery":
                raise SoqlError(
                    "SOQL: [NOT] IN (SELECT ...) only supported as a "
                    "top-level AND conjunct of WHERE"
                )
            for v in e["r"]["vals"]:
                if v["kind"] == "datelit":
                    raise SoqlError(
                        "SOQL: date literals are ranges and cannot appear "
                        "in IN lists; use range comparisons instead"
                    )
                self._check_comparable(e["l"], v, "IN")
            vals = [v["v"] for v in e["r"]["vals"]]
            lhs_in = _value_col(e["l"], self.fsm)
            if self.ci_strings and all(
                _literal_category(v) == "str" for v in e["r"]["vals"]
            ):
                lhs_in = F.lower(lhs_in)
                vals = [v.lower() for v in vals]
            c = lhs_in.isin(vals)
            return ~c if e["neg"] else c
        if k == "cmp":
            if not (agg_ok and e["l"]["kind"] == "agg"):
                self._check_comparable(e["l"], e["r"], e["op"])
            lhs = (
                self._resolve_agg(e["l"]) if agg_ok and e["l"]["kind"] == "agg"
                else _value_col(e["l"], self.fsm)
            )
            if e["r"]["kind"] == "datelit":
                # D18: range semantics — '=' is containment, '<' precedes
                # the range start, '>' follows the range end
                start, end = _datelit_range(e["r"], self.today)
                return {
                    "=": (lhs >= start) & (lhs < end),
                    "!=": (lhs < start) | (lhs >= end),
                    "<": lhs < start,
                    "<=": lhs < end,
                    ">": lhs >= end,
                    ">=": lhs >= start,
                }[e["op"]]
            if e["r"]["kind"] == "null":
                # D20: SOQL '= NULL' is a null test, not ANSI unknown
                if e["op"] == "=":
                    return lhs.isNull()
                if e["op"] == "!=":
                    return lhs.isNotNull()
                raise SoqlError(f"SOQL: operator {e['op']} with NULL")
            rhs = _literal_col(e["r"])
            if self.ci_strings and _literal_category(e["r"]) == "str":
                # Salesforce text collation: string comparisons are
                # case-insensitive (like D3's LIKE). Folding BOTH sides
                # through lower() keeps ordering comparisons consistent
                # with equality under the same collation.
                lhs = F.lower(lhs)
                rhs = F.lower(rhs)
            return {
                "=": lhs == rhs, "!=": lhs != rhs, "<": lhs < rhs,
                "<=": lhs <= rhs, ">": lhs > rhs, ">=": lhs >= rhs,
            }[e["op"]]
        raise SoqlError(f"SOQL: bad boolean expr {e}")


def assert_bulk_compatible(soql: str) -> None:
    """Raise :class:`SoqlError` if ``soql`` uses constructs the Salesforce
    Bulk API rejects: aggregate functions, GROUP BY (and therefore HAVING),
    or OFFSET (SURVEY §2D pre-amble; the reference's Bulk path forwards the
    string unchecked and would fail server-side,
    salesforce_to_s3_operator.py:50 — we fail fast at plan-build instead).
    The REST path (ObjectExtract / soql_to_df) supports them all."""
    q = _Parser(tokenize(soql), soql).parse_query()
    if q["group"] is not None or q["having"] is not None:
        raise SoqlError("SOQL: Bulk API does not support GROUP BY / HAVING")
    if q["offset"] is not None:
        raise SoqlError("SOQL: Bulk API does not support OFFSET")
    if any(item.get("kind") == "agg" for item in q["select"]):
        raise SoqlError("SOQL: Bulk API does not support aggregate functions")
    if any(item.get("kind") == "typeof" for item in q["select"]):
        raise SoqlError("SOQL: Bulk API does not support TYPEOF")


def soql_to_df(
    spark: SparkSession,
    soql: str,
    resolve: Callable[[str], DataFrame] | None = None,
    relationships: RelationshipRegistry | None = None,
    today=None,
    fiscal_start_month: int = 1,
    ci_strings: bool = False,
) -> DataFrame:
    """Parse a SOQL string and return the equivalent DataFrame plan.

    ``resolve`` maps an object name to its DataFrame; the default resolves
    case-insensitively against the session catalog's temp views (use
    ``sources.catalog.register_views`` first), replacing the reference's
    CamelCase-mangling normalizer (C6) with case-insensitive lookup.

    ``relationships`` enables D8 dot-path lookups and D9 nested child
    subselects (see :class:`RelationshipRegistry`); the fixture schema's
    registry ships as ``sources.catalog.FIXTURE_RELATIONSHIPS``.

    ``ci_strings=True`` applies Salesforce's case-insensitive text
    collation to string comparisons and IN lists (LIKE is always
    case-insensitive, D3). Default False: the conformance contract
    compares strings bytewise like the DuckDB oracle; enable it when
    replaying queries whose source of truth was Salesforce itself.
    """
    if resolve is None:
        def resolve(name: str) -> DataFrame:  # noqa: F811
            return spark.table(name.lower())

    q = _Parser(tokenize(soql), soql).parse_query()
    return _Lowerer(
        resolve, relationships, today, fiscal_start_month, ci_strings
    ).lower(q)
