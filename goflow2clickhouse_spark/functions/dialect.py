"""ClickHouse-dialect shim (SURVEY.md §2.B last row): translate the
ClickHouse SQL functions an operator of the reference deployment would
use over `flows` into Spark SQL equivalents, so existing ClickHouse
query inventories port verbatim.

Two surfaces:
- `translate(sql)` — textual rewrite of the common ClickHouse function
  spellings into Spark SQL (pure-function mapping, inline expansion
  for the IPv4 helpers so everything stays JVM-side);
- `CLICKHOUSE_COLUMN_FNS` — the same mapping as DataFrame column
  helpers for programmatic use.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from .ip import ipv4_num_to_string, ipv4_string_to_num

_INTERVAL_RE = re.compile(r"INTERVAL\s+(\d+)\s+(SECOND|MINUTE|HOUR|DAY)S?", re.I)
_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _to_start_of_interval(args: list[str]) -> str:
    """toStartOfInterval(t, INTERVAL n unit) → epoch-floor arithmetic
    (date_trunc has no n-unit granularity)."""
    m = _INTERVAL_RE.fullmatch(args[1].strip())
    if not m:
        raise ValueError(f"unsupported toStartOfInterval interval: {args[1]!r}")
    secs = int(m.group(1)) * _UNIT_SECONDS[m.group(2).lower()]
    return f"timestamp_seconds((unix_timestamp({args[0]}) div {secs}) * {secs})"


# name → spark SQL template with {0},{1} args, or callable(args) → SQL.
# Order matters: longer names first so e.g. uniqExact isn't eaten by uniq.
_TEXT_RULES: list[tuple[str, str | Callable[[list[str]], str]]] = [
    ("uniqExact", "count(DISTINCT {0})"),
    ("uniqCombined", "approx_count_distinct({0})"),
    ("uniqHLL12", "approx_count_distinct({0})"),
    ("uniq", "approx_count_distinct({0})"),
    ("toStartOfFiveMinutes", "timestamp_seconds((unix_timestamp({0}) div 300) * 300)"),
    ("toStartOfInterval", _to_start_of_interval),
    ("toStartOfMinute", "date_trunc('minute', {0})"),
    ("toStartOfHour", "date_trunc('hour', {0})"),
    ("toStartOfDay", "date_trunc('day', {0})"),
    ("toYYYYMM", "cast(date_format({0}, 'yyyyMM') as int)"),
    ("toDateTime", "to_timestamp({0})"),
    ("toDate", "to_date({0})"),
    ("toHour", "hour({0})"),
    ("toMinute", "minute({0})"),
    # countIf(cond) counts matches; countIf(x, cond) (the -If
    # combinator over count(x)) counts non-null x where cond.
    # count_if / count return 0 on an empty relation like ClickHouse;
    # the earlier sum(CASE...) form returned NULL there (r8 review) —
    # sumIf keeps the explicit coalesce for the same reason
    ("countIf",
     lambda a: f"count_if({a[0]})" if len(a) == 1
     else f"count(CASE WHEN {a[1]} THEN {a[0]} END)"),
    ("sumIf", "coalesce(sum(CASE WHEN {1} THEN {0} END), 0)"),
    ("avgIf", "avg(CASE WHEN {1} THEN {0} END)"),
    ("minIf", "min(CASE WHEN {1} THEN {0} END)"),
    ("maxIf", "max(CASE WHEN {1} THEN {0} END)"),
    ("ifNull", "coalesce({0}, {1})"),
    # ClickHouse any/anyLast SKIP NULLs; Spark first/last default to
    # ignoreNulls=false (r8 review)
    ("anyLast", "last({0}, true)"),
    ("any", "first({0}, true)"),
    ("argMax", "max_by({0}, {1})"),
    ("argMin", "min_by({0}, {1})"),
    ("medianExact", "percentile({0}, 0.5)"),
    ("median", "percentile_approx({0}, 0.5)"),
    ("toStartOfQuarter", "date_trunc('quarter', {0})"),
    ("toStartOfMonth", "date_trunc('month', {0})"),
    ("toStartOfYear", "date_trunc('year', {0})"),
    ("toUnixTimestamp", "unix_timestamp({0})"),
    ("fromUnixTimestamp", "timestamp_seconds({0})"),
    ("toSecond", "second({0})"),
    # ClickHouse toDayOfWeek is ISO (Mon=1..Sun=7); Spark dayofweek is
    # Sun=1..Sat=7 — shift accordingly
    ("toDayOfWeek", "(((dayofweek({0}) + 5) % 7) + 1)"),
    ("toDayOfMonth", "dayofmonth({0})"),
    ("toMonth", "month({0})"),
    ("toYear", "year({0})"),
    # dateDiff('unit', start, end): unit arrives quoted — strip for
    # Spark's timestampdiff keyword. ClickHouse dateDiff counts unit-
    # BOUNDARY CROSSINGS, Spark timestampdiff counts complete elapsed
    # units (23:00→01:00 next day is 1 CH day, 0 Spark days) —
    # truncating both operands to the unit first makes timestampdiff
    # count exactly the crossings (r8 review)
    ("dateDiff",
     lambda a: (
         lambda u: f"timestampdiff({u}, date_trunc('{u}', {a[1]}), "
                   f"date_trunc('{u}', {a[2]}))"
     )(a[0].strip().strip(chr(39)))),
    ("position", "instr({0}, {1})"),
    ("empty", "(length({0}) = 0)"),
    ("notEmpty", "(length({0}) > 0)"),
    ("toUInt32", "cast({0} as bigint)"),
    ("toUInt64", "cast({0} as bigint)"),
    ("toInt32", "cast({0} as int)"),
    ("toString", "cast({0} as string)"),
    ("intDiv", "({0} div {1})"),
    ("bitAnd", "({0} & {1})"),
    ("bitOr", "({0} | {1})"),
    ("bitXor", "({0} ^ {1})"),
    ("modulo", "({0} % {1})"),
    # ClickHouse halfMD5 = big-endian UInt64 of the first 8 MD5 bytes.
    # Built from two 32-bit hex halves so conv() never exceeds bigint
    # range; shiftleft wraps to Spark's signed long, which carries the
    # same 64 bits as ClickHouse's UInt64 (value-compatible mod 2^64).
    ("halfMD5",
     "(shiftleft(cast(conv(substring(md5({0}),1,8),16,10) as bigint),32)"
     " | cast(conv(substring(md5({0}),9,8),16,10) as bigint))"),
    (
        "IPv4NumToString",
        "concat_ws('.', cast(shiftright({0},24)&255 as string),"
        " cast(shiftright({0},16)&255 as string),"
        " cast(shiftright({0},8)&255 as string), cast({0}&255 as string))",
    ),
    # strict octet validation matching functions/ip.ipv4_string_to_num
    # (OrZero convention on malformed input; NULL passes through as
    # NULL, mirroring ClickHouse NULL propagation — r7 advice, via the
    # same `valid OR IS NULL` disjunct as the column form: a NULL input
    # satisfies the condition and the THEN arithmetic over split(NULL)
    # is itself NULL; a separate leading CASE branch measured 2x slower
    # in the enrichment hot path) — a callable because the regex's
    # {1,3} quantifier would collide with str.format braces
    (
        "IPv4StringToNum",
        lambda a: (
            "(CASE WHEN ({x} RLIKE '^\\\\d{{1,3}}\\\\.\\\\d{{1,3}}"
            "\\\\.\\\\d{{1,3}}\\\\.\\\\d{{1,3}}$'"
            " AND cast(split({x},'[.]')[0] as bigint) <= 255"
            " AND cast(split({x},'[.]')[1] as bigint) <= 255"
            " AND cast(split({x},'[.]')[2] as bigint) <= 255"
            " AND cast(split({x},'[.]')[3] as bigint) <= 255)"
            " OR {x} IS NULL"
            " THEN cast(split({x},'[.]')[0] as bigint)*16777216"
            " + cast(split({x},'[.]')[1] as bigint)*65536"
            " + cast(split({x},'[.]')[2] as bigint)*256"
            " + cast(split({x},'[.]')[3] as bigint)"
            " ELSE cast(0 as bigint) END)"
        ).format(x=a[0]),
    ),
]

# quantile(p)(x) / quantileExact(p)(x) — curried ClickHouse spelling
# quantile(p)(x) spellings are found by a paren-balancing scanner, not
# a regex — [^)]* on the value argument corrupted any nested call
# (quantile(0.95)(toUInt64(x)) silently dropped the 0.95)
_QUANTILE_HEAD = re.compile(r"\bquantiles?(Exact)?\s*\(")


def _balance(sql: str, start: int) -> int:
    """Index just past the ')' matching the '(' at start-1.
    QUOTE-AWARE: parens inside single-quoted literals don't count — the
    blind scanner corrupted any query whose literal contained '(' or
    ')' (r6 review, e.g. ifNull(x, '(')). Both literal escape forms
    ClickHouse accepts are honored: '' doubling AND backslash escapes
    (\\' stays inside the literal) — the r6 version handled only
    doubling, so a \\' flipped the literal state and desynced the scan
    (r7 advice)."""
    depth, j = 1, start
    while depth and j < len(sql):
        ch = sql[j]
        if ch == "'":
            j += 1
            while j < len(sql):
                if sql[j] == "\\":
                    j += 2  # backslash consumes the next char
                    continue
                if sql[j] == "'":
                    if j + 1 < len(sql) and sql[j + 1] == "'":
                        j += 2  # escaped '' stays inside the literal
                        continue
                    break
                j += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        j += 1
    return j


def _literal_spans(sql: str) -> list[tuple[int, int]]:
    """[start, end) index spans of every single-quoted literal
    (quotes included), honoring both '' doubling and backslash escapes
    (the r6 quote-parity count desynced on \\' inside a literal, r7
    advice). Computed ONCE per rewrite pass: the per-match forward
    rescan it replaces cost O(rules x matches x len) interpreted char
    steps on a long query (r7 review)."""
    spans: list[tuple[int, int]] = []
    i, n = 0, len(sql)
    while i < n:
        if sql[i] == "'":
            start = i
            i += 1
            while i < n:
                if sql[i] == "\\":
                    i += 2  # backslash consumes the next char
                    continue
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2  # '' doubling stays inside
                        continue
                    break
                i += 1
            i = min(i + 1, n)  # past the closing quote (or EOF)
            spans.append((start, i))
        else:
            i += 1
    return spans


def _in_literal(
    sql: str, pos: int, spans: list[tuple[int, int]] | None = None
) -> bool:
    """True when pos falls inside a single-quoted literal. Pass the
    precomputed `spans` (one _literal_spans call per rewrite pass) to
    make this a binary search instead of a rescan."""
    import bisect

    if spans is None:
        spans = _literal_spans(sql)
    k = bisect.bisect_right(spans, (pos, len(sql) + 1)) - 1
    return k >= 0 and spans[k][0] <= pos < spans[k][1]


def _rewrite_quantiles(sql: str) -> str:
    out, i = [], 0
    spans = _literal_spans(sql)  # once per pass; sql is fixed within it
    while True:
        m = _QUANTILE_HEAD.search(sql, i)
        if m and _in_literal(sql, m.start(), spans):
            out.append(sql[i:m.end()])
            i = m.end()
            continue
        if not m:
            out.append(sql[i:])
            return "".join(out)
        j = _balance(sql, m.end())
        level = sql[m.end():j - 1]
        k = j
        while k < len(sql) and sql[k].isspace():
            k += 1
        if k >= len(sql) or sql[k] != "(":
            # not the curried form — leave untouched
            out.append(sql[i:j])
            i = j
            continue
        k2 = _balance(sql, k + 1)
        # the captured VALUE argument may itself contain a curried
        # quantile (quantileExact(0.9)(x - quantile(0.5)(x))) — rescan
        # it so nested forms translate instead of passing through
        # verbatim into an AnalysisException (r8 review)
        value = _rewrite_quantiles(sql[k + 1:k2 - 1])
        fn = "percentile" if m.group(1) else "percentile_approx"
        # plural spelling quantiles(p1,p2,...)(x) → array of levels
        # (both Spark percentile fns accept an array and return one)
        if sql[m.start():m.end()].lstrip().startswith("quantiles"):
            level = f"array({level})"
        out.append(sql[i:m.start()])
        out.append(f"{fn}({value}, {level})")
        i = k2


def _split_args(argstr: str) -> list[str]:
    """Split a function argument list at top-level commas — QUOTE-
    AWARE: a comma inside a single-quoted literal (countIf(msg =
    'a,b')) previously split the literal and silently corrupted the
    translation (r6 review)."""
    args, depth, cur = [], 0, []
    i = 0
    while i < len(argstr):
        ch = argstr[i]
        if ch == "'":
            cur.append(ch)
            i += 1
            while i < len(argstr):
                if argstr[i] == "\\" and i + 1 < len(argstr):
                    # backslash escape consumes the next char (r7
                    # advice: \' must not close the literal)
                    cur.append(argstr[i])
                    cur.append(argstr[i + 1])
                    i += 2
                    continue
                cur.append(argstr[i])
                if argstr[i] == "'":
                    if i + 1 < len(argstr) and argstr[i + 1] == "'":
                        cur.append(argstr[i + 1])
                        i += 2
                        continue
                    break
                i += 1
            i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        args.append("".join(cur).strip())
    return args


def _template_arity(template: str) -> int:
    """Number of distinct {N} placeholders a rule consumes."""
    idx = [int(n) for n in re.findall(r"\{(\d+)\}", template)]
    return max(idx) + 1 if idx else 0


# Allowed argument counts for the CALLABLE rules. Template rules derive
# arity from their {N} placeholders; callables can't, and a Python
# lambda over args[:k] silently IGNORES extras — verified:
# IPv4StringToNum(a, b) translated over `a` alone with no error, the
# exact silent-drop the r6 template-arity fix removed (r7 review).
# Every callable rule MUST be registered here; _rewrite_calls refuses
# an unregistered one loudly.
_CALLABLE_ARITY: dict[str, frozenset[int]] = {
    "countIf": frozenset({1, 2}),  # countIf(cond) | countIf(x, cond)
    "toStartOfInterval": frozenset({2}),
    "dateDiff": frozenset({3}),
    "IPv4StringToNum": frozenset({1}),
}


def _rewrite_calls(sql: str, name: str, template: str) -> str:
    """Rewrite every `name(args)` call, handling nested parens.
    A call site inside a string literal is left untouched; a call with
    the wrong arity RAISES — str.format silently discarded extra args,
    so countIf(x, cond) translated to a wrong count with no error
    (r6 review)."""
    out = []
    i = 0
    pat = re.compile(rf"\b{name}\s*\(")
    spans = _literal_spans(sql)  # once per pass; sql is fixed within it
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        if _in_literal(sql, m.start(), spans):
            out.append(sql[i : m.end()])
            i = m.end()
            continue
        out.append(sql[i : m.start()])
        j = _balance(sql, m.end())
        args = _split_args(sql[m.end() : j - 1])
        if callable(template):
            allowed = _CALLABLE_ARITY.get(name)
            if allowed is None:
                raise ValueError(
                    f"callable rule {name!r} has no _CALLABLE_ARITY "
                    "entry — register its allowed argument counts so "
                    "extra arguments cannot be silently discarded"
                )
            if len(args) not in allowed:
                raise ValueError(
                    f"{name}: expected {sorted(allowed)} argument(s), "
                    f"got {len(args)} in {sql[m.start():j]!r} — "
                    "unsupported ClickHouse form (translate refuses "
                    "rather than silently dropping arguments)"
                )
            try:
                out.append(template(args))
            except IndexError:
                raise ValueError(
                    f"{name}: unsupported argument count {len(args)} "
                    f"in {sql[m.start():j]!r}"
                ) from None
        else:
            want = _template_arity(template)
            if len(args) != want:
                raise ValueError(
                    f"{name}: expected {want} argument(s), got "
                    f"{len(args)} in {sql[m.start():j]!r} — unsupported "
                    "ClickHouse form (translate refuses rather than "
                    "silently dropping arguments)"
                )
            out.append(template.format(*args))
        i = j
    return "".join(out)


def translate(sql: str) -> str:
    """ClickHouse SQL → Spark SQL for the supported function surface."""
    sql = _rewrite_quantiles(sql)
    for name, template in _TEXT_RULES:
        sql = _rewrite_calls(sql, name, template)
    return sql


CLICKHOUSE_COLUMN_FNS: dict[str, Callable[..., Column]] = {
    "uniq": lambda c: F.approx_count_distinct(c),
    "uniqExact": lambda c: F.count_distinct(c),
    "toStartOfMinute": lambda c: F.date_trunc("minute", c),
    "toStartOfHour": lambda c: F.date_trunc("hour", c),
    "toDateTime": lambda c: F.to_timestamp(c),
    "toDate": lambda c: F.to_date(c),
    # exact integer division via the same SQL `div` the textual rule
    # emits — the earlier double-divide rounded operands beyond 2^53
    # (UInt64-scale counters) to a silently wrong quotient, so the two
    # advertised-equivalent surfaces disagreed (r8 review)
    "intDiv": lambda a, b: F.call_function("div", a, b),
    "bitAnd": lambda a, b: a.bitwiseAND(b),
    "bitOr": lambda a, b: a.bitwiseOR(b),
    "bitXor": lambda a, b: a.bitwiseXOR(b),
    "IPv4NumToString": ipv4_num_to_string,
    "IPv4StringToNum": ipv4_string_to_num,
    "quantile": lambda c, p: F.percentile_approx(c, p),
    "quantileExact": lambda c, p: F.percentile(c, p),
    # ClickHouse any/anyLast skip NULLs (r8 review; matches the
    # textual rules' first({0}, true) / last({0}, true))
    "any": lambda c: F.first(c, ignorenulls=True),
    "anyLast": lambda c: F.last(c, ignorenulls=True),
    "argMax": lambda a, b: F.max_by(a, b),
    "argMin": lambda a, b: F.min_by(a, b),
    "median": lambda c: F.percentile_approx(c, 0.5),
    "toStartOfMonth": lambda c: F.date_trunc("month", c),
    "toUnixTimestamp": lambda c: F.unix_timestamp(c),
}
