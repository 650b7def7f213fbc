"""Selector parser + left-to-right set-based matcher (see package docstring).

Compiled selectors are immutable and picklable — they are compiled ONCE at
plan-compile time on the driver (or in an actor's ``__init__``) and reused per
document (SURVEY.md §1.2 "Rule tree" mapping); compilation must never happen
per row.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_IDENT = r"[-\w -￿]+"
_TOKEN_RE = re.compile(
    rf"""
    (?P<ws>\s+)
  | (?P<combinator>[>+~])
  | (?P<comma>,)
  | (?P<tag>\*|{_IDENT})
  | \.(?P<class>{_IDENT})
  | \#(?P<id>{_IDENT})
  | \[(?P<attr>\s*{_IDENT}\s*(?:(?:[~^$*|]?=)\s*(?:"[^"]*"|'[^']*'|[^\]]*?)\s*)?)\]
  | :(?P<pseudo>{_IDENT})
  | (?P<lparen>\()
    """,
    re.VERBOSE,
)

_ATTR_RE = re.compile(
    rf"""^\s*(?P<name>{_IDENT})\s*
    (?:(?P<op>[~^$*|]?=)\s*(?P<val>"[^"]*"|'[^']*'|[^\]]*?)\s*)?$""",
    re.VERBOSE,
)

POSITIONAL = frozenset(["first", "last", "eq", "gt", "lt", "even", "odd"])


class SelectorError(ValueError):
    """Unsupported or malformed selector — raised at compile time."""


@dataclass(frozen=True)
class AttrTest:
    name: str
    op: str | None  # None = presence, '=', '~=', '^=', '$=', '*=', '|='
    value: str | None

    def matches(self, el) -> bool:
        v = el.attrs.get(self.name)
        if v is None:
            return False
        if self.op is None:
            return True
        ref = self.value or ""
        if self.op == "=":
            return v == ref
        if self.op == "~=":
            return ref in v.split()
        if self.op == "^=":
            return bool(ref) and v.startswith(ref)
        if self.op == "$=":
            return bool(ref) and v.endswith(ref)
        if self.op == "*=":
            return bool(ref) and ref in v
        if self.op == "|=":
            return v == ref or v.startswith(ref + "-")
        raise SelectorError(f"unsupported attribute operator {self.op!r}")


@dataclass(frozen=True)
class PseudoTest:
    name: str
    arg: str | None
    sub: "CompiledSelector | None" = None  # for :not / :has
    nth: tuple[int, int] | None = None  # (a, b) for :nth-child

    def matches(self, el) -> bool:
        n = self.name
        if n == "contains":
            return (self.arg or "") in el.text()
        if n in ("first-child", "last-child", "only-child"):
            parent = el.parent
            if parent is None:
                return False
            sibs = parent.child_elements()
            if n == "first-child":
                return sibs and sibs[0] is el
            if n == "last-child":
                return sibs and sibs[-1] is el
            return len(sibs) == 1 and sibs[0] is el
        if n in ("nth-child", "nth-last-child", "nth-of-type", "nth-last-of-type"):
            parent = el.parent
            if parent is None:
                return False
            sibs = parent.child_elements()
            if "of-type" in n:
                sibs = [s for s in sibs if s.tag == el.tag]
            if "last" in n:
                sibs = sibs[::-1]
            idx = 0
            for i, sib in enumerate(sibs, start=1):
                if sib is el:
                    idx = i
                    break
            a, b = self.nth  # type: ignore[misc]
            if a == 0:
                return idx == b
            k = (idx - b) / a
            return k >= 0 and k == int(k)
        if n in ("first-of-type", "last-of-type", "only-of-type"):
            parent = el.parent
            if parent is None:
                return False
            same = [s for s in parent.child_elements() if s.tag == el.tag]
            if n == "first-of-type":
                return bool(same) and same[0] is el
            if n == "last-of-type":
                return bool(same) and same[-1] is el
            return len(same) == 1 and same[0] is el
        if n == "empty":
            for c in el.children:
                if getattr(c, "tag", None) is not None:
                    return False
                if c.data.strip():
                    return False
            return True
        if n == "not":
            return not _compound_matches(self.sub, el)
        if n == "has":
            return bool(select(self.sub, el, first_only=True))
        if n == "header":
            return el.tag in ("h1", "h2", "h3", "h4", "h5", "h6")
        raise SelectorError(f"unsupported pseudo :{n}")


@dataclass(frozen=True)
class Positional:
    name: str
    arg: int | None

    def apply(self, nodes: list) -> list:
        n = self.name
        if n == "first":
            return nodes[:1]
        if n == "last":
            return nodes[-1:]
        if n == "eq":
            i = self.arg or 0
            if -len(nodes) <= i < len(nodes):
                return [nodes[i]]
            return []
        if n == "gt":
            return nodes[(self.arg or 0) + 1 :]
        if n == "lt":
            return nodes[: (self.arg or 0)]
        if n == "even":
            return nodes[0::2]
        if n == "odd":
            return nodes[1::2]
        raise SelectorError(f"unsupported positional :{n}")


@dataclass(frozen=True)
class Step:
    """One compound selector plus the combinator linking it to the previous
    step ('' = descendant for the first step)."""

    combinator: str  # ' ', '>', '+', '~'
    tag: str | None  # None or '*' = any
    classes: tuple[str, ...] = ()
    ids: tuple[str, ...] = ()
    attrs: tuple[AttrTest, ...] = ()
    pseudos: tuple[PseudoTest, ...] = ()
    positionals: tuple[Positional, ...] = ()

    def matches_simple(self, el) -> bool:
        if self.tag is not None and self.tag != "*" and el.tag != self.tag:
            return False
        for c in self.classes:
            if c not in el.classes:
                return False
        for i in self.ids:
            if el.attrs.get("id") != i:
                return False
        for a in self.attrs:
            if not a.matches(el):
                return False
        for p in self.pseudos:
            if not p.matches(el):
                return False
        return True


@dataclass(frozen=True)
class CompiledSelector:
    source: str
    groups: tuple[tuple[Step, ...], ...] = field(default_factory=tuple)


def _compound_matches(sub: CompiledSelector | None, el) -> bool:
    """Match a single-compound sub-selector (for :not) directly against el."""
    if sub is None:
        return False
    for steps in sub.groups:
        if len(steps) != 1:
            raise SelectorError(":not() supports a single compound selector")
        if steps[0].matches_simple(el):
            return True
    return False


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------


def _read_paren_arg(src: str, pos: int) -> tuple[str, int]:
    """src[pos] == '(' — return (arg, index-after-closing-paren)."""
    depth = 0
    i = pos
    quote: str | None = None
    while i < len(src):
        ch = src[i]
        if quote:
            if ch == quote:
                quote = None
        elif ch in "\"'":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return src[pos + 1 : i], i + 1
        i += 1
    raise SelectorError(f"unbalanced parentheses in selector: {src!r}")


def _strip_quotes(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "\"'":
        return s[1:-1]
    return s


def _parse_nth(arg: str) -> tuple[int, int]:
    a = arg.strip().lower()
    if a == "odd":
        return (2, 1)
    if a == "even":
        return (2, 0)
    m = re.match(r"^([+-]?\d*)n\s*(?:([+-])\s*(\d+))?$", a)
    if m:
        coef = m.group(1)
        an = 1 if coef in ("", "+") else (-1 if coef == "-" else int(coef))
        b = int(m.group(3) or 0) * (-1 if m.group(2) == "-" else 1)
        return (an, b)
    try:
        return (0, int(a))
    except ValueError:
        raise SelectorError(f"unsupported :nth-child argument {arg!r}") from None


def compile_selector(source: str) -> CompiledSelector:
    """Compile a selector string; raises :class:`SelectorError` on anything
    outside the supported Sizzle subset."""
    groups: list[tuple[Step, ...]] = []
    steps: list[Step] = []

    # mutable current-compound state
    cur: dict | None = None
    pending_comb = " "

    def flush_compound() -> None:
        nonlocal cur
        if cur is None:
            return
        steps.append(
            Step(
                combinator=cur["comb"],
                tag=cur["tag"],
                classes=tuple(cur["classes"]),
                ids=tuple(cur["ids"]),
                attrs=tuple(cur["attrs"]),
                pseudos=tuple(cur["pseudos"]),
                positionals=tuple(cur["positionals"]),
            )
        )
        cur = None

    def ensure_cur() -> dict:
        nonlocal cur, pending_comb
        if cur is None:
            cur = {
                "comb": pending_comb,
                "tag": None,
                "classes": [],
                "ids": [],
                "attrs": [],
                "pseudos": [],
                "positionals": [],
            }
            pending_comb = " "
        return cur

    pos = 0
    src = source
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise SelectorError(f"cannot parse selector {source!r} at index {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            if cur is not None:
                flush_compound()
            continue
        if kind == "combinator":
            flush_compound()
            pending_comb = m.group("combinator")
            continue
        if kind == "comma":
            flush_compound()
            if not steps:
                raise SelectorError(f"empty selector in group: {source!r}")
            groups.append(tuple(steps))
            steps = []
            pending_comb = " "
            continue
        if kind == "tag":
            c = ensure_cur()
            if c["tag"] is not None or c["classes"] or c["ids"] or c["attrs"]:
                raise SelectorError(
                    f"type selector must lead the compound: {source!r}"
                )
            c["tag"] = m.group("tag").lower()
            continue
        if kind == "class":
            ensure_cur()["classes"].append(m.group("class"))
            continue
        if kind == "id":
            ensure_cur()["ids"].append(m.group("id"))
            continue
        if kind == "attr":
            am = _ATTR_RE.match(m.group("attr"))
            if am is None:
                raise SelectorError(f"bad attribute selector in {source!r}")
            val = am.group("val")
            ensure_cur()["attrs"].append(
                AttrTest(
                    name=am.group("name").lower(),
                    op=am.group("op"),
                    value=None if val is None else _strip_quotes(val),
                )
            )
            continue
        if kind == "pseudo":
            name = m.group("pseudo").lower()
            arg: str | None = None
            if pos < len(src) and src[pos] == "(":
                arg, pos = _read_paren_arg(src, pos)
            c = ensure_cur()
            if name in POSITIONAL:
                iarg = None
                if arg is not None:
                    try:
                        iarg = int(arg.strip())
                    except ValueError:
                        raise SelectorError(
                            f":{name}() needs an integer, got {arg!r}"
                        ) from None
                c["positionals"].append(Positional(name, iarg))
            elif name in ("not", "has"):
                if arg is None:
                    raise SelectorError(f":{name} requires an argument")
                c["pseudos"].append(
                    PseudoTest(name, arg, sub=compile_selector(arg))
                )
            elif name in (
                "nth-child",
                "nth-last-child",
                "nth-of-type",
                "nth-last-of-type",
            ):
                if arg is None:
                    raise SelectorError(f":{name} requires an argument")
                c["pseudos"].append(PseudoTest(name, arg, nth=_parse_nth(arg)))
            elif name == "contains":
                if arg is None:
                    raise SelectorError(":contains requires an argument")
                c["pseudos"].append(PseudoTest(name, _strip_quotes(arg)))
            elif name in (
                "first-child",
                "last-child",
                "only-child",
                "first-of-type",
                "last-of-type",
                "only-of-type",
                "empty",
                "header",
            ):
                c["pseudos"].append(PseudoTest(name, None))
            else:
                raise SelectorError(f"unsupported pseudo :{name} in {source!r}")
            continue
        if kind == "lparen":
            raise SelectorError(f"unexpected '(' in selector {source!r}")

    flush_compound()
    if steps:
        groups.append(tuple(steps))
    if not groups:
        raise SelectorError(f"empty selector: {source!r}")
    return CompiledSelector(source=source, groups=tuple(groups))


# ---------------------------------------------------------------------------
# matching
# ---------------------------------------------------------------------------


def _gather(nodes: list, combinator: str) -> list:
    """Candidate elements for a step, deduped, in document order."""
    out: dict[int, object] = {}
    if combinator == " ":
        for n in nodes:
            for d in n.iter_elements():
                out[d.order] = d
    elif combinator == ">":
        for n in nodes:
            for c in n.child_elements():
                out[c.order] = c
    elif combinator == "+":
        for n in nodes:
            parent = n.parent
            if parent is None:
                continue
            sibs = parent.child_elements()
            try:
                i = next(i for i, s in enumerate(sibs) if s is n)
            except StopIteration:
                continue
            if i + 1 < len(sibs):
                s = sibs[i + 1]
                out[s.order] = s
    elif combinator == "~":
        for n in nodes:
            parent = n.parent
            if parent is None:
                continue
            seen = False
            for s in parent.child_elements():
                if s is n:
                    seen = True
                elif seen:
                    out[s.order] = s
    else:  # pragma: no cover
        raise SelectorError(f"unknown combinator {combinator!r}")
    return [out[k] for k in sorted(out)]


def select(
    selector: CompiledSelector | str, scope, first_only: bool = False
) -> list:
    """Evaluate a compiled selector relative to ``scope`` (an Element).

    Returns matching elements in document order. Matches are descendants of
    ``scope`` (Sizzle context semantics — SURVEY.md §2.1 G4). ``first_only``
    short-circuits per group (used by the ``exist`` predicate, §2.3)."""
    if isinstance(selector, str):
        selector = compile_selector(selector)
    result: dict[int, object] = {}
    for steps in selector.groups:
        nodes = [scope]
        for step in steps:
            candidates = _gather(nodes, step.combinator)
            matched = [el for el in candidates if step.matches_simple(el)]
            for positional in step.positionals:
                matched = positional.apply(matched)
            nodes = matched
            if not nodes:
                break
        for n in nodes:
            result[n.order] = n
            if first_only:
                break
        if first_only and result:
            break
    return [result[k] for k in sorted(result)]
