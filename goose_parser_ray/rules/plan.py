"""Rule-tree JSON → immutable compiled Plan (SURVEY.md §1.2, §2.1).

Compilation happens ONCE (driver or actor ``__init__``); evaluation touches
only compiled objects. Plans are picklable — they cross the process boundary
exactly once per actor (plasma-broadcast via constructor args, SURVEY.md §3.4
stage 4).

Rule spec grammar (FIXTURES.md F4, mirroring upstream README "Parser rules"):

```
rule     := {scope?, name?, parentScope?, attr?, separator?, type?, id?,
             transform?: [spec...], collection?: [rule...] | [[rule...]],
             cases?: [rule...]}
collection: [r1, r2, ...]    -> object with one field per named child   (G2)
collection: [[r1, r2, ...]]  -> grid: array of objects, one per scope node (G3)
```
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

from goose_parser_ray.css import compile_selector
from goose_parser_ray.css.selector import CompiledSelector
from goose_parser_ray.transforms import TransformChain, compile_chain


class RuleError(ValueError):
    pass


# Registered grid-id callbacks (T12 registry pattern — SURVEY §2.1 G6 [M]:
# upstream's grid merge accepts ``id: fn`` alongside ``id: true``; functions
# don't survive JSON rule specs, so the callable variant is a REGISTERED NAME
# resolved at compile time, exactly like custom transforms). The callback
# receives the extracted child value and returns the dedup key ("first
# occurrence wins" runs on its return value). Upstream signature unverified
# (reference dir empty) — flagged per SURVEY's own rule.
ID_FN_REGISTRY: dict[str, object] = {}


def register_id_fn(name: str, fn) -> None:
    """Register a named grid-id callback usable as ``id: "<name>"`` in rule
    specs. Must be called (e.g. at import time of the user's rules module)
    on EVERY process that compiles the plan — actors compile in
    ``__init__`` from the JSON spec, so register in a module your pipeline
    imports, not interactively."""
    if not callable(fn):
        raise RuleError(f"id function {name!r} must be callable")
    ID_FN_REGISTRY[name] = fn


@dataclass(frozen=True)
class Plan:
    """One compiled rule node. ``kind`` ∈ {simple, collection, grid, cases}."""

    kind: str
    name: str | None = None
    scope: CompiledSelector | None = None
    parent_scope: CompiledSelector | None = None
    attr: str | None = None
    separator: str = " "
    is_array: bool = False  # type: 'array' (G1)
    is_id: bool = False  # id: true | "<fn>" on a grid child (G6)
    id_fn: str | None = None  # registered id-callback name (id: "<fn>")
    chain: TransformChain | None = None
    children: tuple["Plan", ...] = ()  # collection/grid members, cases branches
    id_field: str | None = None  # grid: name of the id child, if any
    source: str = ""  # original JSON (canonical) for hashing/lineage

    @property
    def plan_hash(self) -> str:
        """Stable lineage hash (manifest lineage — SURVEY.md §4.2)."""
        return hashlib.sha256(self.source.encode()).hexdigest()[:16]


def _canon(rule: dict) -> str:
    return json.dumps(rule, sort_keys=True, ensure_ascii=False)


def compile_rules(rule: dict) -> Plan:
    """Compile a rule-tree dict into a Plan. Raises :class:`RuleError` on
    malformed specs, :class:`~goose_parser_ray.css.SelectorError` on
    unsupported selectors — all loudly, at compile time."""
    if not isinstance(rule, dict):
        raise RuleError(f"rule must be an object, got {type(rule).__name__}")

    name = rule.get("name")
    scope = compile_selector(rule["scope"]) if rule.get("scope") else None
    parent_scope = (
        compile_selector(rule["parentScope"]) if rule.get("parentScope") else None
    )
    chain = compile_chain(rule.get("transform"))

    if "cases" in rule:
        branches = tuple(compile_rules(b) for b in rule["cases"])
        if not branches:
            raise RuleError("cases must contain at least one branch")
        return Plan(
            kind="cases",
            name=name,
            scope=scope,
            parent_scope=parent_scope,
            chain=chain,
            children=branches,
            source=_canon(rule),
        )

    if "collection" in rule:
        coll = rule["collection"]
        if not isinstance(coll, list) or not coll:
            raise RuleError(f"collection must be a non-empty list: {rule}")
        # grid = double array: collection: [[...]]
        if isinstance(coll[0], list):
            if len(coll) != 1:
                raise RuleError("grid collection must be a single inner list")
            if scope is None:
                raise RuleError("grid rule requires a scope")
            children = tuple(compile_rules(c) for c in coll[0])
            id_child = next((c for c in children if c.is_id and c.name), None)
            _require_names(children, rule)
            return Plan(
                kind="grid",
                name=name,
                scope=scope,
                parent_scope=parent_scope,
                chain=chain,
                children=children,
                id_field=id_child.name if id_child else None,
                id_fn=id_child.id_fn if id_child else None,
                source=_canon(rule),
            )
        children = tuple(compile_rules(c) for c in coll)
        _require_names(children, rule)
        return Plan(
            kind="collection",
            name=name,
            scope=scope,
            parent_scope=parent_scope,
            chain=chain,
            children=children,
            source=_canon(rule),
        )

    # simple rule
    if scope is None:
        raise RuleError(f"simple rule requires a scope: {rule}")
    id_val = rule.get("id")
    id_fn: str | None = None
    if id_val not in (None, False, True):
        # G6 callable-id variant: upstream accepts ``id: fn``; in JSON rule
        # specs the callable must be a registered NAME (T12 registry
        # pattern). Any other form is rejected loudly at compile time.
        if not isinstance(id_val, str):
            raise RuleError(
                f"unsupported id form {id_val!r}: expected true or a "
                f"registered id-function name (see register_id_fn)"
            )
        if id_val not in ID_FN_REGISTRY:
            raise RuleError(
                f"id function {id_val!r} is not registered; call "
                f"register_id_fn({id_val!r}, fn) in a module imported by "
                f"every worker before compiling the plan"
            )
        id_fn = id_val
    return Plan(
        kind="simple",
        name=name,
        scope=scope,
        parent_scope=parent_scope,
        attr=rule.get("attr"),
        separator=rule.get("separator", " "),
        is_array=rule.get("type") == "array",
        is_id=bool(id_val),
        id_fn=id_fn,
        chain=chain,
        source=_canon(rule),
    )


def _require_names(children: tuple[Plan, ...], rule: dict) -> None:
    for c in children:
        if not c.name:
            raise RuleError(f"collection/grid members need a name: {rule}")
