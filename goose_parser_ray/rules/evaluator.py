"""Plan evaluator — recursive descent over compiled rules (SURVEY.md §3.1
step 3, re-expressed for a static DOM; upstream ``_parseScope`` /
``_parseSimpleRule`` / ``_parseCollectionRule`` in ``lib/Parser.js``).

Conformance semantics (SURVEY.md §2.1, encoded in fixtures):

- simple (G1): select nodes by ``scope`` within the parent scope; extract
  ``textContent`` (or attribute ``attr``); join multiple matches with
  ``separator`` (default ``' '``); ``type:'array'`` returns the per-node list
  (transforms applied element-wise); empty match → ``''`` with the transform
  chain still applied.
- collection (G2): object with one field per named child, children evaluated
  within this rule's scope (or the parent scope when no scope is given).
- grid (G3): for every node matched by ``scope``, evaluate the inner
  collection with that node as the parent scope → array of objects; a child
  with ``id: true`` dedups rows (first occurrence wins, document order — G6).
- ``parentScope`` (G4): re-roots the rule at the document root.
- cases (§2.3): first branch whose scope matches ≥1 node produces the value;
  no branch matches → ``''``.
"""

from __future__ import annotations

from typing import Any

from goose_parser_ray.css.selector import CompiledSelector, select
from goose_parser_ray.rules.plan import Plan


def _resolve_scope_root(plan: Plan, scope_el, doc_root):
    """parentScope re-roots at the document root (G4)."""
    if plan.parent_scope is not None:
        roots = select(plan.parent_scope, doc_root)
        return roots[0] if roots else None
    return scope_el


def exists(selector: CompiledSelector, scope_el) -> bool:
    """The static ``exist`` predicate (SURVEY.md §2.3) — kept because it is
    cheaply evaluable on a frozen DOM; used by ``cases`` and by per-row
    filters (S5)."""
    return bool(select(selector, scope_el, first_only=True))


def evaluate(plan: Plan, scope_el, doc_root=None) -> Any:
    """Evaluate ``plan`` against ``scope_el`` (an Element; usually the
    Document). Returns goose-style JSON: str | list | dict."""
    if doc_root is None:
        doc_root = scope_el
    root = _resolve_scope_root(plan, scope_el, doc_root)
    if root is None:
        return "" if plan.kind == "simple" else _empty_value(plan)

    if plan.kind == "simple":
        return _eval_simple(plan, root)
    if plan.kind == "collection":
        out = _eval_collection(plan, root, doc_root)
    elif plan.kind == "grid":
        out = _eval_grid(plan, root, doc_root)
    elif plan.kind == "cases":
        return _eval_cases(plan, root, doc_root)
    else:  # pragma: no cover
        raise AssertionError(f"unknown plan kind {plan.kind!r}")
    # upstream applies the rule's transform chain to ANY rule result —
    # collection objects get pick/get, grid row-lists apply element-wise
    # (upstream:lib/Parser.js _parseScope → _applyTransformations)
    return plan.chain.apply_scalar(out) if plan.chain.transforms else out


def _empty_value(plan: Plan) -> Any:
    if plan.kind == "grid":
        return []
    if plan.kind == "collection":
        return {c.name: "" for c in plan.children}
    return ""


def _eval_simple(plan: Plan, root) -> Any:
    nodes = select(plan.scope, root)
    if plan.attr:
        values = [n.attrs.get(plan.attr, "") for n in nodes]
    else:
        values = [n.text() for n in nodes]
    if plan.is_array:
        return [plan.chain.apply_scalar(v) for v in values]
    joined = plan.separator.join(values)
    return plan.chain.apply_scalar(joined)


def _eval_collection(plan: Plan, root, doc_root) -> dict:
    base = root
    if plan.scope is not None:
        scoped = select(plan.scope, root)
        if not scoped:
            return {c.name: _empty_value(c) for c in plan.children}
        base = scoped[0]
    return {c.name: evaluate(c, base, doc_root) for c in plan.children}


def _eval_grid(plan: Plan, root, doc_root) -> list[dict]:
    rows: list[dict] = []
    seen_ids: set[Any] = set()
    id_fn = None
    if plan.id_fn is not None:
        # G6 callable-id: resolved here (not at compile) so plans survive
        # pickling to actors — the registry must be populated by a module
        # import on every worker (see register_id_fn docstring).
        from goose_parser_ray.rules.plan import ID_FN_REGISTRY

        try:
            id_fn = ID_FN_REGISTRY[plan.id_fn]
        except KeyError:
            raise RuntimeError(
                f"id function {plan.id_fn!r} not registered in this worker; "
                f"register_id_fn must run (via module import) before "
                f"evaluation"
            ) from None
    for node in select(plan.scope, root):
        row = {c.name: evaluate(c, node, doc_root) for c in plan.children}
        if plan.id_field is not None:
            key = row.get(plan.id_field)
            if id_fn is not None:
                key = id_fn(key)
            key = key if isinstance(key, str) else repr(key)
            if key in seen_ids:
                continue  # G6: first occurrence wins
            seen_ids.add(key)
        rows.append(row)
    return rows


def _eval_cases(plan: Plan, root, doc_root) -> Any:
    for branch in plan.children:
        branch_root = _resolve_scope_root(branch, root, doc_root)
        if branch_root is None:
            continue
        if branch.scope is not None and not exists(branch.scope, branch_root):
            continue
        value = evaluate(branch, root, doc_root)
        return plan.chain.apply_scalar(value) if plan.chain.transforms else value
    return ""
