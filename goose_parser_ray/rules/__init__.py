"""Rule-plan compiler + evaluator — goose-parser's query surface, static.

The reference's rule tree (SURVEY.md §2.1) is compiled once on the driver into
an immutable, picklable :class:`~goose_parser_ray.rules.plan.Plan` (selector
matchers + fused transform chains), shipped to extract actors via constructor
args, and evaluated per document against the DOM built from the row's html
spans. Covered: simple rules (G1), collection rules (G2), grid rules (G3),
scope nesting + ``parentScope`` (G4), ``id`` dedup (G6), static ``cases`` /
``exist`` branching (§2.3).
"""

from goose_parser_ray.rules.plan import Plan, RuleError, compile_rules
from goose_parser_ray.rules.evaluator import evaluate, exists

__all__ = ["Plan", "RuleError", "compile_rules", "evaluate", "exists"]
