"""Ray Data stages (SURVEY.md §3.4 stages 3–5).

- :mod:`normalize` — stateless tasks: schema check, partition assignment
  (stable hash, no PYTHONHASHSEED dependence), mega-doc salting.
- :mod:`extract`   — the hot stage: a fixed-size actor pool hosting the DOM
  parser + compiled rule plan + boilerplate classifier; poison-document
  quarantine instead of task failure.
- :mod:`regroup`   — the only shuffle: salted docs regrouped by ``doc_id``,
  spans re-concatenated in salt order; unsalted rows take a shuffle-free
  fast path.
"""

from goose_parser_ray.stages.normalize import make_normalize_fn, stable_hash
from goose_parser_ray.stages.extract import ExtractActor
from goose_parser_ray.stages.regroup import regroup_salted

__all__ = ["make_normalize_fn", "stable_hash", "ExtractActor", "regroup_salted"]
