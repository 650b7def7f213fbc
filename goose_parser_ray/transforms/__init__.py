"""Transform chain — goose-parser's post-extraction scalar functions.

Reference semantics (SURVEY.md §2.2, upstream README "Transformations"):
transforms apply **in array order**, each consuming the previous output.
Implemented set: trim, replace, date, split, join, match, pick, get,
decodeHTML, combine, compare, plus a custom-transform registry
(``register_transform`` ≈ upstream ``parser.addTransform`` — §2.2 T12).

Every transform offers two execution paths:

- ``apply_scalar(value)`` — per extracted value inside the rule evaluator
  (values are short strings; the DOM parse dominates, SURVEY.md §4.3).
- ``apply_array(pa.Array)`` — vectorized pyarrow.compute kernel used by the
  bulk query surface (transform chains over a whole ``documents.text`` column
  in one ``map_batches`` — SURVEY.md §2.6). Falls back to the scalar path
  value-by-value when no vectorized kernel exists (e.g. locale dates).

JS→Python deltas are resolved at COMPILE time, never per row:
regex translation (``$1``→``\\1`` backrefs, flag ``g``→count) in
:func:`goose_parser_ray.transforms.jsregex.translate_js_regex`; moment.js
date tokens → strptime directives in
:mod:`goose_parser_ray.transforms.momentfmt`.
"""

from goose_parser_ray.transforms.chain import (
    TransformChain,
    TransformError,
    compile_chain,
    register_transform,
)

__all__ = [
    "TransformChain",
    "TransformError",
    "compile_chain",
    "register_transform",
]
