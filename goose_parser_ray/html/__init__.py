"""From-scratch HTML5 DOM for static rule evaluation.

The sandbox has no HTML libraries (no lxml/bs4/html5lib — SURVEY.md §7.0), so
the tokenizer, tree builder, implied-tag handling and recovery rules here are
our own. The low-level *tokenizer* (:mod:`goose_parser_ray.html.tokenizer`)
was originally stdlib ``html.parser.HTMLParser``; profiling showed the stdlib
machinery at ~75% of per-document extract cost, so it was replaced by a
from-scratch scanner emitting the same event stream (entity decoding still
uses the stdlib ``html`` TABLE via ``html.unescape`` — allowed by SURVEY.md
§7.0 "stdlib html.parser/html.entities may inform"). Tree construction
(≈ a parse5-equivalent subset, incl. a simplified adoption agency) is
implemented from scratch in :mod:`goose_parser_ray.html.treebuilder`.

Reference behavior being reproduced: the reference evaluates rules against a
browser DOM (upstream env packages build it with a real HTML5 parser —
SURVEY.md §2.1 G5). We reproduce the subset of tree-construction behavior the
conformance fixtures exercise: void elements, implied end tags (p/li/td/tr/
dd/dt/option), implied tbody in tables, unclosed-tag recovery, entity
decoding, raw-text elements.
"""

from goose_parser_ray.html.dom import Document, Element, Text
from goose_parser_ray.html.treebuilder import parse_html

__all__ = ["Document", "Element", "Text", "parse_html"]
