"""CSS selector engine — the Sizzle subset goose-parser rules use.

The reference evaluates rule ``scope`` selectors with Sizzle injected into the
page (SURVEY.md §2.1 G5). This module reimplements, from scratch, the subset
upstream rules/tests actually exercise (SURVEY.md §7.2): tag/``*``/.class/#id,
attribute selectors (``[a]``, ``[a=v]``, ``^=``, ``$=``, ``*=``, ``~=``,
``|=``), combinators (descendant, ``>``, ``+``, ``~``), comma groups,
structural pseudos (:first-child, :last-child, :nth-child, :empty, :not,
:has), content pseudo ``:contains(s)``, and Sizzle POSITIONAL pseudos
(:first, :last, :eq(n), :gt(n), :lt(n), :even, :odd).

Sizzle positional semantics (SURVEY.md §7.6-4): positional pseudos filter the
*matched set in document order at the point they appear in the chain* —
``div:eq(1) span`` selects spans under the second matched div, not divs that
are the second child. The engine therefore evaluates left-to-right over node
sets rather than right-to-left per-element.

Unsupported syntax raises :class:`SelectorError` loudly at compile time
(SURVEY.md §7.2: "reject others loudly").
"""

from goose_parser_ray.css.selector import SelectorError, compile_selector, select

__all__ = ["SelectorError", "compile_selector", "select"]
