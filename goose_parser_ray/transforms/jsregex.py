"""Compile-time JS → Python regex translation (SURVEY.md §7.6-5).

goose-parser's ``replace`` / ``match`` transforms take JS RegExp specs
``{re: [pattern, flags]}`` (SURVEY.md §2.2 T2/T6). Deltas handled here, once
at plan-compile time:

- flags: ``g`` → replace-all vs replace-first (returned separately, JS global
  flag has no Python flag equivalent); ``i`` → ``re.IGNORECASE``;
  ``m`` → ``re.MULTILINE``; ``s`` → ``re.DOTALL``; ``u``/``y`` rejected.
- replacement backrefs: ``$1`` → ``\\1``, ``$&`` → ``\\g<0>``, ``$$`` → ``$``.

Unsupported constructs raise :class:`RegexTranslationError` loudly rather
than silently mis-matching.
"""

from __future__ import annotations

import re


class RegexTranslationError(ValueError):
    pass


_FLAG_MAP = {
    "i": re.IGNORECASE,
    "m": re.MULTILINE,
    "s": re.DOTALL,
}


def translate_js_regex(pattern: str, flags: str = "") -> tuple[re.Pattern, bool]:
    """Return ``(compiled_python_pattern, is_global)``."""
    py_flags = 0
    is_global = False
    for f in flags:
        if f == "g":
            is_global = True
        elif f in _FLAG_MAP:
            py_flags |= _FLAG_MAP[f]
        else:
            raise RegexTranslationError(
                f"unsupported JS regex flag {f!r} in /{pattern}/{flags}"
            )
    try:
        compiled = re.compile(pattern, py_flags)
    except re.error as exc:
        raise RegexTranslationError(
            f"pattern /{pattern}/ does not translate to Python re: {exc}"
        ) from exc
    return compiled, is_global


_DOLLAR_REF = re.compile(r"\$(\d+|&|\$)")


def translate_js_replacement(replacement: str) -> str:
    """JS replacement string → Python ``re.sub`` template."""

    def sub(m: re.Match) -> str:
        g = m.group(1)
        if g == "&":
            return r"\g<0>"
        if g == "$":
            return "$"
        return f"\\{g}"

    # escape Python backslash-refs that were literal in JS
    out = replacement.replace("\\", "\\\\")
    return _DOLLAR_REF.sub(sub, out)
