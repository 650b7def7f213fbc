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


# JS RegExp class semantics (ECMA-262): \d=[0-9], \w=[A-Za-z0-9_] (ASCII),
# \s=Unicode WhiteSpace+LineTerminator+BOM. Python re's \d/\w are Unicode
# (Arabic-Indic digits match \d) and RE2's \s is ASCII-only — three engines,
# three meanings. Expanding to explicit character classes at compile time
# makes Python (scalar path), RE2 (pyarrow vectorized path) and the
# reference's JS agree exactly.
_JS_WS = "\t\n\x0b\f\r \xa0  -     　﻿"
_CLASS_EXPANSION = {"d": "0-9", "w": "A-Za-z0-9_", "s": _JS_WS}


def translate_js_classes(pattern: str) -> str:
    """Rewrite \\d/\\D/\\w/\\W/\\s/\\S to explicit classes, honoring
    character-class context (inside ``[...]`` emit bare ranges, not nested
    brackets). Negated forms inside a class (``[\\D]``) are left as-is —
    not class-expressible; they fall to the scalar path."""
    out: list[str] = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt in _CLASS_EXPANSION:
                exp = _CLASS_EXPANSION[nxt]
                out.append(exp if in_class else f"[{exp}]")
            elif nxt in "DWS" and not in_class:
                out.append(f"[^{_CLASS_EXPANSION[nxt.lower()]}]")
            else:
                out.append(pattern[i : i + 2])
            i += 2
            continue
        if c == "[" and not in_class:
            in_class = True
        elif c == "]" and in_class:
            in_class = False
        out.append(c)
        i += 1
    return "".join(out)


_FLAG_MAP = {
    "i": re.IGNORECASE,
    "m": re.MULTILINE,
    "s": re.DOTALL,
}


def translate_js_regex(pattern: str, flags: str = "") -> tuple[re.Pattern, bool]:
    """Return ``(compiled_python_pattern, is_global)``. The compiled pattern
    has JS class semantics (see :func:`translate_js_classes`); the expanded
    source is available as ``compiled.pattern`` for RE2 reuse."""
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
    translated = translate_js_classes(pattern)
    try:
        compiled = re.compile(translated, py_flags)
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
