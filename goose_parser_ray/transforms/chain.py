"""Transform implementations + chain compiler (SURVEY.md §2.2 T1–T12).

A chain is compiled ONCE from its JSON spec (``[{type, ...params}, ...]``)
into a :class:`TransformChain`; per-value work touches no spec dicts.
String transforms map element-wise over list values (a ``split`` upstream
produces an array that later transforms consume element-wise).
"""

from __future__ import annotations

import html as _html
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc

from goose_parser_ray.transforms.jsregex import (
    translate_js_regex,
    translate_js_replacement,
)
from goose_parser_ray.transforms.momentfmt import MomentFormatter, MomentParser


class TransformError(ValueError):
    pass


# Constructs whose RE2 semantics still diverge from Python re AFTER the JS
# class expansion (jsregex.translate_js_classes): leftover perl classes
# (negated-in-class forms), \b/\B word boundaries (ASCII in RE2, Unicode in
# Python), and '^'/'$' anchors (trailing-newline handling differs). Patterns
# containing any of these take the scalar Python-re path so the two paths
# can never disagree.
import re as _re

_RE2_UNSAFE = _re.compile(r"\\[sSdDwWbB]|[\^$]")


# user-registered custom transforms: name -> scalar fn (SURVEY.md §2.2 T12)
_CUSTOM: dict[str, Callable[[Any], Any]] = {}


def register_transform(name: str, fn: Callable[[Any], Any]) -> None:
    """Python analogue of upstream ``parser.addTransform(type, fn)``."""
    _CUSTOM[name] = fn


class Transform:
    """Base: subclasses implement ``_scalar_str`` (str -> Any) or override
    ``apply_scalar``; ``apply_array`` returns None when not vectorizable."""

    def _scalar_str(self, v: str) -> Any:  # pragma: no cover - abstract
        raise NotImplementedError

    def apply_scalar(self, v: Any) -> Any:
        if v is None:
            v = ""
        if isinstance(v, list):
            return [self.apply_scalar(x) for x in v]
        if not isinstance(v, str):
            v = str(v)
        return self._scalar_str(v)

    def apply_array(self, arr: pa.Array) -> pa.Array | None:
        return None


class Trim(Transform):  # T1
    def _scalar_str(self, v: str) -> str:
        return v.strip()

    def apply_array(self, arr):
        if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
            return pc.utf8_trim_whitespace(arr)
        return None


class Replace(Transform):  # T2
    def __init__(self, spec: dict) -> None:
        re_spec = spec.get("re")
        if not isinstance(re_spec, list) or not re_spec:
            raise TransformError(f"replace needs re: [pattern, flags?]: {spec}")
        pattern = re_spec[0]
        flags = re_spec[1] if len(re_spec) > 1 else ""
        self.pattern, self.is_global = translate_js_regex(pattern, flags)
        self.to = translate_js_replacement(str(spec.get("to", "")))
        # RE2 fast-path gate, decided once at compile time. The JS→explicit
        # class expansion already happened in translate_js_regex, so Python
        # and RE2 read identical class sets; what remains unsafe is \b/\B,
        # '^'/'$' (trailing-newline delta) and negated-in-class perl forms.
        # The compile probe additionally rejects RE2-unsupported syntax
        # (lookarounds, backrefs) — it proves compilability, the _RE2_UNSAFE
        # gate proves equal meaning.
        self._vec_ok = False
        expanded = self.pattern.pattern
        if (
            "\\" not in self.to
            and not flags.replace("g", "")
            and _RE2_UNSAFE.search(expanded) is None
        ):
            try:
                pc.replace_substring_regex(
                    pa.array(["probe"]), pattern=expanded,
                    replacement=spec.get("to", ""),
                    max_replacements=None if self.is_global else 1,
                )
                self._vec_ok = True
                self._raw_pattern = expanded
                self._raw_to = str(spec.get("to", ""))
            except pa.ArrowInvalid:
                pass

    def _scalar_str(self, v: str) -> str:
        return self.pattern.sub(self.to, v, count=0 if self.is_global else 1)

    def apply_array(self, arr):
        if self._vec_ok and pa.types.is_string(arr.type):
            return pc.replace_substring_regex(
                arr, pattern=self._raw_pattern, replacement=self._raw_to,
                max_replacements=None if self.is_global else 1,
            )
        return None


class DateTransform(Transform):  # T3
    def __init__(self, spec: dict) -> None:
        locale = spec.get("locale", "en")
        if "from" not in spec or "to" not in spec:
            raise TransformError(f"date needs from/to formats: {spec}")
        self.parser = MomentParser(spec["from"], locale)
        self.formatter = MomentFormatter(spec["to"], locale)

    def _scalar_str(self, v: str) -> str:
        dt = self.parser.parse(v)
        if dt is None:
            return ""  # unparseable → empty (documented; fixture-encoded)
        return self.formatter.format(dt)


class Split(Transform):  # T4
    def __init__(self, spec: dict) -> None:
        self.separator = str(spec.get("separator", ","))
        self.index = spec.get("index", None)
        if self.index is not None:
            self.index = int(self.index)

    def _scalar_str(self, v: str):
        parts = v.split(self.separator)
        if self.index is None:
            return parts
        if -len(parts) <= self.index < len(parts):
            return parts[self.index]
        return ""

    def apply_array(self, arr):
        if self.index is None and pa.types.is_string(arr.type):
            return pc.split_pattern(arr, pattern=self.separator)
        return None


class Join(Transform):  # T5
    def __init__(self, spec: dict) -> None:
        self.glue = str(spec.get("glue", spec.get("separator", ",")))

    def apply_scalar(self, v: Any) -> str:
        if v is None:
            return ""
        if isinstance(v, list):
            return self.glue.join("" if x is None else str(x) for x in v)
        return str(v)

    def apply_array(self, arr):
        if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
            return pc.binary_join(arr, self.glue)
        return None


class Match(Transform):  # T6
    def __init__(self, spec: dict) -> None:
        re_spec = spec.get("re")
        if not isinstance(re_spec, list) or not re_spec:
            raise TransformError(f"match needs re: [pattern, flags?]: {spec}")
        flags = re_spec[1] if len(re_spec) > 1 else ""
        self.pattern, _ = translate_js_regex(re_spec[0], flags)
        self.index = int(spec.get("index", 0))

    def _scalar_str(self, v: str) -> str:
        m = self.pattern.search(v)
        if m is None:
            return ""
        try:
            g = m.group(self.index)
        except IndexError:
            return ""
        return g if g is not None else ""


class Pick(Transform):  # T7
    def __init__(self, spec: dict) -> None:
        prop = spec.get("prop", spec.get("keys"))
        if prop is None:
            raise TransformError(f"pick needs prop/keys: {spec}")
        self.keys = [prop] if isinstance(prop, str) else list(prop)

    def apply_scalar(self, v: Any) -> Any:
        if isinstance(v, dict):
            return {k: v[k] for k in self.keys if k in v}
        if isinstance(v, list):
            return [self.apply_scalar(x) for x in v]
        return v


class Get(Transform):  # T8
    def __init__(self, spec: dict) -> None:
        path = spec.get("path", spec.get("prop"))
        if path is None:
            raise TransformError(f"get needs path: {spec}")
        self.path = path.split(".") if isinstance(path, str) else list(path)

    def apply_scalar(self, v: Any) -> Any:
        for key in self.path:
            if isinstance(v, dict):
                v = v.get(key, "")
            elif isinstance(v, list):
                try:
                    v = v[int(key)]
                except (ValueError, IndexError):
                    return ""
            else:
                return ""
        return v


class Combine(Transform):  # T9 [L] — join multiple values with optional glue
    def __init__(self, spec: dict) -> None:
        self.glue = str(spec.get("glue", ""))

    def apply_scalar(self, v: Any) -> str:
        if isinstance(v, list):
            return self.glue.join("" if x is None else str(x) for x in v)
        return "" if v is None else str(v)


class Compare(Transform):  # T10 [L] — equality vs constant → bool
    def __init__(self, spec: dict) -> None:
        if "value" not in spec:
            raise TransformError(f"compare needs value: {spec}")
        self.value = spec["value"]

    def apply_scalar(self, v: Any) -> bool:
        return v == self.value


class DecodeHTML(Transform):  # T11
    def _scalar_str(self, v: str) -> str:
        return _html.unescape(v)


class Custom(Transform):  # T12
    def __init__(self, name: str, fn: Callable[[Any], Any]) -> None:
        self.name, self.fn = name, fn

    def apply_scalar(self, v: Any) -> Any:
        return self.fn(v)


_BUILDERS: dict[str, Callable[[dict], Transform]] = {
    "trim": lambda s: Trim(),
    "replace": Replace,
    "date": DateTransform,
    "split": Split,
    "join": Join,
    "match": Match,
    "pick": Pick,
    "get": Get,
    "combine": Combine,
    "compare": Compare,
    "decodeHTML": lambda s: DecodeHTML(),
}


class TransformChain:
    """An ordered, compiled transform chain (SURVEY.md §2.2 chain semantics)."""

    def __init__(self, transforms: list[Transform], specs: list[dict]) -> None:
        self.transforms = transforms
        self.specs = specs  # kept for plan hashing / lineage

    def apply_scalar(self, v: Any) -> Any:
        for t in self.transforms:
            v = t.apply_scalar(v)
        return v

    def apply_array(self, arr: pa.Array) -> pa.Array:
        """Vectorized bulk path: pyarrow kernels end-to-end when every member
        supports them, else one scalar pass over Python values (semantics
        identical either way — unit-tested equivalence)."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        out: pa.Array | None = arr
        for t in self.transforms:
            nxt = t.apply_array(out)
            if nxt is None:
                return self._scalar_fallback(arr)
            out = nxt
        return out

    def _scalar_fallback(self, arr: pa.Array) -> pa.Array:
        return pa.array([self.apply_scalar(v) for v in arr.to_pylist()])


def compile_chain(specs: list[dict] | None) -> TransformChain:
    transforms: list[Transform] = []
    for spec in specs or []:
        ttype = spec.get("type")
        if ttype in _BUILDERS:
            transforms.append(_BUILDERS[ttype](spec))
        elif ttype in _CUSTOM:
            transforms.append(Custom(ttype, _CUSTOM[ttype]))
        else:
            raise TransformError(f"unknown transform type {ttype!r} in {spec}")
    return TransformChain(transforms, list(specs or []))
