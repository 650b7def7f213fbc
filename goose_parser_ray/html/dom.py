"""Minimal DOM node model for static rule evaluation.

Nodes are ephemeral per-document objects built inside a ``map_batches`` actor
(SURVEY.md §1.2) — they are never serialized into Arrow, so the model is
optimized for cheap construction and fast traversal, not for mutation.

Each element gets a document-order index (``order``) assigned during tree
construction; the selector engine relies on it for Sizzle positional pseudos
(:eq/:first/:last — SURVEY.md §2.1 G5) and stable result ordering.
"""

from __future__ import annotations


class Text:
    """A text node. ``data`` is already entity-decoded by the tokenizer."""

    __slots__ = ("data", "parent")

    def __init__(self, data: str, parent: "Element | None" = None) -> None:
        self.data = data
        self.parent = parent

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Text({self.data!r})"


class Element:
    """An element node: tag, attrs, ordered children (Element | Text)."""

    __slots__ = ("tag", "attrs", "children", "parent", "order", "_classes", "_open", "_chars", "_link")

    def __init__(
        self,
        tag: str,
        attrs: dict[str, str] | None = None,
        parent: "Element | None" = None,
    ) -> None:
        self.tag = tag
        self.attrs: dict[str, str] = attrs or {}
        self.children: list[Element | Text] = []
        self.parent = parent
        self.order = -1  # assigned by the tree builder (document order)
        self._classes: frozenset[str] | None = None
        self._open = False  # on the tree builder's open-element stack?
        self._chars = -1  # subtree text chars (boilerplate pass; -1 = unset)
        self._link = -1   # subtree link-text chars

    # -- structure ---------------------------------------------------------
    def append(self, node: "Element | Text") -> None:
        node.parent = self
        self.children.append(node)

    def child_elements(self) -> list["Element"]:
        return [c for c in self.children if isinstance(c, Element)]

    def iter_elements(self):
        """Yield descendant elements in document order (self excluded)."""
        stack = [c for c in reversed(self.children) if isinstance(c, Element)]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(
                c for c in reversed(node.children) if isinstance(c, Element)
            )

    # -- content -----------------------------------------------------------
    def text(self) -> str:
        """Concatenated descendant text — the DOM ``textContent`` the
        reference's simple rules extract (SURVEY.md §2.1 G1)."""
        parts: list[str] = []
        stack: list[Element | Text] = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, Text):
                parts.append(node.data)
            else:
                stack.extend(reversed(node.children))
        return "".join(parts)

    def attr(self, name: str) -> str | None:
        return self.attrs.get(name)

    @property
    def classes(self) -> frozenset[str]:
        if self._classes is None:
            self._classes = frozenset(self.attrs.get("class", "").split())
        return self._classes

    @property
    def id(self) -> str | None:
        return self.attrs.get("id")

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        a = "".join(f" {k}={v!r}" for k, v in self.attrs.items())
        return f"<{self.tag}{a} #{self.order}>"


class Document(Element):
    """Root node. ``tag`` is the synthetic ``#document``; the ``<html>``
    element (always present after tree building) is its single child."""

    __slots__ = ()

    def __init__(self) -> None:
        super().__init__("#document")
        self.order = 0
