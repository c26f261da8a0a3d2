"""Config/IO helpers (reference tools/io.py:1-20)."""

from __future__ import annotations

import os
from types import SimpleNamespace


class Namespace(SimpleNamespace):
    """Attribute-style config node.

    Hash/eq by identity so configs can live as attributes of (frozen,
    comparable) flax modules and as jit static arguments without requiring
    every leaf to be hashable.
    """

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def makedirs(dirname: str) -> None:
    if not os.path.exists(dirname):
        os.makedirs(dirname, exist_ok=True)


def dict2namespace(config):
    """Recursively convert a dict (from YAML) into attribute-style namespaces.

    Same contract as the reference's `dict2namespace` (tools/io.py:13-20).
    """
    namespace = Namespace()
    for key, value in config.items():
        if isinstance(value, dict):
            new_value = dict2namespace(value)
        else:
            new_value = value
        setattr(namespace, key, new_value)
    return namespace


def namespace2dict(ns):
    """Inverse of dict2namespace (for embedding cfg into checkpoints)."""
    out = {}
    for key, value in vars(ns).items():
        if isinstance(value, SimpleNamespace):
            out[key] = namespace2dict(value)
        else:
            out[key] = value
    return out
