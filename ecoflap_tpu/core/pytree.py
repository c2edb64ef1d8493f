"""Named-pytree utilities.

The reference addresses weights through ``model.named_parameters()`` strings
("t5_model.encoder.block.3.layer.0.SelfAttention.q.weight"). In the rebuild,
params are nested dicts of jax arrays; these helpers give the same name-keyed
view plus functional surgery (get/set/update single leaves without touching
the rest of the tree), replacing the reference's in-place ``param.data``
mutation (e.g. layer_single_base_pruner.py:484-486).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Tuple

import jax

PyTree = Any


def flatten_named(tree: PyTree, sep: str = ".") -> Dict[str, jax.Array]:
    """Flatten a nested dict/list pytree into {'a.b.0.c': leaf}."""
    out: Dict[str, Any] = {}

    def walk(node: Any, prefix: str) -> None:
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}{sep}{k}" if prefix else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}{sep}{i}" if prefix else str(i))
        else:
            out[prefix] = node

    walk(tree, "")
    return out


def iter_named(tree: PyTree, sep: str = ".") -> Iterator[Tuple[str, jax.Array]]:
    yield from flatten_named(tree, sep).items()


def get_leaf(tree: PyTree, name: str, sep: str = ".") -> Any:
    node = tree
    for part in name.split(sep):
        if isinstance(node, dict):
            node = node[part]
        else:
            node = node[int(part)]
    return node


def set_leaf(tree: PyTree, name: str, value: Any, sep: str = ".") -> PyTree:
    """Functionally replace one leaf, copying only the spine."""
    parts = name.split(sep)

    def rebuild(node: Any, idx: int) -> Any:
        if idx == len(parts):
            return value
        key = parts[idx]
        if isinstance(node, dict):
            new = dict(node)
            new[key] = rebuild(node[key], idx + 1)
            return new
        i = int(key)
        seq = list(node)
        seq[i] = rebuild(seq[i], idx + 1)
        return type(node)(seq) if isinstance(node, tuple) else seq

    return rebuild(tree, 0)


def update_leaf(
    tree: PyTree, name: str, fn: Callable[[Any], Any], sep: str = "."
) -> PyTree:
    return set_leaf(tree, name, fn(get_leaf(tree, name, sep)), sep)


def set_leaf_mutate(tree: PyTree, name: str, value: Any, sep: str = ".") -> None:
    """MUTATE the container holding the leaf (no spine copy).

    Deliberately impure: used by the donated in-place MeZO perturbation,
    where every live reference to the tree (e.g. ``adapter.params``) must see
    the replacement array because the old buffer was donated."""
    parts = name.split(sep)
    node = tree
    for part in parts[:-1]:
        node = node[part] if isinstance(node, dict) else node[int(part)]
    last = parts[-1]
    if isinstance(node, dict):
        node[last] = value
    else:
        node[int(last)] = value


def tree_size(tree: PyTree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
