"""Operator modules. Import the submodules directly; the package namespace
deliberately re-exports nothing so module names (hash_join, filter, ...)
are never shadowed by same-named functions."""

from tpujoin.ops import aggregate, filter, hash_join, nested_loop_join, radix, sort

__all__ = ["aggregate", "filter", "hash_join", "nested_loop_join", "radix", "sort"]
