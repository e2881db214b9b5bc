"""Shared CLI helpers."""

import ast


def parse_overrides(pairs):
    """['a.b=1', 'c=x'] -> {'a.b': 1, 'c': 'x'} (literals parsed when
    possible) for ``get_config(preset, **overrides)``."""
    overrides = {}
    for kv in pairs or []:
        k, v = kv.split('=', 1)
        try:
            overrides[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            overrides[k] = v
    return overrides
