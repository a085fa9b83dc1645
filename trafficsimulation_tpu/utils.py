"""Small host-side utilities.

`assert_flow_mask` / `interactive_check` mirror the reference's only
test-like artifact (`test_flow_mask.py:6-38`): hand-verification of the
direction bitmask at a given cell.
"""

from __future__ import annotations

import numpy as np

from . import codes as C


def flow_at(allowed_dirs, x: int, y: int) -> set:
    """Set of direction names allowed at (x, y)."""
    bits = int(np.asarray(allowed_dirs)[y, x])
    return {C.DIR_NAMES[d] for d in range(4) if bits & (1 << d)}


def assert_flow_mask(allowed_dirs, x: int, y: int, direction: str,
                     expected: bool):
    """Raise AssertionError when the arrow presence at (x, y) does not
    match `expected` (reference `assert_flow_mask`,
    `test_flow_mask.py:6-14`)."""
    got = direction.upper() in flow_at(allowed_dirs, x, y)
    assert got == expected, (
        f"flow mask at ({x},{y}) {direction}: got {got}, "
        f"expected {expected}; mask = {sorted(flow_at(allowed_dirs, x, y))}")


def interactive_check(allowed_dirs):
    """REPL loop for poking at the direction mask
    (reference `interactive_check`, `test_flow_mask.py:16-38`)."""
    print("enter: x y [dir]   (empty line quits)")
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line:
            break
        parts = line.split()
        x, y = int(parts[0]), int(parts[1])
        if len(parts) > 2:
            print(parts[2].upper() in flow_at(allowed_dirs, x, y))
        else:
            print(sorted(flow_at(allowed_dirs, x, y)))


def str_to_unique_int(s: str) -> int:
    """Stable integer id from a string (reference `general.py:12-14`)."""
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
