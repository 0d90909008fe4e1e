"""Clamped env-knob parsing for driver-dispatch caps (VERDICT r14 task 5).

The driver-side dispatch caps (connected-components edge cap, BPE vocab
cap, LSH bucket-population cap) are env-tunable so cluster deployments
can resize or disable them — but ``int(os.environ[...])`` with no bound
lets a fat-fingered value re-create the exact guide-§5 driver-collect
hazard the default exists to avoid (a 2^31 edge cap authorizes a
corpus-sized ``collect``). ``env_capped_int`` parses the knob and clamps
it into ``[0, ceiling]``; each call site documents the per-unit memory
math that sizes its ceiling. Semantics preserved from round 14:

- unset  -> default (dispatch on, conservative cap)
- ``0``  -> disables the driver/guard dispatch (the distributed path)
- >ceiling, negative, or non-integer -> clamped to ceiling / treated as
  the default rather than crashing a query path (a malformed env var
  must degrade to the safe documented behavior, not take the suite
  down).
"""

from __future__ import annotations

import os


def env_capped_int(name: str, default: int, ceiling: int) -> int:
    """Parse ``$name`` as an int clamped to ``[0, ceiling]``.

    Returns ``default`` when unset or unparseable/negative; values
    above ``ceiling`` come back as ``ceiling`` (the documented
    driver-memory bound), never the raw value.
    """
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        val = int(raw)
    except ValueError:
        return default
    if val < 0:
        return default
    return min(val, ceiling)
