"""Pin the rotation-safety invariant (VERDICT r4 item 2).

The driver's correctness harness checks only the first 50 ``queries()``
entries; ``__spark_entry__._BACK`` rotates long-green veterans past that
window on the builder's CLAIM that their implementation is untouched since
their last driver-green row.  This tool makes that claim mechanical:

    python tools/pin_rotation.py          # regenerate tools/rotation_hashes.json

For every registry query NOT in ``_FRONT`` (i.e. everything that may sit
outside the driver window this round) it records
``sha256(inspect.getsource(query_fn) + oracle_sql)``.
``tests/test_query_oracles.py::test_rotation_hashes`` asserts the live
source still matches — so editing a rotated-out query without moving it to
``_FRONT`` (and thus back under driver eyes) fails the suite instead of
going driver-unseen for a round.

Run this ONLY at rotation time, immediately after updating ``_FRONT`` /
``_BACK``, while every non-front query is at its last driver-green revision.
"""

from __future__ import annotations

import hashlib
import importlib.util
import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tools", "rotation_hashes.json")


def query_hash(fn, oracle: str) -> str:
    src = inspect.getsource(fn)
    return hashlib.sha256((src + "\n---oracle---\n" + oracle).encode()).hexdigest()


def compute(entry_mod=None) -> dict[str, str]:
    if entry_mod is None:
        spec = importlib.util.spec_from_file_location(
            "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
        )
        entry_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry_mod)
    sys.path.insert(0, REPO)
    from warps_nutch_spark.queries import ORACLES, QUERIES

    front = set(entry_mod._FRONT)
    out = {}
    for name, fn in QUERIES.items():
        if name in front:
            continue
        out[name] = query_hash(fn, ORACLES.get(name, ""))
    return dict(sorted(out.items()))


if __name__ == "__main__":
    hashes = compute()
    with open(OUT, "w") as f:
        json.dump(hashes, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"pinned {len(hashes)} rotated-out queries -> {OUT}")
