"""Regenerate STAMP_HASHES.json: per-query content hash at stamp time.

The driver's green stamp in CORRECTNESS_r{N}.json certifies the code
that was committed when round N ended.  If a later round edits a
stamped query's implementation or oracle, the stamp is stale — but the
vintage rotation in registry.py would not re-check it for ~4 rounds
(VERDICT r9 "What's wrong #1": seven queries hit exactly this).  This
sidecar closes the hole: it records, for every green-stamped query,
the content hash (registry.content_hash: fn source + oracle) the stamp
verified; registry._changed_since_stamp fronts any query whose current
hash differs.

RUN THIS FIRST THING EACH ROUND — before editing any query — so the
hash recorded for newly-stamped queries is computed on the exact code
the driver just verified.  (The driver stamps the round's final commit;
at round start nothing has diverged yet.)

Usage:
  python scripts/stamp_hashes.py                 # update from stamps
  python scripts/stamp_hashes.py --invalidate a,b  # then drop entries
                                                   # (forces a re-front
                                                   # for known-stale
                                                   # stamps)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    from spark_lever_spark import registry
    from spark_lever_spark.registry import _load_driver_checks, content_hash

    last_green, _ = _load_driver_checks(ROOT)
    path = ROOT / "STAMP_HASHES.json"
    try:
        recorded = json.loads(path.read_text())
        assert isinstance(recorded, dict)
    except (OSError, ValueError, AssertionError):
        recorded = {}

    qs = registry.all_queries()
    out: dict[str, dict] = {}
    updated = 0
    for name, q in qs.items():
        rnd = last_green.get(name, 0)
        if rnd == 0:
            continue  # never green-stamped: nothing to certify yet
        prev = recorded.get(name)
        if isinstance(prev, dict) and prev.get("round", -1) >= rnd:
            out[name] = prev  # stamp unchanged since last record
        else:
            out[name] = {"round": rnd, "hash": content_hash(q)}
            updated += 1

    invalidated = []
    for arg in sys.argv[1:]:
        if arg.startswith("--invalidate"):
            names = arg.split("=", 1)[1] if "=" in arg else sys.argv[
                sys.argv.index(arg) + 1
            ]
            for n in names.split(","):
                if out.pop(n.strip(), None) is not None:
                    invalidated.append(n.strip())

    path.write_text(
        json.dumps(dict(sorted(out.items())), indent=0, sort_keys=True) + "\n"
    )
    print(
        f"STAMP_HASHES.json: {len(out)} entries ({updated} updated, "
        f"{len(invalidated)} invalidated: {invalidated or '—'})"
    )


if __name__ == "__main__":
    main()
