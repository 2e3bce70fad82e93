"""Lineage manifest + atomic publish (W5/C3/S4 analogs, SURVEY §2.6-2.7).

The reference publishes atomically by renaming temp→prod tables inside a
serializable transaction (``/root/reference/src/storage/database_sink.rs:258-284``)
and keeps a ZIP cache for per-item recovery (``src/main.rs:262-266``).
The Parquet equivalent:

- every round writes under ``<run_dir>/staging/...`` and then records a
  round entry (inputs, outputs, counts, seen-set snapshot path) via an
  atomic ``os.replace`` of ``rounds/round_<r>.json`` — the C3
  all-or-nothing per-partition commit flag;
- ``finalize()`` writes ``MANIFEST.json`` with one atomic rename — the
  single publish point readers trust (a crashed run leaves the previous
  manifest untouched, like prod tables during a crashed harvest);
- ``last_complete_round()`` drives resume: a restarted run replays from
  the first uncommitted round, restoring the seen-set from the last
  snapshot instead of rebuilding from scratch.
"""

from __future__ import annotations

import json
import os
from typing import Any


class RunManifest:
    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        self.staging = os.path.join(run_dir, "staging")
        self.rounds_dir = os.path.join(self.staging, "rounds")
        os.makedirs(self.rounds_dir, exist_ok=True)

    # -- per-round lineage ------------------------------------------------
    def round_path(self, rnd: int) -> str:
        return os.path.join(self.rounds_dir, f"round_{rnd:05d}.json")

    def commit_round(self, rnd: int, info: dict[str, Any]) -> None:
        """All-or-nothing round commit: the entry appears only after every
        output in ``info`` is fully written."""
        payload = {"round": rnd, "status": "complete", **info}
        tmp = self.round_path(rnd) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.round_path(rnd))

    def round_info(self, rnd: int) -> dict[str, Any] | None:
        p = self.round_path(rnd)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def last_complete_round(self) -> int:
        """Highest round with a committed entry, or -1."""
        best = -1
        if os.path.isdir(self.rounds_dir):
            for name in os.listdir(self.rounds_dir):
                if name.startswith("round_") and name.endswith(".json"):
                    best = max(best, int(name[6:11]))
        return best

    # -- atomic publish ----------------------------------------------------
    @property
    def manifest_path(self) -> str:
        return os.path.join(self.run_dir, "MANIFEST.json")

    def finalize(self, tables: dict[str, str], metrics: dict[str, Any]) -> None:
        rounds = [
            self.round_info(r) for r in range(self.last_complete_round() + 1)
        ]
        payload = {
            "status": "published",
            "tables": tables,
            "metrics": metrics,
            "rounds": rounds,
        }
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.manifest_path)

    def published(self) -> dict[str, Any] | None:
        if not os.path.exists(self.manifest_path):
            return None
        with open(self.manifest_path) as fh:
            return json.load(fh)
