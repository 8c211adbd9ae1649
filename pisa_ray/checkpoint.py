"""Per-partition lineage manifest + resume pruning.

The reference resumes at three levels with skip-if-exists checks
(corpus pickle /root/reference/src/main.py:82-88, adjacency cache
/root/reference/src/models/Dataloader.py:127-132, per-snapshot model
checkpoints /root/reference/src/helpers/Runner.py:115-137). This module
makes that pattern explicit: one JSON manifest per index directory,
with a status + metrics entry per (stage, partition). ``build_index``
prunes completed partitions before constructing the Ray pipeline, so a
killed run restarts only the unfinished work and re-produces
byte-identical outputs (all encoders are pure functions of partition
content — no timestamps inside blobs).

Writes are atomic (tmp file + ``os.replace``).
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any


class Manifest:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.path = os.path.join(index_dir, "manifest.json")
        self.data: dict[str, Any] = {"stages": {}, "config": {}, "stats": {}}
        # concurrent lineage-group jobs mark partitions from threads;
        # serialize mutate+persist so the tmp-file swap never races.
        # RLock: save() locks too (a bare save() concurrent with a
        # mark_* used to race on self.data and the shared .tmp path),
        # and mark_* call save() while already holding the lock
        self._lock = threading.RLock()
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data = json.load(f)

    # -- partitions ------------------------------------------------------
    def partition_done(self, stage: str, part: str) -> bool:
        return (
            self.data["stages"].get(stage, {}).get("partitions", {}).get(part, {})
        ).get("status") == "done"

    def mark_partition(self, stage: str, part: str, **metrics: Any) -> None:
        with self._lock:
            st = self.data["stages"].setdefault(stage, {"partitions": {}})
            st["partitions"][part] = {"status": "done", **metrics}
            self.save()

    def stage_done(self, stage: str) -> bool:
        return self.data["stages"].get(stage, {}).get("status") == "done"

    def mark_stage(self, stage: str, **metrics: Any) -> None:
        with self._lock:
            st = self.data["stages"].setdefault(stage, {"partitions": {}})
            st["status"] = "done"
            st.update(metrics)
            self.save()

    # -- persistence -----------------------------------------------------
    def save(self) -> None:
        with self._lock:  # RLock: safe when a mark_* already holds it
            os.makedirs(self.index_dir, exist_ok=True)
            tmp = self.path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self.data, f, indent=1, sort_keys=True)
            os.replace(tmp, self.path)


class StageTimer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def elapsed(self) -> float:
        return round(time.perf_counter() - self.t0, 4)
