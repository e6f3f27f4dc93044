"""Crawl state + checkpointed resume (reference src/StateManager.ts:6-69).

The reference persists {seq, bootstrapDone, bootstrapLastId, stage} in
Algolia index settings; we persist one JSON row per committed generation in
a SnapTable, carrying the snapshot ids of every sibling table plus
per-generation metrics and per-partition lineage. Resume = read the last
state row, roll every table back to its recorded snapshot (time travel),
and continue — a crash between table commits can therefore never produce a
half-applied generation (exactly-once resume, SURVEY.md §7 hard-part 4).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from typing import Any


@dataclass
class CrawlState:
    generation: int = 0
    seq: int = 0
    stage: str = "bootstrap"  # bootstrap | watch
    bootstrap_done: bool = False
    bootstrap_last_done: int = 0  # epoch ms of the last finalized bootstrap
                                  # (reference State.bootstrapLastDone)
    snapshots: dict[str, int] = field(default_factory=dict)  # table -> snapshot id
    metrics: dict[str, Any] = field(default_factory=dict)
    host_pauses: dict[str, float] = field(default_factory=dict)  # 429 pauses (T5)
    # per-host (priority_min, priority_max) carried across generations so a
    # steady-state crawl skips the histogram scheduler's per-host stats job
    # (stale bounds stay exact — see _schedule_histogram_topk); JSON turns
    # the tuples into lists, Crawl.resume() normalizes them back
    hist_hints: dict[str, Any] = field(default_factory=dict)


class StateStore:
    """Tiny JSON-file state log with atomic commit (os.replace), mirroring
    SnapTable's commit discipline. One file per generation + _current
    pointer."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def save(self, state: CrawlState) -> None:
        path = os.path.join(self.root, f"gen-{state.generation:06d}.json")
        with open(path, "w") as f:
            json.dump(asdict(state), f)
        tmp = os.path.join(self.root, "_current.tmp")
        with open(tmp, "w") as f:
            f.write(os.path.basename(path))
        os.replace(tmp, os.path.join(self.root, "_current"))

    def load(self) -> CrawlState | None:
        try:
            with open(os.path.join(self.root, "_current")) as f:
                name = f.read().strip()
            with open(os.path.join(self.root, name)) as f:
                return CrawlState(**json.load(f))
        except FileNotFoundError:
            return None

    def history(self) -> list[CrawlState]:
        out = []
        for name in sorted(os.listdir(self.root)):
            if name.startswith("gen-") and name.endswith(".json"):
                with open(os.path.join(self.root, name)) as f:
                    out.append(CrawlState(**json.load(f)))
        return out
