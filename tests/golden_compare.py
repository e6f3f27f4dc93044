"""Comparator between our fixed-schema records and the reference's jest
golden snapshots (pretty-format parsed to JSON by scripts/extract_snapshots.py).

Bridges representational differences that are schema choices, not semantic
ones: JS undefined/NaN <-> null, union-typed fields flattened to fixed
columns (deprecated, types, originalAuthor), optional struct keys."""

from __future__ import annotations

import json
from typing import Any

VOLATILE = {"rev", "lastCrawl", "_revision"}


def _is_any(g: Any) -> bool:
    return isinstance(g, str) and g.startswith("__JEST__:Any<")


def _is_nullish(g: Any) -> bool:
    return g is None or g in ("__JEST__:undefined", "__JEST__:NaN")


def diff(golden: Any, ours: Any, path: str = "") -> list[str]:
    """Return a list of human-readable mismatches (empty = parity)."""
    errs: list[str] = []

    def rec(g: Any, o: Any, p: str) -> None:
        if _is_any(g):
            if o is None:
                errs.append(f"{p}: expected any value, got null")
            return
        if _is_nullish(g):
            if not (o is None or o == {} ):
                errs.append(f"{p}: expected null/undefined, got {o!r}")
            return
        # deprecated: golden False | string ; ours 'false' | string
        if p.endswith(".deprecated"):
            want = "false" if g is False else ("true" if g is True else g)
            if o != want:
                errs.append(f"{p}: {want!r} != {o!r}")
            return
        # types: golden {'ts': {'possible': True}} | {'ts': 'included'} ...
        if p.endswith(".types") and isinstance(g, dict):
            ts = g.get("ts")
            want_ts = "possible" if isinstance(ts, dict) else ("false" if ts is False else ts)
            got_ts = (o or {}).get("ts")
            if got_ts != want_ts:
                errs.append(f"{p}.ts: {want_ts!r} != {got_ts!r}")
            want_dt = g.get("definitelyTyped")
            got_dt = (o or {}).get("definitelyTyped")
            if want_dt != got_dt and not (_is_nullish(want_dt) and got_dt is None):
                errs.append(f"{p}.definitelyTyped: {want_dt!r} != {got_dt!r}")
            return
        # originalAuthor: ours is a JSON string
        if p.endswith(".originalAuthor"):
            got = json.loads(o) if isinstance(o, str) else o
            rec_plain(g, got, p)
            return
        rec_plain(g, o, p)

    def rec_plain(g: Any, o: Any, p: str) -> None:
        if _is_any(g):
            return
        if _is_nullish(g):
            if o is not None:
                errs.append(f"{p}: expected null, got {o!r}")
            return
        if isinstance(g, dict):
            if not isinstance(o, dict):
                errs.append(f"{p}: expected object, got {o!r}")
                return
            for k, gv in g.items():
                rec(gv, o.get(k), f"{p}.{k}")
            for k in o:
                if k not in g and o[k] is not None and o[k] != [] and k != "email":
                    errs.append(f"{p}.{k}: unexpected extra value {o[k]!r}")
            return
        if isinstance(g, list):
            if not isinstance(o, list):
                errs.append(f"{p}: expected array, got {o!r}")
                return
            if len(g) != len(o):
                errs.append(f"{p}: length {len(g)} != {len(o)} ({g!r} vs {o!r})")
                return
            for i, (gv, ov) in enumerate(zip(g, o)):
                rec(gv, ov, f"{p}[{i}]")
            return
        if isinstance(g, bool) or isinstance(o, bool):
            if bool(g) != bool(o) or (not isinstance(o, bool)):
                if g != o:
                    errs.append(f"{p}: {g!r} != {o!r}")
            return
        if isinstance(g, (int, float)) and isinstance(o, (int, float)):
            if float(g) != float(o):
                errs.append(f"{p}: {g!r} != {o!r}")
            return
        if g != o:
            errs.append(f"{p}: {g!r} != {o!r}")

    rec(golden, ours, path or "$")
    return errs


def assert_parity(golden: dict, ours: dict, skip: set[str] = VOLATILE) -> None:
    g = {k: v for k, v in golden.items() if k not in skip}
    o = {k: v for k, v in (ours or {}).items() if k not in skip and k != "doc_id"}
    errs = diff(g, o)
    assert not errs, "golden mismatches:\n" + "\n".join(errs[:40])
