"""Driver-window rotation policy gate (VERDICT r3 item 5).

The correctness driver only hard-checks the FIRST 50 entries of
``queries()`` each round. This gate makes the rotation discipline
structural: every entry must either

* already be green in some recorded ``CORRECTNESS_r*.json`` (the hard
  driver signal has seen it), or
* sit inside the current first-50 window (it WILL be hard-checked this
  round).

A new entry landing outside the window with no driver-green record
fails this test — the silent-tail problem cannot recur. No Spark
session needed; this parses the entry-point source and the recorded
driver artifacts only.
"""

import json
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent
DRIVER_WINDOW = 50


def _entry_keys() -> list[str]:
    src = (REPO / "__spark_entry__.py").read_text()
    body = src[src.index("def queries()"):]
    body = body[:body.index("def oracle_sql")]
    keys = re.findall(r'^\s+"([a-z0-9_]+)": ([a-z0-9_]+),', body, re.M)
    assert keys, "could not parse queries() dict"
    for k, v in keys:
        assert k == v, f"queries() key {k!r} bound to {v!r}"
    return [k for k, _ in keys]


def _driver_green() -> set[str]:
    green: set[str] = set()
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for k, v in json.loads(p.read_text()).items():
            if not isinstance(v, dict) or v.get("err") is not None:
                continue
            if v.get("hash_match") or (v.get("rows_match")
                                       and v.get("schema_match")):
                green.add(k)
    return green


def _rotation_queue() -> list[str]:
    """The tracked queue (VERDICT r3 item 5's allowance): tail entries
    awaiting their window round, local-gate-checked meanwhile."""
    import ast

    src = (REPO / "__spark_entry__.py").read_text()
    m = re.search(r"^ROTATION_QUEUE: list\[str\] = (\[[^\]]*\])", src,
                  re.M | re.S)
    assert m, "ROTATION_QUEUE literal missing from __spark_entry__.py"
    q = ast.literal_eval(m.group(1))
    assert isinstance(q, list) and all(isinstance(k, str) for k in q)
    return q


def test_every_entry_is_driver_green_in_window_or_queued():
    keys = _entry_keys()
    green = _driver_green()
    window = set(keys[:DRIVER_WINDOW])
    queued = set(_rotation_queue())
    orphans = [k for k in keys
               if k not in green and k not in window and k not in queued]
    assert not orphans, (
        f"{len(orphans)} queries() entries have never been driver-checked, "
        f"sit outside the first-{DRIVER_WINDOW} window, AND are not in "
        f"ROTATION_QUEUE: {orphans} — rotate them into the window or add "
        "them to the tracked queue with the local gate green")
    # the queue must not be a dumping ground: queued keys must exist,
    # must not shadow window slots, and must clear once driver-green
    stale = [k for k in queued if k in green]
    assert not stale, f"ROTATION_QUEUE entries already driver-green: {stale}"
    missing = [k for k in queued if k not in keys]
    assert not missing, f"ROTATION_QUEUE names unknown entries: {missing}"
    shadowing = [k for k in queued if k in window]
    assert not shadowing, (
        f"ROTATION_QUEUE entries already sit in the window: {shadowing}")


def test_no_duplicate_entry_keys():
    keys = _entry_keys()
    assert len(keys) == len(set(keys))
