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


def test_every_entry_is_driver_green_or_in_window():
    keys = _entry_keys()
    green = _driver_green()
    window = set(keys[:DRIVER_WINDOW])
    orphans = [k for k in keys if k not in green and k not in window]
    assert not orphans, (
        f"{len(orphans)} queries() entries have never been driver-checked "
        f"AND sit outside the first-{DRIVER_WINDOW} window: {orphans} — "
        "rotate them into the window (rotate out entries that are green "
        "in a CORRECTNESS_r*.json)")


def test_no_duplicate_entry_keys():
    keys = _entry_keys()
    assert len(keys) == len(set(keys))
