"""Shared helpers for the bench tools — load gating, zip packaging,
and flag parsing. One copy, so a change to the gate poll interval or
zip contents cannot silently diverge between tools."""

from __future__ import annotations

import os
import time
import zipfile


def load1() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def wait_idle(gate: float | None, timeout_s: int = 1800) -> float:
    """Poll until the 1-min load drops under ``gate`` (or timeout);
    returns the load seen last. Waiting happens BETWEEN legs, where it
    is free — this is what turns a burst from a lost session into a
    delayed leg."""
    load = load1()
    if gate is None:
        return load
    t0 = time.time()
    while load >= gate and time.time() - t0 < timeout_s:
        time.sleep(15)
        load = load1()
    return load


def build_zip(repo: str, path: str) -> None:
    """Package deduper_spark/*.py exactly as a cluster deploy would
    (the same layout tests/test_spark_submit.py exercises)."""
    pkg = os.path.join(repo, "deduper_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, repo))


def positional_n(argv: list[str], default: int) -> int:
    """First positional arg as n if it is a number, else default."""
    return int(argv[1]) if len(argv) > 1 and argv[1].isdigit() else default


def flag_args(argv: list[str]) -> list[str]:
    """Every arg that can carry a flag — INCLUDING argv[1] when the
    positional n was omitted (scanning argv[2:] unconditionally would
    silently drop the first flag, e.g. an ungated session recorded as
    gated)."""
    start = 2 if len(argv) > 1 and argv[1].isdigit() else 1
    return argv[start:]


def flag_value(arg: str) -> str:
    """Value after the first '=' only — paths may contain '='."""
    return arg.split("=", 1)[1]
