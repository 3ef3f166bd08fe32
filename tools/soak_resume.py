#!/usr/bin/env python
"""Crash-resume soak for the sharded pyramid pipeline (north rule:
resumable from checkpoint with per-partition lineage): run the SAME
sharded slice twice — once to completion (control), once SIGKILLed
mid-run and then resumed with --resume — and require

1. the kill really landed mid-run (0 < completed shard markers < n),
2. the resume SKIPPED every completed shard (their lineage markers are
   byte-identical across the crash boundary, not rewritten),
3. the resumed pyramid's full tile table is EXACTLY equal to the
   control run's (same rows, same bytes, shard by shard).

    python tools/soak_resume.py [--n-docs 64000] [--shards 8]

Each child CLI process owns its own local Ray cluster; the kill is a
process-group SIGKILL so the raylet dies with the driver (a real crash,
not a graceful shutdown). Prints ONE JSON line; record in BASELINE.md.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _slice_cmd(corpus: str, out: str, shards: int, resume: bool = False):
    cmd = [sys.executable, "-m", "geojson_vt_ray", "slice",
           "--input", corpus, "--out", out, "--shards", str(shards),
           "--index-max-points", "0", "--index-max-zoom", "4",
           "--max-zoom", "8"]
    if resume:
        cmd.append("--resume")
    return cmd


def _run(cmd) -> float:
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                       timeout=1800)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-4000:])
        raise RuntimeError(f"command failed: {' '.join(cmd)}")
    return time.time() - t0


def _markers(out: str) -> dict:
    d = os.path.join(out, "shards")
    if not os.path.isdir(d):
        return {}
    res = {}
    for f in os.listdir(d):
        if f.endswith(".json"):
            with open(os.path.join(d, f), "rb") as fh:
                res[f] = hashlib.md5(fh.read()).hexdigest()
    return res


def _table_digest(out: str) -> tuple:
    """Order-independent digest of the full tile store (all columns,
    hive partition values included)."""
    import pyarrow.dataset as pds
    t = pds.dataset(os.path.join(out, "combined"),
                    format="parquet", partitioning="hive").to_table()
    df = t.to_pandas()
    cols = sorted(df.columns)
    rows = sorted(
        "\x1f".join(str(v) for v in rec)
        for rec in df[cols].itertuples(index=False, name=None))
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode("utf-8", "surrogatepass"))
    return len(rows), h.hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=64_000)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--kill-frac", type=float, default=0.45)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="soak_resume_", dir="/tmp")
    out: dict = {"n_docs": args.n_docs, "shards": args.shards}
    try:
        from geojson_vt_ray.sources.docs import (synthesize_corpus,
                                                 write_corpus)
        import ray
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
        corpus = write_corpus(synthesize_corpus(args.n_docs),
                              os.path.join(tmp, "corpus"))
        ray.shutdown()

        ctl = os.path.join(tmp, "A")
        out["t_control_sec"] = round(
            _run(_slice_cmd(corpus, ctl, args.shards)), 1)

        # crash run: SIGKILL the whole process group mid-run
        crash = os.path.join(tmp, "B")
        proc = subprocess.Popen(
            _slice_cmd(corpus, crash, args.shards), cwd=REPO,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True)
        time.sleep(args.kill_frac * out["t_control_sec"])
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
        before = _markers(crash)
        out["markers_at_kill"] = len(before)
        out["kill_mid_run"] = 0 < len(before) < args.shards

        t0 = time.time()
        _run(_slice_cmd(corpus, crash, args.shards, resume=True))
        out["t_resume_sec"] = round(time.time() - t0, 1)
        after = _markers(crash)
        out["markers_after_resume"] = len(after)
        out["completed_preserved"] = all(
            after.get(k) == v for k, v in before.items())

        rows_a, dig_a = _table_digest(ctl)
        rows_b, dig_b = _table_digest(crash)
        out["rows"] = rows_a
        out["tables_equal"] = bool(rows_a == rows_b and dig_a == dig_b)
        out["ok"] = bool(out["kill_mid_run"]
                         and out["completed_preserved"]
                         and out["markers_after_resume"] == args.shards
                         and out["tables_equal"])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    sys.exit(0 if out.get("ok") else 1)


if __name__ == "__main__":
    main()
