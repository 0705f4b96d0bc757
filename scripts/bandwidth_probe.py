#!/usr/bin/env python
"""Hardware-ceiling probe for the scaling evidence (BENCH/BASELINE.md).

Runs the engine's EXACT hot kernel (the in-place rounded-haversine
candidate scan of operators/nearest_arrow.py) completely outside
Spark — P independent OS processes, each on its own private data,
zero shared state, zero coordination — and reports aggregate
throughput at P = 2, 8, 32.

If pure processes show the same sub-linear 8 -> 32 step as the Spark
job, the ceiling is the single socket's shared memory bandwidth /
turbo budget, not the Spark plan (no shuffle, no driver work, no
Python-worker overhead exists here at all). On a real cluster each
executor host brings its own socket, which is why the 2 -> 8 step
(private-bandwidth regime) is the faithful N -> 4N analog.

Usage: python scripts/bandwidth_probe.py [--pairs 4000000] [--reps 3]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np

PROCS = (1, 2, 8, 32)


def _tune_malloc() -> None:
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 512 * 1024 * 1024)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 512 * 1024 * 1024)  # M_TRIM_THRESHOLD
    except Exception:
        pass


def _make_inputs(n_pairs: int, seed: int) -> tuple:
    rng = np.random.default_rng(seed)
    n_cities = 60_000
    rad_lat_c = rng.uniform(-1.5, 1.5, n_cities)
    rad_lon_c = rng.uniform(-3.1, 3.1, n_cities)
    cos_lat_c = np.cos(rad_lat_c)
    flat = rng.integers(0, n_cities, n_pairs)
    pt_rad_lat = rng.uniform(-1.5, 1.5, n_pairs)
    pt_rad_lon = rng.uniform(-3.1, 3.1, n_pairs)
    pt_cos = np.cos(pt_rad_lat)
    return rad_lat_c, rad_lon_c, cos_lat_c, flat, pt_rad_lat, pt_rad_lon, pt_cos


def _kernel_once(inputs: tuple) -> None:
    """One pass of the candidate-scan haversine (same op mix and
    memory-traffic pattern as _hav_pairs_rounded: fancy-gather, in-place
    trig, rounding). Inputs pre-generated; only the kernel is timed."""
    rad_lat_c, rad_lon_c, cos_lat_c, flat, pt_rad_lat, pt_rad_lon, pt_cos = inputs
    s1 = rad_lat_c[flat]
    s1 -= pt_rad_lat
    s1 *= 0.5
    np.sin(s1, out=s1)
    s1 *= s1
    s2 = rad_lon_c[flat]
    s2 -= pt_rad_lon
    s2 *= 0.5
    np.sin(s2, out=s2)
    s2 *= s2
    s2 *= cos_lat_c[flat]
    s2 *= pt_cos
    s1 += s2
    np.subtract(1.0, s1, out=s2)
    np.maximum(s2, 0.0, out=s2)
    np.sqrt(s2, out=s2)
    np.sqrt(s1, out=s1)
    np.arctan2(s1, s2, out=s1)
    s1 *= 2.0 * 6371.0
    s1 *= 10000.0
    s1 += 0.5
    np.floor(s1, out=s1)
    s1 /= 10000.0


def _worker(n_pairs: int, reps: int, seed: int, q: mp.Queue, go) -> None:
    _tune_malloc()
    inputs = _make_inputs(n_pairs, seed)
    _kernel_once(inputs)  # per-process warmup (page-in, code paths)
    go.wait()  # barrier: all workers' timed windows start together
    t0 = time.perf_counter()
    for _ in range(reps):
        _kernel_once(inputs)
    q.put(time.perf_counter() - t0)


def run_level(procs: int, n_pairs: int, reps: int) -> dict:
    q: mp.Queue = mp.Queue()
    go = mp.Barrier(procs)
    ps = [
        mp.Process(target=_worker, args=(n_pairs, reps, 1000 * i, q, go))
        for i in range(procs)
    ]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    times = [q.get() for _ in ps]
    wall = max(times)  # kernel-only window, longest worker
    total_pairs = procs * n_pairs * reps
    return {
        "procs": procs,
        "worker_sec_max": round(wall, 3),
        "pairs_per_sec": round(total_pairs / wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    levels = {p: run_level(p, args.pairs, args.reps) for p in PROCS}
    pairs = []
    for a, b in ((2, 8), (8, 32)):
        eff = (levels[b]["pairs_per_sec"] / levels[a]["pairs_per_sec"]) / (b / a)
        pairs.append({"from": a, "to": b, "scaling_efficiency": round(eff, 3)})
    print(json.dumps({"kernel": "hav_pairs_rounded (no Spark)",
                      "levels": levels, "pairs": pairs}))


if __name__ == "__main__":
    main()
