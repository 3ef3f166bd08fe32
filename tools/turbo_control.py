"""Frequency-scaling control: per-core throughput of a fixed CPU-bound
loop with N busy cores, N in {2, 8, 32}. Engine-independent — pure
multiprocessing + integer arithmetic. If per-core throughput drops as N
rises, the box's turbo/frequency scaling (not the engine) shrinks any
N->4N efficiency measured on one socket.
"""
import json
import multiprocessing as mp
import time


def spin(n_iter):
    acc = 1469598103934665603
    for i in range(n_iter):
        acc = (acc ^ i) * 1099511628211 % (1 << 64)
    return acc


def measure(n_procs, n_iter=30_000_000):
    with mp.Pool(n_procs) as pool:
        t0 = time.perf_counter()
        pool.map(spin, [n_iter] * n_procs)
        dt = time.perf_counter() - t0
    return n_procs * n_iter / dt / 1e6  # M iter/s aggregate


if __name__ == "__main__":
    out = {}
    for n in (2, 8, 32):
        agg = measure(n)
        out[str(n)] = {"aggregate_Mips": round(agg, 1),
                       "per_core_Mips": round(agg / n, 2)}
    out["per_core_ratio_8_vs_2"] = round(
        out["8"]["per_core_Mips"] / out["2"]["per_core_Mips"], 3)
    out["per_core_ratio_32_vs_2"] = round(
        out["32"]["per_core_Mips"] / out["2"]["per_core_Mips"], 3)
    print(json.dumps(out))
