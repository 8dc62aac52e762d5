"""Deterministic box-speed marker: single-core and 32-way parallel md5 loop.

Prints seconds for a fixed amount of work; compare across sessions to detect
host CPU throughput fluctuation (steal/thermal/noisy neighbor).
"""
import hashlib
import time
from concurrent.futures import ProcessPoolExecutor


def work(n: int) -> int:
    h = b"seed"
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return h[0]


if __name__ == "__main__":
    t0 = time.perf_counter()
    work(3_000_000)
    single = time.perf_counter() - t0
    t0 = time.perf_counter()
    with ProcessPoolExecutor(32) as ex:
        list(ex.map(work, [1_500_000] * 32))
    par = time.perf_counter() - t0
    print(f"MARKER single={single:.3f}s par32={par:.3f}s")
