#!/usr/bin/env python3
"""Synthetic CPU contention for §5/§2.6 fragility experiments.

Spawns N busy-spin processes (default: half the cores) for --secs
seconds, then exits. Used to reproduce the contended-driver-host
blow-up of the iterative query family locally (r15 verdict item 1);
not part of any query or bench path.
"""
import multiprocessing, sys, time, argparse

def spin(deadline):
    x = 1.0
    while time.time() < deadline:
        for _ in range(100000):
            x = x * 1.0000001 + 1e-9
    return x

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=multiprocessing.cpu_count() // 2)
    ap.add_argument("--secs", type=float, default=600.0)
    a = ap.parse_args()
    deadline = time.time() + a.secs
    ps = [multiprocessing.Process(target=spin, args=(deadline,), daemon=True)
          for _ in range(a.procs)]
    for p in ps:
        p.start()
    print(f"[cpu_hog] {a.procs} spinners for {a.secs}s", flush=True)
    for p in ps:
        p.join()
