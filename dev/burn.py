#!/usr/bin/env python3
"""Pure-CPU burn control for the N-vs-4N scaling evidence: measures the
BOX's parallel-compute ceiling at the same pinned core counts as
dev/scaling.sh, with zero shared memory (multiprocessing + md5 loop).
Any engine efficiency must be read against this ceiling — a hypervisor
VM does not deliver 4x compute from 4x threads even for embarrassingly
parallel work.

Usage:
  taskset -c 0-1 python3 dev/burn.py 2 > /tmp/b2
  taskset -c 0-7 python3 dev/burn.py 8 > /tmp/b8
  # ceiling = thr8 / (4 * thr2)
"""
import multiprocessing as mp, time, sys, hashlib


def burn(n):
    h = b"seed"
    for i in range(n):
        h = hashlib.md5(h + str(i).encode()).digest()
    return h[0]


def run(workers, tasks, per):
    t0 = time.time()
    with mp.Pool(workers) as p:
        p.map(burn, [per] * tasks)
    return time.time() - t0


if __name__ == "__main__":
    w = int(sys.argv[1])
    tasks, per = 64, 400000
    run(w, 8, per)  # warmup
    ts = min(run(w, tasks, per) for _ in range(3))
    print(w, ts, tasks * per / ts)
