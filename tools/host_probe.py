"""Host-window probe battery.

The round-3/4 sessions learned that this box degrades in MODES: a
single-threaded fresh-allocation probe (100M-element float64) can read
clean (~0.5 s) while object-store-heavy stages (the build's merge
shuffle) still run 10-20x slow. This battery probes each resource the
engine's stages actually use, so a "clean window" claim names which
resources it covers:

  alloc1     - single-process fresh page allocation+fault (the r3/r4 probe)
  allocN     - 8 processes faulting 200 MB each concurrently (merge's
               worker-side allocation pattern)
  shm        - /dev/shm write+read bandwidth (Ray object store backing)
  disk       - /tmp write+fsync+read bandwidth (index sink, spill)
  fork       - process spawn rate (Ray worker startup)

Prints ONE JSON line. Healthy references (measured on this box in
clean windows): alloc1 ~0.5 s, allocN ~1 s, shm/disk >= 1 GB/s, fork
>= 30/s.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import tempfile
import time


def probe_alloc1() -> float:
    import numpy as np

    t = time.time()
    a = np.zeros(100_000_000)
    a += 1.0
    a.sum()
    return round(time.time() - t, 3)


def _fault(n: int) -> None:
    import numpy as np

    a = np.zeros(n)
    a += 1.0
    a.sum()


def probe_allocN(nproc: int = 8, mb_each: int = 200) -> float:
    n = mb_each * 1_000_000 // 8
    t = time.time()
    procs = [mp.Process(target=_fault, args=(n,)) for _ in range(nproc)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    return round(time.time() - t, 3)


def _bandwidth(dirpath: str, mb: int = 512) -> dict:
    buf = os.urandom(1 << 20) * 1  # 1 MB
    path = os.path.join(dirpath, f"probe_{os.getpid()}.bin")
    t = time.time()
    with open(path, "wb") as f:
        for _ in range(mb):
            f.write(buf)
        f.flush()
        os.fsync(f.fileno())
    w = time.time() - t
    t = time.time()
    with open(path, "rb") as f:
        while f.read(1 << 22):
            pass
    r = time.time() - t
    os.unlink(path)
    return {
        "write_mb_s": round(mb / max(w, 1e-9), 1),
        "read_mb_s": round(mb / max(r, 1e-9), 1),
    }


def _noop() -> None:
    pass


def probe_fork(n: int = 20) -> float:
    t = time.time()
    for _ in range(n):
        p = mp.Process(target=_noop)
        p.start()
        p.join()
    return round(n / (time.time() - t), 1)


def run_battery(fast: bool = False) -> dict:
    out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    out["alloc1_sec"] = probe_alloc1()
    out["allocN_sec"] = probe_allocN()
    if os.path.isdir("/dev/shm"):
        out["shm"] = _bandwidth("/dev/shm", mb=256 if fast else 512)
    out["disk"] = _bandwidth(tempfile.gettempdir(), mb=256 if fast else 512)
    out["fork_per_sec"] = probe_fork(10 if fast else 20)
    out["cores"] = len(os.sched_getaffinity(0))
    return out


if __name__ == "__main__":
    fast = "--fast" in sys.argv
    print(json.dumps(run_battery(fast=fast)))
