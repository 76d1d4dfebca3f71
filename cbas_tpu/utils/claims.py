"""Atomic file-claim leases for zero-infrastructure work distribution.

A worker owns a unit of work iff it created ``<output>.claim`` with
O_CREAT|O_EXCL — atomic on POSIX filesystems, including the NFS-style shared
filesystems of TPU pod hosts, so the same work list can be drained by
processes on many chips or many hosts with no queue service. The claim is a
LEASE (who is working now), never a done-marker: callers must check their
own done-marker (encoder stamp, outputs CSV, report file) before claiming
and again under the lease. Claims older than a TTL are presumed dead
(crashed worker) and broken; outputs written tmp+rename make that retry safe.

Used by tools/encode_fleet.py (per-chip encode/classify fan-out) and
app/sweep.py (per-chip sweep-combo fan-out).
"""

from __future__ import annotations

import os
import time


def try_claim_path(path: str, ttl_s: float) -> bool:
    """Atomically create the claim file; True iff this process now owns it.

    A leftover claim older than ``ttl_s`` is broken and re-contended (the
    O_EXCL retry arbitrates between racing breakers).
    """
    for _ in range(2):  # second pass after breaking a stale claim
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, f"{os.getpid()}@{time.time()}\n".encode())
            os.close(fd)
            return True
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(path)
            except OSError:
                continue  # claim vanished between open and stat: race again
            if age <= ttl_s:
                return False
            try:
                os.unlink(path)
            except OSError:
                pass
    return False


def release_claim_path(path: str) -> None:
    try:
        os.unlink(path)
    except OSError:
        pass
