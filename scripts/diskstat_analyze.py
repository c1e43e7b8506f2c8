"""Correlate a /proc/diskstats sampler log with build stage windows.

The N-vs-4N protocol runs on one box with one disk (vda); when a stage's
wall is flat across parallelism levels the question is whether it is
disk-bound (an Amdahl term only on this box -- a real cluster has
per-executor disks) or serial in the plan.  This reads the 2-second
sampler log (`<epoch> | <diskstats vda>; <diskstats vdb>;` lines) and
prints read/write MB/s per interval, so stage windows (from the child
JSON's stage walls + the run log timestamps) can be mapped onto disk
activity.

Usage: python scripts/diskstat_analyze.py /tmp/diskstat_r4.log [t0 t1]
"""

from __future__ import annotations

import sys

SECTOR = 512


def parse(path: str):
    rows = []
    for line in open(path):
        if "|" not in line:
            continue
        ts_s, rest = line.split("|", 1)
        dev = rest.split(";")[0].split()
        if len(dev) < 10:
            continue
        # /proc/diskstats: ... name rd_ios rd_merge rd_sectors rd_ms
        #                        wr_ios wr_merge wr_sectors wr_ms ...
        name_i = next(i for i, tok in enumerate(dev) if tok.isalpha() or tok.startswith("vd"))
        rows.append((int(ts_s), int(dev[name_i + 3]), int(dev[name_i + 7])))
    return rows


def main() -> None:
    rows = parse(sys.argv[1])
    t0 = int(sys.argv[2]) if len(sys.argv) > 2 else rows[0][0]
    t1 = int(sys.argv[3]) if len(sys.argv) > 3 else rows[-1][0]
    prev = None
    for ts, rd, wr in rows:
        if prev and t0 <= ts <= t1:
            dt = ts - prev[0]
            if dt > 0:
                rmb = (rd - prev[1]) * SECTOR / dt / 1e6
                wmb = (wr - prev[2]) * SECTOR / dt / 1e6
                if rmb + wmb > 1.0:
                    print(f"{ts} read {rmb:8.1f} MB/s  write {wmb:8.1f} MB/s")
        prev = (ts, rd, wr)


if __name__ == "__main__":
    main()
