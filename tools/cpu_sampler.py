#!/usr/bin/env python
"""Sample busy jiffies on a CPU range while a command runs; correlate with
the profile tool's MARK lines to attribute per-stage CPU utilization.

Usage: python tools/cpu_sampler.py CPU_LIST -- cmd args...
e.g.   python tools/cpu_sampler.py 3,4,5,6 -- taskset -c 3-6 python \
           tools/profile_scaling.py 4 100000 /tmp/pages

Prints UTIL:{json} with per-stage mean utilization (0..len(cpus)) —
on an idle box, busy jiffies on the bound range ≈ this job's usage, so
a stage whose utilization is well under the core budget is blocked on
serial driver work / scheduling gaps, not on compute.
"""
import json
import subprocess
import sys
import threading
import time

cpus = [int(c) for c in sys.argv[1].split(",")]
cmd = sys.argv[sys.argv.index("--") + 1:]

samples = []  # (ts, total_busy_jiffies_on_range)


def read_busy():
    busy = steal = 0
    with open("/proc/stat") as f:
        for line in f:
            p = line.split()
            if p and p[0] in {f"cpu{c}" for c in cpus}:
                vals = [int(x) for x in p[1:]]
                # busy = everything except idle(3), iowait(4), steal(7)
                busy += sum(vals) - vals[3] - vals[4] - vals[7]
                steal += vals[7]
    return busy, steal


stop = False


def sampler():
    while not stop:
        b, s = read_busy()
        samples.append((time.time(), b, s))
        time.sleep(0.5)


th = threading.Thread(target=sampler, daemon=True)
th.start()
t_start = time.time()
proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                        text=True)
marks = []
out_lines = []


def drain(stream, sink, grab_marks):
    for line in stream:
        if grab_marks and line.startswith("MARK:"):
            _, name, ts = line.strip().split(":")
            marks.append((name, float(ts)))
        else:
            sink.append(line)


te = threading.Thread(target=drain, args=(proc.stderr, [], True))
to = threading.Thread(target=drain, args=(proc.stdout, out_lines, False))
te.start(); to.start()
proc.wait(); te.join(); to.join()
stop = True
th.join()

hz = 100.0  # USER_HZ
stages = {}
prev_ts = t_start
for name, ts in marks:
    # mean utilization between prev_ts and ts
    window = [w for w in samples if prev_ts <= w[0] <= ts]
    if len(window) >= 2:
        dt = window[-1][0] - window[0][0]
        dbusy = (window[-1][1] - window[0][1]) / hz
        dsteal = (window[-1][2] - window[0][2]) / hz
        stages[name] = {"busy": round(dbusy / dt, 2),
                        "steal": round(dsteal / dt, 2)} if dt > 0 else None
    prev_ts = ts
for line in out_lines:
    if line.startswith("PROFILE:"):
        print(line.strip())
print("UTIL:" + json.dumps({"cpus": cpus, "stages": stages}))
