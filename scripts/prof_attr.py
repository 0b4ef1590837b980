"""Device-op profile with Python-source attribution.

Aggregates an xprof trace by op name, then maps each op name to its
HLO metadata (source_file:line) by scanning the compiled module text.
This itemizes the inside of big while loops (scan bodies), which the
plain per-op aggregation reports as one opaque `while.N` total.

Usage: functions `profile_attr(fn, args, hlo_text, top)`.
"""

import glob
import gzip
import json
import os
import re
from collections import defaultdict

import jax


def aggregate_trace(tmpdir):
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for fp in glob.glob(f"{tmpdir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(fp, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            agg[ev.get("name", "")] += ev.get("dur", 0) / 1e3
            cnt[ev.get("name", "")] += 1
    return agg, cnt


def hlo_source_map(hlo_text):
    """op name -> 'file:line (op_name tail)' from HLO metadata."""
    out = {}
    pat = re.compile(
        r"%([\w.\-]+) = [^\n]*?metadata=\{op_name=\"([^\"]*)\""
        r"(?:[^\n]*?source_file=\"([^\"]*)\" source_line=(\d+))?")
    for m in pat.finditer(hlo_text):
        name, opname, sf, sl = m.groups()
        tail = "/".join(opname.split("/")[-2:])
        src = f"{os.path.basename(sf)}:{sl}" if sf else "?"
        out[name] = f"{src:36s} {tail[:48]}"
    return out


def profile_attr(fn, args, lowered_args=None, top=36, label="fn"):
    """Run fn under the profiler, print per-op costs with source attr."""
    f = jax.jit(fn)
    c = f.lower(*(lowered_args or args)).compile()
    srcmap = hlo_source_map(c.as_text())
    out = f(*args)
    jax.block_until_ready(out)
    tmpdir = f"/tmp/prof_attr_{label}"
    os.system(f"rm -rf {tmpdir}")
    with jax.profiler.trace(tmpdir):
        jax.block_until_ready(f(*args))
    agg, cnt = aggregate_trace(tmpdir)
    rows = [(ms, n, name) for name, ms in agg.items()
            for n in [cnt[name]]
            if not name.startswith("$") and "block_until" not in name]
    rows.sort(reverse=True)
    total = 0.0
    for ms, n, name in rows[:top]:
        attr = srcmap.get(name, "")
        print(f"{ms:9.2f} ms x{n:4d}  {name[:34]:34s} {attr}", flush=True)
        if not name.startswith("jit_"):
            total += ms
    print(f"(sum of listed non-jit ops: {total:.1f} ms)", flush=True)
