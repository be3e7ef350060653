"""Per-op timeline attribution for the headline H2O VMC block.

Captures a jax.profiler (XProf) trace of one block on the current backend,
parses the xplane protobuf with jax.profiler.ProfileData (no tensorflow
needed), and prints the top HLO ops by total device self-time — the
"top-3 op buckets" evidence VERDICT r2 item 1 asks for, at op granularity.

Run (TPU): python tools/profile_ops.py [nconf] [nsteps]
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax


def capture_trace(block, params, pos, wrap, key, outdir):
    # compile + one timing rep first so the trace holds steady-state steps
    pos, wrap, avg = block(params, pos, wrap, key)
    _ = float(jax.tree.leaves(avg)[0])
    with jax.profiler.trace(outdir):
        pos, wrap, avg = block(params, pos, wrap, key)
        _ = float(jax.tree.leaves(avg)[0])
    return pos, wrap


def summarize(outdir, top=25):
    files = sorted(
        glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    )
    if not files:
        print("no xplane.pb found under", outdir)
        return {}
    data = jax.profiler.ProfileData.from_file(files[-1])
    bucket = defaultdict(float)
    total = 0.0
    for plane in data.planes:
        pname = plane.name.lower()
        if "tpu" not in pname and "gpu" not in pname and "device" not in pname:
            continue
        if "host" in pname:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            # only the XLA op activity line — module/TraceMe lines span whole
            # blocks and would double-count into `total`
            if "xla op" not in lname and lname != "ops":
                continue
            for ev in line.events:
                dur = ev.duration_ns
                name = ev.name
                # strip fusion suffixes: "fusion.123" -> "fusion"
                base = name.split(".")[0]
                bucket[base] += dur
                total += dur
    items = sorted(bucket.items(), key=lambda kv: -kv[1])
    print(f"\ndevice op time total {total/1e6:.2f} ms "
          f"({len(bucket)} op families)")
    for name, ns in items[:top]:
        print(f"  {name:42s} {ns/1e6:9.3f} ms  {100*ns/max(total,1):5.1f}%")
    return dict(items)


def summarize_exact(outdir, top=30):
    """Top individual HLO op instances (exact names, with call counts) —
    'fusion' as one family hides which fusion dominates; exact names let
    the hotspot be located in the HLO dump."""
    files = sorted(
        glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    )
    if not files:
        return {}
    data = jax.profiler.ProfileData.from_file(files[-1])
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for plane in data.planes:
        pname = plane.name.lower()
        if ("tpu" not in pname and "gpu" not in pname and "device" not in pname) \
                or "host" in pname:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            if "xla op" not in lname and lname != "ops":
                continue
            for ev in line.events:
                dur[ev.name] += ev.duration_ns
                cnt[ev.name] += 1
    items = sorted(dur.items(), key=lambda kv: -kv[1])
    total = sum(dur.values())
    print(f"\ntop {top} individual ops (of {len(dur)}):")
    for name, ns in items[:top]:
        n = cnt[name]
        print(f"  {name:46s} {ns/1e6:8.3f} ms  {100*ns/max(total,1):5.1f}%  "
              f"x{n:6d}  {ns/1e3/max(n,1):7.2f} us/call")
    return dict(items)


def main(nconf=2048, nsteps=50):
    import __graft_entry__ as ge
    from pyqmc_tpu.method.vmc import make_vmc_block

    mol, wf, params, configs, acc = ge._h2o_setup(nconf=nconf)
    block = make_vmc_block(wf, acc, configs.geometry, tstep=0.5, nsteps=nsteps)
    key = jax.random.PRNGKey(7)
    pos, wrap = configs.positions, configs.wrap
    dtype = jax.numpy.float32 if jax.default_backend() != "cpu" else pos.dtype
    pos = pos.astype(dtype)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "astype") else x, params
    )
    outdir = "/tmp/h2o_trace"
    os.makedirs(outdir, exist_ok=True)
    capture_trace(block, params, pos, wrap, key, outdir)
    summarize(outdir)
    summarize_exact(outdir)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 2048,
        int(sys.argv[2]) if len(sys.argv) > 2 else 50,
    )
