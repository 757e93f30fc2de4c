"""Capture an xprof trace of a callable and print per-op time totals.

Library used by the profiling scripts; also runnable standalone on a few
canned stages. Parses the xplane proto directly (the tensorboard profile
plugin converter is broken in this image — see .claude/skills/verify).
"""
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def trace_and_summarize(fn, logdir="/tmp/xprof_run", top=30, group=True):
    """Run fn() under jax.profiler.trace and print the top device ops."""
    import shutil
    import jax
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        fn()
    return summarize(logdir, top=top, group=group)


def _strip(name):
    """Group op names: fusion.123 -> fusion, custom-call.5 -> custom-call."""
    base = name.split(".")[0]
    return base


def summarize(logdir, top=30, group=True):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb found under", logdir)
        return {}
    path = max(paths, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    totals = defaultdict(float)
    for plane in xs.planes:
        if "/device:TPU" not in plane.name and "TPU" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" != line.name:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                key = _strip(name) if group else name
                totals[key] += ev.duration_ps / 1e9  # -> ms

    items = sorted(totals.items(), key=lambda kv: -kv[1])
    tot = sum(totals.values())
    print(f"{'op':<100} {'ms':>10} {'%':>6}")
    for name, ms in items[:top]:
        print(f"{name[:100]:<100} {ms:>10.2f} {100*ms/max(tot,1e-9):>6.1f}")
    print(f"{'TOTAL (device op time)':<100} {tot:>10.2f}")
    return dict(items)


if __name__ == "__main__":
    summarize(sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_run",
              group="--raw" not in sys.argv)
