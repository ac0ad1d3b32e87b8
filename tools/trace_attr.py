"""Attribute device-trace time to model stages via jax.named_scope.

Parses the XPlane protobuf that ``jax.profiler.start_trace`` writes and
aggregates per-op device time by (a) the named-scope path embedded in each
HLO op's ``tf_op``/metadata name (the scopes set in
``siu3r_tpu/models/model.py`` — backbone / adapter / gaussian_heads /
mask2former / panoptic_post) and (b) the HLO category (fusion kinds,
copies, convolutions ...). This implements VERDICT round-2 item #8: every
leaf-time bucket in BASELINE.md "where the time goes" gets a name.

Usage:
    python tools/trace_attr.py /tmp/jax_trace   # after a traced run
"""

from __future__ import annotations

import collections
import gzip
import sys
from pathlib import Path


def _load_xspace(trace_dir: str):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    raw = paths[-1].read_bytes()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(raw)
    return xs


def _scope_key(tf_op: str, depth: int, anchor: str | None) -> str:
    """Aggregation key from a named-scope path.

    Without ``anchor``: the first ``depth`` path components. With ``anchor``
    (substring, e.g. "render"): the path RELATIVE to the first component
    containing it, ``depth`` levels deep — this is how render-loss
    sub-attribution groups "raster_binning" under both the forward and the
    transpose(jvp(...)) backward wrappers; non-matching events land in
    "(other)"."""
    parts = [p for p in tf_op.split("/") if p]
    if anchor:
        for i, p in enumerate(parts):
            if anchor in p:
                return "/".join(parts[i:i + 1 + depth]) or "(unscoped)"
        return "(other)"
    return "/".join(parts[:depth]) or "(unscoped)"


def attribute(trace_dir: str, top: int = 25, depth: int = 1,
              anchor: str | None = None):
    xs = _load_xspace(trace_dir)
    device_planes = [
        p for p in xs.planes
        if ("TPU" in p.name or "/device:" in p.name) and "Host" not in p.name
    ]
    if not device_planes:
        print("planes found:", [p.name for p in xs.planes])
        raise RuntimeError("no device plane in trace")

    by_scope = collections.Counter()
    by_category = collections.Counter()
    by_op = collections.Counter()
    total_ns = 0
    for plane in device_planes:
        stat_names = dict(plane.stat_metadata.items())
        ev_meta = dict(plane.event_metadata.items())
        for line in plane.lines:
            if "XLA Ops" not in line.name and "XLA TraceMe" not in line.name:
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                dur = ev.duration_ps // 1000  # -> ns
                total_ns += dur
                name = md.name if md else "?"
                by_op[name] += dur
                scope = "(unscoped)"
                category = "other"
                for st in ev.stats:
                    sname = stat_names.get(st.metadata_id)
                    key = sname.name if sname else ""
                    if key == "tf_op" and st.str_value:
                        # named_scope path, e.g. "backbone/encoder/..."
                        scope = _scope_key(st.str_value, depth, anchor)
                    elif key == "hlo_category" and st.str_value:
                        category = st.str_value
                by_scope[scope] += dur
                by_category[category] += dur

    def show(title, counter, n=top):
        print(f"\n== {title} (total {total_ns / 1e6:.2f} ms) ==")
        for k, v in counter.most_common(n):
            print(f"  {v / 1e6:9.3f} ms  {v * 100.0 / max(total_ns, 1):5.1f}%  {k[:110]}")

    show("by named scope", by_scope)
    show("by HLO category", by_category)
    show("top ops", by_op, top)
    return by_scope, by_category, by_op


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?", default="/tmp/jax_trace")
    ap.add_argument("--depth", type=int, default=1,
                    help="scope-path aggregation depth")
    ap.add_argument("--anchor", default=None,
                    help="aggregate relative to the first path component "
                    "containing this substring (e.g. 'raster')")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    attribute(args.trace_dir, top=args.top, depth=args.depth,
              anchor=args.anchor)
