"""Summarize a jax.profiler trace (xplane.pb) into per-op device-time shares.

Offline replacement for the TensorBoard op-profile view (the hosted plugin's
native converter is unavailable in this image): parses the XPlane protobuf
directly and aggregates SELF time per HLO op-name bucket on the TPU device
plane. Used to attribute the B>=32 flash-decode serving gap and the training
MFU ceiling (INFERENCE.md / training/README.md cite its output).

  python benchmarks/trace_summary.py /tmp/parler_profile_fd_b32 [top_n]

Buckets: the leading fusion/op kind plus the source op name XLA embeds in
the metadata display name (e.g. "fusion: ...flash_decode...", "copy",
"dynamic-update-slice").
"""

import collections
import glob
import os
import sys


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        raise SystemExit(f"no xplane.pb under {path}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_plane(xs):
    # prefer the TPU device plane; fall back to any /device: plane
    for p in xs.planes:
        if "TPU" in p.name and "device" in p.name.lower():
            return p
    for p in xs.planes:
        if p.name.startswith("/device:"):
            return p
    names = [p.name for p in xs.planes]
    raise SystemExit(f"no device plane found; planes: {names}")


def summarize(plane, top_n=30):
    md = {m.id: plane.event_metadata[m.id] for m in plane.event_metadata.values()}
    # XLA op events carry display_name = HLO instruction; bucket by a coarse
    # kind + the hlo op base name (strip .N suffixes and fusion numbering)
    agg = collections.Counter()
    total_ps = 0
    for line in plane.lines:
        lname = line.name.lower()
        # aggregate the synchronous-op self-time line ONLY ('XLA Ops').
        # 'Async XLA Ops' spans OVERLAP compute (DMA issued early, waited
        # later) and 'XLA Modules'/'Steps' re-cover the same wall interval —
        # including any of them double-counts device time.
        if lname not in ("xla ops", "ops"):
            continue
        for ev in line.events:
            m = md.get(ev.metadata_id)
            if m is None:
                continue
            name = m.display_name or m.name
            base = name.split(".")[0].split("%")[-1]
            agg[base] += ev.duration_ps
            total_ps += ev.duration_ps
    return agg, total_ps


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    xs = load_xspace(path)
    plane = device_plane(xs)
    agg, total_ps = summarize(plane, top_n)
    print(f"# plane: {plane.name}  total device op time: {total_ps/1e9:.3f} ms")
    for name, ps in agg.most_common(top_n):
        print(f"{ps/1e9:10.3f} ms  {100*ps/max(total_ps,1):5.1f}%  {name}")


if __name__ == "__main__":
    main()
