"""Device-time attribution of the whole frame fn via jax.profiler xplane.

Usage: python tools/device_trace.py [scale] [frames]
Captures a trace of the fused realtime frame and prints per-op device time
(grouped by kernel/fusion name), the ground truth the host-side stage timers
can't give on this tunneled-TPU host (~3.5 ms dispatch per jit call inflates
every per-stage micro-bench).

The xplane.pb is parsed with a minimal hand-rolled protobuf wire scanner
(the installed tensorboard_plugin_profile's generated protos are
incompatible with the installed protobuf/tensorflow — version skew).
"""
from __future__ import annotations

import collections
import glob
import os
import sys

import jax

sys.path.insert(0, ".")


# --- minimal protobuf wire-format scanner -------------------------------

def _fields(buf: memoryview):
    """Yield (field_no, wire_type, value) — value is int for varint/fixed,
    memoryview for length-delimited."""
    i, n = 0, len(buf)
    while i < n:
        tag = 0
        shift = 0
        while True:
            b = buf[i]; i += 1
            tag |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v = 0; shift = 0
            while True:
                b = buf[i]; i += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield fno, wt, v
        elif wt == 2:
            ln = 0; shift = 0
            while True:
                b = buf[i]; i += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            yield fno, wt, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield fno, wt, int.from_bytes(buf[i:i + 4], "little"); i += 4
        elif wt == 1:
            yield fno, wt, int.from_bytes(buf[i:i + 8], "little"); i += 8
        else:
            raise ValueError(f"wire type {wt}")


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _parse_event(buf):
    mid = off = dur = 0
    for fno, wt, v in _fields(buf):
        if fno == 1:
            mid = v
        elif fno == 2:
            off = _zigzag(v)          # offset_ps is sint64
        elif fno == 3:
            dur = v
    return mid, off, dur


def _parse_line(buf):
    name = ""
    events = []
    for fno, wt, v in _fields(buf):
        if fno == 2:
            name = bytes(v).decode("utf-8", "replace")
        elif fno == 4:
            events.append(_parse_event(v))
    return name, events


def _parse_meta_entry(buf):
    """map<int64, XEventMetadata> entry -> (id, name)."""
    key = 0
    name = ""
    for fno, wt, v in _fields(buf):
        if fno == 1:
            key = v
        elif fno == 2:
            for f2, w2, v2 in _fields(v):
                if f2 == 2:
                    name = bytes(v2).decode("utf-8", "replace")
    return key, name


def _parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fno, wt, v in _fields(buf):
        if fno == 2:
            name = bytes(v).decode("utf-8", "replace")
        elif fno == 3:
            lines.append(_parse_line(v))
        elif fno == 4:
            k, nm = _parse_meta_entry(v)
            meta[k] = nm
    return name, lines, meta


def summarize(logdir: str, frames: int, top: int = 40):
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {logdir}"
    buf = memoryview(open(max(paths, key=os.path.getmtime), "rb").read())

    per_op = collections.Counter()          # compute ops: duration sums
    dma_op = collections.Counter()          # async copies: duration sums (incl. wait)
    intervals = []                          # compute-op intervals for union
    i_names = []                            # op name per compute interval
    dma_intervals = []
    for fno, wt, v in _fields(buf):
        if fno != 1:
            continue
        pname, lines, meta = _parse_plane(v)
        if "TPU" not in pname:
            continue
        for lname, events in lines:
            if "XLA Op" not in lname:
                continue   # module/step lines double-count the op time
            for mid, off_ps, dur_ps in events:
                name = meta.get(mid, f"#{mid}")
                is_dma = name.startswith(("%copy-start", "%copy-done",
                                          "%slice-start", "%slice-done",
                                          "%dynamic-slice-start",
                                          "%dynamic-update-slice-start"))
                if is_dma:
                    dma_op[name] += dur_ps / 1e9
                    dma_intervals.append((off_ps, off_ps + dur_ps))
                else:
                    per_op[name] += dur_ps / 1e9
                    intervals.append((off_ps, off_ps + dur_ps))
                    i_names.append(name)

    def _union_ms(iv):
        iv = sorted(iv)   # copy: callers keep their interval↔name pairing
        tot = 0
        cur_s = cur_e = None
        for s, e in iv:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    tot += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            tot += cur_e - cur_s
        return tot / 1e9

    busy = _union_ms(intervals)
    dma_busy = _union_ms(dma_intervals)
    total = sum(per_op.values())

    # gap structure: wall span vs busy, and the largest idle holes in the
    # COMPUTE timeline with the ops bordering each hole (what is the core
    # waiting for?).  DMA intervals overlapping a hole are listed too.
    named = sorted((s, e, nm) for (s, e), nm in zip(intervals, i_names))
    if named:
        span = (named[-1][1] - named[0][0]) / 1e9
        print(f"wall span {span:.1f} ms = {span / frames:.2f} ms/frame; "
              f"compute holes {(span - busy) / frames:.2f} ms/frame")
        holes = []
        cur_e, cur_nm = named[0][1], named[0][2]
        for s, e, nm in named[1:]:
            if s > cur_e:
                holes.append((s - cur_e, cur_e, s, cur_nm, nm))
            if e > cur_e:
                cur_e, cur_nm = e, nm
        holes.sort(reverse=True)
        print("\n-- largest compute holes --")
        for dur, hs, he, before, after in holes[:12]:
            dma_in = sum(min(e2, he) - max(s2, hs)
                         for s2, e2 in dma_intervals
                         if e2 > hs and s2 < he) / 1e9
            print(f"{dur / 1e6:8.3f} ms  dma-covered {dma_in:6.2f} ms  "
                  f"after {before[:40]:40s} before {after[:40]}")
    print(f"\ncompute busy {busy:.1f} ms = {busy / frames:.2f} ms/frame; "
          f"dma-engine busy {dma_busy / frames:.2f} ms/frame "
          f"(overlapped; {frames} frames)")
    print(f"{'op':70s} {'ms/frm':>8s} {'%':>5s}")
    for name, ms in per_op.most_common(top):
        print(f"{name[:70]:70s} {ms / frames:8.3f} {100 * ms / total:5.1f}")
    print("\n-- async copies (duration incl. wait; overlaps compute) --")
    for name, ms in dma_op.most_common(12):
        print(f"{name[:70]:70s} {ms / frames:8.3f}")
    return per_op, total


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from rtvb_tpu.core.config import Settings
    from rtvb_tpu.render.renderer import Engine

    settings = Settings().replace(rendering={
        "render_width": 1920, "render_height": 1080})
    eng = Engine(settings=settings, width=1920, height=1080,
                 backend="pallas")
    eng.set_render_scale(scale)
    jax.block_until_ready(eng.render_realtime_device())
    jax.block_until_ready(eng.render_realtime_device())

    logdir = "/tmp/rtvb_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        out = None
        for _ in range(frames):
            out = eng.render_realtime_device()
        jax.block_until_ready(out)

    summarize(logdir, frames)


if __name__ == "__main__":
    main()
