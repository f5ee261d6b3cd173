#!/usr/bin/env python
"""Memory-roofline accounting of the bench train step (VERDICT r4 item 3).

At D=64 the flagship workload is bandwidth-bound, not FLOP-bound, so the
meaningful utilization lens is HBM bytes/s, not MFU. This tool captures a
device trace of the bench-shaped train step (same harness as
tools/profile_trace.py), and for every op in the `XLA Ops` thread parses
its `long_name` — the full HLO instruction, which carries the output AND
operand shapes inline — into an HBM byte count (standard roofline
convention: every operand read once + output written once; on-chip reuse
makes real traffic lower, so achieved GB/s here is an UPPER bound on
bandwidth demand and the %peak column an upper bound on utilization).

Output: op class | time/step | bytes/step | achieved GB/s | % HBM peak,
plus the same per op kind. Peak defaults to the v5e's 819 GB/s.

Run on TPU:  python tools/roofline.py [--max-nodes 8192] [--steps 3]
"""
import argparse
import collections
import glob
import gzip
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}
# dtype[dims]{layout}? optionally followed by the %operand name
_SHAPE_RE = re.compile(
    r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([\d,]*)\](\{[^}]*\})?(?:\s+%([\w\.\-]+))?"
)
_OPCODE_RE = re.compile(r" ([a-z][\w\-]*)\(")


def _shape_bytes(dt: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def hlo_bytes(long_name: str):
    """(output_bytes, operand_bytes) of HBM traffic parsed from an HLO
    instruction string, or None without shape annotations.

    * buffers whose layout pins them outside HBM (``S(1)`` = VMEM,
      ``S(2)`` = semaphore/SMEM) are skipped — they are not HBM traffic;
    * repeated reads of the SAME operand buffer within one instruction are
      counted once (the op streams it once through VMEM).
    """
    if "=" not in long_name:
        return None
    rhs = long_name.split(" = ", 1)[-1]
    m = _OPCODE_RE.search(rhs)
    if m is None:
        return None
    out_part, arg_part = rhs[: m.start()], rhs[m.end() :]

    def in_hbm(layout: str) -> bool:
        return "S(1)" not in layout and "S(2)" not in layout

    out_b = sum(
        _shape_bytes(dt, dims)
        for dt, dims, layout, _ in _SHAPE_RE.findall(out_part)
        if in_hbm(layout or "")
    )
    seen = set()
    arg_b = 0
    for dt, dims, layout, name in _SHAPE_RE.findall(arg_part):
        if not in_hbm(layout or ""):
            continue
        if name and name in seen:
            continue
        if name:
            seen.add(name)
        arg_b += _shape_bytes(dt, dims)
    return out_b, arg_b


def classify(kind: str, name: str) -> str:
    """Map a tf_op kind (jaxpr op) + HLO name to a roofline op class."""
    k = kind.rstrip(":")
    if "-start" in name or "-done" in name or name.startswith("async"):
        # async DMA pairs (copy/slice/async computations): overlapped with
        # compute by the scheduler. Bytes are counted once, at the -start
        # event, operand (HBM) side only — the output tuple's first element
        # aliases the operand and the -done event completes the same
        # transfer, so counting either would double the traffic.
        return "async copies (overlapped)"
    if k == "pallas_call" or "custom-call" in name:
        return "pallas kernels"
    if k == "gather":
        return "gathers"
    if k in ("dot_general", "conv_general_dilated", "dot"):
        return "matmuls"
    if k in ("scatter", "scatter-add", "scatter_add"):
        return "scatters"
    if name.startswith(("copy", "bitcast", "transpose")) or k in ("copy",):
        return "layout copies"
    if k in ("reduce", "reduce_sum", "reduce_max", "reduce_window"):
        return "reductions"
    if k in ("sort",):
        return "sorts"
    if k in ("threefry2x32", "iota_2x32_shape", "random_bits") or "_uniform" in kind or "rng" in name:
        return "rng"
    return "elementwise/other"


def report(outdir: str, steps: int, peak_gbps: float, top: int) -> None:
    files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace produced", file=sys.stderr)
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    pids, tids = {}, {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pids[ev["pid"]] = ev["args"].get("name", "?")
            if ev.get("name") == "thread_name":
                tids[(ev["pid"], ev["tid"])] = ev["args"].get("name", "?")

    cls_t = collections.Counter()  # us
    cls_b = collections.Counter()  # bytes
    cls_n = collections.Counter()
    kind_t = collections.Counter()
    kind_b = collections.Counter()
    unparsed_t = 0.0
    total_t = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if not pids.get(ev.get("pid"), "").startswith("/device"):
            continue
        if tids.get((ev["pid"], ev["tid"])) != "XLA Ops":
            continue
        a = ev.get("args") or {}
        dur = ev["dur"]
        total_t += dur
        kind = (a.get("tf_op") or "?").split("/")[-1]
        parsed = hlo_bytes(a.get("long_name") or "")
        if parsed is None:
            unparsed_t += dur
            continue
        out_b, arg_b = parsed
        b = out_b + arg_b
        name = ev.get("name", "")
        if "-done" in name:
            b = 0  # transfer already counted at the matching -start
        elif "-start" in name or name.startswith("async"):
            b = arg_b  # HBM side only; output tuple aliases the operand
        c = classify(kind, name)
        cls_t[c] += dur
        cls_b[c] += b
        cls_n[c] += 1
        kind_t[kind] += dur
        kind_b[kind] += b

    def row(name, t_us, byts, n=None):
        t_s = t_us / 1e6 / steps
        bps = byts / steps
        gbps = (bps / t_s) / 1e9 if t_s else 0.0
        cnt = f"x{n // steps:<5}" if n else "      "
        print(
            f"{name[:30]:30} {t_us / 1e3 / steps:8.3f} ms/step {cnt} "
            f"{bps / 1e6:9.1f} MB/step {gbps:8.1f} GB/s {100 * gbps / peak_gbps:6.1f}% peak"
        )

    print(
        f"device op time: {total_t / 1e3 / steps:.2f} ms/step "
        f"(unattributed {unparsed_t / 1e3 / steps:.2f} ms — no HLO shapes); "
        f"HBM peak assumed {peak_gbps:.0f} GB/s"
    )
    print("\n== by op class (roofline convention: operands read once + output written) ==")
    for name, t in cls_t.most_common():
        row(name, t, cls_b[name], cls_n[name])
    tb = sum(cls_b.values())
    tt = sum(cls_t.values())
    row("TOTAL (attributed)", tt, tb)
    print("\n== by op kind ==")
    for name, t in kind_t.most_common(top):
        row(name, t, kind_b[name])


def measure_ceilings(peak_gbps: float) -> None:
    """Empirical bandwidth ceilings on THIS device, for the two access
    patterns the step is made of: streaming elementwise and random-row
    gather (the irregular pattern peak HBM numbers don't apply to)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)

    def sync(out):
        # tunnel gotcha: block_until_ready is dispatch-only here; a D2H read
        # of ONE device-sliced element truly synchronizes (never np.asarray
        # the whole array — that ships it through the tunnel).
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.ravel()[0])

    def timeit(fn, *args, n=30):
        out = fn(*args)
        sync(out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return (time.time() - t0) / n

    print("\n== empirical ceilings (this chip) ==")
    # Loop ITERS passes inside one executable (lax.scan -> HLO while loop)
    # so per-dispatch overhead amortizes away; the array exceeds VMEM so
    # the loop carry streams HBM every pass.
    ITERS = 32
    x = jnp.asarray(rng.randn(917504, 64).astype(np.float32))  # 235 MB

    @jax.jit
    def stream(x0):
        return jax.lax.scan(
            lambda c, _: (c + 1.0, None), x0, None, length=ITERS
        )[0]

    t = timeit(stream, x, n=5) / ITERS
    gbps = 2 * x.nbytes / t / 1e9
    print(f"streaming elementwise [917504,64] f32 (x{ITERS} in-device): "
          f"{t * 1e3:.3f} ms/pass -> {gbps:.0f} GB/s "
          f"({100 * gbps / peak_gbps:.0f}% of assumed peak) — the achievable "
          f"ceiling for the streaming classes above")
    table = jnp.asarray(rng.randn(8192, 64).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 8192, 262144).astype(np.int32))

    @jax.jit
    def gathers(tb, ix):
        # index vector varies per iteration so the gather cannot be hoisted
        return jax.lax.scan(
            lambda c, i: (jnp.take(tb, (ix + i) & 8191, axis=0), None),
            jnp.zeros((262144, 64), tb.dtype),
            jnp.arange(ITERS),
        )[0]

    t = timeit(gathers, table, idx, n=5) / ITERS
    out_bytes = 262144 * 64 * 4
    gbps = 2 * out_bytes / t / 1e9
    print(f"random-row gather 262144 rows x 64 f32 from [8192,64] "
          f"(x{ITERS} in-device): {t * 1e3:.3f} ms/pass -> {gbps:.0f} GB/s "
          f"(read+write convention; {100 * gbps / peak_gbps:.0f}% of assumed "
          f"peak) — the achievable ceiling for the 'gathers' class above")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-nodes", type=int, default=8192)
    ap.add_argument("--edge-slots-per-node", type=float, default=6)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--peak-gbps", type=float, default=819.0)
    ap.add_argument("--top", type=int, default=18)
    ap.add_argument("--no-ceilings", action="store_true")
    ap.add_argument("--ceilings-only", action="store_true")
    args = ap.parse_args()
    if args.ceilings_only:
        measure_ceilings(args.peak_gbps)
        return
    from tools.profile_trace import capture

    outdir = capture(args.max_nodes, args.edge_slots_per_node, args.steps)
    report(outdir, args.steps, args.peak_gbps, args.top)
    if not args.no_ceilings:
        measure_ceilings(args.peak_gbps)


if __name__ == "__main__":
    main()
