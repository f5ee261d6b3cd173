"""Sweep (rows_per_block, agg_tile) for the revisit kernel with IDENTITY
layout (no device-side permutation), simulating a batcher that pads each row
block's slot run to an agg_tile multiple.

Timing: N chained iterations inside ONE jitted lax.fori_loop + a final D2H
read. Through the axon tunnel, per-dispatch latency is ~2.6 ms and
block_until_ready is a no-op, so Python-level loops measure dispatch, not
compute. The expand-gather chain cost is measured separately and subtracted.
"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np
from ptgnn_tpu.ops.pallas import segment_kernels as sk

rng = np.random.RandomState(0)
N, E, D = 8192, 262144, 64  # production batch shape (8k nodes, 262k slots)
recv = np.sort(rng.randint(0, N, E).astype(np.int32))  # sorted -> identity plan
mask = np.ones(E, bool)
ITERS = 100


def time_loop(body, out0, iters=ITERS):
    """body: [N, D] -> [N, D]; returns ms per iteration."""
    @jax.jit
    def run(o):
        return jax.lax.fori_loop(0, iters, lambda i, o: body(o), o)

    r = run(out0)
    float(jnp.sum(r))  # warm compile + sync
    t0 = time.time()
    r = run(out0)
    float(jnp.sum(r))
    return (time.time() - t0) / iters * 1000


def make_identity_plan(R, TILE):
    plan = sk.build_aggregation_plan(recv, mask, N, R, TILE)
    perm = np.asarray(plan.perm)
    e_sorted = len(perm)
    plan = plan._replace(perm=None)
    plan = jax.tree_util.tree_map(jnp.asarray, plan)
    return plan, perm, e_sorted


out0 = jnp.asarray(rng.randn(N, D).astype(np.float32))
recv_full = jnp.asarray(recv)
chain_full = jnp.asarray(recv % np.int32(N))

# baseline: expand-gather only (the chain overhead to subtract)
t_gather = time_loop(lambda o: jnp.take(o, chain_full, axis=0)[:: E // N][:N], out0)
print(f"chain overhead (gather [E,{D}] + stride-slice): {t_gather:.3f} ms", flush=True)

# XLA scatter baselines
for red in ("sum", "max"):
    seg = jax.ops.segment_sum if red == "sum" else jax.ops.segment_max

    def body(o, seg=seg):
        data = jnp.take(o, chain_full, axis=0)
        return seg(data, recv_full, num_segments=N, indices_are_sorted=True)

    t = time_loop(body, out0)
    print(f"xla_{red} (sorted hint): {t - t_gather:.3f} ms (chain {t:.3f})", flush=True)

for R, TILE in [(256, 128), (256, 256), (256, 512), (256, 1024), (256, 2048),
                (512, 512), (512, 1024), (512, 2048), (512, 4096),
                (1024, 2048), (2048, 2048)]:
    try:
        plan, perm, e_sorted = make_identity_plan(R, TILE)
        nt = int(plan.tile_row_blocks.shape[0])
        chain_idx = jnp.asarray(np.arange(e_sorted, dtype=np.int32) % N)
        pad_mask = jnp.asarray((perm >= E))[:, None]

        def body_sum(o, p=plan, ci=chain_idx, pm=pad_mask):
            data = jnp.where(pm, 0.0, jnp.take(o, ci, axis=0))
            return sk.planned_segment_sum(data, None, p, N)

        t_sum = time_loop(body_sum, out0)

        def body_max(o, p=plan, ci=chain_idx, pm=pad_mask):
            data = jnp.where(pm, -sk._BIG, jnp.take(o, ci, axis=0))
            return sk.planned_segment_extremum(data, None, p, N, True)

        t_max = time_loop(body_max, out0)
        waste = (e_sorted - E) / E * 100
        print(
            f"R={R} TILE={TILE} steps={nt} pad={waste:.1f}%: "
            f"sum {t_sum - t_gather:.3f} ms  max {t_max - t_gather:.3f} ms",
            flush=True,
        )
    except Exception as e:
        print(f"R={R} TILE={TILE}: FAIL {str(e)[:120]}", flush=True)
