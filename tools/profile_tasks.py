#!/usr/bin/env python
"""Per-task device profiles: PPI / VarMisuse / Graph2Seq (+ typilus), at
their DEFAULT bench configs (VERDICT r4 item 5 — the flagship has a fully
mapped per-op composition; the other tasks had only a throughput row).

For each task this captures a 3-step trace of the same AMP train step
`tools/bench_all_tasks.py` measures and prints the profile_trace
aggregations (by op kind / source line) plus the roofline by-class table.

Run on TPU:  python tools/profile_tasks.py [task ...]
"""
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

STEPS = 3


def trace_task(name: str) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from tools.bench_all_tasks import BUILDERS, _cast

    tag, module, params, mb = BUILDERS[name]()
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt_state = opt.init(params)

    def train_step(params, opt_state, mb, rng):
        def lf(p):
            loss, _ = module.apply(
                _cast(p, jnp.bfloat16), **_cast(mb, jnp.bfloat16),
                train=True, rng=rng)
            return loss.astype(jnp.float32)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = opt.update(_cast(grads, jnp.float32), opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    mb = jax.device_put(mb)
    params, opt_state, loss = step(params, opt_state, mb, jax.random.PRNGKey(0))
    float(loss)  # tunnel: only a D2H read truly synchronizes
    outdir = tempfile.mkdtemp(prefix=f"ptgnn_trace_{name}_")
    with jax.profiler.trace(outdir):
        for i in range(STEPS):
            params, opt_state, loss = step(
                params, opt_state, mb, jax.random.PRNGKey(100 + i))
        float(loss)

    print(f"\n{'=' * 20} {tag} {'=' * 20}")
    from tools.profile_trace import report as pt_report
    from tools.roofline import report as rl_report

    pt_report(outdir, STEPS, top=10)
    rl_report(outdir, STEPS, peak_gbps=819.0, top=0)


def main():
    import jax

    print("backend:", jax.default_backend(), file=sys.stderr)
    tasks = sys.argv[1:] or ["ppi", "varmisuse", "graph2seq"]
    for t in tasks:
        trace_task(t)


if __name__ == "__main__":
    main()
