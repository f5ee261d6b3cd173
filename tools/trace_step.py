import sys, time, glob, gzip, json, collections
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp
import optax

from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.typilus.harness import build_graph2class

max_nodes = 32768
padding = BatchPadding(
    max_nodes=max_nodes, max_edge_slots=max_nodes*8, max_graphs=32,
    edge_tile=128, agg_rows=256,
    reference_budgets=(("supernodes", 2048), ("token-sequence", max_nodes)),
)
model, module, params, mbs = build_graph2class(
    padding=padding, num_metadata_graphs=40, mean_nodes=2500, max_graph_nodes=8000,
    hidden_state_size=64, num_minibatches=1, minibatch_size=300)
mb = jax.device_put(mbs[0])

optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2.5e-4))
opt_state = optimizer.init(params)

def _cast(tree, dtype):
    return jax.tree_util.tree_map(lambda x: x.astype(dtype) if hasattr(x,'dtype') and jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

def train_step(params, opt_state, mb, rng):
    def lf(p):
        loss, m = module.apply(_cast(p, jnp.bfloat16), **_cast(mb, jnp.bfloat16), train=True, rng=rng)
        return loss.astype(jnp.float32)
    loss, grads = jax.value_and_grad(lf)(params)
    grads = _cast(grads, jnp.float32)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss

step = jax.jit(train_step, donate_argnums=(0,1))
params, opt_state, loss = step(params, opt_state, mb, jax.random.PRNGKey(0))
float(loss)  # tunnel: only a D2H transfer truly synchronizes
t0=time.time()
for i in range(10):
    params, opt_state, loss = step(params, opt_state, mb, jax.random.PRNGKey(i))
print(f"10 steps: {(time.time()-t0)*100:.1f} ms/step (sync loss={float(loss):.4f}, total includes sync)", file=sys.stderr)

outdir = "/tmp/jax_trace"
with jax.profiler.trace(outdir):
    for i in range(2):
        params, opt_state, loss = step(params, opt_state, mb, jax.random.PRNGKey(100+i))
    float(loss)

# parse trace: sum durations by op name on the device track
files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files, file=sys.stderr)
if files:
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    durs = collections.Counter()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            durs[name] += ev["dur"]
    for name, d in durs.most_common(60):
        print(f"{d/1000:10.2f} ms  {name[:110]}")
