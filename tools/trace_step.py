import sys, time, glob, gzip, json, collections, argparse
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp
import optax

from ptgnn_tpu.graph.structs import BatchPadding
from ptgnn_tpu.implementations.typilus.harness import build_graph2class

ap = argparse.ArgumentParser()
ap.add_argument("--max-nodes", type=int, default=32768)
ap.add_argument("--edge-slots-per-node", type=float, default=8)
args = ap.parse_args()

max_nodes = args.max_nodes
padding = BatchPadding(
    max_nodes=max_nodes,
    max_edge_slots=int(max_nodes * args.edge_slots_per_node) // 128 * 128,
    max_graphs=max(8, max_nodes // 1024),
    edge_tile=128, agg_rows=256,
    reference_budgets=(("supernodes", max(512, max_nodes // 16)),
                       ("token-sequence", max_nodes)),
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

# parse trace: sum durations by op name on the device's "XLA Ops" thread only
files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files, file=sys.stderr)
if files:
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    xla_tids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            if "XLA Ops" in ev.get("args", {}).get("name", ""):
                xla_tids.add((ev.get("pid"), ev.get("tid")))
    durs = collections.Counter()
    counts = collections.Counter()
    total = 0
    for ev in events:
        if ev.get("ph") == "X" and "dur" in ev and (ev.get("pid"), ev.get("tid")) in xla_tids:
            name = ev.get("name", "?")
            durs[name] += ev["dur"]
            counts[name] += 1
            total += ev["dur"]
    print(f"device total {total/1000:.2f} ms over {sum(counts.values())} op launches")
    for name, d in durs.most_common(60):
        print(f"{d/1000:10.3f} ms  x{counts[name]:<4d} {name[:100]}")
