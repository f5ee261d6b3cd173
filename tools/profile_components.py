"""Component-level timing on the real chip: typed matmul, segment reductions,
MP layer, full train step."""
import time, sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np

def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000  # ms

def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    rng = np.random.RandomState(0)
    N, E, D, T, tile = 32768, 393216, 64, 21, 128
    x = jnp.asarray(rng.randn(E, D).astype(np.float32))
    x2 = jnp.asarray(rng.randn(E, 2*D).astype(np.float32))
    W = jnp.asarray(rng.randn(T, 2*D, D).astype(np.float32))
    tile_types = jnp.asarray(rng.randint(0, T, E//tile).astype(np.int32))
    senders = jnp.asarray(rng.randint(0, N, E).astype(np.int32))
    recv = jnp.asarray(np.sort(rng.randint(0, N, E)).astype(np.int32))
    recv_unsorted = jnp.asarray(rng.randint(0, N, E).astype(np.int32))
    mask = jnp.asarray(np.ones(E, bool))
    states = jnp.asarray(rng.randn(N, D).astype(np.float32))

    from ptgnn_tpu.ops.typed_linear import typed_tile_matmul
    from ptgnn_tpu.ops import segment_sum, segment_max

    f_gather = jax.jit(lambda s, idx: jnp.take(s, idx, axis=0))
    print(f"gather [E,D]: {timeit(f_gather, states, senders):.2f} ms")

    f_mm = jax.jit(lambda a, w, tt: typed_tile_matmul(a, w, tt, tile))
    print(f"typed_tile_matmul [E,2D]x[T,2D,D]: {timeit(f_mm, x2, W, tile_types):.2f} ms")

    f_plain = jax.jit(lambda a: a @ W[0])
    print(f"plain matmul [E,2D]@[2D,D]: {timeit(f_plain, x2):.2f} ms")

    f_ss = jax.jit(lambda d, i: segment_sum(d, i, N, mask))
    print(f"segment_sum unsorted: {timeit(f_ss, x, recv_unsorted):.2f} ms")
    print(f"segment_sum sorted ids: {timeit(f_ss, x, recv):.2f} ms")
    f_ss2 = jax.jit(lambda d, i: jax.ops.segment_sum(d, i, num_segments=N, indices_are_sorted=True))
    print(f"segment_sum sorted+flag: {timeit(f_ss2, x, recv):.2f} ms")

    f_sm = jax.jit(lambda d, i: segment_max(d, i, N, mask))
    print(f"segment_max unsorted: {timeit(f_sm, x, recv_unsorted):.2f} ms")
    print(f"segment_max sorted: {timeit(f_sm, x, recv):.2f} ms")

    # backward of segment ops
    f_ssg = jax.jit(jax.grad(lambda d: segment_sum(d, recv_unsorted, N, mask).sum()))
    print(f"segment_sum grad: {timeit(f_ssg, x):.2f} ms")
    f_smg = jax.jit(jax.grad(lambda d: segment_max(d, recv_unsorted, N, mask).sum()))
    print(f"segment_max grad: {timeit(f_smg, x):.2f} ms")

    # one MlpMessagePassingLayer fwd+bwd
    from ptgnn_tpu.graph.messagepassing import MlpMessagePassingLayer, GraphContext
    from ptgnn_tpu.graph.structs import AdjacencyStruct
    adj = AdjacencyStruct(senders=senders, receivers=recv_unsorted,
        edge_types=jnp.repeat(tile_types, tile), tile_types=tile_types, mask=mask)
    ctx = GraphContext(adjacency=adj, edge_features=None,
        node_graph=jnp.zeros(N, jnp.int32), node_mask=jnp.ones(N, bool),
        graph_mask=jnp.ones(8, bool), references={})
    layer = MlpMessagePassingLayer(input_state_dimension=D, output_state_dimension=D,
        message_dimension=D, num_edge_types=T, message_aggregation_function="max")
    p = layer.init(jax.random.PRNGKey(0))
    f_layer = jax.jit(lambda p, s: layer.apply(p, s, ctx))
    print(f"MLP-MP layer fwd (max agg): {timeit(f_layer, p, states):.2f} ms")
    f_layerg = jax.jit(lambda p, s: jax.grad(lambda ss: layer.apply(p, ss, ctx).sum())(s))
    print(f"MLP-MP layer bwd (max agg): {timeit(f_layerg, p, states):.2f} ms")
    layer2 = MlpMessagePassingLayer(input_state_dimension=D, output_state_dimension=D,
        message_dimension=D, num_edge_types=T, message_aggregation_function="sum")
    p2 = layer2.init(jax.random.PRNGKey(0))
    f_layer2 = jax.jit(lambda p, s: layer2.apply(p, s, ctx))
    print(f"MLP-MP layer fwd (sum agg): {timeit(f_layer2, p2, states):.2f} ms")

if __name__ == "__main__":
    main()
