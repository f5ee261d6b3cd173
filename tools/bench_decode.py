"""Greedy-decode throughput: device-resident lax.scan decoder vs the
reference-shaped host loop (one D2H sync per step). Run on the real chip.
"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np

from ptgnn_tpu.sequence.grucopydecoder import DecoderData, GruCopyingDecoderModel


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    vocab = [f"tok{i}" for i in range(200)]
    B, MEM_PER, D, H = 64, 48, 128, 128
    data = [
        DecoderData(
            input_elements=[vocab[rng.randint(len(vocab))] for _ in range(MEM_PER)],
            target_data=[vocab[rng.randint(len(vocab))] for _ in range(6)],
        )
        for _ in range(B)
    ]
    model = GruCopyingDecoderModel(
        max_seq_len=8, hidden_size=H, embedding_size=128, memories_hidden_dim=D,
        vocabulary_count_threshold=1, dropout_rate=0.0,
    )
    model.compute_metadata(iter(data), parallelize=False)
    module = model.build_neural_module()
    params = module.init(jax.random.PRNGKey(0))

    M = B * MEM_PER
    memories = jnp.asarray(rng.randn(M, D).astype(np.float32))
    origin = jnp.asarray(np.repeat(np.arange(B, dtype=np.int32), MEM_PER))
    mem_mask = jnp.ones(M, bool)
    init = jnp.asarray(rng.randn(B, H).astype(np.float32))
    flat_values = [v for d in data for v in d.input_elements]

    kwargs = dict(
        input_concrete_values=flat_values, input_memories=memories,
        input_memories_origin_idx=origin, memory_mask=mem_mask,
        initial_states=init, params=params, neural_module=module,
        num_real_targets=B,
    )
    for name, dev in (("device", True), ("host", False)):
        model.greedy_decode(**kwargs, device_resident=dev)  # warm compile
        t0 = time.time()
        n_rounds = 10
        for _ in range(n_rounds):
            out = model.greedy_decode(**kwargs, device_resident=dev)
        dt = (time.time() - t0) / n_rounds
        print(
            f"{name}: {dt*1000:.1f} ms/batch ({B/dt:.0f} seqs/s, "
            f"{B*model.max_seq_len/dt:.0f} steps/s)", flush=True,
        )

    for k in (4,):  # one width: the k=8 scan's compile alone is minutes
        model.beam_decode(beam_size=k, **kwargs)  # warm compile
        t0 = time.time()
        n_rounds = 10
        for _ in range(n_rounds):
            model.beam_decode(beam_size=k, **kwargs)
        dt = (time.time() - t0) / n_rounds
        print(
            f"beam k={k}: {dt*1000:.1f} ms/batch ({B/dt:.0f} seqs/s, "
            f"{B*k*model.max_seq_len/dt:.0f} beam-steps/s)", flush=True,
        )


if __name__ == "__main__":
    main()
