"""Copy-decoder training-loss parity vs the ACTUAL reference decoder
(/root/reference/ptgnn/neuralmodels/sequence/grucopydecoder.py:29-212),
running through the torch_scatter shim. Our dense padded copy-matrix
formulation must reproduce the reference's sparse flat-index loss exactly.
"""
import numpy as np
import torch
import jax.numpy as jnp

from tests.reference_parity.shims import install_reference_shims

install_reference_shims()

from ptgnn.neuralmodels.sequence.grucopydecoder import GruCopyingDecoder as RefDecoder  # noqa: E402

from tests.reference_parity.test_mp_vs_reference import j, sd  # noqa: E402
from tests.test_copydecoder import build_case  # noqa: E402


def test_copy_decoder_loss_vs_reference():
    model, data, inputs = build_case()
    module = model.build_neural_module()
    V, E, H, D = module.vocabulary_size, 10, 8, 7

    torch.manual_seed(0)
    ref = RefDecoder(
        vocabulary_size=V, embedding_size=E, hidden_size=H, memories_hidden_dim=D,
        unk_id=module.unk_id, dropout_rate=0.0,
    )
    ref.eval()

    rng = np.random.RandomState(1)
    counts = [len(i) for i in inputs]
    M_real = sum(counts)
    memories = rng.randn(M_real, D).astype(np.float32)
    init_states = rng.randn(len(data), H).astype(np.float32)
    origin = np.concatenate([[b] * c for b, c in enumerate(counts)]).astype(np.int64)

    tensorized = [model.tensorize(d) for d in data]
    S = model.max_seq_len
    tgt_ids = np.zeros((len(data), S), np.int64)
    lengths = np.zeros(len(data), np.int64)
    for i, t in enumerate(tensorized):
        tgt_ids[i, : len(t.token_ids)] = t.token_ids
        lengths[i] = t.length

    # Flat copy indices, exactly as the reference minibatcher builds them
    # (grucopydecoder.py:321-373): element index into copy_logprobs.flatten()
    # = memory_row * (S-1) + step; sample index = sample * (S-1) + step.
    mem_offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    copy_idxs, copy_sample_idxs = [], []
    for b, t in enumerate(tensorized):
        for step, local_idxs in enumerate(t.copyable_elements):
            for li in local_idxs:
                copy_idxs.append((mem_offsets[b] + li) * (S - 1) + step)
                copy_sample_idxs.append(b * (S - 1) + step)
    copy_idxs = torch.tensor(copy_idxs, dtype=torch.long)
    copy_sample_idxs = torch.tensor(copy_sample_idxs, dtype=torch.long)

    with torch.no_grad():
        expected = ref(
            input_memories=torch.tensor(memories),
            input_memories_origin_idx=torch.tensor(origin),
            initial_states=torch.tensor(init_states),
            target_token_ids=torch.tensor(tgt_ids),
            copyable_elements_idxs=copy_idxs,
            copyable_elements_sample_idxs=copy_sample_idxs,
            target_lengths=torch.tensor(lengths),
        ).item()

    # --- ours on padded arrays with the reference's weights ---
    w = sd(ref)
    mb = model.initialize_minibatch()
    for t in tensorized:
        model.extend_minibatch_with(t, mb)
    B_pad, M_pad = 5, 16
    fin = model.finalize_minibatch(mb, max_targets=B_pad, memories_budget=M_pad)

    mem_pad = np.zeros((M_pad, D), np.float32)
    mem_pad[:M_real] = memories
    origin_pad = np.full(M_pad, B_pad, np.int32)
    origin_pad[:M_real] = origin
    mem_mask = np.arange(M_pad) < M_real
    init_pad = np.zeros((B_pad, H), np.float32)
    init_pad[: len(data)] = init_states

    params = {
        "embedding": {"weight": j(w["embedding_layer.weight"])},
        "gru": {
            "weight_ih": j(w["output_gru.weight_ih_l0"]),
            "weight_hh": j(w["output_gru.weight_hh_l0"]),
            "bias_ih": j(w["output_gru.bias_ih_l0"]),
            "bias_hh": j(w["output_gru.bias_hh_l0"]),
        },
        "mem_to_std": {"weight": j(w["memories_to_standard_attention.weight"])},
        "mem_to_copy": {"weight": j(w["memories_to_copy_attention.weight"])},
        "hidden_to_vocab": j(w["hidden_to_vocab"]),
        "vocab_bias": j(w["vocab_bias"]),
    }
    loss, metrics = module.apply(
        params,
        input_memories=jnp.asarray(mem_pad),
        input_memories_origin_idx=jnp.asarray(origin_pad),
        memory_mask=jnp.asarray(mem_mask),
        initial_states=jnp.asarray(init_pad),
        target_token_ids=jnp.asarray(fin["target_token_ids"]),
        target_lengths=jnp.asarray(fin["target_lengths"]),
        copy_matrix=jnp.asarray(fin["copy_matrix"]),
    )
    assert int(metrics["num_sequences"]) == 3
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4, atol=1e-5)
