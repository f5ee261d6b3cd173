"""Batched Luong-style attention with length masking
(reference: ptgnn/neuralmodels/sequence/luongattention.py:6-68; note the
reference references an undefined ``self.device`` — a latent bug — and is
unused by the four tasks; provided for API completeness)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ptgnn_tpu.nn.layers import Linear
from ptgnn_tpu.nn.module import Module, Params


class LuongAttentionModule(Module):
    """Luong attention that also includes the targets-lookup inner product."""

    def __init__(
        self, memories_hidden_dimension: int, lookup_hidden_dimension: int, output_size: int
    ):
        self.memories_hidden_dimension = memories_hidden_dimension
        self.lookup_hidden_dimension = lookup_hidden_dimension
        self.out_layer = Linear(
            memories_hidden_dimension + lookup_hidden_dimension, output_size, use_bias=False
        )

    def init(self, key: jax.Array) -> Params:
        k1, k2 = jax.random.split(key)
        return {
            "Whd": jax.random.normal(
                k1, (self.memories_hidden_dimension, self.lookup_hidden_dimension)
            ),
            "Wout": self.out_layer.init(k2),
        }

    def get_attention_vector(self, params, lookup_vectors, memories, memories_length):
        """memories [B, L_in, H]; lengths [B]; lookups [B, L_out, D]
        -> attention [B, L_out, L_in]."""
        memories_in_d = jnp.einsum("blh,hd->bld", memories, params["Whd"])
        logits = jnp.einsum("bld,bqd->bql", memories_in_d, lookup_vectors)
        mask = (
            jnp.arange(memories.shape[1])[None, :] >= memories_length[:, None]
        )[:, None, :]  # [B, 1, L_in]
        logits = jnp.where(mask, -jnp.inf, logits)
        probs = jax.nn.softmax(logits, axis=-1)
        # All-masked rows (zero-length memories) -> zero attention, no NaNs.
        return jnp.where(jnp.isnan(probs), jnp.zeros((), probs.dtype), probs)

    def apply(self, params: Params, *, memories, memories_length, lookup_vectors):
        out, _ = self.forward_with_attention_vec(
            params,
            memories=memories,
            memories_length=memories_length,
            lookup_vectors=lookup_vectors,
        )
        return out

    def forward_with_attention_vec(
        self, params: Params, *, memories, memories_length, lookup_vectors
    ):
        attention = self.get_attention_vector(params, lookup_vectors, memories, memories_length)
        contexts = jnp.einsum("blq,bqh->blh", attention, memories)
        hc = jnp.concatenate([contexts, lookup_vectors], axis=-1)
        return jnp.tanh(self.out_layer.apply(params["Wout"], hc)), attention
