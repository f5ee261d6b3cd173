"""GRU sequence decoder with a copy mechanism over variable-sized memory sets.

TPU-native re-design of the reference decoder
(ptgnn/neuralmodels/sequence/grucopydecoder.py:29-457). The joint
vocab-or-copy distribution is computed exactly as the reference does —
per-(sample, step) segment log-softmax over flattened memories, logsumexp
normalization over vocab scores + total copy score — but over statically
padded arrays:

* memories are a padded [M_pad, D] array with ``origin_idx``/``mask``
  (padding memories contribute -inf to every softmax, i.e. nothing);
* the reference's sparse ``copyable_elements_idxs`` flat-index arrays
  (grucopydecoder.py:321-373) become a dense boolean ``copy_matrix``
  [M_pad, S-1]: entry (m, t) says memory m's string equals its sample's
  target token t+1. The marginalize-over-copy-positions loss is then one
  masked segment-logsumexp — no host-built index arithmetic, same math;
* the GRU runs as a ``lax.scan``; teacher forcing is one compiled program.

Numerics: eps=0 semantics throughout (-inf for impossible actions,
empty copy sets -> -inf total copy score), fp32 score accumulation.
"""
from __future__ import annotations

import logging
from collections import Counter
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ptgnn_tpu.core.model import AbstractNeuralModel
from ptgnn_tpu.nn.layers import GRU, Embedding, Linear, dropout
from ptgnn_tpu.nn.module import Module, Params, fold
from ptgnn_tpu.ops.segment import segment_log_softmax, segment_logsumexp, segment_sum
from ptgnn_tpu.utils.text import Vocabulary

LOGGER = logging.getLogger(__name__)


class DecoderData(NamedTuple):
    input_elements: List[str]
    target_data: List[str]


class TokenizedOutput(NamedTuple):
    token_ids: List[int]
    length: int
    num_input_elements: int
    # Per decoding step, indices of input elements equal to the target token.
    copyable_elements: List[np.ndarray]


class GruCopyingDecoder(Module):
    def __init__(
        self,
        vocabulary_size: int,
        embedding_size: int,
        hidden_size: int,
        memories_hidden_dim: int,
        unk_id: int,
        dropout_rate: float,
    ):
        self.vocabulary_size = vocabulary_size
        self.embedding_size = embedding_size
        self.hidden_size = hidden_size
        self.unk_id = unk_id
        self.dropout_rate = dropout_rate
        self.embedding = Embedding(vocabulary_size, embedding_size)  # torch default N(0,1)
        self.gru = GRU(embedding_size, hidden_size)
        self.memories_to_standard_attention = Linear(
            memories_hidden_dim, hidden_size, use_bias=False
        )
        self.memories_to_copy_attention = Linear(memories_hidden_dim, hidden_size, use_bias=False)

    def init(self, key: jax.Array) -> Params:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        return {
            "embedding": self.embedding.init(k1),
            "gru": self.gru.init(k2),
            "mem_to_std": self.memories_to_standard_attention.init(k3),
            "mem_to_copy": self.memories_to_copy_attention.init(k4),
            # Reference: 0.01 * randn (grucopydecoder.py:54), zeros bias.
            "hidden_to_vocab": 0.01
            * jax.random.normal(k5, (2 * self.hidden_size, self.embedding_size)),
            "vocab_bias": jnp.zeros((self.vocabulary_size,)),
        }

    def _compute_logprobs(
        self,
        params: Params,
        initial_states: jax.Array,  # [B, H]
        input_memories: jax.Array,  # [M, D]
        input_memories_origin_idx: jax.Array,  # [M] in [0, B) (padding: B)
        memory_mask: jax.Array,  # [M] bool
        input_token_ids: jax.Array,  # [B, T]
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        """Returns (copy_logprobs [M, T], target_logprobs [B, T, V],
        final GRU state [B, H]). Mirrors grucopydecoder.py:59-142."""
        num_targets = initial_states.shape[0]
        emb = self.embedding.apply(params["embedding"], input_token_ids)
        emb = dropout(fold(rng, 0), emb, self.dropout_rate, train)
        output_states, final_state = self.gru.apply(params["gru"], emb, initial_states)
        output_states = output_states.astype(jnp.float32)  # [B, T, H]

        std_reps = self.memories_to_standard_attention.apply(
            params["mem_to_std"], input_memories
        ).astype(jnp.float32)  # [M, H]
        copy_reps = self.memories_to_copy_attention.apply(
            params["mem_to_copy"], input_memories
        )
        copy_reps = dropout(fold(rng, 1), copy_reps, self.dropout_rate, train).astype(
            jnp.float32
        )

        safe_origin = jnp.minimum(input_memories_origin_idx, num_targets - 1)
        out_per_input = jnp.take(output_states, safe_origin, axis=0)  # [M, T, H]
        std_scores = jnp.einsum("mth,mh->mt", out_per_input, std_reps)
        copy_scores = jnp.einsum("mth,mh->mt", out_per_input, copy_reps)

        std_logprobs = segment_log_softmax(
            std_scores, input_memories_origin_idx, num_targets, mask=memory_mask
        )  # [M, T]
        std_att_mul = jnp.exp(std_logprobs)[..., None] * std_reps[:, None, :]
        std_att_out = segment_sum(
            std_att_mul, input_memories_origin_idx, num_targets, mask=memory_mask
        )  # [B, T, H]

        concat = jnp.concatenate(
            [
                dropout(fold(rng, 2), std_att_out, self.dropout_rate, train),
                output_states,
            ],
            axis=-1,
        )  # [B, T, 2H]
        emb_weight = dropout(
            fold(rng, 3), params["embedding"]["weight"], self.dropout_rate, train
        ).astype(jnp.float32)
        target_scores = (
            jnp.einsum(
                "bth,he,ve->btv",
                concat,
                params["hidden_to_vocab"].astype(jnp.float32),
                emb_weight,
            )
            + params["vocab_bias"].astype(jnp.float32)
        )  # [B, T, V]

        total_copy_scores = segment_logsumexp(
            copy_scores, input_memories_origin_idx, num_targets, mask=memory_mask
        )  # [B, T] (-inf where a sample has no memories)
        all_scores = jnp.concatenate(
            [target_scores, total_copy_scores[..., None]], axis=-1
        )
        # Manual logsumexp tolerating the -inf copy column. The shift must
        # include the copy score when it is finite (the reference's
        # torch.logsumexp shifts by the max over ALL columns): shifting by
        # the vocab max alone overflows exp() whenever the total copy score
        # dominates by ~88, collapsing every logprob to -inf mid-training.
        shift = jnp.maximum(
            jnp.max(target_scores, axis=-1),
            jnp.where(
                jnp.isfinite(total_copy_scores),
                total_copy_scores,
                -jnp.inf,
            ),
        )
        normalizing_const = (
            jnp.log(jnp.sum(jnp.exp(all_scores - shift[..., None]), axis=-1)) + shift
        )  # [B, T]

        target_logprobs = target_scores - normalizing_const[..., None]
        copy_logprobs = copy_scores - jnp.take(
            normalizing_const, safe_origin, axis=0
        )  # [M, T]
        return copy_logprobs, target_logprobs, final_state

    def apply(
        self,
        params: Params,
        *,
        input_memories: jax.Array,  # [M, D]
        input_memories_origin_idx: jax.Array,  # [M]
        memory_mask: jax.Array,  # [M]
        initial_states: jax.Array,  # [B, H]
        target_token_ids: jax.Array,  # [B, S]
        target_lengths: jax.Array,  # [B]
        copy_matrix: jax.Array,  # [M, S-1] bool
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        """Copy-marginalized NLL (reference: grucopydecoder.py:145-212).
        Returns (loss, metrics). Rows with length 0 are padding."""
        copy_logprobs, target_logprobs, _ = self._compute_logprobs(
            params,
            initial_states,
            input_memories,
            input_memories_origin_idx,
            memory_mask,
            target_token_ids[:, :-1],
            train=train,
            rng=rng,
        )
        num_targets, s = target_token_ids.shape
        neg_inf = jnp.float32(-jnp.inf)

        valid_copy = jnp.logical_and(copy_matrix, memory_mask[:, None])  # [M, S-1]
        # f32 so the few-segment one-hot matmul route applies (exact: counts
        # are integers far below f32's 2^24 integer range).
        num_valid_copy = segment_sum(
            valid_copy.astype(jnp.float32), input_memories_origin_idx, num_targets
        )  # [B, S-1]
        # UNK is only a correct generation when nothing can be copied
        # (grucopydecoder.py:170-186).
        unk_locations = target_token_ids[:, 1:] == self.unk_id
        gen_blocked = jnp.logical_and(num_valid_copy > 0, unk_locations)

        correct_generation = jnp.take_along_axis(
            target_logprobs, target_token_ids[:, 1:, None], axis=-1
        )[..., 0]  # [B, S-1]
        correct_generation = jnp.where(gen_blocked, neg_inf, correct_generation)

        correct_copy = segment_logsumexp(
            jnp.where(valid_copy, copy_logprobs, neg_inf),
            input_memories_origin_idx,
            num_targets,
            mask=memory_mask,
        )  # [B, S-1]

        any_correct = jnp.logaddexp(correct_generation, correct_copy)
        step_mask = jnp.arange(s - 1)[None, :] < target_lengths[:, None]
        row_valid = target_lengths > 0
        per_seq = jnp.sum(jnp.where(step_mask, any_correct, 0.0), axis=-1) / jnp.maximum(
            jnp.sum(step_mask, axis=-1), 1
        )
        num_rows = jnp.maximum(jnp.sum(row_valid), 1)
        loss = -jnp.sum(jnp.where(row_valid, per_seq, 0.0)) / num_rows.astype(jnp.float32)
        return loss, {"num_sequences": jnp.sum(row_valid)}


class GruCopyingDecoderModel(
    AbstractNeuralModel[DecoderData, TokenizedOutput, GruCopyingDecoder]
):
    """Host side: output vocabulary, tensorization of targets + copyable
    positions, statically padded minibatching
    (reference: grucopydecoder.py:215-373)."""

    def __init__(
        self,
        *,
        max_seq_len: int = 8,
        hidden_size: int = 128,
        embedding_size: int = 256,
        memories_hidden_dim: int = 128,
        vocabulary_max_size: int = 20000,
        vocabulary_count_threshold: int = 5,
        dropout_rate: float = 0.2,
    ):
        super().__init__()
        self.max_seq_len = max_seq_len
        self.hidden_size = hidden_size
        self.embedding_size = embedding_size
        self.memories_hidden_dim = memories_hidden_dim
        self.vocabulary_max_size = vocabulary_max_size
        self.vocabulary_count_threshold = vocabulary_count_threshold
        self.dropout_rate = dropout_rate

    @property
    def END(self) -> str:
        return "%END%"

    @property
    def START(self) -> str:
        return "%START%"

    # ---- metadata ----
    def initialize_metadata(self) -> None:
        self.__token_counter: Counter = Counter()

    def update_metadata_from(self, datapoint: DecoderData) -> None:
        self.__token_counter.update(datapoint.target_data)

    def finalize_metadata(self) -> None:
        self.__token_counter[self.START] = 1000000
        self.__token_counter[self.END] = 1000000
        self.__output_vocabulary = Vocabulary.create_vocabulary(
            self.__token_counter,
            max_size=self.vocabulary_max_size,
            count_threshold=self.vocabulary_count_threshold,
        )
        LOGGER.info("Output vocabulary Size %s", len(self.__output_vocabulary))
        del self.__token_counter

    @property
    def vocabulary(self) -> Vocabulary:
        return self.__output_vocabulary

    def build_neural_module(self) -> GruCopyingDecoder:
        return GruCopyingDecoder(
            vocabulary_size=len(self.__output_vocabulary),
            embedding_size=self.embedding_size,
            hidden_size=self.hidden_size,
            memories_hidden_dim=self.memories_hidden_dim,
            unk_id=self.__output_vocabulary.get_id_or_unk(Vocabulary.get_unk()),
            dropout_rate=self.dropout_rate,
        )

    # ---- tensorization (reference: grucopydecoder.py:278-301) ----
    def tensorize(self, datapoint: DecoderData) -> TokenizedOutput:
        target_with_start_end = [self.START] + list(datapoint.target_data) + [self.END]
        target_with_start_end = target_with_start_end[: self.max_seq_len]
        seq_len = len(target_with_start_end)
        return TokenizedOutput(
            token_ids=self.__output_vocabulary.get_id_or_unk_multiple(target_with_start_end),
            length=seq_len,
            num_input_elements=len(datapoint.input_elements),
            copyable_elements=[
                np.array(
                    [
                        i
                        for i, input_element in enumerate(datapoint.input_elements)
                        if input_element == target_token
                    ],
                    dtype=np.int32,
                )
                for target_token in target_with_start_end[1:]
            ],
        )

    # ---- minibatching ----
    def initialize_minibatch(self) -> Dict[str, Any]:
        return {
            "target_token_ids": [],
            "target_seq_lengths": [],
            "copyable_elements_idxs": [],
            "num_input_elements": [],
        }

    def extend_minibatch_with(self, tensorized_datapoint, partial_minibatch) -> bool:
        partial_minibatch["target_token_ids"].append(tensorized_datapoint.token_ids)
        partial_minibatch["target_seq_lengths"].append(tensorized_datapoint.length)
        partial_minibatch["copyable_elements_idxs"].append(
            tensorized_datapoint.copyable_elements
        )
        partial_minibatch["num_input_elements"].append(
            tensorized_datapoint.num_input_elements
        )
        return True

    def finalize_minibatch(
        self,
        accumulated_minibatch_data: Dict[str, Any],
        max_targets: Optional[int] = None,
        memories_budget: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Pad targets to [max_targets, S]; build the dense copy matrix
        [memories_budget, S-1] assuming each sample's memories occupy a
        contiguous run of slots in extension order (the GNN batcher's
        reference-set layout guarantees this)."""
        s = self.max_seq_len
        num_samples = len(accumulated_minibatch_data["target_token_ids"])
        b = max_targets if max_targets is not None else num_samples
        m = (
            memories_budget
            if memories_budget is not None
            else int(sum(accumulated_minibatch_data["num_input_elements"]))
        )

        target_token_ids = np.zeros((b, s), np.int32)
        target_lengths = np.zeros(b, np.int32)
        copy_matrix = np.zeros((m, s - 1), bool)

        offset = 0
        for sample_idx, (token_ids, copyables, num_inputs) in enumerate(
            zip(
                accumulated_minibatch_data["target_token_ids"],
                accumulated_minibatch_data["copyable_elements_idxs"],
                accumulated_minibatch_data["num_input_elements"],
            )
        ):
            target_token_ids[sample_idx, : len(token_ids)] = token_ids
            target_lengths[sample_idx] = accumulated_minibatch_data["target_seq_lengths"][
                sample_idx
            ]
            for t, idxs in enumerate(copyables):
                if len(idxs):
                    copy_matrix[offset + idxs, t] = True
            offset += num_inputs

        return {
            "target_token_ids": target_token_ids,
            "target_lengths": target_lengths,
            "copy_matrix": copy_matrix,
        }

    # ---- inference (reference: grucopydecoder.py:375-457) ----
    def greedy_decode(
        self,
        *,
        input_concrete_values: List[str],
        input_memories,
        input_memories_origin_idx,
        memory_mask,
        initial_states,
        params: Params,
        neural_module: GruCopyingDecoder,
        num_real_targets: Optional[int] = None,
        device_resident: bool = True,
        top_k: int = 100,
        temperature: float = 0.0,
        rng: Optional[jax.Array] = None,
    ) -> List[Tuple[List[str], float]]:
        """Greedy decoding with copy-by-string merging.

        ``device_resident=True`` (default) runs the ENTIRE decode as one
        compiled ``lax.scan`` — no device->host round-trip per step (the
        reference synchronizes every step, grucopydecoder.py:407-455). The
        string-keyed copy merge becomes a device op via host-precomputed
        string-group ids; the merge is exact over the full vocabulary.

        ``device_resident=False`` keeps the reference-shaped host loop
        (top-``top_k`` vocab merge) as the behavioral oracle.

        ``temperature > 0`` switches the device path from argmax to
        Gumbel-max sampling over the same joint distribution (requires
        ``rng``); reported logprobs are the true scores of the sampled
        actions.
        """
        if device_resident:
            return self._greedy_decode_device(
                input_concrete_values=input_concrete_values,
                input_memories=input_memories,
                input_memories_origin_idx=input_memories_origin_idx,
                memory_mask=memory_mask,
                initial_states=initial_states,
                params=params,
                neural_module=neural_module,
                num_real_targets=num_real_targets,
                temperature=temperature,
                rng=rng,
            )
        assert temperature == 0.0, "sampling is only implemented device-resident"
        return self._greedy_decode_host(
            input_concrete_values=input_concrete_values,
            input_memories=input_memories,
            input_memories_origin_idx=input_memories_origin_idx,
            memory_mask=memory_mask,
            initial_states=initial_states,
            params=params,
            neural_module=neural_module,
            num_real_targets=num_real_targets,
            top_k=top_k,
        )

    def _build_copy_groups(
        self, input_concrete_values, input_memories_origin_idx, memory_mask,
        batch_size: int, b_pad: int, unk_id: int,
    ):
        """Host-side copy groups: one group per distinct (sample, concrete
        string); memories map onto groups so the device merges copy mass per
        STRING (all positions holding the same string are one candidate)."""
        output_vocab = self.__output_vocabulary
        real_memory_slots = np.where(np.asarray(memory_mask))[0]
        assert len(real_memory_slots) == len(input_concrete_values), (
            len(real_memory_slots),
            len(input_concrete_values),
        )
        origin_np = np.asarray(input_memories_origin_idx)
        m_pad = origin_np.shape[0]

        group_of: Dict[Tuple[int, str], int] = {}
        group_strings: List[str] = []
        group_sample_l: List[int] = []
        group_vocab_l: List[int] = []
        mem_group = np.full(m_pad, 0, np.int32)
        mem_group_mask = np.zeros(m_pad, bool)
        for slot, concrete in zip(real_memory_slots, input_concrete_values):
            bi = int(origin_np[slot])
            if bi >= batch_size:
                continue
            key = (bi, concrete)
            if key not in group_of:
                group_of[key] = len(group_strings)
                group_strings.append(concrete)
                group_sample_l.append(bi)
                vid = output_vocab.get_id_or_unk(concrete)
                # UNK id means out-of-vocab UNLESS the string is the UNK
                # token itself; OOV groups stand alone as candidates.
                is_oov = vid == unk_id and concrete != Vocabulary.get_unk()
                group_vocab_l.append(-1 if is_oov else vid)
            mem_group[slot] = group_of[key]
            mem_group_mask[slot] = True
        # Round the group budget up to a power of two: g_pad is
        # data-dependent, and the jitted scans are cached per static shape —
        # bucketing bounds the number of compilations per run at
        # log2(max groups) instead of one per evaluation minibatch.
        g_pad = 1 << (max(1, len(group_strings)) - 1).bit_length()
        group_sample = np.full(g_pad, b_pad, np.int32)
        group_vocab = np.full(g_pad, -1, np.int32)
        group_sample[: len(group_sample_l)] = group_sample_l
        group_vocab[: len(group_vocab_l)] = group_vocab_l
        group_valid = np.arange(g_pad) < len(group_strings)
        return (
            mem_group, mem_group_mask, group_sample, group_vocab, group_valid,
            group_strings, g_pad, m_pad,
        )

    def _greedy_decode_device(
        self,
        *,
        input_concrete_values: List[str],
        input_memories,
        input_memories_origin_idx,
        memory_mask,
        initial_states,
        params: Params,
        neural_module: GruCopyingDecoder,
        num_real_targets: Optional[int] = None,
        temperature: float = 0.0,
        rng: Optional[jax.Array] = None,
    ) -> List[Tuple[List[str], float]]:
        """Device-resident decode: host precomputes per-memory string-group
        ids (one group per distinct concrete string per sample), the device
        loop merges group copy mass into vocab scores with segment ops and
        picks the argmax action per step inside one ``lax.scan``."""
        output_vocab = self.__output_vocabulary
        b_pad = initial_states.shape[0]
        batch_size = int(num_real_targets) if num_real_targets is not None else b_pad
        vocab_size = neural_module.vocabulary_size
        end_id = output_vocab.get_id_or_unk(self.END)
        unk_id = neural_module.unk_id
        s = self.max_seq_len

        (
            mem_group, mem_group_mask, group_sample, group_vocab, group_valid,
            group_strings, g_pad, m_pad,
        ) = self._build_copy_groups(
            input_concrete_values, input_memories_origin_idx, memory_mask,
            batch_size, b_pad, unk_id,
        )

        temp = float(temperature)

        def decode(params, init_states, memories, origin, mem_mask, mem_grp,
                   mem_grp_mask, grp_sample, grp_vocab, grp_valid, start_tokens,
                   step_keys):
            neg_inf = jnp.float32(-jnp.inf)
            in_vocab = jnp.logical_and(grp_valid, grp_vocab >= 0)
            # flat (sample, vocab) index per in-vocab group; OOR for others
            flat_idx = jnp.where(
                in_vocab, grp_sample * vocab_size + jnp.maximum(grp_vocab, 0),
                b_pad * vocab_size,
            )
            oov_mask = jnp.logical_and(grp_valid, grp_vocab < 0)
            # dense [B_pad, G_pad] sample-membership for the OOV candidates
            sample_onehot = (
                grp_sample[None, :] == jnp.arange(b_pad, dtype=jnp.int32)[:, None]
            )

            def step(carry, key):
                states, next_tokens, done, logps = carry
                copy_lp, target_lp, states = neural_module._compute_logprobs(
                    params, states, memories, origin, mem_mask, next_tokens
                )
                copy_lp = copy_lp[:, 0]  # [M]
                target_lp = target_lp[:, 0]  # [B_pad, V]
                group_copy = segment_logsumexp(
                    copy_lp, mem_grp, g_pad, mask=mem_grp_mask
                )  # [G_pad] (-inf for empty groups)
                # merge in-vocab groups' copy mass into the vocab scores
                copy_into_vocab = segment_logsumexp(
                    group_copy, flat_idx, b_pad * vocab_size, mask=in_vocab
                ).reshape(b_pad, vocab_size)
                merged_vocab = jnp.logaddexp(target_lp, copy_into_vocab)
                # OOV string groups are standalone candidates per sample
                oov_scores = jnp.where(
                    jnp.logical_and(sample_onehot, oov_mask[None, :]),
                    group_copy[None, :],
                    neg_inf,
                )  # [B_pad, G_pad]
                cand = jnp.concatenate([merged_vocab, oov_scores], axis=1)
                if temp > 0.0:
                    # Gumbel-max: argmax(cand + T*gumbel) samples
                    # proportionally to exp(cand / T); -inf (masked)
                    # candidates stay -inf. logps still accumulate the TRUE
                    # logprob of the sampled action.
                    u = jax.random.uniform(key, cand.shape, minval=1e-20, maxval=1.0)
                    gumbel = -jnp.log(-jnp.log(u))
                    choose = cand + jnp.asarray(temp, cand.dtype) * gumbel
                else:
                    choose = cand
                winner = jnp.argmax(choose, axis=1)  # [B_pad]
                winner_score = jnp.take_along_axis(cand, winner[:, None], axis=1)[:, 0]
                is_vocab_win = winner < vocab_size
                feed = jnp.where(is_vocab_win, winner, unk_id).astype(jnp.int32)
                chose_end = jnp.logical_and(is_vocab_win, winner == end_id)
                emitted = jnp.where(done, -1, winner.astype(jnp.int32))
                logps = logps + jnp.where(done, 0.0, winner_score)
                done_next = jnp.logical_or(done, chose_end)
                next_tokens = jnp.where(done_next, end_id, feed)[:, None]
                return (states, next_tokens, done_next, logps), emitted

            init = (
                init_states,
                start_tokens,
                jnp.zeros((b_pad,), bool),
                jnp.zeros((b_pad,), jnp.float32),
            )
            (_, _, _, logps), emitted = jax.lax.scan(step, init, step_keys)
            return emitted, logps  # [S, B_pad], [B_pad]

        start_tokens = jnp.full(
            (b_pad, 1), output_vocab.get_id_or_unk(self.START), jnp.int32
        )
        # Reuse the compiled scan across minibatches: the closure only
        # depends on these statics (plus neural_module/self config), so a
        # fresh jit per call would re-trace and re-compile the whole
        # max_seq_len-step loop for every evaluation batch.
        if temp > 0.0:
            assert rng is not None, "sampling (temperature > 0) needs an rng key"
            step_keys = jax.random.split(rng, s)
        else:
            step_keys = jnp.zeros((s, 2), jnp.uint32)
        cache_key = (
            id(neural_module), b_pad, m_pad, g_pad, vocab_size, s, end_id,
            unk_id, temp, tuple(np.shape(input_memories)),
            tuple(np.shape(initial_states)),
        )
        cache = getattr(self, "_decode_jit_cache", None)
        if cache is None:
            cache = {}
            self._decode_jit_cache = cache
        jitted = cache.get(cache_key)
        if jitted is None:
            jitted = jax.jit(decode)
            cache[cache_key] = jitted
        emitted, logps = jitted(
            params,
            initial_states,
            input_memories,
            jnp.asarray(input_memories_origin_idx),
            jnp.asarray(memory_mask),
            jnp.asarray(mem_group),
            jnp.asarray(mem_group_mask),
            jnp.asarray(group_sample),
            jnp.asarray(group_vocab),
            jnp.asarray(group_valid),
            start_tokens,
            step_keys,
        )
        emitted = np.asarray(emitted)  # the ONLY device->host transfer
        logps = np.asarray(logps)

        results: List[Tuple[List[str], float]] = []
        for bi in range(batch_size):
            tokens: List[str] = []
            for t in range(s):
                wid = int(emitted[t, bi])
                if wid < 0:
                    break
                if wid < vocab_size:
                    if wid == end_id:
                        break
                    tokens.append(output_vocab.get_name_for_id(wid))
                else:
                    tokens.append(group_strings[wid - vocab_size])
            results.append((tokens, float(logps[bi])))
        return results

    def beam_decode(
        self,
        *,
        beam_size: int,
        input_concrete_values: List[str],
        input_memories,
        input_memories_origin_idx,
        memory_mask,
        initial_states,
        params: Params,
        neural_module: GruCopyingDecoder,
        num_real_targets: Optional[int] = None,
    ) -> List[List[Tuple[List[str], float]]]:
        """Device-resident beam search (the reference only ships greedy,
        grucopydecoder.py:375-457 — this is a beyond-parity capability).

        Per sample, keeps the ``beam_size`` highest-logprob partial
        sequences over the joint vocab ∪ copy-group candidate space (the
        same exact full-vocabulary copy merge as the greedy decoder), runs
        the whole search inside one ``lax.scan``, and backtracks the
        (action, parent) trace on the host. Finished beams are frozen with
        a zero-cost END self-transition so their scores stay comparable.
        Returns, per sample, the beams best-first as (tokens, logprob).
        """
        assert beam_size >= 1
        k = beam_size
        output_vocab = self.__output_vocabulary
        b_pad = initial_states.shape[0]
        batch_size = int(num_real_targets) if num_real_targets is not None else b_pad
        vocab_size = neural_module.vocabulary_size
        end_id = output_vocab.get_id_or_unk(self.END)
        unk_id = neural_module.unk_id
        s = self.max_seq_len

        (
            mem_group, mem_group_mask, group_sample, group_vocab, group_valid,
            group_strings, g_pad, m_pad,
        ) = self._build_copy_groups(
            input_concrete_values, input_memories_origin_idx, memory_mask,
            batch_size, b_pad, unk_id,
        )
        n_cand = vocab_size + g_pad

        def decode(params, init_states, memories, origin, mem_mask, mem_grp,
                   mem_grp_mask, grp_sample, grp_vocab, grp_valid, start_tokens):
            neg_inf = jnp.float32(-jnp.inf)
            in_vocab = jnp.logical_and(grp_valid, grp_vocab >= 0)
            flat_idx = jnp.where(
                in_vocab, grp_sample * vocab_size + jnp.maximum(grp_vocab, 0),
                b_pad * vocab_size,
            )
            oov_mask = jnp.logical_and(grp_valid, grp_vocab < 0)
            sample_onehot = (
                grp_sample[None, :] == jnp.arange(b_pad, dtype=jnp.int32)[:, None]
            )

            def cand_logprobs(states, next_tokens):
                """One beam's merged candidate logprobs [B_pad, V+G]."""
                copy_lp, target_lp, states = neural_module._compute_logprobs(
                    params, states, memories, origin, mem_mask, next_tokens
                )
                copy_lp = copy_lp[:, 0]
                target_lp = target_lp[:, 0]
                group_copy = segment_logsumexp(
                    copy_lp, mem_grp, g_pad, mask=mem_grp_mask
                )
                copy_into_vocab = segment_logsumexp(
                    group_copy, flat_idx, b_pad * vocab_size, mask=in_vocab
                ).reshape(b_pad, vocab_size)
                merged_vocab = jnp.logaddexp(target_lp, copy_into_vocab)
                oov_scores = jnp.where(
                    jnp.logical_and(sample_onehot, oov_mask[None, :]),
                    group_copy[None, :],
                    neg_inf,
                )
                return jnp.concatenate([merged_vocab, oov_scores], axis=1), states

            def step(carry, _):
                states, toks, done, scores = carry  # [k,B,H] [k,B,1] [k,B] [k,B]
                cand, new_states = jax.vmap(cand_logprobs)(states, toks)  # [k,B,nc]
                # finished beams: only a zero-cost END self-transition
                frozen = jnp.full_like(cand, neg_inf).at[:, :, end_id].set(0.0)
                cand = jnp.where(done[:, :, None], frozen, cand)
                total = scores[:, :, None] + cand  # [k,B,nc]
                flat = jnp.transpose(total, (1, 0, 2)).reshape(b_pad, k * n_cand)
                top_scores, top_idx = jax.lax.top_k(flat, k)  # [B,k] sorted
                parent = (top_idx // n_cand).astype(jnp.int32)  # [B,k]
                action = (top_idx % n_cand).astype(jnp.int32)  # [B,k]
                ns = jnp.transpose(new_states, (1, 0, 2))  # [B,k,H]
                sel_states = jnp.take_along_axis(ns, parent[:, :, None], axis=1)
                parent_done = jnp.take_along_axis(done.T, parent, axis=1)  # [B,k]
                is_vocab = action < vocab_size
                feed = jnp.where(is_vocab, action, unk_id)
                chose_end = jnp.logical_and(is_vocab, action == end_id)
                new_done = jnp.logical_or(parent_done, chose_end)
                carry = (
                    jnp.transpose(sel_states, (1, 0, 2)),
                    jnp.where(new_done, end_id, feed).T[:, :, None].astype(jnp.int32),
                    new_done.T,
                    top_scores.T,
                )
                emit = jnp.where(parent_done, -1, action)  # [B,k]
                return carry, (emit, parent)

            init = (
                jnp.broadcast_to(init_states, (k,) + init_states.shape),
                jnp.broadcast_to(start_tokens, (k,) + start_tokens.shape),
                jnp.zeros((k, b_pad), bool),
                # only beam 0 is live at step 0 (all beams start identical)
                jnp.concatenate(
                    [
                        jnp.zeros((1, b_pad), jnp.float32),
                        jnp.full((k - 1, b_pad), neg_inf),
                    ]
                )
                if k > 1
                else jnp.zeros((1, b_pad), jnp.float32),
            )
            (_, _, _, scores), (emits, parents) = jax.lax.scan(
                step, init, None, length=s
            )
            # scores [k,B]: the LAST top_k already sorted each sample's beams
            return emits, parents, scores.T  # [S,B,k], [S,B,k], [B,k]

        start_tokens = jnp.full(
            (b_pad, 1), output_vocab.get_id_or_unk(self.START), jnp.int32
        )
        cache_key = (
            "beam", id(neural_module), k, b_pad, m_pad, g_pad, vocab_size, s,
            end_id, unk_id, tuple(np.shape(input_memories)),
            tuple(np.shape(initial_states)),
        )
        cache = getattr(self, "_decode_jit_cache", None)
        if cache is None:
            cache = {}
            self._decode_jit_cache = cache
        jitted = cache.get(cache_key)
        if jitted is None:
            jitted = jax.jit(decode)
            cache[cache_key] = jitted
        emits, parents, scores = jitted(
            params,
            initial_states,
            input_memories,
            jnp.asarray(input_memories_origin_idx),
            jnp.asarray(memory_mask),
            jnp.asarray(mem_group),
            jnp.asarray(mem_group_mask),
            jnp.asarray(group_sample),
            jnp.asarray(group_vocab),
            jnp.asarray(group_valid),
            start_tokens,
        )
        emits = np.asarray(emits)  # [S, B, k]
        parents = np.asarray(parents)
        scores = np.asarray(scores)  # [B, k] best-first

        results: List[List[Tuple[List[str], float]]] = []
        for bi in range(batch_size):
            beams: List[Tuple[List[str], float]] = []
            for rank in range(k):
                # backtrack the (action, parent) trace from the last step
                actions: List[int] = []
                idx = rank
                for t in range(s - 1, -1, -1):
                    actions.append(int(emits[t, bi, idx]))
                    idx = int(parents[t, bi, idx])
                actions.reverse()
                tokens: List[str] = []
                for wid in actions:
                    if wid < 0:  # frozen-done placeholder
                        break
                    if wid < vocab_size:
                        if wid == end_id:
                            break
                        tokens.append(output_vocab.get_name_for_id(wid))
                    else:
                        tokens.append(group_strings[wid - vocab_size])
                beams.append((tokens, float(scores[bi, rank])))
            results.append(beams)
        return results

    def _greedy_decode_host(
        self,
        *,
        input_concrete_values: List[str],
        input_memories,
        input_memories_origin_idx,
        memory_mask,
        initial_states,
        params: Params,
        neural_module: GruCopyingDecoder,
        num_real_targets: Optional[int] = None,
        top_k: int = 100,
    ) -> List[Tuple[List[str], float]]:
        """Reference-shaped host loop: device computes per-step joint
        logprobs, host merges copy probabilities by concrete string value
        (one device->host sync per step, like grucopydecoder.py:407-455)."""
        import math

        output_vocab = self.__output_vocabulary
        batch_size = (
            int(num_real_targets) if num_real_targets is not None else initial_states.shape[0]
        )

        step_fn = jax.jit(
            lambda params, states, tokens: neural_module._compute_logprobs(
                params,
                states,
                input_memories,
                input_memories_origin_idx,
                memory_mask,
                tokens,
            )
        )

        real_memory_slots = np.where(np.asarray(memory_mask))[0]
        assert len(real_memory_slots) == len(input_concrete_values), (
            len(real_memory_slots),
            len(input_concrete_values),
        )
        origin_np = np.asarray(input_memories_origin_idx)

        current_states = initial_states
        next_tokens = np.full(
            (initial_states.shape[0], 1),
            output_vocab.get_id_or_unk(self.START),
            np.int32,
        )
        predicted_tokens: List[List[str]] = [[] for _ in range(batch_size)]
        predicted_logprobs = [0.0 for _ in range(batch_size)]
        sample_done = np.zeros(batch_size, bool)

        for _ in range(self.max_seq_len):
            copy_logprobs, target_logprobs, current_states = step_fn(
                params, current_states, jnp.asarray(next_tokens)
            )
            target_lp = np.asarray(target_logprobs)[:, 0, :]  # [B, V]
            copy_lp = np.asarray(copy_logprobs)[:, 0]  # [M]

            # Top-k vocab + copy-by-string merge (grucopydecoder.py:407-434).
            k = min(top_k, target_lp.shape[-1])
            topk_idxs = np.argpartition(-target_lp, k - 1, axis=-1)[:, :k]
            merged = [
                {
                    output_vocab.get_name_for_id(int(i)): float(target_lp[bi, i])
                    for i in topk_idxs[bi]
                }
                for bi in range(batch_size)
            ]
            for slot, concrete in zip(real_memory_slots, input_concrete_values):
                bi = int(origin_np[slot])
                if bi >= batch_size:
                    continue
                merged[bi][concrete] = float(
                    np.logaddexp(merged[bi].get(concrete, -math.inf), copy_lp[slot])
                )

            step_tokens = []
            for bi in range(batch_size):
                if sample_done[bi]:
                    step_tokens.append(self.END)
                    continue
                predicted_token, predicted_logprob = max(
                    merged[bi].items(), key=lambda x: x[1]
                )
                if predicted_token == self.END:
                    sample_done[bi] = True
                else:
                    predicted_tokens[bi].append(predicted_token)
                step_tokens.append(predicted_token)
                predicted_logprobs[bi] += predicted_logprob

            next_tokens = np.zeros((initial_states.shape[0], 1), np.int32)
            for bi, tok in enumerate(step_tokens):
                next_tokens[bi, 0] = output_vocab.get_id_or_unk(tok)

        return list(zip(predicted_tokens, predicted_logprobs))
