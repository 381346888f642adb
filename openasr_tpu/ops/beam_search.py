"""Jit-compiled batched attention beam search with KV-cached steps.

Capability parity with the reference's `batch_beam_decode`
(reference: src/frameworks/Speech_Models.py:136-203): beam-expand the
encoder output, per-beam top-k then flat per-batch top-k pruning, EOS
finish tracking with early exit, final per-batch score sort.

TPU re-design:
  * the Python decode loop becomes a `lax.while_loop` with a static
    `max_decode_len` bound and a dynamic all-finished early exit
    (the reference's `break`, Speech_Models.py:187);
  * each step is a KV-cached decoder step (the reference re-ran the full
    decoder per step, decoders.py:83-84 — O(L^3) total; here O(L^2));
  * beam reordering is a gather over the batch*beam axis applied to the
    whole cache pytree;
  * finished beams are constrained to emit EOS at probability 1 so their
    scores freeze (the reference kept accumulating log-probs on finished
    beams — a bug that penalized early finishers).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from openasr_tpu.data.tokenizer import EOS_ID, SOS_ID
from openasr_tpu.ops.masks import NEG_INF


def beam_expand(x: jnp.ndarray, beam_size: int) -> jnp.ndarray:
    """[B, ...] -> [B*beam, ...] repeating each row `beam` times."""
    return jnp.repeat(x, beam_size, axis=0)


def batch_beam_search(
    step_fn: Callable,
    init_cache,
    batch_size: int,
    beam_size: int,
    max_decode_len: int,
    vocab_size: int,
    sos_id: int = SOS_ID,
    eos_id: int = EOS_ID,
    lm_step_fn: Callable = None,
    init_lm_cache=None,
    lm_weight: float = 0.0,
    use_eos: bool = True,
    context_tables=None,
    context_weight: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run beam search, optionally with LM shallow fusion and hotword
    biasing.

    use_eos=False runs every beam for the full max_decode_len with no
    EOS finishing or score freezing — the reference's CIF decode, which
    emits exactly one token per CIF position and accumulates scores over
    the whole padded loop (Speech_Models.py:426-485); lengths come back
    as max_decode_len and the caller slices to its own per-utterance
    lengths.

    Args:
      step_fn: (tokens [BB], index, cache) -> (logits [BB, V], cache);
        BB = batch*beam.  Must already close over beam-expanded memory.
      init_cache: cache pytree with leading dim BB.
      lm_step_fn: optional (tokens [BB], lm_cache) -> (log_probs [BB, V],
        lm_cache); beam scores become log p_am + lm_weight * log p_lm.
      init_lm_cache: LM state pytree with leading dim BB (e.g. LSTM
        carries); it is reordered with the beams like the model cache.
      context_tables/context_weight: hotword biasing
        (ops.ctc_beam_device.build_context_tables — the same true
        Aho-Corasick automaton the device CTC beam runs): each beam
        carries a per-phrase match counter, reordered with the beams
        like the caches; every emitted token's score gains
        context_weight * the automaton's boost delta (advance +w,
        failure-link rollback on break, completed phrases keep their
        boost).  EOS neither earns nor rolls back boost — a dangling
        partial match at end-of-utterance keeps its boost, matching
        the device CTC beam's end semantics — so finished beams'
        frozen scores are untouched.  With use_eos=False (the CIF
        decode) every emitted position transitions the automaton,
        including positions past the caller's per-utterance CIF
        length — biasing there is approximate on the padded tail.

    Returns:
      preds [B, beam, max_decode_len] (EOS-padded, no SOS),
      lengths [B, beam] token counts before EOS,
      scores [B, beam] sorted descending.
    """
    bb = batch_size * beam_size
    use_lm = lm_step_fn is not None and lm_weight != 0.0
    use_ctx = context_tables is not None and context_weight != 0.0
    if use_ctx:
        ctx = {
            k: jnp.asarray(context_tables[k])
            for k in ("j_of", "trans", "plen", "fail")
        }
        n_phrases = ctx["plen"].shape[0]
    else:
        ctx, n_phrases = None, 0
    init_cmatch = jnp.zeros((bb, n_phrases), jnp.int32)

    init_tokens = jnp.full((bb,), sos_id, jnp.int32)
    init_preds = jnp.full((bb, max_decode_len), eos_id, jnp.int32)
    # [0, -inf, ...] per batch so identical initial beams don't duplicate
    # (reference: Speech_Models.py:152)
    init_scores = jnp.tile(
        jnp.concatenate(
            [jnp.zeros((1,), jnp.float32),
             jnp.full((beam_size - 1,), NEG_INF, jnp.float32)]
        ),
        (batch_size,),
    )
    init_finished = jnp.zeros((bb,), bool)
    base = (
        jnp.arange(batch_size, dtype=jnp.int32)[:, None] * beam_size * beam_size
    )

    eos_onehot_row = jnp.where(
        jnp.arange(vocab_size) == eos_id, 0.0, NEG_INF
    )[None, :]

    def cond(state):
        step, _, _, _, finished, _ = state
        return jnp.logical_and(step < max_decode_len, ~jnp.all(finished))

    def body(state):
        step, tokens, preds, scores, finished, caches = state
        cache, lm_cache, cmatch = caches
        logits, cache = step_fn(tokens, step, cache)
        z = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if use_lm:
            lm_logp, lm_cache = lm_step_fn(tokens, lm_cache)
            z = z + lm_weight * lm_logp.astype(jnp.float32)
        if use_eos:
            # finished beams: force EOS with logprob 0 (score freeze)
            z = jnp.where(finished[:, None], eos_onehot_row, z)
        if use_ctx:
            # hotword boost per candidate token: the same AC-automaton
            # gather as the device CTC beam's extension scoring
            from openasr_tpu.ops.ctc_beam_device import _ctx_transition

            P = n_phrases
            lp1 = ctx["trans"].shape[1]
            trans_m = ctx["trans"][
                jnp.arange(P)[None, :], jnp.clip(cmatch, 0, lp1 - 1)
            ]  # [BB, P, L+1]
            raw = jnp.take_along_axis(
                trans_m,
                jnp.broadcast_to(
                    ctx["j_of"].T[None, :, :], (bb, P, vocab_size)
                ),
                axis=2,
            )  # [BB, P, V]
            _, delta = _ctx_transition(
                cmatch[:, :, None], raw,
                ctx["plen"][None, :, None], ctx["fail"][None, :, None],
            )
            bias = context_weight * jnp.sum(delta, axis=1)  # [BB, V]
            # EOS keeps a dangling partial's boost (no earn, no
            # rollback); finished beams see only their forced-EOS
            # column, which this zero keeps untouched
            bias = bias.at[:, eos_id].set(0.0)
            z = z + bias

        next_scores, next_tokens = lax.top_k(z, beam_size)  # [BB, beam]
        comb = (scores[:, None] + next_scores).reshape(
            batch_size, beam_size * beam_size
        )
        top_scores, k_idx = lax.top_k(comb, beam_size)  # [B, beam]
        flat_k = (base + k_idx).reshape(-1)  # index into BB*beam
        beam_src = flat_k // beam_size  # source row in BB

        new_tokens = next_tokens.reshape(-1)[flat_k]
        preds = preds[beam_src]
        preds = lax.dynamic_update_slice_in_dim(
            preds, new_tokens[:, None], step, axis=1
        )
        scores = top_scores.reshape(-1)
        finished = finished[beam_src]
        if use_eos:
            finished = finished | (new_tokens == eos_id)
        cache = jax.tree_util.tree_map(lambda x: x[beam_src], cache)
        if use_lm:
            lm_cache = jax.tree_util.tree_map(
                lambda x: x[beam_src], lm_cache
            )
        if use_ctx:
            from openasr_tpu.ops.ctc_beam_device import _ctx_transition

            P = n_phrases
            lp1 = ctx["trans"].shape[1]
            pmatch = cmatch[beam_src]  # [BB, P]
            j_sel = ctx["j_of"][new_tokens]  # [BB, P]
            raw_sel = ctx["trans"][
                jnp.arange(P)[None, :],
                jnp.clip(pmatch, 0, lp1 - 1),
                j_sel,
            ]
            nm, _ = _ctx_transition(
                pmatch, raw_sel,
                ctx["plen"][None, :], ctx["fail"][None, :],
            )
            # EOS (incl. forced EOS on finished beams) leaves the
            # automaton untouched, mirroring its zero score delta
            cmatch = jnp.where(
                (new_tokens == eos_id)[:, None] if use_eos
                else jnp.zeros((bb, 1), bool),
                pmatch, nm,
            )
        return (step + 1, new_tokens, preds, scores, finished,
                (cache, lm_cache, cmatch))

    state = (0, init_tokens, init_preds, init_scores, init_finished,
             (init_cache, init_lm_cache, init_cmatch))
    _, _, preds, scores, _, _ = lax.while_loop(cond, body, state)

    if use_eos:
        # lengths: tokens before the first EOS
        is_eos = preds == eos_id
        lengths = jnp.where(
            jnp.any(is_eos, axis=1),
            jnp.argmax(is_eos, axis=1),
            max_decode_len,
        ).astype(jnp.int32)
    else:
        lengths = jnp.full(
            (preds.shape[0],), max_decode_len, jnp.int32
        )

    # per-batch sort by score descending (reference: Speech_Models.py:193-203)
    scores_b = scores.reshape(batch_size, beam_size)
    sorted_scores, order = lax.top_k(scores_b, beam_size)
    gather = (
        jnp.arange(batch_size)[:, None] * beam_size + order
    ).reshape(-1)
    preds_sorted = preds[gather].reshape(batch_size, beam_size, max_decode_len)
    lengths_sorted = lengths[gather].reshape(batch_size, beam_size)
    return preds_sorted, lengths_sorted, sorted_scores
