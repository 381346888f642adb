"""CTC prefix beam search ON DEVICE: one jitted, batched, static-shape
program (beyond-reference — the reference shells out to the external
`ctcdecode` C++ pip, src/utils.py:246-253; this repo's host paths are
ops/prefix_beam.py + native/ctc_decoder).

Why a device version: the host decoders force a [B, T, V] log-prob
transfer off the chip and run a per-utterance Python/C++ loop; this one
keeps decoding where the log-probs already live and runs the whole batch
in parallel — the decode analogue of the jitted attention beam search
(ops/beam_search.py).

Design — the Hannun et al. (2014) recursion as dense algebra:

  * A beam's prefix is identified by a ROLLING HASH (uint32,
    h' = h * 1000003 + c + 1) instead of a token tuple; the token
    storage [N, T] rides alongside for reconstruction.  Distinct live
    beams have distinct prefixes, so per-step merging reduces to ONE
    collision class: an extension `parent + c` colliding with another
    beam's stay-as-is candidate (prefix equality ⇒ hash equality; a
    spurious uint32 collision between different prefixes is ~2^-32 per
    pair per step and would only mis-merge probability mass).
  * Each step builds N stay candidates and N×V extension candidates,
    folds colliding extensions into their stay's non-blank mass with a
    masked logsumexp over the [N, V, N] hash-match table, and prunes
    with ONE top_k over the N + N×V totals.  No sorting, no dicts, no
    data-dependent shapes — everything is einsum/where/top_k on the MXU
    and VPU.
  * The time loop is a `lax.scan` over frames; frames past an
    utterance's length pass state through unchanged, so one compiled
    program serves every padded batch.

Matches the host oracle's semantics exactly: same frame-candidate
cutoffs (top-n + logp floor, blank always kept), same blank/repeat
split, same n-best ordering by log(p_b + p_nb).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)  # -inf surrogate: keeps logaddexp NaN-free
_HASH_MULT = jnp.uint32(1000003)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    out = m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))
    return jnp.where(jnp.minimum(a, b) <= NEG_INF / 2, m, out)


def _step(state, frame_and_valid, *, blank: int, beam: int,
          cutoff_top_n: int, cutoff_logp: float,
          lm_step_fn=None, lm_weight: float = 0.0,
          ctx_phrases=None, ctx_weight: float = 0.0):
    toks, lens, last, h, pb, pnb, lm_cache, lm_logp, cmatch = state
    frame, valid_t = frame_and_valid
    n, t_cap = toks.shape
    v = frame.shape[0]
    use_ctx = ctx_phrases is not None and ctx_weight != 0.0

    # ---- frame candidate cutoff (oracle: top-n by logp, floor, + blank).
    # EXACTLY top_n symbols via top_k's index scatter (deterministic
    # lowest-index tie-break) — a >=-threshold mask would admit every
    # value tied AT the threshold and expand a different candidate set
    # than the host decoders on tied log-probs
    top_n = min(cutoff_top_n, v)
    top_vals, top_idx = jax.lax.top_k(frame, top_n)
    cand = jnp.zeros((v,), jnp.bool_).at[top_idx].set(
        top_vals >= cutoff_logp
    )
    cand = cand.at[blank].set(True)  # blank always a candidate

    ptot = _logaddexp(pb, pnb)

    # ---- stay candidates (one per beam): blank after anything keeps the
    # prefix (blank is unconditionally a candidate, see above); a repeat
    # of the last char extends its non-blank mass
    stay_pb = ptot + frame[blank]
    last_lp = jnp.where(
        (last >= 0) & cand[jnp.clip(last, 0, v - 1)],
        frame[jnp.clip(last, 0, v - 1)], NEG_INF,
    )
    stay_pnb = pnb + last_lp

    # ---- extension candidates [N, V]: prefix + c (c != blank).  A char
    # equal to the beam's last char can only extend from the
    # blank-terminated mass (otherwise it merges into the repeat above).
    base = jnp.where(
        jnp.arange(v)[None, :] == last[:, None], pb[:, None], ptot[:, None]
    )
    p_ext = base + frame[None, :]
    if lm_step_fn is not None and lm_weight != 0.0:
        # shallow fusion: a NEW token pays lm_weight * log p_lm(c|prefix)
        # exactly once, at extension time — the blank/repeat transitions
        # add no token and no LM mass, and merging stays consistent
        # because equal prefixes have equal accumulated LM scores
        v_lm = lm_logp.shape[1]
        fuse = jnp.full((n, v), NEG_INF)
        fuse = fuse.at[:, : min(v, v_lm)].set(
            lm_logp[:, : min(v, v_lm)].astype(jnp.float32)
        )
        p_ext = p_ext + lm_weight * fuse
    if use_ctx:
        # contextual biasing (hotword boosting): each token that ADVANCES
        # a context phrase's partial match earns +ctx_weight; breaking a
        # partial match ROLLS BACK the accumulated boost (-ctx_weight *
        # matched_len, or 1-matched_len when the breaking char restarts
        # the phrase); a completed phrase keeps its boost.  Aho-Corasick
        # failure links are approximated by restart-at-0 (the standard
        # lightweight biasing used by production CTC decoders).  Merging
        # stays consistent: the match state is a pure function of the
        # prefix, so equal prefixes carry equal accumulated boosts.
        P, L = ctx_phrases.shape
        next_tok = jnp.take_along_axis(
            ctx_phrases[None, :, :].repeat(n, axis=0),
            jnp.clip(cmatch, 0, L - 1)[:, :, None], axis=2,
        )[:, :, 0]  # [N, P]: the token that would advance phrase p
        sym = jnp.arange(v)[None, :, None]
        adv = next_tok[:, None, :] == sym  # [N, V, P]
        restart = ctx_phrases[:, 0][None, None, :] == sym  # [1, V, P]
        m = cmatch[:, None, :].astype(jnp.float32)
        delta = jnp.where(adv, 1.0, jnp.where(restart, 1.0 - m, -m))
        p_ext = p_ext + ctx_weight * jnp.sum(delta, axis=2)
    ext_ok = cand[None, :] & (jnp.arange(v)[None, :] != blank)
    p_ext = jnp.where(ext_ok, p_ext, NEG_INF)
    h_ext = h[:, None] * _HASH_MULT + jnp.arange(v, dtype=jnp.uint32)[None, :] + 1

    # ---- merge extensions that recreate an existing beam's prefix into
    # that beam's stay candidate (the only possible collision class).
    # Dead beams (probability ~NEG_INF — the initial sentinel slots)
    # must never absorb mass: without the `live` gate a hash collision
    # with a sentinel would silently fold a real extension into a
    # zero-token beam.
    live = ptot > NEG_INF / 2
    match = (h_ext[:, :, None] == h[None, None, :]) & (
        p_ext[:, :, None] > NEG_INF / 2
    ) & live[None, None, :]  # [N, V, N]
    contrib = jnp.where(match, p_ext[:, :, None], NEG_INF)
    merged_mass = jax.nn.logsumexp(
        contrib.reshape(n * v, n), axis=0, b=None
    )  # [N]: mass folding into each stay
    stay_pnb = _logaddexp(stay_pnb, jnp.maximum(merged_mass, NEG_INF))
    p_ext = jnp.where(jnp.any(match, axis=2), NEG_INF, p_ext)

    # ---- prune: one top_k over N stays + N*V extensions
    stay_tot = _logaddexp(stay_pb, stay_pnb)
    ext_tot = p_ext  # extensions have no blank-terminated mass yet
    totals = jnp.concatenate([stay_tot, ext_tot.reshape(-1)])
    _, sel = jax.lax.top_k(totals, beam)  # [beam] indices into pool

    is_stay = sel < n
    parent = jnp.where(is_stay, sel, (sel - n) // v)
    ext_c = jnp.where(is_stay, -1, (sel - n) % v)

    new_toks = toks[parent]
    append = jax.nn.one_hot(lens[parent], t_cap, dtype=jnp.bool_) & (
        ~is_stay[:, None]
    )
    new_toks = jnp.where(append, ext_c[:, None], new_toks)
    new_lens = lens[parent] + (~is_stay).astype(jnp.int32)
    new_last = jnp.where(is_stay, last[parent], ext_c)
    new_h = jnp.where(
        is_stay, h[parent],
        h[parent] * _HASH_MULT + ext_c.astype(jnp.uint32) + 1,
    )
    new_pb = jnp.where(is_stay, stay_pb[parent], NEG_INF)
    new_pnb = jnp.where(is_stay, stay_pnb[parent], p_ext[parent, ext_c])

    # frames past the utterance end leave the state untouched
    def keep(new, old):
        return jnp.where(
            jnp.broadcast_to(
                valid_t.reshape((1,) * new.ndim), new.shape
            ),
            new, old,
        )

    if lm_step_fn is not None and lm_weight != 0.0:
        # advance the LM only for extended beams: run one LM step from
        # the parent's cache with the appended token, keep the parent's
        # state for stays
        parent_cache = jax.tree_util.tree_map(lambda x: x[parent], lm_cache)
        parent_logp = lm_logp[parent]
        adv_logp, adv_cache = lm_step_fn(
            jnp.clip(ext_c, 0, None), parent_cache
        )
        new_lm_cache = jax.tree_util.tree_map(
            lambda a, p: jnp.where(
                jnp.broadcast_to(
                    is_stay.reshape((-1,) + (1,) * (a.ndim - 1)), a.shape
                ),
                p, a,
            ),
            adv_cache, parent_cache,
        )
        new_lm_logp = jnp.where(is_stay[:, None], parent_logp, adv_logp)
        new_lm_cache = jax.tree_util.tree_map(
            lambda nw, old: keep(nw, old), new_lm_cache, lm_cache
        )
        new_lm_logp = keep(new_lm_logp, lm_logp)
    else:
        new_lm_cache, new_lm_logp = lm_cache, lm_logp

    if use_ctx:
        P, L = ctx_phrases.shape
        plen = jnp.sum(ctx_phrases >= 0, axis=1)  # [P]
        pmatch = cmatch[parent]  # [N, P]
        next_sel = jnp.take_along_axis(
            ctx_phrases[None, :, :].repeat(n, axis=0),
            jnp.clip(pmatch, 0, L - 1)[:, :, None], axis=2,
        )[:, :, 0]  # [N, P]
        adv_sel = next_sel == ext_c[:, None]
        restart_sel = ctx_phrases[:, 0][None, :] == ext_c[:, None]
        nm = jnp.where(
            adv_sel, pmatch + 1, jnp.where(restart_sel, 1, 0)
        )
        nm = jnp.where(nm >= plen[None, :], 0, nm)  # completed: keep boost
        new_cmatch = jnp.where(is_stay[:, None], pmatch, nm)
        new_cmatch = keep(new_cmatch, cmatch)
    else:
        new_cmatch = cmatch

    out = (
        keep(new_toks, toks), keep(new_lens, lens), keep(new_last, last),
        keep(new_h, h), keep(new_pb, pb), keep(new_pnb, pnb),
        new_lm_cache, new_lm_logp, new_cmatch,
    )
    return out, None


def _decode_one(log_probs, length, lm_cache0, lm_logp0, cmatch0, *,
                blank, beam, cutoff_top_n, cutoff_logp, lm_step_fn,
                lm_weight, ctx_phrases, ctx_weight):
    t_max, v = log_probs.shape
    toks = jnp.zeros((beam, t_max), jnp.int32)
    lens = jnp.zeros((beam,), jnp.int32)
    last = jnp.full((beam,), -1, jnp.int32)
    # invalid initial beams get unique sentinel hashes (top bit set: a
    # rolling hash of a real prefix starting from 0 collides with them
    # only modulo 2^32) so they never merge with anything that matters —
    # their probability mass is NEG_INF anyway
    h = (jnp.uint32(0x80000000) + jnp.arange(beam, dtype=jnp.uint32)).at[0].set(
        jnp.uint32(0)
    )
    pb = jnp.full((beam,), NEG_INF).at[0].set(0.0)
    pnb = jnp.full((beam,), NEG_INF)

    valid = jnp.arange(t_max) < length
    step = partial(_step, blank=blank, beam=beam,
                   cutoff_top_n=cutoff_top_n, cutoff_logp=cutoff_logp,
                   lm_step_fn=lm_step_fn, lm_weight=lm_weight,
                   ctx_phrases=ctx_phrases, ctx_weight=ctx_weight)
    (toks, lens, last, h, pb, pnb, _, _, _), _ = jax.lax.scan(
        step,
        (toks, lens, last, h, pb, pnb, lm_cache0, lm_logp0, cmatch0),
        (log_probs, valid),
    )
    total = _logaddexp(pb, pnb)
    order = jnp.argsort(-total)
    return toks[order], lens[order], total[order]


@partial(jax.jit, static_argnames=("blank", "beam", "cutoff_top_n",
                                   "cutoff_logp", "lm_step_fn",
                                   "lm_weight", "sos_id",
                                   "context_weight"))
def ctc_prefix_beam_device(
    log_probs: jnp.ndarray,
    lengths: jnp.ndarray,
    blank: int,
    beam: int = 10,
    cutoff_top_n: int = 40,
    cutoff_logp: float = -20.0,
    lm_step_fn=None,
    init_lm_cache=None,
    lm_weight: float = 0.0,
    sos_id: int = 1,
    lm_params=None,
    context_phrases=None,
    context_weight: float = 0.0,
):
    """Batched device prefix beam search, optionally with LSTM-LM
    shallow fusion.

    log_probs [B, T, V] (log-softmax over the vocab, blank at `blank`),
    lengths [B].  Returns (tokens [B, beam, T] int32, lens [B, beam],
    scores [B, beam] = log(p_b + p_nb)), n-best ordered.  One compiled
    program per (T, V, beam) shape — feed the quantized buckets the data
    pipeline already emits.  When fewer than `beam` live prefixes exist
    (tiny vocab, aggressive cutoffs) the tail rows are never-populated
    sentinels with score ~-1e30; filter on `scores > -1e29` like
    infer.py does — the host decoders never emit such rows.

    Fusion (same conventions as ops/beam_search.py): lm_step_fn
    (tokens [N], cache) -> (log_probs [N, V_lm], cache) scored from
    <sos>; `init_lm_cache` leaves lead with B*beam rows (the
    make_lm_fusion layout).  Every appended token pays
    lm_weight * log p_lm(c | prefix) exactly once; blanks and repeat
    collapses add no LM mass, so scores are
    log p_am + lm_weight * log p_lm like the attention decoder's.

    `lm_params`: optional pytree passed through to lm_step_fn as
    (lm_params, tokens, cache) — the step closure should close over the
    LM MODULE only, so the weights ride as ONE traced jit argument
    instead of being constant-folded into every shape-bucket executable
    (same rule as infer.py's attention path).

    Contextual biasing (hotword boosting, FlexCTC-style):
    `context_phrases` [P, L] int32 (token ids, -1 padding) with
    `context_weight` w — each decoded token that advances a phrase's
    partial match earns +w, breaking a partial match rolls the
    accumulated boost back, completing a phrase keeps it.  Composes
    with LM fusion."""
    b = log_probs.shape[0]
    use_lm = lm_step_fn is not None and lm_weight != 0.0
    if use_lm and lm_params is not None:
        bound_lm_step = partial(lm_step_fn, lm_params)
    else:
        bound_lm_step = lm_step_fn
    if use_lm:
        # p_lm(first | <sos>) seeds every beam's next-token distribution
        sos = jnp.full((b * beam,), sos_id, jnp.int32)
        logp0, cache0 = bound_lm_step(sos, init_lm_cache)
        lm_logp0 = logp0.reshape(b, beam, -1)
        lm_cache0 = jax.tree_util.tree_map(
            lambda x: x.reshape((b, beam) + x.shape[1:]), cache0
        )
    else:
        # zero-size placeholders keep the scan carry structure static
        lm_logp0 = jnp.zeros((b, beam, 0), jnp.float32)
        lm_cache0 = ()
    use_ctx = context_phrases is not None and context_weight != 0.0
    if use_ctx:
        context_phrases = jnp.asarray(context_phrases, jnp.int32)
        cmatch0 = jnp.zeros(
            (b, beam, context_phrases.shape[0]), jnp.int32
        )
    else:
        cmatch0 = jnp.zeros((b, beam, 0), jnp.int32)
    fn = partial(_decode_one, blank=int(blank), beam=int(beam),
                 cutoff_top_n=int(cutoff_top_n),
                 cutoff_logp=float(cutoff_logp),
                 lm_step_fn=bound_lm_step if use_lm else None,
                 lm_weight=float(lm_weight),
                 ctx_phrases=context_phrases if use_ctx else None,
                 ctx_weight=float(context_weight))
    return jax.vmap(fn)(log_probs.astype(jnp.float32),
                        lengths.astype(jnp.int32), lm_cache0, lm_logp0,
                        cmatch0)


# ------------------------------------------------------ streaming variant

def ctc_beam_stream_init(batch: int, beam: int, max_frames: int) -> dict:
    """Carryable prefix-beam state for chunkwise streaming decoding
    (`ctc_beam_stream_step`): the same (toks, lens, last, hash, pb, pnb)
    recursion state `ctc_prefix_beam_device` scans internally, with the
    token buffer sized to the stream bound.  Chunk boundaries do not
    exist in the math — feeding the same frames in any chunking yields
    bit-identical state — so streaming partials carry FULL prefix-beam
    quality, not greedy's."""
    return {
        "toks": jnp.zeros((batch, beam, max_frames), jnp.int32),
        "lens": jnp.zeros((batch, beam), jnp.int32),
        "last": jnp.full((batch, beam), -1, jnp.int32),
        "h": jnp.broadcast_to(
            (jnp.uint32(0x80000000)
             + jnp.arange(beam, dtype=jnp.uint32)).at[0].set(jnp.uint32(0)),
            (batch, beam),
        ),
        "pb": jnp.broadcast_to(
            jnp.full((beam,), NEG_INF).at[0].set(0.0), (batch, beam)
        ),
        "pnb": jnp.full((batch, beam), NEG_INF),
    }


@partial(jax.jit, static_argnames=("blank", "beam", "cutoff_top_n",
                                   "cutoff_logp"))
def ctc_beam_stream_step(
    state: dict,
    log_probs: jnp.ndarray,
    frame_valid: jnp.ndarray,
    blank: int,
    beam: int = 10,
    cutoff_top_n: int = 40,
    cutoff_logp: float = -20.0,
):
    """Advance the streaming prefix beam over one chunk.

    state: from `ctc_beam_stream_init` (or a previous step);
    log_probs [B, ch, V] log-softmax for this chunk's frames;
    frame_valid [B, ch] bool (stream warm-up / final-chunk padding
    frames pass state through unchanged — same contract as the
    streaming executor's `valid` output).

    Returns (new_state, (tokens [B, beam, max_frames], lens, scores))
    — the n-best ordered snapshot after this chunk.  Exact: running any
    chunking of T frames equals `ctc_prefix_beam_device` over the full
    [B, T, V] (tests/test_ctc_beam_device.py)."""
    def one_row(st, lp, valid):
        carry = (st["toks"], st["lens"], st["last"], st["h"], st["pb"],
                 st["pnb"], (), jnp.zeros((beam, 0), jnp.float32),
                 jnp.zeros((beam, 0), jnp.int32))
        step = partial(_step, blank=int(blank), beam=int(beam),
                       cutoff_top_n=int(cutoff_top_n),
                       cutoff_logp=float(cutoff_logp),
                       lm_step_fn=None, lm_weight=0.0,
                       ctx_phrases=None, ctx_weight=0.0)
        (toks, lens, last, h, pb, pnb, _, _, _), _ = jax.lax.scan(
            step, carry, (lp, valid)
        )
        return {"toks": toks, "lens": lens, "last": last, "h": h,
                "pb": pb, "pnb": pnb}

    new_state = jax.vmap(one_row)(
        state, log_probs.astype(jnp.float32),
        jnp.asarray(frame_valid, jnp.bool_),
    )
    total = _logaddexp(new_state["pb"], new_state["pnb"])  # [B, N]
    order = jnp.argsort(-total, axis=1)
    toks = jnp.take_along_axis(
        new_state["toks"], order[:, :, None], axis=1
    )
    lens = jnp.take_along_axis(new_state["lens"], order, axis=1)
    scores = jnp.take_along_axis(total, order, axis=1)
    return new_state, (toks, lens, scores)
