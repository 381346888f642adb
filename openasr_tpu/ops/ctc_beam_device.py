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

  * A beam's prefix is identified by a PAIR of uint32 rolling hashes
    (h' = h * M + c + 1 with two independent odd multipliers — an
    effective 64-bit fingerprint without int64, which TPU jax disables
    by default); the token storage [N, T] rides alongside for
    reconstruction.  Distinct live beams have distinct prefixes, so
    per-step merging reduces to ONE collision class: an extension
    `parent + c` colliding with another beam's stay-as-is candidate
    (prefix equality ⇒ hash-pair equality; a spurious collision between
    different prefixes requires BOTH 32-bit hashes to collide,
    ~2^-64 per pair per step — below any practical event rate even at
    production volumes of beam²/2 pairs × frames × utterances).
  * Each step builds N stay candidates and N×V extension candidates,
    folds colliding extensions into their stay's non-blank mass with a
    masked logsumexp over the [N, V, N] hash-match table, and prunes
    with ONE top_k over the N + N×V totals.  No sorting, no dicts, no
    data-dependent shapes — everything is einsum/where/top_k on the MXU
    and VPU.
  * The time loop is a `lax.scan` over frames; frames past an
    utterance's length pass state through unchanged, so one compiled
    program serves every padded batch.

Contextual biasing runs the TRUE Aho-Corasick / KMP automaton per
phrase: `build_context_tables` precomputes (host-side, zero device
cost) the full failure-link transition table, so a broken match keeps
its re-usable matched prefix (self-overlapping phrases like "ABAB" or
Chinese reduplications) instead of the restart-at-0 approximation.

Matches the host oracle's semantics exactly: same frame-candidate
cutoffs (top-n + logp floor, blank always kept), same blank/repeat
split, same n-best ordering by log(p_b + p_nb).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.float32(-1e30)  # -inf surrogate: keeps logaddexp NaN-free
# two independent odd multipliers -> an effective 64-bit rolling hash
# carried as a uint32 pair (uint64 is unavailable: jax x64 is off)
_HASH_MULT1 = jnp.uint32(1000003)
_HASH_MULT2 = jnp.uint32(2654435761)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    out = m + jnp.log1p(jnp.exp(-jnp.abs(a - b)))
    return jnp.where(jnp.minimum(a, b) <= NEG_INF / 2, m, out)


# ------------------------------------------------------ contextual biasing

def build_context_tables(phrases, vocab_size: int) -> dict:
    """Host-side precompute of the Aho-Corasick/KMP matching automaton
    for hotword biasing: numpy in, numpy out, zero device cost (the
    phrase table is static per deployment).

    phrases: [P, L] int32 token ids, -1 padding (load_context_phrases'
    layout).  Returns a dict of static arrays the device step consumes:

      j_of  [V, P]     first index j with phrases[p, j] == token (L if
                       the token is not in the phrase — its transition
                       from EVERY state is 0, so one shared column
                       covers it);
      trans [P, L+1, L+1]  raw KMP next-state: trans[p, m, j] = match
                       length after seeing token phrases[p, j] in state
                       m, following failure links (== plen[p] signals a
                       completed match); column L is the
                       not-in-phrase column (all zeros);
      plen  [P]        phrase lengths;
      fail  [P]        fail[plen]: the carried-over matched prefix
                       after a completion (self-overlapping phrases
                       keep re-usable context instead of restarting).

    The accumulated boost of a prefix is
    context_weight * (completions * plen + current_match) — a pure
    function of the prefix, so beam merging stays consistent.
    """
    phrases = np.asarray(phrases, np.int32)
    P, L = phrases.shape
    plen = (phrases >= 0).sum(axis=1).astype(np.int32)
    trans = np.zeros((P, L + 1, L + 1), np.int32)
    fail_full = np.zeros((P,), np.int32)
    j_of = np.full((vocab_size, P), L, np.int32)
    for p in range(P):
        ph = [int(c) for c in phrases[p, : plen[p]]]
        n = len(ph)
        # classic KMP failure function over ph, incl. fail[n]
        fail = np.zeros(n + 1, np.int32)
        k = 0
        for m in range(1, n):
            while k > 0 and ph[m] != ph[k]:
                k = fail[k]
            if ph[m] == ph[k]:
                k += 1
            fail[m + 1] = k
        fail_full[p] = fail[n]
        for j in range(n):
            c = ph[j]
            if 0 <= c < vocab_size and j_of[c, p] == L:
                j_of[c, p] = j
        # full transition table delta(m, c) for every in-phrase token
        for m in range(n):
            for j in range(n):
                c = ph[j]
                k = m
                while k > 0 and ph[k] != c:
                    k = fail[k]
                trans[p, m, j] = k + 1 if ph[k] == c else 0
    return {"j_of": j_of, "trans": trans,
            "plen": plen, "fail": fail_full}


def _ctx_transition(m, raw, plen, fail):
    """(new_state, boost_delta) from a raw KMP next-state `raw` at match
    state `m`; plen/fail must be pre-broadcast to raw's phrase axis.
    A completed match keeps its plen boost and carries over fail[plen]
    as the new (already-credited) partial."""
    complete = raw == plen
    new_m = jnp.where(complete, fail, raw)
    delta = jnp.where(
        complete, (plen - m + fail).astype(jnp.float32),
        (raw - m).astype(jnp.float32),
    )
    return new_m, delta


def _step(state, frame_and_valid, *, blank: int, beam: int,
          cutoff_top_n: int, cutoff_logp: float,
          lm_step_fn=None, lm_weight: float = 0.0,
          ctx=None, ctx_weight: float = 0.0):
    toks, lens, last, h1, h2, pb, pnb, lm_cache, lm_logp, cmatch = state
    frame, valid_t = frame_and_valid
    n, t_cap = toks.shape
    v = frame.shape[0]
    use_ctx = ctx is not None and ctx_weight != 0.0

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
        # contextual biasing (hotword boosting) with TRUE failure links:
        # each token transitions every phrase's KMP automaton; the boost
        # delta credits advances, rolls back only the UNRECOVERABLE part
        # of a broken match (the failure link keeps the re-usable
        # prefix), and a completed phrase keeps its boost while carrying
        # over fail[plen] of already-matched context.  Merging stays
        # consistent: the (state, boost) pair is a pure function of the
        # prefix.
        trans, j_of = ctx["trans"], ctx["j_of"]
        P, Lp1, _ = trans.shape
        trans_m = trans[
            jnp.arange(P)[None, :], jnp.clip(cmatch, 0, Lp1 - 1)
        ]  # [N, P, L+1]
        raw = jnp.take_along_axis(
            trans_m,
            jnp.broadcast_to(j_of.T[None, :, :], (n, P, v)),
            axis=2,
        )  # [N, P, V]: raw next state for every candidate token
        _, delta = _ctx_transition(
            cmatch[:, :, None], raw,
            ctx["plen"][None, :, None], ctx["fail"][None, :, None],
        )  # [N, P, V]
        p_ext = p_ext + ctx_weight * jnp.sum(delta, axis=1)
    ext_ok = cand[None, :] & (jnp.arange(v)[None, :] != blank)
    p_ext = jnp.where(ext_ok, p_ext, NEG_INF)
    c_arange = jnp.arange(v, dtype=jnp.uint32)[None, :]
    h1_ext = h1[:, None] * _HASH_MULT1 + c_arange + 1
    h2_ext = h2[:, None] * _HASH_MULT2 + c_arange + 1

    # ---- merge extensions that recreate an existing beam's prefix into
    # that beam's stay candidate (the only possible collision class).
    # Dead beams (probability ~NEG_INF — the initial sentinel slots)
    # must never absorb mass: without the `live` gate a hash collision
    # with a sentinel would silently fold a real extension into a
    # zero-token beam.
    live = ptot > NEG_INF / 2
    match = (
        (h1_ext[:, :, None] == h1[None, None, :])
        & (h2_ext[:, :, None] == h2[None, None, :])
        & (p_ext[:, :, None] > NEG_INF / 2)
        & live[None, None, :]
    )  # [N, V, N]
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
    new_h1 = jnp.where(
        is_stay, h1[parent],
        h1[parent] * _HASH_MULT1 + ext_c.astype(jnp.uint32) + 1,
    )
    new_h2 = jnp.where(
        is_stay, h2[parent],
        h2[parent] * _HASH_MULT2 + ext_c.astype(jnp.uint32) + 1,
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
        trans, j_of = ctx["trans"], ctx["j_of"]
        P, Lp1, _ = trans.shape
        pmatch = cmatch[parent]  # [N, P]
        j_sel = j_of[jnp.clip(ext_c, 0, None)]  # [N, P]
        raw_sel = trans[
            jnp.arange(P)[None, :],
            jnp.clip(pmatch, 0, Lp1 - 1),
            j_sel,
        ]  # [N, P]
        nm, _ = _ctx_transition(
            pmatch, raw_sel, ctx["plen"][None, :], ctx["fail"][None, :]
        )
        new_cmatch = jnp.where(is_stay[:, None], pmatch, nm)
        new_cmatch = keep(new_cmatch, cmatch)
    else:
        new_cmatch = cmatch

    out = (
        keep(new_toks, toks), keep(new_lens, lens), keep(new_last, last),
        keep(new_h1, h1), keep(new_h2, h2),
        keep(new_pb, pb), keep(new_pnb, pnb),
        new_lm_cache, new_lm_logp, new_cmatch,
    )
    return out, None


def _init_hashes(beam: int):
    """Initial hash pair: beam 0 is the (live) empty prefix with hash 0;
    the dead sentinel slots get unique top-bit-set pairs so they never
    merge with anything that matters (their mass is NEG_INF anyway)."""
    sent = jnp.uint32(0x80000000) + jnp.arange(beam, dtype=jnp.uint32)
    return sent.at[0].set(jnp.uint32(0)), sent.at[0].set(jnp.uint32(0))


def _decode_one(log_probs, length, lm_cache0, lm_logp0, cmatch0, *,
                blank, beam, cutoff_top_n, cutoff_logp, lm_step_fn,
                lm_weight, ctx, ctx_weight):
    t_max, v = log_probs.shape
    toks = jnp.zeros((beam, t_max), jnp.int32)
    lens = jnp.zeros((beam,), jnp.int32)
    last = jnp.full((beam,), -1, jnp.int32)
    h1, h2 = _init_hashes(beam)
    pb = jnp.full((beam,), NEG_INF).at[0].set(0.0)
    pnb = jnp.full((beam,), NEG_INF)

    valid = jnp.arange(t_max) < length
    step = partial(_step, blank=blank, beam=beam,
                   cutoff_top_n=cutoff_top_n, cutoff_logp=cutoff_logp,
                   lm_step_fn=lm_step_fn, lm_weight=lm_weight,
                   ctx=ctx, ctx_weight=ctx_weight)
    (toks, lens, last, h1, h2, pb, pnb, _, _, _), _ = jax.lax.scan(
        step,
        (toks, lens, last, h1, h2, pb, pnb, lm_cache0, lm_logp0, cmatch0),
        (log_probs, valid),
    )
    total = _logaddexp(pb, pnb)
    order = jnp.argsort(-total)
    return toks[order], lens[order], total[order]


@partial(jax.jit, static_argnames=("blank", "beam", "cutoff_top_n",
                                   "cutoff_logp", "lm_step_fn",
                                   "lm_weight", "sos_id",
                                   "context_weight"))
def _beam_device_jit(
    log_probs, lengths, lm_params, init_lm_cache, ctx_tables,
    *, blank, beam, cutoff_top_n, cutoff_logp, lm_step_fn, lm_weight,
    sos_id, context_weight,
):
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
    use_ctx = ctx_tables is not None and context_weight != 0.0
    if use_ctx:
        cmatch0 = jnp.zeros(
            (b, beam, ctx_tables["plen"].shape[0]), jnp.int32
        )
    else:
        cmatch0 = jnp.zeros((b, beam, 0), jnp.int32)
    fn = partial(_decode_one, blank=int(blank), beam=int(beam),
                 cutoff_top_n=int(cutoff_top_n),
                 cutoff_logp=float(cutoff_logp),
                 lm_step_fn=bound_lm_step if use_lm else None,
                 lm_weight=float(lm_weight),
                 ctx=ctx_tables if use_ctx else None,
                 ctx_weight=float(context_weight))
    return jax.vmap(fn)(log_probs.astype(jnp.float32),
                        lengths.astype(jnp.int32), lm_cache0, lm_logp0,
                        cmatch0)


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
    context_tables=None,
):
    """Batched device prefix beam search, optionally with LM shallow
    fusion and Aho-Corasick hotword biasing.

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

    Contextual biasing (hotword boosting, FlexCTC-style with true
    Aho-Corasick failure links): `context_phrases` [P, L] int32 host
    array (token ids, -1 padding) with `context_weight` w — each
    decoded token that advances a phrase's partial match earns +w,
    breaking a partial match rolls back only the unrecoverable part
    (the KMP failure link keeps re-usable matched context —
    self-overlapping phrases like "ABAB" are matched exactly),
    completing a phrase keeps its boost.  Composes with LM fusion.
    `context_tables` (from `build_context_tables`) may be passed
    instead to skip re-deriving the automaton per call.
    """
    v = int(log_probs.shape[-1])
    ctx_tables_dev = None
    if context_weight != 0.0 and (
        context_phrases is not None or context_tables is not None
    ):
        if context_tables is None:
            context_tables = build_context_tables(
                np.asarray(context_phrases), v
            )
        ctx_tables_dev = {
            k: jnp.asarray(context_tables[k])
            for k in ("j_of", "trans", "plen", "fail")
        }
    return _beam_device_jit(
        log_probs, lengths, lm_params, init_lm_cache, ctx_tables_dev,
        blank=int(blank), beam=int(beam),
        cutoff_top_n=int(cutoff_top_n), cutoff_logp=float(cutoff_logp),
        lm_step_fn=lm_step_fn, lm_weight=float(lm_weight),
        sos_id=int(sos_id), context_weight=float(context_weight),
    )


# ------------------------------------------------------ streaming variant

def ctc_beam_stream_init(
    batch: int,
    beam: int,
    max_frames: int,
    lm_step_fn=None,
    init_lm_cache=None,
    lm_params=None,
    sos_id: int = 1,
    num_phrases: int = 0,
) -> dict:
    """Carryable prefix-beam state for chunkwise streaming decoding
    (`ctc_beam_stream_step`): the same (toks, lens, last, hashes, pb,
    pnb) recursion state `ctc_prefix_beam_device` scans internally, with
    the token buffer sized to the stream bound.  Chunk boundaries do not
    exist in the math — feeding the same frames in any chunking yields
    bit-identical state — so streaming partials carry FULL prefix-beam
    quality, not greedy's.

    LM fusion state (directive: streaming partials keep fusion): pass
    the same (lm_step_fn, init_lm_cache, lm_params) as the one-shot
    search; init runs the <sos> seeding step so the carried state
    matches `ctc_prefix_beam_device`'s exactly.  Biasing state: pass
    num_phrases=P to carry the per-beam match counters.
    """
    h1, h2 = _init_hashes(beam)
    state = {
        "toks": jnp.zeros((batch, beam, max_frames), jnp.int32),
        "lens": jnp.zeros((batch, beam), jnp.int32),
        "last": jnp.full((batch, beam), -1, jnp.int32),
        "h1": jnp.broadcast_to(h1, (batch, beam)),
        "h2": jnp.broadcast_to(h2, (batch, beam)),
        "pb": jnp.broadcast_to(
            jnp.full((beam,), NEG_INF).at[0].set(0.0), (batch, beam)
        ),
        "pnb": jnp.full((batch, beam), NEG_INF),
        # valid frames fed so far (per stream): each one can append at
        # most one token, so `fed` bounds `lens` — the loud capacity
        # guard in ctc_beam_stream_step checks it against max_frames
        "fed": jnp.zeros((batch,), jnp.int32),
        "cmatch": jnp.zeros((batch, beam, num_phrases), jnp.int32),
    }
    if lm_step_fn is not None:
        bound = (
            partial(lm_step_fn, lm_params)
            if lm_params is not None else lm_step_fn
        )
        sos = jnp.full((batch * beam,), int(sos_id), jnp.int32)
        logp0, cache0 = bound(sos, init_lm_cache)
        state["lm_logp"] = logp0.reshape(batch, beam, -1)
        state["lm"] = jax.tree_util.tree_map(
            lambda x: x.reshape((batch, beam) + x.shape[1:]), cache0
        )
    else:
        state["lm_logp"] = jnp.zeros((batch, beam, 0), jnp.float32)
        state["lm"] = ()
    return state


@partial(jax.jit, static_argnames=("blank", "beam", "cutoff_top_n",
                                   "cutoff_logp", "lm_step_fn",
                                   "lm_weight", "context_weight"))
def _stream_step_jit(state, log_probs, frame_valid, lm_params,
                     ctx_tables, *, blank, beam, cutoff_top_n,
                     cutoff_logp, lm_step_fn, lm_weight, context_weight):
    use_lm = lm_step_fn is not None and lm_weight != 0.0
    if use_lm and lm_params is not None:
        bound_lm_step = partial(lm_step_fn, lm_params)
    else:
        bound_lm_step = lm_step_fn
    use_ctx = ctx_tables is not None and context_weight != 0.0

    def one_row(st, lp, valid):
        carry = (st["toks"], st["lens"], st["last"], st["h1"], st["h2"],
                 st["pb"], st["pnb"], st["lm"], st["lm_logp"],
                 st["cmatch"])
        step = partial(_step, blank=int(blank), beam=int(beam),
                       cutoff_top_n=int(cutoff_top_n),
                       cutoff_logp=float(cutoff_logp),
                       lm_step_fn=bound_lm_step if use_lm else None,
                       lm_weight=float(lm_weight) if use_lm else 0.0,
                       ctx=ctx_tables if use_ctx else None,
                       ctx_weight=float(context_weight))
        (toks, lens, last, h1, h2, pb, pnb, lm, lm_logp, cm), _ = (
            jax.lax.scan(step, carry, (lp, valid))
        )
        return {"toks": toks, "lens": lens, "last": last, "h1": h1,
                "h2": h2, "pb": pb, "pnb": pnb, "lm": lm,
                "lm_logp": lm_logp, "cmatch": cm,
                "fed": st["fed"] + jnp.sum(valid.astype(jnp.int32))}

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


def ctc_beam_stream_step(
    state: dict,
    log_probs: jnp.ndarray,
    frame_valid: jnp.ndarray,
    blank: int,
    beam: int = 10,
    cutoff_top_n: int = 40,
    cutoff_logp: float = -20.0,
    lm_step_fn=None,
    lm_weight: float = 0.0,
    lm_params=None,
    context_tables=None,
    context_weight: float = 0.0,
):
    """Advance the streaming prefix beam over one chunk.

    state: from `ctc_beam_stream_init` (or a previous step);
    log_probs [B, ch, V] log-softmax for this chunk's frames;
    frame_valid [B, ch] bool (stream warm-up / final-chunk padding
    frames pass state through unchanged — same contract as the
    streaming executor's `valid` output).

    LM fusion and hotword biasing carry across chunks exactly like the
    rest of the beam state (the LM cache and the phrase-match counters
    are per-beam state like pb/pnb): pass the SAME
    (lm_step_fn, lm_weight, lm_params) used at init, and
    `context_tables` from `build_context_tables` with
    `context_weight` — the state's `cmatch` must have been sized with
    init's num_phrases.

    Returns (new_state, (tokens [B, beam, max_frames], lens, scores))
    — the n-best ordered snapshot after this chunk.  Exact: running any
    chunking of T frames equals `ctc_prefix_beam_device` over the full
    [B, T, V] — with fusion and biasing ON too
    (tests/test_ctc_beam_device.py)."""
    # Loud capacity guard (the token buffer is static): every VALID
    # frame can append one token to a beam, so once the valid frames
    # fed would exceed the buffer, tail tokens could be silently
    # dropped (the append scatter has no slot).  `fed` is concrete
    # between host-driven ticks; callers who wrap this in their own
    # jit take over the bound (like StreamingRecognizer.step's PE
    # check).
    try:
        fed_now = int(np.max(np.asarray(state["fed"])))
        incoming = int(
            np.max(np.asarray(frame_valid).astype(np.int64).sum(-1))
        )
    except (TypeError, jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        fed_now = incoming = None
    if fed_now is not None:
        cap = int(state["toks"].shape[-1])
        if fed_now + incoming > cap:
            raise ValueError(
                f"stream exceeds the beam token buffer: {fed_now} valid "
                f"frames fed + {incoming} incoming > max_frames={cap}; "
                f"re-init ctc_beam_stream_init with a larger max_frames"
            )
    ctx_tables_dev = None
    if context_tables is not None and context_weight != 0.0:
        if state["cmatch"].shape[-1] != np.shape(
            context_tables["plen"]
        )[0]:
            raise ValueError(
                f"state carries {state['cmatch'].shape[-1]} phrase "
                f"counters but context_tables has "
                f"{np.shape(context_tables['plen'])[0]} phrases — init "
                f"the stream state with num_phrases matching the table"
            )
        ctx_tables_dev = {
            k: jnp.asarray(context_tables[k])
            for k in ("j_of", "trans", "plen", "fail")
        }
    return _stream_step_jit(
        state, log_probs, frame_valid, lm_params, ctx_tables_dev,
        blank=int(blank), beam=int(beam),
        cutoff_top_n=int(cutoff_top_n), cutoff_logp=float(cutoff_logp),
        lm_step_fn=lm_step_fn, lm_weight=float(lm_weight),
        context_weight=float(context_weight),
    )
