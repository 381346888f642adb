"""Solvers: training loops around a single jitted train step.

Capability parity with the reference's Solver hierarchy
(reference: src/solvers/__init__.py:9-123, src/solvers/transformer.py):
epoch loop with per-epoch `ep-NNNN` + `last` checkpoints, dev pass, best-cv
tracking, checkpoint retention, SGD-momentum/Adam optimizers, decay-rate LR
schedules, gradient accumulation (summing grads across micro-batches, as
the reference's repeated `backward` does), and global-norm clipping.

TPU re-design: forward+loss+grad+clip+update is ONE jitted function; the
batch is sharded over the mesh's data axis and parameters follow the
tensor-parallel rules in openasr_tpu.parallel — XLA inserts the gradient
all-reduce that DataParallel's scatter/gather used to do.  Loss
normalizations (CE by global tokens, CTC by global sequences) are computed
inside the jitted program, so sharded execution is bit-identical to
single-device.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openasr_tpu.models import _to_numpy
from openasr_tpu.ops.fused_adam import fill_legacy_state, fused_clip_adam
from openasr_tpu.ops.schedules import BobSchedule, get_schedule
from openasr_tpu.parallel import make_mesh, shard_batch
from openasr_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    _allgather_host_data,
    device_put_global,
    expert_parallel,
    mesh_process_count,
    mesh_process_index,
    param_shardings,
    replicated,
    reshard,
    sequence_parallel,
    zero1_sharding,
)
from openasr_tpu.utils import Timer
from openasr_tpu.utils.checkpoint import (
    AsyncCheckpointer,
    cleanup_ckpt,
    load_package,
    save_package,
)

logger = logging.getLogger(__name__)


def array_fields(batch: dict) -> dict:
    return {k: v for k, v in batch.items() if hasattr(v, "ndim")}


def freeze_until(n_updates: int, component_names: tuple):
    """optax transform that zeroes updates for the given top-level param
    components during the first `n_updates` optimizer steps — the exact
    semantics of wav2vec's `freeze_finetune_updates` gating
    (reference: src/blocks/wav2vec_encoder.py:123-149), expressed as a pure
    step-counted gate so it lives inside the jitted train step."""

    def init_fn(params):
        del params
        return {"count": jnp.zeros([], jnp.int32)}

    def update_fn(updates, state, params=None):
        del params
        factor = (state["count"] >= n_updates).astype(jnp.float32)
        new_updates = {}
        for key, tree in updates.items():
            if key in component_names:
                tree = jax.tree_util.tree_map(lambda u: u * factor, tree)
            new_updates[key] = tree
        return new_updates, {"count": state["count"] + 1}

    return optax.GradientTransformation(init_fn, update_fn)


class Solver:
    """Base solver; subclasses define `mix_losses` and `loss_keys`."""

    main_loss_key = "ce_loss"
    main_loss_norm = "n_tokens"

    def __init__(self, model, config, tr_loader, cv_loader, mesh=None,
                 seed: int = 0):
        self.model = model
        self.config = config
        self.tr_loader = tr_loader
        self.cv_loader = cv_loader
        self.mesh = mesh if mesh is not None else make_mesh()

        self.num_epoch = int(config["num_epoch"])
        self.exp_dir = config["exp_dir"]
        self.print_inteval = int(config.get("print_inteval", 100))
        self.accumulate_grad_batch = int(config.get("accumulate_grad_batch", 1))
        self.init_lr = float(config["init_lr"])
        self.grad_max_norm = float(config.get("grad_max_norm", 0.0))
        self.label_smooth = float(config.get("label_smooth", 0.0))
        self.num_last_ckpt_keep = config.get("num_last_ckpt_keep")

        self.schedule = get_schedule(config["lr_scheduler"])
        self.is_bob = isinstance(self.schedule, BobSchedule)

        # Solver state (reference: solvers/__init__.py:53-68)
        self.epoch = 0
        self.step = 0
        self.tr_loss = []
        self.cv_loss = []

        self.rng = jax.random.PRNGKey(seed)
        # multi-host: host 0 of the MESH's backend owns checkpoint/metrics
        # writes (jax.process_index() can answer for the wrong backend)
        self.is_host0 = mesh_process_index(self.mesh) == 0
        self.tx = self._make_optimizer(config)
        # training.zero1 (default on): shard optimizer moments over the
        # data axis (ZeRO-1) — semantically free (moments are pure
        # per-element state), cuts optimizer HBM and update traffic by
        # 1/|data| per chip.  No-op on a 1-wide data axis.
        self.zero1 = bool(config.get("zero1", True))
        # training.sequence_parallel (default on): under tensor
        # parallelism, pin residual-stream activations to T-sharding over
        # the 'model' axis (parallel/mesh.py:shard_time) — the Megatron
        # sequence-parallel recipe as pure placement.  The mesh is scoped
        # per jitted-step call so interleaved solvers on different meshes
        # each bake their own constraints.
        self._sp_mesh = (
            self.mesh
            if bool(config.get("sequence_parallel", True))
            and self.mesh.shape[MODEL_AXIS] > 1
            else None
        )
        # GPipe pipeline parallelism: on a pipe>1 mesh, models with a
        # stacked encoder (encoder.pipeline: true) stream
        # training.pipeline_microbatch microbatches through the stages
        # (parallel/pipeline.py).  Scoped per step call like _sp_mesh.
        pipe_n = dict(self.mesh.shape).get("pipe", 1)
        self._pipe_ctx = (
            (self.mesh, int(config.get("pipeline_microbatch", 4 * pipe_n)))
            if pipe_n > 1
            else None
        )
        # Expert parallelism (models/moe.py): on a data>1 mesh, MoE
        # dispatch tensors pin to E-sharding over 'data'
        # (parallel/mesh.py:shard_experts) — a no-op trace scope for
        # models without MoE layers.
        self._ep_mesh = (
            self.mesh if self.mesh.shape[DATA_AXIS] > 1 else None
        )
        moe_cfg = (
            model.moe_config() if hasattr(model, "moe_config") else None
        )
        if moe_cfg is not None and self.mesh.shape[DATA_AXIS] > 1:
            n_exp = int(moe_cfg.get("num_experts", 0))
            if n_exp % self.mesh.shape[DATA_AXIS] != 0:
                # correct numerics, but the tables replicate and tokens
                # all-gather — none of the advertised expert parallelism
                logging.warning(
                    "moe: num_experts=%d does not divide the data axis "
                    "(%d); expert tables will be REPLICATED on every "
                    "chip (no expert parallelism). Use a multiple of "
                    "the data-axis size for sharded experts.",
                    n_exp, self.mesh.shape[DATA_AXIS],
                )
        params = self._place_params(model.params)
        self.model.params = params
        # optimizer moments are zeros_like(params): they inherit the
        # parameter shardings automatically, then (zero1) gain data-axis
        # sharding on their largest divisible dim.  Scalar leaves (step
        # counters) are committed to a replicated mesh sharding so restore
        # targets and the donated step agree on placement.
        self.opt_state = self._place_opt_state(self.tx.init(params))

        os.makedirs(self.exp_dir, exist_ok=True)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._grad_accum = None

    # ------------------------------------------------------------ optimizer

    def _make_optimizer(self, config):
        decay = self.schedule

        def lr_fn(count):
            # reference steps the scheduler BEFORE set_lr, so lr at update k
            # uses step k+1 (src/solvers/transformer.py:62-64)
            return self.init_lr * decay(count + 1)

        opt_type = config.get("optimtype", "adam")
        gate = getattr(self.model, "freeze_gate", None)
        # training.adam_mu_dtype / adam_nu_dtype: bfloat16 halves the
        # corresponding moment's state and read/write traffic in the
        # (bandwidth-bound) optimizer update.  First moment defaults to
        # bfloat16 — a 250-epoch convergence A/B on the synthetic corpus
        # is CER-identical to f32 (0.0217 both).  Second moment stays f32
        # by default: the same A/B degrades 0.0217 -> 0.0652 with nu in
        # bf16 (sqrt halves the mantissa's effective precision).  Set
        # adam_mu_dtype: float32 to restore exact reference semantics.
        mu_dtype = config.get("adam_mu_dtype", "bfloat16")
        if mu_dtype in ("float32", "f32"):
            mu_dtype = None
        nu_dtype = config.get("adam_nu_dtype")
        if nu_dtype in ("float32", "f32"):
            nu_dtype = None
        # training.skip_nonfinite_grads (default on): a step whose
        # gradients are inf/nan (bf16 overflow, degenerate CTC batch) is
        # REJECTED — params/moments untouched, metrics.jsonl gains a
        # nonfinite_skips counter — instead of nan-poisoning the run the
        # way the reference's torch Adam would.  Deliberate deviation,
        # documented in docs/MIGRATION.md; set false for exact reference
        # blow-up semantics.
        skip_nonfinite = bool(config.get("skip_nonfinite_grads", True))
        if (
            opt_type == "adam"
            and not gate
            and config.get("fused_adam", True)
        ):
            # single fused clip+Adam pass (ops/fused_adam.py) — exact
            # optax-chain semantics, a fraction of the HBM traffic
            tx = fused_clip_adam(
                lr_fn, b1=0.9, b2=0.999, eps=1e-8,
                max_norm=float(self.grad_max_norm),
                mu_dtype=mu_dtype, nu_dtype=nu_dtype,
                skip_nonfinite=skip_nonfinite,
            )
            frozen = getattr(self.model, "frozen_components", ())
            if frozen:
                def mask(params):
                    return {
                        k: jax.tree_util.tree_map(
                            lambda _: k not in frozen, v
                        )
                        for k, v in params.items()
                    }
                tx = optax.masked(tx, mask)
            return tx
        # the stock-optax fallback (freeze_gate / fused_adam: false / sgd)
        # cannot honor a narrowed second moment: optax.adam has no nu
        # dtype.  Say so instead of silently keeping f32.
        if nu_dtype is not None:
            logging.warning(
                "training.adam_nu_dtype=%s is ignored on the non-fused "
                "optimizer path (freeze_gate / fused_adam: false / "
                "optimtype!=adam): the second moment stays float32",
                config.get("adam_nu_dtype"),
            )
        if opt_type == "adam":
            opt = optax.adam(
                lr_fn, b1=0.9, b2=0.999, eps=1e-8,
                mu_dtype=jnp.dtype(mu_dtype) if mu_dtype else None,
            )
        elif opt_type == "sgd":
            if "adam_mu_dtype" in config:
                logging.warning(
                    "training.adam_mu_dtype is ignored with optimtype=sgd"
                )
            opt = optax.sgd(lr_fn, momentum=0.9)
        else:
            raise ValueError(f"Unknown optimizer {opt_type}")
        chain = []
        if gate:
            components, n_updates = gate
            chain.append(freeze_until(int(n_updates), tuple(components)))
        if self.grad_max_norm > 0:
            chain.append(optax.clip_by_global_norm(self.grad_max_norm))
        chain.append(opt)
        tx = optax.chain(*chain)
        frozen = getattr(self.model, "frozen_components", ())
        if frozen:
            def mask(params):
                return {
                    k: jax.tree_util.tree_map(lambda _: k not in frozen, v)
                    for k, v in params.items()
                }
            tx = optax.masked(tx, mask)
        if skip_nonfinite:
            # stock-optax fallback path: same reject-the-step semantics
            # via optax's wrapper (state exposes total_notfinite); errors
            # out after 100 consecutive bad steps — a run that diverged
            # for good should fail loudly, not spin.
            tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
        return tx

    def _place_params(self, params):
        shardings = param_shardings(params, self.mesh)
        return jax.tree_util.tree_map(device_put_global, params, shardings)

    def _place_opt_state(self, opt_state):
        """Commit every opt-state leaf to a mesh placement: scalars /
        unsharded leaves (e.g. step counters created by tx.init) go
        replicated; with zero1 on a >1-wide data axis, moment-shaped
        leaves additionally shard over 'data' (composing with whatever
        tensor-parallel sharding they inherited from the params)."""
        rep = replicated(self.mesh)
        use_zero1 = self.zero1 and self.mesh.shape[DATA_AXIS] > 1

        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        placed = list(leaves)
        to_reshard: dict = {}  # leaf index -> target sharding
        for i, leaf in enumerate(leaves):
            if not hasattr(leaf, "ndim"):  # e.g. optax MaskedNode
                continue
            if use_zero1 and leaf.ndim:
                z1 = zero1_sharding(leaf, self.mesh)
                if z1 is not None:
                    if isinstance(
                        getattr(leaf, "sharding", None),
                        jax.sharding.NamedSharding,
                    ):
                        # already committed to the mesh (inherited from a
                        # sharded param): reshard on device — may be
                        # cross-host, so no host round-trip.  Deferred so
                        # ALL such leaves move in ONE jitted program (a
                        # reshard per leaf would compile hundreds of tiny
                        # executables at solver init).
                        to_reshard[i] = z1
                    else:
                        placed[i] = device_put_global(np.asarray(leaf), z1)
                    continue
            sh = getattr(leaf, "sharding", None)
            if isinstance(sh, jax.sharding.NamedSharding):
                continue
            placed[i] = device_put_global(leaf, rep)
        if to_reshard:
            idxs = sorted(to_reshard)
            moved = reshard(
                [leaves[i] for i in idxs], [to_reshard[i] for i in idxs]
            )
            for i, m in zip(idxs, moved):
                placed[i] = m
        return jax.tree_util.tree_unflatten(treedef, placed)

    def _opt_state_constraint(self):
        """Constrain-to-placement closure for the freshly computed
        opt_state inside the jitted step.  GSPMD propagation usually
        keeps the data-sharded moments sharded on its own, but donation
        REQUIRES input/output placements to agree — make it explicit.
        Identity when zero1 placement is off (propagation already
        preserves the pure-TP/replicated layout, as the pre-zero1 tests
        established)."""
        if not (self.zero1 and self.mesh.shape[DATA_AXIS] > 1):
            return lambda os: os
        # "keep" (a plain leaf, unlike None which pytrees treat as an
        # empty subtree) marks leaves that never got a mesh placement
        shardings = jax.tree_util.tree_map(
            lambda l: getattr(l, "sharding", None) or "keep", self.opt_state
        )

        def constrain(os):
            return jax.tree_util.tree_map(
                lambda l, s: (
                    jax.lax.with_sharding_constraint(l, s)
                    if isinstance(s, jax.sharding.NamedSharding)
                    else l
                ),
                os,
                shardings,
            )

        return constrain

    def current_lr(self) -> float:
        return float(self.init_lr * self.schedule(self.step + 1))

    # ----------------------------------------------------------- loss mixing

    def mix_losses(self, losses: Dict) -> jnp.ndarray:
        raise NotImplementedError

    def total_loss(self, losses: Dict) -> jnp.ndarray:
        """The optimized objective: `mix_losses` plus the MoE routers'
        weighted load-balance auxiliary — present in the loss dict only
        for models with MoE layers (models/moe.py, collected by
        Framework.apply_with_moe_aux)."""
        total = self.mix_losses(losses)
        if "moe_aux_loss" in losses:
            total = total + losses["moe_aux_loss"]
        return total

    def model_loss(self, params, batch, rngs, train, batch_stats=None):
        kwargs = {"label_smooth": self.label_smooth}
        if batch_stats is not None:
            kwargs["batch_stats"] = batch_stats
        return self.model.loss(params, batch, rngs, train=train, **kwargs)

    # ----------------------------------------------------------- train steps

    def _with_sp(self, fn: Callable) -> Callable:
        """Scope this solver's sequence-parallel mesh AND pipeline
        context to each call of a jitted step, so the (lazy, first-call)
        trace bakes the right `shard_time` constraints / GPipe lowering
        even when solvers on different meshes are constructed
        interleaved."""
        if (
            self._sp_mesh is None
            and self._pipe_ctx is None
            and self._ep_mesh is None
        ):
            return fn
        from openasr_tpu.parallel.pipeline import pipeline_scope

        def wrapped(*args, **kwargs):
            with sequence_parallel(self._sp_mesh), expert_parallel(
                self._ep_mesh
            ), pipeline_scope(self._pipe_ctx):
                return fn(*args, **kwargs)

        return wrapped

    def _build_train_step(self) -> Callable:
        tx = self.tx
        has_bs = self.model.batch_stats is not None
        constrain_opt = self._opt_state_constraint()

        if has_bs:
            @partial(jax.jit, donate_argnums=(0, 1, 2))
            def train_step_bs(params, opt_state, batch_stats, batch, rng):
                rngs = {"dropout": rng, "aug": jax.random.fold_in(rng, 1)}

                def loss_fn(p):
                    losses = self.model_loss(
                        p, batch, rngs, True, batch_stats=batch_stats
                    )
                    new_bs = losses.pop("batch_stats", batch_stats)
                    return self.total_loss(losses), (losses, new_bs)

                (loss, (losses, new_bs)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                opt_state = constrain_opt(opt_state)
                params = optax.apply_updates(params, updates)
                return params, opt_state, new_bs, loss, losses

            def train_step(params, opt_state, batch, rng):
                params, opt_state, new_bs, loss, losses = train_step_bs(
                    params, opt_state, self.model.batch_stats, batch, rng
                )
                self.model.batch_stats = new_bs
                return params, opt_state, loss, losses

            return self._with_sp(train_step)

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng):
            rngs = {"dropout": rng, "aug": jax.random.fold_in(rng, 1)}

            def loss_fn(p):
                losses = self.model_loss(p, batch, rngs, True)
                return self.total_loss(losses), losses

            (loss, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            opt_state = constrain_opt(opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, losses

        return self._with_sp(train_step)

    def _refresh_jitted_steps(self) -> None:
        """Bob plateau decay mutates the lr closure's decay_rate — a HOST
        value that was baked into the jitted train step as a trace-time
        constant (BobSchedule.__call__ ignores the traced count), so
        without a rebuild the cached executable would apply the original
        learning rate forever while the host-side lr log shows the
        decayed one.  Each distinct rate costs one recompile; bob decays
        only at plateau epoch boundaries."""
        self._train_step = self._build_train_step()
        self._grad_accum = None

    def _build_eval_step(self) -> Callable:
        has_bs = self.model.batch_stats is not None

        if has_bs:
            @jax.jit
            def eval_step_bs(params, batch_stats, batch):
                return self.model_loss(
                    params, batch, {}, False, batch_stats=batch_stats
                )

            return self._with_sp(
                lambda params, batch: eval_step_bs(
                    params, self.model.batch_stats, batch
                )
            )

        @jax.jit
        def eval_step(params, batch):
            return self.model_loss(params, batch, {}, False)

        return self._with_sp(eval_step)

    def _build_accum_steps(self):
        """Two-phase path for accumulate_grad_batch > 1: grads summed over
        micro-batches (matching the reference's repeated backward without
        zero_grad, src/solvers/transformer.py:56-68).  BatchNorm models
        thread their running statistics through every micro-batch exactly
        like the single-step path — dropping them here would leave
        cross-validation normalizing with init-time stats forever."""
        tx = self.tx
        has_bs = self.model.batch_stats is not None

        if has_bs:
            @jax.jit
            def grad_step_bs(params, batch_stats, batch, rng, acc):
                rngs = {"dropout": rng, "aug": jax.random.fold_in(rng, 1)}

                def loss_fn(p):
                    losses = self.model_loss(
                        p, batch, rngs, True, batch_stats=batch_stats
                    )
                    new_bs = losses.pop("batch_stats", batch_stats)
                    return self.total_loss(losses), (losses, new_bs)

                (loss, (losses, new_bs)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                acc = jax.tree_util.tree_map(jnp.add, acc, grads)
                return acc, new_bs, loss, losses

            def grad_step(params, batch, rng, acc):
                acc, new_bs, loss, losses = grad_step_bs(
                    params, self.model.batch_stats, batch, rng, acc
                )
                self.model.batch_stats = new_bs
                return acc, loss, losses
        else:
            @jax.jit
            def grad_step(params, batch, rng, acc):
                rngs = {"dropout": rng, "aug": jax.random.fold_in(rng, 1)}

                def loss_fn(p):
                    losses = self.model_loss(p, batch, rngs, True)
                    return self.total_loss(losses), losses

                (loss, losses), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                acc = jax.tree_util.tree_map(jnp.add, acc, grads)
                return acc, loss, losses

        constrain_opt = self._opt_state_constraint()

        @partial(jax.jit, donate_argnums=(0, 1))
        def apply_step(params, opt_state, acc):
            updates, opt_state = tx.update(acc, opt_state, params)
            opt_state = constrain_opt(opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state

        return self._with_sp(grad_step), apply_step

    # One shared accumulate/flush protocol for every epoch loop (base,
    # CIF_MIX dual-loader, GAN): the cursor owns the acc-tree lifecycle,
    # the boundary apply, and the optimizer/step bookkeeping, so the
    # loops only decide WHEN a boundary falls (micro-batch count in the
    # base loop vs iteration count in the dual-loader loops — that
    # difference is reference semantics, src/solvers/transformer.py:56-68
    # vs cif.py:430-503).

    def _accum_begin(self) -> dict:
        if self._grad_accum is None:
            self._grad_accum = self._build_accum_steps()
        return {"acc": None, "n": 0}

    def _accum_micro(self, cur: dict, params, arrays, rng):
        """One accumulated micro-batch; returns (loss, losses)."""
        grad_step, _ = self._grad_accum
        if cur["acc"] is None:
            cur["acc"] = jax.tree_util.tree_map(jnp.zeros_like, params)
        cur["acc"], loss, losses = grad_step(params, arrays, rng, cur["acc"])
        cur["n"] += 1
        return loss, losses

    def _accum_maybe_apply(self, cur: dict, params, boundary: bool):
        """On a boundary (or the epoch-end remainder), apply the summed
        grads, advance opt_state/step, and reset the cursor; returns the
        (possibly updated) params."""
        if not boundary or cur["acc"] is None:
            return params
        _, apply_step = self._grad_accum
        params, self.opt_state = apply_step(params, self.opt_state, cur["acc"])
        self.model.params = params
        cur["acc"] = None
        self.step += 1
        return params

    # ----------------------------------------------------------- epoch loops
    #
    # Loss totals are accumulated ON DEVICE and only pulled to the host at
    # print intervals / epoch end — a per-batch float() would force a device
    # sync every step and stall the TPU dispatch pipeline (the reference's
    # .item() calls had the same cost on GPU, src/solvers/transformer.py:
    # 44-55, but PyTorch eager hid it).  The helpers below are shared by the
    # base loop and the CIF_MIX dual-loader loop so the accounting cannot
    # drift between them.

    def _totals_update(self, totals, losses):
        tot, tot_norm, tot_seqs = totals
        norm = losses[self.main_loss_norm]
        tot_norm = norm if tot_norm is None else tot_norm + norm
        seqs = losses["n_seqs"]
        tot_seqs = seqs if tot_seqs is None else tot_seqs + seqs
        for k in losses:
            if k.endswith("_loss"):
                tot[k] = tot[k] + losses[k] if k in tot else losses[k]
        return (tot, tot_norm, tot_seqs)

    def _nonfinite_skips(self) -> int:
        """Total steps rejected by skip_nonfinite_grads (0 when disabled):
        the fused state's `notfinite` / optax's `total_notfinite`."""
        total = 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            self.opt_state
        )[0]:
            if jax.tree_util.keystr(path).endswith("notfinite"):
                total += int(leaf)
        return total

    def _totals_log(self, totals, timer, niter, tot_iters, phase) -> None:
        tot, tot_norm, tot_seqs = totals
        host_norm = max(float(tot_norm), 1.0)
        host_tot = {k: float(v) for k, v in tot.items()}
        sent_per_sec = float(tot_seqs) / max(timer.toc(), 1e-9)
        skips = self._nonfinite_skips() if phase == "train" else 0
        if skips and skips != getattr(self, "_warned_skips", 0):
            self._warned_skips = skips
            logger.warning(
                "skip_nonfinite_grads: %d step(s) rejected so far "
                "(inf/nan gradients; params untouched)", skips,
            )
        parts = " ".join(
            f"{k}: {v / host_norm:.3f}" for k, v in host_tot.items()
        )
        logger.info(
            "Epoch %d | Step %d | Batch %d/%d | %s | lr %.3e | "
            "sent/sec %.2f",
            self.epoch, self.step, niter, tot_iters, parts,
            self.current_lr(), sent_per_sec,
        )
        self._log_metrics({
            "phase": phase,
            "epoch": self.epoch,
            "step": self.step,
            "batch": niter,
            "lr": self.current_lr(),
            "sent_per_sec": sent_per_sec,
            **({"nonfinite_skips": skips} if skips else {}),
            **{k: v / host_norm for k, v in host_tot.items()},
        })

    def _totals_close(self, totals) -> float:
        """Epoch epilogue: close a profiler window that spanned the epoch
        end, return the epoch-mean main loss."""
        if getattr(self, "_profiling", False):
            jax.profiler.stop_trace()
            self._profiling = False
            self._profiled = True
            logger.info("profiler: trace stopped (epoch end)")
        tot, tot_norm, _ = totals
        if tot_norm is None:
            return 0.0
        return float(tot[self.main_loss_key]) / max(float(tot_norm), 1e-9)

    def iter_one_epoch(self, cross_valid: bool = False) -> float:
        loader = self.cv_loader if cross_valid else self.tr_loader
        timer = Timer()
        timer.tic()
        totals = ({}, None, None)

        accum_cur = None
        if not cross_valid and self.accumulate_grad_batch > 1:
            accum_cur = self._accum_begin()

        tot_iters = len(loader)
        params = self.model.params
        for niter, (batch, arrays) in enumerate(
            self._prefetch_batches(loader), start=1
        ):
            if not cross_valid and self._should_stop(niter):
                logger.warning(
                    "preemption: stopping epoch %d at batch %d/%d",
                    self.epoch, niter, tot_iters,
                )
                break

            if cross_valid:
                losses = self._eval_step(params, arrays)
                if niter == 1:
                    self.sample_decode(params, arrays, batch)
            else:
                self._maybe_profile()
                rng = jax.random.fold_in(self.rng, self.step * 8191 + niter)
                if accum_cur is not None:
                    loss, losses = self._accum_micro(
                        accum_cur, params, arrays, rng
                    )
                    params = self._accum_maybe_apply(
                        accum_cur, params,
                        accum_cur["n"] % self.accumulate_grad_batch == 0
                        or niter == tot_iters,
                    )
                else:
                    params, self.opt_state, loss, losses = self._train_step(
                        params, self.opt_state, arrays, rng
                    )
                    self.model.params = params
                    self.step += 1

            totals = self._totals_update(totals, losses)
            if niter % self.print_inteval == 0:
                self._totals_log(
                    totals, timer, niter, tot_iters,
                    "cv" if cross_valid else "train",
                )

        return self._totals_close(totals)

    def _prefetch_batches(self, loader):
        """One-batch lookahead: issue batch N+1's host->device transfer
        (shard_batch -> device_put) before yielding batch N, so the input
        copy rides alongside step N's compute instead of serializing with
        it.  Device transfers are async under JAX, but the lookahead makes
        the overlap structural rather than backend-dependent."""
        prev = None
        for batch in loader:
            arrays = shard_batch(array_fields(batch), self.mesh)
            if prev is not None:
                yield prev
            prev = (batch, arrays)
        if prev is not None:
            yield prev

    def _install_preemption_handler(self) -> None:
        """SIGTERM (and SIGUSR1, the common preemption warning on cloud
        schedulers) triggers checkpoint-and-exit at the next batch boundary.
        Installed only in the main thread; no-op elsewhere."""
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return

        def _handler(signum, frame):
            del frame
            self._stop_requested = True
            logger.warning(
                "received signal %d: will checkpoint and stop", signum
            )

        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                signal.signal(sig, _handler)
            except (ValueError, OSError):  # pragma: no cover
                pass

    # collective stop checks run every N train batches (not every batch:
    # each check is a blocking cross-host gather); preemption reaction
    # latency is bounded by N steps, ~seconds
    STOP_CHECK_INTERVAL = 8

    def _should_stop(self, niter: int = 0) -> bool:
        """Preemption stop, agreed COLLECTIVELY across hosts.  A SIGTERM
        may be delivered to a subset of processes, but everything that
        follows a stop — multi-host batch assembly, collective checkpoint
        packaging — is a collective: a one-sided break would wedge every
        other host in a collective the stopped host never joins.  All
        hosts reach this check at the same iteration (identical batch
        plans) and consult the collective only on the same deterministic
        schedule (niter % STOP_CHECK_INTERVAL, plus every epoch-boundary
        call with niter=0), so the decision is unanimous and the hot loop
        pays one tiny gather every N batches instead of one per batch.
        Single-process runs short-circuit to the local flag."""
        local = bool(getattr(self, "_stop_requested", False))
        mesh = getattr(self, "mesh", None)
        if mesh is None or mesh_process_count(mesh) <= 1:
            return local
        if getattr(self, "_stop_agreed", False):
            return True
        if niter % self.STOP_CHECK_INTERVAL != 0:
            return False  # between check boundaries: keep training
        flags = _allgather_host_data(mesh, np.asarray([local], np.int32))
        if bool(flags.any()):
            self._stop_requested = True
            self._stop_agreed = True
            return True
        return False

    def sample_decode(self, params, arrays, batch) -> None:
        """Hook: log a sample decode on the first dev batch (no-op by
        default; CTC solvers print a greedy collapse, mirroring the
        reference's dev-time sample, src/solvers/transformer.py:203-208)."""

    # -------------------------------------------------------- observability

    def _log_metrics(self, record: dict) -> None:
        """Append one JSON line to exp_dir/metrics.jsonl (the rebuild's
        replacement for the reference's removed tensorboardX logging,
        reference: src/utils.py:14 TENSORBOARD_LOGGING stub)."""
        import json

        def _py(v):
            if hasattr(v, "item"):
                return v.item()
            return v

        if not getattr(self, "is_host0", True):
            return  # multi-host: one metrics stream, written by host 0
        record = {"time": time.time(), **{k: _py(v) for k, v in record.items()}}
        with open(os.path.join(self.exp_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")
        self._tb_log(record)

    def _tb_log(self, record: dict) -> None:
        """Optional TensorBoard mirror of metrics.jsonl: every numeric
        field becomes a `{phase}/{key}` scalar at the global step.  Enabled
        by `training.tensorboard: true` or OPENASR_TENSORBOARD=1; restores
        the loss/lr curves the reference README advertised but whose code
        was lost (reference: src/utils.py:14 TENSORBOARD_LOGGING stub,
        README_zh.md visualizations).  Degrades to a no-op if the
        tensorboard writer is unavailable."""
        enabled = bool(self.config.get("tensorboard", False)) or (
            os.environ.get("OPENASR_TENSORBOARD") == "1"
        )
        if not enabled:
            return
        writer = getattr(self, "_tb_writer", None)
        if writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                writer = SummaryWriter(os.path.join(self.exp_dir, "tb"))
            except Exception as e:  # pragma: no cover - env without TB
                logger.warning("tensorboard logging unavailable: %s", e)
                writer = False
            self._tb_writer = writer
        if writer is False:
            return
        phase = str(record.get("phase", "train"))
        step = int(record.get("step", 0))
        for k, v in record.items():
            if k in ("phase", "epoch", "step", "batch", "time"):
                continue
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                writer.add_scalar(f"{phase}/{k}", float(v), step)
        writer.flush()

    def _maybe_profile(self) -> None:
        """jax.profiler trace over a configured step window:
        training.profile: {start_step: int, num_steps: int, logdir: str}."""
        prof = self.config.get("profile")
        if not prof:
            return
        start = int(prof.get("start_step", 10))
        num = int(prof.get("num_steps", 5))
        if (
            start <= self.step < start + num
            and not getattr(self, "_profiling", False)
            and not getattr(self, "_profiled", False)
        ):
            logdir = prof.get(
                "logdir", os.path.join(self.exp_dir, "profile")
            )
            jax.profiler.start_trace(logdir)
            self._profiling = True
            logger.info("profiler: trace started -> %s", logdir)
        elif getattr(self, "_profiling", False) and self.step >= start + num:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready(),
                jax.tree_util.tree_leaves(self.model.params)[:1],
            )
            jax.profiler.stop_trace()
            self._profiling = False
            self._profiled = True
            logger.info("profiler: trace stopped")

    def train(self) -> None:
        self._install_preemption_handler()
        best_cv = min(self.cv_loss) if self.cv_loss else 9e20
        while self.epoch < self.num_epoch:
            t0 = time.time()
            self.epoch += 1
            tr_loss = self.iter_one_epoch()
            if self._should_stop():
                # preempted mid-epoch: persist a restartable snapshot (the
                # interrupted epoch restarts from its beginning under
                # --continue-training) and leave.  The reference had no
                # preemption handling at all (SURVEY.md §5).
                self.epoch -= 1
                self.save(os.path.join(self.exp_dir, "last.pkg"))
                if hasattr(self, "_ckpt"):
                    self._ckpt.wait()
                logger.warning("preemption: saved last.pkg, exiting")
                return
            self.save(os.path.join(self.exp_dir, f"ep-{self.epoch:04d}.pkg"))
            self.save(os.path.join(self.exp_dir, "last.pkg"))
            cv_loss = self.iter_one_epoch(cross_valid=True)
            best_cv = min(best_cv, cv_loss)
            if self.is_bob:
                prev_rate = self.schedule.decay_rate
                self.schedule.update(cv_loss)
                if self.schedule.decay_rate != prev_rate:
                    self._refresh_jitted_steps()
            logger.info(
                "Epoch %d done: tr %.4f cv %.4f (best %.4f) in %.1f min",
                self.epoch, tr_loss, cv_loss, best_cv,
                (time.time() - t0) / 60.0,
            )
            self._log_metrics(
                {
                    "phase": "epoch",
                    "epoch": self.epoch,
                    "step": self.step,
                    "tr_loss": tr_loss,
                    "cv_loss": cv_loss,
                    "best_cv": best_cv,
                    "minutes": (time.time() - t0) / 60.0,
                }
            )
            self.tr_loss.append(tr_loss)
            self.cv_loss.append(cv_loss)
            if hasattr(self, "_ckpt"):
                self._ckpt.wait()  # drain async writes before retention
            if self.num_last_ckpt_keep and getattr(self, "is_host0", True):
                # multi-host: only the writing host prunes — concurrent
                # removers on a shared exp_dir race each other
                cleanup_ckpt(self.exp_dir, int(self.num_last_ckpt_keep))

    # ------------------------------------------------------------ packaging

    def training_state(self) -> dict:
        return {
            "epoch": self.epoch,
            "step": self.step,
            "tr_loss": self.tr_loss,
            "cv_loss": self.cv_loss,
            "lr": self.current_lr(),
        }

    def package(self) -> dict:
        pkg = {
            "model": self.model.package(),
            "solver_config": (
                self.config.to_dict()
                if hasattr(self.config, "to_dict")
                else dict(self.config)
            ),
            "solver_state": self.training_state(),
            "optim_state": _to_numpy(self.opt_state),
        }
        if self.is_bob:
            pkg["scheduler_state"] = self.schedule.pack_state()
        return pkg

    def save(self, path: str) -> None:
        # package() first on EVERY host — fetching a cross-host-sharded
        # leaf is a collective all-gather (models/__init__._to_numpy) —
        # then host 0 alone writes the one checkpoint file
        pkg = self.package()
        if not getattr(self, "is_host0", True):
            return
        if not hasattr(self, "_ckpt"):
            self._ckpt = AsyncCheckpointer()
        self._ckpt.save(pkg, path)

    def restore(self, pkg: dict) -> None:
        state = pkg["solver_state"]
        self.epoch = state["epoch"]
        self.step = state["step"]
        self.tr_loss = list(state["tr_loss"])
        self.cv_loss = list(state["cv_loss"])
        # model.restore() leaves params wherever jnp.asarray put them
        # (default device); re-place them onto the mesh shardings so the
        # donated train step runs in place after a restore
        self.model.params = self._place_params(self.model.params)
        if pkg.get("optim_state") is not None:
            # restore each leaf onto the CURRENT opt_state's sharding —
            # plain jnp.asarray would land everything replicated on the
            # default device, and the first donated train step after a
            # tensor-parallel restore would then reshard (or OOM) instead
            # of running in place
            target = jax.tree_util.tree_structure(self.opt_state)
            leaves = jax.tree_util.tree_leaves(
                fill_legacy_state(pkg["optim_state"])
            )
            cur = jax.tree_util.tree_leaves(self.opt_state)
            assert len(leaves) == len(cur), (
                f"optimizer state mismatch: checkpoint has {len(leaves)} "
                f"leaves, current optimizer expects {len(cur)}"
            )
            self.opt_state = jax.tree_util.tree_unflatten(
                target,
                [
                    device_put_global(np.asarray(l), c.sharding)
                    for l, c in zip(leaves, cur)
                ],
            )
        if self.is_bob and "scheduler_state" in pkg:
            self.schedule.restore_state(pkg["scheduler_state"])
            # the steps jitted in __init__ baked decay_rate=1.0
            self._refresh_jitted_steps()


class CESolver(Solver):
    """loss = ce/n_tokens (reference: src/solvers/transformer.py:9-79)."""

    def mix_losses(self, losses):
        return losses["ce_loss"] / losses["n_tokens"]


class CTCCESolver(Solver):
    """loss = ce/n_tokens + lambda_ctc * ctc/n_seqs
    (reference: src/solvers/transformer.py:82-131)."""

    def __init__(self, model, config, tr_loader, cv_loader, **kw):
        super().__init__(model, config, tr_loader, cv_loader, **kw)
        self.lambda_ctc = float(config.get("lambda_ctc", 1.0))

    def mix_losses(self, losses):
        return (
            losses["ce_loss"] / losses["n_tokens"]
            + float(self.config.get("lambda_ctc", 1.0))
            * losses["ctc_loss"] / losses["n_seqs"]
        )


class CTCSolver(Solver):
    """loss = ctc/n_seqs (reference: src/solvers/transformer.py:164-230)."""

    main_loss_key = "ctc_loss"
    main_loss_norm = "n_tokens"

    def mix_losses(self, losses):
        return losses["ctc_loss"] / losses["n_seqs"]

    def sample_decode(self, params, arrays, batch) -> None:
        if not hasattr(self.model, "greedy_decode"):
            return
        try:
            if "waves" in arrays:
                inputs, lengths = arrays["waves"], arrays["wave_lengths"]
            else:
                inputs, lengths = arrays["feats"], arrays["feat_lengths"]
            ids, lens = self.model.greedy_decode(params, inputs, lengths)
            toks = list(np.asarray(ids)[0][: int(np.asarray(lens)[0])])
            logger.info("dev sample greedy ids: %s", toks)
        except Exception as exc:  # logging must never kill training
            logger.debug("sample decode skipped: %s", exc)


SOLVER_REGISTRY = {
    "conv-transformer": CESolver,
    "conv-ctc-transformer": CTCCESolver,
    "conv-ctc": CTCSolver,
    "gru_ctc": CTCSolver,
    "wav2vec_ctc": CTCSolver,
}


def get_solver_class(model_type: str):
    if model_type not in SOLVER_REGISTRY:
        import contextlib

        for mod in ("cif", "cpc", "phone2char"):
            with contextlib.suppress(ImportError):
                __import__(f"openasr_tpu.solvers.{mod}")
    if model_type not in SOLVER_REGISTRY:
        # same case/-/_-insensitive resolution as get_model_class (the
        # reference YAMLs spell types inconsistently, e.g. Conv_CTC)
        from openasr_tpu.models import _MODEL_ALIASES, _normalize

        norm = _MODEL_ALIASES.get(_normalize(model_type), _normalize(model_type))
        by_norm = {_normalize(k): k for k in SOLVER_REGISTRY}
        if norm in by_norm:
            return SOLVER_REGISTRY[by_norm[norm]]
        raise ValueError(f"No solver for model type {model_type!r}")
    return SOLVER_REGISTRY[model_type]
