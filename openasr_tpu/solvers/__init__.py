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

from openasr_tpu.ops.schedules import BobSchedule, get_schedule
from openasr_tpu.parallel import make_mesh, shard_batch
from openasr_tpu.parallel.mesh import param_shardings, replicated
from openasr_tpu.utils import Timer
from openasr_tpu.utils.checkpoint import (
    cleanup_ckpt,
    load_package,
    save_package,
)

logger = logging.getLogger(__name__)


def array_fields(batch: dict) -> dict:
    return {k: v for k, v in batch.items() if hasattr(v, "ndim")}


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
        self.tx = self._make_optimizer(config)
        params = self._place_params(model.params)
        self.model.params = params
        # optimizer moments are zeros_like(params): they inherit the
        # parameter shardings automatically
        self.opt_state = self.tx.init(params)

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
        if opt_type == "adam":
            opt = optax.adam(lr_fn, b1=0.9, b2=0.999, eps=1e-8)
        elif opt_type == "sgd":
            opt = optax.sgd(lr_fn, momentum=0.9)
        else:
            raise ValueError(f"Unknown optimizer {opt_type}")
        chain = []
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
        return tx

    def _place_params(self, params):
        shardings = param_shardings(params, self.mesh)
        return jax.tree_util.tree_map(jax.device_put, params, shardings)

    def current_lr(self) -> float:
        return float(self.init_lr * self.schedule(self.step + 1))

    # ----------------------------------------------------------- loss mixing

    def mix_losses(self, losses: Dict) -> jnp.ndarray:
        raise NotImplementedError

    def model_loss(self, params, batch, rngs, train, batch_stats=None):
        kwargs = {"label_smooth": self.label_smooth}
        if batch_stats is not None:
            kwargs["batch_stats"] = batch_stats
        return self.model.loss(params, batch, rngs, train=train, **kwargs)

    # ----------------------------------------------------------- train steps

    def _build_train_step(self) -> Callable:
        tx = self.tx
        has_bs = self.model.batch_stats is not None

        if has_bs:
            @partial(jax.jit, donate_argnums=(0, 1, 2))
            def train_step_bs(params, opt_state, batch_stats, batch, rng):
                rngs = {"dropout": rng, "aug": jax.random.fold_in(rng, 1)}

                def loss_fn(p):
                    losses = self.model_loss(
                        p, batch, rngs, True, batch_stats=batch_stats
                    )
                    new_bs = losses.pop("batch_stats", batch_stats)
                    return self.mix_losses(losses), (losses, new_bs)

                (loss, (losses, new_bs)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, new_bs, loss, losses

            def train_step(params, opt_state, batch, rng):
                params, opt_state, new_bs, loss, losses = train_step_bs(
                    params, opt_state, self.model.batch_stats, batch, rng
                )
                self.model.batch_stats = new_bs
                return params, opt_state, loss, losses

            return train_step

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng):
            rngs = {"dropout": rng, "aug": jax.random.fold_in(rng, 1)}

            def loss_fn(p):
                losses = self.model_loss(p, batch, rngs, True)
                return self.mix_losses(losses), losses

            (loss, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, losses

        return train_step

    def _build_eval_step(self) -> Callable:
        has_bs = self.model.batch_stats is not None

        if has_bs:
            @jax.jit
            def eval_step_bs(params, batch_stats, batch):
                return self.model_loss(
                    params, batch, {}, False, batch_stats=batch_stats
                )

            return lambda params, batch: eval_step_bs(
                params, self.model.batch_stats, batch
            )

        @jax.jit
        def eval_step(params, batch):
            return self.model_loss(params, batch, {}, False)

        return eval_step

    def _build_accum_steps(self):
        """Two-phase path for accumulate_grad_batch > 1: grads summed over
        micro-batches (matching the reference's repeated backward without
        zero_grad, src/solvers/transformer.py:56-68)."""
        tx = self.tx

        @jax.jit
        def grad_step(params, batch, rng, acc):
            rngs = {"dropout": rng, "aug": jax.random.fold_in(rng, 1)}

            def loss_fn(p):
                losses = self.model_loss(p, batch, rngs, True)
                return self.mix_losses(losses), losses

            (loss, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            acc = jax.tree_util.tree_map(jnp.add, acc, grads)
            return acc, loss, losses

        @partial(jax.jit, donate_argnums=(0, 1))
        def apply_step(params, opt_state, acc):
            updates, opt_state = tx.update(acc, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state

        return grad_step, apply_step

    # ----------------------------------------------------------- epoch loops

    def iter_one_epoch(self, cross_valid: bool = False) -> float:
        loader = self.cv_loader if cross_valid else self.tr_loader
        timer = Timer()
        timer.tic()
        tot: Dict[str, float] = {}
        tot_main = 0.0
        tot_norm = 0.0
        tot_seqs = 0

        if not cross_valid and self.accumulate_grad_batch > 1:
            if self._grad_accum is None:
                self._grad_accum = self._build_accum_steps()
            grad_step, apply_step = self._grad_accum
            acc = jax.tree_util.tree_map(jnp.zeros_like, self.model.params)
            n_accu = 0

        tot_iters = len(loader)
        params = self.model.params
        for niter, batch in enumerate(loader, start=1):
            arrays = array_fields(batch)
            arrays = shard_batch(arrays, self.mesh)

            if cross_valid:
                losses = self._eval_step(params, arrays)
            else:
                rng = jax.random.fold_in(self.rng, self.step * 8191 + niter)
                if self.accumulate_grad_batch > 1:
                    acc, loss, losses = grad_step(params, arrays, rng, acc)
                    n_accu += 1
                    if n_accu == self.accumulate_grad_batch or niter == tot_iters:
                        params, self.opt_state = apply_step(
                            params, self.opt_state, acc
                        )
                        self.model.params = params
                        acc = jax.tree_util.tree_map(jnp.zeros_like, params)
                        n_accu = 0
                        self.step += 1
                else:
                    params, self.opt_state, loss, losses = self._train_step(
                        params, self.opt_state, arrays, rng
                    )
                    self.model.params = params
                    self.step += 1

            main = float(losses[self.main_loss_key])
            norm = float(losses[self.main_loss_norm])
            tot_main += main
            tot_norm += norm
            tot_seqs += int(losses["n_seqs"])
            for k in losses:
                if k.endswith("_loss"):
                    tot[k] = tot.get(k, 0.0) + float(losses[k])

            if niter % self.print_inteval == 0:
                parts = " ".join(
                    f"{k}: {v / max(tot_norm, 1.0):.3f}" for k, v in tot.items()
                )
                logger.info(
                    "Epoch %d | Step %d | Batch %d/%d | %s | lr %.3e | "
                    "sent/sec %.2f",
                    self.epoch, self.step, niter, tot_iters, parts,
                    self.current_lr(), tot_seqs / max(timer.toc(), 1e-9),
                )

        return tot_main / max(tot_norm, 1e-9)

    def train(self) -> None:
        best_cv = min(self.cv_loss) if self.cv_loss else 9e20
        while self.epoch < self.num_epoch:
            t0 = time.time()
            self.epoch += 1
            tr_loss = self.iter_one_epoch()
            self.save(os.path.join(self.exp_dir, f"ep-{self.epoch:04d}.pkg"))
            self.save(os.path.join(self.exp_dir, "last.pkg"))
            cv_loss = self.iter_one_epoch(cross_valid=True)
            best_cv = min(best_cv, cv_loss)
            if self.is_bob:
                self.schedule.update(cv_loss)
            logger.info(
                "Epoch %d done: tr %.4f cv %.4f (best %.4f) in %.1f min",
                self.epoch, tr_loss, cv_loss, best_cv,
                (time.time() - t0) / 60.0,
            )
            self.tr_loss.append(tr_loss)
            self.cv_loss.append(cv_loss)
            if self.num_last_ckpt_keep:
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
            "optim_state": jax.tree_util.tree_map(
                np.asarray, self.opt_state
            ),
        }
        if self.is_bob:
            pkg["scheduler_state"] = self.schedule.pack_state()
        return pkg

    def save(self, path: str) -> None:
        save_package(self.package(), path)

    def restore(self, pkg: dict) -> None:
        state = pkg["solver_state"]
        self.epoch = state["epoch"]
        self.step = state["step"]
        self.tr_loss = list(state["tr_loss"])
        self.cv_loss = list(state["cv_loss"])
        if pkg.get("optim_state") is not None:
            target = jax.tree_util.tree_structure(self.opt_state)
            leaves = jax.tree_util.tree_leaves(pkg["optim_state"])
            self.opt_state = jax.tree_util.tree_unflatten(
                target, [jnp.asarray(l) for l in leaves]
            )
        if self.is_bob and "scheduler_state" in pkg:
            self.schedule.restore_state(pkg["scheduler_state"])


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


SOLVER_REGISTRY = {
    "conv-transformer": CESolver,
    "conv-ctc-transformer": CTCCESolver,
    "conv-ctc": CTCSolver,
    "gru_ctc": CTCSolver,
}


def get_solver_class(model_type: str):
    if model_type not in SOLVER_REGISTRY:
        import contextlib

        for mod in ("cif", "cpc", "phone2char"):
            with contextlib.suppress(ImportError):
                __import__(f"openasr_tpu.solvers.{mod}")
    if model_type not in SOLVER_REGISTRY:
        raise ValueError(f"No solver for model type {model_type!r}")
    return SOLVER_REGISTRY[model_type]
